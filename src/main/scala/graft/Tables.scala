package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Readers for the driver-generated test tables (TESTDATA.md).
  *
  * Every query entry receives `(spark, sfDir)` and reads only via these
  * helpers so the scan layer stays in one place (parquet → columnar,
  * predicate/column pushdown verified in specs). At cluster scale the
  * same code reads a directory of many files; nothing here assumes a
  * single file.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** events.parquet carries TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects unless `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * Verify/Bench/specs). Under that flag `ts` arrives as epoch-nanos long;
    * normalize to a microsecond timestamp with exact integer division —
    * NOT a double division, which would lose precision above 2^53 ns. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
