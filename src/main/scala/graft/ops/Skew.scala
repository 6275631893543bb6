package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter grouping keys: two-stage salted
  * aggregation. The reference's country rollups (A2/A5/A6) would skew
  * badly at 100 TB — a handful of countries hold most events, so a
  * single hash-partitioned aggregation sends whole heavy keys to single
  * reducers. Salting splits each key into `buckets` sub-keys, partially
  * aggregates, then merges — bounding any one task at 1/buckets of the
  * heaviest key. (AQE skew handling covers joins; aggregation skew still
  * needs this.)
  *
  * The aggregate must be algebraically mergeable: expressed here as
  * (partial, merge, finish) column triples over a value column.
  */
object Skew {

  /** Salted count + sum: groupBy(keys + salt) partial, then groupBy(keys)
    * merge. Output: keys, cnt, total.
    *
    * `saltOn` must be a DETERMINISTIC row-level expression (a stable id
    * or high-cardinality attribute hash) — deriving the salt from
    * partition ids or monotonically_increasing_id would change under
    * stage retries, double-counting or losing rows exactly in the
    * large-cluster-with-retries regime salting targets. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], value: Column,
      buckets: Int, saltOn: Column): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltOn), lit(buckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__cnt"), sum(value).as("__sum"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__cnt")).as("cnt"), sum(col("__sum")).as("total"))
  }

  /** skew1 — the salted rollup as a driver query: per-event-type count
    * + integer-cents total through the two-stage salted aggregation,
    * against a PLAIN single-stage GROUP BY oracle. The hash match is
    * the semantics-preservation proof: the salt splits partials and
    * vanishes in the merge, so the answer is independent of the salt
    * function, bucket count, and partitioning — while bounding any one
    * reduce task at ~1/buckets of the heaviest key. */
  def saltedRollup(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    saltedCountSum(graft.Tables.events(s, d), Seq("event_type"),
      graft.functions.Functions.cents(col("value")),
      buckets = 32, saltOn = col("event_id"))
      .orderBy("event_type")

  val saltedRollupOracle: String =
    """SELECT event_type, count(*) AS cnt,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
}
