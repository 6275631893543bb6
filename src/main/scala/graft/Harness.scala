package graft

import org.apache.spark.sql.SparkSession

/** The one SparkSession recipe every measurement/verification main
  * uses. Six mains previously repeated it inline; a drifted copy
  * (e.g. a missing `nanosAsLong`) would fail only at runtime on the
  * events table, so the recipe lives once. */
object Harness {
  def session(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
