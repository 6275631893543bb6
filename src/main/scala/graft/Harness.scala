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
      // non-broadcast joins: build a per-partition hash map when one
      // side's HONEST size (the Materialize seam measures checkpointed
      // intermediates) fits the canBuildLocalHashMap budget
      // (threshold × shuffle partitions), instead of sorting both
      // sides. The dedup/LSH pair pipelines join corpus-sized tables
      // on high-cardinality keys where the sort is pure overhead; at
      // warehouse scale the size gate flips the same joins back to
      // sort-merge automatically because size/partitions outgrows the
      // budget — the decision stays size-driven, not hint-driven.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
