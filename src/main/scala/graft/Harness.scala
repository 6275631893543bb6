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
      // cores-count STATIC baseline; corpus-scale pipelines ratchet
      // this up from MEASURED bytes at the Materialize seam
      // (Materialize.ratchetShufflePartitions) — the data-size-derived
      // partition rule the 100x probe demanded. A GLOBAL headroom
      // (AQE initialPartitionNum = 8x cores) was measured and
      // rejected: numShufflePartitions would loosen the auto
      // shuffled-hash budget 8x at EVERY tier (distcc 2.6x slower at
      // 40x) while the seam ratchet widens the layout, and with it
      // that budget, only when measured data says so.
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // pin the AQE coalesce target explicitly (it is also the seam
      // ratchet's bytes-per-partition target — the two must agree or
      // ratcheted layouts would coalesce right back down). 32 MB, not
      // Spark's 64 MB default: the round-10 bisect of the 100x distcc
      // bend put the win zone at per-task volumes <= ~32 MB of
      // UnsafeRow bytes for the sort/hash-heavy dedup pipelines
      // (89 s at ~47 MB/task, 20 s at ~23 MB/task) — and the 100x
      // tier's dominant checkpoints measure ~1.5 GB, which a 64 MB
      // target would leave at the cores-count layout (measured:
      // ratchet never engaged, parts=32 in the probe row)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32MB")
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
