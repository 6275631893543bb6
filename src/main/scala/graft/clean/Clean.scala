package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's clean stage (pipeline/clean_historical.py:16-57) as a
  * composable DataFrame transform: epoch→timestamp (P3), projection (P2),
  * range-validity filters (P4-P7), dedup (D1), null-fill (P8).
  *
  * All predicates are plain `Column` expressions, so Catalyst pushes them
  * into the parquet scan (verified via `PushedFilters` in the spec) — at
  * 100 TB the scan prunes row groups by min/max stats instead of reading
  * everything the way the reference's pandas stage does.
  */
object Clean {

  /** Numeric range filter, null-rejecting — the reference applies
    * magnitude ∈ [-1,10] (P4), latitude ∈ [-90,90] (P5),
    * longitude ∈ [-180,180] (P6) this way
    * (clean_historical.py:31-43). */
  def rangeFilter(c: Column, lo: Double, hi: Double): Column =
    c.isNotNull && c >= lo && c <= hi

  /** Timestamp bounds filter (P7, clean_historical.py:44-47). */
  def tsBetween(c: Column, lo: String, hi: String): Column =
    c >= to_timestamp(lit(lo)) && c <= to_timestamp(lit(hi))

  /** Full clean pipeline on an earthquake-shaped frame. Keeps the
    * reference's operator order: convert → select → filter → dedup → fill
    * (clean_historical.py:27-50). `dedupKeys` uses Spark's
    * arbitrary-survivor `dropDuplicates`, exactly like the reference (D1);
    * callers needing deterministic output dedup by aggregation instead
    * (see SparkEntry d1_dedup_min). */
  def cleanEvents(
      df: DataFrame,
      magnitudeCol: String,
      tsCol: String,
      tsLo: String,
      tsHi: String,
      magLo: Double,
      magHi: Double,
      dedupKeys: Seq[String],
      fillZero: Seq[String]): DataFrame = {
    val filtered = df
      .filter(rangeFilter(col(magnitudeCol), magLo, magHi))
      .filter(tsBetween(col(tsCol), tsLo, tsHi))
    val deduped =
      if (dedupKeys.nonEmpty) filtered.dropDuplicates(dedupKeys) else filtered
    if (fillZero.nonEmpty) deduped.na.fill(0, fillZero) else deduped
  }
}
