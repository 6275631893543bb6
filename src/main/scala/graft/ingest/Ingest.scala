package graft.ingest

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest-side operators (SURVEY.md §2.1 S2/S3).
  */
object Ingest {

  /** S2 — adaptive extraction-window planner
    * (reference pipeline/extract_historical.py:24-73): split [start, end]
    * into windows each holding ≤ `limit` rows according to `countFn`.
    * Growth schedule mirrors the reference: probe 15 days, double until
    * the count exceeds the limit, then use the last fitting width; snap
    * to `end` when within 30 days; era shortcuts jump the sparse early
    * centuries in single windows. This is partition planning — the exact
    * role of `planInputPartitions` in a DataSourceV2 scan.
    */
  def planWindows(
      start: LocalDate,
      end: LocalDate,
      countFn: (LocalDate, LocalDate) => Long,
      limit: Long = 20000,
      eraShortcuts: Seq[LocalDate] = Seq(
        LocalDate.of(1949, 1, 1), LocalDate.of(1965, 1, 1)),
      initialDays: Long = 15,
      snapDays: Long = 30): Seq[(LocalDate, LocalDate)] = {

    def grow(s: LocalDate, days: Long): LocalDate = {
      val candidate = s.plusDays(days * 2)
      if (candidate.isAfter(end)) end
      else if (countFn(s, candidate) > limit) s.plusDays(days)
      else grow(s, days * 2)
    }

    val buf = scala.collection.mutable.ListBuffer.empty[(LocalDate, LocalDate)]
    var cur = start
    while (!cur.isAfter(end)) {
      val shortcut = eraShortcuts.find(e =>
        cur.isBefore(e) && !e.isAfter(end) && countFn(cur, e.minusDays(1)) <= limit)
      val next = shortcut match {
        case Some(e) => e.minusDays(1)
        case None =>
          if (java.time.temporal.ChronoUnit.DAYS.between(cur, end) <= snapDays) end
          else grow(cur, initialDays)
      }
      // overflow guard: halve until the window fits; bottoms out at a
      // single-day window [cur, cur] (progress is forced even when one
      // day alone exceeds the limit, like the reference's skip-ahead)
      var hi = next
      while (countFn(cur, hi) > limit && hi.isAfter(cur)) {
        hi = cur.plusDays(
          java.time.temporal.ChronoUnit.DAYS.between(cur, hi) / 2)
      }
      buf += ((cur, hi))
      cur = hi.plusDays(1)
    }
    buf.toList
  }

  /** Schema of a USGS-style GeoJSON feature
    * (reference extract_historical.py:86-101). */
  val featureSchema: StructType = StructType(Seq(
    StructField("properties", StructType(Seq(
      StructField("place", StringType),
      StructField("time", LongType),
      StructField("mag", DoubleType),
      StructField("alert", StringType),
      StructField("tsunami", IntegerType),
      StructField("tz", StringType),
      StructField("type", StringType)))),
    StructField("geometry", StructType(Seq(
      StructField("coordinates", ArrayType(DoubleType)))))))

  /** S3 — GeoJSON feature flattening: project the 10 ingest fields, with
    * the reference's (lon,lat,depth) → lat/lon/depth reorder
    * (extract_historical.py:90-101). Malformed rows (unparseable JSON)
    * yield nulls, mirroring the reference's per-entry try/except skip —
    * callers drop them with a single isNotNull filter. */
  def flattenFeatures(raw: DataFrame, jsonCol: String): DataFrame = {
    val f = from_json(col(jsonCol), featureSchema)
    raw.select(
      f.getField("properties").getField("place").as("place"),
      f.getField("properties").getField("time").as("time"),
      f.getField("properties").getField("mag").as("magnitude"),
      element_at(f.getField("geometry").getField("coordinates"), 2).as("latitude"),
      element_at(f.getField("geometry").getField("coordinates"), 1).as("longitude"),
      element_at(f.getField("geometry").getField("coordinates"), 3).as("depth"),
      f.getField("properties").getField("alert").as("alert"),
      f.getField("properties").getField("tsunami").as("tsunami"),
      f.getField("properties").getField("tz").as("tz"),
      f.getField("properties").getField("type").as("type"))
  }
}
