package graft

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Ingest

class IngestSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("planWindows: covers the range exactly, no window over limit (extract_historical.py:24-73)") {
    // synthetic density: 1000 rows/day from 1990, zero before
    def count(s: LocalDate, e: LocalDate): Long = {
      val from = if (s.isBefore(LocalDate.of(1990, 1, 1))) LocalDate.of(1990, 1, 1) else s
      math.max(0, java.time.temporal.ChronoUnit.DAYS.between(from, e) + 1) * 1000
    }
    val ws = Ingest.planWindows(
      LocalDate.of(1940, 1, 1), LocalDate.of(1990, 6, 30), count)
    // contiguous cover
    assert(ws.head._1 == LocalDate.of(1940, 1, 1))
    assert(ws.last._2 == LocalDate.of(1990, 6, 30))
    ws.sliding(2).foreach {
      case Seq((_, e1), (s2, _)) => assert(s2 == e1.plusDays(1))
      case _ =>
    }
    // every window under the row limit
    ws.foreach { case (s, e) => assert(count(s, e) <= 20000) }
    // sparse era crossed in few windows (era shortcuts)
    assert(ws.count(_._1.getYear < 1965) <= 2)
  }

  test("planWindows: degenerate one-day density beyond limit still terminates") {
    def count(s: LocalDate, e: LocalDate): Long =
      (java.time.temporal.ChronoUnit.DAYS.between(s, e) + 1) * 50000
    val ws = Ingest.planWindows(
      LocalDate.of(2000, 1, 1), LocalDate.of(2000, 1, 10), count,
      eraShortcuts = Nil)
    assert(ws.size == 10) // forced to single-day windows
    assert(ws.head._1 == LocalDate.of(2000, 1, 1))
    assert(ws.last._2 == LocalDate.of(2000, 1, 10))
  }

  test("flattenFeatures: 10-field projection, coord reorder, malformed-row nulls (extract_historical.py:86-108)") {
    val good =
      """{"properties":{"place":"10km SW of X","time":1700000000000,"mag":4.5,
        |"alert":"green","tsunami":0,"tz":null,"type":"earthquake"},
        |"geometry":{"coordinates":[121.5,24.8,10.0]}}""".stripMargin.replace("\n", "")
    val bad = """{"not valid json"""
    val df = Seq(good, bad).toDF("json")
    val out = Ingest.flattenFeatures(df, "json")
    assert(out.columns.toSeq == Seq("place", "time", "magnitude", "latitude",
      "longitude", "depth", "alert", "tsunami", "tz", "type"))
    val rows = out.collect()
    val g = rows(0)
    assert(g.getAs[String]("place") == "10km SW of X")
    assert(g.getAs[Double]("latitude") == 24.8)   // coordinates[1]
    assert(g.getAs[Double]("longitude") == 121.5) // coordinates[0]
    assert(g.getAs[Double]("depth") == 10.0)
    val b = rows(1)
    assert(b.isNullAt(b.fieldIndex("place"))) // malformed → nulls, droppable
  }

  test("geojsonFlattenQuery: pre-parse sort key nulls exactly when the JSON nulls — null event fields sort with the nulls") {
    import org.apache.spark.sql.functions._
    // the query sorts RAW rows on a precomputed place key before the
    // parse (plan-shape optimization); a row whose JSON concat nulls
    // out via a null event field must carry a NULL key too, or its
    // all-null parsed output would sort among the named places
    val dir = java.nio.file.Files.createTempDirectory("graft-ev").toString
    val ev = Seq(
      (0L, "2024-01-01 00:00:00", 3L, "click", 1.5, "{}"),   // %97==0 → malformed
      (5L, "2024-01-02 00:00:00", 4L, null: String, 2.0, "{}"), // null field → null JSON
      (12L, "2024-01-03 00:00:00", 7L, "view", 3.0, "{}"),
      (3L, "2024-01-04 00:00:00", 9L, "click", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val places = Ingest.geojsonFlattenQuery(spark, dir)
      .select("place").collect().map(r => Option(r.getString(0)))
    // nulls-first ascending: the malformed row AND the null-field row
    // lead, then named places in order — key order == parsed order
    assert(places.toSeq == Seq(None, None, Some("p-12"), Some("p-3")))
  }
}
