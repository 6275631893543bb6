package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.clean.Clean
import graft.enrich.Enrich
import graft.geo.Geo
import graft.ingest.Ingest
import graft.model.Staging

/** End-to-end: the full reference pipeline on an earthquake-shaped
  * fixture — GeoJSON ingest → spatial+regex enrich → clean → staging
  * (union/dedup/key) → fact (severity/year/decade) → analytics — with
  * hand-computed expected outputs (FIXTURES.md F1/F2 shapes).
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  def feature(place: String, timeMs: Long, mag: Double, lon: Double,
      lat: Double, depth: Double, typ: String = "earthquake"): String =
    s"""{"properties":{"place":"$place","time":$timeMs,"mag":$mag,""" +
      s""""alert":null,"tsunami":0,"tz":null,"type":"$typ"},""" +
      s""""geometry":{"coordinates":[$lon,$lat,$depth]}}"""

  val t2020 = 1577836800000L // 2020-01-01T00:00:00Z

  test("full pipeline: ingest → enrich → clean → staging → fact → analytics") {
    // world: one square country around (0..10, 0..10)
    val world = Geo.worldDim(spark, Seq(
      ("Alpha", "Oceania", Seq(Seq(Seq(0.0, 0.0), Seq(10.0, 0.0),
        Seq(10.0, 10.0), Seq(0.0, 10.0), Seq(0.0, 0.0))))))

    val raw = Seq(
      feature("5 km N of Foo", t2020, 5.5, 5.0, 5.0, 10.0),          // inside Alpha
      feature("deep sea near alpha", t2020 + 86400000L, 6.5, 50.0, 50.0, 20.0), // regex fallback
      feature("nowhere", t2020 + 2 * 86400000L, 4.5, -50.0, -50.0, 30.0), // stays null country
      feature("bad magnitude", t2020, 99.0, 5.0, 5.0, 1.0),          // filtered by clean
      feature("5 km N of Foo", t2020, 5.5, 5.0, 5.0, 10.0)           // exact dup → deduped
    ).toDF("json")

    // 1. ingest (S3): flatten GeoJSON, epoch→timestamp (P3)
    val ingested = Ingest.flattenFeatures(raw, "json")
      .withColumn("event_datetime",
        graft.functions.Functions.epochMsToTs(col("time")))

    // 2. enrich (J1+J2+J3+P11): country/region by polygon, fallback by place text
    val enriched = Enrich.addCountryRegion(
      ingested, world, Seq("alpha" -> "Oceania"),
      "longitude", "latitude", "place")
      .withColumn("region",
        coalesce(col("region"), when(col("country").isNotNull, lit("Oceania"))))

    // 3. clean (P4-P8, D1)
    val cleaned = Clean.cleanEvents(enriched, "magnitude", "event_datetime",
      "1500-01-01 00:00:00", "2025-07-31 00:00:00", -1.0, 10.0,
      dedupKeys = Seq("place", "event_datetime"), fillZero = Seq("depth"))

    // 4. staging (U1+W1+P17+P18) — historical ∪ empty monthly
    val stg = Staging.stgEarthquake(cleaned, cleaned.limit(0))
    // 5. fact (P14-P16)
    val fact = Staging.factEarthquake(stg)

    val rows = fact
      .select("place", "country", "region", "severity", "event_year", "event_decade")
      .as[(String, Option[String], Option[String], String, Int, Long)]
      .collect().sortBy(_._1)

    assert(rows.length == 3) // bad magnitude filtered, dup collapsed
    assert(rows.map(_._1).toSeq == Seq("5 km N of Foo", "deep sea near alpha", "nowhere"))
    val byPlace = rows.map(r => r._1 -> r).toMap
    assert(byPlace("5 km N of Foo")._2.contains("Alpha"))      // spatial join
    assert(byPlace("deep sea near alpha")._2.contains("alpha")) // regex fallback
    assert(byPlace("nowhere")._2.isEmpty)                       // left-join null
    assert(byPlace("5 km N of Foo")._4 == "Moderate")
    assert(byPlace("deep sea near alpha")._4 == "Strong")
    assert(rows.forall(_._5 == 2020) && rows.forall(_._6 == 2020L))

    // 6. analytics (A3-shape) over the fact
    val yearly = Staging.yearlyEarthquakeStats(fact)
      .as[(Int, Long, Double, Double)].collect()
    assert(yearly.toSeq == Seq((2020, 2L, 6.0, 15.0))) // the 2 non-null-country rows

    // surrogate key is the dbt_utils md5 formula (P18)
    val key = stg.filter(col("place") === "nowhere")
      .select("event_id").as[String].head()
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("nowhere-2020-01-03 00:00:00".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(key == expected)
  }

  test("backfill plan: span expansion surfaces source-absent months as missing-with-zero (t6)") {
    // 2019-11 loaded, 2019-12 absent from the SOURCE entirely, 2020-01
    // and 2020-02 unloaded — the planner must emit all four span
    // months, with the hole month present at n_rows=0
    val orders = Seq(
      (1L, "2019-11-03"), (2L, "2019-11-20"),
      (3L, "2020-01-15"),
      (4L, "2020-02-05"), (5L, "2020-02-06"), (6L, "2020-02-07"))
      .toDF("o_orderkey", "d")
      .withColumn("o_orderdate", to_timestamp(col("d")))
    val got = Staging.backfillPlanOf(orders, "2020-01")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(
      ("2019-11", 2L, "present"),
      ("2019-12", 0L, "present"), // in-source-span hole, before cutoff
      ("2020-01", 1L, "missing"),
      ("2020-02", 3L, "missing")), got.toSeq.toString)
  }

  test("incremental staging drops late rows; full-refresh union catches them (T2 vs U1)") {
    val existing = Seq(("a", "2020-06-01 00:00:00")).toDF("place", "dt")
      .withColumn("event_datetime", to_timestamp(col("dt"))).drop("dt")
    val incoming = Seq(("late", "2020-05-01 00:00:00"), ("new", "2020-07-01 00:00:00"))
      .toDF("place", "dt")
      .withColumn("event_datetime", to_timestamp(col("dt"))).drop("dt")
    val inc = Staging.stgIncremental(existing, incoming)
    assert(inc.select("place").as[String].collect().toSeq == Seq("new"))
    // empty target (first load): null watermark must mean "everything is
    // new", not "drop everything"
    val first = Staging.stgIncremental(existing.limit(0), incoming)
    assert(first.select("place").as[String].collect().toSet == Set("late", "new"))
  }
}
