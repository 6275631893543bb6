package graft.geo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Oracle-checkable driver queries for the geo operators. The world dim
  * here is rectangles-as-polygons: the REAL ray-cast runs in Spark while
  * DuckDB can verify with plain BETWEEN predicates (SURVEY.md §7.3).
  * Boundary coordinates sit at .505 offsets no data point can hit
  * (lons are 2-decimal, lats integral), so edge semantics never matter.
  * Holes/multipolygons/borders are covered in GeoSpec instead.
  */
object GeoQueries {

  private def rect(minLon: Double, minLat: Double, maxLon: Double,
      maxLat: Double): Seq[Seq[Seq[Double]]] =
    Seq(Seq(
      Seq(minLon, minLat), Seq(maxLon, minLat), Seq(maxLon, maxLat),
      Seq(minLon, maxLat), Seq(minLon, minLat)))

  /** (country, region, bounds) — 3 lon bands × 2 lat bands, disjoint. */
  val rectWorld: Seq[(String, String, (Double, Double, Double, Double))] = Seq(
    ("Aquila", "West", (-170.505, -80.505, -60.505, -10.505)),
    ("Borea", "West", (-170.505, -9.505, -60.505, 80.505)),
    ("Cardia", "Mid", (-59.505, -80.505, 49.505, -10.505)),
    ("Dorsia", "Mid", (-59.505, -9.505, 49.505, 80.505)),
    ("Eridu", "East", (50.505, -80.505, 170.505, -10.505)),
    ("Feronia", "East", (50.505, -9.505, 170.505, 80.505)))

  /** J1 — spatial left join of event points against the rectangle world,
    * through the full bbox-prefilter + ray-cast path. */
  def spatialJoinQuery(s: SparkSession, d: String): DataFrame = {
    val world = Geo.worldDim(s, rectWorld.map { case (c, r, (a, b, x, y)) =>
      (c, r, rect(a, b, x, y))
    })
    val pts = Tables.events(s, d)
      .withColumn("lon", col("value") % 360 - 180)
      .withColumn("lat", (col("user_id") % 180).cast("double") - 90)
    Geo.spatialJoin(pts, world, "lon", "lat", Seq("event_id"))
      .select(col("event_id"), col("country"), col("region"))
      .orderBy("event_id")
  }

  /** Lookup list for J2 — order matters (first match wins), including a
    * substring trap: "spar" must NOT match inside "spark" (word
    * boundary), mirroring the Niger/Nigeria case. */
  val placeList: Seq[(String, String)] = Seq(
    "spar" -> "Trap", "spark" -> "Infra", "customer" -> "Biz",
    "vector" -> "ML", "window" -> "SQL", "the" -> "Common")

  /** J2 — first-match whole-word lookup over free text
    * (reference add_region.py:40-46), as a codegen'd CASE chain. */
  def placeLookupQuery(s: SparkSession, d: String): DataFrame = {
    val (nm, cat) = Geo.firstMatchLookup(col("text"), placeList)
    Tables.documents(s, d)
      .select(col("doc_id"), nm.as("place_name"), cat.as("place_cat"))
      .orderBy("doc_id")
  }

  val spatialJoinOracle: String = {
    val values = rectWorld.map { case (c, r, (a, b, x, y)) =>
      s"('$c','$r',$a,$b,$x,$y)"
    }.mkString(",\n  ")
    s"""WITH pts AS (
       |  SELECT event_id, value % 360 - 180 AS lon,
       |         CAST(user_id % 180 AS DOUBLE) - 90 AS lat
       |  FROM events),
       |world(country, region, min_lon, min_lat, max_lon, max_lat) AS (VALUES
       |  $values)
       |SELECT p.event_id, w.country, w.region
       |FROM pts p LEFT JOIN world w
       |  ON p.lon >= w.min_lon AND p.lon <= w.max_lon
       | AND p.lat >= w.min_lat AND p.lat <= w.max_lat
       |ORDER BY event_id""".stripMargin
  }

  val placeLookupOracle: String = {
    def chain(pick: ((String, String)) => String): String =
      placeList.map { e =>
        s"WHEN regexp_matches(lower(text), '\\b${e._1.toLowerCase}\\b') THEN '${pick(e)}'"
      }.mkString("CASE ", " ", " ELSE NULL END")
    s"""SELECT doc_id,
       |  ${chain(_._1)} AS place_name,
       |  ${chain(_._2)} AS place_cat
       |FROM documents ORDER BY doc_id""".stripMargin
  }
}
