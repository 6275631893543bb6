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
    Geo.spatialJoin(pts, world, "lon", "lat")
      .select(col("event_id"), col("country"), col("region"))
      .orderBy("event_id")
  }

  /** J1b — the composite world the reference's Natural Earth dim
    * actually exercises (pipeline/add_region.py:23: multipolygons,
    * holes, shared borders), still BETWEEN-decomposable for the DuckDB
    * oracle:
    *   - Anulus: polygon with a rectangular HOLE (even-odd parity);
    *   - Enclave: a country entirely inside Anulus' hole (Lesotho
    *     shape) — claimed by Enclave alone;
    *   - Bipart: a MULTIPOLYGON of two disjoint parts;
    *   - Casca/Dorune: an OVERLAPPING pair — points in the overlap
    *     match both, and the alphabetical-survivor rule (Casca) is
    *     live in the oracle check, not dead code.
    * Regions are assigned in the same alphabetical order as countries
    * so the oracle's min(region) stays aligned with min(country).
    * Bounds at .505 offsets unreachable by the 2-decimal/integral
    * point grid, so edge semantics never matter. */
  // lat band chosen inside [-89, -77]: the event grid's lat is
  // user_id%180-90 with small user_ids, so this far-south band is the
  // one populated at EVERY test scale factor (sf0.001's lats stop at
  // -76) — each zone (hole, enclave, multipart, overlap) gets hits.
  val compositeWorld: Seq[(String, String,
      (Double, Double, Double, Double),            // outer ring bbox
      Option[(Double, Double, Double, Double)],    // hole ring
      Option[(Double, Double, Double, Double)])] = Seq( // second part
    ("Anulus", "R1", (-150.505, -89.505, -90.505, -76.505),
      Some((-130.505, -85.505, -110.505, -80.505)), None),
    ("Bipart", "R2", (-80.505, -89.505, -60.505, -76.505),
      None, Some((-40.505, -89.505, -20.505, -76.505))),
    ("Casca", "R3", (0.505, -89.505, 60.505, -76.505), None, None),
    ("Dorune", "R4", (30.505, -89.505, 90.505, -76.505), None, None),
    ("Enclave", "R5", (-125.505, -84.505, -115.505, -82.505), None, None))

  /** J1b — the spatial join through the REAL even-odd ray-cast over the
    * composite world (hole + enclave + multipolygon + overlap). */
  def spatialJoinCompositeQuery(s: SparkSession, d: String): DataFrame = {
    val world = Geo.worldDim(s, compositeWorld.map {
      case (c, r, outer, hole, part2) =>
        val rings = Seq(rect(outer._1, outer._2, outer._3, outer._4).head) ++
          hole.map(h => rect(h._1, h._2, h._3, h._4).head) ++
          part2.map(p => rect(p._1, p._2, p._3, p._4).head)
        (c, r, rings)
    })
    val pts = Tables.events(s, d)
      .withColumn("lon", col("value") % 360 - 180)
      .withColumn("lat", (col("user_id") % 180).cast("double") - 90)
    Geo.spatialJoin(pts, world, "lon", "lat")
      .select(col("event_id"), col("country"), col("region"))
      .orderBy("event_id")
  }

  val spatialJoinCompositeOracle: String = {
    def d(o: Option[(Double, Double, Double, Double)], i: Int): String =
      o.map(t => t.productElement(i).toString).getOrElse("CAST(NULL AS DOUBLE)")
    val values = compositeWorld.map { case (c, r, (a0, a1, a2, a3), h, b) =>
      s"('$c','$r',$a0,$a1,$a2,$a3,${d(h, 0)},${d(h, 1)},${d(h, 2)},${d(h, 3)},${d(b, 0)},${d(b, 1)},${d(b, 2)},${d(b, 3)})"
    }.mkString(",\n  ")
    s"""WITH pts AS (
       |  SELECT event_id, value % 360 - 180 AS lon,
       |         CAST(user_id % 180 AS DOUBLE) - 90 AS lat
       |  FROM events),
       |world(country, region, a_min_lon, a_min_lat, a_max_lon, a_max_lat,
       |      h_min_lon, h_min_lat, h_max_lon, h_max_lat,
       |      b_min_lon, b_min_lat, b_max_lon, b_max_lat) AS (VALUES
       |  $values)
       |SELECT p.event_id, min(w.country) AS country, min(w.region) AS region
       |FROM pts p LEFT JOIN world w
       |  ON ((p.lon BETWEEN w.a_min_lon AND w.a_max_lon
       |       AND p.lat BETWEEN w.a_min_lat AND w.a_max_lat
       |       AND NOT (w.h_min_lon IS NOT NULL
       |                AND p.lon BETWEEN w.h_min_lon AND w.h_max_lon
       |                AND p.lat BETWEEN w.h_min_lat AND w.h_max_lat))
       |      OR (w.b_min_lon IS NOT NULL
       |          AND p.lon BETWEEN w.b_min_lon AND w.b_max_lon
       |          AND p.lat BETWEEN w.b_min_lat AND w.b_max_lat))
       |GROUP BY p.event_id
       |ORDER BY p.event_id""".stripMargin
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
