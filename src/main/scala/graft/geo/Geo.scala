package graft.geo

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** J1 — the reference's one genuinely custom operator: the spatial
  * left join attaching country/region to event coordinates
  * (reference pipeline/add_region.py:20-28, geopandas
  * `sjoin(..., predicate='within')` over Natural Earth polygons).
  *
  * Spark-first design: the country dim is tiny (~258 polygons), so the
  * join is a broadcast nested-loop with a two-tier predicate:
  *   1. bbox prefilter as native column comparisons — codegen'd, prunes
  *      the vast majority of (event, country) pairs before the UDF runs
  *      (the role the reference's R-tree plays, adequate at ≤258 dims);
  *   2. exact even-odd ray-cast over the polygon rings, evaluated only
  *      for bbox hits.
  * Holes and multipolygons need no special casing: even-odd crossing
  * parity over ALL rings classifies them correctly (a point inside a
  * hole crosses outer+hole = even = outside). Dateline-crossing
  * polygons are assumed pre-split at ±180 (as Natural Earth ships them).
  *
  * At 100 TB the probe side streams through executors with zero shuffle:
  * the dim broadcasts once, and the bbox prefilter keeps the per-row cost
  * near two comparisons for non-matching countries.
  */
object Geo {

  /** Even-odd crossing test of (lon,lat) against a set of rings; each
    * ring is a closed sequence of [lon, lat] points. Pure Scala — unit
    * testable without Spark. */
  def pointInRings(lon: Double, lat: Double,
      rings: Seq[Seq[Seq[Double]]]): Boolean = {
    var inside = false
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      val n = ring.length
      var i = 0
      var j = n - 1
      while (i < n) {
        val xi = ring(i)(0); val yi = ring(i)(1)
        val xj = ring(j)(0); val yj = ring(j)(1)
        if ((yi > lat) != (yj > lat) &&
            lon < (xj - xi) * (lat - yi) / (yj - yi) + xi) {
          inside = !inside
        }
        j = i
        i += 1
      }
      r += 1
    }
    inside
  }

  /** Dateline handling (SURVEY §7.5 risk 1): a polygon whose ring jumps
    * more than 180° in longitude between consecutive points crosses the
    * antimeridian (Fiji, Chukotka when not pre-split). Normalize such
    * rings to a continuous [0, 360) frame and shift the query point into
    * the same frame before the ray-cast. Polygons already split at ±180
    * (as Natural Earth ships them) are untouched. */
  def crossesDateline(rings: Seq[Seq[Seq[Double]]]): Boolean =
    rings.exists(ring => ring.indices.exists { i =>
      val j = (i + 1) % ring.length
      math.abs(ring(i)(0) - ring(j)(0)) > 180.0
    })

  private def shiftLon(lon: Double): Double = if (lon < 0) lon + 360.0 else lon

  /** Ray-cast with dateline awareness. */
  def pointInRingsGeo(lon: Double, lat: Double,
      rings: Seq[Seq[Seq[Double]]]): Boolean =
    if (!crossesDateline(rings)) pointInRings(lon, lat, rings)
    else {
      val shifted = rings.map(_.map(p => Seq(shiftLon(p(0)), p(1))))
      pointInRings(shiftLon(lon), lat, shifted)
    }

  /** The ray-cast as a Spark UDF (broadcast-nested-loop join condition).
    * Dateline normalization happens once per polygon at dim-build time
    * ([[worldDim]]), NOT here — a per-row crossesDateline scan tripled
    * the join cost. Upgrade path: a codegen'd Catalyst Expression — not
    * needed while the bbox prefilter keeps UDF invocations to bbox hits
    * only. */
  val pointInRingsUdf = udf(
    (lon: Double, lat: Double, rings: Seq[Seq[Seq[Double]]]) =>
      pointInRings(lon, lat, rings))

  /** Country dim schema: (country, region, min_lon, min_lat, max_lon,
    * max_lat, rings). Build one from (country, region, rings) triples,
    * deriving the bbox. A dateline-crossing polygon gets a near-global
    * lon bbox (prefilter degrades to pass-through for that one dim row —
    * correct, just unfiltered; the ray-cast decides). */
  def worldDim(s: SparkSession,
      entries: Seq[(String, String, Seq[Seq[Seq[Double]]])]): DataFrame = {
    import s.implicits._
    entries.map { case (c, r, rawRings) =>
      val crosses = crossesDateline(rawRings)
      val rings =
        if (crosses) rawRings.map(_.map(p => Seq(shiftLon(p(0)), p(1))))
        else rawRings
      val pts = rings.flatten
      (c, r, pts.map(_(0)).min, pts.map(_(1)).min,
        pts.map(_(0)).max, pts.map(_(1)).max, rings, crosses)
    }.toDF("country", "region", "min_lon", "min_lat", "max_lon", "max_lat",
      "rings", "crosses")
  }

  /** Spatial left join: attach (country, region) where the point falls
    * inside a country polygon. `dedup`: a border point can match two
    * polygons (geopandas returns both, reference tolerates); we keep the
    * alphabetically-first country for determinism. */
  def spatialJoin(points: DataFrame, world: DataFrame,
      lonCol: String, latCol: String,
      pointKeys: Seq[String]): DataFrame = {
    val lat = col(latCol)
    // shift the probe longitude into the polygon's frame: [0,360) for
    // dateline-crossing dims, [-180,180] otherwise — codegen'd, no UDF
    val rawLon = col(lonCol)
    val lon = when(col("crosses") && rawLon < 0, rawLon + 360.0)
      .otherwise(rawLon)
    val bboxHit = lon >= col("min_lon") && lon <= col("max_lon") &&
      lat >= col("min_lat") && lat <= col("max_lat")
    val joined = points.join(
      broadcast(world),
      bboxHit && pointInRingsUdf(lon, lat, col("rings")),
      "left")
    // border dedup: keep first country per point key
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(pointKeys.map(col): _*)
      .orderBy(col("country").asc_nulls_last)
    joined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "min_lon", "min_lat", "max_lon", "max_lat", "rings",
        "crosses")
  }

  /** J2 — first-match country-from-place lookup
    * (reference add_region.py:40-46): scan the country list in order and
    * return the first whose name matches as a whole word (case
    * insensitive) in the free-text column. Spark-first: instead of the
    * reference's per-row Python UDF loop, compose a codegen'd CASE chain
    * from the (small, broadcastable) list — same first-match-wins
    * semantics, no UDF in the hot path. */
  def firstMatchLookup(text: Column,
      entries: Seq[(String, String)]): (Column, Column) = {
    def chain(pick: ((String, String)) => String): Column =
      entries.foldLeft(Option.empty[Column]) { case (acc, e) =>
        val cond = lower(text).rlike("\\b" + java.util.regex.Pattern.quote(e._1.toLowerCase) + "\\b")
        Some(acc.fold(when(cond, lit(pick(e))))(_.when(cond, lit(pick(e)))))
      }.map(_.otherwise(lit(null: String))).getOrElse(lit(null: String))
    (chain(_._1), chain(_._2))
  }
}
