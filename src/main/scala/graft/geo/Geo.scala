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

  /** One row of the collected polygon dim, ready for expression
    * compilation (rings already dateline-normalized by [[worldDim]]). */
  case class SpatialEntry(country: String, region: String,
      minLon: Double, minLat: Double, maxLon: Double, maxLat: Double,
      rings: Seq[Seq[Seq[Double]]], crosses: Boolean)

  /** Compile a broadcast-sized polygon dim into ONE first-match scalar:
    * a struct-valued CASE chain ordered alphabetically by country, the
    * same shape as [[firstMatchLookup]]. The two-polygon border case
    * resolves inside the expression (first branch wins = alphabetical
    * survivor), so the enrich stage needs no post-join window — at
    * 100 TB the probe side streams through with ZERO shuffle. Each
    * branch is bbox-gated by codegen'd comparisons; the ray-cast UDF
    * runs only on bbox hits, exactly as in the join formulation. */
  def spatialFirstMatch(lonC: Column, latC: Column,
      entries: Seq[SpatialEntry]): Column =
    entries.sortBy(_.country).foldLeft(Option.empty[Column]) { case (acc, e) =>
      // probe longitude in the polygon's frame: [0,360) for
      // dateline-crossing dims, [-180,180] otherwise — codegen'd, no UDF
      val lon =
        if (e.crosses) when(lonC < 0, lonC + 360.0).otherwise(lonC) else lonC
      val cond = lon >= e.minLon && lon <= e.maxLon &&
        latC >= e.minLat && latC <= e.maxLat &&
        pointInRingsUdf(lon, latC, typedlit(e.rings))
      val hit = struct(lit(e.country).as("country"), lit(e.region).as("region"))
      Some(acc.fold(when(cond, hit))(_.when(cond, hit)))
    }.map(_.otherwise(lit(null)))
      .getOrElse(lit(null).cast("struct<country:string,region:string>"))

  /** Total-vertex budget for the literal CASE-chain compilation: under
    * it (the contract's ~258 simplified polygons) every ring embeds in
    * the plan as a `typedlit` and the whole dim is codegen'd branches;
    * past it (real Natural Earth 10m geometry carries ~548k vertices)
    * the literal expression tree would bloat every plan copy and break
    * codegen method-size limits, so [[spatialJoin]] switches to ONE
    * broadcast variable + the same first-match probe — identical
    * semantics and the same shuffle-free executor-streaming shape, with
    * the dim resident once per executor instead of embedded in the
    * plan. GeoSpec pins path equality on a dim straddling the
    * threshold; PlanSpec pins the over-threshold plan staying small. */
  val SpatialLiteralMaxVertices = 20000

  /** Named hit struct for the broadcast probe (field names must match
    * the CASE chain's struct so both paths are drop-in). */
  case class SpatialHit(country: String, region: String)

  /** Broadcast-variable first-match probe for over-threshold dims: the
    * country-sorted entry array ships once per executor via a Spark
    * broadcast; per row, a bbox gate guards the exact ray-cast and the
    * first match wins — the CASE chain's branch order exactly. Null
    * coordinates yield null, matching the chain's null propagation. */
  def spatialFirstMatchBroadcast(s: SparkSession, lonC: Column,
      latC: Column, entries: Seq[SpatialEntry]): Column = {
    val bc = s.sparkContext.broadcast(entries.sortBy(_.country).toArray)
    val probe = udf { (lon: Double, lat: Double) =>
      val arr = bc.value
      var i = 0
      var hit: SpatialHit = null
      while (i < arr.length && hit == null) {
        val e = arr(i)
        val lonF = if (e.crosses && lon < 0) lon + 360.0 else lon
        if (lonF >= e.minLon && lonF <= e.maxLon &&
            lat >= e.minLat && lat <= e.maxLat &&
            pointInRings(lonF, lat, e.rings)) hit = SpatialHit(e.country, e.region)
        i += 1
      }
      hit
    }
    when(lonC.isNotNull && latC.isNotNull, probe(lonC, latC))
  }

  /** Spatial left "join": attach (country, region) where the point falls
    * inside a country polygon; nulls where none claims it. The dim is
    * broadcast-sized by contract (~258 Natural Earth polygons), so
    * instead of a broadcast nested-loop join + dedup shuffle it is
    * collected once at plan time and compiled into the
    * [[spatialFirstMatch]] scalar — shuffle-free, border-deduped by
    * branch order (alphabetically-first country, matching geopandas'
    * tolerated multi-match resolved deterministically). Dims past
    * [[SpatialLiteralMaxVertices]] total vertices switch to the
    * [[spatialFirstMatchBroadcast]] probe — same semantics, plan-size
    * safe for full-resolution geometry. */
  def spatialJoin(points: DataFrame, world: DataFrame,
      lonCol: String, latCol: String): DataFrame = {
    val entries = world
      .select("country", "region", "min_lon", "min_lat", "max_lon",
        "max_lat", "rings", "crosses")
      .collect()
      .map { r =>
        // collected nested arrays are mutable ArraySeqs in Scala 2.13 —
        // normalize to immutable Seq for typedlit/the UDF literal
        val rings = r
          .getAs[collection.Seq[collection.Seq[collection.Seq[Double]]]](6)
          .map(_.map(_.toSeq).toSeq).toSeq
        SpatialEntry(r.getString(0), r.getString(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5),
          rings, r.getBoolean(7))
      }.toSeq
    val totalVertices = entries.iterator.map(_.rings.map(_.size).sum).sum
    val cr =
      if (totalVertices <= SpatialLiteralMaxVertices)
        spatialFirstMatch(col(lonCol), col(latCol), entries)
      else
        spatialFirstMatchBroadcast(points.sparkSession,
          col(lonCol), col(latCol), entries)
    points
      .withColumn("__cr", cr)
      .withColumn("country", col("__cr.country"))
      .withColumn("region", col("__cr.region"))
      .drop("__cr")
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
