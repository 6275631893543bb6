package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.geo.Geo
import graft.enrich.Enrich

class GeoSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  val square: Seq[Seq[Seq[Double]]] =
    Seq(Seq(Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(10.0, 10.0), Seq(0.0, 10.0),
      Seq(0.0, 0.0)))

  test("ray-cast: simple polygon membership") {
    assert(Geo.pointInRings(5, 5, square))
    assert(!Geo.pointInRings(15, 5, square))
    assert(!Geo.pointInRings(-1, -1, square))
  }

  test("ray-cast: hole via even-odd parity") {
    val withHole = square ++ Seq(Seq(
      Seq(4.0, 4.0), Seq(6.0, 4.0), Seq(6.0, 6.0), Seq(4.0, 6.0),
      Seq(4.0, 4.0)))
    assert(Geo.pointInRings(2, 2, withHole))   // in outer, not in hole
    assert(!Geo.pointInRings(5, 5, withHole))  // inside the hole
  }

  test("ray-cast: multipolygon = multiple outer rings") {
    val multi = square ++ Seq(Seq(
      Seq(20.0, 20.0), Seq(30.0, 20.0), Seq(30.0, 30.0), Seq(20.0, 30.0),
      Seq(20.0, 20.0)))
    assert(Geo.pointInRings(25, 25, multi))
    assert(Geo.pointInRings(5, 5, multi))
    assert(!Geo.pointInRings(15, 15, multi))
  }

  test("ray-cast: concave polygon") {
    // U-shape: the notch (5,6) is outside
    val u = Seq(Seq(Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(10.0, 10.0),
      Seq(7.0, 10.0), Seq(7.0, 3.0), Seq(3.0, 3.0), Seq(3.0, 10.0),
      Seq(0.0, 10.0), Seq(0.0, 0.0)))
    assert(!Geo.pointInRings(5, 6, u))
    assert(Geo.pointInRings(1.5, 5, u))
    assert(Geo.pointInRings(8.5, 5, u))
  }

  test("ray-cast: dateline-crossing polygon (Fiji-like) matched on both sides of ±180") {
    val fiji = Seq(Seq(
      Seq(179.0, -10.0), Seq(-179.0, -10.0), Seq(-179.0, 10.0),
      Seq(179.0, 10.0), Seq(179.0, -10.0)))
    assert(Geo.crossesDateline(fiji))
    assert(Geo.pointInRingsGeo(179.5, 0.0, fiji))   // west of the line
    assert(Geo.pointInRingsGeo(-179.5, 0.0, fiji))  // east of the line
    assert(!Geo.pointInRingsGeo(178.0, 0.0, fiji))
    assert(!Geo.pointInRingsGeo(0.0, 0.0, fiji))
    // a normal polygon is untouched by the dateline path
    assert(!Geo.crossesDateline(square))
    assert(Geo.pointInRingsGeo(5.0, 5.0, square))
  }

  test("spatial join resolves dateline-crossing dims via the normalized frame") {
    val world = Geo.worldDim(spark, Seq(
      ("Fiji", "Oceania", Seq(Seq(
        Seq(179.0, -10.0), Seq(-179.0, -10.0), Seq(-179.0, 10.0),
        Seq(179.0, 10.0), Seq(179.0, -10.0)))),
      ("Alpha", "R1", square)))
    val pts = Seq(
      (1L, 179.5, 0.0), (2L, -179.5, 0.0), (3L, 178.0, 0.0), (4L, 5.0, 5.0)
    ).toDF("id", "lon", "lat")
    val got = Geo.spatialJoin(pts, world, "lon", "lat")
      .select("id", "country").as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("Fiji"))
    assert(got(2L).contains("Fiji"))
    assert(got(3L).isEmpty)
    assert(got(4L).contains("Alpha"))
  }

  test("spatial join: left semantics, bbox prefilter, border dedup") {
    val world = Geo.worldDim(spark, Seq(
      ("Alpha", "R1", square),
      // overlapping polygon sharing territory with Alpha around (9..12)
      ("Beta", "R2", Seq(Seq(Seq(9.0, 0.0), Seq(20.0, 0.0), Seq(20.0, 10.0),
        Seq(9.0, 10.0), Seq(9.0, 0.0))))))
    val pts = Seq(
      (1L, 5.0, 5.0),    // Alpha only
      (2L, 9.5, 5.0),    // overlap → dedup keeps alphabetically-first Alpha
      (3L, 15.0, 5.0),   // Beta only
      (4L, 50.0, 50.0)   // no match → nulls kept (left join)
    ).toDF("id", "lon", "lat")
    val got = Geo.spatialJoin(pts, world, "lon", "lat")
      .select("id", "country").as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("Alpha"))
    assert(got(2L).contains("Alpha"))
    assert(got(3L).contains("Beta"))
    assert(got(4L).isEmpty)
  }

  test("property: compiled spatial scalar == pure-Scala reference on adversarial edge/dateline points") {
    // Generator: points within ±ε of every ring edge, on vertices, and
    // hugging the dateline — the coordinates where bbox comparisons and
    // the ray-cast division sit exactly on branch boundaries. The pin
    // is DETERMINISM of the full compiled path (frame-shift column,
    // bbox gate, typedlit ring literals, first-match CASE order)
    // against an independent Scala evaluation of the same semantics:
    // first alphabetical dim whose bbox AND ray-cast accept the point.
    val rnd = new scala.util.Random(20260813L)
    val dims: Seq[(String, String, Seq[Seq[Seq[Double]]])] = Seq(
      // Fiji-like dateline crosser with a hole straddling ±180
      ("Fiji", "Oceania", Seq(
        Seq(Seq(179.0, -10.0), Seq(-179.0, -10.0), Seq(-179.0, 10.0),
          Seq(179.0, 10.0), Seq(179.0, -10.0)),
        Seq(Seq(179.8, -2.0), Seq(-179.8, -2.0), Seq(-179.8, 2.0),
          Seq(179.8, 2.0), Seq(179.8, -2.0)))),
      // concave polygon (notch) away from the dateline
      ("Notch", "R1", Seq(Seq(
        Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(10.0, 10.0), Seq(5.0, 5.0),
        Seq(0.0, 10.0), Seq(0.0, 0.0)))),
      // two overlapping squares exercising border first-match dedup
      ("Alpha", "R2", Seq(Seq(
        Seq(3.0, -8.0), Seq(12.0, -8.0), Seq(12.0, -1.0),
        Seq(3.0, -1.0), Seq(3.0, -8.0)))),
      ("Beta", "R3", Seq(Seq(
        Seq(9.0, -8.0), Seq(20.0, -8.0), Seq(20.0, -1.0),
        Seq(9.0, -1.0), Seq(9.0, -8.0)))))
    val world = Geo.worldDim(spark, dims)
    // normalized entries, exactly as spatialJoin collects them
    val entries = dims.map { case (c, r, raw) =>
      val crosses = Geo.crossesDateline(raw)
      val rings = if (crosses)
        raw.map(_.map(p => Seq(if (p(0) < 0) p(0) + 360.0 else p(0), p(1))))
      else raw
      (c, r, rings, crosses)
    }
    def reference(lon: Double, lat: Double): Option[(String, String)] =
      entries.sortBy(_._1).find { case (_, _, rings, crosses) =>
        val lon2 = if (crosses && lon < 0) lon + 360.0 else lon
        val pts = rings.flatten
        lon2 >= pts.map(_(0)).min && lon2 <= pts.map(_(0)).max &&
          lat >= pts.map(_(1)).min && lat <= pts.map(_(1)).max &&
          Geo.pointInRings(lon2, lat, rings)
      }.map(e => (e._1, e._2))
    val eps = Seq(-1e-6, -1e-9, 0.0, 1e-9, 1e-6)
    val edgePoints = dims.flatMap(_._3).flatMap { ring =>
      ring.indices.dropRight(1).flatMap { i =>
        val (x1, y1) = (ring(i)(0), ring(i)(1))
        val (x2, y2) = (ring(i + 1)(0), ring(i + 1)(1))
        // a point along the segment ± a perpendicular nudge, plus the
        // exact vertex (the classic ray-cast corner case)
        val t = rnd.nextDouble()
        val (px, py) = (x1 + t * (x2 - x1), y1 + t * (y2 - y1))
        val len = math.max(math.hypot(x2 - x1, y2 - y1), 1e-12)
        val (nx, ny) = (-(y2 - y1) / len, (x2 - x1) / len)
        eps.flatMap(e => Seq((px + e * nx, py + e * ny))) :+ ((x1, y1))
      }
    }
    val datelinePoints = Seq(-180.0, 180.0, 179.999999, -179.999999,
      180.0 - 1e-9, -180.0 + 1e-9).flatMap { lon =>
      Seq(-12.0, -10.0, 0.0, 1.9999999, 2.0, 10.0, 10.0 + 1e-9).map((lon, _))
    }
    val pts = (edgePoints ++ datelinePoints).zipWithIndex
      .map { case ((lon, lat), i) => (i.toLong, lon, lat) }
    val got = Geo.spatialJoin(pts.toDF("id", "lon", "lat"), world, "lon", "lat")
      .select("id", "country", "region")
      .collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).map((_, r.getString(2))))
      .toMap
    pts.foreach { case (id, lon, lat) =>
      assert(got(id) == reference(lon, lat),
        s"point ($lon, $lat): compiled=${got(id)} reference=${reference(lon, lat)}")
    }
    assert(pts.size > 150 && got.values.flatten.nonEmpty,
      "generator must produce matches, not a vacuous all-null sweep")
  }

  test("firstMatchLookup: order wins, word boundaries hold (Niger/Nigeria trap)") {
    val list = Seq("niger" -> "Africa", "nigeria" -> "Africa2", "new zealand" -> "Oceania")
    val (nm, _) = Geo.firstMatchLookup(col("place"), list)
    val got = Seq(
      "10 km SW of Lagos, Nigeria",  // must match nigeria, NOT niger (\b)
      "Niamey, Niger region",
      "off coast of New Zealand",
      "somewhere else")
      .toDF("place").select(nm.as("m")).as[Option[String]].collect()
    assert(got.toSeq == Seq(Some("nigeria"), Some("niger"), Some("new zealand"), None))
  }

  test("firstMatchLookup scales to the full Natural-Earth-sized country list (258 entries)") {
    // deep when-chains can exceed codegen method limits; Spark must
    // split or fall back without error, and semantics must hold
    val entries = (0 until 257).map(i => (s"country$i", s"region${i % 5}")) :+
      ("alaska" -> "Americas")
    val (nm, _) = Geo.firstMatchLookup(col("place"), entries)
    val got = Seq("near country42 ridge", "off alaska coast", "nowhere")
      .toDF("place").select(nm.as("m")).as[Option[String]].collect()
    assert(got.toSeq == Seq(Some("country42"), Some("alaska"), None))
  }

  test("spatial join honors holes and multipolygons through the dim path") {
    val holed = square ++ Seq(Seq(
      Seq(4.0, 4.0), Seq(6.0, 4.0), Seq(6.0, 6.0), Seq(4.0, 6.0),
      Seq(4.0, 4.0))) ++ Seq(Seq( // second outer ring (multipolygon part)
      Seq(20.0, 20.0), Seq(30.0, 20.0), Seq(30.0, 30.0), Seq(20.0, 30.0),
      Seq(20.0, 20.0)))
    val world = Geo.worldDim(spark, Seq(("Holey", "R", holed)))
    val pts = Seq(
      (1L, 2.0, 2.0),   // outer ring, not hole → match
      (2L, 5.0, 5.0),   // inside the hole → no match
      (3L, 25.0, 25.0)  // second polygon part → match
    ).toDF("id", "lon", "lat")
    val got = Geo.spatialJoin(pts, world, "lon", "lat")
      .select("id", "country").as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("Holey"))
    assert(got(2L).isEmpty)
    assert(got(3L).contains("Holey"))
  }

  test("spatialFirstMatch scales to a Natural-Earth-sized dim (258 polygons) without codegen failure") {
    // 258 branches, each with a bbox gate + ray-cast UDF over a ring
    // literal: deep CASE chains must split/fall back cleanly
    val entries = (0 until 258).map { i =>
      val lon0 = (i % 36) * 10.0 - 180.0
      val lat0 = (i / 36) * 10.0 - 40.0
      ("c%03d".format(i), s"r${i % 7}", Seq(Seq(
        Seq(lon0, lat0), Seq(lon0 + 9.0, lat0), Seq(lon0 + 9.0, lat0 + 9.0),
        Seq(lon0, lat0 + 9.0), Seq(lon0, lat0))))
    }
    val world = Geo.worldDim(spark, entries)
    val pts = Seq(
      (1L, -175.5, -35.5),  // cell (0,0) → c000
      (2L, 144.5, 28.5),    // i = 6*36 + 32 = 248 → c248
      (3L, -175.5, 45.0)    // above all lat bands → null
    ).toDF("id", "lon", "lat")
    val got = Geo.spatialJoin(pts, world, "lon", "lat")
      .select("id", "country").as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("c000"))
    assert(got(2L).contains("c248"))
    assert(got(3L).isEmpty)
  }

  test("spatial join at full-resolution scale: 500 polygons / 50k vertices switch to the broadcast probe, same results, bounded plan") {
    // 500 polygons × 102 vertices each = 51k vertices — past the
    // SpatialLiteralMaxVertices boundary the literal CASE chain is
    // built for (real Natural Earth 10m geometry territory). Each
    // polygon is a 100-gon approximating a circle: the ray-cast does
    // real work on every vertex, not a 5-point square.
    def ngon(cx: Double, cy: Double, r: Double): Seq[Seq[Double]] = {
      val pts = (0 until 100).map { k =>
        val a = 2 * math.Pi * k / 100
        Seq(cx + r * math.cos(a), cy + r * math.sin(a))
      }
      pts :+ pts.head
    }
    val entries = (0 until 500).map { i =>
      val cx = (i % 50) * 7.0 - 172.0
      val cy = (i / 50) * 8.0 - 36.0
      ("c%03d".format(i), s"r${i % 7}", Seq(ngon(cx, cy, 3.0)))
    }
    val world = Geo.worldDim(spark, entries)
    assert(entries.map(_._3.map(_.size).sum).sum > Geo.SpatialLiteralMaxVertices,
      "fixture must exceed the literal-compilation budget")
    val pts = Seq[(Long, java.lang.Double, java.lang.Double)](
      (1L, -172.0, -36.0), // center of c000
      (2L, -172.0 + 2.9, -36.0), // inside c000, near the rim
      (3L, -172.0 + 3.6, -36.0), // between circles → null
      (4L, 171.0, 36.0), // center of c499: 49*7-172=171, 9*8-36=36
      (5L, null, 10.0) // null lon → null
    ).toDF("id", "lon", "lat")
    val joined = Geo.spatialJoin(pts, world, "lon", "lat")
    val got = joined.select("id", "country")
      .as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("c000") && got(2L).contains("c000"))
    assert(got(3L).isEmpty && got(5L).isEmpty)
    assert(got(4L).contains("c499"))
    // the plan must NOT embed the 51k vertices as literals: the
    // broadcast path's plan stays orders of magnitude below the
    // literal chain's footprint (the PlanSpec-style gate on the
    // expression-tree size boundary)
    val planChars = joined.queryExecution.optimizedPlan.toString.length
    assert(planChars < 100 * 1000,
      s"over-threshold dim must not inline ring literals: plan=$planChars chars")
    // path EQUALITY on the same dim: the literal chain (forced) and the
    // broadcast probe agree point-for-point, including nulls
    val sample = Seq((10L, -170.5, -34.2), (11L, -100.0, 20.0),
      (12L, 171.4, 36.9), (13L, 0.0, 0.5)).toDF("id", "lon", "lat")
    val es = entries.map { case (c, r, rr) =>
      val flat = rr.flatten
      Geo.SpatialEntry(c, r, flat.map(_(0)).min, flat.map(_(1)).min,
        flat.map(_(0)).max, flat.map(_(1)).max, rr, crosses = false)
    }
    val viaLiteral = sample
      .withColumn("cr", Geo.spatialFirstMatch(col("lon"), col("lat"), es))
      .select(col("id"), col("cr.country")).as[(Long, Option[String])]
      .collect().toMap
    val viaBroadcast = sample
      .withColumn("cr",
        Geo.spatialFirstMatchBroadcast(spark, col("lon"), col("lat"), es))
      .select(col("id"), col("cr.country")).as[(Long, Option[String])]
      .collect().toMap
    assert(viaLiteral == viaBroadcast,
      s"paths diverge: $viaLiteral vs $viaBroadcast")
  }

  test("enrich composite: spatial first, regex fallback fills the rest (add_region.py:50-61)") {
    val world = Geo.worldDim(spark, Seq(("Alpha", "R1", square)))
    val ev = Seq(
      (1L, 5.0, 5.0, "no names here"),       // spatial hit
      (2L, 50.0, 50.0, "near alpha ridge"),  // fallback hit via place text
      (3L, 50.0, 50.0, "nothing")            // stays null
    ).toDF("id", "lon", "lat", "place")
    val got = Enrich.addCountryRegion(ev, world,
        Seq("alpha" -> "R1"), "lon", "lat", "place")
      .select("id", "country").as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("Alpha"))
    assert(got(2L).contains("alpha"))
    assert(got(3L).isEmpty)
  }
}
