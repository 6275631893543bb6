package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native ESRI Shapefile (.shp) polygon-record reader — the geometry
  * half of the shapefile whose attribute half [[Dbf]] reads
  * (reference pipeline/add_region.py:23 loads ne_10m_admin_0_countries
  * via geopandas; the actual .shp is absent from the reference repo —
  * `.MISSING_LARGE_BLOBS` — so this parses the PUBLIC spec, not that
  * file). Format per the ESRI Shapefile Technical Description (1998):
  * 100-byte header (big-endian file code 9994 + file length in 16-bit
  * words; little-endian shape type + bbox), then records of a
  * big-endian (record number, content length) pair followed by
  * little-endian content. Shape types handled: 0 (Null — empty
  * geometry, kept as an empty ring list so record order still pairs
  * with .dbf rows), 5 (Polygon), 15/25 (PolygonZ/M — XY parsed, Z/M
  * sections ignored). Parts split the point array into rings; ring
  * orientation (CW outer / CCW hole) is irrelevant downstream because
  * [[graft.geo.Geo.pointInRings]] is an even-odd ray-cast.
  *
  * Scale posture: like the .dbf, a .shp is a DIMENSION file by
  * construction (polygon dims; fact-side geometry arrives as
  * columnar point data, never as shapefiles), so it parses on the
  * driver — where a broadcast dim originates — and becomes an
  * ordinary DataFrame; a one-time parquet conversion (S8) makes every
  * later read columnar.
  */
object Shp {

  /** Rings of one record: ring → point → (lon, lat). */
  type Rings = Seq[Seq[Seq[Double]]]

  /** Parse the .shp at `path` into (record number, rings) pairs in
    * file order — record N pairs with .dbf row N−1. Malformed-tolerance
    * follows S3's semantics (reference fetch_data.py skips rows it
    * can't parse): a record whose shape type is not Null/Polygon(Z/M)
    * is KEPT with empty rings and logged, so the positional pairing
    * with .dbf rows survives a mixed-type file; a record whose declared
    * content length is negative, sub-minimal, or runs past the header's
    * file length fails LOUDLY — that is file corruption, not a
    * tolerable row, and silently mis-seeking would desync every
    * subsequent record. Content length arithmetic is Long throughout
    * (a hostile 32-bit word count otherwise overflows Int and walks
    * `off` backwards into an infinite loop).
    *
    * Tolerance accounting: each unsupported-type record appends a
    * structured line to `logPath`'s [[LogSink]] when given (the
    * durable channel — stderr vanishes on a cluster; without a path
    * the event still lands in the driver log via slf4j), and a file
    * whose EVERY non-Null record is unsupported fails loudly — a
    * wholly-wrong-typed file (point/polyline data fed to a polygon
    * reader) must not load as all-empty geometry. */
  def readRecords(path: String): Seq[(Int, Rings)] =
    readRecords(path, None)

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.ingest.Shp")

  /** Per-file cap on individually-logged skips: a wholly-wrong-typed
    * file with millions of records must not pay one open-append-close
    * log write per record on its way to the loud failure — the tail
    * is summarized in one closing line instead. */
  private val MaxLoggedSkips = 100

  def readRecords(path: String, logPath: Option[String]): Seq[(Int, Rings)] = {
    var tolerated = 0
    var nulls = 0
    def emit(msg: String): Unit = logPath match {
      case Some(lp) => LogSink.event(lp, "shp_skip", "tolerated", msg)
      case None => log.warn(msg)
    }
    def skip(recNo: Int, t: Int): Unit = {
      tolerated += 1
      if (tolerated <= MaxLoggedSkips)
        emit(s"$path record $recNo: shape type $t unsupported " +
          "(polygons only) — keeping record with empty geometry to " +
          "preserve .dbf pairing")
    }
    val bytes = Files.readAllBytes(Paths.get(path))
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(be.getInt(0) == 9994, s"$path: not a shapefile (bad magic)")
    val fileLenBytes = be.getInt(24).toLong * 2
    require(fileLenBytes <= bytes.length,
      s"$path: header claims $fileLenBytes bytes, file has ${bytes.length}")
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = Seq.newBuilder[(Int, Rings)]
    var off = 100L
    while (off + 8 <= fileLenBytes) {
      val recNo = be.getInt(off.toInt)
      val contentBytes = be.getInt(off.toInt + 4).toLong * 2
      require(contentBytes >= 4 && off + 8 + contentBytes <= fileLenBytes,
        s"$path record $recNo: content length $contentBytes bytes at " +
          s"offset $off runs outside the file (len $fileLenBytes)")
      val c = (off + 8).toInt
      val shapeType = le.getInt(c)
      val rings: Rings = shapeType match {
        case 0 => nulls += 1; Seq.empty
        case 5 | 15 | 25 =>
          // the part/point counts live at content bytes 36..44 — the
          // declared content must cover them BEFORE they are read, or
          // a truncated record would index past the buffer (raw
          // IndexOutOfBounds) or silently read the next record's bytes
          require(contentBytes >= 44,
            s"$path record $recNo: polygon record content $contentBytes " +
              "bytes < 44-byte minimum (type+box+counts)")
          val numParts = le.getInt(c + 36)
          val numPoints = le.getInt(c + 40)
          require(numParts >= 0 && numPoints >= 0 &&
            44L + 4L * numParts + 16L * numPoints <= contentBytes,
            s"$path record $recNo: $numParts parts / $numPoints points " +
              s"exceed declared content ($contentBytes bytes)")
          val partsOff = c + 44
          val pointsOff = partsOff + 4 * numParts
          val parts = (0 until numParts).map(i => le.getInt(partsOff + 4 * i))
          require(parts.isEmpty ||
            (parts.head == 0 && parts.forall(p => p >= 0 && p <= numPoints) &&
              parts.zip(parts.tail).forall { case (a, b) => a <= b }),
            s"$path record $recNo: part index array not monotone in range")
          val bounds = parts :+ numPoints
          (0 until numParts).map { p =>
            (bounds(p) until bounds(p + 1)).map { i =>
              Seq(le.getDouble(pointsOff + 16 * i),
                le.getDouble(pointsOff + 16 * i + 8))
            }
          }
        case t =>
          skip(recNo, t)
          Seq.empty
      }
      out += ((recNo, rings))
      off = off + 8 + contentBytes
    }
    val recs = out.result()
    if (tolerated > MaxLoggedSkips)
      emit(s"$path: ${tolerated - MaxLoggedSkips} further unsupported-type " +
        s"records tolerated (first $MaxLoggedSkips logged individually)")
    // denominator excludes Null shapes: Null is a legal member of ANY
    // shapefile type, so a wrong-typed file that happens to carry a few
    // Null records must still fail — the tolerance is for files whose
    // POLYGON content is merely mixed with something else
    val nonNull = recs.size - nulls
    if (nonNull > 0 && tolerated == nonNull)
      sys.error(s"$path: all $nonNull non-Null records are unsupported " +
        "shape types — not a polygon shapefile (tolerance covers MIXED " +
        "files, not wholly-wrong-typed ones)")
    recs
  }

  private val ringsType =
    ArrayType(ArrayType(ArrayType(DoubleType, false), false), false)

  /** The .shp as a DataFrame: (rec_no long, rings
    * array<array<array<double>>>), file record order preserved. */
  def read(spark: SparkSession, path: String,
      logPath: Option[String] = None): DataFrame = {
    val rows = readRecords(path, logPath).map { case (n, rings) =>
      Row(n.toLong, rings.map(_.map(p => p)).asInstanceOf[Seq[Any]])
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("rec_no", LongType, false),
        StructField("rings", ringsType, false))))
  }

  /** The full shapefile pair as one DataFrame: .dbf attributes plus a
    * `rings` geometry column, zipped by record order (the format's
    * contract: .shp record N ↔ .dbf row N). `base` is the path without
    * extension. */
  def readWithAttributes(spark: SparkSession, base: String,
      logPath: Option[String] = None): DataFrame = {
    val geo = readRecords(s"$base.shp", logPath)
    val attrs = Dbf.read(spark, s"$base.dbf")
    val attrRows = attrs.collect() // one job; row count checked below
    require(attrRows.length == geo.length,
      s"$base: .dbf rows ${attrRows.length} != .shp records ${geo.length}")
    val schema = StructType(attrs.schema.fields :+
      StructField("rings", ringsType, false))
    val rows = attrRows.zip(geo).map { case (r, (_, rings)) =>
      Row.fromSeq(r.toSeq :+ rings)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
  }

  /** Deep-convert a Row's nested array column into immutable [[Rings]]
    * (Spark hands back mutable ArraySeq at every nesting level). */
  def ringsAt(row: Row, field: String): Rings =
    row.getAs[scala.collection.Seq[Any]](field).toSeq.map(
      _.asInstanceOf[scala.collection.Seq[Any]].toSeq.map(
        _.asInstanceOf[scala.collection.Seq[Double]].toSeq))

  /** Country-dim entries for [[graft.geo.Geo.worldDim]] straight from a
    * shapefile: pick the name/region attribute columns, drop records
    * with empty geometry (Null shapes). This closes S7 end-to-end: real
    * .shp + .dbf → the same (country, region, rings) triples the
    * synthetic fixtures provide. */
  def worldEntries(spark: SparkSession, base: String,
      nameCol: String, regionCol: String)
      : Seq[(String, String, Seq[Seq[Seq[Double]]])] = {
    val df = readWithAttributes(spark, base)
    df.select(nameCol, regionCol, "rings").collect().toSeq
      .map(r => (r.getString(0), r.getString(1), ringsAt(r, "rings")))
      .filter(_._3.nonEmpty)
  }
}
