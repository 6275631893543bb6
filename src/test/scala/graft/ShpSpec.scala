package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.Geo
import graft.ingest.Shp

/** S7 end-to-end: a REAL binary shapefile pair (.shp polygon records +
  * .dbf attributes, written byte-for-byte to the public ESRI/dBASE
  * specs by this suite) parses into the same worldDim entries the
  * synthetic fixtures provide, and spatialJoin over it enriches
  * identically. */
class ShpSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  // ---- tiny binary writers (spec-conformant fixtures, not parsers) ----

  private def writeShp(path: Path,
      recs: Seq[Seq[Seq[(Double, Double)]]]): Unit = {
    def recContentLen(rings: Seq[Seq[(Double, Double)]]): Int = {
      val numPoints = rings.map(_.length).sum
      4 + 32 + 4 + 4 + 4 * rings.length + 16 * numPoints
    }
    val fileLen = 100 + recs.map(r => 8 + recContentLen(r)).sum
    val bb = ByteBuffer.allocate(fileLen)
    bb.order(ByteOrder.BIG_ENDIAN)
    bb.putInt(0, 9994)
    bb.putInt(24, fileLen / 2)
    bb.order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(28, 1000) // version
    bb.putInt(32, 5)    // polygon
    val allPts = recs.flatten.flatten
    bb.putDouble(36, allPts.map(_._1).min); bb.putDouble(44, allPts.map(_._2).min)
    bb.putDouble(52, allPts.map(_._1).max); bb.putDouble(60, allPts.map(_._2).max)
    var off = 100
    recs.zipWithIndex.foreach { case (rings, i) =>
      val content = recContentLen(rings)
      bb.order(ByteOrder.BIG_ENDIAN)
      bb.putInt(off, i + 1); bb.putInt(off + 4, content / 2)
      bb.order(ByteOrder.LITTLE_ENDIAN)
      val c = off + 8
      bb.putInt(c, 5)
      val pts = rings.flatten
      bb.putDouble(c + 4, pts.map(_._1).min); bb.putDouble(c + 12, pts.map(_._2).min)
      bb.putDouble(c + 20, pts.map(_._1).max); bb.putDouble(c + 28, pts.map(_._2).max)
      bb.putInt(c + 36, rings.length)
      bb.putInt(c + 40, pts.length)
      val partsOff = c + 44
      rings.indices.foldLeft(0) { (start, r) =>
        bb.putInt(partsOff + 4 * r, start); start + rings(r).length
      }
      val pOff = partsOff + 4 * rings.length
      pts.zipWithIndex.foreach { case ((x, y), j) =>
        bb.putDouble(pOff + 16 * j, x); bb.putDouble(pOff + 16 * j + 8, y)
      }
      off = c + content
    }
    Files.write(path, bb.array())
  }

  private def writeDbf(path: Path, fields: Seq[(String, Int)],
      rows: Seq[Seq[String]]): Unit = {
    val headerSize = 32 + 32 * fields.length + 1
    val recordSize = 1 + fields.map(_._2).sum
    val bb = ByteBuffer.allocate(headerSize + recordSize * rows.length + 1)
    bb.order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0, 0x03.toByte)
    bb.putInt(4, rows.length)
    bb.putShort(8, headerSize.toShort)
    bb.putShort(10, recordSize.toShort)
    fields.zipWithIndex.foreach { case ((name, len), i) =>
      val off = 32 + 32 * i
      name.getBytes("US-ASCII").take(10).zipWithIndex
        .foreach { case (b, j) => bb.put(off + j, b) }
      bb.put(off + 11, 'C'.toByte)
      bb.put(off + 16, len.toByte)
    }
    bb.put(32 + 32 * fields.length, 0x0D.toByte)
    rows.zipWithIndex.foreach { case (r, i) =>
      var off = headerSize + recordSize * i
      bb.put(off, 0x20.toByte); off += 1
      r.zip(fields).foreach { case (v, (_, len)) =>
        val padded = v.padTo(len, ' ').take(len)
        padded.getBytes("US-ASCII").zipWithIndex
          .foreach { case (b, j) => bb.put(off + j, b) }
        off += len
      }
    }
    bb.put(bb.capacity() - 1, 0x1A.toByte)
    Files.write(path, bb.array())
  }

  // square with a hole (2 rings, one part list) + a 2-part multipolygon
  private val holeyRings: Seq[Seq[(Double, Double)]] = Seq(
    Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)),
    Seq((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)))
  private val multiRings: Seq[Seq[(Double, Double)]] = Seq(
    Seq((20.0, 0.0), (25.0, 0.0), (25.0, 5.0), (20.0, 5.0), (20.0, 0.0)),
    Seq((30.0, 0.0), (35.0, 0.0), (35.0, 5.0), (30.0, 5.0), (30.0, 0.0)))

  private def toEntryRings(r: Seq[Seq[(Double, Double)]]): Seq[Seq[Seq[Double]]] =
    r.map(_.map(p => Seq(p._1, p._2)))

  private lazy val base: String = {
    val dir = Files.createTempDirectory("graft_shp")
    writeShp(dir.resolve("world.shp"), Seq(holeyRings, multiRings))
    writeDbf(dir.resolve("world.dbf"),
      Seq(("NAME", 16), ("REGION", 16)),
      Seq(Seq("Holey", "R1"), Seq("Multi", "R2")))
    dir.resolve("world").toString
  }

  test("shp reader: PolygonZ records parse XY and skip the Z/M sections via the content length") {
    import java.nio.{ByteBuffer, ByteOrder}
    val ring = Seq((1.0, 1.0), (4.0, 1.0), (4.0, 4.0), (1.0, 4.0), (1.0, 1.0))
    val np = ring.length
    // type-15 content: type + box + parts/points + parts + XY points +
    // Z range + Z values + (optional) M range + M values
    val content = 4 + 32 + 8 + 4 + 16 * np + (16 + 8 * np) + (16 + 8 * np)
    val fileLen = 100 + 8 + content
    val bb = ByteBuffer.allocate(fileLen)
    bb.order(ByteOrder.BIG_ENDIAN)
    bb.putInt(0, 9994); bb.putInt(24, fileLen / 2)
    bb.order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(28, 1000); bb.putInt(32, 15)
    bb.order(ByteOrder.BIG_ENDIAN)
    bb.putInt(100, 1); bb.putInt(104, content / 2)
    bb.order(ByteOrder.LITTLE_ENDIAN)
    val c = 108
    bb.putInt(c, 15)
    bb.putDouble(c + 4, 1.0); bb.putDouble(c + 12, 1.0)
    bb.putDouble(c + 20, 4.0); bb.putDouble(c + 28, 4.0)
    bb.putInt(c + 36, 1); bb.putInt(c + 40, np)
    bb.putInt(c + 44, 0)
    val pOff = c + 48
    ring.zipWithIndex.foreach { case ((x, y), j) =>
      bb.putDouble(pOff + 16 * j, x); bb.putDouble(pOff + 16 * j + 8, y)
    }
    // Z/M sections deliberately non-zero garbage the parser must skip
    val zOff = pOff + 16 * np
    (0 until (2 + np + 2 + np)).foreach(j =>
      bb.putDouble(zOff + 8 * j, 99.0 + j))
    val dir = Files.createTempDirectory("graft_shpz")
    Files.write(dir.resolve("z.shp"), bb.array())
    val recs = Shp.readRecords(dir.resolve("z.shp").toString)
    assert(recs == Seq((1, Seq(ring.map(p => Seq(p._1, p._2))))))
  }

  test("shp reader: records, parts and ring points round-trip the binary format") {
    val recs = Shp.readRecords(s"$base.shp")
    assert(recs.map(_._1) == Seq(1, 2))
    assert(recs(0)._2 == toEntryRings(holeyRings))
    assert(recs(1)._2 == toEntryRings(multiRings))
  }

  test("shp + dbf zip by record order into attributed geometry") {
    val df = Shp.readWithAttributes(spark, base)
    val rows = df.orderBy("NAME").collect()
    assert(rows.map(_.getAs[String]("NAME")).toSeq == Seq("Holey", "Multi"))
    assert(Shp.ringsAt(rows(0), "rings").length == 2)
    assert(Shp.ringsAt(rows(1), "rings").head.head == Seq(20.0, 0.0))
  }

  // ---- adversarial robustness (verdict r9 item 5 / ADVICE low) ----

  /** A header-only buffer claiming `fileLenWords` 16-bit words. */
  private def headerBytes(totalBytes: Int, fileLenWords: Int): ByteBuffer = {
    val bb = ByteBuffer.allocate(totalBytes)
    bb.order(ByteOrder.BIG_ENDIAN)
    bb.putInt(0, 9994); bb.putInt(24, fileLenWords)
    bb.order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(28, 1000); bb.putInt(32, 5)
    bb
  }

  private def writeTo(name: String, bb: ByteBuffer): String = {
    val dir = Files.createTempDirectory("graft_shp_adv")
    val p = dir.resolve(name)
    Files.write(p, bb.array())
    p.toString
  }

  test("shp reader: negative record content length fails loudly, no infinite loop") {
    val bb = headerBytes(120, 60)
    bb.order(ByteOrder.BIG_ENDIAN)
    bb.putInt(100, 1)
    bb.putInt(104, Int.MinValue / 2) // *2 in Int would overflow to 0/negative
    val e = intercept[IllegalArgumentException] {
      Shp.readRecords(writeTo("neg.shp", bb))
    }
    assert(e.getMessage.contains("content length"))
  }

  test("shp reader: content length past the header's file length fails loudly") {
    val bb = headerBytes(120, 60)
    bb.order(ByteOrder.BIG_ENDIAN)
    bb.putInt(100, 1)
    bb.putInt(104, 1 << 28) // ~512 MB claimed in a 120-byte file
    val e = intercept[IllegalArgumentException] {
      Shp.readRecords(writeTo("huge.shp", bb))
    }
    assert(e.getMessage.contains("runs outside the file"))
  }

  test("shp reader: header length exceeding the physical file fails loudly") {
    val bb = headerBytes(100, 5000)
    val e = intercept[IllegalArgumentException] {
      Shp.readRecords(writeTo("trunc.shp", bb))
    }
    assert(e.getMessage.contains("header claims"))
  }

  test("shp reader: polygon record with sub-minimal content length fails loudly before reading counts") {
    // shapeType=5 but only 8 bytes of content — the 44-byte minimum
    // (type+box+counts) is checked BEFORE numParts/numPoints are read,
    // so a truncated tail record raises the loud require, never a raw
    // IndexOutOfBounds or a silent read into the next record
    val content = 8
    val bb = headerBytes(100 + 8 + content, (100 + 8 + content) / 2)
    bb.order(ByteOrder.BIG_ENDIAN)
    bb.putInt(100, 1); bb.putInt(104, content / 2)
    bb.order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(108, 5)
    val e = intercept[IllegalArgumentException] {
      Shp.readRecords(writeTo("tiny.shp", bb))
    }
    assert(e.getMessage.contains("44-byte minimum"))
  }

  test("shp reader: point/part counts exceeding declared content fail loudly") {
    // declare a minimal polygon record but claim a billion points
    val content = 4 + 32 + 8 + 4 // type+box+counts+one part index, no points
    val bb = headerBytes(100 + 8 + content, (100 + 8 + content) / 2)
    bb.order(ByteOrder.BIG_ENDIAN)
    bb.putInt(100, 1); bb.putInt(104, content / 2)
    bb.order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(108, 5)
    bb.putInt(108 + 36, 1)
    bb.putInt(108 + 40, 1000000000)
    bb.putInt(108 + 44, 0)
    val e = intercept[IllegalArgumentException] {
      Shp.readRecords(writeTo("count.shp", bb))
    }
    assert(e.getMessage.contains("exceed declared content"))
  }

  test("shp reader: unsupported shape type is kept as empty geometry (dbf pairing preserved)") {
    // record 1: point (type 1, 20 bytes content); record 2: real polygon
    val ring = Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 0.0))
    val polyContent = 4 + 32 + 8 + 4 + 16 * ring.length
    val fileLen = 100 + (8 + 20) + (8 + polyContent)
    val bb = headerBytes(fileLen, fileLen / 2)
    bb.order(ByteOrder.BIG_ENDIAN)
    bb.putInt(100, 1); bb.putInt(104, 10)
    bb.order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(108, 1) // Point
    bb.putDouble(112, 7.0); bb.putDouble(120, 7.0)
    val off2 = 100 + 28
    bb.order(ByteOrder.BIG_ENDIAN)
    bb.putInt(off2, 2); bb.putInt(off2 + 4, polyContent / 2)
    bb.order(ByteOrder.LITTLE_ENDIAN)
    val c = off2 + 8
    bb.putInt(c, 5)
    bb.putInt(c + 36, 1); bb.putInt(c + 40, ring.length)
    bb.putInt(c + 44, 0)
    ring.zipWithIndex.foreach { case ((x, y), j) =>
      bb.putDouble(c + 48 + 16 * j, x); bb.putDouble(c + 48 + 16 * j + 8, y)
    }
    val path = writeTo("mixed.shp", bb)
    val logPath = Files.createTempFile("shp_skips", ".log").toString
    val recs = Shp.readRecords(path, Some(logPath))
    assert(recs.map(_._1) == Seq(1, 2))
    assert(recs(0)._2.isEmpty) // point record tolerated, geometry empty
    assert(recs(1)._2 == Seq(ring.map(p => Seq(p._1, p._2))))
    // the tolerated skip landed in the DURABLE log sink (S17's channel),
    // not just stderr — one structured line naming record and type
    val lines = Files.readAllLines(java.nio.file.Paths.get(logPath))
    assert(lines.size == 1)
    assert(lines.get(0).contains("\"tag\":\"shp_skip\"") &&
      lines.get(0).contains("\"status\":\"tolerated\"") &&
      lines.get(0).contains("record 1") &&
      lines.get(0).contains("shape type 1"))
  }

  test("shp reader: a file whose EVERY record is unsupported fails loudly instead of loading all-empty geometry") {
    // two point records (type 1, 20-byte content each): tolerance is
    // for MIXED files; a wholly-wrong-typed file must not pass silently
    val fileLen = 100 + 2 * (8 + 20)
    val bb = headerBytes(fileLen, fileLen / 2)
    (0 until 2).foreach { i =>
      val off = 100 + i * 28
      bb.order(ByteOrder.BIG_ENDIAN)
      bb.putInt(off, i + 1); bb.putInt(off + 4, 10)
      bb.order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(off + 8, 1) // Point
      bb.putDouble(off + 12, 7.0); bb.putDouble(off + 20, 7.0)
    }
    val logPath = Files.createTempFile("shp_allskip", ".log").toString
    val e = intercept[RuntimeException] {
      Shp.readRecords(writeTo("allpoints.shp", bb), Some(logPath))
    }
    assert(e.getMessage.contains("all 2 non-Null records are unsupported"))
    // Null records must NOT launder a wrong-typed file past the guard:
    // 1 Null + 2 Points still fails (Null is legal in ANY shapefile
    // type, so it says nothing about the file being polygon data)
    val mixLen = 100 + (8 + 4) + 2 * (8 + 20)
    val mb = headerBytes(mixLen, mixLen / 2)
    mb.order(ByteOrder.BIG_ENDIAN)
    mb.putInt(100, 1); mb.putInt(104, 2)
    mb.order(ByteOrder.LITTLE_ENDIAN)
    mb.putInt(108, 0) // Null shape
    (0 until 2).foreach { i =>
      val off = 112 + i * 28
      mb.order(ByteOrder.BIG_ENDIAN)
      mb.putInt(off, i + 2); mb.putInt(off + 4, 10)
      mb.order(ByteOrder.LITTLE_ENDIAN)
      mb.putInt(off + 8, 1) // Point
      mb.putDouble(off + 12, 7.0); mb.putDouble(off + 20, 7.0)
    }
    val e2 = intercept[RuntimeException] {
      Shp.readRecords(writeTo("nullpoints.shp", mb))
    }
    assert(e2.getMessage.contains("all 2 non-Null records are unsupported"))
    // an all-Null-shape file is NOT the same case: Null is a legal
    // polygon-file member (empty geometry by spec), so it still loads
    val nullLen = 100 + 2 * (8 + 4)
    val nb = headerBytes(nullLen, nullLen / 2)
    (0 until 2).foreach { i =>
      val off = 100 + i * 12
      nb.order(ByteOrder.BIG_ENDIAN)
      nb.putInt(off, i + 1); nb.putInt(off + 4, 2)
      nb.order(ByteOrder.LITTLE_ENDIAN)
      nb.putInt(off + 8, 0) // Null shape
    }
    val nulls = Shp.readRecords(writeTo("allnull.shp", nb))
    assert(nulls.map(_._1) == Seq(1, 2) && nulls.forall(_._2.isEmpty))
  }

  test("spatialJoin over the parsed shapefile equals the synthesized dim on identical geometry") {
    val fromShp = Geo.worldDim(spark,
      Shp.worldEntries(spark, base, "NAME", "REGION"))
    val synthesized = Geo.worldDim(spark, Seq(
      ("Holey", "R1", toEntryRings(holeyRings)),
      ("Multi", "R2", toEntryRings(multiRings))))
    val pts = Seq(
      (1L, 2.0, 2.0),   // inside Holey
      (2L, 5.0, 5.0),   // inside the hole -> no match
      (3L, 32.0, 2.0),  // inside Multi's second part
      (4L, 22.0, 2.0),  // inside Multi's first part
      (5L, 50.0, 50.0), // outside everything
      (6L, 10.0, 5.0)   // on Holey's border (ray-cast decides, equal paths)
    ).toDF("id", "lon", "lat")
    val a = Geo.spatialJoin(pts, fromShp, "lon", "lat")
      .select("id", "country", "region").orderBy("id").collect().toSeq
    val b = Geo.spatialJoin(pts, synthesized, "lon", "lat")
      .select("id", "country", "region").orderBy("id").collect().toSeq
    assert(a == b)
    val byId = a.map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(byId(1L).contains("Holey"))
    assert(byId(2L).isEmpty)
    assert(byId(3L).contains("Multi"))
    assert(byId(4L).contains("Multi"))
    assert(byId(5L).isEmpty)
  }
}
