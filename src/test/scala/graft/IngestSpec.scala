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

  test("extractHistorical: planner drives the pluggable fetch, features flatten with window lineage (extract_historical.py:34-41,75)") {
    // fixture-backed fetch: one synthetic feature per 500-row unit of
    // the window's density — the planner's count contract and the
    // fetcher see the SAME synthetic API
    def count(s: LocalDate, e: LocalDate): Long =
      math.max(0, java.time.temporal.ChronoUnit.DAYS.between(s, e) + 1) * 5000
    val fetched = scala.collection.mutable.ListBuffer.empty[(LocalDate, LocalDate)]
    def fetch(s: LocalDate, e: LocalDate): Seq[String] = {
      fetched += ((s, e))
      val n = (count(s, e) / 500).toInt
      (0 until n).map { i =>
        if (i == 1) "{broken" // one malformed feature per window
        else
          s"""{"properties":{"place":"w-${s}-$i","time":${1000L * i},"mag":${i % 9},
             |"alert":"green","tsunami":0,"tz":"+00:00","type":"earthquake"},
             |"geometry":{"coordinates":[${i % 360},${i % 180},${i % 700}]}}"""
            .stripMargin.replace("\n", "")
      }
    }
    val out = Ingest.extractHistorical(spark,
      LocalDate.of(2000, 1, 1), LocalDate.of(2000, 1, 20), count _, fetch _,
      eraShortcutsFreePlanLimit)
    val rows = out.collect()
    // fetch was called once per PLANNED window, with the planner's exact
    // windows (each ≤ limit by the planner contract)
    val planned = Ingest.planWindows(LocalDate.of(2000, 1, 1),
      LocalDate.of(2000, 1, 20), count _, eraShortcutsFreePlanLimit)
    assert(fetched.toList == planned.toList,
      s"fetch windows ${fetched.toList} != planned $planned")
    planned.foreach { case (s, e) => assert(count(s, e) <= eraShortcutsFreePlanLimit) }
    // every fetched feature flattened; malformed ones null out
    val expected = planned.map(w => (count(w._1, w._2) / 500).toInt).sum
    assert(rows.length == expected, s"rows=${rows.length} expected=$expected")
    val malformed = rows.count(_.isNullAt(out.schema.fieldIndex("place")))
    assert(malformed == planned.size, "one malformed feature per window")
    // coordinate reorder holds through the shim (lat = coordinates[1])
    val r0 = rows.filter(r => !r.isNullAt(out.schema.fieldIndex("place")))
      .minBy(_.getAs[String]("place"))
    assert(r0.getAs[Double]("latitude") == 0.0 &&
      r0.getAs[Double]("longitude") == 0.0)
    // window lineage rides along and matches the planner's windows
    val lineage = rows.map(r => r.getAs[String]("window_start")).distinct.sorted
    assert(lineage.toSeq == planned.map(_._1.toString).sorted)
  }
  private val eraShortcutsFreePlanLimit = 20000L

  test("dbf reader: synthetic fixture round-trips types, blanks, deleted records") {
    // hand-assembled dBASE III file: 5 fields covering every type-map
    // branch, 3 records with one deleted and one full of blanks
    val fields = Seq(("NAME", 'C', 10, 0), ("POP", 'N', 8, 0),
      ("RATE", 'N', 8, 2), ("FLAG", 'L', 1, 0), ("DT", 'D', 8, 0))
    val rsz = 1 + fields.map(_._3).sum
    val hsz = 32 + fields.size * 32 + 1
    val out = java.nio.ByteBuffer.allocate(hsz + 3 * rsz + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(0x03.toByte).put(Array[Byte](126, 1, 1))
      .putInt(3).putShort(hsz.toShort).putShort(rsz.toShort)
    out.position(32)
    fields.foreach { case (n, t, l, d) =>
      val fd = new Array[Byte](32)
      n.getBytes.copyToArray(fd)
      fd(11) = t.toByte; fd(16) = l.toByte; fd(17) = d.toByte
      out.put(fd)
    }
    out.put(0x0D.toByte)
    def rec(del: Boolean, cells: Seq[String]): Unit = {
      out.put(if (del) '*'.toByte else ' '.toByte)
      cells.zip(fields).foreach { case (v, (_, _, l, _)) =>
        out.put(v.padTo(l, ' ').getBytes("ISO-8859-1"))
      }
    }
    rec(del = false, Seq("alpha", "     123", "    3.50", "T", "20240131"))
    rec(del = true, Seq("ghost", "       9", "    1.00", "F", "20200101"))
    rec(del = false, Seq("", "        ", "        ", "?", ""))
    out.put(0x1A.toByte)
    val dir = java.nio.file.Files.createTempDirectory("dbf")
    val p = dir.resolve("t.dbf")
    java.nio.file.Files.write(p, out.array())
    val got = graft.ingest.Dbf.read(spark, p.toString)
    assert(got.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("NAME", "string"), ("POP", "long"), ("RATE", "double"),
        ("FLAG", "boolean"), ("DT", "string")))
    val rows = got.collect()
    assert(rows.length == 2, "deleted record must be skipped")
    assert(rows(0).getString(0) == "alpha" && rows(0).getLong(1) == 123L &&
      rows(0).getDouble(2) == 3.5 && rows(0).getBoolean(3) &&
      rows(0).getString(4) == "2024-01-31")
    assert(rows(1).toSeq.forall(_ == null), "blank cells must null out")
  }

  test("dbf reader: the reference's actual Natural Earth attribute table (add_region.py:23)") {
    val ne = "/root/reference/pipeline/world-boundaries/ne_10m_admin_0_countries.dbf"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(ne)))
    val world = graft.ingest.Dbf.worldAttributes(spark, ne)
    val rows = world.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.length == 258, s"NE 10m admin-0 carries 258 records, got ${rows.length}")
    val byName = rows.toMap
    assert(byName.get("Fiji").contains("Oceania"))
    assert(byName.get("Chile").contains("Americas"))
    assert(rows.map(_._2).distinct.sorted.sameElements(
      Array("Africa", "Americas", "Antarctica", "Asia", "Europe", "Oceania")),
      s"UN regions: ${rows.map(_._2).distinct.sorted.toSeq}")
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
