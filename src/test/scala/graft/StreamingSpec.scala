package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

class StreamingSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("windowed stats with watermark: tumbling windows, late row dropped (T2/T4)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val agg = Streams.windowedStats(df, "ts", "event_type", "value",
      watermark = "10 minutes", window_ = "1 hour")
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("win_out").start()

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: two rows in hour 10, one in hour 11 (advances watermark to 10:50)
    input.addData(
      (ts("2024-01-01 10:00:00"), "click", 1.0),
      (ts("2024-01-01 10:30:00"), "click", 2.0),
      (ts("2024-01-01 11:00:00"), "view", 5.0))
    q.processAllAvailable()
    // batch 2: advance watermark past hour 10 so its window closes...
    input.addData((ts("2024-01-01 13:00:00"), "view", 7.0))
    q.processAllAvailable()
    // batch 3: a LATE row for hour 10 — below watermark, must be dropped
    input.addData((ts("2024-01-01 10:45:00"), "click", 100.0))
    q.processAllAvailable()
    input.addData((ts("2024-01-01 15:00:00"), "view", 1.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_out")
      .select(col("win.start").cast("string"), col("event_type"), col("n"), col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    // hour-10 click window emitted once with the ON-TIME rows only
    assert(rows.contains(("2024-01-01 10:00:00", "click", 2L, 3.0)),
      s"got $rows")
    assert(!rows.exists { case (w, t, n, sum) =>
      w == "2024-01-01 10:00:00" && t == "click" && sum == 103.0 })
  }

  test("streaming dedup with watermark TTL: in-window duplicates drop, state expires (w1/d1 analogue)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    // dropDuplicatesWithinWatermark: the streaming form of the w1/d1
    // batch dedup whose per-key state EXPIRES once the watermark passes
    // the event time + delay — bounded state, the only dedup shape that
    // survives an unbounded 100-TB/day stream (a plain dropDuplicates
    // would accumulate every key forever)
    val dedup = input.toDF().toDF("event_id", "ts", "payload")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = dedup.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out").start()
    input.addData(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 10:01:00"), "a-dup"),
      (2L, ts("2024-01-01 10:02:00"), "b"))
    q.processAllAvailable()
    // same-batch + cross-batch duplicate of 1 within the window: dropped
    input.addData((1L, ts("2024-01-01 10:03:00"), "a-dup2"))
    q.processAllAvailable()
    // advance the watermark far past 10:10 so key 1's state expires...
    input.addData((9L, ts("2024-01-01 12:00:00"), "advance"))
    q.processAllAvailable()
    // ...then key 1 reappears and is treated as NEW (state was dropped)
    input.addData((1L, ts("2024-01-01 12:01:00"), "a-new-epoch"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_out")
      .select(col("event_id"), col("payload"))
      .as[(Long, String)].collect().toList.sorted
    assert(got == List((1L, "a"), (1L, "a-new-epoch"), (2L, "b"),
      (9L, "advance")), s"got $got")
  }

  test("streaming bloom dedup: constant state, true dups never re-emitted, hash parity with the column expression") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Sketch
    // JVM replay == Catalyst expression on arbitrary strings — the
    // contract that lets a batch-built bloom seed/audit the stream's
    val sample = Seq("a b c", "tok9", "", "x:y", "ü ñ")
    val viaCol = sample.toDF("v")
      .select(graft.functions.Functions.md5Hash60(col("v"), 57).as("h"))
      .as[Long].collect().toSeq
    assert(sample.map(Sketch.jvmHash60(_, 57)) == viaCol,
      "jvmHash60 diverges from the md5Hash60 column expression")

    val input = MemoryStream[(Long, String)]
    val out = Streams.bloomDedupStream(input.toDS(), numShards = 4)
    val q = out.toDF().toDF("row_id", "key")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("bloom_dedup_out").start()
    // batch 1: k1 twice in-batch; batch 2: k1/k2 again cross-batch + novel k4
    input.addData((1L, "k1"), (2L, "k2"), (3L, "k1"))
    q.processAllAvailable()
    input.addData((4L, "k1"), (5L, "k3"), (6L, "k2"), (7L, "k4"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("bloom_dedup_out")
      .as[(Long, String)].collect().toList.sortBy(_._1)
    // one-sided: every key at most once, first occurrence wins; at 4
    // keys against an 8192-bit bitmap the FP odds are ~0, so the novel
    // keys all pass — the emitted set is exactly the first-seen rows
    assert(got == List((1L, "k1"), (2L, "k2"), (5L, "k3"), (7L, "k4")),
      s"got $got")
    assert(got.map(_._2).distinct.size == got.size, "a duplicate key re-emitted")
  }

  test("streaming CMS: counts accumulate across batches, never underestimate, batch-sketch cell parity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Sketch
    val input = MemoryStream[String]
    val out = Streams.cmsStream(input.toDS(), numShards = 4)
    val q = out.toDF().toDF("token", "est")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("cms_stream_out").start()
    input.addData("a", "b", "a", "c")
    q.processAllAvailable()
    input.addData("a", "b", "d")
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("cms_stream_out")
      .as[(String, Long)].collect().toList
    // per-batch post-update estimates; truth: batch1 a=2 b=1 c=1,
    // after batch2 a=3 b=2 d=1. CMS never underestimates, and at 5
    // distinct tokens in d*w = 2048 cells collisions are ~impossible,
    // so estimates are exact here
    val byBatch = rows.groupBy(identity).view.mapValues(_.size).toMap
    assert(rows.toSet == Set(("a", 2L), ("b", 1L), ("c", 1L),
      ("a", 3L), ("b", 2L), ("d", 1L)), s"got $rows")
    assert(byBatch.values.forall(_ == 1), "duplicate emissions")
    // the stream's cells replay the batch sketch's: same seeds, same
    // buckets — a batch-built cmsTable of the same tokens merges by sum
    val batchCells = Sketch.cmsTable(
        Seq((1L, "a b a c a b d")).toDF("doc_id", "text"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    Seq("a" -> 3L, "b" -> 2L, "c" -> 1L, "d" -> 1L).foreach { case (tok, n) =>
      val est = (0 until Sketch.CmsD).map { j =>
        val b = Sketch.jvmHash60(tok, Sketch.CmsSeedBase + j) & (Sketch.CmsW - 1)
        batchCells.getOrElse((j, b), 0L)
      }.min
      assert(est == n, s"batch-sketch parity for '$tok'")
    }
  }

  test("streaming histogram: cells accumulate across batches, final state == batch histTable (hq1 twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Sketch
    // the hq1 input shape on real data: (priority, total cents) from
    // the orders fixture, replayed in several micro-batches
    val fixture = Tables.orders(spark, GraftSpark.sf)
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long"))
      .as[(String, Long)].collect().toSeq
    val input = MemoryStream[(String, Long)]
    val out = Streams.histStream(input.toDS())
    val q = out.toDF().toDF("priority", "bucket", "cnt")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("hist_stream_out").start()
    fixture.grouped(400).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    val emitted = spark.table("hist_stream_out")
      .as[(String, Long, Long)].collect()
    // counts only grow, so each cell's LAST (= max) emission is its
    // final state — must equal the batch sketch cell-for-cell
    val streamCells = emitted.groupBy(r => (r._1, r._2))
      .view.mapValues(_.map(_._3).max).toMap
    val batchCells = Sketch.histTable(Tables.orders(spark, GraftSpark.sf))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamCells == batchCells,
      s"stream/batch cells diverge: onlyStream=${
        (streamCells.keySet -- batchCells.keySet).take(3)} onlyBatch=${
        (batchCells.keySet -- streamCells.keySet).take(3)}")
    // additive merge law: a batch sketch over half the data + the
    // stream's cells over the other half sum to the full sketch
    val (h1, h2) = fixture.splitAt(fixture.size / 2)
    val part1 = Sketch.histTable(
        h1.toDF("o_orderpriority", "cents")
          .select(col("o_orderpriority"),
            (col("cents").cast("double") / 100).as("o_totalprice")))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val part2 = h2.groupBy(t => (t._1, t._2 >> Sketch.HistShift))
      .view.mapValues(_.size.toLong).toMap
    val merged = (part1.keySet ++ part2.keySet).map(k =>
      k -> (part1.getOrElse(k, 0L) + part2.getOrElse(k, 0L))).toMap
    assert(merged == batchCells, "cell-wise sum merge law broken")
  }

  test("streaming HLL: estimate equals the batch sketch, and an exact replay batch changes nothing (hll1 twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.{Sketch, TextStats}
    // stream the exact shingle stream the batch sketch aggregates, so
    // final state must be register-identical to shingleRegisters
    val docs = Tables.documents(spark, GraftSpark.sf).limit(60)
    val items = docs
      .select(col("lang"), explode(TextStats.shingles(col("text"), 3)).as("sh"))
      .as[(String, String)].collect().toSeq
    val expected = Sketch.estimateFromRegisters(Sketch.shingleRegisters(docs))
      .as[(String, Long, Long, Double)].collect().toSet
    assert(expected.nonEmpty)
    val (b1, b2) = items.splitAt(items.size / 2)
    val input = MemoryStream[(String, String)]
    val q = Streams.hllStream(input.toDS()).toDF()
      .toDF("lang", "v_empty", "s_scaled", "est_raw")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("hll_stream_out").start()
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    def rows() = spark.table("hll_stream_out")
      .as[(String, Long, Long, Double)].collect().toSet
    val afterAll = rows()
    // every group's final emission is the batch pipeline's exact
    // (v_empty, s_scaled) integers and the identical one-division est
    assert(expected.subsetOf(afterAll),
      s"missing ${(expected -- afterAll).take(2)} in $afterAll")
    // max is idempotent: replaying a whole batch emits the SAME rows —
    // the distinct row set cannot grow (additive sketches would drift)
    input.addData(b2); q.processAllAvailable()
    assert(rows() == afterAll, "replayed batch changed HLL state")
    q.stop()
  }

  test("bloom dedup saturation: a small parameterized bitmap fills and drops novel keys one-sidedly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 2^6 = 64 bits per shard, k=4: ~40 distinct keys into one shard
    // saturates it far past the warning threshold — novel keys start
    // dropping as false positives, but NO duplicate is ever re-emitted
    // (the one-sided contract that holds at any fill level)
    val keys = (1 to 80).map(i => (i.toLong, s"key$i")) ++
      (81 to 160).map(i => (i.toLong, s"key${i - 80}")) // exact replays
    val input = MemoryStream[(Long, String)]
    val out = Streams.bloomDedupStream(input.toDS(), numShards = 2, addrBits = 6)
    val q = out.toDF().toDF("row_id", "key")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("bloom_sat_out").start()
    keys.grouped(40).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("bloom_sat_out")
      .as[(Long, String)].collect().toList.sortBy(_._1)
    assert(got.map(_._2).distinct.size == got.size,
      "a duplicate key re-emitted despite saturation")
    assert(got.forall(_._1 <= 80L), "a replayed row slipped through")
    // the bitmap saturated: some novel keys were (expectedly) dropped
    assert(got.size < 80, s"80 keys into 64 bits cannot all pass (got ${got.size})")
    assert(got.size > 10, s"early keys must pass an empty bitmap (got ${got.size})")
  }

  test("bloom dedup state guard: a restored state array of the wrong layout fails loudly, the right one passes through") {
    // addrBits=6, word shift 5 → 2 bitmap words + 1 counter = 3 longs
    val nWords = (1 << 6) >> graft.ops.Sketch.BloomWordShift
    val ok = new Array[Long](nWords + 1)
    assert(Streams.validateBloomState(ok, nWords, 6) eq ok)
    // a checkpoint written under addrBits=7 (or the pre-counter layout)
    // restores a different length — must throw, not misread the bitmap
    for (badLen <- Seq(nWords, nWords + 2, 2 * nWords + 1)) {
      val e = intercept[IllegalArgumentException] {
        Streams.validateBloomState(new Array[Long](badLen), nWords, 6)
      }
      assert(e.getMessage.contains("state layout mismatch"))
    }
  }

  test("streaming sessionize: gap closes a session in-stream, timeout closes via watermark (w2 analogue)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val sessions = Streams.sessionizeStream(input.toDS(),
      gapSeconds = 1800, watermark = "1 hour")
    val q = sessions.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_out").start()

    // batch 1: user 1 has two events 10 min apart (one open session),
    // user 2 one event
    input.addData(
      (1L, ts("2024-01-01 10:00:00"), 1.25),
      (1L, ts("2024-01-01 10:10:00"), 2.50),
      (2L, ts("2024-01-01 10:05:00"), 4.00))
    q.processAllAvailable()
    // batch 2: a LATE but within-watermark event (09:50 > watermark
    // 09:10) must merge and extend the open session's START backward
    input.addData((1L, ts("2024-01-01 09:50:00"), 1.00))
    q.processAllAvailable()
    // batch 3: user 1 reappears 2h later — the 30-min gap closes the
    // first session IMMEDIATELY (no watermark needed) and opens a new one
    input.addData((1L, ts("2024-01-01 12:10:00"), 8.00))
    q.processAllAvailable()
    // batch 3+4: push the watermark far past every open session's
    // timeout so user 2's (and user 1's second) sessions time out
    input.addData((99L, ts("2024-01-01 20:00:00"), 0.01))
    q.processAllAvailable()
    input.addData((99L, ts("2024-01-01 23:00:00"), 0.01))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sess_out")
      .select(col("user_id"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("n_events"),
        col("sum_value_cents"))
      .as[(Long, String, String, Long, Long)].collect().toSet
    // user 1 session 1: closed by the gap; the late 09:50 event extended
    // its start backward (n=3, 100+125+250 cents)
    assert(got.contains(
      (1L, "2024-01-01 09:50:00", "2024-01-01 10:10:00", 3L, 475L)), s"got $got")
    // user 2: closed by event-time timeout
    assert(got.contains(
      (2L, "2024-01-01 10:05:00", "2024-01-01 10:05:00", 1L, 400L)), s"got $got")
    // user 1 session 2: also timed out by the late watermark
    assert(got.contains(
      (1L, "2024-01-01 12:10:00", "2024-01-01 12:10:00", 1L, 800L)), s"got $got")
  }

  test("foreachBatch merge sink is idempotent across replayed batches (T3)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    var target = Seq((1L, "seed")).toDF("k", "src")
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("k", "src").writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch(Streams.mergeEachBatch(() => target, b => target = b, Seq("k")))
      .start()
    input.addData((1L, "dup"), (2L, "new"))
    q.processAllAvailable()
    input.addData((2L, "replay"), (3L, "new"))  // 2 replayed → ignored
    q.processAllAvailable()
    q.stop()
    val m = target.as[(Long, String)].collect().toMap
    assert(m == Map(1L -> "seed", 2L -> "new", 3L -> "new"))
  }

  test("batch equivalence: streamed windowedStats over the events fixture == one-shot batch aggregation (t4)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the full sf0.001 events table, values integerized to cents so the
    // stream-state sums and the batch-aggregate sums are EXACTLY equal
    // (raw double sums could drift ulps between accumulation orders)
    val fixture = Tables.events(spark, GraftSpark.sf)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(date_trunc("second", col("ts")).as("ts"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(java.sql.Timestamp, String, Long)].collect()
      .sortBy(_._1.getTime) // replay in event-time order: nothing late
    val input = MemoryStream[(java.sql.Timestamp, String, Long)]
    val agg = Streams.windowedStats(
      input.toDF().toDF("ts", "event_type", "cents"),
      "ts", "event_type", "cents", watermark = "1 hour", window_ = "1 day")
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("equiv_t4").start()
    // several micro-batches, then a far-future sentinel that pushes the
    // watermark past every real window so append mode emits them all
    fixture.grouped(3000).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    val sentinel = java.sql.Timestamp.valueOf("2030-01-01 00:00:00")
    input.addData((sentinel, "sentinel", 0L))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("equiv_t4")
      .filter(col("event_type") =!= "sentinel")
      .select(col("win.start").cast("string").as("w"), col("event_type"),
        col("n"), col("sum_value"))
      .as[(String, String, Long, Long)].collect().toSet
    val batch = fixture.toSeq.toDF("ts", "event_type", "cents")
      .groupBy(window(col("ts"), "1 day").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_value"))
      .select(col("win.start").cast("string").as("w"), col("event_type"),
        col("n"), col("sum_value"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(streamed.nonEmpty && streamed == batch,
      s"stream/batch diverge: onlyStream=${(streamed -- batch).take(5)} " +
        s"onlyBatch=${(batch -- streamed).take(5)}")
  }

  test("batch equivalence: chunked foreachBatch merge over the orders fixture == one-shot merge (j4)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // j4's exact shape on real data: target = pre-2000 orders, incoming
    // = big orders, replayed to the sink in several micro-batches
    val target0 = Tables.orders(spark, GraftSpark.sf)
      .filter(col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
      .select(col("o_orderkey").as("k"), lit("existing").as("src"))
    val incoming = Tables.orders(spark, GraftSpark.sf)
      .filter(col("o_totalprice") > 300000)
      .select(col("o_orderkey").as("k"), lit("inserted").as("src"))
      .as[(Long, String)].collect()
    var target = target0
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("k", "src").writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch(Streams.mergeEachBatch(() => target, b => target = b, Seq("k")))
      .start()
    incoming.grouped(500).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    val streamed = target.as[(Long, String)].collect().toSet
    val batch = graft.merge.Upsert
      .antiJoinUpsert(target0, incoming.toSeq.toDF("k", "src"), Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(streamed.nonEmpty && streamed == batch,
      s"stream/batch merge diverge: onlyStream=${(streamed -- batch).take(5)} " +
        s"onlyBatch=${(batch -- streamed).take(5)}")
  }

  test("checkpoint-restart recovery: foreachBatch MERGE resumes from the checkpoint and equals the one-shot batch path (T3)") {
    import spark.implicits._
    // T3's fault-tolerance contract (reference dag.py:176-192 gets it
    // from Airflow re-running the whole MERGE task; Structured
    // Streaming's equivalent is the checkpoint): a foreachBatch MERGE
    // stream stopped mid-input and RESTARTED from the same
    // checkpointLocation must (a) never re-deliver batches committed
    // before the stop, (b) pick up files that arrived while it was
    // down, and (c) land exactly the one-shot batch merge — with the
    // anti-join sink making any replay of the final in-flight batch
    // (at-least-once foreachBatch semantics) a no-op.
    val inDir = java.nio.file.Files.createTempDirectory("graft_ckpt_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val schema = Seq((0L, "")).toDF("k", "src").schema
    val target0 = Seq((1L, "seed")).toDF("k", "src")
    var target = target0
    val batchIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sink = Streams.mergeEachBatch(() => target, b => target = b, Seq("k"))
    def start() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
      .writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batchIds.synchronized { batchIds += id }
        sink(b, id)
      }
      .start()
    // wave 1: two single-file micro-batches (key 1 replays the seed)
    Seq((1L, "dup")).toDF("k", "src").coalesce(1).write.mode("append").parquet(inDir)
    Seq((2L, "new")).toDF("k", "src").coalesce(1).write.mode("append").parquet(inDir)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    val idsBefore = batchIds.toList
    assert(idsBefore.size >= 2, s"expected 2 wave-1 batches, got $idsBefore")
    // wave 2 arrives while the stream is DOWN: a replay of key 1 plus
    // a genuinely new key
    Seq((1L, "dup"), (3L, "late")).toDF("k", "src")
      .coalesce(1).write.mode("append").parquet(inDir)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val idsAfter = batchIds.toList.drop(idsBefore.size)
    assert(idsAfter.nonEmpty, "restart delivered no batches")
    // committed offsets hold across restart: nothing earlier than the
    // final wave-1 batch is ever re-delivered
    assert(idsAfter.forall(_ >= idsBefore.max),
      s"restart re-delivered committed batches: before=$idsBefore after=$idsAfter")
    val merged = target.as[(Long, String)].collect().toMap
    assert(merged == Map(1L -> "seed", 2L -> "new", 3L -> "late"))
    // the recovered stream landed exactly the one-shot batch merge over
    // the union of every input file
    val oneShot = graft.merge.Upsert
      .antiJoinUpsert(target0, spark.read.parquet(inDir), Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(merged == oneShot)
  }

  test("checkpoint-restart under a CHANGED source: duplicate file delivery and a torn final commit both stay exactly-once (T3)") {
    import spark.implicits._
    // the two restart hazards the basic recovery test doesn't reach:
    //   (a) an upstream that re-delivers an ALREADY-PROCESSED file under
    //       a new name while the stream is down (at-least-once upstream
    //       semantics — the file source keys seen-files by PATH, so the
    //       copy is a brand-new file to it and WILL be delivered);
    //   (b) a crash BETWEEN the foreachBatch side-effect and the offset
    //       commit (simulated by deleting the final commit marker):
    //       Structured Streaming re-runs that batch on restart —
    //       foreachBatch is at-least-once by contract — and the MERGE
    //       sink's anti-join must make the replay a no-op.
    val inDir = java.nio.file.Files.createTempDirectory("graft_ckpt2_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt2").toString
    val schema = Seq((0L, "")).toDF("k", "src").schema
    val target0 = Seq((1L, "seed")).toDF("k", "src")
    var target = target0
    val batchIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sink = Streams.mergeEachBatch(() => target, b => target = b, Seq("k"))
    def start() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
      .writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batchIds.synchronized { batchIds += id }
        sink(b, id)
      }
      .start()
    Seq((2L, "new")).toDF("k", "src").coalesce(1).write.mode("append").parquet(inDir)
    Seq((3L, "also")).toDF("k", "src").coalesce(1).write.mode("append").parquet(inDir)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    val idsBefore = batchIds.toList
    assert(target.as[(Long, String)].collect().toMap ==
      Map(1L -> "seed", 2L -> "new", 3L -> "also"))
    // (a) while DOWN: byte-for-byte copy of an already-processed parquet
    // file under a new name, plus one genuinely new file
    val firstFile = new java.io.File(inDir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).minBy(_.getName)
    java.nio.file.Files.copy(firstFile.toPath,
      new java.io.File(inDir, "redelivered_" + firstFile.getName).toPath)
    Seq((4L, "late")).toDF("k", "src").coalesce(1).write.mode("append").parquet(inDir)
    // (b) while DOWN: tear the final offset commit — the classic
    // crash-after-side-effect window
    val commits = new java.io.File(ckpt, "commits").listFiles()
      .filter(_.getName.forall(_.isDigit))
    val torn = commits.maxBy(_.getName.toInt)
    assert(torn.delete(), s"could not tear commit ${torn.getName}")
    // the local checksum fs keeps a .N.crc sidecar; a REAL torn write
    // leaves neither, and a stale crc makes the re-commit rename fail
    new java.io.File(torn.getParentFile, s".${torn.getName}.crc").delete()
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val idsAfter = batchIds.toList.drop(idsBefore.size)
    // the torn batch re-delivers (same id), nothing EARLIER does
    assert(idsAfter.head == idsBefore.max,
      s"torn commit ${idsBefore.max} did not replay first: $idsAfter")
    assert(idsAfter.forall(_ >= idsBefore.max),
      s"restart re-delivered fully-committed batches: $idsAfter")
    // exactly-once OUTPUT despite at-least-once delivery: the replayed
    // batch and the re-delivered file both merge to no-ops
    val merged = target.as[(Long, String)].collect().toMap
    assert(merged ==
      Map(1L -> "seed", 2L -> "new", 3L -> "also", 4L -> "late"))
    val oneShot = graft.merge.Upsert
      .antiJoinUpsert(target0, spark.read.parquet(inDir), Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(merged == oneShot)
  }

  test("file-source replay: maxFilesPerTrigger micro-batches deliver every row exactly once (T1)") {
    import spark.implicits._
    // the monthly-batch capability (T1) as a real file stream: the
    // fixture written as several parquet files, streamed 2 files per
    // trigger — union of micro-batches must equal the batch read
    // exactly (no loss, no duplication)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_in").toString
    val src = Tables.events(spark, GraftSpark.sf)
      .select(col("event_id"), col("event_type"))
    src.repartition(6).write.mode("overwrite").parquet(dir)
    val expected = spark.read.parquet(dir)
      .select("event_id").as[Long].collect().sorted.toSeq
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    var nBatches = 0
    val q = spark.readStream
      .schema(src.schema)
      .option("maxFilesPerTrigger", 2)
      .parquet(dir)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        seen.synchronized {
          seen ++= b.select("event_id").collect().map(_.getLong(0))
          nBatches += 1
        }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(nBatches >= 3, s"expected several micro-batches, got $nBatches")
    assert(seen.sorted.toSeq == expected, "file-source replay lost or duplicated rows")
  }

  test("stream-stream interval join == batch join over the events fixture (attribution shape)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // clicks and purchases carved from the same fixture; event-time
    // order so nothing is late (equivalence needs no dropped rows)
    val ev = Tables.events(spark, GraftSpark.sf)
      .filter(col("ts").isNotNull && col("value").isNotNull &&
        col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        date_trunc("second", col("ts")).as("ts"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().sortBy(_.getTimestamp(3).getTime)
    val clicksFix = ev.filter(_.getString(2) == "click")
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(3)))
    val purchFix = ev.filter(_.getString(2) == "purchase")
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(3), r.getLong(4)))
    val cIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val pIn = MemoryStream[(Long, Long, java.sql.Timestamp, Long)]
    val joined = Streams.attributionJoin(
      cIn.toDF().toDF("user_id", "click_id", "c_ts"),
      pIn.toDF().toDF("user_id", "purchase_id", "p_ts", "cents"))
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("equiv_ssj").start()
    // interleave micro-batches from both sides in event-time order
    val cChunks = clicksFix.grouped(500).toList
    val pChunks = purchFix.grouped(500).toList
    (0 until math.max(cChunks.size, pChunks.size)).foreach { i =>
      if (i < cChunks.size) cIn.addData(cChunks(i))
      if (i < pChunks.size) pIn.addData(pChunks(i))
      q.processAllAvailable()
    }
    // sentinels push both watermarks past all real data so every
    // buffered inner-join row flushes
    val sentinel = java.sql.Timestamp.valueOf("2030-01-01 00:00:00")
    cIn.addData((-1L, -1L, sentinel)); pIn.addData((-1L, -1L, sentinel, 0L))
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("equiv_ssj").filter(col("user_id") >= 0)
      .select(col("click_id"), col("purchase_id"))
      .as[(Long, Long)].collect().toSet
    val batch = clicksFix.toSeq.toDF("user_id", "click_id", "c_ts")
      .join(purchFix.toSeq.toDF("p_user_id", "purchase_id", "p_ts", "cents"),
        col("user_id") === col("p_user_id") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("interval 3600 seconds"))
      .select(col("click_id"), col("purchase_id"))
      .as[(Long, Long)].collect().toSet
    assert(streamed.nonEmpty && streamed == batch,
      s"stream/batch diverge: onlyStream=${(streamed -- batch).take(5)} " +
        s"onlyBatch=${(batch -- streamed).take(5)}")
  }

  test("mapGroupsWithState running totals accumulate across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val out = Streams.runningTypeTotals(input.toDS())
    val q = out.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("state_out").start()
    input.addData(("click", 1.0), ("click", 2.0), ("view", 5.0))
    q.processAllAvailable()
    input.addData(("click", 4.0))
    q.processAllAvailable()
    q.stop()
    val byType = spark.table("state_out").as[Streams.TypeUpdate].collect()
      .groupBy(_.event_type).map { case (k, v) => k -> v.maxBy(_.n) }
    assert(byType("click").n == 3 && byType("click").sum == 7.0)
    assert(byType("view").n == 1 && byType("view").sum == 5.0)
  }

  test("confusion stream (clf1 twin): cells accumulate across batches and equal the batch matrix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Option[Double])]
    val df = input.toDF().toDF("event_id", "value")
    val q = Streams.confusionStream(df)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("clf_stream").start()
    val b1 = Seq((1L, Some(450.0)), (2L, Some(300.0)), (3L, Some(50.0)))
    val b2 = Seq((4L, Some(120.0)), (5L, None), (6L, Some(50.0)))
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("clf_stream")
      .as[(String, String, Long)].collect().toSet
    // batch clf1 logic over the union of both batches
    val cents = graft.functions.Functions.cents(col("value"))
    val pred = cents + graft.ops.Eval.scoreNoise(col("event_id"))
    val batch = (b1 ++ b2).toDF("event_id", "value")
      .filter(col("value").isNotNull)
      .select(graft.ops.Eval.bucketCents(cents).as("actual"),
        graft.ops.Eval.bucketCents(pred).as("predicted"))
      .groupBy("actual", "predicted").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.toSeq.map(_._3).sum == 5, "null value row excluded")
  }

  test("gap stream (w13 twin): per-user 2-long state, aggregated gaps equal the batch histogram") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = Streams.gapStream(input.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("gap_stream").start()
    // batch 1: user 1 with a same-second tie (re-sorted by event_id
    // inside the micro-batch), user 2 opener
    val b1 = Seq((1L, ts(0), 1L, "view"), (3L, ts(1), 1L, "view"),
      (2L, ts(1), 1L, "click"), (10L, ts(50), 2L, "view"))
    // batch 2: continuations — gaps span the batch boundary via state
    val b2 = Seq((4L, ts(9), 1L, "click"), (11L, ts(50), 2L, "click"),
      (12L, ts(114), 2L, "view"))
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("gap_stream").as[Streams.GapObs].collect()
      .groupBy(o => (o.event_type, o.bucket))
      .map { case (k, v) => k -> (v.size.toLong, v.map(_.gap).sum) }
    val batch = graft.model.Analytics.gapHistogramOf(
      (b1 ++ b2).toDF("event_id", "ts", "user_id", "event_type"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bucket")) ->
        (r.getAs[Long]("n_gaps"), r.getAs[Long]("sum_gap_s"))).toMap
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    // the boundary-spanning gap (user 2: 50 → 50 same-second then 64 s)
    assert(batch.contains(("click", 0L)) && batch.contains(("view", 7L)))
  }

  test("constraint-audit stream: counters accumulate across batches and match the batch rules (dq1 twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Option[Long], Option[java.sql.Timestamp],
      Option[Double], Option[String], Option[String])]
    val df = input.toDF().toDF("user_id", "ts", "value", "event_type", "props")
    val q = Streams.constraintAuditStream(df)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("dq_stream").start()
    val okTs = Some(ts("2024-01-01 10:00:00"))
    val okProps = Some("""{"k": 30}""")
    // batch 1: one clean row, one null user, one out-of-range value
    input.addData(
      (Some(1L), okTs, Some(5.0), Some("click"), okProps),
      (None, okTs, Some(5.0), Some("click"), okProps),
      (Some(2L), okTs, Some(900.0), Some("view"), okProps))
    q.processAllAvailable()
    // batch 2: bad type, missing-k props, null ts + null value
    input.addData(
      (Some(3L), okTs, Some(5.0), Some("mystery"), okProps),
      (Some(4L), okTs, Some(5.0), Some("click"), Some("{}")),
      (Some(5L), None, None, Some("click"), okProps))
    q.processAllAvailable()
    q.stop()
    val r = spark.table("dq_stream").collect().head
    def g(n: String) = r.getLong(r.fieldIndex(n))
    assert(g("n_rows") == 6)
    assert(g("user_id_not_null") == 1)
    assert(g("ts_not_null") == 1)
    assert(g("value_not_null") == 1)
    assert(g("value_range_0_500") == 1)
    assert(g("type_in_domain") == 1)
    assert(g("props_has_k") == 1)
  }

  test("CUSUM stream (a20 twin): two-long state, alarm crosses at the planted shift, batch boundary invisible") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def d(s: String) = java.sql.Date.valueOf(s)
    val input = MemoryStream[(String, java.sql.Date, Long)]
    // target 10/day, slack 2, threshold 15: rate-10 days keep S⁺ at 0,
    // rate-20 days add 8 each → alarm on the SECOND shifted day
    val q = Streams.cusumStream(input.toDS(), target = 10, slack = 2,
        threshold = 15)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("cusum_stream").start()
    input.addData(
      ("x", d("2024-03-01"), 10L), ("x", d("2024-03-02"), 11L),
      ("x", d("2024-03-03"), 20L))
    q.processAllAvailable()
    input.addData(
      ("x", d("2024-03-04"), 20L), ("x", d("2024-03-05"), 10L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("cusum_stream")
      .orderBy("day")
      .select("count", "splus", "sminus", "alarm")
      .as[(Long, Long, Long, Boolean)].collect().toList
    assert(rows == List(
      (10L, 0L, 0L, false),   // on target
      (11L, 0L, 0L, false),   // within slack
      (20L, 8L, 0L, false),   // shift starts accumulating
      (20L, 16L, 0L, true),   // crosses threshold — across the batch cut
      (10L, 14L, 0L, false))) // decays, no reset policy imposed
  }

  test("volume-anomaly stream equals batch dq6 over the batch union — spike flagged across the cut") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def d(s: String) = java.sql.Date.valueOf(s)
    // 10 steady days at 100, day 11 spikes to 200 — the dq6 fixture,
    // split so the spike and part of its trailing window cross batches
    val days = (0 until 10).map(i =>
      ("all", d(f"2024-01-${i + 1}%02d"), 100L)) :+
      ("all", d("2024-01-11"), 200L)
    val input = MemoryStream[(String, java.sql.Date, Long)]
    val q = Streams.volumeAnomalyStream(input.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("volanom_stream").start()
    input.addData(days.take(6): _*)
    q.processAllAvailable()
    input.addData(days.drop(6): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("volanom_stream").orderBy("day")
      .select("x", "n", "s", "q", "dev_num", "is_anomaly").collect()
    // batch dq6 over the same series (events expanded from the counts)
    import java.sql.Timestamp
    val events = days.zipWithIndex.flatMap { case ((_, day, n), i) =>
      (0L until n).map(k => (i * 1000L + k,
        new Timestamp(day.getTime), 1L, "view", 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val batch = graft.ops.Profile.volumeAnomalyOf(events).orderBy("day")
      .select("x", "n", "s", "q", "dev_num", "is_anomaly").collect()
    assert(got.length == batch.length)
    got.zip(batch).foreach { case (g, b) =>
      (0 until 5).foreach(i => assert(g.getLong(i) == b.getLong(i)))
      assert(g.isNullAt(5) == b.isNullAt(5))
      if (!g.isNullAt(5)) assert(g.getLong(5) == b.getLong(5))
    }
    // the spike itself is flagged, steady days are not
    val spike = got.last
    assert(spike.getLong(0) == 200L && spike.getLong(5) == 1L)
  }

  test("EWMA burst stream equals batch a37 over the batch union — spike and gap cross the cut") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def d(s: String) = java.sql.Date.valueOf(s)
    // steady 4s, a 2-day GAP, more 4s, then a 20 spike — split so the
    // gap-respanning weights and the spike both cross batches
    val days = Seq(
      ("all", d("2024-02-01"), 4L), ("all", d("2024-02-02"), 4L),
      ("all", d("2024-02-03"), 4L), ("all", d("2024-02-06"), 4L),
      ("all", d("2024-02-07"), 4L), ("all", d("2024-02-08"), 20L))
    val input = MemoryStream[(String, java.sql.Date, Long)]
    val q = Streams.ewmaBurstStream(input.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ewma_stream").start()
    input.addData(days.take(4): _*)
    q.processAllAvailable()
    input.addData(days.drop(4): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ewma_stream").orderBy("day")
      .select("x", "ewma_num", "ewma_den", "burst").collect()
    import java.sql.Timestamp
    val events = days.zipWithIndex.flatMap { case ((_, day, n), i) =>
      (0L until n).map(k => (i * 1000L + k,
        new Timestamp(day.getTime), 1L, "all", 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val batch = graft.model.Analytics.ewmaBurstOf(events).orderBy("day")
      .select("x", "ewma_num", "ewma_den", "burst").collect()
    assert(got.length == batch.length && got.length == 6)
    got.zip(batch).foreach { case (g, b) =>
      assert(g.getLong(0) == b.getLong(0))
      (1 until 4).foreach { i =>
        assert(g.isNullAt(i) == b.isNullAt(i), s"col $i null mismatch")
        if (!g.isNullAt(i)) assert(g.getLong(i) == b.getLong(i), s"col $i")
      }
    }
    // first day NULL, spike flagged
    assert(got.head.isNullAt(3) && got.last.getLong(3) == 1L)
  }
}
