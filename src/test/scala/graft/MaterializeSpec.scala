package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Materialize, Similarity}

/** The persistence seam: every LSH-family operator must produce
  * identical results whether its intermediates live as executor-local
  * checkpoints (run-once driver shape) or as durable parquet tables
  * (the fault-tolerant warehouse lifecycle). */
class MaterializeSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("minhash LSH pairs: storage-mode intermediates == local-checkpoint mode, files on disk") {
    val dir = Files.createTempDirectory("graft_mat").toString
    val local = rows(Dedup.minhashLshQuery(spark, sf))
    val stored = rows(Dedup.minhashLshQuery(spark, sf, Materialize.Storage(dir)))
    assert(stored == local)
    // the shingle and band tables really were persisted as readable parquet
    for (name <- Seq("minhash_shingles", "minhash_bands")) {
      val t = spark.read.parquet(s"$dir/$name")
      assert(t.count() > 0, name)
    }
  }

  test("n-gram Jaccard: storage mode == local mode") {
    val dir = Files.createTempDirectory("graft_mat").toString
    val local = rows(Dedup.ngramJaccardPairs(spark, sf))
    val stored = rows(Dedup.ngramJaccardPairs(spark, sf, Materialize.Storage(dir)))
    assert(stored == local)
    assert(spark.read.parquet(s"$dir/jaccard_shingles").count() > 0)
  }

  test("bloom decontamination and contamination score: storage mode == local mode") {
    import graft.ops.{Sketch, TextStats}
    val dir = Files.createTempDirectory("graft_mat").toString
    val localB = rows(Sketch.bloomDecontaminateOf(Tables.documents(spark, sf)))
    val storedB = rows(Sketch.bloomDecontaminateOf(
      Tables.documents(spark, sf), Materialize.Storage(dir)))
    assert(storedB == localB)
    assert(spark.read.parquet(s"$dir/bloom_shingles").count() > 0)
    val localC = rows(TextStats.contaminationScore(spark, sf))
    val storedC = rows(TextStats.contaminationScore(spark, sf,
      Materialize.Storage(dir)))
    assert(storedC == localC)
    assert(spark.read.parquet(s"$dir/contam_shingles").count() > 0)
  }

  test("label propagation rounds persist and converge identically in storage mode") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("u", "v")
    val dir = Files.createTempDirectory("graft_mat").toString
    val local = rows(Dedup.labelPropagation(edges).orderBy("id"))
    val stored = rows(
      Dedup.labelPropagation(edges, mode = Materialize.Storage(dir)).orderBy("id"))
    assert(stored == local)
    assert(spark.read.parquet(s"$dir/cc_round_0").count() > 0)
  }

  test("IVF top-k: storage mode == local mode") {
    val dir = Files.createTempDirectory("graft_mat").toString
    val local = rows(Similarity.ivfTopK(spark, sf))
    val stored = rows(Similarity.ivfTopK(spark, sf, Materialize.Storage(dir)))
    assert(stored == local)
    assert(spark.read.parquet(s"$dir/ivf_quantized").count() > 0)
  }

  test("releaseAll drops every cached and checkpointed block") {
    val sc = spark.sparkContext
    Dedup.minhashLshQuery(spark, sf).count() // leaves Local blocks behind
    assert(sc.getPersistentRDDs.nonEmpty)
    Materialize.releaseAll(spark)
    assert(sc.getPersistentRDDs.isEmpty)
  }

  test("cachedCount: one count action per canonical plan per lifecycle; releaseAll ends the lifecycle") {
    import org.apache.spark.sql.functions.{col, udf}
    Materialize.releaseAll(spark) // clean slate
    // a side-effecting filter makes count actions OBSERVABLE (an
    // accumulator survives the task-closure serialization a plain
    // captured counter does not); the same udf instance in two
    // separately-built frames keeps their canonicalized plans
    // structurally equal — exactly the dd5/dd9/sim3/sim4 same-corpus
    // sharing shape
    val acc = spark.sparkContext.longAccumulator("cachedCountProbe")
    val probe = udf { _: Long => acc.add(1); true }
    def frame(n: Int) = spark.range(n).toDF("id").filter(probe(col("id")))
    val n1 = Materialize.cachedCount(frame(50))
    assert(n1 == 50L)
    val afterFirst = acc.value.longValue
    assert(afterFirst >= 50, "first cachedCount must evaluate the plan")
    // structurally-identical fresh frame: cache hit, ZERO evaluations
    assert(Materialize.cachedCount(frame(50)) == 50L)
    assert(acc.value.longValue == afterFirst,
      "a repeated cachedCount of the same canonical plan re-ran the scan")
    // a genuinely different plan is a different key (and a real count)
    assert(Materialize.cachedCount(frame(60)) == 60L)
    assert(acc.value.longValue >= afterFirst + 60)
    // releaseAll ends the lifecycle: entries drop, the next call
    // re-counts (no stale reads after an input overwrite)
    assert(Materialize.cachedCountEntries(spark) >= 2)
    Materialize.releaseAll(spark)
    assert(Materialize.cachedCountEntries(spark) == 0)
    val beforeRecount = acc.value.longValue
    assert(Materialize.cachedCount(frame(50)) == 50L)
    assert(acc.value.longValue >= beforeRecount + 50, "post-release call must re-count")
  }

  test("Local mode injects MEASURED stats: array-heavy frames stop under-reporting, small frames stay broadcastable") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.Bridge
    Materialize.releaseAll(spark)
    // the round-8 sf1 failure shape: a collect_list aggregate whose
    // optimizer estimate uses fixed default column widths (tiny) while
    // the real rows carry 200-element string arrays (tens of MB)
    val arrayHeavy = spark.range(400000).toDF("id")
      .withColumn("g", col("id") % 2000)
      .groupBy("g")
      .agg(collect_list(md5(col("id").cast("string"))).as("hs"))
    // counterfactual: what the optimizer believed BEFORE measurement —
    // the raw checkpoint preserves the pre-checkpoint estimate
    val carried = Bridge.rootSizeInBytes(arrayHeavy)
    val mat = Materialize(arrayHeavy, Materialize.Local, "stats_probe")
    val measured = Bridge.rootSizeInBytes(mat)
    val thresholdB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    info(s"carried=$carried measured=$measured threshold=$thresholdB")
    assert(measured > carried,
      s"measured stats ($measured) must exceed the carried-over " +
        s"under-estimate ($carried) for an array-heavy aggregate")
    assert(measured > 10L * 1024 * 1024,
      s"the probe frame should really be >10MB in memory, got $measured")
    // broadcast consequence: joined against a fact side (itself past
    // the broadcast threshold, 3M×8B), the measured size keeps the
    // plan keyed (pre-fix, the under-estimate let Catalyst broadcast
    // the whole corpus-derived table)
    val fact = spark.range(3000000).toDF("g")
    val keyedPlan = fact.join(mat, "g").queryExecution.executedPlan.toString
    assert(!keyedPlan.contains("BroadcastHashJoin"), keyedPlan.take(1500))
    // and a genuinely small materialized frame still measures small and
    // still broadcasts — no blanket anti-broadcast tax
    val small = Materialize(
      spark.range(200).toDF("g").withColumn("x", col("g") * 2),
      Materialize.Local, "stats_small")
    assert(Bridge.rootSizeInBytes(small) < 10L * 1024 * 1024)
    val bcastPlan = fact.join(small, "g").queryExecution.executedPlan.toString
    assert(bcastPlan.contains("BroadcastHashJoin"), bcastPlan.take(1500))
    Materialize.releaseAll(spark)
  }

  test("hashJoinIfFits: autoBroadcastJoinThreshold=-1 (broadcast disabled) disables the hint, no parse crash") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val df = Materialize(
        spark.range(100).toDF("g"), Materialize.Local, "neg_thresh")
      // negative threshold → threshold > 0 guard disables the hint
      val hinted = Materialize.hashJoinIfFits(df)
      assert(hinted.queryExecution.logical.toString ==
        df.queryExecution.logical.toString)
      Materialize.releaseAll(spark)
    } finally spark.conf.set(key, saved)
  }

  test("cachedCount: Storage writes invalidate the session's counts; checkpointed plans are never cached") {
    Materialize.releaseAll(spark)
    assert(Materialize.cachedCount(spark.range(40).toDF("id")) == 40L)
    assert(Materialize.cachedCountEntries(spark) == 1)
    // a localCheckpoint scan is a fresh LogicalRDD every time — an
    // entry could never hit again and would only pin the RDD, so it
    // must not be cached
    val ck = spark.range(10).toDF("id").localCheckpoint(true)
    assert(Materialize.cachedCount(ck) == 10L)
    assert(Materialize.cachedCountEntries(spark) == 1)
    // a Storage-mode materialization is the one point table contents
    // can change under a cached plan (overwrite of a shared dir) — it
    // must clear the session's entries so no stale count survives
    val dir = Files.createTempDirectory("graft_mat").toString
    Materialize(spark.range(5).toDF("id"), Materialize.Storage(dir), "t")
    assert(Materialize.cachedCountEntries(spark) == 0)
  }
}
