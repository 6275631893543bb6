package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing — the 100 TB join strategy: both fact
  * tables pre-bucketed on the join key join with NO exchange (each
  * bucket pair meets on the same executor). Verified on the physical
  * plan, plus the observe()-based row accounting (S17 done
  * Spark-natively).
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    val sf = GraftSpark.sf
    // in-memory catalog forgets tables between JVMs but leaves the
    // warehouse dirs behind — clear them so saveAsTable can re-create
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"/tmp/graft_warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete()); dir.delete()
      }
    }
    Tables.lineitem(spark, sf)
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    Tables.orders(spark, sf)
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")

    // force the sort-merge path (broadcast would trivially avoid the
    // shuffle; the bucketing claim is about the SMJ layout)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "o_orderstatus")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(1500))
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${p.take(2000)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE li_bucketed")
      spark.sql("DROP TABLE ord_bucketed")
    }
  }

  test("ANN probe over bucket-partitioned embeddings scans ONE bucket's files (bucket pruning)") {
    // the Similarity scaladoc's "at cluster scale you'd write the table
    // bucketed-by(bucket) so probes touch one partition" as a gated
    // fact: write embeddings bucketed by the sign-LSH bucket id, probe
    // one bucket, and assert the scan's SelectedBucketsCount is 1
    import graft.ops.Similarity
    val t = "emb_bucketed"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val dir = new java.io.File(s"/tmp/graft_warehouse/$t")
    if (dir.exists()) { dir.listFiles().foreach(_.delete()); dir.delete() }
    val Buckets = 16
    Tables.embeddings(spark, GraftSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("bucket", Similarity.bucketCol(col("v")))
      .write.mode("overwrite").bucketBy(Buckets, "bucket")
      .saveAsTable(t)
    // the planner's auto-bucketed-scan heuristic turns bucketed reads
    // OFF when no join/aggregate benefits — bucket PRUNING on a filter
    // is exactly the ANN-probe benefit it can't see, so pin it on
    val k = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(k, "true")
    spark.conf.set(k, "false")
    try {
      val probe = spark.table(t).filter(col("bucket") === 37)
      probe.collect()
      val scan = probe.queryExecution.executedPlan.toString
      assert(scan.contains(s"SelectedBucketsCount: 1 out of $Buckets"),
        s"probe scan did not prune to one bucket:\n${scan.take(2000)}")
    } finally {
      spark.conf.set(k, prev)
      spark.sql(s"DROP TABLE $t")
    }
  }

  test("multi-probe ANN over a cell-partitioned layout reads ONLY the probed partitions") {
    // the IVF story at warehouse scale: the corpus is written
    // partitioned by cell, so an nprobe-cell probe reads nprobe dirs'
    // files and skips the rest — asserted on the scan's numFiles metric
    // against the actual on-disk layout, not just the plan string
    import graft.ops.Similarity
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_part").toString
    Tables.embeddings(spark, GraftSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("cell", Similarity.bucketCol(col("v")))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    def filesUnder(sub: String): Int =
      Option(new java.io.File(s"$dir/$sub").listFiles())
        .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    val probed = Seq(3, 7)
    val expected = probed.map(c => filesUnder(s"cell=$c")).sum
    val total = Option(new java.io.File(dir).listFiles()).get
      .filter(_.getName.startsWith("cell="))
      .map(f => filesUnder(f.getName)).sum
    assert(expected > 0 && total > expected, s"fixture: $expected of $total files")
    val probe = spark.read.parquet(dir)
      .filter(col("cell").isin(probed.map(Integer.valueOf): _*))
    probe.collect()
    val scan = probe.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }.get
    assert(scan.metrics("numFiles").value == expected,
      s"probe read ${scan.metrics("numFiles").value} files, expected $expected of $total")
  }

  test("dynamic partition pruning: a dim filter prunes fact partitions at runtime") {
    // the 100 TB star-join staple: the fact is laid out partitioned by
    // the join key's derivative (year); a selective dim filter must
    // reach the fact scan as a RUNTIME partition filter, not a full scan
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables.orders(spark, GraftSpark.sf)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val nYears = Option(new java.io.File(dir).listFiles()).get
      .count(_.getName.startsWith("o_year="))
    assert(nYears > 2, s"fixture needs several partitions, got $nYears")
    val dim = spark.range(1990, 2010).toDF("y")
      .withColumn("pick", col("y") === 1997)
    val fact = spark.read.parquet(dir)
    val q = fact.join(dim.filter(col("pick")), col("o_year") === col("y"))
      .agg(count(lit(1)).as("n"))
    val n = q.collect()(0).getLong(0)
    val expected = Tables.orders(spark, GraftSpark.sf)
      .filter(year(col("o_orderdate")) === 1997).count()
    assert(n == expected && n > 0)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"no dynamic partition pruning in the fact scan:\n${p.take(2000)}")
  }

  test("bloom-filter runtime filter: a selective join key prunes probe rows before the shuffle") {
    // runtime row-level pruning (the complement of DPP for non-partition
    // keys): the selective side's keys build a bloom filter that is
    // applied at the large side's scan. Size thresholds are tuned for
    // warehouse scans — pin them down to demonstrate the plan shape at
    // test scale.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // injection only targets shuffle joins (a broadcast probe is
      // already cheap) — at test scale everything would broadcast, so
      // pin the join to the shuffle shape the filter exists for
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, GraftSpark.sf)
        .select("l_orderkey", "l_quantity")
      val sel = Tables.orders(spark, GraftSpark.sf)
        .filter(col("o_totalprice") > 450000) // highly selective, non-empty
        .select("o_orderkey")
      val q = li.join(sel, col("l_orderkey") === col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("s"))
      // the injected filter lives in the optimized plan as a
      // might_contain(bloom_filter_agg-subquery) guard on the probe scan
      // (the physical toString elides subquery bodies)
      val p = q.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        s"no bloom runtime filter injected:\n${p.take(2000)}")
      assert(q.collect()(0).getAs[Double](0) > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("observe() accounts for clean-stage row drops (S17, Spark-native)") {
    import org.apache.spark.sql.Observation
    val obsIn = Observation("in")
    val obsOut = Observation("out")
    val ev = Tables.events(spark, GraftSpark.sf)
      .observe(obsIn, count(lit(1)).as("rows"))
      .filter(col("value") > 50)
      .observe(obsOut, count(lit(1)).as("rows"))
    val kept = ev.count()
    val rowsIn = obsIn.get("rows").asInstanceOf[Long]
    val rowsOut = obsOut.get("rows").asInstanceOf[Long]
    assert(rowsOut == kept)
    assert(rowsIn > rowsOut, "filter dropped nothing — fixture broken")
  }
}
