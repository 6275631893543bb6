package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Measures the tx43/tx44 scaladoc claim that past the broadcast
  * threshold, AQE's skew-join splitter absorbs the Zipf-head `tok`
  * keys of the reference-LM scoring joins — previously asserted, never
  * measured.
  *
  * Construction: the corpus replicates WITHOUT the ScaleProbe token
  * salt (the salt makes copies vocabulary-disjoint, which would erase
  * the cross-corpus Zipf head this probe exists to stress), so the
  * head tokens' df grows ×factor. The broadcast threshold is forced
  * tiny so the model joins plan as SHUFFLES on the Zipf-head key —
  * the >10 TB regime — and each configuration records wall time plus
  * the worst stage's max/median task time (the skew statistic).
  * Configurations: broadcast control, forced-shuffle with AQE skew
  * split ON, forced-shuffle with it OFF.
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.ProbeLmSkew 40'
  */
object ProbeLmSkew {

  /** Per-stage (max, p50) task durations, captured per run. */
  private final class TaskStats extends SparkListener {
    val byStage = scala.collection.mutable.Map
      .empty[Int, scala.collection.mutable.ArrayBuffer[Long]]
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      if (t.taskInfo != null && t.taskInfo.successful)
        byStage.getOrElseUpdate(t.stageId,
          scala.collection.mutable.ArrayBuffer.empty[Long]) += t.taskInfo.duration
    }
    /** The heaviest stage's (tasks, maxMs, p50Ms) — skew shows as
      * max >> p50 within one stage. */
    def worstStage: (Int, Long, Long) = synchronized {
      if (byStage.isEmpty) (0, 0L, 0L)
      else {
        val (_, ds) = byStage.maxBy(_._2.sum)
        val sorted = ds.sorted
        (ds.size, sorted.last, sorted(ds.size / 2))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = args.lift(0).map(_.toInt).getOrElse(40)
    val spark = Harness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    // UNsalted replication: same vocabulary in every copy -> the Zipf
    // head concentrates (df x factor); fresh doc_ids keep outputs keyed.
    // Rebuilt PER RUN: each run's releaseAll drops every checkpoint,
    // this one included
    def docs() = {
      val base = Tables.documents(spark, sfDir)
      val stride = 10_000_000L
      (0 until factor).map { i =>
        base.withColumn("doc_id", col("doc_id") + lit(i.toLong * stride))
      }.reduce(_ unionByName _).localCheckpoint(true)
    }
    // count-and-release: the announcement must not leave a second x40
    // corpus resident through the first measured configuration
    val nDocs = docs().count()
    graft.ops.Materialize.releaseAll(spark)
    println(s"[lmskew] docs=$nDocs (factor $factor, unsalted)")

    def run(tag: String, op: String, broadcastOff: Boolean,
        skewOn: Boolean): Unit = {
      val confs = Seq(
        "spark.sql.autoBroadcastJoinThreshold" ->
          (if (broadcastOff) "-1" else "10MB"),
        "spark.sql.adaptive.skewJoin.enabled" -> skewOn.toString,
        // fixture-scale skew thresholds (production defaults are sized
        // for warehouse partitions): without these the splitter never
        // triggers at probe scale and the OFF/ON compare reads equal.
        // NOT too small either — a threshold near the MEDIAN partition
        // size marks every partition skewed and shreds the join into
        // thousands of duplicated sub-splits (first draft: 1 MB on a
        // multi-GB stream, >7 min for a 30 s join)
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
          "32MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
          (if (broadcastOff) "16MB" else "64MB"),
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
      val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // corpus rebuilt BEFORE the listener registers: otherwise the
      // replication/checkpoint stages (heavy, unskewed) can win the
      // worst-stage tally and the skew statistic describes the wrong
      // stage entirely
      val d = docs()
      val stats = new TaskStats
      spark.sparkContext.addSparkListener(stats)
      try {
        val t0 = System.nanoTime()
        val out = op match {
          case "tx43" => graft.ops.TextStats.refLmFilterOf(d)
          case "tx44" => graft.ops.TextStats.backoffLmFilterOf(d)
        }
        val rows = out.count()
        val sec = (System.nanoTime() - t0) / 1e9
        // listener events are async; a short settle keeps the last
        // stage's tasks in the tally (probe-grade precision)
        Thread.sleep(500)
        val (tasks, maxMs, p50Ms) = stats.worstStage
        println(f"""{"op":"$op","cfg":"$tag","sec":$sec%.2f,"rows":$rows,""" +
          f""""worst_stage_tasks":$tasks,"task_max_ms":$maxMs,""" +
          f""""task_p50_ms":$p50Ms}""")
      } finally {
        spark.sparkContext.removeSparkListener(stats)
        prev.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
        graft.ops.Materialize.releaseAll(spark)
      }
    }

    Seq("tx43", "tx44").foreach { op =>
      run("broadcast", op, broadcastOff = false, skewOn = true)
      run("shuffle+skewOn", op, broadcastOff = true, skewOn = true)
      run("shuffle+skewOff", op, broadcastOff = true, skewOn = false)
    }
    spark.stop()
  }
}
