package graft
import org.apache.spark.sql.SparkSession

/** Driver bench: times every SparkEntry query at the given SF, prints one
  * JSON line. A short warmup (scan + aggregate) runs first so the first
  * timed query doesn't absorb JVM/codegen/session initialization.
  *
  * Each query runs [[Runs]] times. The FINAL stdout line is a minimal
  * JSON object whose `queries` map carries the MEDIAN (p50) per-query
  * seconds — the round-comparable statistic — kept small enough to fit
  * whole inside the driver's fixed-size tail capture; `cold` (first run)
  * and `max` (worst run) detail maps print on separate earlier lines. A
  * crashing query is NOT silently folded into a timing: it lands in
  * `errors` (name + exception) and is excluded from every total.
  *
  * Isolation: every cached/checkpointed block is released between runs
  * ([[graft.ops.Materialize.releaseAll]]) — the LSH-family queries
  * materialize shingle/band tables that would otherwise accumulate
  * across 60 queries × [[Runs]] runs until storage eviction + GC churn
  * pollute *neighboring* queries' timings (the round-2 dd2 23.5 s /
  * tx4 7 s outliers). */
object Bench {
  /** 5, not 3: a 3-run median is one slow run away from being dragged
    * to the middle value under machine load — the round-4 j1/a10
    * false-regression mechanism (adjudicated with n=8 in BenchFocus).
    * A 5-run median tolerates two outliers per query. */
  val Runs = 5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Harness.session(cpus)
    // warmup: exercise scan, shuffle, and codegen paths once
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().collect()
    Tables.events(spark, sfDir).limit(10).collect()

    def esc(s: String): String = graft.functions.Functions.jsonEscape(s)

    var errors = List.empty[String]
    val timings = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val ts = scala.collection.mutable.ArrayBuffer.empty[Double]
        var err: Option[String] = None
        var i = 0
        while (i < Runs && err.isEmpty) { // don't retry a failed query
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); ts += (System.nanoTime() - t0) / 1e9 }
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
            val sorted = ts.toVector.sorted
            Some((name, ts.head, sorted(sorted.length / 2), sorted.last))
        }
    }

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
    // The driver keeps only the LAST 2000 chars of output, so the
    // detail statistics (cold/max, 3-decimal) go on their own earlier
    // lines and the FINAL line is a minimal self-contained JSON object —
    // headline total + per-query p50 at 2 decimals — sized to fit the
    // tail capture whole (round 3's single fat line was clipped mid-map
    // and the driver recorded parsed:null).
    println(s"""{"detail":"cold","runs":$Runs,"total":${fmt(coldTotal, 3)},"queries":${obj(_._2, 3)}}""")
    println(s"""{"detail":"max","runs":$Runs,"total":${fmt(maxTotal, 3)},"queries":${obj(_._4, 3)}}""")
    // full-precision p50 detail ALWAYS rides an earlier line: once the
    // query count pushes the final line to degraded decimals, this is
    // where per-query analysis reads from (driver full logs / local runs)
    println(s"""{"detail":"p50","runs":$Runs,"total":${fmt(p50Total, 3)},"queries":${obj(_._3, 3)}}""")
    val sfName = new java.io.File(sfDir).getName
    // errors ride the final line only when present — the empty list is
    // implied by rc=0 and costs budget the growing query map needs
    val errField = if (errors.isEmpty) "" else s""""errors":$errJson,"""
    def finalLine(dec: Int): String =
      s"""{"metric":"p50_total","value":${fmt(p50Total, 3)},"unit":"sec",""" +
        errField + s""""sf":"$sfName","queries":${obj(_._3, dec)}}"""
    // the line MUST fit the driver's 2000-char tail capture whole — a
    // clipped line records parsed:null (the round-3 failure). Nothing
    // prints after this line (sbt's [success] trailer is suppressed),
    // so the true ceiling is 2000 minus the trailing newline = 1999;
    // budget 1995 keeps a 4-char safety margin (at 88 queries the
    // 0-decimal map needs ~1984 — a tighter 1980 budget would already
    // drop the map the driver's trend table reads). Degrade per-query
    // precision before ever letting a clip happen; a stderr note
    // records the downshift.
    // when the full 0-decimal map no longer fits (~90+ queries), keep
    // the MOST EXPENSIVE queries' p50s in the machine-parsed line at
    // 2 decimals up to the budget — those are the entries per-query
    // regression tracking actually reads; the cheap tail lives on the
    // full-precision detail line above. Headline p50_total still covers
    // every query either way.
    def topLine(): String = {
      val byCost = timings.sortBy(-_._3)
      val keep = scala.collection.mutable.ListBuffer.empty[(String, Double)]
      var len = (s"""{"metric":"p50_total","value":${fmt(p50Total, 3)},""" +
        s""""unit":"sec",""" + errField + s""""sf":"$sfName","queries":{}}""").length
      byCost.foreach { t =>
        val entry = s""""${esc(t._1)}":${fmt(t._3, 2)},""".length
        if (len + entry <= 1995) { keep += ((t._1, t._3)); len += entry }
      }
      val m = keep.sortBy(_._1)
        .map { case (n, v) => s""""${esc(n)}":${fmt(v, 2)}""" }
        .mkString("{", ",", "}")
      System.err.println(s"[bench] final line keeps top ${keep.size} of " +
        s"${timings.size} per-query p50s (full map on the detail line)")
      s"""{"metric":"p50_total","value":${fmt(p50Total, 3)},"unit":"sec",""" +
        errField + s""""sf":"$sfName","queries":$m}"""
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
