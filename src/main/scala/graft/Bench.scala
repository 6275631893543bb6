package graft
import org.apache.spark.sql.SparkSession

/** Driver bench: times every SparkEntry query at the given SF, prints one
  * JSON line. A short warmup (scan + aggregate) runs first so the first
  * timed query doesn't absorb JVM/codegen/session initialization.
  *
  * Each query runs [[Runs]] times: `queries` carries the FIRST (cold)
  * timing — comparable with earlier single-shot rounds — while `p50` /
  * `max` carry the median / worst over all runs (honestly named: with
  * 3 runs the tail statistic IS the max) so round-over-round
  * regressions are attributable against ±20% single-shot machine noise.
  * A crashing query is NOT silently folded into a timing: it lands in
  * `errors` (name + exception) and is excluded from every total. */
object Bench {
  val Runs = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: exercise scan, shuffle, and codegen paths once
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().collect()
    Tables.events(spark, sfDir).limit(10).collect()

    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

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

    def obj(pick: ((String, Double, Double, Double)) => Double): String =
      timings.map(t => s""""${esc(t._1)}":${pick(t)}""").mkString("{", ",", "}")

    val coldTotal = timings.map(_._2).sum
    val p50Total = timings.map(_._3).sum
    val errJson = errors.reverse.map(e => s""""${esc(e)}"""").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$coldTotal,"unit":"sec",""" +
      s""""queries":${obj(_._2)},"p50":${obj(_._3)},"max":${obj(_._4)},""" +
      s""""p50_total":$p50Total,"runs":$Runs,"errors":$errJson,"sf":"$sfDir"}""")
    if (errors.nonEmpty) {
      System.err.println(s"[bench] ${errors.length} queries FAILED")
      spark.stop()
      sys.exit(1)
    }
    spark.stop()
  }
}
