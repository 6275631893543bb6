package graft

import org.apache.spark.sql.SparkSession

/** Focused per-query re-measurement: runs the named SparkEntry queries
  * (default: all) SPARK_GRAFT_RUNS times (default 8) and prints every
  * run plus min/median/max — the n≥4 variance evidence [[Bench]]'s
  * 3-run medians can't provide when a single query's round-over-round
  * delta needs adjudicating (noise vs regression). Uses the same
  * SPARK_GRAFT_BENCH_ACTION switch as [[Bench]], but times ONE action
  * per run: "count" for the r1–r5 trend numbers, anything else
  * (including [[Bench]]'s dual-sweep default "both") measures the
  * noop headline. Run:
  *   SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.BenchFocus j1_spatial_join'
  */
object BenchFocus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "8").toInt
    val action = sys.env.getOrElse("SPARK_GRAFT_BENCH_ACTION", "noop")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = Harness.session(cpus)
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().collect()

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        if (action == "count") fn(spark, sfDir).count()
        else fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val t = (System.nanoTime() - t0) / 1e9
        graft.ops.Materialize.releaseAll(spark)
        t
      }
      val sorted = ts.sorted
      val med = sorted(sorted.length / 2)
      println(f"$name%-24s med=$med%6.2f min=${sorted.head}%6.2f " +
        f"max=${sorted.last}%6.2f runs=[${ts.map(t => f"$t%.2f").mkString(",")}]")
    }
    spark.stop()
  }
}
