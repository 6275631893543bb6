package graft

import org.apache.spark.sql.functions._

/** Throwaway stage-attribution probe for the jacboiler 100x regression
  * bisect (round 11). Not part of the driver contract. */
object ProbeJac {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = args.lift(0).map(_.toInt).getOrElse(100)
    val spark = Harness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    println(s"[probejac] initialPartitionNum=" + spark.conf.getOption(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum"))
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probejac] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docsG = ScaleProbe.replicated(spark, sfDir, n)
      .withColumn("text", concat(col("text"), lit(" all rights reserved")))
      .localCheckpoint(true)
    println(s"[probejac] docs=${docsG.count()}")
    val (flat, pfx) = time("stages (flat+pfx materialize)") {
      val s = graft.ops.Dedup.ngramJaccardStages(docsG)
      s._1.count(); s._2.count(); s
    }
    val rest = graft.ops.Dedup.ngramJaccardRest(flat, pfx)
    val pairs = time("rest (cand join + verify)") { rest.collect().length }
    println(s"[probejac] pairs=$pairs")
    println(rest.queryExecution.executedPlan.toString.take(9000))
    spark.stop()
  }
}
