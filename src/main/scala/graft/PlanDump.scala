package graft

/** Executed-plan dump for one driver query at any SF dir — the
  * .explain loop the scale reviews run on generated tiers (where a
  * spec can't hardcode expectations). Prints the join/exchange/window
  * skeleton after an actual run (so AQE's final decisions are shown,
  * not the static plan), then the full plan when `full` is passed.
  *
  *   SPARK_GRAFT_CPUS=32 sbt 'runMain graft.PlanDump <sfDir> <query> [full]'
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = Harness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val df = SparkEntry.queries(name)(spark, sfDir)
    val t0 = System.nanoTime()
    val n = df.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[plandump] $name rows=$n count_sec=$sec%.2f")
    val p = df.queryExecution.executedPlan.toString
    println("[plandump] skeleton:")
    p.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Window") || l.contains("FileScan") ||
        l.contains("Checkpoint") || l.contains("Scan ExistingRDD"))
      .foreach(l => println("  " + l.take(200)))
    if (args.length > 2 && args(2) == "full") println(p)
    spark.stop()
  }
}
