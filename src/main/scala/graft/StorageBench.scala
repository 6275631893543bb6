package graft

import org.apache.spark.sql.SparkSession

import graft.ops.{Dedup, Materialize}

/** Measures the cost of the [[graft.ops.Materialize.Storage]] lifecycle
  * for the LSH family — the durable-parquet-intermediates posture the
  * 100-TB scaladocs claim (shingle/band/label tables persisted to
  * storage, surviving executor loss) — against the default
  * [[graft.ops.Materialize.Local]] checkpoint lifecycle the driver
  * bench runs. dd7 additionally switches algorithm under Storage (the
  * distributed pointer-jumping loop; Local uses the driver union-find
  * below the edge threshold), so its delta is lifecycle + algorithm.
  * Prints one JSON line per (query, mode) with the median of
  * SPARK_GRAFT_RUNS (default 3) timed runs. Run:
  *   SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.StorageBench'
  */
object StorageBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val dir = sys.env.getOrElse("SPARK_GRAFT_STORAGE_DIR",
      "/tmp/graft_storage_bench")
    val spark = Harness.session(cpus)
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().collect()

    def wipe(): Unit = {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir))
    }

    val cases: Seq[(String, Materialize.Mode => Long)] = Seq(
      "dd2_minhash_lsh" ->
        (m => Dedup.minhashLshQuery(spark, sfDir, m).count()),
      "dd7_dedup_clusters" ->
        (m => Dedup.dedupClusters(spark, sfDir, m).count()),
      // apples-to-apples LIFECYCLE row: the distributed loop in BOTH
      // modes (threshold 0 disables the Local union-find switch), so
      // this row's local/storage delta is the durable-posture premium
      // alone, while dd7_dedup_clusters' local row keeps the production
      // Local path (union-find under the broadcast-style threshold) and
      // its delta is lifecycle + algorithm
      "dd7_loop_both_modes" ->
        (m => Dedup.dedupClusters(spark, sfDir, m, localThreshold = 0L).count()),
      "dd9_simhash_pairs" ->
        (m => Dedup.simhashPairs(spark, sfDir, m).count()))

    cases.foreach { case (name, fn) =>
      Seq("local" -> Materialize.Local,
          "storage" -> Materialize.Storage(dir)).foreach { case (label, m) =>
        val ts = (1 to runs).map { _ =>
          wipe()
          val t0 = System.nanoTime()
          val rows = fn(m)
          val t = (System.nanoTime() - t0) / 1e9
          Materialize.releaseAll(spark)
          (t, rows)
        }
        val med = ts.map(_._1).sorted.apply(runs / 2)
        println(f"""{"query":"$name","mode":"$label","sec_p50":$med%.2f,""" +
          f""""rows":${ts.head._2},"runs":${ts.map(t => f"${t._1}%.2f")
            .mkString("[", ",", "]")}}""")
      }
    }
    wipe()
    spark.stop()
  }
}
