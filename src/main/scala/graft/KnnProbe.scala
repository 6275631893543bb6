package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall/latency probe for [[graft.ops.Similarity.knnGraph]]'s probe
  * radius — the evidence behind the [[graft.ops.Similarity.KnnProbeRadius]]
  * driver-query choice. Builds the EXACT all-pairs top-k graph (fine at
  * probe scale; never the production path) and reports, for radius 0
  * and 1, edge recall against it plus wall time. Run:
  *   SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.KnnProbe'
  */
object KnnProbe {

  def exactGraph(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", graft.ops.Similarity.dot(col("v"), col("v")))
    val a = e.select(col("vec_id").as("src"), col("v").as("av"),
      col("norm").as("anorm"))
    val b = e.select(col("vec_id").as("dst"), col("v").as("bv"),
      col("norm").as("bnorm"))
    val w = Window.partitionBy("src").orderBy(desc("cos"), col("dst"))
    a.join(b, col("src") =!= col("dst"))
      .withColumn("cos", graft.ops.Similarity.dot(col("av"), col("bv")) /
        (sqrt(col("anorm")) * sqrt(col("bnorm"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= graft.ops.Similarity.KnnK)
      .select("src", "dst")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Harness.session(cpus)
    val exact = exactGraph(spark, sfDir).localCheckpoint(true)
    val nExact = exact.count()
    Seq(0, 1).foreach { r =>
      // median of 5 timed runs, first run discarded as plan warmup
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        graft.ops.Similarity.knnGraph(spark, sfDir, r).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val g = graft.ops.Similarity.knnGraph(spark, sfDir, r)
      val hit = g.select("src", "dst").join(exact, Seq("src", "dst")).count()
      val edges = g.count()
      println(f"""{"radius":$r,"sec_p50":${ts(2)}%.2f,"edges":$edges,""" +
        f""""exact_edges":$nExact,"recall":${hit.toDouble / nExact}%.3f}""")
    }
    spark.stop()
  }
}
