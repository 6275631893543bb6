package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-linearity probe: replicates the documents corpus N× (each
  * copy's text salted with its copy index so LSH candidates never
  * cross copies — the pair structure grows linearly by construction)
  * and times the three most shuffle-intensive pipelines at each N.
  * Near-linear wall-time growth is the measurable form of the "no
  * quadratic blowup, keyed shuffles only" claims the operator
  * scaladocs make. Run:
  *   SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.ScaleProbe 1 4 10'
  */
object ScaleProbe {

  def replicated(s: SparkSession, d: String, n: Int): DataFrame = {
    val base = Tables.documents(s, d)
    (0 until n).map { i =>
      base.select(
        (col("doc_id") + lit(i.toLong * 10_000_000L)).as("doc_id"),
        // salt EVERY token with the copy index: copies become textually
        // disjoint (zero shared shingles), so the true near-dup pair
        // structure grows linearly in n — a tail-only salt would leave
        // cross-copy clones at Jaccard ≈ 1 and measure the quadratic
        // clone structure instead of the engine
        regexp_replace(col("text"), "(\\S+)", s"c${i}_$$1").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 10)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    factors.foreach { n =>
      val docs = replicated(spark, sfDir, n).localCheckpoint(true)
      val nDocs = docs.count()
      val (tLsh, pairs) = time {
        graft.ops.Dedup.minhashLshPairs(docs, "doc_id", "text", 0.1).count()
      }
      graft.ops.Materialize.releaseAll(spark)
      val docs2 = replicated(spark, sfDir, n).localCheckpoint(true)
      val (tCluster, clusters) = time {
        val pairsDf = graft.ops.Dedup
          .minhashLshPairs(docs2, "doc_id", "text", 0.1)
          .select(col("doc_a").as("u"), col("doc_b").as("v"))
        graft.ops.Dedup.labelPropagation(pairsDf).count()
      }
      graft.ops.Materialize.releaseAll(spark)
      val docs3 = replicated(spark, sfDir, n).localCheckpoint(true)
      val (tPack, packed) = time {
        val toks = docs3.select(col("doc_id"),
          size(graft.ops.TextStats.words(col("text"))).cast("long").as("n_tokens"))
        graft.ops.PrefixSum.exclusive(
          toks, "doc_id", "n_tokens", spark.sparkContext.defaultParallelism)
          .count()
      }
      graft.ops.Materialize.releaseAll(spark)
      println(f"""{"factor":$n,"docs":$nDocs,"lsh_sec":$tLsh%.2f,"pairs":$pairs,""" +
        f""""cluster_sec":$tCluster%.2f,"labeled":$clusters,""" +
        f""""pack_sec":$tPack%.2f,"packed":$packed}""")
    }
    spark.stop()
  }
}
