package graft

import org.apache.spark.sql.functions._

/** Scale curves for the g-family ITERATIVE loops (round-9, VERDICT
  * item 6): g7 multi-seed BFS, g12 landmark centrality (multi-landmark
  * BFS with per-round materialization + early exit), g13 PageRank
  * residual rounds. Each round is a keyed frontier/rank join against
  * the (materialized) symmetric edge table; the question at 10×/40× is
  * whether rounds × per-round materialization stays ~linear in edges,
  * and where pre-bucketing the edge table would start to pay.
  *
  * Embeddings replicate with per-copy sign-flips
  * ([[ScaleProbe.replicatedEmb]]) so copies spread across LSH buckets
  * and the kNN edge count grows linearly by construction.
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.ScaleProbeGraph 1 10 40'
  */
object ScaleProbeGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10, 40)
    val spark = Harness.session(cpus)

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    factors.foreach { n =>
      def emb() = ScaleProbe.replicatedEmb(spark, sfDir, n).localCheckpoint(true)
      val e1 = emb()
      val nVec = e1.count()
      val nEdges = graft.ops.Similarity.knnGraphOf(e1).count()
      graft.ops.Materialize.releaseAll(spark)

      val (tG7, g7Rows) = time {
        graft.ops.Graph.bfsLandmarksOf(emb()).count()
      }
      graft.ops.Materialize.releaseAll(spark)

      val (tG12, g12Rows) = time {
        graft.ops.Graph.landmarkCentralityOf(emb()).count()
      }
      graft.ops.Materialize.releaseAll(spark)

      val (tG13, g13Rows) = time {
        val e = emb()
        val edges = graft.ops.Materialize(
          graft.ops.Similarity.knnGraphOf(e).select("src", "dst"),
          graft.ops.Materialize.Local, "probe_g13_edges")
        graft.ops.Similarity.pagerankResidualsOf(
          edges, e.select("vec_id"), graft.ops.Similarity.PrIters).count()
      }
      graft.ops.Materialize.releaseAll(spark)

      println(f"""{"factor":$n,"vecs":$nVec,"edges":$nEdges,""" +
        f""""g7_sec":$tG7%.2f,"g7_rows":$g7Rows,""" +
        f""""g12_sec":$tG12%.2f,"g12_rows":$g12Rows,""" +
        f""""g13_sec":$tG13%.2f,"g13_rows":$g13Rows}""")
    }
    spark.stop()
  }
}
