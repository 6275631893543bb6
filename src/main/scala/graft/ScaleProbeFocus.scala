package graft

import org.apache.spark.sql.functions._

/** Focused scale curves for the round-8 claims, at factors the full
  * ScaleProbe sweep is too heavy to visit for every op:
  *
  *   1. dd4 under a GLOBAL hot shingle (unsalted footer on every doc):
  *      the PPJoin prefix filter must hold the curve ~linear where the
  *      unfiltered index grows quadratically in the footer's df.
  *   2. labelPropagation FORCED onto the distributed pointer-jumping
  *      path (localThreshold=0): per-copy-bounded components keep
  *      rounds O(log d) = constant, so time should be ~linear in edges
  *      — the measured form of dd7/dd8's warehouse-scale claim.
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.ScaleProbeFocus 1 10 40'
  */
object ScaleProbeFocus {
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
      // 3-token footer = ONE corpus-hot shingle (df = every doc) whose
      // solo Jaccard contribution 1/(n_a+n_b-1) stays under the 1/10
      // threshold for every doc pair — so the TRUE pair structure stays
      // the salted copies' linear one and the curve isolates candidate-
      // generation cost. (A longer footer makes short-doc pairs
      // genuinely qualify and the quadratic OUTPUT drowns the signal —
      // measured 409k→39.6M pairs at 1×→10× with a 10-token footer.)
      def parts() = spark.conf.get("spark.sql.shuffle.partitions")
      val docsG = ScaleProbe.replicated(spark, sfDir, n)
        .withColumn("text", concat(col("text"), lit(" all rights reserved")))
        .localCheckpoint(true)
      val nDocs = docsG.count()
      val (tJacB, jacBPairs) = time {
        graft.ops.Dedup.ngramJaccardPairsOf(docsG).count()
      }
      val jacParts = parts() // the seam ratchet's layout, pre-release
      graft.ops.Materialize.releaseAll(spark)
      val docsH = ScaleProbe.replicated(spark, sfDir, n).localCheckpoint(true)
      val (tDcc, dccLabeled) = time {
        val pairsDf = graft.ops.Dedup
          .minhashLshPairs(docsH, "doc_id", "text", 0.1)
          .select(col("doc_a").as("u"), col("doc_b").as("v"))
        graft.ops.Dedup.labelPropagation(pairsDf, localThreshold = 0L).count()
      }
      val dccParts = parts()
      graft.ops.Materialize.releaseAll(spark)
      println(f"""{"factor":$n,"docs":$nDocs,""" +
        f""""jacboiler_sec":$tJacB%.2f,"jacboiler_pairs":$jacBPairs,""" +
        f""""jacboiler_parts":$jacParts,""" +
        f""""distcc_sec":$tDcc%.2f,"distcc_labeled":$dccLabeled,""" +
        f""""distcc_parts":$dccParts}""")
    }
    spark.stop()
  }
}
