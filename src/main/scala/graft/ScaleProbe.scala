package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-linearity probe: replicates the documents corpus N× (each
  * copy's text salted with its copy index so LSH candidates never
  * cross copies — the pair structure grows linearly by construction)
  * and times the most shuffle-intensive pipelines at each N.
  * Near-linear wall-time growth is the measurable form of the "no
  * quadratic blowup, keyed shuffles only" claims the operator
  * scaladocs make. Run:
  *   SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.ScaleProbe 1 4 10'
  *
  * The embeddings corpus replicates by CIRCULAR-SHIFTING each copy's
  * vector by its copy index (norms and pairwise geometry within a copy
  * preserved; the fixed LSH hyperplanes are not shift-invariant, so
  * copies spread across buckets instead of stacking in them). Note the
  * expected shapes differ by design:
  *   - dd9 (SimHash bands): 2^15 values per band — buckets stay tiny,
  *     expect ~linear.
  *   - sim3 (IVF): sample-capped training + linear assignment + probe
  *     of nprobe/ncells of the corpus — expect ~linear.
  *   - sim4 (kNN graph): the plane count SELF-SIZES as
  *     Planes ∝ log₂(corpus) (Similarity.planesFor), holding expected
  *     per-bucket population ~constant — the r5 curve's ~N² bend at a
  *     fixed 2^8 buckets is the shape this sizing removes; the probe
  *     records the sized curve.
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
    val spark = Harness.session(cpus)

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
      val docs4 = replicated(spark, sfDir, n).localCheckpoint(true)
      val (tSim, simPairs) = time {
        graft.ops.Dedup.simhashPairsOf(docs4).count()
      }
      graft.ops.Materialize.releaseAll(spark)
      val docs5 = replicated(spark, sfDir, n).localCheckpoint(true)
      // a bare count() lets column pruning DROP the reassembly (the
      // collect_list/array_sort kept_text is the expensive half) — the
      // probe aggregates over kept_text so the full operator runs
      val (tPrune, pruned) = time {
        graft.ops.TextStats.dfPruneOf(docs5)
          .agg(count(lit(1)).as("n"),
            sum(length(col("kept_text"))).as("chars"))
          .collect()(0).getLong(0)
      }
      graft.ops.Materialize.releaseAll(spark)
      // the eval set grows with n here (salted copies shingle-disjoint),
      // so this measures the corpus-side probe stream against a bitmap
      // whose fill also grows — the conservative direction
      val docs6 = replicated(spark, sfDir, n).localCheckpoint(true)
      val (tBloom, bloomRows) = time {
        graft.ops.Sketch.bloomDecontaminateOf(docs6)
          .agg(count(lit(1)).as("n"),
            sum(col("n_bloom_hits")).as("hits"))
          .collect()(0).getLong(0)
      }
      graft.ops.Materialize.releaseAll(spark)
      // exact Jaccard: salted copies are shingle-disjoint, so the
      // inverted index's Σ df² candidate volume grows linearly in n —
      // the curve that evidences the all-pairs → inverted-index rewrite
      val docs7 = replicated(spark, sfDir, n).localCheckpoint(true)
      val (tJac, jacPairs) = time {
        graft.ops.Dedup.ngramJaccardPairsOf(docs7).count()
      }
      graft.ops.Materialize.releaseAll(spark)
      val emb = replicatedEmb(spark, sfDir, n).localCheckpoint(true)
      val nVecs = emb.count()
      val (tIvf, ivfRows) = time {
        graft.ops.Similarity.ivfTopKOf(emb,
          trainCap = graft.ops.Similarity.IvfTrainCap).count()
      }
      graft.ops.Materialize.releaseAll(spark)
      val emb2 = replicatedEmb(spark, sfDir, n).localCheckpoint(true)
      val (tKnn, knnEdges) = time {
        graft.ops.Similarity.knnGraphOf(emb2).count()
      }
      graft.ops.Materialize.releaseAll(spark)
      println(f"""{"factor":$n,"docs":$nDocs,"lsh_sec":$tLsh%.2f,"pairs":$pairs,""" +
        f""""cluster_sec":$tCluster%.2f,"labeled":$clusters,""" +
        f""""pack_sec":$tPack%.2f,"packed":$packed,""" +
        f""""simhash_sec":$tSim%.2f,"sim_pairs":$simPairs,""" +
        f""""dfprune_sec":$tPrune%.2f,"pruned":$pruned,""" +
        f""""bloom_sec":$tBloom%.2f,"bloom_rows":$bloomRows,""" +
        f""""jaccard_sec":$tJac%.2f,"jac_pairs":$jacPairs,""" +
        f""""vecs":$nVecs,"ivf_sec":$tIvf%.2f,"ivf_rows":$ivfRows,""" +
        f""""knn_sec":$tKnn%.2f,"knn_edges":$knnEdges}""")
    }
    spark.stop()
  }

  /** Embeddings replicated N× with the copy's vectors circular-shifted
    * by the copy index — norms and within-copy geometry preserved,
    * copies spread across LSH buckets (see class doc). vec_id 0 (the
    * ANN query vector) stays unique to copy 0. */
  def replicatedEmb(s: SparkSession, d: String, n: Int): DataFrame = {
    val base = Tables.embeddings(s, d)
    val dim = graft.ops.Similarity.Dim
    (0 until n).map { i =>
      val k = i % dim
      val shifted =
        if (k == 0) col("embedding")
        else concat(slice(col("embedding"), k + 1, dim - k),
          slice(col("embedding"), 1, k))
      base.select(
        (col("vec_id") + lit(i.toLong * 10_000_000L)).as("vec_id"),
        col("label"), shifted.as("embedding"))
    }.reduce(_ unionByName _)
  }
}
