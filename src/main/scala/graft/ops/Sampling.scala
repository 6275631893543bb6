package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Functions.md5Hash60

/** Relational sampling operators beyond the document-corpus ones
  * (tx13/tx14/smp1/smp2): the shapes contrastive / two-tower training
  * pipelines need over interaction tables.
  */
object Sampling {

  /** Candidate draws per positive and negatives kept. 6 draws for 3
    * negatives gives survival headroom when a draw collides with a
    * true positive (a ~3% event per draw at sf0.1 density). */
  val NumDraws = 6
  val NumNegatives = 3

  /** smp3 — deterministic NEGATIVE sampling for contrastive training:
    * for every observed (supplier, part) interaction, k pseudo-random
    * part ids the supplier did NOT interact with. Draws are stable
    * md5 hashes of (supplier, part, draw-index) — reproducible across
    * runs, engines, and partitioning, the property that makes a
    * training set auditable — mapped into the contiguous part-key
    * domain, then filtered against the positive set and deduplicated
    * keeping the earliest draw.
    *
    * Scale shape: the positive set is one distinct over the fact
    * table; draws are a 6-way explode (narrow); the rejection filter
    * is a keyed LEFT ANTI self-join on (supplier, candidate); the
    * keep-first-k window partitions by the (supplier, part) pair —
    * millions of tiny partitions, never a global sort. The part-domain
    * size is a one-row broadcast. Everything shuffles on keys the
    * data already has; nothing is quadratic. */
  def negativeSampling(s: SparkSession, d: String): DataFrame =
    negativeSamplingOf(Tables.lineitem(s, d), Tables.part(s, d))

  /** [[negativeSampling]] over explicit lineitem/part frames.
    *
    * The draw dedup (keep the earliest draw of a repeated candidate)
    * happens MAP-SIDE before the explode: with a compile-time-constant
    * draw count the "first occurrence" flag is ≤15 codegen'd
    * comparisons per row, so the exploded stream is already
    * candidate-distinct and the plan needs no (pair, cand) aggregation
    * exchange — one shuffle for the rank window (plus whatever the
    * anti join picks) instead of two. BenchFocus noop medians at
    * sf0.1: 6.05 → 5.30 s (warm runs 4.3–4.7) for identical output;
    * the residual cost is the 1.77M-row output sort + write the
    * oracle-determinism contract pays. */
  def negativeSamplingOf(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val pos = lineitem
      .select(col("l_suppkey"), col("l_partkey")).distinct()
    // part keys are contiguous 0..max (TESTDATA generator); the modulus
    // is max+1 so every draw lands on a real part
    val pMax = part.agg((max(col("p_partkey")) + 1L).as("p"))
    val cands = (1 to NumDraws).map { i =>
      pmod(md5Hash60(
        concat_ws(":", col("l_suppkey").cast("string"),
          col("l_partkey").cast("string"), lit(i.toString)), 13),
        col("p"))
    }
    // materialize each draw ONCE as a column before the dup
    // comparisons reference it — inlining the md5 into every pairwise
    // comparison would evaluate it up to 6× per row (measured 2.4×
    // slower); CollapseProject keeps non-cheap multi-referenced
    // aliases in their own projection
    val withCands = pos.crossJoin(broadcast(pMax))
      .select(col("l_suppkey") +: col("l_partkey") +:
        (1 to NumDraws).map(i => cands(i - 1).as(s"c$i")): _*)
    val entries = (1 to NumDraws).map { i =>
      val dup = (1 until i).map(k => col(s"c$i") === col(s"c$k"))
        .reduceOption(_ || _).getOrElse(lit(false))
      struct(lit(i.toLong).as("draw"), col(s"c$i").as("cand"),
        (!dup).as("keep"))
    }
    val drawn = withCands
      .select(col("l_suppkey"), col("l_partkey"),
        explode(array(entries: _*)).as("e"))
      // row-level filter, NOT a higher-order array filter: ArrayFilter
      // is interpreted and would drag the six md5 expressions out of
      // whole-stage codegen
      .filter(col("e.keep"))
      .select(col("l_suppkey"), col("l_partkey"),
        col("e.draw").as("draw"), col("e.cand").as("cand"))
    val nonPos = drawn.join(
      pos.select(col("l_suppkey"), col("l_partkey").as("cand")),
      Seq("l_suppkey", "cand"), "left_anti")
    val w = Window.partitionBy("l_suppkey", "l_partkey")
      .orderBy("draw")
    nonPos.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= NumNegatives)
      .select(col("l_suppkey"), col("l_partkey"), col("rank"),
        col("cand").as("neg_partkey"), col("draw"))
      .orderBy("l_suppkey", "l_partkey", "rank")
  }

  val negativeSamplingOracle: String =
    s"""WITH pos AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
       |pm AS (SELECT max(p_partkey) + 1 AS p FROM part),
       |g AS (SELECT unnest(generate_series(1, $NumDraws)) AS i),
       |drawn AS (
       |  SELECT l_suppkey, l_partkey, i,
       |    ('0x' || substr(md5('13' || ':' || CAST(l_suppkey AS VARCHAR)
       |      || ':' || CAST(l_partkey AS VARCHAR)
       |      || ':' || CAST(i AS VARCHAR)), 1, 15))::BIGINT % p AS cand
       |  FROM pos, pm, g),
       |np AS (
       |  SELECT d.* FROM drawn d
       |  WHERE NOT EXISTS (SELECT 1 FROM pos p2
       |    WHERE p2.l_suppkey = d.l_suppkey AND p2.l_partkey = d.cand)),
       |fst AS (
       |  SELECT l_suppkey, l_partkey, cand, CAST(min(i) AS BIGINT) AS draw
       |  FROM np GROUP BY l_suppkey, l_partkey, cand),
       |rk AS (
       |  SELECT l_suppkey, l_partkey, cand, draw,
       |    CAST(row_number() OVER (PARTITION BY l_suppkey, l_partkey
       |      ORDER BY draw, cand) AS BIGINT) AS rank
       |  FROM fst)
       |SELECT l_suppkey, l_partkey, rank, cand AS neg_partkey, draw
       |FROM rk WHERE rank <= $NumNegatives
       |ORDER BY l_suppkey, l_partkey, rank""".stripMargin

  /** ord1 parameters: training epochs materialized, data-loader
    * shards per epoch, and the hash seed that makes the permutation
    * reproducible. */
  val ShuffleEpochs = 2
  val ShuffleShards = 8L
  val ShuffleSeed = 23

  /** ord1 — deterministic EPOCH SHUFFLE: the data-loader order for E
    * training epochs, each epoch an independent pseudo-random
    * permutation of the corpus, sharded for parallel consumption.
    * Every (epoch, doc) gets a stable md5 rank key — run the job
    * twice, or on a different cluster, and byte-identical shard files
    * come out; that reproducibility is what makes a training run
    * auditable (WHICH example was step 31337 of epoch 2?) and
    * resumable without materializing a global permutation anywhere.
    *
    * Scale shape: the key is a codegen projection; the shard
    * assignment is hash mod S; the position is a row_number WITHIN
    * (epoch, shard) — the only sorts are per-shard, exactly the units
    * a loader consumes, so nothing ever needs a global order (the
    * smp3/w-family keyed-window discipline). Epochs multiply output
    * rows, not shuffle width: each epoch's rows carry their own
    * shard keys through one exchange. */
  def epochShuffle(s: SparkSession, d: String): DataFrame =
    epochShuffleOf(Tables.documents(s, d))

  /** [[epochShuffle]] over an explicit documents frame. */
  def epochShuffleOf(docs: DataFrame): DataFrame = {
    val perEpoch = (0 until ShuffleEpochs).map { e =>
      docs.select(lit(e.toLong).as("epoch"), col("doc_id"))
    }.reduce(_ unionByName _)
    val keyed = perEpoch.withColumn("k",
      md5Hash60(concat_ws(":", col("epoch").cast("string"),
        col("doc_id").cast("string")), ShuffleSeed))
    val w = Window.partitionBy("epoch", "shard").orderBy("k", "doc_id")
    keyed
      .withColumn("shard", col("k") % ShuffleShards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("epoch", "shard", "pos", "doc_id")
      .orderBy("epoch", "shard", "pos")
  }

  val epochShuffleOracle: String =
    s"""WITH ep AS (SELECT unnest(generate_series(0, ${ShuffleEpochs - 1}))
       |  AS epoch),
       |k AS (
       |  SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
       |    ('0x' || substr(md5('$ShuffleSeed' || ':'
       |      || CAST(epoch AS VARCHAR) || ':'
       |      || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS k
       |  FROM documents, ep),
       |sh AS (SELECT epoch, doc_id, k, k % $ShuffleShards AS shard FROM k)
       |SELECT epoch, shard,
       |       CAST(row_number() OVER (PARTITION BY epoch, shard
       |         ORDER BY k, doc_id) AS BIGINT) AS pos,
       |       doc_id
       |FROM sh ORDER BY epoch, shard, pos""".stripMargin
}
