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

  /** [[negativeSampling]] over explicit lineitem/part frames. */
  def negativeSamplingOf(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val pos = lineitem
      .select(col("l_suppkey"), col("l_partkey")).distinct()
    // part keys are contiguous 0..max (TESTDATA generator); the modulus
    // is max+1 so every draw lands on a real part
    val pMax = part.agg((max(col("p_partkey")) + 1L).as("p"))
    val drawn = pos.crossJoin(broadcast(pMax))
      .withColumn("i", explode(sequence(lit(1L), lit(NumDraws.toLong))))
      .withColumn("cand", pmod(md5Hash60(
        concat_ws(":", col("l_suppkey").cast("string"),
          col("l_partkey").cast("string"), col("i").cast("string")), 13),
        col("p")))
    val nonPos = drawn.join(
      pos.select(col("l_suppkey"), col("l_partkey").as("cand")),
      Seq("l_suppkey", "cand"), "left_anti")
    val first = nonPos.groupBy("l_suppkey", "l_partkey", "cand")
      .agg(min(col("i")).as("draw"))
    val w = Window.partitionBy("l_suppkey", "l_partkey")
      .orderBy("draw", "cand")
    first.withColumn("rank", row_number().over(w).cast("long"))
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
}
