package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Functions

/** Model-evaluation operators — the scoring surface a training-data
  * pipeline needs once a model exists: confusion matrices, per-class
  * precision/recall/F1, exact ROC AUC, and calibration (reliability)
  * tables. The reference pipeline stops at curation; these close the
  * loop from curated data to measured model quality, at the same
  * determinism bar as the rest of the engine (exact integer counts,
  * one-shot IEEE divisions both engines compute identically).
  *
  * The "model" under evaluation is a deterministic synthetic scorer —
  * the true class is the integer-cents severity bucket of `value`, the
  * predicted score perturbs those cents by a stable md5-derived offset
  * (the same md5-60 twin the split/sampling operators use), so every
  * metric is reproducible cross-engine without shipping a real model.
  *
  * Scale notes: every operator here is one or two hash aggregations on
  * bounded key domains (class labels, score cents, bins). The AUC
  * window runs over the per-(slice, score) AGGREGATE — state bounded
  * by the score domain (|cents| ≤ 50k here), never the row count, so
  * the rank pass is a small partitioned sort even at 100 TB of events.
  */
object Eval {

  /** Severity-class bucketing on integer cents (crit/high/med/low).
    * Public: the streaming confusion twin applies the same classifier. */
  def bucketCents(cents: Column): Column =
    when(cents >= 40000L, "crit")
      .when(cents >= 25000L, "high")
      .when(cents >= 10000L, "med")
      .otherwise("low")

  /** Deterministic "model score" noise: stable signed md5 offset in
    * [-10000, 10000] keyed by event_id (seed 11); the score is the true
    * cents plus this. Public for the streaming twin. */
  def scoreNoise(idCol: Column): Column =
    pmod(Functions.md5Hash60(idCol.cast("string"), 11), lit(20001L)) - lit(10000L)

  private def scored(s: SparkSession, d: String): DataFrame = {
    val cents = Functions.cents(col("value"))
    Tables.events(s, d)
      .filter(col("value").isNotNull)
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        cents.as("cents"),
        (cents + scoreNoise(col("event_id"))).as("pred_cents"))
  }

  private val scoredSql: String =
    """SELECT event_id, user_id, event_type,
      |       CAST(round(value * 100) AS BIGINT) AS cents,
      |       CAST(round(value * 100) AS BIGINT)
      |         + ('0x' || substr(md5('11' || ':' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 20001
      |         - 10000 AS pred_cents
      |FROM events WHERE value IS NOT NULL""".stripMargin

  private val bucketSql: String => String = c =>
    s"CASE WHEN $c >= 40000 THEN 'crit' WHEN $c >= 25000 THEN 'high' " +
      s"WHEN $c >= 10000 THEN 'med' ELSE 'low' END"

  /** clf1 — multi-class confusion matrix: (actual, predicted, n) cells.
    * One hash aggregation on a ≤16-cell key domain; map-side partials
    * reduce each executor's contribution to at most 16 rows, so the
    * shuffle is O(executors), not O(rows) — the right shape at any SF. */
  def confusionMatrix(s: SparkSession, d: String): DataFrame =
    scored(s, d)
      .select(bucketCents(col("cents")).as("actual"),
        bucketCents(col("pred_cents")).as("predicted"))
      .groupBy("actual", "predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy("actual", "predicted")

  val confusionMatrixOracle: String =
    s"""WITH t AS ($scoredSql)
       |SELECT ${bucketSql("cents")} AS actual,
       |       ${bucketSql("pred_cents")} AS predicted,
       |       count(*) AS n
       |FROM t GROUP BY actual, predicted ORDER BY actual, predicted""".stripMargin

  /** clf2 — per-class precision/recall/F1 from the confusion cells: two
    * aggregations of the (tiny) cell table joined on class, tp/fp/fn as
    * exact integers, each metric ONE division (F1 in its 2tp/(2tp+fp+fn)
    * single-division form so no composed rounding). Classes missing on
    * one axis surface with 0s via the full outer join, not silently. */
  def classMetrics(s: SparkSession, d: String): DataFrame = {
    val cells = scored(s, d)
      .select(bucketCents(col("cents")).as("actual"),
        bucketCents(col("pred_cents")).as("predicted"))
      .groupBy("actual", "predicted")
      .agg(count(lit(1)).as("n"))
    val byActual = cells.groupBy(col("actual").as("cls"))
      .agg(sum(when(col("predicted") === col("actual"), col("n")).otherwise(0L)).as("tp_a"),
        sum(col("n")).as("actual_n"))
    val byPred = cells.groupBy(col("predicted").as("cls"))
      .agg(sum(when(col("predicted") === col("actual"), col("n")).otherwise(0L)).as("tp_p"),
        sum(col("n")).as("predicted_n"))
    byActual.join(byPred, Seq("cls"), "full_outer")
      .select(
        col("cls"),
        coalesce(col("tp_a"), col("tp_p"), lit(0L)).as("tp"),
        (coalesce(col("predicted_n"), lit(0L)) - coalesce(col("tp_p"), lit(0L))).as("fp"),
        (coalesce(col("actual_n"), lit(0L)) - coalesce(col("tp_a"), lit(0L))).as("fn"))
      .withColumn("precision",
        when(col("tp") + col("fp") === 0L, lit(null)).otherwise(col("tp") / (col("tp") + col("fp"))))
      .withColumn("recall",
        when(col("tp") + col("fn") === 0L, lit(null)).otherwise(col("tp") / (col("tp") + col("fn"))))
      .withColumn("f1",
        when(col("tp") * 2 + col("fp") + col("fn") === 0L, lit(null))
          .otherwise(col("tp") * 2 / (col("tp") * 2 + col("fp") + col("fn"))))
      .orderBy("cls")
  }

  val classMetricsOracle: String =
    s"""WITH t AS ($scoredSql),
       |cells AS (
       |  SELECT ${bucketSql("cents")} AS actual,
       |         ${bucketSql("pred_cents")} AS predicted,
       |         count(*) AS n
       |  FROM t GROUP BY actual, predicted),
       |a AS (SELECT actual AS cls,
       |             CAST(sum(CASE WHEN predicted = actual THEN n ELSE 0 END) AS BIGINT) AS tp_a,
       |             CAST(sum(n) AS BIGINT) AS actual_n
       |      FROM cells GROUP BY cls),
       |p AS (SELECT predicted AS cls,
       |             CAST(sum(CASE WHEN predicted = actual THEN n ELSE 0 END) AS BIGINT) AS tp_p,
       |             CAST(sum(n) AS BIGINT) AS predicted_n
       |      FROM cells GROUP BY cls),
       |m AS (
       |  SELECT coalesce(a.cls, p.cls) AS cls,
       |         coalesce(tp_a, tp_p, 0) AS tp,
       |         coalesce(predicted_n, 0) - coalesce(tp_p, 0) AS fp,
       |         coalesce(actual_n, 0) - coalesce(tp_a, 0) AS fn
       |  FROM a FULL OUTER JOIN p ON a.cls = p.cls)
       |SELECT cls, tp, fp, fn,
       |       CASE WHEN tp + fp = 0 THEN NULL ELSE tp / (tp + fp) END AS precision,
       |       CASE WHEN tp + fn = 0 THEN NULL ELSE tp / (tp + fn) END AS recall,
       |       CASE WHEN tp * 2 + fp + fn = 0 THEN NULL
       |            ELSE tp * 2 / (tp * 2 + fp + fn) END AS f1
       |FROM m ORDER BY cls""".stripMargin

  /** auc1 — EXACT tie-corrected ROC AUC per evaluation slice, via the
    * grouped-rank (Mann-Whitney U) identity instead of a global sort:
    * aggregate to (slice, score) → (pos, neg) counts, one partitioned
    * running sum of negatives strictly below, then
    * 2U = Σ pos_s · (2·neg_below_s + neg_s)  (ties count half), and
    * AUC = 2U / (2·P·N) as the single division. The window input is the
    * per-score aggregate — bounded by the score DOMAIN, not the row
    * count — so no 100-TB single-task sort exists anywhere in the plan.
    * The label is event_type ∈ {purchase, signup}; the score is the raw
    * integer cents (a weak scorer by construction — the point is the
    * exact machinery, spec-pinned against brute-force pair counting). */
  def rocAucSlices(s: SparkSession, d: String): DataFrame =
    aucOf(scored(s, d)
      .select((col("user_id") % 4).cast("int").as("slice"),
        col("cents").as("score"),
        when(col("event_type").isin("purchase", "signup"), 1L).otherwise(0L).as("is_pos")))

  /** Exact AUC over a (slice, score, is_pos) frame — the grouped-rank
    * core [[rocAucSlices]] wires to events; spec-pinned equal to
    * brute-force pair counting (ties at half weight) on fixtures. */
  def aucOf(labeled: DataFrame): DataFrame = {
    val byScore = labeled
      .groupBy("slice", "score")
      .agg(sum(col("is_pos")).as("p"),
        (count(lit(1)) - sum(col("is_pos"))).as("q"))
    val w = Window.partitionBy("slice").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("neg_below", coalesce(sum(col("q")).over(w), lit(0L)))
      .groupBy("slice")
      .agg(sum(col("p")).as("n_pos"), sum(col("q")).as("n_neg"),
        sum(col("p") * (col("neg_below") * 2 + col("q"))).as("u2"))
      .withColumn("auc",
        when(col("n_pos") * col("n_neg") === 0L, lit(null))
          .otherwise(col("u2") / (col("n_pos") * col("n_neg") * 2)))
      .orderBy("slice")
  }

  val rocAucSlicesOracle: String =
    s"""WITH t AS ($scoredSql),
       |by_score AS (
       |  SELECT CAST(user_id % 4 AS INT) AS slice, cents AS score,
       |         CAST(sum(CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END) AS BIGINT) AS p,
       |         count(*) - CAST(sum(CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END) AS BIGINT) AS q
       |  FROM t GROUP BY slice, score),
       |run AS (
       |  SELECT slice, score, p, q,
       |         coalesce(CAST(sum(q) OVER (PARTITION BY slice ORDER BY score
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS neg_below
       |  FROM by_score)
       |SELECT slice, CAST(sum(p) AS BIGINT) AS n_pos, CAST(sum(q) AS BIGINT) AS n_neg,
       |       CAST(sum(p * (neg_below * 2 + q)) AS BIGINT) AS u2,
       |       CASE WHEN CAST(sum(p) AS BIGINT) * CAST(sum(q) AS BIGINT) = 0 THEN NULL
       |            ELSE CAST(sum(p * (neg_below * 2 + q)) AS BIGINT)
       |                 / (CAST(sum(p) AS BIGINT) * CAST(sum(q) AS BIGINT) * 2) END AS auc
       |FROM run GROUP BY slice ORDER BY slice""".stripMargin

  /** cal1 — calibration (reliability) table: the predicted score binned
    * into 10 fixed 5000-cent bins (clamped at the ends), per bin the
    * exact support, positive count, observed positive rate, and mean
    * score — the table a reliability diagram plots. One hash aggregation
    * on a 10-value key; both rate and mean are single divisions. */
  def calibrationBins(s: SparkSession, d: String): DataFrame = {
    val clamped = greatest(least(col("pred_cents"), lit(49999L)), lit(0L))
    scored(s, d)
      .select((clamped / 5000L).cast("long").as("bin"),
        col("pred_cents"),
        when(col("event_type").isin("purchase", "signup"), 1L).otherwise(0L).as("is_pos"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("is_pos")).as("n_pos"),
        sum(col("pred_cents")).as("sum_pred_cents"))
      .withColumn("pos_rate", col("n_pos") / col("n"))
      .withColumn("mean_pred", col("sum_pred_cents") / col("n") / 100.0)
      .orderBy("bin")
  }

  val calibrationBinsOracle: String =
    s"""WITH t AS ($scoredSql),
       |b AS (
       |  SELECT CAST(floor(greatest(least(pred_cents, 49999), 0) / 5000) AS BIGINT) AS bin,
       |         pred_cents,
       |         CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END AS is_pos
       |  FROM t)
       |SELECT bin, count(*) AS n, CAST(sum(is_pos) AS BIGINT) AS n_pos,
       |       CAST(sum(pred_cents) AS BIGINT) AS sum_pred_cents,
       |       CAST(sum(is_pos) AS BIGINT) / count(*) AS pos_rate,
       |       CAST(sum(pred_cents) AS BIGINT) / count(*) / 100.0 AS mean_pred
       |FROM b GROUP BY bin ORDER BY bin""".stripMargin
}
