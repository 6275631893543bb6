package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Functions

/** Privacy-risk auditing — the release-gate checks a dataset passes
  * before leaving the warehouse: k-anonymity (no quasi-identifier
  * combination isolates fewer than k people) and l-diversity (each
  * combination spans at least l distinct sensitive values). Both are
  * plain keyed aggregations — one shuffle on the QI tuple with
  * map-side partials, the same shape as any rollup — so the audit
  * costs one aggregation pass at any scale, and the distinct-count
  * rides the same exchange as a keyed partial dedup.
  */
object Privacy {

  /** priv1 — k-anonymity / l-diversity audit: QI = (market segment,
    * nation), sensitive attribute = the account-balance band (integer
    * cents shifted nonnegative, then 1000-currency-unit integer bands
    * so both engines bucket identically). Emits the per-group support,
    * distinct sensitive bands, and 0/1 flags against k=5 / l=3 —
    * integer flags, not booleans, to keep the compare engine-neutral. */
  def kAnonymityAudit(s: SparkSession, d: String): DataFrame = {
    val nat = Tables.nation(s, d)
      .select(col("n_nationkey"), col("n_name").as("nation"))
    val sens = ((Functions.cents(col("c_acctbal")) + 100000L) / 100000L)
      .cast("long")
    Tables.customer(s, d)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"), "left")
      .select(col("c_mktsegment").as("segment"), col("nation"),
        sens.as("sens_bucket"))
      .groupBy("segment", "nation")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("sens_bucket")).as("n_sensitive"))
      .withColumn("k_anon_ok", when(col("n") >= 5L, 1L).otherwise(0L))
      .withColumn("l_div_ok", when(col("n_sensitive") >= 3L, 1L).otherwise(0L))
      .orderBy("segment", "nation")
  }

  val kAnonymityAuditOracle: String =
    """WITH c AS (
      |  SELECT c_mktsegment AS segment, n.n_name AS nation,
      |         (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000
      |           AS sens_bucket
      |  FROM customer LEFT JOIN nation n ON c_nationkey = n_nationkey)
      |SELECT segment, nation, count(*) AS n,
      |       count(DISTINCT sens_bucket) AS n_sensitive,
      |       CAST(CASE WHEN count(*) >= 5 THEN 1 ELSE 0 END AS BIGINT)
      |         AS k_anon_ok,
      |       CAST(CASE WHEN count(DISTINCT sens_bucket) >= 3 THEN 1 ELSE 0 END
      |         AS BIGINT) AS l_div_ok
      |FROM c GROUP BY segment, nation ORDER BY segment, nation""".stripMargin
}
