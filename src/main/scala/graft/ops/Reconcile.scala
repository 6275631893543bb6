package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Two-sided per-key reconciliation via typed `cogroup` — the
  * KeyValueGroupedDataset API family (groupByKey / cogroup) that
  * complements the DataFrame surface: both sides shuffle ONCE onto the
  * same key partitioning, then each key's two iterators meet in a
  * single function call with no join-row multiplication — the shape
  * for ledger-vs-ledger audits, source-vs-sink row accounting, and any
  * per-key logic that needs BOTH full groups at once (where a join
  * would explode |L|×|R| rows per key and an aggregation would lose
  * the pairing).
  *
  * Scale posture: one co-partitioned shuffle per side; per-key work is
  * streamed from the two iterators (no per-key materialization beyond
  * the running sums), so a hot key costs one task its group sizes, not
  * their product.
  */
object Reconcile {

  final case class KeyDiff(key: Long, n_left: Long, n_right: Long,
      sum_left: Long, sum_right: Long, delta: Long)

  /** Per-key counts, sums, and sum delta across two (key, value)
    * sides; emits a row for every key present on EITHER side.
    *
    * This is the typed-API DEMONSTRATOR: cogroup is the right tool
    * when the per-key logic needs BOTH full iterators at once
    * (order-dependent matching, row pairing, custom short-circuiting).
    * For a reduction like this one — counts and sums — every row pays
    * the Scala-tuple encoder round-trip, while [[keyedDiffFrame]]
    * stays inside whole-stage codegen end-to-end and runs ~2× faster
    * warm; the driver query (rc1) uses the frame form. KeyedDiffSpec
    * pins the two forms equal. */
  def keyedDiff(left: Dataset[(Long, Long)],
      right: Dataset[(Long, Long)]): Dataset[KeyDiff] = {
    import left.sparkSession.implicits._
    left.groupByKey(_._1).cogroup(right.groupByKey(_._1)) { (k, ls, rs) =>
      var nl = 0L; var sl = 0L
      ls.foreach { x => nl += 1; sl += x._2 }
      var nr = 0L; var sr = 0L
      rs.foreach { x => nr += 1; sr += x._2 }
      Iterator.single(KeyDiff(k, nl, nr, sl, sr, sl - sr))
    }
  }

  /** DataFrame form of [[keyedDiff]] over two (key, value) frames: two
    * hash aggregates + one full-outer join — partial (map-side)
    * aggregation shrinks each side BEFORE its shuffle and every
    * operator is codegen'd, which is exactly what the cogroup form
    * gives up. Same output contract: one row per key present on
    * either side, absent sides read as zero. */
  def keyedDiffFrame(left: DataFrame, right: DataFrame): DataFrame = {
    def agg(df: DataFrame, n: String, s: String): DataFrame =
      df.toDF("key", "value").groupBy("key")
        .agg(count(lit(1)).as(n), sum(col("value")).as(s))
    agg(left, "n_l", "s_l")
      .join(agg(right, "n_r", "s_r"), Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("n_l"), lit(0L)).as("n_left"),
        coalesce(col("n_r"), lit(0L)).as("n_right"),
        coalesce(col("s_l"), lit(0L)).as("sum_left"),
        coalesce(col("s_r"), lit(0L)).as("sum_right"),
        (coalesce(col("s_l"), lit(0L)) - coalesce(col("s_r"), lit(0L)))
          .as("delta"))
  }

  /** Driver query (rc1): per-order source-vs-sink accounting — the raw
    * lineitem feed against the same feed after a quality filter
    * (quantity < 30), the audit that tells you exactly which orders
    * lost rows/quantity to the filter and how much. Quantities are
    * integral-valued in this schema, so the long cast is exact. */
  def keyedDiffQuery(s: SparkSession, d: String): DataFrame = {
    def side(df: DataFrame): DataFrame = df
      .select(col("l_orderkey"), col("l_quantity").cast("long"))
    val source = side(Tables.lineitem(s, d))
    val sink = side(Tables.lineitem(s, d).filter(col("l_quantity") < 30))
    keyedDiffFrame(source, sink).orderBy("key")
  }

  /** The cogroup form over the same rc1 inputs — kept callable so the
    * spec pins frame == cogroup on real data. */
  def keyedDiffQueryCogroup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def side(df: DataFrame): Dataset[(Long, Long)] = df
      .select(col("l_orderkey"), col("l_quantity").cast("long"))
      .toDF("_1", "_2").as[(Long, Long)]
    val source = side(Tables.lineitem(s, d))
    val sink = side(Tables.lineitem(s, d).filter(col("l_quantity") < 30))
    keyedDiff(source, sink).toDF().orderBy("key")
  }

  /** ANSI rendering of [[keyedDiffQuery]]: two grouped aggregates FULL
    * OUTER joined on the key — a key present on either side emits one
    * row, absent sides read as zero. */
  val keyedDiffOracle: String =
    """WITH l AS (
      |  SELECT l_orderkey AS key, count(*) AS n,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s
      |  FROM lineitem GROUP BY 1),
      |r AS (
      |  SELECT l_orderkey AS key, count(*) AS n,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s
      |  FROM lineitem WHERE l_quantity < 30 GROUP BY 1)
      |SELECT COALESCE(l.key, r.key) AS key,
      |  COALESCE(l.n, 0) AS n_left, COALESCE(r.n, 0) AS n_right,
      |  COALESCE(l.s, 0) AS sum_left, COALESCE(r.s, 0) AS sum_right,
      |  COALESCE(l.s, 0) - COALESCE(r.s, 0) AS delta
      |FROM l FULL OUTER JOIN r ON l.key = r.key
      |ORDER BY key""".stripMargin
}
