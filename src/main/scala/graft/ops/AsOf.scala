package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (temporal point-in-time) join — the canonical operator Spark's
  * built-in joins lack: each probe row picks the LATEST build row with
  * the same key and time ≤ the probe's time. The naive formulations are
  * scale-killers (per-row subquery, or a range join whose candidate set
  * explodes); the scalable shape used here is the union trick:
  *
  *   tag both sides, union them, ONE shuffle on the key, and carry the
  *   build payload forward with last(payload, ignoreNulls) over a
  *   (time, side)-ordered running window — probe rows then hold exactly
  *   the as-of match. O(n log n) per key partition, a single exchange
  *   (PlanSpec-gated), no candidate blowup, AQE-skew-splittable.
  *
  * Tie rules, identical in the DuckDB oracle (native ASOF LEFT JOIN):
  * build rows are pre-deduped to one per (key, time) by max surrogate;
  * at equal time the build row sorts before the probe row, so t = probe
  * time matches (inclusive ≤). */
object AsOf {

  /** Generic as-of left join.
    * @param probe  (key, t, probe payload columns...)
    * @param build  (key, t, one payload column) — MUST be unique per
    *               (key, t); pre-aggregate if not.
    * @param payload name of the build payload column to carry. */
  def asofLeft(probe: DataFrame, build: DataFrame, payload: String): DataFrame = {
    val p = probe.withColumn("__side", lit(1))
      .withColumn(payload, lit(null).cast(build.schema(payload).dataType))
    // build side gets nulls for the probe-only columns, aligned order
    val extras = probe.schema.filterNot(f => Set("k", "t").contains(f.name))
    val b = extras.foldLeft(build.withColumn("__side", lit(0))) {
      (df, f) => df.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(p.columns.map(col): _*)
    val w = Window.partitionBy("k").orderBy(col("t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.unionByName(p, allowMissingColumns = false)
      .withColumn("__asof", last(col(payload), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", payload)
      .withColumnRenamed("__asof", s"asof_$payload")
  }

  /** Driver query: each event joined to the latest order of its key
    * (user_id and o_custkey folded into a shared 150-key domain) with
    * order date ≤ event time. */
  def asofQuery(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      (col("user_id") % 150).as("k"),
      date_trunc("second", col("ts")).as("t"),
      col("event_id"))
    val ord = Tables.orders(s, d)
      .select((col("o_custkey") % 150).as("k"), col("o_orderdate").as("t"),
        col("o_orderkey"))
      .groupBy("k", "t").agg(max("o_orderkey").as("o_orderkey"))
    asofLeft(ev, ord, "o_orderkey")
      .select(col("event_id"), col("k"), col("t").cast("string").as("t_s"),
        col("asof_o_orderkey"))
      .orderBy("event_id")
  }

  val asofOracle: String =
    """WITH ev AS (
      |  SELECT user_id % 150 AS k, date_trunc('second', ts) AS t, event_id
      |  FROM events),
      |ord AS (
      |  SELECT o_custkey % 150 AS k, o_orderdate AS t,
      |         max(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, e.k, CAST(e.t AS VARCHAR) AS t_s,
      |       o.o_orderkey AS asof_o_orderkey
      |FROM ev e ASOF LEFT JOIN ord o ON e.k = o.k AND e.t >= o.t
      |ORDER BY e.event_id""".stripMargin
}
