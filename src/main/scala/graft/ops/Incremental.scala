package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Functions.cents

/** Incremental view maintenance: keep a big aggregate current by
  * merging the stored aggregate STATE of already-processed data with
  * the state of the new batch — never rescanning the base. At 100 TB
  * the base state is a stored table a few orders of magnitude smaller
  * than the facts; each refresh scans only the delta and pays an
  * O(keys) merge. The requirement this encodes: every aggregate in the
  * view must be expressed in mergeable state — count/sum/min/max merge
  * by sum/sum/min/max, avg rides as (sum, count) and divides only at
  * read time (never store an average: averages don't merge).
  */
object Incremental {

  /** The batch boundary: rows before it play the stored base, rows at
    * or after it the newly arrived delta. */
  val SplitDate = "1996-01-01"

  /** inc1 — merged (nation, priority) order-revenue view from two
    * partial aggregations (base before [[SplitDate]], delta after),
    * re-aggregated by state-merge. The oracle computes the same view
    * in ONE full-scan aggregation — the hash match IS the maintenance
    * law (merge(partial(A), partial(B)) = full(A ∪ B)), and the spec
    * additionally pins it against Spark's own single-pass plan.
    * Dimensions broadcast; each side's date filter pushes into its
    * scan (PlanSpec). Integer-cents state; the one division (read-time
    * avg) mirrors the oracle's operand order. */
  def aggMaintenance(s: SparkSession, d: String): DataFrame =
    aggMaintenanceOf(Tables.orders(s, d), Tables.customer(s, d),
      Tables.nation(s, d))

  def aggMaintenanceOf(orders: DataFrame, customer: DataFrame,
      nation: DataFrame): DataFrame = {
    val enriched = orders
      .join(broadcast(customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"),
        col("o_orderpriority").as("priority"),
        cents(col("o_totalprice")).as("tp"), col("o_orderdate"))
    def partialState(df: DataFrame): DataFrame =
      df.groupBy("nation", "priority").agg(
        count(lit(1)).as("n"), sum("tp").as("s"),
        min("tp").as("mn"), max("tp").as("mx"))
    val base = partialState(enriched.filter(col("o_orderdate") < lit(SplitDate)))
    val delta = partialState(enriched.filter(col("o_orderdate") >= lit(SplitDate)))
    base.unionByName(delta)
      .groupBy("nation", "priority")
      .agg(sum("n").as("n_orders"), sum("s").as("sum_cents"),
        min("mn").as("min_cents"), max("mx").as("max_cents"))
      .withColumn("avg_price",
        col("sum_cents").cast("double") / col("n_orders").cast("double") / 100.0)
      .orderBy("nation", "priority")
  }

  /** DuckDB replay: ONE full-scan aggregation of the same view — the
    * compare certifies the partial-state merge against the direct
    * answer. */
  val aggMaintenanceOracle: String =
    s"""SELECT n.n_name AS nation, o.o_orderpriority AS priority,
       |  count(*) AS n_orders,
       |  CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |    AS sum_cents,
       |  min(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS min_cents,
       |  max(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS max_cents,
       |  CAST(CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) / 100.0 AS avg_price
       |FROM orders o
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |GROUP BY 1, 2
       |ORDER BY nation, priority""".stripMargin

  /** inc2 — delta-JOIN view maintenance: a materialized join view
    * V = O ⋈ C refreshed under inserts to BOTH sides without
    * rejoining the old data against itself:
    *   V_new = O₀⋈C₀ (standing) ∪ ΔO⋈C₀ ∪ O₀⋈ΔC ∪ ΔO⋈ΔC
    * — the textbook bilinear delta rule. The orders delta is the
    * batch boundary ([[SplitDate]]); the customer delta simulates
    * late-arriving dimension rows (custkey ≡ 0 mod 10). The engine
    * computes the four-term union and aggregates it; the DuckDB
    * oracle joins the FULL tables from scratch — the hash match is
    * the algebra proof that the three delta terms are exactly the
    * new rows. At 100 TB the standing term is the stored view (never
    * recomputed); each refresh pays |Δ|-sized joins, with the
    * delta sides broadcast when small. */
  def joinMaintenance(s: SparkSession, d: String): DataFrame =
    joinMaintenanceOf(Tables.orders(s, d), Tables.customer(s, d))

  def joinMaintenanceOf(orders: DataFrame, customer: DataFrame): DataFrame = {
    val o = orders.select(col("o_custkey"),
      col("o_orderpriority").as("priority"), cents(col("o_totalprice")).as("tp"),
      col("o_orderdate"))
    val c = customer.select(col("c_custkey"), col("c_mktsegment").as("segment"))
    val oOld = o.filter(col("o_orderdate") < lit(SplitDate))
    val oNew = o.filter(col("o_orderdate") >= lit(SplitDate))
    val cOld = c.filter(col("c_custkey") % 10 =!= 0)
    val cNew = c.filter(col("c_custkey") % 10 === 0)
    def j(ox: DataFrame, cx: DataFrame): DataFrame =
      ox.join(cx, col("o_custkey") === col("c_custkey"))
        .select(col("segment"), col("priority"), col("tp"))
    j(oOld, cOld)
      .unionByName(j(oNew, cOld))
      .unionByName(j(oOld, cNew))
      .unionByName(j(oNew, cNew))
      .groupBy("segment", "priority")
      .agg(count(lit(1)).as("n_orders"), sum(col("tp")).as("sum_cents"))
      .orderBy("segment", "priority")
  }

  /** DuckDB replay: the full join recomputed from scratch. */
  val joinMaintenanceOracle: String =
    """SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
      |       count(*) AS n_orders,
      |       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |         AS sum_cents
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY segment, priority
      |ORDER BY segment, priority""".stripMargin

  /** Sliding-window width in days for inc3. */
  val RollingDays = 7

  /** inc3 — SLIDING-WINDOW view maintenance: the per-type 7-day
    * rolling event count maintained by the add/retire recurrence
    * R(d) = R(d−1) + D(d) − D(d−[[RollingDays]]) instead of re-summing
    * [[RollingDays]] days per row. inc1 maintains a monoid aggregate
    * under inserts and inc2 a join view; this is the third refresh
    * algebra a metrics stack needs — windows that RETIRE data, where
    * the naive recompute cost is window-width × daily volume forever.
    * The engine form materializes the recurrence as a running sum of
    * the (D(d) − D(d−w)) delta stream; the oracle recomputes every
    * window from scratch (ROWS BETWEEN w−1 PRECEDING), so the hash
    * match is the telescoping identity Σ_{i≤d} [D(i) − D(i−w)] =
    * Σ_{d−w<i≤d} D(i) proved on real data.
    *
    * The trap the dense-day spine guards: day gaps. lag(n, w) over the
    * OBSERVED rows slides by w ROWS, not w DAYS — on a type with a
    * missing day the retire leg subtracts the wrong day and every
    * later window inherits the error. Each type therefore explodes
    * its min..max day span (one sequence per type, O(span) rows) and
    * left-joins observed counts with a 0 fill; both windows then run
    * per type over the dense spine. One aggregation + one type-keyed
    * exchange shared by both window passes. */
  def rollingRefresh(s: SparkSession, d: String): DataFrame =
    rollingRefreshOf(Tables.events(s, d))

  /** [[rollingRefresh]] over an explicit events frame. */
  def rollingRefreshOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_day"))
    val span = daily.groupBy("event_type")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"),
          expr("interval 1 day"))).as("day"))
    val dense = span.join(daily, Seq("event_type", "day"), "left")
      .withColumn("n_day", coalesce(col("n_day"), lit(0L)))
    val byDay = Window.partitionBy("event_type").orderBy("day")
    val delta = col("n_day") -
      coalesce(lag(col("n_day"), RollingDays).over(byDay), lit(0L))
    dense
      .withColumn("delta", delta)
      .withColumn("rolling",
        sum(col("delta")).over(byDay.rowsBetween(Window.unboundedPreceding, 0)))
      .select("event_type", "day", "n_day", "rolling")
      .orderBy("event_type", "day")
  }

  /** DuckDB replay: every window re-summed from scratch over the same
    * dense spine — the recurrence never appears. */
  val rollingRefreshOracle: String =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_day
       |  FROM events
       |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
       |  GROUP BY event_type, CAST(ts AS DATE)),
       |spine AS (
       |  SELECT event_type,
       |         CAST(unnest(generate_series(min(day), max(day),
       |           INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM daily GROUP BY event_type),
       |dense AS (
       |  SELECT s.event_type, s.day,
       |         CAST(coalesce(d.n_day, 0) AS BIGINT) AS n_day
       |  FROM spine s LEFT JOIN daily d
       |    ON s.event_type = d.event_type AND s.day = d.day)
       |SELECT event_type, day, n_day,
       |       CAST(sum(n_day) OVER (PARTITION BY event_type ORDER BY day
       |         ROWS BETWEEN ${RollingDays - 1} PRECEDING AND CURRENT ROW)
       |         AS BIGINT) AS rolling
       |FROM dense ORDER BY event_type, day""".stripMargin
}
