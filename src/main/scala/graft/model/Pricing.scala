package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Functions._

/** Overflow envelope: the e-4/e-6 integer money units keep per-row
  * values ≤ ~1e11, so bigint sums are exact up to ~8e7 rows per GROUP
  * (verified ANSI-clean through sf0.1). At full warehouse scale
  * (~1e12 rows), switch the sums to `cast(... as decimal(38,0))` —
  * still exact, still order-independent; the bigint form is kept here
  * because the DuckDB oracle compares int64 columns.
  *
  * Headline scan+aggregate benchmark query (TPC-H Q1 shape) — the
  * volume-bearing aggregation pattern the engine must sustain at 100 TB:
  * one parquet scan with a pushed timestamp predicate, map-side partial
  * aggregation into 6 groups, no join, one tiny shuffle.
  *
  * Money math is exact: 2-decimal columns are integerized per row
  * ([[graft.functions.Functions.cents]]) and combined in bigint
  * (`disc = P*(100-D)` in e-4 units, `charge = P*(100-D)*(100+T)` in e-6
  * units), so results are bit-identical across partitionings and engines.
  */
object Pricing {

  /** TPC-H Q3 shape — shipping priority: 3-way join (customer segment
    * filter ⋈ orders ⋈ lineitem) with revenue rollup per order. The big
    * side (lineitem) streams; customer is broadcast; orders⋈lineitem is
    * the one real shuffle, on the join key both sides already need. */
  def shippingPriority(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > to_timestamp(lit("1998-01-01 00:00:00")))
      .select(col("l_orderkey"),
        (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
          .as("rev_e4"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderkey"),
        col("o_orderdate").cast("date").cast("string").as("orderdate"))
      .agg(sum(col("rev_e4")).as("revenue_e4"))
      .orderBy(desc("revenue_e4"), col("o_orderkey"))
  }

  /** TPC-H Q5 shape — revenue by nation: lineitem ⋈ orders ⋈ customer ⋈
    * nation ⋈ region with all dims broadcast; one shuffle on the
    * orderkey, one on the final (tiny) group key. */
  def revenueByNation(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d).select(col("l_orderkey"),
      (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
        .as("rev_e4"))
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      .select("o_orderkey", "o_custkey")
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val n = Tables.nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
    val r = Tables.region(s, d).select("r_regionkey", "r_name")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name").as("nation"), col("r_name").as("region_name"))
      .agg(sum(col("rev_e4")).as("revenue_e4"), count(lit(1)).as("n_items"))
      .orderBy(desc("revenue_e4"), col("nation"))
  }

  def pricingSummary(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= to_timestamp(lit("2001-06-01 00:00:00")))
      .withColumn("p", cents(col("l_extendedprice")))
      .withColumn("dd", cents(col("l_discount")))
      .withColumn("t", cents(col("l_tax")))
      .withColumn("q", cents(col("l_quantity")))
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("q")).as("sum_qty_cents"),
        sum(col("p")).as("sum_base_cents"),
        sum(col("p") * (lit(100) - col("dd"))).as("sum_disc_e4"),
        sum(col("p") * (lit(100) - col("dd")) * (lit(100) + col("t")))
          .as("sum_charge_e6"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty_cents") / col("count_order") / 100.0)
      .withColumn("avg_price", col("sum_base_cents") / col("count_order") / 100.0)
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q18 shape — large-volume customers: aggregate the big table
    * FIRST (map-side partials into per-order quantity sums), filter with
    * HAVING, and only then join the small surviving set to orders and
    * the broadcast customer dim. The aggregation-before-join ordering is
    * the point at scale: the lineitem shuffle carries one row per order,
    * and the post-HAVING join input is tiny. */
  def largeVolumeOrders(s: SparkSession, d: String): DataFrame = {
    val bigOrders = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(cents(col("l_quantity"))).as("sum_qty_cents"))
      .filter(col("sum_qty_cents") > 300 * 100)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        cents(col("o_totalprice")).as("totalprice_cents"))
    val c = Tables.customer(s, d).select("c_custkey", "c_name")
    bigOrders
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("string").as("orderdate"),
        col("totalprice_cents"), col("sum_qty_cents"))
      .orderBy(desc("totalprice_cents"), col("o_orderkey"))
  }

  val largeVolumeOrdersOracle: String =
    """WITH big AS (
      |  SELECT l_orderkey,
      |         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING sum_qty_cents > 30000)
      |SELECT c.c_name, c.c_custkey, o.o_orderkey,
      |       CAST(o.o_orderdate AS VARCHAR) AS orderdate,
      |       CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
      |       b.sum_qty_cents
      |FROM big b
      |JOIN orders o ON b.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |ORDER BY totalprice_cents DESC, o.o_orderkey""".stripMargin

  /** q17 — small-quantity-order revenue (TPC-H Q17 shape): the
    * DECORRELATED-SUBQUERY pattern — a per-key aggregate threshold
    * (0.2 × avg quantity per part) rejoined to the fact it was derived
    * from. The naive form is a correlated scalar subquery per row;
    * the scalable shape is aggregate-then-equi-join: one shuffle to
    * build the per-part threshold (one row per part), one keyed join
    * back — both sides partitioned on l_partkey, no correlated
    * re-execution.
    *
    * Exactness: `qty < 0.2·avg(qty)` is evaluated as the fully integer
    * cross-multiplication `qty_cents · 5 · cnt < sum_qty_cents` —
    * no double division anywhere in the predicate, so both engines
    * agree on every boundary row; only the final avg_yearly is one
    * double division of exact integers. */
  def smallQtyRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      col("l_partkey"),
      cents(col("l_quantity")).as("qty_cents"),
      cents(col("l_extendedprice")).as("price_cents"))
    val thresh = li.groupBy("l_partkey")
      .agg(sum(col("qty_cents")).as("sum_qty_cents"),
        count(lit(1)).as("cnt"))
    li.join(thresh, "l_partkey")
      .filter(col("qty_cents") * 5 * col("cnt") < col("sum_qty_cents"))
      .agg(
        sum(col("price_cents")).as("sum_price_cents"),
        count(lit(1)).as("n_small"),
        (sum(col("price_cents")) / lit(700.0)).as("avg_yearly"))
  }

  val smallQtyRevenueOracle: String =
    """WITH li AS (
      |  SELECT l_partkey,
      |         CAST(round(l_quantity * 100) AS BIGINT) AS qty_cents,
      |         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
      |  FROM lineitem),
      |t AS (
      |  SELECT l_partkey,
      |         CAST(sum(qty_cents) AS BIGINT) AS sum_qty_cents,
      |         count(*) AS cnt
      |  FROM li GROUP BY l_partkey)
      |SELECT CAST(sum(li.price_cents) AS BIGINT) AS sum_price_cents,
      |       count(*) AS n_small,
      |       CAST(sum(li.price_cents) AS BIGINT) / 700.0 AS avg_yearly
      |FROM li JOIN t USING (l_partkey)
      |WHERE li.qty_cents * 5 * t.cnt < t.sum_qty_cents""".stripMargin

  /** q4 — the EXISTS/semi-join query shape (TPC-H Q4 pattern): count
    * orders per priority having at least one returned line item. A LEFT
    * SEMI join materializes no right-side columns and stops probing a
    * key at first match — the shuffle carries only lineitem's join key
    * (filter + projection pushed to the scan), and duplicate matches
    * never multiply rows, so no distinct is needed anywhere. */
  def returnedPriority(s: SparkSession, d: String): DataFrame = {
    val returned = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    Tables.orders(s, d)
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("priority")
  }

  val returnedPriorityOracle: String =
    """SELECT o_orderpriority AS priority, count(*) AS n_orders
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
      |GROUP BY priority ORDER BY priority""".stripMargin

  /** q13 — customer order-count distribution (TPC-H Q13 shape): how
    * many customers placed exactly N orders, INCLUDING the zero-order
    * customers a plain inner join would drop. Aggregate-below-join:
    * orders collapse to one (custkey, count) row per customer BEFORE
    * meeting the customer table, so the join carries one row per
    * customer instead of one per order — at 100 TB that is the
    * difference between shuffling the fact and shuffling a key list.
    * The zero fill is a left join + coalesce(0); the histogram is a
    * second tiny aggregation. */
  def custDistribution(s: SparkSession, d: String): DataFrame = {
    val perCust = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"))
    Tables.customer(s, d).select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n"), lit(0L)).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  val custDistributionOracle: String =
    """WITH per_cust AS (
      |  SELECT c.c_custkey,
      |         CAST(coalesce(o.n, 0) AS BIGINT) AS c_count
      |  FROM customer c
      |  LEFT JOIN (SELECT o_custkey, count(*) AS n
      |             FROM orders GROUP BY o_custkey) o
      |    ON c.c_custkey = o.o_custkey)
      |SELECT c_count, count(*) AS custdist
      |FROM per_cust GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin
}
