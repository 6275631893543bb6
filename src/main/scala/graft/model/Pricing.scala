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

  def pricingSummary(s: SparkSession, d: String): DataFrame =
    pricingSummaryOf(
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("2001-06-01 00:00:00"))))

  /** The WIDE-ACCUMULATOR variant — the overflow-envelope switch from
    * the header comment made a real, tested configuration: identical
    * query shape, but every money sum accumulates in decimal(38,0)
    * instead of bigint, so per-group sums stay exact past the ~8e7-
    * rows-per-group bigint envelope all the way to ~1e26 rows (38
    * digits over the ≤1e11 per-row e-6 charge). Still map-side
    * partial-aggregated, still order-independent; the cost is the
    * 128-bit accumulator instead of 64. Verified against the same
    * DuckDB oracle (HUGEINT sums) at test SFs, and PropertySpec
    * drives BOTH paths over rows engineered past the int64 boundary —
    * the narrow path wraps, the wide path matches the BigInt ground
    * truth.
    *
    * Presentation: the four wide sums are emitted as canonical decimal
    * STRINGS. 128-bit integers have no lossless shared representation
    * across engine→pandas bridges (DuckDB renders DECIMAL(38,0)/HUGEINT
    * as float64 — lossy past 2^53; Spark's parquet decimal128 arrives
    * as Python Decimal objects — a different dtype), so a typed
    * comparison of the raw accumulators can never agree even when the
    * values do. Digit strings are exact at any magnitude and identical
    * on both sides; the averages still divide from the full-precision
    * accumulator before the cast. */
  def pricingSummaryWide(s: SparkSession, d: String): DataFrame =
    pricingSummaryOf(
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("2001-06-01 00:00:00"))),
      wide = true)

  /** The wide path with the accumulators kept as TYPED decimal(38,0)
    * columns — the consumer form: a downstream Spark job gets exact
    * 128-bit decimals it can keep aggregating, not presentation
    * strings. The digit-string form ([[pricingSummaryWide]]) remains
    * the ORACLE form because 128-bit integers have no lossless shared
    * representation across the engine→pandas compare bridge (scaladoc
    * above); PropertySpec pins the two variants equal value-for-value
    * (string form == typed form rendered canonically). */
  def pricingSummaryWideTyped(s: SparkSession, d: String): DataFrame =
    pricingSummaryOf(
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("2001-06-01 00:00:00"))),
      wide = true, typed = true)

  /** DataFrame-first body shared by the narrow (bigint) and wide
    * (decimal(38,0)) accumulator paths; PropertySpec feeds it synthetic
    * envelope-boundary rows directly. `typed` (wide mode only) skips
    * the digit-string presentation cast and returns the decimal(38,0)
    * accumulators as-is. */
  def pricingSummaryOf(lineitem: DataFrame,
      wide: Boolean = false, typed: Boolean = false): DataFrame = {
    def acc(c: org.apache.spark.sql.Column) =
      if (wide) c.cast("decimal(38,0)") else c
    val li = lineitem
      .withColumn("p", cents(col("l_extendedprice")))
      .withColumn("dd", cents(col("l_discount")))
      .withColumn("t", cents(col("l_tax")))
      .withColumn("q", cents(col("l_quantity")))
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(acc(col("q"))).as("sum_qty_cents"),
        sum(acc(col("p"))).as("sum_base_cents"),
        sum(acc(col("p") * (lit(100) - col("dd")))).as("sum_disc_e4"),
        sum(acc(col("p") * (lit(100) - col("dd")) * (lit(100) + col("t"))))
          .as("sum_charge_e6"),
        count(lit(1)).as("count_order"))
      // averages divide in DOUBLE in both modes: decimal÷long division
      // would round at decimal scale first and drift a ULP from the
      // narrow path's long→double division (oracle-pinned)
      .withColumn("avg_qty",
        col("sum_qty_cents").cast("double") / col("count_order") / 100.0)
      .withColumn("avg_price",
        col("sum_base_cents").cast("double") / col("count_order") / 100.0)
      .withColumns(
        if (wide && !typed)
          Seq("sum_qty_cents", "sum_base_cents", "sum_disc_e4",
              "sum_charge_e6").map(c => c -> col(c).cast("string")).toMap
        else Map.empty[String, org.apache.spark.sql.Column])
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

  /** q7 — cross-nation trade volume (TPC-H Q7 shape): revenue between
    * every (supplier nation, customer nation) pair per ship year. The
    * fact table reaches its nation labels through two different dims:
    * supplier-side directly on l_suppkey, customer-side via orders.
    * Plan posture: lineitem ⋈ orders is THE shuffle (both sides keyed
    * on orderkey); supplier, customer, and both nation hops broadcast —
    * at warehouse scale none of the dim joins may touch the exchange. */
  def nationVolume(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"),
        (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
          .as("rev_e4"))
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "supp_nation")
    val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "cust_nation")
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    l.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum(col("rev_e4")).as("revenue_e4"), count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val nationVolumeOracle: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |       CAST(year(l.l_shipdate) AS INT) AS l_year,
      |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
      |                (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
      |            AS BIGINT) AS revenue_e4,
      |       count(*) AS n_items
      |FROM lineitem l
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      |WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1998-01-01'
      |  AND n1.n_name <> n2.n_name
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  /** q10 — returned-item revenue per customer (TPC-H Q10 shape): which
    * customers returned the most revenue in a half-year window.
    * Aggregate-below-join again: the returned lineitem ⋈ orders stream
    * collapses to one row per customer BEFORE the customer/nation dims
    * attach (both broadcast) — the revenue shuffle carries custkeys,
    * not line items. */
  def returnedByCustomer(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
          .as("rev_e4"))
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit("1997-07-01 00:00:00")))
      .select("o_orderkey", "o_custkey")
    val perCust = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev_e4")).as("revenue_e4"), count(lit(1)).as("n_items"))
    val c = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"),
        cents(col("c_acctbal")).as("acctbal_cents"), col("c_nationkey"))
    val n = Tables.nation(s, d)
      .select(col("n_nationkey"), col("n_name").as("nation"))
    perCust
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_name", "nation", "acctbal_cents",
        "revenue_e4", "n_items")
      .orderBy(desc("revenue_e4"), col("c_custkey"))
  }

  val returnedByCustomerOracle: String =
    """SELECT c.c_custkey, c.c_name, n.n_name AS nation,
      |       CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents,
      |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
      |                (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
      |            AS BIGINT) AS revenue_e4,
      |       count(*) AS n_items
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE l.l_returnflag = 'R'
      |  AND o.o_orderdate >= '1997-01-01' AND o.o_orderdate < '1997-07-01'
      |GROUP BY 1, 2, 3, 4
      |ORDER BY revenue_e4 DESC, c.c_custkey""".stripMargin

  /** q14 — promo revenue share (TPC-H Q14 shape): fraction of a
    * quarter's revenue from promo-typed parts. One broadcast dim join +
    * conditional aggregation; the percentage is the single double
    * division of two exact integer sums (numerator pre-scaled ×100 in
    * integer space, so both operands stay exactly representable). */
  def promoRevenue(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1997-04-01 00:00:00")))
      .select(col("l_partkey"),
        (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
          .as("rev_e4"))
    val p = Tables.part(s, d).select("p_partkey", "p_type")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("rev_e4")).otherwise(0L))
          .as("promo_e4"),
        sum(col("rev_e4")).as("total_e4"))
      .withColumn("promo_pct", (col("promo_e4") * 100) / col("total_e4"))
  }

  val promoRevenueOracle: String =
    """WITH j AS (
      |  SELECT CAST(round(l.l_extendedprice * 100) AS BIGINT) *
      |         (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev_e4,
      |         p.p_type
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE l.l_shipdate >= '1997-01-01' AND l.l_shipdate < '1997-04-01')
      |SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END) AS BIGINT) AS promo_e4,
      |       CAST(sum(rev_e4) AS BIGINT) AS total_e4,
      |       (CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END) AS BIGINT) * 100)
      |         / CAST(sum(rev_e4) AS BIGINT) AS promo_pct
      |FROM j""".stripMargin

  /** q16a — never-bulk-ordered parts per brand (TPC-H Q16's NOT-EXISTS
    * shape, adapted: this corpus orders every part at least once, so
    * the exclusion subquery filters on bulk quantity instead of
    * supplier complaints): parts with NO qty ≥ 45 line item, counted by
    * brand. LEFT ANTI join — the probe side shuffles only partkeys that
    * survive the pushed quantity filter, and nothing from the right
    * side is materialized. */
  def neverBulkParts(s: SparkSession, d: String): DataFrame = {
    val bulk = Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 45)
      .select(col("l_partkey"))
    Tables.part(s, d)
      .join(bulk, col("p_partkey") === col("l_partkey"), "left_anti")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        min(col("p_size")).as("min_size"),
        max(cents(col("p_retailprice"))).as("max_retail_cents"))
      .orderBy("p_brand")
  }

  val neverBulkPartsOracle: String =
    """SELECT p_brand, count(*) AS n_parts,
      |       min(p_size) AS min_size,
      |       CAST(max(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS max_retail_cents
      |FROM part p
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
      |                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** q19 — disjunctive bracket revenue (TPC-H Q19 shape): an OR of
    * three (brand, quantity-band, size-band) brackets over lineitem ⋈
    * part. The shape exists to exercise disjunctive predicate handling:
    * the per-side conjuncts common to all brackets (quantity ≥ 1,
    * size ≥ 1) are pushable even though the full predicate straddles
    * the join, and the join itself stays equi on partkey with the OR
    * evaluated post-join — never a nested-loop theta join. */
  def bracketRevenue(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_quantity"),
        (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
          .as("rev_e4"))
    val p = Tables.part(s, d).select("p_partkey", "p_brand", "p_size")
    val bracket = (col("p_brand") === "Brand#12" &&
        col("l_quantity").between(1, 11) && col("p_size").between(1, 25)) ||
      (col("p_brand") === "Brand#23" &&
        col("l_quantity").between(10, 20) && col("p_size").between(1, 30)) ||
      (col("p_brand") === "Brand#34" &&
        col("l_quantity").between(20, 30) && col("p_size").between(1, 35))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(bracket)
      .agg(sum(col("rev_e4")).as("revenue_e4"), count(lit(1)).as("n_items"))
  }

  val bracketRevenueOracle: String =
    """SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
      |                (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
      |            AS BIGINT) AS revenue_e4,
      |       count(*) AS n_items
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11
      |       AND p.p_size BETWEEN 1 AND 25)
      |   OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20
      |       AND p.p_size BETWEEN 1 AND 30)
      |   OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30
      |       AND p.p_size BETWEEN 1 AND 35)""".stripMargin

  /** q22 — dormant high-balance customers (TPC-H Q22 shape, adapted:
    * every customer here has SOME order, so "no orders" becomes "no
    * orders since 2000"): count + total balance of customers whose
    * balance beats the positive-balance average and who went inactive.
    * The global threshold is a one-row aggregate broadcast across the
    * scan (never a per-row subquery), compared by exact integer
    * cross-multiplication (bal·n > sum — no division, so boundary rows
    * agree across engines); the inactivity test is a LEFT ANTI join
    * against the date-filtered order keys. */
  def dormantRich(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .select(col("c_custkey"), cents(col("c_acctbal")).as("bal_cents"))
    val pos = c.filter(col("bal_cents") > 0)
      .agg(sum(col("bal_cents")).as("pos_sum"), count(lit(1)).as("pos_n"))
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01 00:00:00")))
      .select(col("o_custkey"))
    c.join(broadcast(pos))
      .filter(col("bal_cents") * col("pos_n") > col("pos_sum"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_cust"),
        sum(col("bal_cents")).as("sum_bal_cents"))
  }

  val dormantRichOracle: String =
    """WITH c AS (SELECT c_custkey,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents FROM customer),
      |pos AS (SELECT CAST(sum(bal_cents) AS BIGINT) AS pos_sum,
      |               count(*) AS pos_n
      |        FROM c WHERE bal_cents > 0)
      |SELECT count(*) AS n_cust,
      |       CAST(sum(c.bal_cents) AS BIGINT) AS sum_bal_cents
      |FROM c, pos
      |WHERE c.bal_cents * pos.pos_n > pos.pos_sum
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderdate >= '2000-01-01')""".stripMargin

  /** q6 — forecast revenue change (TPC-H Q6 shape): the pure
    * scan-filter-aggregate query — no join, no group key, one row out.
    * The shape exists to prove the scan layer carries the whole load:
    * the shipdate range pushes to the parquet reader as a min/max
    * row-group prune, and everything after it is one map-side partial
    * sum. The discount band compares in integer cents (not the raw
    * double) so both engines agree on every boundary row. */
  def forecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")) &&
        col("l_quantity") < 24)
      .filter(cents(col("l_discount")).between(5, 7))
      .agg(
        sum(cents(col("l_extendedprice")) * cents(col("l_discount")))
          .as("revenue_e4"),
        count(lit(1)).as("n_items"))

  val forecastRevenueOracle: String =
    """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
      |                CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
      |         AS revenue_e4,
      |       count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
      |  AND l_quantity < 24
      |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7""".stripMargin

  /** q8 — national market share (TPC-H Q8 shape): one nation's share of
    * a region's revenue in a part-type segment, per order year. The
    * fact row reaches FOUR dimension labels (part type, supplier
    * nation, customer nation, customer region) and every one of them
    * broadcasts; the selective part filter applies FIRST so the
    * orders shuffle carries only the segment's line items. The share is
    * a conditional-sum / total-sum pair of exact integers with one
    * final double division. */
  def marketShare(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
        .as("rev_e4"))
    val p = Tables.part(s, d)
      .filter(col("p_type") === "ECONOMY").select("p_partkey")
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "supp_nation")
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("o_year"))
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val n2 = Tables.nation(s, d).select(
      col("n_nationkey").as("cn_nationkey"), col("n_regionkey"))
    val r = Tables.region(s, d)
      .filter(col("r_name") === "ASIA").select("r_regionkey")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("cn_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("o_year")
      .agg(
        sum(when(col("supp_nation") === "NATION_2", col("rev_e4"))
          .otherwise(0L)).as("nation_e4"),
        sum(col("rev_e4")).as("total_e4"))
      .withColumn("mkt_share", col("nation_e4") / col("total_e4"))
      .orderBy("o_year")
  }

  val marketShareOracle: String =
    """WITH j AS (
      |  SELECT year(o.o_orderdate) AS o_year,
      |         CAST(round(l.l_extendedprice * 100) AS BIGINT) *
      |           (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev_e4,
      |         ns.n_name AS supp_nation
      |  FROM lineitem l
      |  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      |  JOIN region r ON nc.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
      |  WHERE o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1998-01-01')
      |SELECT CAST(o_year AS INT) AS o_year,
      |       CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN rev_e4 ELSE 0 END)
      |            AS BIGINT) AS nation_e4,
      |       CAST(sum(rev_e4) AS BIGINT) AS total_e4,
      |       CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN rev_e4 ELSE 0 END)
      |            AS BIGINT) / CAST(sum(rev_e4) AS BIGINT) AS mkt_share
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  /** q9a — product-segment profit by supplier nation and year (TPC-H
    * Q9 shape, adapted: this corpus has no partsupp table, so profit is
    * the discounted revenue rather than revenue − supplycost): revenue
    * of parts whose name contains a token, grouped by the SUPPLIER-path
    * nation — the join topology Q9 exists to exercise (fact → part
    * filter, fact → supplier → nation, no orders/customer hop). Both
    * dim paths broadcast; the only shuffle is the final small group. */
  def partNameProfit(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d).select(
      col("l_partkey"), col("l_suppkey"),
      year(col("l_shipdate")).as("l_year"),
      (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
        .as("rev_e4"))
    val p = Tables.part(s, d)
      .filter(col("p_name").contains("gear")).select("p_partkey")
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name").as("nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "nation")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy("nation", "l_year")
      .agg(sum(col("rev_e4")).as("profit_e4"), count(lit(1)).as("n_items"))
      .orderBy("nation", "l_year")
  }

  val partNameProfitOracle: String =
    """SELECT n.n_name AS nation, CAST(year(l.l_shipdate) AS INT) AS l_year,
      |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
      |                (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
      |            AS BIGINT) AS profit_e4,
      |       count(*) AS n_items
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |WHERE p.p_name LIKE '%gear%'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q15 — top supplier by quarterly revenue (TPC-H Q15 shape): the
    * aggregate-then-global-max pattern. Per-supplier revenue is one
    * keyed aggregation; the maximum is a ONE-ROW aggregate broadcast
    * back over it (never a rank-everything sort), and only the
    * surviving row(s) — ties kept, per the TPC-H definition — meet the
    * broadcast supplier dim. Exact integer revenue means the
    * max-equality predicate cannot drift between engines. */
  def topSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1997-04-01 00:00:00")))
      .groupBy(col("l_suppkey"))
      .agg(sum(cents(col("l_extendedprice")) *
        (lit(100) - cents(col("l_discount")))).as("total_rev_e4"))
    val mx = rev.agg(max(col("total_rev_e4")).as("max_rev"))
    rev.join(broadcast(mx))
      .filter(col("total_rev_e4") === col("max_rev"))
      .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev_e4"))
      .orderBy("s_suppkey")
  }

  val topSupplierOracle: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
      |                  (100 - CAST(round(l_discount * 100) AS BIGINT)))
      |              AS BIGINT) AS total_rev_e4
      |  FROM lineitem
      |  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s.s_suppkey, s.s_name, rev.total_rev_e4
      |FROM rev
      |JOIN supplier s ON rev.l_suppkey = s.s_suppkey
      |WHERE rev.total_rev_e4 = (SELECT max(total_rev_e4) FROM rev)
      |ORDER BY s.s_suppkey""".stripMargin

  /** q12a — two-class CASE counting across a fact-fact join (TPC-H
    * Q12's shape; this schema has no ship-mode/receipt columns, so the
    * classes split on order priority per line status): for lineitems
    * shipped in 1997, how many belong to critical (1-URGENT/2-HIGH)
    * orders vs the rest. The join is the honest big-big shuffle on
    * orderkey — at warehouse scale neither side broadcasts — with the
    * shipdate predicate pushed to the lineitem scan so the shuffle
    * carries one filtered year, and the classes resolved map-side as a
    * conditional aggregate (never two joins or a pivot). */
  def priorityClasses(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= "1997-01-01" &&
        col("l_shipdate") < "1998-01-01")
      .select("l_orderkey", "l_linestatus")
    val o = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
    val critical = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(critical, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(critical, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  val priorityClassesOracle: String =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** q21a — the EXISTS + NOT-EXISTS double-correlated chain (TPC-H
    * Q21's shape; without receipt/commit dates the "blame" predicate
    * becomes the return flag): per supplier, how many of its RETURNED
    * lineitems sit in multi-supplier orders where it is the ONLY
    * supplier with a return — the sole-blame count. Compiled as one
    * LEFT SEMI (another supplier exists in the order) and one LEFT
    * ANTI (no OTHER supplier has a return) against the same distinct
    * (order, supplier) table — both keyed on orderkey, the semi/anti
    * sides deduplicated so the probes carry one row per (order,
    * supplier), never the raw lineitem fanout. */
  def soleBlame(s: SparkSession, d: String): DataFrame =
    soleBlameOf(Tables.lineitem(s, d), Tables.supplier(s, d))

  /** [[soleBlame]] over explicit lineitem/supplier frames.
    *
    * The probe stream is the RAW returned-lineitem rows, by
    * measurement: pre-aggregating it to distinct (order, supplier)
    * counts first (recovering numwait as Σ cnt) reads as the obvious
    * fanout cut, but ScaleProbe timed it 2.6 → 6.3 → 127 s at
    * 1×/10×/40× vs 2.1 → 5.7 → 38 s raw — at this corpus's ~3-rows-
    * per-(order,supplier) multiplicity the two extra aggregation
    * exchanges cost far more than the 3× probe-row reduction saves.
    * Revisit only if a real corpus shows orders-of-magnitude line
    * multiplicity. The semi/anti RIGHT sides stay distinct regardless
    * (correctness: anti must not multiply, and probes stay bounded
    * per orderkey). */
  def soleBlameOf(li: DataFrame, supplier: DataFrame): DataFrame = {
    val returned = li.filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_suppkey")
    val orderSupps = li.select("l_orderkey", "l_suppkey").distinct()
      .toDF("o2_orderkey", "o2_suppkey")
    val orderReturns = returned.distinct()
      .toDF("o3_orderkey", "o3_suppkey")
    val withOther = returned.join(orderSupps,
      col("l_orderkey") === col("o2_orderkey") &&
        col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
    val sole = withOther.join(orderReturns,
      col("l_orderkey") === col("o3_orderkey") &&
        col("l_suppkey") =!= col("o3_suppkey"), "left_anti")
    sole
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_name"))
  }

  val soleBlameOracle: String =
    """SELECT s_name, count(*) AS numwait
      |FROM lineitem l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin

  /** q2a — the min-cost-supplier correlated subquery (TPC-H Q2's shape;
    * this schema has no partsupp, so a (part, supplier)'s offered cost
    * is its cheapest observed lineitem price). The classic formulation
    * re-evaluates `min(cost) WHERE partkey = outer.partkey` per part;
    * here the whole correlation collapses into ONE argmin aggregation —
    * `min(struct(cost, suppkey))` per part — so there is no subquery
    * rescan and no join back against the cost table: the struct min
    * carries the winning supplier out of the same shuffle that computes
    * the minimum (ties break to the lowest suppkey by the struct's
    * lexicographic order, mirrored in the oracle's two-level min).
    * Part filter is broadcast into the lineitem scan as a semi-join so
    * the big side never carries non-qualifying parts; supplier/nation
    * dims broadcast at the (tiny) output grain. */
  def minCostSupplier(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .filter(col("p_type") === "STANDARD" && col("p_size") <= 15)
      .select("p_partkey", "p_name")
    val cost = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"),
        cents(col("l_extendedprice")).as("price_cents"))
      .join(broadcast(p.select("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(col("price_cents")).as("cost_cents"))
    val best = cost
      .groupBy(col("l_partkey"))
      .agg(min(struct(col("cost_cents"), col("l_suppkey"))).as("b"))
      .select(col("l_partkey"),
        col("b.cost_cents").as("best_cost_cents"),
        col("b.l_suppkey").as("best_suppkey"))
    best
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d)
          .select("s_suppkey", "s_name", "s_nationkey")),
        col("best_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"),
        col("n_name").as("nation"), col("best_cost_cents"))
      .orderBy("p_partkey")
  }

  val minCostSupplierOracle: String =
    """WITH cost AS (
      |  SELECT l_partkey, l_suppkey,
      |         CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |           AS cost_cents
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_type = 'STANDARD' AND p_size <= 15
      |  GROUP BY 1, 2),
      |best AS (
      |  SELECT l_partkey, min(cost_cents) AS best_cost_cents FROM cost GROUP BY 1),
      |pick AS (
      |  SELECT c.l_partkey, b.best_cost_cents, min(c.l_suppkey) AS best_suppkey
      |  FROM cost c JOIN best b
      |    ON c.l_partkey = b.l_partkey AND c.cost_cents = b.best_cost_cents
      |  GROUP BY 1, 2)
      |SELECT p_partkey, p_name, s_name, n_name AS nation, best_cost_cents
      |FROM pick
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON best_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |ORDER BY p_partkey""".stripMargin

  /** q11a — group HAVING against a global scalar (TPC-H Q11's shape):
    * parts whose inventory value exceeds 1.5× the mean part share.
    * Value is exact e-4 integer (price_cents × qty_cents); the global
    * sum and part count come from re-aggregating the per-part table,
    * and the threshold compare is CROSS-MULTIPLIED integers
    * (`v · n_parts · 10 > 15 · total`) so no division touches the
    * predicate. The per-part aggregate subtree appears on both sides
    * of the broadcast cross join, but its input exchange is structurally
    * identical on both — Spark's ReuseExchange collapses the second
    * lineitem scan+shuffle (gated in PlanSpec), which is exactly the
    * Q11 plan you want at 100 TB: one big shuffle, one scalar, one
    * broadcast. TPC-H's own fraction is scale-dependent (0.0001/SF);
    * the mean-relative form keeps the predicate meaningful at any SF. */
  def importantParts(s: SparkSession, d: String): DataFrame = {
    val perPart = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(sum(cents(col("l_extendedprice")) * cents(col("l_quantity")))
        .as("value_e4"))
    val totals = perPart.agg(
      sum(col("value_e4")).as("total_e4"),
      count(lit(1)).as("n_parts"))
    perPart.join(broadcast(totals))
      .filter(col("value_e4") * col("n_parts") * 10 > col("total_e4") * 15)
      .select(col("l_partkey").as("p_partkey"), col("value_e4"))
      .orderBy(desc("value_e4"), col("p_partkey"))
  }

  val importantPartsOracle: String =
    """WITH pp AS (
      |  SELECT l_partkey,
      |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
      |                  CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
      |           AS value_e4
      |  FROM lineitem GROUP BY 1),
      |t AS (SELECT CAST(sum(value_e4) AS BIGINT) AS total_e4,
      |             count(*) AS n_parts FROM pp)
      |SELECT pp.l_partkey AS p_partkey, pp.value_e4
      |FROM pp, t
      |WHERE pp.value_e4 * t.n_parts * 10 > t.total_e4 * 15
      |ORDER BY value_e4 DESC, p_partkey""".stripMargin

  /** q20a — the nested-aggregate semi-join (TPC-H Q20's shape; without
    * partsupp availqty, "excess" becomes shipped-quantity dominance):
    * suppliers who shipped a strict MAJORITY of some part's 1997
    * quantity, with how many parts they dominate. The inner correlated
    * sum (part total) is a window sum OVER THE AGGREGATED (part,
    * supplier) table — one lineitem scan, one big shuffle, then a
    * small exchange of pre-aggregated rows; never a second scan or a
    * self-join of the raw fact. The majority predicate is integer
    * cross-multiplication (2·q > total) on exact qty cents. */
  def excessSuppliers(s: SparkSession, d: String): DataFrame = {
    val ps = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(cents(col("l_quantity"))).as("qty_cents"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    ps.withColumn("part_total", sum(col("qty_cents")).over(w))
      .filter(col("qty_cents") * 2 > col("part_total"))
      .join(broadcast(Tables.supplier(s, d)
          .select("s_suppkey", "s_name", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("s_suppkey"), col("s_name"), col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_dominant_parts"))
      .orderBy("s_suppkey")
  }

  val excessSuppliersOracle: String =
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey,
      |         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
      |           AS qty_cents
      |  FROM lineitem
      |  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
      |  GROUP BY 1, 2),
      |w AS (SELECT *, sum(qty_cents) OVER (PARTITION BY l_partkey) AS part_total
      |      FROM ps)
      |SELECT s_suppkey, s_name, n_name AS nation, count(*) AS n_dominant_parts
      |FROM w
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE 2 * qty_cents > part_total
      |GROUP BY 1, 2, 3
      |ORDER BY s_suppkey""".stripMargin
}
