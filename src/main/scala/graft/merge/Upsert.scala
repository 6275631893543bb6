package graft.merge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** S14/J4/T3 — the reference's BigQuery `MERGE … WHEN NOT MATCHED THEN
  * INSERT ROW` (airflow/dags/earthquake_batch_pipeline.py:176-192) is an
  * insert-only upsert. In vanilla Spark that is a left-anti join of the
  * incoming batch against the target keyset, unioned onto the target.
  *
  * Scale posture: the anti join shuffles both sides on the merge key —
  * at warehouse scale the target side should be pruned to the partitions
  * the batch can touch (here: the incoming batch is a month, so only the
  * matching date partition of the target is scanned). The left-anti is
  * itself idempotent: replaying a batch inserts nothing.
  */
object Upsert {

  /** Insert-only merge: rows of `incoming` whose key tuple is absent from
    * `target`, appended. */
  def antiJoinUpsert(
      target: DataFrame,
      incoming: DataFrame,
      keys: Seq[String]): DataFrame = {
    val inserts = incoming.join(
      target.select(keys.map(col): _*).dropDuplicates(keys),
      keys,
      "left_anti")
    target.unionByName(inserts)
  }

  /** Beyond-reference extension: upsert WITH an update branch
    * (last-writer-wins) — matched target rows are replaced by the
    * incoming version, unmatched target rows survive, new rows insert.
    * `target ∖ incoming ∪ incoming` by key: one left-anti join + union,
    * same shuffle profile as the insert-only path. */
  def upsertWithUpdate(
      target: DataFrame,
      incoming: DataFrame,
      keys: Seq[String]): DataFrame = {
    val kept = target.join(
      incoming.select(keys.map(col): _*).dropDuplicates(keys),
      keys,
      "left_anti")
    kept.unionByName(incoming)
  }

  /** Oracle-checkable update-merge on orders: target = pre-2000 orders
    * tagged 'existing'; incoming = high-value orders tagged 'updated' —
    * overlapping keys must carry the incoming tag afterward. */
  def mergeUpdateOrders(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val target = o
      .filter(col("o_orderdate") < to_timestamp(lit("2000-01-01 00:00:00")))
      .select(col("o_orderkey"), lit("existing").as("src"))
    val incoming = o
      .filter(col("o_totalprice") > 300000)
      .select(col("o_orderkey"), lit("updated").as("src"))
    upsertWithUpdate(target, incoming, Seq("o_orderkey"))
      .orderBy("o_orderkey")
  }

  /** j8 — SCD TYPE 2 history build (the warehouse dimension-versioning
    * staple the reference's insert-only MERGE cannot express): every
    * change event becomes a version row with a validity interval
    * [valid_from, valid_to), closed by the NEXT change of the same key
    * — one `lead()` window per key — and the open current version is
    * flagged. One shuffle on the dimension key; per-key work is a local
    * sort of that key's change history, so the operator scales with the
    * busiest key's change count, not the corpus. Timestamps surface as
    * second-truncated strings per the cross-engine determinism rules;
    * (ts, orderkey) totally orders same-timestamp changes. */
  def scd2History(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("custkey").orderBy("ts", "o_orderkey")
    Tables.orders(s, d)
      .select(col("o_custkey").as("custkey"), col("o_orderkey"),
        col("o_orderdate").as("ts"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .select(col("custkey"), col("o_orderkey"), col("price_cents"),
        col("ts").cast("string").as("valid_from"),
        col("next_ts").cast("string").as("valid_to"),
        col("next_ts").isNull.as("is_current"))
      .orderBy("custkey", "valid_from", "o_orderkey")
  }

  val scd2HistoryOracle: String =
    """WITH c AS (
      |  SELECT o_custkey AS custkey, o_orderkey, o_orderdate AS ts,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
      |         lead(o_orderdate, 1) OVER (PARTITION BY o_custkey
      |           ORDER BY o_orderdate, o_orderkey) AS next_ts
      |  FROM orders)
      |SELECT custkey, o_orderkey, price_cents,
      |       CAST(ts AS VARCHAR) AS valid_from,
      |       CAST(next_ts AS VARCHAR) AS valid_to,
      |       next_ts IS NULL AS is_current
      |FROM c ORDER BY custkey, valid_from, o_orderkey""".stripMargin

  /** Reporting dates for the j12 snapshot reconstruction. */
  val SnapshotDates = Seq("1994-01-01", "1996-01-01", "1998-01-01",
    "2000-01-01")

  /** j12 — SCD2 snapshot reconstruction (time travel over the j8
    * version history): for every dimension key and reporting date,
    * the version valid AT that date — the "rebuild the dim as of
    * quarter-end" query every warehouse runs against slowly-changing
    * dimensions. Implemented with the AsOf union-carry pattern, not
    * an inequality join: version rows and probe rows union into ONE
    * key-partitioned stream ordered by (ts, kind, version-id), a
    * running last() carries the newest version fields forward, and
    * probe rows read the carried values — one shuffle + one sort,
    * per-key cost bounded by that key's version count, no
    * versions×probes fanout. Keys with no version yet surface with
    * NULLs (the oracle's LEFT JOIN keeps them identically). */
  def scd2Snapshot(s: SparkSession, d: String): DataFrame =
    scd2SnapshotOf(Tables.orders(s, d))

  def scd2SnapshotOf(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ver = orders.select(col("o_custkey").as("custkey"),
      col("o_orderkey"), col("o_orderdate").as("ts"),
      round(col("o_totalprice") * 100).cast("long").as("price_cents"))
    val probeTs = SnapshotDates.map(x => lit(x + " 00:00:00").cast("timestamp"))
    val probes = ver.select("custkey").distinct()
      .withColumn("d", explode(array(probeTs: _*)))
    val vRows = ver.select(col("custkey"), col("ts"), lit(0).as("kind"),
      col("o_orderkey"), col("price_cents"),
      lit(null).cast("timestamp").as("d"))
    val pRows = probes.select(col("custkey"), col("d").as("ts"),
      lit(1).as("kind"), lit(null).cast("long").as("o_orderkey"),
      lit(null).cast("long").as("price_cents"), col("d"))
    val w = Window.partitionBy("custkey")
      .orderBy(col("ts"), col("kind"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, 0)
    vRows.unionByName(pRows)
      .withColumn("v_key",
        last(when(col("kind") === 0, col("o_orderkey")), ignoreNulls = true).over(w))
      .withColumn("v_price",
        last(when(col("kind") === 0, col("price_cents")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("custkey"), col("d").cast("string").as("valid_at"),
        col("v_key").as("version_orderkey"), col("v_price").as("price_cents"))
      .orderBy("custkey", "valid_at")
  }

  /** DuckDB replay: probes × dates LEFT JOIN versions at ts ≤ d,
    * newest (ts, orderkey) wins — the rank formulation of the same
    * as-of pick, tie rules mirrored. */
  val scd2SnapshotOracle: String = {
    val ds = SnapshotDates.map(x => s"(TIMESTAMP '$x')").mkString(", ")
    s"""WITH ver AS (
       |  SELECT o_custkey AS custkey, o_orderkey, o_orderdate AS ts,
       |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
       |  FROM orders),
       |ds(d) AS (VALUES $ds),
       |probes AS (SELECT DISTINCT custkey FROM ver),
       |cand AS (
       |  SELECT p.custkey, ds.d, v.o_orderkey, v.price_cents,
       |         row_number() OVER (PARTITION BY p.custkey, ds.d
       |           ORDER BY v.ts DESC, v.o_orderkey DESC) AS rn
       |  FROM probes p CROSS JOIN ds
       |  LEFT JOIN ver v ON v.custkey = p.custkey AND v.ts <= ds.d)
       |SELECT custkey, CAST(d AS VARCHAR) AS valid_at,
       |       o_orderkey AS version_orderkey, price_cents
       |FROM cand WHERE rn = 1 ORDER BY custkey, valid_at""".stripMargin
  }

  /** j9 — CDC latest-wins merge: a change batch usually carries SEVERAL
    * updates per key (a customer ordering twice in the window); merging
    * it raw would write whichever duplicate the join met last. The
    * production composition dedups the batch to each key's LATEST
    * change (row_number over (key, change-time DESC, total-order
    * tiebreak)) and only then applies the update-merge — one window
    * shuffle on the merge key that the merge's own anti-join reuses.
    * Target = each customer's latest pre-2000 order; changes = each
    * customer's orders from 2000 on. */
  def cdcLatestMerge(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def latestPerCust(df: DataFrame, src: String): DataFrame = {
      val w = Window.partitionBy("custkey")
        .orderBy(desc("ts"), desc("o_orderkey"))
      df.select(col("o_custkey").as("custkey"), col("o_orderkey"),
          col("o_orderdate").as("ts"),
          round(col("o_totalprice") * 100).cast("long").as("price_cents"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("custkey"), col("o_orderkey"), col("price_cents"),
          lit(src).as("src"))
    }
    val o = Tables.orders(s, d)
    val cutoff = to_timestamp(lit("2000-01-01 00:00:00"))
    val target = latestPerCust(o.filter(col("o_orderdate") < cutoff), "existing")
    val changes = latestPerCust(o.filter(col("o_orderdate") >= cutoff), "cdc")
    upsertWithUpdate(target, changes, Seq("custkey"))
      .orderBy("custkey")
  }

  val cdcLatestMergeOracle: String =
    """WITH ranked AS (
      |  SELECT o_custkey AS custkey, o_orderkey,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
      |         o_orderdate < TIMESTAMP '2000-01-01 00:00:00' AS is_old,
      |         row_number() OVER (
      |           PARTITION BY o_custkey,
      |                        o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
      |           ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders),
      |target AS (
      |  SELECT custkey, o_orderkey, price_cents, 'existing' AS src
      |  FROM ranked WHERE is_old AND rn = 1),
      |changes AS (
      |  SELECT custkey, o_orderkey, price_cents, 'cdc' AS src
      |  FROM ranked WHERE NOT is_old AND rn = 1)
      |SELECT t.* FROM target t
      |WHERE NOT EXISTS (SELECT 1 FROM changes c WHERE c.custkey = t.custkey)
      |UNION ALL
      |SELECT * FROM changes
      |ORDER BY custkey""".stripMargin

  /** Oracle-checkable merge scenario on orders: target = pre-2000 orders,
    * incoming = high-value orders (overlapping both eras); result tagged
    * by provenance. Replay-idempotence is asserted in the spec. */
  def mergeOrders(s: SparkSession, d: String): DataFrame =
    mergeOrdersOf(Tables.orders(s, d))

  /** DataFrame-first variant (ScaleProbe feeds replicated corpora). */
  def mergeOrdersOf(o: DataFrame): DataFrame = {
    val target = o
      .filter(col("o_orderdate") < to_timestamp(lit("2000-01-01 00:00:00")))
      .select(col("o_orderkey"), lit("existing").as("src"))
    val incoming = o
      .filter(col("o_totalprice") > 300000)
      .select(col("o_orderkey"), lit("inserted").as("src"))
    antiJoinUpsert(target, incoming, Seq("o_orderkey"))
      .orderBy("o_orderkey")
  }
}
