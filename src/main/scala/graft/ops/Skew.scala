package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter grouping keys: two-stage salted
  * aggregation. The reference's country rollups (A2/A5/A6) would skew
  * badly at 100 TB — a handful of countries hold most events, so a
  * single hash-partitioned aggregation sends whole heavy keys to single
  * reducers. Salting splits each key into `buckets` sub-keys, partially
  * aggregates, then merges — bounding any one task at 1/buckets of the
  * heaviest key. (AQE skew handling covers joins; aggregation skew still
  * needs this.)
  *
  * The aggregate must be algebraically mergeable: expressed here as
  * (partial, merge, finish) column triples over a value column.
  */
object Skew {

  /** Salted count + sum: groupBy(keys + salt) partial, then groupBy(keys)
    * merge. Output: keys, cnt, total.
    *
    * `saltOn` must be a DETERMINISTIC row-level expression (a stable id
    * or high-cardinality attribute hash) — deriving the salt from
    * partition ids or monotonically_increasing_id would change under
    * stage retries, double-counting or losing rows exactly in the
    * large-cluster-with-retries regime salting targets. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], value: Column,
      buckets: Int, saltOn: Column): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltOn), lit(buckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__cnt"), sum(value).as("__sum"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__cnt")).as("cnt"), sum(col("__sum")).as("total"))
  }

  /** skew1 — the salted rollup as a driver query: per-event-type count
    * + integer-cents total through the two-stage salted aggregation,
    * against a PLAIN single-stage GROUP BY oracle. The hash match is
    * the semantics-preservation proof: the salt splits partials and
    * vanishes in the merge, so the answer is independent of the salt
    * function, bucket count, and partitioning — while bounding any one
    * reduce task at ~1/buckets of the heaviest key. */
  def saltedRollup(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    saltedCountSum(graft.Tables.events(s, d), Seq("event_type"),
      graft.functions.Functions.cents(col("value")),
      buckets = 32, saltOn = col("event_id"))
      .orderBy("event_type")

  val saltedRollupOracle: String =
    """SELECT event_type, count(*) AS cnt,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Salted equi-JOIN for skewed fact keys — the join-side counterpart
    * of [[saltedCountSum]] for the case AQE's skew splitting cannot
    * reach (a single hot key inside one shuffle partition of a
    * non-broadcastable dim): the fact side salts each row into one of
    * `buckets` sub-keys off a deterministic row attribute, the dim
    * side REPLICATES each row once per bucket (a `buckets`-way explode
    * of a small literal range — dim cost × buckets, the price of the
    * technique), and the join runs on (key, salt) — every fact row
    * meets exactly one replica of its dim row, so the result set is
    * EXACTLY the plain join's while the heaviest key's probe work
    * spreads over `buckets` tasks. `joinType` accepts "inner" (default)
    * or "left" — the only types dim replication preserves (every fact
    * row still meets exactly one replica, and an unmatched fact row
    * matches no replica of any salt); right/outer/semi/anti would see
    * the replicas and are rejected loudly. The salt column name is
    * uniquified against both inputs, never clobbered, never escapes. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      buckets: Int, saltOn: Column, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin preserves only inner/left semantics, got $joinType")
    val taken = (fact.columns ++ dim.columns).toSet
    val salt = Iterator.from(0).map(i => s"__salt$i")
      .find(!taken.contains(_)).get
    val fs = fact.withColumn(salt, pmod(hash(saltOn), lit(buckets)))
    val ds = dim
      .withColumn(salt, explode(sequence(lit(0), lit(buckets - 1))))
    fs.join(ds.hint("shuffle_hash"), Seq(key, salt), joinType)
      .drop(salt)
  }

  /** skew2 — the salted join as a driver query: lineitem (fact,
    * skew-prone at warehouse scale) against the part dim through an
    * 8-bucket salted join — forced off the broadcast path
    * (shuffle_hash hint) because a broadcastable dim would make
    * salting pointless — then a brand-level revenue rollup. Oracle is
    * the PLAIN join + GROUP BY: the hash match proves the salt
    * replicate/split vanishes in the join semantics, bucket count and
    * salt function invisible in the result. */
  def saltedJoinQuery(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val li = graft.Tables.lineitem(s, d)
      .select(col("l_partkey"),
        graft.functions.Functions.cents(col("l_extendedprice")).as("cents"))
    val part = graft.Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
    saltedJoin(
      li.withColumnRenamed("l_partkey", "p_partkey"), part, "p_partkey",
      buckets = 8, saltOn = col("cents"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("revenue_cents"))
      .orderBy("p_brand")
  }

  val saltedJoinOracle: String =
    """SELECT p.p_brand, count(*) AS n_items,
      |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |    AS revenue_cents
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin
}
