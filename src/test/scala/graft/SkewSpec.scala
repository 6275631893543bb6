package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Functions.cents
import graft.ops.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("salted aggregation equals direct aggregation on a skewed key distribution") {
    // 90% of rows share one key — the heavy-hitter shape
    val rows = (1 to 2000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 7}" else "HEAVY"
      (k, (i % 100) / 100.0 * 50)
    }
    val df = rows.toDF("k", "v").repartition(8)
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum(cents($"v")).as("total"))
      .as[(String, Long, Long)].collect().map { case (k, c, t) => k -> ((c, t)) }.toMap
    val salted = Skew.saltedCountSum(df, Seq("k"), cents($"v"), buckets = 16,
        saltOn = $"v")
      .as[(String, Long, Long)].collect().map { case (k, c, t) => k -> ((c, t)) }.toMap
    assert(salted == direct)
    // the partial stage actually split the heavy key
    val partialGroups = df.withColumn("__salt", pmod(hash($"v"), lit(16)))
      .groupBy("k", "__salt").count()
      .filter($"k" === "HEAVY").count()
    assert(partialGroups > 1, "salt failed to split the heavy key")
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // the runtime half of the skew story (salting is the static half):
    // a sort-merge join whose one key holds most rows must come out of
    // AQE with the oversized partition split. Thresholds are sized for
    // warehouse partitions — pin them down to the fixture's scale.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = (0 until 40000).map { i =>
        (if (i % 10 != 0) 7L else (i % 97).toLong, s"payload_$i")
      }.toDF("k", "s").repartition(8)
      val right = (0L until 97L).map(k => (k, s"dim_$k")).toDF("k", "d")
      val joined = left.join(right, "k")
      // execute THIS plan instance — count() would plan separately and
      // leave joined's adaptive plan unfinalized
      assert(joined.collect().length == 40000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"fixture must shuffle-join:\n${p.take(1200)}")
      assert(p.contains("skew=true"),
        s"AQE did not mark/split the skewed partition:\n${p.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed as-of bounds the hot key's sort-partition size (plain window cannot)") {
    // one key holds 80% of probe rows spread over [0, 6400): the plain
    // union-window sorts all of them in ONE task's partition; the
    // bucketed variant's phase-1 window partitions by (key, bucket),
    // so the largest sort group shrinks to ~rows/buckets
    val rnd = new scala.util.Random(5)
    val hot = 0L
    val probes = (0 until 4000).map { i =>
      val k = if (i % 5 != 0) hot else 1L + rnd.nextInt(4).toLong
      (k, rnd.nextInt(6400).toLong, i.toLong)
    }
    val builds = List.tabulate(50)(i =>
      (i % 5 match { case 0 => hot; case x => x.toLong },
        rnd.nextInt(6400).toLong)).distinct
      .map { case (k, t) => (k, t, rnd.nextLong().abs) }
    val probeDf = probes.toDF("k", "t", "event_id")
    val buildDf = builds.toDF("k", "t", "o_orderkey")
    val width = 400L // 16 buckets
    // the structural claim: per-(key,bucket) group sizes are bounded
    val hotTotal = probes.count(_._1 == hot)
    val maxGroup = probeDf
      .withColumn("bkt", floor(col("t") / width.toDouble))
      .groupBy("k", "bkt").count()
      .agg(max("count")).head().getLong(0)
    assert(maxGroup <= hotTotal / 8,
      s"bucketing failed to spread the hot key: max group $maxGroup of $hotTotal")
    // and the result is still exactly the plain as-of's
    val plain = graft.ops.AsOf.asofLeft(probeDf, buildDf, "o_orderkey")
      .select("event_id", "asof_o_orderkey")
      .as[(Long, Option[Long])].collect().toMap
    val bucketed = graft.ops.AsOf.asofLeftBucketed(probeDf, buildDf, "o_orderkey")(
        t => floor(t / width.toDouble).cast("long"))
      .select("event_id", "asof_o_orderkey")
      .as[(Long, Option[Long])].collect().toMap
    assert(bucketed == plain)
  }

  test("salted join equals the plain join on a hot-key distribution; salt columns never escape") {
    import spark.implicits._
    // one hot key (90% of fact rows) + a tail — the regime salting exists for
    val fact = ((1 to 900).map(i => (7L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 13, 1000L + i)))
      .toDF("k", "v")
    val dim = (0L to 12L).map(k => (k, s"name_$k")).toDF("k", "name")
    val salted = graft.ops.Skew.saltedJoin(fact, dim, "k", 8, col("v"))
    assert(salted.columns.toSeq == Seq("k", "v", "name"))
    val plain = fact.join(dim, Seq("k"))
    assert(salted.count() == plain.count())
    val a = salted.orderBy("k", "v").collect().map(_.toSeq)
    val b = plain.orderBy("k", "v").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }
}
