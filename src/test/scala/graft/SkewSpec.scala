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
}
