package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Functions

/** The fused MD5 expressions must stay bit-identical to the
  * builtin-composed formulations (which are what the DuckDB oracle
  * computes) — any divergence silently breaks every minhash/simhash
  * oracle. */
class Md5Spec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  val samples: Seq[String] = Seq(
    "", "a", "the quick brown fox", "naïve café ünïcode ⚡",
    "line\nbreak\ttab", " leading and trailing ", "0", "ffffffff",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "x" * 1000) ++ (0 until 200).map(i => s"doc-$i shingle word$i")

  test("md5Hash56Pair fused == builtin-composed reference") {
    val df = samples.toDF("s")
    val (h1, h2) = Functions.md5Hash56Pair(col("s"))
    val (r1, r2) = Functions.md5Hash56PairReference(col("s"))
    val bad = df.select(h1.as("h1"), h2.as("h2"), r1.as("r1"), r2.as("r2"))
      .filter(col("h1") =!= col("r1") || col("h2") =!= col("r2"))
    assert(bad.count() == 0)
  }

  test("md5Hash60 fused == builtin-composed reference (several seeds)") {
    val df = samples.toDF("s")
    Seq(0, 1, 99, -7).foreach { seed =>
      val bad = df
        .select(Functions.md5Hash60(col("s"), seed).as("h"),
          Functions.md5Hash60Reference(col("s"), seed).as("r"))
        .filter(col("h") =!= col("r"))
      assert(bad.count() == 0, s"seed $seed diverged")
    }
  }

  test("md5Hash60 evaluates inside a transform lambda (interpreted path)") {
    val df = Seq(Seq("a", "b", "c")).toDF("xs")
    val got = df.select(transform(col("xs"),
      x => Functions.md5Hash60(x, 0)).as("h"))
      .as[Seq[Long]].head()
    val ref = df.select(transform(col("xs"),
      x => Functions.md5Hash60Reference(x, 0)).as("h"))
      .as[Seq[Long]].head()
    assert(got == ref)
  }

  test("md5Hash56Pair stays inside whole-stage codegen") {
    // parquet-backed, so ConvertToLocalRelation can't fold the project away
    val df = Tables.documents(spark, GraftSpark.sf).select(col("text").as("s"))
    val (h1, h2) = Functions.md5Hash56Pair(col("s"))
    val q = df.select(h1.as("h1"), h2.as("h2"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen region:\n${plan.take(800)}")
  }
}
