package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Functions._

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("tokenizer parity: vertical tab is NOT a separator anywhere (RE2 \\s class, the words() rule)") {
    // DuckDB's RE2 \s is [ \t\n\f\r]; Java's \s adds U+000B. Every
    // oracle-paired tokenizer must use the explicit class or a
    // VT-bearing document hashes differently across engines.
    val df = Seq((1L, "ab c\td")).toDF("doc_id", "text")
    val toks = df
      .select(explode(graft.ops.TextStats.words(col("text"))).as("t"))
      .as[String].collect().toSeq
    assert(toks == Seq("a\u000Bb", "c", "d"), toks.toString)
    // the codegen'd n-gram expressions agree with words()
    val ng = df
      .select(graft.expressions.WordNGrams.ngrams(col("text"), 2).as("g"))
      .as[Seq[String]].head()
    assert(ng == Seq("a\u000Bb c", "c d"), ng.toString)
    val all = df
      .select(graft.expressions.AllWordNGrams.ngrams(col("text"), 2).as("g"))
      .as[Seq[String]].head()
    assert(all == Seq("a\u000Bb c", "c d"), all.toString)
    // and the bigram-LM pair stream keeps VT inside tokens
    val pairs = graft.ops.TextStats.bigramSurprisalOf(df)
      .select("n_bigrams").as[Long].head()
    assert(pairs == 2L, s"expected 2 bigrams over 3 tokens, got $pairs")
  }

  test("cents integerizes 2-decimal doubles exactly") {
    val got = Seq(1013.7, 0.01, 104997.88, 0.0, 499978.59).toDF("v")
      .select(cents($"v").as("c")).as[Long].collect()
    assert(got.toSeq == Seq(101370L, 1L, 10499788L, 0L, 49997859L))
  }

  test("severity buckets are total over the domain (reference fact_earthquake_data.sql:9-16)") {
    val got = Seq(8.5, 8.0, 7.3, 6.0, 5.5, 4.0, 3.99, -1.0).toDF("m")
      .select(severity($"m").as("s")).as[String].collect()
    assert(got.toSeq == Seq("Great", "Great", "Major", "Strong", "Moderate",
      "Light", "Minor", "Minor"))
  }

  test("getDecade matches the dbt macro (reference macros/get_decade.sql:7)") {
    val got = Seq("1999-12-31", "2000-01-01", "2009-06-15", "2010-01-01", "1500-01-01")
      .toDF("d").select(getDecade(to_timestamp($"d").as("ts")).as("dec"))
      .as[Long].collect()
    assert(got.toSeq == Seq(1990L, 2000L, 2000L, 2010L, 1500L))
  }

  test("surrogateKey md5 formula incl. null-coalesce (reference stg_earthquake.sql:31)") {
    val got = Seq(("a", "b"), (null, "b")).toDF("x", "y")
      .select(surrogateKey($"x", $"y").as("k")).as[String].collect()
    // md5("a-b") / md5("-b") computed independently
    assert(got(0) == java.security.MessageDigest.getInstance("MD5")
      .digest("a-b".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(got(1) == java.security.MessageDigest.getInstance("MD5")
      .digest("-b".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("md5Hash56Pair halves match the reference digest and stay under 2^56") {
    val (h1, h2) = md5Hash56Pair($"s")
    val got = Seq("the spark table").toDF("s")
      .select(h1.as("a"), h2.as("b")).as[(Long, Long)].head()
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("the spark table".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got._1 == java.lang.Long.parseLong(hex.substring(0, 14), 16))
    assert(got._2 == java.lang.Long.parseLong(hex.substring(14, 28), 16))
    assert(got._1 < (1L << 56) && got._2 < (1L << 56))
  }

  test("epochMsToTs is exact and UTC-pinned (reference clean_historical.py:27-28)") {
    val got = Seq(0L, 1704067207000L).toDF("ms")
      .select(epochMsToTs($"ms").cast("string").as("ts")).as[String].collect()
    assert(got.toSeq == Seq("1970-01-01 00:00:00", "2024-01-01 00:00:07"))
  }
}
