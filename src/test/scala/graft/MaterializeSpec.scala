package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Materialize, Similarity}

/** The persistence seam: every LSH-family operator must produce
  * identical results whether its intermediates live as executor-local
  * checkpoints (run-once driver shape) or as durable parquet tables
  * (the fault-tolerant warehouse lifecycle). */
class MaterializeSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("minhash LSH pairs: storage-mode intermediates == local-checkpoint mode, files on disk") {
    val dir = Files.createTempDirectory("graft_mat").toString
    val local = rows(Dedup.minhashLshQuery(spark, sf))
    val stored = rows(Dedup.minhashLshQuery(spark, sf, Materialize.Storage(dir)))
    assert(stored == local)
    // the shingle and band tables really were persisted as readable parquet
    for (name <- Seq("minhash_shingles", "minhash_bands")) {
      val t = spark.read.parquet(s"$dir/$name")
      assert(t.count() > 0, name)
    }
  }

  test("n-gram Jaccard: storage mode == local mode") {
    val dir = Files.createTempDirectory("graft_mat").toString
    val local = rows(Dedup.ngramJaccardPairs(spark, sf))
    val stored = rows(Dedup.ngramJaccardPairs(spark, sf, Materialize.Storage(dir)))
    assert(stored == local)
    assert(spark.read.parquet(s"$dir/jaccard_shingles").count() > 0)
  }

  test("bloom decontamination and contamination score: storage mode == local mode") {
    import graft.ops.{Sketch, TextStats}
    val dir = Files.createTempDirectory("graft_mat").toString
    val localB = rows(Sketch.bloomDecontaminateOf(Tables.documents(spark, sf)))
    val storedB = rows(Sketch.bloomDecontaminateOf(
      Tables.documents(spark, sf), Materialize.Storage(dir)))
    assert(storedB == localB)
    assert(spark.read.parquet(s"$dir/bloom_shingles").count() > 0)
    val localC = rows(TextStats.contaminationScore(spark, sf))
    val storedC = rows(TextStats.contaminationScore(spark, sf,
      Materialize.Storage(dir)))
    assert(storedC == localC)
    assert(spark.read.parquet(s"$dir/contam_shingles").count() > 0)
  }

  test("label propagation rounds persist and converge identically in storage mode") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("u", "v")
    val dir = Files.createTempDirectory("graft_mat").toString
    val local = rows(Dedup.labelPropagation(edges).orderBy("id"))
    val stored = rows(
      Dedup.labelPropagation(edges, mode = Materialize.Storage(dir)).orderBy("id"))
    assert(stored == local)
    assert(spark.read.parquet(s"$dir/cc_round_0").count() > 0)
  }

  test("IVF top-k: storage mode == local mode") {
    val dir = Files.createTempDirectory("graft_mat").toString
    val local = rows(Similarity.ivfTopK(spark, sf))
    val stored = rows(Similarity.ivfTopK(spark, sf, Materialize.Storage(dir)))
    assert(stored == local)
    assert(spark.read.parquet(s"$dir/ivf_quantized").count() > 0)
  }

  test("releaseAll drops every cached and checkpointed block") {
    val sc = spark.sparkContext
    Dedup.minhashLshQuery(spark, sf).count() // leaves Local blocks behind
    assert(sc.getPersistentRDDs.nonEmpty)
    Materialize.releaseAll(spark)
    assert(sc.getPersistentRDDs.isEmpty)
  }
}
