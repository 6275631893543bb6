package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Eval

/** Model-evaluation operators: the AUC machinery against brute-force
  * pair counting, confusion/metric accounting identities, and the
  * partitioned (never global) shape of the rank window. */
class EvalSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._
  val sf = GraftSpark.sf

  test("aucOf equals brute-force pair counting, ties at half weight") {
    // Two slices; slice 0 has heavy score ties crossing the label
    // boundary, slice 1 is a perfect ranker (AUC must be exactly 1.0).
    val rows = Seq(
      (0, 10L, 1L), (0, 10L, 0L), (0, 10L, 1L), (0, 5L, 0L), (0, 5L, 1L),
      (0, 20L, 0L), (0, 20L, 1L), (0, 1L, 0L), (0, 30L, 1L), (0, 30L, 0L),
      (1, 9L, 1L), (1, 8L, 1L), (1, 7L, 0L), (1, 6L, 0L), (1, 5L, 0L))
    val df = rows.toDF("slice", "score", "is_pos")
    val got = Eval.aucOf(df).collect()
      .map(r => r.getAs[Int]("slice") ->
        (r.getAs[Long]("u2"), r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg")))
      .toMap

    // Brute force: every (pos, neg) pair contributes 2 if pos scores
    // higher, 1 on a tie, 0 otherwise — summed that is exactly 2U.
    for (slice <- Seq(0, 1)) {
      val pos = rows.filter(r => r._1 == slice && r._3 == 1L).map(_._2)
      val neg = rows.filter(r => r._1 == slice && r._3 == 0L).map(_._2)
      val u2 = (for (p <- pos; n <- neg)
        yield if (p > n) 2L else if (p == n) 1L else 0L).sum
      assert(got(slice) === ((u2, pos.size.toLong, neg.size.toLong)),
        s"slice $slice")
    }
    val auc1 = Eval.aucOf(df).filter($"slice" === 1)
      .select("auc").as[Double].head()
    assert(auc1 === 1.0)
  }

  test("aucOf: all-one-class slice yields NULL auc, not a crash") {
    val df = Seq((0, 1L, 1L), (0, 2L, 1L)).toDF("slice", "score", "is_pos")
    val r = Eval.aucOf(df).collect()
    assert(r.length == 1 && r.head.isNullAt(r.head.fieldIndex("auc")))
    assert(r.head.getAs[Long]("n_neg") == 0L)
  }

  test("confusion cells and class metrics satisfy the counting identities") {
    val total = Tables.events(spark, sf).filter(col("value").isNotNull).count()
    val cells = Eval.confusionMatrix(spark, sf).collect()
    assert(cells.map(_.getAs[Long]("n")).sum == total)

    val m = Eval.classMetrics(spark, sf).collect()
    // Σ(tp+fn) = Σ(tp+fp) = total rows: every row has exactly one actual
    // and one predicted class.
    assert(m.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fn")).sum == total)
    assert(m.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fp")).sum == total)
    // Per class, tp+fn equals the actual-class count from the matrix.
    val actualCounts = cells.groupBy(_.getAs[String]("actual"))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    m.foreach { r =>
      val cls = r.getAs[String]("cls")
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") ==
        actualCounts.getOrElse(cls, 0L), cls)
    }
  }

  test("calibration bins cover every scored row with sane rates") {
    val total = Tables.events(spark, sf).filter(col("value").isNotNull).count()
    val bins = Eval.calibrationBins(spark, sf).collect()
    assert(bins.map(_.getAs[Long]("n")).sum == total)
    bins.foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(bin >= 0L && bin <= 9L)
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n"))
      val rate = r.getAs[Double]("pos_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("auc1 rank window is partitioned by slice — no SinglePartition exchange") {
    val p = Eval.rocAucSlices(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition"),
      "AUC must never plan a global single-task window:\n" + p)
    assert(p.contains("hashpartitioning(slice"), p)
  }

  test("pr1: curve points recompute from their own exact counters; zero-positive slice reads NULL recall") {
    val rows = Seq(
      // slice 0: bucket 3 has 2 pos + 1 neg, bucket 2 has 2 neg,
      // bucket 1 has 1 pos
      (0, 3L, 1L), (0, 3L, 1L), (0, 3L, 0L), (0, 2L, 0L), (0, 2L, 0L),
      (0, 1L, 1L),
      // slice 1: no positives at all
      (1, 5L, 0L), (1, 4L, 0L))
      .toDF("slice", "bucket", "is_pos")
    val got = Eval.prCurveOf(rows).collect()
      .map(r => (r.getAs[Int]("slice"), r.getAs[Long]("threshold")) -> r)
      .toMap
    val t3 = got((0, 3L))
    assert(t3.getAs[Long]("cum_pos") == 2L && t3.getAs[Long]("cum_n") == 3L &&
      t3.getAs[Double]("precision") == 2.0 / 3.0 &&
      t3.getAs[Double]("recall") == 2.0 / 3.0)
    val t2 = got((0, 2L))
    assert(t2.getAs[Long]("cum_pos") == 2L && t2.getAs[Long]("cum_n") == 5L &&
      t2.getAs[Double]("precision") == 0.4)
    val t1 = got((0, 1L))
    assert(t1.getAs[Long]("cum_pos") == 3L && t1.getAs[Long]("cum_n") == 6L &&
      t1.getAs[Double]("recall") == 1.0)
    val z = got((1, 5L))
    assert(z.getAs[Long]("total_pos") == 0L &&
      z.isNullAt(z.fieldIndex("recall")))
  }

  test("clf3: perfect agreement reads kappa 1, a planted 2×2 table matches the hand computation, degenerate slice is NULL") {
    val rows = Seq(
      // perfect agreement across two classes
      ("p", "crit", "crit"), ("p", "low", "low"), ("p", "low", "low"),
      // known table: actual crit {3 crit, 1 low}, actual low {2 low}
      ("m", "crit", "crit"), ("m", "crit", "crit"), ("m", "crit", "crit"),
      ("m", "crit", "low"), ("m", "low", "low"), ("m", "low", "low"),
      // single-cell slice: marginals degenerate → NULL kappas
      ("c", "high", "high"), ("c", "high", "high"))
      .toDF("slice", "actual", "predicted")
    val got = Eval.cohensKappaOfLabeled(rows).collect()
      .map(r => r.getAs[String]("slice") -> r).toMap
    assert(got("p").getAs[Double]("kappa") == 1.0 &&
      got("p").getAs[Double]("kappa_w") == 1.0)
    val m = got("m")
    // n=6, diag=5, row marg (4,2), col marg (3,3) → Σrow·col = 18
    assert(m.getAs[Long]("n_total") == 6L && m.getAs[Long]("diag") == 5L &&
      m.getAs[Long]("sum_marg") == 18L)
    // kappa = (6·5 − 18)/(36 − 18) = 12/18
    assert(m.getAs[Double]("kappa") == 12.0 / 18.0)
    // weights |3−0|: wdis_o = 3·1; wdis_e = 3·4·3 + 3·2·3 = 54
    assert(m.getAs[Long]("wdis_o") == 3L && m.getAs[Long]("wdis_e") == 54L)
    assert(m.getAs[Double]("kappa_w") == (54.0 - 6.0 * 3.0) / 54.0)
    val c = got("c")
    assert(c.isNullAt(c.fieldIndex("kappa")) &&
      c.isNullAt(c.fieldIndex("kappa_w")))
  }
}
