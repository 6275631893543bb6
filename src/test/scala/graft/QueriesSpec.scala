package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs at sf0.001, returns rows, has unique column
  * names (the driver compare sorts columns by name), and has an oracle. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs, returns rows, unique columns") {
      val df = fn(spark, sf)
      val cols = df.columns.toSeq
      assert(cols.distinct.size == cols.size, s"dup columns in $name: $cols")
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("every query has an oracle or is documented as rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("every oracle names a registered query (no orphaned oracle entries)") {
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without a query: $orphaned")
  }
}
