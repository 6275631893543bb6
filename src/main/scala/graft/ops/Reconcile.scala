package graft.ops

import org.apache.spark.sql.Dataset

/** Two-sided per-key reconciliation via typed `cogroup` — the
  * KeyValueGroupedDataset API family (groupByKey / cogroup) that
  * complements the DataFrame surface: both sides shuffle ONCE onto the
  * same key partitioning, then each key's two iterators meet in a
  * single function call with no join-row multiplication — the shape
  * for ledger-vs-ledger audits, source-vs-sink row accounting, and any
  * per-key logic that needs BOTH full groups at once (where a join
  * would explode |L|×|R| rows per key and an aggregation would lose
  * the pairing).
  *
  * Scale posture: one co-partitioned shuffle per side; per-key work is
  * streamed from the two iterators (no per-key materialization beyond
  * the running sums), so a hot key costs one task its group sizes, not
  * their product.
  */
object Reconcile {

  final case class KeyDiff(key: Long, n_left: Long, n_right: Long,
      sum_left: Long, sum_right: Long, delta: Long)

  /** Per-key counts, sums, and sum delta across two (key, value)
    * sides; emits a row for every key present on EITHER side. */
  def keyedDiff(left: Dataset[(Long, Long)],
      right: Dataset[(Long, Long)]): Dataset[KeyDiff] = {
    import left.sparkSession.implicits._
    left.groupByKey(_._1).cogroup(right.groupByKey(_._1)) { (k, ls, rs) =>
      var nl = 0L; var sl = 0L
      ls.foreach { x => nl += 1; sl += x._2 }
      var nr = 0L; var sr = 0L
      rs.foreach { x => nr += 1; sr += x._2 }
      Iterator.single(KeyDiff(k, nl, nr, sl, sr, sl - sr))
    }
  }
}
