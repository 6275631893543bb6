package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Exact per-group top-k as a custom TypedImperativeAggregate: each
  * partial buffer holds AT MOST k (value, id) pairs, merged map-side —
  * so a "top 5 per group" over 100 TB moves k rows per (group,
  * partition) through the shuffle instead of every row, which is the
  * difference between an aggregation and a full sort at scale. The
  * window-function formulation (`row_number() ≤ k` — the oracle)
  * shuffles and sorts the entire input; this is the aggregation-shaped
  * equivalent with identical output.
  *
  * Total order: value DESC, id ASC — deterministic across engines and
  * partitionings. Output: array<struct<v,id>> in rank order; null
  * inputs are skipped (SQL aggregate semantics). */
case class TopKPairs(
    valueExpr: Expression,
    keyExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Long)]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(valueExpr, keyExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (valueExpr.dataType == LongType && keyExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_pairs needs (bigint, bigint), got " +
        s"(${valueExpr.dataType}, ${keyExpr.dataType})")

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Long)] =
    mutable.ArrayBuffer.empty

  // (v desc, id asc) — "a outranks b"
  private def outranks(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(buf: mutable.ArrayBuffer[(Long, Long)]): mutable.ArrayBuffer[(Long, Long)] = {
    if (buf.length > k) {
      val sorted = buf.sortWith(outranks)
      buf.clear()
      buf ++= sorted.take(k)
    }
    buf
  }

  override def update(buf: mutable.ArrayBuffer[(Long, Long)],
      input: InternalRow): mutable.ArrayBuffer[(Long, Long)] = {
    val v = valueExpr.eval(input)
    val id = keyExpr.eval(input)
    if (v == null || id == null) buf
    else {
      buf += ((v.asInstanceOf[Long], id.asInstanceOf[Long]))
      // amortize: trim when the buffer doubles past k
      if (buf.length >= 2 * k) trim(buf) else buf
    }
  }

  override def merge(b1: mutable.ArrayBuffer[(Long, Long)],
      b2: mutable.ArrayBuffer[(Long, Long)]): mutable.ArrayBuffer[(Long, Long)] = {
    b1 ++= b2
    trim(b1)
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, Long)]): Any = {
    val top = buf.sortWith(outranks).take(k)
    new GenericArrayData(top.map { case (v, id) =>
      new GenericInternalRow(Array[Any](v, id))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.ArrayBuffer[(Long, Long)]): Array[Byte] = {
    trim(buf) // never ship more than k pairs through the shuffle
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (v, id) => out.writeLong(v); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(Long, Long)]
    var i = 0
    while (i < n) { buf += ((in.readLong(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(valueExpr = newChildren(0), keyExpr = newChildren(1))
}

object TopKPairs {
  def topK(value: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKPairs(Bridge.expression(value), Bridge.expression(id), k)
        .toAggregateExpression())
}
