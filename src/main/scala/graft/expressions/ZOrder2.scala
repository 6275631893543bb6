package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton / Z-order interleave of two 32-bit dimensions into one
  * 64-bit sort key. Sorting or range-partitioning a table by
  * `zorder2(x, y)` clusters rows so that ANY 2-D box maps to a small
  * number of contiguous z-ranges — which is what makes per-file /
  * per-row-group min-max statistics selective for BOTH dimensions at
  * once (the multi-dimensional generalization of sorting by a single
  * column; the layout trick behind warehouse Z-ORDER BY clustering).
  * A single-column sort gives tight stats only for that column; the
  * z-curve trades a little per-dimension tightness for two pruned
  * dimensions.
  *
  * Bit-exact and engine-independent: pure integer bit surgery, no
  * floats anywhere. Inputs are treated as UNSIGNED 32-bit patterns
  * (negative ints interleave by their two's-complement bits — callers
  * who need ordered negatives should bias to non-negative first). */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"zorder2 needs (int, int), got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    ZOrder2.interleave(l.asInstanceOf[Int], r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.expressions.ZOrder2.interleave($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Spread the lower 32 bits of v into the even bit positions of a
    * long (the standard mask-shift bit dilation, O(log w) steps). */
  def spread(v: Int): Long = {
    var x = v.toLong & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** x's bits at even positions, y's at odd. */
  def interleave(x: Int, y: Int): Long = spread(x) | (spread(y) << 1)

  def zorder2(x: Column, y: Column): Column =
    Bridge.column(ZOrder2(Bridge.expression(x), Bridge.expression(y)))
}
