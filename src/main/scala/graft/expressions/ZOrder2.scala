package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

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
  * who need ordered negatives should bias to non-negative first).
  *
  * Accepts INT or BIGINT inputs (narrower integrals coerce to int via
  * the usual implicit cast). A BIGINT key interleaves by its LOW 32
  * bits — ids within one 2^32 range cluster exactly as ints do, while
  * ids that differ only above bit 31 share a z-key (they wrap onto the
  * same curve position). For typical dense surrogate ids that bias is
  * nil; callers with >2^32 key ranges should pre-fold the high bits
  * (e.g. `hash`) or bucket first. */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Bridge.intOrLongPair

  override def dataType: DataType = LongType

  // truncation to the low 32 bits for BIGINT inputs — see class doc
  private def asInt(v: Any): Int = v match {
    case i: java.lang.Integer => i.intValue
    case l: java.lang.Long => l.intValue
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    ZOrder2.interleave(asInt(l), asInt(r))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.expressions.ZOrder2.interleave((int)$l, (int)$r);")

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
