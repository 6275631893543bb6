package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SIMPLE (per-codepoint, 1:1) Unicode case folding. `lower()` in the
  * JVM (`String.toLowerCase`) applies FULL case mappings — Turkish
  * dotted capital I (U+0130) becomes the TWO codepoints "i" + combining
  * dot above — while engines built on utf8proc (DuckDB among them)
  * apply the simple 1:1 mapping (U+0130 → "i"), so a lower()-based
  * normalization chain silently diverges cross-engine on Turkic text.
  * This expression folds codepoint-by-codepoint via
  * `Character.toLowerCase(int)` — the JDK's SIMPLE mapping — restoring
  * engine-for-engine parity; length in codepoints is preserved by
  * construction. Codegen-inlined like every graft expression; the
  * String round-trip is the JDK API's floor.
  */
case class SimpleCaseFold(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simple_casefold needs a string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      SimpleCaseFold.fold(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.expressions.SimpleCaseFold.fold($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): SimpleCaseFold =
    copy(child = newChild)
}

object SimpleCaseFold {
  /** Codepoint-wise simple lowercase; surrogate-pair safe. */
  def fold(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    sb.toString
  }

  def casefold(c: Column): Column =
    Bridge.column(SimpleCaseFold(Bridge.expression(c)))
}
