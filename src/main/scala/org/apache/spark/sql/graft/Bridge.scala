package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4's Column wraps a ColumnNode (the
  * Connect-compatible representation), so lifting a custom Catalyst
  * Expression into a Column goes through the classic-session
  * ExpressionUtils, which is private[sql] — hence this one-file shim in
  * the org.apache.spark.sql namespace. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `TypeCollection`/`AbstractDataType` are private[sql]; a custom
    * binary expression that accepts INT-or-BIGINT on both sides (e.g.
    * zorder2) can return this from `inputTypes` (with an inferred
    * override type, since the element type isn't nameable outside). */
  def intOrLongPair: Seq[org.apache.spark.sql.types.AbstractDataType] = {
    val t = org.apache.spark.sql.types.TypeCollection(
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType)
    Seq(t, t)
  }
}
