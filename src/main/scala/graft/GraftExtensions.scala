package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{DotProduct, SortedIntersectSize}

/** SparkSessionExtensions registration: makes the custom Catalyst
  * expressions callable from SQL (`dot_product`, `sorted_intersect_size`)
  * so the library's SQL surface matches its DataFrame surface.
  *
  * Usage:
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * or config: spark.sql.extensions=graft.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    e.injectOptimizerRule(_ => graft.expressions.SimplifySelfSetOps)
  }
}

object GraftExtensions {
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> (args => DotProduct(args(0), args(1))),
    "sorted_intersect_size" -> (args => SortedIntersectSize(args(0), args(1))))

  /** Register into an already-built session (temp functions + runtime
    * optimizer rules) — the runtime-path twin of the builder-time
    * extensions install. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    if (!spark.experimental.extraOptimizations
        .contains(graft.expressions.SimplifySelfSetOps)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.expressions.SimplifySelfSetOps
    }
  }
}
