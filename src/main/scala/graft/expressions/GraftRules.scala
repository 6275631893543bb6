package graft.expressions

import org.apache.spark.sql.catalyst.expressions.Size
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rules for the custom expressions, injected via
  * graft.GraftExtensions.
  *
  * SimplifySelfSetOps: a self-intersection is the set itself —
  * `sorted_intersect_size(x, x)` → `size(x)` and
  * `dot_product(x, x)` is left alone (it is the norm² idiom) — so
  * composed pipelines that degenerate to self-comparisons (e.g. a dedup
  * verify stage fed identical candidate sides) skip the merge loop
  * entirely. Semantic caveat: on arrays that honor the operator's
  * sorted-distinct input contract the rewrite is exact.
  */
object SimplifySelfSetOps extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // legacySizeOfNull=false regardless of session conf: the original
      // expression is NULL on NULL input, and legacy Size would emit -1
      case SortedIntersectSize(a, b) if a.semanticEquals(b) &&
          a.deterministic => Size(a, legacySizeOfNull = false)
    }
}
