package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Size}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectSet, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/**
 * Optimizer rule: an aggregate that only needs the CARDINALITY of a
 * distinct set — `size(collect_set(x))` — is rewritten to
 * `count(distinct x)`.
 *
 * Why it matters: `collect_set` is a TypedImperativeAggregate, which forces
 * the whole aggregate into ObjectHashAggregate — per-group boxed Scala sets,
 * no whole-stage codegen, memory ∝ distinct values per group. `count
 * (distinct x)` plans as codegen'd HashAggregate over an Expand, with
 * partial aggregation and fixed-size per-group state. Same result by
 * definition: both ignore nulls, and only the set's size was observed.
 *
 * Scope guards:
 *   - each `Size(collect_set)` occurrence is rewritten independently — a
 *     sibling projection of the raw set keeps its own AggregateExpression
 *     instance and is untouched;
 *   - streaming aggregates are skipped: distinct aggregation is unsupported
 *     in Structured Streaming, where the set/HLL state IS the right plan;
 *   - the rewrite only fires when the RESULTING aggregate has exactly one
 *     distinct-children group and no FILTER clauses on the rewritten aggs.
 *     This matters because of WHERE the rule can run: registered through
 *     `experimental.extraOptimizations` it executes AFTER
 *     `RewriteDistinctAggregates`, and a single unexpanded distinct group
 *     is the one shape physical planning handles natively
 *     (`planAggregateWithOneDistinct`) — introducing a second group (or a
 *     filtered distinct) there would crash the planner;
 *   - the `Size` node is replaced by a cast to its own IntegerType, so the
 *     rewritten expression is type-identical.
 *
 * Registered via `spark.experimental.extraOptimizations`
 * ([[graft.GraftExtensions.register]]) — the ladder rung between custom
 * expressions and the CosineTopK Strategy: a logical-plan rewrite that
 * changes the PHYSICAL aggregation family without touching user code.
 */
object CollectSetSizeToCountDistinct extends Rule[LogicalPlan] {

  /** Matches a rewritable occurrence: Size over an unfiltered, non-distinct
   * collect_set aggregate. */
  private object RewritableSize {
    def unapply(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Option[(AggregateExpression, org.apache.spark.sql.catalyst.expressions.Expression)] =
      e match {
        case Size(ae @ AggregateExpression(CollectSet(child, _, _), _, false, None, _), _) =>
          Some((ae, child))
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case a: Aggregate if !a.isStreaming && safeToRewrite(a) =>
      a.transformExpressions {
        case RewritableSize(ae, child) =>
          Cast(
            AggregateExpression(Count(Seq(child)), ae.mode, isDistinct = true, ae.filter),
            IntegerType)
      }
  }

  /** The post-rewrite plan must have EXACTLY ONE distinct-children group:
   * the union of already-distinct aggregates' children sets and the
   * would-be-introduced `count(distinct child)` sets. */
  private def safeToRewrite(a: Aggregate): Boolean = {
    val aggs = a.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    val introduced = a.aggregateExpressions.flatMap(_.collect {
      case RewritableSize(_, child) => Set(child.canonicalized)
    })
    val existing = aggs.filter(_.isDistinct)
      .map(_.aggregateFunction.children.map(_.canonicalized).toSet)
    introduced.nonEmpty && (introduced ++ existing).distinct.size == 1
  }
}
