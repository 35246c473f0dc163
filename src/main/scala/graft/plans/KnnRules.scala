package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for the custom operator (the Rule[LogicalPlan] leg of the
  * extension surface): predicate pushdown through [[KnnJoin]].
  *
  * Catalyst's own PushDownPredicates cannot see through an opaque custom
  * node, so `knn.filter($"q_id" < 20)` would score every query vector and
  * discard most of the work. Filtering the QUERY side first is semantically
  * identical — each query's neighbor list is independent — and turns into a
  * parquet-scan-level filter on the queries subtree. Conjuncts that touch
  * more than q_id (rank, nb_id, cos) stay above the node.
  */
object KnnFilterPushdown extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, kj: KnnJoin) =>
      val qIdAttr = kj.output.head // q_id
      val queryIdAttr = kj.queries.output.head // queries-side id column
      // deterministic-only, like Catalyst's own pushdown rules: a rand()-
      // dependent conjunct must evaluate once per OUTPUT row, not once per
      // query row.
      val (pushable, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic &&
          p.references.subsetOf(AttributeSet(qIdAttr)))
      if (pushable.isEmpty) f
      else {
        val rewritten = pushable.map(_.transform {
          case a: Attribute if a.exprId == qIdAttr.exprId => queryIdAttr
        })
        val newNode = kj.copy(queries = Filter(rewritten.reduce(And), kj.queries))
        rest.reduceOption(And).map(Filter(_, newNode)).getOrElse(newNode)
      }
  }
}
