package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, NamedExpression, Stack}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized-view rewrite for the warehouse balance aggregate — the one
  * custom `Rule[LogicalPlan]` the build plan named as genuinely motivated
  * (SURVEY §7 "custom Catalyst Rule/Strategy: … optional later for e.g.
  * rewriting balance queries to pre-aggregated table"; the rest of the
  * engine deliberately needs none).
  *
  * Why a Rule and not a code change: balance(tenant, name) = SUM over the
  * ±amount unpivot of every committed transfer EVER — at 100 TB the
  * upsert sink can maintain that aggregate incrementally at ingest (new
  * transfers only touch two rows each), and every query that still
  * SPELLS the full aggregate should transparently read the maintained
  * table instead of re-scanning the lake. That substitution is exactly
  * what an optimizer rule is for: callers keep the declarative form (and
  * correctness if the rule is absent), the rewrite swaps the plan.
  *
  * Matching is deliberately CONSERVATIVE — all three must hold or the
  * plan is left untouched:
  *   - an Aggregate grouping on exactly (tenant, name) attributes,
  *   - whose single aggregate function is SUM over an `amount` attribute,
  *   - whose subtree contains the balance-changes signature: a Generate
  *     whose generator is the `stack` unpivot reading `credit_name` (the
  *     [[graft.warehouse.Warehouse.balanceChanges]] shape).
  * The replacement substitutes the `Sum` node itself with the pre-agg
  * scan's balance column (stored at the Sum's OWN decimal type — exact,
  * no cast) and the grouping attributes with the scan's key columns,
  * re-aliasing top-level attributes onto the Aggregate's exprIds — so
  * whatever wrappers the optimizer collapsed into the aggregate list
  * (the gate's decimal→double output cast, CollapseProject is free to
  * merge it) re-apply unchanged above the substituted column, and parent
  * operators (ORDER BY, filters) are untouched.
  *
  * Activation: [[BalanceMvRewrite.withRewrite]] scopes the rule through
  * `spark.experimental.extraOptimizations` (the runtime hook — it runs in
  * the post-optimizer user batch, where the Aggregate/Generate shape has
  * settled). A cluster deployment would instead inject permanently via
  * `SparkSessionExtensions.injectOptimizerRule` next to GraftExtensions'
  * function registrations.
  */
case class BalanceMvRewrite(spark: SparkSession, mvPath: String)
    extends Rule[LogicalPlan] {

  private def isBalanceAggregate(agg: Aggregate): Boolean = {
    val groupNames = agg.groupingExpressions.collect { case a: Attribute => a.name }
    val aggFns = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae.aggregateFunction
    })
    groupNames == Seq("tenant", "name") &&
      agg.groupingExpressions.length == 2 &&
      aggFns.length == 1 && (aggFns.head match {
        case Sum(a: Attribute, _) => a.name == "amount"
        case _ => false
      })
  }

  private def readsBalanceChanges(plan: LogicalPlan): Boolean =
    plan.collectFirst {
      case g: Generate if g.generator.isInstanceOf[Stack] &&
          g.generator.references.exists(_.name == "credit_name") => g
    }.isDefined

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate
        if isBalanceAggregate(agg) && readsBalanceChanges(agg.child) =>
      val mv = spark.read.parquet(mvPath).queryExecution.analyzed
      val Seq(mvTenant, mvName, mvBal) = mv.output
      val keyMap = agg.groupingExpressions.collect { case a: Attribute => a }
        .map(_.exprId).zip(Seq(mvTenant, mvName)).toMap
      val projList = agg.aggregateExpressions.map { ne =>
        val sub = ne.transform {
          case ae: AggregateExpression =>
            require(mvBal.dataType == ae.dataType,
              s"balance MV stores ${mvBal.dataType}, the Sum is " +
                s"${ae.dataType} — a Cast would change summation semantics")
            mvBal
          case a: AttributeReference if keyMap.contains(a.exprId) =>
            keyMap(a.exprId)
        }
        sub match {
          // a bare grouping attribute became the MV's column: re-alias it
          // onto the original output exprId so parents keep resolving
          case a: Attribute if a.exprId != ne.exprId =>
            Alias(a, ne.name)(exprId = ne.exprId)
          case n: NamedExpression => n
          case other => Alias(other, ne.name)(exprId = ne.exprId)
        }
      }
      Project(projList, mv)
  }
}

object BalanceMvRewrite {

  /** Run `body` with the rewrite active, restoring the previous
    * experimental rule set after. Anything the caller wants optimized
    * UNDER the rule must be planned (executedPlan) or materialized
    * (localCheckpoint/collect) inside `body` — extraOptimizations is read
    * lazily at optimization time, not at DataFrame construction.
    */
  def withRewrite[T](s: SparkSession, mvPath: String)(body: => T): T = {
    val prev = s.experimental.extraOptimizations
    s.experimental.extraOptimizations = prev :+ BalanceMvRewrite(s, mvPath)
    try body finally s.experimental.extraOptimizations = prev
  }
}
