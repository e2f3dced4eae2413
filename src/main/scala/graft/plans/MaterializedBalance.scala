package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
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
  * Matching is SOUND, not just conservative — the rewrite fires only when
  * the aggregate provably computes what the MV stores, and silently skips
  * otherwise (a skipped rewrite costs a lake scan; a wrong one corrupts
  * answers):
  *   - an Aggregate grouping on exactly (tenant, name) attributes whose
  *     single aggregate is a plain SUM over `amount` — no DISTINCT, no
  *     FILTER clause (those live on the AggregateExpression wrapper and
  *     change semantics);
  *   - only pure attribute pass-through Project nodes between the
  *     Aggregate and the `stack` unpivot Generate — an intervening Filter
  *     (balanceOf's per-account slice) or Join (balancesFor's page
  *     restriction) means the query aggregates a SUBSET, and a COMPUTING
  *     or renaming Project (`-amount AS amount`, swapped tenant/name
  *     aliases) means it aggregates a different expression; both block
  *     the rewrite;
  *   - the plan BELOW the Generate is `sameResult` with the registered
  *     source subtree captured when the rule was built — a date-sliced or
  *     re-sourced lake is a different aggregate, caught by Catalyst's own
  *     semantic comparison (the cache-lookup machinery), not by fragile
  *     structural guesses.
  * The replacement substitutes the `Sum` node itself with the pre-agg
  * scan's balance column (stored at the Sum's OWN decimal type — a type
  * drift skips the rewrite rather than inserting a semantics-changing
  * Cast) and the grouping attributes with the scan's key columns,
  * re-aliasing top-level attributes onto the Aggregate's exprIds — so
  * whatever wrappers the optimizer collapsed into the aggregate list
  * (the gate's decimal→double output cast, CollapseProject is free to
  * merge it) re-apply unchanged above the substituted column, and parent
  * operators (ORDER BY, filters) are untouched. The MV relation is read
  * once per rule instance; each match emits a fresh-exprId copy
  * (`newInstance`), never repeated driver-side file listings on the
  * query-planning path.
  *
  * Activation: [[BalanceMvRewrite.withRewrite]] scopes the rule through
  * `spark.experimental.extraOptimizations` (the runtime hook — it runs in
  * the post-optimizer user batch, where the Aggregate/Generate shape has
  * settled). A cluster deployment would instead inject permanently via
  * `SparkSessionExtensions.injectOptimizerRule` next to GraftExtensions'
  * function registrations.
  */
case class BalanceMvRewrite(spark: SparkSession, mvPath: String,
                            expectedBelowGenerate: LogicalPlan)
    extends Rule[LogicalPlan] {

  // read once per rule instance; newInstance() per match keeps exprIds
  // fresh without re-listing the MV directory during planning
  @transient private lazy val mvRelation: LogicalPlan =
    spark.read.parquet(mvPath).queryExecution.analyzed

  private def freshMv(): LogicalPlan = mvRelation match {
    case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
    case other => other
  }

  private def balanceSum(agg: Aggregate): Option[AggregateExpression] = {
    val groupNames = agg.groupingExpressions.collect { case a: Attribute => a.name }
    val aggExprs = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    if (groupNames == Seq("tenant", "name") &&
      agg.groupingExpressions.length == 2 &&
      aggExprs.length == 1) {
      val ae = aggExprs.head
      val plainSumOfAmount = !ae.isDistinct && ae.filter.isEmpty &&
        (ae.aggregateFunction match {
          case Sum(a: Attribute, _) => a.name == "amount"
          case _ => false
        })
      if (plainSumOfAmount) Some(ae) else None
    } else None
  }

  /** A Project that only forwards attributes (bare Attribute, or an Alias
    * of an Attribute that keeps its name). A COMPUTING Project — e.g.
    * `-amount AS amount`, or a rename swapping tenant/name — would satisfy
    * the name-only Sum check while changing the aggregate's meaning, so
    * any such node must block the rewrite. */
  private def passThroughProject(p: Project): Boolean =
    p.projectList.forall {
      case _: Attribute => true
      case Alias(a: Attribute, name) => a.name == name
      case _ => false
    }

  /** The unpivot Generate reached through pass-through PROJECTS ONLY — an
    * intervening Filter/Join means the aggregate runs on a subset of the
    * lake; a computing/renaming Project means it aggregates a different
    * expression (both unanswerable from the full-lake MV). */
  private def generateBelowProjects(plan: LogicalPlan): Option[Generate] =
    plan match {
      case g: Generate => Some(g)
      case p: Project if passThroughProject(p) => generateBelowProjects(p.child)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate =>
      val rewrite = for {
        ae <- balanceSum(agg)
        g <- generateBelowProjects(agg.child)
        if g.generator.isInstanceOf[Stack] &&
          g.generator.references.exists(_.name == "credit_name") &&
          g.child.sameResult(expectedBelowGenerate)
        mv = freshMv()
        if mv.output.length == 3 &&
          mv.output(2).dataType == ae.dataType // type drift ⇒ skip, no Cast
      } yield {
        val Seq(mvTenant, mvName, mvBal) = mv.output
        val keyMap = agg.groupingExpressions.collect { case a: Attribute => a }
          .map(_.exprId).zip(Seq(mvTenant, mvName)).toMap
        val projList = agg.aggregateExpressions.map { ne =>
          val sub = ne.transform {
            case inner: AggregateExpression => mvBal
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
        Project(projList, mv): LogicalPlan
      }
      rewrite.getOrElse(agg)
  }
}

object BalanceMvRewrite {

  /** Build a rule bound to a registered source: `canonical` is the
    * declarative balance query over the SAME lake the MV was derived
    * from; its below-Generate subtree becomes the semantic fingerprint
    * every candidate must `sameResult`-match. */
  def forSource(s: SparkSession, mvPath: String,
                canonical: DataFrame): BalanceMvRewrite = {
    val below = canonical.queryExecution.optimizedPlan.collectFirst {
      case g: Generate if g.generator.isInstanceOf[Stack] => g.child
    }.getOrElse(throw new IllegalArgumentException(
      "canonical balance plan carries no stack unpivot"))
    BalanceMvRewrite(s, mvPath, below)
  }

  /** Run `body` with the rewrite active, restoring the previous
    * experimental rule set after. Anything the caller wants optimized
    * UNDER the rule must be planned (executedPlan) or materialized
    * (localCheckpoint/collect) inside `body` — extraOptimizations is read
    * lazily at optimization time, not at DataFrame construction.
    */
  def withRewrite[T](s: SparkSession, mvPath: String, canonical: DataFrame)
                    (body: => T): T = {
    val prev = s.experimental.extraOptimizations
    s.experimental.extraOptimizations =
      prev :+ forSource(s, mvPath, canonical)
    try body finally s.experimental.extraOptimizations = prev
  }
}
