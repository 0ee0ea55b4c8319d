package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Attribute, AttributeReference, Cast, EqualTo, Expression,
  GreaterThan, GreaterThanOrEqual, IntegerLiteral, IsNotNull, LessThan,
  LessThanOrEqual, PredicateHelper, RowFrame, RowNumber, SortOrder,
  SpecifiedWindowFrame, UnboundedPreceding, CurrentRow, WindowExpression,
  WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: the classic top-k-per-group window spelling
  *
  *   SELECT ... , row_number() OVER (PARTITION BY g ORDER BY o) AS rn ...
  *   WHERE rn <= k
  *
  * becomes the heap-based [[TopKPerGroupPlan]] — shuffling k rows per
  * (partition, group) instead of every row, and never sorting whole groups.
  * Users (and existing queries — `q_stateful_dedup`'s keep-first-per-key is
  * the k=1 case) get the custom physical operator without knowing it
  * exists: the optimizer owns the operator choice, the query stays the
  * standard SQL spelling.
  *
  * Fires only on the exact safe shape: a Window whose ONLY window expression
  * is a bare `row_number()` (not rank/dense_rank — their tie semantics need
  * the sort), with a non-empty PARTITION BY and ORDER BY, under a Filter
  * whose rank predicates are upper bounds (`rn <= k`, `rn < k`, `rn = 1`).
  * Non-rank conjuncts stay behind as a residual Filter. Ties beyond the
  * ordering are resolved arbitrarily — exactly as nondeterministic as
  * `row_number` itself; give the window a total order (unique tiebreaker)
  * for determinism, as you already must.
  *
  * `spark.graft.windowTopK.enabled=false` disables the rewrite (used by
  * specs that need a genuine Window as the reference plan). Registered via
  * [[graft.GraftExtensions]] / [[GraftSession]].
  */
object WindowTopKToHeap extends Rule[LogicalPlan] with PredicateHelper {

  /** Register on a live session (idempotent). Cluster deploys get the rule
    * from `spark.sql.extensions=graft.GraftExtensions` instead. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_ eq this))
      spark.experimental.extraOptimizations = cur :+ this
  }

  /** The row_number frame is always (ROWS UNBOUNDED PRECEDING, CURRENT ROW). */
  private def isRowNumber(e: Expression): Boolean = e match {
    case WindowExpression(RowNumber(),
        WindowSpecDefinition(_, _,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))) => true
    case _ => false
  }

  /** An upper bound k implied by one predicate on the rank attribute.
    * `IsNotNull(rn)` (inferred by the optimizer; row_number is never null)
    * is a vacuous bound — Int.MaxValue, discarded by the finite-bound
    * requirement unless a real limit accompanies it. */
  private def limitOf(e: Expression, rn: Attribute): Option[Int] = e match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(IntegerLiteral(1), a: Attribute) if a.semanticEquals(rn) => Some(1)
    case IsNotNull(a: Attribute) if a.semanticEquals(rn) => Some(Int.MaxValue)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString("spark.graft.windowTopK.enabled", "true") != "true") return plan
    plan.transform {
      case Filter(cond,
          w @ Window(Seq(alias @ Alias(we, _)), partSpec, orderSpec, child, _))
          if w.resolved && isRowNumber(we) &&
            partSpec.nonEmpty && orderSpec.nonEmpty =>
        val rnAttr = alias.toAttribute
        val predicates = splitConjunctivePredicates(cond)
        val (rankPreds, residual) = predicates.partition(_.references.contains(rnAttr))
        val limits = rankPreds.map(limitOf(_, rnAttr))
        val k = limits.flatten.reduceOption(math.min).getOrElse(Int.MaxValue)
        if (limits.exists(_.isEmpty) || k <= 0 || k == Int.MaxValue) {
          // not a pure finite upper bound (e.g. rn >= 2 pagination, or only
          // an inferred isnotnull) — keep the Window
          Filter(cond, w)
        } else {
          // Spark's own InferWindowGroupLimit may have inserted a partial
          // WindowGroupLimit below the Window; the heap operator subsumes
          // that pre-filtering, so plan over its child
          val base = child match {
            case wgl: WindowGroupLimit => wgl.child
            case c => c
          }
          val rankLong = AttributeReference(alias.name, LongType, nullable = false)()
          val topk = TopKPerGroupPlan(partSpec, orderSpec, k, rankLong, base)
          // row_number() is INT; preserve the original schema and exprId so
          // everything above the Filter resolves unchanged
          val rnOut = Alias(Cast(rankLong, IntegerType), alias.name)(exprId = alias.exprId)
          val projected = Project(base.output :+ rnOut, topk)
          if (residual.isEmpty) projected
          else Filter(residual.reduce(And), projected)
        }
    }
  }
}
