package graft.plans

import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, GreaterThanOrEqual,
  LessThanOrEqual, PredicateHelper, Unevaluable}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType}

/** SQL spelling of the as-of join (the third surface over
  * [[AsOfJoinPlan]], after the typed `AsOf.join` API and the window
  * formulation): a standard join whose ON clause carries an
  * `asof_tie(<tiebreak>)` conjunct is rewritten onto the custom operator:
  *
  * {{{
  *   SELECT ... FROM e [ASOF] JOIN o
  *     ON e.k = o.k AND e.t >= o.t AND asof_tie(o.c)
  * }}}
  *
  * The marker function is the signal (it names the tiebreak column, which
  * plain join syntax has no slot for); the `ASOF` keyword is accepted by
  * [[graft.functions.GraftSqlParser]] for readability and VALIDATED there
  * (an `ASOF JOIN` without the marker is a parse error, so the keyword can
  * never silently degrade to a plain join). The rule runs at resolution
  * (injected via `injectResolutionRule`, or applied explicitly on a live
  * session's analyzed plan) — before any optimizer predicate pushdown can
  * relocate the marker conjunct out of the join condition.
  */
object AsofSqlRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Injected (analysis-time) entry: resolveOperators* honors the
    * analyzer's re-entrancy/pruning contract. */
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp(rewritePf)

  /** Explicit entry for ALREADY-analyzed plans (live sessions without the
    * extensions): resolveOperators* prunes analyzed subtrees, so this form
    * must use a plain transformUp. */
  def rewriteAnalyzed(plan: LogicalPlan): LogicalPlan =
    plan.transformUp(rewritePf)

  private val rewritePf: PartialFunction[LogicalPlan, LogicalPlan] = {
    case j @ Join(l, r, jt @ (Inner | LeftOuter), Some(cond), _)
        if j.resolved && cond.exists(_.isInstanceOf[AsofTie]) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (ties, rest) = conjuncts.partition(_.isInstanceOf[AsofTie])
      def onLeft(e: Expression) = e.references.subsetOf(l.outputSet)
      def onRight(e: Expression) = e.references.subsetOf(r.outputSet)
      require(ties.size == 1,
        s"asof join: exactly one asof_tie(...) conjunct expected, got ${ties.size}")
      val tie = ties.head.asInstanceOf[AsofTie].child
      require(onRight(tie), "asof join: the asof_tie argument must come from the right side")
      val eq = rest.collectFirst {
        case EqualTo(a, b) if onLeft(a) && onRight(b) => (a, b)
        case EqualTo(a, b) if onRight(a) && onLeft(b) => (b, a)
      }.getOrElse(throw new IllegalArgumentException(
        "asof join: ON must contain one side-separable equality (the key)"))
      val temporal = rest.collectFirst {
        case GreaterThanOrEqual(a, b) if onLeft(a) && onRight(b) => (a, b)
        case LessThanOrEqual(a, b) if onRight(a) && onLeft(b)    => (b, a)
      }.getOrElse(throw new IllegalArgumentException(
        "asof join: ON must contain leftTime >= rightTime (the as-of inequality)"))
      require(rest.size == 2,
        "asof join: ON must be exactly key-equality AND time-inequality AND asof_tie(...)")
      AsOfJoinPlan(l, r, eq._1, eq._2, temporal._1, temporal._2, tie,
        isLeftOuter = jt == LeftOuter)
  }
}

/** Boolean marker conjunct carrying the as-of tiebreak column through the
  * ON clause. Never evaluated: [[AsofSqlRule]] consumes it at resolution;
  * if one survives to execution (e.g. written outside a join condition),
  * Unevaluable fails the query loudly instead of silently meaning `true`. */
case class AsofTie(child: Expression) extends Unevaluable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AsofTie = copy(child = newChildren.head)
}
