package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (SURVEY §2 T12 / §4.3): custom Catalyst functions
  * injected via `SparkSessionExtensions`.
  *
  * Production path: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `.withExtensions` on the builder). For sessions created before the
  * conf could be applied, `GraftFunctions.register(spark)` installs the same
  * builders into the live registry — the query layer calls it defensively so
  * `vec_dot` is always resolvable.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.vecDotDescriptor)
    ext.injectFunction(GraftFunctions.maskAndCountDescriptor)
    ext.injectFunction(GraftFunctions.charNgramsDescriptor)
    ext.injectFunction(GraftFunctions.asofTieDescriptor)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinBandRule)
    // SQL ASOF JOIN: keyword accepted by the parser, marked join rewritten
    // onto AsOfJoinPlan at resolution (before any predicate pushdown).
    ext.injectResolutionRule(_ => graft.plans.AsofSqlRule)
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
  }
}

object GraftFunctions {
  private def builder(children: Seq[Expression]): Expression = {
    require(children.size == 2, s"vec_dot expects 2 arguments, got ${children.size}")
    VecDot(children.head, children(1))
  }

  private def macBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 2, s"mask_and_count expects 2 arguments, got ${children.size}")
    MaskAndCount(children.head, children(1))
  }

  private def ngramsBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 2, s"char_ngrams expects 2 arguments, got ${children.size}")
    CharNgrams(children.head, children(1))
  }

  private def asofTieBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 1, s"asof_tie expects 1 argument, got ${children.size}")
    graft.plans.AsofTie(children.head)
  }

  val vecDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    builder _)

  val maskAndCountDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("mask_and_count"),
    new ExpressionInfo(classOf[MaskAndCount].getName, "mask_and_count"),
    macBuilder _)

  val charNgramsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("char_ngrams"),
    new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
    ngramsBuilder _)

  val asofTieDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("asof_tie"),
    new ExpressionInfo(classOf[graft.plans.AsofTie].getName, "asof_tie"),
    asofTieBuilder _)

  /** Idempotent registration into an already-running session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("vec_dot", builder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("mask_and_count", macBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("char_ngrams", ngramsBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("asof_tie", asofTieBuilder, "built-in")
  }
}
