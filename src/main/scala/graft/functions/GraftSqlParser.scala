package graft.functions

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.errors.QueryParsingErrors
import org.apache.spark.sql.types.{DataType, StructType}

/** Injected parser accepting the `ASOF JOIN` keyword (DuckDB's spelling):
  * the keyword lowers to a plain `JOIN` for the delegate parser, and the
  * statement is then REQUIRED to carry at least as many `asof_tie(...)`
  * marker conjuncts as it had `ASOF JOIN`s — the marker names the
  * tiebreak column (plain join grammar has no slot for it) and is what
  * [[graft.plans.AsofSqlRule]] rewrites on. The validation means an
  * `ASOF JOIN` can never silently parse into an ordinary join.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  // `ASOF JOIN` / `ASOF LEFT [OUTER] JOIN` — the ASOF token drops, the
  // join flavor stays ($1), and AsofSqlRule maps Inner→inner as-of,
  // LeftOuter→null-extending as-of.
  private val asofJoin = "(?i)\\basof\\s+((?:left\\s+)?(?:outer\\s+)?join)\\b".r

  override def parsePlan(sqlText: String): LogicalPlan = {
    val n = asofJoin.findAllIn(sqlText).size
    if (n == 0) delegate.parsePlan(sqlText)
    else {
      val plan = delegate.parsePlan(asofJoin.replaceAllIn(sqlText, "$1"))
      val markers = plan.collect { case p =>
        p.expressions.map(countTies).sum
      }.sum
      if (markers < n) {
        throw new org.apache.spark.sql.catalyst.parser.ParseException(
          Option(sqlText),
          org.apache.spark.sql.catalyst.trees.Origin(),
          "PARSE_SYNTAX_ERROR",
          Map("error" -> "ASOF JOIN requires an asof_tie(<tiebreak>) conjunct in its ON clause",
            "hint" -> ""))
      }
      plan
    }
  }

  private def countTies(e: Expression): Int =
    e.collect {
      case f: UnresolvedFunction
          if f.nameParts.map(_.toLowerCase) == Seq("asof_tie") => 1
    }.sum

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = {
    val n = asofJoin.findAllIn(sqlText).size
    if (n == 0) delegate.parseQuery(sqlText)
    else parsePlan(sqlText)
  }
}
