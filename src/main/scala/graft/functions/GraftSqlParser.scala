package graft.functions

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Injected parser accepting the `ASOF JOIN` keyword (DuckDB's spelling):
  * the keyword lowers to a plain `JOIN` for the delegate parser, and each
  * lowered join is REQUIRED to carry an `asof_tie(...)` marker conjunct in
  * its ON clause — the marker names the tiebreak column (plain join
  * grammar has no slot for it) and is what [[graft.plans.AsofSqlRule]]
  * rewrites on. The validation means an `ASOF JOIN` can never silently
  * parse into an ordinary join.
  *
  * The lowering is lexer-aware, not a raw regex over the text: a scanner
  * masks string literals (`'…'` with `''` and `\'` escapes, `"…"`),
  * backquoted identifiers, `--` line comments, and nested bracketed
  * comments, so `WHERE note = 'asof join pending'` is neither rewritten
  * nor counted. Per-join validation scans each lowered join's ON region
  * (from the keyword to the next same-depth clause boundary) for its own
  * marker, so a marker in a DIFFERENT join's ON clause cannot satisfy an
  * `ASOF` join elsewhere in the statement.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  // `ASOF JOIN` / `ASOF LEFT [OUTER] JOIN` — the ASOF token drops, the
  // join flavor stays ($1), and AsofSqlRule maps Inner→inner as-of,
  // LeftOuter→null-extending as-of.
  private val asofJoin = "(?i)\\basof\\s+((?:left\\s+)?(?:outer\\s+)?join)\\b".r

  /** Per-character mask: true = inside a string literal, quoted
    * identifier, or comment — a region the lowering must never touch.
    * Matches Spark's lexer: `'…'`/`"…"` strings with doubled-quote and
    * backslash escapes, backquoted identifiers with doubled backquotes,
    * `--` line comments, and bracketed comments (nested, as Spark allows). */
  private def protectedMask(sql: String): Array[Boolean] = {
    val mask = new Array[Boolean](sql.length)
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"') {
        val q = c
        mask(i) = true; i += 1
        var closed = false
        while (i < sql.length && !closed) {
          mask(i) = true
          if (sql.charAt(i) == '\\' && i + 1 < sql.length) { mask(i + 1) = true; i += 2 }
          else if (sql.charAt(i) == q) {
            if (i + 1 < sql.length && sql.charAt(i + 1) == q) { mask(i + 1) = true; i += 2 }
            else { closed = true; i += 1 }
          } else i += 1
        }
      } else if (c == '`') {
        mask(i) = true; i += 1
        var closed = false
        while (i < sql.length && !closed) {
          mask(i) = true
          if (sql.charAt(i) == '`') {
            if (i + 1 < sql.length && sql.charAt(i + 1) == '`') { mask(i + 1) = true; i += 2 }
            else { closed = true; i += 1 }
          } else i += 1
        }
      } else if (c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') {
        while (i < sql.length && sql.charAt(i) != '\n') { mask(i) = true; i += 1 }
      } else if (c == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*') {
        var depth = 0
        do {
          if (i + 1 < sql.length && sql.charAt(i) == '/' && sql.charAt(i + 1) == '*') {
            depth += 1; mask(i) = true; mask(i + 1) = true; i += 2
          } else if (i + 1 < sql.length && sql.charAt(i) == '*' && sql.charAt(i + 1) == '/') {
            depth -= 1; mask(i) = true; mask(i + 1) = true; i += 2
          } else { mask(i) = true; i += 1 }
        } while (depth > 0 && i < sql.length)
      } else i += 1
    }
    mask
  }

  /** Keywords that end an ON clause at its own nesting depth. */
  private val onTerminators = Set(
    "join", "inner", "left", "right", "full", "cross", "semi", "anti",
    "natural", "asof", "where", "group", "order", "having", "limit",
    "window", "union", "except", "intersect", "minus", "qualify",
    "distribute", "cluster", "sort", "lateral")

  /** Checks that the join starting at `from` (just past the lowered ASOF
    * match) carries an `asof_tie` marker in ITS ON region: the scan runs
    * to the next same-depth clause boundary — a terminator keyword, a
    * top-level comma, a close-paren below the starting depth, or EOS —
    * ignoring masked regions; nested subqueries (depth > 0) pass through
    * whole, so a parenthesized subquery inside the ON clause does not end
    * the region early, and markers sitting in OTHER joins' ON clauses
    * (always past a same-depth boundary) can never satisfy this one. */
  private def onRegionHasTie(sql: String, mask: Array[Boolean], from: Int): Boolean = {
    var i = from
    var depth = 0
    val sb = new StringBuilder
    var done = false
    while (i < sql.length && !done) {
      if (mask(i)) i += 1
      else {
        val c = sql.charAt(i)
        if (c == '(') { depth += 1; sb.append(c); i += 1 }
        else if (c == ')') {
          if (depth == 0) done = true else { depth -= 1; sb.append(c); i += 1 }
        } else if (c == ',' && depth == 0) done = true
        else if (Character.isLetter(c) && depth == 0) {
          val start = i
          while (i < sql.length && !mask(i) &&
            (Character.isLetterOrDigit(sql.charAt(i)) || sql.charAt(i) == '_')) i += 1
          val word = sql.substring(start, i).toLowerCase(java.util.Locale.ROOT)
          if (onTerminators.contains(word)) done = true else sb.append(word).append(' ')
        } else { sb.append(Character.toLowerCase(c)); i += 1 }
      }
    }
    sb.toString.contains("asof_tie")
  }

  /** Lowers every unmasked `ASOF … JOIN` to its plain-join spelling after
    * validating each one's ON region, then parses via `parse` (the
    * delegate method matching the caller's grammar entry point — plan vs
    * query). As a second line of defense the parsed plan must carry at
    * least as many `asof_tie` markers as joins were lowered. */
  private def lowerAndParse(sqlText: String,
      parse: String => LogicalPlan): LogicalPlan = {
    val mask = protectedMask(sqlText)
    val ms = asofJoin.findAllMatchIn(sqlText).filterNot(m => mask(m.start)).toList
    if (ms.isEmpty) parse(sqlText)
    else {
      for (m <- ms if !onRegionHasTie(sqlText, mask, m.end))
        throw parseError(sqlText,
          "ASOF JOIN requires an asof_tie(<tiebreak>) conjunct in its own ON clause")
      val sb = new StringBuilder
      var pos = 0
      for (m <- ms) {
        sb.append(sqlText.substring(pos, m.start)).append(m.group(1))
        pos = m.end
      }
      sb.append(sqlText.substring(pos))
      val plan = parse(sb.toString)
      val markers = plan.collect { case p =>
        p.expressions.map(countTies).sum
      }.sum
      if (markers < ms.size)
        throw parseError(sqlText,
          "ASOF JOIN requires an asof_tie(<tiebreak>) conjunct in its ON clause")
      plan
    }
  }

  private def parseError(sqlText: String, msg: String) =
    new org.apache.spark.sql.catalyst.parser.ParseException(
      Option(sqlText),
      org.apache.spark.sql.catalyst.trees.Origin(),
      "PARSE_SYNTAX_ERROR",
      Map("error" -> msg, "hint" -> ""))

  override def parsePlan(sqlText: String): LogicalPlan =
    lowerAndParse(sqlText, delegate.parsePlan)

  override def parseQuery(sqlText: String): LogicalPlan =
    lowerAndParse(sqlText, delegate.parseQuery)

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
}
