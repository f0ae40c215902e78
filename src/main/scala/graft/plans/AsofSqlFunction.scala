package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedFunction, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{CreateNamedStruct, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.util.IntervalUtils
import org.apache.spark.sql.types.{CalendarIntervalType, DayTimeIntervalType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

/** `spark.sql` surface for the native as-of join — a table-valued
  * function, so SQL users reach [[AsofJoin]] without the Scala DSL:
  *
  * {{{
  * SELECT * FROM asof_join(
  *   'trades', 'quotes',            -- table/view names (multipart ok)
  *   'l.symbol', 'r.symbol',        -- join key expressions (comma-sep)
  *   'l.trade_ts', 'r.quote_ts',    -- time expressions
  *   300000000,                     -- optional tolerance (physical units,
  *                                  --  or INTERVAL '5' MINUTE / '5 minutes')
  *   'inner')                       -- optional mode: 'left' | 'inner'
  * }}}
  *
  * The left relation is aliased `l` and the right `r`, so key/time
  * strings can qualify columns unambiguously; each string is parsed with
  * the Catalyst expression parser, so casts and computed keys work
  * (`'CAST(r.o_orderdate AS TIMESTAMP)'`). Registered imperatively via
  * `GraftFunctions.register` or declaratively through `GraftExtensions`
  * (`SparkSessionExtensions.injectTableFunction`). Spark's TVF argument
  * surface passes scalar expressions, hence table names as string
  * literals rather than TABLE(...) arguments (those are reserved for
  * Python UDTFs).
  */
object AsofSqlFunction {

  val name = "asof_join"

  private val usage =
    "asof_join(left_table, right_table, left_keys, right_keys, " +
      "left_time, right_time[, tolerance[, mode]])"

  private def str(e: Expression, what: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$name: $what must be a string literal, got $other — usage: $usage")
  }

  /** Tolerance argument: either a raw integral literal (the time
    * column's physical units — micros/days/raw, as before), or an
    * INTERVAL — `INTERVAL '5' MINUTE` or the string `'5 minutes'` —
    * normalized to micros here and converted to physical units at
    * strategy time, once the time column's type is resolved (the tables
    * are still unresolved names at this point). Returns
    * (value, isInterval). */
  private def tol(e: Expression): (Long, Boolean) = e match {
    case Literal(v: java.lang.Number, IntegerType | LongType) =>
      (v.longValue, false)
    case Literal(v, _: DayTimeIntervalType) if v != null =>
      (v.asInstanceOf[Long], true)
    case Literal(ci: CalendarInterval, CalendarIntervalType) =>
      (calendarMicros(ci), true)
    case Literal(s, StringType) if s != null =>
      val ci =
        try IntervalUtils.stringToInterval(s.asInstanceOf[UTF8String])
        catch {
          case ex: IllegalArgumentException => throw new IllegalArgumentException(
            s"$name: cannot parse tolerance '$s' as an interval " +
              s"(try e.g. '5 minutes'): ${ex.getMessage}")
        }
      (calendarMicros(ci), true)
    case other => throw new IllegalArgumentException(
      s"$name: tolerance must be an integral literal (time column's " +
        s"physical units), an INTERVAL literal, or an interval string " +
        s"like '5 minutes', got $other")
  }

  private def calendarMicros(ci: CalendarInterval): Long = {
    if (ci.months != 0) throw new IllegalArgumentException(
      s"$name: month/year intervals are not a fixed physical duration — " +
        s"use days/hours/minutes/seconds")
    ci.days * 86400000000L + ci.microseconds
  }

  /** Parse a comma-separated expression list with real top-level comma
    * handling: wrap in struct(...) and take the parsed values — commas
    * inside casts/calls stay inside their expression. The parser
    * special-cases struct(...) into CreateNamedStruct eagerly; keep the
    * UnresolvedFunction arm for robustness across versions. */
  private def exprList(s: String, what: String): Seq[Expression] =
    CatalystSqlParser.parseExpression(s"struct($s)") match {
      case ns: CreateNamedStruct => ns.valExprs
      case f: UnresolvedFunction => f.arguments
      case other => throw new IllegalArgumentException(
        s"$name: cannot parse $what '$s' ($other)")
    }

  private def relation(nameStr: String, alias: String): LogicalPlan =
    SubqueryAlias(alias,
      UnresolvedRelation(CatalystSqlParser.parseMultipartIdentifier(nameStr)))

  def build(args: Seq[Expression]): LogicalPlan = {
    if (args.length < 6 || args.length > 8)
      throw new IllegalArgumentException(
        s"$name: expected 6-8 arguments, got ${args.length} — usage: $usage")
    val left = relation(str(args(0), "left table"), "l")
    val right = relation(str(args(1), "right table"), "r")
    val leftKeys = exprList(str(args(2), "left keys"), "left keys")
    val rightKeys = exprList(str(args(3), "right keys"), "right keys")
    val leftTime = CatalystSqlParser.parseExpression(str(args(4), "left time"))
    val rightTime = CatalystSqlParser.parseExpression(str(args(5), "right time"))
    val (tolerance, tolIsInterval) =
      if (args.length > 6) { val (v, i) = tol(args(6)); (Some(v), i) }
      else (None, false)
    val inner = if (args.length > 7) {
      str(args(7), "mode").toLowerCase match {
        case "inner" => true
        case "left" | "outer" | "left_outer" => false
        case m => throw new IllegalArgumentException(
          s"$name: mode must be 'left' or 'inner', got '$m'")
      }
    } else false
    AsofJoin(left, right, leftKeys, rightKeys, leftTime, rightTime,
      tolerance, inner, tolIsInterval)
  }

  /** injectTableFunction-shaped description. */
  def description: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.plans.AsofSqlFunction", name),
      build)
}
