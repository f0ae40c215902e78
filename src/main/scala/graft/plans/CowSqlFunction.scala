package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** `spark.sql` surface for the copy-on-write lakehouse table — a
  * table-valued function, so SQL users read manifest-pinned snapshots
  * (deletion vectors applied, schema pinned) without the Scala DSL:
  *
  * {{{
  * SELECT * FROM cow_read('/data/events_table')            -- latest
  * SELECT * FROM cow_read('/data/events_table', 3)         -- time travel
  * SELECT * FROM cow_read('/t') WHERE o_custkey BETWEEN 5 AND 9
  * }}}
  *
  * The returned plan is the same snapshot read the Scala API builds —
  * which also means the scan is REGISTERED with [[CowSkipCatalog]], so
  * with [[CowSkipApi.enable]] a WHERE over the TVF prunes files through
  * the manifest statistics like any other read. Registered imperatively
  * via `GraftFunctions.register` or declaratively through
  * `GraftExtensions` (`injectTableFunction`). */
object CowSqlFunction {

  val name = "cow_read"

  private val usage = "cow_read(table_path[, version])"

  def build(args: Seq[Expression]): LogicalPlan = {
    if (args.isEmpty || args.length > 2)
      throw new IllegalArgumentException(
        s"$name: expected 1-2 arguments, got ${args.length} — usage: $usage")
    val path = args.head match {
      case Literal(v, StringType) if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"$name: table_path must be a string literal, got $other")
    }
    val version = args.lift(1).map {
      case Literal(v: java.lang.Number, IntegerType | LongType) =>
        v.intValue()
      case other => throw new IllegalArgumentException(
        s"$name: version must be an integral literal, got $other")
    }
    // TVFs resolve during analysis, inside the active session
    val spark = SparkSession.active
    val df = version match {
      case Some(v) => graft.operators.CowTable.readVersion(spark, path, v)
      case None => graft.operators.CowTable.read(spark, path)
    }
    SubqueryAlias(name, ColumnBridge.plan(df))
  }

  /** injectTableFunction-shaped description. */
  def description: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.plans.CowSqlFunction", name),
      build)
}
