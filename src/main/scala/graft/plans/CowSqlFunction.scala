package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
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
  * Resolves to a [[DataSourceV2Relation]] over [[CowDsv2Table]] — the
  * SAME scan implementation `graft.`path`` catalog reads use, so the
  * two SQL read paths can't drift: filter pushdown prunes files through
  * the manifest statistics at scan planning, per-partition deletion
  * vectors apply executor-side, and the `_file` / `_pos` metadata
  * columns resolve for maintenance queries. Registered imperatively via
  * `GraftFunctions.register` or declaratively through `GraftExtensions`
  * (`injectTableFunction`). */
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
    // TVFs resolve during analysis; the table pins its manifest here
    SubqueryAlias(name,
      DataSourceV2Relation.create(new CowDsv2Table(path, version), None, None))
  }

  /** injectTableFunction-shaped description. */
  def description: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.plans.CowSqlFunction", name),
      build)
}
