package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4's Column wraps a ColumnNode (for
  * Connect); the classic converters are private[sql], so this one-file
  * subpackage exposes them to graft — the standard pattern for libraries
  * that ship custom Catalyst expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Eager ColumnNode → Expression conversion. ExpressionUtils.expression
    * returns a LAZY ColumnNodeExpression wrapper that claims
    * resolved=true with dataType=NullType until an analyzer rule converts
    * it inside a standard operator — inside a custom LogicalPlan node
    * that conversion never happens for derived columns (e.g. `.cast`), so
    * convert eagerly here instead. */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Analyzed logical plan of a DataFrame. */
  def plan(df: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Wrap a logical plan back into a DataFrame. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

/** Test-visible accessor for the private[sql] extension builders —
  * lets specs assert what a `spark.sql.extensions=GraftExtensions`
  * deployment would actually register. */
object ExtensionsBridge {
  def plannerStrategies(ext: org.apache.spark.sql.SparkSessionExtensions,
      spark: org.apache.spark.sql.SparkSession):
      Seq[org.apache.spark.sql.execution.SparkStrategy] =
    ext.buildPlannerStrategies(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
}
