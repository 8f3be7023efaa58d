package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native expressions.
  *
  * `classic.ExpressionUtils` is `private[sql]`, so third-party engines
  * that ship custom Catalyst expressions conventionally host a one-file
  * bridge inside the `org.apache.spark.sql` package (the same technique
  * Delta/Sedona-style extensions use). Nothing else in graft lives here.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Eager ColumnNode → Expression conversion. `ExpressionUtils.expression`
    * returns a lazy `ColumnNodeExpression` wrapper that only materializes
    * on the Dataset path; expressions handed to a `FunctionRegistry`
    * builder bypass that path and would reach codegen unevaluable, so
    * convert through the session-independent converter up front.
    */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Wrap a resolved logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — used by rewrite rules that compose a sub-plan
    * with DataFrame operators (the DV anti-join expansion).
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
