package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark's `private[sql]` Dataset constructor so the engine
  * can execute a logical plan it has rewritten BEFORE analysis (sample
  * substitution must see `UnresolvedRelation` nodes; an injected analyzer
  * rule runs after the built-in `ResolveRelations` has already replaced
  * them, too late to swap the scan target).
  */
object GraftPlanExec {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Column <-> Expression bridges (private[sql] in Spark 4). */
  def toColumn(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def toExpression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
