package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the private[sql] Column ↔ Expression converters, for
  * graft's native expressions whose parameters are driver-side
  * constants (e.g. MinHash coefficient arrays) and therefore don't fit
  * the name-registry path. The standard technique Spark extension
  * libraries use; this object is the ONLY code outside the graft
  * package. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Same bridge role, plus the private[sql] Dataset constructor needed
  * to wrap a custom LogicalPlan (graft.plans.GroupedTopKPlan) back into
  * a DataFrame. */
object GraftBridge {
  def column(e: Expression): Column = GraftColumnBridge.column(e)
  def expression(c: Column): Expression = GraftColumnBridge.expression(c)
  /** Eager ColumnNode → catalyst conversion (ExpressionUtils.expression
    * wraps lazily in a ColumnNodeExpression, which is neither
    * pattern-matchable as catalyst SortOrder nor serializable — custom
    * logical plans need the real expression tree up front). */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
