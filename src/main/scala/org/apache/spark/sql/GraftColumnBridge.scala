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
