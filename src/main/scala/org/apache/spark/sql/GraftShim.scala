package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column ↔ Expression conversions for
  * graft's native expressions (the standard extension-library shim:
  * lives in the org.apache.spark.sql package solely to cross the
  * visibility boundary; no Spark internals are modified).
  */
object GraftShim {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
