package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public Column
  * API. Spark 4 Columns wrap ColumnNodes and the Expression converters
  * (classic.ExpressionUtils) are private[sql], so this one-file shim lives
  * in the org.apache.spark.sql package — the standard technique for
  * extension libraries shipping native expressions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
