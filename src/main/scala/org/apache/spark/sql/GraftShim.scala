package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column <-> Expression converters (Spark 4
  * moved Column construction behind `private[sql]` ExpressionUtils).
  * Living in org.apache.spark.sql is the standard pattern for extension
  * libraries that define custom Catalyst expressions. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
