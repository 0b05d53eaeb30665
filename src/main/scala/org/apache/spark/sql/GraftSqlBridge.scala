package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private Column↔Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils` is `private[sql]` in
  * Spark 4). Lives in the `org.apache.spark.sql` package solely to widen
  * access for graft's custom Catalyst expressions.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
