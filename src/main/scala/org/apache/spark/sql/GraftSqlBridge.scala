package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.StructType

/** Bridge into Spark's package-private APIs (`private[sql]` in Spark 4):
  * Column↔Expression conversions for graft's custom Catalyst expressions,
  * and `internalCreateDataFrame` so the pcap parser can emit `InternalRow`s
  * directly (timestamps as raw micros, strings as `UTF8String`) without a
  * per-row external-Row conversion pass. Lives in the
  * `org.apache.spark.sql` package solely to widen access.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def internalCreateDataFrame(
      spark: SparkSession, rows: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rows, schema, isStreaming = false)
}
