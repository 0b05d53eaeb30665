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

  /** Decompose a `.asc`/`.desc` column into (child, isDescending); None for
    * a plain column. Spark 4 Columns wrap lazy ColumnNodes (not catalyst
    * expressions), so callers can't pattern-match catalyst `SortOrder`.
    */
  def sortOrder(c: Column): Option[(Column, Boolean)] = c.node match {
    case internal.SortOrder(child, dir, _, _) =>
      Some((Column(child), dir == internal.SortOrder.Descending))
    case _ => None
  }

  def internalCreateDataFrame(
      spark: SparkSession, rows: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rows, schema, isStreaming = false)

  /** A DataFrame over a hand-built logical plan (graft's custom plan
    * nodes, e.g. AsOfJoinNode).
    */
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** `SparkSession.cloneSession()` is `private[sql]`: a session sharing
    * the SparkContext/SharedState (so caches and accumulators carry
    * over) with a COPY of the current SessionState — runtime confs,
    * temp views, experimental strategies as of the clone. Unlike the
    * public `newSession()`, runtime `conf.set` values survive. Used by
    * [[graft.functions.MinStructAgg.scoped]] to give argmin-bearing
    * query trees their own `SQLConf` without mutating the caller's
    * session (round-17: the fallback threshold must not be raised
    * session-wide).
    */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()

  /** The analyzed logical plan of a DataFrame (custom-plan children). */
  def analyzed(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Test-visible accessor for the strategies an extensions object built
    * (`buildPlannerStrategies` is `private[sql]`).
    */
  def plannerStrategies(
      e: SparkSessionExtensions, spark: SparkSession): Seq[execution.SparkStrategy] =
    e.buildPlannerStrategies(spark)

  /** Idempotently append a planner strategy to a LIVE session (the
    * `spark.sql.extensions` path only applies at session build time).
    */
  def addStrategy(spark: SparkSession, s: execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(s))
      exp.extraStrategies = exp.extraStrategies :+ s
  }
}
