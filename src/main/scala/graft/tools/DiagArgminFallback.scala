package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec

/** Round-17 diagnostic: does the scoped-clone fallback threshold
  * actually reach ObjectHashAggregateExec at runtime? Runs a
  * firstFragments-shaped argmin over a synthetic many-key frame twice —
  * scoped (production) and with the threshold set session-wide — and
  * prints each run's `numTasksFallBacked` metric plus wall time.
  */
object DiagArgminFallback {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = graft.BenchEnv.abSession()
    import org.apache.spark.sql.functions._
    def base = spark.range(n).selectExpr(
      "CAST(id % 300000 AS STRING) AS k1",
      "CAST(id % 7 AS STRING) AS k2",
      "CAST(id % 65536 AS INT) AS id16",
      "id AS ft",
      "CAST(id % 1000 AS INT) AS a",
      "CAST(id % 999 AS INT) AS b")
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("k1", "k2", "id16")
      .agg(graft.functions.MinStructAgg.min_struct(
        struct(col("ft"), col("a"), col("b"))).as("m"))
      .select(col("k1"), col("m.ft"))
    def fallbacks(plan: SparkPlan): Seq[Long] = {
      val fin = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val direct = fin.collect { case o: ObjectHashAggregateExec =>
        o.metrics.get("numTasksFallBacked").map(_.value).getOrElse(-1L) }
      // QueryStageExec subtrees don't surface via collect on the final
      // plan string — walk stages too
      val staged = fin.collect {
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          s.plan.collect { case o: ObjectHashAggregateExec =>
            o.metrics.get("numTasksFallBacked").map(_.value).getOrElse(-1L) }
      }.flatten
      direct ++ staged
    }
    def run(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      val sess = df.sparkSession
      println(f"[diag] $label: $t%.2f s, conf=" +
        sess.conf.get(graft.functions.MinStructAgg.FallbackKey, "unset") +
        s", numTasksFallBacked=${fallbacks(df.queryExecution.executedPlan)}")
    }
    // warmup
    agg(base).write.mode("overwrite").format("noop").save()
    run("scoped ", agg(graft.functions.MinStructAgg.scoped(base)))
    spark.conf.set(graft.functions.MinStructAgg.FallbackKey,
      graft.functions.MinStructAgg.FallbackThreshold.toString)
    run("global ", agg(base))
    spark.conf.unset(graft.functions.MinStructAgg.FallbackKey)
    run("default", agg(base))
    spark.stop()
  }
}
