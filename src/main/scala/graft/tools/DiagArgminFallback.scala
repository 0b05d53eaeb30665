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
      // drive THIS QueryExecution's RDD — a noop write plans a separate
      // QueryExecution, so reading metrics off df.queryExecution after a
      // write inspects plan instances that never executed (all zeros)
      df.queryExecution.toRdd.foreachPartition(
        (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) =>
          while (it.hasNext) it.next())
      val t = (System.nanoTime() - t0) / 1e9
      val sess = df.sparkSession
      // getOption, not get-with-default: conf.get validates the default
      // string against the entry's int type and throws on "unset"
      println(f"[diag] $label: $t%.2f s, conf=" +
        sess.conf.getOption(graft.functions.MinStructAgg.FallbackKey)
          .getOrElse("unset") +
        s", numTasksFallBacked=${fallbacks(df.queryExecution.executedPlan)}")
    }
    // warmup
    agg(base).write.mode("overwrite").format("noop").save()
    run("scoped ", agg(graft.functions.MinStructAgg.scoped(base)))
    // second scoped run: the clone's lazy SessionState init is paid by
    // the FIRST scoped query on a session; this row shows steady-state
    run("scoped2", agg(graft.functions.MinStructAgg.scoped(base)))
    spark.conf.set(graft.functions.MinStructAgg.FallbackKey,
      graft.functions.MinStructAgg.FallbackThreshold.toString)
    run("global ", agg(base))
    spark.conf.unset(graft.functions.MinStructAgg.FallbackKey)
    run("default", agg(base))
    // threshold=1: every multi-group task MUST fall back — if this row
    // reads 0, the metric extraction is broken, not the aggregate
    spark.conf.set(graft.functions.MinStructAgg.FallbackKey, "1")
    run("thresh1", agg(base))
    spark.conf.unset(graft.functions.MinStructAgg.FallbackKey)
    spark.stop()
  }
}
