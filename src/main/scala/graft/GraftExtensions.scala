package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension packaging: enable the engine's SQL surface for any
  * session with
  * `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`), the standard way a Spark
  * library ships Catalyst additions — no imperative register() call
  * needed on each session. Injects every scalar AND custom-aggregate
  * builder from [[graft.functions.GraftFunctions.sqlBuilders]] (one
  * shared list, so this surface and the per-session `register` can never
  * drift) plus the physical as-of join's planner strategy.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.sqlBuilders.foreach { case (name, builder) =>
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    // whole-operator extension: the physical as-of join's planner strategy
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // optimizer extension: window top-k → bounded-heap aggregate (gated by
    // spark.graft.optimizer.windowTopKRewrite, default off)
    e.injectOptimizerRule(_ => graft.rules.TopKWindowRewrite)
  }
}
