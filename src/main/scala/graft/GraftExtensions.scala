package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSim, TcpFlagsStr}

/** Session-extension packaging: enable the engine's SQL functions for any
  * session with
  * `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`), the standard way a Spark
  * library ships Catalyst additions — no imperative register() call
  * needed on each session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("tcp_flags_str"),
      new ExpressionInfo(classOf[TcpFlagsStr].getName, "tcp_flags_str"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TcpFlagsStr(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSim(exprs.head, exprs(1))))
    // whole-operator extension: the physical as-of join's planner strategy
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
