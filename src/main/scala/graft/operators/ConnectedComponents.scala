package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the cluster step of
  * near-duplicate deduplication (pairs → clusters → keep one canonical doc
  * per cluster).
  *
  * Algorithm: iterative min-label propagation to a fixpoint. Each round is
  * one shuffle (neighbor-min aggregation); rounds needed = graph diameter.
  * Near-dup graphs are unions of small cliques (diameter ≤ 2), so this
  * converges in 1-2 rounds; for adversarial long-chain graphs the
  * log-rounds large-star/small-star variant would replace the loop body —
  * the driver-side fixpoint loop and convergence check stay the same.
  */
object ConnectedComponents {

  /** @param edges two numeric columns (a, b), undirected
    * @return (node, component) — component = min node id reachable
    */
  def apply(edges: DataFrame, maxIterations: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    val Seq(ca, cb) = edges.columns.toSeq
    val sym = edges.select(col(ca).cast("long").as("a"), col(cb).cast("long").as("b"))
      .union(edges.select(col(cb).cast("long").as("a"), col(ca).cast("long").as("b")))
      .distinct()
      .cache()
    // labels carries BOTH the current label and the previous round's
    // ("old"): the convergence check is then a filter over the round's
    // already-materialized frame — one job per round, no extra join
    // (round-1 verdict: the old join-based check doubled per-round work)
    var labels = sym.select(col("a").as("node"))
      .distinct()
      .withColumn("label", col("node"))
      .withColumn("old", col("node"))
      .cache()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // each node adopts min(own label, neighbors' labels)
      val neighborMin = sym
        .join(labels.select(col("node").as("b"), col("label").as("blabel")), Seq("b"))
        .groupBy(col("a").as("node"))
        .agg(min(col("blabel")).as("nmin"))
      val nextPlan = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"), col("label").as("old"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      // localCheckpoint every 3 rounds truncates lineage: each round
      // otherwise stacks a join on the previous round's plan, and at high
      // diameters (chain graphs) the plan tree / task binaries blow up
      val next =
        if ((iter + 1) % 3 == 0) nextPlan.localCheckpoint()
        else nextPlan.cache()
      val changed = next.filter(col("label") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    labels.select(col("node"), col("label").as("component"))
  }
}
