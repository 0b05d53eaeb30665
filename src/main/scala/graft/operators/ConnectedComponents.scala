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
    var labels = sym.select(col("a").as("node"))
      .distinct()
      .withColumn("label", col("node"))
      .cache()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // each node adopts min(own label, neighbors' labels)
      val neighborMin = sym
        .join(labels.withColumnRenamed("node", "b").withColumnRenamed("label", "blabel"), Seq("b"))
        .groupBy(col("a").as("node"))
        .agg(min(col("blabel")).as("nmin"))
      val next = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .cache()
      val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("node"))
        .filter(col("label") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    labels.withColumnRenamed("label", "component")
  }
}
