package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the cluster step of
  * near-duplicate deduplication (pairs → clusters → keep one canonical doc
  * per cluster).
  *
  * Two algorithms:
  *   - [[apply]]: iterative min-label propagation to a fixpoint. One
  *     shuffle per round; rounds needed = graph diameter. Near-dup graphs
  *     are unions of small cliques (diameter ≤ 2), so this converges in
  *     1-2 rounds — the right default for the dedup pipeline.
  *   - [[twoPhase]]: alternating large-star/small-star contractions
  *     (Kiveris et al., "Connected Components in MapReduce and Beyond",
  *     SoCC 2014) — O(log² n) rounds regardless of diameter. The scale
  *     path for adversarial graphs (long chains, web link graphs) where
  *     diameter-many rounds would never finish on a 100 TB edge list.
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
      // materialize the WHOLE frame into the cache before the probe: the
      // filter+limit(1) convergence check alone short-circuits after one
      // changed row, leaving most cache partitions uncomputed — the next
      // round's join would then recompute them through the
      // already-unpersisted previous labels (the lazily-chained-loop
      // recompute this loop's checkpoint cadence exists to prevent)
      next.count()
      val changed = next.filter(col("label") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    // an unconverged label frame LOOKS valid but splits true components
    // (propagation advances one hop per round — a >maxIterations-diameter
    // chain reports wrong ids); silent wrong output is the one thing a
    // dedup keep-list must never get
    require(converged,
      s"ConnectedComponents: no fixpoint after $maxIterations rounds — " +
        "graph diameter exceeds the budget; raise maxIterations or use " +
        "twoPhase (O(log² n) rounds regardless of diameter)")
    labels.select(col("node"), col("label").as("component"))
  }

  /** Large-star: for every node u, hook all STRICTLY LARGER neighbors to
    * the minimum of N(u) ∪ {u}. Small-star: orient edges to the smaller
    * endpoint and hook u and all its (smaller) neighbors to the minimum.
    * Alternating the two converges to a star forest in O(log² n) rounds;
    * each phase is one aggregation shuffle + one equijoin that reuses the
    * same (u) partitioning.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val m = sym.groupBy("u").agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    sym.join(m, Seq("u"))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  private def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.select(
      greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val m = oriented.groupBy("u").agg(min(col("v")).as("m")) // m < u always
    oriented.join(m, Seq("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .union(m.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** @param edges two numeric columns (a, b), undirected
    * @return (node, component) — component = min node id of the component
    */
  def twoPhase(edges: DataFrame, maxIterations: Int = 25): DataFrame = {
    val Seq(ca, cb) = edges.columns.toSeq
    var e = edges
      .select(col(ca).cast("long").as("u"), col(cb).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .cache()
    val isolated = edges // degenerate self-loop-only nodes still get a label
      .select(col(ca).cast("long").as("n")).union(edges.select(col(cb).cast("long").as("n")))
      .distinct()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      val nextPlan = smallStar(largeStar(e))
      val next =
        (if ((iter + 1) % 3 == 0) nextPlan.localCheckpoint() else nextPlan.cache())
      next.count() // full materialization before the probe (see apply())
      // fixpoint when the edge set is stable (small-star output is always
      // oriented u > v, so set equality is well-defined)
      converged = next.exceptAll(e).limit(1).isEmpty && e.exceptAll(next).limit(1).isEmpty
      e.unpersist()
      e = next
      iter += 1
    }
    // worse than apply()'s failure mode: a non-converged edge set is not
    // a star forest, so a node with two parents emits TWO (node,
    // component) rows and corrupts every downstream join
    require(converged,
      s"ConnectedComponents.twoPhase: no fixpoint after $maxIterations " +
        "alternation rounds; raise maxIterations")
    // star forest: every u points at its root v; roots (and isolated
    // nodes) are their own component
    val children = e.select(col("u").as("node"), col("v").as("component"))
    val roots = isolated.join(children, isolated("n") === children("node"), "left_anti")
      .select(col("n").as("node"), col("n").as("component"))
    children.union(roots)
  }
}
