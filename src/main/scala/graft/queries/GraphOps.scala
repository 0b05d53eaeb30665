package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Iterative graph analytics over the relational testdata — the
  * join-based message-passing family (d09's connected components is the
  * other member). PageRank here is the canonical "N rounds of
  * edge-join-aggregate" Spark workload: each round is one shuffle on the
  * edge key, partial aggregation is map-side, and the rank frame stays
  * co-partitioned with the edge list round over round.
  *
  * Cross-engine determinism: all rank mass lives in integer micro-units
  * (1e12 = total initial mass); per-round redistribution uses integer
  * floor-division in an exactly specified order — `share = pr div outw`,
  * `contrib = share * w`, `pr' = base + 85 * Σcontrib div 100` — so any
  * engine that replays the same rounds lands on the same integers (no
  * doubles anywhere; dangling mass is deliberately dropped, identically,
  * by both engines). The oracle unrolls the fixed iteration count into a
  * chained-CTE pipeline (p1..pN), programmatically generated from the
  * same constants, rather than a recursive CTE — aggregation inside the
  * recursive term is not portable SQL.
  *
  * Scale notes: nodes/edges here are nation-level (tiny), but the shape
  * is the production one — the rank frame is localCheckpoint'ed every 3
  * rounds (ConnectedComponents' cadence) so lineage never grows with the
  * iteration count, and an optional integer convergence stop (L1 rank
  * delta ≤ tol) ends the loop early when ranks have settled. At a real
  * graph's scale the edge list would additionally be bucketed by src so
  * every round's join is shuffle-free.
  */
object GraphOps {
  import Tables.t

  /** total initial rank mass, in integer micro-units */
  private val Scale = 1000000000000L
  private val Iters = 10

  // customer-nation → supplier-nation trade graph, weighted by lineitem
  // count: "which nations' demand funds which nations' supply"
  private def q47Edges(s: SparkSession, dir: String): DataFrame = {
    Seq("nation", "customer", "orders", "lineitem", "supplier")
      .foreach(n => t(s, dir, n).createOrReplaceTempView(s"${n}_q47"))
    s.sql("""SELECT cn.n_name AS src, sn.n_name AS dst, COUNT(*) AS w
            |FROM customer_q47 c
            |  JOIN orders_q47 o ON o.o_custkey = c.c_custkey
            |  JOIN lineitem_q47 l ON l.l_orderkey = o.o_orderkey
            |  JOIN supplier_q47 su ON su.s_suppkey = l.l_suppkey
            |  JOIN nation_q47 cn ON cn.n_nationkey = c.c_nationkey
            |  JOIN nation_q47 sn ON sn.n_nationkey = su.s_nationkey
            |GROUP BY 1, 2""".stripMargin)
  }

  /** The reusable PageRank loop over a weighted edge list (src, dst, w).
    *
    * @param iters    max rounds
    * @param tolMicro when > 0, stop once the L1 rank delta (integer
    *                 micro-units) drops to ≤ tolMicro — costs one extra
    *                 small aggregate per round, so the oracled fixed-round
    *                 q47 leaves it off to replay exactly
    * @return (rank frame (v, pr), rounds actually run)
    */
  def pageRank(
      edges: DataFrame, iters: Int, tolMicro: Long = 0L): (DataFrame, Int) = {
    val e = edges.cache()
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct().cache()
    val n = nodes.count()
    val base = Scale * 15L / (100L * n) // floor, positive — same as SQL //
    val outw = e.groupBy("src").agg(sum("w").as("outw"))
    var pr = nodes.select(col("v"), lit(Scale / n).as("pr"))
    var round = 0
    var converged = false
    while (round < iters && !converged) {
      round += 1
      val contrib = e.join(outw, "src")
        .join(pr.withColumnRenamed("v", "src"), "src")
        .select(col("dst").as("v"), expr("(pr div outw) * w").as("c"))
      val insum = contrib.groupBy("v").agg(sum("c").as("in"))
      var next = nodes.join(insum, Seq("v"), "left")
        .select(col("v"),
          (lit(base) + expr("85 * coalesce(in, 0L) div 100")).as("pr"))
      // each round nests two joins over the previous round's plan —
      // truncate lineage every 3 rounds or a deep run breaks codegen
      if (round % 3 == 0) next = next.localCheckpoint()
      if (tolMicro > 0L) {
        val delta = next.join(pr.withColumnRenamed("pr", "prev"), "v")
          .agg(coalesce(sum(abs(col("pr") - col("prev"))), lit(0L)))
          .head().getLong(0)
        converged = delta <= tolMicro
      }
      pr = next
    }
    // materialize before releasing the cached inputs (ADVICE r6: the
    // cached e/nodes otherwise leak into the shared session for its
    // lifetime — Verify, TimeQuery loops, tests)
    val out = pr.localCheckpoint()
    e.unpersist()
    nodes.unpersist()
    (out, round)
  }

  private def q47(s: SparkSession, dir: String): DataFrame =
    pageRank(q47Edges(s, dir), Iters)._1
      .select(col("v").as("nation"), col("pr").cast(LongType).as("pr_micro"))

  private def q47Oracle: String = {
    val edgeSql =
      """e AS (SELECT cn.n_name AS src, sn.n_name AS dst, CAST(COUNT(*) AS BIGINT) AS w
        |  FROM customer c
        |    JOIN orders o ON o.o_custkey = c.c_custkey
        |    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |    JOIN supplier su ON su.s_suppkey = l.l_suppkey
        |    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        |    JOIN nation sn ON sn.n_nationkey = su.s_nationkey
        |  GROUP BY 1, 2),
        |nodes AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |bs AS (SELECT CAST(15000000000000 // (100 * n) AS BIGINT) AS b FROM nn),
        |ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw FROM e GROUP BY src),
        |p0 AS (SELECT v, CAST(1000000000000 // n AS BIGINT) AS pr FROM nodes, nn)""".stripMargin
    val rounds = (1 to Iters).map { i =>
      s"""p$i AS (SELECT nd.v, CAST(bs.b + 85 * COALESCE(ins.s, 0) // 100 AS BIGINT) AS pr
         |  FROM nodes nd CROSS JOIN bs
         |  LEFT JOIN (SELECT e.dst AS v, SUM((p.pr // o.outw) * e.w) AS s
         |             FROM e JOIN p${i - 1} p ON p.v = e.src
         |                    JOIN ow o ON o.src = e.src
         |             GROUP BY e.dst) ins ON ins.v = nd.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgeSql,
       |$rounds
       |SELECT v AS nation, pr AS pr_micro FROM p$Iters""".stripMargin
  }

  // --- q66: single-source shortest paths (Bellman-Ford rounds) ----------
  // The third member of the join-based message-passing family (q47
  // PageRank redistributes mass, d09 connected components propagates min
  // labels, q66 relaxes min distances). Edge cost is the inverse of trade
  // volume (`1 + 1_000_000 div w` — busy lanes are cheap), the source is
  // the lexicographically smallest nation, both derived in-plan so the
  // oracle recomputes them rather than trusting a driver-side constant.
  //
  // Each round is ONE shuffle on dst (min-relaxation is map-side
  // combinable), the distance frame stays keyed by node round over round,
  // and lineage is truncated on ConnectedComponents' cadence. Fixed
  // SsspRounds = 6 ≥ the trade graph's hop diameter, and — like q47 — a
  // fixed round count is what makes the chained-CTE oracle an exact
  // replay; unreachable nodes hold the integer sentinel and surface as
  // NULL. At production graph scale the edge list would be bucketed by
  // src so every relaxation join is shuffle-free (same note as pageRank).
  private val SsspRounds = 6
  private val SsspInf = 1000000000000000L // > any real path: ≤ 25 hops × ~1e6

  /** Bellman-Ford over a weighted edge list (src, dst, cost): one
    * min-relaxation shuffle per round, `rounds` fixed for replayability.
    */
  def shortestPaths(
      edges: DataFrame, sourceSel: DataFrame, rounds: Int): DataFrame = {
    val e = edges.cache()
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct().cache()
    val src0 = sourceSel.select(col("s0"))
    var dist = nodes.crossJoin(src0)
      .select(col("v"),
        when(col("v") === col("s0"), lit(0L)).otherwise(lit(SsspInf)).as("dist"))
    for (round <- 1 to rounds) {
      val relaxed = e
        .join(dist.withColumnRenamed("v", "src").withColumnRenamed("dist", "dsrc"), "src")
        .groupBy(col("dst").as("v"))
        .agg(min(col("dsrc") + col("cost")).as("cand"))
      var next = dist.join(relaxed, Seq("v"), "left")
        .select(col("v"),
          least(col("dist"), coalesce(col("cand"), lit(SsspInf))).as("dist"))
      if (round % 3 == 0) next = next.localCheckpoint()
      dist = next
    }
    // materialize, then release the cached inputs (same leak as pageRank)
    val out = dist.localCheckpoint()
    e.unpersist()
    nodes.unpersist()
    out
  }

  private def q66(s: SparkSession, dir: String): DataFrame = {
    val e = q47Edges(s, dir)
      .select(col("src"), col("dst"), (lit(1L) + expr("1000000 div w")).as("cost"))
    val source = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v")))
      .agg(min("v").as("s0"))
    shortestPaths(e, source, SsspRounds)
      .select(col("v").as("nation"),
        nullif(col("dist"), lit(SsspInf)).cast(LongType).as("dist_cost"))
  }

  private def q66Oracle: String = {
    val base =
      s"""e AS (SELECT src, dst, CAST(1 + 1000000 // w AS BIGINT) AS cost FROM (
         |  SELECT cn.n_name AS src, sn.n_name AS dst, CAST(COUNT(*) AS BIGINT) AS w
         |  FROM customer c
         |    JOIN orders o ON o.o_custkey = c.c_custkey
         |    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |    JOIN supplier su ON su.s_suppkey = l.l_suppkey
         |    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
         |    JOIN nation sn ON sn.n_nationkey = su.s_nationkey
         |  GROUP BY 1, 2)),
         |nodes AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |s0 AS (SELECT min(v) AS s FROM nodes),
         |d0 AS (SELECT v, CASE WHEN v = (SELECT s FROM s0) THEN CAST(0 AS BIGINT)
         |                      ELSE CAST($SsspInf AS BIGINT) END AS dist FROM nodes)""".stripMargin
    val rounds = (1 to SsspRounds).map { i =>
      s"""d$i AS (SELECT p.v, CAST(LEAST(p.dist, COALESCE(m.c, $SsspInf)) AS BIGINT) AS dist
         |  FROM d${i - 1} p
         |  LEFT JOIN (SELECT e.dst AS v, MIN(p2.dist + e.cost) AS c
         |             FROM e JOIN d${i - 1} p2 ON p2.v = e.src
         |             GROUP BY e.dst) m ON m.v = p.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH $base,
       |$rounds
       |SELECT v AS nation, NULLIF(dist, $SsspInf) AS dist_cost FROM d$SsspRounds""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("q47_pagerank", q47, Some(q47Oracle)),
    Q("q66_shortest_paths", q66, Some(q66Oracle))
  )
}
