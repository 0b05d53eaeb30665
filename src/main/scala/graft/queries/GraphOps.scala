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
  private[graft] def q47Edges(s: SparkSession, dir: String): DataFrame = {
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

  // --- q75: triangle counting via degree-ordered orientation ------------
  // The fourth join-based graph member, and the one whose NAIVE form dies
  // first at scale: counting each triangle once by joining the raw edge
  // list three ways puts every hub node's full neighborhood on one side
  // of a join (a celebrity's 10⁷ neighbors → 10¹⁴ candidate wedges).
  // The compact-forward fix is pure relational algebra: orient every
  // undirected edge from the (degree, id)-SMALLER endpoint to the larger
  // — a total order, so each triangle survives in exactly one
  // orientation (u→v→w with u<v<w in the order) — and every node's
  // OUT-degree is then bounded by ~√(2·|E|) regardless of its real
  // degree, which caps the wedge join's skew. Two hash joins + a count;
  // no iteration, no state. Emits the triangle count and the integer
  // global clustering coefficient (3·closed / open wedges, permille).
  private def q75(s: SparkSession, dir: String): DataFrame = {
    // undirected simple edges from the trade graph: canonical a < b pair
    val und = q47Edges(s, dir).filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    triangleStats(und)
  }

  /** Max degree-table rows we force into a broadcast (round-7 verdict
    * #3, the Defrag MaxBroadcastFirstFragments pattern): the degree
    * frame is O(|V|), tiny for the nation graph but an impossible
    * broadcast on a billion-node one — above this the enrichment joins
    * fall back to shuffle hash joins (AQE still converts back at
    * runtime if the measured side turns out small). ~1M (v, deg) rows
    * is comfortably inside the 10 MB autoBroadcast ballpark.
    */
  private[graft] val MaxBroadcastDegreeNodes = 1000000L

  /** Orient each undirected `(a, b)` edge from the (deg, id)-smaller
    * endpoint to the larger — the compact-forward total order that caps
    * every node's OUT-degree at ~√(2·|E|) regardless of its real degree.
    * `hint` wraps the degree-table join sides (broadcast or identity).
    */
  private[graft] def orientEdges(und: DataFrame, deg: DataFrame,
      hint: DataFrame => DataFrame): DataFrame = {
    val dA = deg.select(col("v").as("a"), col("deg").as("da"))
    val dB = deg.select(col("v").as("b"), col("deg").as("db"))
    und.join(hint(dA), "a").join(hint(dB), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("v"))
  }

  /** The reusable compact-forward triangle kernel over an undirected
    * simple edge list `(a, b)`, a < b: orient by the (deg, id) total
    * order, wedge-join the out-edges, close with the oriented third
    * edge — each triangle counted exactly once from its order-minimal
    * vertex, hub skew capped at √(2·|E|) out-degree. The degree-table
    * broadcasts are GATED on |V| (one count over the cached degree
    * frame, reused by the wedge/orientation joins and the open-wedge
    * total); above `maxBroadcastNodes` the joins shuffle instead.
    * Emits one row: edges, open wedges, triangles, and the integer
    * global clustering coefficient (3·closed / open, permille).
    */
  private[graft] def triangleStats(und0: DataFrame,
      maxBroadcastNodes: Long = MaxBroadcastDegreeNodes): DataFrame = {
    val und = und0.cache() // reused: orientation, edge count
    val deg = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg")).cache()
    val nV = deg.count() // materializes the cache AND decides the gate
    val hint: DataFrame => DataFrame =
      if (nV <= maxBroadcastNodes) broadcast else identity
    val oriented = orientEdges(und, deg, hint)
    // wedges: both (u,v) and (u,w) are OUT-edges of u; keep each
    // unordered pair once by requiring v before w in the SAME (deg, id)
    // total order used to orient, then close with the oriented edge v→w
    // — which exists iff the triangle's third pair is oriented v→w,
    // guaranteed because v precedes w in the order. Each triangle is
    // counted exactly once, from its order-minimal vertex.
    val e1 = oriented.select(col("u"), col("v"))
    val e2 = oriented.select(col("u"), col("v").as("w"))
    val closing = oriented.select(col("u").as("v"), col("v").as("w"))
    val dV = deg.select(col("v"), col("deg").as("dv"))
    val dW = deg.select(col("v").as("w"), col("deg").as("dw"))
    val wedges = e1.join(e2, "u").filter(col("v") =!= col("w"))
      .join(hint(dV), "v").join(hint(dW), "w")
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
    val tri = wedges.join(closing, Seq("v", "w"))
      .agg(count(lit(1)).as("n_triangles"))
    val edges = und.agg(count(lit(1)).as("n_edges"))
    val openW = deg.agg(
      sum(expr("deg * (deg - 1) div 2")).cast(LongType).as("n_wedges"))
    // the scalar combiners stay broadcast regardless — each side is 1 row
    val out = edges.crossJoin(broadcast(openW)).crossJoin(broadcast(tri))
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        expr("""CASE WHEN n_wedges = 0 THEN 0L
               |     ELSE (3000 * n_triangles) div n_wedges END""".stripMargin)
          .cast(LongType).as("clustering_permille"))
      // materialize before releasing the caches (the pageRank pattern —
      // a lazily returned plan must not pin cached frames in the shared
      // session); the result is a single row
      .localCheckpoint()
    und.unpersist()
    deg.unpersist()
    out
  }

  private def q75Oracle: String =
    """WITH te AS (SELECT cn.n_name AS src, sn.n_name AS dst
      |  FROM customer c
      |    JOIN orders o ON o.o_custkey = c.c_custkey
      |    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |    JOIN supplier su ON su.s_suppkey = l.l_suppkey
      |    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      |    JOIN nation sn ON sn.n_nationkey = su.s_nationkey
      |  GROUP BY 1, 2),
      |und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      |        FROM te WHERE src <> dst),
      |deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
      |          SELECT a AS v FROM und UNION ALL SELECT b FROM und) GROUP BY v),
      |o AS (SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
      |                  THEN a ELSE b END AS u,
      |             CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
      |                  THEN b ELSE a END AS v
      |      FROM und JOIN deg da ON da.v = a JOIN deg db ON db.v = b),
      |w AS (SELECT e1.u, e1.v, e2.v AS w
      |      FROM o e1 JOIN o e2 ON e2.u = e1.u AND e1.v <> e2.v
      |      JOIN deg dv ON dv.v = e1.v JOIN deg dw ON dw.v = e2.v
      |      WHERE dv.deg < dw.deg OR (dv.deg = dw.deg AND e1.v < e2.v)),
      |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      |      FROM w JOIN o c ON c.u = w.v AND c.v = w.w),
      |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM und),
      |wg AS (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM deg)
      |SELECT m.n_edges, wg.n_wedges, t.n_triangles,
      |       CAST(CASE WHEN wg.n_wedges = 0 THEN 0
      |                 ELSE (3000 * t.n_triangles) // wg.n_wedges END AS BIGINT)
      |         AS clustering_permille
      |FROM m, wg, t""".stripMargin

  // --- q76: recursive CTE reachability (Spark 4 WITH RECURSIVE) ----------
  // The FOURTH way this engine expresses iteration — q47/q66/d09 drive
  // the loop from the driver (round count or convergence in Scala), q65
  // rewrites a plan, and here the ITERATION LIVES IN THE SQL TEXT:
  // Spark 4's recursive CTE runs breadth-first hops of the trade graph
  // inside one statement, with the standard linear-recursion semantics
  // (each step joins only the PREVIOUS step's frontier) that DuckDB
  // shares — so the oracle is the IDENTICAL statement, not a replay.
  // The hop bound is part of the query (r.hops < 3 ≥ the trade graph's
  // diameter): unbounded recursion over a cyclic graph never terminates
  // under UNION ALL semantics, and at 100 TB the bound is also what caps
  // the frontier blow-up — the same reason q66 fixes its round count.
  // min-hops BFS distance from the lexicographically smallest nation.
  private def q76Body(edgeCte: String): String =
    s"""WITH RECURSIVE $edgeCte,
       |s0 AS (SELECT MIN(src) AS v FROM e),
       |reach(v, hops) AS (
       |  SELECT v, 0 FROM s0
       |  UNION ALL
       |  SELECT e.dst, r.hops + 1
       |  FROM reach r JOIN e ON e.src = r.v
       |  WHERE r.hops < 3
       |)
       |SELECT v AS nation, CAST(MIN(hops) AS BIGINT) AS min_hops
       |FROM reach GROUP BY v""".stripMargin

  private def q76(s: SparkSession, dir: String): DataFrame = {
    q47Edges(s, dir).createOrReplaceTempView("edges_q76")
    s.sql(q76Body("e AS (SELECT src, dst FROM edges_q76)"))
  }

  private def q76Oracle: String = q76Body(
    """e AS (SELECT cn.n_name AS src, sn.n_name AS dst
      |  FROM customer c
      |    JOIN orders o ON o.o_custkey = c.c_custkey
      |    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |    JOIN supplier su ON su.s_suppkey = l.l_suppkey
      |    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      |    JOIN nation sn ON sn.n_nationkey = su.s_nationkey
      |  GROUP BY 1, 2)""".stripMargin)

  // --- q82: k-core decomposition of the near-dup graph ---------------------

  /** Peel rounds / minimum degree. 8 rounds reach fixpoint with margin at
    * every test SF (the spec asserts a 9th round is a no-op); beyond the
    * fixpoint, peeling is identity, so a too-generous N costs only empty
    * rounds and never changes the answer.
    */
  private val KCoreK = 2
  private val KCoreRounds = 8

  /** k-core of the d05 near-dup pairs graph: iteratively delete vertices
    * of degree < k until fixpoint — the dense residue is the
    * template-farm / mass-duplication structure a corpus-quality pipeline
    * quarantines (a star of near-dups collapses, a clique survives —
    * degree alone (d09 components) cannot tell them apart). Per round:
    * one degree aggregate (map-side partial) + two broadcast semi-joins;
    * the edge frame is localCheckpoint'ed per round (the iterative-loop
    * materialization rule — and it only ever SHRINKS). The oracle unrolls
    * the fixed rounds as chained MATERIALIZED CTEs (q47's unrolled-
    * pipeline idiom; without MATERIALIZED each round references its
    * predecessor three times and DuckDB's CTE inlining goes exponential).
    */
  private def q82(s: SparkSession, dir: String): DataFrame = {
    var g = graft.operators.JaccardAllPairs(
        TextOps.shingleHashesOf(t(s, dir, "documents")), 300)
      .select(col("doc_a").as("da"), col("doc_b").as("db"))
      .localCheckpoint()
    for (_ <- 1 to KCoreRounds) {
      val deg = g.select(col("da").as("node"))
        .unionAll(g.select(col("db").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= KCoreK).select("node")
      g = g
        .join(broadcast(keep.withColumnRenamed("node", "da")), Seq("da"), "left_semi")
        .join(broadcast(keep.withColumnRenamed("node", "db")), Seq("db"), "left_semi")
        .localCheckpoint()
    }
    g.select(col("da").as("node")).unionAll(g.select(col("db").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .select(col("node").as("doc_id"), col("deg").cast(LongType).as("core_deg"))
  }

  private def q82Oracle: String = {
    val peel = (1 to KCoreRounds).map { r =>
      val prev = s"g${r - 1}"
      s"""d$r AS MATERIALIZED (SELECT node, COUNT(*) deg FROM (SELECT da node FROM $prev UNION ALL SELECT db FROM $prev) GROUP BY 1),
         |k$r AS MATERIALIZED (SELECT node FROM d$r WHERE deg >= $KCoreK),
         |g$r AS MATERIALIZED (SELECT da, db FROM $prev WHERE da IN (SELECT node FROM k$r) AND db IN (SELECT node FROM k$r))""".stripMargin
    }.mkString(",\n")
    s"""WITH w AS MATERIALIZED (SELECT doc_id, string_split(text,' ') ws FROM documents),
       |sh AS MATERIALIZED (SELECT DISTINCT doc_id, unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS s FROM w),
       |sz AS MATERIALIZED (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
       |p AS MATERIALIZED (SELECT a.doc_id da, b.doc_id db, COUNT(*) inter
       |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1,2),
       |g0 AS MATERIALIZED (SELECT da, db FROM p JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
       |      WHERE (1000*inter) // (x.n + y.n - inter) >= 300),
       |$peel
       |SELECT node AS doc_id, CAST(deg AS BIGINT) AS core_deg FROM (
       |  SELECT node, COUNT(*) deg
       |  FROM (SELECT da node FROM g$KCoreRounds UNION ALL SELECT db node FROM g$KCoreRounds)
       |  GROUP BY 1)""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("q47_pagerank", q47, Some(q47Oracle)),
    Q("q66_shortest_paths", q66, Some(q66Oracle)),
    Q("q75_triangle_count", q75, Some(q75Oracle)),
    Q("q76_recursive_reachability", q76, Some(q76Oracle)),
    Q("q82_kcore", q82, Some(q82Oracle))
  )
}
