package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * e01 is the brute-force baseline: broadcast the (small) query set,
  * stream the corpus — the big side is never shuffled, so the plan scales
  * to any corpus size; cost is O(|corpus| × |queries|) dot products inside
  * whole-stage codegen.
  *
  * e02 is the bucketed scale path (IVF-style): restrict candidate pairs to
  * a shared coarse bucket (here the `label` column stands in for a k-means
  * cell id, which is how a real IVF index would be built — assign once,
  * then equijoin on cell). Turns the cross product into a per-bucket join.
  *
  * Dot products run in double precision via higher-order functions
  * (`zip_with` + `aggregate`) — deterministic sequential fold, matching
  * the DuckDB oracle's double arithmetic; similarities are rounded to 4
  * decimals *before* ranking so both engines rank identical values.
  */
object VectorOps {
  import Tables.t

  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))

  /** one fused codegen'd loop per pair ([[graft.functions.CosineSim]]);
    * algebraically identical to dot/(||q||·||c||) computed separately, so
    * the DuckDB oracle's value is bit-equal after round(_, 4)
    */
  private def sim = round(
    graft.functions.GraftFunctions.cosine_sim(col("qe"), col("e")), 4)

  /** THE brute-force scoring pipeline — shared by the batch e01 and the
    * streaming s14 (whose correctness contract is exact equality with
    * e01 under one oracle, so the scoring must be one piece of code):
    * broadcast `queries` (qid, qe) into a codegen'd cosine scan of
    * `corpus` (vec_id, e), self-exclude, round to 4 decimals BEFORE
    * ranking, top-k under the full (sim DESC, cid ASC) sort key.
    */
  private[graft] def scoreTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid").asc)
    corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"), sim.as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "cid", "sim")
  }

  /** Top-k cosine neighbors for each query vector (vec_id < nQueries). */
  def cosineTopK(s: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val emb = withNorm(t(s, dir, "embeddings"))
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    scoreTopK(emb, q, k)
  }

  /** IVF-style bucketed ANN: only same-bucket candidates are scored. */
  def bucketedAnn(s: SparkSession, dir: String, nQueries: Int = 50, k: Int = 3): DataFrame = {
    val emb = withNorm(t(s, dir, "embeddings"))
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("e").as("qe"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid").asc)
    emb.join(broadcast(q), col("label") === col("qlabel") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"), sim.as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "cid", "sim")
  }

  /** All embedding pairs above a cosine threshold — embedding-based
    * near-dup detection (bucketed by label to keep the join linear).
    */
  def cosineNearDups(s: SparkSession, dir: String, threshold: Double = 0.3): DataFrame = {
    val emb = withNorm(t(s, dir, "embeddings"))
    val b = emb.select(col("vec_id").as("qid"), col("label").as("qlabel"),
      col("e").as("qe"))
    emb.join(b, col("label") === col("qlabel") && col("vec_id") < col("qid"))
      .select(col("vec_id").as("vec_a"), col("qid").as("vec_b"), sim.as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Memoized per (session, dir): the e04 result and its aux index frames
    * must come from ONE `searchWithIndex` call (shared cached plans) so
    * the exported index is bit-identical to the one the result used.
    */
  private val e04Memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (DataFrame, DataFrame, DataFrame)]
  private def e04Index(s: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) =
    e04Memo.getOrElseUpdate((s, dir), graft.operators.KMeansIvf.searchWithIndex(
      t(s, dir, "embeddings"), k = 8, iterations = 3,
      nQueries = 20, topK = 5, nprobe = 2))

  /** Same memo contract for e05: result + exported codebooks/codes must
    * share one cached plan set. */
  private val e05Memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (DataFrame, DataFrame, DataFrame)]
  // m=32 two-dim subspaces × 32 codes: 8× compression at ~0.7 recall@10
  // on the near-uniform synthetic embeddings (PQ-hostile — no cluster
  // structure for the codebooks to exploit; real embedding corpora do
  // far better at coarser m)
  private def e05Index(s: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) =
    e05Memo.getOrElseUpdate((s, dir), graft.operators.PqAnn.searchWithIndex(
      t(s, dir, "embeddings"), m = 32, k = 32, iterations = 5,
      nQueries = 10, topK = 10))

  // private[graft]: s14 (streaming ANN) replays e01's exact scoring per
  // micro-batch and shares the same oracle
  private[graft] def oracleCosine(filterA: String, joinCond: String, k: Int): String =
    s"""WITH f AS (SELECT vec_id, label, unnest(embedding) v, generate_subscripts(embedding, 1) i FROM embeddings),
       |n AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) nrm FROM f GROUP BY vec_id),
       |q AS (SELECT * FROM f WHERE $filterA),
       |d AS (SELECT q.vec_id qid, c.vec_id cid, SUM(CAST(q.v AS DOUBLE) * CAST(c.v AS DOUBLE)) dot
       |      FROM q JOIN f c ON q.i = c.i AND c.vec_id <> q.vec_id $joinCond
       |      GROUP BY 1, 2),
       |s AS (SELECT qid, cid, round(dot / (x.nrm * y.nrm), 4) sim
       |      FROM d JOIN n x ON x.vec_id = qid JOIN n y ON y.vec_id = cid)
       |SELECT qid, cid, sim FROM (
       |  SELECT qid, cid, sim, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) rn FROM s)
       |WHERE rn <= $k""".stripMargin

  /** e06 memo: result + the four exported index frames from ONE call. */
  private val e06Memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame)]
  private def e06Index(s: SparkSession, dir: String) =
    e06Memo.getOrElseUpdate((s, dir), graft.operators.IvfPq.searchWithIndex(
      t(s, dir, "embeddings"), cells = 8, cellIterations = 3, nprobe = 3,
      m = 32, k = 32, pqIterations = 5, nQueries = 10, topK = 10))

  val queries: Seq[Q] = Seq(
    Q("e01_cosine_topk", (s, dir) => cosineTopK(s, dir),
      Some(oracleCosine("vec_id < 10", "", 5)),
      headline = true),
    Q("e02_ann_bucketed", (s, dir) => bucketedAnn(s, dir),
      Some(oracleCosine("vec_id < 50", "AND c.label = q.label", 3))),
    // learned-centroid IVF (k-means Lloyd iterations, all DataFrame ops).
    // Oracled on the deterministic half: Verify exports the learned index
    // (cell assignments + per-query probes, cached so they're exactly
    // what the search used) and DuckDB independently rescores candidates
    // and re-ranks top-k. Index *quality* (recall vs brute force) stays
    // in ScalaTest.
    Q("e04_ann_kmeans_ivf",
      (s, dir) => e04Index(s, dir)._1,
      Some("""WITH f AS (SELECT vec_id, unnest(embedding) v, generate_subscripts(embedding, 1) i FROM embeddings),
             |n AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) nrm FROM f GROUP BY vec_id),
             |a AS (SELECT vec_id, cell FROM '{OUT}/_aux/e04_ann_kmeans_ivf/aux_assign/*.parquet'),
             |p AS (SELECT qid, cell FROM '{OUT}/_aux/e04_ann_kmeans_ivf/aux_probes/*.parquet'),
             |cand AS (SELECT p.qid, a.vec_id AS cid FROM p JOIN a ON a.cell = p.cell WHERE a.vec_id <> p.qid),
             |d AS (SELECT c.qid, c.cid, SUM(CAST(qf.v AS DOUBLE) * CAST(cf.v AS DOUBLE)) dot
             |      FROM cand c JOIN f qf ON qf.vec_id = c.qid JOIN f cf ON cf.vec_id = c.cid AND cf.i = qf.i
             |      GROUP BY 1, 2),
             |s AS (SELECT qid, cid, round(dot / (x.nrm * y.nrm), 4) sim
             |      FROM d JOIN n x ON x.vec_id = qid JOIN n y ON y.vec_id = cid)
             |SELECT qid, cid, sim FROM (
             |  SELECT qid, cid, sim, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) rn FROM s)
             |WHERE rn <= 5""".stripMargin),
      aux = Seq(
        "aux_assign" -> ((s: SparkSession, dir: String) => e04Index(s, dir)._2),
        "aux_probes" -> ((s: SparkSession, dir: String) => e04Index(s, dir)._3))),
    // product quantization: codebook learning is Spark-side (averaged
    // doubles — exported), but ADC scoring is pure integer arithmetic
    // over the exported codebooks/codes, so DuckDB replays the entire
    // scoring + ranking exactly. PQ quality (recall) stays in ScalaTest.
    Q("e05_pq_ann",
      (s, dir) => e05Index(s, dir)._1,
      Some("""WITH cb AS (SELECT sub_m, code, ce FROM '{OUT}/_aux/e05_pq_ann/aux_codebooks/*.parquet'),
             |cd AS (SELECT vec_id, sub_m, code FROM '{OUT}/_aux/e05_pq_ann/aux_codes/*.parquet'),
             |q AS (SELECT vec_id AS qid, [CAST(x AS DOUBLE) for x in embedding] AS qe
             |      FROM embeddings WHERE vec_id < 10),
             |tab AS (SELECT qid, sub_m, code,
             |  CAST(list_sum([CAST(floor(1000000 *
             |    (qe[sub_m * 2 + i] - ce[i]) * (qe[sub_m * 2 + i] - ce[i]) + 0.5) AS BIGINT)
             |    for i in range(1, 3)]) AS BIGINT) AS di
             |  FROM q CROSS JOIN cb),
             |sc AS (SELECT qid, vec_id AS cid, CAST(SUM(di) AS BIGINT) AS dist_e6
             |       FROM cd JOIN tab USING (sub_m, code)
             |       WHERE vec_id <> qid GROUP BY 1, 2)
             |SELECT qid, cid, dist_e6 FROM (
             |  SELECT qid, cid, dist_e6,
             |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist_e6, cid) rn FROM sc)
             |WHERE rn <= 10""".stripMargin),
      aux = Seq(
        "aux_codebooks" -> ((s: SparkSession, dir: String) => e05Index(s, dir)._2),
        "aux_codes" -> ((s: SparkSession, dir: String) => e05Index(s, dir)._3))),
    // fused IVF+PQ (the production index): DuckDB replays cell
    // restriction, integer ADC scoring, and ranking from the four
    // exported index frames — the full search path, end to end.
    Q("e06_ivf_pq",
      (s, dir) => e06Index(s, dir)._1,
      Some("""WITH a AS (SELECT vec_id, cell FROM '{OUT}/_aux/e06_ivf_pq/aux_assign/*.parquet'),
             |p AS (SELECT qid, cell FROM '{OUT}/_aux/e06_ivf_pq/aux_probes/*.parquet'),
             |cb AS (SELECT sub_m, code, ce FROM '{OUT}/_aux/e06_ivf_pq/aux_codebooks/*.parquet'),
             |cd AS (SELECT vec_id, sub_m, code FROM '{OUT}/_aux/e06_ivf_pq/aux_codes/*.parquet'),
             |q AS (SELECT vec_id AS qid, [CAST(x AS DOUBLE) for x in embedding] AS qe
             |      FROM embeddings WHERE vec_id < 10),
             |tab AS (SELECT qid, sub_m, code,
             |  CAST(list_sum([CAST(floor(1000000 *
             |    (qe[sub_m * 2 + i] - ce[i]) * (qe[sub_m * 2 + i] - ce[i]) + 0.5) AS BIGINT)
             |    for i in range(1, 3)]) AS BIGINT) AS di
             |  FROM q CROSS JOIN cb),
             |cand AS (SELECT p.qid, a.vec_id FROM p JOIN a USING (cell)
             |         WHERE a.vec_id <> p.qid),
             |sc AS (SELECT c.qid, c.vec_id AS cid, CAST(SUM(di) AS BIGINT) AS dist_e6
             |       FROM cand c JOIN cd ON cd.vec_id = c.vec_id
             |       JOIN tab ON tab.qid = c.qid AND tab.sub_m = cd.sub_m AND tab.code = cd.code
             |       GROUP BY 1, 2)
             |SELECT qid, cid, dist_e6 FROM (
             |  SELECT qid, cid, dist_e6,
             |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist_e6, cid) rn FROM sc)
             |WHERE rn <= 10""".stripMargin),
      headline = true,
      aux = Seq(
        "aux_assign" -> ((s: SparkSession, dir: String) => e06Index(s, dir)._2),
        "aux_probes" -> ((s: SparkSession, dir: String) => e06Index(s, dir)._3),
        "aux_codebooks" -> ((s: SparkSession, dir: String) => e06Index(s, dir)._4),
        "aux_codes" -> ((s: SparkSession, dir: String) => e06Index(s, dir)._5))),
    // int8 symmetric quantization — the storage/serving prep step a
    // vector pipeline runs before shipping an index (127·x/max|x|,
    // half-up). Narrow; the per-vector scale lives alongside the codes so
    // dequantization is lossless up to the grid. The float division is
    // the SAME IEEE expression in both engines, and the rounded codes are
    // integers, so the md5 over the code string hash-matches exactly.
    Q("e07_int8_quantize",
      (s, dir) => {
        t(s, dir, "embeddings")
          .select(col("vec_id"),
            expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
          .select(col("vec_id"),
            expr("array_max(transform(e, x -> abs(x)))").as("mx"),
            col("e"))
          .select(col("vec_id"),
            size(col("e")).cast("long").as("n_dims"),
            expr("CAST(floor(1000000 * mx + 0.5) AS BIGINT)").as("scale_e6"),
            // mx = 0 guard (all-zero vector): Spark's 0/0 is NaN (casts
            // to 0) but DuckDB's is NULL — emit code 0 explicitly in BOTH
            // engines so the zero-vector row hash-matches
            expr("""aggregate(transform(e, x -> abs(CASE WHEN mx = 0 THEN CAST(0 AS BIGINT)
                   | ELSE CAST(floor(127 * x / mx + 0.5) AS BIGINT) END)),
                   | CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin).as("q_l1"),
            expr("""md5(concat_ws(',', transform(e, x -> CASE WHEN mx = 0 THEN CAST(0 AS BIGINT)
                   | ELSE CAST(floor(127 * x / mx + 0.5) AS BIGINT) END)))""".stripMargin)
              .as("q_md5"))
      },
      Some("""WITH v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
             |m AS (SELECT vec_id, e, list_max([abs(x) for x in e]) AS mx FROM v)
             |SELECT vec_id,
             |  CAST(len(e) AS BIGINT) AS n_dims,
             |  CAST(floor(1000000 * mx + 0.5) AS BIGINT) AS scale_e6,
             |  CAST(list_sum([abs(CASE WHEN mx = 0 THEN CAST(0 AS BIGINT) ELSE CAST(floor(127 * x / mx + 0.5) AS BIGINT) END) for x in e]) AS BIGINT) AS q_l1,
             |  md5(array_to_string([CASE WHEN mx = 0 THEN CAST(0 AS BIGINT) ELSE CAST(floor(127 * x / mx + 0.5) AS BIGINT) END for x in e], ',')) AS q_md5
             |FROM m""".stripMargin)),
    // --- e11: ANN recall audit (evaluation-as-a-query) ---------------------
    // The acceptance gate a real vector pipeline runs before trusting an
    // approximate index: per query point, how much of the EXACT cosine
    // top-10 does the bucketed ANN recover? Both arms reuse the oracled
    // e01/e02 operators (broadcast queries, corpus never shuffled); the
    // recall join runs over two ≤(nQueries·k)-row top-k sets, so the
    // audit costs two linear scans regardless of corpus size. Integer
    // permille via floor-division — no float recall.
    Q("e11_ann_recall",
      (s, dir) => {
        val exact = cosineTopK(s, dir, nQueries = 20, k = 10)
          .select(col("qid"), col("cid"))
        val approx = bucketedAnn(s, dir, nQueries = 20, k = 10)
          .select(col("qid"), col("cid"), lit(1L).as("hit"))
        exact.join(approx, Seq("qid", "cid"), "left")
          .groupBy("qid")
          .agg(count(lit(1)).as("n_exact"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
          .select(col("qid"), col("n_exact"), col("n_hits"),
            expr("CAST(1000 * n_hits div n_exact AS BIGINT)").as("recall_permille"))
      },
      Some("""WITH f AS (SELECT vec_id, label, unnest(embedding) v, generate_subscripts(embedding, 1) i FROM embeddings),
             |n AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) nrm FROM f GROUP BY vec_id),
             |q AS (SELECT * FROM f WHERE vec_id < 20),
             |dx AS (SELECT q.vec_id qid, c.vec_id cid, SUM(CAST(q.v AS DOUBLE) * CAST(c.v AS DOUBLE)) dot
             |       FROM q JOIN f c ON q.i = c.i AND c.vec_id <> q.vec_id
             |       GROUP BY 1, 2),
             |sx AS (SELECT qid, cid, round(dot / (x.nrm * y.nrm), 4) sim
             |       FROM dx JOIN n x ON x.vec_id = qid JOIN n y ON y.vec_id = cid),
             |ex AS (SELECT qid, cid FROM (
             |         SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) rn FROM sx)
             |       WHERE rn <= 10),
             |db AS (SELECT q.vec_id qid, c.vec_id cid, SUM(CAST(q.v AS DOUBLE) * CAST(c.v AS DOUBLE)) dot
             |       FROM q JOIN f c ON q.i = c.i AND c.vec_id <> q.vec_id AND c.label = q.label
             |       GROUP BY 1, 2),
             |sb AS (SELECT qid, cid, round(dot / (x.nrm * y.nrm), 4) sim
             |       FROM db JOIN n x ON x.vec_id = qid JOIN n y ON y.vec_id = cid),
             |ab AS (SELECT qid, cid FROM (
             |         SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) rn FROM sb)
             |       WHERE rn <= 10)
             |SELECT ex.qid, CAST(COUNT(*) AS BIGINT) AS n_exact,
             |  CAST(COUNT(ab.cid) AS BIGINT) AS n_hits,
             |  CAST(1000 * COUNT(ab.cid) // COUNT(*) AS BIGINT) AS recall_permille
             |FROM ex LEFT JOIN ab ON ab.qid = ex.qid AND ab.cid = ex.cid
             |GROUP BY ex.qid""".stripMargin)),
    Q("e03_cosine_neardups", (s, dir) => cosineNearDups(s, dir),
      Some("""WITH f AS (SELECT vec_id, label, unnest(embedding) v, generate_subscripts(embedding, 1) i FROM embeddings),
             |n AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) nrm FROM f GROUP BY vec_id),
             |d AS (SELECT a.vec_id va, b.vec_id vb, SUM(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) dot
             |      FROM f a JOIN f b ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
             |      GROUP BY 1, 2)
             |SELECT va AS vec_a, vb AS vec_b, sim FROM (
             |  SELECT va, vb, round(dot / (x.nrm * y.nrm), 4) sim
             |  FROM d JOIN n x ON x.vec_id = va JOIN n y ON y.vec_id = vb)
             |WHERE sim >= 0.3""".stripMargin)),

    // --- d39: semantic dedup (SemDeDup) -------------------------------------
    // Embedding-space near-duplicate REMOVAL, the SemDeDup recipe (Abbas
    // et al. 2023, arXiv:2303.09540): k-means-cluster the corpus, compare
    // pairs only WITHIN a cluster, and drop every vector whose cosine to
    // a lower-id cluster-mate exceeds the threshold (keep-first, like
    // d01/d19). e03 finds near-dup pairs by a metadata bucket; d39 makes
    // the bucket LEARNED, which is what lets the recipe scale: k grows
    // with the corpus so the per-cluster pair join stays bounded at
    // ~(N/k)² per cell — the corpus is never all-pairs compared, and
    // the only global stages are the (broadcast-centroid) assignment
    // scan and a hash groupBy.
    //
    // Oracled like e04: the learned assignment is exported (CACHED, so
    // the export observes exactly the frames the result used — centroid
    // learning averages doubles, not re-runnable bit-identically) and
    // DuckDB independently recomputes every within-cluster cosine and
    // the keep/drop verdicts from it.
    Q("d39_semdedup",
      (s, dir) => d39Parts(s, dir)._1,
      Some("""WITH f AS (SELECT vec_id, unnest(embedding) v, generate_subscripts(embedding, 1) i FROM embeddings),
             |n AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) nrm FROM f GROUP BY vec_id),
             |a AS (SELECT vec_id, cell FROM '{OUT}/_aux/d39_semdedup/aux_assign/*.parquet'),
             |p AS (SELECT x.vec_id AS va, y.vec_id AS vb FROM a x
             |      JOIN a y ON x.cell = y.cell AND x.vec_id < y.vec_id),
             |d AS (SELECT p.va, p.vb, SUM(CAST(af.v AS DOUBLE) * CAST(bf.v AS DOUBLE)) dot
             |      FROM p JOIN f af ON af.vec_id = p.va
             |             JOIN f bf ON bf.vec_id = p.vb AND bf.i = af.i
             |      GROUP BY 1, 2),
             |dr AS (SELECT DISTINCT vb AS vec_id FROM d
             |       JOIN n x ON x.vec_id = va JOIN n y ON y.vec_id = vb
             |       WHERE round(dot / (x.nrm * y.nrm), 4) >= 0.3)
             |SELECT a.vec_id, a.cell,
             |  CASE WHEN dr.vec_id IS NULL THEN CAST(1 AS BIGINT)
             |       ELSE CAST(0 AS BIGINT) END AS kept
             |FROM a LEFT JOIN dr ON dr.vec_id = a.vec_id""".stripMargin),
      aux = Seq(
        "aux_assign" -> ((s: SparkSession, dir: String) => d39Parts(s, dir)._2))),

    // --- e12: signed-random-projection LSH (cosine LSH) --------------------
    // The INDEX-FREE ANN family member (Charikar 2002 SimHash for real
    // vectors): e04/e05/e06 need a training pass (Lloyd iterations) before
    // they can search; SRP needs none — 8 fixed hyperplanes whose sign
    // bits form an 8-bit bucket code, computed in ONE embarrassingly-
    // parallel scan. Candidates = bucket equality under Hamming≤1
    // multiprobe (9 probe codes per query), then an exact cosine re-rank
    // of the tiny candidate set. At 100 TB you'd widen the code (24+
    // bits), persist the coded corpus bucketed by code, and the probe
    // join becomes a shuffle-free bucket lookup; here the 9-probe query
    // side is broadcast so the corpus is scanned once and never shuffled.
    //
    // Cross-engine exactness: hyperplane weights are md5-derived integers
    // (same 32-bit-prefix idiom as q48/q52) in [-1000, 1000]; each
    // coordinate is integerized PER TERM (floor(1e6·x + 0.5)) before the
    // signed projection, so the sign test is exact integer arithmetic and
    // codes are bit-identical in both engines. The re-rank reuses e01's
    // oracled round-before-rank cosine.
    Q("e12_srp_lsh",
      (s, dir) => srpAnn(s, dir),
      Some("""WITH pl AS (SELECT p, i, CAST(concat('0x', substr(md5('srp:' || p || ':' || i), 1, 8)) AS BIGINT) % 2001 - 1000 AS w
             |            FROM range(8) t(p), range(64) u(i)),
             |f AS (SELECT vec_id, CAST(v AS DOUBLE) AS v, i FROM (
             |        SELECT vec_id, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i FROM embeddings)),
             |n AS (SELECT vec_id, sqrt(SUM(v * v)) nrm FROM f GROUP BY vec_id),
             |qv AS (SELECT vec_id, i, CAST(floor(1000000 * v + 0.5) AS BIGINT) AS q FROM f),
             |bits AS (SELECT qv.vec_id, pl.p, CASE WHEN SUM(pl.w * qv.q) > 0 THEN 1 ELSE 0 END AS b
             |         FROM qv JOIN pl ON pl.i = qv.i - 1 GROUP BY 1, 2),
             |cds AS (SELECT vec_id, CAST(SUM(b * (CAST(1 AS BIGINT) << p)) AS BIGINT) AS code FROM bits GROUP BY 1),
             |pr AS (SELECT c.vec_id AS qid, xor(c.code, m.m) AS pc
             |       FROM cds c CROSS JOIN (SELECT CAST(unnest([0, 1, 2, 4, 8, 16, 32, 64, 128]) AS BIGINT) AS m) m
             |       WHERE c.vec_id < 30),
             |cand AS (SELECT p.qid, c.vec_id AS cid FROM pr p JOIN cds c ON c.code = p.pc AND c.vec_id <> p.qid),
             |d AS (SELECT cand.qid, cand.cid, SUM(a.v * b.v) AS dot
             |      FROM cand JOIN f a ON a.vec_id = cand.qid JOIN f b ON b.vec_id = cand.cid AND b.i = a.i
             |      GROUP BY 1, 2),
             |sc AS (SELECT qid, cid, round(dot / (x.nrm * y.nrm), 4) AS sim
             |       FROM d JOIN n x ON x.vec_id = qid JOIN n y ON y.vec_id = cid)
             |SELECT qid, cid, sim FROM (
             |  SELECT qid, cid, sim, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) rn FROM sc)
             |WHERE rn <= 5""".stripMargin)),

    // --- e13: binary (sign) quantization + Hamming search -----------------
    // The 64×-compression extreme of the quantization ladder (e07 int8,
    // e05/e06 PQ): each 64-dim vector collapses to ONE BIGINT of sign
    // bits and distance becomes `bit_count(xor(codes))` — a single
    // codegen'd instruction pair per candidate, the cheapest possible
    // first-stage filter for a 100 TB corpus (the corpus scan reads 8
    // bytes/vector; e08's two-stage pattern would re-rank the survivors
    // with exact cosine). The 64-term pack is statically unrolled to a
    // flat bitwise-OR of plan-time literals (the unrolled-HOF
    // discipline); sign tests compare the SAME stored floats in both
    // engines, so codes — and every Hamming distance — are bit-identical
    // cross-engine with no export.
    Q("e13_binary_hamming",
      (s, dir) => {
        t(s, dir, "embeddings").createOrReplaceTempView("embeddings_e13")
        s.sql(e13Body(i => s"embedding[$i]", (a, b) => s"$a ^ $b",
          "embeddings_e13"))
      },
      Some(e13Body(i => s"CAST(embedding[${i + 1}] AS DOUBLE)",
        (a, b) => s"xor($a, $b)", "embeddings"))),

    // --- e14: hybrid lexical+dense retrieval (reciprocal-rank fusion) ------
    // RRF (Cormack et al., SIGIR 2009): combine rankers in RANK space,
    // score = Σ 1/(60 + rank) — no score calibration between heterogeneous
    // rankers needed, which is why it's the standard fusion for hybrid
    // retrieval in RAG/training-data pipelines. Ranker A is e01's dense
    // cosine over ALL embeddings; ranker B a lexical distinct-token
    // Jaccard whose corpus is restricted to the intersection
    // (documents ⋉ embeddings — at sf0.1 the 2000 embedded docs out of
    // 5000). Only the LEXICAL arm is intersection-restricted; the dense
    // arm deliberately ranks every embedding (an embedding without a
    // text row can still be retrieved by vector similarity — RRF then
    // fuses whatever each arm can rank; in the fixtures embedding ids
    // happen to be a subset of document ids, so the arms coincide). The
    // two rankers are genuinely independent signals, fused per query
    // into one top-k. Each ranker is a broadcast-queries × corpus linear scan (the
    // corpus is never shuffled); the fusion groupBy sees only ≤2·kEach
    // rows per query. Cross-engine exactness: the RRF contribution is
    // integer floor-division (1e9 div (60+rank)), the Jaccard is
    // integer-scaled floor-division (1e6·|∩| div |∪|), and cosine reuses
    // e01's round-before-rank contract; ties break on cid everywhere.
    Q("e14_hybrid_rrf",
      (s, dir) => hybridRrf(s, dir),
      Some("""WITH f AS (SELECT vec_id, unnest(embedding) v, generate_subscripts(embedding, 1) i FROM embeddings),
             |n AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) nrm FROM f GROUP BY vec_id),
             |qf AS (SELECT * FROM f WHERE vec_id < 10),
             |dd AS (SELECT qf.vec_id qid, c.vec_id cid, SUM(CAST(qf.v AS DOUBLE) * CAST(c.v AS DOUBLE)) dot
             |       FROM qf JOIN f c ON qf.i = c.i AND c.vec_id <> qf.vec_id
             |       GROUP BY 1, 2),
             |ra AS (SELECT qid, cid,
             |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY round(dot / (x.nrm * y.nrm), 4) DESC, cid) r
             |       FROM dd JOIN n x ON x.vec_id = qid JOIN n y ON y.vec_id = cid),
             |docs AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS wd
             |         FROM documents WHERE doc_id IN (SELECT vec_id FROM embeddings)),
             |qd AS (SELECT doc_id AS qid, wd AS qw FROM docs WHERE doc_id < 10),
             |lx AS (SELECT qid, c.doc_id cid,
             |         CAST(CAST(1000000 AS BIGINT) * len(list_intersect(qw, c.wd)) //
             |           (len(qw) + len(c.wd) - len(list_intersect(qw, c.wd))) AS BIGINT) jac
             |       FROM qd JOIN docs c ON c.doc_id <> qid),
             |rb AS (SELECT qid, cid,
             |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY jac DESC, cid) r
             |       FROM lx),
             |u AS (SELECT qid, cid, 1000000000 // (60 + r) c FROM ra WHERE r <= 20
             |      UNION ALL
             |      SELECT qid, cid, 1000000000 // (60 + r) c FROM rb WHERE r <= 20),
             |sc AS (SELECT qid, cid, CAST(SUM(c) AS BIGINT) rrf_score FROM u GROUP BY 1, 2)
             |SELECT qid, cid, rrf_score FROM (
             |  SELECT qid, cid, rrf_score,
             |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf_score DESC, cid) rn FROM sc)
             |WHERE rn <= 10""".stripMargin),
      headline = true),

    // --- d50: MMR diversified selection (Carbonell & Goldstein 1998) -------
    // The diversity-aware sampling step a training-data pipeline runs when
    // a top-k by relevance alone would be redundant: greedily pick k items
    // maximizing λ·rel − (1−λ)·max-sim-to-already-picked (λ=0.7, ×10
    // integer weights). The greedy loop runs over a SHORTLIST (top-40 by
    // relevance — the standard rerank-window shape), so the one driver
    // collect is shortlist²-bounded (1,600 rows) and INDEPENDENT of corpus
    // size: the corpus-scale work is the broadcast-query relevance scan
    // and the 40-row pairwise sim join, both linear. Scores are integer
    // (floor-scaled e4 cosines, e01's round-before-rank contract + the
    // floor(x·1e4+0.5) idiom), so both engines pick identical items;
    // DuckDB replays the greedy loop as a recursive CTE carrying the
    // chosen list.
    Q("d50_mmr_diversify",
      (s, dir) => mmrDiversify(s, dir),
      Some("""WITH RECURSIVE
             |f AS (SELECT vec_id, unnest(embedding) v, generate_subscripts(embedding, 1) i FROM embeddings),
             |n AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) nrm FROM f GROUP BY vec_id),
             |q AS (SELECT * FROM f WHERE vec_id = 0),
             |rel AS (SELECT c.vec_id cid,
             |          CAST(floor(round(SUM(CAST(q.v AS DOUBLE) * CAST(c.v AS DOUBLE)) / (x.nrm * y.nrm), 4) * 10000 + 0.5) AS BIGINT) rel_e4
             |        FROM q JOIN f c ON q.i = c.i AND c.vec_id <> 0
             |        JOIN n x ON x.vec_id = 0 JOIN n y ON y.vec_id = c.vec_id
             |        GROUP BY c.vec_id, x.nrm, y.nrm),
             |short AS (SELECT cid, rel_e4 FROM rel ORDER BY rel_e4 DESC, cid LIMIT 40),
             |sims AS (SELECT a.cid a, b.cid b,
             |           CAST(floor(round(SUM(CAST(af.v AS DOUBLE) * CAST(bf.v AS DOUBLE)) / (x.nrm * y.nrm), 4) * 10000 + 0.5) AS BIGINT) sim_e4
             |         FROM short a JOIN short b ON a.cid <> b.cid
             |         JOIN f af ON af.vec_id = a.cid JOIN f bf ON bf.vec_id = b.cid AND bf.i = af.i
             |         JOIN n x ON x.vec_id = a.cid JOIN n y ON y.vec_id = b.cid
             |         GROUP BY a.cid, b.cid, x.nrm, y.nrm),
             |pick(step, cid, mmr_e4, chosen) AS (
             |  (SELECT 1, cid, 7 * rel_e4, [cid] FROM short ORDER BY 7 * rel_e4 DESC, cid LIMIT 1)
             |  UNION ALL
             |  (SELECT p.step + 1, s.cid, s.mmr, list_append(p.chosen, s.cid)
             |   FROM pick p, LATERAL (
             |     SELECT c.cid, 7 * c.rel_e4 - 3 * (SELECT MAX(sim_e4) FROM sims
             |                                       WHERE a = c.cid AND list_contains(p.chosen, b)) AS mmr
             |     FROM short c WHERE NOT list_contains(p.chosen, c.cid)
             |     ORDER BY mmr DESC, c.cid LIMIT 1) s
             |   WHERE p.step < 10)
             |)
             |SELECT CAST(step AS BIGINT) step, cid, CAST(mmr_e4 AS BIGINT) mmr_e4
             |FROM pick""".stripMargin))
  )

  /** d50's Spark side — see the Q entry's comment. The distributed stages
    * are the relevance scan and the shortlist pairwise-sim join; the
    * greedy argmax loop itself runs on the driver over the collected
    * shortlist (shortlist² rows, corpus-independent — the k-row-centroid
    * class of justified collect).
    */
  private[graft] def mmrDiversify(s: SparkSession, dir: String, qid: Long = 0L,
      shortlistN: Int = 40, k: Int = 10): DataFrame = {
    import s.implicits._
    val emb = withNorm(t(s, dir, "embeddings"))
    val q = emb.filter(col("vec_id") === qid).select(col("e").as("qe"))
    val relE4 = floor(sim * lit(10000) + lit(0.5)).cast("long")
    val short = emb.crossJoin(broadcast(q)).filter(col("vec_id") =!= qid)
      .select(col("vec_id").as("cid"), relE4.as("rel_e4"))
      .orderBy(col("rel_e4").desc, col("cid").asc).limit(shortlistN)
    val sv = emb.join(broadcast(short), col("vec_id") === col("cid"))
      .select(col("cid"), col("e"), col("rel_e4"))
    val rels = sv.select("cid", "rel_e4").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sims = sv.select(col("cid").as("a"), col("e").as("qe"))
      .crossJoin(sv.select(col("cid").as("b"), col("e")))
      .filter(col("a") =!= col("b"))
      .select(col("a"), col("b"), relE4.as("sim_e4"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    var chosen = Vector.empty[Long]
    val out = Vector.newBuilder[(Long, Long, Long)]
    var step = 1
    var remaining = rels.keySet
    // stop early when the shortlist is exhausted (k > |shortlist| on a
    // tiny corpus) — the oracle's recursive CTE ends the same way when
    // its LATERAL argmax returns no row
    while (step <= k && remaining.nonEmpty) {
      val best = remaining.iterator.map { c =>
        val score =
          if (chosen.isEmpty) 7L * rels(c)
          else 7L * rels(c) - 3L * chosen.map(b => sims((c, b))).max
        (c, score)
      }.minBy { case (c, sc) => (-sc, c) }
      chosen :+= best._1
      remaining -= best._1
      out += ((step.toLong, best._1, best._2))
      step += 1
    }
    out.result().toDF("step", "cid", "mmr_e4")
  }

  /** e14's two-ranker hybrid — see the Q entry's comment. kEach is each
    * ranker's contribution depth, kOut the fused top-k.
    */
  private[graft] def hybridRrf(s: SparkSession, dir: String,
      nQueries: Int = 10, kEach: Int = 20, kOut: Int = 10): DataFrame = {
    // dense arm: e01's broadcast-queries cosine scan, ranked per query
    val emb = withNorm(t(s, dir, "embeddings"))
    val qe = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val wA = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid").asc)
    val dense = emb.crossJoin(broadcast(qe))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"), sim.as("sim"))
      .withColumn("r", row_number().over(wA)).filter(col("r") <= kEach)
    // lexical arm: distinct-token Jaccard over the embedded docs' text
    val ids = t(s, dir, "embeddings").select(col("vec_id"))
    val docs = t(s, dir, "documents")
      .join(ids, col("doc_id") === col("vec_id"), "left_semi")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("wd"))
    val qd = docs.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("qid"), col("wd").as("qw"))
    val wB = Window.partitionBy("qid").orderBy(col("jac").desc, col("cid").asc)
    val lexical = docs.crossJoin(broadcast(qd))
      .filter(col("doc_id") =!= col("qid"))
      .select(col("qid"), col("doc_id").as("cid"),
        expr("""CAST(CAST(1000000 AS BIGINT) * size(array_intersect(qw, wd)) div
               |  (size(qw) + size(wd) - size(array_intersect(qw, wd))) AS BIGINT)""".stripMargin)
          .as("jac"))
      .withColumn("r", row_number().over(wB)).filter(col("r") <= kEach)
    // rank-space fusion: Σ 1e9 div (60 + rank), integer-exact
    val contrib = dense.select(col("qid"), col("cid"),
        expr("1000000000 div (60 + r)").as("c"))
      .unionByName(lexical.select(col("qid"), col("cid"),
        expr("1000000000 div (60 + r)").as("c")))
    val wO = Window.partitionBy("qid")
      .orderBy(col("rrf_score").desc, col("cid").asc)
    contrib.groupBy("qid", "cid").agg(sum(col("c")).as("rrf_score"))
      .withColumn("rn", row_number().over(wO)).filter(col("rn") <= kOut)
      .select("qid", "cid", "rrf_score")
  }

  /** e13's shared SQL body: `elem` is the 0-based array accessor in each
    * dialect, `xorf` the bitwise-xor syntax (Spark `^`, DuckDB `xor()` —
    * DuckDB's `^` is POWER). Bit 63's literal is written as an
    * expression both parsers keep in BIGINT.
    */
  private def e13Body(elem: Int => String, xorf: (String, String) => String,
      tbl: String): String = {
    val pack = (0 until 64).map { i =>
      val bit =
        if (i == 63) "(-9223372036854775807 - 1)"
        else (1L << i).toString
      s"CASE WHEN ${elem(i)} > 0 THEN $bit ELSE 0 END"
    }.mkString("(", " | ", ")")
    s"""WITH c AS (SELECT vec_id, $pack AS code FROM $tbl),
       |q AS (SELECT vec_id AS qid, code AS qc FROM c WHERE vec_id < 10),
       |d AS (SELECT qid, c.vec_id AS cid,
       |        CAST(bit_count(${xorf("qc", "c.code")}) AS BIGINT) AS hamming
       |      FROM q JOIN c ON c.vec_id <> qid)
       |SELECT qid, cid, hamming FROM (
       |  SELECT qid, cid, hamming,
       |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY hamming, cid) AS rn
       |  FROM d)
       |WHERE rn <= 10""".stripMargin
  }

  /** d39 memo: result + exported assignment from ONE fit (same contract
    * as e04's memo — the aux must be the exact frames the result used).
    */
  // --- e12 implementation -------------------------------------------------
  private val SrpPlanes = 8
  private val SrpDims = 64

  /** Deterministic hyperplane weights: 32-bit md5 prefix of "srp:p:i"
    * mod-centered into [-1000, 1000] — the exact integers the oracle
    * derives from the same md5 text (q48's cross-engine hash idiom), so
    * bucket codes are bit-identical in both engines with no shipped
    * weight table.
    */
  private lazy val srpW: Array[Array[Long]] =
    Array.tabulate(SrpPlanes, SrpDims) { (p, i) =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"srp:$p:$i".getBytes("UTF-8"))
      val h = d.take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      h % 2001L - 1000L
    }

  /** (vec_id, e, code): the 8-bit SRP bucket code per vector. Two-step
    * projection — integerize each coordinate ONCE into qv0..qv63, then
    * 8 flat codegen'd signed sums over plan-time-literal weights (the
    * unrolled-HOF discipline of the late-round-6 perf pass).
    */
  private def srpCoded(emb: DataFrame): DataFrame = {
    val qv = (0 until SrpDims).map(i =>
      expr(s"CAST(floor(1000000 * element_at(e, ${i + 1}) + 0.5) AS BIGINT)")
        .as(s"qv$i"))
    val code = (0 until SrpPlanes).map { p =>
      val dot = (0 until SrpDims).map(i => s"(${srpW(p)(i)}L * qv$i)").mkString(" + ")
      s"(CASE WHEN ($dot) > 0 THEN ${1L << p}L ELSE 0L END)"
    }.mkString(" + ")
    emb.select(col("vec_id") +: col("e") +: qv: _*)
      .select(col("vec_id"), col("e"), expr(code).as("code"))
  }

  /** SRP-LSH ANN: code the corpus, multiprobe each query's bucket under
    * Hamming≤1 (exact + 8 one-bit flips), exact-cosine re-rank.
    */
  def srpAnn(s: SparkSession, dir: String, nQueries: Int = 30, k: Int = 5): DataFrame = {
    val coded = srpCoded(withNorm(t(s, dir, "embeddings")))
    val masks = (0L +: (0 until SrpPlanes).map(p => 1L << p)).map(lit(_))
    val probes = coded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("code").as("qcode"))
      .withColumn("m", explode(array(masks: _*)))
      .select(col("qid"), col("qe"), expr("qcode ^ m").as("pc"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid").asc)
    coded.join(broadcast(probes),
        col("code") === col("pc") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"), sim.as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "cid", "sim")
  }

  private val d39Memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (DataFrame, DataFrame)]
  private def d39Parts(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    d39Memo.getOrElseUpdate((s, dir), {
      val (_, assignedRaw) = graft.operators.KMeansIvf.fit(
        t(s, dir, "embeddings"), k = 8, iterations = 3)
      val assigned = assignedRaw.cache() // (vec_id, e, cell)
      val mates = assigned.select(col("vec_id").as("qid"), col("cell"),
        col("e").as("qe"))
      // within-cluster keep-first: vec dropped iff some LOWER-id
      // cluster-mate is within the cosine threshold
      val dropped = assigned.join(mates, "cell")
        .filter(col("qid") < col("vec_id"))
        .select(col("vec_id"), sim.as("sim"))
        .filter(col("sim") >= 0.3)
        .select("vec_id").distinct()
      val result = assigned.select("vec_id", "cell")
        .join(dropped.withColumn("dr", lit(1L)), Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell"),
          when(col("dr").isNull, lit(1L)).otherwise(lit(0L)).as("kept"))
      (result, assigned.select("vec_id", "cell"))
    })
}
