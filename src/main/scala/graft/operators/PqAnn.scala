package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding search at scale: each vector is
  * split into `m` subvectors, each subspace learns a tiny k-code codebook
  * (Lloyd iterations), and every vector compresses to `m` small codes —
  * 64 float dims (256 B) become 8 codes (8 B), a 32× memory cut, which is
  * what lets a 100 TB embedding corpus live in executor memory for
  * asymmetric-distance (ADC) scans. Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011.
  *
  * Scale shape: codebooks are m·k rows (tiny, always broadcast); encode
  * and ADC scoring never shuffle the corpus except for the per-(query,
  * candidate) score aggregation, which is linear in corpus × queries. In
  * production the IVF cells (KMeansIvf) restrict candidates first and PQ
  * compresses what remains — this operator is the compression layer.
  *
  * Determinism: every distance is a sum of PER-DIMENSION integer units
  * (`floor(1e6·diff² + 0.5)` per dim, then integer sums) so no float
  * summation order can flip an argmin or a rank; ties break on lowest
  * code / lowest candidate id. Codebook learning averages doubles
  * (merge-order dependent in the last bits), so consumers needing an
  * external replay must export the cached codebooks/codes frames this
  * class returns — the replay is then exact integer arithmetic.
  */
object PqAnn {

  /** Per-dim-integerized squared L2 distance between two `dsub`-dim
    * arrays; `aOff` offsets into `a` (1-based element_at, matching
    * DuckDB's 1-based list indexing so the oracle SQL is textually
    * parallel).
    *
    * STATICALLY UNROLLED over the plan-time-literal `dsub` (round-6
    * bench win): the previous `aggregate(sequence(1, dsub), ...)` HOF
    * evaluated an interpreted lambda AND allocated a fresh sequence
    * array for every scored row — ~2M rows per Lloyd pass in e05/e06's
    * learning loop. The unrolled sum is plain arithmetic over
    * element_at, fully inside whole-stage codegen; integer addition is
    * associative, so the value is bit-identical to the folded form.
    */
  private def distExpr(a: String, aOff: String, b: String, dsub: Int): String =
    (1 to dsub).map(i =>
      s"""CAST(floor(1000000 *
         |  (element_at($a, $aOff + $i) - element_at($b, $i)) *
         |  (element_at($a, $aOff + $i) - element_at($b, $i)) + 0.5) AS BIGINT)""".stripMargin)
      .mkString("(", " + ", ")")

  /** Learn per-subspace codebooks and encode the whole corpus.
    * @return (codebooks (sub_m, code, ce), codes (vec_id, sub_m, code),
    *         dsub) — frames CACHED so aux exports observe exactly what
    *         downstream scoring used.
    */
  def fitEncode(emb: DataFrame, m: Int, k: Int, iterations: Int): (DataFrame, DataFrame, Int) = {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    // scoped (round 17): `sv` and every encode/codebook frame derive
    // from `e`, so the per-round localCheckpoints and the caller's
    // actions execute under the argmin session clone (raised
    // ObjectHashAggregate fallback threshold scoped to this operator;
    // its collect_list state is bounded by m·k groups × dsub-length
    // lists). See MinStructAgg.scoped.
    val e = graft.functions.MinStructAgg.scoped(
      emb.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))).cache()
    // (vec_id, sub_m, sv): the corpus split into m subvectors per vector
    val sv = e.select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${m - 1}), j -> slice(e, j * $dsub + 1, $dsub))")))
      .toDF("vec_id", "sub_m", "sv")
      .cache() // probed by every encode round — keep the explode off the loop
    val svDist = distExpr("sv", "0", "ce", dsub)

    /** nearest-code assignment: broadcast codebooks, integer argmin.
      * `min(struct(di, code, sv))` compares lexicographically, so ties
      * break on the lowest code exactly like the old sort+row_number
      * window. Round 16: through MinStructAgg (ObjectHashAggregate) —
      * the declarative form planned as SortAggregate (struct buffers
      * aren't UnsafeRow-mutable), sorting the N×k exploded frame by
      * (vec_id, sub_m) on both exchange sides every encode round.
      */
    def encode(cb: DataFrame): DataFrame =
      sv.join(broadcast(cb), Seq("sub_m"))
        .select(col("vec_id"), col("sub_m"), col("sv"), col("code"),
          expr(svDist).as("di"))
        .groupBy("vec_id", "sub_m")
        .agg(graft.functions.MinStructAgg.minStructOrDeclarative(
          struct(col("di"), col("code"), col("sv"))).as("m"))
        .select(col("vec_id"), col("sub_m"),
          col("m.sv").as("sv"), col("m.code").as("code"))

    // init: the first k vectors seed every subspace (deterministic)
    var cb = sv.filter(col("vec_id") < k)
      .select(col("sub_m"), col("vec_id").cast("int").as("code"), col("sv").as("ce"))
    for (_ <- 1 to iterations) {
      val updated = encode(cb)
        .select(col("sub_m"), col("code"), posexplode(col("sv")))
        .groupBy("sub_m", "code", "pos")
        .agg(avg("col").as("mv"))
        .groupBy("sub_m", "code")
        .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).as("pm"))
        .select(col("sub_m"), col("code"), expr("transform(pm, x -> x.mv)").as("nce"))
      // a code that captured no points keeps its previous centroid.
      // EAGER materialization of the m·k-row codebook: a lazy chain makes
      // iteration i re-run iterations 1..i-1 (quadratic recompute —
      // round-5 bench finding on e06)
      cb = cb.join(updated, Seq("sub_m", "code"), "left")
        .select(col("sub_m"), col("code"), coalesce(col("nce"), col("ce")).as("ce"))
        .localCheckpoint()
    }
    val codebooks = cb.cache()
    val codes = encode(codebooks).select("vec_id", "sub_m", "code").cache()
    // codebooks/codes stay cached for aux exports; the loop-scoped
    // frames do not — sv is m× the corpus (the operator's largest frame)
    // and would otherwise pin executor storage for the session lifetime.
    // Materialize codes first so the unpersist can't force a re-explode.
    codes.count()
    sv.unpersist()
    e.unpersist()
    (codebooks, codes, dsub)
  }

  /** ADC distance tables for the first `nQueries` vectors: one integer
    * sub-distance per (query, sub_m, code) — m·k entries per query, built
    * from the FULL query vector (asymmetric: the query is not quantized).
    */
  def queryTables(emb: DataFrame, codebooks: DataFrame, dsub: Int,
      nQueries: Int): DataFrame = {
    val q = emb.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("qe"))
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("qe"))
    q.crossJoin(broadcast(codebooks))
      .select(col("qid"), col("sub_m"), col("code"),
        expr(distExpr("qe", s"sub_m * $dsub", "ce", dsub)).as("di"))
  }

  /** ADC scan: per-(query, candidate) integer sub-distance sum over the
    * codes, top-k under the full (dist ASC, cid ASC) sort key. Pure
    * function of (codes, qtab), so a RELOADED index (IndexStore) scores
    * identically to the just-learned one.
    */
  def adcScore(codes: DataFrame, qtab: DataFrame, topK: Int): DataFrame = {
    val wk = Window.partitionBy("qid").orderBy(col("dist_e6").asc, col("cid").asc)
    codes.join(broadcast(qtab), Seq("sub_m", "code"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id").as("cid"))
      .agg(sum(col("di")).as("dist_e6"))
      .withColumn("rn", row_number().over(wk)).filter(col("rn") <= topK)
      .select("qid", "cid", "dist_e6")
  }

  /** Learn codebooks, encode the corpus, ADC-score the first `nQueries`
    * vectors against the WHOLE corpus (brute compressed scan).
    * @return (result (qid, cid, dist_e6), codebooks (sub_m, code, ce),
    *         codes (vec_id, sub_m, code)) — the latter two CACHED so an
    *         aux export observes exactly what the result used.
    */
  def searchWithIndex(emb: DataFrame, m: Int, k: Int, iterations: Int,
      nQueries: Int, topK: Int): (DataFrame, DataFrame, DataFrame) = {
    val (codebooks, codes, dsub) = fitEncode(emb, m, k, iterations)
    val result = adcScore(codes, queryTables(emb, codebooks, dsub, nQueries), topK)
    (result, codebooks, codes)
  }
}
