package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.cosine_sim

/** IVF (inverted-file) approximate nearest neighbor with learned coarse
  * centroids: deterministic distributed Lloyd's k-means over the embedding
  * column, then search restricted to the `nprobe` closest cells per query.
  *
  * Everything is DataFrame-native and scales: assignment is a
  * broadcast-centroids join (corpus never shuffles for it), the centroid
  * update is an explode + per-(cell, dim) mean — one shuffle per
  * iteration, linear in corpus size. Initialization is the first k vectors
  * by id (deterministic; k-means|| would replace just the init for
  * hostile distributions).
  */
object KMeansIvf {

  /** embeddings → (vec_id, e: array<double>) with cells assigned.
    * @param init "first-k" (deterministic trivial seed) or "kmeans||"
    *             (scalable d²-weighted init, [[initKMeansParallel]])
    * @return (centroids DF (cell, ce), assignments DF (vec_id, e, cell))
    */
  def fit(emb: DataFrame, k: Int, iterations: Int,
      init: String = "first-k"): (DataFrame, DataFrame) = {
    // scoped (round 17): every frame in the operator derives from `e`,
    // so the per-round localCheckpoint actions and the caller's final
    // action all execute under the argmin session clone — the raised
    // ObjectHashAggregate fallback threshold applies to this operator's
    // queries only, not the caller's session. The clone also covers the
    // centroid-update collect_list, whose state is bounded by this
    // operator's own shape (k cells × dim-length lists), not unbounded.
    val e = graft.functions.MinStructAgg.scoped(
      emb.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e")))
      .cache()
    var centroids = init match {
      case "kmeans||" => initKMeansParallel(e, k)
      case _ => e.filter(col("vec_id") < k)
        .select(col("vec_id").cast("int").as("cell"), col("e").as("ce"))
    }
    for (_ <- 1 to iterations) {
      val assigned = assign(e, centroids)
      val updated = assigned
        .select(col("cell"), posexplode(col("e")))
        .groupBy("cell", "pos")
        .agg(avg("col").as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), expr("transform(pm, x -> x.m)").as("nce"))
      // a cell that captured NO points this round keeps its previous
      // centroid (the PqAnn.fitEncode guard): emitting only assigned
      // cells would silently shrink the index below the requested k
      // forever, and searchWithIndex would probe nprobe of fewer cells
      centroids = centroids.join(updated, Seq("cell"), "left")
        .select(col("cell"), coalesce(col("nce"), col("ce")).as("ce"))
        // EAGER materialization of the k-row centroid frame: without it
        // the Lloyd chain stays lazy and iteration i re-runs iterations
        // 1..i-1 (quadratic recompute — round-5 bench finding on e06)
        .localCheckpoint()
    }
    val out = assign(e, centroids)
    // e's cache exists for the Lloyd loop's repeated assigns; the
    // returned assignment recomputes the narrow scan+cast lineage
    // deterministically (centroids are localCheckpoint'd, argmax
    // tie-breaks are total), so RELEASE the corpus-size cache instead of
    // pinning it for the session — the PqAnn.fitEncode discipline.
    // Callers needing aux-export consistency cache the assignment
    // itself (searchWithIndex does).
    e.unpersist()
    (centroids.cache(), out)
  }

  /** Scalable k-means|| initialization (Bahmani et al., VLDB 2012),
    * deterministic end to end — safe for hostile distributions where
    * first-k seeding collapses (all seeds in one dense region):
    *
    *   - each round broadcasts the current candidate set, scores every
    *     point's distance-to-nearest (1 − cosine, the metric Lloyd uses),
    *     and samples points with probability `oversample · d² / φ`;
    *   - "random" draws are `xxhash64(vec_id, round)` uniforms and φ is a
    *     sum of 1e6-scaled integer d² values, so both the coin and the
    *     threshold are bit-identical across runs and partitionings (a
    *     double-sum φ would be merge-order dependent and could flip a
    *     marginal sample);
    *   - candidates stay tiny (≤ rounds·oversample + 1), so the final
    *     weighted reduction to k centroids — weighted kmeans++ with
    *     index tie-breaks — runs on the driver in O(|cand|²·k).
    *
    * Distributed cost per round: one broadcast + one map + one partial
    * aggregation; the corpus never shuffles.
    */
  def initKMeansParallel(
      e: DataFrame, k: Int, rounds: Int = 4, oversampleFactor: Int = 2): DataFrame = {
    val spark = e.sparkSession
    val oversample = math.max(k * oversampleFactor, 2)

    def dist2Col(cands: Array[Array[Double]]) = {
      // min (1-sim)^2 over candidates; greatest-of-sims keeps ONE codegen
      // expression per candidate (bounded: |cands| <= rounds*oversample)
      val sims = cands.map(c => cosine_sim(col("e"), typedlit(c.toSeq)))
      val best = if (sims.length == 1) sims.head else greatest(sims.toIndexedSeq: _*)
      pow(lit(1.0) - best, 2)
    }

    // deterministic seed: the minimum vec_id's vector
    var cands: Array[Array[Double]] =
      Array(e.orderBy(col("vec_id").asc).head().getSeq[Double](1).toArray)
    for (round <- 1 to rounds) {
      // integer-scaled d² (clamped to the metric's [0,4] range) so φ is an
      // exact BIGINT sum
      val withD2 = e.select(col("vec_id"), col("e"), dist2Col(cands).as("d2"))
        .select(col("vec_id"), col("e"),
          expr("CAST(floor(1000000 * least(4.0, greatest(0.0, d2)) + 0.5) AS BIGINT)").as("d2i"))
      val phi = withD2.agg(sum(col("d2i"))).head().getLong(0) max 1L
      val picked = withD2
        .filter(
          (abs(xxhash64(col("vec_id"), lit(round))) % lit(1000000000L)).cast("double") / 1e9 <
            lit(oversample.toDouble) * col("d2i").cast("double") / lit(phi.toDouble))
        .select(col("vec_id"), col("e"))
        .collect()
      // dedup BY VALUE: Array.distinct compares JVM arrays by reference,
      // so a point sampled in two rounds survived twice — a weight-0
      // twin candidate that could become a duplicate centroid
      cands = (cands ++ picked.map(_.getSeq[Double](1).toArray))
        .map(_.toSeq).distinct.map(_.toArray)
    }

    // weights: points per nearest candidate (index argmin, ties -> lowest)
    val bc = spark.sparkContext.broadcast(cands)
    import spark.implicits._
    val weights = e.select(col("vec_id"), col("e")).as[(Long, Seq[Double])]
      .map { case (_, v) =>
        val arr = v.toArray
        var bi = 0; var bs = -2.0
        var i = 0
        while (i < bc.value.length) {
          val s = cosineSimLocal(arr, bc.value(i))
          if (s > bs + 1e-15) { bs = s; bi = i }
          i += 1
        }
        bi
      }
      .groupByKey(identity).count().collect().toMap

    val centroids = weightedKMeansPlusPlus(cands, cands.indices.map(i => weights.getOrElse(i, 0L).toDouble).toArray, k)
    spark.createDataFrame(
      centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toIndexedSeq)
      .toDF("cell", "ce")
  }

  private def cosineSimLocal(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Driver-side weighted kmeans++ reduction of the candidate set to k
    * centers. Deterministic: the next center is the weighted-d² argmax
    * (no RNG), ties broken by lowest index.
    */
  private def weightedKMeansPlusPlus(
      cands: Array[Array[Double]], w: Array[Double], k: Int): Array[Array[Double]] = {
    if (cands.length <= k) return cands
    val chosen = scala.collection.mutable.ArrayBuffer(0) // heaviest-first would also work; 0 = deterministic
    while (chosen.length < k) {
      var bestIdx = -1; var bestScore = -1.0
      var i = 0
      while (i < cands.length) {
        if (!chosen.contains(i)) {
          var d2 = Double.MaxValue
          chosen.foreach { c =>
            val d = 1.0 - cosineSimLocal(cands(i), cands(c))
            d2 = math.min(d2, d * d)
          }
          val score = w(i) * d2
          if (score > bestScore + 1e-18) { bestScore = score; bestIdx = i }
        }
        i += 1
      }
      chosen += (if (bestIdx < 0) chosen.length else bestIdx)
    }
    chosen.map(cands).toArray
  }

  /** Nearest-centroid assignment via broadcast join + per-vector argmax.
    * One aggregate: `min(struct(-sim, cell, e))` is the (sim DESC,
    * cell ASC) argmax with lexicographic tie-breaks (IEEE negation is
    * exact, so the ordering over FINITE sims is identical to the old
    * sort+row_number window). The round-5 NaN-ordering divergence
    * (window sim-DESC ranks NaN greatest; min(struct(-sim,...)) ranks it
    * last) is UNREACHABLE since cosine_sim defines zero-norm similarity
    * as 0.0 (GraftFunctions.cosine) — every sim is finite, both
    * orderings agree; KMeansSpec pins it with planted zero vectors.
    *
    * Round 16: the argmin runs through MinStructAgg
    * (ObjectHashAggregate) — the declarative `min(struct)` this used to
    * call silently planned as SortAggregate (struct buffers aren't
    * UnsafeRow-mutable), sorting the N×cells exploded frame by vec_id on
    * both exchange sides EVERY learning round; the "one hash aggregate"
    * this comment used to claim was never the executed plan.
    */
  private def assign(e: DataFrame, centroids: DataFrame): DataFrame =
    e.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("e"), col("cell"),
        negate(cosine_sim(col("e"), col("ce"))).as("nsim"))
      .groupBy("vec_id")
      .agg(graft.functions.MinStructAgg.minStructOrDeclarative(
        struct(col("nsim"), col("cell"), col("e"))).as("m"))
      .select(col("vec_id"), col("m.e").as("e"), col("m.cell").as("cell"))

  /** ANN search: score queries against the `nprobe` closest cells only. */
  def search(
      emb: DataFrame, k: Int, iterations: Int,
      nQueries: Int, topK: Int, nprobe: Int): DataFrame =
    searchWithIndex(emb, k, iterations, nQueries, topK, nprobe)._1

  /** [[search]] plus the learned index it ran against: the per-vector cell
    * assignments and the per-query probe cells, both CACHED so exporting
    * them observes exactly the data the search used. (Centroid learning
    * averages doubles — merge-order dependent in the last bits — so a
    * recompute is not guaranteed bit-identical; sharing the cached frames
    * is what makes the aux export consistent with the result.)
    */
  def searchWithIndex(
      emb: DataFrame, k: Int, iterations: Int,
      nQueries: Int, topK: Int, nprobe: Int): (DataFrame, DataFrame, DataFrame) = {
    val (centroids, assignedRaw) = fit(emb, k, iterations)
    val assigned = assignedRaw.cache()
    val q = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    // nprobe candidate cells per query
    val wq = Window.partitionBy("qid").orderBy(col("csim").desc, col("cell").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("qid"), col("qe"), col("cell"),
        cosine_sim(col("qe"), col("ce")).as("csim"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select("qid", "qe", "cell")
      .cache()
    // score only same-cell candidates
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid").asc)
    val result = assigned
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        round(cosine_sim(col("qe"), col("e")), 4).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select("qid", "cid", "sim")
    (result, assigned.select("vec_id", "cell"), probes.select("qid", "cell"))
  }
}
