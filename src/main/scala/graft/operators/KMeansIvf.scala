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
    * @return (centroids DF (cell, ce), assignments DF (vec_id, e, cell))
    */
  def fit(emb: DataFrame, k: Int, iterations: Int): (DataFrame, DataFrame) = {
    val e = emb.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      .cache()
    var centroids = e.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cell"), col("e").as("ce"))
    for (_ <- 1 to iterations) {
      val assigned = assign(e, centroids)
      centroids = assigned
        .select(col("cell"), posexplode(col("e")))
        .groupBy("cell", "pos")
        .agg(avg("col").as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"),
          expr("transform(pm, x -> x.m)").as("ce"))
    }
    (centroids.cache(), assign(e, centroids))
  }

  /** Nearest-centroid assignment via broadcast join + per-vector argmax. */
  private def assign(e: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cell").asc)
    e.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("e"), col("cell"),
        cosine_sim(col("e"), col("ce")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "e", "cell")
  }

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
