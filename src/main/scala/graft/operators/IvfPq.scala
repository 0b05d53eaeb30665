package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.cosine_sim

/** The production ANN shape at 100 TB: IVF cell restriction (KMeansIvf)
  * fused with product-quantization compression (PqAnn). A query probes
  * its `nprobe` closest coarse cells and ADC-scans ONLY the compressed
  * codes of vectors living in those cells — candidate work drops by
  * ~cells/nprobe while the scanned bytes drop by the PQ compression
  * factor, which is what makes a trillion-vector index tractable
  * (IVFADC, Jégou et al. TPAMI 2011 §IV).
  *
  * Plan shape: centroids and per-query distance tables are broadcast
  * (both tiny); the corpus-side work is one broadcast-join probe per
  * candidate and one (qid, cid) aggregation — linear, no corpus
  * shuffle beyond the final score rollup.
  *
  * Metrics: cell probing reuses the IVF operator's cosine geometry;
  * ADC scoring is integer-unit L2 (PqAnn) — each half is exactly
  * replayable from the exported index frames.
  */
object IvfPq {

  /** @return (result (qid, cid, dist_e6),
    *          assign (vec_id, cell), probes (qid, cell),
    *          codebooks (sub_m, code, ce), codes (vec_id, sub_m, code))
    *          — index frames CACHED so aux exports observe exactly what
    *          the result used.
    */
  def searchWithIndex(emb: DataFrame,
      cells: Int, cellIterations: Int, nprobe: Int,
      m: Int, k: Int, pqIterations: Int,
      nQueries: Int, topK: Int): (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val (centroids, assignedRaw) = KMeansIvf.fit(emb, cells, cellIterations)
    val assigned = assignedRaw.cache()
    val (codebooks, codes, dsub) = PqAnn.fitEncode(emb, m, k, pqIterations)

    // nprobe closest cells per query (cosine, as the cells were learned)
    val q = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val wq = Window.partitionBy("qid").orderBy(col("csim").desc, col("cell").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("qid"), col("cell"), cosine_sim(col("qe"), col("ce")).as("csim"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select("qid", "cell")
      .cache()

    // candidates: vectors in a probed cell; then ADC over their codes only
    val cand = assigned.select(col("vec_id"), col("cell"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"))
    val qtab = PqAnn.queryTables(emb, codebooks, dsub, nQueries)
    val wk = Window.partitionBy("qid").orderBy(col("dist_e6").asc, col("cid").asc)
    val result = cand
      .join(codes, Seq("vec_id"))
      .join(broadcast(qtab), Seq("qid", "sub_m", "code"))
      .groupBy(col("qid"), col("vec_id").as("cid"))
      .agg(sum(col("di")).as("dist_e6"))
      .withColumn("rn", row_number().over(wk)).filter(col("rn") <= topK)
      .select("qid", "cid", "dist_e6")
    (result, assigned.select("vec_id", "cell"), probes, codebooks, codes)
  }
}
