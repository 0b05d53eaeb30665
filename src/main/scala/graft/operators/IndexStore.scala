package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persistence for learned ANN indexes (SURVEY §9 round-6 #4): the
  * centroid/codebook/code frames that e04/e05/e06 learn per session are
  * plain DataFrames — save them as parquet once, reload in any later
  * session, and score queries WITHOUT re-running Lloyd iterations. This
  * is what makes the ANN family restartable like a real vector store:
  * learning is the expensive, corpus-scan-heavy half; scoring from a
  * loaded index is a broadcast + one scan.
  *
  * The scoring paths ([[PqAnn.adcScore]], [[KMeansIvf]]'s probe) are pure
  * functions of the index frames, so a reloaded index produces
  * bit-identical results to the just-learned one (pinned by
  * OperatorSpec's save/load round-trip) — the same property the oracle
  * gate already relies on when DuckDB rescores the aux-exported frames.
  */
object IndexStore {

  /** Write named index frames under `dir/<name>` (snappy parquet). */
  def save(dir: String, frames: (String, DataFrame)*): Unit =
    frames.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$name")
    }

  /** Reload one index frame saved by [[save]]. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name")

  /** The PQ subvector width implied by a loaded codebook frame
    * (sub_m, code, ce): every centroid `ce` has the same length.
    */
  def dsubOf(codebooks: DataFrame): Int =
    codebooks.select(org.apache.spark.sql.functions.size(
      org.apache.spark.sql.functions.col("ce"))).head().getInt(0)
}
