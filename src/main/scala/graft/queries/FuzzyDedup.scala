package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-path near-duplicate detection: MinHash+LSH, SimHash, and
  * winnowing fingerprints. These are the 100 TB versions of
  * [[TextOps]] d05's brute-force Jaccard: candidate generation is a
  * band-bucket equijoin (linear shuffle), never an all-pairs product.
  *
  * Everything is built from codegen'd Spark built-ins (`xxhash64`,
  * higher-order array functions, `bit_count`) — no UDFs, no RDDs — so
  * whole-stage codegen covers the hot path and the shuffles are the only
  * data movement. No DuckDB oracle (xxhash64 is Spark-specific); these are
  * validated against the exact-Jaccard baseline in ScalaTest instead.
  */
object FuzzyDedup {
  import Tables.t

  /** 64 minhash permutations → 16 bands × 4 rows. Pair probability at
    * jaccard j is 1-(1-j^4)^16: ~0.04 at j=0.3, ~0.93 at j=0.8 — tuned to
    * recover the planted >=0.8 near-dups with few false candidates.
    */
  val NumPerms = 64
  val Bands = 16
  val RowsPerBand: Int = NumPerms / Bands

  /** doc_id + word-bigram shingle hashes. Deliberately NOT deduplicated:
    * `min()` is insensitive to duplicates, so minhash signatures are
    * identical either way and skipping the distinct saves a full shuffle —
    * the signature aggregation becomes the only wide stage.
    */
  private def shingleHashes(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        explode(expr(
          "transform(sequence(0, size(ws)-2), i -> concat(ws[i], ' ', ws[i+1]))")).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))

  /** One row per doc: the 64-slot minhash signature, computed by the
    * custom [[graft.functions.MinHashAgg]] aggregate — the whole signature
    * is ONE aggregation buffer updated in a tight loop (vs. 64 separate
    * `min()` columns, which need `codegen.maxFields` headroom and 64
    * hash-map slots per group). Map-side partial aggregation applies
    * (elementwise-min merge is commutative/associative).
    */
  def signatures(docs: DataFrame): DataFrame =
    shingleHashes(docs)
      .groupBy("doc_id")
      .agg(graft.functions.MinHashAgg.minhash_sig(col("h"), NumPerms).as("sig"))

  /** LSH candidate pairs: hash each band's signature slice to a bucket,
    * self-join buckets. The join key (band, bucket) keeps the shuffle
    * linear in corpus size; no cross product ever materializes.
    */
  def candidatePairs(sigs: DataFrame): DataFrame = {
    val banded = sigs.select(
      col("doc_id"),
      col("sig"),
      posexplode(expr(
        s"transform(sequence(0, ${Bands - 1}), b -> xxhash64(concat_ws(',', slice(sig, b * $RowsPerBand + 1, $RowsPerBand))))")))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
  }

  /** Jaccard estimate = fraction of agreeing signature slots. */
  def estimate(pairs: DataFrame): DataFrame =
    pairs.select(
      col("doc_a"), col("doc_b"),
      expr(s"""CAST(1000 * aggregate(zip_with(sig_a, sig_b, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),
              | 0, (acc, v) -> acc + v) div $NumPerms AS BIGINT)""".stripMargin)
        .as("est_jaccard_permille"))

  def minhashNearDups(s: SparkSession, dir: String): DataFrame =
    // signatures feed both sides of the band self-join: cache them
    estimate(candidatePairs(signatures(t(s, dir, "documents")).cache()))
      .filter(col("est_jaccard_permille") >= 300)

  // --- SimHash ---------------------------------------------------------------

  /** 64-bit SimHash per doc over word-bigram shingles (unigrams are too
    * common across docs to discriminate): per-bit vote of shingle hashes.
    * Bit i of the fingerprint is 1 iff more shingle hashes have bit i set
    * than not.
    */
  def simhashes(docs: DataFrame): DataFrame = {
    val votes: Seq[Column] = (0 until 64).map { i =>
      sum(when(expr(s"(h >> $i) & 1") === 1, 1L).otherwise(-1L)).as(s"v$i")
    }
    val fp = (0 until 64)
      .map(i => s"(CASE WHEN v$i > 0 THEN 1 ELSE 0 END) << $i")
      .mkString(" | ")
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws)-2), i -> concat(ws[i], ' ', ws[i+1]))")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
      .groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), expr(s"CAST($fp AS BIGINT)").as("simhash"))
  }

  /** Near-dup pairs by Hamming distance, blocked on a 16-bit prefix so the
    * join stays linear (near-dups almost always share the prefix; the
    * standard multi-probe trick — rotate the block — is a trivial
    * extension).
    */
  def simhashNearDups(s: SparkSession, dir: String, maxHamming: Int = 6): DataFrame = {
    val fp = simhashes(t(s, dir, "documents"))
      .withColumn("block", expr("simhash >> 48"))
    fp.as("a")
      .join(fp.as("b"),
        col("a.block") === col("b.block") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // --- Winnowing fingerprints ------------------------------------------------

  /** Character-8-gram rolling hashes, winnowed: keep each window-of-16
    * minimum (the standard winnowing scheme) → compact, position-robust
    * document fingerprints. Emitted exploded: (doc_id, fingerprint).
    */
  def fingerprints(docs: DataFrame, k: Int = 8, window: Int = 16): DataFrame =
    docs
      .select(col("doc_id"),
        expr(s"transform(sequence(1, greatest(length(text) - ${k - 1}, 1)), i -> xxhash64(substring(text, i, $k)))")
          .as("kh"))
      .select(col("doc_id"),
        explode(expr(
          s"array_distinct(transform(sequence(1, greatest(size(kh) - ${window - 1}, 1)), i -> array_min(slice(kh, i, $window))))"))
          .as("fingerprint"))

  val queries: Seq[Q] = Seq(
    Q("d06_minhash_lsh", (s, dir) => minhashNearDups(s, dir), None, headline = true),
    Q("d07_simhash", (s, dir) => simhashNearDups(s, dir), None),
    Q("d08_fingerprints",
      (s, dir) => fingerprints(t(s, dir, "documents"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_fingerprints")),
      None)
  )
}
