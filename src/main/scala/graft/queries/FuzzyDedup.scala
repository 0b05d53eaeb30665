package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  * data movement.
  *
  * Oracling (round-2): `xxhash64` itself has no DuckDB equivalent, but
  * everything DOWNSTREAM of the per-doc hash signatures is plain
  * integer/list arithmetic both engines share. Verify exports the
  * signatures as aux parquet and the oracle recomputes banding, the
  * candidate join, the bucket cap, and the estimate in DuckDB — a full
  * independent check of the LSH logic. Hash *quality* (recall vs the
  * exact-Jaccard baseline) stays in ScalaTest.
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

  /** Bucket-size cap (standard LSH hygiene): a (band, bucket) holding more
    * than this many docs is skipped entirely, so a degenerate corpus (many
    * identical documents) cannot make the candidate join quadratic. Real
    * near-dup clusters far smaller than the cap are unaffected.
    */
  val MaxBucketDocs = 64

  /** doc_id + word-bigram shingle hashes — [[TextOps.shingleHashesOf]],
    * the ONE shingle front end shared by the whole Jaccard/sketch family
    * (d45's recall audit depends on both arms shingling identically).
    * Deliberately NOT deduplicated: `min()` is insensitive to duplicates,
    * so minhash signatures are identical either way and skipping the
    * distinct saves a full shuffle — the signature aggregation becomes
    * the only wide stage.
    */
  private def shingleHashes(docs: DataFrame): DataFrame =
    TextOps.shingleHashesOf(docs)

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

  /** One cached signature/fingerprint frame per (session, dir) — the
    * VectorOps memo pattern. d06, d29, AND d45 (which runs the full d06
    * pipeline as one arm) previously each cached their own copy of the
    * same signatures and never released them; the memo makes the sharing
    * explicit and caps retention at one frame per table. Safe because the
    * sketches are order-insensitive (elementwise min / signed-vote sums),
    * so any recompute is bit-identical — the cache is purely perf.
    */
  /** Bounded LRU memo (ADVICE r8): the unbounded TrieMap pinned one
    * cached corpus-sized frame per (session, dir) for the session's
    * LIFETIME — a ScaleRehearsal sweep or a multi-dir test session
    * accumulated them without end. Retention is now capped at the live
    * working set: beyond `maxEntries` the least-recently-used frame is
    * unpersisted and dropped. Safe because the memoized sketches are
    * deterministic and order-insensitive (elementwise min / signed-vote
    * sums), so a re-build after eviction is bit-identical — the cache
    * is purely perf (see the memo doc above).
    */
  private final class FrameMemo(maxEntries: Int) {
    private val m = new java.util.LinkedHashMap[
      (SparkSession, String), DataFrame](8, 0.75f, true) // access order
    def getOrBuild(k: (SparkSession, String))(build: => DataFrame): DataFrame =
      m.synchronized {
        Option(m.get(k)).getOrElse {
          val df = build.cache()
          m.put(k, df)
          while (m.size() > maxEntries) {
            val it = m.entrySet().iterator()
            it.next().getValue.unpersist()
            it.remove()
          }
          df
        }
      }
  }

  private val sigMemo = new FrameMemo(maxEntries = 4)
  private def cachedSignatures(s: SparkSession, dir: String): DataFrame =
    sigMemo.getOrBuild((s, dir))(signatures(t(s, dir, "documents")))
  private val simMemo = new FrameMemo(maxEntries = 4)
  private def cachedSimhashes(s: SparkSession, dir: String): DataFrame =
    simMemo.getOrBuild((s, dir))(simhashes(t(s, dir, "documents")))

  /** LSH candidate pairs: the join key is each band's raw signature slice
    * (4 BIGINTs) — exact bucket equality, no band-hash collisions, and the
    * same bucketing is reproducible in DuckDB from the exported
    * signatures. The (band, slice) equijoin keeps the shuffle linear in
    * corpus size; no cross product ever materializes, and the bucket-size
    * cap bounds the worst (band, bucket) at [[MaxBucketDocs]] docs.
    */
  /** @param bSideFilter restricts the LARGER (`b`) member of each pair —
    *        the incremental-dedup hook (d29): with new ids strictly above
    *        old ids, filtering b to the new batch yields exactly the
    *        new×old ∪ new×new pair set without a second banding copy.
    */
  def candidatePairs(
      sigs: DataFrame, bSideFilter: Column = lit(true)): DataFrame = {
    // band WITHOUT the signature column: the cap window and the self-join
    // shuffle only (doc_id, band, 4-slot bucket) — ~10× narrower rows than
    // carrying the full 64-slot signature through both exchanges. The
    // signatures rejoin below, but only for the (tiny) distinct pair set.
    val banded = sigs.select(
      col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, ${Bands - 1}), b -> slice(sig, b * $RowsPerBand + 1, $RowsPerBand))")))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
    // window count on the join's own keys: the exchange on (band, bucket)
    // is reused by the self-join, so the cap costs no extra shuffle
    val capped = banded
      .withColumn("bn", count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .filter(col("bn") <= MaxBucketDocs)
      .drop("bn")
    val pairs = capped.as("a")
      .join(capped.filter(bSideFilter).as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
  }

  /** Jaccard estimate = fraction of agreeing signature slots. Statically
    * unrolled over the literal slot count (round-6: the zip_with HOF ran
    * an interpreted lambda per candidate pair; the unrolled CASE sum is
    * codegen'd and bit-identical).
    */
  def estimate(pairs: DataFrame): DataFrame =
    pairs.select(
      col("doc_a"), col("doc_b"),
      expr((1 to NumPerms).map(i =>
        s"(CASE WHEN element_at(sig_a, $i) = element_at(sig_b, $i) THEN 1 ELSE 0 END)")
        .mkString(s"CAST(1000 * (", " + ", s") div $NumPerms AS BIGINT)"))
        .as("est_jaccard_permille"))

  def minhashNearDups(s: SparkSession, dir: String): DataFrame =
    // signatures feed both sides of the band self-join: memo-cached
    estimate(candidatePairs(cachedSignatures(s, dir)))
      .filter(col("est_jaccard_permille") >= 300)

  /** DuckDB replay of everything downstream of the exported signatures:
    * banding, bucket cap, candidate join, slot-agreement estimate. */
  private val d06Oracle =
    s"""WITH sig AS (SELECT doc_id, sig FROM '{OUT}/_aux/d06_minhash_lsh/aux_signatures/*.parquet'),
       |banded AS (
       |  SELECT doc_id, sig, r.range AS band,
       |         list_slice(sig, r.range * $RowsPerBand + 1, r.range * $RowsPerBand + $RowsPerBand) AS bucket
       |  FROM sig, range(0, $Bands) r),
       |capped AS (
       |  SELECT * FROM (
       |    SELECT *, COUNT(*) OVER (PARTITION BY band, bucket) AS bn FROM banded)
       |  WHERE bn <= $MaxBucketDocs),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sig_a, b.sig AS sig_b
       |  FROM capped a JOIN capped b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, est_jaccard_permille FROM (
       |  SELECT doc_a, doc_b,
       |    CAST(1000 * length(list_filter(range(1, ${NumPerms + 1}), i -> sig_a[i] = sig_b[i])) // $NumPerms AS BIGINT)
       |      AS est_jaccard_permille
       |  FROM pairs)
       |WHERE est_jaccard_permille >= 300""".stripMargin

  // --- Incremental (cross-batch) dedup ---------------------------------------

  /** First doc_id of the "newly crawled" batch: ids below are the already-
    * ingested corpus whose old×old pairs were deduped in earlier runs. */
  val NewBatchMin = 250L

  /** Continuous-ingest dedup: candidate pairs where at least one side is
    * NEW — new×old and new×new, never old×old (that work is already
    * done). Because new ids are strictly larger than old ids, every pair
    * involving a new doc has its LARGER member new, so restricting the
    * b-side of the `a.doc_id < b.doc_id` band join to the new batch
    * yields exactly the wanted pair set. Per-batch cost is
    * |batch| × bucket-size, independent of the historical corpus size —
    * the property that makes nightly dedup of a 100 TB corpus feasible.
    * In production the historical signatures are read back from the
    * signature store, not recomputed; here both sides derive from the
    * same table.
    */
  def incrementalNearDups(s: SparkSession, dir: String): DataFrame = {
    val sigs = cachedSignatures(s, dir)
    estimate(candidatePairs(sigs, col("doc_id") >= NewBatchMin))
      .filter(col("est_jaccard_permille") >= 300)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard_permille"),
        when(col("doc_a") < NewBatchMin, "vs_corpus").otherwise("within_batch")
          .as("pair_kind"))
  }

  private val d29Oracle =
    s"""WITH sig AS (SELECT doc_id, sig FROM '{OUT}/_aux/d29_incremental_dedup/aux_signatures/*.parquet'),
       |banded AS (
       |  SELECT doc_id, sig, r.range AS band,
       |         list_slice(sig, r.range * $RowsPerBand + 1, r.range * $RowsPerBand + $RowsPerBand) AS bucket
       |  FROM sig, range(0, $Bands) r),
       |capped AS (
       |  SELECT * FROM (
       |    SELECT *, COUNT(*) OVER (PARTITION BY band, bucket) AS bn FROM banded)
       |  WHERE bn <= $MaxBucketDocs),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sig_a, b.sig AS sig_b
       |  FROM capped a JOIN capped b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
       |  WHERE b.doc_id >= $NewBatchMin)
       |SELECT doc_a, doc_b, est_jaccard_permille,
       |  CASE WHEN doc_a < $NewBatchMin THEN 'vs_corpus' ELSE 'within_batch' END AS pair_kind
       |FROM (
       |  SELECT doc_a, doc_b,
       |    CAST(1000 * length(list_filter(range(1, ${NumPerms + 1}), i -> sig_a[i] = sig_b[i])) // $NumPerms AS BIGINT)
       |      AS est_jaccard_permille
       |  FROM pairs)
       |WHERE est_jaccard_permille >= 300""".stripMargin

  // --- SimHash ---------------------------------------------------------------

  /** 63-bit SimHash per doc over word-bigram shingles (unigrams are too
    * common across docs to discriminate): per-bit vote of shingle hashes.
    * Bit i of the fingerprint is 1 iff more shingle hashes have bit i set
    * than not. 63 bits (not 64) keeps the fingerprint non-negative, so
    * right-shifts and block extraction behave identically in Spark and
    * DuckDB (no sign-bit semantics to align).
    */
  val SimHashBits = 63
  val SimHashBlocks = 7
  val BlockBits: Int = SimHashBits / SimHashBlocks // 9

  def simhashes(docs: DataFrame): DataFrame = {
    val votes: Seq[Column] = (0 until SimHashBits).map { i =>
      sum(when(expr(s"(h >> $i) & 1") === 1, 1L).otherwise(-1L)).as(s"v$i")
    }
    // the vote bit MUST be widened before shifting: a bare literal 1 is
    // INT, and Spark's ShiftLeft on INT shifts mod 32 — bits 32-62 would
    // alias onto 0-30 and bit 31 would sign-extend through the final
    // BIGINT cast, collapsing the fingerprint to ~31 effective bits and
    // herding ~half the corpus into one bucket per upper block (the
    // quadratic join this design exists to prevent). DuckDB replays the
    // exported fingerprints, so the oracle alone cannot catch this;
    // SimHashSpec pins the upper-bit structure directly.
    val fp = (0 until SimHashBits)
      .map(i => s"((CASE WHEN v$i > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) << $i)")
      .mkString(" | ")
    shingleHashes(docs)
      .groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), expr(s"CAST($fp AS BIGINT)").as("simhash"))
  }

  /** Near-dup pairs by Hamming distance. Candidate generation joins on
    * each of the 7 disjoint 9-bit blocks (multi-probe): by pigeonhole, any
    * pair with Hamming distance <= 6 differs in at most 6 blocks, so at
    * least one of the 7 blocks is IDENTICAL → recall is guaranteed 1.0
    * for maxHamming <= 6, not probabilistic (round-1's single top-16-bit
    * block missed near-dups whose prefix differed). Each block join is an
    * equijoin — linear shuffle, never all-pairs.
    */
  def simhashNearDups(s: SparkSession, dir: String, maxHamming: Int = 6): DataFrame = {
    require(maxHamming < SimHashBlocks,
      s"pigeonhole guarantee needs maxHamming < $SimHashBlocks blocks")
    val fp = cachedSimhashes(s, dir)
    val blk = fp.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        s"transform(sequence(0, ${SimHashBlocks - 1}), i -> shiftright(simhash, $BlockBits * i) & ${(1 << BlockBits) - 1})")))
      .withColumnsRenamed(Map("pos" -> "blk_i", "col" -> "blk_v"))
    blk.as("a")
      .join(blk.as("b"),
        col("a.blk_i") === col("b.blk_i") && col("a.blk_v") === col("b.blk_v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sa"), col("b.simhash").as("sb"))
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(bit_count(sa ^ sb) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  private val d07Oracle =
    s"""WITH fp AS (SELECT doc_id, simhash FROM '{OUT}/_aux/d07_simhash/aux_simhashes/*.parquet'),
       |blk AS (
       |  SELECT doc_id, simhash, r.range AS blk_i,
       |         (simhash >> ($BlockBits * r.range)) & ${(1 << BlockBits) - 1} AS blk_v
       |  FROM fp, range(0, $SimHashBlocks) r),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         a.simhash AS sa, b.simhash AS sb
       |  FROM blk a JOIN blk b
       |    ON a.blk_i = b.blk_i AND a.blk_v = b.blk_v AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, hamming FROM (
       |  SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
       |  FROM pairs)
       |WHERE hamming <= 6""".stripMargin

  // --- Winnowing fingerprints ------------------------------------------------

  val KGram = 8
  val WinnowWindow = 16

  /** Character-8-gram rolling hash array per doc — the Spark-only
    * (xxhash64) part of winnowing, exported as aux so DuckDB can replay
    * the winnow itself.
    */
  def kgramHashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      expr(s"transform(sequence(1, greatest(length(text) - ${KGram - 1}, 1)), i -> xxhash64(substring(text, i, $KGram)))")
        .as("kh"))

  /** Winnowed: keep each window-of-16 minimum (the standard winnowing
    * scheme) → compact, position-robust document fingerprints. Emitted
    * exploded: (doc_id, fingerprint).
    */
  def fingerprints(docs: DataFrame): DataFrame =
    kgramHashes(docs)
      .select(col("doc_id"),
        explode(expr(
          s"array_distinct(transform(sequence(1, greatest(size(kh) - ${WinnowWindow - 1}, 1)), i -> array_min(slice(kh, i, $WinnowWindow))))"))
          .as("fingerprint"))

  private val d08Oracle =
    s"""SELECT doc_id,
       |  CAST(length(list_distinct(list_transform(
       |    range(1, greatest(length(kh) - ${WinnowWindow - 1}, 1) + 1),
       |    i -> list_min(list_slice(kh, i, i + ${WinnowWindow - 1}))))) AS BIGINT) AS n_fingerprints
       |FROM '{OUT}/_aux/d08_fingerprints/aux_kgrams/*.parquet'""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("d06_minhash_lsh", (s, dir) => minhashNearDups(s, dir), Some(d06Oracle),
      headline = true,
      aux = Seq("aux_signatures" ->
        ((s: SparkSession, dir: String) => cachedSignatures(s, dir)))),
    // --- d45: dedup recall/precision audit --------------------------------
    // Evaluation-as-a-query for the dedup family (e11 is the ANN
    // counterpart): d06's LSH candidate pairs scored against d05's exact
    // Jaccard truth set — recall (planted pairs the sketch recovers) and
    // precision (candidates that are truly ≥ 300 permille) in integer
    // permille. The oracle recomputes BOTH arms independently: the truth
    // set from raw shingle SQL, the LSH arm replayed from the exported
    // signatures — so a drift in either pipeline breaks the hash, which
    // is what makes the metric trustworthy enough to gate a corpus swap.
    Q("d45_dedup_recall",
      (s, dir) => {
        val lsh = minhashNearDups(s, dir).select(col("doc_a"), col("doc_b"))
        val exact = TextOps.exactNearDups(s, dir).select(col("doc_a"), col("doc_b"))
        val nL = lsh.agg(count(lit(1)).as("n_lsh"))
        val nE = exact.agg(count(lit(1)).as("n_exact"))
        val nH = lsh.join(exact, Seq("doc_a", "doc_b"))
          .agg(count(lit(1)).as("n_hits"))
        nE.crossJoin(broadcast(nL)).crossJoin(broadcast(nH))
          .select(col("n_exact"), col("n_lsh"), col("n_hits"),
            expr("""CAST(CASE WHEN n_exact = 0 THEN 0
                   | ELSE 1000 * n_hits div n_exact END AS BIGINT)""".stripMargin)
              .as("recall_permille"),
            expr("""CAST(CASE WHEN n_lsh = 0 THEN 0
                   | ELSE 1000 * n_hits div n_lsh END AS BIGINT)""".stripMargin)
              .as("precision_permille"))
      },
      Some {
        val lshSql = d06Oracle.replace("/_aux/d06_minhash_lsh/", "/_aux/d45_dedup_recall/")
        s"""WITH lsh AS (SELECT doc_a, doc_b FROM ($lshSql)),
           |ex AS (SELECT doc_a, doc_b FROM (${TextOps.dedupOracleSql})),
           |h AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hits FROM lsh JOIN ex USING (doc_a, doc_b)),
           |l AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_lsh FROM lsh),
           |e AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM ex)
           |SELECT e.n_exact, l.n_lsh, h.n_hits,
           |  CAST(CASE WHEN e.n_exact = 0 THEN 0 ELSE 1000 * h.n_hits // e.n_exact END AS BIGINT) AS recall_permille,
           |  CAST(CASE WHEN l.n_lsh = 0 THEN 0 ELSE 1000 * h.n_hits // l.n_lsh END AS BIGINT) AS precision_permille
           |FROM e, l, h""".stripMargin
      },
      aux = Seq("aux_signatures" ->
        ((s: SparkSession, dir: String) => cachedSignatures(s, dir)))),
    Q("d29_incremental_dedup", (s, dir) => incrementalNearDups(s, dir), Some(d29Oracle),
      aux = Seq("aux_signatures" ->
        ((s: SparkSession, dir: String) => cachedSignatures(s, dir)))),
    Q("d07_simhash", (s, dir) => simhashNearDups(s, dir), Some(d07Oracle),
      aux = Seq("aux_simhashes" ->
        ((s: SparkSession, dir: String) => cachedSimhashes(s, dir)))),
    // --- d48: simhash recall/precision audit -------------------------------
    // d45's counterpart for the OTHER sketch family (made meaningful by
    // the shift-wrap fix: the pre-fix giant shared buckets inflated
    // recall to an accidental 1.0): d07's Hamming≤6 pairs scored against
    // d05's exact-Jaccard truth — recall against the STRONG (≥800‰)
    // pairs simhash targets, precision against the ≥300‰ set (a sim pair
    // below even that is a real false positive). The oracle recomputes
    // BOTH arms independently: the truth sets from raw shingle SQL, the
    // simhash arm replayed from the exported fingerprints.
    Q("d48_simhash_recall",
      (s, dir) => {
        val sim = simhashNearDups(s, dir).select(col("doc_a"), col("doc_b"))
        val ex = TextOps.exactNearDups(s, dir)
        val strong = ex.filter(col("jaccard_permille") >= 800)
          .select(col("doc_a"), col("doc_b"))
        val any = ex.select(col("doc_a"), col("doc_b"))
        val nS = sim.agg(count(lit(1)).as("n_sim"))
        val nE = strong.agg(count(lit(1)).as("n_strong"))
        val nH = sim.join(strong, Seq("doc_a", "doc_b"))
          .agg(count(lit(1)).as("n_hits"))
        val nT = sim.join(any, Seq("doc_a", "doc_b"))
          .agg(count(lit(1)).as("n_true"))
        nE.crossJoin(broadcast(nS)).crossJoin(broadcast(nH))
          .crossJoin(broadcast(nT))
          .select(col("n_strong"), col("n_sim"), col("n_hits"), col("n_true"),
            expr("""CAST(CASE WHEN n_strong = 0 THEN 0
                   | ELSE 1000 * n_hits div n_strong END AS BIGINT)""".stripMargin)
              .as("recall_permille"),
            expr("""CAST(CASE WHEN n_sim = 0 THEN 0
                   | ELSE 1000 * n_true div n_sim END AS BIGINT)""".stripMargin)
              .as("precision_permille"))
      },
      Some {
        val simSql = d07Oracle.replace("/_aux/d07_simhash/", "/_aux/d48_simhash_recall/")
        s"""WITH sim AS (SELECT doc_a, doc_b FROM ($simSql)),
           |ex3 AS (SELECT doc_a, doc_b FROM (${TextOps.dedupOracleSql})),
           |ex8 AS (SELECT doc_a, doc_b FROM (${TextOps.dedupOracleSql})
           |        WHERE jaccard_permille >= 800),
           |h AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hits FROM sim JOIN ex8 USING (doc_a, doc_b)),
           |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM sim JOIN ex3 USING (doc_a, doc_b)),
           |sc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sim FROM sim),
           |e AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_strong FROM ex8)
           |SELECT e.n_strong, sc.n_sim, h.n_hits, t.n_true,
           |  CAST(CASE WHEN e.n_strong = 0 THEN 0 ELSE 1000 * h.n_hits // e.n_strong END AS BIGINT) AS recall_permille,
           |  CAST(CASE WHEN sc.n_sim = 0 THEN 0 ELSE 1000 * t.n_true // sc.n_sim END AS BIGINT) AS precision_permille
           |FROM e, sc, h, t""".stripMargin
      },
      aux = Seq("aux_simhashes" ->
        ((s: SparkSession, dir: String) => cachedSimhashes(s, dir)))),
    Q("d08_fingerprints",
      (s, dir) => fingerprints(t(s, dir, "documents"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_fingerprints")),
      Some(d08Oracle),
      aux = Seq("aux_kgrams" ->
        ((s: SparkSession, dir: String) => kgramHashes(t(s, dir, "documents")))))
  )
}
