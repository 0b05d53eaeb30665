package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Round-3 surface widening: window distribution functions, two-stage ANN
  * re-ranking, PII-style redaction, exact substring-span dedup, and
  * deterministic source-weighted corpus mixing.
  *
  * Cross-engine determinism follows the CLAUDE.md rules: every
  * double-derived output is integerized with the SAME IEEE expression
  * text in Spark and DuckDB (`floor(1e6*x + 0.5)` per term), ratios use
  * integer floor-division, full sort keys on every ranking, and integer
  * aggregates are CAST to BIGINT in the oracle (DuckDB SUMs to HUGEINT).
  */
object PipelineOps {
  import Tables.t

  // --- q40: window distribution functions --------------------------------
  // percent_rank / cume_dist / ntile over per-customer order-price
  // rankings. Both engines compute (rank-1)/(n-1) and peers/n with the
  // same IEEE doubles; outputs are integerized per term before emission.
  // Full sort key (price_cents, o_orderkey) so ranks are unambiguous.
  private def q40(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("price_cents"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("price_cents").asc, col("o_orderkey").asc)
    o.select(col("o_orderkey"), col("o_custkey"), col("price_cents"),
      floor(lit(1000000) * percent_rank().over(w) + lit(0.5)).cast("long").as("pr_e6"),
      floor(lit(1000000) * cume_dist().over(w) + lit(0.5)).cast("long").as("cd_e6"),
      ntile(4).over(w).cast("long").as("quartile"))
  }

  private val q40Oracle =
    """SELECT o_orderkey, o_custkey, price_cents,
      |  CAST(floor(1000000 * percent_rank() OVER w + 0.5) AS BIGINT) AS pr_e6,
      |  CAST(floor(1000000 * cume_dist() OVER w + 0.5) AS BIGINT) AS cd_e6,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
      |FROM (SELECT o_orderkey, o_custkey,
      |        CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
      |      FROM orders)
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY price_cents ASC, o_orderkey ASC)""".stripMargin

  // --- e08: two-stage ANN re-rank ----------------------------------------
  // The production serving shape: a cheap coarse score over a PREFIX of
  // the embedding (first 16 of 64 dims — Matryoshka-style truncation)
  // prunes the corpus to `coarseK` survivors per query, then the exact
  // full-dimension score re-ranks only those. The corpus is scanned once,
  // never shuffled (queries broadcast); only the tiny survivor set moves.
  // Scores are integer sums of per-term integerized products, so the
  // cross-engine SUM is exact regardless of merge order.
  val CoarseDims = 16
  val CoarseK = 50
  val FinalK = 10

  // statically unrolled over the literal dims (same round-6 bench win as
  // PqAnn.distExpr: the aggregate/zip_with HOF ran interpreted lambdas
  // and allocated per-row arrays; plain element_at arithmetic stays in
  // whole-stage codegen, and the integer sum is bit-identical)
  private def dotE6(aCol: String, bCol: String, dims: Int): String =
    (1 to dims).map(i =>
      s"CAST(floor(1000000 * element_at($aCol, $i) * element_at($bCol, $i) + 0.5) AS BIGINT)")
      .mkString("(", " + ", ")")

  private def e08(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val wc = Window.partitionBy("qid").orderBy(col("coarse_e6").desc, col("cid").asc)
    val wf = Window.partitionBy("qid").orderBy(col("full_e6").desc, col("cid").asc)
    // the coarse stage emits ONLY (qid, cid, score): the top-K window's
    // shuffle must not carry the full vectors for every (query, corpus)
    // pair — at 100 TB that shuffle is the whole cost. Vectors re-join
    // below for just the CoarseK survivors per query.
    val pruned = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        expr(dotE6("qe", "e", CoarseDims)).as("coarse_e6"))
      .withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= CoarseK)
    pruned
      .join(emb.select(col("vec_id").as("cid"), col("e")), "cid")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("cid"), col("coarse_e6"),
        expr(dotE6("qe", "e", 64)).as("full_e6"))
      .withColumn("rank", row_number().over(wf).cast("long"))
      .filter(col("rank") <= FinalK)
      .select("qid", "cid", "coarse_e6", "full_e6", "rank")
  }

  private val e08Oracle =
    s"""WITH emb AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
       |q AS (SELECT vec_id AS qid, e AS qe FROM emb WHERE vec_id < 10),
       |coarse AS (
       |  SELECT qid, c.vec_id AS cid, qe, c.e AS e,
       |    CAST(list_sum(list_transform(range(1, ${CoarseDims + 1}),
       |      i -> CAST(floor(1000000 * qe[i] * e[i] + 0.5) AS BIGINT))) AS BIGINT) AS coarse_e6
       |  FROM emb c CROSS JOIN q WHERE c.vec_id <> q.qid),
       |pruned AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY coarse_e6 DESC, cid ASC) AS crn
       |    FROM coarse) WHERE crn <= $CoarseK),
       |full_scored AS (
       |  SELECT qid, cid, coarse_e6,
       |    CAST(list_sum(list_transform(range(1, 65),
       |      i -> CAST(floor(1000000 * qe[i] * e[i] + 0.5) AS BIGINT))) AS BIGINT) AS full_e6
       |  FROM pruned)
       |SELECT qid, cid, coarse_e6, full_e6, rank FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY full_e6 DESC, cid ASC) AS BIGINT) AS rank
       |  FROM full_scored) WHERE rank <= $FinalK""".stripMargin

  // --- d24: PII-style redaction battery ----------------------------------
  // Scrub digit runs from the semi-structured props payload (the synthetic
  // stand-in for emails/phones/ids). Patterns stay alternation-free simple
  // character classes so Java regex (Spark) and RE2 (DuckDB) match
  // identically; both engines count non-overlapping matches left-to-right.
  private def d24(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_id"),
      expr("CAST(regexp_count(props, '[0-9]+') AS BIGINT)").as("n_redacted"),
      md5(regexp_replace(col("props"), "[0-9]+", "<N>")).as("redacted_md5"))

  private val d24Oracle =
    """SELECT event_id,
      |  CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_redacted,
      |  md5(regexp_replace(props, '[0-9]+', '<N>', 'g')) AS redacted_md5
      |FROM events""".stripMargin

  // --- d25: exact substring-span dedup -----------------------------------
  // Lee-et-al-style exact duplicate-span detection: 8-token shingles,
  // md5'd (md5 exists in BOTH engines — no aux export needed), distinct
  // per doc, then a shingle equijoin counts shared spans per doc pair.
  // A 64-doc shingle-frequency cap excludes boilerplate spans so no
  // bucket goes quadratic at scale (same hygiene as d06's LSH cap); the
  // cap's window count reuses the join's own hash partitioning.
  val SpanTokens = 8
  val MaxSpanDocs = 64
  val MinSharedSpans = 2

  private def docSpans(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), explode(expr(
        s"""CASE WHEN size(ws) >= $SpanTokens
           | THEN array_distinct(transform(sequence(0, size(ws) - $SpanTokens),
           |        i -> md5(concat_ws(' ', slice(ws, i + 1, $SpanTokens)))))
           | ELSE array() END""".stripMargin)).as("sh"))

  /** The d25 span-join core over any (doc_id, text) frame — exposed so
    * the skew soak can plant corpus-wide boilerplate against the cap.
    */
  private[graft] def spanPairs(docs: DataFrame): DataFrame = {
    val spans = docSpans(docs)
      .withColumn("nd", count(lit(1)).over(Window.partitionBy("sh")))
      .filter(col("nd") <= MaxSpanDocs)
      .drop("nd")
    spans.as("a").join(spans.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_spans"))
      .filter(col("n_shared_spans") >= MinSharedSpans)
  }

  private def d25(s: SparkSession, dir: String): DataFrame =
    spanPairs(t(s, dir, "documents"))

  // --- d35: train/eval memorization audit ---------------------------------
  // For every val/test document of d23's content-hash split, the share of
  // its 8-token spans that also occur in ANY train document — the
  // memorization-risk audit run before reporting eval numbers. Shape:
  // the distinct train span set (linear shuffle on the span hash)
  // LEFT-SEMI-style marks each eval span; eval docs with zero overlap
  // stay in the output via the left join. Same md5 spans as d25, so one
  // more consumer of the same narrow extraction.
  private def d35(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .withColumn("split", expr(
        """CASE WHEN CAST(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT) % 10 < 8
          | THEN 'train' WHEN CAST(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT) % 10 = 8
          | THEN 'val' ELSE 'test' END""".stripMargin))
    val spans = docSpans(docs.select(col("doc_id"), col("text")))
    val splitOf = docs.select(col("doc_id"), col("split"))
    val withSplit = spans.join(splitOf, "doc_id")
    val trainSpans = withSplit.filter(col("split") === "train")
      .select(col("sh")).distinct()
    val evalSpans = withSplit.filter(col("split") =!= "train")
    val marked = evalSpans
      .join(trainSpans.withColumn("memorized", lit(1L)), Seq("sh"), "left")
      .groupBy("doc_id", "split")
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce(col("memorized"), lit(0L))).as("n_memorized"))
    // eval docs with NO spans (<8 tokens) must still appear, at 0/0
    docs.filter(col("split") =!= "train").select(col("doc_id"), col("split"))
      .join(marked, Seq("doc_id", "split"), "left")
      .select(col("doc_id"), col("split"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_memorized"), lit(0L)).as("n_memorized"),
        expr("CAST(CASE WHEN coalesce(n_spans, 0L) = 0 THEN 0 " +
          "ELSE 1000 * coalesce(n_memorized, 0L) div n_spans END AS BIGINT)")
          .as("memorized_permille"))
  }

  private val d35Oracle =
    s"""WITH d AS (SELECT doc_id, text,
       |        CASE WHEN CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) % 10 < 8
       |             THEN 'train'
       |             WHEN CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) % 10 = 8
       |             THEN 'val' ELSE 'test' END AS split
       |      FROM documents),
       |spans AS (
       |  SELECT doc_id, unnest(CASE WHEN len(ws) >= $SpanTokens
       |    THEN list_distinct(list_transform(range(0, len(ws) - ${SpanTokens - 1}),
       |           i -> md5(array_to_string(ws[i + 1:i + $SpanTokens], ' '))))
       |    ELSE CAST([] AS VARCHAR[]) END) AS sh
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM d)),
       |ws AS (SELECT s.doc_id, d.split, s.sh FROM spans s JOIN d USING (doc_id)),
       |tr AS (SELECT DISTINCT sh FROM ws WHERE split = 'train'),
       |mk AS (SELECT w.doc_id, w.split, CAST(COUNT(*) AS BIGINT) AS n_spans,
       |         CAST(SUM(CASE WHEN tr.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_memorized
       |       FROM ws w LEFT JOIN tr ON tr.sh = w.sh
       |       WHERE w.split <> 'train' GROUP BY w.doc_id, w.split)
       |SELECT d.doc_id, d.split,
       |  COALESCE(mk.n_spans, 0) AS n_spans,
       |  COALESCE(mk.n_memorized, 0) AS n_memorized,
       |  CAST(CASE WHEN COALESCE(mk.n_spans, 0) = 0 THEN 0
       |            ELSE 1000 * COALESCE(mk.n_memorized, 0) // mk.n_spans END AS BIGINT)
       |    AS memorized_permille
       |FROM d LEFT JOIN mk ON mk.doc_id = d.doc_id AND mk.split = d.split
       |WHERE d.split <> 'train'""".stripMargin

  private val d25Oracle =
    s"""WITH spans AS (
       |  SELECT doc_id, unnest(CASE WHEN len(ws) >= $SpanTokens
       |    THEN list_distinct(list_transform(range(0, len(ws) - ${SpanTokens - 1}),
       |           i -> md5(array_to_string(ws[i + 1:i + $SpanTokens], ' '))))
       |    ELSE CAST([] AS VARCHAR[]) END) AS sh
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
       |capped AS (
       |  SELECT doc_id, sh FROM (
       |    SELECT *, COUNT(*) OVER (PARTITION BY sh) AS nd FROM spans)
       |  WHERE nd <= $MaxSpanDocs)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_shared_spans
       |FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |GROUP BY a.doc_id, b.doc_id
       |HAVING COUNT(*) >= $MinSharedSpans""".stripMargin

  // --- d26: deterministic source-weighted corpus mixing -------------------
  // The standard pre-training mixing step: per-source keep rates applied
  // via a content-hash bucket (d23's idiom), so the sample is
  // order/partition-independent and reproducible in any engine. Output is
  // the per-source audit (kept vs total), the thing a 100 TB mixing job
  // actually reports.
  private def d26(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("source"),
        expr("CAST(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT) % 1000").as("bucket"),
        expr("""CASE source WHEN 'src0' THEN 1000 WHEN 'src1' THEN 700
               | WHEN 'src2' THEN 400 ELSE 200 END""".stripMargin).as("keep_permille"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("bucket") < col("keep_permille"), 1L).otherwise(0L)).as("n_kept"))

  private val d26Oracle =
    """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN bucket < keep_permille THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM (SELECT source,
      |        CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) % 1000 AS bucket,
      |        CASE source WHEN 'src0' THEN 1000 WHEN 'src1' THEN 700
      |          WHEN 'src2' THEN 400 ELSE 200 END AS keep_permille
      |      FROM documents)
      |GROUP BY source""".stripMargin

  // --- d27: bloom-filter contamination gate ------------------------------
  // d18's exact benchmark-contamination audit broadcasts the raw eval-set
  // shingles; at 100 TB the eval set itself can be too big for that, but
  // its bloom SKETCH is a fixed 8 KiB regardless of corpus size. The
  // sketch is built by the custom [[graft.functions.BloomAgg]] (bitwise-OR
  // merge → map-side partials; only m/8 bytes per partition shuffle), and
  // the probe side is pure codegen'd integer arithmetic over the
  // broadcast words array. One-sided error: every truly-contaminated
  // shingle hits (no false negatives vs d18); the FPR is ~1% at this fill.
  // Oracled by exporting the words + probe hashes and replaying the exact
  // bit arithmetic in DuckDB.
  // Per-doc DISTINCT 5-gram hashes as one narrow array column — shingle
  // dedup is per-document by construction, so `array_distinct` inside the
  // row replaces what was a corpus-wide shuffle-distinct over full shingle
  // STRINGS (round-6 perf pass: the old shape shuffled every 5-gram text
  // twice and then re-distincted on the hash anyway; this one never
  // shuffles anything wider than the final rollup keys).
  private def shingleHashes5(s: SparkSession, dir: String): DataFrame = {
    val hs5 = "array_distinct(transform(sequence(1, size(ws) - 4), " +
      "i -> xxhash64(concat_ws(' ', slice(ws, i, 5)))))"
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 5)
      .select(col("doc_id"), col("source"), explode(expr(hs5)).as("h"))
  }

  private[graft] def d27Bloom(s: SparkSession, dir: String): DataFrame =
    // no distinct at all: the sketch is a bitwise OR, duplicate hashes
    // are idempotent — the only shuffle is m/8 bytes of partial sketch
    // per partition
    shingleHashes5(s, dir).filter(col("source") === "src0")
      .agg(graft.functions.BloomAgg.bloom_agg(col("h")).as("words"))

  private[graft] def d27Probes(s: SparkSession, dir: String): DataFrame =
    shingleHashes5(s, dir).filter(col("source") =!= "src0")
      .select(col("doc_id"), col("h"))

  private def d27(s: SparkSession, dir: String): DataFrame =
    d27Probes(s, dir)
      .crossJoin(broadcast(d27Bloom(s, dir)))
      .select(col("doc_id"),
        when(expr(graft.functions.BloomAgg.memberExpr("words", "h")), 1L)
          .otherwise(0L).as("hit"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), sum(col("hit")).as("n_hits"))
      .select(col("doc_id"), col("n_shingles"), col("n_hits"),
        expr("CAST(1000 * n_hits div n_shingles AS BIGINT)").as("contam_permille"))

  // --- d46: decontamination PURGE against the lakehouse landing ----------
  // The integration the audits exist FOR: d18 finds contaminated docs,
  // and this query actually REMOVES them from a manifest landing with
  // history — ManifestLand.deleteMatching tombstones by a KEY FRAME
  // (semi-join: the contaminated set is a DataFrame, never a collected
  // driver list, so the purge scales with the landing, not the driver),
  // no data file rewritten. Emits the surviving per-(lang, source)
  // rollup plus the purge count, so the oracle cross-checks both the
  // survivor set AND how many rows the tombstones claimed.
  private def d46(s: SparkSession, dir: String): DataFrame = {
    val land = java.nio.file.Files.createTempDirectory("graft_d46").toString + "/landing"
    graft.TempCleanup.registerDir(new java.io.File(land).getParent)
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    // two commits: the history a real landing accumulates
    graft.streaming.ManifestLand.commitBatch(
      docs.filter(col("doc_id") % 2 === 0), 0L, land)
    graft.streaming.ManifestLand.commitBatch(
      docs.filter(col("doc_id") % 2 === 1), 1L, land)
    // exact 5-gram contamination vs the src0 eval set — d18's audit
    // shape verbatim (integer permille, broadcast bench set), filtered
    // to the purge threshold
    val grams5 = "transform(sequence(1, size(ws) - 4), i -> concat_ws(' ', slice(ws, i, 5)))"
    val sh = docs
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 5)
      .select(col("doc_id"), col("source"), explode(expr(grams5)).as("shingle"))
      .distinct()
    val bench = sh.filter(col("source") === "src0")
      .select(col("shingle")).distinct().withColumn("hit", lit(1L))
    val contaminated = sh.filter(col("source") =!= "src0")
      .join(broadcast(bench), Seq("shingle"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .filter(expr("1000 * n_hit div n_sh >= 200"))
      .select(col("doc_id"))
    val nPurged = graft.streaming.ManifestLand.deleteMatching(
      s, land, contaminated, Seq("doc_id"))
    graft.streaming.ManifestLand.read(s, land)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .withColumn("n_purged", lit(nPurged))
  }

  private val d46Oracle =
    """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
      |          WHERE len(string_split(text, ' ')) >= 5),
      |s AS (SELECT DISTINCT doc_id, source, array_to_string(ws[i:i+4], ' ') AS shingle
      |      FROM w, unnest(range(1, greatest(len(ws) - 3, 1))) AS t(i)),
      |bench AS (SELECT DISTINCT shingle FROM s WHERE source = 'src0'),
      |con AS (SELECT s.doc_id FROM s LEFT JOIN bench b USING (shingle)
      |        WHERE s.source <> 'src0'
      |        GROUP BY s.doc_id
      |        HAVING 1000 * SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
      |               // COUNT(*) >= 200),
      |np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_purged FROM con)
      |SELECT d.lang, d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars, np.n_purged
      |FROM documents d CROSS JOIN np
      |WHERE d.doc_id NOT IN (SELECT doc_id FROM con)
      |GROUP BY d.lang, d.source, np.n_purged""".stripMargin

  private val d27Oracle = {
    import graft.functions.BloomAgg.{NumBits, NumProbes, WordBits}
    s"""WITH wds AS (SELECT idx, word FROM '{OUT}/_aux/d27_bloom_contamination/aux_bloom/*.parquet'),
       |pr AS (SELECT doc_id, h FROM '{OUT}/_aux/d27_bloom_contamination/aux_probes/*.parquet'),
       |ph AS (SELECT doc_id, h, h & ${NumBits - 1} AS h1,
       |              ((h & 4294967295) // 65536) | 1 AS h2 FROM pr),
       |pos AS (SELECT doc_id, h, (h1 + r.range * h2) % $NumBits AS pos
       |        FROM ph, range(0, $NumProbes) r),
       |bit AS (SELECT p.doc_id, p.h,
       |          CASE WHEN (w.word & (CAST(1 AS BIGINT) << CAST(pos % $WordBits AS INT))) != 0
       |               THEN 1 ELSE 0 END AS b
       |        FROM pos p JOIN wds w ON w.idx = p.pos // $WordBits),
       |mem AS (SELECT doc_id, h, MIN(b) AS is_m FROM bit GROUP BY doc_id, h)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       |  CAST(SUM(is_m) AS BIGINT) AS n_hits,
       |  CAST(1000 * SUM(is_m) // COUNT(*) AS BIGINT) AS contam_permille
       |FROM mem GROUP BY doc_id""".stripMargin
  }

  // --- d28: per-source quantile-threshold filtering ----------------------
  // The per-source quality gate of a mixing pipeline: each source keeps
  // only docs at or above its own p25 length. The discrete quantile is
  // computed with pure integer window arithmetic — row_number with a full
  // sort key at rank ceil(n/4) — identical in any engine (no
  // percentile-interpolation or double semantics to align). The threshold
  // table is one row per source → broadcast; the corpus never shuffles
  // for the gate itself.
  private def d28(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars"))
    val w = Window.partitionBy("source").orderBy(col("n_chars").asc, col("doc_id").asc)
    val thr = d
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
      .filter(col("rn") === expr("(n + 3) div 4"))
      .select(col("source"), col("n_chars").as("thr"))
    d.join(broadcast(thr), "source")
      .filter(col("n_chars") >= col("thr"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("thr"))
  }

  private val d28Oracle =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |thr AS (
      |  SELECT source, n_chars AS thr FROM (
      |    SELECT source, n_chars,
      |      row_number() OVER (PARTITION BY source ORDER BY n_chars ASC, doc_id ASC) AS rn,
      |      COUNT(*) OVER (PARTITION BY source) AS n
      |    FROM d)
      |  WHERE rn = (n + 3) // 4)
      |SELECT doc_id, d.source, n_chars, thr
      |FROM d JOIN thr ON d.source = thr.source
      |WHERE n_chars >= thr""".stripMargin

  // --- e09: cross-modal text/embedding join ------------------------------
  // Joins the text table to its embedding row (doc_id = vec_id) — the
  // standard pretraining-filter shape that combines a text-side signal
  // (length) with an embedding-side signal (norm). The norm is an integer
  // sum of per-term integerized squares, so the cross-engine SUM is exact
  // under any merge order. Equi-join on the id: co-partitioned shuffle
  // join at scale, no broadcast needed on either (both are corpus-sized).
  private def e09(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars"))
      .join(
        t(s, dir, "embeddings").select(col("vec_id"),
          expr("""aggregate(transform(embedding, x -> CAST(floor(1000000 * CAST(x AS DOUBLE) * CAST(x AS DOUBLE) + 0.5) AS BIGINT)),
                 | CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin).as("norm_e6")),
        col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("norm_e6"),
        (col("n_chars").between(100, 400) && col("norm_e6") >= 1000000L).cast("long").as("keep"))

  private val e09Oracle =
    """SELECT doc_id, lang, n_chars, norm_e6,
      |  CAST(CASE WHEN n_chars BETWEEN 100 AND 400 AND norm_e6 >= 1000000 THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM documents d JOIN (
      |  SELECT vec_id,
      |    CAST(list_sum([CAST(floor(1000000 * CAST(x AS DOUBLE) * CAST(x AS DOUBLE) + 0.5) AS BIGINT) for x in embedding]) AS BIGINT) AS norm_e6
      |  FROM embeddings) e ON d.doc_id = e.vec_id""".stripMargin

  // --- q41: correlated LATERAL subquery (SQL entry point) -----------------
  // Top-2 lineitems per order via a correlated LATERAL with ORDER BY +
  // LIMIT — Catalyst decorrelates the per-row subquery into a windowed
  // join (no subquery-per-row execution); the plan proof lives in
  // PlanQualitySpec. Quantities integerized to cents before ranking,
  // l_linenumber completes the sort key.
  private def q41(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_q41")
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q41")
    s.sql("""SELECT o_orderkey, o_orderpriority, l.l_linenumber, l.qty_c
            |FROM orders_q41 o,
            |LATERAL (SELECT l_linenumber,
            |                CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c
            |         FROM lineitem_q41 li
            |         WHERE li.l_orderkey = o.o_orderkey
            |         ORDER BY qty_c DESC, l_linenumber ASC LIMIT 2) l""".stripMargin)
  }

  private val q41Oracle =
    """SELECT o_orderkey, o_orderpriority, l.l_linenumber, l.qty_c
      |FROM orders o,
      |LATERAL (SELECT l_linenumber,
      |                CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c
      |         FROM lineitem li
      |         WHERE li.l_orderkey = o.o_orderkey
      |         ORDER BY qty_c DESC, l_linenumber ASC LIMIT 2) l""".stripMargin

  // --- q42: 3-sigma anomaly detection, all-integer -----------------------
  // Flags events whose value deviates from the user's mean by more than
  // 3 population standard deviations — WITHOUT ever forming a double mean
  // or sigma (both order-dependent cross-engine): the test
  // (n·v − s)² > 9·(n·ss − s²) is the σ-test cross-multiplied into exact
  // integers. The comparison runs in 128-bit (Spark DECIMAL(38,0), DuckDB
  // HUGEINT — both exact integer domains) because int64 only barely holds
  // it at the current data bounds: 9·(n·ss − s²) reaches ~9·10^18 at
  // cents ≤ 10^5, n ≤ 10^4 (round-3 advisor — any domain growth would
  // silently wrap in one engine and promote in the other). Only the
  // boolean leaves the predicate, so output columns stay BIGINT. The
  // per-user stats join is a co-partitioned shuffle join (the stats side
  // is user-cardinality — not broadcastable at 100 TB).
  private def q42(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("event_id"), col("user_id"),
      expr("CAST(floor((value) * 100 + 0.5) AS BIGINT)").as("cents"))
    val stats = e.groupBy("user_id").agg(
      count(lit(1)).as("n"), sum(col("cents")).as("s"),
      sum(col("cents") * col("cents")).as("ss"))
    e.join(stats, "user_id")
      .filter(expr(
        """(CAST(n AS DECIMAL(38,0)) * cents - s) * (CAST(n AS DECIMAL(38,0)) * cents - s)
          | > 9 * (CAST(n AS DECIMAL(38,0)) * ss - CAST(s AS DECIMAL(38,0)) * s)""".stripMargin))
      .select(col("event_id"), col("user_id"), col("cents"), col("n"))
  }

  private val q42Oracle =
    """WITH e AS (SELECT event_id, user_id,
      |             CAST(floor((value) * 100 + 0.5) AS BIGINT) AS cents FROM events),
      |st AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
      |         CAST(SUM(cents) AS BIGINT) AS s,
      |         CAST(SUM(cents * cents) AS BIGINT) AS ss
      |       FROM e GROUP BY user_id)
      |SELECT event_id, e.user_id, cents, n
      |FROM e JOIN st ON e.user_id = st.user_id
      |WHERE (CAST(n AS HUGEINT) * cents - s) * (CAST(n AS HUGEINT) * cents - s)
      |      > 9 * (CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)""".stripMargin

  // --- q43: ordered funnel sequencing ------------------------------------
  // view → click → purchase strictly in temporal order per user: each
  // stage's earliest qualifying timestamp is the min over events after
  // the previous stage's. Exact µs integer domain end to end; stages
  // compose as aggregations + equi-joins on user_id (every join is
  // user-co-partitioned — one shuffle key throughout, reused).
  private def q43(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), expr("ts div 1000").as("tsu"), col("event_type"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("tsu")).as("v1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("tsu") > col("v1"))
      .groupBy("user_id").agg(min(col("tsu")).as("c1"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("tsu") > col("c1"))
      .groupBy("user_id").agg(min(col("tsu")).as("p1"))
    v.join(c.select(col("user_id"), col("c1")), Seq("user_id"), "left")
      .join(p.select(col("user_id"), col("p1")), Seq("user_id"), "left")
      .select(col("user_id"), col("v1"), col("c1"), col("p1"),
        expr("CAST(CASE WHEN p1 IS NOT NULL THEN 3 WHEN c1 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT)")
          .as("stages_reached"))
  }

  private val q43Oracle =
    """WITH ev AS (SELECT user_id, epoch_us(ts) AS tsu, event_type FROM events),
      |v AS (SELECT user_id, MIN(tsu) AS v1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT ev.user_id, MIN(tsu) AS c1 FROM ev JOIN v ON ev.user_id = v.user_id
      |      WHERE event_type = 'click' AND tsu > v1 GROUP BY ev.user_id),
      |p AS (SELECT ev.user_id, MIN(tsu) AS p1 FROM ev JOIN c ON ev.user_id = c.user_id
      |      WHERE event_type = 'purchase' AND tsu > c1 GROUP BY ev.user_id)
      |SELECT v.user_id, v1, c1, p1,
      |  CAST(CASE WHEN p1 IS NOT NULL THEN 3 WHEN c1 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT)
      |    AS stages_reached
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |       LEFT JOIN p ON v.user_id = p.user_id""".stripMargin

  // --- q44: cohort retention matrix --------------------------------------
  // Users grouped by first-active day (the cohort); for each day offset k
  // the matrix counts cohort members active k days later. Exact integer
  // day buckets (µs floor-division); distinct-user counting shuffles on
  // the (cohort, k) pair once.
  private def q44(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("day"))
      .distinct()
    val first = ud.groupBy("user_id").agg(min(col("day")).as("d0"))
    ud.join(first, "user_id")
      .groupBy(col("d0").as("cohort_day"), (col("day") - col("d0")).as("k"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  private val q44Oracle =
    """WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      |f AS (SELECT user_id, MIN(day) AS d0 FROM ud GROUP BY user_id)
      |SELECT d0 AS cohort_day, day - d0 AS k,
      |  CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS n_users
      |FROM ud JOIN f ON ud.user_id = f.user_id
      |GROUP BY d0, day - d0""".stripMargin

  // --- q50: event-type Markov transition matrix --------------------------
  // Sequence modeling over the event log: for each user's time-ordered
  // event stream, count (type → next type) transitions and derive the
  // integer-permille transition probability. One window over
  // (user_id, time) — co-partitioned with the events' natural key — then
  // a transition-cardinality aggregation (≤ |types|² rows); the
  // probability join moves one row per (from_type), broadcast-small.
  // Ordering is total (tsu, event_id) so both engines pair identically.
  private def q50(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("tsu").asc, col("event_id").asc)
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("tsu"), col("event_type"))
      .withColumn("to_type", lead("event_type", 1).over(w))
      .filter(col("to_type").isNotNull)
    val trans = pairs.groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = trans.groupBy("from_type").agg(sum("n").as("tot"))
    trans.join(broadcast(tot), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        expr("CAST(1000 * n div tot AS BIGINT)").as("p_permille"))
  }

  private val q50Oracle =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu, event_type FROM events),
      |p AS (SELECT event_type AS from_type,
      |        lead(event_type) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS to_type
      |      FROM e),
      |t AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      |      FROM p WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
      |tt AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot FROM t GROUP BY from_type)
      |SELECT t.from_type, t.to_type, t.n, CAST(1000 * t.n // tt.tot AS BIGINT) AS p_permille
      |FROM t JOIN tt USING (from_type)""".stripMargin

  // --- q53: SCD2 versioned-dimension temporal join ------------------------
  // The slowly-changing-dimension shape: a user's NON-purchase events
  // version a profile attribute (props.k) into [valid_from, valid_to)
  // intervals built by one lead window (full sort key tsu, event_id —
  // same-instant versions collapse to empty intervals
  // deterministically); each purchase event then joins the ONE version
  // valid at its instant — the point-in-time-correct feature lookup a
  // training pipeline needs to avoid label leakage. Intervals partition
  // the timeline, so the join is equi on the user key plus a range
  // predicate: co-partitioned, exactly one row out per matched purchase.
  private def q53(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("tsu"),
        expr("CAST(get_json_object(props, '$.k') AS BIGINT)").as("k"))
    val w = Window.partitionBy("user_id").orderBy(col("tsu").asc, col("event_id").asc)
    val versions = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_id"), col("tsu").as("valid_from"), col("k"))
      .withColumn("valid_to", lead("valid_from", 1).over(
        Window.partitionBy("user_id").orderBy(col("valid_from").asc, col("event_id").asc)))
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("tsu"))
      .join(versions.withColumnRenamed("event_id", "version_id"),
        Seq("user_id"))
      .filter(col("tsu") >= col("valid_from") &&
        (col("valid_to").isNull || col("tsu") < col("valid_to")))
      .select(col("purchase_id"), col("user_id"),
        col("k").as("k_at_purchase"), col("valid_from"))
  }

  private val q53Oracle =
    """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu,
      |        CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events),
      |v AS (SELECT user_id, tsu AS valid_from,
      |        lead(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS valid_to,
      |        k
      |      FROM e WHERE event_type <> 'purchase')
      |SELECT p.event_id AS purchase_id, p.user_id, v.k AS k_at_purchase,
      |       CAST(v.valid_from AS BIGINT) AS valid_from
      |FROM e p JOIN v ON p.user_id = v.user_id
      |  AND p.tsu >= v.valid_from
      |  AND (v.valid_to IS NULL OR p.tsu < v.valid_to)
      |WHERE p.event_type = 'purchase'""".stripMargin

  // --- q54: bucketed co-located join --------------------------------------
  // The storage-layout scale lever as a declared query: both fact tables
  // are CTAS'd into bucketed+sorted tables on the join key (8 buckets,
  // external paths under a temp dir — no warehouse pollution), then
  // joined with a merge hint. Bucketing makes the sort-merge join
  // SHUFFLE-FREE — each task reads bucket i of both sides — which is the
  // layout contract that lets a 100 TB fact-fact join run without
  // exchanging either side (plan-asserted in PlanQualitySpec). The merge
  // hint (not a session-conf flip) forces SMJ so the assertion holds
  // under the concurrent Verify harness. Same logical answer as a plain
  // join — the graded artifact is the layout-driven plan.
  private def q54(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val uniq = java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    val liT = s"li_bkt_$uniq"
    val oT = s"o_bkt_$uniq"
    // scratch CTAS copies: registered so the harness deletes them (and
    // drops the catalog tables) after the result materializes (ADVICE r4)
    graft.TempCleanup.registerDir(base)
    graft.TempCleanup.registerTable(liT)
    graft.TempCleanup.registerTable(oT)
    t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$base/$liT").mode("overwrite").saveAsTable(liT)
    t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$base/$oT").mode("overwrite").saveAsTable(oT)
    s.table(liT).hint("merge")
      .join(s.table(oT), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(expr("CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)")).as("qty_c"))
  }

  private val q54Oracle =
    """SELECT o_orderpriority, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_c
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  // --- q55: partitioned landing + pruned readback --------------------------
  // The second storage-layout lever as a declared query: events land
  // hive-partitioned by event_type (the low-cardinality audit key), and
  // the readback filters on the partition column — the scan must touch
  // ONLY the matching directories (PartitionFilters, plan-asserted in
  // PlanQualitySpec), which is what turns a 100 TB full scan into a
  // one-partition read. The day rollup then runs over the pruned rows.
  private def q55(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_evpart").toString
    graft.TempCleanup.registerDir(tmp) // full events copy — purge after run
    val out = tmp + "/events"
    Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        expr("CAST(floor((value) * 10000 + 0.5) AS BIGINT)").as("value_e4"))
      .write.partitionBy("event_type").mode("overwrite").parquet(out)
    s.read.parquet(out)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("(ts div 1000) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_purchases"), sum("value_e4").as("sum_value_e4"))
  }

  private val q55Oracle =
    """SELECT epoch_us(ts) // 86400000000 AS day,
      |  COUNT(*) AS n_purchases,
      |  CAST(SUM(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_e4
      |FROM events WHERE event_type = 'purchase'
      |GROUP BY day""".stripMargin

  // --- d53: DSIR-style importance selection (round 12) ---------------------
  // Data Selection with Importance Resampling (Xie et al., NeurIPS 2023):
  // score every document by how much its hashed n-gram feature
  // distribution looks like a TARGET domain relative to the raw corpus,
  // then keep the top-weighted docs. Re-expressed with EXACT integer
  // arithmetic so both engines agree bit-for-bit (CLAUDE.md: no
  // cross-engine float sums): the per-bucket log-ratio
  // log p_target(f)/p_raw(f) becomes the integer-log2 difference
  // `length(bin(t+1)) - length(bin(r+1))` (= floor(log2)+1 in BOTH
  // engines), and the per-doc weight is an integer SUM of its features'
  // bucket scores. Deterministic top-k (weight DESC, doc_id ASC) stands
  // in for DSIR's Gumbel resampling — same selection pressure, oracle-
  // replayable. Target domain here: the corpus's `lang = 'en'` slice
  // (DSIR's "formal text" target, proxied by what the fixtures carry).
  //
  // 100 TB shape: features are unigrams+bigrams hashed into 4096 buckets
  // — the bucket-count aggregate partial-combines map-side into <= 4096
  // rows per task, the score table (4096 longs) collects to the driver
  // and rides into the scoring pass as a LITERAL array lookup (no join,
  // no second shuffle; the corpus-side pass is fully narrow), and the
  // top-k is a TakeOrdered. The two linear passes recompute the feature
  // arrays rather than caching them (the plan-driven re-parse pattern —
  // nothing corpus-sized materializes).
  private val D53Buckets = 4096

  /** Per-doc hashed feature-bucket array — the ONE definition the
    * scoring pass, the bucket-count pass, and the aux export all share
    * (the oracle replays from the exported (doc_id, bucket) pairs, so
    * the frames must be identical). Unigrams + bigrams; the bigram CASE
    * guards `sequence(1, 0)`, which would otherwise DESCEND. */
  private def d53Docs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      // NULL-text guard (review finding): a NULL text yields NULL grams
      // in Spark (size = -1, NULL weight) but simply no feature rows in
      // the oracle's aux join — drop such docs in BOTH engines by
      // construction (they contribute no features either way)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ws"))
      .withColumn("bks", expr(
        s"""transform(
           |  concat(ws,
           |    CASE WHEN size(ws) >= 2
           |         THEN transform(sequence(1, size(ws) - 1),
           |                i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))
           |         ELSE array() END),
           |  g -> pmod(xxhash64(g), $D53Buckets))""".stripMargin))

  private def d53Feats(s: SparkSession, dir: String): DataFrame =
    d53Docs(s, dir).select(col("doc_id"), explode(col("bks")).as("bucket"))

  private def d53(s: SparkSession, dir: String): DataFrame = {
    val docs = d53Docs(s, dir)
    val feats = docs.select(col("lang"), explode(col("bks")).as("bucket"))
    // bucket counts: raw corpus vs target slice — one tiny aggregate
    // (<= 4096 groups, map-side partials), collected to the driver
    val counts = feats
      .groupBy("bucket")
      .agg(count(lit(1)).as("rc"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tc"))
      .collect()
    val scores = Array.fill[Long](D53Buckets)(0L)
    counts.foreach { r =>
      val b = r.getLong(0).toInt
      val rc = r.getLong(1)
      val tc = r.getLong(2)
      // integer log2 ratio: length(bin(x)) = floor(log2 x) + 1; the +1s
      // cancel in the difference, the smoothing +1 keeps bin's arg >= 1
      scores(b) = (64 - java.lang.Long.numberOfLeadingZeros(tc + 1)) -
        (64 - java.lang.Long.numberOfLeadingZeros(rc + 1)).toLong
    }
    val scoresLit = typedlit(scores.toSeq)
    docs
      .select(col("doc_id"),
        size(col("bks")).cast("long").as("n_grams"),
        aggregate(col("bks"), lit(0L),
          (acc, b) => acc + element_at(scoresLit, (b + 1).cast("int")))
          .as("weight"))
      .orderBy(col("weight").desc, col("doc_id").asc)
      .limit(100)
  }

  private val d53Oracle =
    """WITH f AS (SELECT doc_id, bucket FROM '{OUT}/_aux/d53_dsir_select/aux_feats/*.parquet'),
      |cnt AS (SELECT f.bucket, COUNT(*) AS rc,
      |          SUM(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END) AS tc
      |        FROM f JOIN documents d USING (doc_id) GROUP BY f.bucket),
      |s AS (SELECT bucket,
      |        CAST(length(bin(CAST(tc + 1 AS BIGINT)))
      |           - length(bin(CAST(rc + 1 AS BIGINT))) AS BIGINT) AS sc
      |      FROM cnt),
      |w AS (SELECT f.doc_id, CAST(SUM(s.sc) AS BIGINT) AS weight,
      |        CAST(COUNT(*) AS BIGINT) AS n_grams
      |      FROM f JOIN s USING (bucket) GROUP BY f.doc_id)
      |SELECT doc_id, n_grams, weight FROM w
      |ORDER BY weight DESC, doc_id LIMIT 100""".stripMargin

  // --- d54: k-anonymity audit (round 12) ------------------------------------
  // Sweeney's k-anonymity (IJUFKS 2002) over the corpus's quasi-
  // identifiers: a document whose (lang, source, size-bucket) equivalence
  // class has fewer than k members is re-identifiable from metadata
  // alone — the release-risk audit that complements d24's content
  // redaction (scrubbing the text body is moot if the metadata row is
  // unique). Size buckets are integer log2 (`length(bin(n+1))`, exact in
  // both engines); k = 5. Two cheap aggregates: classes (map-side
  // partial combine, one shuffle bounded by |lang|x|source|x~40
  // buckets), then the per-(lang, source) risk rollup — nothing
  // corpus-proportional ever shuffles, 100 TB-flat.
  private def d54(s: SparkSession, dir: String): DataFrame = {
    val cls = t(s, dir, "documents")
      .groupBy(col("lang"), col("source"),
        length(bin(col("n_chars") + 1)).as("len_bucket"))
      .agg(count(lit(1)).as("cn"))
    cls.groupBy("lang", "source")
      .agg(count(lit(1)).as("n_classes"),
        min("cn").as("k_min"),
        sum(when(col("cn") < 5, col("cn")).otherwise(0L)).as("n_at_risk"))
  }

  private val d54Oracle =
    """WITH c AS (SELECT lang, source,
      |             length(bin(CAST(n_chars + 1 AS BIGINT))) AS len_bucket,
      |             COUNT(*) AS cn
      |           FROM documents GROUP BY 1, 2, 3)
      |SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_classes,
      |       CAST(MIN(cn) AS BIGINT) AS k_min,
      |       CAST(SUM(CASE WHEN cn < 5 THEN cn ELSE 0 END) AS BIGINT) AS n_at_risk
      |FROM c GROUP BY lang, source""".stripMargin

  // --- p01: the end-to-end training-data prep pipeline ---------------------
  // The engine's capstone as ONE declared query — the stages a real
  // pre-training corpus goes through, chained into a single DAG:
  //   1. exact dedup (min-doc_id winner per distinct text — d01/d19);
  //   2. quality gate (whitespace token count ≥ 20 — d02's counter);
  //   3. decontamination (drop docs sharing any 5-gram with the src0
  //      eval set — d18's exact audit as an anti-join);
  //   4. train split (md5 content-hash bucket < 8 — d23);
  //   5. sequence packing (2000-token packs per source via one window
  //      cumsum — d22), reported per pack.
  // Every stage is linear (one groupBy for winners, one distinct-gram
  // equijoin for contamination, one window for packing) and every
  // number is exact integers, so DuckDB replays the whole pipeline in a
  // single WITH chain and the hash-match covers stage COMPOSITION — the
  // thing the per-stage queries can't test.
  private def p01(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val winners = docs.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
    val uniq = docs.join(winners.select(col("doc_id")), "doc_id")
      .select(col("doc_id"), col("source"), col("text"))
    val gated = uniq.withColumn("n_tokens",
        expr("CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)"))
      .filter(col("n_tokens") >= 20)
    val g5 = "transform(sequence(1, size(ws) - 4), i -> concat_ws(' ', slice(ws, i, 5)))"
    def grams(df: DataFrame) = df
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 5)
      .select(col("doc_id"), explode(expr(s"array_distinct($g5)")).as("g"))
    val evalGrams = grams(docs.filter(col("source") === "src0"))
      .select(col("g")).distinct()
    val corpus = gated.filter(col("source") =!= "src0")
    val contaminated = grams(corpus).join(evalGrams, "g")
      .select(col("doc_id")).distinct()
    val clean = corpus.join(contaminated, Seq("doc_id"), "left_anti")
    val train = clean.filter(
      expr("CAST(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT) % 10 < 8"))
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    train.withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id", expr("CAST((cum - n_tokens) div 2000 AS BIGINT)"))
      .groupBy("source", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("pack_tokens"))
  }

  private val p01Oracle =
    """WITH w AS (SELECT text, MIN(doc_id) AS doc_id FROM documents GROUP BY text),
      |d0 AS (SELECT d.doc_id, d.source, d.text FROM documents d JOIN w ON w.doc_id = d.doc_id),
      |d1 AS (SELECT doc_id, source, text,
      |         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
      |       FROM d0 WHERE length(text) - length(replace(text, ' ', '')) + 1 >= 20),
      |eg AS (SELECT DISTINCT array_to_string(ws[i:i+4], ' ') AS g
      |       FROM (SELECT string_split(text, ' ') AS ws FROM documents WHERE source = 'src0'),
      |            unnest(range(1, greatest(len(ws) - 3, 1))) AS t(i)),
      |corpus AS (SELECT * FROM d1 WHERE source <> 'src0'),
      |cg AS (SELECT DISTINCT doc_id FROM (
      |         SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS g
      |         FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus),
      |              unnest(range(1, greatest(len(ws) - 3, 1))) AS t(i)) x
      |       JOIN eg USING (g)),
      |clean AS (SELECT * FROM corpus WHERE doc_id NOT IN (SELECT doc_id FROM cg)),
      |tr AS (SELECT * FROM clean
      |       WHERE CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) % 10 < 8),
      |c2 AS (SELECT source, doc_id, n_tokens,
      |        CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |       FROM tr)
      |SELECT source, CAST((cum - n_tokens) // 2000 AS BIGINT) AS pack_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
      |FROM c2 GROUP BY source, pack_id""".stripMargin

  // --- q45: full-outer reconciliation ------------------------------------
  // The audit-join shape: per-entity totals from two independent systems
  // (order spend keyed by o_custkey vs event spend keyed by user_id)
  // FULL OUTER joined so entities present in only one side surface with
  // the other side NULL. Both sides pre-aggregate to entity cardinality
  // before the join — the full-outer shuffle moves one row per entity,
  // never raw facts.
  private def q45(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("uid"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("order_cents"))
    val e = Tables.events(s, dir)
      .groupBy(col("user_id").as("uid"))
      .agg(sum(expr("CAST(floor((value) * 100 + 0.5) AS BIGINT)")).as("event_cents"))
    o.join(e, Seq("uid"), "full_outer")
      .select(col("uid"), col("order_cents"), col("event_cents"),
        expr("""CAST(CASE WHEN order_cents IS NULL THEN 1
               | WHEN event_cents IS NULL THEN 2 ELSE 0 END AS BIGINT)""".stripMargin)
          .as("presence"))
  }

  private val q45Oracle =
    """SELECT COALESCE(o.uid, e.uid) AS uid, order_cents, event_cents,
      |  CAST(CASE WHEN order_cents IS NULL THEN 1
      |   WHEN event_cents IS NULL THEN 2 ELSE 0 END AS BIGINT) AS presence
      |FROM (SELECT o_custkey AS uid,
      |        CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS order_cents
      |      FROM orders GROUP BY o_custkey) o
      |FULL OUTER JOIN
      |     (SELECT user_id AS uid,
      |        CAST(SUM(CAST(floor((value) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS event_cents
      |      FROM events GROUP BY user_id) e
      |ON o.uid = e.uid""".stripMargin

  // --- e10: metadata-filtered hybrid ANN ---------------------------------
  // Hybrid search: a relational predicate (document language) restricts
  // the corpus BEFORE any similarity math — the filter join prunes the
  // scan, then the surviving vectors score against the broadcast query
  // set. The predicate-first order is the scale-correct plan: at 100 TB
  // the filter's selectivity multiplies the entire ANN cost.
  private def e10(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
    val en = t(s, dir, "documents").filter(col("lang") === "en").select(col("doc_id"))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val w = Window.partitionBy("qid").orderBy(col("score_e6").desc, col("cid").asc)
    emb.join(en, col("vec_id") === col("doc_id"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        expr(dotE6("qe", "e", 64)).as("score_e6"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("qid", "cid", "score_e6", "rank")
  }

  private val e10Oracle =
    """WITH emb AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
      |en AS (SELECT doc_id FROM documents WHERE lang = 'en'),
      |q AS (SELECT vec_id AS qid, e AS qe FROM emb WHERE vec_id < 10),
      |scored AS (
      |  SELECT qid, c.vec_id AS cid,
      |    CAST(list_sum(list_transform(range(1, 65),
      |      i -> CAST(floor(1000000 * qe[i] * e[i] + 0.5) AS BIGINT))) AS BIGINT) AS score_e6
      |  FROM emb c JOIN en ON c.vec_id = en.doc_id
      |  CROSS JOIN q WHERE c.vec_id <> q.qid)
      |SELECT qid, cid, score_e6, rank FROM (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, cid ASC) AS BIGINT) AS rank
      |  FROM scored) WHERE rank <= 5""".stripMargin

  // --- q46: windowed event dedup (data cleaning) --------------------------
  // Collapses bursts: keep an event only if the user's previous event of
  // the same type is more than 5 minutes older (or absent). One window
  // over (user_id, event_type) in the exact µs integer domain; full sort
  // key (tsu, event_id) so ties dedup identically everywhere.
  private def q46(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("tsu").asc, col("event_id").asc)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("tsu"))
      .withColumn("prev_tsu", lag(col("tsu"), 1).over(w))
      .filter(col("prev_tsu").isNull || col("tsu") - col("prev_tsu") > 300000000L)
      .select("event_id", "user_id", "event_type", "tsu")
  }

  private val q46Oracle =
    """SELECT event_id, user_id, event_type, tsu FROM (
      |  SELECT event_id, user_id, event_type, tsu,
      |    lag(tsu) OVER (PARTITION BY user_id, event_type ORDER BY tsu ASC, event_id ASC) AS prev_tsu
      |  FROM (SELECT event_id, user_id, event_type, epoch_us(ts) AS tsu FROM events))
      |WHERE prev_tsu IS NULL OR tsu - prev_tsu > 300000000""".stripMargin

  // --- q56: peak session concurrency (two-phase sweep line) ---------------
  // "How many sessions were live at once, per hour?" — the classic
  // interval-overlap sweep: sessions (q15's 30-minute-gap semantics)
  // become ±1 deltas at [start, end+1), and running-sum order gives live
  // concurrency. The textbook formulation is ONE global ordered cumsum —
  // an unpartitioned window, the d33 scale-killer. Here the cumsum is
  // two-phase: a per-HOUR local window (hour is a prefix of the global
  // (tsu, delta DESC) order, so locals are exact), plus per-hour offsets
  // from a window over the hour-totals frame — ≤ calendar-hours rows,
  // bounded by time span, not data volume. Tie policy: same-µs starts
  // count before ends (delta DESC), so touching sessions overlap; the
  // per-hour MAX is order-invariant among identical (tsu, delta) rows.
  private def q56(s: SparkSession, dir: String): DataFrame = {
    val wu = Window.partitionBy("user_id").orderBy(col("tsu").asc, col("event_id").asc)
    val sess = Tables.events(s, dir)
      .select(col("user_id"), expr("ts div 1000").as("tsu"), col("event_id"))
      .withColumn("prev", lag(col("tsu"), 1).over(wu))
      .withColumn("new_s",
        when(col("prev").isNull || col("tsu") - col("prev") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("new_s").over(wu))
      .groupBy("user_id", "sid")
      .agg(min("tsu").as("st"), max("tsu").as("en"))
    // NOT materialized (q59 recipe, round 11): both the local cumsum and
    // the hour-offset aggregate consume deltas, but the derivation is
    // deterministic (full sort keys on every window) and the expensive
    // shuffles inside it — the per-user window exchange and the session
    // aggregate — are deduped across the two consumers by Spark's
    // exchange reuse / AQE stage cache, so the recompute is map-side
    // work only. A localCheckpoint here would write a corpus-
    // proportional frame to executor storage at 100× (the round-10
    // verdict's one plan-quality mark; same fix as q59).
    val deltas = sess.select(col("st").as("tsu"), lit(1L).as("delta"))
      .unionAll(sess.select((col("en") + 1).as("tsu"), lit(-1L).as("delta")))
      .withColumn("hour", expr("tsu div 3600000000"))
    val wloc = Window.partitionBy("hour")
      .orderBy(col("tsu").asc, col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = deltas.withColumn("lc", sum("delta").over(wloc))
    // phase 2: offsets over the tiny hour-totals frame
    val offs = deltas.groupBy("hour").agg(sum("delta").as("ht"))
      .withColumn("off", coalesce(
        sum("ht").over(Window.orderBy("hour")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("hour"), col("off"))
    local.join(broadcast(offs), "hour")
      .withColumn("conc", col("off") + col("lc"))
      .groupBy("hour")
      .agg(max("conc").as("max_concurrency"),
        sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_session_starts"))
  }

  // oracle: the SAME sweep as one global cumsum — DuckDB's single-node
  // window is exactly what the two-phase plan must reproduce
  private val q56Oracle =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, event_id FROM events),
      |x AS (SELECT user_id, tsu, event_id,
      |        CASE WHEN lag(tsu) OVER w IS NULL OR tsu - lag(tsu) OVER w > 1800000000
      |             THEN 1 ELSE 0 END AS new_s
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
      |y AS (SELECT user_id, tsu,
      |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsu, event_id
      |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |      FROM x),
      |s AS (SELECT user_id, sid, MIN(tsu) AS st, MAX(tsu) AS en FROM y GROUP BY 1, 2),
      |d AS (SELECT st AS tsu, 1 AS delta FROM s
      |      UNION ALL SELECT en + 1, -1 FROM s),
      |c AS (SELECT tsu // 3600000000 AS hour, delta,
      |        SUM(delta) OVER (ORDER BY tsu, delta DESC
      |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      |      FROM d)
      |SELECT hour, CAST(MAX(conc) AS BIGINT) AS max_concurrency,
      |  CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_session_starts
      |FROM c GROUP BY hour""".stripMargin

  // --- q57: revenue concentration (exact integer Gini per nation) ---------
  // Inequality audit over customer revenue: Gini = (2W - (n+1)S) / (nS)
  // with x ascending, i its 1-based rank, W = Σ i·x, S = Σ x. Everything
  // integer-exact: revenue in cents, the rank from GlobalRank's two-phase
  // row number over (nation, cents, custkey) — per-nation ranks derived
  // by subtracting each nation's broadcast min — so NO per-nation window
  // (25 nations would mean 25 tasks each sorting 1/25th of a 100-TB
  // customer table), and the final division runs 128-bit (Spark
  // DECIMAL(38,0) `div` ↔ DuckDB HUGEINT `//`; numerator is provably
  // ≥ 0 by Chebyshev's sum inequality, so trunc ≡ floor).
  private def q57(s: SparkSession, dir: String): DataFrame = {
    val custRev = t(s, dir, "orders")
      .select(col("o_custkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("o_custkey").agg(sum("cents").as("cents"))
    val perNation = t(s, dir, "customer")
      .join(custRev, col("c_custkey") === col("o_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"), col("cents"))
    val ranked = graft.operators.GlobalRank.withRowNumber(
      perNation,
      Seq(col("n_name").asc, col("cents").asc, col("c_custkey").asc), "grank")
    val base = ranked.groupBy("n_name").agg(min("grank").as("goff"))
    ranked.join(broadcast(base), "n_name")
      .withColumn("i", col("grank") - col("goff") + lit(1L))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_cust"),
        sum("cents").as("sum_cents"),
        sum(expr("CAST(i AS DECIMAL(38,0)) * cents")).as("w128"))
      .select(col("n_name"), col("n_cust"), col("sum_cents"),
        expr("""CAST(CAST(1000 AS DECIMAL(38,0))
               |  * (2 * w128 - CAST(n_cust + 1 AS DECIMAL(38,0)) * sum_cents)
               |  div (CAST(n_cust AS DECIMAL(38,0)) * sum_cents) AS BIGINT)""".stripMargin)
          .as("gini_permille"))
  }

  private val q57Oracle =
    """WITH cr AS (SELECT o_custkey,
      |        CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |      FROM orders GROUP BY o_custkey),
      |p AS (SELECT n_name, c_custkey, cents
      |      FROM customer JOIN cr ON c_custkey = o_custkey
      |      JOIN nation ON c_nationkey = n_nationkey),
      |r AS (SELECT n_name, cents,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY cents, c_custkey) AS BIGINT) AS i
      |      FROM p),
      |a AS (SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
      |        CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |        SUM(CAST(i AS HUGEINT) * cents) AS w128
      |      FROM r GROUP BY n_name)
      |SELECT n_name, n_cust, sum_cents,
      |  CAST(CAST(1000 AS HUGEINT) * (2 * w128 - CAST(n_cust + 1 AS HUGEINT) * sum_cents)
      |    // (CAST(n_cust AS HUGEINT) * sum_cents) AS BIGINT) AS gini_permille
      |FROM a""".stripMargin

  // --- q58: top-k-per-group via the bounded-heap aggregate -----------------
  // The same answer q07/q41 get from a window, produced the way a 100-TB
  // engine should: [[graft.functions.TopKAgg]] is a commutative custom
  // aggregate, so map-side partial aggregation trims every partition's
  // contribution to k rows per group BEFORE the shuffle — k·|groups|
  // rows cross the wire instead of the whole fact table (the window
  // formulation shuffles and sorts every row). Total order
  // (price DESC, orderkey ASC) keeps the result merge-order-proof;
  // DuckDB replays it as the plain window it replaces.
  private def q58(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("price_cents"))
      .groupBy("o_custkey")
      .agg(graft.functions.TopKAgg.topk_by(
        col("price_cents"), col("o_orderkey"), 3).as("tk"))
      .select(col("o_custkey"), posexplode(col("tk")))
      .select(col("o_custkey"), (col("pos") + 1).cast(LongType).as("rank"),
        col("col.ord").as("price_cents"), col("col.id").as("o_orderkey"))

  private val q58Oracle =
    """SELECT o_custkey, CAST(rn AS BIGINT) AS rank, price_cents, o_orderkey FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3""".stripMargin

  // --- q59: exact equi-depth histogram ------------------------------------
  // The optimizer-statistics primitive as a declared query: split the
  // price distribution into 8 equal-POPULATION buckets and report each
  // bucket's range and mass. Equi-depth needs every row's exact rank —
  // the textbook plan is one global ordered window (the d33 killer);
  // here the rank is GlobalRank's two-phase row number and the bucket is
  // plain integer arithmetic over the broadcast total, so every
  // data-sized stage stays partitioned. Full sort key (cents, orderkey,
  // linenumber) so tied prices split between buckets identically in
  // both engines.
  private def q59(s: SparkSession, dir: String): DataFrame = {
    val x = t(s, dir, "lineitem")
      .select(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cents"),
        col("l_orderkey"), col("l_linenumber"))
    val n = x.agg(count(lit(1)).as("n")) // 1-row scalar, broadcast
    graft.operators.GlobalRank.withRowNumber(
        x, Seq(col("cents").asc, col("l_orderkey").asc, col("l_linenumber").asc), "rk")
      .crossJoin(broadcast(n))
      .withColumn("bucket", expr("CAST((rk - 1) * 8 div n AS BIGINT)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("cents").as("lo_cents"), max("cents").as("hi_cents"))
  }

  private val q59Oracle =
    """WITH x AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
      |        l_orderkey, l_linenumber FROM lineitem),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM x),
      |r AS (SELECT cents,
      |        CAST(ROW_NUMBER() OVER (ORDER BY cents, l_orderkey, l_linenumber) AS BIGINT) AS rk
      |      FROM x)
      |SELECT CAST((rk - 1) * 8 // n AS BIGINT) AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  MIN(cents) AS lo_cents, MAX(cents) AS hi_cents
      |FROM r, n GROUP BY 1""".stripMargin

  // --- p02: streaming-landing compaction ----------------------------------
  // The small-files problem as a declared operator: a streaming append
  // sink leaves one file per micro-batch (simulated here by a 32-way
  // round-robin landing), and at 100 TB the resulting millions of tiny
  // files throttle every downstream scan on file-open overhead and
  // listing cost. Compaction = read the landing, REWRITE to a bounded
  // file count sized from the actual landed bytes (targeting ~64 MiB
  // files in production; a floor of 4 here so the test corpus still
  // exercises a multi-file rewrite), then serve reads from the compacted
  // copy. The oracle hash proves the rewrite is content-lossless —
  // CompactionSpec additionally pins the file-count collapse.
  private[graft] def p02Landing(s: SparkSession, dir: String): (String, String) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    graft.TempCleanup.registerDir(tmp)
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        expr("CAST(floor((value) * 10000 + 0.5) AS BIGINT)").as("value_e4"))
    ev.repartition(32).write.parquet(s"$tmp/landing")
    val landed = s.read.parquet(s"$tmp/landing")
    val landedBytes = new java.io.File(s"$tmp/landing").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val targetFiles = math.max(4, (landedBytes / (64L << 20)).toInt)
    landed.repartition(targetFiles).write.parquet(s"$tmp/compacted")
    (s"$tmp/landing", s"$tmp/compacted")
  }

  private def p02(s: SparkSession, dir: String): DataFrame = {
    val (_, compacted) = p02Landing(s, dir)
    s.read.parquet(compacted)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum("value_e4").as("sum_value_e4"),
        expr("CAST(SUM(event_id) AS BIGINT)").as("id_sum"),
        min(expr("ts div 1000")).as("first_tsu"),
        max(expr("ts div 1000")).as("last_tsu"))
  }

  private val p02Oracle =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_e4,
      |  CAST(SUM(event_id) AS BIGINT) AS id_sum,
      |  MIN(epoch_us(ts)) AS first_tsu,
      |  MAX(epoch_us(ts)) AS last_tsu
      |FROM events GROUP BY event_type""".stripMargin

  // --- q61: z-order (Morton) clustering key -------------------------------
  // The third storage-layout lever (after q54's buckets and q55's
  // partitions): interleave the bits of two scan dimensions so sorting
  // by ONE key gives row-group locality in BOTH — a range filter on
  // either dimension then prunes most row groups of a z-ordered landing
  // (StorageLayoutSpec measures the bounding-box collapse vs an
  // unclustered layout). The key is pure integer bit arithmetic —
  // identical `& >> <<` expressions in both engines — and the top-k by
  // (zkey, event_id) is TakeOrderedAndProject, not a sort.
  // statically unrolled over the 16 literal bit positions (disjoint bits,
  // so the addition order is immaterial); the folded HOF form paid an
  // interpreted lambda + sequence allocation PER ROW — material when the
  // z-key is computed for every row of a 100 TB landing rewrite
  private[graft] def zkeyExpr(userCol: String, hourCol: String): String =
    (0 until 16).map(b =>
      s"shiftleft(($userCol >> $b) & 1, ${2 * b + 1}) + " +
        s"shiftleft(($hourCol >> $b) & 1, ${2 * b})")
      .mkString("CAST((", " + ", ")AS BIGINT)")

  private def q61(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        expr("user_id & 65535").as("u16"),
        expr("(ts div 1000) div 3600000000 & 65535").as("h16"))
      .withColumn("zkey", expr(zkeyExpr("u16", "h16")))
      .orderBy(col("zkey").asc, col("event_id").asc)
      .limit(100)

  private val q61Oracle =
    """SELECT event_id, u16, h16,
      |  CAST(list_sum([(((u16 >> b) & 1) << (2 * b + 1))
      |               + (((h16 >> b) & 1) << (2 * b)) for b in range(0, 16)]) AS BIGINT) AS zkey
      |FROM (SELECT event_id, user_id & 65535 AS u16,
      |        (epoch_us(ts) // 3600000000) & 65535 AS h16 FROM events)
      |ORDER BY zkey, event_id LIMIT 100""".stripMargin

  // --- q62: top-k-per-group with a carried payload -------------------------
  // q58's bounded-heap aggregate generalized (TopKPayloadAgg): the
  // payload — here a struct of customer + status — rides along with
  // each kept entry without participating in the order, shuffled
  // between partial and final aggregation as UnsafeRow bytes, so ANY
  // projectable type works. Same scale win as q58: k rows per group
  // per partition cross the wire, never the order table.
  private def q62(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("price_cents"))
      .groupBy("o_orderpriority")
      .agg(graft.functions.TopKPayloadAgg.topk_by_payload(
        col("price_cents"), col("o_orderkey"),
        struct(col("o_custkey"), col("o_orderstatus")), 2).as("tk"))
      .select(col("o_orderpriority"), posexplode(col("tk")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast(LongType).as("rank"),
        col("col.ord").as("price_cents"), col("col.id").as("o_orderkey"),
        col("col.payload.o_custkey").as("o_custkey"),
        col("col.payload.o_orderstatus").as("o_orderstatus"))

  private val q62Oracle =
    """SELECT o_orderpriority, CAST(rn AS BIGINT) AS rank, price_cents,
      |  o_orderkey, o_custkey, o_orderstatus FROM (
      |  SELECT o_orderpriority, o_orderkey, o_custkey, o_orderstatus,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 2""".stripMargin

  // --- q65: the window formulation REWRITTEN by the optimizer --------------
  // q62's plan, reached from q07-style window SQL: the query is written as
  // row_number-over-partition + rn <= 2 — the formulation every analyst
  // writes — and graft.rules.TopKWindowRewrite (the injectOptimizerRule
  // extension point) rewrites it into the TopKPayloadAgg bounded-heap
  // plan at optimization time. Hash-matching the ROW_NUMBER oracle proves
  // the rewrite is semantics-preserving end-to-end; PlanQualitySpec
  // asserts this exact build plans with NO Window node. Runs in its own
  // child session: the rewrite flag is session-scoped state and Verify
  // executes queries 8-way concurrently on the shared session (q07/q41,
  // the declared window rows, must keep their window plans).
  // coalesce() makes the rule's non-null contract explicit — nullable
  // sort keys keep the window plan (null ranks differ from heap drops).
  // The OUTER coalesce is load-bearing: Spark's floor() is statically
  // nullable (UnaryMathExpression hard-codes nullable=true) even over a
  // non-null input, so without it the ord key reads as nullable and the
  // rule correctly refuses to fire.
  private def q65(s: SparkSession, dir: String): DataFrame = {
    val s2 = s.newSession()
    s2.conf.set(graft.rules.TopKWindowRewrite.ConfKey, "true")
    s2.experimental.extraOptimizations = Seq(graft.rules.TopKWindowRewrite)
    val p = t(s2, dir, "part").select(
      col("p_brand"),
      expr("coalesce(p_partkey, CAST(-1 AS BIGINT))").as("pk"),
      expr("coalesce(CAST(floor(coalesce(p_retailprice, 0) * 100 + 0.5) AS BIGINT), CAST(0 AS BIGINT))")
        .as("price_cents"))
    val w = Window.partitionBy("p_brand")
      .orderBy(col("price_cents").desc, col("pk").asc)
    p.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("p_brand"), col("rn").cast(LongType).as("rank"),
        col("price_cents"), col("pk").as("p_partkey"))
  }

  private val q65Oracle =
    """SELECT p_brand, CAST(rn AS BIGINT) AS rank, price_cents, p_partkey
      |FROM (
      |  SELECT p_brand,
      |    coalesce(p_partkey, CAST(-1 AS BIGINT)) AS p_partkey,
      |    coalesce(CAST(floor(coalesce(p_retailprice, 0) * 100 + 0.5) AS BIGINT), CAST(0 AS BIGINT)) AS price_cents,
      |    ROW_NUMBER() OVER (PARTITION BY p_brand
      |      ORDER BY coalesce(CAST(floor(coalesce(p_retailprice, 0) * 100 + 0.5) AS BIGINT), CAST(0 AS BIGINT)) DESC,
      |               coalesce(p_partkey, CAST(-1 AS BIGINT)) ASC) AS rn
      |  FROM part)
      |WHERE rn <= 2""".stripMargin

  // --- q64: MERGE INTO (SCD1 upsert) ---------------------------------------
  // The table-maintenance shape Delta/Iceberg call MERGE, as one
  // declarative plan (operators/MergeInto): base snapshot = the lowest
  // two thirds of customers by key; changeset = the LATEST order per customer
  // (latest under the unique integer key day·10^10 + o_orderkey, picked
  // by max_by — a map-side-combinable argmax, no per-key window sort),
  // mapped to UPDATE (open/pending order → new balance) or DELETE
  // (finalized order). Changeset customers above the base cut INSERT. One
  // full-outer equi-join; the per-case logic is a single codegen'd
  // projection. s16 replays this exact contract as a STREAMING CDC
  // apply and shares this oracle.
  //
  // `latestChanges` is private[graft]: the streaming s16 feed must be
  // the same change rows, split into time-ordered micro-batches.
  private[graft] def changeFeed(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      // customers ≡ 3 (mod 4) never appear in the feed, so the KEEP
      // branch (base row untouched by the merge) is exercised too —
      // every synthetic customer has orders, so an unfiltered feed
      // would touch all of them
      .filter(col("o_custkey") % 4 =!= 3)
      .join(t(s, dir, "customer").select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_custkey").as("custkey"), col("c_name"),
        (expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
          * lit(10000000000L) + col("o_orderkey")).as("ord"),
        expr("CAST(floor((o_totalprice) * 100 + 0.5) AS BIGINT)").as("bal_cents"),
        when(col("o_orderstatus") === "F", lit("D")).otherwise(lit("U")).as("op"))

  private[graft] def latestChanges(feed: DataFrame): DataFrame =
    feed.groupBy("custkey")
      .agg(max_by(struct(col("c_name"), col("bal_cents"), col("op")), col("ord")).as("m"))
      .select(col("custkey"), col("m.c_name").as("c_name"),
        col("m.bal_cents").as("bal_cents"), col("m.op").as("op"))

  // scale-relative base cut (lowest two thirds of the key space) so the
  // INSERT branch exists at every SF — an absolute constant would cover
  // all keys at sf0.001 and none of the semantics would be exercised
  private[graft] def mergeBase(s: SparkSession, dir: String): DataFrame = {
    val thr = t(s, dir, "customer")
      .agg(expr("CAST((max(c_custkey) + 1) * 2 div 3 AS BIGINT)").as("thr"))
    t(s, dir, "customer").crossJoin(broadcast(thr))
      .filter(col("c_custkey") < col("thr"))
      .select(col("c_custkey").as("custkey"), col("c_name"),
        expr("CAST(floor((c_acctbal) * 100 + 0.5) AS BIGINT)").as("bal_cents"))
  }

  private def q64(s: SparkSession, dir: String): DataFrame =
    graft.operators.MergeInto(
      mergeBase(s, dir), latestChanges(changeFeed(s, dir)), "custkey",
      deleteWhen = col("s.op") === "D",
      outCols = Seq(
        "c_custkey" -> ((col("s.custkey"), col("b.custkey"), col("s.custkey"))),
        "c_name" -> ((col("b.c_name"), col("b.c_name"), col("s.c_name"))),
        "bal_cents" -> ((col("s.bal_cents"), col("b.bal_cents"), col("s.bal_cents"))),
        "row_status" -> ((lit("updated"), lit("kept"), lit("inserted")))))

  // shared verbatim by s16 (the streaming CDC apply must land the exact
  // state this one-shot MERGE computes)
  private[graft] val q64Oracle =
    """WITH ch AS (SELECT o_custkey AS custkey,
      |         CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) * 10000000000
      |           + o_orderkey AS ord,
      |         CAST(floor((o_totalprice) * 100 + 0.5) AS BIGINT) AS bal_cents,
      |         CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
      |       FROM orders WHERE o_custkey % 4 <> 3),
      |l AS (SELECT custkey, max_by(bal_cents, ord) AS bal_cents,
      |        max_by(op, ord) AS op FROM ch GROUP BY 1),
      |s AS (SELECT l.custkey, c.c_name, l.bal_cents, l.op
      |      FROM l JOIN customer c ON c.c_custkey = l.custkey),
      |b AS (SELECT c_custkey AS custkey, c_name,
      |        CAST(floor((c_acctbal) * 100 + 0.5) AS BIGINT) AS bal_cents
      |      FROM customer
      |      WHERE c_custkey < (SELECT CAST((MAX(c_custkey) + 1) * 2 // 3 AS BIGINT)
      |                         FROM customer))
      |SELECT COALESCE(b.custkey, s.custkey) AS c_custkey,
      |  CASE WHEN s.custkey IS NULL THEN b.c_name
      |       WHEN b.custkey IS NOT NULL THEN b.c_name ELSE s.c_name END AS c_name,
      |  CASE WHEN s.custkey IS NULL THEN b.bal_cents ELSE s.bal_cents END AS bal_cents,
      |  CASE WHEN s.custkey IS NULL THEN 'kept'
      |       WHEN b.custkey IS NOT NULL THEN 'updated' ELSE 'inserted' END AS row_status
      |FROM b FULL OUTER JOIN s ON b.custkey = s.custkey
      |WHERE NOT (s.custkey IS NOT NULL AND s.op = 'D')""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q64_merge_upsert", q64, Some(q64Oracle)),
    Q("e10_filtered_ann", e10, Some(e10Oracle)),
    Q("p02_landing_compaction", p02, Some(p02Oracle)),
    Q("q61_zorder_key", q61, Some(q61Oracle)),
    Q("q62_topk_payload", q62, Some(q62Oracle)),
    Q("q65_topk_rewrite", q65, Some(q65Oracle)),
    Q("q56_peak_concurrency", q56, Some(q56Oracle), headline = true),
    Q("q57_gini_concentration", q57, Some(q57Oracle)),
    Q("q58_topk_aggregate", q58, Some(q58Oracle), headline = true),
    Q("q59_equidepth_histogram", q59, Some(q59Oracle), headline = true),
    Q("q46_event_dedup_window", q46, Some(q46Oracle)),
    Q("q40_window_distribution", q40, Some(q40Oracle)),
    Q("q41_lateral_topn", q41, Some(q41Oracle)),
    Q("q45_full_outer_reconcile", q45, Some(q45Oracle)),
    Q("q42_anomaly_3sigma", q42, Some(q42Oracle)),
    Q("q43_funnel_sequence", q43, Some(q43Oracle)),
    Q("q44_cohort_retention", q44, Some(q44Oracle)),
    Q("q50_markov_transitions", q50, Some(q50Oracle)),
    Q("q53_scd2_temporal_join", q53, Some(q53Oracle)),
    Q("q54_bucketed_join", q54, Some(q54Oracle)),
    Q("q55_partition_pruning", q55, Some(q55Oracle)),
    Q("p01_prep_pipeline", p01, Some(p01Oracle), headline = true),
    Q("d54_k_anonymity", d54, Some(d54Oracle)),
    Q("d53_dsir_select", d53, Some(d53Oracle),
      aux = Seq(
        "aux_feats" -> ((s: SparkSession, dir: String) => d53Feats(s, dir)))),
    Q("d28_quantile_filter", d28, Some(d28Oracle)),
    Q("e09_text_embedding_join", e09, Some(e09Oracle)),
    Q("d27_bloom_contamination", d27, Some(d27Oracle),
      headline = true,
      aux = Seq(
        "aux_bloom" -> ((s: SparkSession, dir: String) =>
          d27Bloom(s, dir).select(posexplode(col("words")).as(Seq("idx", "word")))),
        "aux_probes" -> ((s: SparkSession, dir: String) => d27Probes(s, dir)))),
    Q("e08_two_stage_rerank", e08, Some(e08Oracle)),
    Q("d46_decontam_purge", d46, Some(d46Oracle)),
    Q("d24_redaction", d24, Some(d24Oracle)),
    Q("d25_substring_dedup", d25, Some(d25Oracle)),
    Q("d35_memorization_audit", d35, Some(d35Oracle)),
    Q("d26_source_mix", d26, Some(d26Oracle)),
    Q("d30_bpe_learn", (s, dir) => d30Learned(s, dir)._1, Some(d30Oracle),
      aux = Seq(
        "aux_merges" -> ((s: SparkSession, dir: String) => d30Learned(s, dir)._2)))
  )

  // --- d30: learned BPE merges (SURVEY §9 item 4, the last gap) ----------
  // Induces a subword merge table from the corpus with operators/BpeLearn
  // (driver-coordinated rounds over the Heaps'-law-small distinct-word
  // frequency table — the corpus is never rescanned by the loop), then
  // re-tokenizes every document with the learned merges. Oracled like
  // e04/e05: Verify exports the learned merge table (rank, pat, rep) and
  // DuckDB REPLAYS the full application — a recursive CTE applies each
  // merge rank's single-pass literal replace to every distinct word, then
  // joins token counts back to the corpus. All-integer; the exported
  // patterns carry their own space padding so both engines run the exact
  // same `replace` calls (see the determinism contract in BpeLearn's doc).
  private val d30Memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (DataFrame, DataFrame)]

  private def d30Learned(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    d30Memo.getOrElseUpdate((s, dir), {
      val words = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word").rlike("^[a-z]+$"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
      val (merges, applied) = graft.operators.BpeLearn.learn(words, nMerges = 20)
      val auxMerges = s.createDataFrame(merges).toDF()
        .select(col("rank"), col("l"), col("r"), col("pat"), col("rep"))
      val result = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word").rlike("^[a-z]+$"))
        .join(applied.select(col("word"), col("n_tokens")), "word")
        .groupBy("doc_id")
        .agg(count(lit(1)).cast(LongType).as("n_words"),
          sum("n_tokens").cast(LongType).as("n_bpe_tokens"))
      (result, auxMerges)
    })

  private def d30Oracle: String =
    """WITH RECURSIVE
      |m AS (SELECT rank, pat, rep FROM '{OUT}/_aux/d30_bpe_learn/aux_merges/*.parquet'),
      |wd AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      |aw AS (SELECT doc_id, word FROM wd WHERE regexp_full_match(word, '[a-z]+')),
      |w0 AS (SELECT DISTINCT word, ' ' || regexp_replace(word, '(.)', '\1 ', 'g') AS seq FROM aw),
      |app AS (
      |  SELECT word, seq, CAST(0 AS BIGINT) AS rank FROM w0
      |  UNION ALL
      |  SELECT a.word, replace(a.seq, m.pat, m.rep) AS seq, a.rank + 1
      |  FROM app a JOIN m ON m.rank = a.rank + 1),
      |tok AS (SELECT word, CAST(len(string_split(trim(seq), ' ')) AS BIGINT) AS nt
      |        FROM app WHERE rank = COALESCE((SELECT max(rank) FROM m), 0))
      |SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
      |       CAST(SUM(t.nt) AS BIGINT) AS n_bpe_tokens
      |FROM aw a JOIN tok t USING (word) GROUP BY a.doc_id""".stripMargin
}
