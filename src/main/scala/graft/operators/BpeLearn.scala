package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed byte-pair-encoding merge learning (SURVEY §9 item 4 — the
  * last training-data-pipeline gap): induce a subword merge table from a
  * corpus, the step d12 (fixed regex tokenizer) and d15 (word vocabulary)
  * stop short of.
  *
  * Scale design: learning runs over the DISTINCT-WORD frequency table, not
  * the corpus — by Heaps' law that table is sublinear in corpus size (a
  * 100 TB corpus has a distinct-word table that fits in one executor's
  * memory many times over), so each round is one cheap shuffle over it,
  * weighted by corpus frequency, exactly like the classic word-frequency
  * BPE formulation. The corpus itself is touched only by the
  * (embarrassingly parallel) word-count front end and the final
  * per-document join — the iterative loop never rescans it.
  *
  * Production merge counts (round 4): two knobs keep a 32k-merge
  * vocabulary tractable where the round-3 shape was O(N²):
  *
  *  - `batchK` merges are taken per counting round instead of one. The
  *    driver collects the top candidate pairs (one `TakeOrdered` job — a
  *    per-partition top-k, not a full sort) and greedily accepts pairs
  *    sharing NO symbol with an earlier acceptance in the batch: merging
  *    (a,b) only perturbs counts of pairs touching a or b, so a
  *    symbol-disjoint pair's count is still exact. Conflicting candidates
  *    are deferred to the next round's recount. `batchK = 1` reproduces
  *    the classic recount-after-every-merge sequence exactly.
  *  - every `materializeEvery` accepted merges, the tokenization is
  *    re-materialized via `localCheckpoint` (same hygiene as
  *    [[ConnectedComponents]]), which caps the Catalyst expression depth
  *    (nested single-pass `replace`s) AND the per-round re-application
  *    cost at `materializeEvery` instead of the total learned rank — each
  *    word now passes through O(N + N²/materializeEvery) replaces overall
  *    rather than O(N²).
  *
  * Determinism / replayability contract: a word is represented as its
  * symbol sequence joined and padded by single spaces (" k e y "), and
  * each merge rank applies exactly ONE left-to-right, non-overlapping,
  * single-pass literal replace of `" l r "` with `" lr "`, applied in
  * rank order. That is the shared semantics of `java.lang.String.replace`,
  * Spark's `replace`, and DuckDB's `replace`, so an external engine can
  * replay the full application bit-for-bit from the exported merge table
  * (rank, pat, rep) — no floating point anywhere, all counts exact
  * integers; batching changes WHICH merges are learned (documented
  * approximation) but never how they are applied. A residual overlapping
  * occurrence (the second "a a" in "a a a a a" when the first and third
  * merge in one pass) stays unmerged at that rank; because the learner
  * recounts pairs from the CURRENT tokenization, such a pair may
  * legitimately recur at a later rank. This is a deliberate, documented
  * divergence from canonical exhaustive-per-rank BPE in favor of
  * cross-engine bit-exactness.
  *
  * Tie-breaking is total: best pair = max by (weighted count DESC, left
  * symbol ASC, right symbol ASC), so learning is reproducible across
  * partitionings and cluster sizes.
  */
object BpeLearn {

  /** One learned merge: 1-based rank, the two joined symbols, and the
    * literal space-delimited pattern/replacement an engine applies. */
  final case class Merge(rank: Long, l: String, r: String, pat: String, rep: String)

  /** Learn up to `nMerges` merges over `words` (columns `word`, `freq`).
    * Stops early when no adjacent pair remains.
    *
    * @param batchK merges accepted per counting round (1 = classic exact
    *               sequential BPE; >1 = symbol-disjoint batching, one
    *               counting job per batch)
    * @param materializeEvery re-materialize the tokenization (truncating
    *               lineage and the nested-replace expression chain) after
    *               this many accepted merges
    * @return (merge table in rank order,
    *          applied DF: word, freq, n_tokens after all merges)
    */
  def learn(
      words: DataFrame, nMerges: Int, batchK: Int = 1,
      materializeEvery: Int = 64): (Seq[Merge], DataFrame) = {
    // " k e y " — every symbol wrapped in single spaces (see replay contract)
    val seq0 = concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 "))
    // eager localCheckpoint: materialized once; every round re-derives
    // from this (short) plan until the next re-materialization
    var base = words.select(col("word"), col("freq"), seq0.as("seq"))
      .localCheckpoint()

    val merges = scala.collection.mutable.ListBuffer.empty[Merge]
    var seqCol: Column = col("seq")
    var pending = 0
    var rank = 0L
    var done = false
    while (rank < nMerges && !done) {
      val want = math.min(batchK.toLong, nMerges - rank).toInt
      // over-collect so greedy conflict-skipping still fills the batch;
      // anything beyond this horizon waits for the next recount
      val topN = math.max(4 * want, 8)
      val top = base
        .select(col("freq"), split(trim(seqCol), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("freq"),
          explode(expr("transform(sequence(0, size(ws)-2), i -> struct(ws[i] AS l, ws[i+1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(topN) // TakeOrderedAndProject: partial top-k, no full sort
        .collect()
      if (top.isEmpty) done = true
      else {
        // greedy symbol-disjoint acceptance: a candidate whose symbols are
        // untouched by this batch's earlier merges keeps an exact-or-
        // understated count (a batch merge can only CREATE adjacencies
        // involving its new symbol, which may coincide with an existing
        // one — so a disjoint candidate's count is a lower bound, never
        // stale-high; any understated pair is recounted next round)
        val used = scala.collection.mutable.Set.empty[String]
        var taken = 0
        val it = top.iterator
        while (taken < want && it.hasNext) {
          val row = it.next()
          val (l, r) = (row.getString(0), row.getString(1))
          if (!used.contains(l) && !used.contains(r)) {
            rank += 1
            taken += 1
            val m = Merge(rank, l, r, s" $l $r ", s" $l$r ")
            merges += m
            seqCol = replace(seqCol, lit(m.pat), lit(m.rep))
            pending += 1
            used += l
            used += r
            // re-materialize INSIDE the acceptance loop so nested-replace
            // depth is capped at exactly materializeEvery even when batchK
            // does not divide it (post-batch checking let depth reach
            // materializeEvery + batchK - 1 — ADVICE r4); mid-batch is
            // safe: subsequent replaces chain on the fresh `seq` column
            if (pending >= materializeEvery) {
              base = base.select(col("word"), col("freq"), seqCol.as("seq"))
                .localCheckpoint()
              seqCol = col("seq")
              pending = 0
            }
          }
        }
      }
    }
    val applied = base
      .select(col("word"), col("freq"),
        size(split(trim(seqCol), " ")).cast(LongType).as("n_tokens"))
      .cache()
    (merges.toList, applied)
  }
}
