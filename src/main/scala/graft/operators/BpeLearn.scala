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
  * memory many times over), so each Lloyd-style round is one cheap shuffle
  * over it, weighted by corpus frequency, exactly like the classic
  * word-frequency BPE formulation. The corpus itself is touched only by
  * the (embarrassingly parallel) word-count front end and the final
  * per-document join — the iterative loop never rescans it. The loop is
  * driver-coordinated like [[KMeansIvf]]: one tiny `collect()` (a single
  * best-pair row) per merge rank.
  *
  * Determinism / replayability contract: a word is represented as its
  * symbol sequence joined and padded by single spaces (" k e y "), and
  * each merge rank applies exactly ONE left-to-right, non-overlapping,
  * single-pass literal replace of `" l r "` with `" lr "`. That is the
  * shared semantics of `java.lang.String.replace`, Spark's `replace`, and
  * DuckDB's `replace`, so an external engine can replay the full
  * application bit-for-bit from the exported merge table (rank, pat, rep)
  * — no floating point anywhere, all counts exact integers. A residual
  * overlapping occurrence (the second "a a" in "a a a a a" when the first
  * and third merge in one pass) stays unmerged at that rank; because the
  * learner recounts pairs from the CURRENT tokenization every round, such
  * a pair may legitimately recur at a later rank. This is a deliberate,
  * documented divergence from canonical exhaustive-per-rank BPE in favor
  * of cross-engine bit-exactness.
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
    * @return (merge table in rank order,
    *          applied DF: word, freq, n_tokens after all merges)
    */
  def learn(words: DataFrame, nMerges: Int): (Seq[Merge], DataFrame) = {
    // " k e y " — every symbol wrapped in single spaces (see replay contract)
    val seq0 = concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 "))
    val base = words.select(col("word"), col("freq"), seq0.as("seq")).cache()
    base.count() // materialize once; every round re-derives from this plan

    val merges = scala.collection.mutable.ListBuffer.empty[Merge]
    var seqCol: Column = col("seq")
    var rank = 0L
    var done = false
    while (rank < nMerges && !done) {
      val best = base
        .select(col("freq"), split(trim(seqCol), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("freq"),
          explode(expr("transform(sequence(0, size(ws)-2), i -> struct(ws[i] AS l, ws[i+1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (best.isEmpty) done = true
      else {
        rank += 1
        val (l, r) = (best(0).getString(0), best(0).getString(1))
        val m = Merge(rank, l, r, s" $l $r ", s" $l$r ")
        merges += m
        seqCol = replace(seqCol, lit(m.pat), lit(m.rep))
      }
    }
    val applied = base
      .select(col("word"), col("freq"),
        size(split(trim(seqCol), " ")).cast(LongType).as("n_tokens"))
      .cache()
    (merges.toList, applied)
  }
}
