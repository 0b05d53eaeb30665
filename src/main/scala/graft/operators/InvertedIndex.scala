package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sharded inverted index: token → bounded postings shards.
  *
  * The naive build (`collect_list(doc_id)` per token) materializes the
  * hottest token's entire postings list as ONE array row — O(corpus) in a
  * single aggregation buffer, an executor OOM at 100 TB. Instead the
  * postings are sharded by `bucket = doc_id div cap`: every (tok, bucket)
  * row holds at most `cap` doc ids, deterministically, with no per-token
  * window needed (the bucket is derived from the id, not from a rank, so
  * the build stays one map-side-combinable aggregation). A token present
  * in every document simply owns ceil(maxDoc/cap) bounded rows.
  *
  * Document frequency is recovered as a SUM over a token's shard counts —
  * also map-side combinable, never materializing postings.
  *
  * Conjunctive (AND) lookup joins the two tokens' shard sets on `bucket`
  * and intersects WITHIN the bucket: each side of the equi-join row is
  * ≤ cap ids, so the intersection cost is bounded per row and the union
  * over buckets is exactly the global intersection (every doc id lands in
  * one bucket). This replaces the single giant `array_intersect` of two
  * O(corpus) arrays with a join whose rows never exceed the cap.
  */
object InvertedIndex {

  /** Bounded postings shards from a (doc_id, tok) pair table.
    * Output: (tok, bucket, docs sorted ASC, dfp = ids in this shard).
    *
    * PRECONDITION: the input pairs must be DISTINCT — a document's
    * repeated token must arrive once (callers `array_distinct` before
    * exploding, as d40 does). Duplicates would inflate dfp beyond true
    * document frequency and repeat ids inside `docs`. Not enforced here:
    * a defensive `.distinct()` would re-shuffle what every caller has
    * already deduplicated.
    */
  def shards(toks: DataFrame, cap: Int = 64): DataFrame =
    toks
      .groupBy(col("tok"), expr(s"doc_id div $cap").as("bucket"))
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"),
        count(lit(1)).as("dfp"))

  /** Per-token document frequency from the shard table (map-side SUM). */
  def docFreq(shards: DataFrame): DataFrame =
    shards.groupBy("tok").agg(sum(col("dfp")).cast(LongType).as("df"))
}
