package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.PacketSchema

/** The reference's one shipped query: UDP datagram "defragmentation" —
  * back-fill L7 columns from each datagram's first fragment onto its
  * sibling fragments (reference: src/main.rs:268-301). Not payload
  * reassembly; a filter → first-per-group → left join → coalesce pipeline.
  *
  * Spark plan shape (designed for the 100 TB case):
  *   - `ff` (first fragments) is one row per fragmented UDP datagram —
  *     orders of magnitude smaller than the packet table → `broadcast(ff)`
  *     turns the enrichment join into a map-side broadcast hash join; the
  *     big table is never shuffled.
  *   - The window that picks the first fragment runs only on the
  *     pre-filtered fragment subset (predicate pushed to the parquet scan),
  *     not the full table.
  *   - `first()` determinism: the reference relies on DuckDB scan order
  *     (src/main.rs:292, SURVEY §4.4); we use `row_number()` ordered by
  *     `frame_time` so results are stable across partitionings.
  */
object Defrag {

  val JoinKeys: Seq[String] = Seq("ip_src", "ip_dst", "ip_proto", "ip_id")
  val Patched: Seq[String] = PacketSchema.defragPatched

  /** `(ip_frag_offset = 0 AND ip_mf) OR ip_frag_offset > 0` — the
    * fragmented-packet predicate of the reference's % scan
    * (reference src/main.rs:274).
    */
  val fragmentedCond =
    (col("ip_frag_offset") === 0 && col("ip_mf")) || col("ip_frag_offset") > 0

  /** One pass over the packet table collects everything the adaptive plan
    * needs: total count, fragmented count (the reference's % scan,
    * src/main.rs:274), and the UDP first-fragment count (upper bound on
    * `ff` rows — decides broadcast vs shuffle join without materializing
    * ff separately).
    */
  final case class FragStats(total: Long, fragmented: Long, firstFragments: Long) {
    def pct: Double =
      if (total == 0) 0.0 else math.round(100.0 * fragmented / total).toDouble
  }

  def fragStats(pcap: DataFrame): FragStats = {
    val row = pcap
      .agg(
        count(lit(1)).as("total"),
        sum(when(fragmentedCond, 1L).otherwise(0L)).as("frag"),
        sum(when(col("ip_proto") === 17 && col("ip_mf") && col("ip_frag_offset") === 0,
          1L).otherwise(0L)).as("ffs"))
      .head()
    FragStats(row.getLong(0),
      if (row.isNullAt(1)) 0L else row.getLong(1),
      if (row.isNullAt(2)) 0L else row.getLong(2))
  }

  /** Percentage of fragmented packets
    * (reference src/main.rs:274: `round(100*count(frag)/count(*))`).
    */
  def fragmentedPct(pcap: DataFrame): Double = fragStats(pcap).pct

  /** One row per fragmented UDP datagram: the deterministic "first"
    * fragment's six L7 columns (reference src/main.rs:292, with
    * row_number instead of DuckDB's scan-order `first`, SURVEY §4.4).
    */
  def firstFragments(pcap: DataFrame): DataFrame = {
    // FULL sort key (CLAUDE.md rule): frame_time alone ties for
    // retransmitted/duplicated first fragments of the same datagram key
    // at the same µs — the patched columns themselves break the tie, so
    // the six back-filled values are identical across partitionings even
    // when duplicate first fragments disagree
    val w = Window
      .partitionBy(JoinKeys.map(col): _*)
      .orderBy(col("frame_time").asc +: Patched.map(c => col(c).asc): _*)
    pcap
      .filter(col("ip_proto") === 17 && col("ip_mf") && col("ip_frag_offset") === 0)
      .select((JoinKeys ++ Patched :+ "frame_time").distinct.map(col): _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((JoinKeys ++ Patched).map(col): _*)
  }

  /** Max first-fragment rows we force into a broadcast. Above this (a
    * heavily fragmented multi-TB capture — the reference's own Booter8 run
    * was 90% fragmented), the enrichment falls back to a shuffle join that
    * AQE plans (including skew-split on hot datagram keys).
    */
  val MaxBroadcastFirstFragments: Long = 4000000L

  /** The enrichment join: every packet inherits its datagram's
    * first-fragment L7 columns where its own are NULL
    * (reference src/main.rs:296: EXCLUDE + coalesce×6). Keeps the
    * reference's defragged column order — the six patched columns move to
    * the end of the schema (SURVEY §2.4).
    *
    * `ff` is one row per fragmented UDP datagram: usually tiny → force a
    * broadcast so the packet table never shuffles; at pathological
    * fragmentation the adaptive guard switches to a shuffle join instead
    * of OOMing the driver.
    */
  def defrag(pcap: DataFrame, broadcastFF: Boolean = true): DataFrame = {
    val ff = Patched.foldLeft(firstFragments(pcap)) { (d, c) =>
      d.withColumnRenamed(c, "__ff_" + c)
    }
    val joined = pcap.join(if (broadcastFF) broadcast(ff) else ff, JoinKeys, "left")
    val keep = pcap.columns.filterNot(Patched.contains).toSeq
    joined.select(
      keep.map(col) ++
        Patched.map(c => coalesce(col(c), col("__ff_" + c)).as(c)): _*)
  }

  /** Full adaptive pipeline (reference src/main.rs:274-301): one stats
    * pass decides both whether to defrag (>= 1% fragmented) and how to
    * join (broadcast vs shuffle by first-fragment count). Note the parse
    * stage is fast enough that re-parsing the capture for each pass beats
    * caching the wide packet table — callers cache only when memory is
    * ample.
    */
  def apply(pcap: DataFrame, thresholdPct: Double = 1.0): DataFrame = {
    val st = fragStats(pcap)
    if (st.pct < thresholdPct) pcap
    else defrag(pcap, broadcastFF = st.firstFragments <= MaxBroadcastFirstFragments)
  }
}
