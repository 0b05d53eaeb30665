package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global row-numbering WITHOUT an unpartitioned window.
  *
  * `row_number().over(Window.orderBy(...))` forces every row through one
  * task — fine on a tiny frame, fatal on a 100 TB corpus vocabulary with
  * 10⁸–10⁹ distinct tokens (the round-4 verdict's one named scale-killer,
  * d33). This is the classic two-phase ranking that keeps the total order
  * exact while every heavy stage stays partitioned:
  *
  *  1. `repartitionByRange` on the rank order — partition i's rows all
  *     precede partition i+1's (RangePartitioner boundaries from a sample).
  *  2. In-partition sort + `monotonically_increasing_id`, whose documented
  *     encoding (partition id in the upper 31 bits, per-partition record
  *     index in the lower 33) yields the LOCAL rank with no window at all.
  *  3. Per-partition row counts → cumulative offsets. This window IS
  *     unpartitioned, but its input is ≤ numPartitions rows — bounded by
  *     cluster layout, not data volume.
  *  4. Broadcast the offsets back; global rank = offset + local index + 1.
  *
  * The `localCheckpoint` after step 2 is required for CORRECTNESS, not
  * speed: `repartitionByRange` samples for its boundaries, and the frame is
  * consumed twice (offset aggregation + the probe side of the join). An
  * uncheckpointed recompute could re-sample different boundaries between
  * the two jobs and mis-rank. Checkpointing freezes partition layout and
  * ids; the frame is the distinct-key table (Heaps'-law-small for text
  * vocabularies), not the corpus.
  */
object GlobalRank {

  private val LocalIndexBits = 33 // monotonically_increasing_id layout

  /** Append `rankCol` = exact 1-based global row number under `order`.
    * `order` must be a total order (append a unique tiebreak key) or the
    * assignment within ties is partition-layout-dependent.
    */
  def withRowNumber(df: DataFrame, order: Seq[Column], rankCol: String,
                    numPartitions: Int = 0): DataFrame = {
    val p =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val parted = df
      .repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint()
    val pid = shiftrightunsigned(col("__mid"), LocalIndexBits)
    val localIdx = col("__mid").bitwiseAND(lit((1L << LocalIndexBits) - 1))
    val offsets = parted
      .groupBy(pid.as("__pid")).agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum("__n").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    parted
      .withColumn("__pid", pid)
      .join(broadcast(offsets), "__pid")
      .withColumn(rankCol, col("__off") + localIdx + lit(1L))
      .drop("__pid", "__mid", "__off")
  }
}
