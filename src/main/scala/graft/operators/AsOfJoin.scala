package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (an operator Spark lacks natively, SURVEY §2.5):
  * for every left row, the most recent right row with the same keys and
  * `rightTs <= leftTs`.
  *
  * Implementation is the scalable merge formulation, not a per-row probe:
  * union both inputs tagged by side, one shuffle on the keys, one
  * within-partition sort on (ts, side), then a running `max(struct(ts,
  * payload))` window over the right-side rows — O(n log n) per key group,
  * no quadratic candidate generation, no broadcast requirement on either
  * side. Ties (right ts == left ts) match, mirroring ASOF semantics with
  * `>=`; right rows at the same key+ts sort before left rows so the window
  * sees them.
  */
object AsOfJoin {

  /** @param left     probe side
    * @param right    reference side (rows looked up "as of" the left ts)
    * @param keys     equi-join key column names (present on both sides)
    * @param leftTs   left event-time column (numeric or timestamp)
    * @param rightTs  right event-time column (same type)
    * @param rightPayload columns of `right` to carry to matched output
    *                 (emitted as `asof_<name>`, null when no match)
    * @return `left` columns + `asof_ts` + asof payload columns
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    // unified layout: keys, __ts, __side (0=right sorts first on ties),
    // right payload, left columns
    // a NULL-ts right row never matches (rightTs <= leftTs is UNKNOWN) —
    // unfiltered it would sort FIRST (nulls-first asc), sit inside every
    // frame, and its non-null struct(NULL, payload) would win max() when
    // no real candidate precedes: a phantom match with asof_ts = NULL
    // but populated payload. The physical operator skips such rows in
    // its merge; drop them here for the same contract.
    val r = right.filter(col(rightTs).isNotNull).select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
          struct(col(rightTs).as("__pts") +: rightPayload.map(col): _*).as("__rp")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
          lit(null).cast(r.schema("__rp").dataType).as("__rp")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // running max over right-side (ts, payload) structs: struct ordering is
    // field-lexicographic, so the max is the latest right row at or before
    // the current position
    val matched = r.unionByName(l)
      .withColumn("__best", max(when(col("__side") === 0, col("__rp"))).over(w))
      .filter(col("__side") === 1)
    matched.select(
      leftCols.map(c => col(c).as(c)) ++
        Seq(col("__best.__pts").as("asof_ts")) ++
        rightPayload.map(p => col(s"__best.$p").as(s"asof_$p")): _*)
  }
}
