package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._

/** `min(struct(...))` as a TypedImperativeAggregate, planned into
  * ObjectHashAggregate instead of SortAggregate.
  *
  * Spark's built-in `Min` over a STRUCT keeps the running minimum in a
  * declarative agg buffer; structs are not UnsafeRow-mutable, so the
  * whole aggregate falls out of HashAggregate into SortAggregate — a
  * full sort of the input by the grouping keys on BOTH sides of the
  * exchange. Every argmin-by-struct in this engine paid that: the defrag
  * first-fragment pick (`Defrag.firstFragments`, the stats pass of every
  * convert), the k-means assignment (`KMeansIvf.assign`, once per
  * learning round), and the PQ encoder's per-subvector argmin
  * (`PqAnn`). This class keeps the exact `min(struct(...))` semantics —
  * the comparator IS Spark's interpreted struct ordering, the same total
  * order the declarative Min resolves to — but holds the current min as
  * a single UnsafeRow per group in an ObjectHashAggregate hash map: no
  * sort on either side, map-side partial merge unchanged
  * (MinStructProps pins agg ≡ min(struct) over fuzzed groups, including
  * null fields and tie rows).
  *
  * Memory: per-group state is ONE row of the struct schema (bounded by
  * the row's own width — nothing accumulates), so the right
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` for this
  * aggregate is row-count-shaped, not the default 128 that guards
  * unbounded collect_list-style buffers; see [[MinStructAgg.FallbackThreshold]].
  * Above the threshold the framework falls back to exactly the
  * sort-based merge this class replaces, so a mis-sized threshold
  * degrades to the status quo, never past it.
  */
case class MinStructAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MinStructAgg.Buffer] {

  override def children: Seq[Expression] = Seq(child)

  // strict analysis-time check (house rule: a mistyped input must fail at
  // analysis, not per-task): exact struct type, orderable fields
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(s) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an orderable STRUCT input, got ${other.sql}")
    }

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType

  // the SAME total order the declarative Min resolves to for a struct
  // (field by field, ascending, nulls first) — codegen'd: the first cut
  // used TypeUtils.getInterpretedOrdering and its per-row boxing made
  // the aggregate ~8% SLOWER than the SortAggregate it replaced on
  // e06's array-bearing structs (interleaved A/B, 5/5 rounds)
  @transient private lazy val ord =
    new org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering(
      structType.zipWithIndex.map { case (f, i) =>
        org.apache.spark.sql.catalyst.expressions.SortOrder(
          org.apache.spark.sql.catalyst.expressions.BoundReference(i, f.dataType, f.nullable),
          org.apache.spark.sql.catalyst.expressions.Ascending)
      })
  // materializes the struct's strings/arrays into the UnsafeRow buffer,
  // so .copy() below detaches the kept min from reused scan memory
  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def createAggregationBuffer(): MinStructAgg.Buffer =
    new MinStructAgg.Buffer(null)

  override def update(buf: MinStructAgg.Buffer, input: InternalRow): MinStructAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      // compare BEFORE copying — only a new minimum pays the copy
      if (buf.row == null || ord.compare(row, buf.row) < 0)
        buf.row = toUnsafe(row).copy()
    }
    buf
  }

  override def merge(a: MinStructAgg.Buffer, b: MinStructAgg.Buffer): MinStructAgg.Buffer = {
    if (b.row != null && (a.row == null || ord.compare(b.row, a.row) < 0))
      a.row = b.row
    a
  }

  override def eval(buf: MinStructAgg.Buffer): Any = buf.row

  override def serialize(buf: MinStructAgg.Buffer): Array[Byte] =
    if (buf.row == null) Array.emptyByteArray else buf.row.getBytes

  override def deserialize(bytes: Array[Byte]): MinStructAgg.Buffer =
    if (bytes.isEmpty) new MinStructAgg.Buffer(null)
    else {
      val r = new UnsafeRow(structType.length)
      r.pointTo(bytes, bytes.length)
      new MinStructAgg.Buffer(r)
    }

  override def withNewMutableAggBufferOffset(o: Int): MinStructAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinStructAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MinStructAgg =
    copy(child = cs.head)
}

object MinStructAgg {
  /** Mutable holder: the current min as a defensively-copied UnsafeRow,
    * or null before the first non-null input (min of an empty/all-null
    * group is NULL, matching the built-in Min). */
  final class Buffer(var row: UnsafeRow)

  /** `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` sized
    * for row-shaped buffers: 2^22 groups ≈ hundreds of MB per task at
    * typical struct widths — bounded by partition row count, and the
    * framework's sort fallback still guards anything past it. Set by the
    * repo-owned session builders (Bench/Verify/tests/instruments/CLI);
    * an unset session just keeps today's sort-based plan cost. */
  val FallbackKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
  val FallbackThreshold: Int = 1 << 22

  /** Column API: exact drop-in for `min(struct(...))`. */
  def min_struct(c: Column): Column =
    GraftSqlBridge.column(
      MinStructAgg(GraftSqlBridge.expression(c)).toAggregateExpression())

  /** The production argmin: MinStructAgg, unless the
    * `graft.agg.noMinStruct` sysprop restores the declarative
    * `min(struct)` — interleaved-A/B instrumentation only (both forms in
    * one JVM), shared by every call site (Defrag/KMeansIvf/PqAnn). */
  def minStructOrDeclarative(c: Column): Column =
    if (sys.props.contains("graft.agg.noMinStruct"))
      org.apache.spark.sql.functions.min(c)
    else min_struct(c)
}
