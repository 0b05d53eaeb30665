package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** [[TopKAgg]] generalized to CARRY AN ARBITRARY PAYLOAD (SURVEY §9
  * round-6 #3): per group, keep the k largest (ord, id) pairs under
  * (ord DESC, id ASC) together with a payload of ANY Catalyst type
  * (struct of columns, string, array, …) that rides along without
  * participating in the order. Same scale contract as TopKAgg —
  * commutative, so map-side partial aggregation trims to k rows per
  * group before the shuffle, O(k) buffer per group.
  *
  * Every kept entry is immediately projected to an `UnsafeRow` COPY at
  * update time: expression eval returns buffer-backed values (UTF8String
  * slices, column-vector structs) that the scan reuses for the next
  * input row, and a shallow `copyValue` of a struct still aliases those
  * buffers — the projection's byte copy is the only safe ownership
  * boundary (caught by the q62 gate: payload fields scrambled under the
  * shallow copy). The same rows serialize between partial and final
  * aggregation as length-prefixed bytes, so any projectable type works
  * without per-type code.
  */
case class TopKPayloadAgg(
    ord: Expression,
    id: Expression,
    payload: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[UnsafeRow]] {

  require(k > 0, s"topk_by_payload: k must be positive, got $k")

  private type Buf = scala.collection.mutable.ArrayBuffer[UnsafeRow]

  override def children: Seq[Expression] = Seq(ord, id, payload)
  // ord/id are stored as raw longs — strict BIGINT check (see TopKAgg for
  // why not ImplicitCastInputTypes); the payload is projected generically
  // and accepts any Catalyst type.
  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType == LongType && id.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT ord and id (cast explicitly); " +
        s"got ${ord.dataType.sql}, ${id.dataType.sql}")
  override def nullable: Boolean = false

  private lazy val entryType = StructType(Seq(
    StructField("ord", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("payload", payload.dataType, nullable = payload.nullable)))

  override def dataType: DataType = ArrayType(entryType, containsNull = false)

  // UnsafeProjection is not serializable; rebuilt per executor
  @transient private lazy val proj = UnsafeProjection.create(entryType)

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]

  // direct comparison, never sortBy(-ord): -Long.MinValue overflows back
  // to Long.MinValue and would rank the smallest ord first (see TopKAgg)
  private val rowOrd: Ordering[UnsafeRow] = new Ordering[UnsafeRow] {
    def compare(a: UnsafeRow, b: UnsafeRow): Int = {
      val c = java.lang.Long.compare(b.getLong(0), a.getLong(0))
      if (c != 0) c else java.lang.Long.compare(a.getLong(1), b.getLong(1))
    }
  }

  private def trim(buf: Buf, bound: Int): Buf = {
    if (buf.length > bound) {
      val kept = buf.sorted(rowOrd).take(k)
      buf.clear()
      buf ++= kept
    }
    buf
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null) {
      // .copy(): proj reuses one row AND the evaluated values alias scan
      // buffers — the byte copy takes ownership of both at once
      buf += proj(InternalRow(o, i, payload.eval(input))).copy()
      trim(buf, 4 * k)
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = { a ++= b; trim(a, 4 * k) }

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.sorted(rowOrd).take(k).toArray[Any])

  override def serialize(buf: Buf): Array[Byte] = {
    trim(buf, k)
    val rows = buf.map(_.getBytes)
    val bb = ByteBuffer.allocate(4 * rows.length + rows.map(_.length).sum)
    rows.foreach { r => bb.putInt(r.length); bb.put(r) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    while (bb.remaining() >= 4) {
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val row = new UnsafeRow(3)
      row.pointTo(rowBytes, len) // owns its fresh byte array — no reuse
      buf += row
    }
    buf
  }

  override def prettyName: String = "topk_by_payload"
  override def withNewMutableAggBufferOffset(o: Int): TopKPayloadAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPayloadAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKPayloadAgg =
    copy(ord = cs(0), id = cs(1), payload = cs(2))
}

object TopKPayloadAgg {
  /** Column API: `topk_by_payload(ord, id, payload, k)` →
    * `array<struct<ord, id, payload>>` of the k largest (ord DESC,
    * id ASC) entries, payload carried verbatim. */
  def topk_by_payload(ord: Column, id: Column, payload: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKPayloadAgg(GraftSqlBridge.expression(ord),
        GraftSqlBridge.expression(id),
        GraftSqlBridge.expression(payload), k).toAggregateExpression())
}
