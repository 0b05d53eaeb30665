package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k as ONE custom Catalyst aggregate: per group, keep the k
  * largest (ord, id) pairs under (ord DESC, id ASC) — the scale-correct
  * alternative to `row_number().over(partitionBy(g).orderBy(...)) <= k`
  * for top-k-per-group. The window formulation shuffles and sorts EVERY
  * row of every group; this aggregate is commutative/associative, so
  * map-side partial aggregation trims each partition's contribution to k
  * rows per group BEFORE the exchange — at 100 TB, k·|groups| rows cross
  * the wire instead of the whole fact table. (Same partial-merge idea as
  * Spark's own TakeOrderedAndProject, lifted from global top-k to
  * per-group top-k.)
  *
  * The buffer is a flat (ord, id) pair list trimmed to k on overflow
  * (amortized: trim at 4k, exact trim on eval/serialize), so a
  * hostile-cardinality group costs O(k) memory, never O(group).
  * Total order (ord DESC, id ASC) makes the result deterministic for any
  * merge order — the DuckDB oracle replays it as a plain window.
  */
case class TopKAgg(
    ord: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Long, Long)]] {

  require(k > 0, s"topk_by: k must be positive, got $k")

  private type Buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]

  override def children: Seq[Expression] = Seq(ord, id)
  // The buffer stores raw longs; STRICT BIGINT check so a mistyped ord is
  // an ANALYSIS error, not a per-task ClassCastException mid-job. Strict
  // rather than ImplicitCastInputTypes: implicit numeric casting would
  // silently truncate a double ord — reordering the top-k — instead of
  // surfacing the bug.
  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType == LongType && id.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT ord and id (cast explicitly); " +
        s"got ${ord.dataType.sql}, ${id.dataType.sql}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]

  // (ord DESC, id ASC) compared directly, never via key negation:
  // -Long.MinValue overflows back to Long.MinValue, so a sortBy(-o)
  // would rank the SMALLEST possible ord as the largest — plausible
  // exactly when ord is hash-derived (xxhash64 spans the full range)
  private val pairOrd: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  private def trim(buf: Buf, bound: Int): Buf = {
    if (buf.length > bound) {
      val kept = buf.sorted(pairOrd).take(k)
      buf.clear()
      buf ++= kept
    }
    buf
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null) {
      buf += ((o.asInstanceOf[Long], i.asInstanceOf[Long]))
      trim(buf, 4 * k) // amortized: exact trim deferred to eval/serialize
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = { a ++= b; trim(a, 4 * k) }

  override def eval(buf: Buf): Any =
    new GenericArrayData(
      buf.sorted(pairOrd).take(k)
        .map { case (o, i) => InternalRow(o, i) }.toArray[Any])

  override def serialize(buf: Buf): Array[Byte] = {
    trim(buf, k)
    val bb = ByteBuffer.allocate(buf.length * 16)
    buf.foreach { case (o, i) => bb.putLong(o); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    while (bb.remaining() >= 16) buf += ((bb.getLong, bb.getLong))
    buf
  }

  override def prettyName: String = "topk_by"
  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKAgg =
    copy(ord = cs(0), id = cs(1))
}

object TopKAgg {
  /** Column API: `topk_by(ord, id, k)` → `array<struct<ord,id>>` of the
    * k largest pairs under (ord DESC, id ASC). */
  def topk_by(ord: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKAgg(GraftSqlBridge.expression(ord),
        GraftSqlBridge.expression(id), k).toAggregateExpression())
}
