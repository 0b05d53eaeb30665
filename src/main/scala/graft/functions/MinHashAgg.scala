package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64

/** MinHash signature as ONE custom Catalyst aggregate: the buffer is the
  * whole k-slot signature, updated in a tight loop per input hash —
  * replaces a k-column `min()` aggregate (which needs
  * `codegen.maxFields` headroom and k hash-map slots per group) with a
  * single `TypedImperativeAggregate`. Commutative and associative: slot
  * mins merge elementwise, so map-side partial aggregation applies.
  *
  * Slot hash: xxhash64(h, seed=slot) over the input shingle hash —
  * deterministic, no multiply-overflow issues under ANSI mode.
  */
case class MinHashAgg(
    child: Expression,
    numPerms: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numPerms > 0, s"minhash_sig: numPerms must be positive, got $numPerms")

  override def children: Seq[Expression] = Seq(child)
  // same strict-BIGINT contract as TopKAgg/BloomAgg: a mistyped shingle
  // hash must fail at ANALYSIS, not per-task with ClassCastException,
  // and an implicit numeric cast would silently change the hashed value
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT input hash (cast explicitly); " +
        s"got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numPerms) {
        val s = XXH64.hashLong(h, i)
        if (s < buf(i)) buf(i) = s
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerms) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomAgg.serializeLongs(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomAgg.deserializeLongs(bytes)

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MinHashAgg =
    copy(child = cs.head)
}

object MinHashAgg {
  /** Column API: `minhash_sig(hashCol, k)` → `array<bigint>` signature. */
  def minhash_sig(c: Column, numPerms: Int): Column =
    GraftSqlBridge.column(
      MinHashAgg(GraftSqlBridge.expression(c), numPerms)
        .toAggregateExpression())
}
