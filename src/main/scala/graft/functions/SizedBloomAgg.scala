package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** [[BloomAgg]] with SIZE-AT-FINALIZE semantics (round 16, verdict #5):
  * the per-group filter is sized from the group's OWN distinct-key count,
  * decided when the aggregate finalizes — so a single aggregation pass
  * yields right-sized blooms, where [[BloomAgg]]'s fixed `numBits`
  * parameter forced [[graft.sources.ConvertManifest]] into two passes
  * (one to learn the max ndv that sizes the filters, one to build them)
  * plus a global size coupling (every file's bloom as big as the worst
  * file's).
  *
  * Mechanics: the buffer holds the EXACT distinct hash set (open
  * addressing, primitive longs) up to [[SizedBloomAgg.ExactMax]] keys,
  * then degrades to a [[BloomAgg.MaxNumBits]] bloom (overflow means ndv
  * > 2^17, for which the cap is the size [[BloomAgg.sizeBits]] would
  * pick anyway from ~1.6M keys up; between 2^17 and 1.6M the cap
  * oversizes — more bits, strictly lower FPP, never wrong). finalize
  * emits `sizeBits(exact count)` words for exact groups — all bit
  * setting through [[BloomAgg.setBits]], so [[BloomAgg.mightContain]]
  * probes the output unchanged (it derives m from the word count).
  *
  * Merge is exact∪exact (re-spilling if the union overflows),
  * exact-into-bloom, or bloom OR bloom (both sides at the cap size by
  * construction). Commutative and associative like BloomAgg, so
  * map-side partial aggregation applies; per-group state is bounded by
  * max(2^18 longs exact, 2^19 longs spilled) ≈ 2-4 MiB — and a group
  * (one part file) aggregates mostly inside the tasks that scanned that
  * file, so few groups are ever resident per task.
  */
case class SizedBloomAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SizedBloomAgg.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)

  // strict BIGINT, the repo's TypedImperativeAggregate rule (CLAUDE.md):
  // an implicit cast would silently change which bits are set
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_sized_bloom requires a BIGINT hash input (xxhash64), got ${child.dataType.sql}")

  override def createAggregationBuffer(): SizedBloomAgg.Buf = new SizedBloomAgg.Buf

  override def update(buf: SizedBloomAgg.Buf, input: InternalRow): SizedBloomAgg.Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: SizedBloomAgg.Buf, b: SizedBloomAgg.Buf): SizedBloomAgg.Buf = {
    a.mergeFrom(b)
    a
  }

  override def eval(buf: SizedBloomAgg.Buf): Any =
    new GenericArrayData(buf.finalizeWords())

  override def serialize(buf: SizedBloomAgg.Buf): Array[Byte] = buf.serialized()

  override def deserialize(bytes: Array[Byte]): SizedBloomAgg.Buf =
    SizedBloomAgg.Buf.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): SizedBloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SizedBloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): SizedBloomAgg =
    copy(child = cs.head)
}

object SizedBloomAgg {

  /** Exact-set ceiling: 2^17 distinct hashes (1 MiB of keys at load
    * ≤ 0.5). Above this the group spills to the [[BloomAgg.MaxNumBits]]
    * cap — see the class doc for why the cap is sound there.
    */
  val ExactMax: Int = 1 << 17

  private val SpillWords: Int = BloomAgg.MaxNumBits / BloomAgg.WordBits

  def sized_bloom_agg(c: Column): Column =
    GraftSqlBridge.column(
      SizedBloomAgg(GraftSqlBridge.expression(c)).toAggregateExpression())

  /** Exact-then-bloom aggregation state. Exact mode: open-addressing
    * long set (0 is the empty slot; a real 0 hash rides the `hasZero`
    * flag). Spilled mode: `words` non-null, the set released.
    */
  final class Buf {
    private var keys: Array[Long] = new Array[Long](1024)
    private var nKeys: Int = 0
    private var hasZero: Boolean = false
    private[SizedBloomAgg] var words: Array[Long] = null

    private def distinctCount: Int = nKeys + (if (hasZero) 1 else 0)

    def add(h: Long): Unit =
      if (words != null) BloomAgg.setBits(words, BloomAgg.MaxNumBits, h)
      else if (h == 0L) {
        if (!hasZero) { hasZero = true; if (distinctCount > ExactMax) spill() }
      } else {
        val mask = keys.length - 1
        var slot = mix(h) & mask
        while (keys(slot) != 0L && keys(slot) != h) slot = (slot + 1) & mask
        if (keys(slot) == 0L) {
          keys(slot) = h
          nKeys += 1
          if (distinctCount > ExactMax) spill()
          else if (nKeys * 2 >= keys.length) grow()
        }
      }

    @inline private def mix(h: Long): Int = {
      val x = h * -0x61c8864680b583ebL // fibonacci hashing; keys are
      (x >>> 40).toInt                 // already xxhash64-mixed anyway
    }

    private def grow(): Unit = {
      val old = keys
      keys = new Array[Long](old.length << 1)
      val mask = keys.length - 1
      var i = 0
      while (i < old.length) {
        val h = old(i)
        if (h != 0L) {
          var slot = mix(h) & mask
          while (keys(slot) != 0L) slot = (slot + 1) & mask
          keys(slot) = h
        }
        i += 1
      }
    }

    private def spill(): Unit = {
      words = new Array[Long](SpillWords)
      foreachKey(BloomAgg.setBits(words, BloomAgg.MaxNumBits, _))
      keys = null
      nKeys = 0
      hasZero = false
    }

    private def foreachKey(f: Long => Unit): Unit = {
      if (hasZero) f(0L)
      var i = 0
      while (i < keys.length) {
        if (keys(i) != 0L) f(keys(i))
        i += 1
      }
    }

    def mergeFrom(b: Buf): Unit =
      if (b.words != null) {
        if (words == null) spill()
        var i = 0
        while (i < words.length) { words(i) |= b.words(i); i += 1 }
      } else b.foreachKey(add)

    /** The output words array — exact groups size from their true
      * distinct count, spilled groups emit the cap-size filter.
      */
    def finalizeWords(): Array[Long] =
      if (words != null) words
      else {
        val bits = BloomAgg.sizeBits(distinctCount.toLong)
        val out = new Array[Long](bits / BloomAgg.WordBits)
        foreachKey(BloomAgg.setBits(out, bits, _))
        out
      }

    def serialized(): Array[Byte] =
      if (words != null) {
        val bb = ByteBuffer.allocate(1 + 4 + 8 * words.length)
        bb.put(1.toByte).putInt(words.length)
        words.foreach(bb.putLong)
        bb.array()
      } else {
        val bb = ByteBuffer.allocate(1 + 1 + 4 + 8 * nKeys)
        bb.put(0.toByte).put(if (hasZero) 1.toByte else 0.toByte).putInt(nKeys)
        var i = 0
        while (i < keys.length) {
          if (keys(i) != 0L) bb.putLong(keys(i))
          i += 1
        }
        bb.array()
      }
  }

  object Buf {
    def deserialize(bytes: Array[Byte]): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new Buf
      if (bb.get() == 1.toByte) {
        val n = bb.getInt()
        buf.words = new Array[Long](n)
        var i = 0
        while (i < n) { buf.words(i) = bb.getLong(); i += 1 }
      } else {
        val z = bb.get() == 1.toByte
        val n = bb.getInt()
        if (z) buf.add(0L)
        var i = 0
        while (i < n) { buf.add(bb.getLong()); i += 1 }
      }
      buf
    }
  }
}
