package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bloom-filter build as ONE custom Catalyst aggregate: the buffer is the
  * whole bitset, each input hash sets `NumProbes` bits in a tight loop.
  * Commutative and associative (bitwise OR merge), so map-side partial
  * aggregation applies — at 100 TB each executor ORs its partition's
  * shingles into a local bitset and only `m/8` bytes per partition cross
  * the wire, never the shingles themselves.
  *
  * The bitset is emitted as 32-bit words stored in BIGINTs (`m/32`
  * entries, each in `[0, 2^32)`), so every downstream bit probe is plain
  * non-negative integer arithmetic that DuckDB reproduces exactly — no
  * sign-bit or shift-semantics differences (the oracle replays membership
  * from the exported words; see d27 in
  * [[graft.queries.PipelineOps]]).
  *
  * Probe positions use double hashing on the input's xxhash64:
  * `h1 = h & (m-1)`, `h2 = ((h & 0xFFFFFFFF) / 65536) | 1` (odd, so it
  * cycles the power-of-two table), `pos_j = (h1 + j*h2) mod m` — all
  * intermediate values < 2^18, exact in any engine.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int = BloomAgg.NumBits,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  import BloomAgg.{NumProbes, WordBits}

  require(numBits >= 1024 && numBits <= BloomAgg.MaxNumBits &&
    Integer.bitCount(numBits) == 1,
    s"BloomAgg: numBits must be a power of two in [1024, ${BloomAgg.MaxNumBits}], got $numBits")

  private val numWords: Int = numBits / WordBits

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // strict: the probe arithmetic is defined on the 64-bit hash — an
  // implicit numeric cast here would silently change which bits are set
  // (the repo's TypedImperativeAggregate rule; see MinHashAgg)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_bloom requires a BIGINT hash input (xxhash64), got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomAgg.setBits(buf, numBits, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numWords) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomAgg.serializeLongs(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomAgg.deserializeLongs(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BloomAgg =
    copy(child = cs.head)
}

object BloomAgg {
  /** DEFAULT sizing — 2^16 bits / 32-bit words / 4 probes: FPR ≈
    * (1-e^(-4n/65536))^4, ~1.2% at n=6500 inserted keys. The default is
    * a shared constant so the probe arithmetic in [[memberExpr]] and the
    * DuckDB oracle replay (d27/s08) agree textually; manifest blooms
    * instead SIZE the table from the staged file's key count via
    * [[sizeBits]] — the bitset length itself then carries m, and every
    * probe derives `numBits = words.length * WordBits` per filter.
    */
  val NumBits = 65536
  val WordBits = 32
  val NumWords: Int = NumBits / WordBits
  val NumProbes = 4

  /** Sizing ceiling: 2^24 bits = 2 MiB raw (~2.7 MiB base64 in a
    * manifest line) holds ~2.5M keys under 5% FPP with 4 probes. Beyond
    * that a per-file INLINE filter stops being manifest-sized — the next
    * step is a puffin-style sidecar, not a bigger line.
    */
  val MaxNumBits: Int = 1 << 24

  /** Bits for ~1% FPP at [[NumProbes]]=4 given `ndv` distinct keys:
    * (1-e^(-4n/m))^4 = 0.01 ⇒ m ≈ 10.5·n, rounded UP to a power of two
    * (so the `h & (m-1)` masking stays exact), floored at the 64 Kibit
    * default and capped at [[MaxNumBits]]. The pow-2 round-up also
    * absorbs approx_count_distinct's ~5% estimation error.
    */
  def sizeBits(ndv: Long): Int = {
    val want = math.max(NumBits.toLong, math.ceil(ndv * 10.5).toLong)
    if (want >= MaxNumBits) MaxNumBits
    else Integer.highestOneBit((want - 1).toInt) << 1
  }

  /** THE bit-set loop, shared by [[BloomAgg.update]], [[SizedBloomAgg]]'s
    * exact-set finalize/overflow paths, and (arithmetically) by
    * [[mightContain]] / [[memberExpr]] — one definition so a build and
    * its probes can never diverge. `numBits` must be a power of two.
    */
  @inline def setBits(words: Array[Long], numBits: Int, h: Long): Unit = {
    val h1 = (h & (numBits - 1L)).toInt
    val h2 = ((((h & 0xFFFFFFFFL) / 65536L) | 1L)).toInt
    var j = 0
    while (j < NumProbes) {
      val pos = (h1 + j * h2) % numBits
      words(pos >>> 5) |= (1L << (pos & 31))
      j += 1
    }
  }

  /** THE driver-side membership probe — the one JVM twin of
    * [[memberExpr]]'s SQL arithmetic (and of `update`'s bit-set loop
    * above), shared with [[graft.streaming.ManifestLand]]'s manifest
    * pruning so the two can never diverge. Bits derive from the words
    * array; a non-power-of-two payload refuses (a truncated filter
    * probed modulo a garbage size would return silent false negatives).
    */
  def mightContain(words: Array[Long], h: Long): Boolean = {
    val numBits = words.length * WordBits
    if (numBits <= 0 || Integer.bitCount(numBits) != 1)
      throw new IllegalStateException(
        s"corrupt bloom payload: ${words.length} words is not a power-of-two bit count")
    val h1 = (h & (numBits - 1L)).toInt
    val h2 = (((h & 0xFFFFFFFFL) / 65536L) | 1L).toInt
    var j = 0
    while (j < NumProbes) {
      val pos = (h1 + j * h2) % numBits
      if ((words(pos >>> 5) & (1L << (pos & 31))) == 0L) return false
      j += 1
    }
    true
  }

  /** Shared long-array wire codec for the TypedImperativeAggregate
    * buffers here and in [[MinHashAgg]]. */
  private[functions] def serializeLongs(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  private[functions] def deserializeLongs(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  /** Column API: `bloom_agg(hashCol)` → `array<bigint>` of `numBits/32`
    * 32-bit words. */
  def bloom_agg(c: Column, numBits: Int = NumBits): Column =
    GraftSqlBridge.column(
      BloomAgg(GraftSqlBridge.expression(c), numBits).toAggregateExpression())

  /** SQL fragment testing membership of hash column `h` against a bloom
    * words array column `words` — shares the exact probe arithmetic with
    * `update` above and with the DuckDB oracle replay. STATICALLY
    * UNROLLED into a 4-conjunct AND (the PqAnn trick): the previous
    * `forall(sequence(0,3), …)` shape materialized the sequence array
    * and dispatched a lambda PER SHINGLE — pure integer arithmetic now,
    * with whole-stage codegen's subexpression elimination sharing the
    * h1/h2 terms across probes, and the AND short-circuits on the first
    * clear bit (most probes are misses).
    */
  def memberExpr(words: String, h: String): String = {
    // the bit count is derived from the words array itself (m = size·32,
    // a power of two by construction), so the probe matches WHATEVER
    // size built the filter — a hardcoded default mask probed against a
    // sized filter would test the wrong bits and return silent false
    // negatives. Codegen's subexpression elimination shares the size()
    // and h1/h2 terms across the four probes.
    val m = s"(CAST(size($words) AS BIGINT) * $WordBits)"
    val h1 = s"($h & ($m - 1))"
    val h2 = s"((($h & 4294967295) div 65536) | 1)"
    (0 until NumProbes).map { j =>
      val pos = s"(($h1 + $j * $h2) % $m)"
      s"""(element_at($words, CAST($pos div $WordBits AS INT) + 1)
         | & shiftleft(CAST(1 AS BIGINT), CAST($pos % $WordBits AS INT))) != 0""".stripMargin
    }.mkString("(", " AND ", ")")
  }
}
