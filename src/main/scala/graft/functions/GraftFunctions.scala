package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (codegen'd — preference order of the build
  * brief: composition > custom Expression > UDF) + SQL registration.
  */
object GraftFunctions {

  /** Static eval helpers referenced from generated code. */
  def tcpFlagsUtf8(flags: Int): UTF8String =
    UTF8String.fromString(graft.dissect.PacketDissector.tcpFlagsString(flags))

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    // ragged vectors and null elements REFUSE rather than degrade: a
    // prefix-truncated similarity or a null-as-0.0 slot returns a
    // confident wrong number (and diverges from any oracle replay,
    // which errors on both) — embedding columns are fixed-dim,
    // fully-populated by contract
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"cosine_sim: vector lengths differ ($n vs ${b.numElements()})")
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) throw new IllegalArgumentException(
        s"cosine_sim: null element at position $i")
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // zero-norm vectors are defined as orthogonal to everything (0.0, the
    // same convention as KMeansIvf.cosineSimLocal) — 0/0 = NaN would
    // otherwise rank differently under window sim-DESC (NaN greatest)
    // vs min(struct(-sim,...)) (NaN loses), the round-5 divergence; with
    // this guard the NaN branch is unreachable from any vector input
    if (na == 0 || nb == 0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // ---- Column API -----------------------------------------------------------

  def tcp_flags_str(c: Column): Column =
    GraftSqlBridge.column(TcpFlagsStr(GraftSqlBridge.expression(c)))
  def cosine_sim(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSim(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Register SQL functions: `tcp_flags_str(int)`, `cosine_sim(arr, arr)`. */
  /** Integer literal parameter of a SQL call (e.g. `graft_topk(h, id, 3)`'s
    * k): must be foldable — the aggregates size their buffers at plan
    * time, so a data-dependent k cannot work.
    */
  private[graft] def litInt(e: Expression, fn: String, what: String): Int = {
    require(e.foldable,
      s"$fn: $what must be an integer literal, got non-foldable $e")
    e.eval() match {
      case n: Number =>
        val v = n.intValue()
        // every litInt parameter is a count (k, numPerms, numBits): a
        // zero or negative value silently yields empty/degenerate
        // results instead of surfacing the caller's typo
        require(v > 0, s"$fn: $what must be positive, got $v")
        v
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be an integer literal, got $other")
    }
  }

  /** SQL builders — ONE list shared by [[register]] (temp functions on a
    * session) and [[graft.GraftExtensions]] (injected at session build),
    * so the two surfaces can never drift. Scalars first, then the custom
    * aggregates (the analyzer wraps a bare AggregateFunction returned
    * from a registry builder).
    */
  private[graft] val sqlBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "tcp_flags_str" -> (es => TcpFlagsStr(es.head)),
    "cosine_sim" -> (es => CosineSim(es.head, es(1))),
    "graft_topk" -> (es =>
      TopKAgg(es(0), es(1), litInt(es(2), "graft_topk", "k"))),
    "graft_topk_payload" -> (es =>
      TopKPayloadAgg(es(0), es(1), es(2),
        litInt(es(3), "graft_topk_payload", "k"))),
    "graft_minhash" -> (es =>
      MinHashAgg(es.head, litInt(es(1), "graft_minhash", "numPerms"))),
    // optional second arg = the filter's bit count (power of two; see
    // BloomAgg.sizeBits for the ndv-driven sizing the manifest uses)
    "graft_bloom" -> (es =>
      if (es.size >= 2) BloomAgg(es.head, litInt(es(1), "graft_bloom", "numBits"))
      else BloomAgg(es.head)))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    sqlBuilders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}

/** The reference's TCP flag formatter (reference src/packetstats.rs:114-142)
  * as a whole-stage-codegen-friendly scalar expression:
  * `tcp_flags_str(18)` = `"...A..S."`.
  */
case class TcpFlagsStr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  // deterministic pure function: participate in constant folding
  // (Expression.foldable defaults to false for custom expressions)
  override def foldable: Boolean = child.foldable
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"tcp_flags_str needs an integral argument, got ${child.dataType}")

  override protected def nullSafeEval(v: Any): Any =
    GraftFunctions.tcpFlagsUtf8(v match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
    })

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftFunctions.tcpFlagsUtf8((int) $c)")

  override protected def withNewChildInternal(c: Expression): TcpFlagsStr = copy(c)
}

/** Cosine similarity of two `array<double>` columns, computed in one fused
  * loop inside whole-stage codegen — replaces the interpreted
  * `aggregate(zip_with(...))` chain (~3× fewer passes, no per-element
  * lambda dispatch).
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def foldable: Boolean = left.foldable && right.foldable
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim needs two array<double> arguments, got ${left.dataType}, ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftFunctions.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.GraftFunctions.cosine($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}
