package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col

/** The WHOLE-OPERATOR Catalyst extension path (SURVEY §2.5 preference
  * order (c)): as-of join as a first-class physical operator — a custom
  * `LogicalPlan` node, a planner `Strategy`, and a `SparkPlan` doing a
  * single-pass range-merge, registered through `SparkSessionExtensions`
  * (or enabled imperatively on a live session).
  *
  * Contrast with [[graft.operators.AsOfJoin]], the composed formulation
  * (union → one shuffle → running-max window). The physical operator
  * declares `ClusteredDistribution` + per-key ts ordering and lets
  * `EnsureRequirements` plan the exchanges: each side shuffles ONCE on its
  * own keys (no union of both inputs into one window pipeline), then a
  * streaming two-pointer merge joins them with O(1) state per partition —
  * no window buffering, no side tagging, and the right side never carries
  * null-padded left columns through the shuffle. Same 100-TB shape as a
  * sort-merge join, with the per-key candidate kept in a single slot.
  *
  * Semantics (both implementations, and DuckDB's `ASOF LEFT JOIN` with
  * `l.ts >= r.ts`): for every left row, the LATEST right row of the same
  * keys with `rightTs <= leftTs`; ties match; null ts never matches.
  * Among several right rows at the SAME (key, ts), the lexicographically
  * greatest payload tuple wins — the composed form's max(struct(...))
  * tie-break, enforced here by the right child's required ordering.
  * NULL join KEYS group together (the composed form's partitionBy
  * semantics; both graft forms agree) — note this diverges from an SQL
  * `ON l.key = r.key` equality, which would never match NULLs: pre-filter
  * null-keyed rows when SQL-equality semantics are required.
  */
object PhysicalAsOfJoin {

  /** Idempotently add the planner strategy to a live session. */
  def enable(spark: SparkSession): Unit =
    GraftSqlBridge.addStrategy(spark, AsOfJoinStrategy)

  /** Same signature/output contract as the composed
    * [[graft.operators.AsOfJoin]]: left columns + `asof_ts` +
    * `asof_<payload>` columns (null when no match).
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String] = Nil): DataFrame = {
    val spark = left.sparkSession
    enable(spark)
    // re-alias the right side so a self-join (q17: events vs events) can
    // never alias attribute ids across the two children
    val rFresh = right.select(right.columns.toSeq.map(c => col(c).as(c)): _*)
    val lPlan = GraftSqlBridge.analyzed(left)
    val rPlan = GraftSqlBridge.analyzed(rFresh)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${plan.output.map(_.name)}"))
    val lTs = attr(lPlan, leftTs)
    val rTs = attr(rPlan, rightTs)
    // The merge compares and the output projection reads raw ts/key
    // values at fixed widths — a type mismatch would silently corrupt
    // instead of failing analysis, so reject it loudly here.
    require(lTs.dataType == rTs.dataType,
      s"as-of ts type mismatch: $leftTs is ${lTs.dataType}, $rightTs is ${rTs.dataType}")
    keys.foreach { kName =>
      val (lk, rk) = (attr(lPlan, kName), attr(rPlan, kName))
      require(lk.dataType == rk.dataType,
        s"as-of key type mismatch on $kName: ${lk.dataType} vs ${rk.dataType}")
    }
    val asofOut =
      AttributeReference("asof_ts", lTs.dataType, nullable = true)() +:
        rightPayload.map(p =>
          AttributeReference(s"asof_$p", attr(rPlan, p).dataType, nullable = true)())
    val node = AsOfJoinNode(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      lTs, rTs,
      rightPayload.map(attr(rPlan, _)), asofOut)
    GraftSqlBridge.ofRows(spark, node)
  }
}

/** Logical as-of join: fully resolved at construction (built from analyzed
  * children), so analysis passes it through and the strategy below is its
  * only planner.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightPayload: Seq[Attribute],
    asofOutput: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ asofOutput
  override def producedAttributes: AttributeSet = AttributeSet(asofOutput)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] into [[AsOfJoinExec]]; injected via
  * [[graft.GraftExtensions]] or [[PhysicalAsOfJoin.enable]].
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(planLater(n.left), planLater(n.right), n.leftKeys, n.rightKeys,
        n.leftTs, n.rightTs, n.rightPayload, n.asofOutput) :: Nil
    case _ => Nil
  }
}

/** Physical range-merge as-of join.
  *
  * Children are hash-co-partitioned on the join keys (declared
  * `ClusteredDistribution`, satisfied by `EnsureRequirements`) and sorted
  * within partitions by (keys, ts). The merge keeps ONE buffered right row
  * plus one candidate (the latest right row at or before the current left
  * position for the current key) — constant memory per partition, each
  * input row visited exactly once.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightPayload: Seq[Attribute],
    asofOutput: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ asofOutput
  override def producedAttributes: AttributeSet = AttributeSet(asofOutput)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    // the merge keeps the LAST right row consumed among equal (key, ts) —
    // without the payload in the sort, that row depends on shuffle fetch
    // order and duplicate (key, ts) right rows would emit a
    // NONDETERMINISTIC asof payload (and diverge from the composed
    // AsOfJoin, which ties-breaks via max(struct(ts, payload...))).
    // Sorting the orderable payload columns ascending makes the last
    // equal-ts row the lexicographic max — exactly the struct-max the
    // composed form computes. Unorderable payload types (maps) stay out
    // of the sort; their ties remain arbitrary, as they are in any
    // engine.
    (rightKeys ++ (rightTs +: rightPayload.filter(a =>
      RowOrdering.isOrderable(a.dataType)))).map(SortOrder(_, Ascending)))

  // left rows pass through in their (keys, ts) order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    // capture plain Seq[Attribute]s; SparkPlan itself must not be captured
    val (lOut, rOut, out) = (left.output, right.output, output)
    val (lKeys, rKeys, lTsA, rTsA, payload, asofA) =
      (leftKeys, rightKeys, leftTs, rightTs, rightPayload, asofOutput)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsA), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsA), rOut)
      val asofProj = UnsafeProjection.create(rTsA +: payload, rOut)
      val outProj = UnsafeProjection.create(out, lOut ++ asofA)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTsA.dataType))
      val joined = new JoinedRow
      val nullAsof = InternalRow.fromSeq(Seq.fill(asofA.size)(null))

      new Iterator[InternalRow] {
        // buffered right head (sort iterators reuse row buffers → copy)
        private var rHead: InternalRow = _
        private var rHeadKey: InternalRow = _
        private var rHeadTs: InternalRow = _
        // latest right row consumed for its key
        private var candKey: InternalRow = _
        private var candAsof: InternalRow = _

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rHead = rIter.next()
            rHeadKey = rKeyProj(rHead).copy()
            rHeadTs = rTsProj(rHead).copy()
          } else rHead = null

        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTs = lTsProj(l)
          var scan = rHead != null
          while (scan) {
            val c = keyOrd.compare(rHeadKey, lKey)
            if (c < 0) advanceRight() // right key group already passed
            else if (c > 0) scan = false
            else if (rHeadTs.isNullAt(0)) advanceRight() // null ts: no match
            else if (!lTs.isNullAt(0) && tsOrd.compare(rHeadTs, lTs) <= 0) {
              candKey = rHeadKey // advanceRight re-copies, safe to alias
              candAsof = asofProj(rHead).copy()
              advanceRight()
            } else scan = false
            if (rHead == null) scan = false
          }
          val asof =
            if (!lTs.isNullAt(0) && candKey != null && keyOrd.compare(candKey, lKey) == 0)
              candAsof
            else nullAsof
          numOutputRows += 1
          outProj(joined(l, asof))
        }
      }
    }
  }
}
