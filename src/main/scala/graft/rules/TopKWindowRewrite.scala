package graft.rules

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.TopKPayloadAgg

/** Optimizer rewrite: window top-k → bounded-heap aggregate.
  *
  * The ubiquitous top-k-per-group formulation
  * {{{
  *   row_number() OVER (PARTITION BY g ORDER BY ord DESC, id ASC) AS rn
  *   ... WHERE rn <= k
  * }}}
  * executes as a full shuffle of the fact table on `g` followed by a
  * per-partition SORT of every row — then throws away all but k rows per
  * group. At 100 TB that plan moves and sorts the whole table to keep a
  * sliver. The equivalent [[graft.functions.TopKPayloadAgg]] plan keeps a
  * k-bounded heap per group with MAP-SIDE partial aggregation, so only
  * k rows per (group × input partition) cross the shuffle and nothing is
  * ever globally sorted (q58 vs the window formulation it replaced;
  * Bench's x_topk_* A/B measures the same pair through this rule).
  *
  * This rule performs that plan transformation automatically, as a
  * Catalyst [[Rule]] — the engine's `injectOptimizerRule` extension point
  * (registered by [[graft.GraftExtensions]]; per-session via
  * `spark.experimental.extraOptimizations`). It fires only on the shape
  * whose semantics the aggregate reproduces EXACTLY:
  *
  *  - a lone `row_number()` window expression, immediately filtered by
  *    `rn <= k` (or `rn < k`, or literal-first mirrors) with 1 ≤ k ≤ 1024
  *    — a bounded heap is the wrong plan for a degenerate "top billion";
  *  - ORDER BY exactly (ord DESC, id ASC) with both BIGINT and
  *    NON-NULLABLE: the heap orders by (ord DESC, id ASC) natively, and
  *    nullable inputs would diverge (row_number ranks null-ord rows last /
  *    null-id rows first; the aggregate drops null entries — observable
  *    whenever a group holds fewer than k non-null rows). Queries opt in
  *    by making the non-null contract explicit (`coalesce`), exactly as
  *    they must for any other null-hostile top-k;
  *  - conjuncts not referencing rn are preserved in a Filter ABOVE the
  *    rewrite (Catalyst already pushed partition-key predicates below the
  *    window, so whatever remains is rn-adjacent residue).
  *
  * Everything else falls through untouched — mixed sort directions, other
  * window functions, rank/dense_rank tie semantics, additional window
  * expressions, nullable keys. The rewrite reconstructs the original
  * output attributes (same exprIds, same nullability) from the heap
  * entries via posexplode — `rn` itself is `pos + 1`, valid because the
  * aggregate's array is emitted already sorted by (ord DESC, id ASC).
  *
  * Like the window formulation, determinism of WHICH rows are kept
  * requires `id` to be unique per group (the standard full-sort-key
  * contract, CLAUDE.md). OFF by default — the declared window-operator
  * rows (q07/q41) must keep their window plans; q65 runs the window
  * formulation in a session with [[ConfKey]] set and hash-matches the
  * same oracle as the explicit-window SQL.
  */
object TopKWindowRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Session conf flag gating the rewrite (default off). */
  val ConfKey = "spark.graft.optimizer.windowTopKRewrite"

  /** A "top k" beyond this is not a bounded-heap workload. */
  val MaxK = 1024

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else plan.transformUp { case f: Filter => tryRewrite(f).getOrElse(f) }

  private def tryRewrite(f: Filter): Option[LogicalPlan] = f match {
    case Filter(cond,
          Window(Seq(rnAlias @ Alias(WindowExpression(_: RowNumber, _), _)),
            part,
            order @ Seq(SortOrder(ord, Descending, _, _), SortOrder(id, Ascending, _, _)),
            child, _))
        if ord.dataType == LongType && !ord.nullable &&
          id.dataType == LongType && !id.nullable &&
          part.forall(_.deterministic) =>
      val (rnConjuncts, rest) = splitConjunctivePredicates(cond)
        .partition(_.references.exists(_.exprId == rnAlias.exprId))
      rnConjuncts match {
        case Seq(bound) =>
          boundK(bound, rnAlias.exprId)
            .filter(k => k >= 1 && k <= MaxK)
            .map { k =>
              // Spark's InsertWindowGroupLimit has usually slipped a
              // sort-based per-partition group limit below the Window by
              // the time we run; the heap subsumes it — a top-k of a
              // same-spec top-≥k is the same top-k, so strip it rather
              // than sort what the aggregate is about to heap anyway
              val base = child match {
                case WindowGroupLimit(p2, o2, _: RowNumber, limit, inner)
                    if limit >= k &&
                      p2.length == part.length &&
                      p2.zip(part).forall { case (a, b) => a.semanticEquals(b) } &&
                      o2.length == order.length &&
                      o2.zip(order).forall { case (a, b) => a.semanticEquals(b) } =>
                  inner
                case other => other
              }
              rebuild(k, rest, rnAlias, part, ord, id, base)
            }
        case _ => None
      }
    case _ => None
  }

  /** `rn <= k` in any of its literal-integer spellings → Some(k). */
  private def boundK(e: Expression, rnId: ExprId): Option[Int] = e match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
        if a.exprId == rnId => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
        if a.exprId == rnId => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: AttributeReference)
        if a.exprId == rnId => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: AttributeReference)
        if a.exprId == rnId => Some(k - 1)
    case EqualTo(a: AttributeReference, Literal(1, IntegerType))
        if a.exprId == rnId => Some(1)
    case EqualTo(Literal(1, IntegerType), a: AttributeReference)
        if a.exprId == rnId => Some(1)
    case _ => None
  }

  private def rebuild(
      k: Int,
      rest: Seq[Expression],
      rnAlias: Alias,
      part: Seq[Expression],
      ord: Expression,
      id: Expression,
      child: LogicalPlan): LogicalPlan = {
    // every column the window's child produced rides the heap as payload —
    // by optimization time the child is already column-pruned to what the
    // query actually touches
    val payload = CreateStruct(child.output)
    val tk = Alias(
      TopKPayloadAgg(ord, id, payload, k).toAggregateExpression(), "graft_topk")()
    val agg = Aggregate(part, Seq(tk), child)
    val gen = PosExplode(tk.toAttribute)
    val genOut = gen.elementSchema.fields.toSeq.map(fd =>
      AttributeReference(fd.name, fd.dataType, fd.nullable)())
    // tk (child output 0) feeds the generator but nothing downstream
    val generate = Generate(gen, unrequiredChildIndex = Seq(0), outer = false,
      qualifier = None, generatorOutput = genOut, child = agg)
    val pos = genOut(0)
    val entry = genOut(1)
    val payloadF = GetStructField(entry, 2, Some("payload"))
    // re-emit the original attributes (same exprIds/nullability) so every
    // operator above the rewritten Filter resolves unchanged
    val restored = child.output.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(payloadF, i, Some(a.name)), a.name)(
        exprId = a.exprId, qualifier = a.qualifier)
    }
    // the emitted array is sorted (ord DESC, id ASC), so rank = pos + 1
    val rn = Alias(Add(pos, Literal(1)), rnAlias.name)(exprId = rnAlias.exprId)
    val projected = Project(restored :+ rn, generate)
    if (rest.isEmpty) projected else Filter(rest.reduce(And), projected)
  }
}
