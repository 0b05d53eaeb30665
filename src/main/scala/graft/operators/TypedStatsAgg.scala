package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The typed `Dataset` aggregation API family member (q67): an
  * `org.apache.spark.sql.expressions.Aggregator` whose buffer is a case
  * class carried by a product `Encoder` — the third aggregation surface
  * the engine demonstrates, alongside codegen'd built-ins (q01) and
  * Catalyst `TypedImperativeAggregate`s (MinHashAgg/BloomAgg/TopKAgg).
  *
  * The buffer is still merged map-side (partial aggregation) and the
  * merge is associative+commutative, so the plan shape scales like any
  * hash aggregate; the trade is that reduce/merge run on DESERIALIZED
  * JVM objects outside whole-stage codegen — which is why the engine
  * reserves this API for logic that genuinely wants typed Scala (and
  * q01 stays the codegen'd route for plain arithmetic). All-integer
  * fields keep it exactly replayable cross-engine.
  */
final case class PriceStats(sum_cents: Long, n: Long, max_cents: Long)

object PriceStatsAgg extends Aggregator[Long, PriceStats, PriceStats] {
  override def zero: PriceStats = PriceStats(0L, 0L, Long.MinValue)
  override def reduce(b: PriceStats, cents: Long): PriceStats =
    PriceStats(b.sum_cents + cents, b.n + 1L, math.max(b.max_cents, cents))
  override def merge(x: PriceStats, y: PriceStats): PriceStats =
    PriceStats(x.sum_cents + y.sum_cents, x.n + y.n,
      math.max(x.max_cents, y.max_cents))
  override def finish(r: PriceStats): PriceStats = r
  override def bufferEncoder: Encoder[PriceStats] = Encoders.product[PriceStats]
  override def outputEncoder: Encoder[PriceStats] = Encoders.product[PriceStats]
}
