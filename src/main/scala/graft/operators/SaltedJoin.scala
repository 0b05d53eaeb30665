package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join: salt the skewed (left) side's key with a
  * deterministic shard id, replicate the right side once per shard, and
  * join on (keys, salt). A hot key's rows then spread over `salts`
  * reducers instead of melting one.
  *
  * This is the manual fallback for when AQE's skew-join split can't help
  * (e.g. the skew is in a broadcast-ineligible dimension, or the engine
  * runs with AQE off). Results are identical to the plain equi-join: each
  * left row carries exactly one salt value, and the right side contains
  * every salt replica.
  */
object SaltedJoin {

  /** @param left   the large, possibly skewed side
    * @param right  the smaller side, replicated `salts` times
    * @param keys   equi-join key column names (on both sides)
    * @param salts  shard fan-out for hot keys
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // right/full outer (and right_semi/anti) would emit each unmatched
    // RIGHT row once per salt replica — `salts` duplicates. Only join
    // types where unmatched right rows are dropped are equivalent to the
    // plain join.
    val allowed = Set("inner", "cross", "left", "leftouter", "leftsemi", "leftanti")
    require(allowed.contains(joinType.toLowerCase.replace("_", "")),
      s"SaltedJoin: joinType '$joinType' would duplicate unmatched right rows " +
        s"(one per salt); use the plain join for right/full outer")
    // per-row round-robin shard: the salt only ROUTES rows — the right
    // side carries every replica, so any salt value joins correctly and
    // retry-instability is harmless. A hash of the row's columns (the
    // previous scheme) provably cannot spread the canonical worst case,
    // a hot key whose rows are byte-identical: every copy hashed to the
    // same salt and the whole key still melted one reducer.
    val l = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
