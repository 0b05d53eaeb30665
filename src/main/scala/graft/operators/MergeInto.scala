package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed `MERGE INTO` (SCD1 upsert) semantics as one declarative
  * plan — the table-maintenance primitive every training-data landing
  * eventually needs (apply a CDC changeset to a keyed snapshot):
  *
  *   - matched + `deleteWhen`        → row dropped
  *   - matched otherwise             → update branch (UPDATE)
  *   - base-only                     → keep branch (row untouched)
  *   - source-only + NOT `deleteWhen`→ insert branch (INSERT); a delete
  *     for a key that was never present stays a no-op, like SQL MERGE's
  *     unmatched WHEN clauses
  *
  * Physical shape: ONE full-outer equi-join on the key. Both sides
  * shuffle-partition by the key exactly once (Spark cannot broadcast a
  * full-outer side, and at merge scale you would not want to); over
  * bucketed tables (q54's layout lever) the exchange disappears
  * entirely. The per-case branches fold into a single codegen'd Project
  * over the join — no unions, no second pass, no driver logic. Each
  * output column is `when(baseOnly, keep).when(matched, update)
  * .otherwise(insert)` — evaluated only on rows that survive the
  * delete filter.
  *
  * `outCols` maps each output column name to its (update, keep, insert)
  * expressions, resolved against the joined frame with the base side
  * aliased `b` and the source side aliased `s`.
  */
object MergeInto {
  def apply(base: DataFrame, source: DataFrame, key: String,
      deleteWhen: Column,
      outCols: Seq[(String, (Column, Column, Column))]): DataFrame = {
    val bk = col(s"b.$key")
    val sk = col(s"s.$key")
    // side-PRESENCE markers, not key nullability: a source row with a
    // NULL merge key never joins (NULL = NULL is not true), and
    // classifying by `sk.isNull` would mistake it for base-only —
    // emitting a spurious all-null "keep" row built from the absent base
    // side. With markers it takes the insert branch, which is SQL
    // MERGE's NOT MATCHED behavior for such a row.
    val matched = col("b.__b").isNotNull && col("s.__s").isNotNull
    val baseOnly = col("s.__s").isNull
    val cols = outCols.map { case (name, (u, k, i)) =>
      when(baseOnly, k).when(matched, u).otherwise(i).as(name)
    }
    base.withColumn("__b", lit(1)).as("b")
      .join(source.withColumn("__s", lit(1)).as("s"), bk === sk, "full_outer")
      // delete rows: a matched delete removes the base row; a source-only
      // delete has nothing to remove. A NULL predicate is NOT a delete
      // (SQL MERGE: an unknown WHEN-condition is not satisfied) — without
      // the coalesce, !(true && NULL) = NULL and the filter would DROP
      // the row, silently deleting on e.g. `op === "D"` when op is NULL
      .filter(!(col("s.__s").isNotNull && coalesce(deleteWhen, lit(false))))
      .select(cols: _*)
  }
}
