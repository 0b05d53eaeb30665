package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Durable parquet landing for every streaming output mode — the
  * deployment sink plumbing behind the StreamingOps surface (the oracle
  * gate reads memory sinks; a production pipeline lands files):
  *
  *  - **append-mode** streams (transforms, stream-stream join pairs) go
  *    through Spark's NATIVE parquet sink: exactly-once via the
  *    `_spark_metadata` commit log + source checkpoint, one directory of
  *    immutable files readers can trust mid-write.
  *  - **complete-mode** aggregates can't use the native sink (it is
  *    append-only), so each micro-batch snapshot is rewritten atomically
  *    via `foreachBatch` — the standard pattern for landing a
  *    continuously-updated aggregate as a queryable parquet table.
  *  - **update-mode** stateful streams journal each batch's changed keys
  *    with their batch id; the latest batch per key is the current state,
  *    and the journal doubles as a change-data-capture audit trail.
  *
  * All three run the SAME unterminated stream builders the memory-sink
  * gate runs — semantics are verified once by the oracle, and
  * StreamingSinkSpec verifies each builder lands real files through here.
  */
object ParquetLand {

  /** Append-mode stream → native parquet sink with commit log. */
  def append(stream: DataFrame, outDir: String, ckpt: String): Unit = {
    val q = stream.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Complete-mode aggregate → per-batch atomic snapshot overwrite. */
  def completeSnapshot(stream: DataFrame, outDir: String, ckpt: String): Unit = {
    val q = stream.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        batch.write.mode("overwrite").parquet(outDir)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Update-mode state stream → batch-id-stamped journal (CDC-style). */
  def updateJournal(stream: DataFrame, outDir: String, ckpt: String): Unit = {
    val q = stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        batch.withColumn("_batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Append-mode stream → foreachBatch landing with CONTINUOUS
    * compaction (SURVEY §9 round-6 #2): each micro-batch appends its
    * files, and whenever the landing exceeds `maxFiles` parquet parts
    * the whole directory is rewritten to a bounded count and atomically
    * swapped in — so the landing never accumulates the per-batch small
    * files that throttle downstream scans at 100 TB (p02 is the one-shot
    * form; this keeps the invariant while the stream runs). Local-FS
    * rename swap; on an object store the swap would be a manifest flip.
    *
    * Crash-safe: the swap is two renames (outDir → .old, .compact →
    * outDir), and a crash between them leaves the landing only in the
    * `.compact` dir — `recoverSwap` (run before the stream starts)
    * finishes that half-swap and sweeps stale `.old`/`.compact`
    * leftovers, and the `.compact` write is `overwrite`-mode so a
    * checkpoint-replayed batch never collides with its own debris.
    * (Replay can still re-APPEND a batch's rows — at-least-once, the
    * standard foreachBatch contract; exactly-once needs the native sink
    * or a batchId manifest, both demonstrated elsewhere in this file.)
    */
  def appendCompacting(stream: DataFrame, outDir: String, ckpt: String,
      maxFiles: Int = 8, targetFiles: Int = 2): Unit = {
    def nParts(d: String): Int = {
      val fs = Option(new java.io.File(d).listFiles()).getOrElse(Array.empty)
      fs.count(_.getName.endsWith(".parquet"))
    }
    recoverSwap(outDir)
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        batch.write.mode("append").parquet(outDir)
        if (nParts(outDir) > maxFiles) {
          val spark = batch.sparkSession
          val tmp = s"$outDir.compact$batchId"
          spark.read.parquet(outDir).repartition(targetFiles)
            .write.mode("overwrite").parquet(tmp)
          val old = new java.io.File(s"$outDir.old$batchId")
          require(new java.io.File(outDir).renameTo(old), s"swap-out failed: $outDir")
          require(new java.io.File(tmp).renameTo(new java.io.File(outDir)),
            s"swap-in failed: $tmp")
          graft.TempCleanup.rmrf(old)
        }
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Finish a compaction swap interrupted mid-rename and sweep stale
    * swap debris. Invariants of the swap sequence: the `.compact` dir is
    * only ever a COMPLETE rewrite of the landing (written before any
    * rename), and outDir is only missing in the window between the two
    * renames — so if outDir is gone, the newest `.compact` IS the
    * landing (promote it); any remaining `.old`/`.compact` dirs are
    * superseded copies (delete them).
    */
  private[streaming] def recoverSwap(outDir: String): Unit = {
    val out = new java.io.File(outDir)
    val parent = Option(out.getParentFile).getOrElse(new java.io.File("."))
    val base = out.getName
    // one predicate for both promotion and sweeping (re-listed after the
    // promotion rename so the promoted dir is no longer debris)
    def debris(): Array[java.io.File] =
      Option(parent.listFiles()).getOrElse(Array.empty).filter { f =>
        f.getName.startsWith(base + ".compact") || f.getName.startsWith(base + ".old")
      }
    if (!out.exists()) {
      val compacts = debris().filter(_.getName.startsWith(base + ".compact"))
      if (compacts.nonEmpty) {
        // batchId suffix orders the copies; the newest completed rewrite wins
        val newest = compacts.maxBy(f =>
          f.getName.stripPrefix(base + ".compact").toLongOption.getOrElse(-1L))
        require(newest.renameTo(out), s"swap recovery failed: $newest")
      }
    }
    debris().foreach(graft.TempCleanup.rmrf)
  }

  /** Read an update journal back to current state: the highest-batch-id
    * row per key (`keyCols`), `_batch_id` dropped.
    */
  def journalState(journal: DataFrame, keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("_batch_id").desc)
    journal.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_batch_id")
  }
}
