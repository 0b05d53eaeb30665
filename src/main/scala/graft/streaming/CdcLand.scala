package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.Trigger

/** Keyed-snapshot CDC landing: each micro-batch is MERGED into the
  * current snapshot (a full rewrite — upserts are row edits, so unlike
  * the append landings there is no per-batch file to add) and the new
  * snapshot is atomically swapped in with the same two-rename protocol
  * as [[ParquetLand.appendCompacting]]'s compactor, including its crash
  * recovery ([[ParquetLand.recoverSwap]] promotes a completed rewrite if
  * a death landed between the renames).
  *
  * Exactly-once here comes from a DIFFERENT invariant than the append
  * landings' high-water mark: `merge` must be IDEMPOTENT — it applies
  * absolute states (upsert sets a value, delete tombstones a key), never
  * increments. A checkpoint-replayed batch then re-merges into the
  * post-batch snapshot and rewrites the identical state, so no marker
  * file is needed. Callers asserting that contract get replay safety in
  * every crash window:
  *
  *  - crash before the rewrite finishes → half-written `.compact<id>`
  *    dir, snapshot untouched; restart sweeps it and replays the batch;
  *  - crash between the renames → snapshot exists only as `.compact<id>`;
  *    recoverSwap promotes it, the replayed batch re-merges idempotently;
  *  - crash after the swap → replay re-merges idempotently.
  */
object CdcLand {
  def upsert(stream: DataFrame, outDir: String, ckpt: String,
      init: () => DataFrame)(
      merge: (DataFrame, Dataset[Row]) => DataFrame): Unit = {
    ParquetLand.recoverSwap(outDir)
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val out = new java.io.File(outDir)
        val cur =
          if (out.exists()) spark.read.parquet(outDir) else init()
        val tmp = s"$outDir.compact$batchId"
        // the merge plan reads the CURRENT snapshot lazily; writing the
        // rewrite executes it fully before outDir is touched
        merge(cur, batch).write.mode("overwrite").parquet(tmp)
        val old = new java.io.File(s"$outDir.old$batchId")
        if (out.exists())
          require(out.renameTo(old), s"swap-out failed: $outDir")
        require(new java.io.File(tmp).renameTo(new java.io.File(outDir)),
          s"swap-in failed: $tmp")
        graft.TempCleanup.rmrf(old)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
