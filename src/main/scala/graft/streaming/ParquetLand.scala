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

  /** Complete-mode aggregate → per-batch snapshot through the SAME
    * staged rename swap the compacting landing uses: a direct
    * `mode("overwrite")` deletes the previous snapshot BEFORE writing
    * the new one, so a crash mid-batch (or a reader racing the write)
    * saw an empty or partial table for the whole write duration.
    * Staging to a `.compact` sibling and swapping narrows the exposed
    * window to two renames; a crash between them is finished by
    * [[recoverSwap]] on the next start, and a replay after the swap
    * overwrites the same staged dir (the batch-id names it).
    */
  def completeSnapshot(stream: DataFrame, outDir: String, ckpt: String): Unit = {
    recoverSwap(outDir)
    val q = stream.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val tmp = s"$outDir.compact$batchId"
        batch.write.mode("overwrite").parquet(tmp)
        val cur = new java.io.File(outDir)
        val old = new java.io.File(s"$outDir.old$batchId")
        if (old.exists()) graft.TempCleanup.rmrf(old) // crashed replay debris
        if (cur.exists())
          require(cur.renameTo(old), s"swap-out failed: $outDir")
        require(new java.io.File(tmp).renameTo(cur), s"swap-in failed: $tmp")
        graft.TempCleanup.rmrf(old)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Update-mode state stream → batch-id-stamped journal (CDC-style).
    * Exactly-once like [[applyBatch]]: a replayed batch (crash after
    * the parquet write, before the checkpoint commit) must not append
    * its rows a second time — the journal is an AUDIT trail, so
    * duplicates double-count per-batch deltas even though
    * [[journalState]]'s latest-row-per-key read would survive them.
    * Deterministic staged names make the pre-marker replay overwrite
    * rather than duplicate.
    */
  def updateJournal(stream: DataFrame, outDir: String, ckpt: String): Unit = {
    val q = stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // the ONE exactly-once applier, journal-prefixed — not an inline
        // copy of its guard/stage/commit sequence
        applyBatch(batch.withColumn("_batch_id", lit(batchId)),
          batchId, outDir, prefix = "j")
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
    * Crash-safe AND exactly-once: the swap is two renames (outDir →
    * .old, .compact → outDir), and a crash between them leaves the
    * landing only in the `.compact` dir — `recoverSwap` (run before the
    * stream starts) finishes that half-swap and sweeps stale
    * `.old`/`.compact` leftovers. Batch application ([[applyBatch]]) is
    * idempotent under checkpoint replay: a per-batch marker in the
    * `$outDir._applied` SIBLING dir (outside the swapped landing, so
    * compaction cannot erase it) is the single commit point — a replayed
    * batch whose marker exists is skipped even though its rows may since
    * have been folded into a compacted rewrite, and a batch that crashed
    * BEFORE its marker re-applies onto deterministic file names with
    * REPLACE_EXISTING, leaving no duplicates.
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
        applyBatch(batch, batchId, outDir)
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

  /** Atomically replace `target`'s content (write a tmp sibling, then
    * ATOMIC_MOVE over it) — THE commit primitive shared by the
    * `_applied` high-water file here and [[ManifestLand]]'s `_manifest`.
    */
  private[streaming] def atomicReplace(target: java.io.File, bytes: Array[Byte]): Unit = {
    val tmp = new java.io.File(target.getParentFile, target.getName + ".tmp")
    java.nio.file.Files.write(tmp.toPath, bytes)
    java.nio.file.Files.move(tmp.toPath, target.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Write `df` to a temp stage dir, delete any `<prefix>*` leftovers of
    * a crashed attempt (a replay may repartition into fewer parts), and
    * move the staged parts onto DETERMINISTIC `<prefix><j>.parquet`
    * names under `outDir` (REPLACE_EXISTING — never duplicated), return
    * the names. Shared by the exactly-once appliers here and in
    * [[ManifestLand]].
    */
  private[streaming] def stageParts(df: Dataset[Row], outDir: String,
      prefix: String): Seq[String] = {
    val out = new java.io.File(outDir)
    out.mkdirs()
    // stage as a HIDDEN SIBLING of the landing, not under java.io.tmpdir:
    // a landing on a different filesystem than /tmp would turn every
    // Files.move below into an EXDEV copy+delete — the batch written
    // twice, and readers able to observe a torn part file mid-copy where
    // the same-FS rename is atomic. Dot-prefixed siblings are invisible
    // to every parquet reader; stale ones (crashed attempts) are swept
    // here under the single-writer contract.
    val parent = Option(out.getParentFile).getOrElse(new java.io.File("."))
    Option(parent.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(s".${out.getName}.stage"))
      .foreach(graft.TempCleanup.rmrf)
    val stage = java.nio.file.Files.createTempDirectory(
      parent.toPath, s".${out.getName}.stage").toString
    df.write.mode("overwrite").parquet(stage)
    Option(out.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(prefix)).foreach(_.delete())
    val names = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .zipWithIndex.map { case (p, j) =>
        val name = f"$prefix$j%05d.parquet"
        java.nio.file.Files.move(p.toPath,
          java.nio.file.Paths.get(outDir, name),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        name
      }.toSeq
    graft.TempCleanup.rmrf(new java.io.File(stage))
    names
  }

  /** The high-water mark of applied batch ids (from the sibling
    * `$outDir._applied` file), -1 when none.
    */
  private[streaming] def appliedThrough(outDir: String): Long = {
    val f = new java.io.File(s"$outDir._applied")
    if (!f.exists()) -1L
    else if (f.isDirectory)
      // the pre-round-5 scheme kept per-batch marker FILES in a
      // directory at this path; the high-water mark cannot be
      // reconstructed from it, and silently re-applying (or skipping)
      // batches would corrupt the landing — refuse loudly
      throw new IllegalStateException(
        s"$f is a legacy marker directory; remove the landing and it together before restarting")
    else new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      .trim.toLongOption.getOrElse(throw new IllegalStateException(
        s"unreadable applied high-water mark in $f"))
  }

  private def commitApplied(outDir: String, batchId: Long): Unit =
    atomicReplace(new java.io.File(s"$outDir._applied"),
      batchId.toString.getBytes("UTF-8"))

  /** Apply one micro-batch to the landing EXACTLY ONCE. The sibling
    * `$outDir._applied` file (one number: the highest applied batch id —
    * O(1) forever, batch ids are monotonic under a single writer, and it
    * lives OUTSIDE the swapped landing so compaction cannot erase it) is
    * the single commit point:
    *
    *  - `batchId <= appliedThrough` → the batch fully landed in a
    *    previous attempt (its rows may since have been compacted into
    *    rewritten files) — skip entirely;
    *  - else: any `b<id>_*` files are debris of a crashed attempt —
    *    stage the batch onto deterministic `b<id>_<j>` names
    *    (REPLACE_EXISTING) after deleting leftovers (a replay may
    *    repartition into fewer parts than the crashed attempt left),
    *    then atomically advance `_applied`.
    *
    * Every crash window therefore replays into the identical end state.
    * Operational contract: resetting the CHECKPOINT (batch ids restart
    * at 0) requires removing the landing and its `_applied` sibling too,
    * or the stale high-water mark silently skips the replayed batches.
    */
  private[streaming] def applyBatch(batch: Dataset[Row], batchId: Long,
      outDir: String, prefix: String = "b"): Unit = {
    if (batchId <= appliedThrough(outDir)) return
    stageParts(batch, outDir, s"$prefix${batchId}_") // sweeps crashed-attempt leftovers
    commitApplied(outDir, batchId) // commit point
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
      // only a COMPLETED rewrite may be promoted: Spark's committer
      // writes _SUCCESS at job commit, so a dir without it is a
      // crashed-mid-write attempt. Promoting a partial dir would be
      // silent data loss on the FIRST batch of a CdcLand landing
      // (outDir never existed, so the replayed batch would read the
      // partial dir as the current snapshot instead of calling init())
      // — sweep it as debris and let the replay rebuild instead.
      val compacts = debris().filter(f =>
        f.getName.startsWith(base + ".compact") &&
          new java.io.File(f, "_SUCCESS").exists())
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
