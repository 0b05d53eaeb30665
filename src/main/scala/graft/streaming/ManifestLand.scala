package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** The OBJECT-STORE form of the compacting landing (SURVEY §9 round-6
  * #2): where [[ParquetLand.appendCompacting]] swaps the landing
  * directory with two renames — atomic on a local/HDFS filesystem,
  * unavailable on S3-class stores — this landing's single atomic
  * primitive is REPLACING ONE SMALL MANIFEST FILE (`_manifest`; locally
  * an ATOMIC_MOVE rename, on S3 a PUT). The manifest carries BOTH the
  * live file list and the applied-batch high-water mark, so one flip
  * commits a batch's visibility and its exactly-once bookkeeping
  * together. Data files are immutable and INVISIBLE until a flip
  * references them:
  *
  *  - batch append = stage parts onto deterministic `b<id>_<j>` names,
  *    then flip to (applied=id, live ++ staged) — a crash before the
  *    flip leaves invisible orphans (vacuumed on restart) and the replay
  *    re-stages onto the same names; a replay AFTER the flip sees
  *    `batchId <= applied` and skips, which stays correct even after a
  *    compaction has renamed the batch's rows away (the high-water mark,
  *    unlike a filename check, survives rewrites);
  *  - compaction (checked OUTSIDE the skip path, so a crash between the
  *    append flip and the compaction flip is retried on replay) = write
  *    uniquely-named `c*` rewrite files, flip to only those, then delete
  *    the superseded files — readers never see a half-compacted state
  *    because visibility IS the manifest.
  *
  * TIME TRAVEL (round 6): every commit also snapshots its manifest as
  * immutable `_manifest.v<applied>` — written BEFORE the `_manifest`
  * flip, so a retained version can never dangle on uncommitted staged
  * files (a crash between the two writes leaves a PROVISIONAL v-file
  * above the high-water mark; it pins the staged files through the
  * restart vacuum and is overwritten verbatim by the deterministic
  * replay). `readVersion` reads the landing AS OF any retained commit;
  * data files stay on disk while ANY retained version references them
  * (compaction's post-flip delete and the vacuum both check the union),
  * and `expireVersions` bounds the history like Delta/Iceberg snapshot
  * retention — the default `keepVersions = 1` keeps only the current
  * state, i.e. exactly the pre-time-travel disk footprint.
  *
  * This is the Iceberg/Delta commit idea reduced to its kernel: one
  * mutable pointer, immutable everything else. Operational contract
  * (same as ParquetLand.applyBatch): resetting the CHECKPOINT requires
  * removing the landing too, or the stale high-water mark silently
  * skips replayed batches.
  */
object ManifestLand {

  private[streaming] case class Manifest(applied: Long, files: Seq[String])

  private def manifestFile(dir: String) = new java.io.File(dir, "_manifest")
  private def versionFile(dir: String, v: Long) =
    new java.io.File(dir, s"_manifest.v$v")

  private def parseManifest(mf: java.io.File): Manifest = {
    if (!mf.exists()) Manifest(-1L, Seq.empty)
    else {
      val lines = new String(Files.readAllBytes(mf.toPath), "UTF-8")
        .split("\n").iterator.filter(_.nonEmpty).toSeq
      lines match {
        case head +: rest if head.startsWith("applied=") =>
          Manifest(head.stripPrefix("applied=").toLongOption.getOrElse(
            throw new IllegalStateException(s"unreadable manifest header in $mf: $head")),
            rest)
        case Seq() => Manifest(-1L, Seq.empty)
        case other =>
          // refuse rather than guess: silently consuming a data line as
          // a header would orphan its file, and the startup vacuum would
          // then DELETE it — a parse quirk must not become data loss
          throw new IllegalStateException(
            s"unrecognized manifest header in $mf: ${other.head}")
      }
    }
  }

  private[streaming] def readManifest(dir: String): Manifest =
    parseManifest(manifestFile(dir))

  /** The landing's live parquet files (names, not paths). */
  def liveFiles(dir: String): Seq[String] = readManifest(dir).files

  /** All manifest version files present on disk, including a provisional
    * one above the high-water mark (its referenced files must be pinned).
    */
  private def versionFilesOnDisk(dir: String): Seq[java.io.File] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("_manifest.v") &&
        f.getName.stripPrefix("_manifest.v").toLongOption.isDefined)
      .sortBy(_.getName.stripPrefix("_manifest.v").toLong).toSeq

  /** COMMITTED version ids available for [[readVersion]], ascending. */
  def versions(dir: String): Seq[Long] = {
    val applied = readManifest(dir).applied
    versionFilesOnDisk(dir).map(_.getName.stripPrefix("_manifest.v").toLong)
      .filter(_ <= applied)
  }

  /** Every file name referenced by the live manifest or ANY version file
    * (committed or provisional) — the retention root set.
    */
  private def referenced(dir: String): Set[String] =
    (readManifest(dir).files ++
      versionFilesOnDisk(dir).flatMap(parseManifest(_).files)).toSet

  /** Atomically replace the manifest — THE commit primitive (shared
    * write-tmp-then-ATOMIC_MOVE implementation with ParquetLand's
    * `_applied` commit). The immutable version snapshot is written
    * FIRST so retained history never references uncommitted state the
    * vacuum could sweep.
    */
  private def flip(dir: String, m: Manifest): Unit = {
    val body = (s"applied=${m.applied}" +: m.files).mkString("\n").getBytes("UTF-8")
    ParquetLand.atomicReplace(versionFile(dir, m.applied), body)
    ParquetLand.atomicReplace(manifestFile(dir), body)
  }

  /** Delete parquet files that NO retained manifest (live or version)
    * references — orphans of crashed stages/compactions. Single-writer
    * contract: run only while no stream is writing (appendCompacting
    * runs it before starting).
    */
  def vacuum(dir: String): Unit = {
    val keep = referenced(dir)
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => (f.getName.endsWith(".parquet") && !keep.contains(f.getName)) ||
        // a crash between atomicReplace's write and its ATOMIC_MOVE
        // leaves a stale `*.tmp` sibling (ADVICE r5) — harmless to
        // readers (never consulted) but swept like any orphan
        (f.getName.startsWith("_") && f.getName.endsWith(".tmp")))
      .foreach { f => f.delete(); () }
  }

  /** Drop all but the newest `keep` COMMITTED version snapshots, then
    * sweep data files nothing references anymore — Delta/Iceberg-style
    * retention. `keep = 1` pins only the current state. A provisional
    * (above-high-water) version file is never expired here; the replay
    * that commits it will overwrite it.
    */
  def expireVersions(dir: String, keep: Int): Unit = {
    require(keep >= 1, "expireVersions: must retain at least the current version")
    val committed = versions(dir)
    committed.dropRight(keep).foreach { v => versionFile(dir, v).delete(); () }
    vacuum(dir)
  }

  private def readFiles(spark: SparkSession, dir: String, m: Manifest,
      what: String): DataFrame = {
    if (m.files.nonEmpty) spark.read.parquet(m.files.map(n => s"$dir/$n"): _*)
    else {
      require(m.applied >= 0L,
        s"ManifestLand.read on an empty landing (no committed batches): $dir")
      val sf = new java.io.File(dir, "_schema")
      require(sf.exists(),
        s"ManifestLand.$what: committed-empty landing with no _schema file: $dir")
      val schema = org.apache.spark.sql.types.DataType.fromJson(
        new String(Files.readAllBytes(sf.toPath), "UTF-8"))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    }
  }

  /** Read the landing through the manifest — the only correct read. A
    * COMMITTED-but-empty landing (applied ≥ 0, zero live files — an
    * all-empty-batch stream legitimately produces one) reads as an empty
    * frame with the schema persisted at first commit; only a landing
    * with NO committed batches at all is refused.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    readFiles(spark, dir, readManifest(dir), "read")

  /** Read the landing AS OF committed version `v` (the state after
    * batch `v` was applied) — time travel over the retained snapshots.
    * Physical layout may differ from the original commit (a compaction
    * re-flips the same version id with its rewrite files), but content
    * is identical; data files are retained while any version references
    * them.
    */
  def readVersion(spark: SparkSession, dir: String, v: Long): DataFrame = {
    require(versions(dir).contains(v),
      s"ManifestLand.readVersion: version $v not retained in $dir " +
        s"(have: ${versions(dir).mkString(", ")})")
    readFiles(spark, dir, parseManifest(versionFile(dir, v)), "readVersion")
  }

  /** Stage one micro-batch and commit it with one manifest flip —
    * exactly-once via the manifest's applied high-water mark (see object
    * doc). Exposed for direct crash-window testing.
    */
  private[streaming] def applyBatch(batch: Dataset[Row], batchId: Long,
      outDir: String): Unit = {
    val m = readManifest(outDir)
    if (batchId <= m.applied) return // replayed, already committed
    // persist the schema once (write-then-ATOMIC_MOVE like the manifest)
    // so `read` can serve a committed-but-empty landing; written BEFORE
    // the flip so any committed state has it
    val sf = new java.io.File(outDir, "_schema")
    if (!sf.exists())
      ParquetLand.atomicReplace(sf, batch.schema.json.getBytes("UTF-8"))
    // stageParts sweeps crashed-attempt leftovers for this prefix (live
    // b-files always belong to ids <= applied, so the sweep can never
    // touch a manifest-referenced file)
    val staged = ParquetLand.stageParts(batch, outDir, s"b${batchId}_")
    flip(outDir, Manifest(batchId, m.files ++ staged)) // commit point
  }

  /** Rewrite the landing to `targetFiles` parts when it exceeds
    * `maxFiles`, committing with one flip. The rewrite files carry a
    * unique attempt suffix, so a retried compaction can never REPLACE a
    * file the current manifest references, and the post-flip delete of
    * superseded files skips anything a RETAINED VERSION still references
    * (time travel keeps old files alive until expiry).
    */
  private[streaming] def compactIfNeeded(spark: SparkSession, outDir: String,
      maxFiles: Int, targetFiles: Int): Unit = {
    val m = readManifest(outDir)
    if (m.files.length <= maxFiles) return
    val data = spark.read.parquet(m.files.map(n => s"$outDir/$n"): _*)
      .repartition(targetFiles)
    val cnames = ParquetLand.stageParts(data, outDir,
      s"c${m.applied}_${System.nanoTime()}_")
    flip(outDir, Manifest(m.applied, cnames))
    val keep = referenced(outDir)
    m.files.filterNot(keep.contains)
      .foreach { n => new java.io.File(outDir, n).delete(); () }
  }

  /** Append-mode stream → manifest-committed landing with continuous
    * compaction; same contract as [[ParquetLand.appendCompacting]], no
    * directory renames anywhere. `keepVersions` bounds the time-travel
    * history (1 = current state only, the pre-round-6 footprint).
    */
  def appendCompacting(stream: DataFrame, outDir: String, ckpt: String,
      maxFiles: Int = 8, targetFiles: Int = 2, keepVersions: Int = 1): Unit = {
    new java.io.File(outDir).mkdirs()
    vacuum(outDir) // sweep orphans of any crashed stage/compaction
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(batch, batchId, outDir)
        expireVersions(outDir, keepVersions)
        // outside the skip path: a crash between the two flips is
        // repaired here on replay even though the batch itself skips
        compactIfNeeded(batch.sparkSession, outDir, maxFiles, targetFiles)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
