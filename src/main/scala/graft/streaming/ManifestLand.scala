package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** The OBJECT-STORE form of the compacting landing (SURVEY §9 round-6
  * #2): where [[ParquetLand.appendCompacting]] swaps the landing
  * directory with two renames — atomic on a local/HDFS filesystem,
  * unavailable on S3-class stores — this landing's single atomic
  * primitive is REPLACING ONE SMALL MANIFEST FILE (`_manifest`, the list
  * of live parquet files; locally an ATOMIC_MOVE rename, on S3 a PUT).
  * Data files are immutable once written and INVISIBLE until a manifest
  * flip references them, which gives exactly-once and crash-safety
  * without any marker scheme:
  *
  *  - batch append = stage parts onto deterministic `b<id>_<j>` names,
  *    then flip the manifest to `live ++ staged` — a crash before the
  *    flip leaves invisible orphans (vacuumed on restart) and the
  *    replayed batch re-stages onto the same names; a replay AFTER the
  *    flip is detected by its `b<id>_` prefix already being live;
  *  - compaction = write `c<id>_<j>` rewrite files, flip the manifest to
  *    ONLY those, then delete the superseded files — readers never see a
  *    half-compacted state because visibility IS the manifest.
  *
  * This is the Iceberg/Delta commit idea reduced to its kernel: one
  * mutable pointer, immutable everything else.
  */
object ManifestLand {

  private def manifestFile(dir: String) = new java.io.File(dir, "_manifest")

  /** The landing's live parquet files (names, not paths). */
  def liveFiles(dir: String): Seq[String] = {
    val mf = manifestFile(dir)
    if (!mf.exists()) Seq.empty
    else new String(Files.readAllBytes(mf.toPath), "UTF-8")
      .split("\n").iterator.filter(_.nonEmpty).toSeq
  }

  /** Atomically replace the manifest — THE commit primitive. */
  private def flip(dir: String, files: Seq[String]): Unit = {
    val tmp = new java.io.File(dir, "_manifest.tmp")
    Files.write(tmp.toPath, files.mkString("\n").getBytes("UTF-8"))
    Files.move(tmp.toPath, manifestFile(dir).toPath,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Delete parquet files the manifest does not reference — orphans of
    * crashed stages/compactions. Single-writer contract: run only while
    * no stream is writing (appendCompacting runs it before starting).
    */
  def vacuum(dir: String): Unit = {
    val live = liveFiles(dir).toSet
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet") && !live.contains(f.getName))
      .foreach { f => f.delete(); () }
  }

  /** Read the landing through the manifest — the only correct read. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(liveFiles(dir).map(n => s"$dir/$n"): _*)

  /** Stage `batch` onto deterministic `b<id>_<j>` names and commit it
    * with one manifest flip, compacting in the same loop whenever the
    * live file count exceeds `maxFiles`. Idempotent under checkpoint
    * replay (see object doc). Exposed for direct crash-window testing.
    */
  private[streaming] def applyAndCommit(batch: Dataset[Row], batchId: Long,
      outDir: String, maxFiles: Int, targetFiles: Int): Unit = {
    val live = liveFiles(outDir)
    if (live.exists(_.startsWith(s"b${batchId}_"))) return // replayed, committed
    val stage = Files.createTempDirectory(s"graft_mstage_b$batchId").toString
    batch.write.mode("overwrite").parquet(stage)
    val staged = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .zipWithIndex.map { case (p, j) =>
        val name = f"b${batchId}_$j%05d.parquet"
        Files.move(p.toPath, Paths.get(outDir, name),
          StandardCopyOption.REPLACE_EXISTING)
        name
      }.toSeq
    graft.TempCleanup.rmrf(new java.io.File(stage))
    flip(outDir, live ++ staged) // commit point: the batch becomes visible
    val afterAppend = live ++ staged
    if (afterAppend.length > maxFiles) {
      val spark = batch.sparkSession
      val compacted = spark.read
        .parquet(afterAppend.map(n => s"$outDir/$n"): _*)
        .repartition(targetFiles)
      val cstage = Files.createTempDirectory(s"graft_mcompact_b$batchId").toString
      compacted.write.mode("overwrite").parquet(cstage)
      val cnames = new java.io.File(cstage).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        .zipWithIndex.map { case (p, j) =>
          val name = f"c${batchId}_$j%05d.parquet"
          Files.move(p.toPath, Paths.get(outDir, name),
            StandardCopyOption.REPLACE_EXISTING)
          name
        }.toSeq
      graft.TempCleanup.rmrf(new java.io.File(cstage))
      flip(outDir, cnames) // compaction commit: old files now orphans
      afterAppend.foreach(n => new java.io.File(outDir, n).delete())
    }
  }

  /** Append-mode stream → manifest-committed landing with continuous
    * compaction; same contract as [[ParquetLand.appendCompacting]], no
    * directory renames anywhere.
    */
  def appendCompacting(stream: DataFrame, outDir: String, ckpt: String,
      maxFiles: Int = 8, targetFiles: Int = 2): Unit = {
    new java.io.File(outDir).mkdirs()
    vacuum(outDir) // sweep orphans of any crashed stage/compaction
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyAndCommit(batch, batchId, outDir, maxFiles, targetFiles)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
