package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, expr, max, min}
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
  * ZONE MAPS (round 6, the manifest-level scan optimization): a landing
  * may declare stats columns; each commit then records every data
  * file's [min,max] per column in its manifest line, and [[readPruned]]
  * serves range predicates from ONLY the files whose boxes overlap all
  * of them — the Iceberg manifest-stats / Delta data-skipping idea. The
  * payoff requires the writer to CLUSTER by the stats dimension
  * (StorageLayoutSpec's q61 lesson), so [[appendCompacting]] range-
  * partitions each batch and each compaction rewrite — by the first
  * stats column, or by an explicit `clusterBy` expression (a Morton key
  * over the stats columns z-orders the landing so EVERY dimension's
  * ranges prune at once); stats are re-derived from the staged files
  * themselves, never trusted from the incoming frame.
  *
  * BLOOM FILTERS (round 7; sized + externalized round 8): a landing
  * may declare ONE bloom column (BIGINT, enforced); each commit then
  * builds a per-file 4-probe bloom filter over it — SIZED from the
  * staged file's approx key count (~1% FPP from 64 Kibit up to a
  * 2 MiB cap, or pinned via `bloom=<col>:<bits>`) by a map-side-OR
  * aggregation over the staged bytes — and stores it in an immutable
  * `.bfs` SIDECAR referenced by the manifest (the Iceberg-puffin
  * shape; the manifest stays KBs and only point-lookup paths load
  * filter bytes, lazily). [[readPrunedEq]] serves `col = value`
  * lookups from only the files whose filter may contain the key. Zone
  * maps answer RANGE predicates on clustered dimensions; blooms answer
  * EQUALITY on high-cardinality keys that clustering can't help.
  * Compaction re-derives filters for its rewrite files, folding
  * tombstoned keys away with the deletion vectors; [[backfillBlooms]]
  * declares the column on an existing landing in restartable chunks.
  *
  * DELETION VECTORS (round 6, merge-on-read DELETE): [[deleteWhere]]
  * removes rows WITHOUT rewriting any data file — it stages a small
  * sidecar parquet of (file_name, row_index) tombstones (positions from
  * the scan's `_metadata` struct) and commits it with the usual flip;
  * every read then anti-joins the tombstones back out. Erasure follows
  * the Delta/Iceberg retention contract: the CURRENT version snapshot
  * is rewritten post-delete (so `readVersion(applied)` always equals
  * `read`), OLDER retained versions still serve the pre-delete rows
  * until `expireVersions` drops them, and the next compaction folds the
  * vectors into clean rewrite files (tombstones never accumulate past a
  * rewrite cycle).
  *
  * This is the Iceberg/Delta commit idea reduced to its kernel: one
  * mutable pointer, immutable everything else. Operational contract
  * (same as ParquetLand.applyBatch): resetting the CHECKPOINT requires
  * removing the landing too, or the stale high-water mark silently
  * skips replayed batches. All maintenance entry points (vacuum,
  * deleteWhere, expireVersions, compaction) share the single-writer
  * contract.
  */
object ManifestLand {

  /** `bounds(i)` = [min,max] of `Manifest.statsCols(i)` in this file;
    * `bloom` = the file's membership filter over `Manifest.bloomCol`
    * (BloomAgg's 32-bit-word layout), when the landing declares one.
    */
  private[streaming] case class FileEntry(
      name: String, bounds: Seq[(Long, Long)] = Seq.empty,
      bloom: Option[Array[Long]] = None)

  private[streaming] case class Manifest(
      applied: Long,
      entries: Seq[FileEntry],
      statsCols: Seq[String] = Seq.empty,
      dvs: Seq[String] = Seq.empty,
      bloomCol: Option[String] = None,
      bloomBits: Option[Int] = None,
      bloomSidecars: Seq[String] = Seq.empty) {
    def files: Seq[String] = entries.map(_.name)
  }

  private def manifestFile(dir: String) = new java.io.File(dir, "_manifest")
  private def versionFile(dir: String, v: Long) =
    new java.io.File(dir, s"_manifest.v$v")

  /** Manifest line grammar, backward compatible with the round-5 format
    * (plain file-name lines): tab-separated fields, `dv\t<name>` for a
    * deletion-vector sidecar, `name\t<lo1>\t<hi1>[\t<lo2>\t<hi2>...]` for
    * a data file with one [min,max] pair per declared stats column,
    * `bf\t<name>\t<base64>` for a data file's LEGACY inline bloom filter
    * (big-endian longs of BloomAgg's word array — the payload length IS
    * the filter's bit count, so files committed under different sizing
    * coexist), `bfs\t<name>` for an immutable bloom SIDECAR file (the
    * round-8 externalized form new commits write — the manifest stays
    * KBs at any filter size); optional `stats=<col1>[,...]` and
    * `bloom=<col>[:<bits>]` header lines after `applied=`, in that
    * order. A bare `bloom=<col>` (the round-7 format) means AUTO sizing
    * — each commit sizes its files' filters from their approx key
    * counts; `bloom=<col>:<bits>` pins an explicit size for every
    * future commit.
    */
  private def parseManifest(mf: java.io.File): Manifest = {
    if (!mf.exists()) Manifest(-1L, Seq.empty)
    else {
      val lines = new String(Files.readAllBytes(mf.toPath), "UTF-8")
        .split("\n").iterator.filter(_.nonEmpty).toSeq
      lines match {
        case head +: rest if head.startsWith("applied=") =>
          val applied = head.stripPrefix("applied=").toLongOption.getOrElse(
            throw new IllegalStateException(s"unreadable manifest header in $mf: $head"))
          val (statsCols, afterStats) = rest match {
            case s +: tail if s.startsWith("stats=") =>
              (s.stripPrefix("stats=").split(",").map(_.trim).filter(_.nonEmpty).toSeq, tail)
            case other => (Seq.empty[String], other)
          }
          val (bloomCol, bloomBits, body) = afterStats match {
            case b +: tail if b.startsWith("bloom=") =>
              b.stripPrefix("bloom=").trim.split(":", -1) match {
                case Array(c) => (Some(c).filter(_.nonEmpty), None, tail)
                case Array(c, bits) =>
                  (Some(c).filter(_.nonEmpty),
                    Some(bits.toIntOption.getOrElse(throw new IllegalStateException(
                      s"unreadable bloom bits in $mf: $b"))), tail)
                case _ => throw new IllegalStateException(
                  s"unreadable bloom header in $mf: $b")
              }
            case other => (None, None, other)
          }
          val (dvLines, rest2) = body.partition(_.startsWith("dv\t"))
          val (bfsLines, rest3) = rest2.partition(_.startsWith("bfs\t"))
          val (bfLines, dataLines) = rest3.partition(_.startsWith("bf\t"))
          val blooms: Map[String, Array[Long]] = bfLines.map { l =>
            l.split("\t", -1) match {
              case Array(_, name, b64) => name -> decodeBloom(b64)
              case _ => throw new IllegalStateException(
                s"unreadable bloom line in $mf: ${l.take(80)}")
            }
          }.toMap
          val entries = dataLines.map { l =>
            val fields = l.split("\t", -1)
            if (fields.length == 1) FileEntry(fields(0), bloom = blooms.get(fields(0)))
            else if (fields.length == 1 + 2 * statsCols.length) {
              val bounds = fields.tail.map(f => f.toLongOption.getOrElse(
                throw new IllegalStateException(s"unreadable zone-map line in $mf: $l")))
              FileEntry(fields(0), bounds.grouped(2).map(p => (p(0), p(1))).toSeq,
                blooms.get(fields(0)))
            } else throw new IllegalStateException(
              s"unrecognized manifest line in $mf (${statsCols.length} stats cols): $l")
          }
          Manifest(applied, entries, statsCols,
            dvLines.map(_.stripPrefix("dv\t")), bloomCol, bloomBits,
            bfsLines.map(_.stripPrefix("bfs\t")))
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

  private def render(m: Manifest): Array[Byte] = {
    val header = s"applied=${m.applied}" +:
      ((if (m.statsCols.nonEmpty) Seq(s"stats=${m.statsCols.mkString(",")}") else Seq.empty) ++
        m.bloomCol.map(c =>
          s"bloom=$c${m.bloomBits.map(b => s":$b").getOrElse("")}").toSeq)
    val data = m.entries.map { e =>
      if (e.bounds.isEmpty) e.name
      else (e.name +: e.bounds.flatMap(b => Seq(b._1.toString, b._2.toString))).mkString("\t")
    }
    // inline bf lines exist only for LEGACY (pre-round-8) entries whose
    // filter came in inline — new commits externalize to sidecars
    val bf = m.entries.flatMap(e =>
      e.bloom.map(w => s"bf\t${e.name}\t${encodeBloom(w)}"))
    (header ++ data ++ bf ++ m.bloomSidecars.map(n => s"bfs\t$n") ++
      m.dvs.map(n => s"dv\t$n")).mkString("\n").getBytes("UTF-8")
  }

  /** BLOOM SIDECARS (round 8): inline base64 filters made the manifest
    * itself O(files × filter bytes) — at sized (up to 2 MiB) filters and
    * thousands of files the ONE file every reader parses would be GBs.
    * So new commits externalize their files' filters into an immutable
    * `.bfs` sidecar (the deletion-vector precedent — sidecars are
    * ordinary retention roots, the manifest stays KBs and keeps the
    * one-atomic-pointer kernel) and only the POINT-LOOKUP paths load
    * them, via a small immutable-keyed cache. Old inline `bf` lines
    * still parse and probe — legacy landings need no rewrite.
    *
    * Sidecar wire format: magic 'GBFS', version 1, entry count, then
    * per entry: name length + UTF-8 name + word count + big-endian
    * longs. Plain java IO — the driver-side probe has no SparkSession.
    */
  private def writeBloomSidecar(f: java.io.File,
      blooms: Seq[(String, Array[Long])]): Unit = {
    // streamed to the tmp file, not buffered whole: a 64-file chunk of
    // near-cap filters is already ~hundreds of MiB resident in `blooms`;
    // an in-memory copy would double the driver's peak exactly at the
    // bulk-backfill sizes the sidecar design exists for. Same crash
    // semantics as atomicReplace: tmp sibling, then ATOMIC_MOVE.
    val tmp = new java.io.File(f.getParentFile, f.getName + ".tmp")
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(tmp), 1 << 16))
    try {
      out.writeInt(0x47424653); out.writeInt(1); out.writeInt(blooms.size)
      blooms.foreach { case (name, words) =>
        val nb = name.getBytes("UTF-8")
        out.writeInt(nb.length); out.write(nb)
        out.writeInt(words.length); words.foreach(out.writeLong)
      }
    } finally out.close()
    java.nio.file.Files.move(tmp.toPath, f.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def readBloomSidecar(f: java.io.File): Map[String, Array[Long]] = {
    if (!f.exists()) throw new IllegalStateException(
      s"bloom sidecar missing: $f — referenced by a manifest but not on " +
        "disk (retention/vacuum violation); refuse rather than silently " +
        "degrade point-lookup pruning to keep-all")
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(f), 1 << 16))
    try {
      require(in.readInt() == 0x47424653 && in.readInt() == 1,
        s"corrupt bloom sidecar (bad magic/version): $f")
      (0 until in.readInt()).map { _ =>
        val nb = new Array[Byte](in.readInt()); in.readFully(nb)
        val words = new Array[Long](in.readInt())
        var i = 0
        while (i < words.length) { words(i) = in.readLong(); i += 1 }
        new String(nb, "UTF-8") -> words
      }.toMap
    } finally in.close()
  }

  /** Sidecars are immutable once referenced, so caching by (path, len,
    * mtime) is safe; bounded by BYTES, not entry count — one sidecar can
    * be a chunk's worth of MiB filters, so a count cap alone could pin
    * gigabytes in a long-lived session. LRU by access order.
    *
    * Loading is STRIPED per key (round 9, verdict #6): the disk read
    * happens OUTSIDE the cache monitor, with a per-key in-flight future
    * so concurrent cold probes of the SAME sidecar read it once while
    * cold probes of DIFFERENT sidecars load fully in parallel — the old
    * code held the global monitor across the read, serializing an
    * 8-way point-lookup fan-out to one disk at a time. The monitor now
    * guards only map mutation + byte accounting (microseconds).
    */
  private val BloomCacheMaxBytes = 256L << 20
  private val bloomSidecarCache =
    new java.util.LinkedHashMap[String, Map[String, Array[Long]]](32, 0.75f, true)
  private var bloomCacheBytes = 0L
  private def sidecarBytes(m: Map[String, Array[Long]]): Long =
    m.valuesIterator.map(_.length.toLong * 8 + 64).sum
  private val sidecarLoadsInFlight = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[Map[String, Array[Long]]]]
  // test instrumentation: observed concurrency of the actual disk reads
  private val sidecarLoadsActive = new java.util.concurrent.atomic.AtomicInteger
  private[streaming] val sidecarLoadsMaxConcurrent =
    new java.util.concurrent.atomic.AtomicInteger
  private[streaming] var sidecarLoadDelayMsForTest = 0L
  private[streaming] def bloomCacheBytesNow: Long =
    bloomSidecarCache.synchronized(bloomCacheBytes)
  private[streaming] def clearSidecarCacheForTest(): Unit =
    bloomSidecarCache.synchronized {
      bloomSidecarCache.clear(); bloomCacheBytes = 0L
      sidecarLoadsMaxConcurrent.set(0)
    }

  private def loadSidecar(dir: String, s: String): Map[String, Array[Long]] = {
    val f = new java.io.File(dir, s)
    // length+mtime in the key: referenced sidecars are immutable, but
    // a landing wiped and rebuilt at the SAME path must not serve the
    // previous incarnation's filters from cache
    val key = s"${f.getAbsolutePath}:${f.length()}:${f.lastModified()}"
    bloomSidecarCache.synchronized(Option(bloomSidecarCache.get(key))) match {
      case Some(hit) => hit
      case None =>
        val mine = new java.util.concurrent.CompletableFuture[Map[String, Array[Long]]]
        val prior = sidecarLoadsInFlight.putIfAbsent(key, mine)
        if (prior != null) {
          // another thread is reading this exact sidecar — wait for its
          // result instead of duplicating the I/O
          try prior.join()
          catch { case e: java.util.concurrent.CompletionException =>
            throw Option(e.getCause).getOrElse(e) }
        } else try {
          val loaded = readBloomSidecar(f) // disk I/O outside every lock
          if (sidecarLoadDelayMsForTest > 0) { // deterministic overlap window
            val n = sidecarLoadsActive.incrementAndGet()
            sidecarLoadsMaxConcurrent.accumulateAndGet(n, math.max)
            Thread.sleep(sidecarLoadDelayMsForTest)
            sidecarLoadsActive.decrementAndGet()
          }
          bloomSidecarCache.synchronized {
            // insert-if-absent keeps the byte accounting exact even if a
            // racer slipped through between in-flight removal and here
            if (bloomSidecarCache.get(key) == null) {
              bloomSidecarCache.put(key, loaded)
              bloomCacheBytes += sidecarBytes(loaded)
              // evict eldest-first until under budget; the just-loaded
              // entry is newest in access order, so it is never evicted
              // (size > 1 stops the loop before the iterator reaches it)
              val it = bloomSidecarCache.entrySet().iterator()
              while (bloomCacheBytes > BloomCacheMaxBytes &&
                  bloomSidecarCache.size() > 1 && it.hasNext) {
                bloomCacheBytes -= sidecarBytes(it.next().getValue)
                it.remove()
              }
            }
          }
          mine.complete(loaded)
          loaded
        } catch {
          case t: Throwable => mine.completeExceptionally(t); throw t
        } finally sidecarLoadsInFlight.remove(key, mine)
    }
  }

  /** name → filter for every file the manifest records a bloom for:
    * legacy inline entries plus all referenced sidecars. Materializes
    * the UNION — test/inspection helper only; the probe paths fold one
    * sidecar at a time instead (see [[probeKept]]) so a probe's memory
    * is one sidecar + the bounded cache, not O(files × filter bytes).
    */
  private[streaming] def bloomsFor(dir: String, m: Manifest): Map[String, Array[Long]] = {
    // precedence must match probeKept's fold order exactly: a file
    // carrying BOTH a legacy inline filter and a sidecar entry (a
    // hand-migrated manifest) resolves to the SIDECAR in both, or a
    // spec validating via this helper could pass while the probe path
    // consults the other filter
    m.entries.flatMap(e => e.bloom.map(e.name -> _)).toMap ++
      m.bloomSidecars.flatMap(loadSidecar(dir, _))
  }

  /** File names a bloom sidecar covers, WITHOUT loading filter bytes
    * (payloads are skipped) — coverage checks stay O(names) memory. */
  private def readBloomSidecarNames(f: java.io.File): Seq[String] = {
    if (!f.exists()) throw new IllegalStateException(
      s"bloom sidecar missing: $f — referenced by a manifest but not on disk")
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(f), 1 << 16))
    try {
      require(in.readInt() == 0x47424653 && in.readInt() == 1,
        s"corrupt bloom sidecar (bad magic/version): $f")
      (0 until in.readInt()).map { _ =>
        val nb = new Array[Byte](in.readInt()); in.readFully(nb)
        val toSkip = in.readInt().toLong * 8
        var skipped = 0L
        while (skipped < toSkip) {
          val n = in.skip(toSkip - skipped)
          // skip() returns 0 at EOF — a truncated payload must refuse,
          // not spin
          if (n <= 0) throw new IllegalStateException(
            s"corrupt bloom sidecar (truncated payload): $f")
          skipped += n
        }
        new String(nb, "UTF-8")
      }
    } finally in.close()
  }

  /** Names of all files with a recorded filter — O(names), no payloads. */
  private def bloomCoveredNames(dir: String, m: Manifest): Set[String] =
    m.bloomSidecars.flatMap(s => readBloomSidecarNames(new java.io.File(dir, s))).toSet ++
      m.entries.filter(_.bloom.nonEmpty).map(_.name)

  /** The probe kernel: names of live files that MAY contain any of the
    * hashes — folds one sidecar at a time (bounded memory at any landing
    * size), files without a recorded filter conservatively kept.
    */
  private def probeKept(dir: String, m: Manifest, hs: Seq[Long]): Seq[String] = {
    val decided = scala.collection.mutable.HashMap.empty[String, Boolean]
    m.entries.foreach(e =>
      e.bloom.foreach(w => decided(e.name) = hs.exists(bloomContains(w, _))))
    m.bloomSidecars.foreach { s =>
      loadSidecar(dir, s).foreach { case (name, w) =>
        decided(name) = hs.exists(bloomContains(w, _))
      }
    }
    m.files.filter(n => decided.getOrElse(n, true))
  }

  private def encodeBloom(words: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
    words.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  private def decodeBloom(b64: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(b64)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
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
    * (committed or provisional) — the retention root set. Deletion-vector
    * sidecars are roots like data files: a retained version's read path
    * needs its vectors.
    */
  private def referenced(dir: String): Set[String] = {
    val ms = readManifest(dir) +: versionFilesOnDisk(dir).map(parseManifest)
    ms.flatMap(m => m.files ++ m.dvs ++ m.bloomSidecars).toSet
  }

  /** Atomically replace the manifest — THE commit primitive (shared
    * write-tmp-then-ATOMIC_MOVE implementation with ParquetLand's
    * `_applied` commit). The immutable version snapshot is written
    * FIRST so retained history never references uncommitted state the
    * vacuum could sweep.
    */
  private def flip(dir: String, m: Manifest): Unit = {
    val body = render(m)
    ParquetLand.atomicReplace(versionFile(dir, m.applied), body)
    ParquetLand.atomicReplace(manifestFile(dir), body)
  }

  /** Delete parquet files that NO retained manifest (live or version)
    * references — orphans of crashed stages/compactions/deletes.
    * Single-writer contract: run only while no stream is writing
    * (appendCompacting runs it before starting).
    */
  def vacuum(dir: String): Unit = {
    val keep = referenced(dir)
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => ((f.getName.endsWith(".parquet") || f.getName.endsWith(".bfs")) &&
        !keep.contains(f.getName)) ||
        // a crash between a tmp-sibling write and its ATOMIC_MOVE
        // (atomicReplace, writeBloomSidecar) leaves a stale `*.tmp` —
        // harmless to readers (never consulted) but swept like any
        // orphan; safe under the single-writer contract vacuum runs in
        f.getName.endsWith(".tmp"))
      .foreach { f => f.delete(); () }
  }

  /** Drop all but the newest `keep` COMMITTED version snapshots, then
    * sweep data files nothing references anymore — Delta/Iceberg-style
    * retention. `keep = 1` pins only the current state. A provisional
    * (above-high-water) version file is never expired here; the replay
    * that commits it will overwrite it. After a [[deleteWhere]], this is
    * also the erasure bound: dropping the pre-delete versions is what
    * makes the deleted rows unreachable from EVERY read path.
    */
  def expireVersions(dir: String, keep: Int): Unit = {
    require(keep >= 1, "expireVersions: must retain at least the current version")
    val committed = versions(dir)
    committed.dropRight(keep).foreach { v => versionFile(dir, v).delete(); () }
    vacuum(dir)
  }

  /** The landing's CURRENT schema as persisted/evolved at commit time,
    * if any commit has happened. */
  private def storedSchema(dir: String): Option[org.apache.spark.sql.types.StructType] = {
    val sf = new java.io.File(dir, "_schema")
    if (!sf.exists()) None
    else Some(org.apache.spark.sql.types.DataType.fromJson(
      new String(Files.readAllBytes(sf.toPath), "UTF-8"))
      .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  private def readFiles(spark: SparkSession, dir: String, m: Manifest,
      what: String): DataFrame = {
    if (m.files.nonEmpty) {
      // read through the TRACKED schema (not whichever file the reader
      // samples): after an additive schema evolution, pre-evolution
      // files simply lack the new columns and the parquet reader fills
      // them with NULL — the Delta/Iceberg read semantics, without a
      // mergeSchema footer sweep over every file
      val reader = storedSchema(dir) match {
        case Some(sc) => spark.read.schema(sc)
        case None => spark.read
      }
      val data = reader.parquet(m.files.map(n => s"$dir/$n"): _*)
      if (m.dvs.isEmpty) data
      else {
        // merge-on-read: anti-join the (file, position) tombstones back
        // out. The vector side is tiny by construction (it only ever
        // holds tombstones written since the last compaction), so it
        // broadcasts and the data side is never shuffled.
        val dv = spark.read.parquet(m.dvs.map(n => s"$dir/$n"): _*)
          .select(col("file_name").as("__dv_file"), col("row_index").as("__dv_pos"))
        data
          .withColumn("__file", expr("_metadata.file_name"))
          .withColumn("__pos", expr("_metadata.row_index"))
          .join(broadcast(dv),
            col("__file") === col("__dv_file") && col("__pos") === col("__dv_pos"),
            "left_anti")
          .drop("__file", "__pos")
      }
    } else {
      require(m.applied >= 0L,
        s"ManifestLand.read on an empty landing (no committed batches): $dir")
      val schema = storedSchema(dir).getOrElse(throw new IllegalArgumentException(
        s"ManifestLand.$what: committed-empty landing with no _schema file: $dir"))
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
    * re-flips the same version id with its rewrite files, a delete
    * re-flips it with its vectors), but `readVersion(applied)` always
    * equals `read`; versions BELOW a delete still serve the pre-delete
    * rows until expired.
    */
  def readVersion(spark: SparkSession, dir: String, v: Long): DataFrame = {
    require(versions(dir).contains(v),
      s"ManifestLand.readVersion: version $v not retained in $dir " +
        s"(have: ${versions(dir).mkString(", ")})")
    readFiles(spark, dir, parseManifest(versionFile(dir, v)), "readVersion")
  }

  /** Live data files whose zone maps MAY contain a value in [lo, hi] for
    * EVERY predicate column — files with no recorded stats are
    * conservatively kept. Exposed so tests can assert the skip actually
    * skips. A z-ordered landing (cluster by the Morton key of the stats
    * columns) gives tight boxes in all dimensions at once, so any
    * single-dimension range prunes too.
    */
  def prunedLiveFiles(dir: String, preds: Seq[(String, Long, Long)]): Seq[String] =
    prunedLiveFiles(readManifest(dir), dir, preds)

  private[streaming] def prunedLiveFiles(m: Manifest, dir: String,
      preds: Seq[(String, Long, Long)]): Seq[String] = {
    require(m.statsCols.nonEmpty,
      s"ManifestLand.prunedLiveFiles: landing $dir has no stats columns")
    val idx = preds.map { case (c, lo, hi) =>
      val i = m.statsCols.indexOf(c)
      require(i >= 0, s"ManifestLand.prunedLiveFiles: no zone map for column $c " +
        s"in $dir (have: ${m.statsCols.mkString(", ")})")
      (i, lo, hi)
    }
    m.entries.filter { e =>
      e.bounds.isEmpty || idx.forall { case (i, lo, hi) =>
        // flo > fhi is the impossible zone recorded for empty / all-NULL
        // files: definitionally overlap-free for EVERY query range (the
        // naive fhi >= lo && flo <= hi test would keep [0,-1] whenever
        // the range spans the -1/0 boundary)
        val (flo, fhi) = e.bounds(i); flo <= fhi && fhi >= lo && flo <= hi
      }
    }.map(_.name)
  }

  /** Single-column convenience: prune on the FIRST declared stats column. */
  def prunedLiveFiles(dir: String, lo: Long, hi: Long): Seq[String] = {
    val m = readManifest(dir)
    require(m.statsCols.nonEmpty,
      s"ManifestLand.prunedLiveFiles: landing $dir has no stats columns")
    prunedLiveFiles(dir, Seq((m.statsCols.head, lo, hi)))
  }

  /** Range scan through the zone maps: read ONLY the live files whose
    * boxes overlap every predicate's [lo, hi], tombstones still applied.
    * The result is a SUPERSET of the exact range (files are pruned, not
    * rows) — the caller applies its own predicate on top, exactly like a
    * parquet reader applies the residual filter after row-group pruning.
    */
  def readPruned(spark: SparkSession, dir: String,
      preds: Seq[(String, Long, Long)]): DataFrame = {
    // ONE manifest parse feeds both the cut and the read: re-parsing for
    // each would race a concurrent flip (a compaction between the two
    // reads intersects old entries with new names — silently empty)
    val m = readManifest(dir)
    val keep = prunedLiveFiles(m, dir, preds).toSet
    readFiles(spark, dir, m.copy(entries = m.entries.filter(e => keep(e.name))),
      "readPruned")
  }

  /** Single-range convenience on the FIRST declared stats column. */
  def readPruned(spark: SparkSession, dir: String, lo: Long, hi: Long): DataFrame = {
    val m = readManifest(dir)
    require(m.statsCols.nonEmpty,
      s"ManifestLand.readPruned: landing $dir has no stats columns")
    readPruned(spark, dir, Seq((m.statsCols.head, lo, hi)))
  }

  /** Stage one micro-batch and commit it with one manifest flip —
    * exactly-once via the manifest's applied high-water mark (see object
    * doc). When `statsCol` is set the batch is range-partitioned by it
    * into `rangeParts` clustered files and each staged file's [min,max]
    * is recorded in the manifest (derived by re-reading the staged files
    * grouped on `_metadata.file_name` — one small job, and the stats can
    * never disagree with the bytes on disk). Exposed for direct
    * crash-window testing.
    */
  /** Name of the batch-lineage column [[changeFeed]] reads. Stamped by
    * opt-in (`trackChanges`) because it changes the landing's visible
    * schema. A PHYSICAL column — not file-name lineage — so compaction
    * rewrites carry it unchanged and the feed stays sound after folds.
    */
  val CommitVersionCol = "_commit_version"

  private[streaming] def applyBatch(batch0: Dataset[Row], batchId: Long,
      outDir: String, statsCols: Seq[String] = Seq.empty,
      rangeParts: Int = 2, clusterBy: Option[Column] = None,
      bloomCol: Option[String] = None, trackChanges: Boolean = false,
      bloomBits: Option[Int] = None): Unit = {
    val batch =
      if (trackChanges)
        batch0.withColumn(CommitVersionCol,
          org.apache.spark.sql.functions.lit(batchId))
      else batch0
    val m = readManifest(outDir)
    if (batchId <= m.applied) return // replayed, already committed
    // a statsCols change mid-landing would render old entry lines whose
    // bounds arity no longer matches the new stats= header, making every
    // subsequent parseManifest throw (ADVICE r6) — refuse up front
    require(m.statsCols.isEmpty || statsCols.isEmpty || statsCols == m.statsCols,
      s"statsCols change mid-landing: manifest declares ${m.statsCols.mkString(",")}, " +
        s"batch $batchId declares ${statsCols.mkString(",")}")
    // zone maps are [min,max] of the LONG cast: an integral column
    // prunes; anything else casts to NULL per row, the file records the
    // impossible [0,-1] zone, and pruning silently degenerates to
    // prune-all (correct only because such rows can't satisfy a long
    // range residual either — useless, not wrong). Refuse loudly, like
    // the bloom column's BIGINT rule: declare a derived integer column
    // (epoch micros, a dictionary code) instead.
    statsCols.foreach { c =>
      val f = batch.schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"stats column $c not in batch $batchId's schema for $outDir"))
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      require(Set[org.apache.spark.sql.types.DataType](
          ByteType, ShortType, IntegerType, LongType).contains(f.dataType),
        s"stats column $c must be integral (zone maps are [min,max] of " +
          s"the BIGINT cast; a ${f.dataType.sql} column records only " +
          s"impossible zones): $outDir")
    }
    // same hazard for the bloom column: old bf lines would claim a
    // different column's membership than the new header declares
    require(m.bloomCol.isEmpty || bloomCol.isEmpty || bloomCol == m.bloomCol,
      s"bloomCol change mid-landing: manifest declares ${m.bloomCol.getOrElse("")}, " +
        s"batch $batchId declares ${bloomCol.getOrElse("")}")
    // an explicit size, once declared, is pinned the same way (auto→fixed
    // or a size change would make old and new bf lines answer the same
    // probe at different FPPs with no record of why)
    require(m.bloomBits.isEmpty || bloomBits.isEmpty || bloomBits == m.bloomBits,
      s"bloom bits change mid-landing: manifest declares ${m.bloomBits.getOrElse("auto")}, " +
        s"batch $batchId declares ${bloomBits.getOrElse("auto")}")
    val effBloom = bloomCol.orElse(m.bloomCol)
    val effBits = bloomBits.orElse(m.bloomBits)
    // STRICT TYPE CONTRACT (ADVICE r7): the staged-side build hashes the
    // column at its native type while prunedLiveFilesEq hashes a BIGINT
    // literal, and XxHash64 hashes INT and BIGINT differently — a
    // non-BIGINT bloom column would produce bloom FALSE NEGATIVES, i.e.
    // readPrunedEq silently dropping rows. Refuse loudly at commit.
    effBloom.foreach { c =>
      val f = batch.schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"bloom column $c not in batch $batchId's schema for $outDir"))
      require(f.dataType == org.apache.spark.sql.types.LongType,
        s"bloom column $c must be BIGINT (xxhash64 is type-sensitive; a " +
          s"${f.dataType.sql} column would make point-lookup pruning drop rows): $outDir")
    }
    // persist the schema (write-then-ATOMIC_MOVE like the manifest) so
    // `read` can serve a committed-but-empty landing AND so every read
    // goes through the TRACKED schema; written BEFORE the flip so any
    // committed state has it. SCHEMA EVOLUTION: a batch may ADD columns
    // (additive, existing columns keep name+type — the only evolution
    // the NULL-fill read semantics can serve); the tracked schema then
    // advances, and pre-evolution files read with the new columns NULL.
    // Anything else (drop, retype, rename) is refused: silently reading
    // a retyped column through the old schema would corrupt, not error.
    val sf = new java.io.File(outDir, "_schema")
    storedSchema(outDir) match {
      case None =>
        ParquetLand.atomicReplace(sf, batch.schema.json.getBytes("UTF-8"))
      case Some(old) if old == batch.schema => // steady state
      case Some(old) =>
        val newByName = batch.schema.fields.map(f => f.name -> f).toMap
        val incompatible = old.fields.filter(f =>
          !newByName.get(f.name).map(_.dataType).contains(f.dataType))
        require(incompatible.isEmpty,
          s"schema evolution must be additive: batch $batchId drops or retypes " +
            s"[${incompatible.map(_.name).mkString(", ")}] of $outDir")
        val oldNames = old.fieldNames.toSet
        val added = batch.schema.fields.filter(f => !oldNames.contains(f.name))
        require(added.forall(_.nullable),
          s"schema evolution: added columns must be nullable " +
            s"(pre-evolution files read them as NULL): $outDir")
        // merged = old column order with nullability WIDENED field by
        // field (a nullable batch must not read through a non-null
        // schema), plus the additions — reorder-only changes are no-ops
        val merged = org.apache.spark.sql.types.StructType(
          old.fields.map(f =>
            f.copy(nullable = f.nullable || newByName(f.name).nullable)) ++ added)
        if (merged != old)
          ParquetLand.atomicReplace(sf, merged.json.getBytes("UTF-8"))
    }
    // cluster by the explicit expression (a Morton key composes several
    // stats dimensions into one range-clustered order) or, by default,
    // by the first stats column
    val clustered = clusterBy.orElse(statsCols.headOption.map(col)) match {
      case Some(c) => batch.repartitionByRange(rangeParts, c)
      case None => batch
    }
    // stageParts sweeps crashed-attempt leftovers for this prefix (live
    // b-files always belong to ids <= applied, so the sweep can never
    // touch a manifest-referenced file)
    val (entries, newSidecars) = stageDataFiles(batch.sparkSession, outDir,
      clustered, s"b${batchId}_", s"bfs_b$batchId.bfs",
      statsCols, effBloom, effBits)
    flip(outDir, Manifest(batchId, m.entries ++ entries,
      if (statsCols.nonEmpty) statsCols else m.statsCols, m.dvs,
      effBloom, effBits, m.bloomSidecars ++ newSidecars)) // commit point
  }

  /** Stage `df` as immutable data files under `prefix` and derive their
    * manifest entries: zone bounds over `statsCols` and, when the landing
    * declares a bloom column, sized per-file filters externalized to the
    * immutable sidecar `sidecarName` (written BEFORE the flip that
    * references it; a deterministic name means a crashed-attempt replay
    * overwrites its own debris). Shared by the batch commit and
    * [[updateWhere]]'s rewrite side — one definition of "what a data
    * file must carry to join the landing".
    */
  private def stageDataFiles(spark: SparkSession, dir: String, df: DataFrame,
      prefix: String, sidecarName: String, statsCols: Seq[String],
      bloomCol: Option[String], bloomBits: Option[Int])
      : (Seq[FileEntry], Seq[String]) = {
    val staged = ParquetLand.stageParts(df, dir, prefix)
    val base =
      if (statsCols.isEmpty) staged.map(FileEntry(_))
      else fileStats(spark, dir, staged, statsCols)
    val withBlooms = bloomCol match {
      case Some(c) => attachBlooms(spark, dir, base, c, bloomBits)
      case None => base
    }
    if (withBlooms.exists(_.bloom.nonEmpty)) {
      writeBloomSidecar(new java.io.File(dir, sidecarName),
        withBlooms.flatMap(e => e.bloom.map(e.name -> _)))
      (withBlooms.map(_.copy(bloom = None)), Seq(sidecarName))
    } else (withBlooms, Seq.empty[String])
  }

  /** Per-file bloom filter over `bloomCol`, built from the staged bytes
    * (derive-from-disk, like [[fileStats]]) with BloomAgg aggregations
    * grouped on `_metadata.file_name` — map-side OR-merge, so only the
    * m/8-byte bitsets cross the wire, never the keys. A staged file that
    * range-partitioning left EMPTY gets the all-zero bloom ("contains
    * nothing"), which every point lookup correctly prunes. Filters are
    * stored in an immutable `.bfs` SIDECAR referenced by the manifest
    * (the Iceberg-puffin shape; see the bloom-sidecar doc above — the
    * commit paths externalize after this returns).
    *
    * SIZING (round 8, closing the round-7 weak mark): a fixed bitset
    * saturates — 64 Kibit is ~1% FPP at 6.5k keys and FPP→1 above ~50k,
    * degrading point-lookup pruning to keep-all exactly at 100 TB file
    * sizes. So unless the landing pins `fixedBits`, each file's filter
    * is sized from its OWN approx key count (one column-pruned
    * approx_count_distinct pass over the staged bytes, then
    * [[graft.functions.BloomAgg.sizeBits]]: next pow-2 ≥ 10.5·ndv for
    * ~1% FPP, capped at 2 MiB raw) — the Iceberg-puffin size-by-ndv
    * idea. Files sized differently coexist: the bf payload length IS
    * the filter's m, and every probe derives it per file. One
    * aggregation pass runs per DISTINCT size (≤ log₂ of the sizing
    * range, in practice 1-2), each over only its files.
    *
    * Results stream to the driver via `toLocalIterator` — a bulk
    * rewrite attaching blooms to thousands of files holds one
    * partition's rows at a time, not bits × files in one collect()
    * (round-7 verdict #2).
    */
  private def attachBlooms(spark: SparkSession, dir: String,
      entries: Seq[FileEntry], bloomCol: String,
      fixedBits: Option[Int]): Seq[FileEntry] = {
    import graft.functions.BloomAgg
    if (entries.isEmpty) return entries
    import scala.jdk.CollectionConverters._
    // pass 1: bits per file — pinned, or sized from the file's approx ndv
    // (a ~16-byte row per file; the sketch itself merges map-side)
    val bitsByFile: Map[String, Int] = fixedBits match {
      case Some(b) => entries.map(e => e.name -> b).toMap
      case None =>
        val ndv = spark.read.parquet(entries.map(e => s"$dir/${e.name}"): _*)
          .groupBy(expr("_metadata.file_name").as("__f"))
          .agg(org.apache.spark.sql.functions
            .approx_count_distinct(col(bloomCol)).as("__ndv"))
          .toLocalIterator().asScala
          .map(r => r.getAs[String]("__f") -> BloomAgg.sizeBits(r.getLong(1))).toMap
        // an empty staged file has no ndv row: default-size its all-zero bloom
        entries.map(e => e.name -> ndv.getOrElse(e.name, BloomAgg.NumBits)).toMap
    }
    // pass 2: one BloomAgg aggregation per distinct size, each scanning
    // only the files that need that size
    val byFile: Map[String, Array[Long]] =
      bitsByFile.groupBy(_._2).flatMap { case (bits, files) =>
        val names = entries.filter(e => files.contains(e.name)).map(_.name)
        spark.read.parquet(names.map(n => s"$dir/$n"): _*)
          .groupBy(expr("_metadata.file_name").as("__f"))
          .agg(BloomAgg.bloom_agg(
            org.apache.spark.sql.functions.xxhash64(col(bloomCol)), bits).as("__bf"))
          .toLocalIterator().asScala
          .map(r => r.getAs[String]("__f") -> r.getSeq[Long](1).toArray)
      }
    entries.map(e => e.copy(bloom = Some(byFile.getOrElse(e.name,
      new Array[Long](bitsByFile(e.name) / BloomAgg.WordBits)))))
  }

  /** Driver-side membership probe: `h` is Spark's `xxhash64` of the key
    * (seed 42). Delegates to [[graft.functions.BloomAgg.mightContain]] —
    * THE shared probe kernel (bit count derived from the payload, so
    * files committed under different sizing regimes probe correctly side
    * by side; a non-pow-2 payload refuses loudly) — so the manifest
    * probe and the aggregate's arithmetic can never diverge.
    */
  private def bloomContains(words: Array[Long], h: Long): Boolean =
    graft.functions.BloomAgg.mightContain(words, h)

  /** Spark's `xxhash64(CAST(v AS BIGINT))`, evaluated driver-side — the
    * same bits the staged-file blooms were built from. */
  private def sparkHash(v: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal(v)), 42L)
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[Long]

  /** Live data files whose bloom filter MAY contain `bloomCol = value` —
    * the POINT-LOOKUP pruning path, complementing the zone maps' range
    * path (a high-cardinality key is exactly where [min,max] boxes stop
    * helping: every file's range spans the whole key domain, but its
    * bloom still rejects ~99% of foreign keys at BloomAgg's sizing).
    * Files without a recorded bloom are conservatively kept.
    */
  def prunedLiveFilesEq(dir: String, value: Long): Seq[String] =
    prunedLiveFilesEq(readManifest(dir), dir, value)

  /** Parsed-manifest overload: a caller probing MANY keys (or a test's
    * FPP sweep) parses the manifest once instead of re-decoding every
    * file's bloom payload per probe. */
  private[streaming] def prunedLiveFilesEq(m: Manifest, dir: String,
      value: Long): Seq[String] = {
    require(m.bloomCol.nonEmpty,
      s"ManifestLand.prunedLiveFilesEq: landing $dir has no bloom column")
    probeKept(dir, m, Seq(sparkHash(value)))
  }

  /** IN-list form: live files that may contain ANY of `values` — ONE
    * manifest parse and one sidecar load serve the whole list (each
    * probe is 4 bit tests), so a semi-join-shaped lookup (resolve a
    * batch of foreign keys) prunes as cheaply as a single probe. Union
    * semantics per file: kept iff some value may be present.
    */
  def prunedLiveFilesIn(dir: String, values: Seq[Long]): Seq[String] =
    prunedLiveFilesIn(readManifest(dir), dir, values)

  private def prunedLiveFilesIn(m: Manifest, dir: String,
      values: Seq[Long]): Seq[String] = {
    require(values.nonEmpty, "prunedLiveFilesIn: empty probe list")
    require(m.bloomCol.nonEmpty,
      s"ManifestLand.prunedLiveFilesIn: landing $dir has no bloom column")
    probeKept(dir, m, values.map(sparkHash))
  }

  /** Point lookup through the per-file blooms: read ONLY the live files
    * that may contain `bloomCol = value`, tombstones still applied. Like
    * [[readPruned]], the result is a SUPERSET of the exact match — the
    * caller applies the equality residual on top.
    */
  def readPrunedEq(spark: SparkSession, dir: String, value: Long): DataFrame = {
    val m = readManifest(dir) // one parse (see readPruned)
    val keep = prunedLiveFilesEq(m, dir, value).toSet
    readFiles(spark, dir, m.copy(entries = m.entries.filter(e => keep(e.name))),
      "readPrunedEq")
  }

  /** IN-list point lookup: read only the files [[prunedLiveFilesIn]]
    * keeps; the caller applies the IN residual on top. */
  def readPrunedIn(spark: SparkSession, dir: String, values: Seq[Long]): DataFrame = {
    val m = readManifest(dir) // one parse (see readPruned)
    val keep = prunedLiveFilesIn(m, dir, values).toSet
    readFiles(spark, dir, m.copy(entries = m.entries.filter(e => keep(e.name))),
      "readPrunedIn")
  }

  /** COMPOSED pruning: the realistic "time range AND key" lookup served
    * from ONE manifest pass — a file survives only if its zone boxes
    * overlap every range predicate AND its bloom may contain the key.
    * The two cuts are independent per file, so the intersection is
    * exact; either family alone degenerates to the existing paths.
    */
  def readPrunedComposed(spark: SparkSession, dir: String,
      preds: Seq[(String, Long, Long)], eqValue: Long): DataFrame = {
    val m = readManifest(dir) // one parse feeds BOTH cuts and the read
    val keep = prunedLiveFiles(m, dir, preds).toSet
      .intersect(prunedLiveFilesEq(m, dir, eqValue).toSet)
    readFiles(spark, dir, m.copy(entries = m.entries.filter(e => keep(e.name))),
      "readPrunedComposed")
  }

  /** CHANGE DATA FEED between two retained versions — the incremental-
    * consumption read (Delta CDF / Iceberg incremental scan): every row
    * whose NET effect changed in `(fromV, toV]`, tagged `_change_type`
    * `insert`, `delete`, or (rung-2 recycled keys) `update_preimage`. Requires a change-tracked landing
    * (`trackChanges = true` stamps [[CommitVersionCol]] at commit).
    *
    *  - inserts = rows of `readVersion(toV)` with commit version in the
    *    window — METADATA-CHEAP: when the landing declares
    *    [[CommitVersionCol]] among its statsCols and `toV` is current,
    *    the zone maps cut the scan to only the window's files before any
    *    footer is opened (at 100 TB, an incremental sync reads the new
    *    files, not the table); the version filter stays as residual.
    *  - deletes = rows of `readVersion(fromV)` whose `keyCols` no longer
    *    exist in `toV`. Served by a three-rung ladder (see the delete
    *    ladder comment in the body): append-only windows are EMPTY by
    *    metadata, delete-bearing windows with stable files read back
    *    ONLY the window's new deletion-vector tombstones from the
    *    affected files ([[dvDeltaDeletes]] — O(deletes), never
    *    O(landing)), and only a compaction inside the window (file
    *    identity gone — tombstones folded away) falls back to the exact
    *    two-snapshot diff. Both delete-bearing rungs tag a removed row
    *    whose key the window RE-COMMITTED as `update_preimage` instead
    *    of suppressing it — rung 2 positionally (round 9), the
    *    two-snapshot rung via an in-window re-commit flag on the toV
    *    key join (round 10) — folds subtract it, MERGE consumers
    *    ignore it, and the re-committing row stays a plain `insert`,
    *    so key recycling folds exactly on EVERY rung, compaction or
    *    not.
    *
    * NET-effect semantics: a row inserted and deleted inside the window
    * appears as neither. A key deleted and RE-INSERTED (or a row
    * UPDATED — the postimage is restamped with its commit version, so
    * it rides the insert side) inside the window emits the removed
    * position/old row as `update_preimage` on every delete-bearing
    * rung — row-algebra folds subtract it, key-upsert MERGE consumers
    * ignore it, and the new row stays a plain `insert`. A window is
    * therefore an exact relay path for row UPDATEs too (round 10 —
    * [[updateImpl]]'s relay-lag refusal lifted); the late accounting
    * path remains for updates landing on the already-relayed version,
    * which no window will ever cover.
    * Retention contract: both versions must still be retained
    * (`keepVersions` spans the window) — the same bound Delta/Iceberg
    * place on CDF reads.
    */
  /** `forceSnapshotDeletes` pins the two-snapshot diff rung even when a
    * cheaper rung applies — the A/B/debug knob Bench's x_cdf rows time.
    * Answers are identical on every rung (since round 10 the snapshot
    * rung tags recycled keys `update_preimage` too); only the cost
    * differs — the snapshot rung reads both snapshots, the DV-delta
    * rung only the affected files. */
  def changeFeed(spark: SparkSession, dir: String, fromV: Long, toV: Long,
      keyCols: Seq[String], forceSnapshotDeletes: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.{lit, when}
    require(fromV < toV, s"changeFeed: empty window ($fromV, $toV]")
    require(keyCols.nonEmpty, "changeFeed: key columns required for deletes")
    val retained = versions(dir)
    require(retained.contains(fromV) && retained.contains(toV),
      s"ManifestLand.changeFeed: window ($fromV, $toV] not retained in $dir " +
        s"(have: ${retained.mkString(", ")})")
    val mTo = parseManifest(versionFile(dir, toV))
    // insert-side file cut from the VERSION manifest's own zone maps
    // (round 8 — previously only toV == applied pruned, via the live
    // manifest): when _commit_version is a stats column, every window's
    // sync opens only the window's files, historic or current
    val newer =
      if (mTo.statsCols.contains(CommitVersionCol)) {
        val i = mTo.statsCols.indexOf(CommitVersionCol)
        val keep = mTo.entries.filter(e => e.bounds.isEmpty || {
          val (flo, fhi) = e.bounds(i)
          flo <= fhi && fhi >= fromV + 1 && flo <= toV
        })
        readFiles(spark, dir, mTo.copy(entries = keep), "changeFeed")
      } else readVersion(spark, dir, toV)
    require(newer.columns.contains(CommitVersionCol),
      s"ManifestLand.changeFeed: landing $dir is not change-tracked " +
        s"(commit with trackChanges = true)")
    val inserts = newer
      .filter(col(CommitVersionCol) > fromV && col(CommitVersionCol) <= toV)
      .withColumn("_change_type", lit("insert"))
    // delete-side ladder, cheapest applicable rung first (round-8,
    // verdict #4 — a delete-bearing sync must not scan two snapshots):
    //  1. append-only window: provably nothing removed, EMPTY by
    //     metadata alone (most windows of a healthy landing);
    //  2. deletion-vector delta: every fromV file survives into toV
    //     (no compaction in the window), so the removed rows are
    //     EXACTLY the window's new tombstones on pre-window files —
    //     read back positionally from only the AFFECTED files, cost
    //     O(window's deletes), never O(landing);
    //  3. compaction in the window: file identity is gone, fall back
    //     to the exact two-snapshot diff (the price Delta pays
    //     materializing change files it didn't write either).
    val mFrom = parseManifest(versionFile(dir, fromV))
    // EXACT two-snapshot diff (round 10, closing the rung-3 recycled-key
    // caveat): the fromV side left-outer-joins toV's keys carrying an
    // in-window re-commit flag instead of a bare key anti-join. A fromV
    // row whose key is ABSENT at toV was removed (`delete`); one whose
    // key survives with an IN-WINDOW commit version was removed AND its
    // key re-committed — per-version key uniqueness (the contract every
    // rung and every MERGE consumer already rely on) makes the
    // re-committed row a NEW row, so the old one is gone — emitted as
    // `update_preimage`, which row-algebra folds subtract and key-upsert
    // consumers ignore. Same scan/shuffle shape as the anti-join (each
    // snapshot once); no positional identity needed, so this rung stays
    // exact across a compaction inside the window — which is what lets
    // updateWhere land inside un-relayed windows (the round-9 refusal in
    // [[updateImpl]] is lifted).
    def snapshotRemoved(): DataFrame = {
      val toKeys = readVersion(spark, dir, toV)
        .select((keyCols.map(col) :+
          (col(CommitVersionCol) > lit(fromV)).as("__rein")): _*)
      readVersion(spark, dir, fromV)
        .join(toKeys, keyCols, "left_outer")
        .withColumn("_change_type",
          when(col("__rein").isNull, lit("delete"))
            .when(col("__rein"), lit("update_preimage")))
        .filter(col("_change_type").isNotNull)
        .drop("__rein")
    }
    val removed =
      if (forceSnapshotDeletes) snapshotRemoved()
      else if (mFrom.dvs == mTo.dvs && mFrom.files.toSet.subsetOf(mTo.files.toSet))
        readVersion(spark, dir, fromV).limit(0)
          .withColumn("_change_type", lit("delete"))
      else if (mFrom.files.toSet.subsetOf(mTo.files.toSet))
        dvDeltaDeletes(spark, dir, mFrom, mTo, inserts, keyCols)
      else snapshotRemoved()
    inserts.unionByName(removed)
  }

  /** Rung 2 of [[changeFeed]]'s delete ladder: with every `fromV` data
    * file still live at `toV` (files are immutable, none compacted
    * away), a row existed at `fromV` and is gone at `toV` IFF a NEW
    * tombstone landed on a PRE-window file. So:
    *
    *   candidates = (toV tombstones ∖ fromV tombstones) on fromV files,
    *                fetched positionally from ONLY the affected files;
    *   deletes    = candidates minus keys the window RE-INSERTED
    *                (checked against the already-file-pruned insert
    *                frame, so the guard costs O(window) too).
    *
    * Exactness contract (same one the key anti-join and any MERGE
    * consumer already rely on): `keyCols` identify a row uniquely
    * within a version — with duplicate keys, "the key no longer
    * exists" under-reports row removals on EITHER path.
    */
  private def dvDeltaDeletes(spark: SparkSession, dir: String,
      mFrom: Manifest, mTo: Manifest, inserts: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, lit, when}
    val fromFiles = mFrom.files.toSet
    // sidecars are tiny by construction (tombstones since the last
    // compaction); the delta is bounded by the window's delete volume
    val delta = tombFrame(spark, dir, mTo).join(tombFrame(spark, dir, mFrom),
        Seq("file_name", "row_index"), "left_anti")
      .filter(col("file_name").isInCollection(fromFiles))
    val candidates = positionalRows(spark, dir, delta)
      .getOrElse(return readFiles(spark, dir, mFrom, "changeFeed").limit(0)
        .withColumn("_change_type", lit("delete")))
    // no forced broadcast (ADVICE r8): the insert side is bounded only
    // by the window's change volume — a bulk append in a delete-bearing
    // window would push an arbitrarily large frame through a driver-side
    // broadcast. AQE picks broadcast when the side is actually small.
    //
    // Round 9: a candidate whose key the window RE-INSERTED is not
    // suppressed any more — it is tagged `update_preimage` (row-algebra
    // folds subtract it like a delete; key-upsert MERGE consumers
    // ignore it, and the re-inserting row stays a plain `insert`), so a
    // delete+re-insert of one key within a window folds exactly. Since
    // round 10 the two-snapshot rung matches this exactness through its
    // in-window re-commit flag, so every delete-bearing rung agrees.
    val reKeys = inserts.select(keyCols.map(col): _*).distinct()
      .withColumn("__reinserted", lit(true))
    candidates.join(reKeys, keyCols, "left_outer")
      .withColumn("_change_type",
        when(coalesce(col("__reinserted"), lit(false)),
          lit("update_preimage")).otherwise(lit("delete")))
      .drop("__reinserted")
  }

  /** Fetch the rows at `(file_name, row_index)` positions `delta` back
    * from ONLY the affected data files, through the tracked schema
    * (readFiles' evolution semantics). None when `delta` is empty.
    */
  private def positionalRows(spark: SparkSession, dir: String,
      delta: DataFrame): Option[DataFrame] = {
    // the delta plan is evaluated twice (file cut, then the position
    // join) — but it is a join of two SMALL sidecar reads, so two lazy
    // evaluations are cheaper than a checkpoint job's fixed cost
    val affected = delta.select("file_name").distinct()
      .collect().map(_.getString(0)).toSeq
    if (affected.isEmpty) return None
    val reader = storedSchema(dir) match {
      case Some(sc) => spark.read.schema(sc)
      case None => spark.read
    }
    // no forced broadcast (ADVICE r8): a bulk retention purge makes the
    // tombstone delta arbitrarily large; AQE broadcasts when it is small
    Some(reader.parquet(affected.map(n => s"$dir/$n"): _*)
      .withColumn("__file", expr("_metadata.file_name"))
      .withColumn("__pos", expr("_metadata.row_index"))
      .join(delta.withColumnRenamed("file_name", "__file")
        .withColumnRenamed("row_index", "__pos"), Seq("__file", "__pos"))
      .drop("__file", "__pos"))
  }

  /** Whether the `(fromV, toV]` window could have REMOVED any row —
    * decided from the two version manifests alone: data files are
    * immutable, so if every `fromV` file is still referenced by `toV`
    * and the deletion-vector set is unchanged, every old row survives
    * verbatim. A compaction (files replaced) or a new/changed vector
    * forces the conservative answer; the anti-join then decides exactly.
    */
  private[streaming] def windowMayDelete(dir: String, fromV: Long, toV: Long): Boolean = {
    val mFrom = parseManifest(versionFile(dir, fromV))
    val mTo = parseManifest(versionFile(dir, toV))
    !(mFrom.dvs == mTo.dvs && mFrom.files.toSet.subsetOf(mTo.files.toSet))
  }

  /** CHANGE FEED AS A STREAM (round 8): incrementally materialize each
    * newly committed version's net-effect deltas into an append-only
    * CHANGE-LOG landing that any `readStream.parquet(deltaDir)` then
    * consumes push-style — versions become micro-batches, giving the
    * incremental-view-maintenance fold (s28) its streaming form (s31).
    *
    * Exactly-once, by the same applied-high-water idea as the landing
    * itself: `_cf_applied` records the last relayed version; each new
    * retained version v stages its window's deltas onto deterministic
    * `cf<v>_*` names (a crashed attempt re-stages the same names,
    * REPLACE_EXISTING) and then advances the marker atomically. The
    * first sync bootstraps from the EARLIEST retained snapshot as pure
    * inserts. Every window is served by [[changeFeed]]'s delete ladder,
    * so a delete-bearing sync costs O(its deletes), an append-only one
    * O(its files).
    *
    * LATE CHANGES: [[deleteWhere]] and [[updateWhere]] re-flip the
    * CURRENT version in place (they must — `applied` is the stream's
    * exactly-once mark), so a delete or update can land on a version
    * the relay ALREADY synced. The relay therefore records the
    * late-change evidence it has accounted for — the tombstone set
    * (the `_cf_state_*` sidecar named by the marker) and, since round
    * 9, the synced version's update-rewrite file set (`_accounted_upd`
    * inside the state dir). Each sync diffs the synced version's
    * CURRENT tombstones and `u`-files against that state: un-relayed
    * postimage rows are emitted as `update_postimage` (the upsert
    * payload), matched removed positions as `update_preimage`, and
    * plain removed positions as `delete` — positional fetch from only
    * the affected files in every case, so the pass costs O(the late
    * change volume). The Delta-CDF four-type shape means a row-algebra
    * fold (postimage adds, preimage subtracts) and a key-upsert MERGE
    * consumer (apply postimages by key, ignore preimages) are both
    * exact with no ordering assumption between the log's files.
    * An update inside an UN-RELAYED window needs no late accounting at
    * all (round 10): the window itself relays it exactly — the
    * postimage rides the insert side (restamped with its commit
    * version) and the removed positions surface as `update_preimage`
    * on every delete rung, including the two-snapshot rung after a
    * compaction. The late path exists because an update on the
    * ALREADY-RELAYED version is covered by no window, ever.
    *
    * ORDERING CONTRACT with compaction: a compaction FOLDS tombstones
    * away, so folding the synced version's un-relayed tombstones would
    * erase the late-delete diff's only evidence — the one maintenance
    * order that can silently lose change rows (every other order is
    * safe: un-relayed WINDOWS survive a fold via the exact two-snapshot
    * rung). The relay therefore writes a `_cf_relay` attach marker into
    * the landing and [[compactIfNeeded]] REFUSES that exact state; the
    * in-loop order (relay, then compact) always passes.
    *
    * Other contracts (all loud): the landing's retention must span the
    * relay's lag (an expired `synced` version refuses — widen
    * `keepVersions` to the consumer's maximum downtime); single relay
    * writer. Crash-safe: change files stage HIDDEN (`.`-prefixed, which
    * file sources ignore), then the new state sidecar is written, then
    * the marker flips atomically to (version, state, staged names), and
    * only then are the staged files renamed visible — so a consumer can
    * never read bytes a crashed attempt would recompute differently,
    * and a visible change file is immutable forever. A crash before the
    * flip leaves only hidden garbage (swept on the next entry); a crash
    * mid-promotion is finished from the marker's file list.
    *
    * Known bound: the log is append-only, so it grows with TOTAL change
    * volume, not live size. Bounding it safely is a generation swap
    * (snapshot-as-inserts into a NEW log dir that fresh consumers adopt
    * — rewriting in place would double-count for every checkpointed
    * consumer, whose file source has already recorded the old names);
    * deliberately not implemented until something needs it.
    *
    * Returns the high-water version after the sync (-1 = nothing
    * committed yet).
    */
  def changeFeedRelay(spark: SparkSession, dir: String, deltaDir: String,
      keyCols: Seq[String]): Long =
    changeFeedRelayImpl(spark, dir, deltaDir, keyCols,
      snapshotBootstrap = false)

  /** `snapshotBootstrap = true` (the generation swap's form): a first
    * sync bootstraps from the CURRENT version's snapshot as pure
    * inserts, with NO history windows. The swap exists to BOUND the
    * log — replaying retained windows would re-import exactly the
    * lifetime churn the swap is shedding (and round 9's key-level
    * rung 3 would additionally have left pre-update phantoms in the
    * fold, the bug s35 caught; the round-10 exact snapshot rung
    * removes that hazard, but replay stays pointless — a fresh
    * consumer needs the truth, not its history). A snapshot has every
    * verb baked in (merge-on-read), so the new log folds to the live
    * landing trivially, and subsequent syncs diff incrementally. */
  private def changeFeedRelayImpl(spark: SparkSession, dir: String,
      deltaDir: String, keyCols: Seq[String],
      snapshotBootstrap: Boolean): Long = {
    import org.apache.spark.sql.functions.lit
    // refuse BEFORE any staging: an untracked landing would bootstrap
    // fine and then throw on every subsequent window, leaving a marker
    // that can never advance
    require(storedSchema(dir).forall(_.fieldNames.contains(CommitVersionCol)),
      s"changeFeedRelay: landing $dir is not change-tracked " +
        s"(commit with trackChanges = true)")
    new java.io.File(deltaDir).mkdirs()
    val attachF = new java.io.File(dir, RelayAttachFile)
    val attachBytes = deltaDir.getBytes("UTF-8")
    // owner marker IN the generation dir (round 12): records which
    // landing this log belongs to, so [[expireRelayGeneration]] can
    // refuse deleting ANOTHER landing's generation (the attach-file
    // check alone only knows dir's CURRENT log — a frozen old
    // generation carries no back-pointer without this). ORDERING
    // (round-12 review finding): this refusal must run BEFORE the
    // attach write below — re-pointing dir's attach at a foreign log
    // and THEN refusing would leave dir's attach naming a log dir owns
    // nothing of, which both defeats compactIfNeeded's folding guard
    // and lets expireRelayGeneration delete dir's REAL live log (the
    // "is current log" refusal would no longer match it).
    //   - owner present and mismatching: a foreign live log — refuse.
    //   - owner missing WITH a marker (or published files): the
    //     pre-round-12 legacy shape. Self-upgrade ONLY when dir's own
    //     CURRENT attach already names this deltaDir — that attach is
    //     the one artifact proving the log is ours; stamping any other
    //     marker-bearing dir would claim a FOREIGN landing's legacy log
    //     and permanently lock out its rightful owner (review finding).
    //   - owner missing, no marker, no published files: a fresh dir the
    //     caller is creating — stamp.
    val ownerF = new java.io.File(deltaDir, RelayOwnerFile)
    val ownerCanon = canonPath(dir)
    val markerF = new java.io.File(deltaDir, "_cf_applied")
    if (ownerF.exists()) {
      val rec = new String(Files.readAllBytes(ownerF.toPath), "UTF-8").trim
      require(canonPath(rec) == ownerCanon,
        s"changeFeedRelay: $deltaDir is owned by landing '$rec', not " +
          s"'$dir' — relaying this landing's windows into another " +
          "landing's log would interleave two histories")
    } else {
      val hasHistory = markerF.exists() ||
        Option(new java.io.File(deltaDir).listFiles()).getOrElse(Array.empty)
          .exists(f => isPublishedChangeFile(f.getName))
      if (hasHistory) {
        val attach =
          if (attachF.exists())
            new String(Files.readAllBytes(attachF.toPath), "UTF-8")
          else ""
        require(attach.nonEmpty && canonPath(attach) == canonPath(deltaDir),
          s"changeFeedRelay: $deltaDir carries relay history but no " +
            s"$RelayOwnerFile owner record, and it is not $dir's current " +
            s"attach target (attach: '$attach') — cannot prove the log is " +
            "this landing's; if it is, restore ownership by writing the " +
            s"landing path into $deltaDir/$RelayOwnerFile")
      }
      ParquetLand.atomicReplace(ownerF, ownerCanon.getBytes("UTF-8"))
    }
    // attach marker: lets the landing's own maintenance find the relay
    // marker and refuse the one folding order that loses deletes (see
    // the ordering contract above); last attached relay wins, matching
    // the single-relay-writer contract. Written only AFTER the owner
    // refusals above.
    if (!attachF.exists() ||
        !java.util.Arrays.equals(Files.readAllBytes(attachF.toPath), attachBytes))
      ParquetLand.atomicReplace(attachF, attachBytes)
    val parsed = parseRelayMarker(deltaDir)
    val (marker, stateName) = parsed match {
      case Some((v, s, _)) => (v, Some(s))
      case None =>
        // no marker is legitimate ONLY for a fresh dir (first pass
        // bootstraps from snapshot). A markerless dir that already holds
        // PUBLISHED change files means the marker was lost — bootstrapping
        // again would re-emit the snapshot as inserts on top of history a
        // checkpointed consumer has already folded (double-count forever).
        requireNoOrphanChangeFiles(deltaDir, "changeFeedRelay")
        (-1L, Option.empty[String])
    }
    // PUBLICATION PROTOCOL: every change file is staged HIDDEN (a `.`
    // prefix Spark readers ignore) and becomes consumer-visible by an
    // atomic rename only AFTER the marker flip commits it. A checkpointed
    // consumer can therefore never observe bytes a crashed attempt might
    // recompute differently (a deleteWhere between crash and retry
    // changes the late/window frames, and a file source never re-reads a
    // path it has recorded) — once visible, a change file is immutable
    // forever. Entry recovery below finishes the rename sweep of a flip
    // that died mid-promotion (the marker's third field lists what it
    // committed), then deletes hidden leftovers of any UN-flipped
    // attempt — this pass re-stages those deterministically.
    parsed.foreach { case (_, _, committed) =>
      committed.foreach { n =>
        val hidden = new java.io.File(deltaDir, "." + n)
        if (hidden.exists()) {
          val visible = new java.io.File(deltaDir, n)
          if (visible.exists()) { hidden.delete(); () }
          else { Files.move(hidden.toPath, visible.toPath); () }
        }
      }
    }
    Option(new java.io.File(deltaDir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(".cf")).foreach { f => f.delete(); () }
    // visible names staged by THIS pass, promoted after the flip
    val stagedNames = scala.collection.mutable.ArrayBuffer.empty[String]
    def stageHidden(df: DataFrame, prefix: String): Unit = {
      stagedNames ++= ParquetLand.stageParts(df, deltaDir, s".$prefix")
        .map(_.stripPrefix("."))
      ()
    }
    // built only when a late diff is actually needed: parquet() lists
    // and reads footers eagerly, and the common no-change relay pass
    // must stay a pure metadata check
    def state: DataFrame = stateName match {
      case Some(s) => spark.read.parquet(s"$deltaDir/$s")
      case None => emptyTombFrame(spark)
    }
    val retained = versions(dir)
    var synced = marker
    // 1. LATE CHANGES on the already-synced version — the two ways a
    // maintenance verb re-flips a version the relay already published:
    //   deletes: its current tombstones minus the accounted state
    //     (bounded by the late delete volume; empty when maintenance
    //     preceded the relay, and empty after a compaction — folding
    //     tombstones away deletes nothing);
    //   updates (round 9): [[updateWhere]] adds postimage `u`-files to
    //     the synced version; their rows were never relayed. Emitted in
    //     the Delta-CDF shape — `update_postimage` rows (the UPSERT
    //     payload a MERGE consumer applies by key) paired with
    //     `update_preimage` rows for the matching removed positions —
    //     so a row-algebra fold (preimage subtracts like a delete) and
    //     a key-upsert consumer (preimages ignored) are BOTH exact,
    //     without any ordering assumption on the log's files.
    if (marker >= 0L) {
      require(retained.contains(marker),
        s"changeFeedRelay: synced version $marker expired from $dir — " +
          s"retention must span the relay's lag (have: ${retained.mkString(", ")})")
      val mSynced = parseManifest(versionFile(dir, marker))
      val curUpd = updateFiles(mSynced)
      // the accounted state is NAMED by the synced version's dv set and
      // update-file set (content tag — names are unique per attempt, so
      // name-set equality IS content equality): an unchanged name proves
      // an empty late diff, and the no-change relay pass runs zero Spark
      // jobs
      if (!stateName.contains(cfStateName(marker, mSynced.dvs, curUpd))) {
        // the batch names are keyed by the state this pass will FLIP TO
        // (computed from the current evidence — dv and u-file names
        // embed a staging nonce, so the name never recurs), NOT by the
        // accounted state at entry: that one DOES recur — a compaction
        // resets the synced version's evidence to empty, so the
        // compact → relay → update → relay loop with no version advance
        // would stage a second late batch under the SAME entry-state tag
        // and collide with the earlier committed file on promotion
        // (round 10 — the x_relay bench fixture crashed on exactly this).
        // Crash-retry determinism is unchanged: an un-flipped attempt's
        // hidden leftovers were swept at entry, and the retry recomputes
        // the same evidence-derived names.
        val tag = cfStateName(marker, mSynced.dvs, curUpd)
          .stripPrefix("_cf_state_").replace("_", "x")
        // A missing accounted-update list with u-files PRESENT is
        // ambiguous evidence: "all accounted" (a legacy pre-round-9
        // state — its u-files predate the attach and were covered by
        // the bootstrap) reads the same as "some lost" (a round-9 state
        // dir that lost the file AFTER an update was accounted — then
        // assuming all-accounted silently drops postimages and emits
        // their preimages as plain deletes). Guessing loses rows, so
        // refuse with the recovery path spelled out; with no u-files at
        // all the ambiguity is empty and the pass proceeds (step 3
        // writes the list fresh).
        val accounted = stateName.flatMap(readAccountedUpd(deltaDir, _))
        require(accounted.isDefined || curUpd.isEmpty,
          s"changeFeedRelay: the accounted state ${stateName.get} of " +
            s"$deltaDir has no _accounted_upd but the synced version " +
            s"$marker carries update-rewrite files (${curUpd.mkString(", ")}) " +
            "— cannot tell accounted postimages from un-relayed ones " +
            "(assuming either silently loses or double-emits rows). If " +
            "this state predates update accounting (pre-round-9) and " +
            "every u-file predates the relay attach, acknowledge by " +
            "writing their names to that dir's _accounted_upd; otherwise " +
            "rebuild the log from a fresh delta dir")
        val newUpd = curUpd.toSet -- accounted.getOrElse(curUpd.toSet)
        // ONE read of the synced version's dv sidecars feeds both the
        // postimage anti-join and the late-delete diff (bounded by the
        // synced version's tombstone count)
        val tombSynced = tombFrame(spark, dir, mSynced).localCheckpoint()
        // postimages = rows of the un-relayed rewrite files, minus any
        // the synced version has since tombstoned again (a re-update or
        // a post-update delete); checkpointed — the frame (bounded by
        // the late update volume) feeds both its own stage and the
        // preimage key split below
        val postimages =
          if (newUpd.isEmpty) None
          else {
            val reader = storedSchema(dir) match {
              case Some(sc) => spark.read.schema(sc)
              case None => spark.read
            }
            Some(reader.parquet(newUpd.toSeq.map(n => s"$dir/$n"): _*)
              .withColumn("__file", expr("_metadata.file_name"))
              .withColumn("__pos", expr("_metadata.row_index"))
              .join(tombSynced
                  .withColumnRenamed("file_name", "__file")
                  .withColumnRenamed("row_index", "__pos"),
                Seq("__file", "__pos"), "left_anti")
              .drop("__file", "__pos")
              .localCheckpoint())
          }
        // removed rows = new tombstones on files whose rows WERE
        // published — tombstones on the un-relayed rewrite files
        // themselves carry no debt (those rows never reached the log)
        val late = tombSynced.join(state,
            Seq("file_name", "row_index"), "left_anti")
          .filter(if (newUpd.isEmpty) lit(true)
            else !col("file_name").isInCollection(newUpd))
        positionalRows(spark, dir, late).foreach { rows0 =>
          postimages match {
            case Some(post) =>
              val rows = rows0.localCheckpoint() // feeds both splits
              val pKeys = post.select(keyCols.map(col): _*).distinct()
              val del = rows.join(pKeys, keyCols, "left_anti")
                .withColumn("_change_type", lit("delete"))
              if (!del.isEmpty) stageHidden(del, s"cf${marker}d${tag}_")
              val pre = rows.join(pKeys, keyCols, "left_semi")
                .withColumn("_change_type", lit("update_preimage"))
              if (!pre.isEmpty) stageHidden(pre, s"cf${marker}p${tag}_")
            case None =>
              stageHidden(rows0.withColumn("_change_type", lit("delete")),
                s"cf${marker}d${tag}_")
          }
        }
        postimages.foreach { post =>
          if (!post.isEmpty)
            stageHidden(post.withColumn("_change_type", lit("update_postimage")),
              s"cf${marker}u${tag}_")
        }
      }
    }
    // 2. the normal version windows, each through changeFeed's ladder
    // (snapshot-bootstrap form: only the CURRENT version, as a snapshot)
    val toSync =
      if (snapshotBootstrap && marker < 0L) retained.filter(_ > marker).takeRight(1)
      else retained.filter(_ > marker)
    for (v <- toSync) {
      val delta =
        if (synced < 0L)
          readVersion(spark, dir, v).withColumn("_change_type", lit("insert"))
        else changeFeed(spark, dir, synced, v, keyCols)
      stageHidden(delta, s"cf${v}_")
      synced = v
    }
    // 3. snapshot the accounted tombstone state for the new high-water
    // version, then flip the marker to (version, state) atomically;
    // old state sidecars are swept once nothing references them
    if (synced >= 0L) {
      val mNow = parseManifest(versionFile(dir, synced))
      val newState = cfStateName(synced, mNow.dvs, updateFiles(mNow))
      // nothing changed since the last flip → leave the LIVE state dir
      // alone: rewriting the dir the marker references would open a
      // crash window where the marker points at a missing/partial state.
      // Anything staged this pass implies a name change (late deletes
      // require a dv-set change, late postimages a u-file-set change,
      // windows bump the version), so the skip never strands hidden
      // files.
      if (!stateName.contains(newState)) {
        // full rewrite even if the dir exists — a crashed attempt may
        // have left it partial; the name DIFFERS from the marker's
        // (checked above), so the marker keeps referencing the old
        // intact state until the atomic flip below
        val stateDir = new java.io.File(deltaDir, newState)
        if (stateDir.exists()) graft.TempCleanup.rmrf(stateDir)
        tombFrame(spark, dir, mNow).coalesce(1).write.mode("overwrite")
          .parquet(s"$deltaDir/$newState")
        // accounted update-rewrite files ride INSIDE the state dir (the
        // `_` prefix hides the file from the parquet read) and commit
        // with the same marker flip as the tombstone snapshot
        ParquetLand.atomicReplace(new java.io.File(stateDir, "_accounted_upd"),
          updateFiles(mNow).sorted.mkString("\n").getBytes("UTF-8"))
        // the flip commits (version, state, staged files) together; the
        // promotion renames below make the committed files visible —
        // a crash mid-promotion is finished by the next entry recovery
        ParquetLand.atomicReplace(markerF,
          s"$synced\t$newState\t${stagedNames.mkString(",")}".getBytes("UTF-8"))
        stagedNames.foreach { n =>
          Files.move(java.nio.file.Paths.get(deltaDir, "." + n),
            java.nio.file.Paths.get(deltaDir, n))
          ()
        }
        Option(new java.io.File(deltaDir).listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.startsWith("_cf_state_") && f.getName != newState)
          .foreach { f => graft.TempCleanup.rmrf(f); () }
      } else if (readAccountedUpd(deltaDir, newState).isEmpty) {
        // unchanged state name but the accounted-update list is missing
        // (a genuinely legacy state always has a DIFFERENT name — the
        // round-9 tag domain-separates the u-file set — but a crashed or
        // hand-pruned state dir can lack the file). The pass above read
        // it as "all current u-files accounted" and updateImpl refuses
        // new u-files while it's missing, so restoring the CURRENT list
        // in place is consistent; atomicReplace, no crash window.
        ParquetLand.atomicReplace(
          new java.io.File(new java.io.File(deltaDir, newState), "_accounted_upd"),
          updateFiles(mNow).sorted.mkString("\n").getBytes("UTF-8"))
      }
    }
    synced
  }

  /** GENERATION SWAP (round 9 — the change log's one documented bound):
    * the relay's log is append-only, so it grows with TOTAL change
    * volume, not live size. Swapping generations re-bases it: a NEW
    * log dir is bootstrapped from the landing's CURRENT snapshot as
    * pure inserts — deliberately NOT the retained history windows,
    * which would re-import exactly the lifetime churn the swap is
    * shedding (see [[changeFeedRelayImpl]]) — and the landing's attach
    * marker re-points so every subsequent sync maintains the NEW dir.
    * The new log restarts at LIVE size; swapping periodically bounds
    * total footprint.
    *
    * The old dir is deliberately left untouched and unmaintained: a
    * checkpointed consumer's file source has recorded its file names
    * and can keep draining what was published (rewriting in place
    * would double-count for exactly those consumers). Fresh consumers
    * adopt `newDeltaDir`; drop the old dir via
    * [[expireRelayGeneration]] once its consumers are gone.
    *
    * Refuses a non-fresh target (visible change files but no marker —
    * some OTHER landing's log; mixing histories would double-count).
    * Re-running after a crash is the relay's own idempotence: a marker
    * at the same evidence is a zero-job no-op pass. Returns the synced
    * high-water version.
    */
  def relayGenerationSwap(spark: SparkSession, dir: String,
      newDeltaDir: String, keyCols: Seq[String]): Long = {
    val d = new java.io.File(newDeltaDir)
    val visible = Option(d.listFiles()).getOrElse(Array.empty)
      .exists(f => isPublishedChangeFile(f.getName))
    require(parseRelayMarker(newDeltaDir).isDefined || !visible,
      s"relayGenerationSwap: $newDeltaDir holds change files but no relay " +
        "marker — it is not a fresh generation dir (and not a crashed " +
        "attempt of one, whose staged files would be hidden); mixing " +
        "log histories double-counts")
    // a target that HAS a marker must be THIS landing's current log
    // (the idempotent re-swap / crash-retry case — the attach marker is
    // re-pointed at entry, before any staging): any other marked dir is
    // some other landing's live log, and appending this landing's
    // windows into it would interleave two histories — every foreign
    // log has a marker, so the marker-less check above cannot catch it
    parseRelayMarker(newDeltaDir).foreach { _ =>
      val attachF = new java.io.File(dir, RelayAttachFile)
      val attach =
        if (attachF.exists())
          new String(Files.readAllBytes(attachF.toPath), "UTF-8")
        else ""
      require(attach == newDeltaDir,
        s"relayGenerationSwap: $newDeltaDir already carries a relay marker " +
          s"and is not $dir's current log (attach: '$attach') — it is " +
          "another log's history; a generation swap needs a FRESH dir")
    }
    changeFeedRelayImpl(spark, dir, newDeltaDir, keyCols,
      snapshotBootstrap = true)
  }

  /** EXPIRE a drained old relay generation (round 11 — the retention
    * bound [[relayGenerationSwap]] was missing): deletes `oldDeltaDir`
    * and everything in it. The swap deliberately freezes old
    * generations — checkpointed consumers keep draining the file names
    * they recorded — so expiry is destructive exactly for any consumer
    * still reading, and the verb demands EXPLICIT acknowledgment (the
    * streaming source's `retiredRoots` pattern): the caller must name
    * the generation's synced high-water version, proving they looked at
    * what they are deleting. Refusals:
    *   - `oldDeltaDir` is the landing's CURRENT attach target (expiring
    *     the live log would detach maintenance from its late-change
    *     evidence mid-flight — swap generations first);
    *   - no relay marker in `oldDeltaDir` (it is not a relay generation;
    *     this verb must never be usable as a generic rm -rf), or a
    *     corrupt marker (parse throws);
    *   - `acknowledgeSyncedVersion` does not match the marker's version.
    * Returns the synced version the expired generation carried.
    */
  def expireRelayGeneration(dir: String, oldDeltaDir: String,
      acknowledgeSyncedVersion: Long): Long = {
    val attachF = new java.io.File(dir, RelayAttachFile)
    val attach =
      if (attachF.exists())
        new String(Files.readAllBytes(attachF.toPath), "UTF-8")
      else ""
    // canonical comparison: a trailing slash / symlinked spelling of the
    // live log must not slip past the refusal and delete it
    require(attach.isEmpty || canonPath(attach) != canonPath(oldDeltaDir),
      s"expireRelayGeneration: $oldDeltaDir is $dir's CURRENT relay log — " +
        "swap generations (relayGenerationSwap) before expiring it")
    val (v, _, _) = parseRelayMarker(oldDeltaDir).getOrElse(
      throw new IllegalArgumentException(
        s"expireRelayGeneration: $oldDeltaDir carries no relay marker — " +
          "not a relay generation dir; refusing to delete it"))
    // ownership (round 12, review finding): the live-log refusal above
    // only consults THIS landing's attach file, so without this check a
    // caller passing the wrong `dir` (or one with no attach file) could
    // delete ANOTHER landing's current generation with only the
    // guessable synced version as a guard. Every generation is stamped
    // `_cf_owner` at attach time; a frozen pre-round-12 generation that
    // predates the stamp must have it restored by hand (echo the owning
    // landing's path into `_cf_owner`) after verifying ownership —
    // destructive verbs never guess.
    val ownerF = new java.io.File(oldDeltaDir, RelayOwnerFile)
    require(ownerF.exists(),
      s"expireRelayGeneration: $oldDeltaDir carries no $RelayOwnerFile " +
        "owner record (a pre-ownership generation) — verify it belongs " +
        s"to $dir and restore the owner file before expiring")
    val owner = new String(Files.readAllBytes(ownerF.toPath), "UTF-8").trim
    require(canonPath(owner) == canonPath(dir),
      s"expireRelayGeneration: $oldDeltaDir belongs to landing '$owner', " +
        s"not '$dir' — refusing to delete another landing's generation")
    require(v == acknowledgeSyncedVersion,
      s"expireRelayGeneration: acknowledgment mismatch — $oldDeltaDir's " +
        s"synced high-water version is $v, not $acknowledgeSyncedVersion; " +
        "name the generation's version to confirm every consumer has " +
        "drained it (deleting under a live consumer loses rows)")
    graft.TempCleanup.rmrf(new java.io.File(oldDeltaDir))
    v
  }

  /** The ONE definition of "published change file" — a committed
    * `cf*.parquet` part a checkpointed consumer may already have read.
    * Shared by the generation-swap freshness guard and the lost-marker
    * orphan check so the two can never disagree on what counts as
    * published (a stray `cf`-prefixed non-parquet file must not brick
    * the relay with the lost-marker message). Staged-but-uncommitted
    * relay output never matches: staging writes under dot-prefixed
    * temp names until the marker flip. */
  private def isPublishedChangeFile(name: String): Boolean =
    name.startsWith("cf") && name.endsWith(".parquet")

  /** Refuse when `deltaDir` holds PUBLISHED change files (`cf*.parquet`)
    * without a `_cf_applied` marker: the marker was lost, and any path
    * that would treat the dir as fresh (relay re-bootstrap) or mutate the
    * landing on top of it would double-count for checkpointed consumers.
    * A fresh attach (no marker, no files) passes.
    */
  private def requireNoOrphanChangeFiles(deltaDir: String, ctx: String): Unit = {
    val leftover = Option(new java.io.File(deltaDir).listFiles())
      .getOrElse(Array.empty).filter(f => isPublishedChangeFile(f.getName))
    require(leftover.isEmpty,
      s"$ctx: $deltaDir holds ${leftover.length} published change files " +
        "but no _cf_applied marker — the relay marker was lost " +
        "(re-bootstrapping would double-count for checkpointed " +
        "consumers); restore _cf_applied, or start consumers over on a " +
        "fresh log dir via relayGenerationSwap")
  }

  /** Strict parse of the relay marker `_cf_applied`:
    * `<version>\t<state>[\t<comma-joined committed file names>]` — the
    * third field is what the flip published, consumed by the promotion
    * recovery. None = nothing relayed yet; anything malformed THROWS —
    * guessing a missing accounted state either double-emits deletes or
    * loses them. The one parser shared by the relay and the compaction
    * guard, so the two can never disagree on validity.
    */
  private def parseRelayMarker(deltaDir: String): Option[(Long, String, Seq[String])] = {
    val f = new java.io.File(deltaDir, "_cf_applied")
    if (!f.exists()) None
    else new String(Files.readAllBytes(f.toPath), "UTF-8").trim
      .split("\t", -1) match {
        case Array(v, s) if v.toLongOption.isDefined && s.nonEmpty =>
          Some((v.toLong, s, Seq.empty)) // early-round-8 two-field form
        case Array(v, s, names) if v.toLongOption.isDefined && s.nonEmpty =>
          Some((v.toLong, s, names.split(",").filter(_.nonEmpty).toSeq))
        case other => throw new IllegalStateException(
          s"unreadable relay marker in $deltaDir: ${other.mkString("\\t")}" +
            " (expected <version>\\t<state>[\\t<files>])")
      }
  }

  /** Detach a previously attached change-feed relay from `dir`: removes
    * the `_cf_relay` marker so maintenance stops consulting the (perhaps
    * long-deleted) change-log dir. After a detach, compactions may fold
    * tombstones the relay never accounted — only detach when the change
    * log and its consumers are themselves retired. Returns whether a
    * marker existed.
    */
  def detachRelay(dir: String): Boolean =
    new java.io.File(dir, RelayAttachFile).delete()

  /** `_cf_relay` sibling in the LANDING dir: records the attached
    * change-log dir so the landing's own maintenance can locate the
    * relay marker (compactIfNeeded's folding guard). */
  private[streaming] val RelayAttachFile = "_cf_relay"

  /** `_cf_owner` sibling in the GENERATION dir: records the owning
    * landing's canonical path, stamped at attach time — the
    * back-pointer [[expireRelayGeneration]] requires before deleting
    * (the attach file only knows the landing's CURRENT log; frozen old
    * generations need their own ownership record). */
  private[streaming] val RelayOwnerFile = "_cf_owner"

  /** Canonical path for ownership / live-log comparisons: a trailing
    * slash or symlinked spelling must not defeat a refusal. */
  private def canonPath(p: String): String =
    try new java.io.File(p).getCanonicalPath
    catch { case _: java.io.IOException => p }

  /** Content tag of the accounted late-change evidence: 64 bits of MD5
    * over the sorted dv-sidecar names PLUS (round 9) the sorted
    * update-rewrite file names of the synced version. Deliberately not
    * the 32-bit murmur it replaces — state-name EQUALITY is trusted to
    * skip the late diff and the state rewrite, so a collision would
    * silently drop late deletes or late postimages; at 64 bits it is
    * out of reach. Sidecar and u-file names are unique per staging
    * attempt, so name-set equality is content equality. */
  private def lateEvidenceTag(dvs: Seq[String], updFiles: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    dvs.sorted.foreach(n => md.update((n + "\n").getBytes("UTF-8")))
    md.update(0.toByte) // domain separator: dv set vs update-file set
    updFiles.sorted.foreach(n => md.update((n + "\n").getBytes("UTF-8")))
    md.digest().take(8).map(b => f"$b%02x").mkString
  }

  private def cfStateName(v: Long, dvs: Seq[String], updFiles: Seq[String]): String =
    s"_cf_state_v${v}_${lateEvidenceTag(dvs, updFiles)}"

  /** Update-rewrite data files of manifest `m`'s OWN version — the
    * `u<applied>_` prefix [[updateImpl]] stages under. The relay's late
    * accounting keys on this naming contract: compaction `c`-files and
    * batch `b`-files never match, so a rewrite that merely reorganizes
    * existing rows (compaction) is never mistaken for new data, while a
    * row UPDATE's postimage files — the only way rows are ADDED to an
    * already-committed version — always are. */
  private def updateFiles(m: Manifest): Seq[String] =
    m.files.filter(_.startsWith(s"u${m.applied}_"))

  /** The accounted update-rewrite file list stored inside a state dir
    * (`_accounted_upd` — the `_` prefix hides it from the parquet read).
    * None when the list is absent — a legacy (pre-round-9) state, or a
    * round-9 state dir that lost the file. The two are observationally
    * identical but semantically opposite (legacy u-files predate the
    * attach and were covered by the bootstrap; lost ones may hide
    * accounted postimages), so the relay's late pass REFUSES on
    * None-with-u-files instead of guessing, and the only silent
    * recoveries are the unambiguous ones: no u-files at all (the
    * accounted set is trivially empty) or a canonical state name (the
    * name hashes the u-file set, so the current list was accounted and
    * merely lost). The relay's step 3 runs both kernels, and since
    * round 11 [[updateImpl]] runs the same two in place before adding
    * u-files — it refuses only the ambiguous remainder. */
  private def readAccountedUpd(deltaDir: String, state: String): Option[Set[String]] = {
    val f = new java.io.File(new java.io.File(deltaDir, state), "_accounted_upd")
    if (!f.exists()) None
    else Some(new String(Files.readAllBytes(f.toPath), "UTF-8")
      .split("\n").filter(_.nonEmpty).toSet)
  }

  /** A manifest's deletion-vector tombstones as a `(file_name,
    * row_index)` frame — THE one dv reader every consumer shares (the
    * delete ladder, the relay, [[deleteWhere]]), so the sidecar's shape
    * is defined in exactly one place.
    */
  private def tombFrame(spark: SparkSession, dir: String, m: Manifest): DataFrame =
    if (m.dvs.isEmpty) emptyTombFrame(spark)
    else spark.read.parquet(m.dvs.map(n => s"$dir/$n"): _*)
      .select(col("file_name"), col("row_index"))

  private def emptyTombFrame(spark: SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("file_name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("row_index",
          org.apache.spark.sql.types.LongType))))

  /** Per-file [min,max] of every stats column, read back from the staged
    * bytes (one small job; the stats can never disagree with the disk).
    */
  private def fileStats(spark: SparkSession, dir: String, names: Seq[String],
      statsCols: Seq[String]): Seq[FileEntry] = {
    if (names.isEmpty) return Seq.empty
    val aggs = statsCols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"__lo_$c"), max(col(c).cast("long")).as(s"__hi_$c")))
    import scala.jdk.CollectionConverters._
    // streamed like attachBlooms: a bulk rewrite deriving stats for
    // thousands of files holds one partition's rows at a time
    val stats = spark.read.parquet(names.map(n => s"$dir/$n"): _*)
      .groupBy(expr("_metadata.file_name").as("__f"))
      .agg(aggs.head, aggs.tail: _*)
      .toLocalIterator().asScala.map(r => r.getAs[String]("__f") ->
        statsCols.map { c =>
          val (li, hi) = (r.fieldIndex(s"__lo_$c"), r.fieldIndex(s"__hi_$c"))
          // an all-NULL stats column must not unbox to a [0,0] zone that
          // wrongly claims the file may contain 0 (ADVICE r6): record the
          // impossible [0,-1] zone so every range prunes it (NULL rows
          // never satisfy a range residual, so pruning stays correct)
          if (r.isNullAt(li) || r.isNullAt(hi)) (0L, -1L)
          else (r.getLong(li), r.getLong(hi))
        }).toMap
    // a range partition can legitimately be empty (skewed batch): its
    // file holds zero rows and gets no stats row — record an impossible
    // [0, -1] zone so every range prunes it
    names.map(n => stats.get(n) match {
      case Some(bounds) => FileEntry(n, bounds)
      case None => FileEntry(n, statsCols.map(_ => (0L, -1L)))
    })
  }

  /** Merge-on-read DELETE: tombstone every live row matching `cond`
    * WITHOUT touching any data file, committed with one flip. The new
    * vector sidecar carries the union of all existing tombstones plus
    * the new ones (so the live manifest always references exactly ONE
    * vector file and reads join one small table); the superseded sidecar
    * stays on disk while any retained version references it. Returns the
    * number of newly tombstoned rows; zero matches still commit (an
    * idempotent re-run is a no-op flip). Single-writer contract: do not
    * run while a stream is appending.
    */
  def deleteWhere(spark: SparkSession, dir: String, cond: Column): Long =
    deleteImpl(spark, dir, "deleteWhere", _.filter(cond))

  /** MERGE-style delete: tombstone every live row whose `keyCols` appear
    * in the `keys` frame — the scalable form of "delete these ids" (a
    * driver-side `isInCollection` list caps out where a DataFrame of
    * keys doesn't; the match is a semi-join, so the key side may be
    * arbitrarily large and is never collected). Same merge-on-read
    * mechanics, retention contract, and single-writer contract as
    * [[deleteWhere]]. Returns the number of newly tombstoned rows.
    */
  def deleteMatching(spark: SparkSession, dir: String, keys: DataFrame,
      keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "deleteMatching: key columns required")
    require(!keyCols.exists(Set("file_name", "row_index")),
      "deleteMatching: key columns collide with the positional columns")
    deleteImpl(spark, dir, "deleteMatching",
      _.join(keys.select(keyCols.map(col): _*).distinct(), keyCols, "left_semi"))
  }

  /** Merge-on-read row UPDATE — the remaining lakehouse verb: tombstone
    * every live row matching `cond` AND append its rewritten copy, in
    * ONE atomic manifest flip. A reader sees the pre-update or the
    * post-update table, never a row both ways (or neither) — the
    * atomicity a delete-then-append pair cannot give.
    *
    * Mechanics compose the two existing sides: positions come from the
    * same metadata scan [[deleteWhere]] uses (minus already-tombstoned
    * rows), the rewritten rows go through [[stageDataFiles]] — so the
    * new files carry zone maps and sized bloom filters exactly like any
    * committed batch, and pruning serves them immediately. The scan is
    * localCheckpoint'd so the tombstoned positions and the rewritten
    * rows come from ONE materialization (a nondeterministic `cond`
    * could otherwise tombstone rows it didn't rewrite).
    *
    * Version contract matches [[deleteWhere]]: the CURRENT version is
    * re-flipped in place (`readVersion(applied)` == `read`; older
    * retained versions keep the pre-update rows; `applied` does NOT
    * advance, so the streaming writer's exactly-once batch-id guard is
    * untouched). On a change-tracked landing the rewritten rows are
    * restamped with the CURRENT version, so a change-feed window ending
    * at `applied` carries the update exactly: the postimage rides the
    * insert side, and the removed positions surface as
    * `update_preimage` on every delete rung (round 10) — row-algebra
    * folds subtract them, key-upsert MERGE consumers ignore them and
    * apply the insert by key. Reads through the TRACKED
    * schema, so post-evolution updates of pre-evolution files rewrite
    * the added columns as their NULL fill. SET of the engine-managed
    * commit-version column or the positional pseudo-columns is refused.
    * Single-writer contract, like every maintenance entry point.
    * Returns the number of rows updated.
    */
  def updateWhere(spark: SparkSession, dir: String, cond: Column,
      set: Seq[(String, Column)]): Long =
    updateImpl(spark, dir, "updateWhere", _.filter(cond), set)

  /** MERGE-style update: rewrite every live row whose `keyCols` appear
    * in the `keys` frame — the scalable form of "patch these ids"
    * (semi-join match, so the key side may be arbitrarily large and is
    * never collected; [[deleteMatching]]'s contract, update-shaped).
    * Same atomic-flip mechanics, version contract, and single-writer
    * contract as [[updateWhere]]. Returns the number of rows updated.
    */
  def updateMatching(spark: SparkSession, dir: String, keys: DataFrame,
      keyCols: Seq[String], set: Seq[(String, Column)]): Long = {
    require(keyCols.nonEmpty, "updateMatching: key columns required")
    require(!keyCols.exists(Set("file_name", "row_index")),
      "updateMatching: key columns collide with the positional columns")
    updateImpl(spark, dir, "updateMatching",
      _.join(keys.select(keyCols.map(col): _*).distinct(), keyCols, "left_semi"),
      set)
  }

  private def updateImpl(spark: SparkSession, dir: String, what: String,
      restrict: DataFrame => DataFrame, set: Seq[(String, Column)]): Long = {
    require(set.nonEmpty, s"$what: no SET expressions")
    val m = readManifest(dir)
    require(m.applied >= 0L,
      s"ManifestLand.$what on an uncommitted landing: $dir")
    // A row UPDATE rewrites the CURRENT version in place — adding data
    // files to a version the relay may have ALREADY published. Both
    // relay positions are exact (round 10 — the round-9 un-relayed-
    // window refusal is LIFTED):
    //  - relay synced to the current version: the late accounting path
    //    (round 9) — the `u<applied>_` rewrite files this verb stages
    //    are detected by the accounted-update-file diff and emitted as
    //    update_preimage/update_postimage pairs on the next relay pass,
    //    and compactIfNeeded refuses to fold them away before that pass
    //    runs (the same ordering contract as tombstones);
    //  - relay lagging (the update lands inside an un-relayed window):
    //    the window itself relays it exactly — the postimage rides the
    //    insert side (restamped with the current version) and the
    //    removed positions surface as `update_preimage` on every delete
    //    rung: positionally on the DV-delta rung, and via the in-window
    //    re-commit flag on the two-snapshot rung, exact even across a
    //    compaction inside the window.
    // Missing `_accounted_upd` on the SYNCED version's state (round 11:
    // the refusal is now scoped to the genuinely ambiguous shape): this
    // verb's new u-files must read as un-relayed on the next relay
    // pass, so the accounted list must exist BEFORE they land. The two
    // unambiguous cases self-upgrade in place — the same recovery
    // kernels the relay's step 3 runs, atomicReplace, no crash window:
    //   - state name == the canonical round-9 name: the name itself
    //     hashes the current u-file set, so the list was accounted and
    //     merely lost — restore the CURRENT list;
    //   - no u-files on the synced version at all (the common legacy
    //     pre-round-9 landing): the accounted set is trivially empty —
    //     stamp an empty list.
    // Only the ambiguous remainder still refuses: a non-canonical state
    // name WITH u-files present cannot tell accounted postimages from
    // un-relayed ones (the relay's own ambiguity refusal; guessing
    // either way silently loses or double-emits rows).
    //
    // That refusal is PERMANENT BY DESIGN (round 12, closing the round-11
    // verdict's #4): the evidence that would disambiguate — which of the
    // synced version's u-files the relay already emitted — exists only in
    // the accounted list itself; once it is lost WITH the state name
    // drifted, no on-disk artifact can reconstruct it (the state name
    // hashes the set, it does not enumerate it). Operator runbook, also
    // spelled out in the refusal message: (a) if the u-files verifiably
    // predate the relay attach, write their sorted names to the state
    // dir's `_accounted_upd` — the verb and the next relay proceed
    // exactly; (b) otherwise start consumers over on a fresh log via
    // [[relayGenerationSwap]]. UpdateGuardSpec pins the exact surface:
    // the refusal fires only on this shape, destroys nothing, and the
    // runbook's restore path resumes with an exact fold.
    locally {
      val attachF = new java.io.File(dir, RelayAttachFile)
      if (attachF.exists()) {
        val deltaDir = new String(Files.readAllBytes(attachF.toPath), "UTF-8")
        val parsed = parseRelayMarker(deltaDir) // throws on corrupt text
        // a MISSING marker over published change files is lost relay
        // state — surface it on the first maintenance verb instead of
        // letting the mutation land and the next relay double-count
        // (round-10 review finding; a fresh attach still passes)
        if (parsed.isEmpty) requireNoOrphanChangeFiles(deltaDir, s"ManifestLand.$what")
        parsed.filter(_._1 == m.applied).foreach {
          case (_, state, _) =>
            if (readAccountedUpd(deltaDir, state).isEmpty) {
              val upd = updateFiles(m)
              val canonical = cfStateName(m.applied, m.dvs, upd)
              // a marker naming a MISSING state dir is corrupt relay
              // state, not a missing list — refuse loudly rather than
              // letting atomicReplace die on the absent parent
              require(new java.io.File(deltaDir, state).isDirectory,
                s"ManifestLand.$what: relay marker of $deltaDir names " +
                  s"state $state but the state dir is missing — corrupt " +
                  "relay state; rebuild the log from a fresh delta dir")
              if (state == canonical || upd.isEmpty)
                ParquetLand.atomicReplace(
                  new java.io.File(new java.io.File(deltaDir, state),
                    "_accounted_upd"),
                  upd.sorted.mkString("\n").getBytes("UTF-8"))
              else throw new IllegalStateException(
                s"ManifestLand.$what: the relay's accounted state $state " +
                  s"for $dir has no _accounted_upd and the synced version " +
                  s"${m.applied} carries update-rewrite files " +
                  s"(${upd.mkString(", ")}) — cannot tell accounted " +
                  "postimages from un-relayed ones. If every u-file " +
                  "predates the relay attach, acknowledge by writing " +
                  "their names to that state dir's _accounted_upd; " +
                  "otherwise rebuild the log from a fresh delta dir")
            }
        }
      }
    }
    val schema = storedSchema(dir).getOrElse(throw new IllegalStateException(
      s"ManifestLand.$what: no tracked schema in $dir"))
    set.foreach { case (c, _) =>
      require(schema.fieldNames.contains(c),
        s"$what: SET column $c is not in the tracked schema of $dir")
      require(c != CommitVersionCol,
        s"$what: $CommitVersionCol is engine-managed")
      require(!Set("file_name", "row_index").contains(c),
        s"$what: $c collides with the positional columns")
    }
    if (m.files.isEmpty) return 0L
    val existing = tombFrame(spark, dir, m)
    val hit = restrict(
      spark.read.schema(schema).parquet(m.files.map(n => s"$dir/$n"): _*)
        .withColumn("file_name", expr("_metadata.file_name"))
        .withColumn("row_index", expr("_metadata.row_index"))
        .join(broadcast(existing.withColumnRenamed("file_name", "__ef")
          .withColumnRenamed("row_index", "__ep")),
          col("file_name") === col("__ef") && col("row_index") === col("__ep"),
          "left_anti")
        .drop("__ef", "__ep"))
      .localCheckpoint()
    val nHit = hit.count()
    if (nHit == 0L) return 0L
    val tag = System.nanoTime()
    val rewritten0 = set.foldLeft(hit: DataFrame) { case (df, (c, e)) =>
      df.withColumn(c, e)
    }
    val rewritten1 =
      if (schema.fieldNames.contains(CommitVersionCol))
        rewritten0.withColumn(CommitVersionCol,
          org.apache.spark.sql.functions.lit(m.applied))
      else rewritten0
    val rewritten = rewritten1.select(schema.fieldNames.map(col).toSeq: _*)
    // cluster the rewrite like the commit path's default (first stats
    // column) so zone maps on the new files stay tight
    val clustered = m.statsCols.headOption match {
      case Some(c) => rewritten.repartitionByRange(2, col(c))
      case None => rewritten
    }
    val (entries, newSidecars) = stageDataFiles(spark, dir, clustered,
      s"u${m.applied}_${tag}_", s"bfs_u${m.applied}_$tag.bfs",
      m.statsCols, m.bloomCol, m.bloomBits)
    // merged tombstones, staged like deleteImpl's
    val mergedDv = existing.union(hit.select(col("file_name"), col("row_index")))
      .coalesce(1)
    val stagedDv = ParquetLand.stageParts(mergedDv, dir,
      s"dv${m.applied}_${tag}_")
    flip(dir, m.copy(entries = m.entries ++ entries, dvs = stagedDv,
      bloomSidecars = m.bloomSidecars ++ newSidecars)) // commit point
    vacuum(dir) // sweep the superseded dv sidecar unless a version pins it
    nHit
  }

  private def deleteImpl(spark: SparkSession, dir: String, what: String,
      restrict: DataFrame => DataFrame): Long = {
    val m = readManifest(dir)
    require(m.applied >= 0L, s"ManifestLand.$what on an uncommitted landing: $dir")
    // a MISSING relay marker over published change files is lost relay
    // state: the relay itself refuses to advance, so refusing the delete
    // too stops maintenance verbs from piling tombstone evidence onto a
    // log no pass can legally account (round-10 review finding; normal
    // relay lag and fresh attaches pass untouched)
    locally {
      val attachF = new java.io.File(dir, RelayAttachFile)
      if (attachF.exists()) {
        val deltaDir = new String(Files.readAllBytes(attachF.toPath), "UTF-8")
        if (parseRelayMarker(deltaDir).isEmpty)
          requireNoOrphanChangeFiles(deltaDir, s"ManifestLand.$what")
      }
    }
    if (m.files.isEmpty) return 0L
    val existing: DataFrame = tombFrame(spark, dir, m)
    // positions of the matching rows in the CURRENT merge-on-read view:
    // rows already tombstoned must not be re-counted, so anti-join first
    // read through the TRACKED schema like every other read path: a raw
    // read samples one file's footer, so after an additive evolution a
    // predicate on the added column would throw or bind nondeterministically
    val reader = storedSchema(dir) match {
      case Some(sc) => spark.read.schema(sc)
      case None => spark.read
    }
    val fresh = restrict(
      reader.parquet(m.files.map(n => s"$dir/$n"): _*)
        .withColumn("file_name", expr("_metadata.file_name"))
        .withColumn("row_index", expr("_metadata.row_index"))
        .join(broadcast(existing.withColumnRenamed("file_name", "__ef")
          .withColumnRenamed("row_index", "__ep")),
          col("file_name") === col("__ef") && col("row_index") === col("__ep"),
          "left_anti"))
      .select(col("file_name"), col("row_index"))
      // one scan, one predicate evaluation (ADVICE r6): the count and the
      // staged tombstones must come from the SAME materialization, or a
      // nondeterministic cond could commit tombstones that differ from
      // the reported count (and the landing was scanned twice regardless)
      .localCheckpoint()
    val merged = existing.union(fresh).coalesce(1)
    val nFresh = fresh.count()
    val staged = ParquetLand.stageParts(merged, dir,
      s"dv${m.applied}_${System.nanoTime()}_")
    flip(dir, m.copy(dvs = staged)) // commit point; rewrites v<applied> too
    vacuum(dir) // sweep the superseded sidecar unless a version pins it
    nFresh
  }

  /** Batch-side commit of one frame as batch `batchId` — the same
    * exactly-once applyBatch the streaming loop uses, exposed for
    * non-streaming writers (backfills, bench fixtures) that want the
    * manifest's visibility/stats/retention semantics without a query.
    */
  def commitBatch(batch: Dataset[Row], batchId: Long, outDir: String,
      statsCols: Seq[String] = Seq.empty, rangeParts: Int = 2,
      clusterBy: Option[Column] = None, bloomCol: Option[String] = None,
      trackChanges: Boolean = false, bloomBits: Option[Int] = None): Unit = {
    new java.io.File(outDir).mkdirs()
    applyBatch(batch, batchId, outDir, statsCols, rangeParts, clusterBy,
      bloomCol, trackChanges, bloomBits)
  }

  /** Declare (or complete) a bloom column on an EXISTING landing —
    * the bulk-backfill maintenance op: attach sized filters to every
    * live data file that lacks one, WITHOUT rewriting any data file.
    * Files are processed in chunks of `chunkFiles`, each chunk
    * committing its own sidecar + flip, so a backfill over thousands
    * of files is restartable — a crash loses at most one chunk's work
    * (its partial sidecar is an unreferenced orphan the next vacuum
    * sweeps) and the resume recomputes only what the manifest doesn't
    * already cover. Single-writer contract, like every maintenance
    * entry point. Returns the number of files newly covered.
    *
    * After the backfill the landing behaves as if committed with the
    * column from the start: future appendCompacting/commitBatch calls
    * inherit it (the `effBloom` fallback) and [[readPrunedEq]] serves
    * the whole history.
    */
  def backfillBlooms(spark: SparkSession, dir: String, bloomCol: String,
      bloomBits: Option[Int] = None, chunkFiles: Int = 64): Int = {
    require(chunkFiles >= 1, s"backfillBlooms: chunkFiles must be >= 1")
    val m0 = readManifest(dir)
    require(m0.applied >= 0L, s"backfillBlooms on an uncommitted landing: $dir")
    require(m0.bloomCol.forall(_ == bloomCol),
      s"bloomCol change mid-landing: manifest declares ${m0.bloomCol.getOrElse("")}, " +
        s"backfill declares $bloomCol")
    require(m0.bloomBits.isEmpty || bloomBits.isEmpty || bloomBits == m0.bloomBits,
      s"bloom bits change mid-landing: manifest declares ${m0.bloomBits.getOrElse("auto")}, " +
        s"backfill declares ${bloomBits.getOrElse("auto")}")
    val effBits = bloomBits.orElse(m0.bloomBits)
    // same strict type contract as the commit path (ADVICE r7)
    storedSchema(dir).foreach { sc =>
      val f = sc.fields.find(_.name == bloomCol).getOrElse(
        throw new IllegalArgumentException(
          s"bloom column $bloomCol not in $dir's tracked schema"))
      require(f.dataType == org.apache.spark.sql.types.LongType,
        s"bloom column $bloomCol must be BIGINT (xxhash64 is type-sensitive): $dir")
    }
    // coverage check reads only sidecar NAMES (payloads skipped): a
    // many-thousand-file resume stays O(names) memory
    val covered = bloomCoveredNames(dir, m0)
    var m = m0.copy(bloomCol = Some(bloomCol), bloomBits = effBits)
    if (m != m0 && m0.files.forall(covered)) flip(dir, m) // declare-only
    var done = 0
    m0.files.filterNot(covered).grouped(chunkFiles).foreach { chunk =>
      val base = m.entries.filter(e => chunk.contains(e.name))
      val withB = attachBlooms(spark, dir, base, bloomCol, effBits)
      val name = s"bfs_f${m.applied}_${System.nanoTime()}.bfs"
      writeBloomSidecar(new java.io.File(dir, name),
        withB.flatMap(e => e.bloom.map(e.name -> _)))
      m = m.copy(bloomSidecars = m.bloomSidecars :+ name)
      flip(dir, m) // chunk commit point — restart resumes after it
      done += chunk.size
    }
    done
  }

  /** Rewrite the landing to `targetFiles` parts when it exceeds
    * `maxFiles`, committing with one flip. The rewrite READS THROUGH the
    * deletion vectors (tombstoned rows fold away — vectors never survive
    * a compaction cycle) and re-clusters by the stats column when the
    * landing declares one, re-deriving fresh zone maps. The rewrite
    * files carry a unique attempt suffix, so a retried compaction can
    * never REPLACE a file the current manifest references, and the
    * post-flip delete of superseded files skips anything a RETAINED
    * VERSION still references (time travel keeps old files alive until
    * expiry).
    */
  /** Compaction maintenance verb (the OPTIMIZE equivalent): rewrite the
    * landing to `targetFiles` files when it exceeds `maxFiles`, folding
    * tombstones and update-rewrite files away. Public since round 10 —
    * it is the same single-writer maintenance entry point deleteWhere /
    * updateWhere are, and its relay ordering guard below protects the
    * one unsafe composition on its own.
    */
  def compactIfNeeded(spark: SparkSession, outDir: String,
      maxFiles: Int, targetFiles: Int, clusterBy: Option[Column] = None): Unit = {
    val m = readManifest(outDir)
    if (m.files.length <= maxFiles) return
    // relay ordering guard (see changeFeedRelay's ORDERING CONTRACT):
    // folding tombstones (or un-relayed update-postimage files) the
    // relay has NOT accounted on the SYNCED version erases the late
    // diff's only evidence — refuse that exact state. A marker BEHIND
    // the current version is safe to fold past: un-relayed WINDOWS
    // survive via the exact two-snapshot rung (round 10 — its in-window
    // re-commit flag keeps recycled keys and in-window updates exact
    // with no positional identity, so the fold loses nothing). An
    // update always tombstones its preimages, so un-relayed u-files
    // imply dvs.nonEmpty and this guard covers both late-change kinds.
    if (m.dvs.nonEmpty) {
      val attachF = new java.io.File(outDir, RelayAttachFile)
      if (attachF.exists()) {
        val log = new String(Files.readAllBytes(attachF.toPath), "UTF-8").trim
        // a missing/unreadable log or marker refuses too — guessing
        // "detached" here silently loses deletes exactly when the log
        // dir was deleted out from under a live relay
        val accounted = scala.util.Try(parseRelayMarker(log)).toOption.flatten
          .exists { case (mv, s, _) =>
            mv < m.applied || s == cfStateName(mv, m.dvs, updateFiles(m)) }
        require(accounted,
          s"compact on relay-attached landing $outDir would fold away " +
            s"tombstones the change-feed relay ($log) has not accounted — " +
            "run changeFeedRelay first (the appendCompacting loop does), " +
            "or detachRelay(dir) if the change log and its consumers " +
            "are retired")
      }
    }
    val merged = readFiles(spark, outDir, m, "compact")
    val data = clusterBy.orElse(m.statsCols.headOption.map(col)) match {
      case Some(c) => merged.repartitionByRange(targetFiles, c)
      case None => merged.repartition(targetFiles)
    }
    val cnames = ParquetLand.stageParts(data, outDir,
      s"c${m.applied}_${System.nanoTime()}_")
    val base =
      if (m.statsCols.isEmpty) cnames.map(FileEntry(_))
      else fileStats(spark, outDir, cnames, m.statsCols)
    // fresh blooms for the rewrite files: tombstoned keys fold away here
    // exactly like the deletion vectors themselves, and the rewrite
    // RESIZES — a compaction concentrating many small files' keys into
    // few big ones is exactly where fixed sizing saturated
    val withBlooms = m.bloomCol match {
      case Some(c) => attachBlooms(spark, outDir, base, c, m.bloomBits)
      case None => base
    }
    // the rewrite's sidecar REPLACES every previous one (unique attempt
    // suffix, like the c-files: a retried compaction never clobbers a
    // referenced sidecar; orphans of a crashed attempt vacuum away)
    val (entries, sidecars) =
      if (withBlooms.exists(_.bloom.nonEmpty)) {
        val name = s"bfs_c${m.applied}_${System.nanoTime()}.bfs"
        writeBloomSidecar(new java.io.File(outDir, name),
          withBlooms.flatMap(e => e.bloom.map(e.name -> _)))
        (withBlooms.map(_.copy(bloom = None)), Seq(name))
      } else (withBlooms, Seq.empty[String])
    flip(outDir, Manifest(m.applied, entries, m.statsCols, Seq.empty,
      m.bloomCol, m.bloomBits, sidecars))
    val keep = referenced(outDir)
    (m.files ++ m.dvs ++ m.bloomSidecars).filterNot(keep.contains)
      .foreach { n => new java.io.File(outDir, n).delete(); () }
  }

  /** Append-mode stream → manifest-committed landing with continuous
    * compaction; same contract as [[ParquetLand.appendCompacting]], no
    * directory renames anywhere. `keepVersions` bounds the time-travel
    * history (1 = current state only, the pre-round-6 footprint);
    * `statsCol` opts into zone-map stats + range clustering on that
    * column (`rangeParts` files per batch).
    */
  /** `relayTo` (round 8) keeps a change-log landing continuously in
    * sync: after each batch commit the in-loop [[changeFeedRelay]]
    * appends the batch's window to the log BEFORE compaction runs (the
    * cheap DV-delta/append-only rungs apply; a post-compaction sync
    * would pay the anti-join fallback), so a downstream
    * `readStream.parquet(log)` consumer sees every version as its own
    * micro-batch with no separate maintenance schedule. Requires
    * `trackChanges` and retention spanning the loop (`keepVersions` ≥ 2
    * so each window's fromV is still retained when relayed).
    */
  def appendCompacting(stream: DataFrame, outDir: String, ckpt: String,
      maxFiles: Int = 8, targetFiles: Int = 2, keepVersions: Int = 1,
      statsCols: Seq[String] = Seq.empty, rangeParts: Int = 2,
      clusterBy: Option[Column] = None, bloomCol: Option[String] = None,
      trackChanges: Boolean = false, bloomBits: Option[Int] = None,
      relayTo: Option[String] = None, relayKeys: Seq[String] = Seq.empty): Unit = {
    require(relayTo.isEmpty || (trackChanges && relayKeys.nonEmpty && keepVersions >= 2),
      "appendCompacting: relayTo requires trackChanges = true, relayKeys, " +
        "and keepVersions >= 2 (each relayed window's fromV must still be retained)")
    new java.io.File(outDir).mkdirs()
    vacuum(outDir) // sweep orphans of any crashed stage/compaction
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(batch, batchId, outDir, statsCols, rangeParts, clusterBy,
          bloomCol, trackChanges, bloomBits)
        relayTo.foreach { log =>
          changeFeedRelay(batch.sparkSession, outDir, log, relayKeys); ()
        }
        expireVersions(outDir, keepVersions)
        // outside the skip path: a crash between the two flips is
        // repaired here on replay even though the batch itself skips
        compactIfNeeded(batch.sparkSession, outDir, maxFiles, targetFiles, clusterBy)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
