package graft.pcapio

import java.io.{DataInputStream, DataOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Frame-index SIDECAR for legacy pcap files (round 14, verdict #3).
  *
  * Stride-sharded reads pay framing N times: pcap has no sync markers,
  * so each of the N shards re-frames the whole file to find its
  * `frameIdx % N` stride (~4× framing cost at the bench layout). The
  * sidecar records the byte offset of every [[Stride]]-th frame, so a
  * later sharded read can be planned as N CONTIGUOUS byte ranges — each
  * shard seeks to its range and frames only its 1/N of the bytes.
  *
  * Lifecycle: built OPPORTUNISTICALLY by shard 0 of a stride-sharded
  * scan (it frames the whole file anyway; recording an offset every 8Ki
  * frames is free) and written atomically (temp + rename) next to the
  * file under a hidden `.fidx/` dir ([[graft.sources.PcapFileEnum]]
  * never reads hidden paths as data). A read-only source dir just skips
  * the write — the stride path remains fully correct, the sidecar is
  * purely a fast path. The convert's stats pass therefore builds the
  * index that its own write pass (a second scan of the same files)
  * consumes.
  *
  * Validity: the sidecar stores the file length; a mismatch (appended /
  * rewritten file) invalidates it and the planner falls back to stride.
  * Legacy pcap only — pcapng is STATEFUL (SHB resets, per-interface
  * IDBs), so a mid-file seek would skip state; [[read]] is only
  * consulted for files whose header [[PcapFramer.legacyPreset]] parses.
  *
  * Scale: at 1000 executors the planner reads one ~10 KiB sidecar per
  * file (driver-side, same cost class as parquet footers) and range
  * shards replace stride shards — the framing work for a P-way parallel
  * read of one file drops from P full passes to 1.
  */
object FrameIndex {
  private val Magic = 0x46494458 // "FIDX"
  // v2 (round 15, ADVICE): appends a CRC32 over header + offsets — a
  // corrupted offset that stays monotone and in-range would otherwise
  // pass validation and seek a range to a non-frame boundary, where the
  // Sane framer stops quietly (silent frame loss). v1 sidecars fail the
  // version check → None → rebuilt on the next stride scan.
  private val Version = 2

  /** CRC32 over the header fields and every offset, little pieces fed
    * as longs — the integrity check [[read]] enforces and [[write]]
    * appends.
    */
  private def crcOf(idx: Index): Long = {
    val crc = new java.util.zip.CRC32
    val buf = java.nio.ByteBuffer.allocate(8 * (idx.offsets.length + 3))
    buf.putLong(idx.fileLen).putLong(idx.frameCount).putLong(idx.stride.toLong)
    idx.offsets.foreach(buf.putLong)
    crc.update(buf.array(), 0, buf.position())
    crc.getValue
  }

  /** Frames per recorded offset: 8Ki frames ≈ 1 MiB of 128 B packets —
    * fine enough that range skew is ≪1% on any file big enough to shard,
    * small enough that a 12.5M-frame file's sidecar is ~12 KiB.
    */
  val Stride = 8192

  final case class Index(
      fileLen: Long, frameCount: Long, stride: Int, offsets: Array[Long])

  def sidecarPath(file: Path): Path =
    new Path(file.getParent, ".fidx/" + file.getName + ".fidx")

  /** Read + validate the sidecar; None when absent, stale (length
    * mismatch), or malformed — callers fall back to stride sharding.
    */
  def read(file: Path, conf: Configuration): Option[Index] = try {
    val fs = file.getFileSystem(conf)
    val sp = sidecarPath(file)
    if (!fs.exists(sp)) return None
    val in = new DataInputStream(fs.open(sp))
    try {
      if (in.readInt() != Magic || in.readInt() != Version) return None
      val fileLen = in.readLong()
      val frameCount = in.readLong()
      val stride = in.readInt()
      val n = in.readInt()
      if (stride <= 0 || n <= 0 || n > frameCount / stride + 1) return None
      if (fs.getFileStatus(file).getLen != fileLen) return None // stale
      val offsets = new Array[Long](n)
      var i = 0
      var mono = PcapFramer.LegacyHeaderLen - 1L
      while (i < n) {
        offsets(i) = in.readLong()
        if (offsets(i) <= mono || offsets(i) > fileLen) return None
        mono = offsets(i)
        i += 1
      }
      val idx = Index(fileLen, frameCount, stride, offsets)
      if (in.readLong() != crcOf(idx)) return None // corrupted content
      Some(idx)
    } finally in.close()
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Atomic best-effort write (temp + rename); failures — read-only dir,
    * concurrent writer won the rename — are silently dropped, the
    * sidecar is never required for correctness.
    */
  def write(file: Path, idx: Index, conf: Configuration): Unit = try {
    val fs = file.getFileSystem(conf)
    val sp = sidecarPath(file)
    val tmp = new Path(sp.getParent,
      s".${sp.getName}.tmp.${java.util.UUID.randomUUID}")
    fs.mkdirs(sp.getParent)
    val out = new DataOutputStream(fs.create(tmp, false))
    try {
      out.writeInt(Magic); out.writeInt(Version)
      out.writeLong(idx.fileLen); out.writeLong(idx.frameCount)
      out.writeInt(idx.stride); out.writeInt(idx.offsets.length)
      idx.offsets.foreach(out.writeLong)
      out.writeLong(crcOf(idx))
    } finally out.close()
    if (!fs.rename(tmp, sp)) {
      // local FS refuses rename onto an existing destination — a STALE
      // sidecar (length mismatch) must still be replaceable; losing the
      // race to a concurrent fresh writer just drops the temp
      fs.delete(sp, false)
      if (!fs.rename(tmp, sp)) fs.delete(tmp, false)
    }
    ()
  } catch { case scala.util.control.NonFatal(_) => () }

  /** Split the file into `n` contiguous frame-aligned byte ranges of
    * ~equal frame counts. None when the index is too coarse to cut n
    * real ranges (tiny file — stride sharding is cheap there anyway).
    */
  def ranges(idx: Index, n: Int): Option[Array[(Long, Long)]] = {
    if (n <= 1 || idx.offsets.length < n) return None
    val bounds = new Array[Long](n + 1)
    bounds(0) = idx.offsets(0)
    bounds(n) = idx.fileLen
    // cut indices are STRICTLY increasing (round 15, ADVICE): a rounded
    // cut landing on its predecessor's offset would yield a zero-byte
    // range — correct but an idle shard. offsets.length >= n guarantees
    // room: clamp up to prevJ+1 and down so the remaining cuts still fit.
    var i = 1
    var prevJ = 0
    while (i < n) {
      val targetFrame = i.toDouble * idx.frameCount / n
      val j = math.min(idx.offsets.length - (n - i),
        math.max(prevJ + 1, math.round(targetFrame / idx.stride).toInt))
      bounds(i) = idx.offsets(j)
      prevJ = j
      i += 1
    }
    Some(Array.tabulate(n)(k => (bounds(k), bounds(k + 1))))
  }

  /** Incremental builder a whole-file framing loop feeds: record(off)
    * per frame, then [[result]] once EOF was reached.
    */
  final class Builder(fileLen: Long) {
    private val offs = new scala.collection.mutable.ArrayBuffer[Long](64)
    private var count = 0L
    @inline def record(frameStart: Long): Unit = {
      if (count % Stride == 0) offs += frameStart
      count += 1
    }
    def result(): Index = Index(fileLen, count, Stride, offs.toArray)
  }
}
