package graft.pcapio

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Frame-index SIDECAR for pcap files (round 14, verdict #3; pcapng
  * round 15, verdict #4).
  *
  * Stride-sharded reads pay framing N times: pcap has no sync markers,
  * so each of the N shards re-frames the whole file to find its
  * `frameIdx % N` stride (~4× framing cost at the bench layout). The
  * sidecar records the byte offset of every [[Stride]]-th frame, so a
  * later sharded read can be planned as N CONTIGUOUS byte ranges — each
  * shard seeks to its range and frames only its 1/N of the bytes.
  *
  * Containers: legacy pcap is stateless past its 24-byte header, so an
  * offset alone is resumable. pcapng is STATEFUL (SHB resets,
  * per-interface IDBs, last-IDB-wins tsresol in ReferenceCompat —
  * reference src/main.rs:177-213), so each recorded offset additionally
  * carries a [[PcapFramer.NgState]] snapshot of the section state at
  * that block boundary; a range resumes with the snapshot and parses
  * any SHB/IDB inside the range normally. Snapshots are deduplicated
  * (interface state rarely changes), so the ng sidecar stays ~20 B per
  * recorded offset.
  *
  * Lifecycle: built OPPORTUNISTICALLY by shard 0 of a stride-sharded
  * scan (it frames the whole file anyway; recording an offset every 8Ki
  * frames is free) and written atomically (temp + rename) next to the
  * file under a hidden `.fidx/` dir ([[graft.sources.PcapFileEnum]]
  * never reads hidden paths as data). A read-only source dir just skips
  * the write — the stride path remains fully correct, the sidecar is
  * purely a fast path. The convert's stats pass therefore builds the
  * index that its own write pass (a second scan of the same files)
  * consumes. The legacy pcap writer also emits an exact sidecar at
  * commit ([[graft.sources.PcapWrite]]).
  *
  * Validity: the sidecar stores the file length; a mismatch (appended /
  * rewritten file) invalidates it and the planner falls back to stride.
  * v2+ appends a CRC32 over the whole payload — a corrupted offset that
  * stays monotone and in-range would otherwise pass the structural
  * checks and seek a range to a non-block boundary, where the Sane
  * framer stops quietly (silent frame loss). Older versions fail the
  * version check → None → rebuilt on the next stride scan.
  *
  * Scale: at 1000 executors the planner reads one ~10 KiB sidecar per
  * file (driver-side, same cost class as parquet footers) and range
  * shards replace stride shards — the framing work for a P-way parallel
  * read of one file drops from P full passes to 1.
  */
object FrameIndex {
  private val Magic = 0x46494458 // "FIDX"
  private val Version = 3
  private val ContainerLegacy = 0
  private val ContainerNg = 1

  /** Frames per recorded offset: 8Ki frames ≈ 1 MiB of 128 B packets —
    * fine enough that range skew is ≪1% on any file big enough to shard,
    * small enough that a 12.5M-frame file's sidecar is ~12 KiB.
    */
  val Stride = 8192

  /** `states`/`stateIdx` are null for legacy; for pcapng,
    * `states(stateIdx(i))` is the section state at `offsets(i)`.
    */
  final case class Index(
      fileLen: Long, frameCount: Long, stride: Int, offsets: Array[Long],
      container: Int = ContainerLegacy,
      states: Array[PcapFramer.NgState] = null,
      stateIdx: Array[Int] = null) {
    def isNg: Boolean = container == ContainerNg
    /** Section state at offsets(i) (ng only). */
    def stateAt(i: Int): PcapFramer.NgState = states(stateIdx(i))
  }

  def sidecarPath(file: Path): Path =
    new Path(file.getParent, ".fidx/" + file.getName + ".fidx")

  private def encodePayload(idx: Index): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16 + 8 * idx.offsets.length)
    val out = new DataOutputStream(bos)
    out.writeByte(idx.container)
    out.writeLong(idx.fileLen); out.writeLong(idx.frameCount)
    out.writeInt(idx.stride); out.writeInt(idx.offsets.length)
    idx.offsets.foreach(out.writeLong)
    if (idx.isNg) {
      out.writeInt(idx.states.length)
      idx.states.foreach { s =>
        out.writeBoolean(s.bigEndian)
        out.writeByte(s.lastTsresol)
        out.writeInt(s.ifLinktypes.length)
        var i = 0
        while (i < s.ifLinktypes.length) {
          out.writeInt(s.ifLinktypes(i))
          out.writeByte(s.ifTsresols(i))
          i += 1
        }
      }
      idx.stateIdx.foreach(out.writeInt)
    }
    out.flush()
    bos.toByteArray
  }

  private def crc32(payload: Array[Byte]): Long = {
    val crc = new java.util.zip.CRC32
    crc.update(payload)
    crc.getValue
  }

  /** Read + validate the sidecar; None when absent, stale (length
    * mismatch), corrupted (CRC), or malformed — callers fall back to
    * stride sharding.
    */
  def read(file: Path, conf: Configuration): Option[Index] = try {
    val fs = file.getFileSystem(conf)
    val sp = sidecarPath(file)
    if (!fs.exists(sp)) return None
    val raw = {
      val st = fs.getFileStatus(sp)
      val buf = new Array[Byte](st.getLen.toInt)
      val s = fs.open(sp)
      try s.readFully(0L, buf) finally s.close()
      buf
    }
    if (raw.length < 8 + 8) return None
    val in = new DataInputStream(new java.io.ByteArrayInputStream(raw))
    if (in.readInt() != Magic || in.readInt() != Version) return None
    val payload = java.util.Arrays.copyOfRange(raw, 8, raw.length - 8)
    val crcIn = java.nio.ByteBuffer.wrap(raw, raw.length - 8, 8).getLong
    if (crc32(payload) != crcIn) return None // corrupted content
    val container = in.readByte().toInt
    if (container != ContainerLegacy && container != ContainerNg) return None
    val fileLen = in.readLong()
    val frameCount = in.readLong()
    val stride = in.readInt()
    val n = in.readInt()
    if (stride <= 0 || n <= 0 || n > frameCount / stride + 1) return None
    if (fs.getFileStatus(file).getLen != fileLen) return None // stale
    val offsets = new Array[Long](n)
    var i = 0
    var mono =
      if (container == ContainerLegacy) PcapFramer.LegacyHeaderLen - 1L
      else 0L // first EPB sits after the SHB (>0); exact floor unknown
    while (i < n) {
      offsets(i) = in.readLong()
      if (offsets(i) <= mono || offsets(i) > fileLen) return None
      mono = offsets(i)
      i += 1
    }
    if (container == ContainerLegacy)
      return Some(Index(fileLen, frameCount, stride, offsets))
    val k = in.readInt()
    if (k <= 0 || k > n) return None
    val states = new Array[PcapFramer.NgState](k)
    i = 0
    while (i < k) {
      val be = in.readBoolean()
      val lastRes = in.readByte() & 0xff
      val nIf = in.readInt()
      if (nIf < 0 || nIf > (1 << 20)) return None
      val lts = new Array[Int](nIf)
      val ress = new Array[Int](nIf)
      var j = 0
      while (j < nIf) {
        lts(j) = in.readInt()
        ress(j) = in.readByte() & 0xff
        j += 1
      }
      states(i) = PcapFramer.NgState(be, lts, ress, lastRes)
      i += 1
    }
    val stateIdx = new Array[Int](n)
    i = 0
    while (i < n) {
      stateIdx(i) = in.readInt()
      if (stateIdx(i) < 0 || stateIdx(i) >= k) return None
      i += 1
    }
    Some(Index(fileLen, frameCount, stride, offsets, ContainerNg,
      states, stateIdx))
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
      val payload = encodePayload(idx)
      out.writeInt(Magic); out.writeInt(Version)
      out.write(payload)
      out.writeLong(crc32(payload))
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
    * Range k starts at `offsets(cuts(k))`; for pcapng the matching
    * section state is `stateAt(cuts(k))`.
    */
  def cutIndices(idx: Index, n: Int): Option[Array[Int]] = {
    if (n <= 1 || idx.offsets.length < n) return None
    val cuts = new Array[Int](n)
    cuts(0) = 0
    // cut indices are STRICTLY increasing (round 15, ADVICE): a rounded
    // cut landing on its predecessor's offset would yield a zero-byte
    // range — correct but an idle shard. offsets.length >= n guarantees
    // room: clamp up to prevJ+1 and down so the remaining cuts still fit.
    var i = 1
    while (i < n) {
      val targetFrame = i.toDouble * idx.frameCount / n
      cuts(i) = math.min(idx.offsets.length - (n - i),
        math.max(cuts(i - 1) + 1,
          math.round(targetFrame / idx.stride).toInt))
      i += 1
    }
    Some(cuts)
  }

  /** [[cutIndices]] materialized as byte ranges (start, end). */
  def ranges(idx: Index, n: Int): Option[Array[(Long, Long)]] =
    cutIndices(idx, n).map { cuts =>
      Array.tabulate(n) { k =>
        val end = if (k == n - 1) idx.fileLen else idx.offsets(cuts(k + 1))
        (idx.offsets(cuts(k)), end)
      }
    }

  /** Incremental builder a whole-file framing loop feeds: record(off)
    * per frame — with the section-state snapshot for pcapng — then
    * [[result]] once EOF was reached. Consecutive identical ng states
    * dedupe to one stored snapshot.
    */
  final class Builder(val fileLen: Long, ng: Boolean = false) {
    private val offs = new scala.collection.mutable.ArrayBuffer[Long](64)
    private val states =
      new scala.collection.mutable.ArrayBuffer[PcapFramer.NgState](4)
    private val stateIdx = new scala.collection.mutable.ArrayBuffer[Int](64)
    private var count = 0L

    private def sameState(a: PcapFramer.NgState, b: PcapFramer.NgState): Boolean =
      a.bigEndian == b.bigEndian && a.lastTsresol == b.lastTsresol &&
        java.util.Arrays.equals(a.ifLinktypes, b.ifLinktypes) &&
        java.util.Arrays.equals(a.ifTsresols, b.ifTsresols)

    @inline def record(frameStart: Long): Unit = {
      require(!ng, "ng builder needs the state snapshot")
      if (count % Stride == 0) offs += frameStart
      count += 1
    }

    /** pcapng record: `state` is only evaluated on stride boundaries. */
    @inline def recordNg(frameStart: Long, state: => PcapFramer.NgState): Unit = {
      if (count % Stride == 0) {
        offs += frameStart
        val s = state
        if (states.isEmpty || !sameState(states.last, s)) states += s
        stateIdx += states.length - 1
      }
      count += 1
    }

    def result(): Index = result(fileLen)

    /** For writers, whose final file length exists only at commit (the
      * constructor's `fileLen` is then a placeholder 0).
      */
    def result(finalLen: Long): Index =
      if (ng)
        Index(finalLen, count, Stride, offs.toArray, ContainerNg,
          states.toArray, stateIdx.toArray)
      else Index(finalLen, count, Stride, offs.toArray)

    /** Recorded offsets so far (writers skip the sidecar below 2 — it
      * cannot cut more than one range).
      */
    def offsetCount: Int = offs.length
  }
}
