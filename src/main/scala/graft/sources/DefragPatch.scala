package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.DataFrame

/** Columnar broadcast-patch for the defrag convert (round 13, verdict
  * #4): the measured bound showed the row-shaped broadcast join +
  * RowToColumnarExec rebatch costing ~50% of the defrag-convert write
  * (`tools.BenchRebatchBound`, interleaved: join 17.3 s vs no-join
  * 8.4–9.8 s median at 100M packets) — so on the broadcast branch the
  * enrichment moves INTO the scan: the spilled first-fragment aggregate
  * (bounded by distinct datagram keys — the same rows a broadcast hash
  * join would ship) is collected into one compact map, broadcast once,
  * and each reader patches its dissection accumulator before the column
  * vectors are filled. The convert plan is then scan → vector write,
  * columnar end to end: no join node, no ColumnarToRow, no rebatch.
  *
  * Semantics are exactly [[graft.spark.Defrag.defragWith]]'s coalesce:
  * each of the six patched columns takes the first fragment's value
  * ONLY where the row's own value is NULL, and only for rows whose
  * (ip_src, ip_dst, ip_proto=17, ip_id) key has a first fragment
  * (reference src/main.rs:292-296). NULL-keyed rows never match (the
  * join's NULL-key semantics); col_protocol is never effectively
  * patched on IP rows (their own "IPv4"/"IPv6" is non-NULL — the same
  * outcome the reference's coalesce produces).
  *
  * Two hot-path lessons are baked into the layout (both measured by
  * `tools.BenchRebatchBound`):
  *   - LOOKUP: a concatenated string key cost ~100 ns/row in per-probe
  *     allocation + hashing (~7 s over 100M packets). The index is an
  *     ip_id-indexed array (64Ki slots — most rows bail on one null
  *     check) over HashMaps keyed by the ADDRESS STRINGS themselves:
  *     the accumulator interns those per distinct address and String
  *     caches its hashCode, so a probe is two cached-hash gets with
  *     zero allocation.
  *   - TRANSPORT: java-serializing the 64Ki-nested-map graph cost
  *     ~3 s/broadcast. The broadcast form is dictionary-encoded
  *     parallel primitive arrays; the probe index is a `@transient
  *     lazy val` rebuilt once per executor JVM from the arrays
  *     (~100 ms at 1M keys), never serialized.
  *
  * The driver-side collect mirrors what a broadcast hash join does
  * internally (Spark collects the build side to the driver before
  * broadcasting); the adaptive guard's ceiling bounds it identically.
  * The shuffle branch (wide key spaces) keeps the join path.
  */
object DefragPatch {

  /** Dictionary-encoded first-fragment patch table: entry i patches key
    * (strings(srcIdx(i)), strings(dstIdx(i)), ids(i)). Value sentinel
    * -1 = that column was NULL on the first fragment (patch leaves the
    * row's NULL in place, like coalesce(NULL, NULL)).
    */
  final class PatchMap(
      val ids: Array[Int],
      val srcIdx: Array[Int],
      val dstIdx: Array[Int],
      val strings: Array[String],
      val udpSrcport: Array[Int],
      val udpDstport: Array[Int],
      val ntpPrivReqcode: Array[Int],
      val dnsQryType: Array[Int],
      val dnsNameIdx: Array[Int],
      val protoIdx: Array[Int]) extends Serializable {

    /** byId(ip_id) → src → dst → entry index; null slot = no fragmented
      * datagram carries that id. Rebuilt lazily per JVM — cheap array
      * walk, no Row decode, nothing serialized.
      */
    @transient lazy val byId: Array[java.util.HashMap[String,
        java.util.HashMap[String, Integer]]] = {
      val a = new Array[java.util.HashMap[String,
        java.util.HashMap[String, Integer]]](1 << 16)
      var i = 0
      while (i < ids.length) {
        val id = ids(i) & 0xffff
        var m1 = a(id)
        if (m1 == null) {
          m1 = new java.util.HashMap[String, java.util.HashMap[String, Integer]](4)
          a(id) = m1
        }
        val src = strings(srcIdx(i))
        var m2 = m1.get(src)
        if (m2 == null) {
          m2 = new java.util.HashMap[String, Integer](4)
          m1.put(src, m2)
        }
        m2.put(strings(dstIdx(i)), Integer.valueOf(i))
        i += 1
      }
      a
    }
  }

  /** Build the patch table on the driver from a frame shaped like
    * [[graft.spark.Defrag.firstFragments]]' output (join keys + the six
    * patched columns). Caller enforces the broadcast ceiling first.
    */
  def build(ff: DataFrame): PatchMap = {
    val protoIdxOf = graft.dissect.DissectAcc.ProtoStr.zipWithIndex.toMap
    val rows = ff.select("ip_src", "ip_dst", "ip_id", "udp_srcport",
        "udp_dstport", "ntp_priv_reqcode", "dns_qry_type", "dns_qry_name",
        "col_protocol")
      // groupBy keys are non-null by construction (ip_proto=17 rows
      // always carry parsed addresses) — but a NULL key could never
      // match a row (join semantics), so drop any defensively
      .collect().filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    val n = rows.length
    val dict = new java.util.HashMap[String, Integer]()
    val dictList = new scala.collection.mutable.ArrayBuffer[String]()
    def intern(s: String): Int = {
      val got = dict.get(s)
      if (got != null) got.intValue()
      else {
        val idx = dictList.length
        dict.put(s, Integer.valueOf(idx))
        dictList += s
        idx
      }
    }
    val ids = new Array[Int](n)
    val srcIdx = new Array[Int](n)
    val dstIdx = new Array[Int](n)
    val udpSrc = new Array[Int](n)
    val udpDst = new Array[Int](n)
    val ntp = new Array[Int](n)
    val dnsType = new Array[Int](n)
    val dnsName = new Array[Int](n)
    val proto = new Array[Int](n)
    var i = 0
    while (i < n) {
      val r = rows(i)
      ids(i) = r.getInt(2) & 0xffff
      srcIdx(i) = intern(r.getString(0))
      dstIdx(i) = intern(r.getString(1))
      udpSrc(i) = if (r.isNullAt(3)) -1 else r.getInt(3)
      udpDst(i) = if (r.isNullAt(4)) -1 else r.getInt(4)
      ntp(i) = if (r.isNullAt(5)) -1 else r.getShort(5).toInt
      dnsType(i) = if (r.isNullAt(6)) -1 else r.getInt(6)
      dnsName(i) = if (r.isNullAt(7)) -1 else intern(r.getString(7))
      proto(i) = if (r.isNullAt(8)) -1
        else protoIdxOf.getOrElse(r.getString(8), -1)
      i += 1
    }
    new PatchMap(ids, srcIdx, dstIdx, dictList.toArray, udpSrc, udpDst,
      ntp, dnsType, dnsName, proto)
  }

  /** Per-reader probe memo (round 14, verdict #4): fragments of one
    * datagram are ADJACENT in a capture (and still near-adjacent within
    * a stride shard), so consecutive probing rows usually carry the
    * same (ip_id, src, dst) key — the memo short-circuits both
    * string-map gets with three compares. Keyed on REFERENCE equality
    * of the address strings (the accumulator interns them per distinct
    * address); a missed intern only costs a re-probe, never a wrong
    * entry. `entry = -1` memoizes "this key has no patch" too — the
    * common case on collided ids.
    */
  final class Memo {
    var id: Int = -2 // never matches a real 16-bit id
    var src: String = null
    var dst: String = null
    var entry: Int = -1
  }

  /** Apply one row's patch to the dissection accumulator (post-dissect,
    * pre-vector-write): coalesce semantics per column. Cheap bail-outs
    * first — rows whose ip_id maps to no fragmented datagram pay one
    * array read; non-UDP rows and rows with every patched column
    * populated never probe at all. `memo` may be null (memo-less probe;
    * MemoProps pins memoized ≡ null-memo over fuzzed row sequences).
    */
  @inline def apply(m: PatchMap, a: graft.dissect.DissectAcc,
      memo: Memo = null): Unit = {
    if (a.ipProto == 17 && a.ipSrcStr != null && a.ipDstStr != null &&
        (a.udpSrcport < 0 || a.udpDstport < 0 || a.ntpPrivReqcode < 0 ||
          a.dnsQryType < 0 || a.dnsQryName == null || a.protoIdx < 0)) {
      var i = -1
      if (memo != null && a.ipId == memo.id && (a.ipSrcStr eq memo.src) &&
          (a.ipDstStr eq memo.dst)) {
        i = memo.entry
      } else {
        val m1 = m.byId(a.ipId & 0xffff)
        if (m1 != null) {
          val m2 = m1.get(a.ipSrcStr)
          if (m2 != null) {
            val e = m2.get(a.ipDstStr)
            if (e != null) i = e.intValue()
          }
        }
        if (memo != null) {
          memo.id = a.ipId; memo.src = a.ipSrcStr; memo.dst = a.ipDstStr
          memo.entry = i
        }
      }
      if (i >= 0) {
        if (a.udpSrcport < 0 && m.udpSrcport(i) >= 0)
          a.udpSrcport = m.udpSrcport(i)
        if (a.udpDstport < 0 && m.udpDstport(i) >= 0)
          a.udpDstport = m.udpDstport(i)
        if (a.ntpPrivReqcode < 0 && m.ntpPrivReqcode(i) >= 0)
          a.ntpPrivReqcode = m.ntpPrivReqcode(i)
        if (a.dnsQryType < 0 && m.dnsQryType(i) >= 0)
          a.dnsQryType = m.dnsQryType(i)
        if (a.dnsQryName == null && m.dnsNameIdx(i) >= 0)
          a.dnsQryName = m.strings(m.dnsNameIdx(i))
        if (a.protoIdx < 0 && m.protoIdx(i) >= 0)
          a.protoIdx = m.protoIdx(i)
      }
    }
  }

  // DRIVER-side registry, like PcapSource's metrics registry: the scan
  // option carries only a key; createReaderFactory (driver) resolves it
  // to the broadcast, which then rides the task closures.
  private val registry = new ConcurrentHashMap[String, Broadcast[PatchMap]]()

  def register(k: String, bc: Broadcast[PatchMap]): Unit = {
    registry.put(k, bc); ()
  }
  def unregister(k: String): Unit = { registry.remove(k); () }
  def forKey(k: String): Option[Broadcast[PatchMap]] =
    Option(registry.get(k))
}
