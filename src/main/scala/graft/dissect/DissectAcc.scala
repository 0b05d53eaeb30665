package graft.dissect

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

import graft.core.PacketRow

/** Mutable per-packet dissection accumulator — the allocation-lean core
  * behind [[PacketDissector.dissect]].
  *
  * Why it exists: the immutable builder chained ~6 full PacketRow copies
  * plus ~20 Option boxes and 4 UTF8String encodes PER PACKET. Single-thread
  * dissection ran 1.5M pkt/s, but the 8-way job only reached ~610k
  * pkt/s/thread — the gap is young-gen allocation pressure (~1.3 KiB/packet
  * × 5M pkt/s ≈ 6 GiB/s), i.e. the dissector was GC-bound, not CPU-bound.
  * The accumulator holds unboxed sentinel fields, is reset per packet, and
  * emits the 31-column InternalRow directly with interned UTF8Strings for
  * every repeating value (protocol labels, tcp_flags, cached IPv4 text).
  *
  * NOT thread-safe: one instance per partition/thread
  * (see [[PacketDissector.acc]]).
  */
final class DissectAcc {
  import DissectAcc._

  // sentinel conventions: -1 = absent for non-negative ints; null = absent
  // for strings; protoIdx/tcpFlagsBits index the static tables
  var frameTime: Long = 0L
  var frameLen: Long = 0L
  var ethType: Int = -1
  var ipSrcStr: String = null
  var ipSrcU8: UTF8String = null
  var ipDstStr: String = null
  var ipDstU8: UTF8String = null
  var ipProto: Short = 0
  var ipTtl: Int = -1
  var ipFragOffset: Int = 0
  var ipId: Int = 0
  var ipMf: Boolean = false
  var icmpType: Int = -1
  var udpLength: Int = -1
  var udpSrcport: Int = -1
  var udpDstport: Int = -1
  var tcpFlagsBits: Int = -1
  var tcpSrcport: Int = -1
  var tcpDstport: Int = -1
  var protoIdx: Int = -1
  var dnsQryName: String = null
  var dnsQryType: Int = -1
  var ntpPrivReqcode: Int = -1
  var dhipDevice: String = null
  var errors: Int = 0

  // Staged-dissection resume state (round 13, [[DissectLevel]]): when
  // [[PacketDissector.dissectInto]] stops below Full, the continuation
  // point is parked here so [[PacketDissector.dissectResume]] picks up
  // exactly where the lower level left off — no re-parse, no duplicate
  // error counting. pendKind 0 = nothing pending, 1 = transport pending
  // (a = ip proto, b = payload start, c = payload end), 2 = L7 pending
  // (a = udp srcport, b = dstport, c = l7 start, d = payload end).
  // rawOrigLen keeps the pre-IP-overwrite frame length so a resume-time
  // parse exception can reset to the same base row dissectInto's own
  // catch produces.
  var pendKind: Int = 0
  var pendA: Int = 0
  var pendB: Int = 0
  var pendC: Int = 0
  var pendD: Int = 0
  var rawOrigLen: Long = 0L

  /** Direct-mapped IPv4 text cache (key = the 32-bit address): captures
    * repeat source/dest addresses heavily (flows), so the dotted string +
    * its UTF-8 encoding are built once per distinct address per partition,
    * not once per packet. Collisions simply overwrite (4096 slots).
    */
  private val ipKeys = new Array[Int](IpCacheSlots)
  private val ipStrs = new Array[String](IpCacheSlots)
  private val ipU8s = new Array[UTF8String](IpCacheSlots)

  def reset(): Unit = {
    frameTime = 0L; frameLen = 0L; ethType = -1
    ipSrcStr = null; ipSrcU8 = null; ipDstStr = null; ipDstU8 = null
    ipProto = 0; ipTtl = -1; ipFragOffset = 0; ipId = 0; ipMf = false
    icmpType = -1; udpLength = -1; udpSrcport = -1; udpDstport = -1
    tcpFlagsBits = -1; tcpSrcport = -1; tcpDstport = -1
    protoIdx = -1; dnsQryName = null; dnsQryType = -1
    ntpPrivReqcode = -1; dhipDevice = null; errors = 0
    pendKind = 0
  }

  /** Cached dotted-quad lookup; fills ipStrs/ipU8s on miss. Returns the
    * slot so src/dst writers can take both representations.
    */
  private def ipv4Slot(key: Int): Int = {
    val slot = (key * 0x9e3779b1) >>> (32 - IpCacheBits)
    if (ipStrs(slot) == null || ipKeys(slot) != key) {
      val s = new java.lang.StringBuilder(15)
      s.append((key >>> 24) & 0xff).append('.').append((key >>> 16) & 0xff)
        .append('.').append((key >>> 8) & 0xff).append('.').append(key & 0xff)
      val str = s.toString
      ipKeys(slot) = key
      ipStrs(slot) = str
      ipU8s(slot) = UTF8String.fromString(str)
    }
    slot
  }

  def setIpv4Src(key: Int): Unit = {
    val s = ipv4Slot(key); ipSrcStr = ipStrs(s); ipSrcU8 = ipU8s(s)
  }
  def setIpv4Dst(key: Int): Unit = {
    val s = ipv4Slot(key); ipDstStr = ipStrs(s); ipDstU8 = ipU8s(s)
  }
  def setIpv6Src(text: String): Unit = {
    ipSrcStr = text; ipSrcU8 = UTF8String.fromString(text)
  }
  def setIpv6Dst(text: String): Unit = {
    ipDstStr = text; ipDstU8 = UTF8String.fromString(text)
  }

  /** The 31-column Catalyst row ([[graft.core.PacketSchema.schema]] order).
    * A fresh GenericInternalRow per call (rows escape downstream); all
    * string columns reuse interned UTF8Strings where the value repeats.
    */
  def toInternalRow(pcapFile: UTF8String): GenericInternalRow = {
    val src = ipSrcU8
    val dst = ipDstU8
    new GenericInternalRow(Array[Any](
      frameTime,
      java.lang.Long.valueOf(frameLen),
      if (ethType < 0) null else java.lang.Integer.valueOf(ethType),
      src,
      dst,
      ipProto,
      if (ipTtl < 0) null else java.lang.Short.valueOf(ipTtl.toShort),
      ipFragOffset,
      ipId,
      ipMf,
      if (icmpType < 0) null else java.lang.Short.valueOf(icmpType.toShort),
      if (udpLength < 0) null else java.lang.Integer.valueOf(udpLength),
      if (udpSrcport < 0) null else java.lang.Integer.valueOf(udpSrcport),
      if (udpDstport < 0) null else java.lang.Integer.valueOf(udpDstport),
      if (tcpFlagsBits < 0) null else FlagU8(tcpFlagsBits),
      if (tcpSrcport < 0) null else java.lang.Integer.valueOf(tcpSrcport),
      if (tcpDstport < 0) null else java.lang.Integer.valueOf(tcpDstport),
      null, // col_info: declared, never populated
      src, // col_source (reference: src/packetstats.rs:204,248)
      dst, // col_destination
      if (protoIdx < 0) null else ProtoU8(protoIdx),
      if (dnsQryName == null) null else UTF8String.fromString(dnsQryName),
      if (dnsQryType < 0) null else java.lang.Integer.valueOf(dnsQryType),
      null, null, null, null, null, // http_*: declared, never populated
      if (ntpPrivReqcode < 0) null
      else java.lang.Short.valueOf(ntpPrivReqcode.toShort),
      if (dhipDevice == null) null else UTF8String.fromString(dhipDevice),
      pcapFile))
  }

  /** The immutable public form ([[PacketDissector.dissect]]'s return). */
  def toPacketRow: PacketRow = PacketRow(
    frameTime = frameTime,
    frameLen = Some(frameLen),
    ethType = if (ethType < 0) None else Some(ethType),
    ipSrc = Option(ipSrcStr),
    ipDst = Option(ipDstStr),
    ipProto = ipProto,
    ipTtl = if (ipTtl < 0) None else Some(ipTtl.toShort),
    ipFragOffset = ipFragOffset,
    ipId = ipId,
    ipMf = ipMf,
    icmpType = if (icmpType < 0) None else Some(icmpType.toShort),
    udpLength = if (udpLength < 0) None else Some(udpLength),
    udpSrcport = if (udpSrcport < 0) None else Some(udpSrcport),
    udpDstport = if (udpDstport < 0) None else Some(udpDstport),
    tcpFlags = if (tcpFlagsBits < 0) None else Some(FlagStr(tcpFlagsBits)),
    tcpSrcport = if (tcpSrcport < 0) None else Some(tcpSrcport),
    tcpDstport = if (tcpDstport < 0) None else Some(tcpDstport),
    colProtocol = if (protoIdx < 0) None else Some(ProtoStr(protoIdx)),
    dnsQryName = Option(dnsQryName),
    dnsQryType = if (dnsQryType < 0) None else Some(dnsQryType),
    ntpPrivReqcode =
      if (ntpPrivReqcode < 0) None else Some(ntpPrivReqcode.toShort),
    dhipDevice = Option(dhipDevice),
    errors = errors)
}

object DissectAcc {
  private val IpCacheBits = 12
  private val IpCacheSlots = 1 << IpCacheBits

  /** Protocol-label table; [[PacketDissector]] writes indices into it. */
  val ProtoStr: Array[String] =
    Array("IPv4", "IPv6", "UDP", "TCP", "ICMP", "DNS", "NTP", "DHDiscover")
  val ProtoU8: Array[UTF8String] = ProtoStr.map(UTF8String.fromString)
  val PIpv4 = 0; val PIpv6 = 1; val PUdp = 2; val PTcp = 3
  val PIcmp = 4; val PDns = 5; val PNtp = 6; val PDhip = 7

  /** All 256 tcp_flags renderings, precomputed once
    * (`"CEUAPRSF"` mask over `"........"`, reference packetstats.rs:114-142).
    */
  val FlagStr: Array[String] = Array.tabulate(256) { f =>
    val names = "CEUAPRSF" // bit 7 (CWR) .. bit 0 (FIN)
    val cs = "........".toCharArray
    var i = 0
    while (i < 8) {
      if ((f & (1 << (7 - i))) != 0) cs(i) = names.charAt(i)
      i += 1
    }
    new String(cs)
  }
  val FlagU8: Array[UTF8String] = FlagStr.map(UTF8String.fromString)
}
