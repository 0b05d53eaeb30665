package graft.dissect

import graft.core.{PacketRow, RawFrame}

/** Per-packet dissection: `RawFrame => PacketRow` — a pure function, no
  * Spark dependency, used inside the source's `mapPartitions`.
  *
  * Behavior contract mirrors the reference dissector
  * (reference: src/packetstats.rs:145-392):
  *   - stage order link → net → transport → L7, with `col_protocol`
  *     last-writer-wins (IPv4/IPv6 → UDP/TCP/ICMP → DNS/NTP/DHDiscover);
  *   - IPv4 overwrites `frame_len` with `total_len` (packetstats.rs:197),
  *     IPv6 with `payload_length + 40` (packetstats.rs:245);
  *   - fragment gate: `frag_offset > 0` stops dissection — non-first
  *     fragments carry no transport columns (packetstats.rs:214-215);
  *   - first fragments (MF=1, offset=0) get their transport parsed from the
  *     IP payload (packetstats.rs:222-238);
  *   - ICMPv4 Destination-Unreachable recovers inner UDP/TCP ports and TCP
  *     flags from the quoted original packet (packetstats.rs:357-384);
  *   - ICMPv6 is ignored beyond the IPv6 columns (packetstats.rs:388);
  *   - errors never abort the row: partial rows are kept and the row's
  *     `errors` count incremented (vs. the reference's occasional panics —
  *     packetstats.rs:331,335 — which a 100 TB job must survive).
  *
  * Divergence: for raw-IP linktypes the reference would panic unwrapping the
  * absent link header (packetstats.rs:186); we dissect the IP packet with a
  * null `eth_type` instead.
  */
object PacketDissector {

  private val LinktypeEthernet = 1
  private val LinktypeRawIp = Set(12, 101, 228, 229)

  /** `"CEUAPRSF"` mask over `"........"`, e.g. ACK+SYN → `"...A..S."`
    * (reference: src/packetstats.rs:114-142).
    */
  def tcpFlagsString(flagsByte: Int): String = {
    val names = "CEUAPRSF" // bit 7 (CWR) .. bit 0 (FIN)
    val sb = new StringBuilder("........")
    var i = 0
    while (i < 8) {
      if ((flagsByte & (1 << (7 - i))) != 0) sb.setCharAt(i, names.charAt(i))
      i += 1
    }
    sb.toString
  }

  def dissect(frame: RawFrame): PacketRow = {
    val st = new State(frame.data)
    val base = PacketRow(
      frameTime = frame.timeMicros,
      frameLen = Some(frame.origLen),
      ethType = None, ipSrc = None, ipDst = None,
      ipProto = 0, ipTtl = None, ipFragOffset = 0, ipId = 0, ipMf = false)
    try {
      if (frame.linktype == LinktypeEthernet) dissectEthernet(st, base)
      else if (LinktypeRawIp.contains(frame.linktype)) dissectIp(st, base, 0)
      else base // unknown linktype: keep the frame row, no dissection
    } catch {
      case _: Exception => base.copy(errors = base.errors + 1)
    }
  }

  /** Mutable per-packet scratch (payload views are (offset,end) into data). */
  private final class State(val b: Array[Byte]) {
    def len: Int = b.length
    def u8(o: Int): Int = b(o) & 0xff
    def u16(o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def has(o: Int, n: Int): Boolean = o >= 0 && o + n <= b.length
  }

  private def dissectEthernet(st: State, base: PacketRow): PacketRow = {
    if (!st.has(0, 14)) return base.copy(errors = base.errors + 1)
    val et = st.u16(12)
    val withEt = base.copy(ethType = Some(et))
    // walk VLAN tags (802.1Q / 802.1ad) to the payload ethertype; eth_type
    // keeps the outer value, like the reference's Ethernet2Header field
    var off = 14
    var etype = et
    while ((etype == 0x8100 || etype == 0x88a8 || etype == 0x9100) &&
        st.has(off, 4)) {
      etype = st.u16(off + 2)
      off += 4
    }
    etype match {
      case 0x0800 => dissectIpv4(st, withEt, off)
      case 0x86dd => dissectIpv6(st, withEt, off)
      case _      => withEt
    }
  }

  private def dissectIp(st: State, base: PacketRow, off: Int): PacketRow = {
    if (!st.has(off, 1)) return base.copy(errors = base.errors + 1)
    (st.u8(off) >> 4) match {
      case 4 => dissectIpv4(st, base, off)
      case 6 => dissectIpv6(st, base, off)
      case _ => base.copy(errors = base.errors + 1)
    }
  }

  private def ipv4Text(st: State, o: Int): String =
    s"${st.u8(o)}.${st.u8(o + 1)}.${st.u8(o + 2)}.${st.u8(o + 3)}"

  /** RFC 5952 text form (longest zero-run → `::`, lowercase, no leading
    * zeros) — matches Rust's `Ipv6Addr` Display used by the reference
    * (packetstats.rs:246-250).
    */
  private[graft] def ipv6Text(groups: Array[Int]): String = {
    // find longest run of zero groups (length >= 2), leftmost on tie
    var bestStart = -1; var bestLen = 0
    var i = 0
    while (i < 8) {
      if (groups(i) == 0) {
        var j = i
        while (j < 8 && groups(j) == 0) j += 1
        if (j - i > bestLen) { bestStart = i; bestLen = j - i }
        i = j
      } else i += 1
    }
    if (bestLen < 2) { bestStart = -1 }
    val sb = new StringBuilder
    i = 0
    while (i < 8) {
      if (i == bestStart) {
        sb.append("::")
        i += bestLen
      } else {
        if (sb.nonEmpty && sb.charAt(sb.length - 1) != ':') sb.append(':')
        sb.append(Integer.toHexString(groups(i)))
        i += 1
      }
    }
    if (sb.isEmpty) "::" else sb.toString
  }

  private def dissectIpv4(st: State, base: PacketRow, off: Int): PacketRow = {
    if (!st.has(off, 20)) return base.copy(errors = base.errors + 1)
    val verIhl = st.u8(off)
    if ((verIhl >> 4) != 4) return base.copy(errors = base.errors + 1)
    val ihl = (verIhl & 0xf) * 4
    if (ihl < 20 || !st.has(off, ihl)) return base.copy(errors = base.errors + 1)
    val totalLen = st.u16(off + 2)
    val id = st.u16(off + 4)
    val flagsFrag = st.u16(off + 6)
    val mf = (flagsFrag & 0x2000) != 0
    val fragOffset = flagsFrag & 0x1fff // 8-byte units, raw field value
    val ttl = st.u8(off + 8)
    val proto = st.u8(off + 9)
    val src = ipv4Text(st, off + 12)
    val dst = ipv4Text(st, off + 16)
    val row = base.copy(
      colProtocol = Some("IPv4"),
      frameLen = Some(totalLen.toLong), // overwrite (packetstats.rs:197)
      ipSrc = Some(src), ipDst = Some(dst),
      ipTtl = Some(ttl.toShort), ipProto = proto.toShort,
      ipId = id, ipMf = mf, ipFragOffset = fragOffset)
    if (fragOffset > 0) return row // fragment gate (packetstats.rs:214)
    // payload bounded by total_len when plausible, else the capture slice
    val pStart = off + ihl
    val pEnd =
      if (totalLen >= ihl && off + totalLen <= st.len) off + totalLen
      else st.len
    if (pStart >= pEnd && proto != 0) row
    else dissectTransport(st, row, proto, pStart, pEnd)
  }

  private def dissectIpv6(st: State, base: PacketRow, off: Int): PacketRow = {
    if (!st.has(off, 40)) return base.copy(errors = base.errors + 1)
    if ((st.u8(off) >> 4) != 6) return base.copy(errors = base.errors + 1)
    val payloadLen = st.u16(off + 4)
    val nextHeader = st.u8(off + 6)
    val hopLimit = st.u8(off + 7)
    val srcG = Array.tabulate(8)(i => st.u16(off + 8 + i * 2))
    val dstG = Array.tabulate(8)(i => st.u16(off + 24 + i * 2))
    val row = base.copy(
      colProtocol = Some("IPv6"),
      frameLen = Some(payloadLen + 40L), // payload + header (packetstats.rs:245)
      ipSrc = Some(ipv6Text(srcG)), ipDst = Some(ipv6Text(dstG)),
      ipTtl = Some(hopLimit.toShort), ipProto = nextHeader.toShort)
    // no extension-header walk (matches reference scope, SURVEY §2.3)
    val pStart = off + 40
    val pEnd =
      if (off + 40 + payloadLen <= st.len) off + 40 + payloadLen else st.len
    dissectTransport(st, row, nextHeader, pStart, pEnd)
  }

  /** Transport + L7 dissection over `[pStart, pEnd)`; shared by the normal
    * path and the first-fragment recovery path (read_transport,
    * packetstats.rs:49-107 — one code path here since the parse is manual).
    */
  private def dissectTransport(
      st: State, row: PacketRow, proto: Int, pStart: Int, pEnd: Int): PacketRow =
    proto match {
      case 17 => // UDP
        if (pEnd - pStart < 8) row
        else {
          val sp = st.u16(pStart)
          val dp = st.u16(pStart + 2)
          val ulen = st.u16(pStart + 4)
          val r = row.copy(
            colProtocol = Some("UDP"),
            udpSrcport = Some(sp), udpDstport = Some(dp),
            udpLength = Some(ulen))
          dissectL7(st, r, sp, dp, pStart + 8, pEnd)
        }
      case 6 => // TCP — full header (data offset) must be present, like
        // TcpHeader::from_slice (packetstats.rs:88-98)
        if (pEnd - pStart < 20) row
        else {
          val doff = (st.u8(pStart + 12) >> 4) * 4
          if (doff < 20 || pEnd - pStart < doff) row
          else row.copy(
            colProtocol = Some("TCP"),
            tcpSrcport = Some(st.u16(pStart)),
            tcpDstport = Some(st.u16(pStart + 2)),
            tcpFlags = Some(tcpFlagsString(st.u8(pStart + 13))))
        }
      case 1 => // ICMPv4 — 8-byte header required (Icmpv4Slice)
        if (pEnd - pStart < 8) row
        else {
          val t = st.u8(pStart)
          val r = row.copy(colProtocol = Some("ICMP"), icmpType = Some(t.toShort))
          if (t == 3) dissectIcmpInner(st, r, pStart + 8, pEnd) else r
        }
      case 58 => row // ICMPv6: explicitly ignored (packetstats.rs:388)
      case _  => row
    }

  /** ICMP Destination-Unreachable: strict parse of the quoted original IP
    * packet, surfacing inner UDP/TCP ports (+ TCP flags). Parse failure
    * counts an error, matching PacketHeaders::from_ip_slice Err
    * (packetstats.rs:379-382).
    */
  private def dissectIcmpInner(
      st: State, row: PacketRow, qStart: Int, qEnd: Int): PacketRow = {
    def fail = row.copy(errors = row.errors + 1)
    if (qEnd - qStart < 20) return fail
    val ver = st.u8(qStart) >> 4
    if (ver == 4) {
      val ihl = (st.u8(qStart) & 0xf) * 4
      if (ihl < 20 || qEnd - qStart < ihl) return fail
      val proto = st.u8(qStart + 9)
      val t = qStart + ihl
      proto match {
        case 17 =>
          if (qEnd - t < 8) fail
          else row.copy(
            udpSrcport = Some(st.u16(t)), udpDstport = Some(st.u16(t + 2)))
        case 6 =>
          // strict TCP header parse: needs data-offset bytes; an 8-byte
          // quote fails here exactly like the reference (errors += 1)
          if (qEnd - t < 20) fail
          else {
            val doff = (st.u8(t + 12) >> 4) * 4
            if (doff < 20 || qEnd - t < doff) fail
            else row.copy(
              tcpSrcport = Some(st.u16(t)), tcpDstport = Some(st.u16(t + 2)),
              tcpFlags = Some(tcpFlagsString(st.u8(t + 13))))
          }
        case _ => row
      }
    } else if (ver == 6) {
      if (qEnd - qStart < 40) return fail
      val proto = st.u8(qStart + 6)
      val t = qStart + 40
      proto match {
        case 17 if qEnd - t >= 8 =>
          row.copy(udpSrcport = Some(st.u16(t)), udpDstport = Some(st.u16(t + 2)))
        case 6 if qEnd - t >= 20 =>
          row.copy(
            tcpSrcport = Some(st.u16(t)), tcpDstport = Some(st.u16(t + 2)),
            tcpFlags = Some(tcpFlagsString(st.u8(t + 13))))
        case 17 | 6 => fail
        case _      => row
      }
    } else fail
  }

  /** UDP L7 by port: DNS :53, NTP :123, DHDiscover src :37810 — same
    * precedence chain as packetstats.rs:268,292,316.
    */
  private def dissectL7(
      st: State, row: PacketRow, sp: Int, dp: Int, pStart: Int, pEnd: Int)
      : PacketRow =
    if (sp == 53 || dp == 53)
      Dns.dissect(st.b, pStart, pEnd, row.copy(colProtocol = Some("DNS")))
    else if (sp == 123 || dp == 123)
      Ntp.dissect(st.b, pStart, pEnd, row.copy(colProtocol = Some("NTP")))
    else if (sp == 37810)
      Dhip.dissect(st.b, pStart, pEnd, row.copy(colProtocol = Some("DHDiscover")))
    else row
}
