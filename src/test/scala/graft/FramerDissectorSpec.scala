package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.RawFrame
import graft.dissect.{Dns, PacketDissector}
import graft.pcapio.PcapFramer
import PcapFixtures._

class FramerDissectorSpec extends AnyFunSuite {

  private def dissectOne(pkt: Array[Byte], linktype: Int = 1) =
    PacketDissector.dissect(RawFrame(1000000L, pkt.length.toLong, pkt, linktype))

  // ---- framer ----------------------------------------------------------------

  test("legacy pcap framing: timestamps are sec*1e6+usec, origlen kept") {
    val p1 = ethernet(0x0800, ipv4("1.2.3.4", "5.6.7.8", 17, udp(1111, 2222, Array[Byte](1))))
    val bytes = legacyPcap(Seq((1234567890123456L, 9999, p1), (42L, -1, p1)))
    val fs = PcapFramer.frames(bytes).toList
    assert(fs.map(_.timeMicros) == List(1234567890123456L, 42L))
    assert(fs.head.origLen == 9999L)
    assert(fs(1).origLen == p1.length.toLong)
    assert(fs.forall(_.linktype == 1))
  }

  test("legacy pcap big-endian is handled") {
    val p = ethernet(0x0800, ipv4("9.9.9.9", "8.8.8.8", 6, tcp(80, 1024, 0x12)))
    val fs = PcapFramer.frames(legacyPcap(Seq((7L, -1, p)), bigEndian = true)).toList
    assert(fs.size == 1 && fs.head.timeMicros == 7L)
  }

  test("truncated tail keeps complete frames (main.rs:222-230 contract)") {
    val p = ethernet(0x0800, ipv4("1.1.1.1", "2.2.2.2", 17, udp(1, 2, Array.empty)))
    val whole = legacyPcap(Seq((1L, -1, p), (2L, -1, p)))
    val truncated = whole.dropRight(5)
    assert(PcapFramer.frames(truncated).size == 1)
  }

  test("pcapng EPB: tsresol scaling, per-interface linktype in Sane mode") {
    val p = ethernet(0x0800, ipv4("1.2.3.4", "5.6.7.8", 17, udp(1, 2, Array.empty)))
    // if0: µs resolution; if1: ns resolution, raw-IP linktype
    val ip = ipv4("4.3.2.1", "8.7.6.5", 17, udp(3, 4, Array.empty))
    val bytes = pcapng(
      interfaces = Seq((1, 6), (101, 9)),
      epbs = Seq((0, 5000000L, p.length, p), (1, 5000000000L, ip.length, ip)))
    val fs = PcapFramer.frames(bytes).toList
    assert(fs.map(_.timeMicros) == List(5000000L, 5000000L))
    assert(fs.map(_.linktype) == List(1, 101))
  }

  test("pcapng ReferenceCompat: frame_len = caplen, stale legacy linktype") {
    val p = ethernet(0x0800, ipv4("1.2.3.4", "5.6.7.8", 17, udp(1, 2, Array.empty)))
    val bytes = pcapng(Seq((101, 6)), Seq((0, 1L, 12345, p)))
    val f = PcapFramer.frames(bytes, PcapFramer.ReferenceCompat).toList.head
    assert(f.origLen == p.length.toLong) // caplen, not the 12345 origlen
    assert(f.linktype == 1)              // stale global, not if0's 101
  }

  test("pcapng SimplePacket: frame_time 0, first interface's linktype") {
    val pkt = ethernet(0x0800, ipv4("1.2.3.4", "5.6.7.8", 17, udp(7, 8, Array.empty)))
    // hand-build an SPB after the standard SHB+IDB
    val pre = pcapng(Seq((1, 6)), Nil)
    val body = java.nio.ByteBuffer.allocate(4 + pkt.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    body.putInt(pkt.length).put(pkt)
    val pad = (4 - (body.capacity() % 4)) % 4
    val total = 12 + body.capacity() + pad
    val spb = java.nio.ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    spb.putInt(3).putInt(total).put(body.array())
    spb.position(total - 4); spb.putInt(total)
    val fs = PcapFramer.frames(pre ++ spb.array()).toList
    assert(fs.size == 1)
    assert(fs.head.timeMicros == 0L && fs.head.linktype == 1)
  }

  test("unknown pcapng block types are skipped, frames around them kept") {
    val pkt = ethernet(0x0800, ipv4("1.2.3.4", "5.6.7.8", 17, udp(7, 8, Array.empty)))
    val pre = pcapng(Seq((1, 6)), Seq((0, 1L, pkt.length, pkt)))
    // a name-resolution block (type 4) with junk body, then another EPB
    val nrb = java.nio.ByteBuffer.allocate(20).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    nrb.putInt(4).putInt(20).putLong(0x5a5a5a5aL).putInt(20)
    val tail = pcapng(Seq((1, 6)), Seq((0, 2L, pkt.length, pkt)))
    // tail repeats SHB+IDB (new section) — acceptable; 2 frames total
    val fs = PcapFramer.frames(pre ++ nrb.array() ++ tail).toList
    assert(fs.size == 2)
  }

  test("ReferenceCompat uses last-IDB tsresol globally (main.rs:182 quirk)") {
    val pkt = ethernet(0x0800, ipv4("1.2.3.4", "5.6.7.8", 17, udp(7, 8, Array.empty)))
    // if0 µs-resolution, if1 ms-resolution; packet on if0 with ts=1000 units
    val bytes = pcapng(Seq((1, 6), (1, 3)), Seq((0, 1000L, pkt.length, pkt)))
    val sane = PcapFramer.frames(bytes).toList.head
    val compat = PcapFramer.frames(bytes, PcapFramer.ReferenceCompat).toList.head
    assert(sane.timeMicros == 1000L)      // if0's µs resolution honored
    assert(compat.timeMicros == 1000000L) // last IDB (ms) wins globally
  }

  test("power-of-2 tsresol: Sane scales 2^-bits, ReferenceCompat stays decimal-only") {
    // The documented divergence (SURVEY §9 #1): the reference's scaling
    // has no power-of-2 branch — `10^(9-r)` underflows for an MSB-set
    // tsresol (main.rs:186-190), so a faithful ReferenceCompat applies
    // the same decimal-only formula to the raw byte (→ 0 µs under
    // saturating arithmetic), while Sane honors the pcapng spec:
    // tsresol 0x83 = 2^-3 s units, so ts=16 → 2 s.
    val pkt = ethernet(0x0800, ipv4("1.2.3.4", "5.6.7.8", 17, udp(7, 8, Array.empty)))
    val bytes = pcapng(Seq((1, 0x83)), Seq((0, 16L, pkt.length, pkt)))
    val sane = PcapFramer.frames(bytes).toList.head
    val compat = PcapFramer.frames(bytes, PcapFramer.ReferenceCompat).toList.head
    assert(sane.timeMicros == 2000000L)
    assert(compat.timeMicros == 0L)
  }

  // ---- dissector -------------------------------------------------------------

  test("IPv4/UDP/DNS chain: the DDoS hot path") {
    val pkt = ethernet(0x0800,
      ipv4("10.0.0.1", "10.0.0.2", 17, udp(5353, 53, dnsQuery("www.example.com", 1)),
        ttl = 61, id = 777))
    val r = dissectOne(pkt)
    assert(r.ethType.contains(0x0800))
    assert(r.ipSrc.contains("10.0.0.1") && r.ipDst.contains("10.0.0.2"))
    assert(r.ipProto == 17 && r.ipTtl.contains(61.toShort) && r.ipId == 777)
    assert(r.udpSrcport.contains(5353) && r.udpDstport.contains(53))
    assert(r.colProtocol.contains("DNS"))
    assert(r.dnsQryName.contains("www.example.com")) // no trailing dot (domain crate Display)
    assert(r.dnsQryType.contains(1))
    assert(r.errors == 0)
  }

  test("DNS root query renders <Root> (packetstats.rs:274-278)") {
    val pkt = ethernet(0x0800, ipv4("1.1.1.1", "2.2.2.2", 17, udp(9, 53, dnsQuery("", 255))))
    val r = dissectOne(pkt)
    assert(r.dnsQryName.contains("<Root>") && r.dnsQryType.contains(255))
  }

  test("DNS compression pointer is followed") {
    // header + name at 12 = ptr to 18; at 18: 3www 0
    val msg = Array[Byte](0, 1, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0,
      0xc0.toByte, 18, 0, 1, 0, 1, // question: ptr, qtype=1, qclass=1
      3, 'w', 'w', 'w', 0)
    val pkt = ethernet(0x0800, ipv4("1.1.1.1", "2.2.2.2", 17, udp(9, 53, msg)))
    val r = dissectOne(pkt)
    assert(r.dnsQryName.contains("www"))
  }

  test("TCP flags string matches the CEUAPRSF truth table (packetstats.rs:114-142)") {
    assert(PacketDissector.tcpFlagsString(0x12) == "...A..S.")
    assert(PacketDissector.tcpFlagsString(0x01) == ".......F")
    assert(PacketDissector.tcpFlagsString(0xff) == "CEUAPRSF")
    assert(PacketDissector.tcpFlagsString(0x00) == "........")
    val pkt = ethernet(0x0800, ipv4("1.1.1.1", "2.2.2.2", 6, tcp(443, 55555, 0x18)))
    val r = dissectOne(pkt)
    assert(r.tcpFlags.contains("...AP...") && r.tcpSrcport.contains(443))
    assert(r.colProtocol.contains("TCP"))
  }

  test("fragment gate: non-first fragments carry no transport columns") {
    val frag = ethernet(0x0800,
      ipv4("1.1.1.1", "2.2.2.2", 17, Array.fill[Byte](16)(0), id = 9, mf = true, fragOffset = 185))
    val r = dissectOne(frag)
    assert(r.ipFragOffset == 185 && r.ipMf)
    assert(r.udpSrcport.isEmpty && r.colProtocol.contains("IPv4"))
  }

  test("first fragment (mf=1, off=0) still gets transport + L7 parsed") {
    val ff = ethernet(0x0800,
      ipv4("1.1.1.1", "2.2.2.2", 17, udp(123, 123, ntpPrivate(42)), id = 9, mf = true))
    val r = dissectOne(ff)
    assert(r.udpSrcport.contains(123) && r.ntpPrivReqcode.contains(42.toShort))
    assert(r.colProtocol.contains("NTP"))
  }

  test("NTP: v2 private mode sets reqcode; well-formed v4 sets only the label") {
    val priv = dissectOne(ethernet(0x0800,
      ipv4("1.1.1.1", "2.2.2.2", 17, udp(9999, 123, ntpPrivate(20)))))
    assert(priv.ntpPrivReqcode.contains(20.toShort) && priv.colProtocol.contains("NTP"))
    val v4 = dissectOne(ethernet(0x0800,
      ipv4("1.1.1.1", "2.2.2.2", 17, udp(123, 9999, ntpV4Client))))
    assert(v4.ntpPrivReqcode.isEmpty && v4.colProtocol.contains("NTP") && v4.errors == 0)
  }

  test("DHIP discovery: DeviceType kept with JSON quotes (packetstats.rs:336)") {
    val pkt = ethernet(0x0800,
      ipv4("1.1.1.1", "2.2.2.2", 17, udp(37810, 5050, dhipDiscover("IPC"))))
    val r = dissectOne(pkt)
    assert(r.dhipDevice.contains("\"IPC\""))
    assert(r.colProtocol.contains("DHDiscover"))
  }

  test("ICMP dest-unreachable recovers inner UDP ports (packetstats.rs:357-384)") {
    val inner = ipv4("10.0.0.2", "10.0.0.1", 17, udp(53, 33333, Array.empty))
    val pkt = ethernet(0x0800,
      ipv4("10.0.0.9", "10.0.0.1", 1, icmpDestUnreachable(inner)))
    val r = dissectOne(pkt)
    assert(r.icmpType.contains(3.toShort))
    assert(r.udpSrcport.contains(53) && r.udpDstport.contains(33333))
    assert(r.colProtocol.contains("ICMP"))
  }

  test("IPv6: RFC 5952 compression + hop limit (packetstats.rs:242-253)") {
    val g = Array(0x2001, 0xdb8, 0, 0, 0, 0, 0, 1)
    val dst = Array(0xfe80, 0, 0, 0, 0, 0, 0, 0x1234)
    val pkt = ethernet(0x86dd, ipv6(g, dst, 17, udp(1, 2, Array.empty), hopLimit = 7))
    val r = dissectOne(pkt)
    assert(r.ipSrc.contains("2001:db8::1"))
    assert(r.ipDst.contains("fe80::1234"))
    assert(r.ipTtl.contains(7.toShort) && r.ipProto == 17)
    assert(r.colProtocol.contains("UDP"))
  }

  test("IPv6 extension-header chain: Sane records the transport proto, compat parses transport but keeps the fixed next_header") {
    // round 13 (ADVICE): the reference's etherparse LaxPacketHeaders
    // walks extension headers internally (packetstats.rs:148,190), so
    // for hop-by-hop → routing → UDP/DNS the reference emits REAL
    // transport columns while ip_proto stays the fixed header's
    // next_header (packetstats.rs:252 reads ip.next_header pre-walk).
    // Sane additionally records the walked-to proto in ip_proto.
    def ext(hdrType: Int, next: Int, extLen8: Int = 0): Array[Byte] = {
      val b = Array.fill[Byte]((extLen8 + 1) * 8)(0)
      b(0) = next.toByte; b(1) = extLen8.toByte
      b // hdrType is the PREVIOUS header's next value, kept for clarity
    }
    val g = Array(0x2001, 0xdb8, 0, 0, 0, 0, 0, 1)
    val dst = Array(0xfe80, 0, 0, 0, 0, 0, 0, 2)
    val payload = ext(0, next = 43) ++ ext(43, next = 17, extLen8 = 1) ++
      udp(53, 41000, dnsQuery("v6.example.org", 1))
    val pkt = ethernet(0x86dd, ipv6(g, dst, 0, payload)) // next_header = hop-by-hop
    val sane = dissectOne(pkt)
    assert(sane.ipProto == 17 && sane.udpSrcport.contains(53))
    assert(sane.colProtocol.contains("DNS"))
    assert(sane.dnsQryName.contains("v6.example.org"))
    assert(sane.errors == 0)
    val compat = PacketDissector.dissect(
      graft.core.RawFrame(1000000L, pkt.length.toLong, pkt, 1), walkV6 = false)
    assert(compat.ipProto == 0) // the FIXED header's next_header
    assert(compat.udpSrcport.contains(53) && compat.udpDstport.contains(41000))
    assert(compat.colProtocol.contains("DNS"))
    assert(compat.dnsQryName.contains("v6.example.org"))
    assert(compat.errors == 0)
  }

  test("IPv6 walk: exactly 8 extension headers before the transport still parses (round-13 ADVICE cap fix)") {
    val g = Array(0x2001, 0xdb8, 0, 0, 0, 0, 0, 3)
    val dst = Array(0x2001, 0xdb8, 0, 0, 0, 0, 0, 4)
    // 7 hop-by-hop-shaped headers chaining to each other, the 8th names
    // UDP; the cap lands exactly on the transport — must classify, not
    // error
    val chain = (1 to 7).map(_ => Array[Byte](0, 0, 0, 0, 0, 0, 0, 0))
      .reduce(_ ++ _) ++ Array[Byte](17, 0, 0, 0, 0, 0, 0, 0)
    val pkt = ethernet(0x86dd, ipv6(g, dst, 0, chain ++ udp(5, 6, Array.empty)))
    val sane = dissectOne(pkt)
    assert(sane.errors == 0 && sane.ipProto == 17)
    assert(sane.udpSrcport.contains(5) && sane.colProtocol.contains("UDP"))
    // compat (round 14): etherparse's lax walk stops on the SECOND
    // hop-by-hop (HopByHopNotAtStart) — no transport, quietly
    val compat = PacketDissector.dissect(
      graft.core.RawFrame(1L, pkt.length.toLong, pkt, 1), walkV6 = false)
    assert(compat.errors == 0 && compat.ipProto == 0)
    assert(compat.udpSrcport.isEmpty && compat.colProtocol.contains("IPv6"))
  }

  test("IPv6 compat stop rules mirror etherparse's extension slots (round-14 ADVICE)") {
    import graft.core.RawFrame
    val g = Array(0x2001, 0xdb8, 0, 0, 0, 0, 0, 0xa)
    val dst = Array(0x2001, 0xdb8, 0, 0, 0, 0, 0, 0xb)
    def ext(next: Int): Array[Byte] = Array[Byte](next.toByte, 0, 0, 0, 0, 0, 0, 0)
    def compatOf(nh: Int, payload: Array[Byte]) = PacketDissector.dissect(
      RawFrame(1L, 0L, ethernet(0x86dd, ipv6(g, dst, nh, payload)), 1),
      walkV6 = false)
    def saneOf(nh: Int, payload: Array[Byte]) = PacketDissector.dissect(
      RawFrame(1L, 0L, ethernet(0x86dd, ipv6(g, dst, nh, payload)), 1),
      walkV6 = true)
    val u = udp(9, 10, Array.empty)
    // hop-by-hop NOT at start (dest-opts → hbh → udp): compat stops
    // quietly with no transport; Sane (our column semantics) walks it
    val hbhLate = compatOf(60, ext(0) ++ ext(17) ++ u)
    assert(hbhLate.udpSrcport.isEmpty && hbhLate.errors == 0 &&
      hbhLate.ipProto == 60 && hbhLate.colProtocol.contains("IPv6"))
    assert(saneOf(60, ext(0) ++ ext(17) ++ u).udpSrcport.contains(9))
    // repeated destination-options with NO routing between: stop
    val destTwice = compatOf(60, ext(60) ++ ext(17) ++ u)
    assert(destTwice.udpSrcport.isEmpty && destTwice.errors == 0)
    // destination-options twice WITH routing between: legal (the
    // final_destination_options slot) — walks to the transport
    val destRoutedDest = compatOf(60, ext(43) ++ ext(60) ++ ext(17) ++ u)
    assert(destRoutedDest.udpSrcport.contains(9) &&
      destRoutedDest.ipProto == 60) // fixed header's next_header kept
    // repeated routing: stop
    val routingTwice = compatOf(43, ext(43) ++ ext(17) ++ u)
    assert(routingTwice.udpSrcport.isEmpty && routingTwice.errors == 0)
    // repeated AH: stop (AH length units differ — build explicitly)
    def ah(next: Int): Array[Byte] = Array[Byte](next.toByte, 1, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0) // payload len 1 → (1+2)*4 = 12 bytes
    val ahTwice = compatOf(51, ah(51) ++ ah(17) ++ u)
    assert(ahTwice.udpSrcport.isEmpty && ahTwice.errors == 0)
    // single AH still walks
    assert(compatOf(51, ah(17) ++ u).udpSrcport.contains(9))
  }

  test("IPv6 compat fragment semantics: fragmenting stops quietly, atomic walks through (etherparse is_fragmenting_payload)") {
    val g = Array(0x2001, 0xdb8, 0, 0, 0, 0, 0, 7)
    val dst = Array(0x2001, 0xdb8, 0, 0, 0, 0, 0, 8)
    def fragHdr(next: Int, off8: Int, mf: Boolean, id: Long): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.BIG_ENDIAN)
      b.put(next.toByte).put(0.toByte)
        .putShort((((off8 << 3) | (if (mf) 1 else 0)) & 0xffff).toShort)
        .putInt(id.toInt)
      b.array()
    }
    def compatOf(pkt: Array[Byte]) = PacketDissector.dissect(
      graft.core.RawFrame(1L, pkt.length.toLong, pkt, 1), walkV6 = false)
    // FIRST fragment (offset 0, MF=1): fragmenting → etherparse stops,
    // and the reference's v4-only read_transport recovery has no v6
    // twin — no transport columns, no fragment columns, no error
    val first = compatOf(ethernet(0x86dd, ipv6(g, dst, 44,
      fragHdr(17, 0, mf = true, id = 7L) ++ udp(9, 10, Array.empty))))
    assert(first.ipProto == 44 && first.udpSrcport.isEmpty)
    assert(first.ipFragOffset == 0 && !first.ipMf && first.ipId == 0)
    assert(first.errors == 0 && first.colProtocol.contains("IPv6"))
    // ATOMIC fragment (offset 0, MF=0): not fragmenting → etherparse
    // walks through to the transport
    val atomic = compatOf(ethernet(0x86dd, ipv6(g, dst, 44,
      fragHdr(17, 0, mf = false, id = 7L) ++ udp(9, 10, Array.empty))))
    assert(atomic.ipProto == 44) // fixed header's next_header
    assert(atomic.udpSrcport.contains(9) && atomic.colProtocol.contains("UDP"))
    assert(atomic.ipFragOffset == 0 && !atomic.ipMf && atomic.ipId == 0)
    // compat truncated chain: lax stop, no transport, NO error
    val trunc = compatOf(ethernet(0x86dd, ipv6(g, dst, 0,
      Array[Byte](17, 2, 0, 0, 0, 0, 0, 0))))
    assert(trunc.errors == 0 && trunc.udpSrcport.isEmpty)
  }

  test("staged dissection: L3 stop + resume ≡ direct full (round-13 DissectLevel)") {
    import graft.dissect.{DissectAcc, DissectLevel}
    val pkts = Seq(
      ethernet(0x0800, ipv4("10.0.0.1", "10.0.0.2", 17,
        udp(5353, 53, dnsQuery("staged.example.com", 1)), ttl = 61, id = 777)),
      ethernet(0x0800, ipv4("1.1.1.1", "2.2.2.2", 6, tcp(443, 55555, 0x18))),
      ethernet(0x0800, ipv4("10.0.0.9", "10.0.0.1", 1,
        icmpDestUnreachable(ipv4("10.0.0.2", "10.0.0.1", 17, udp(53, 33333, Array.empty))))),
      ethernet(0x0800, ipv4("1.1.1.1", "2.2.2.2", 17, Array.fill[Byte](16)(0),
        id = 9, mf = true, fragOffset = 185)))
    for (pkt <- pkts; mid <- Seq(DissectLevel.L3, DissectLevel.Transport)) {
      val frame = RawFrame(1000000L, pkt.length.toLong, pkt, 1)
      val direct = new DissectAcc
      PacketDissector.dissectInto(direct, frame)
      val staged = new DissectAcc
      PacketDissector.dissectInto(staged, frame, walkV6 = true, level = mid)
      PacketDissector.dissectResume(staged, pkt, DissectLevel.Full)
      assert(staged.toPacketRow == direct.toPacketRow,
        s"staged(mid=$mid) != direct for ${direct.toPacketRow}")
      assert(staged.errors == direct.errors)
    }
  }

  test("IPv6 fragment header: first fragment parses transport, continuation gates (Sane)") {
    val g = Array(0x2001, 0xdb8, 0, 0, 0, 0, 0, 7)
    val dst = Array(0x2001, 0xdb8, 0, 0, 0, 0, 0, 8)
    def fragHdr(next: Int, off8: Int, mf: Boolean, id: Long): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.BIG_ENDIAN)
      b.put(next.toByte).put(0.toByte)
        .putShort((((off8 << 3) | (if (mf) 1 else 0)) & 0xffff).toShort)
        .putInt(id.toInt)
      b.array()
    }
    // first fragment: offset 0, MF=1 — transport parses, v4-style columns
    val first = dissectOne(ethernet(0x86dd, ipv6(g, dst, 44,
      fragHdr(17, 0, mf = true, id = 0x12345678L) ++
        udp(123, 123, Array[Byte](((2 << 3) | 7).toByte, 0, 0, 42, 0, 0, 0, 0)))))
    assert(first.ipProto == 17 && first.ipMf && first.ipFragOffset == 0)
    assert(first.ipId == 0x5678) // low 16 bits of the 32-bit v6 id
    assert(first.udpSrcport.contains(123))
    assert(first.colProtocol.contains("NTP"))
    // continuation: offset > 0 gates dissection — no transport columns
    val cont = dissectOne(ethernet(0x86dd, ipv6(g, dst, 44,
      fragHdr(17, 185, mf = false, id = 0x12345678L) ++ Array.fill[Byte](16)(0x42))))
    assert(cont.ipProto == 17 && !cont.ipMf && cont.ipFragOffset == 185)
    assert(cont.udpSrcport.isEmpty && cont.colProtocol.contains("IPv6"))
    // compat mode ignores the fragment header entirely (reference scope)
    val compat = PacketDissector.dissect(
      graft.core.RawFrame(1L, 0L, ethernet(0x86dd, ipv6(g, dst, 44,
        fragHdr(17, 185, mf = false, id = 1L) ++ Array.fill[Byte](16)(0x42))), 1),
      walkV6 = false)
    assert(compat.ipProto == 44 && compat.ipFragOffset == 0 && !compat.ipMf)
  }

  test("IPv6 walk malformed chains: 59 ends clean, truncation errors, never throws") {
    val g = Array(1, 2, 3, 4, 5, 6, 7, 8)
    val dst = Array(8, 7, 6, 5, 4, 3, 2, 1)
    // no-next-header: clean bare-IPv6 row
    val none = dissectOne(ethernet(0x86dd, ipv6(g, dst, 59, Array.empty)))
    assert(none.ipProto == 59 && none.errors == 0)
    assert(none.colProtocol.contains("IPv6"))
    // hop-by-hop claiming 24 bytes with only 8 present: error, row kept
    val trunc = dissectOne(ethernet(0x86dd, ipv6(g, dst, 0,
      Array[Byte](17, 2, 0, 0, 0, 0, 0, 0))))
    assert(trunc.errors == 1 && trunc.ipSrc.contains("1:2:3:4:5:6:7:8"))
    assert(trunc.udpSrcport.isEmpty)
    // an 9-deep chain hits the hop cap: error, row kept
    val deep = (1 to 9).map(_ => Array[Byte](0, 0, 0, 0, 0, 0, 0, 0))
      .reduce(_ ++ _) ++ udp(1, 2, Array.empty)
    val capped = dissectOne(ethernet(0x86dd, ipv6(g, dst, 0, deep)))
    assert(capped.errors == 1 && capped.udpSrcport.isEmpty)
  }

  test("ipv6Text edge cases") {
    assert(PacketDissector.ipv6Text(Array(0, 0, 0, 0, 0, 0, 0, 0)) == "::")
    assert(PacketDissector.ipv6Text(Array(0, 0, 0, 0, 0, 0, 0, 1)) == "::1")
    assert(PacketDissector.ipv6Text(Array(1, 0, 0, 0, 0, 0, 0, 0)) == "1::")
    assert(PacketDissector.ipv6Text(Array(1, 2, 3, 4, 5, 6, 7, 8)) == "1:2:3:4:5:6:7:8")
    // single zero group is NOT compressed (RFC 5952 §4.2.2)
    assert(PacketDissector.ipv6Text(Array(1, 0, 2, 3, 4, 5, 6, 7)) == "1:0:2:3:4:5:6:7")
    // Rust Ipv6Addr Display's dotted special cases (reference parity):
    // IPv4-mapped and IPv4-compatible render their last 32 bits dotted,
    // with :: and ::1 excluded
    assert(PacketDissector.ipv6Text(Array(0, 0, 0, 0, 0, 0xffff, 0xc000, 0x0201))
      == "::ffff:192.0.2.1")
    assert(PacketDissector.ipv6Text(Array(0, 0, 0, 0, 0, 0, 0xc000, 0x0201))
      == "::192.0.2.1")
    assert(PacketDissector.ipv6Text(Array(0, 0, 0, 0, 0, 0, 0, 5)) == "::0.0.0.5")
    assert(PacketDissector.ipv6Text(Array(0, 0, 0, 0, 0, 0xffff, 0, 0))
      == "::ffff:0.0.0.0")
  }

  test("VLAN-tagged frame reaches the IP layer; eth_type keeps outer value") {
    val pkt = ethernet(0x0800, ipv4("3.3.3.3", "4.4.4.4", 17, udp(5, 6, Array.empty)),
      vlan = Some(100))
    val r = dissectOne(pkt)
    assert(r.ethType.contains(0x8100))
    assert(r.ipSrc.contains("3.3.3.3") && r.colProtocol.contains("UDP"))
  }

  test("raw-IP linktype dissects without panic (divergence from reference)") {
    val r = dissectOne(ipv4("6.6.6.6", "7.7.7.7", 17, udp(1, 2, Array.empty)), linktype = 101)
    assert(r.ethType.isEmpty && r.ipSrc.contains("6.6.6.6"))
  }

  test("IPv4 frame_len overwritten with total_len (packetstats.rs:197)") {
    val ip = ipv4("1.1.1.1", "2.2.2.2", 17, udp(1, 2, Array.fill[Byte](10)(0)))
    val r = dissectOne(ethernet(0x0800, ip))
    assert(r.frameLen.contains(ip.length.toLong)) // = IP total_len, not frame len
  }

  test("malformed packets count errors, never throw") {
    val junk = Array.fill[Byte](7)(0x5a)
    val r = dissectOne(junk)
    assert(r.errors == 1 && r.frameTime == 1000000L)
    val shortIp = ethernet(0x0800, Array.fill[Byte](10)(1))
    assert(dissectOne(shortIp).errors == 1)
  }

  test("DNS name label escaping follows presentation format") {
    // label with a dot inside → escaped
    val msg = Array[Byte](0, 1, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0,
      4, 'a', '.', 'b', 0x7f, 0, 0, 1, 0, 1)
    val (name, _) = Dns.parseName(msg, 0, msg.length, 12).get
    assert(name == "a\\.b\\127")
  }
}
