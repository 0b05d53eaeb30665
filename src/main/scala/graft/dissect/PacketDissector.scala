package graft.dissect

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{PacketRow, RawFrame}

/** Per-packet dissection into a reusable [[DissectAcc]] — a pure function
  * of the frame bytes, no Spark dependency, used inside the sources'
  * `mapPartitions`. [[dissect]] keeps the immutable `RawFrame => PacketRow`
  * surface; the row-producing hot path is [[dissectToInternal]], which
  * skips the PacketRow/Option materialization entirely (see [[DissectAcc]]
  * for why: the job-level decode was GC-bound, not CPU-bound).
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
  *     packetstats.rs:331,335 — which a 100 TB job must survive). An
  *     unexpected exception resets the accumulator to the base frame row
  *     (pre-refactor semantics: only the base fields survive).
  *
  * Divergence: for raw-IP linktypes the reference would panic unwrapping the
  * absent link header (packetstats.rs:186); we dissect the IP packet with a
  * null `eth_type` instead.
  */
object PacketDissector {

  private val LinktypeEthernet = 1
  private val LinktypeRawIp = Set(12, 101, 228, 229)

  /** `"CEUAPRSF"` mask over `"........"`, e.g. ACK+SYN → `"...A..S."`
    * (reference: src/packetstats.rs:114-142). Table-backed.
    */
  def tcpFlagsString(flagsByte: Int): String = DissectAcc.FlagStr(flagsByte)

  private val accTL: ThreadLocal[DissectAcc] =
    ThreadLocal.withInitial(() => new DissectAcc)

  /** A per-thread accumulator for callers that dissect in a loop (the
    * sources' mapPartitions). Each [[dissectToInternal]] call resets it.
    */
  def acc(): DissectAcc = accTL.get()

  /** Immutable-API dissection (tests, write-back filters, toRow). */
  def dissect(frame: RawFrame, walkV6: Boolean = true): PacketRow = {
    val a = accTL.get()
    dissectInto(a, frame, walkV6)
    a.toPacketRow
  }

  /** Hot path: dissect and emit the 31-column InternalRow in one pass.
    * `a` must be this thread's/partition's own accumulator; read
    * `a.errors` after the call for the error accumulator.
    */
  def dissectToInternal(
      a: DissectAcc, frame: RawFrame, pcapFile: UTF8String,
      walkV6: Boolean = true): InternalRow = {
    dissectInto(a, frame, walkV6)
    a.toInternalRow(pcapFile)
  }

  /** `walkV6` selects the IPv6 extension-header semantics, both of which
    * WALK the chain (round 13 — the reference's etherparse
    * `LaxPacketHeaders` walks internally, packetstats.rs:148,190, so a
    * no-walk compat mode was wrong):
    *   - `true` (Sane): ip_proto records the header the walk lands on
    *     (what the v4 column means), the v6 fragment header is honored
    *     v4-style (frag columns set, offset > 0 gates dissection),
    *     malformed/over-long chains count an error;
    *   - `false` (ReferenceCompat): ip_proto keeps the FIXED header's
    *     next_header (packetstats.rs:252), fragment columns are never
    *     set (the reference's v6 branch lacks them), a fragmenting
    *     fragment header stops the parse with no transport and no
    *     first-fragment recovery (the v4-only read_transport,
    *     packetstats.rs:222-238), and lax parsing counts no error on a
    *     malformed chain — headers just stop.
    *
    * `level` ([[DissectLevel]]) bounds the work: below `Full` the
    * remaining stages are parked in the accumulator's pend fields and
    * can be continued by [[dissectResume]] with zero re-parse.
    */
  def dissectInto(a: DissectAcc, frame: RawFrame, walkV6: Boolean = true,
      level: Int = DissectLevel.Full): Unit = {
    a.reset()
    a.frameTime = frame.timeMicros
    a.frameLen = frame.origLen
    a.rawOrigLen = frame.origLen
    try {
      if (frame.linktype == LinktypeEthernet)
        dissectEthernet(a, frame.data, walkV6, level)
      else if (LinktypeRawIp.contains(frame.linktype))
        dissectIp(a, frame.data, 0, walkV6, level)
      // else: unknown linktype — keep the frame row, no dissection
    } catch {
      case _: Exception =>
        // pre-refactor contract: an unexpected parse exception keeps ONLY
        // the base frame fields (+1 error) — later partial writes must not
        // leak into the row
        a.reset()
        a.frameTime = frame.timeMicros
        a.frameLen = frame.origLen
        a.rawOrigLen = frame.origLen
        a.errors = 1
    }
  }

  /** Continue a below-Full [[dissectInto]] to `level` from the parked
    * continuation point — the staged half of required-schema-aware
    * dissection (no stage re-runs, so field values AND error counts end
    * up identical to a direct full dissection; DissectorProps pins it).
    * No-op when nothing is pending or `level` doesn't reach the pending
    * stage. `data` must be the same frame's bytes.
    *
    * Returns `true` iff the never-panic catch fired and RESET the
    * accumulator to the base frame fields. Callers that made decisions
    * on the pre-resume accumulator (the readers' L3 pushed-filter veto)
    * must re-make them: a direct full dissection resets BEFORE any
    * filter evaluates, so a staged scan that kept its pre-reset verdict
    * could emit (or drop) a row the direct path wouldn't (round-13
    * ADVICE; property-pinned via [[l7FaultHook]]).
    */
  def dissectResume(a: DissectAcc, data: Array[Byte], level: Int): Boolean = {
    try {
      if (a.pendKind == 1 && level >= DissectLevel.Transport) {
        val proto = a.pendA; val s = a.pendB; val e = a.pendC
        a.pendKind = 0
        dissectTransport(a, data, proto, s, e, level)
      } else if (a.pendKind == 2 && level >= DissectLevel.Full) {
        val sp = a.pendA; val dp = a.pendB; val s = a.pendC; val e = a.pendD
        a.pendKind = 0
        dissectL7(a, data, sp, dp, s, e)
      }
      false
    } catch {
      case _: Exception =>
        // same contract as dissectInto's catch: base frame fields only
        val t = a.frameTime; val l = a.rawOrigLen
        a.reset()
        a.frameTime = t
        a.frameLen = l
        a.rawOrigLen = l
        a.errors = 1
        true
    }
  }

  /** TEST-ONLY fault injection: when non-null, invoked at the top of the
    * L7 stage, so specs can exercise the never-panic catch paths (both
    * [[dissectInto]]'s and [[dissectResume]]'s) on otherwise-valid
    * packets — the bounds-checked parser has no organic way to throw.
    * Suites run sequentially in the forked test JVM; always reset in a
    * finally.
    *
    * DOCUMENTED ASYMMETRY under an injected fault (round-15 ADVICE): a
    * row VETOED by a pushed L3 filter never resumes, so its would-be L7
    * throw never fires — the staged scan drops it on the pre-fault L3
    * values, while a direct full dissection would throw first, reset to
    * base-frame fields (NULL L3, errors=1) and then be filtered on the
    * RESET row, which an IS-NULL-shaped filter could admit; error
    * metrics differ by the same rows. This is inherent to staging (the
    * veto exists precisely to skip the stage that would throw) and is
    * unreachable organically: the parser is bounds-checked never-throw,
    * so only this hook can create the divergence. The staged≡direct
    * fault property therefore quantifies over rows that REACH resume —
    * extending it to vetoed rows would require running the very stage
    * the veto exists to skip. Spark always re-applies pushed filters
    * above the scan, so the asymmetry can only DROP a fault-reset row,
    * never emit a wrong one.
    */
  @volatile private[graft] var l7FaultHook: () => Unit = null

  // ---- byte helpers ---------------------------------------------------------
  @inline private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xff
  @inline private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  @inline private def u32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  @inline private def has(b: Array[Byte], o: Int, n: Int): Boolean =
    o >= 0 && o + n <= b.length

  /** Below-Transport levels park the transport continuation instead of
    * parsing it ([[DissectAcc]] pend fields; [[dissectResume]] picks it
    * up).
    */
  @inline private def dispatchTransport(a: DissectAcc, proto: Int,
      pStart: Int, pEnd: Int, b: Array[Byte], level: Int): Unit =
    if (level >= DissectLevel.Transport)
      dissectTransport(a, b, proto, pStart, pEnd, level)
    else {
      a.pendKind = 1; a.pendA = proto; a.pendB = pStart; a.pendC = pEnd
    }

  private def dissectEthernet(a: DissectAcc, b: Array[Byte],
      walkV6: Boolean, level: Int): Unit = {
    if (!has(b, 0, 14)) { a.errors += 1; return }
    val et = u16(b, 12)
    a.ethType = et
    // walk VLAN tags (802.1Q / 802.1ad) to the payload ethertype; eth_type
    // keeps the outer value, like the reference's Ethernet2Header field
    var off = 14
    var etype = et
    while ((etype == 0x8100 || etype == 0x88a8 || etype == 0x9100) &&
        has(b, off, 4)) {
      etype = u16(b, off + 2)
      off += 4
    }
    etype match {
      case 0x0800 => dissectIpv4(a, b, off, level)
      case 0x86dd => dissectIpv6(a, b, off, walkV6, level)
      case _      => ()
    }
  }

  private def dissectIp(a: DissectAcc, b: Array[Byte], off: Int,
      walkV6: Boolean, level: Int): Unit = {
    if (!has(b, off, 1)) { a.errors += 1; return }
    (u8(b, off) >> 4) match {
      case 4 => dissectIpv4(a, b, off, level)
      case 6 => dissectIpv6(a, b, off, walkV6, level)
      case _ => a.errors += 1
    }
  }

  /** RFC 5952 text form (longest zero-run → `::`, lowercase, no leading
    * zeros) — matches Rust's `Ipv6Addr` Display used by the reference
    * (packetstats.rs:246-250), INCLUDING its dotted special cases:
    * after `::` and `::1`, an IPv4-compatible [0×6,g,h] renders
    * `::a.b.c.d` and an IPv4-mapped [0×5,ffff,g,h] renders
    * `::ffff:a.b.c.d` (Rust's `to_ipv4()` branch in Display).
    */
  private[graft] def ipv6Text(groups: Array[Int]): String = {
    @inline def dotted(g: Int, h: Int): String =
      s"${(g >> 8) & 0xff}.${g & 0xff}.${(h >> 8) & 0xff}.${h & 0xff}"
    val leadingZeros = (0 until 6).forall(i => groups(i) == 0)
    if (leadingZeros && groups(6) == 0 && (groups(7) == 0 || groups(7) == 1)) {
      // `::` / `::1` take the general path (identical rendering) — Rust
      // excludes exactly these two from the dotted branch
    } else if (leadingZeros) {
      return "::" + dotted(groups(6), groups(7))
    } else if ((0 until 5).forall(i => groups(i) == 0) && groups(5) == 0xffff) {
      return "::ffff:" + dotted(groups(6), groups(7))
    }
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

  private def dissectIpv4(a: DissectAcc, b: Array[Byte], off: Int,
      level: Int = DissectLevel.Full): Unit = {
    if (!has(b, off, 20)) { a.errors += 1; return }
    val verIhl = u8(b, off)
    if ((verIhl >> 4) != 4) { a.errors += 1; return }
    val ihl = (verIhl & 0xf) * 4
    if (ihl < 20 || !has(b, off, ihl)) { a.errors += 1; return }
    val totalLen = u16(b, off + 2)
    val flagsFrag = u16(b, off + 6)
    a.protoIdx = DissectAcc.PIpv4
    a.frameLen = totalLen.toLong // overwrite (packetstats.rs:197)
    a.setIpv4Src(u32(b, off + 12))
    a.setIpv4Dst(u32(b, off + 16))
    a.ipTtl = u8(b, off + 8)
    val proto = u8(b, off + 9)
    a.ipProto = proto.toShort
    a.ipId = u16(b, off + 4)
    a.ipMf = (flagsFrag & 0x2000) != 0
    val fragOffset = flagsFrag & 0x1fff // 8-byte units, raw field value
    a.ipFragOffset = fragOffset
    if (fragOffset > 0) return // fragment gate (packetstats.rs:214)
    // payload bounded by total_len when plausible, else the capture slice
    val pStart = off + ihl
    val pEnd =
      if (totalLen >= ihl && off + totalLen <= b.length) off + totalLen
      else b.length
    // an empty payload range no-ops through every transport arm
    if (pStart < pEnd) dispatchTransport(a, proto, pStart, pEnd, b, level)
  }

  /** IPv6. BOTH modes walk the extension-header chain (round 13 — the
    * reference's etherparse `LaxPacketHeaders` walks internally,
    * packetstats.rs:148,190, so the round-12 no-walk compat mode
    * diverged: a hop-by-hop + UDP/DNS packet gets real transport
    * columns from the reference). The modes differ in what the walk
    * RECORDS:
    *
    * `walkV6 = true` (Sane, round 12): walks hop-by-hop (0) / routing
    * (43) / destination-options (60) / AH (51) chains to the real
    * transport, honors 59 (no next header), and applies the v4-style
    * fragment gate on the fragment header (44): offset > 0 stops
    * dissection with the transport columns NULL; a first fragment
    * (offset 0) parses its transport like v4 first fragments do.
    * ip_proto records the final header reached (the transport after a
    * complete walk — what the v4 column means), ip_frag_offset keeps
    * the 13-bit 8-byte-unit value (the same unit the v4 column
    * carries), and ip_id takes the LOW 16 bits of the 32-bit v6
    * Identification — the best disambiguation the reference's UInt16
    * column admits (collision odds equal v4's own 16-bit id; the defrag
    * join keys stay meaningful for v6 chains). The walk is capped at 8
    * extension headers — a chain of EXACTLY 8 followed by a transport
    * still parses it (round-13 ADVICE: classify the proto the cap
    * landed on before declaring over-long); a truncated or genuinely
    * over-long chain keeps the partial row and counts one error (never
    * panic, SURVEY §4.4).
    *
    * `walkV6 = false` (ReferenceCompat): matches etherparse's lax walk —
    * ip_proto keeps the FIXED header's next_header (packetstats.rs:252
    * reads `ip.next_header`, pre-walk), fragment columns stay at their
    * defaults (the reference's v6 branch never writes them), a
    * FRAGMENTING fragment header (offset > 0 or MF — etherparse's
    * `is_fragmenting_payload`) stops the parse with no transport (the
    * v4-only first-fragment recovery, packetstats.rs:222-238, has no v6
    * twin) while an atomic fragment walks through, and malformed or
    * over-long chains stop QUIETLY — lax parsing surfaces stop-errors
    * the reference never reads (packetstats.rs:150-158 counts only
    * from_ethernet slice errors). Round 14: the walk also mirrors
    * etherparse's per-slot stop rules — hop-by-hop only immediately
    * after the fixed header, routing/fragment/AH at most once,
    * destination-options at most twice with a routing header between
    * (Ipv6ExtensionsSlice slots) — a repeated or misplaced header stops
    * the walk quietly, transportless.
    */
  private def dissectIpv6(a: DissectAcc, b: Array[Byte], off: Int,
      walkV6: Boolean, level: Int = DissectLevel.Full): Unit = {
    if (!has(b, off, 40)) { a.errors += 1; return }
    if ((u8(b, off) >> 4) != 6) { a.errors += 1; return }
    val payloadLen = u16(b, off + 4)
    val nextHeader = u8(b, off + 6)
    a.protoIdx = DissectAcc.PIpv6
    a.frameLen = payloadLen + 40L // payload + header (packetstats.rs:245)
    val srcG = Array.tabulate(8)(i => u16(b, off + 8 + i * 2))
    val dstG = Array.tabulate(8)(i => u16(b, off + 24 + i * 2))
    a.setIpv6Src(ipv6Text(srcG))
    a.setIpv6Dst(ipv6Text(dstG))
    a.ipTtl = u8(b, off + 7)
    a.ipProto = nextHeader.toShort
    val pEnd =
      if (off + 40 + payloadLen <= b.length) off + 40 + payloadLen
      else b.length
    var proto = nextHeader
    var p = off + 40
    var hops = 0
    var halt = false // stop with NO transport parse (gate / error / 59)
    var walking = true
    // bounds are pEnd (the IPv6 payload end), NOT the capture buffer:
    // an ethernet-minimum-padded short packet would otherwise feed
    // trailer/padding bytes to the walk as extension headers — and a
    // padding byte of 44 would fabricate fragment columns from
    // garbage (review finding; the transport parse below was always
    // pEnd-bounded, the walk must match)
    @inline def within(n: Int): Boolean = p + n <= pEnd
    if (walkV6) {
      while (walking && !halt && hops < 8) {
        proto match {
          case 0 | 43 | 60 => // Hdr Ext Len in 8-byte units, excl. first 8
            if (!within(2)) { a.errors += 1; halt = true }
            else {
              val l = (u8(b, p + 1) + 1) * 8
              if (!within(l)) { a.errors += 1; halt = true }
              else { proto = u8(b, p); p += l; a.ipProto = proto.toShort }
            }
          case 51 => // AH: Payload Len in 4-byte units, excl. first 8
            if (!within(2)) { a.errors += 1; halt = true }
            else {
              val l = (u8(b, p + 1) + 2) * 4
              if (!within(l)) { a.errors += 1; halt = true }
              else { proto = u8(b, p); p += l; a.ipProto = proto.toShort }
            }
          case 44 => // fragment header: fixed 8 bytes
            if (!within(8)) { a.errors += 1; halt = true }
            else {
              val fo = u16(b, p + 2)
              a.ipFragOffset = fo >>> 3
              a.ipMf = (fo & 1) != 0
              a.ipId = u32(b, p + 4) & 0xffff
              proto = u8(b, p); p += 8; a.ipProto = proto.toShort
              if (a.ipFragOffset > 0) halt = true // fragment gate, as v4
            }
          case 59 => halt = true // no next header
          case _ => walking = false // a transport — parse it below
        }
        hops += 1
      }
      if (halt) return
      if (walking) {
        // 8-hop cap: classify what the cap landed on (round-13 ADVICE) —
        // a transport reached exactly at the cap parses below; a chain
        // still mid-extension is genuinely over-long (one error); 59
        // ends clean
        proto match {
          case 0 | 43 | 60 | 51 | 44 => a.errors += 1; return
          case 59 => return
          case _ => ()
        }
      }
    } else {
      // ReferenceCompat: same chain shapes, recorded etherparse-style —
      // no ip_proto update, no fragment columns, no error counting.
      // Round 14 (ADVICE): mirror etherparse's lax STOP rules too
      // (Ipv6ExtensionsSlice::from_slice_lax) — each extension slot is
      // read at most once (hop-by-hop, routing, fragment, AH; plus
      // destination-options twice only when a routing header sits
      // between — the final_destination_options slot), and hop-by-hop
      // is legal only IMMEDIATELY after the fixed header
      // (HopByHopNotAtStart otherwise). A violated rule stops the walk
      // quietly with the offending header as the payload ip_number —
      // no transport columns, no error (the reference never reads lax
      // stop errors). These rules bound the chain at 6 headers, so the
      // Sane branch's 8-hop cap is unreachable here.
      var seenRouting = false
      var seenDest = false
      var seenFinalDest = false
      var seenFrag = false
      var seenAuth = false
      @inline def readExt8(): Unit = // Hdr Ext Len in 8-byte units
        if (!within(2)) halt = true
        else {
          val l = (u8(b, p + 1) + 1) * 8
          if (!within(l)) halt = true else { proto = u8(b, p); p += l }
        }
      while (walking && !halt && hops < 8) {
        proto match {
          case 0 =>
            if (hops != 0) halt = true // HopByHopNotAtStart
            else readExt8()
          case 43 =>
            if (seenRouting) halt = true
            else { seenRouting = true; readExt8() }
          case 60 =>
            if (seenRouting) {
              if (seenFinalDest) halt = true
              else { seenFinalDest = true; readExt8() }
            } else if (seenDest) halt = true
            else { seenDest = true; readExt8() }
          case 51 =>
            if (seenAuth) halt = true
            else if (!within(2)) halt = true
            else {
              seenAuth = true
              val l = (u8(b, p + 1) + 2) * 4 // AH: 4-byte units
              if (!within(l)) halt = true else { proto = u8(b, p); p += l }
            }
          case 44 =>
            if (seenFrag || !within(8)) halt = true
            else {
              // etherparse is_fragmenting_payload: offset != 0 || MF →
              // stop with no transport; an atomic fragment walks through
              seenFrag = true
              val fo = u16(b, p + 2)
              if ((fo >>> 3) != 0 || (fo & 1) != 0) halt = true
              else { proto = u8(b, p); p += 8 }
            }
          case 59 => halt = true
          case _ => walking = false
        }
        hops += 1
      }
      if (halt) return
      if (walking) proto match {
        case 0 | 43 | 60 | 51 | 44 | 59 => return // still mid-chain: quiet stop
        case _ => ()
      }
    }
    if (p < pEnd) dispatchTransport(a, proto, p, pEnd, b, level)
  }

  /** Transport + L7 dissection over `[pStart, pEnd)`; shared by the normal
    * path and the first-fragment recovery path (read_transport,
    * packetstats.rs:49-107 — one code path here since the parse is manual).
    */
  private def dissectTransport(
      a: DissectAcc, b: Array[Byte], proto: Int, pStart: Int, pEnd: Int,
      level: Int = DissectLevel.Full): Unit =
    proto match {
      case 17 => // UDP
        if (pEnd - pStart < 8) ()
        else {
          val sp = u16(b, pStart)
          val dp = u16(b, pStart + 2)
          a.protoIdx = DissectAcc.PUdp
          a.udpSrcport = sp
          a.udpDstport = dp
          a.udpLength = u16(b, pStart + 4)
          if (level >= DissectLevel.Full) dissectL7(a, b, sp, dp, pStart + 8, pEnd)
          else {
            a.pendKind = 2
            a.pendA = sp; a.pendB = dp; a.pendC = pStart + 8; a.pendD = pEnd
          }
        }
      case 6 => // TCP — full header (data offset) must be present, like
        // TcpHeader::from_slice (packetstats.rs:88-98)
        if (pEnd - pStart < 20) ()
        else {
          val doff = (u8(b, pStart + 12) >> 4) * 4
          if (doff < 20 || pEnd - pStart < doff) ()
          else {
            a.protoIdx = DissectAcc.PTcp
            a.tcpSrcport = u16(b, pStart)
            a.tcpDstport = u16(b, pStart + 2)
            a.tcpFlagsBits = u8(b, pStart + 13)
          }
        }
      case 1 => // ICMPv4 — 8-byte header required (Icmpv4Slice)
        if (pEnd - pStart < 8) ()
        else {
          val t = u8(b, pStart)
          a.protoIdx = DissectAcc.PIcmp
          a.icmpType = t
          if (t == 3) dissectIcmpInner(a, b, pStart + 8, pEnd)
        }
      case 58 => () // ICMPv6: explicitly ignored (packetstats.rs:388)
      case _  => ()
    }

  /** ICMP Destination-Unreachable: strict parse of the quoted original IP
    * packet, surfacing inner UDP/TCP ports (+ TCP flags). Parse failure
    * counts an error, matching PacketHeaders::from_ip_slice Err
    * (packetstats.rs:379-382).
    */
  private def dissectIcmpInner(
      a: DissectAcc, b: Array[Byte], qStart: Int, qEnd: Int): Unit = {
    if (qEnd - qStart < 20) { a.errors += 1; return }
    val ver = u8(b, qStart) >> 4
    if (ver == 4) {
      val ihl = (u8(b, qStart) & 0xf) * 4
      if (ihl < 20 || qEnd - qStart < ihl) { a.errors += 1; return }
      val proto = u8(b, qStart + 9)
      val t = qStart + ihl
      proto match {
        case 17 =>
          if (qEnd - t < 8) a.errors += 1
          else {
            a.udpSrcport = u16(b, t)
            a.udpDstport = u16(b, t + 2)
          }
        case 6 =>
          // strict TCP header parse: needs data-offset bytes; an 8-byte
          // quote fails here exactly like the reference (errors += 1)
          if (qEnd - t < 20) a.errors += 1
          else {
            val doff = (u8(b, t + 12) >> 4) * 4
            if (doff < 20 || qEnd - t < doff) a.errors += 1
            else {
              a.tcpSrcport = u16(b, t)
              a.tcpDstport = u16(b, t + 2)
              a.tcpFlagsBits = u8(b, t + 13)
            }
          }
        case _ => ()
      }
    } else if (ver == 6) {
      if (qEnd - qStart < 40) { a.errors += 1; return }
      val proto = u8(b, qStart + 6)
      val t = qStart + 40
      proto match {
        case 17 if qEnd - t >= 8 =>
          a.udpSrcport = u16(b, t)
          a.udpDstport = u16(b, t + 2)
        case 6 if qEnd - t >= 20 =>
          // same strict data-offset contract as the v4-inner branch: a
          // quote shorter than the header doff declares is a parse
          // error, not a populated row
          val doff = (u8(b, t + 12) >> 4) * 4
          if (doff < 20 || qEnd - t < doff) a.errors += 1
          else {
            a.tcpSrcport = u16(b, t)
            a.tcpDstport = u16(b, t + 2)
            a.tcpFlagsBits = u8(b, t + 13)
          }
        case 17 | 6 => a.errors += 1
        case _      => ()
      }
    } else a.errors += 1
  }

  /** UDP L7 by port: DNS :53, NTP :123, DHDiscover src :37810 — same
    * precedence chain as packetstats.rs:268,292,316.
    */
  private def dissectL7(
      a: DissectAcc, b: Array[Byte], sp: Int, dp: Int, pStart: Int, pEnd: Int)
      : Unit = {
    val hook = l7FaultHook
    if (hook != null) hook()
    if (sp == 53 || dp == 53) {
      a.protoIdx = DissectAcc.PDns
      Dns.dissectInto(b, pStart, pEnd, a)
    } else if (sp == 123 || dp == 123) {
      a.protoIdx = DissectAcc.PNtp
      Ntp.dissectInto(b, pStart, pEnd, a)
    } else if (sp == 37810) {
      a.protoIdx = DissectAcc.PDhip
      Dhip.dissectInto(b, pStart, pEnd, a)
    }
  }
}
