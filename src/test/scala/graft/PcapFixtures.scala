package graft

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** In-memory pcap/pcapng + packet byte builders for tests (SURVEY §5.3:
  * the reference ships zero tests, so fixtures are synthesized here).
  */
object PcapFixtures {

  // ---- packet payload builders (network byte order) ------------------------

  def ethernet(etherType: Int, payload: Array[Byte],
      vlan: Option[Int] = None): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    b.write(Array.fill[Byte](6)(0x02)); b.write(Array.fill[Byte](6)(0x04))
    vlan.foreach { tag =>
      b.write(Array[Byte](0x81.toByte, 0x00)) // 802.1Q
      b.write(Array[Byte]((tag >> 8).toByte, tag.toByte))
    }
    b.write(Array[Byte]((etherType >> 8).toByte, etherType.toByte))
    b.write(payload)
    b.toByteArray
  }

  def ipv4(src: String, dst: String, proto: Int, payload: Array[Byte],
      ttl: Int = 64, id: Int = 0, mf: Boolean = false,
      fragOffset: Int = 0): Array[Byte] = {
    val totalLen = 20 + payload.length
    val bb = ByteBuffer.allocate(totalLen).order(ByteOrder.BIG_ENDIAN)
    bb.put(0x45.toByte).put(0.toByte).putShort(totalLen.toShort)
    bb.putShort(id.toShort)
    bb.putShort((((if (mf) 0x2000 else 0) | (fragOffset & 0x1fff))).toShort)
    bb.put(ttl.toByte).put(proto.toByte).putShort(0) // checksum unchecked
    src.split('.').foreach(o => bb.put(o.toInt.toByte))
    dst.split('.').foreach(o => bb.put(o.toInt.toByte))
    bb.put(payload)
    bb.array()
  }

  def ipv6(srcGroups: Array[Int], dstGroups: Array[Int], nextHeader: Int,
      payload: Array[Byte], hopLimit: Int = 64): Array[Byte] = {
    val bb = ByteBuffer.allocate(40 + payload.length).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(0x60000000)
    bb.putShort(payload.length.toShort).put(nextHeader.toByte).put(hopLimit.toByte)
    srcGroups.foreach(g => bb.putShort(g.toShort))
    dstGroups.foreach(g => bb.putShort(g.toShort))
    bb.put(payload)
    bb.array()
  }

  def udp(sport: Int, dport: Int, payload: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + payload.length).order(ByteOrder.BIG_ENDIAN)
    bb.putShort(sport.toShort).putShort(dport.toShort)
    bb.putShort((8 + payload.length).toShort).putShort(0)
    bb.put(payload)
    bb.array()
  }

  def tcp(sport: Int, dport: Int, flags: Int,
      payload: Array[Byte] = Array.empty): Array[Byte] = {
    val bb = ByteBuffer.allocate(20 + payload.length).order(ByteOrder.BIG_ENDIAN)
    bb.putShort(sport.toShort).putShort(dport.toShort)
    bb.putInt(1).putInt(0)
    bb.put((5 << 4).toByte).put(flags.toByte).putShort(8192)
    bb.putShort(0).putShort(0)
    bb.put(payload)
    bb.array()
  }

  def icmpDestUnreachable(quoted: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + quoted.length).order(ByteOrder.BIG_ENDIAN)
    bb.put(3.toByte).put(3.toByte).putShort(0).putInt(0)
    bb.put(quoted)
    bb.array()
  }

  /** Minimal DNS query message: header + one question. */
  def dnsQuery(name: String, qtype: Int): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    b.write(Array[Byte](0x12, 0x34, 0x01, 0x00, 0, 1, 0, 0, 0, 0, 0, 0))
    if (name.nonEmpty)
      name.split('.').foreach { l =>
        b.write(l.length); b.write(l.getBytes("ASCII"))
      }
    b.write(0)
    b.write(Array[Byte]((qtype >> 8).toByte, qtype.toByte, 0, 1))
    b.toByteArray
  }

  /** NTP private-mode (version 2, mode 7) request, e.g. monlist. */
  def ntpPrivate(reqcode: Int): Array[Byte] = {
    val b = new Array[Byte](8)
    b(0) = ((2 << 3) | 7).toByte // LI=0 VN=2 mode=7
    b(3) = reqcode.toByte
    b
  }

  def ntpV4Client: Array[Byte] = {
    val b = new Array[Byte](48)
    b(0) = ((4 << 3) | 3).toByte // VN=4 mode=3 (client)
    b
  }

  def dhipDiscover(deviceType: String): Array[Byte] = {
    val json = s"""{"method":"DHDiscover.search","params":{"deviceInfo":{"DeviceType":"$deviceType"}}}"""
    val b = new ByteArrayOutputStream()
    b.write(Array[Byte](0x20, 0x00, 0x00, 0x00)) // sanitizes to spaces
    b.write("DHIP".getBytes("ASCII"))
    b.write(new Array[Byte](24)) // pad header to 32 bytes
    b.write(json.getBytes("ASCII"))
    b.toByteArray
  }

  // ---- capture-file builders -----------------------------------------------

  /** Legacy pcap: global header + records. `frames` = (tsMicros, origLen, bytes).
    * origLen < 0 means "use bytes.length".
    */
  def legacyPcap(frames: Seq[(Long, Int, Array[Byte])],
      linktype: Int = 1, bigEndian: Boolean = false): Array[Byte] = {
    val order = if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
    val size = 24 + frames.map(16 + _._3.length).sum
    val bb = ByteBuffer.allocate(size).order(order)
    bb.putInt(0xa1b2c3d4)
    bb.putShort(2).putShort(4).putInt(0).putInt(0).putInt(65535).putInt(linktype)
    frames.foreach { case (ts, orig, data) =>
      bb.putInt((ts / 1000000L).toInt).putInt((ts % 1000000L).toInt)
      bb.putInt(data.length)
      bb.putInt(if (orig < 0) data.length else orig)
      bb.put(data)
    }
    bb.array()
  }

  /** pcapng: SHB + IDBs + EPBs. `epbs` = (ifId, ts64 in if_tsresol units, origLen, bytes). */
  /** Interleaved pcapng builder (round 15, frame-index tests): items in
    * stream order — Left((linktype, tsresol)) = IDB, Right((ifId, ts,
    * origlen, data)) = EPB. Starts with one SHB; concatenate outputs for
    * multi-section captures (each array begins with its own SHB).
    */
  def pcapngInterleaved(
      items: Seq[Either[(Int, Int), (Int, Long, Int, Array[Byte])]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def block(btype: Int, body: Array[Byte]): Unit = {
      val pad = (4 - body.length % 4) % 4
      val total = 12 + body.length + pad
      val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(btype).putInt(total).put(body)
      bb.position(total - 4); bb.putInt(total)
      out.write(bb.array())
    }
    val shb = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    shb.putInt(0x1a2b3c4d).putShort(1).putShort(0).putLong(-1L)
    block(0x0a0d0d0a, shb.array())
    items.foreach {
      case Left((lt, tsresol)) =>
        val body = ByteBuffer.allocate(8 + 8 + 4).order(ByteOrder.LITTLE_ENDIAN)
        body.putShort(lt.toShort).putShort(0).putInt(0)
        body.putShort(9).putShort(1).put(tsresol.toByte)
          .put(0.toByte).putShort(0)
        body.putShort(0)
        block(1, body.array())
      case Right((ifId, ts, orig, data)) =>
        val body = ByteBuffer.allocate(20 + data.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        body.putInt(ifId)
        body.putInt((ts >>> 32).toInt).putInt(ts.toInt)
        body.putInt(data.length).putInt(orig)
        body.put(data)
        block(6, body.array())
    }
    out.toByteArray
  }

  def pcapng(interfaces: Seq[(Int, Int)], // (linktype, tsresol)
      epbs: Seq[(Int, Long, Int, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def block(btype: Int, body: Array[Byte]): Unit = {
      val pad = (4 - body.length % 4) % 4
      val total = 12 + body.length + pad
      val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(btype).putInt(total).put(body)
      bb.position(total - 4); bb.putInt(total)
      out.write(bb.array())
    }
    // SHB body: BOM, ver, section len
    val shb = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    shb.putInt(0x1a2b3c4d).putShort(1).putShort(0).putLong(-1L)
    block(0x0a0d0d0a, shb.array())
    interfaces.foreach { case (lt, tsresol) =>
      val body = ByteBuffer.allocate(8 + 8 + 4).order(ByteOrder.LITTLE_ENDIAN)
      body.putShort(lt.toShort).putShort(0).putInt(0) // linktype, rsvd, snaplen
      body.putShort(9).putShort(1).put(tsresol.toByte) // if_tsresol option
        .put(0.toByte).putShort(0) // pad + opt_endofopt
      body.putShort(0)
      block(1, body.array())
    }
    epbs.foreach { case (ifId, ts, orig, data) =>
      val body = ByteBuffer.allocate(20 + data.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      body.putInt(ifId)
      body.putInt((ts >>> 32).toInt).putInt(ts.toInt)
      body.putInt(data.length).putInt(orig)
      body.put(data)
      block(6, body.array())
    }
    out.toByteArray
  }
}
