package graft.spark

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** Synthetic capture generator for benchmarks and repro cases: a DDoS-ish
  * traffic mix (DNS amplification replies with UDP fragmentation, TCP
  * SYN-ACK backscatter, NTP private-mode probes), deterministic for a
  * given seed-free spec. Pure JVM — no Spark dependency.
  */
object PcapGen {

  private def eth(payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(14 + payload.length)
    b.put(Array.fill[Byte](6)(0x02)).put(Array.fill[Byte](6)(0x04))
      .putShort(0x0800.toShort).put(payload)
    b.array()
  }

  private def ipv4(srcLast: Int, proto: Int, payload: Array[Byte],
      id: Int, mf: Boolean, off: Int): Array[Byte] = {
    val tl = 20 + payload.length
    val b = ByteBuffer.allocate(tl).order(ByteOrder.BIG_ENDIAN)
    b.put(0x45.toByte).put(0.toByte).putShort(tl.toShort)
    b.putShort(id.toShort)
    b.putShort((((if (mf) 0x2000 else 0) | (off & 0x1fff))).toShort)
    b.put(64.toByte).put(proto.toByte).putShort(0)
    b.put(Array[Byte](198.toByte, 51, 100, (srcLast % 250 + 1).toByte))
    b.put(Array[Byte](192.toByte, 0, 2, 1))
    b.put(payload)
    b.array()
  }

  private def udp(sp: Int, dp: Int, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + payload.length).order(ByteOrder.BIG_ENDIAN)
    b.putShort(sp.toShort).putShort(dp.toShort)
      .putShort((8 + payload.length).toShort).putShort(0).put(payload)
    b.array()
  }

  private def dnsQuery(name: String): Array[Byte] = {
    val labels = name.split('.')
    val b = ByteBuffer.allocate(16 + labels.map(_.length + 1).sum + 1)
      .order(ByteOrder.BIG_ENDIAN)
    b.putShort(0x1234.toShort).putShort(0x0100.toShort)
      .putShort(1).putShort(0).putShort(0).putShort(0)
    labels.foreach { l => b.put(l.length.toByte).put(l.getBytes("ASCII")) }
    b.put(0.toByte).putShort(1).putShort(1)
    b.array()
  }

  private def tcpSynAck(dp: Int): Array[Byte] = tcpPkt(dp, 0x12, 0)

  /** TCP segment with arbitrary flags and an optional ASCII payload. */
  private def tcpPkt(dp: Int, flags: Int, payloadLen: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(20 + payloadLen).order(ByteOrder.BIG_ENDIAN)
    b.putShort(443.toShort).putShort(dp.toShort).putInt(1).putInt(0)
    b.put((5 << 4).toByte).put(flags.toByte).putShort(8192.toShort)
      .putShort(0).putShort(0)
    var i = 0
    while (i < payloadLen) { b.put(0x42.toByte); i += 1 }
    b.array()
  }

  /** A realistic TCP handshake/teardown flag cycle (SYN, SYN-ACK, ACK,
    * PSH-ACK with payload, FIN-ACK, RST) — the flag diversity the
    * DDoS-mix corpus lacks, exercising `tcp_flags_as_string` and the
    * TCP decode path under benchmark load. */
  private val tcpFlagCycle = Array(0x02, 0x12, 0x10, 0x18, 0x11, 0x04)

  private val ntpPriv: Array[Byte] =
    udp(123, 123, Array[Byte](((2 << 3) | 7).toByte, 0, 0, 42, 0, 0, 0, 0))

  /** Write `packets` packets (~30% in 3-fragment UDP datagrams) to `path`. */
  def write(path: String, packets: Int, tsBaseMicros: Long = 1700000000000000L,
      mix: String = "ddos"): Unit = {
    val out = new BufferedOutputStream(new FileOutputStream(path), 1 << 20)
    val hdr = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    hdr.putInt(0xa1b2c3d4).putShort(2).putShort(4).putInt(0).putInt(0)
      .putInt(65535).putInt(1)
    out.write(hdr.array())
    var ts = tsBaseMicros
    var i = 0
    def rec(p: Array[Byte]): Unit = {
      val h = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      h.putInt((ts / 1000000L).toInt).putInt((ts % 1000000L).toInt)
        .putInt(p.length).putInt(p.length)
      out.write(h.array()); out.write(p)
      ts += 1
    }
    val fragTail = Array.fill[Byte](64)(0x41)
    while (i < packets) {
      if (mix == "tcp") {
        // TCP-dominant mix (~80% TCP across the full flag cycle with
        // varied payload sizes, 10% DNS, 10% NTP): the defrag pipeline is
        // a no-op here (<1% fragmented → adaptive skip branch), so the
        // number isolates L2-L4 decode + flag stringification throughput
        (i % 10) match {
          case r if r < 8 =>
            rec(eth(ipv4(i, 6, tcpPkt(50000 + (i % 10000),
              tcpFlagCycle(i % tcpFlagCycle.length), (i % 5) * 64),
              0, mf = false, 0)))
          case 8 =>
            rec(eth(ipv4(i, 17, udp(53, 40000 + (i % 10000),
              dnsQuery(s"q${i % 16}.example.com")), 0, mf = false, 0)))
          case _ =>
            rec(eth(ipv4(i, 17, ntpPriv, 0, mf = false, 0)))
        }
        i += 1
      } else (i % 10) match {
        case r if r < 3 => // fragmented DNS amplification reply
          val id = (i / 3) & 0xffff
          rec(eth(ipv4(i, 17, udp(53, 40000 + (i % 10000),
            dnsQuery(s"amp${i % 16}.example.net")), id, mf = true, 0)))
          rec(eth(ipv4(i, 17, fragTail, id, mf = true, 9)))
          rec(eth(ipv4(i, 17, fragTail, id, mf = false, 18)))
          i += 3
        case r if r < 7 =>
          rec(eth(ipv4(i, 17, udp(53, 40000 + (i % 10000),
            dnsQuery(s"q${i % 16}.example.com")), 0, mf = false, 0)))
          i += 1
        case r if r < 9 =>
          rec(eth(ipv4(i, 6, tcpSynAck(50000 + (i % 10000)), 0, mf = false, 0)))
          i += 1
        case _ =>
          rec(eth(ipv4(i, 17, ntpPriv, 0, mf = false, 0)))
          i += 1
      }
    }
    out.close()
  }
}
