package graft.core

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** A raw captured frame as emitted by the pcap/pcapng framer, before
  * dissection. Mirrors the reference's `PktMsg` channel message
  * (reference: src/main.rs:45-55): timestamp already normalized to
  * microseconds, original wire length, captured bytes, and the link type
  * the dissector must interpret the bytes with.
  *
  * @param timeMicros frame timestamp in µs since epoch (0 for pcapng
  *                   SimplePacket blocks, reference src/main.rs:207)
  * @param origLen    original (wire) frame length
  * @param data       captured bytes (may be shorter than origLen)
  * @param linktype   pcap linktype (1 = Ethernet, 101 = raw IP, ...)
  */
final case class RawFrame(
    timeMicros: Long,
    origLen: Long,
    data: Array[Byte],
    linktype: Int)

/** One dissected packet — the 31-column row contract of the engine.
  *
  * Field order and nullability mirror the reference schema
  * (reference: src/statscollector.rs:37-77). Unsigned reference types are
  * widened to the next signed Spark type (SURVEY §1.2). Four fields
  * (ipProto, ipFragOffset, ipId, ipMf) default to 0/false instead of null
  * on non-IP frames, matching the reference's non-Option vectors
  * (reference: src/statscollector.rs:98-102).
  */
final case class PacketRow(
    frameTime: Long, // µs since epoch
    frameLen: Option[Long],
    ethType: Option[Int],
    ipSrc: Option[String],
    ipDst: Option[String],
    ipProto: Short,
    ipTtl: Option[Short],
    ipFragOffset: Int,
    ipId: Int,
    ipMf: Boolean,
    icmpType: Option[Short] = None,
    udpLength: Option[Int] = None,
    udpSrcport: Option[Int] = None,
    udpDstport: Option[Int] = None,
    tcpFlags: Option[String] = None,
    tcpSrcport: Option[Int] = None,
    tcpDstport: Option[Int] = None,
    colProtocol: Option[String] = None,
    dnsQryName: Option[String] = None,
    dnsQryType: Option[Int] = None,
    ntpPrivReqcode: Option[Short] = None,
    dhipDevice: Option[String] = None,
    errors: Int = 0) {

  /** Catalyst-internal row in the exact 31-column output order of
    * [[PacketSchema.schema]]: timestamps as raw epoch-micros, strings as
    * `UTF8String` — no boxing detour through `java.sql.Timestamp`/external
    * `Row`, which measurably dominates the parse stage at millions of
    * packets/second. col_info and the five http_* columns are always null
    * (reference declares but never populates them,
    * src/packetstats.rs:31,37-41).
    */
  def toInternalRow(pcapFile: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    import org.apache.spark.unsafe.types.UTF8String
    def utf8(o: Option[String]): AnyRef = o match {
      case Some(s) => UTF8String.fromString(s)
      case None => null
    }
    def j[T](o: Option[T]): AnyRef = o match {
      case Some(v) => v.asInstanceOf[AnyRef]
      case None => null
    }
    val src = utf8(ipSrc)
    val dst = utf8(ipDst)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      frameTime, // TimestampType = micros since epoch
      j(frameLen),
      j(ethType),
      src,
      dst,
      ipProto,
      j(ipTtl),
      ipFragOffset,
      ipId,
      ipMf,
      j(icmpType),
      j(udpLength),
      j(udpSrcport),
      j(udpDstport),
      utf8(tcpFlags),
      j(tcpSrcport),
      j(tcpDstport),
      null, // col_info: declared, never populated
      src, // col_source (reference: src/packetstats.rs:204,248)
      dst, // col_destination
      utf8(colProtocol),
      utf8(dnsQryName),
      j(dnsQryType),
      null, null, null, null, null, // http_*: declared, never populated
      j(ntpPrivReqcode),
      j(dhipDevice),
      pcapFile))
  }

  /** External-Row form of [[toInternalRow]] (kept for API completeness).
    * col_info and the five http_* columns are always null (reference
    * declares but never populates them, src/packetstats.rs:31,37-41).
    */
  def toRow(pcapFile: String): Row = Row(
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(frameTime, 1000000L),
      Math.floorMod(frameTime, 1000000L) * 1000L)),
    frameLen.orNull,
    ethType.orNull,
    ipSrc.orNull,
    ipDst.orNull,
    ipProto,
    ipTtl.orNull,
    ipFragOffset,
    ipId,
    ipMf,
    icmpType.orNull,
    udpLength.orNull,
    udpSrcport.orNull,
    udpDstport.orNull,
    tcpFlags.orNull,
    tcpSrcport.orNull,
    tcpDstport.orNull,
    null, // col_info: declared, never populated
    ipSrc.orNull, // col_source (reference: src/packetstats.rs:204,248)
    ipDst.orNull, // col_destination
    colProtocol.orNull,
    dnsQryName.orNull,
    dnsQryType.orNull,
    null, null, null, null, null, // http_*: declared, never populated
    ntpPrivReqcode.orNull,
    dhipDevice.orNull,
    pcapFile)
}

/** The packet-table schema: 31 nullable columns, exact order of the
  * reference's Arrow schema (reference: src/statscollector.rs:37-77).
  */
object PacketSchema {
  val schema: StructType = StructType(Seq(
    StructField("frame_time", TimestampType),
    StructField("frame_len", LongType),
    StructField("eth_type", IntegerType),
    StructField("ip_src", StringType),
    StructField("ip_dst", StringType),
    StructField("ip_proto", ShortType),
    StructField("ip_ttl", ShortType),
    StructField("ip_frag_offset", IntegerType),
    StructField("ip_id", IntegerType),
    StructField("ip_mf", BooleanType),
    StructField("icmp_type", ShortType),
    StructField("udp_length", IntegerType),
    StructField("udp_srcport", IntegerType),
    StructField("udp_dstport", IntegerType),
    StructField("tcp_flags", StringType),
    StructField("tcp_srcport", IntegerType),
    StructField("tcp_dstport", IntegerType),
    StructField("col_info", StringType),
    StructField("col_source", StringType),
    StructField("col_destination", StringType),
    StructField("col_protocol", StringType),
    StructField("dns_qry_name", StringType),
    StructField("dns_qry_type", IntegerType),
    StructField("http_request_uri", StringType),
    StructField("http_host", StringType),
    StructField("http_request_method", StringType),
    StructField("http_user_agent", StringType),
    StructField("http_file_data", StringType),
    StructField("ntp_priv_reqcode", ShortType),
    StructField("dhip_device", StringType),
    StructField("pcap_file", StringType)))

  /** The six columns patched by the defrag pipeline (reference:
    * src/main.rs:292-296).
    */
  val defragPatched: Seq[String] = Seq(
    "udp_srcport", "udp_dstport", "ntp_priv_reqcode",
    "dns_qry_type", "dns_qry_name", "col_protocol")

  /** [[schema]] plus the raw capture: `spark.read.format("pcap")
    * .option("bytes", "true")` emits these two extra columns so a filtered
    * packet table can be written BACK to pcap (the write-back sink needs
    * the original frame bytes — dissection is lossy).
    */
  val bytesSchema: StructType = schema
    .add(StructField("frame_bytes", BinaryType))
    .add(StructField("linktype", IntegerType))
}
