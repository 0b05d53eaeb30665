package graft.sources

import org.apache.spark.sql.sources._

import graft.core.PacketRow

/** Reader-side filter evaluation for the pcap DSv2 source: pushed filters
  * run against the dissected [[PacketRow]] *before* InternalRow
  * materialization, skipping the row-building cost for dropped packets
  * (e.g. the fragment-gate `ip_frag_offset = 0` or a `col_protocol =
  * 'DNS'` slice of a capture). Supported: =, <, <=, >, >=, IN, IsNull /
  * IsNotNull, And/Or/Not over the scalar packet columns.
  */
object PcapFilters {

  /** Columns we can evaluate pre-materialization, as Option[Any] getters
    * in the value domain Spark compares with (Int/Long/Short/Boolean/
    * String). `pcapFile` parameterizes the constant-per-file column
    * DIRECTLY — substituting a sentinel into every getter's VALUE would
    * also rewrite a data value that happens to equal the sentinel (and a
    * reader-skipped row is gone for good; Spark's residual re-evaluation
    * never sees it).
    */
  private def getter(attr: String,
      pcapFile: String = ""): Option[PacketRow => Option[Any]] = attr match {
    case "frame_time" => None // timestamp comparison left to Spark
    case "frame_len" => Some(r => r.frameLen)
    case "eth_type" => Some(r => r.ethType)
    case "ip_src" | "col_source" => Some(r => r.ipSrc)
    case "ip_dst" | "col_destination" => Some(r => r.ipDst)
    case "ip_proto" => Some(r => Some(r.ipProto))
    case "ip_ttl" => Some(r => r.ipTtl)
    case "ip_frag_offset" => Some(r => Some(r.ipFragOffset))
    case "ip_id" => Some(r => Some(r.ipId))
    case "ip_mf" => Some(r => Some(r.ipMf))
    case "icmp_type" => Some(r => r.icmpType)
    case "udp_length" => Some(r => r.udpLength)
    case "udp_srcport" => Some(r => r.udpSrcport)
    case "udp_dstport" => Some(r => r.udpDstport)
    case "tcp_flags" => Some(r => r.tcpFlags)
    case "tcp_srcport" => Some(r => r.tcpSrcport)
    case "tcp_dstport" => Some(r => r.tcpDstport)
    case "col_protocol" => Some(r => r.colProtocol)
    case "dns_qry_name" => Some(r => r.dnsQryName)
    case "dns_qry_type" => Some(r => r.dnsQryType)
    case "ntp_priv_reqcode" => Some(r => r.ntpPrivReqcode)
    case "dhip_device" => Some(r => r.dhipDevice)
    case "pcap_file" => Some(_ => Some(pcapFile))
    case _ => None
  }

  def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _) => getter(a).isDefined
    case GreaterThan(a, _) => getter(a).isDefined
    case GreaterThanOrEqual(a, _) => getter(a).isDefined
    case LessThan(a, _) => getter(a).isDefined
    case LessThanOrEqual(a, _) => getter(a).isDefined
    case In(a, _) => getter(a).isDefined
    case IsNull(a) => getter(a).isDefined
    case IsNotNull(a) => getter(a).isDefined
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r) => supported(l) && supported(r)
    case Not(c) => supported(c)
    case _ => false
  }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Number, y: Number) =>
      Some(java.lang.Double.compare(x.doubleValue(), y.doubleValue()))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ => None
  }

  /** Compile to a predicate over the dissected row. Unknown shapes default
    * to `true` (Spark re-applies all filters anyway — the pushdown is an
    * optimization, never a correctness dependency).
    */
  def compile(filters: Array[Filter], pcapFile: String): PacketRow => Boolean = {
    def one(f: Filter): PacketRow => Boolean = f match {
      case EqualTo(a, v) => evalCmp(a, v, _ == 0)
      case GreaterThan(a, v) => evalCmp(a, v, _ > 0)
      case GreaterThanOrEqual(a, v) => evalCmp(a, v, _ >= 0)
      case LessThan(a, v) => evalCmp(a, v, _ < 0)
      case LessThanOrEqual(a, v) => evalCmp(a, v, _ <= 0)
      case In(a, vs) =>
        getter(a, pcapFile) match {
          case Some(g) => r => g(r).exists(x => vs.exists(v => cmp(x, v).contains(0)))
          case None => _ => true
        }
      case IsNull(a) =>
        getter(a, pcapFile) match {
          case Some(g) => r => g(r).isEmpty
          case None => _ => true
        }
      case IsNotNull(a) =>
        getter(a, pcapFile) match {
          case Some(g) => r => g(r).isDefined
          case None => _ => true
        }
      case And(l, r) => val (fl, fr) = (one(l), one(r)); row => fl(row) && fr(row)
      case Or(l, r) => val (fl, fr) = (one(l), one(r)); row => fl(row) || fr(row)
      case Not(c) => val fc = one(c); row => !fc(row)
      case _ => _ => true
    }
    def evalCmp(attr: String, v: Any, ok: Int => Boolean): PacketRow => Boolean =
      getter(attr, pcapFile) match {
        case Some(g) => r => g(r).flatMap(x => cmp(x, v)).exists(ok)
        case None => _ => true
      }
    val compiled = filters.map(one)
    row => {
      var ok = true
      var i = 0
      while (ok && i < compiled.length) {
        ok = compiled(i)(row)
        i += 1
      }
      ok
    }
  }
}
