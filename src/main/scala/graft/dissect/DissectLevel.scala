package graft.dissect

/** Required-schema-aware dissection depth (round 13). Dissection is a
  * three-stage pipeline — link+IP ([[L3]]), transport headers
  * ([[Transport]]: UDP/TCP/ICMP incl. the ICMP inner-packet recovery),
  * and the UDP application parse ([[Full]]: DNS/NTP/DHDiscover, where
  * the DNS name walk and string building dominate) — and a scan whose
  * required columns stop at an earlier stage can skip the later ones
  * entirely. The DSv2 readers derive the level from the pruned schema
  * plus every pushed filter's referenced columns, so e.g. the defrag
  * stats pass (join keys + fragment flags, all L3) never pays the L7
  * parse, while the full 31-column convert is byte-identical to the
  * always-full behavior (level = [[Full]] — the staged path is pinned
  * ≡ the direct path per level by DissectorProps).
  *
  * `col_protocol` is [[Full]]: its value is last-writer-wins through
  * the whole chain (IPv4/IPv6 → UDP/TCP/ICMP → DNS/NTP/DHDiscover,
  * reference src/packetstats.rs:196-353), so any consumer reading it
  * needs the complete dissection.
  */
object DissectLevel {
  val L3 = 0
  val Transport = 1
  val Full = 2

  private val TransportCols = Set(
    "icmp_type", "udp_length", "udp_srcport", "udp_dstport",
    "tcp_flags", "tcp_srcport", "tcp_dstport")
  private val L7Cols = Set(
    "col_protocol", "dns_qry_name", "dns_qry_type",
    "ntp_priv_reqcode", "dhip_device")

  def ofColumn(name: String): Int =
    if (L7Cols.contains(name)) Full
    else if (TransportCols.contains(name)) Transport
    else L3

  /** The level a scan needs: the max over its required column names.
    * Unknown names (frame_bytes, linktype in bytes mode) are L3 — they
    * come from the framer, not the dissector.
    */
  def of(names: Iterable[String]): Int = {
    var lv = L3
    val it = names.iterator
    while (lv < Full && it.hasNext) lv = math.max(lv, ofColumn(it.next()))
    lv
  }
}
