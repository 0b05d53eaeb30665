#!/usr/bin/env python3
"""SURVEY §5.4 defrag differential: run the reference's defrag SQL
(verbatim from /root/reference/src/main.rs:292-296) in DuckDB over the
nodefrag packet table, and diff against the engine's Defrag output.

Usage: python3 tools/defrag_differential.py <nodefrag.parquet> <defragged.parquet>
"""
import sys

import duckdb

FF_SQL = ("create view ff as select ip_src, ip_dst, ip_id, ip_proto, "
          "first(udp_srcport) as udp_srcport, first(udp_dstport) as udp_dstport, "
          "first(ntp_priv_reqcode) as ntp_priv_reqcode, first(dns_qry_type) as dns_qry_type, "
          "first(dns_qry_name) as dns_qry_name, first(col_protocol) as col_protocol "
          "from pcap where ip_proto=17 and ip_mf=1 and ip_frag_offset=0 group by all")

RAW_SQL = ("create view raw as select pcap.* exclude (udp_srcport, udp_dstport, "
           "ntp_priv_reqcode, dns_qry_type, dns_qry_name, col_protocol), "
           "coalesce(pcap.udp_srcport, ff.udp_srcport) as udp_srcport, "
           "coalesce(pcap.udp_dstport, ff.udp_dstport) as udp_dstport, "
           "coalesce(pcap.ntp_priv_reqcode,ff.ntp_priv_reqcode) as ntp_priv_reqcode, "
           "coalesce(pcap.dns_qry_type, ff.dns_qry_type) as dns_qry_type, "
           "coalesce(pcap.dns_qry_name, ff.dns_qry_name) as dns_qry_name, "
           "coalesce(pcap.col_protocol, ff.col_protocol) as col_protocol "
           "from pcap left join ff using (ip_src,ip_dst, ip_proto, ip_id)")


def canon(con, sql):
    rel = con.sql(sql)
    cols = sorted(rel.columns)
    rows = con.sql(
        f"SELECT {', '.join(cols)} FROM ({sql})").fetchall()
    return cols, sorted((tuple(str(v) for v in r) for r in rows))


def main(nodefrag, defragged):
    con = duckdb.connect()
    con.execute(f"create view pcap as select * from '{nodefrag}/*.parquet'")
    con.execute(FF_SQL)
    con.execute(RAW_SQL)
    ref_cols, ref_rows = canon(con, "select * from raw")
    got_cols, got_rows = canon(con, f"select * from '{defragged}/*.parquet'")
    if ref_cols != got_cols:
        print(f"✗ column mismatch: ref={ref_cols} got={got_cols}")
        return 1
    if len(ref_rows) != len(got_rows):
        print(f"✗ row count: ref={len(ref_rows)} got={len(got_rows)}")
        return 1
    bad = sum(1 for a, b in zip(ref_rows, got_rows) if a != b)
    if bad:
        first = next((a, b) for a, b in zip(ref_rows, got_rows) if a != b)
        print(f"✗ {bad}/{len(ref_rows)} rows differ; first: ref={first[0][:6]} got={first[1][:6]}")
        return 1
    print(f"✓ defrag differential: {len(ref_rows)} rows identical to the reference SQL")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
