package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.streaming.StreamingDefrag
import graft.streaming.StreamingDefrag.FragRow

/** Round-13 pin: the sortless single-pass first-fragment pick equals
  * the round-12 sortBy reference — and the whole stateful transform
  * emits the same ROW MULTISET either way (order was never a contract:
  * the parquet sink's order is partition-arbitrary and the s07 oracle
  * compares sorted).
  */
object StreamingDefragPickProps extends Properties("streaming-defrag-pick") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  private val genOptInt = Gen.option(Gen.chooseNum(0, 65535))
  private val genOptShort = Gen.option(Gen.chooseNum(0, 255).map(_.toShort))
  private val genOptStr =
    Gen.option(Gen.oneOf("a.example", "b.example", "DNS", "UDP", "NTP"))

  private val genRow: Gen[FragRow] = for {
    tsu <- Gen.chooseNum(0L, 5L) // tight range forces tsu ties
    mf <- Gen.oneOf(true, false)
    off <- Gen.oneOf(0, 0, 0, 6, 12) // bias toward first fragments
    proto <- Gen.frequency(4 -> Gen.const(17.toShort), // mostly UDP…
      1 -> Gen.oneOf(6.toShort, 1.toShort)) // …some TCP/ICMP (bypass slice)
    us <- genOptInt; ud <- genOptInt; ntp <- genOptShort
    dt <- genOptInt; dn <- genOptStr; cp <- genOptStr
  } yield FragRow("1.1.1.1", "2.2.2.2", proto, 7, tsu, mf, off, us, ud, ntp, dt, dn, cp)

  private val genGroup = Gen.chooseNum(1, 12).flatMap(Gen.listOfN(_, genRow))

  property("single-pass min pick ≡ sortBy-find pick, all tie shapes") =
    Prop.forAll(genGroup) { rows =>
      def isFf(r: FragRow) = r.ip_proto == 17 && r.ip_mf && r.ip_frag_offset == 0
      val viaSort = rows.sortBy(r => (r.tsu, r.udp_srcport, r.udp_dstport,
        r.ntp_priv_reqcode, r.dns_qry_type, r.dns_qry_name, r.col_protocol))
        .find(isFf)
      val ffs = rows.filter(isFf)
      val viaMin =
        if (ffs.isEmpty) None else Some(ffs.min(StreamingDefrag.ffOrdering))
      Prop(viaSort == viaMin) :| s"sort=$viaSort min=$viaMin"
    }

  property("defragStateful sortless ≡ sorted: same row multiset (batch mode)") =
    Prop.forAll(Gen.chooseNum(1, 4).flatMap(n =>
        Gen.listOfN(n, Gen.zip(Gen.chooseNum(0, 2), genGroup)))) { keyed =>
      val spark = SparkTestBase.spark
      import spark.implicits._
      // distinct ip_id per generated group index so groups don't merge
      val rows = keyed.zipWithIndex.flatMap { case ((idv, rs), i) =>
        rs.map(_.copy(ip_id = idv * 100 + i))
      }
      val df = rows.toDF()
      def canon(d: org.apache.spark.sql.DataFrame): Seq[String] =
        d.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
      // round 14: the sentinel-coded path (opt-in — it changes the
      // state schema, so the checkpoint-compatible boxed coding stays
      // the default) vs boxed sortless vs boxed sorted — all three must
      // emit the same row multiset AND the same schema (the sentinel
      // path's when()-restore must reproduce the nullable types exactly)
      val sentinelDf = StreamingDefrag.defragStateful(df, sortless = true,
        sentinel = true)
      val boxedDf = StreamingDefrag.defragStateful(df, sortless = true,
        sentinel = false)
      val sentinel = canon(sentinelDf)
      val boxed = canon(boxedDf)
      val sorted = canon(StreamingDefrag.defragStateful(df, sortless = false,
        sentinel = false))
      // the bypass split routes non-UDP rows around the state shuffle —
      // same multiset again (the split proof: no UDP row ever bypasses)
      val split = canon(StreamingDefrag.defragStatefulSplit(df))
      Prop(sentinel == boxed && sentinel == sorted && split == sentinel &&
        sentinelDf.schema == boxedDf.schema) :| "multiset/schema diverged"
    }
}
