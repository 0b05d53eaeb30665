package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.spark.{Defrag, PcapSource}
import PcapFixtures._

/** SURVEY §5.2 property commitments for the defrag pipeline, over randomly
  * generated fragment chains. Few cases (Spark job per case), wide shapes.
  */
object DefragProps extends Properties("defrag") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkTestBase.spark

  private val genChain = for {
    id <- Gen.chooseNum(1, 60000)
    srcLast <- Gen.chooseNum(1, 250)
    nTails <- Gen.chooseNum(1, 4)
    qname <- Gen.chooseNum(0, 9).map(i => s"gen$i.example.org")
  } yield (id, s"198.51.100.$srcLast", nTails, qname)

  private def capture(chains: List[(Int, String, Int, String)]): Array[Byte] = {
    var ts = 0L
    val frames = chains.flatMap { case (id, src, nTails, qname) =>
      val first = ethernet(0x0800, ipv4(src, "192.0.2.9", 17,
        udp(53, 41000, dnsQuery(qname, 1)), id = id, mf = true))
      val tails = (1 to nTails).map { k =>
        ethernet(0x0800, ipv4(src, "192.0.2.9", 17, Array.fill[Byte](16)(0x42),
          id = id, mf = k < nTails, fragOffset = k * 5))
      }
      (first +: tails).map { p => ts += 1; (ts, -1, p) }
    }
    legacyPcap(frames)
  }

  property("every first fragment's L7 fields propagate to ALL sibling fragments") =
    Prop.forAll(Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, genChain))) { chains0 =>
      // de-dup datagram keys so "the" first fragment is unambiguous
      val chains = chains0.distinctBy(c => (c._1, c._2))
      val dir = java.nio.file.Files.createTempDirectory("defragprop")
      val f = dir.resolve("p.pcap")
      java.nio.file.Files.write(f, capture(chains))
      val pcap = PcapSource.read(spark, f.toString).cache()
      val out = Defrag.defrag(pcap).collect()
      pcap.unpersist()
      val byKey = out.groupBy(r => (r.getAs[Int]("ip_id"), r.getAs[String]("ip_src")))
      chains.forall { case (id, src, nTails, qname) =>
        val rows = byKey((id, src))
        rows.length == nTails + 1 &&
          rows.forall(_.getAs[String]("dns_qry_name") == qname) &&
          rows.forall(_.getAs[Int]("udp_srcport") == 53)
      }
    }

  property("non-first fragments have no transport columns BEFORE defrag") =
    Prop.forAll(Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, genChain))) { chains0 =>
      val chains = chains0.distinctBy(c => (c._1, c._2))
      val dir = java.nio.file.Files.createTempDirectory("defragprop2")
      val f = dir.resolve("p.pcap")
      java.nio.file.Files.write(f, capture(chains))
      val pcap = PcapSource.read(spark, f.toString)
      val tails = pcap.filter(org.apache.spark.sql.functions.col("ip_frag_offset") > 0).collect()
      tails.nonEmpty && tails.forall { r =>
        r.isNullAt(r.fieldIndex("udp_srcport")) &&
          r.isNullAt(r.fieldIndex("dns_qry_name")) &&
          r.getAs[String]("col_protocol") == "IPv4"
      }
    }

  property("defrag preserves row count and never modifies non-fragmented rows") =
    Prop.forAll(Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, genChain))) { chains0 =>
      val chains = chains0.distinctBy(c => (c._1, c._2))
      val extra = ethernet(0x0800, ipv4("203.0.113.5", "192.0.2.9", 6, tcp(443, 9999, 0x02)))
      val dir = java.nio.file.Files.createTempDirectory("defragprop3")
      val f = dir.resolve("p.pcap")
      val base = capture(chains)
      // append a lone TCP SYN record
      val rec = java.nio.ByteBuffer.allocate(16 + extra.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      rec.putInt(99).putInt(0).putInt(extra.length).putInt(extra.length).put(extra)
      java.nio.file.Files.write(f, base ++ rec.array())
      val pcap = PcapSource.read(spark, f.toString).cache()
      val out = Defrag.defrag(pcap)
      val n = pcap.count()
      val syn = out.filter(org.apache.spark.sql.functions.col("ip_proto") === 6).collect()
      val ok = out.count() == n &&
        syn.length == 1 && syn.head.getAs[String]("tcp_flags") == "......S." &&
        syn.head.isNullAt(syn.head.fieldIndex("udp_srcport"))
      pcap.unpersist()
      ok
    }
}
