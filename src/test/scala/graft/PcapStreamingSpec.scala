package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import PcapFixtures._

/** Streaming pcap ingestion: a landing directory consumed as a
  * micro-batch stream; late-arriving files picked up in later batches.
  */
class PcapStreamingSpec extends SparkFunSuite {

  private def capture(id: Int): Array[Byte] = {
    val frames = Seq(
      (1000L * id, ethernet(0x0800, ipv4("10.0.0.1", "10.0.0.2", 17,
        udp(5353, 53, dnsQuery(s"s$id.example.com", 1))))),
      (1000L * id + 1, ethernet(0x0800, ipv4("10.0.0.3", "10.0.0.4", 6,
        tcp(443, 1000 + id, 0x12)))))
    legacyPcap(frames.map { case (ts, b) => (ts, -1, b) })
  }

  test("readStream over a pcap landing dir: drains existing, picks up new files") {
    val dir = Files.createTempDirectory("pcapstream")
    Files.write(dir.resolve("c1.pcap"), capture(1))
    Files.write(dir.resolve("c2.pcap"), capture(2))
    val name = "pcap_stream_sink"
    val q = spark.readStream.format("pcap").load(dir.toString)
      .groupBy("col_protocol").agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      q.processAllAvailable()
      val r1 = spark.table(name).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(r1 == Map("DNS" -> 2L, "TCP" -> 2L))
      // a new file lands → next batch extends the aggregate
      Files.write(dir.resolve("c3.pcap"), capture(3))
      q.processAllAvailable()
      val r2 = spark.table(name).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(r2 == Map("DNS" -> 3L, "TCP" -> 3L))
    } finally q.stop()
  }

  test("streaming defrag: a continuation fragment in a LATER batch is patched from state") {
    val dir = Files.createTempDirectory("pcapstreamdefrag")
    // batch 1: the first fragment only (full DNS header)
    Files.write(dir.resolve("c1.pcap"), legacyPcap(Seq(
      (1000L, -1, ethernet(0x0800, ipv4("1.1.1.1", "2.2.2.2", 17,
        udp(53, 9999, dnsQuery("late.example.net", 1)), id = 77, mf = true))))))
    val name = "pcap_stream_defrag_sink"
    val q = graft.streaming.StreamingDefrag.defragStateful(
        graft.streaming.StreamingDefrag.project(
          spark.readStream.format("pcap").load(dir.toString)))
      .writeStream.outputMode("append").format("memory").queryName(name)
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() == 1)
      // batch 2: the continuation fragment lands later — no transport
      // header of its own; it must be back-filled from the carried state
      Files.write(dir.resolve("c2.pcap"), legacyPcap(Seq(
        (2000L, -1, ethernet(0x0800, ipv4("1.1.1.1", "2.2.2.2", 17,
          Array.fill[Byte](8)(0), id = 77, mf = false, fragOffset = 4))))))
      q.processAllAvailable()
      val rows = spark.table(name).orderBy("tsu").collect()
      assert(rows.length == 2)
      val late = rows(1)
      assert(late.getAs[String]("dns_qry_name") == "late.example.net", late)
      assert(late.getAs[Int]("udp_srcport") == 53, late)
      // coalesce keeps the fragment's own non-null "IPv4" — the
      // reference's exact back-fill semantics (see PcapPipelineSpec)
      assert(late.getAs[String]("col_protocol") == "IPv4", late)
    } finally q.stop()
  }
}
