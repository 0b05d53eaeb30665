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
}
