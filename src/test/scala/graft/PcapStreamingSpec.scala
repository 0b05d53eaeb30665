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
    lateBatchDefrag("pcap_stream_defrag_sink")
  }

  test("streaming defrag late-batch patch holds under the RocksDB state store") {
    graft.streaming.StateStores.withRocksDb(spark) {
      lateBatchDefrag("pcap_stream_defrag_rocks_sink")
    }
  }

  private def lateBatchDefrag(name: String): Unit = {
    val dir = Files.createTempDirectory("pcapstreamdefrag")
    // batch 1: the first fragment only (full DNS header)
    Files.write(dir.resolve("c1.pcap"), legacyPcap(Seq(
      (1000L, -1, ethernet(0x0800, ipv4("1.1.1.1", "2.2.2.2", 17,
        udp(53, 9999, dnsQuery("late.example.net", 1)), id = 77, mf = true))))))
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

  test("streaming defrag equals the coalesce model on randomized two-batch interleavings") {
    import graft.streaming.StreamingDefrag.{FragRow, defragStateful}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(42)
    // 50 datagrams: an ff (full fields) + 1-3 continuations (null fields);
    // ff always in batch 1, continuations split across both batches
    val rows = (0 until 50).flatMap { d =>
      val key = (s"10.0.$d.1", s"10.0.$d.2", 17.toShort, d)
      val ff = FragRow(key._1, key._2, key._3, key._4, 1000L * d, ip_mf = true, 0,
        Some(53), Some(40000 + d), None, Some(1), Some(s"d$d.example"), Some("DNS"))
      val conts = (1 to 1 + rnd.nextInt(3)).map { c =>
        (FragRow(key._1, key._2, key._3, key._4, 1000L * d + c,
          ip_mf = c == 1, c * 9, None, None, None, None, None, Some("IPv4")),
          rnd.nextBoolean()) // which batch the continuation lands in
      }
      ((ff, false)) +: conts
    }
    val mem = MemoryStream[FragRow]
    val name = "defrag_model_sink"
    val q = defragStateful(mem.toDF())
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try {
      mem.addData(rows.collect { case (r, false) => r })
      q.processAllAvailable()
      mem.addData(rows.collect { case (r, true) => r })
      q.processAllAvailable()
      val got = spark.table(name).collect()
        .map(r => (r.getAs[Long]("tsu"),
          r.getAs[String]("dns_qry_name"), r.getAs[String]("col_protocol"))).toSet
      // local model: every row of a key coalesces from its (unique) ff
      val expect = rows.map(_._1).map { r =>
        (r.tsu,
          r.dns_qry_name.getOrElse(s"d${r.ip_id}.example"),
          r.col_protocol.getOrElse("DNS"))
      }.toSet
      assert(got == expect)
    } finally q.stop()
  }
}
