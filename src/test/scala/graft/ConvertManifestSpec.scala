package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import PcapFixtures._

/** Convert-output pruning manifest (round 15, verdict #6): `-m` indexes
  * the written parquet with per-part-file frame_time zone maps and
  * ip_src/ip_dst blooms; [[graft.sources.ConvertManifest.slice]] reads
  * only part files that MAY match and re-applies the predicates — so a
  * pruned slice must be row-identical to a filtered full scan, while
  * actually skipping files. A missing or corrupt manifest degrades to
  * the full scan, never an error.
  */
class ConvertManifestSpec extends SparkFunSuite {
  import graft.sources.ConvertManifest

  private def writeCapture(dir: java.nio.file.Path, name: String,
      srcs: Seq[String], tsBase: Long, n: Int): Unit = {
    val frames = (0 until n).map { i =>
      val p = ethernet(0x0800, ipv4(srcs(i % srcs.length), "198.51.100.9",
        17, udp(4000, 53, Array[Byte](1, 2)), id = i & 0xffff))
      (tsBase + i, -1, p)
    }
    Files.write(dir.resolve(name), legacyPcap(frames))
  }

  test("-m manifest: pruned slice ≡ filtered full scan, and files really prune") {
    val in = Files.createTempDirectory("cm_in")
    // three time-disjoint captures with disjoint source sets → three
    // part files whose zone maps and blooms can each reject the others'
    // slices
    writeCapture(in, "a.pcap", Seq("10.0.0.1", "10.0.0.2"), 1000000L, 2000)
    writeCapture(in, "b.pcap", Seq("10.0.1.1", "10.0.1.2"), 9000000L, 2000)
    writeCapture(in, "c.pcap", Seq("10.0.2.1", "10.0.2.2"), 17000000L, 2000)
    val out = Files.createTempDirectory("cm_out").toString + "/out.parquet"
    graft.spark.PcapConvert.run(spark, graft.spark.PcapConvert.Args(
      file = in.toString + "/*.pcap", out = out, nodefrag = true,
      singleFile = false, manifest = true))
    val entries = ConvertManifest.read(spark, out)
    assert(entries.isDefined && entries.get.length >= 3,
      s"expected >=3 indexed part files, got ${entries.map(_.length)}")
    assert(entries.get.map(_.rows).sum == 6000L)
    // the manifest file must be invisible to a plain parquet read
    assert(spark.read.parquet(out).count() == 6000L)

    def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
      df.select(df.columns.sorted.map(col): _*)
        .collect().map(_.toSeq.map(String.valueOf)).toSeq.sortBy(_.mkString(" "))
    val full = spark.read.parquet(out)
    val ts = unix_micros(col("frame_time").cast("timestamp"))

    // window slice (file b's range only)
    val w = ConvertManifest.slice(spark, out,
      tsLoMicros = Some(9000500L), tsHiMicros = Some(9001500L))
    assert(canon(w) == canon(
      full.filter(ts >= 9000500L && ts <= 9001500L)))
    assert(w.count() == 1001L)
    val wFiles = ConvertManifest.prunedFiles(spark, out,
      tsLoMicros = Some(9000500L), tsHiMicros = Some(9001500L)).get
    assert(wFiles.length < entries.get.length,
      s"window slice pruned nothing: $wFiles")

    // source slice (file c's bloom only; others reject)
    val s = ConvertManifest.slice(spark, out, src = Some("10.0.2.1"))
    assert(canon(s) == canon(full.filter(col("ip_src") === "10.0.2.1")))
    assert(s.count() == 1000L)
    val sFiles = ConvertManifest.prunedFiles(spark, out,
      src = Some("10.0.2.1")).get
    assert(sFiles.length < entries.get.length,
      s"source slice pruned nothing: $sFiles")

    // combined window + src + dst
    val c = ConvertManifest.slice(spark, out,
      tsLoMicros = Some(0L), tsHiMicros = Some(2000000L),
      src = Some("10.0.0.2"), dst = Some("198.51.100.9"))
    assert(canon(c) == canon(full.filter(ts <= 2000000L &&
      col("ip_src") === "10.0.0.2" && col("ip_dst") === "198.51.100.9")))

    // a slice nothing can match: zero rows, schema intact
    val z = ConvertManifest.slice(spark, out, src = Some("203.0.113.77"),
      tsLoMicros = Some(99999999999L))
    assert(z.columns.toSeq == full.columns.toSeq && z.count() == 0L)

    // corrupt manifest → full-scan fallback, same rows
    val mf = new java.io.File(out, ConvertManifest.FileName)
    Files.write(mf.toPath, "garbage not a manifest".getBytes("UTF-8"))
    assert(ConvertManifest.read(spark, out).isEmpty)
    assert(canon(ConvertManifest.slice(spark, out, src = Some("10.0.2.1"))) ==
      canon(full.filter(col("ip_src") === "10.0.2.1")))
    // absent manifest → same fallback
    assert(mf.delete())
    assert(canon(ConvertManifest.slice(spark, out,
      tsLoMicros = Some(9000500L), tsHiMicros = Some(9001500L))) ==
      canon(full.filter(ts >= 9000500L && ts <= 9001500L)))
  }

  test("manifest v2: torn/truncated writes and unknown versions degrade to the full scan") {
    val in = Files.createTempDirectory("cm_in3")
    writeCapture(in, "a.pcap", Seq("10.0.0.1", "10.0.0.2"), 1000000L, 2000)
    writeCapture(in, "b.pcap", Seq("10.0.1.1", "10.0.1.2"), 9000000L, 2000)
    val out = Files.createTempDirectory("cm_out3").toString + "/out.parquet"
    graft.spark.PcapConvert.run(spark, graft.spark.PcapConvert.Args(
      file = in.toString + "/*.pcap", out = out, nodefrag = true,
      singleFile = false, manifest = true))
    assert(ConvertManifest.read(spark, out).exists(_.length >= 2))
    val mf = new java.io.File(out, ConvertManifest.FileName)
    val intact = Files.readAllBytes(mf.toPath)

    // truncation AT A LINE BOUNDARY is the dangerous case (round-16
    // ADVICE): every surviving line still parses, so a trailer-less
    // format would silently prune the files whose entries were cut off
    val text = new String(intact, "UTF-8")
    val secondLineEnd = text.indexOf('\n', text.indexOf('\n') + 1)
    Files.write(mf.toPath, text.substring(0, secondLineEnd + 1).getBytes("UTF-8"))
    assert(ConvertManifest.read(spark, out).isEmpty,
      "a cleanly-truncated manifest must refuse, not prune from a prefix")
    // and the slice still equals the full scan (fallback, not an error)
    assert(ConvertManifest.slice(spark, out, src = Some("10.0.1.1")).count() ==
      spark.read.parquet(out).filter(col("ip_src") === "10.0.1.1").count())

    // mid-line truncation and a flipped body byte: CRC refuses both
    Files.write(mf.toPath, intact.dropRight(40))
    assert(ConvertManifest.read(spark, out).isEmpty)
    val flipped = intact.clone()
    flipped(intact.length / 2) = (flipped(intact.length / 2) ^ 0x01).toByte
    Files.write(mf.toPath, flipped)
    assert(ConvertManifest.read(spark, out).isEmpty)

    // version pin: same layout under an older/newer header token → None
    Files.write(mf.toPath,
      ("graft-convert-manifest v1\n" + text.split("\n", 2)(1)).getBytes("UTF-8"))
    assert(ConvertManifest.read(spark, out).isEmpty,
      "unknown manifest versions must degrade to the full scan")

    // the intact bytes still validate (the clone above really was a copy)
    Files.write(mf.toPath, intact)
    assert(ConvertManifest.read(spark, out).exists(_.length >= 2))
  }

  test("manifest on a many-file layout: per-file-sized blooms, streamed build") {
    // 12 part files from one capture via a repartitioned copy — the
    // round-16 single-pass build must index each with a bloom sized
    // from ITS OWN ndv and prune point lookups across all of them
    val in = Files.createTempDirectory("cm_in4")
    writeCapture(in, "w.pcap",
      (0 until 64).map(i => s"10.7.${i / 8}.${i % 8}"), 1000000L, 6400)
    val out = Files.createTempDirectory("cm_out4").toString + "/many.parquet"
    spark.read.format("pcap").load(in.toString + "/w.pcap")
      .repartition(12).write.parquet(out)
    val n = ConvertManifest.build(spark, out)
    assert(n == 12, s"expected 12 indexed part files, got $n")
    val entries = ConvertManifest.read(spark, out).get
    assert(entries.length == 12 && entries.map(_.rows).sum == 6400L)
    assert(entries == entries.sortBy(_.name), "entries must stream name-sorted")
    // per-file sizing: round-robin repartition spreads ~64 sources per
    // file → every bloom sits at the 2^16-bit floor (not some global
    // max), and membership holds for each file's own sources
    assert(entries.forall(_.srcBloom.length * 32 == 65536))
    val full = spark.read.parquet(out)
    val probe = "10.7.3.5"
    assert(ConvertManifest.slice(spark, out, src = Some(probe)).count() ==
      full.filter(col("ip_src") === probe).count())
    // dst bloom: single destination → pruning keeps all files for it,
    // and a never-seen dst prunes everything
    assert(ConvertManifest.prunedFiles(spark, out,
      dst = Some("203.0.113.99")).get.isEmpty)
    assert(ConvertManifest.slice(spark, out, dst = Some("203.0.113.99")).count() == 0L)
  }

  test("-m manifest on a defragged convert output (the CLI's default path)") {
    val in = Files.createTempDirectory("cm_in2")
    val f = in.resolve("frag.pcap").toString
    graft.spark.PcapGen.write(f, 30000, 1700000000000000L)
    val out = Files.createTempDirectory("cm_out2").toString + "/out.parquet"
    graft.spark.PcapConvert.run(spark, graft.spark.PcapConvert.Args(
      file = f, out = out, singleFile = false, manifest = true, jobs = 3))
    val entries = ConvertManifest.read(spark, out)
    assert(entries.isDefined && entries.get.map(_.rows).sum == 30000L)
    val full = spark.read.parquet(out)
    // pick a real source and slice on it — rows must match the filter
    val probe = full.select("ip_src").where(col("ip_src").isNotNull)
      .head().getString(0)
    val sliced = ConvertManifest.slice(spark, out, src = Some(probe))
    assert(sliced.count() ==
      full.filter(col("ip_src") === probe).count())
    assert(sliced.count() > 0L)
  }
}
