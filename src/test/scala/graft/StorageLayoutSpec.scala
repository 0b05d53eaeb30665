package graft

import org.apache.spark.sql.functions._

/** Storage-layout scale levers: bucketed tables for shuffle-free joins,
  * hive-style partitioned output for partition-pruned scans. These are the
  * 100 TB layout contracts — asserted on real plans.
  */
class StorageLayoutSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("p02 compaction collapses the small-file landing without losing content") {
    val (landing, compacted) = graft.queries.PipelineOps.p02Landing(spark, sf)
    def parts(d: String) = new java.io.File(d).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts(landing) == 32, s"landing should be 32 small files, got ${parts(landing)}")
    assert(parts(compacted) <= 4, s"compaction left ${parts(compacted)} files")
    // content-lossless: identical row multiset, not just identical counts
    val a = spark.read.parquet(landing).collect().map(_.toSeq).sorted(
      Ordering.by((s: Seq[Any]) => s.mkString("|")))
    val b = spark.read.parquet(compacted).collect().map(_.toSeq).sorted(
      Ordering.by((s: Seq[Any]) => s.mkString("|")))
    assert(a.sameElements(b))
  }

  test("z-ordered landing clusters the non-time dimension (bounded per-file boxes)") {
    // the q61 layout claim, measured: a time-ordered landing clusters
    // h16 for free but every file spans the whole user range; sorting by
    // the interleaved zkey shrinks the per-file user bounding box so a
    // user-range filter can prune row groups/files too
    val sf01 = "/root/testdata/sf0.01"
    import org.apache.spark.sql.expressions.Window
    // rank-normalize both dimensions to 8-bit quantile buckets before
    // interleaving (what production z-ordering does): raw values are
    // imbalanced — 8-bit user ids vs 14-bit epoch hours — so the hour's
    // high bits would dominate the key and halve the clustering win
    val ev = graft.queries.Tables.events(spark, sf01)
      .select(col("ts"),
        expr("user_id & 65535").as("u16"),
        expr("(ts div 1000) div 3600000000 & 65535").as("h16"))
      .withColumn("ub", (ntile(256).over(Window.orderBy("u16")) - 1).cast("long"))
      .withColumn("hb", (ntile(256).over(Window.orderBy("h16")) - 1).cast("long"))
      .withColumn("zkey", expr(graft.queries.PipelineOps.zkeyExpr("ub", "hb")))
      .drop("ub", "hb")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    graft.TempCleanup.registerDir(dir)
    ev.orderBy("zkey").write
      .option("maxRecordsPerFile", 250).parquet(s"$dir/z")
    ev.orderBy("ts").write
      .option("maxRecordsPerFile", 250).parquet(s"$dir/time")
    def avgUserSpan(path: String): Double =
      spark.read.parquet(path).withColumn("f", input_file_name())
        .groupBy("f").agg((max("u16") - min("u16")).as("du"))
        .agg(avg("du")).head().getDouble(0)
    val (zSpan, tSpan) = (avgUserSpan(s"$dir/z"), avgUserSpan(s"$dir/time"))
    info(f"per-file u16 span: z-ordered $zSpan%.1f vs time-ordered $tSpan%.1f")
    assert(zSpan < tSpan / 2,
      f"z-order failed to cluster users: $zSpan%.1f vs $tSpan%.1f")
    // the payoff, measured at the reader: a user-range filter is pushed
    // into the parquet scan, and row-group min/max stats let the reader
    // SKIP groups outside the range — the scan's numOutputRows counts
    // rows of surviving groups only. Z-ordered files have tight u16
    // boxes, so most groups are skipped; the time-ordered layout spans
    // all users per file and reads nearly everything.
    def scannedRows(path: String): Long = {
      val q = spark.read.parquet(path).filter(col("u16") >= 10 && col("u16") <= 20)
      q.collect()
      val scan = q.queryExecution.executedPlan.collectLeaves().head
      scan.metrics("numOutputRows").value
    }
    val (zRead, tRead) = (scannedRows(s"$dir/z"), scannedRows(s"$dir/time"))
    info(s"rows surviving row-group pruning: z-ordered $zRead vs time-ordered $tRead")
    assert(zRead * 2 < tRead,
      s"z-order row-group pruning ineffective: $zRead vs $tRead")
  }

  test("200-file landing: zone-map pruning x live deletion vectors reads <=2% of files and bytes") {
    // The round-6 outlook #3 soak: pruning and DVs COMPOSE correctly at a
    // 100x file count (200 files vs s19's 2-per-batch fixture), and the
    // pruned scan's footprint is measured, not asserted — a one-zone
    // range over a time-clustered landing with a live (uncompacted)
    // tombstone sidecar must read <= 2% of the files and bytes of the
    // full scan, and still return exactly the full scan's filtered rows.
    import graft.streaming.ManifestLand
    val spark = this.spark
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_dvzm_soak").toString + "/landing"
    new java.io.File(out).mkdirs()
    // 25 batches x 8 range parts = 200 zone-mapped files over k = 0..199999
    (0 until 25).foreach { b =>
      val lo = b * 8000L
      ManifestLand.commitBatch(
        spark.range(lo, lo + 8000L).select(col("id").as("k"), (col("id") * 7).as("v")),
        b.toLong, out, statsCols = Seq("k"), rangeParts = 8)
    }
    assert(ManifestLand.liveFiles(out).size == 200)
    // live deletion vectors: tombstone a scattered 1% (k % 97 == 0),
    // deliberately NOT compacted away — the merge-on-read path must hold
    val nDel = ManifestLand.deleteWhere(spark, out, col("k") % 97 === 0)
    assert(nDel == (0L until 200000L).count(_ % 97 == 0))
    assert(new java.io.File(out).listFiles().exists(f =>
      f.getName.startsWith("dv") && f.getName.endsWith(".parquet")),
      "DV sidecar must be live on disk (not compacted away)")
    // one-zone range: ~1/200 of the domain
    val (qlo, qhi) = (100000L, 100999L)
    val prunedFiles = ManifestLand.prunedLiveFiles(out, qlo, qhi)
    val allFiles = ManifestLand.liveFiles(out)
    def bytes(names: Seq[String]): Long =
      names.map(n => new java.io.File(out, n).length()).sum
    val (bPruned, bFull) = (bytes(prunedFiles), bytes(allFiles))
    info(s"dv-zonemap soak: files ${prunedFiles.size}/${allFiles.size}, " +
      s"bytes ${bPruned / 1024}KiB/${bFull / 1024}KiB")
    assert(prunedFiles.size <= 4,
      s"pruning kept ${prunedFiles.size} of 200 files for a one-zone range")
    assert(bPruned * 50 <= bFull, s"pruned scan reads >2% of bytes: $bPruned/$bFull")
    // exactness through the composition: pruned + residual == full +
    // filter, tombstones applied on BOTH sides, and no tombstoned row
    val viaZones = ManifestLand.readPruned(spark, out, qlo, qhi)
      .filter(col("k").between(qlo, qhi)).as[(Long, Long)].collect().sorted.toSeq
    val full = ManifestLand.read(spark, out)
      .filter(col("k").between(qlo, qhi)).as[(Long, Long)].collect().sorted.toSeq
    assert(viaZones == full, "pruned read diverged from the full scan")
    assert(viaZones.nonEmpty && viaZones.forall(_._1 % 97 != 0),
      "a tombstoned row survived the pruned read")
    assert(viaZones.size == (qlo to qhi).count(_ % 97 != 0))
  }

  test("bucketed tables join without a shuffle") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_bucketed")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("orders_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString()
      // co-located bucketed join: a sort-merge join with NO exchange
      // between the scans and the join
      assert(plan.contains("SortMergeJoin"), plan)
      val joinIdx = plan.indexOf("SortMergeJoin")
      val belowJoin = plan.substring(joinIdx)
      assert(!belowJoin.contains("Exchange hashpartitioning(l_orderkey"), plan)
      assert(!belowJoin.contains("Exchange hashpartitioning(o_orderkey"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("hour-partitioned event output gets partition-pruned scans") {
    val out = java.nio.file.Files.createTempDirectory("evpart").toString + "/events"
    graft.queries.Tables.events(spark, sf)
      .withColumn("hour_bucket", expr("(ts div 1000) div 3600000000"))
      .write.partitionBy("hour_bucket").mode("overwrite").parquet(out)
    val pruned = spark.read.parquet(out)
      .filter(col("hour_bucket") === 473354L)
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*hour_bucket[^\\]]*\\].*"), plan)
    // the pruned read touches exactly the one partition's rows
    val all = spark.read.parquet(out)
      .filter(col("hour_bucket") === 473354L).count()
    assert(pruned.count() == all && all > 0)
  }

  test("pcap table partitioned by capture file supports per-file pruning") {
    import PcapFixtures._
    val dir = java.nio.file.Files.createTempDirectory("pcappart")
    val mk = (n: String, id: Int) => java.nio.file.Files.write(dir.resolve(n),
      legacyPcap(Seq((id.toLong, -1, ethernet(0x0800,
        ipv4("1.1.1.1", "2.2.2.2", 17, udp(1, 2, Array.empty)))))))
    mk("x.pcap", 1); mk("y.pcap", 2)
    val out = dir.resolve("table").toString
    // pcap_file is a natural partition column for capture-lake layouts
    graft.spark.PcapSource.read(spark, dir.toString + "/*.pcap")
      .write.partitionBy("pcap_file").parquet(out)
    val part = spark.read.parquet(out).filter(col("pcap_file") === "x.pcap")
    assert(part.count() == 1)
    val plan = part.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters"), plan)
  }
}
