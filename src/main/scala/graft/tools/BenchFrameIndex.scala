package graft.tools

/** Round-14 verdict #3: frame-index sidecar vs stride re-framing, on the
  * CLI's own sharded scan shapes. Interleaved arms in one warmed JVM
  * (every sequential pcap A/B on this box has mis-read at least once):
  *
  *   - `stride`: `frameIndex=false` — every shard re-frames the whole
  *     file, dissects its `frameIdx % N` stride (the pre-round-14 path);
  *   - `range`: sidecar-planned contiguous byte ranges — each shard
  *     frames only its 1/N of the bytes.
  *
  * Two scan shapes, because the framing SHARE differs: `l3` is the defrag
  * stats shape (L3-level staged dissection — framing is ~half the work,
  * the sidecar's best case) and `full` forces the complete dissection
  * (framing share smaller, win smaller). A warmup stride pass builds the
  * sidecars; the stride arm then disables them via the option.
  *
  * `--stream` (round 14, streaming range shards): arms become the
  * STREAMING read — landing → L3-pruned projection → parquet sink under
  * AvailableNow — stride vs sidecar ranges (the streaming source plans
  * through the same PcapShardPlan since round 14).
  *
  * Usage: `runMain graft.tools.BenchFrameIndex [fileGlob] [rounds] [--stream]`.
  */
object BenchFrameIndex {
  def main(args: Array[String]): Unit = {
    val dir = graft.BenchEnv.pcapCorpusDir()
    val pos = args.filterNot(_.startsWith("--"))
    val glob0 = pos.headOption.getOrElse(s"$dir/*.pcap")
    val rounds = if (pos.length > 1) pos(1).toInt else 3
    val spark = graft.BenchEnv.abSession()
    import org.apache.spark.sql.functions._
    // --ng (round 15, verdict #4): same arms over a pcapng derivation of
    // the corpus (one-time convert via the pcapng writer, cached next to
    // the source with a staleness MANIFEST) — measures the stateful
    // sidecar's range shards against stride re-framing
    val glob = if (args.contains("--ng")) ngCorpus(spark, glob0) else glob0
    val container = if (args.contains("--ng")) "pcapng" else "legacy"
    val shards = graft.BenchEnv.pcapShards(spark, glob)
    if (args.contains("--stream")) { streamAb(spark, dir, glob, shards, rounds); return }

    def scan(useIndex: Boolean) = spark.read.format("pcap")
      .option("decodePartitions", shards)
      .option("frameIndex", useIndex).load(glob)
    // shape 0/1 = L3 stats-pass projection; 2/3 = full dissection
    def arm(kind: Int): Double = {
      val t0 = System.nanoTime()
      val useIndex = kind % 2 == 1
      val df = scan(useIndex)
      val agg = if (kind < 2)
        df.agg(count(lit(1)), sum("ip_id"), sum("ip_frag_offset"))
      else
        df.agg(count(lit(1)), sum("dns_qry_type"), sum("udp_srcport"),
          sum(length(col("col_protocol"))))
      agg.collect()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup arm 1: frameIndex=true with no sidecar yet = stride mode,
    // shard 0 BUILDS the sidecars the later range arms consume
    arm(1)
    require(graft.sources.PcapFileEnum
      .list(Seq(glob), spark.sessionState.newHadoopConf())
      .forall(f => graft.pcapio.FrameIndex
        .read(new org.apache.hadoop.fs.Path(f),
          spark.sessionState.newHadoopConf()).isDefined),
      "warmup did not build sidecars — corpus files too small?")
    Seq(0, 2, 3).foreach(arm) // JIT warmup for the remaining arms, discarded
    val builders = Array.fill(4)(Array.newBuilder[Double])
    (1 to rounds).foreach { r =>
      val ts = (0 to 3).map { k => val t = arm(k); builders(k) += t; t }
      System.err.println(f"[frame-index] round $r: l3-stride ${ts(0)}%.2f s, " +
        f"l3-range ${ts(1)}%.2f s, full-stride ${ts(2)}%.2f s, full-range ${ts(3)}%.2f s")
    }
    val Seq((sb, sm), (rb, rm), (fsb, fsm), (frb, frm)) =
      builders.toSeq.map(b => graft.BenchEnv.bestMedian(b.result()))
    System.err.println(f"[frame-index] l3 stride $sb%.2f/$sm%.2f s vs range " +
      f"$rb%.2f/$rm%.2f s (${sm / rm}%.2fx); full stride $fsb%.2f/$fsm%.2f s " +
      f"vs range $frb%.2f/$frm%.2f s (${fsm / frm}%.2fx)")
    println(f"""{"metric":"frame_index_ab","l3_stride_best_s":$sb%.3f,"l3_stride_median_s":$sm%.3f,"l3_range_best_s":$rb%.3f,"l3_range_median_s":$rm%.3f,"full_stride_best_s":$fsb%.3f,"full_stride_median_s":$fsm%.3f,"full_range_best_s":$frb%.3f,"full_range_median_s":$frm%.3f,"shards":$shards,"container":"$container","glob":"$glob"}""")
    spark.stop()
  }

  /** One-time pcapng derivation of a legacy corpus (`--ng`): each source
    * file converts byte-for-byte through the pcapng WRITER (SHB + lazy
    * IDBs + EPBs) into `<parent>-ng/<base>.pcapng`; a MANIFEST of source
    * names + lengths detects staleness. Returns the ng glob.
    */
  private def ngCorpus(spark: org.apache.spark.sql.SparkSession,
      glob: String): String = {
    val hconf = spark.sessionState.newHadoopConf()
    val files = graft.sources.PcapFileEnum.list(Seq(glob), hconf)
    require(files.nonEmpty, s"--ng: no files under $glob")
    val parent = new java.io.File(
      new org.apache.hadoop.fs.Path(files.head).getParent.toUri.getPath)
    val ngDir = new java.io.File(parent.getPath + "-ng")
    val manifest = new java.io.File(ngDir, "MANIFEST")
    val want = files.map(f => s"$f:${new java.io.File(
      new org.apache.hadoop.fs.Path(f).toUri.getPath).length()}").mkString("\n")
    val fresh = manifest.exists() &&
      new String(java.nio.file.Files.readAllBytes(manifest.toPath), "UTF-8") == want
    if (!fresh) {
      graft.TempCleanup.rmrf(ngDir)
      ngDir.mkdirs()
      files.foreach { f =>
        val base = new org.apache.hadoop.fs.Path(f).getName
          .stripSuffix(".pcap")
        val tmp = new java.io.File(ngDir, s".conv-$base")
        spark.read.format("pcap").option("bytes", "true").load(f)
          .coalesce(1).write.format("pcap").option("format", "pcapng")
          .mode("append").save(tmp.getPath)
        val part = tmp.listFiles().filter(_.getName.endsWith(".pcapng"))
        require(part.length == 1, s"--ng convert of $f produced ${part.length} parts")
        require(part.head.renameTo(new java.io.File(ngDir, s"$base.pcapng")),
          s"--ng: rename failed for $base")
        graft.TempCleanup.rmrf(tmp)
        System.err.println(s"[frame-index --ng] converted $f")
      }
      java.nio.file.Files.write(manifest.toPath, want.getBytes("UTF-8"))
    }
    s"${ngDir.getPath}/*.pcapng"
  }

  /** `--stream`: stride vs range on the STREAMING read (see class doc).
    * Requires sidecars to exist (run the default mode once, or any
    * sharded batch read of the corpus).
    */
  private def streamAb(spark: org.apache.spark.sql.SparkSession,
      dir: String, glob: String, shards: Int, rounds: Int): Unit = {
    import org.apache.spark.sql.functions._
    require(graft.sources.PcapFileEnum
      .list(Seq(glob), spark.sessionState.newHadoopConf())
      .forall(f => graft.pcapio.FrameIndex
        .read(new org.apache.hadoop.fs.Path(f),
          spark.sessionState.newHadoopConf()).isDefined),
      "--stream needs sidecars: run the default mode (or a sharded batch read) first")
    def arm(useIndex: Boolean): Double = {
      val out = s"$dir/fidx-stream-out.parquet"
      val ckpt = s"$dir/fidx-stream-ckpt"
      graft.TempCleanup.rmrf(new java.io.File(out))
      graft.TempCleanup.rmrf(new java.io.File(ckpt))
      val t0 = System.nanoTime()
      val q = spark.readStream.format("pcap")
        .option("decodePartitions", shards)
        .option("frameIndex", useIndex).load(glob)
        .select(col("frame_time"), col("ip_src"), col("ip_dst"),
          col("ip_proto"), col("ip_id"), col("ip_frag_offset"), col("ip_mf"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .option("compression", "zstd")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val t = (System.nanoTime() - t0) / 1e9
      graft.TempCleanup.rmrf(new java.io.File(out))
      graft.TempCleanup.rmrf(new java.io.File(ckpt))
      t
    }
    arm(true); arm(false) // JIT warmup, discarded
    val (ra, rb) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (1 to rounds).foreach { r =>
      val a = arm(useIndex = true); val b = arm(useIndex = false)
      ra += a; rb += b
      System.err.println(
        f"[frame-index --stream] round $r: range $a%.2f s, stride $b%.2f s")
    }
    val (ab, am) = graft.BenchEnv.bestMedian(ra.result())
    val (bb, bm) = graft.BenchEnv.bestMedian(rb.result())
    System.err.println(f"[frame-index --stream] range best $ab%.2f s median " +
      f"$am%.2f s; stride best $bb%.2f s median $bm%.2f s (${bm / am}%.2fx)")
    println(f"""{"metric":"frame_index_stream_ab","range_best_s":$ab%.3f,"range_median_s":$am%.3f,"stride_best_s":$bb%.3f,"stride_median_s":$bm%.3f,"shards":$shards,"glob":"$glob"}""")
    spark.stop()
  }
}
