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
  * Usage: `runMain graft.tools.BenchFrameIndex [fileGlob] [rounds]`.
  */
object BenchFrameIndex {
  def main(args: Array[String]): Unit = {
    val dir = graft.BenchEnv.pcapCorpusDir()
    val glob = args.headOption.getOrElse(s"$dir/*.pcap")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = graft.BenchEnv.abSession()
    import org.apache.spark.sql.functions._
    val shards = graft.BenchEnv.pcapShards(spark, glob)

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
    println(f"""{"metric":"frame_index_ab","l3_stride_best_s":$sb%.3f,"l3_stride_median_s":$sm%.3f,"l3_range_best_s":$rb%.3f,"l3_range_median_s":$rm%.3f,"full_stride_best_s":$fsb%.3f,"full_stride_median_s":$fsm%.3f,"full_range_best_s":$frb%.3f,"full_range_median_s":$frm%.3f,"shards":$shards,"glob":"$glob"}""")
    spark.stop()
  }
}
