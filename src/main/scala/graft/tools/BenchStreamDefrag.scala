package graft.tools

/** Interleaved A/B of the round-13 sortless first-fragment pick vs the
  * round-12 group-sort inside the streaming defrag state function —
  * landing → stateful back-fill → parquet sink under AvailableNow, both
  * arms the same stride-sharded read. Rounds MUST interleave (this box
  * drifts ±2× sequentially).
  *
  * `--bypass` flips the A/B to bypass-split vs plain (both sortless):
  * the split skips the state shuffle for non-UDP rows at the price of a
  * second source scan per micro-batch — corpus-dependent, measure on
  * the traffic shape you mean to deploy on.
  *
  * Usage: `runMain graft.tools.BenchStreamDefrag [fileGlob] [rounds] [--bypass]`.
  */
object BenchStreamDefrag {
  def main(args: Array[String]): Unit = {
    val dir = graft.BenchEnv.pcapCorpusDir()
    val pos = args.filterNot(_.startsWith("--"))
    val bypassAb = args.contains("--bypass")
    val glob = pos.headOption.getOrElse(s"$dir/cap*.pcap")
    val rounds = if (pos.length > 1) pos(1).toInt else 3
    val spark = graft.BenchEnv.abSession()
    val shards = graft.BenchEnv.pcapShards(spark, glob)
    def run(sortless: Boolean): Double = {
      val out = s"$dir/sdefrag-ab-out.parquet"
      val ckpt = s"$dir/sdefrag-ab-ckpt"
      graft.TempCleanup.rmrf(new java.io.File(out))
      graft.TempCleanup.rmrf(new java.io.File(ckpt))
      val t0 = System.nanoTime()
      val src = spark.readStream.format("pcap")
        .option("decodePartitions", shards).load(glob)
      val projected = graft.streaming.StreamingDefrag.project(src)
      // plain A/B: sortless vs sorted pick; --bypass A/B: split vs
      // plain (arm flag reused as "use the split")
      val transformed =
        if (bypassAb && sortless)
          graft.streaming.StreamingDefrag.defragStatefulSplit(projected)
        else if (bypassAb) // plain comparison arm: sortless, no split
          graft.streaming.StreamingDefrag.defragStateful(projected)
        else graft.streaming.StreamingDefrag.defragStateful(projected, sortless)
      val q = transformed
        .writeStream.outputMode("append").format("parquet")
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
    run(sortless = true); run(sortless = false) // JIT warmup, discarded
    val (sl, so) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (1 to rounds).foreach { r =>
      val a = run(sortless = true)
      val b = run(sortless = false)
      sl += a; so += b
      System.err.println(
        f"[stream-defrag] round $r: sortless $a%.2f s, sorted $b%.2f s")
    }
    val (ab, am) = graft.BenchEnv.bestMedian(sl.result())
    val (bb, bm) = graft.BenchEnv.bestMedian(so.result())
    System.err.println(f"[stream-defrag] sortless best $ab%.2f s median $am%.2f s; " +
      f"sorted best $bb%.2f s median $bm%.2f s")
    println(f"""{"metric":"stream_defrag_ab","sortless_best_s":$ab%.3f,"sortless_median_s":$am%.3f,"sorted_best_s":$bb%.3f,"sorted_median_s":$bm%.3f,"glob":"$glob"}""")
    spark.stop()
  }
}
