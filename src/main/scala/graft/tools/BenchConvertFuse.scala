package graft.tools

/** Interleaved A/B of the FULL convert with the round-16 fused stats
  * pass vs the round-15 observe+spill flow — both arms in one warmed
  * JVM, alternating (A,B,A,B…), identical scan/write shapes; only the
  * stats job differs (`graft.convert.noFuseStats` restores the old
  * flow). This is the verdict-#1 "done" instrument: the claim is a
  * full-convert improvement, so the full CLI pipeline is what's timed.
  *
  * Usage: `runMain graft.tools.BenchConvertFuse [fileGlob] [rounds]`.
  */
object BenchConvertFuse {
  def main(args: Array[String]): Unit = {
    val dir = graft.BenchEnv.pcapCorpusDir()
    val glob = args.headOption.getOrElse(s"$dir/*.pcap")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = graft.BenchEnv.abSession()
    val out = s"$dir/convert-fuse-ab.parquet"
    def arm(fused: Boolean): Double = {
      graft.TempCleanup.rmrf(new java.io.File(out))
      if (!fused) sys.props("graft.convert.noFuseStats") = "1"
      try {
        val t0 = System.nanoTime()
        graft.spark.PcapConvert.run(spark, graft.spark.PcapConvert.Args(
          file = glob, out = out, singleFile = false))
        (System.nanoTime() - t0) / 1e9
      } finally {
        sys.props.remove("graft.convert.noFuseStats")
        ()
      }
    }
    // warmup, discarded: both arms once (JIT ramp on the defrag paths is
    // multi-second — never trust a first arm), plus a shuffle-branch
    // ramp on a forced tiny ceiling like BenchPcap's warmup contract
    arm(fused = true); arm(fused = false)
    val (a, b) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (1 to rounds).foreach { r =>
      val x = arm(fused = true)
      val y = arm(fused = false)
      a += x; b += y
      System.err.println(
        f"[convert-fuse] round $r: fused $x%.2f s, spill $y%.2f s")
    }
    val (ab, am) = graft.BenchEnv.bestMedian(a.result())
    val (bb, bm) = graft.BenchEnv.bestMedian(b.result())
    val gain = 100.0 * (bm - am) / bm
    System.err.println(f"[convert-fuse] fused best $ab%.2f s median $am%.2f s; " +
      f"spill best $bb%.2f s median $bm%.2f s; median gain $gain%.1f%%")
    println(f"""{"metric":"convert_fuse_ab","fused_best_s":$ab%.3f,"fused_median_s":$am%.3f,"spill_best_s":$bb%.3f,"spill_median_s":$bm%.3f,"median_gain_pct":$gain%.1f,"glob":"$glob"}""")
    graft.TempCleanup.rmrf(new java.io.File(out))
    spark.stop()
  }
}
