package graft.tools

/** Interleaved A/B of the round-13 speculative single-pass convert
  * (stats ride the output write as accumulators after a driver-side
  * prefix sample) vs the two-pass stats+write flow, on BenchPcap's
  * UNFRAGMENTED tcp-mix corpus — the shape the speculation exists for.
  * Rounds MUST interleave (this box drifts ±2× sequentially).
  *
  * Usage: `runMain graft.tools.BenchSpeculate [fileGlob] [rounds]`.
  */
object BenchSpeculate {
  def main(args: Array[String]): Unit = {
    val dir = graft.BenchEnv.pcapCorpusDir()
    val glob = args.headOption.getOrElse(s"$dir/tcp/cap*.pcap")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = graft.BenchEnv.abSession()
    val out = s"$dir/speculate-ab.parquet"
    def run(speculate: Boolean): Double = {
      if (!speculate) sys.props("graft.convert.noSpeculate") = "1"
      try {
        val t0 = System.nanoTime()
        graft.spark.PcapConvert.run(spark, graft.spark.PcapConvert.Args(
          file = glob, out = out, singleFile = false))
        (System.nanoTime() - t0) / 1e9
      } finally sys.props.remove("graft.convert.noSpeculate")
    }
    run(speculate = true); run(speculate = false) // JIT warmup, discarded
    val (sp, tw) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (1 to rounds).foreach { r =>
      val a = run(speculate = true)
      val b = run(speculate = false)
      sp += a; tw += b
      System.err.println(
        f"[speculate] round $r: single-pass $a%.2f s, two-pass $b%.2f s")
    }
    val (ab, am) = graft.BenchEnv.bestMedian(sp.result())
    val (bb, bm) = graft.BenchEnv.bestMedian(tw.result())
    System.err.println(f"[speculate] single-pass best $ab%.2f s median $am%.2f s; " +
      f"two-pass best $bb%.2f s median $bm%.2f s")
    println(f"""{"metric":"speculate_ab","single_pass_best_s":$ab%.3f,"single_pass_median_s":$am%.3f,"two_pass_best_s":$bb%.3f,"two_pass_median_s":$bm%.3f,"glob":"$glob"}""")
    graft.TempCleanup.rmrf(new java.io.File(out))
    spark.stop()
  }
}
