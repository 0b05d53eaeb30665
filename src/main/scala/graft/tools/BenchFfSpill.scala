package graft.tools

/** Interleaved A/B of the round-12 ff SPILL (one stats+spill job, join
  * reads ff back — 2 full dissect passes) vs the round-11 lazy path
  * (stats pass + ff aggregate subtree re-parsing the capture + probe
  * side — 3 passes), both on the adaptive broadcast branch with the
  * same stride-sharded read and vector write. Rounds MUST interleave
  * (BenchCodec lesson; this box drifts ±2× sequentially).
  *
  * Usage: `runMain graft.tools.BenchFfSpill [fileGlob] [rounds]`.
  */
object BenchFfSpill {
  def main(args: Array[String]): Unit = {
    val dir = graft.BenchEnv.pcapCorpusDir()
    val glob = args.headOption.getOrElse(s"$dir/*.pcap")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = graft.BenchEnv.abSession()
    val out = s"$dir/ffspill-ab.parquet"
    def convert(spill: Boolean): Double = {
      val t0 = System.nanoTime()
      val (df, choice) =
        if (spill) graft.spark.Defrag.applyWithSpill(
          graft.BenchEnv.pcapRead(spark, glob), s"$out.ffspill")
        else graft.spark.Defrag.applyWithChoice(
          graft.BenchEnv.pcapRead(spark, glob))
      require(choice == graft.spark.Defrag.BroadcastJoin, s"planned $choice")
      require(graft.spark.PcapColumnarWrite.write(df, out, "zstd",
        singleFile = false, rebatch = true), "vector write refused")
      val s = (System.nanoTime() - t0) / 1e9
      graft.TempCleanup.rmrf(new java.io.File(s"$out.ffspill"))
      s
    }
    convert(spill = true); convert(spill = false) // JIT warmup, discarded
    val (sp, lz) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (1 to rounds).foreach { r =>
      val a = convert(spill = true)
      val b = convert(spill = false)
      sp += a; lz += b
      System.err.println(f"[ff-spill] round $r: spill $a%.2f s, lazy $b%.2f s")
    }
    val (sb, sm) = graft.BenchEnv.bestMedian(sp.result())
    val (lb, lm) = graft.BenchEnv.bestMedian(lz.result())
    System.err.println(f"[ff-spill] spill best $sb%.2f s median $sm%.2f s; " +
      f"lazy best $lb%.2f s median $lm%.2f s")
    println(f"""{"metric":"ff_spill_ab","spill_best_s":$sb%.3f,"spill_median_s":$sm%.3f,"lazy_best_s":$lb%.3f,"lazy_median_s":$lm%.3f,"glob":"$glob"}""")
    graft.TempCleanup.rmrf(new java.io.File(out))
    spark.stop()
  }
}
