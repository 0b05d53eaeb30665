package graft.tools

/** Interleaved A/B of the defrag JOIN branch (round 12): the broadcast
  * join the distinct-key guard now picks on key-collided captures vs
  * the bypass-split shuffle join the old row-count guard forced at 100M
  * packets. Rounds MUST interleave (the BenchCodec lesson — sequential
  * arms hand the win to whichever runs last under this box's ±2×
  * drift); both arms run the FULL convert (same stride-sharded read,
  * same ff spill, same vector write) in one warmed JVM, alternating
  * A,B,A,B…; the branch is forced per arm through the
  * `graft.defrag.maxBroadcastFF` ceiling (0 ⇒ shuffle; default ⇒
  * whatever the adaptive guard picks — asserted per arm so a
  * silently-flipped guard can't invalidate the experiment).
  *
  * Usage: `runMain graft.tools.BenchDefragBranch [fileGlob] [rounds]`
  * (default glob = BenchPcap's tmpfs corpus, rounds = 3 per arm).
  */
object BenchDefragBranch {
  def main(args: Array[String]): Unit = {
    val dir = graft.BenchEnv.pcapCorpusDir()
    val glob = args.headOption.getOrElse(s"$dir/*.pcap")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = graft.BenchEnv.abSession()
    val out = s"$dir/defragbranch-ab.parquet"
    def convert(forceShuffle: Boolean): Double = {
      if (forceShuffle) sys.props("graft.defrag.maxBroadcastFF") = "0"
      else sys.props.remove("graft.defrag.maxBroadcastFF")
      try {
        val t0 = System.nanoTime()
        val (df, choice) = graft.spark.Defrag.applyWithSpill(
          graft.BenchEnv.pcapRead(spark, glob), s"$out.ffspill")
        val expect =
          if (forceShuffle) graft.spark.Defrag.ShuffleBypass
          else graft.spark.Defrag.BroadcastJoin
        require(choice == expect,
          s"arm forceShuffle=$forceShuffle planned $choice, not $expect — " +
            "the corpus does not discriminate the branches (regen it, or " +
            "the adaptive guard changed)")
        val ok = graft.spark.PcapColumnarWrite.write(df, out, "zstd",
          singleFile = false, rebatch = true)
        require(ok, "vector write refused")
        val s = (System.nanoTime() - t0) / 1e9
        graft.TempCleanup.rmrf(new java.io.File(s"$out.ffspill"))
        s
      } finally sys.props.remove("graft.defrag.maxBroadcastFF")
    }
    // warm BOTH branches once, discarded (JIT ramp — first defrag join
    // in a JVM measured 7.4 vs 4.1 s for identical code, round 9)
    convert(forceShuffle = true)
    convert(forceShuffle = false)
    val (bc, sh) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (1 to rounds).foreach { r =>
      val b = convert(forceShuffle = false)
      val s = convert(forceShuffle = true)
      bc += b; sh += s
      System.err.println(
        f"[defrag-branch] round $r: broadcast $b%.2f s, shuffle $s%.2f s")
    }
    val (bb, bm) = graft.BenchEnv.bestMedian(bc.result())
    val (sb, sm) = graft.BenchEnv.bestMedian(sh.result())
    System.err.println(
      f"[defrag-branch] broadcast best $bb%.2f s median $bm%.2f s; " +
        f"shuffle best $sb%.2f s median $sm%.2f s")
    println(f"""{"metric":"defrag_branch_ab","broadcast_best_s":$bb%.3f,"broadcast_median_s":$bm%.3f,"shuffle_best_s":$sb%.3f,"shuffle_median_s":$sm%.3f,"glob":"$glob"}""")
    graft.TempCleanup.rmrf(new java.io.File(out))
    spark.stop()
  }
}
