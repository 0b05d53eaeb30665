package graft.tools

/** Round-13 verdict #4: bound what a columnar broadcast-patch operator
  * could recover on the defrag-convert write. Interleaved arms over the
  * SAME stride-sharded scan and vector-direct write:
  *
  *   - `join`: broadcast defrag join from a PRE-BUILT ff spill (built
  *     once, outside timing) — row-shaped plan, so the write re-batches
  *     through RowToColumnarExec;
  *   - `nojoin`: the identical scan written directly — pure columnar,
  *     no join, no rebatch.
  *
  * The gap (join − nojoin) upper-bounds join + ColumnarToRow + rebatch
  * together — everything a vector-direct patch operator could possibly
  * remove (it would still pay the hash lookups). Decision rule from the
  * verdict: build the operator only if the gap is ≥15% of the join arm.
  *
  * Usage: `runMain graft.tools.BenchRebatchBound [fileGlob] [rounds]`.
  */
object BenchRebatchBound {
  def main(args: Array[String]): Unit = {
    val dir = graft.BenchEnv.pcapCorpusDir()
    val glob = args.headOption.getOrElse(s"$dir/*.pcap")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = graft.BenchEnv.abSession()
    val out = s"$dir/rebatch-ab.parquet"
    val spill = s"$dir/rebatch-ab.ffspill"
    // ff spill built ONCE, untimed — both timed arms then cost exactly
    // one dissect pass plus their write, so the gap isolates the join +
    // rebatch machinery rather than the stats pass
    graft.spark.Defrag.firstFragments(graft.BenchEnv.pcapRead(spark, glob))
      .write.mode("overwrite").option("compression", "zstd").parquet(spill)
    def arm(join: Boolean): Double = {
      val t0 = System.nanoTime()
      val pcap = graft.BenchEnv.pcapRead(spark, glob)
      val df =
        if (join) graft.spark.Defrag.defragWith(pcap,
          spark.read.parquet(spill), broadcastFF = true)
        else pcap
      require(graft.spark.PcapColumnarWrite.write(df, out, "zstd",
        singleFile = false, rebatch = true), "vector write refused")
      (System.nanoTime() - t0) / 1e9
    }
    arm(join = true); arm(join = false) // JIT warmup, discarded
    val (tj, tn) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (1 to rounds).foreach { r =>
      val a = arm(join = true)
      val b = arm(join = false)
      tj += a; tn += b
      System.err.println(f"[rebatch-bound] round $r: join $a%.2f s, nojoin $b%.2f s")
    }
    val (jb, jm) = graft.BenchEnv.bestMedian(tj.result())
    val (nb, nm) = graft.BenchEnv.bestMedian(tn.result())
    val gapPct = 100.0 * (jm - nm) / jm
    System.err.println(f"[rebatch-bound] join best $jb%.2f s median $jm%.2f s; " +
      f"nojoin best $nb%.2f s median $nm%.2f s; median gap $gapPct%.1f%%")
    println(f"""{"metric":"rebatch_bound_ab","join_best_s":$jb%.3f,"join_median_s":$jm%.3f,"nojoin_best_s":$nb%.3f,"nojoin_median_s":$nm%.3f,"median_gap_pct":$gapPct%.1f,"glob":"$glob"}""")
    graft.TempCleanup.rmrf(new java.io.File(out))
    graft.TempCleanup.rmrf(new java.io.File(spill))
    spark.stop()
  }
}
