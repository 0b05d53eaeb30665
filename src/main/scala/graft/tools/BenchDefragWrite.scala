package graft.tools

/** Interleaved A/B of the defrag-convert WRITE path (round 11): the
  * vector-direct writer (rebatch through RowToColumnarExec where the
  * plan is row-shaped) vs the standard FileFormatWriter, on whatever
  * corpus BenchPcap generated. Rounds MUST interleave (the BenchCodec
  * lesson — a sequential per-arm sweep hands the win to whichever arm
  * runs last under this box's ±2× drift); both arms share the same
  * warmed JVM and alternate A,B,A,B…, reporting per-arm best + median.
  *
  * Usage: `runMain graft.tools.BenchDefragWrite [fileGlob] [rounds]`
  * (default glob = BenchPcap's tmpfs corpus, rounds = 3 per arm).
  */
object BenchDefragWrite {
  def main(args: Array[String]): Unit = {
    val defaultDir = graft.BenchEnv.pcapCorpusDir()
    val glob = args.headOption.getOrElse(s"$defaultDir/*.pcap")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = graft.BenchEnv.abSession()
    val out = s"$defaultDir/defragwrite-ab.parquet"
    def convert(rowWrite: Boolean, forceVector: Boolean = false): Double = {
      val t0 = System.nanoTime()
      // forceVector drives the writer directly (so a branch-gated CLI
      // could not hide the rebatch arm) — with the SAME stride-sharded
      // read the CLI plans, or the arm reads at per-file parallelism
      // and the A/B measures the scan, not the writer (caught
      // in-session: an unsharded vector arm lost 6.05 vs 3.58 s at 10M
      // where the sharded CLI had measured the opposite)
      if (forceVector) {
        val (df, _) = graft.spark.Defrag.applyWithSpill(
          graft.BenchEnv.pcapRead(spark, glob), s"$out.ffspill")
        val ok = graft.spark.PcapColumnarWrite.write(df, out, "zstd",
          singleFile = false, rebatch = true)
        require(ok, "vector write refused")
        graft.TempCleanup.rmrf(new java.io.File(s"$out.ffspill"))
      } else {
        graft.spark.PcapConvert.run(spark, graft.spark.PcapConvert.Args(
          file = glob, out = out, singleFile = false, cache = Some(false),
          rowWrite = rowWrite))
      }
      (System.nanoTime() - t0) / 1e9
    }
    // warm both branches and both writers once, discarded
    sys.props("graft.defrag.maxBroadcastFF") = "0"
    try { convert(rowWrite = false); () }
    finally sys.props.remove("graft.defrag.maxBroadcastFF")
    convert(rowWrite = true)
    convert(rowWrite = false, forceVector = true)
    val (vec, row) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (1 to rounds).foreach { r =>
      val v = convert(rowWrite = false, forceVector = true)
      val w = convert(rowWrite = true)
      vec += v; row += w
      System.err.println(f"[defrag-write] round $r: vector $v%.2f s, row $w%.2f s")
    }
    val (vb, vm) = graft.BenchEnv.bestMedian(vec.result())
    val (rb, rm) = graft.BenchEnv.bestMedian(row.result())
    System.err.println(
      f"[defrag-write] vector best $vb%.2f s median $vm%.2f s; " +
        f"row best $rb%.2f s median $rm%.2f s")
    println(f"""{"metric":"defrag_write_ab","vector_best_s":$vb%.3f,"vector_median_s":$vm%.3f,"row_best_s":$rb%.3f,"row_median_s":$rm%.3f,"glob":"$glob"}""")
    spark.stop()
  }
}
