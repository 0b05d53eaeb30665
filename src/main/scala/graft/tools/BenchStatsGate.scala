package graft.tools

/** Interleaved A/B of the defrag stats+spill job on the
  * dissectGate=first-fragment scan vs the plain scan — fresh JVM,
  * nothing else run first, so the arms don't inherit another path's
  * JIT/heap state (BenchPcap's trailing stats rows sit after ~10
  * convert arms and have read both directions across sessions).
  *
  * Usage: `runMain graft.tools.BenchStatsGate [fileGlob] [rounds]`.
  */
object BenchStatsGate {
  def main(args: Array[String]): Unit = {
    val dir = graft.BenchEnv.pcapCorpusDir()
    val glob = args.headOption.getOrElse(s"$dir/*.pcap")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = graft.BenchEnv.abSession()
    val shards = graft.BenchEnv.pcapShards(spark, glob)
    def scan(gated: Boolean) = {
      val r = spark.read.format("pcap").option("decodePartitions", shards)
      (if (gated) r.option("_internal.dissectGate", "first-fragment") else r).load(glob)
    }
    def run(gated: Boolean): Double = {
      val spill = s"$dir/statsgate-ab.ffspill"
      graft.TempCleanup.rmrf(new java.io.File(spill))
      val t0 = System.nanoTime()
      graft.spark.Defrag.statsAndSpill(scan(gated), spill)
      val t = (System.nanoTime() - t0) / 1e9
      graft.TempCleanup.rmrf(new java.io.File(spill))
      t
    }
    run(gated = true); run(gated = false) // JIT warmup, discarded
    val (g, f) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (1 to rounds).foreach { r =>
      val a = run(gated = true)
      val b = run(gated = false)
      g += a; f += b
      System.err.println(f"[stats-gate] round $r: gated $a%.2f s, full $b%.2f s")
    }
    val (gb, gm) = graft.BenchEnv.bestMedian(g.result())
    val (fb, fm) = graft.BenchEnv.bestMedian(f.result())
    System.err.println(f"[stats-gate] gated best $gb%.2f s median $gm%.2f s; " +
      f"full best $fb%.2f s median $fm%.2f s")
    println(f"""{"metric":"stats_gate_ab","gated_best_s":$gb%.3f,"gated_median_s":$gm%.3f,"full_best_s":$fb%.3f,"full_median_s":$fm%.3f,"glob":"$glob"}""")
    spark.stop()
  }
}
