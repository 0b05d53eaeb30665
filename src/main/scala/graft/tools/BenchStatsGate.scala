package graft.tools

/** Interleaved A/B/C of the defrag stats job — fresh JVM, nothing else
  * run first, so the arms don't inherit another path's JIT/heap state
  * (BenchPcap's trailing stats rows sit after ~10 convert arms and have
  * read both directions across sessions). Arms:
  *
  *   - `gated`: the round-13..15 shipped shape — observe barrier below
  *     the ff filter on the dissectGate=first-fragment scan, ff
  *     aggregate spilled to parquet, spill re-counted;
  *   - `full`: the same observe+spill job on the ungated scan;
  *   - `fused` (round 16, the shipped shape): reader-side (total,
  *     fragmented) counting, ff filter PUSHED into the gated scan, job
  *     ends at the collected dictionary-encoded patch-map arrays — no
  *     spill round-trip ([[graft.spark.Defrag.statsAndBuild]]);
  *   - `fusedSort`: the fused job with the declarative min(struct)
  *     SortAggregate — since round 17 this IS the shipped ff argmin, so
  *     the pair inverted: the `fused` arm forces MinStructAgg's
  *     ObjectHashAggregate via `graft.agg.ffMinStruct` and `fusedSort`
  *     is the production default (tools.BenchFfArgminAB is the
  *     order-alternating pair-only version — prefer it; this tool's
  *     fixed arm order systematically flatters the last arm under
  *     decaying load).
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
    def scan(gated: Boolean, metricsKey: String = null) = {
      var r = spark.read.format("pcap").option("decodePartitions", shards)
      if (gated) r = r.option("_internal.dissectGate", "first-fragment")
      if (metricsKey != null) r = r.option("metricsKey", metricsKey)
      r.load(glob)
    }
    def runSpill(gated: Boolean): Double = {
      val spill = s"$dir/statsgate-ab.ffspill"
      graft.TempCleanup.rmrf(new java.io.File(spill))
      val t0 = System.nanoTime()
      graft.spark.Defrag.statsAndSpill(scan(gated), spill)
      val t = (System.nanoTime() - t0) / 1e9
      graft.TempCleanup.rmrf(new java.io.File(spill))
      t
    }
    def runFused(sortAggMin: Boolean = false): Double = {
      val key = java.util.UUID.randomUUID().toString
      val sm = graft.spark.PcapSource.statsMetrics(spark)
      graft.spark.PcapSource.registerMetrics(key, sm)
      if (!sortAggMin) sys.props("graft.agg.ffMinStruct") = "1"
      try {
        val t0 = System.nanoTime()
        val fused = graft.spark.Defrag.statsAndBuild(
          scan(gated = true, metricsKey = key), sm, Long.MaxValue)
        require(fused.ffKeys > 0 || fused.pct == 0.0, "fused stats came back empty")
        (System.nanoTime() - t0) / 1e9
      } finally {
        graft.spark.PcapSource.unregisterMetrics(key)
        sys.props.remove("graft.agg.ffMinStruct"); ()
      }
    }
    runSpill(gated = true); runSpill(gated = false) // JIT warmup
    runFused(); runFused(sortAggMin = true)
    val (g, f, u, us) = (Array.newBuilder[Double], Array.newBuilder[Double],
      Array.newBuilder[Double], Array.newBuilder[Double])
    (1 to rounds).foreach { r =>
      val a = runSpill(gated = true)
      val b = runSpill(gated = false)
      val c = runFused()
      val d = runFused(sortAggMin = true)
      g += a; f += b; u += c; us += d
      System.err.println(
        f"[stats-gate] round $r: gated $a%.2f s, full $b%.2f s, fused $c%.2f s, fusedSort $d%.2f s")
    }
    val (gb, gm) = graft.BenchEnv.bestMedian(g.result())
    val (fb, fm) = graft.BenchEnv.bestMedian(f.result())
    val (ub, um) = graft.BenchEnv.bestMedian(u.result())
    val (sb, sm_) = graft.BenchEnv.bestMedian(us.result())
    System.err.println(f"[stats-gate] gated best $gb%.2f s median $gm%.2f s; " +
      f"full best $fb%.2f s median $fm%.2f s; fused best $ub%.2f s median $um%.2f s; " +
      f"fusedSort best $sb%.2f s median $sm_%.2f s")
    println(f"""{"metric":"stats_gate_ab","gated_best_s":$gb%.3f,"gated_median_s":$gm%.3f,"full_best_s":$fb%.3f,"full_median_s":$fm%.3f,"fused_best_s":$ub%.3f,"fused_median_s":$um%.3f,"fused_sortagg_best_s":$sb%.3f,"fused_sortagg_median_s":$sm_%.3f,"glob":"$glob"}""")
    spark.stop()
  }
}
