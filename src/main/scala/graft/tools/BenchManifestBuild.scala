package graft.tools

import org.apache.spark.sql.functions._

/** Decomposition A/B for [[graft.sources.ConvertManifest.build]] (round
  * 16, verdict #5): interleaved arms over a converted output —
  *
  *   - `build`: the real single-pass build (agg + streamed write);
  *   - `agg`:   the same aggregate alone (noop sink) — isolates the
  *              scan + groupBy + sized-bloom cost from the driver-side
  *              streaming write;
  *   - `scan`:  the 3-column + _metadata scan with a plain count-only
  *              agg — the floor any per-file index build must pay.
  *
  * Usage: `runMain graft.tools.BenchManifestBuild [outDir] [rounds]`.
  */
object BenchManifestBuild {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      graft.BenchEnv.pcapCorpusDir() + "/out.parquet")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = graft.BenchEnv.abSession()
    def withFile = spark.read.parquet(dir).select(
      expr("_metadata.file_name").as("__f"),
      unix_micros(col("frame_time").cast("timestamp")).as("__ts"),
      col("ip_src"), col("ip_dst"))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def armBuild(): Double =
      time { graft.sources.ConvertManifest.build(spark, dir); () }
    def armAgg(): Double = time {
      withFile.groupBy(col("__f")).agg(
        count(lit(1)).as("rows"),
        min(col("__ts")).as("tsMin"), max(col("__ts")).as("tsMax"),
        graft.functions.SizedBloomAgg.sized_bloom_agg(
          xxhash64(col("ip_src"))).as("srcB"),
        graft.functions.SizedBloomAgg.sized_bloom_agg(
          xxhash64(col("ip_dst"))).as("dstB"))
        .write.mode("overwrite").format("noop").save()
    }
    def armScan(): Double = time {
      withFile.groupBy(col("__f")).agg(count(lit(1)).as("rows"))
        .write.mode("overwrite").format("noop").save()
    }
    armBuild(); armAgg(); armScan() // JIT warmup, discarded
    val bs = Array.newBuilder[Double]
    val as = Array.newBuilder[Double]
    val ss = Array.newBuilder[Double]
    (1 to rounds).foreach { r =>
      val b = armBuild(); val a = armAgg(); val s = armScan()
      bs += b; as += a; ss += s
      System.err.println(
        f"[manifest-build] round $r: build $b%.2f s, agg $a%.2f s, scan $s%.2f s")
    }
    val (bb, bm) = graft.BenchEnv.bestMedian(bs.result())
    val (ab, am) = graft.BenchEnv.bestMedian(as.result())
    val (sb, sm) = graft.BenchEnv.bestMedian(ss.result())
    System.err.println(f"[manifest-build] build best $bb%.2f s median $bm%.2f s; " +
      f"agg best $ab%.2f s median $am%.2f s; scan best $sb%.2f s median $sm%.2f s")
    println(f"""{"metric":"manifest_build_ab","build_best_s":$bb%.3f,"build_median_s":$bm%.3f,"agg_best_s":$ab%.3f,"agg_median_s":$am%.3f,"scan_best_s":$sb%.3f,"scan_median_s":$sm%.3f,"dir":"$dir"}""")
    spark.stop()
  }
}
