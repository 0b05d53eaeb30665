package graft.tools

import org.apache.spark.sql.SparkSession

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
    val defaultDir =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
        "/dev/shm/graft-pcap-bench"
      else "/tmp/graft-pcap-bench"
    val glob = args.headOption.getOrElse(s"$defaultDir/*.pcap")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val localDir = graft.BenchEnv.localDir()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = s"$defaultDir/ffspill-ab.parquet"
    def read() = {
      val nFiles = math.max(1, graft.sources.PcapFileEnum
        .list(Seq(glob), spark.sessionState.newHadoopConf()).size)
      val shards = math.max(1, math.min(1024, math.ceil(
        spark.sparkContext.defaultParallelism.toDouble / nFiles).toInt))
      spark.read.format("pcap").option("decodePartitions", shards).load(glob)
    }
    def convert(spill: Boolean): Double = {
      val t0 = System.nanoTime()
      val (df, choice) =
        if (spill) graft.spark.Defrag.applyWithSpill(read(), s"$out.ffspill")
        else graft.spark.Defrag.applyWithChoice(read())
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
    def stats(xs: Array[Double]): (Double, Double) = {
      val s = xs.sorted; (s.head, s(s.length / 2))
    }
    val (sb, sm) = stats(sp.result()); val (lb, lm) = stats(lz.result())
    System.err.println(f"[ff-spill] spill best $sb%.2f s median $sm%.2f s; " +
      f"lazy best $lb%.2f s median $lm%.2f s")
    println(f"""{"metric":"ff_spill_ab","spill_best_s":$sb%.3f,"spill_median_s":$sm%.3f,"lazy_best_s":$lb%.3f,"lazy_median_s":$lm%.3f,"glob":"$glob"}""")
    graft.TempCleanup.rmrf(new java.io.File(out))
    spark.stop()
  }
}
