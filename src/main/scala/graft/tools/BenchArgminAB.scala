package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved order-alternating A/B for the MinStructAgg argmin
  * (round-17 verdict item 1b): arm A = MinStructAgg (production), arm
  * B = declarative `min(struct)` via the `graft.agg.noMinStruct`
  * sysprop, both in ONE warmed JVM, alternating (A,B) / (B,A) per
  * round so neither arm owns the tail of the session (CLAUDE.md:
  * sequential per-arm sweeps hand the win to whichever runs last).
  *
  * Usage: `runMain graft.tools.BenchArgminAB [query] [sfDir] [rounds]`
  * (default e06_ivf_pq — the only headline row whose plan carries the
  * argmin at the KMeans/PQ sites).
  */
object BenchArgminAB {
  def main(args: Array[String]): Unit = {
    val name = if (args.length > 0) args(0) else "e06_ivf_pq"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 2) args(2).toInt else 6
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.local.dir", graft.BenchEnv.localDir())
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "300")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val build = graft.SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
    def run(noMinStruct: Boolean): Double = {
      if (noMinStruct) sys.props("graft.agg.noMinStruct") = "1"
      else sys.props.remove("graft.agg.noMinStruct")
      val t0 = System.nanoTime()
      build(spark, dir).write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    // discarded warmups, one per arm (JIT ramp must not land on an arm)
    run(false); run(true)
    val a = collection.mutable.ArrayBuffer[Double]()
    val b = collection.mutable.ArrayBuffer[Double]()
    for (r <- 1 to rounds) {
      val aFirst = r % 2 == 1
      if (aFirst) { a += run(false); b += run(true) }
      else { b += run(true); a += run(false) }
      println(f"[argmin-ab] round $r: minstruct ${a.last}%.3f s  declarative ${b.last}%.3f s" +
        (if (aFirst) "  (A first)" else "  (B first)"))
    }
    def stats(xs: Seq[Double]) = { val s = xs.sorted; (s.head, s(s.size / 2)) }
    val (ab, am) = stats(a.toSeq); val (bb, bm) = stats(b.toSeq)
    println(f"[argmin-ab] $name minstruct   best $ab%.3f  median $am%.3f")
    println(f"[argmin-ab] $name declarative best $bb%.3f  median $bm%.3f")
    spark.stop()
  }
}
