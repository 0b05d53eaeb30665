package graft.tools

import org.apache.spark.sql.SparkSession

/** Steady-state micro-timer for one declared query — the iteration aid
  * Bench's best-of-2 can't provide when a single operator is being
  * tuned (first-run JIT/codegen warmup dominates cold timings on this
  * box and run-to-run variance is ±2×).
  *
  * Usage: `runMain graft.tools.TimeQuery <name> [sfDir] [iters]`
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQuery <queryName> [sfDir] [iters]")
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 4
    val localDir = graft.BenchEnv.localDir()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "300")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val build = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; have: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    for (i <- 1 to iters) {
      val t0 = System.nanoTime()
      // noop-sink write, NOT count(): count() lets Catalyst prune every
      // unused output expression, so a projection-heavy query times a
      // plan that skips exactly the expressions being tuned (Bench's
      // round-2 lesson — the tuning tool must measure what the gate runs)
      build(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"[timequery] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
