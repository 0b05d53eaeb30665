package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times each headline query end-to-end (plan build +
  * execution to a full materialization) and prints one JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // the 64-column minhash signature aggregate must stay inside
      // whole-stage codegen (default maxFields=100 silently disables it)
      .config("spark.sql.codegen.maxFields", "300")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first timed query doesn't absorb startup
    spark.range(1000).selectExpr("sum(id)").collect()
    // heavy pair-generation queries last so their GC pressure can't bleed
    // into the cheap scans' timings
    val ordered = SparkEntry.headline.sortBy(q => if (q.name.startsWith("d")) 1 else 0)
    val results = ordered.map { q =>
      // best-of-2: this box's run-to-run variance is large; steady-state
      // (plan compiled, page cache warm) is the meaningful number
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n =
          try q.build(spark, sfDir).count()
          catch { case e: Throwable =>
            System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}"); -1L
          }
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache() // queries may cache; isolate timings
        (sec, n)
      }
      val (sec, n) = times.minBy(_._1)
      System.err.println(f"[bench] ${q.name}%-24s $sec%8.3f s  ($n rows)")
      q.name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
