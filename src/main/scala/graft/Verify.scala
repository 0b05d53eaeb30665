package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
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
    new java.io.File(outDir).mkdirs()
    // per-query watchdog: one pathological query must not stall the whole
    // correctness dump. Each query runs in its own Spark job group; on
    // timeout only THAT group is cancelled (interrupting its thread), so
    // an abandoned query can't keep submitting work or kill a successor's
    // jobs.
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "600").toLong
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    SparkEntry.all.foreach { query =>
      val name = query.name
      try {
        val f = Future {
          spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
          try {
            query.build(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            // aux exports AFTER the main result (overwrite would wipe the
            // subdirs); same job group so the watchdog covers them
            query.aux.foreach { case (auxName, auxFn) =>
              auxFn(spark, sfDir).coalesce(1).write.mode("overwrite")
                .parquet(s"$outDir/$name/$auxName")
            }
          } finally spark.sparkContext.clearJobGroup()
        }
        Await.result(f, timeoutSec.seconds)
      } catch {
        case _: java.util.concurrent.TimeoutException =>
          System.err.println(s"[verify] $name timed out after ${timeoutSec}s")
          spark.sparkContext.cancelJobGroup(name)
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // {OUT} → this run's absolute output dir, so oracles can read the aux
    // intermediates exported above from wherever the driver pointed us
    val absOut = new java.io.File(outDir).getAbsolutePath
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{OUT}", absOut))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
