package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Queries run CONCURRENTLY (SPARK_GRAFT_VERIFY_PAR worker threads,
  * default 8, 1 = the old serial behavior) under a FAIR scheduler, each
  * in its own pool + job group. A single local[32] Spark easily overlaps
  * several of these queries — most are short and leave the cluster idle
  * during their planning/oracle-free phases — which cuts the gate's wall
  * time roughly by the worker count. Safe because every query writes its
  * own output dir, temp view names are query-unique, streaming sinks are
  * UUID-named, and all queries are deterministic by construction.
  */
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
      // fair sharing across the concurrently-running queries: a long
      // pair-generation query must not starve the quick scans queued
      // behind it (pools get equal shares; FIFO within a pool)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.spark.LogHygiene.quietKnownBoundedWindowWarning()
    new java.io.File(outDir).mkdirs()
    // normalize BEFORE deriving the aux sibling: a trailing-slash outDir
    // ("/tmp/vout/") would otherwise turn s"${outDir}_aux" into
    // "/tmp/vout/_aux" — aux back INSIDE the compared tree (File strips
    // the trailing separator)
    val outAbs = new java.io.File(outDir).getAbsolutePath
    val auxAbs = s"${outAbs}_aux"
    // a pre-round-4 run may have left $outDir/_aux behind; the driver
    // enumerates $outDir subdirs, so purge any legacy aux tree before
    // writing (aux now lives in the ${outDir}_aux sibling)
    // TempCleanup.rmrf, never a local recursive delete: the shared helper
    // does NOT follow directory symlinks (CLAUDE.md rule — the sharded
    // gate fixtures are symlink trees into read-only testdata)
    TempCleanup.rmrf(new java.io.File(s"$outDir/_aux"))
    // per-query watchdog: one pathological query must not stall the whole
    // correctness dump. Each query runs in its own Spark job group; on
    // timeout only THAT group is cancelled (interrupting its thread), so
    // an abandoned query can't keep submitting work or kill a successor's
    // jobs. The timeout clock starts when a worker PICKS UP the query,
    // not when it was queued.
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "600").toLong
    val par = math.max(1, sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "8").toInt)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val workers = java.util.concurrent.Executors.newFixedThreadPool(par)
    val runners = java.util.concurrent.Executors.newCachedThreadPool()
    val wec = ExecutionContext.fromExecutor(workers)
    val rec = ExecutionContext.fromExecutor(runners)
    // iteration aid: SPARK_GRAFT_VERIFY_ONLY=d30_bpe_learn,q01_... dumps
    // (and lists in oracle_sql.json) just those queries, so a single
    // operator can be gated in seconds instead of re-running all 100
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.all.filter(q => only.forall(_.contains(q.name)))
    val futures = selected.map { query =>
      val name = query.name
      Future {
        val inner = Future {
          // thread-locals: scope this query's jobs to its own FAIR pool
          // and cancellable group (runner threads are reused — set both
          // explicitly every time)
          spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
          spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
          try {
            query.build(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            // aux exports live OUTSIDE $outDir entirely: the driver's
            // gate reads $outDir/$name RECURSIVELY (round-2 lesson: aux
            // subdirs inside result dirs broke 7 queries), and round 3
            // showed the driver also ENUMERATES $outDir subdirs — a
            // $outDir/_aux dir produced a spurious `err` row in
            // CORRECTNESS_r03.json. So aux goes to the SIBLING dir
            // ${outDir}_aux; oracles still write {OUT}/_aux/... and the
            // substitution below re-roots that prefix.
            query.aux.foreach { case (auxName, auxFn) =>
              auxFn(spark, sfDir).coalesce(1).write.mode("overwrite")
                .parquet(s"$auxAbs/$name/$auxName")
            }
          } finally spark.sparkContext.clearJobGroup()
        }(rec)
        try Await.result(inner, timeoutSec.seconds)
        catch {
          case _: java.util.concurrent.TimeoutException =>
            System.err.println(s"[verify] $name timed out after ${timeoutSec}s")
            // AndFutureJobs: plain cancelJobGroup only cancels ACTIVE
            // jobs — a timed-out query sitting in driver-side loop code
            // between jobs would keep submitting new ones under its FAIR
            // pool for the rest of the run
            spark.sparkContext.cancelJobGroupAndFutureJobs(name)
          case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }(wec)
    }
    futures.foreach(f => Await.result(f, Duration.Inf))
    workers.shutdown(); runners.shutdown()
    // all results are on disk — drop the scratch CTAS tables and delete
    // the bucketed/partitioned scratch copies q54/q55 registered
    TempCleanup.purge(spark)
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
    // intermediates exported above from wherever the driver pointed us.
    // {OUT}/_aux is re-rooted FIRST to the sibling aux dir (see above) —
    // query authors keep writing {OUT}/_aux/<name>/<auxName> and never
    // need to know aux lives outside the compared tree.
    val selectedNames = selected.map(_.name).toSet
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selectedNames.contains(k) }
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace("{OUT}/_aux", auxAbs).replace("{OUT}", outAbs))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
