package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times each headline query end-to-end (plan build +
  * execution to a full materialization) and prints one JSON line.
  *
  * Round-2 fixes (VERDICT r1 #3/#4):
  *   - materialization is a `noop`-sink write, not `.count()` — count()
  *     lets Catalyst prune every unused aggregate expression, so q01 was
  *     timing a plan that never computed its three sums;
  *   - the JSON line is written to `SPARK_GRAFT_BENCH_OUT` (default
  *     /tmp/bench.json) AND to raw file descriptor 1 — sbt's logger
  *     decorates println with "[info] ", which made BENCH_r01.json
  *     unparseable; a direct FileDescriptor.out write bypasses the logger
  *     so stdout carries the bare JSON.
  *
  * Round-7 (VERDICT r6 #2): best-of-2 on a ±2× box measures warmup, not
  * the query — d27 printed +22% in BENCH_r06 while its steady-state had
  * improved 2×. Every row now runs SPARK_GRAFT_BENCH_ITERS times
  * (default 4, TimeQuery's cadence); `queries` keeps the name→best-sec
  * shape the driver parses, and the sibling `queries_stats` carries
  * {best, median, n} per row so round-over-round deltas are signal
  * (compare medians, not bests).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "4").toInt
    val localDir = graft.BenchEnv.localDir()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", localDir)
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
    graft.spark.LogHygiene.quietKnownBoundedWindowWarning()
    // JVM/codegen warmup so the first timed query doesn't absorb startup
    spark.range(1000).selectExpr("sum(id)").collect()

    // NOISY-BOX CALIBRATION (round-15 verdict #2): this box's run-to-run
    // variance is ±2× under external load, and BENCH_r14 recorded a
    // uniform ~2× inflation that took an hour to adjudicate. A
    // fixed-work CPU-bound row (no IO, no shuffle) timed at start and
    // end, plus /proc/loadavg at both ends, makes a loaded box
    // self-evident in the artifact: compare `calibration` across rounds
    // first — if it moved, scale (or discount) the query deltas by it.
    def loadavg(): String = try {
      val parts = scala.io.Source.fromFile("/proc/loadavg").mkString
        .trim.split("\\s+")
      s"[${parts(0)},${parts(1)},${parts(2)}]"
    } catch { case _: Throwable => "[]" }
    def calibrate(): Double = {
      // bounded terms: sum(id*id) would overflow BIGINT under ANSI
      def work(): Unit =
        spark.range(1L << 28).selectExpr("sum(id % 1048573)").collect(): Unit
      // two discarded warmups: one left the start sample still 2× the
      // end sample (residual JIT) — cross-round comparison is start-to-
      // start / end-to-end either way, but closer is better
      work(); work()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        work()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1) // median of 3
    }
    val loadStart = loadavg()
    val calStart = calibrate()
    System.err.println(f"[bench] calibration(start) $calStart%.3f s, loadavg $loadStart")

    // per-row WORK counters (round-17 verdict #4: wall seconds at this
    // SF drown in host load — task counts / records / shuffle bytes are
    // the load-independent signal, measured once on the LAST iteration,
    // where plans are AQE-warm; the listener drain runs AFTER the timer
    // stops, so timings are unaffected)
    val workOf = scala.collection.mutable.Map[String, graft.tools.TaskRecords.Work]()

    /** (best, median) of `iters` full materializations of a fresh build. */
    def timeN(name: String)(build: () => org.apache.spark.sql.DataFrame): (Double, Double) = {
      val ts = (1 to iters).map { i =>
        def run(): Double = {
          val t0 = System.nanoTime()
          // full materialization of every output column; the noop sink
          // discards rows but cannot be pruned by the optimizer
          build().write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        val sec =
          if (i == iters) {
            val (s, w) = graft.tools.TaskRecords.measureWork(spark)(run())
            workOf(name) = w
            s
          } else run()
        spark.catalog.clearCache() // queries may cache; isolate timings
        sec
      }.sorted
      val median =
        if (iters % 2 == 1) ts(iters / 2)
        else (ts(iters / 2 - 1) + ts(iters / 2)) / 2
      (ts.head, median)
    }

    // heavy pair-generation queries last so their GC pressure can't bleed
    // into the cheap scans' timings
    val ordered = SparkEntry.headline.sortBy(q => if (q.name.startsWith("d")) 1 else 0)
    val results = ordered.map { q =>
      val (best, median) =
        try timeN(q.name)(() => q.build(spark, sfDir))
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          (-1.0, -1.0)
        }
      System.err.println(f"[bench] ${q.name}%-24s best $best%8.3f s  median $median%8.3f s")
      (q.name, best, median)
    }
    def ab(name: String)(build: () => org.apache.spark.sql.DataFrame): (String, Double, Double) = {
      // degrade like the headline rows: one broken A/B arm must cost its
      // own row, never the whole round's JSON line
      val (best, median) =
        try timeN(name)(build)
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          (-1.0, -1.0)
        }
      System.err.println(f"[bench] $name%-24s best $best%8.3f s  median $median%8.3f s")
      (name, best, median)
    }
    // same contract for a whole A/B group whose FIXTURE setup fails
    // (commitBatch on disk pressure, an empty probe frame): the group's
    // rows are dropped with a stderr note and every other row still lands
    def abGroup(label: String)(body: => Seq[(String, Double, Double)])
        : Seq[(String, Double, Double)] =
      try body
      catch { case e: Throwable =>
        System.err.println(s"[bench] $label fixture failed: ${e.getMessage}")
        Seq.empty
      }
    // as-of join A/B: the custom physical operator (what q17 ships) vs the
    // composed union+window formulation, same inputs — the regression
    // guard for the round-5 SparkPlan/Strategy extension
    val asofAb = abGroup("asofAb") {
      import org.apache.spark.sql.functions._
      def inputs() = {
        val ev = queries.Tables.events(spark, sfDir)
          .withColumn("tsu", expr("ts div 1000"))
        (ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id"), col("tsu")),
          ev.filter(col("event_type") === "click").select(col("user_id"), col("tsu")))
      }
      Seq(
        ab("x_asof_physical") { () =>
          val (l, r) = inputs()
          graft.plans.PhysicalAsOfJoin(l, r, Seq("user_id"), "tsu", "tsu")
        },
        ab("x_asof_composed") { () =>
          val (l, r) = inputs()
          graft.operators.AsOfJoin(l, r, Seq("user_id"), "tsu", "tsu")
        })
    }
    // MERGE A/B: the single full-outer join + one projection (what q64
    // ships, operators/MergeInto) vs the naive union-of-three-joins
    // formulation (inner join for updates + two anti joins) — same
    // inputs, same output; the union plan scans and shuffles each side
    // THREE times vs once, which is the design MergeInto exists to
    // avoid. At bench SF both arms are bound by building the change
    // feed, so expect parity here — the scan-multiplicity argument
    // lives in PlanQualitySpec's q64 plan pin (no Union, one join) and
    // only separates at real scale; the A/B guards against the single-
    // join plan ever REGRESSING behind the naive one.
    val mergeAb = abGroup("mergeAb") {
      import org.apache.spark.sql.functions._
      import graft.queries.PipelineOps
      def inputs() = (PipelineOps.mergeBase(spark, sfDir),
        PipelineOps.latestChanges(PipelineOps.changeFeed(spark, sfDir)))
      Seq(
        ab("x_merge_single_join") { () =>
          val (b, s) = inputs()
          graft.operators.MergeInto(b, s, "custkey",
            deleteWhen = col("s.op") === "D",
            outCols = Seq(
              "c_custkey" -> ((col("s.custkey"), col("b.custkey"), col("s.custkey"))),
              "c_name" -> ((col("b.c_name"), col("b.c_name"), col("s.c_name"))),
              "bal_cents" -> ((col("s.bal_cents"), col("b.bal_cents"), col("s.bal_cents"))),
              "row_status" -> ((lit("updated"), lit("kept"), lit("inserted")))))
        },
        ab("x_merge_union3") { () =>
          val (b, s) = inputs()
          val upd = b.as("b").join(s.as("s"), col("b.custkey") === col("s.custkey"))
            .filter(col("s.op") =!= "D")
            .select(col("b.custkey").as("c_custkey"), col("b.c_name"),
              col("s.bal_cents"), lit("updated").as("row_status"))
          val kept = b.join(s, Seq("custkey"), "left_anti")
            .select(col("custkey").as("c_custkey"), col("c_name"),
              col("bal_cents"), lit("kept").as("row_status"))
          val ins = s.filter(col("op") =!= "D").join(b, Seq("custkey"), "left_anti")
            .select(col("custkey").as("c_custkey"), col("c_name"),
              col("bal_cents"), lit("inserted").as("row_status"))
          upd.unionAll(kept).unionAll(ins)
        })
    }
    // top-k A/B: the SAME window-formulation source (row_number + rn<=3
    // per user over the event table), once planned as Spark's window +
    // WindowGroupLimit, once through graft.rules.TopKWindowRewrite into
    // the TopKPayloadAgg bounded-heap plan — the regression guard for the
    // round-6 injectOptimizerRule extension
    val topkAb = abGroup("topkAb") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      def formulation(s: SparkSession) =
        queries.Tables.events(s, sfDir)
          .select(col("user_id"),
            expr("coalesce(ts, CAST(0 AS BIGINT))").as("tsn"),
            expr("coalesce(event_id, CAST(-1 AS BIGINT))").as("eid"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("user_id").orderBy(col("tsn").desc, col("eid").asc)))
          .filter(col("rn") <= 3)
      val ruled = spark.newSession()
      ruled.conf.set(graft.rules.TopKWindowRewrite.ConfKey, "true")
      ruled.experimental.extraOptimizations = Seq(graft.rules.TopKWindowRewrite)
      Seq(
        ab("x_topk_window")(() => formulation(spark)),
        ab("x_topk_rewritten")(() => formulation(ruled)))
    }
    // global-rank A/B: the two-phase literal-boundary GlobalRank (what
    // q59/d33/d36/q57 ship) vs the naive unpartitioned row_number window
    // over the same 3-key total order — the round-4 named scale-killer,
    // measured so the partitioned ranker's constant factor stays visible
    // round over round (at sf0.1 the one-task window can even win on wall
    // clock; at 100 TB it is not slower, it is impossible — every row
    // through a single task)
    val rankAb = abGroup("rankAb") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      def src() = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cents"),
          col("l_orderkey"), col("l_linenumber"))
      Seq(
        ab("x_rank_twophase")(() => graft.operators.GlobalRank.withRowNumber(
          src(), Seq(col("cents").asc, col("l_orderkey").asc,
            col("l_linenumber").asc), "rk")),
        ab("x_rank_window")(() => src().withColumn("rk", row_number().over(
          Window.orderBy(col("cents").asc, col("l_orderkey").asc,
            col("l_linenumber").asc)))))
    }
    // zone-map A/B: the SAME µs-range rollup over a manifest landing with
    // per-file tsu stats (8 time-clustered batch commits), once through
    // the full manifest read, once through readPruned's file skipping —
    // the round-6 data-skipping payoff, tracked round over round
    val zonemapAb = abGroup("zonemapAb") {
      import org.apache.spark.sql.functions._
      val out = java.nio.file.Files.createTempDirectory("graft_bench_zm").toString + "/landing"
      graft.TempCleanup.registerDir(new java.io.File(out).getParent)
      new java.io.File(out).mkdirs()
      val ev = queries.Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("ts div 1000").as("tsu"),
          expr("CAST(floor((value) * 10000 + 0.5) AS BIGINT)").as("value_e4"))
      val Seq(mn, mx) = ev.agg(min("tsu"), max("tsu")).head().toSeq.map(_.asInstanceOf[Long])
      val step = (mx - mn) / 8 + 1
      (0 until 8).foreach { k =>
        graft.streaming.ManifestLand.commitBatch(
          ev.filter(col("tsu") >= mn + k * step && col("tsu") < mn + (k + 1) * step),
          k.toLong, out, statsCols = Seq("tsu"), rangeParts = 2)
      }
      val (lo, hi) = (mn + (mx - mn) / 8, mn + 2 * ((mx - mn) / 8)) // one-eighth slice
      def rollup(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("tsu") >= lo && col("tsu") <= hi)
          .groupBy("event_type").agg(count(lit(1)), sum("value_e4"))
      val plain = Seq(
        ab("x_zonemap_full")(() =>
          rollup(graft.streaming.ManifestLand.read(spark, out))),
        ab("x_zonemap_pruned")(() =>
          rollup(graft.streaming.ManifestLand.readPruned(spark, out, lo, hi))))
      // same pair with a LIVE deletion-vector sidecar (uncompacted): the
      // merge-on-read anti-join must not erase the file-skipping payoff
      // (round-7, the StorageLayoutSpec 200-file soak's timed twin)
      graft.streaming.ManifestLand.deleteWhere(spark, out, col("event_id") % 13 === 0)
      plain ++ Seq(
        ab("x_zonemap_dv_full")(() =>
          rollup(graft.streaming.ManifestLand.read(spark, out))),
        ab("x_zonemap_dv_pruned")(() =>
          rollup(graft.streaming.ManifestLand.readPruned(spark, out, lo, hi))))
    }
    // bloom A/B: the SAME point lookup over a landing committed with
    // per-file user_id blooms (8 batches), once through the full read,
    // once through readPrunedEq's manifest-only file rejection — the
    // round-7 point-lookup payoff, tracked round over round
    val bloomAb = abGroup("bloomAb") {
      import org.apache.spark.sql.functions._
      val out = java.nio.file.Files.createTempDirectory("graft_bench_bf").toString + "/landing"
      graft.TempCleanup.registerDir(new java.io.File(out).getParent)
      new java.io.File(out).mkdirs()
      val ev = queries.Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("CAST(floor((value) * 10000 + 0.5) AS BIGINT)").as("value_e4"))
      // batch by user-id stripe so each file's bloom covers a narrow key
      // set — the realistic landing where a point lookup CAN skip files
      val Seq(umn, umx) = ev.agg(min("user_id"), max("user_id")).head()
        .toSeq.map(_.asInstanceOf[Long])
      val ustep = (umx - umn) / 8 + 1
      (0 until 8).foreach { k =>
        graft.streaming.ManifestLand.commitBatch(
          ev.filter(col("user_id") >= umn + k * ustep &&
            col("user_id") < umn + (k + 1) * ustep),
          k.toLong, out, bloomCol = Some("user_id"))
      }
      // an EXISTING key near the middle (an absent probe would let the
      // blooms reject every file and time nothing)
      val probe = ev.filter(col("user_id") >= umn + (umx - umn) / 2)
        .agg(min("user_id")).head().getLong(0)
      def lookup(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("user_id") === probe)
          .groupBy("event_type").agg(count(lit(1)), sum("value_e4"))
      Seq(
        ab("x_bloom_full")(() =>
          lookup(graft.streaming.ManifestLand.read(spark, out))),
        ab("x_bloom_pruned")(() =>
          lookup(graft.streaming.ManifestLand.readPrunedEq(spark, out, probe))))
    }
    // change-feed A/B: the SAME delete-bearing window, once through the
    // round-8 delete ladder (DV-delta positional fetch from only the
    // affected files — what changeFeed ships), once forced through the
    // two-snapshot key anti-join it replaced. The delete is the
    // production shape (a retention purge of the oldest time stripe),
    // so the affected-file set is small while the snapshots are not.
    // Like the merge A/B, expect ~parity (or a slight fixed-cost tax on
    // the ladder) at bench SF: both arms are bound by per-job overhead
    // when the snapshots are 30 MB — the argument is READ VOLUME, which
    // only separates at scale and is pinned by ManifestLandSpec's
    // DV-delta spec (<5k records read vs ~19k for the anti-join on the
    // same landing). The rows exist to catch the ladder ever REGRESSING
    // to a multiple of the fallback.
    val cdfAb = abGroup("cdfAb") {
      import org.apache.spark.sql.functions._
      val out = java.nio.file.Files.createTempDirectory("graft_bench_cdf").toString + "/landing"
      graft.TempCleanup.registerDir(new java.io.File(out).getParent)
      new java.io.File(out).mkdirs()
      val ev = queries.Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("ts div 1000").as("tsu"),
          expr("CAST(floor((value) * 10000 + 0.5) AS BIGINT)").as("value_e4"))
      val Seq(mn, mx) = ev.agg(min("tsu"), max("tsu")).head().toSeq.map(_.asInstanceOf[Long])
      val step = (mx - mn) / 8 + 1
      (0 until 8).foreach { k =>
        graft.streaming.ManifestLand.commitBatch(
          ev.filter(col("tsu") >= mn + k * step && col("tsu") < mn + (k + 1) * step),
          k.toLong, out,
          statsCols = Seq(graft.streaming.ManifestLand.CommitVersionCol, "tsu"),
          rangeParts = 2, trackChanges = true)
      }
      // the oldest half-stripe purged: tombstones land on batch 0's files
      graft.streaming.ManifestLand.deleteWhere(spark, out, col("tsu") < mn + step / 2)
      def feed(force: Boolean) =
        graft.streaming.ManifestLand.changeFeed(spark, out, 6L, 7L,
          Seq("event_id"), forceSnapshotDeletes = force)
          .groupBy("_change_type")
          .agg(count(lit(1)).as("n"), sum("value_e4").as("sv"))
      // READ-VOLUME metric alongside the wall-time pair (round-9 verdict
      // #4): at bench SF both arms are per-job-overhead bound and wall
      // time argues ~parity — the ladder's actual win is records READ
      // (O(window's deletes) vs O(two snapshots)), which is what
      // separates at 100 TB. One measured run per arm; deterministic, so
      // n=1. Emitted as *_recs rows (unit: records) — never summed into
      // totals (A/B rows aren't), and bench_diff ratios stay like-for-
      // like per key.
      def recordsOf(build: () => org.apache.spark.sql.DataFrame): Double =
        graft.tools.TaskRecords.measure(spark) {
          build().write.mode("overwrite").format("noop").save()
        }._2.toDouble
      val dvRecs = recordsOf(() => feed(force = false))
      val ajRecs = recordsOf(() => feed(force = true))
      System.err.println(f"[bench] x_cdf records read: dvdelta $dvRecs%.0f vs antijoin $ajRecs%.0f")
      Seq(
        ab("x_cdf_dvdelta")(() => feed(force = false)),
        ab("x_cdf_antijoin")(() => feed(force = true)),
        ("x_cdf_dvdelta_recs", dvRecs, dvRecs),
        ("x_cdf_antijoin_recs", ajRecs, ajRecs))
    }
    // change-feed RELAY A/B (round-10, verdict #8: the substrate's newest
    // hot path had specs but no bench row): three relay-pass shapes on
    // one 8-version change-tracked landing, wall + records each —
    //   x_relay_full:   bootstrap + 7 windows into a FRESH log (the
    //                   consumer-attach / generation-swap cost, O(landing));
    //   x_relay_late:   one late UPDATE accounted on the synced version
    //                   (the in-loop maintenance cost — O(late volume),
    //                   records must sit far below the full pass);
    //   x_relay_window: an update inside an UN-RELAYED window with the
    //                   window's evidence COMPACTED away, synced through
    //                   the round-10 exact two-snapshot rung (O(two
    //                   snapshots) — the price of positional identity
    //                   loss, and the regression guard for that rung).
    val relayAb = abGroup("relayAb") {
      import org.apache.spark.sql.functions._
      import graft.streaming.ManifestLand
      val base = java.nio.file.Files.createTempDirectory("graft_bench_relay").toString
      graft.TempCleanup.registerDir(base)
      val out = base + "/landing"
      new java.io.File(out).mkdirs()
      val ev = queries.Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("ts div 1000").as("tsu"),
          expr("CAST(floor((value) * 10000 + 0.5) AS BIGINT)").as("value_e4"))
      val Seq(mn, mx) = ev.agg(min("tsu"), max("tsu")).head().toSeq.map(_.asInstanceOf[Long])
      val step = (mx - mn) / 8 + 1
      (0 until 8).foreach { k =>
        ManifestLand.commitBatch(
          ev.filter(col("tsu") >= mn + k * step && col("tsu") < mn + (k + 1) * step),
          k.toLong, out,
          statsCols = Seq(ManifestLand.CommitVersionCol, "tsu"),
          rangeParts = 2, trackChanges = true)
      }
      // side-effecting passes can't ride ab()'s DataFrame contract: same
      // best/median cadence, un-timed per-iteration prep
      def timeSide(label: String)(prep: Int => Unit)(pass: Int => Unit)
          : (String, Double, Double) = {
        val ts = (1 to iters).map { i =>
          prep(i)
          val t0 = System.nanoTime()
          pass(i)
          (System.nanoTime() - t0) / 1e9
        }.sorted
        val median =
          if (iters % 2 == 1) ts(iters / 2)
          else (ts(iters / 2 - 1) + ts(iters / 2)) / 2
        System.err.println(f"[bench] $label%-24s best ${ts.head}%8.3f s  median $median%8.3f s")
        (label, ts.head, median)
      }
      def recsOf(body: => Unit): Double =
        graft.tools.TaskRecords.measure(spark)(body)._2.toDouble
      // full pass: fresh log dir per iteration (a re-run on the same dir
      // is a no-change metadata pass and would time nothing)
      val full = timeSide("x_relay_full")(_ => ()) { i =>
        ManifestLand.changeFeedRelay(spark, out, base + s"/log_full_$i",
          Seq("event_id")); ()
      }
      val fullRecs = recsOf {
        ManifestLand.changeFeedRelay(spark, out, base + "/log_full_r",
          Seq("event_id")); ()
      }
      // late pass: one attached log; each iteration COMPACTS first (so
      // the accounted tombstone state is this update's alone — the
      // in-loop production shape, where compaction bounds the sidecars)
      // then lands fresh late evidence and times ONLY the accounting
      // relay pass. The update patches a tsu STRIPE — clustered like a
      // real correction — so the pass's positional fetch demonstrates
      // its affected-FILE cut (an update spread over every file would
      // legitimately read back the whole landing)
      val lateLog = base + "/log_late"
      ManifestLand.changeFeedRelay(spark, out, lateLog, Seq("event_id"))
      def lateEvidence(): Unit = {
        ManifestLand.compactIfNeeded(spark, out, maxFiles = 1, targetFiles = 4,
          clusterBy = Some(col("tsu")))
        ManifestLand.changeFeedRelay(spark, out, lateLog, Seq("event_id"))
        ManifestLand.updateWhere(spark, out, col("tsu") < mn + step / 2,
          Seq("value_e4" -> (col("value_e4") + 1L))); ()
      }
      lateEvidence()
      val lateRecs = recsOf {
        ManifestLand.changeFeedRelay(spark, out, lateLog, Seq("event_id")); ()
      }
      val late = timeSide("x_relay_late")(_ => lateEvidence()) { _ =>
        ManifestLand.changeFeedRelay(spark, out, lateLog, Seq("event_id")); ()
      }
      // window pass: commit a fresh-keyed stripe (un-relayed window),
      // update inside it, COMPACT the window's evidence away, then time
      // the sync — forced through the exact two-snapshot rung
      var nextBatch = 8L
      def windowEvidence(i: Int): Unit = {
        val stripe = ev.filter(col("tsu") < mn + step)
          .withColumn("event_id", col("event_id") + lit(10000000L * i))
        ManifestLand.commitBatch(stripe, nextBatch, out,
          statsCols = Seq(ManifestLand.CommitVersionCol, "tsu"),
          rangeParts = 2, trackChanges = true)
        nextBatch += 1
        ManifestLand.updateWhere(spark, out,
          col("event_id") >= lit(10000000L * i) && col("event_type") === "error",
          Seq("value_e4" -> (col("value_e4") + 1L)))
        ManifestLand.compactIfNeeded(spark, out, maxFiles = 1, targetFiles = 4,
          clusterBy = Some(col("tsu")))
      }
      windowEvidence(1)
      val windowRecs = recsOf {
        ManifestLand.changeFeedRelay(spark, out, lateLog, Seq("event_id")); ()
      }
      val window = timeSide("x_relay_window")(i => windowEvidence(i + 1)) { _ =>
        ManifestLand.changeFeedRelay(spark, out, lateLog, Seq("event_id")); ()
      }
      System.err.println(f"[bench] x_relay records read: full $fullRecs%.0f " +
        f"vs late $lateRecs%.0f vs window $windowRecs%.0f")
      Seq(full, late, window,
        ("x_relay_full_recs", fullRecs, fullRecs),
        ("x_relay_late_recs", lateRecs, lateRecs),
        ("x_relay_window_recs", windowRecs, windowRecs))
    }
    val all = results ++ asofAb ++ mergeAb ++ topkAb ++ rankAb ++ zonemapAb ++
      bloomAb ++ cdfAb ++ relayAb
    // failure sentinels are EXCLUDED from the qs/stats JSON and listed in
    // `failed` instead (ADVICE r8: a -1.0 A/B row fed bench_diff's
    // round-over-round ratios as a real timing)
    val emitted = all.filter(_._2 >= 0)
    val qs = emitted.map { case (k, best, _) => "\"" + k + f"\":$best%.3f" }
      .mkString("{", ",", "}")
    val stats = emitted.map { case (k, best, median) =>
      val n = if (k.endsWith("_recs")) 1 else iters // records rows run once
      "\"" + k + f"""\":{"best":$best%.3f,"median":$median%.3f,"n":$n}"""
    }.mkString("{", ",", "}")
    // totals over SUCCESSFUL HEADLINE rows only: summing the -1 failure
    // sentinels would make a round with a broken query read as FASTER
    // round-over-round; the failed list makes the gap explicit instead
    val ok = results.filter(_._2 >= 0)
    val failed = all.filter(_._2 < 0).map(_._1)
    if (failed.nonEmpty)
      System.err.println(s"[bench] FAILED queries excluded from totals: ${failed.mkString(", ")}")
    val total = ok.map(_._2).sum
    val totalMedian = ok.map(_._3).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val calEnd = calibrate()
    val loadEnd = loadavg()
    System.err.println(f"[bench] calibration(end) $calEnd%.3f s, loadavg $loadEnd")
    val noise = f""""calibration":{"start_s":$calStart%.3f,"end_s":$calEnd%.3f},"loadavg":{"start":$loadStart,"end":$loadEnd}"""
    // load-independent per-row work: tasks, records read, shuffle MB —
    // full line / sidecar only (the compact tail line must stay small)
    val work = emitted.flatMap { case (k, _, _) =>
      workOf.get(k).map { w =>
        "\"" + k + f"""\":{"tasks":${w.tasks},"recs":${w.records},"shuf_r_mb":${w.shuffleReadB / 1048576.0}%.2f,"shuf_w_mb":${w.shuffleWriteB / 1048576.0}%.2f}"""
      }
    }.mkString("{", ",", "}")
    val full = f"""{"metric":"total","value":$total%.3f,"unit":"sec","total_median":$totalMedian%.3f,$noise,"failed":$failedJson,"queries":$qs,"queries_stats":$stats,"queries_work":$work,"sf":"$sfDir"}"""
    // the driver keeps only the LAST ~2000 chars of output and parses
    // a JSON line within them (round-7: the single full line had grown
    // past that, so its head was clipped and `parsed` came back null).
    // So the FULL line (with per-query {best, median, n}) goes first —
    // and to the sidecar file — and the FINAL line is a compact
    // tail-proof summary that always fits whole inside any sane tail.
    val compact = f"""{"metric":"total","value":$total%.3f,"unit":"sec","total_median":$totalMedian%.3f,$noise,"failed":$failedJson,"queries":$qs,"sf":"$sfDir"}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench.json")
    try {
      val w = new java.io.PrintWriter(outPath, "UTF-8")
      try w.println(full) finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    // bare JSON on the real stdout, even under sbt's in-process logger
    val fd1 = new java.io.FileOutputStream(java.io.FileDescriptor.out)
    fd1.write((full + "\n" + compact + "\n").getBytes("UTF-8"))
    fd1.flush()
    // delete the scratch CTAS/landing copies the layout queries registered
    // (each timed run registers fresh uniquely-named artifacts)
    TempCleanup.purge(spark)
    spark.stop()
  }
}
