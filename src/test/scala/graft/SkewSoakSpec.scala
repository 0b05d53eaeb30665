package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{FuzzyDedup, PipelineOps}

/** Adversarial-skew soaks (round-3 verdict #8): plant the worst realistic
  * hot keys — a corpus that is 80% one document, corpus-wide boilerplate,
  * one hot IVF cell — and assert the designed caps keep the quadratic
  * blowup out while shuffle volume and per-task time stay bounded.
  * Measured shuffle bytes / peak task time are printed to the test log.
  */
class SkewSoakSpec extends SparkFunSuite {

  /** Run `body`, returning (result, totalShuffleWriteBytes, maxTaskMs).
    * Shares TaskRecords' convergence drain (a fixed sleep undercounts
    * on a loaded box, passing the soak bounds vacuously). */
  private def measured[T](body: => T): (T, Long, Long) = {
    val bytes = new AtomicLong
    val maxMs = new AtomicLong
    val r = graft.tools.TaskRecords.measureWith(spark) { m =>
      bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      maxMs.updateAndGet(c => math.max(c, m.executorRunTime))
      ()
    }(body)
    (r, bytes.get(), maxMs.get())
  }

  private def skewedDocs(nDocs: Int, hotShare: Double, seed: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val hot = (1 to 40).map(i => s"hotword$i").mkString(" ")
    val nHot = (nDocs * hotShare).toInt
    (0 until nDocs).map { i =>
      if (i < nHot) (i.toLong, hot)
      else (i.toLong, (1 to 40).map(_ => s"w${rnd.nextInt(5000)}").mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("d06 LSH: 80%-identical corpus is bounded by the 64-doc bucket cap") {
    val docs = skewedDocs(2000, 0.8, seed = 21)
    val ((nPairs, maxBucket), shuffleB, taskMs) = measured {
      val sigs = FuzzyDedup.signatures(docs).cache()
      val pairs = FuzzyDedup.candidatePairs(sigs)
      (pairs.count(), FuzzyDedup.candidatePairs(sigs).groupBy("doc_a")
        .count().agg(coalesce(max("count"), lit(0L))).head().getLong(0))
    }
    info(s"d06 soak: pairs=$nPairs maxPerDoc=$maxBucket " +
      s"shuffle=${shuffleB / 1024}KiB maxTask=${taskMs}ms")
    // uncapped, the 1600 identical docs alone emit C(1600,2) ≈ 1.28M
    // pairs; the cap drops their over-full buckets entirely
    assert(nPairs < 100000L, s"bucket cap failed to bound the hot cluster: $nPairs")
    assert(shuffleB < (256L << 20), s"shuffle blow-up: $shuffleB bytes")
  }

  test("d25 spans: corpus-wide boilerplate is excluded by the span-frequency cap") {
    val docs = skewedDocs(1500, 0.8, seed = 22)
    val (nPairs, shuffleB, taskMs) = measured {
      PipelineOps.spanPairs(docs).count()
    }
    info(s"d25 soak: pairs=$nPairs shuffle=${shuffleB / 1024}KiB maxTask=${taskMs}ms")
    // the boilerplate spans have doc-frequency 1200 >> 64 and must be
    // dropped before the self-join; random 8-token tails never collide
    assert(nPairs < 10000L, s"span cap failed: $nPairs pairs")
    assert(shuffleB < (256L << 20), s"shuffle blow-up: $shuffleB bytes")
  }

  test("d44 containment: corpus-wide boilerplate shingles are dropped by the df cap") {
    // 80% of 1500 docs share the same 40-word prefix: every boilerplate
    // bigram has df ≈ 1200 >> 64 and, uncapped, would fan out ~1200² ≈
    // 1.4M join pairs PER SHINGLE; the cap removes them from the
    // universe before the equijoin, and the random tails never collide
    val docs = skewedDocs(1500, 0.8, seed = 23)
    val (nPairs, shuffleB, taskMs) = measured {
      graft.queries.TextOps.containmentPairs(docs).count()
    }
    info(s"d44 soak: pairs=$nPairs shuffle=${shuffleB / 1024}KiB maxTask=${taskMs}ms")
    assert(nPairs < 10000L, s"containment df cap failed: $nPairs pairs")
    assert(shuffleB < (256L << 20), s"shuffle blow-up: $shuffleB bytes")
  }

  test("q75 triangles: a 20k-degree hub's wedges are capped by the " +
      "compact-forward orientation, broadcast gated on |V|") {
    import spark.implicits._
    // star + ring: hub 0 — leaves 1..n, ring i — i+1. Exactly n-1
    // triangles (hub, i, i+1); the hub's NAIVE wedge count alone is
    // C(n,2) ≈ 2·10⁸ — the quadratic blowup the orientation must kill.
    val n = 20000
    val und = ((1 to n).map(i => (0L, i.toLong)) ++
      (1 until n).map(i => (i.toLong, (i + 1).toLong))).toDF("a", "b")
    val nE = 2L * n - 1
    val deg = und.select($"a".as("v")).union(und.select($"b".as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // the √(2|E|) skew bound: the hub (degree 20000) orients ALL its
    // edges inward, so its out-degree collapses to 0 and every node's
    // stays under the bound
    val maxOut = graft.queries.GraphOps.orientEdges(und, deg, identity)
      .groupBy("u").agg(count(lit(1)).as("od"))
      .agg(max("od")).head().getLong(0)
    val bound = math.ceil(math.sqrt(2.0 * nE)).toLong
    assert(maxOut <= bound,
      s"oriented out-degree $maxOut exceeds the sqrt(2|E|)=$bound cap")
    // the gated kernel: |V|=20001 broadcasts under the default gate and
    // SHUFFLES when the gate is forced below it — identical answers
    val (viaShuffle, shuffleB, taskMs) = measured {
      graft.queries.GraphOps.triangleStats(und, maxBroadcastNodes = 10L)
        .as[(Long, Long, Long, Long)].head()
    }
    val viaBroadcast = graft.queries.GraphOps.triangleStats(und)
      .as[(Long, Long, Long, Long)].head()
    info(s"q75 soak: |V|=${n + 1} |E|=$nE maxOutDeg=$maxOut (bound $bound) " +
      s"triangles=${viaShuffle._3} shuffle=${shuffleB / 1024}KiB maxTask=${taskMs}ms")
    assert(viaShuffle == viaBroadcast, "gate changed the answer")
    assert(viaShuffle._1 == nE && viaShuffle._3 == n - 1L,
      s"expected ${n - 1} triangles over $nE edges, got $viaShuffle")
    // the hub's open-wedge total stays in n_wedges (the clustering
    // denominator counts the REAL graph), but the wedge JOIN never
    // materializes them: shuffle stays far under the ~2·10⁸-row blowup
    assert(viaShuffle._2 > 100000000L, "hub open-wedge total missing")
    assert(shuffleB < (256L << 20), s"shuffle blow-up: $shuffleB bytes")
  }

  /** Like [[measured]] but also collects every task duration so tail
    * latency (p99) is observable, not just the single max.
    */
  private def measuredP99[T](body: => T): (T, Long, Long, Long) = {
    val bytes = new AtomicLong
    val times = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val r = graft.tools.TaskRecords.measureWith(spark) { m =>
      bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      times.add(m.executorRunTime)
      ()
    }(body)
    val sorted = times.toArray(Array.empty[java.lang.Long]).map(_.longValue).sorted
    val p99 = if (sorted.isEmpty) 0L else sorted((sorted.length * 99 / 100).min(sorted.length - 1))
    val p50 = if (sorted.isEmpty) 0L else sorted(sorted.length / 2)
    (r, bytes.get(), p99, p50)
  }

  test("d06 LSH at 10x sf0.1: cap + AQE keep shuffle and task p99 bounded",
      org.scalatest.tagobjects.Slow) {
    // The round-5 scale soak (VERDICT r4 #5): a 50,000-doc corpus — 10×
    // the sf0.1 documents table — with realistic structure: a planted
    // 500-identical hot cluster (far over the 64-doc bucket cap, must
    // contribute ZERO pairs), 1000 five-doc near-dup clusters (the
    // signal the cap must NOT suppress), and a random-text tail.
    import spark.implicits._
    val rnd = new scala.util.Random(25)
    def randTokens(n: Int): String =
      (1 to n).map(_ => s"w${rnd.nextInt(20000)}").mkString(" ")
    val hot = randTokens(45)
    val templates = Array.fill(1000)(randTokens(45))
    val docs = (0 until 50000).map { i =>
      val text =
        if (i < 500) hot // hot cluster: 500 identical docs
        else if (i < 5500) {
          // cluster c = docs 500+5c .. 504+5c: template with one token
          // mutated per member — pairwise shingle Jaccard stays high
          val c = (i - 500) / 5
          val ws = templates(c).split(" ").clone()
          ws((i - 500) % 5 * 7 % ws.length) = s"mut$i"
          ws.mkString(" ")
        } else randTokens(45)
      (i.toLong, text)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(docs, 16)).toDF("doc_id", "text")
    val ((nPairs, hotPairs, maxPerDoc), shuffleB, p99Ms, p50Ms) = measuredP99 {
      val sigs = FuzzyDedup.signatures(df).cache()
      val pairs = FuzzyDedup.candidatePairs(sigs).cache()
      val n = pairs.count()
      val hp = pairs.filter(col("doc_a") < 500 && col("doc_b") < 500).count()
      val mx = pairs.select(explode(array(col("doc_a"), col("doc_b"))).as("d"))
        .groupBy("d").count().agg(coalesce(max("count"), lit(0L))).head().getLong(0)
      pairs.unpersist(); sigs.unpersist()
      (n, hp, mx)
    }
    info(s"d06 10x soak: pairs=$nPairs hotPairs=$hotPairs maxPerDoc=$maxPerDoc " +
      s"shuffle=${shuffleB / 1024 / 1024}MiB taskP50=${p50Ms}ms taskP99=${p99Ms}ms")
    // the 500-identical cluster over-fills every (band, bucket) → dropped
    assert(hotPairs == 0L, s"bucket cap leaked the hot cluster: $hotPairs pairs")
    // the five-doc clusters survive: ≥ half the 1000 clusters yield pairs
    assert(nPairs >= 1000L, s"cap suppressed real near-dups: $nPairs pairs")
    // no doc can pair beyond band-count × cap even in the worst bucket mix
    assert(maxPerDoc <= (FuzzyDedup.Bands.toLong * FuzzyDedup.MaxBucketDocs),
      s"per-doc pair fan-out unbounded: $maxPerDoc")
    // linear-shuffle contract at 10×: banded rows are (doc_id, band,
    // 4-slot bucket) — tens of MB, not the GB a sig-carrying or
    // quadratic plan would write
    assert(shuffleB < (1L << 30), s"shuffle blow-up at 10x: $shuffleB bytes")
    // tail boundedness: no single task absorbs the corpus (the ±2×
    // machine variance makes absolute numbers loose; 30 s is an order
    // of magnitude above the observed p99)
    assert(p99Ms < 30000L, s"task-time p99 unbounded: ${p99Ms}ms")
  }

  test("d06 LSH at 100x sf0.1: linearity soak (set GRAFT_SOAK_100X=1 to run)") {
    // On-demand (skipped in the default suite — ~5 min on local[4]):
    // 500,000 docs = 100× the sf0.1 documents table, same structure as
    // the 10× soak scaled 10×. The claim under test is LINEARITY: the
    // band-join shuffle and pair counts must grow ~10× from the 10× run
    // (90 MiB / 10,000 pairs), not quadratically. Recorded numbers live
    // in SURVEY §9 round-6 outlook #5.
    assume(sys.env.get("GRAFT_SOAK_100X").contains("1"),
      "on-demand soak; run with GRAFT_SOAK_100X=1")
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    def randTokens(n: Int): String =
      (1 to n).map(_ => s"w${rnd.nextInt(20000)}").mkString(" ")
    val hot = randTokens(45)
    val templates = Array.fill(10000)(randTokens(45))
    val docs = (0 until 500000).map { i =>
      val text =
        if (i < 5000) hot
        else if (i < 55000) {
          val c = (i - 5000) / 5
          val ws = templates(c).split(" ").clone()
          ws((i - 5000) % 5 * 7 % ws.length) = s"mut$i"
          ws.mkString(" ")
        } else randTokens(45)
      (i.toLong, text)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(docs, 64)).toDF("doc_id", "text")
    val ((nPairs, hotPairs), shuffleB, p99Ms, p50Ms) = measuredP99 {
      val sigs = FuzzyDedup.signatures(df).cache()
      val pairs = FuzzyDedup.candidatePairs(sigs).cache()
      val n = pairs.count()
      val hp = pairs.filter(col("doc_a") < 5000 && col("doc_b") < 5000).count()
      pairs.unpersist(); sigs.unpersist()
      (n, hp)
    }
    info(s"d06 100x soak: pairs=$nPairs hotPairs=$hotPairs " +
      s"shuffle=${shuffleB / 1024 / 1024}MiB taskP50=${p50Ms}ms taskP99=${p99Ms}ms")
    assert(hotPairs == 0L, s"bucket cap leaked the hot cluster: $hotPairs")
    assert(nPairs >= 10000L && nPairs < 1000000L, s"pair count off: $nPairs")
    // linearity: ≤ ~20× the 10× run's 90 MiB (10× data, 2× headroom)
    assert(shuffleB < (2L << 30), s"shuffle super-linear at 100x: $shuffleB bytes")
    assert(p99Ms < 120000L, s"task-time p99 unbounded: ${p99Ms}ms")
  }

  test("d44 containment at 100x sf0.1: linearity soak (set GRAFT_SOAK_100X=1 to run)") {
    // On-demand like the d06 100× soak (round-7 verdict #5: extend the
    // 100× rehearsal to the round-7 operators). 500k docs with planted
    // containment structure: 10k prefix-template clusters of 5 (each
    // member extends the cluster prefix → real directed pairs) + 5k
    // identical boilerplate docs (df >> 64 on every shingle → the cap
    // must drop them entirely) + random tails. The claim is LINEARITY
    // of the capped prefix join: directed-pair count tracks the planted
    // structure and shuffle stays ~linear, never the df² blowup.
    assume(sys.env.get("GRAFT_SOAK_100X").contains("1"),
      "on-demand soak; run with GRAFT_SOAK_100X=1")
    val rnd = new scala.util.Random(31)
    def randTokens(n: Int): String =
      (1 to n).map(_ => s"w${rnd.nextInt(20000)}").mkString(" ")
    val hot = randTokens(40)
    val templates = Array.fill(10000)(randTokens(20))
    val docs = (0 until 500000).map { i =>
      val text =
        if (i < 5000) hot
        else if (i < 55000) {
          val c = (i - 5000) / 5
          // member j extends the cluster template by j private tokens:
          // shingles of the template are CONTAINED in every extension
          templates(c) + " " + (1 to ((i - 5000) % 5) * 5 + 1)
            .map(j => s"p${i}x$j").mkString(" ")
        } else randTokens(40)
      (i.toLong, text)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(docs, 64)).toDF("doc_id", "text")
    val ((nPairs, hotPairs), shuffleB, p99Ms, p50Ms) = measuredP99 {
      val pairs = graft.queries.TextOps.containmentPairs(df).cache()
      val n = pairs.count()
      val hp = pairs.filter(col("doc_a") < 5000 || col("doc_b") < 5000).count()
      pairs.unpersist()
      (n, hp)
    }
    info(s"d44 100x soak: pairs=$nPairs hotPairs=$hotPairs " +
      s"shuffle=${shuffleB / 1024 / 1024}MiB taskP50=${p50Ms}ms taskP99=${p99Ms}ms")
    assert(hotPairs == 0L, s"df cap leaked the boilerplate block: $hotPairs")
    // planted: clusters contribute directed pairs ~linearly in corpus
    assert(nPairs >= 10000L && nPairs < 2000000L, s"pair count off: $nPairs")
    assert(shuffleB < (4L << 30), s"shuffle super-linear at 100x: $shuffleB bytes")
    assert(p99Ms < 120000L, s"task-time p99 unbounded: ${p99Ms}ms")
  }

  /** Like [[measured]] but collecting INPUT records read — the metric
    * for storage-layer soaks, where the claim is "reads O(change), not
    * O(landing)". */
  private def measuredRecords[T](body: => T): (T, Long) =
    graft.tools.TaskRecords.measure(spark)(body)

  test("changeFeedRelay at 100x: 40-version landing; late delete+update sync " +
      "reads O(change), not O(landing) (set GRAFT_SOAK_100X=1 to run)") {
    // Round-9 verdict #8: extend the 100× soaks to the relay. A
    // 40-version, 1M-row change-tracked landing (≈100× the gate
    // fixtures' change volume) is relayed in full, then hit with a LATE
    // delete and a LATE update on the already-synced current version.
    // Claims: (a) the full relay reads ~the landing once (zone-pruned
    // windows — never quadratic in versions), (b) the late pass reads
    // O(the late change volume) — tombstone diff + positional fetch +
    // the new postimage files — never a landing rescan, (c) the
    // update-aware fold of the log reconstructs the live landing
    // exactly at this scale.
    assume(sys.env.get("GRAFT_SOAK_100X").contains("1"),
      "on-demand soak; run with GRAFT_SOAK_100X=1")
    import graft.streaming.ManifestLand
    val out = java.nio.file.Files.createTempDirectory("graft_soak_relay")
      .toString + "/landing"
    val deltaDir = java.nio.file.Files.createTempDirectory("graft_soak_relay_log").toString
    graft.TempCleanup.registerDir(new java.io.File(out).getParent)
    graft.TempCleanup.registerDir(deltaDir)
    new java.io.File(out).mkdirs()
    val V = 40
    val rowsPerV = 25000L
    val total = V * rowsPerV
    for (v <- 0 until V)
      ManifestLand.commitBatch(
        spark.range(v * rowsPerV, (v + 1) * rowsPerV)
          .select(col("id").as("k"), (col("id") * 3).as("x")).toDF(),
        v.toLong, out, statsCols = Seq(ManifestLand.CommitVersionCol),
        rangeParts = 1, trackChanges = true)
    val (_, recsFull) = measuredRecords {
      ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k"))
    }
    // full relay: the bootstrap + 39 zone-pruned windows read the
    // landing ~once (plus per-window file overhead), not V× it
    assert(recsFull < 3L * total,
      s"full relay read $recsFull records over a $total-row landing")
    // LATE verbs on the synced version: a 500-row retention purge in
    // the oldest stripe + a 500-row patch — both land as re-flips of
    // the already-relayed current version
    ManifestLand.deleteWhere(spark, out, col("k") < 500L)
    ManifestLand.updateWhere(spark, out,
      col("k") >= 1000L && col("k") < 1500L, Seq("x" -> (col("x") + 1L)))
    val (_, recsLate) = measuredRecords {
      ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k"))
    }
    info(s"relay 100x soak: V=$V rows=$total fullRelay=$recsFull recs " +
      s"lateSync=$recsLate recs (${100.0 * recsLate / total}%% of landing)")
    // the late pass cost: the affected files (first version's stripe +
    // the update's postimage files) + sidecars — far under the landing
    assert(recsLate < total / 5L,
      s"late sync read $recsLate of $total records — scanned the landing?")
    // fold correctness at scale (update-aware row algebra)
    val log = spark.read.parquet(deltaDir)
    val adds = col("_change_type").isin("insert", "update_postimage")
    val folded = log.groupBy("k")
      .agg(sum(when(adds, 1L).otherwise(-1L)).as("n"),
        sum(when(adds, col("x")).otherwise(-col("x"))).as("x"))
      .filter(col("n") > 0L)
    assert(folded.count() == total - 500L)
    val live = ManifestLand.read(spark, out)
    assert(live.count() == total - 500L)
    // the 500 patched rows carry the postimage value in BOTH views
    assert(folded.filter(col("k") === 1200L).head().getLong(2) == 1200L * 3 + 1)
    assert(live.filter(col("k") === 1200L).head().getLong(1) == 1200L * 3 + 1)
  }

  test("q75 triangles at 100x: a 2M-degree hub's wedges stay capped by the " +
      "orientation (set GRAFT_SOAK_100X=1 to run)") {
    // Round-9 verdict #8: the hub soak at 100× the in-suite graph. Star
    // + ring over 2,000,001 nodes: the hub's naive wedge count is
    // C(2M, 2) ≈ 2·10¹², the quadratic blowup the compact-forward
    // orientation must kill; |V| > the 1M broadcast gate, so this also
    // exercises the SHUFFLE path of the gated degree join at scale.
    assume(sys.env.get("GRAFT_SOAK_100X").contains("1"),
      "on-demand soak; run with GRAFT_SOAK_100X=1")
    import spark.implicits._
    val n = 2000000
    val star = spark.range(1L, n + 1L).select(lit(0L).as("a"), col("id").as("b"))
    val ring = spark.range(1L, n.toLong).select(col("id").as("a"), (col("id") + 1L).as("b"))
    val und = star.union(ring)
    val nE = 2L * n - 1
    val (stats, shuffleB, p99Ms, p50Ms) = measuredP99 {
      graft.queries.GraphOps.triangleStats(und).as[(Long, Long, Long, Long)].head()
    }
    info(s"q75 100x soak: |V|=${n + 1} |E|=$nE triangles=${stats._3} " +
      s"shuffle=${shuffleB / 1024 / 1024}MiB taskP50=${p50Ms}ms taskP99=${p99Ms}ms")
    assert(stats._1 == nE && stats._3 == n - 1L,
      s"expected ${n - 1} triangles over $nE edges, got $stats")
    // linearity: the wedge join materializes oriented wedges (out-degree
    // ≤ √(2|E|) per node), never the hub's 2·10¹² raw wedges
    assert(shuffleB < (4L << 30), s"shuffle super-linear at 100x: $shuffleB bytes")
    assert(p99Ms < 120000L, s"task-time p99 unbounded: ${p99Ms}ms")
  }

  test("s32 bloom backfill at 100x: many-chunk restartable backfill reads " +
      "O(corpus), probes prune (set GRAFT_SOAK_100X=1 to run)") {
    // Round-9 verdict #8: the backfill soak. An 80-file, 1M-row landing
    // committed WITHOUT a bloom column gets one declared after the fact
    // in 10 restartable chunks of 8 files. Claims: every file covered,
    // total read ~2× the corpus (one ndv-sizing pass + one filter-build
    // pass, each chunk touching only its own files), and a point probe
    // afterwards prunes to the one file holding the key.
    assume(sys.env.get("GRAFT_SOAK_100X").contains("1"),
      "on-demand soak; run with GRAFT_SOAK_100X=1")
    import graft.streaming.ManifestLand
    val out = java.nio.file.Files.createTempDirectory("graft_soak_backfill")
      .toString + "/landing"
    graft.TempCleanup.registerDir(new java.io.File(out).getParent)
    new java.io.File(out).mkdirs()
    val V = 40
    val rowsPerV = 25000L
    val total = V * rowsPerV
    for (v <- 0 until V)
      ManifestLand.commitBatch(
        spark.range(v * rowsPerV, (v + 1) * rowsPerV)
          .select(col("id").as("k"), (col("id") * 7).as("x")).toDF().coalesce(2),
        v.toLong, out)
    val nFiles = ManifestLand.liveFiles(out).size
    assert(nFiles == 2 * V, s"fixture: expected ${2 * V} files, got $nFiles")
    val (covered, recsBackfill) = measuredRecords {
      ManifestLand.backfillBlooms(spark, out, "k", chunkFiles = 8)
    }
    info(s"s32 100x soak: files=$nFiles covered=$covered " +
      s"backfillRecs=$recsBackfill (corpus=$total)")
    assert(covered == nFiles, s"backfill covered $covered of $nFiles files")
    // two passes over the corpus (size, then build) + small slack for
    // chunk-boundary re-reads — NOT chunks × corpus
    assert(recsBackfill < 3L * total,
      s"backfill read $recsBackfill records over a $total-row corpus")
    // the backfilled blooms serve point lookups across the whole history
    val kept = ManifestLand.prunedLiveFilesEq(out, 777777L)
    assert(kept.size < nFiles / 10,
      s"bloom probe kept ${kept.size} of $nFiles files")
    val hit = ManifestLand.readPrunedEq(spark, out, 777777L)
      .filter(col("k") === 777777L)
    assert(hit.count() == 1L && hit.head().getLong(1) == 777777L * 7)
  }

  test("d40 inverted index: a token in 60% of 20k docs never exceeds the 64-id shard cap") {
    // The round-6 verdict's one scale-killer: the naive build held the
    // hottest token's postings as ONE collect_list row — O(corpus) in a
    // single aggregation buffer. The sharded build (bucket = doc_id div
    // 64) must keep EVERY row ≤ 64 ids no matter how hot the token is,
    // and the bucket-join conjunctive lookup must still return the exact
    // intersection.
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val docs = (0 until 20000).map { i =>
      val hot = if (i % 10 < 6) "everywhere " else "" // 60% of docs
      val hot2 = if (i % 10 < 3) "alsohot " else ""   // 30%, overlaps 0-2
      (i.toLong, hot + hot2 + (1 to 20).map(_ => s"w${rnd.nextInt(30000)}").mkString(" "))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(docs, 16)).toDF("doc_id", "text")
    val toks = df.select(col("doc_id"),
      explode(expr("array_distinct(filter(split(text, ' '), w -> w rlike '\\\\A[a-z]+\\\\z'))")).as("tok"))
    val (maxShard, shuffleB, taskMs) = measured {
      val sh = graft.operators.InvertedIndex.shards(toks, cap = 64).cache()
      val mx = sh.agg(max(size(col("docs")))).head().getInt(0)
      // conjunctive lookup over the two planted hot tokens: bucket-join
      // intersection must equal the brute-force doc set (docs 0-2 mod 10)
      val a = sh.filter(col("tok") === "everywhere")
        .select(col("bucket"), col("docs").as("docs_a"))
      val b = sh.filter(col("tok") === "alsohot")
        .select(col("bucket").as("bucket_b"), col("docs").as("docs_b"))
      val inter = a.join(b, col("bucket") === col("bucket_b"))
        .select(explode(expr("array_intersect(docs_a, docs_b)")).as("doc_id"))
      assert(inter.count() == 3L * 2000, "bucket-join intersection wrong")
      assert(inter.agg(min("doc_id")).head().getLong(0) == 0L)
      sh.unpersist()
      mx
    }
    info(s"d40 soak: maxShardDocs=$maxShard shuffle=${shuffleB / 1024}KiB maxTask=${taskMs}ms")
    assert(maxShard <= 64, s"shard cap violated: a postings row holds $maxShard ids")
    assert(shuffleB < (256L << 20), s"shuffle blow-up: $shuffleB bytes")
  }

  test("e06 IVF+PQ: one hot cell (80% duplicate vectors) completes bounded") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val dim = 16
    val hotVec = Array.fill(dim)(rnd.nextFloat())
    val emb = (0 until 1000).map { i =>
      val e = if (i >= 200) hotVec
      else Array.fill(dim)(rnd.nextFloat())
      (i.toLong, e)
    }.toDF("vec_id", "embedding")
    val (nRows, shuffleB, taskMs) = measured {
      val (result, _, _, _, _) = graft.operators.IvfPq.searchWithIndex(
        emb, cells = 8, cellIterations = 3, nprobe = 2,
        m = 8, k = 16, pqIterations = 3, nQueries = 5, topK = 10)
      result.count()
    }
    info(s"e06 soak: rows=$nRows shuffle=${shuffleB / 1024}KiB maxTask=${taskMs}ms")
    assert(nRows == 5L * 10, s"expected 5 queries x top-10, got $nRows")
    assert(shuffleB < (256L << 20), s"shuffle blow-up: $shuffleB bytes")
  }
}
