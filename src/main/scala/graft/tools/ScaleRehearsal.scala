package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf1 gate rehearsal (SURVEY §9 round-7 outlook #4): the driver ships
  * no sf1 fixtures, so synthesize ~10× sf0.1 locally and measure the
  * SF-SENSITIVE operators — e06 (IVF+PQ Lloyd loops, k·m codebook
  * constants), d05 (the dense-path 64 MiB matrix cap must FLIP to the
  * PPJoin-prefix join at this size), d06 (banded LSH linearity on real
  * query shape, complementing the synthetic SkewSoak) — plus d42's
  * tf/df/dl ladder, at the larger scale.
  *
  * Scaling model: `factor` copies of the corpus, each copy's vocabulary
  * made DISJOINT by prefixing every word with its copy tag (c1…c9; copy
  * 0 keeps the original text) — i.e. sf1 ≈ ten independent sf0.1 shards:
  * per-copy near-dup structure (planted clusters, boilerplate) is
  * preserved, no cross-copy pairs are invented, so pair counts and
  * cluster sizes must scale ~linearly — exactly what a real sf1 fixture
  * of the same generator would look like. Embeddings replicate with
  * offset ids (cluster density grows 10×, the stress k-means should
  * see). Remaining tables are symlinked from the source scale.
  *
  * Usage: `runMain graft.tools.ScaleRehearsal [srcDir] [outDir] [factor]
  * [iters] [q1,q2,...]` — prints one JSON line per query with
  * {best, median, n} wall seconds plus the result row count.
  */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val iters = if (args.length > 3) args(3).toInt else 3
    // d44 joined the default sweep in round 8 (directed-pair growth is
    // the SF-sensitive quantity; its df cap must keep holding). s23/q75
    // are NOT here: their scale axes (per-file key cardinality, graph
    // degree skew) don't grow with the document corpus — they're soaked
    // directly in ManifestLandSpec (500k-key sizing) and SkewSoakSpec
    // (20k-degree hub).
    // d07 joined after its 32-bit-wrap fix: the fingerprints' upper-block
    // bucket distribution materially changed, so its block-join linearity
    // needs the 10× measurement like the other banded dedups
    // round 12 (VERDICT #2): the FULL headline set joins the pinned
    // sweep — p01/q56/q59/e14 plus d51's sketch arm — so regression
    // detection has recorded 10× marks per round instead of the noisy
    // driver box's single sample (BENCH_r11 read p01 +225% on pure box
    // drift). x_relay is Bench-side scaffolding, not a SparkEntry query;
    // its round-over-round signal stays Bench's interleaved medians.
    // q11_defrag_shape joined in round 13 (VERDICT #2): the one r11→r12
    // riser that coincided with changed defrag code had no pinned
    // steady-state mark — its 10× lineitem sample closes that.
    val qs = (if (args.length > 4) args(4).split(",").toSeq
      else Seq("e06_ivf_pq", "d05_ngram_jaccard", "d06_minhash_lsh", "d42_bm25",
        "d44_containment", "d07_simhash",
        "p01_prep_pipeline", "q56_peak_concurrency", "q59_equidepth_histogram",
        "e14_hybrid_rrf", "d51_scrub_bloom_gate",
        "d53_dsir_select", "d54_k_anonymity", "q11_defrag_shape",
        // round 15 (VERDICT #3): the remaining round-13/14 newcomers —
        // d49's scrub regex ladder is linear per doc (pin it), d50's MMR
        // shortlist² must stay corpus-independent, d52's spill-vs-lazy
        // gate must still pick spill at 10× (its aux oracle replays the
        // choice)
        "d49_boilerplate_scrub", "d50_mmr_diversify", "d52_scrub_adaptive"))
      .map(_.trim).filter(_.nonEmpty)
    val localDir = graft.BenchEnv.localDir()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "300")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    synthesize(spark, src, out, factor)
    val results = qs.map { name =>
      val build = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val times = (1 to iters).map { i =>
        val t0 = System.nanoTime()
        // noop-sink write (timing count() would let Catalyst prune the
        // output expressions — Bench's round-2 lesson)
        build(spark, out).write.mode("overwrite").format("noop").save()
        val s = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[rehearsal] $name run $i: $s%.3f s")
        s
      }
      // row tally ONCE, after the timed loop: an untimed count() between
      // arms re-executes the whole query and perturbs the next timed arm
      // (GC + shuffle residue made q59's arms bimodal, 5.8 s vs 15 s,
      // before this moved out of the loop)
      val n = build(spark, out).count()
      System.err.println(s"[rehearsal] $name rows=$n")
      // aux export timed SEPARATELY (round 12, VERDICT #7): aux frames
      // are oracle instrumentation, corpus-proportional by design on
      // probe-side exports (d51's positioned hashes) — this row records
      // whether their cost stays linear so a future gate at a larger SF
      // knows what the aux adds to Verify wall time (the gate itself
      // only ever exports at sf0.01).
      val auxDefs = graft.SparkEntry.all.find(_.name == name)
        .map(_.aux).getOrElse(Nil)
      val auxSec =
        if (auxDefs.isEmpty) 0.0
        else {
          val t0 = System.nanoTime()
          auxDefs.foreach { case (_, b) =>
            b(spark, out).write.mode("overwrite").format("noop").save()
          }
          val s = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[rehearsal] $name aux export: $s%.3f s")
          s
        }
      val sorted = times.sorted
      (name, sorted.head, sorted(sorted.size / 2), n, auxSec)
    }
    val qjson = results.map { case (n, best, med, rows, auxSec) =>
      f""""$n":{"best":$best%.3f,"median":$med%.3f,"n":$iters,"rows":$rows,"aux_s":$auxSec%.3f}"""
    }.mkString(",")
    println(s"""{"metric":"sf1_rehearsal","factor":$factor,"src":"$src","queries":{$qjson}}""")
    spark.stop()
  }

  /** Write the scaled corpus once; reuse ONLY when the recorded
    * (src, factor) MANIFEST matches this run's (ADVICE r7 — a bare
    * documents.parquet existence check would silently measure a stale
    * corpus after a src/factor change, the exact stale-fixture hazard
    * BenchPcap's corpus manifest guards against). A mismatching or
    * missing manifest regenerates from scratch.
    */
  def synthesize(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    val dir = new java.io.File(out)
    val manifest = new java.io.File(dir, "MANIFEST")
    // v2 (round 10): lineitem joined the scaled set (q59's exact global
    // rank is SF-sensitive since the de-checkpoint — its 10× sample needs
    // a 10× fact table, not a symlink). v3: orders scales with the SAME
    // key offsets (the v2 layout left 90% of lineitem's FKs dangling for
    // join-shaped rehearsals). v4 (round 12): events scales by user/event
    // id offsets (q56 joined the sweep — a symlinked 1× events table
    // would have measured nothing); each bump regenerates stale corpora
    val want = s"src=$src\nfactor=$factor\nv=4\n"
    val have =
      if (manifest.exists())
        new String(java.nio.file.Files.readAllBytes(manifest.toPath), "UTF-8")
      else ""
    if (new java.io.File(dir, "documents.parquet").exists() && have == want) return
    if (dir.exists() && have != want && have.nonEmpty)
      System.err.println(s"[rehearsal] corpus at $out was built from " +
        s"${have.trim.replace("\n", " ")}; regenerating for src=$src factor=$factor")
    graft.TempCleanup.rmrf(dir)
    dir.mkdirs()
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val maxDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
    val copies = (0 until factor).map { i =>
      val tagged =
        if (i == 0) docs.select(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))
        else docs.select(
          (col("doc_id") + lit(i * maxDoc)).as("doc_id"),
          expr(s"array_join(transform(split(text, ' '), w -> concat('c$i', w)), ' ')")
            .as("text"),
          col("lang"), col("source"), col("n_chars"))
      tagged
    }
    copies.reduce(_ unionByName _).repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val maxVec = emb.agg(max("vec_id")).head().getLong(0) + 1
    (0 until factor).map(i => emb.select(
        (col("vec_id") + lit(i * maxVec)).as("vec_id"),
        col("embedding"), col("label")))
      .reduce(_ unionByName _).repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    // lineitem AND orders scale by key-offset copies sharing ONE offset
    // base (values repeat verbatim — exactly what a bigger fact table of
    // the same generator looks like to a rank/histogram; the shared
    // o_orderkey/l_orderkey offsets keep the FK intact, so join-shaped
    // rehearsals see a real 10× join, not 90% dangling keys — round-10
    // review finding; customer/supplier FKs stay valid because those
    // dims are symlinked at 1× and the copies keep their values)
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val ord = spark.read.parquet(s"$src/orders.parquet")
    val maxOk = math.max(
      li.agg(max("l_orderkey")).head().getLong(0),
      ord.agg(max("o_orderkey")).head().getLong(0)) + 1
    (0 until factor).map(i => li.withColumn("l_orderkey",
        col("l_orderkey") + lit(i * maxOk)))
      .reduce(_ unionByName _).repartition(32)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    (0 until factor).map(i => ord.withColumn("o_orderkey",
        col("o_orderkey") + lit(i * maxOk)))
      .reduce(_ unionByName _).repartition(32)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    // events scale by user_id/event_id offsets on the SAME time span —
    // 10× concurrent users is exactly what q56's interval sweep must
    // absorb (concurrency grows 10×, calendar hours don't). ts writes as
    // the canonical BIGINT nanos (Tables.events' LongType branch reads
    // it back untouched, whatever encoding the SOURCE fixtures carried).
    val ev = graft.queries.Tables.events(spark, src)
    val maxUser = ev.agg(max("user_id")).head().getLong(0) + 1
    val maxEvent = ev.agg(max("event_id")).head().getLong(0) + 1
    (0 until factor).map(i => ev
        .withColumn("user_id", col("user_id") + lit(i * maxUser))
        .withColumn("event_id", col("event_id") + lit(i * maxEvent)))
      .reduce(_ unionByName _).repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    // remaining tables: symlink to the source scale (TempCleanup.rmrf
    // never follows directory symlinks)
    for (t <- Seq("region", "nation", "customer", "supplier", "part")) {
      val link = java.nio.file.Paths.get(out, s"$t.parquet")
      if (!java.nio.file.Files.exists(link))
        java.nio.file.Files.createSymbolicLink(link,
          java.nio.file.Paths.get(src, s"$t.parquet"))
    }
    // written LAST: a crash mid-synthesis leaves no manifest, so the
    // next run regenerates rather than measuring a half-built corpus
    java.nio.file.Files.write(manifest.toPath, want.getBytes("UTF-8"))
    ()
  }
}
