package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkFunSuite

/** The object-store landing's contracts: manifest-gated visibility,
  * exactly-once batch commits, in-loop compaction with no directory
  * renames, and vacuum of crash orphans.
  */
class ManifestLandSpec extends SparkFunSuite {

  private def diskParquet(dir: String): Set[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.endsWith(".parquet")).toSet

  private def landOne(df: DataFrame, dir: String, name: String): Unit = {
    val stage = Files.createTempDirectory("graft_mland_part").toString
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, Paths.get(s"$dir/$name"))
    Thread.sleep(20)
  }

  test("streamed landing compacts through manifest flips and equals the batch answer") {
    val spark = this.spark
    import spark.implicits._
    val land = Files.createTempDirectory("graft_mland").toString
    val out = Files.createTempDirectory("graft_mland_out").toString + "/landing"
    val ckpt = Files.createTempDirectory("graft_mland_ckpt").toString
    val src = spark.range(400).select(col("id"), (col("id") % 7).as("v"))
    (0 until 4).foreach(i =>
      landOne(src.filter(col("id") % 4 === i), land, f"00$i%d_part.parquet"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(land)
    ManifestLand.appendCompacting(stream, out, ckpt, maxFiles = 2, targetFiles = 2)

    // 4 appended batches would leave >= 4 files; the compactor bounds it
    val live = ManifestLand.liveFiles(out)
    assert(live.size <= 3, s"compactor failed to bound the landing: $live")
    // content survives every rewrite, exactly once
    val got = ManifestLand.read(spark, out).as[(Long, Long)].collect().sorted.toSeq
    assert(got == src.as[(Long, Long)].collect().sorted.toSeq)
    // compaction deleted what it superseded: disk == manifest
    assert(diskParquet(out) == live.toSet)
  }

  test("applyBatch is exactly-once under replay; vacuum sweeps crash orphans") {
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_apply").toString + "/landing"
    new java.io.File(out).mkdirs()
    val df = Seq(1L, 2L, 3L).toDF("v")
    def landed(): Seq[Long] =
      ManifestLand.read(spark, out).as[Long].collect().sorted.toSeq

    ManifestLand.applyBatch(df, 5, out)
    assert(landed() == Seq(1L, 2L, 3L))
    // post-commit replay: detected via the manifest's applied high-water
    // mark — a no-op even for a different frame with the same batch id
    ManifestLand.applyBatch(df.unionAll(df), 5, out)
    assert(landed() == Seq(1L, 2L, 3L), "post-commit replay must be a no-op")
    // pre-commit crash: a staged-but-never-committed orphan is invisible
    // to readers and removed by the restart vacuum
    Seq(99L).toDF("v").coalesce(1).write.parquet(s"$out.stage")
    val orphan = new java.io.File(s"$out.stage").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(orphan.toPath, Paths.get(out, "b9_00000.parquet"))
    assert(landed() == Seq(1L, 2L, 3L), "uncommitted files must stay invisible")
    ManifestLand.vacuum(out)
    assert(!diskParquet(out).contains("b9_00000.parquet"), "vacuum missed the orphan")
    // the replayed batch then lands cleanly on the same names
    ManifestLand.applyBatch(Seq(99L).toDF("v"), 9, out)
    assert(landed() == Seq(1L, 2L, 3L, 99L))
  }

  test("a batch replayed AFTER its own compaction neither duplicates nor breaks the landing") {
    // the hard replay window: batch 3 appended AND compacted (its rows
    // now live only in c* files), then the checkpoint commit was lost.
    // The high-water mark must skip the re-apply (a b3_ filename check
    // would not — compaction renamed the files away), and the re-run
    // compaction check must be a no-op, leaving content single-counted.
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_creplay").toString + "/landing"
    new java.io.File(out).mkdirs()
    ManifestLand.applyBatch(Seq(1L, 2L).toDF("v"), 2, out)
    ManifestLand.applyBatch(Seq(3L, 4L).toDF("v"), 3, out)
    ManifestLand.compactIfNeeded(spark, out, maxFiles = 1, targetFiles = 1)
    assert(ManifestLand.liveFiles(out).forall(_.startsWith("c")), "compaction must have fired")
    // replay of batch 3 (same id, same data) + the compaction re-check
    ManifestLand.applyBatch(Seq(3L, 4L).toDF("v"), 3, out)
    ManifestLand.compactIfNeeded(spark, out, maxFiles = 1, targetFiles = 1)
    val got = ManifestLand.read(spark, out).as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L, 4L), s"replay corrupted the landing: $got")
    // every manifest-referenced file must exist on disk
    ManifestLand.liveFiles(out).foreach(n =>
      assert(new java.io.File(out, n).exists(), s"manifest references a deleted file: $n"))
  }

  test("committed-but-empty landing reads as an empty frame; vacuum sweeps _manifest.tmp") {
    // an all-empty-batch stream legitimately commits applied >= 0 with
    // zero live files (ADVICE r5); read must serve the persisted schema,
    // not throw — while a landing with NO commits at all is still refused
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_empty").toString + "/landing"
    new java.io.File(out).mkdirs()
    intercept[IllegalArgumentException](ManifestLand.read(spark, out))
    ManifestLand.applyBatch(Seq.empty[Long].toDF("v"), 0, out)
    val empty = ManifestLand.read(spark, out)
    assert(empty.schema.fieldNames.toSeq == Seq("v") && empty.count() == 0L)
    // a crash between atomicReplace's write and move leaves _manifest.tmp
    Files.write(Paths.get(out, "_manifest.tmp"), "applied=99".getBytes("UTF-8"))
    ManifestLand.vacuum(out)
    assert(!new java.io.File(out, "_manifest.tmp").exists(), "vacuum missed _manifest.tmp")
    // later non-empty batches land normally on the same landing
    ManifestLand.applyBatch(Seq(7L).toDF("v"), 1, out)
    assert(ManifestLand.read(spark, out).as[Long].collect().toSeq == Seq(7L))
  }

  test("time travel: versioned reads survive compaction; expiry reclaims the history") {
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_tt").toString + "/landing"
    new java.io.File(out).mkdirs()
    // four commits; compact after the third so version 0-2's b-files are
    // superseded in the LIVE manifest but pinned by retained versions
    (0 until 3).foreach(i =>
      ManifestLand.applyBatch(Seq(i.toLong, i + 100L).toDF("v"), i, out))
    ManifestLand.compactIfNeeded(spark, out, maxFiles = 1, targetFiles = 1)
    ManifestLand.applyBatch(Seq(3L, 103L).toDF("v"), 3, out)
    assert(ManifestLand.versions(out) == Seq(0L, 1L, 2L, 3L))
    // each version reads the exact prefix, including the compacted ones
    (0 until 4).foreach { v =>
      val got = ManifestLand.readVersion(spark, out, v).as[Long].collect().sorted.toSeq
      val want = (0 to v).flatMap(i => Seq(i.toLong, i + 100L)).sorted
      assert(got == want, s"version $v read $got, wanted $want")
    }
    // version 2 was re-flipped by the compaction: its content is the
    // same but served from c* rewrite files that the live manifest (post
    // batch 3) no longer lists — retention is what keeps them on disk
    assert(ManifestLand.liveFiles(out).exists(_.startsWith("c")))
    // vacuum must not reclaim version-pinned files
    ManifestLand.vacuum(out)
    assert(ManifestLand.readVersion(spark, out, 1).count() == 4L)
    // expiry to the current version only: old snapshots gone, their
    // files reclaimed, the live read intact
    ManifestLand.expireVersions(out, keep = 1)
    assert(ManifestLand.versions(out) == Seq(3L))
    intercept[IllegalArgumentException](ManifestLand.readVersion(spark, out, 1))
    val disk = diskParquet(out)
    assert(disk == ManifestLand.liveFiles(out).toSet,
      s"expiry left unreferenced files: $disk")
    assert(ManifestLand.read(spark, out).as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L, 100L, 101L, 102L, 103L))
  }

  test("a crash between the append flip and the compaction flip is repaired on replay") {
    // append committed 4 live files (> maxFiles) but the compaction
    // never ran (crash): the replayed batch skips via the high-water
    // mark, but the compaction check outside the skip path must still
    // bound the landing.
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_crash").toString + "/landing"
    new java.io.File(out).mkdirs()
    (0 until 4).foreach(i => ManifestLand.applyBatch(Seq(i.toLong).toDF("v"), i, out))
    assert(ManifestLand.liveFiles(out).size == 4)
    // restart: replayed last batch is skipped, compaction still repairs
    ManifestLand.applyBatch(Seq(3L).toDF("v"), 3, out)
    ManifestLand.compactIfNeeded(spark, out, maxFiles = 2, targetFiles = 2)
    assert(ManifestLand.liveFiles(out).size <= 2, "compaction repair did not run")
    assert(ManifestLand.read(spark, out).as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L))
  }

  test("zone maps: range reads skip non-overlapping files, answers stay exact") {
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_zm").toString + "/landing"
    new java.io.File(out).mkdirs()
    // 4 batches × 2 range-clustered files over k = 0..399: zone widths ~50
    (0 until 4).foreach { i =>
      val b = spark.range(i * 100L, (i + 1) * 100L)
        .select(col("id").as("k"), (col("id") * 3).as("payload"))
      ManifestLand.applyBatch(b.toDF(), i, out, statsCols = Seq("k"), rangeParts = 2)
    }
    assert(ManifestLand.liveFiles(out).size == 8)
    // a one-zone range must prune at least 6 of the 8 files
    val pruned = ManifestLand.prunedLiveFiles(out, 120L, 170L)
    assert(pruned.size <= 2, s"zone maps failed to skip: $pruned")
    // pruned + residual == full scan + filter, on several ranges
    for ((lo, hi) <- Seq((120L, 170L), (0L, 399L), (395L, 10000L), (-5L, 3L))) {
      val viaZones = ManifestLand.readPruned(spark, out, lo, hi)
        .filter(col("k") >= lo && col("k") <= hi)
        .as[(Long, Long)].collect().sorted.toSeq
      val full = ManifestLand.read(spark, out)
        .filter(col("k") >= lo && col("k") <= hi)
        .as[(Long, Long)].collect().sorted.toSeq
      assert(viaZones == full, s"range [$lo,$hi] diverged through the zone maps")
    }
    // an out-of-domain range prunes everything
    assert(ManifestLand.prunedLiveFiles(out, 1000L, 2000L).isEmpty)
  }

  test("bloom filters: point lookups skip files, survive compaction and deletes") {
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_bf").toString + "/landing"
    new java.io.File(out).mkdirs()
    // 4 single-file batches with DISJOINT sparse keys (i*10000 + j): a
    // high-cardinality domain where every file's [min,max] zone would
    // span ~everything a zone map could ask — the bloom must carry the
    // pruning alone
    (0 until 4).foreach { i =>
      val b = spark.range(100L)
        .select((col("id") + i * 10000L).as("k"), (col("id") * 3 + i).as("payload"))
      ManifestLand.applyBatch(b.toDF().coalesce(1), i, out, bloomCol = Some("k"))
    }
    assert(ManifestLand.liveFiles(out).size == 4)
    // a key that lives only in batch 2 keeps exactly its file (64 Kibit
    // bloom at 100 keys: false-positive odds are ~1e-10 per file)
    assert(ManifestLand.prunedLiveFilesEq(out, 20042L).size == 1)
    // an absent key prunes the whole landing from the manifest alone
    assert(ManifestLand.prunedLiveFilesEq(out, 5042L).isEmpty)
    // IN-list probe: one manifest parse serves the whole key batch;
    // the file cut is the union of the per-key cuts
    assert(ManifestLand.prunedLiveFilesIn(out, Seq(42L, 20042L, 30099L)).size == 3)
    assert(ManifestLand.prunedLiveFilesIn(out, Seq(5042L, 777L)).isEmpty)
    assert(ManifestLand.readPrunedIn(spark, out, Seq(42L, 30000L))
      .filter(col("k").isin(42L, 30000L)).count() == 2L)
    // pruned + residual == full + filter, present and absent probes
    for (probe <- Seq(42L, 10099L, 30000L, 5042L, -7L)) {
      val viaBloom = ManifestLand.readPrunedEq(spark, out, probe)
        .filter(col("k") === probe).as[(Long, Long)].collect().sorted.toSeq
      val full = ManifestLand.read(spark, out)
        .filter(col("k") === probe).as[(Long, Long)].collect().sorted.toSeq
      assert(viaBloom == full, s"probe $probe diverged through the blooms")
    }
    // the bloom GUARANTEE sweep: no false negatives — EVERY present key
    // keeps its file — and the false-keep rate over absent keys stays at
    // the designed ~1e-10 (any drift between BloomAgg's update
    // arithmetic and the driver-side probe would fail this en masse)
    val presentKeys = (0 until 4).flatMap(i => (0L until 100L).map(_ + i * 10000L))
    presentKeys.foreach { k =>
      assert(ManifestLand.prunedLiveFilesEq(out, k).size == 1,
        s"present key $k was wrongly pruned (bloom false negative)")
    }
    val falseKeeps = (0L until 500L)
      .map(j => ManifestLand.prunedLiveFilesEq(out, 777777L + j * 13L).size).sum
    assert(falseKeeps <= 2, s"absent-key sweep kept $falseKeeps files")
    // the bloom column cannot change mid-landing
    val clash = spark.range(5L).select(col("id").as("k"), col("id").as("payload"))
    intercept[IllegalArgumentException] {
      ManifestLand.applyBatch(clash.toDF(), 9L, out, bloomCol = Some("payload"))
    }
    // a delete tombstones through the pruned read path too
    ManifestLand.deleteWhere(spark, out, col("k") === 20042L)
    assert(ManifestLand.readPrunedEq(spark, out, 20042L)
      .filter(col("k") === 20042L).count() == 0L)
    // compaction re-derives blooms for the rewrite files: lookups stay
    // exact and absent keys still prune everything
    ManifestLand.compactIfNeeded(spark, out, maxFiles = 2, targetFiles = 2)
    assert(ManifestLand.liveFiles(out).size <= 2)
    assert(ManifestLand.prunedLiveFilesEq(out, 5042L).isEmpty)
    val after = ManifestLand.readPrunedEq(spark, out, 30000L)
      .filter(col("k") === 30000L).as[(Long, Long)].collect().toSeq
    assert(after == Seq((30000L, 3L)))
    // the folded-away tombstone stays gone
    assert(ManifestLand.readPrunedEq(spark, out, 20042L)
      .filter(col("k") === 20042L).count() == 0L)
  }

  test("bloom sizing: a 500k-key file still prunes (measured FPP < 5%), " +
      "where the fixed 64 Kibit filter saturates to keep-all") {
    val spark = this.spark
    // the round-7 weak mark, demonstrated then closed in one spec: the
    // SAME high-cardinality file committed under (a) the old fixed
    // 64 Kibit sizing — saturated, every absent probe keeps the file —
    // and (b) auto sizing from the staged key count — ~1% designed FPP
    val big = spark.range(500000L).selectExpr("id * 7 AS k", "id AS payload")

    // (a) pinned legacy size: bloom=k:65536 — saturation measured
    val fixed = Files.createTempDirectory("graft_mland_sat").toString + "/landing"
    new java.io.File(fixed).mkdirs()
    ManifestLand.applyBatch(big.toDF().coalesce(1), 0L, fixed,
      bloomCol = Some("k"), bloomBits = Some(65536))
    val mFixed = ManifestLand.readManifest(fixed)
    assert(mFixed.bloomBits.contains(65536))
    assert(new String(Files.readAllBytes(Paths.get(fixed, "_manifest")), "UTF-8")
      .linesIterator.exists(_ == "bloom=k:65536"), "explicit-bits header missing")
    val satKeeps = (0 until 500).count(j =>
      ManifestLand.prunedLiveFilesEq(mFixed, fixed, 1000000L + 2L * j + 1L).nonEmpty)
    assert(satKeeps > 450, s"64 Kibit at 500k keys should saturate, kept $satKeeps/500")

    // (b) auto sizing (the default): bits grow with the key count …
    val auto = Files.createTempDirectory("graft_mland_sized").toString + "/landing"
    new java.io.File(auto).mkdirs()
    ManifestLand.applyBatch(big.toDF().coalesce(1), 0L, auto, bloomCol = Some("k"))
    val mAuto = ManifestLand.readManifest(auto)
    assert(mAuto.bloomBits.isEmpty, "auto mode must not pin a size header")
    // the filter lives in an immutable sidecar, not inline: the manifest
    // file itself stays small even at MiB filter sizes
    assert(mAuto.bloomSidecars.nonEmpty && mAuto.entries.forall(_.bloom.isEmpty))
    assert(new java.io.File(auto, "_manifest").length() < 4096,
      "manifest grew with the filter — sidecar externalization failed")
    val words = ManifestLand.bloomsFor(auto, mAuto).values.head.length
    assert(words * 32 >= (1 << 22),
      s"500k keys sized only ${words * 32} bits — still near the 64 Kibit default")
    // … no false negatives on a present-key sample …
    (0L until 500000L by 997L).foreach { i =>
      assert(ManifestLand.prunedLiveFilesEq(mAuto, auto, i * 7L).nonEmpty,
        s"present key ${i * 7L} wrongly pruned (false negative)")
    }
    // … and the measured FPP over absent keys is back at the design point
    val falseKeeps = (0 until 2000).count(j =>
      ManifestLand.prunedLiveFilesEq(mAuto, auto, 10000000L + 2L * j + 1L).nonEmpty)
    assert(falseKeeps < 100, s"sized bloom FPP ${falseKeeps / 20.0}% >= 5%")
    // the pruned read still answers exactly through the sized filter
    val probe = 7L * 123456L
    val viaBloom = ManifestLand.readPrunedEq(spark, auto, probe)
      .filter(col("k") === probe).collect().toSeq
    assert(viaBloom.map(_.getLong(1)) == Seq(123456L))

    // mixed sizing coexists: a SMALL second batch lands a default-sized
    // filter next to the 4 Mibit one, and both prune correctly per file
    ManifestLand.applyBatch(
      spark.range(100L).selectExpr("id + 100000000 AS k", "id AS payload").toDF()
        .coalesce(1), 1L, auto, bloomCol = Some("k"))
    val mMixed = ManifestLand.readManifest(auto)
    val sizes = ManifestLand.bloomsFor(auto, mMixed).values.map(_.length).toSeq.distinct
    assert(sizes.size == 2, s"expected two coexisting bloom sizes, got $sizes")
    assert(ManifestLand.prunedLiveFilesEq(mMixed, auto, 100000042L).size == 1)
    assert(ManifestLand.prunedLiveFilesEq(mMixed, auto, 999999999L).isEmpty)
  }

  test("bloom column must be BIGINT: a type the probe would hash differently refuses at commit") {
    val spark = this.spark
    import spark.implicits._
    // ADVICE r7: xxhash64 hashes INT and BIGINT differently — a
    // non-BIGINT bloom column would make the driver-side BIGINT probe
    // miss every key (false negatives = silently dropped rows), so the
    // commit refuses loudly instead
    val out = Files.createTempDirectory("graft_mland_bftype").toString + "/landing"
    new java.io.File(out).mkdirs()
    val strCol = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      ManifestLand.applyBatch(strCol, 0L, out, bloomCol = Some("k"))
    }
    assert(e.getMessage.contains("must be BIGINT"))
    val intCol = spark.range(5L).selectExpr("CAST(id AS INT) AS k")
    intercept[IllegalArgumentException] {
      ManifestLand.applyBatch(intCol.toDF(), 0L, out, bloomCol = Some("k"))
    }
    // a missing column refuses with its own message
    intercept[IllegalArgumentException] {
      ManifestLand.applyBatch(strCol, 0L, out, bloomCol = Some("nope"))
    }
  }

  test("bulk bloom/stats attachment streams: a 64-file commit attaches every filter") {
    val spark = this.spark
    // the many-file path (round-7 verdict #2): stats + blooms for a
    // commit staging MANY files arrive via toLocalIterator, and every
    // file still gets its filter and zones
    val out = Files.createTempDirectory("graft_mland_many").toString + "/landing"
    new java.io.File(out).mkdirs()
    val df = spark.range(64000L).selectExpr("id AS ts", "id * 13 AS k")
    ManifestLand.applyBatch(df.toDF(), 0L, out, statsCols = Seq("ts"),
      rangeParts = 64, bloomCol = Some("k"))
    val m = ManifestLand.readManifest(out)
    assert(m.entries.size == 64)
    assert(m.entries.forall(_.bounds.size == 1))
    assert(ManifestLand.bloomsFor(out, m).keySet == m.files.toSet)
    // zones partition ts; blooms answer k — both cuts stay exact
    assert(ManifestLand.prunedLiveFiles(out, 10L, 20L).size == 1)
    assert(ManifestLand.prunedLiveFilesEq(m, out, 13L * 32000L).size == 1)
    assert(ManifestLand.prunedLiveFilesEq(m, out, 7L).isEmpty)
  }

  test("stats columns must be integral: a string zone map refuses at commit") {
    val spark = this.spark
    import spark.implicits._
    // a non-integral stats column long-casts to NULL per row, so every
    // file records the impossible [0,-1] zone and pruning silently
    // degenerates to prune-all — refused like the bloom BIGINT rule
    val out = Files.createTempDirectory("graft_mland_stattype").toString + "/landing"
    new java.io.File(out).mkdirs()
    val df = Seq(("a", 1L), ("b", 2L)).toDF("s", "v")
    val e = intercept[IllegalArgumentException] {
      ManifestLand.applyBatch(df, 0L, out, statsCols = Seq("s"))
    }
    assert(e.getMessage.contains("must be integral"), e.getMessage)
    intercept[IllegalArgumentException] {
      ManifestLand.applyBatch(df, 0L, out, statsCols = Seq("nope"))
    }
    // integral columns of any width pass
    ManifestLand.applyBatch(
      spark.range(5L).selectExpr("CAST(id AS INT) AS k", "id AS v").toDF(),
      0L, out, statsCols = Seq("k"))
    assert(ManifestLand.prunedLiveFiles(out, 0L, 10L).nonEmpty)
    assert(ManifestLand.prunedLiveFiles(out, 100L, 200L).isEmpty)
  }

  test("deleteMatching: key-frame semi-join tombstones; idempotent; collisions refused") {
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_delm").toString + "/landing"
    new java.io.File(out).mkdirs()
    ManifestLand.applyBatch(
      spark.range(100L).selectExpr("id AS k", "id * 3 AS x").toDF(), 0L, out)
    val keys = Seq(3L, 7L, 7L, 250L).toDF("k") // dup + absent keys are fine
    assert(ManifestLand.deleteMatching(spark, out, keys, Seq("k")) == 2L)
    // re-running claims nothing new (already tombstoned rows anti-joined)
    assert(ManifestLand.deleteMatching(spark, out, keys, Seq("k")) == 0L)
    val live = ManifestLand.read(spark, out).select("k").as[Long].collect().sorted
    assert(live.length == 98 && !live.contains(3L) && !live.contains(7L))
    intercept[IllegalArgumentException] {
      ManifestLand.deleteMatching(spark, out, keys, Seq("file_name"))
    }
    intercept[IllegalArgumentException] {
      ManifestLand.deleteMatching(spark, out, keys, Seq.empty)
    }
  }

  test("backfillBlooms: chunked declaration on an existing landing, restartable, inherited") {
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_bfill").toString + "/landing"
    new java.io.File(out).mkdirs()
    // 8 bloom-less batches with disjoint sparse keys
    (0 until 8).foreach { i =>
      ManifestLand.applyBatch(
        spark.range(100L).select((col("id") + i * 10000L).as("k"),
          (col("id") * 3).as("x")).toDF().coalesce(1), i, out)
    }
    intercept[IllegalArgumentException](ManifestLand.prunedLiveFilesEq(out, 42L))
    // chunked backfill: 8 files in chunks of 3 → 3 sidecars, 3 flips
    assert(ManifestLand.backfillBlooms(spark, out, "k", chunkFiles = 3) == 8)
    val m = ManifestLand.readManifest(out)
    assert(m.bloomCol.contains("k") && m.bloomSidecars.size == 3)
    assert(ManifestLand.bloomsFor(out, m).keySet == m.files.toSet)
    // the whole history now point-prunes
    assert(ManifestLand.prunedLiveFilesEq(out, 30042L).size == 1)
    assert(ManifestLand.prunedLiveFilesEq(out, 999999L).isEmpty)
    // idempotent: nothing left to cover
    assert(ManifestLand.backfillBlooms(spark, out, "k", chunkFiles = 3) == 0)
    // resume semantics: strip the LAST chunk's sidecar line from the
    // manifest (as if the crash hit before its flip) — the re-run
    // covers exactly the gap, not the whole landing
    val mf = Paths.get(out, "_manifest")
    val lines = new String(Files.readAllBytes(mf), "UTF-8").linesIterator.toSeq
    val lastBfs = lines.filter(_.startsWith("bfs\t")).last
    Files.write(mf, lines.filterNot(_ == lastBfs).mkString("\n").getBytes("UTF-8"))
    assert(ManifestLand.backfillBlooms(spark, out, "k", chunkFiles = 3) == 2)
    assert(ManifestLand.prunedLiveFilesEq(out, 70042L).size == 1)
    intercept[IllegalArgumentException] { // a different column refused
      ManifestLand.backfillBlooms(spark, out, "x")
    }
    // a later commit without bloomCol INHERITS the declared column
    ManifestLand.applyBatch(
      spark.range(50L).select((col("id") + 500000L).as("k"),
        col("id").as("x")).toDF().coalesce(1), 100L, out)
    assert(ManifestLand.prunedLiveFilesEq(out, 500007L).size == 1)
    assert(ManifestLand.bloomsFor(out, ManifestLand.readManifest(out)).size ==
      ManifestLand.liveFiles(out).size)
    // non-BIGINT backfill refused on a string-keyed landing
    val bad = Files.createTempDirectory("graft_mland_bfill2").toString + "/landing"
    new java.io.File(bad).mkdirs()
    ManifestLand.applyBatch(Seq(("a", 1L)).toDF("s", "v"), 0L, bad)
    intercept[IllegalArgumentException](ManifestLand.backfillBlooms(spark, bad, "s"))
  }

  test("change feed's append-only fast path: metadata alone clears the delete side") {
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_fastcdf").toString + "/landing"
    new java.io.File(out).mkdirs()
    (0 until 3).foreach { i =>
      ManifestLand.applyBatch(
        spark.range(i * 10L, (i + 1) * 10L).select(col("id").as("k")).toDF(),
        i.toLong, out, trackChanges = true)
    }
    // pure appends: both windows are provably delete-free by metadata
    assert(!ManifestLand.windowMayDelete(out, 0L, 1L))
    assert(!ManifestLand.windowMayDelete(out, 0L, 2L))
    // a delete re-flips v2 with a vector → the window turns conservative
    ManifestLand.deleteWhere(spark, out, col("k") === 5L)
    assert(ManifestLand.windowMayDelete(out, 1L, 2L))
    assert(ManifestLand.changeFeed(spark, out, 1L, 2L, Seq("k"))
      .filter(col("_change_type") === "delete").count() == 1L)
    // compaction replaces files → conservative again, but the anti-join
    // still finds nothing newly deleted
    ManifestLand.compactIfNeeded(spark, out, maxFiles = 2, targetFiles = 1)
    assert(ManifestLand.windowMayDelete(out, 0L, 2L))
    assert(ManifestLand.changeFeed(spark, out, 0L, 1L, Seq("k"))
      .filter(col("_change_type") === "delete").count() == 0L)
  }

  test("corrupt manifest lines refuse loudly instead of orphaning files") {
    val spark = this.spark
    import spark.implicits._
    // a parse quirk must never become data loss: a manifest the parser
    // cannot fully account for would leave unlisted files invisible to
    // `referenced`, and the next vacuum would DELETE them — so every
    // malformed line is a refusal, not a skip
    def landing(): String = {
      val out = Files.createTempDirectory("graft_mland_bad").toString + "/landing"
      new java.io.File(out).mkdirs()
      ManifestLand.applyBatch(Seq((1L, 2L)).toDF("k", "v"), 0L, out,
        bloomCol = Some("k"))
      out
    }
    def corrupt(out: String, f: String => String): Unit = {
      val mf = Paths.get(out, "_manifest")
      Files.write(mf, f(new String(Files.readAllBytes(mf), "UTF-8")).getBytes("UTF-8"))
      ()
    }
    // a bloom-sidecar reference whose file is gone: the PROBE refuses
    // loudly instead of silently degrading to keep-all (liveFiles stays
    // readable — blooms are lazy)
    val a = landing()
    corrupt(a, _.replaceAll("(?m)^bfs\t.*$", "bfs\tnope.bfs"))
    assert(ManifestLand.liveFiles(a).nonEmpty)
    intercept[IllegalStateException](ManifestLand.prunedLiveFilesEq(a, 1L))
    // corrupt sidecar bytes: bad magic refuses at load
    val b = landing()
    val bfsName = ManifestLand.readManifest(b).bloomSidecars.head
    Files.write(Paths.get(b, bfsName), "garbage".getBytes("UTF-8"))
    intercept[IllegalArgumentException](ManifestLand.prunedLiveFilesEq(b, 1L))
    // garbled header
    val c = landing()
    corrupt(c, s => "applied=oops\n" + s.linesIterator.drop(1).mkString("\n"))
    intercept[IllegalStateException](ManifestLand.liveFiles(c))
    // LEGACY inline bf lines (the round-7 format) still parse AND probe:
    // rewrite the sidecar landing into the inline form by hand
    val d = landing()
    val mD = ManifestLand.readManifest(d)
    val blooms = ManifestLand.bloomsFor(d, mD)
    val inline = blooms.map { case (n, ws) =>
      val bb = java.nio.ByteBuffer.allocate(ws.length * 8)
      ws.foreach(bb.putLong)
      s"bf\t$n\t${java.util.Base64.getEncoder.encodeToString(bb.array())}"
    }
    corrupt(d, s => (s.linesIterator.filterNot(_.startsWith("bfs\t")) ++ inline)
      .mkString("\n"))
    new java.io.File(d, mD.bloomSidecars.head).delete() // truly legacy
    assert(ManifestLand.prunedLiveFilesEq(d, 1L).size == 1) // k=1 present
    assert(ManifestLand.prunedLiveFilesEq(d, 424242L).isEmpty)
    // truncated inline bloom line refuses at parse, as in round 7
    corrupt(d, _.replaceAll("(?m)^bf\t(\\S+)\t.*$", "bf\t$1"))
    intercept[IllegalStateException](ManifestLand.liveFiles(d))
  }

  test("composed pruning: zone maps and blooms intersect their file cuts") {
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_comp").toString + "/landing"
    new java.io.File(out).mkdirs()
    // 4 batches × 2 range-clustered files on ts; keys k are sparse and
    // DISJOINT per batch, so time prunes on the zones and key on the bloom
    (0 until 4).foreach { i =>
      val b = spark.range(100L)
        .select((col("id") + i * 100L).as("ts"),
          (col("id") * 7 + i * 10000L).as("k"))
      ManifestLand.applyBatch(b.toDF(), i, out, statsCols = Seq("ts"),
        rangeParts = 2, bloomCol = Some("k"))
    }
    assert(ManifestLand.liveFiles(out).size == 8)
    // time range covers batches 1-2 (4 files); key 20007 = batch 2 only
    val zonesOnly = ManifestLand.prunedLiveFiles(out, Seq(("ts", 100L, 299L)))
    val bloomOnly = ManifestLand.prunedLiveFilesEq(out, 20007L)
    assert(zonesOnly.size == 4 && bloomOnly.size == 1)
    val both = ManifestLand.readPrunedComposed(spark, out,
      Seq(("ts", 100L, 299L)), 20007L)
    // the composed read opens the intersection and still answers exactly
    val got = both.filter(col("k") === 20007L &&
        col("ts").between(100L, 299L))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((201L, 20007L)))
    // a key outside the time window: intersection is empty
    assert(ManifestLand.readPrunedComposed(spark, out,
      Seq(("ts", 100L, 299L)), 7L).count() == 0L)
  }

  test("change-feed fold soak: 40 versions with interleaved deletes and compaction") {
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_fold").toString + "/landing"
    new java.io.File(out).mkdirs()
    val nV = 40
    for (v <- 0 until nV) {
      val b = spark.range(v * 100L, (v + 1) * 100L)
        .select(col("id").as("k"), (col("id") % 7).as("g"), (col("id") * 3).as("x"))
      ManifestLand.applyBatch(b.toDF(), v.toLong, out,
        statsCols = Seq(ManifestLand.CommitVersionCol), rangeParts = 1,
        trackChanges = true)
      // interleave maintenance mid-history: deletes hit OLDER versions'
      // rows, compaction folds the vectors and rewrites every file
      if (v == 10 || v == 25) {
        ManifestLand.deleteWhere(spark, out, col("k") % 11 === v.toLong % 11)
        ()
      }
      if (v == 30) ManifestLand.compactIfNeeded(spark, out, maxFiles = 8,
        targetFiles = 4)
    }
    def rollup(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(count(lit(1)).as("n"), sum("x").as("sx"))
    // fold the whole history incrementally...
    val t0 = System.nanoTime()
    var view = rollup(ManifestLand.readVersion(spark, out, 0L)).localCheckpoint()
    for (v <- 1L until nV.toLong) {
      val d = ManifestLand.changeFeed(spark, out, v - 1L, v, Seq("k"))
        .groupBy("g")
        .agg(sum(when(col("_change_type") === "insert", 1L).otherwise(-1L)).as("dn"),
          sum(when(col("_change_type") === "insert", col("x"))
            .otherwise(-col("x"))).as("dx"))
      view = view.join(d, Seq("g"), "full_outer")
        .select(col("g"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
          (coalesce(col("sx"), lit(0L)) + coalesce(col("dx"), lit(0L))).as("sx"))
        .filter(col("n") > 0L)
        .localCheckpoint()
    }
    val foldMs = (System.nanoTime() - t0) / 1000000L
    // ...and it must equal the from-scratch rollup of the live landing
    val folded = view.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val scratch = rollup(ManifestLand.read(spark, out))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    info(s"fold soak: $nV versions folded in ${foldMs}ms; groups=${folded.size}")
    assert(folded == scratch,
      s"incremental fold diverged from recompute after $nV versions")
    assert(folded.map(_._2).sum < nV * 100L, "deletes must have removed rows")
  }

  test("changeFeed rung 2 tags re-inserted keys update_preimage; window fold exact") {
    // round-9 outlook #3 (common path): a key deleted AND re-inserted
    // within one window used to be suppressed by rung 2's re-insert
    // guard (key-level net effect) — a row-algebra fold then kept the
    // OLD row alongside the new one. Rung 2 now tags the removed
    // position `update_preimage` (folds subtract, MERGE consumers
    // ignore), the re-inserting row stays a plain insert, and the fold
    // is exact. Round 10: the two-snapshot rung (compaction in the
    // window) matches this exactness via its in-window re-commit flag —
    // the tail of this test compacts and re-runs the SAME window.
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_recycle").toString + "/landing"
    new java.io.File(out).mkdirs()
    def commit(v: Long, ks: Seq[(Long, Long)]): Unit =
      ManifestLand.applyBatch(ks.toDF("k", "x"), v, out,
        statsCols = Seq(ManifestLand.CommitVersionCol), rangeParts = 1,
        trackChanges = true)
    commit(0L, (0L until 10L).map(k => k -> k * 5L))
    commit(1L, (10L until 15L).map(k => k -> k * 5L))
    ManifestLand.deleteWhere(spark, out, col("k") === 3L) // tombstone on a v0 file
    commit(2L, Seq(3L -> 999L, 15L -> 75L)) // k=3 recycled in the same window
    val delta = ManifestLand.changeFeed(spark, out, 0L, 2L, Seq("k"))
      .select("_change_type", "k", "x").as[(String, Long, Long)]
      .collect().toSeq.sorted
    assert(delta.contains(("update_preimage", 3L, 15L)),
      s"recycled key's removed position must be a preimage: $delta")
    assert(delta.contains(("insert", 3L, 999L)))
    assert(!delta.contains(("delete", 3L, 15L)),
      "recycled key must not double as a plain delete")
    // update-aware fold over the v0 snapshot + the window == live
    val adds = col("_change_type").isin("insert", "update_postimage")
    val folded = ManifestLand.readVersion(spark, out, 0L)
      .withColumn("_change_type", lit("insert"))
      .unionByName(ManifestLand.changeFeed(spark, out, 0L, 2L, Seq("k")))
      .groupBy("k")
      .agg(sum(when(adds, 1L).otherwise(-1L)).as("n"),
        sum(when(adds, col("x")).otherwise(-col("x"))).as("x"))
      .filter(col("n") > 0L).select("k", "x")
      .as[(Long, Long)].collect().sorted.toSeq
    val live = ManifestLand.read(spark, out).select("k", "x")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(folded == live && live.contains((3L, 999L)),
      s"window fold diverged under key recycling: $folded vs $live")
    // the key-upsert reconstruction (inserts by key, preimages ignored)
    // is ALSO exact — both consumer models hold on the same log
    val log = ManifestLand.readVersion(spark, out, 0L)
      .withColumn("_change_type", lit("insert"))
      .unionByName(ManifestLand.changeFeed(spark, out, 0L, 2L, Seq("k")))
    val upsert = log.filter(col("_change_type") === "insert")
      .withColumn("__r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("k")
          .orderBy(col(ManifestLand.CommitVersionCol).desc, col("x").desc)))
      .filter(col("__r") === 1)
      .join(log.filter(col("_change_type") === "delete").select("k"),
        Seq("k"), "left_anti")
      .select("k", "x").as[(Long, Long)].collect().sorted.toSeq
    assert(upsert == live, s"key-upsert reconstruction diverged: $upsert")
    // round 10: a compaction inside the window destroys positional
    // identity — the two-snapshot rung must now serve the SAME window
    // with the SAME exactness (delta identical row-for-row, fold == live)
    ManifestLand.compactIfNeeded(spark, out, maxFiles = 1, targetFiles = 1)
    val delta3 = ManifestLand.changeFeed(spark, out, 0L, 2L, Seq("k"))
      .select("_change_type", "k", "x").as[(String, Long, Long)]
      .collect().toSeq.sorted
    assert(delta3 == delta,
      s"two-snapshot rung diverged from the DV-delta rung on the same " +
        s"window:\n  dv: $delta\n  snap: $delta3")
    val folded3 = ManifestLand.readVersion(spark, out, 0L)
      .withColumn("_change_type", lit("insert"))
      .unionByName(ManifestLand.changeFeed(spark, out, 0L, 2L, Seq("k")))
      .groupBy("k")
      .agg(sum(when(adds, 1L).otherwise(-1L)).as("n"),
        sum(when(adds, col("x")).otherwise(-col("x"))).as("x"))
      .filter(col("n") > 0L).select("k", "x")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(folded3 == live,
      s"post-compaction window fold diverged under key recycling: $folded3")
  }

  test("change feed DV-delta: a delete-bearing sync reads the affected files, not the base") {
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_dvd").toString + "/landing"
    new java.io.File(out).mkdirs()
    // 10 tracked batches of 1000 rows, one file each
    (0 until 10).foreach { v =>
      val b = spark.range(v * 1000L, (v + 1) * 1000L)
        .select(col("id").as("k"), (col("id") * 2).as("x"))
      ManifestLand.applyBatch(b.toDF(), v.toLong, out,
        statsCols = Seq(ManifestLand.CommitVersionCol), rangeParts = 1,
        trackChanges = true)
    }
    // delete 11 rows, ALL living in batch 0's file — only that file is
    // "affected"; the other 8 pre-window files must never be opened
    ManifestLand.deleteWhere(spark, out, col("k").between(100L, 110L))
    val recs = new java.util.concurrent.atomic.AtomicLong
    val lsn = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (te.taskMetrics != null) {
          recs.addAndGet(te.taskMetrics.inputMetrics.recordsRead); ()
        }
      }
    }
    spark.sparkContext.addSparkListener(lsn)
    val feed =
      try {
        val f = ManifestLand.changeFeed(spark, out, 8L, 9L, Seq("k"))
          .select(col("_change_type"), col("k"), col("x")).collect().toSeq
        Thread.sleep(1000) // listener bus drains asynchronously
        f
      } finally spark.sparkContext.removeSparkListener(lsn)
    // exact content: batch 9's 1000 inserts + the 11 tombstoned rows
    assert(feed.count(_.getString(0) == "insert") == 1000)
    assert(feed.filter(_.getString(0) == "delete").map(_.getLong(1)).sorted ==
      (100L to 110L))
    // the sync read the insert file + the one affected file + sidecars —
    // NOT the 10k-row base twice (the old anti-join read ~19k records)
    assert(recs.get() < 5000L,
      s"delete-bearing sync read ${recs.get()} records — scanned the base?")
    // re-insert guard: delete k=5000 then re-insert it in a new batch;
    // the window covering both emits the INSERT only (net effect — the
    // tombstoned pre-image is guarded out by the window's insert keys)
    ManifestLand.deleteWhere(spark, out, col("k") === 5000L)
    ManifestLand.applyBatch(
      Seq((5000L, 424242L)).toDF("k", "x"), 10L, out,
      statsCols = Seq(ManifestLand.CommitVersionCol), rangeParts = 1,
      trackChanges = true)
    val f2 = ManifestLand.changeFeed(spark, out, 9L, 10L, Seq("k"))
      .select(col("_change_type"), col("k"), col("x")).collect().toSeq
    assert(f2.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) ==
      Seq(("insert", 5000L, 424242L)))
    // an unretained window refuses loudly instead of reading live state
    ManifestLand.expireVersions(out, keep = 2)
    intercept[IllegalArgumentException] {
      ManifestLand.changeFeed(spark, out, 0L, 10L, Seq("k"))
    }
  }

  test("changeFeedRelay: versions become change-log batches, exactly-once under replay") {
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_relay").toString + "/landing"
    val deltaDir = Files.createTempDirectory("graft_mland_relay_log").toString
    new java.io.File(out).mkdirs()
    (0 until 3).foreach { v =>
      ManifestLand.applyBatch(
        spark.range(v * 10L, (v + 1) * 10L)
          .select(col("id").as("k"), (col("id") * 5).as("x")).toDF(),
        v.toLong, out, statsCols = Seq(ManifestLand.CommitVersionCol),
        rangeParts = 1, trackChanges = true)
    }
    def logFiles(): Seq[String] = Option(new java.io.File(deltaDir).listFiles())
      .getOrElse(Array.empty).map(_.getName).filter(_.endsWith(".parquet")).sorted.toSeq
    assert(ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k")) == 2L)
    val afterFirst = logFiles()
    assert(afterFirst.exists(_.startsWith("cf0_")) &&
      afterFirst.exists(_.startsWith("cf2_")))
    // idempotent: nothing new committed → nothing new staged
    assert(ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k")) == 2L)
    assert(logFiles() == afterFirst)
    // a LATE delete — deleteWhere re-flips v2, which the relay already
    // synced — plus a fresh batch: the next sync emits the late delete
    // as its own change-log batch (diffed against the accounted
    // tombstone state) and the new version's window as usual
    ManifestLand.deleteWhere(spark, out, col("k") === 7L)
    ManifestLand.applyBatch(Seq((100L, 500L)).toDF("k", "x"), 3L, out,
      statsCols = Seq(ManifestLand.CommitVersionCol), rangeParts = 1,
      trackChanges = true)
    assert(ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k")) == 3L)
    assert(logFiles().exists(_.startsWith("cf2d")),
      s"late-delete batch missing from ${logFiles()}")
    def foldLog(): Seq[(Long, Long)] = {
      val log = spark.read.parquet(deltaDir)
      log.filter(col("_change_type") === "insert").select("k", "x")
        .join(log.filter(col("_change_type") === "delete").select("k"), Seq("k"), "left_anti")
        .as[(Long, Long)].collect().sorted.toSeq
    }
    // the folded change log reconstructs the live landing exactly
    val live = ManifestLand.read(spark, out).select("k", "x")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(foldLog() == live && !live.exists(_._1 == 7L))
    // crash replay: simulate dying mid-relay — a late batch staged
    // HIDDEN and a partial state dir written, but the marker NOT yet
    // flipped — with a FURTHER delete landing before the retry (the dv
    // set changes). The retry must sweep the stranded hidden attempt
    // and, crucially, never rewrite any file a consumer could already
    // have read: published change files are immutable forever
    val markerPath = java.nio.file.Paths.get(deltaDir, "_cf_applied")
    val mparts = new String(
      java.nio.file.Files.readAllBytes(markerPath), "UTF-8").trim.split("\t", -1)
    val (mv, mState) = (mparts(0), mparts(1))
    ManifestLand.deleteWhere(spark, out, col("k") === 9L)
    val crashTag = mState.stripPrefix("_cf_state_").replace("_", "x")
    // the stranded attempt: bogus content staged hidden under the
    // crashed run's prefix (template = an existing log file, so the
    // schema matches), plus a partial state dir it never referenced
    ParquetLand.stageParts(
      spark.read.parquet(s"$deltaDir/${afterFirst.head}").limit(1)
        .withColumn("_change_type", lit("delete"))
        .withColumn("k", lit(999999L)),
      deltaDir, s".cf${mv}d${crashTag}_")
    new java.io.File(deltaDir, s"_cf_state_v${mv}_deadbeef").mkdirs()
    def visibleSig(): Map[String, (Long, Long)] =
      Option(new java.io.File(deltaDir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("cf") && f.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    val published = visibleSig()
    assert(ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k")) == 3L)
    // every file that was visible before the retry is byte-identical
    // after it — a checkpointed file source never re-reads a path, so a
    // rewrite would silently lose whatever changed
    val after = visibleSig()
    published.foreach { case (n, sig) =>
      assert(after.get(n).contains(sig), s"published change file $n mutated")
    }
    val deletes = spark.read.parquet(deltaDir)
      .filter(col("_change_type") === "delete").select("k").as[Long].collect().toSeq
    assert(!deletes.contains(999999L),
      s"stranded crashed late batch leaked into the log: $deletes")
    assert(deletes.count(_ == 9L) == 1 && deletes.count(_ == 7L) == 1)
    assert(!new java.io.File(deltaDir, s"_cf_state_v${mv}_deadbeef").exists(),
      "partial state dir of the crashed attempt not swept")
    assert(Option(new java.io.File(deltaDir).listFiles()).getOrElse(Array.empty)
      .forall(f => !f.getName.startsWith(".cf")),
      "hidden staged files survived a completed relay pass")
    assert(foldLog() == live.filterNot(_._1 == 9L))
    // crash mid-PROMOTION: the flip committed but a staged file was
    // never renamed visible — entry recovery finishes it from the
    // marker's file list, even on an otherwise no-change pass
    val committed = new String(java.nio.file.Files.readAllBytes(markerPath),
      "UTF-8").trim.split("\t", -1)(2).split(",").filter(_.nonEmpty)
    assert(committed.nonEmpty)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(deltaDir, committed.head),
      java.nio.file.Paths.get(deltaDir, "." + committed.head))
    assert(ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k")) == 3L)
    assert(new java.io.File(deltaDir, committed.head).exists(),
      "mid-promotion crash not recovered from the marker's file list")
    assert(foldLog() == live.filterNot(_._1 == 9L))
    // a NO-CHANGE relay pass leaves marker, log, and the LIVE state dir
    // byte-identical — rewriting the dir the marker references would
    // open a crash window where the marker points at a missing state
    val markerBytes = java.nio.file.Files.readAllBytes(markerPath)
    val stateNow = new String(markerBytes, "UTF-8").trim.split("\t")(1)
    def stateSig(): Seq[(String, Long)] =
      new java.io.File(deltaDir, stateNow).listFiles().toSeq
        .map(f => (f.getName, f.lastModified())).sortBy(_._1)
    val (filesBefore, sigBefore) = (logFiles(), stateSig())
    assert(ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k")) == 3L)
    assert(java.util.Arrays.equals(markerBytes,
      java.nio.file.Files.readAllBytes(markerPath)))
    assert(logFiles() == filesBefore && stateSig() == sigBefore,
      "no-change relay pass rewrote the live accounted state")
  }

  test("bloom sidecar loads stripe per key: 8-way cold probes run in parallel, byte accounting exact") {
    // round-9 verdict #6: the old loadSidecar held the global cache
    // monitor through the disk read, serializing concurrent cold probes
    // of DIFFERENT sidecars. Now the read runs outside every lock with a
    // per-key in-flight future; this spec pins (a) observed read
    // concurrency > 1 across 8 threads on 8 distinct sidecars, with a
    // wall-clock bound far under the serialized sum, and (b) cache byte
    // accounting exactly equal to the sum of the loaded sidecars' sizes.
    val spark = this.spark
    val outs = (0 until 8).map { i =>
      val out = Files.createTempDirectory(s"graft_mland_stripe$i").toString + "/landing"
      new java.io.File(out).mkdirs()
      ManifestLand.commitBatch(
        spark.range(i * 100L, i * 100L + 50L).select(col("id").as("k")).toDF()
          .coalesce(1),
        0L, out, rangeParts = 1, bloomCol = Some("k"))
      out
    }
    ManifestLand.clearSidecarCacheForTest()
    ManifestLand.sidecarLoadDelayMsForTest = 150L
    try {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      val t0 = System.nanoTime()
      val futures = outs.map { out =>
        pool.submit(new java.util.concurrent.Callable[Seq[String]] {
          override def call(): Seq[String] =
            ManifestLand.prunedLiveFilesEq(out, 1L)
        })
      }
      futures.foreach(_.get())
      pool.shutdown()
      val wallMs = (System.nanoTime() - t0) / 1000000L
      // serialized would be >= 8 * 150ms = 1200ms; parallel with 8
      // threads lands near 150ms — allow generous scheduling slop
      assert(wallMs < 900L, s"8 cold sidecar loads took ${wallMs}ms — serialized?")
      assert(ManifestLand.sidecarLoadsMaxConcurrent.get() >= 2,
        s"no overlap observed: max concurrent loads = " +
          s"${ManifestLand.sidecarLoadsMaxConcurrent.get()}")
    } finally ManifestLand.sidecarLoadDelayMsForTest = 0L
    // byte accounting: exactly the sum of the 8 loaded sidecars
    val expected = outs.map { out =>
      val m = ManifestLand.readManifest(out)
      ManifestLand.bloomsFor(out, m).valuesIterator
        .map(_.length.toLong * 8 + 64).sum
    }.sum
    assert(ManifestLand.bloomCacheBytesNow == expected,
      s"cache bytes ${ManifestLand.bloomCacheBytesNow} != expected $expected")
  }

  test("changeFeedRelay accounts a late UPDATE: preimage/postimage pairs, crash-safe") {
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_relayupd").toString + "/landing"
    val deltaDir = Files.createTempDirectory("graft_mland_relayupd_log").toString
    new java.io.File(out).mkdirs()
    (0 until 2).foreach { v =>
      ManifestLand.applyBatch(
        spark.range(v * 10L, (v + 1) * 10L)
          .select(col("id").as("k"), (col("id") * 5).as("x")).toDF(),
        v.toLong, out, statsCols = Seq(ManifestLand.CommitVersionCol),
        rangeParts = 1, trackChanges = true)
    }
    assert(ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k")) == 1L)
    // BOTH late verbs on the already-relayed current version — the
    // update used to REFUSE on a relay-attached landing (round-8)
    ManifestLand.deleteWhere(spark, out, col("k") === 3L)
    ManifestLand.updateWhere(spark, out, col("k") === 7L,
      Seq("x" -> lit(777L)))
    assert(ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k")) == 1L)
    def logFiles(): Seq[String] = Option(new java.io.File(deltaDir).listFiles())
      .getOrElse(Array.empty).map(_.getName).filter(_.endsWith(".parquet")).sorted.toSeq
    // the Delta-CDF late shape: a plain delete batch for k=3, a
    // preimage batch for k=7's removed row, a postimage batch for its
    // rewritten row
    assert(logFiles().exists(_.startsWith("cf1d")), s"late-delete batch missing: ${logFiles()}")
    assert(logFiles().exists(_.startsWith("cf1p")), s"preimage batch missing: ${logFiles()}")
    assert(logFiles().exists(_.startsWith("cf1u")), s"postimage batch missing: ${logFiles()}")
    val log0 = spark.read.parquet(deltaDir)
    assert(log0.filter(col("_change_type") === "update_preimage")
      .select("k", "x").as[(Long, Long)].collect().toSeq == Seq((7L, 35L)))
    assert(log0.filter(col("_change_type") === "update_postimage")
      .select("k", "x").as[(Long, Long)].collect().toSeq == Seq((7L, 777L)))
    assert(log0.filter(col("_change_type") === "delete")
      .select("k").as[Long].collect().toSeq == Seq(3L))
    // update-aware row-algebra fold reconstructs the live landing
    // exactly, with NO ordering assumption between log files
    def foldLog(): Seq[(Long, Long)] = {
      val log = spark.read.parquet(deltaDir)
      val adds = col("_change_type") === "insert" ||
        col("_change_type") === "update_postimage"
      log.groupBy("k")
        .agg(sum(when(adds, 1L).otherwise(-1L)).as("n"),
          sum(when(adds, col("x")).otherwise(-col("x"))).as("x"))
        .filter(col("n") > 0L).select("k", "x")
        .as[(Long, Long)].collect().sorted.toSeq
    }
    def live(): Seq[(Long, Long)] = ManifestLand.read(spark, out).select("k", "x")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(foldLog() == live() && live().exists(p => p == (7L, 777L)))
    // idempotent: a no-change pass stages nothing new
    val afterUpdate = logFiles()
    assert(ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k")) == 1L)
    assert(logFiles() == afterUpdate)
    // UPDATE STACKING + crash retry: re-update the same key, strand a
    // bogus hidden postimage attempt under the accounted tag (as if a
    // prior try died pre-flip) — the retry must sweep it and never
    // mutate any published byte
    ManifestLand.updateWhere(spark, out, col("k") === 7L, Seq("x" -> lit(888L)))
    val markerPath = java.nio.file.Paths.get(deltaDir, "_cf_applied")
    val mState = new String(java.nio.file.Files.readAllBytes(markerPath), "UTF-8")
      .trim.split("\t", -1)(1)
    val crashTag = mState.stripPrefix("_cf_state_").replace("_", "x")
    ParquetLand.stageParts(
      spark.read.parquet(s"$deltaDir/${afterUpdate.head}").limit(1)
        .withColumn("_change_type", lit("update_postimage"))
        .withColumn("k", lit(999999L)),
      deltaDir, s".cf1u${crashTag}_")
    def visibleSig(): Map[String, (Long, Long)] =
      Option(new java.io.File(deltaDir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("cf") && f.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    val published = visibleSig()
    assert(ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k")) == 1L)
    val after = visibleSig()
    published.foreach { case (n, sig) =>
      assert(after.get(n).contains(sig), s"published change file $n mutated")
    }
    val allK = spark.read.parquet(deltaDir).select("k").as[Long].collect().toSeq
    assert(!allK.contains(999999L), "stranded crashed postimage batch leaked")
    // the second update relays as preimage(777)/postimage(888)
    assert(foldLog() == live() && live().exists(p => p == (7L, 888L)))
    // compaction refuses while an update is un-relayed (folding the
    // u-file away would erase the late diff's only evidence), passes
    // after the relay accounts it, and the folded log still matches
    ManifestLand.updateWhere(spark, out, col("k") === 5L, Seq("x" -> lit(555L)))
    val ex = intercept[IllegalArgumentException] {
      ManifestLand.compactIfNeeded(spark, out, maxFiles = 1, targetFiles = 1)
    }
    assert(ex.getMessage.contains("changeFeedRelay"), ex.getMessage)
    ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k"))
    ManifestLand.compactIfNeeded(spark, out, maxFiles = 1, targetFiles = 1)
    assert(foldLog() == live() && live().exists(p => p == (5L, 555L)))
    // round 10 (found by the x_relay bench fixture): the maintenance
    // loop compact → relay → update → relay with NO version advance
    // resets the accounted evidence to empty each round, so the
    // entry-state tag RECURS — staged late-batch names keyed by it
    // collided with the earlier committed file on promotion. Names are
    // now keyed by the evidence-derived state this pass flips to
    // (nonce-unique); three rounds of the loop must publish distinct
    // files and stay fold-exact throughout.
    (1 to 3).foreach { round =>
      ManifestLand.compactIfNeeded(spark, out, maxFiles = 1, targetFiles = 1)
      ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k"))
      ManifestLand.updateWhere(spark, out, col("k") === 2L,
        Seq("x" -> lit(2000L + round)))
      ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k"))
      assert(foldLog() == live() && live().exists(p => p == (2L, 2000L + round)),
        s"recurring-evidence round $round diverged")
    }
  }

  test("relayGenerationSwap: snapshot-sized new log, fold-exact, old log frozen") {
    // round-9 closing-outlook #2: the change log's documented bound.
    // A new generation bootstraps from the CURRENT snapshot as pure
    // inserts (live-sized; replaying retained windows would re-route
    // an applied UPDATE through the key-level ladder — s35 pins that
    // composition), the attach marker re-points, the old log never
    // changes again, and folds over the new log equal the live landing
    // before AND after further syncs.
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_genswap").toString + "/landing"
    val log1 = Files.createTempDirectory("graft_mland_genswap_l1").toString
    val log2 = Files.createTempDirectory("graft_mland_genswap_l2").toString
    new java.io.File(out).mkdirs()
    def foldLog(d: String): Seq[(Long, Long)] = {
      val adds = col("_change_type").isin("insert", "update_postimage")
      spark.read.parquet(d).groupBy("k")
        .agg(sum(when(adds, 1L).otherwise(-1L)).as("n"),
          sum(when(adds, col("x")).otherwise(-col("x"))).as("x"))
        .filter(col("n") > 0L).select("k", "x")
        .as[(Long, Long)].collect().sorted.toSeq
    }
    def live(): Seq[(Long, Long)] = ManifestLand.read(spark, out)
      .select("k", "x").as[(Long, Long)].collect().sorted.toSeq
    def cfFiles(d: String): Map[String, (Long, Long)] =
      Option(new java.io.File(d).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("cf") && f.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    // churn: six versions, deletes interleaved, every version relayed
    (0 until 6).foreach { v =>
      ManifestLand.applyBatch(
        spark.range(v * 10L, (v + 1) * 10L)
          .select(col("id").as("k"), (col("id") * 5).as("x")).toDF(),
        v.toLong, out, statsCols = Seq(ManifestLand.CommitVersionCol),
        rangeParts = 1, trackChanges = true)
      if (v % 2 == 1)
        ManifestLand.deleteWhere(spark, out, col("k") === (v * 10L - 5L))
      ManifestLand.changeFeedRelay(spark, out, log1, Seq("k"))
    }
    assert(foldLog(log1) == live())
    ManifestLand.expireVersions(out, keep = 2)
    // the swap: new generation bounded by the 2-version retention
    assert(ManifestLand.relayGenerationSwap(spark, out, log2, Seq("k")) == 5L)
    assert(foldLog(log2) == live(), "new generation fold diverged")
    assert(cfFiles(log2).size < cfFiles(log1).size,
      s"new log ${cfFiles(log2).size} files, old ${cfFiles(log1).size} — not re-based")
    // attach marker re-pointed: the landing's maintenance follows log2
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, ManifestLand.RelayAttachFile)), "UTF-8") == log2)
    // further churn maintains ONLY the new generation; old log frozen
    val frozen = cfFiles(log1)
    ManifestLand.applyBatch(
      spark.range(60L, 70L).select(col("id").as("k"), (col("id") * 5).as("x")).toDF(),
      6L, out, statsCols = Seq(ManifestLand.CommitVersionCol),
      rangeParts = 1, trackChanges = true)
    ManifestLand.deleteWhere(spark, out, col("k") === 62L)
    ManifestLand.changeFeedRelay(spark, out, log2, Seq("k"))
    assert(foldLog(log2) == live(), "post-swap sync diverged")
    assert(cfFiles(log1) == frozen, "old generation mutated after the swap")
    // idempotence: re-swapping into the live generation is a no-op pass
    val before2 = cfFiles(log2)
    assert(ManifestLand.relayGenerationSwap(spark, out, log2, Seq("k")) == 6L)
    assert(cfFiles(log2) == before2)
    // refusal: a dir holding change files but no marker is not a fresh
    // generation (some other landing's log)
    val bogus = Files.createTempDirectory("graft_mland_genswap_bogus").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(log1, cfFiles(log1).keys.head),
      java.nio.file.Paths.get(bogus, cfFiles(log1).keys.head))
    val ex = intercept[IllegalArgumentException] {
      ManifestLand.relayGenerationSwap(spark, out, bogus, Seq("k"))
    }
    assert(ex.getMessage.contains("fresh generation"), ex.getMessage)
    // refusal: a FOREIGN live log (marker present, not this landing's
    // attach target) — every real log has a marker, so the marker-less
    // check alone cannot catch this; appending this landing's windows
    // into another landing's log would interleave two histories
    val out2 = Files.createTempDirectory("graft_mland_genswap2").toString + "/landing"
    val log3 = Files.createTempDirectory("graft_mland_genswap_l3").toString
    new java.io.File(out2).mkdirs()
    ManifestLand.applyBatch(
      spark.range(5L).select(col("id").as("k"), (col("id") * 7).as("x")).toDF(),
      0L, out2, statsCols = Seq(ManifestLand.CommitVersionCol),
      rangeParts = 1, trackChanges = true)
    ManifestLand.changeFeedRelay(spark, out2, log3, Seq("k"))
    val exForeign = intercept[IllegalArgumentException] {
      ManifestLand.relayGenerationSwap(spark, out, log3, Seq("k"))
    }
    assert(exForeign.getMessage.contains("another log's history"),
      exForeign.getMessage)
  }

  test("expireRelayGeneration: acknowledged expiry deletes a frozen generation, all else refuses") {
    // round-11 verdict #7: the swap freezes old generations forever —
    // this is the retention bound. Expiry is destructive for any
    // consumer still draining, so the verb demands the generation's
    // synced version as explicit acknowledgment (retiredRoots pattern).
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_expire").toString + "/landing"
    val log1 = Files.createTempDirectory("graft_mland_expire_l1").toString
    val log2 = Files.createTempDirectory("graft_mland_expire_l2").toString
    new java.io.File(out).mkdirs()
    (0 until 3).foreach { v =>
      ManifestLand.applyBatch(
        spark.range(v * 10L, (v + 1) * 10L)
          .select(col("id").as("k"), (col("id") * 5).as("x")).toDF(),
        v.toLong, out, statsCols = Seq(ManifestLand.CommitVersionCol),
        rangeParts = 1, trackChanges = true)
      ManifestLand.changeFeedRelay(spark, out, log1, Seq("k"))
    }
    assert(ManifestLand.relayGenerationSwap(spark, out, log2, Seq("k")) == 2L)
    // refuse: the landing's CURRENT log cannot expire
    val exLive = intercept[IllegalArgumentException] {
      ManifestLand.expireRelayGeneration(out, log2, 2L)
    }
    assert(exLive.getMessage.contains("CURRENT"), exLive.getMessage)
    // refuse: a marker-less dir is not a relay generation (never rm -rf)
    val plain = Files.createTempDirectory("graft_mland_expire_plain").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(plain, "keep.txt"),
      "data".getBytes("UTF-8"))
    val exPlain = intercept[IllegalArgumentException] {
      ManifestLand.expireRelayGeneration(out, plain, 0L)
    }
    assert(exPlain.getMessage.contains("no relay marker"), exPlain.getMessage)
    assert(new java.io.File(plain, "keep.txt").exists())
    // refuse: acknowledgment must name the generation's synced version
    val exAck = intercept[IllegalArgumentException] {
      ManifestLand.expireRelayGeneration(out, log1, 999L)
    }
    assert(exAck.getMessage.contains("acknowledgment mismatch"), exAck.getMessage)
    assert(new java.io.File(log1).exists())
    // acknowledged expiry deletes the frozen generation
    assert(ManifestLand.expireRelayGeneration(out, log1, 2L) == 2L)
    assert(!new java.io.File(log1).exists())
    // the live generation keeps syncing afterwards, fold-exact
    ManifestLand.applyBatch(
      spark.range(30L, 40L).select(col("id").as("k"), (col("id") * 5).as("x")).toDF(),
      3L, out, statsCols = Seq(ManifestLand.CommitVersionCol),
      rangeParts = 1, trackChanges = true)
    ManifestLand.changeFeedRelay(spark, out, log2, Seq("k"))
    val adds = col("_change_type").isin("insert", "update_postimage")
    val fold = spark.read.parquet(log2).groupBy("k")
      .agg(sum(when(adds, 1L).otherwise(-1L)).as("n"),
        sum(when(adds, col("x")).otherwise(-col("x"))).as("x"))
      .filter(col("n") > 0L).select("k", "x")
      .as[(Long, Long)].collect().sorted.toSeq
    val live = ManifestLand.read(spark, out)
      .select("k", "x").as[(Long, Long)].collect().sorted.toSeq
    assert(fold == live)
  }

  test("relay generation ownership: _cf_owner gates expiry and foreign relays") {
    // Round-12 review finding: the live-log refusal in
    // expireRelayGeneration only consults `dir`'s OWN attach file, so a
    // caller passing the wrong landing could delete another landing's
    // current generation. Every generation is now stamped _cf_owner at
    // attach time and expiry requires it to name the expiring landing.
    val spark = this.spark
    val outA = Files.createTempDirectory("graft_mland_owner_a").toString + "/landing"
    val outB = Files.createTempDirectory("graft_mland_owner_b").toString + "/landing"
    val logA = Files.createTempDirectory("graft_mland_owner_la").toString
    val logB = Files.createTempDirectory("graft_mland_owner_lb").toString
    Seq(outA, outB).foreach(o => new java.io.File(o).mkdirs())
    def seed(out: String, log: String): Unit = {
      ManifestLand.applyBatch(
        spark.range(10L).select(col("id").as("k"), (col("id") * 3).as("x")).toDF(),
        0L, out, statsCols = Seq(ManifestLand.CommitVersionCol),
        rangeParts = 1, trackChanges = true)
      ManifestLand.changeFeedRelay(spark, out, log, Seq("k"))
    }
    seed(outA, logA); seed(outB, logB)
    // attach stamped the owner record in the generation dir
    val ownerA = new java.io.File(logA, "_cf_owner")
    assert(ownerA.exists())
    assert(new java.io.File(new String(
      java.nio.file.Files.readAllBytes(ownerA.toPath), "UTF-8").trim)
      .getCanonicalPath == new java.io.File(outA).getCanonicalPath)
    // refuse: expiring B's generation by naming landing A — even with
    // the correct synced version, and even though logB is not A's
    // current attach target (the exact hole the owner record closes)
    val exForeign = intercept[IllegalArgumentException] {
      ManifestLand.expireRelayGeneration(outA, logB, 0L)
    }
    assert(exForeign.getMessage.contains("belongs to landing"),
      exForeign.getMessage)
    assert(new java.io.File(logB, "_cf_applied").exists())
    // refuse: relaying landing A's windows into B's (owner-stamped) log
    val exRelay = intercept[IllegalArgumentException] {
      ManifestLand.changeFeedRelay(spark, outA, logB, Seq("k"))
    }
    assert(exRelay.getMessage.contains("owned by landing"), exRelay.getMessage)
    // ...and the refusal must fire BEFORE the attach write (round-12
    // review finding): A's attach still names A's own log — a clobbered
    // attach would have defeated the live-log expiry refusal and the
    // compaction folding guard
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(outA, "_cf_relay")), "UTF-8") == logA)
    // refuse: a FOREIGN owner-less legacy log (marker, no _cf_owner, not
    // the caller's attach target) must NOT self-upgrade to the caller —
    // stamping would permanently lock out its rightful owner (review
    // finding). B's history and B's recovery stay intact.
    val ownerB = new java.io.File(logB, "_cf_owner")
    assert(ownerB.delete())
    val exLegacyRelay = intercept[IllegalArgumentException] {
      ManifestLand.changeFeedRelay(spark, outA, logB, Seq("k"))
    }
    assert(exLegacyRelay.getMessage.contains("cannot prove"),
      exLegacyRelay.getMessage)
    assert(!ownerB.exists(), "a refused relay must not stamp ownership")
    // B itself (whose attach names logB) self-upgrades on its next pass
    ManifestLand.changeFeedRelay(spark, outB, logB, Seq("k"))
    assert(ownerB.exists())
    assert(new String(java.nio.file.Files.readAllBytes(ownerB.toPath),
      "UTF-8").trim == new java.io.File(outB).getCanonicalPath)
    // self-upgrade: a LIVE owner-less generation (pre-ownership legacy)
    // is re-stamped by the next relay pass — the unambiguous shape
    assert(ownerA.delete())
    ManifestLand.changeFeedRelay(spark, outA, logA, Seq("k"))
    assert(ownerA.exists())
    // swap A to a fresh generation; logA is now frozen
    val logA2 = Files.createTempDirectory("graft_mland_owner_la2").toString
    val synced = ManifestLand.relayGenerationSwap(spark, outA, logA2, Seq("k"))
    // refuse: a FROZEN generation with NO owner record — the relay never
    // touches it again, so no self-upgrade; destructive verbs never
    // guess and the message tells the operator how to restore
    assert(ownerA.delete())
    val exLegacy = intercept[IllegalArgumentException] {
      ManifestLand.expireRelayGeneration(outA, logA, synced)
    }
    assert(exLegacy.getMessage.contains("no _cf_owner"), exLegacy.getMessage)
    assert(new java.io.File(logA, "_cf_applied").exists())
    // operator restores the owner record after verifying → expiry works
    java.nio.file.Files.write(ownerA.toPath, outA.getBytes("UTF-8"))
    assert(ManifestLand.expireRelayGeneration(outA, logA, synced) == synced)
    assert(!new java.io.File(logA).exists())
  }

  test("updateWhere lands in an un-relayed window exactly; missing accounted list self-upgrades") {
    // Round 10: an update INSIDE an un-relayed window no longer refuses —
    // the window itself relays it exactly (postimage as the in-window
    // insert, removed positions as update_preimage on every delete
    // rung), so the round-9 relay-lag refusal is lifted. Round 11: a
    // missing _accounted_upd on the synced version no longer refuses in
    // the two unambiguous shapes (canonical state name = list merely
    // lost; no u-files = trivially empty list) — the verb runs the
    // relay's own recovery kernel in place and proceeds. Only the
    // ambiguous remainder (non-canonical name WITH u-files) refuses.
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_updguard").toString + "/landing"
    val deltaDir = Files.createTempDirectory("graft_mland_updguard_log").toString
    new java.io.File(out).mkdirs()
    def commit(v: Long): Unit = ManifestLand.commitBatch(
      spark.range(v * 10L, (v + 1) * 10L)
        .select(col("id").as("k"), (col("id") * 5).as("x")).toDF(),
      v, out, statsCols = Seq(ManifestLand.CommitVersionCol),
      rangeParts = 1, trackChanges = true)
    def foldLog(): Seq[(Long, Long)] = {
      val adds = col("_change_type").isin("insert", "update_postimage")
      spark.read.parquet(deltaDir).groupBy("k")
        .agg(sum(when(adds, 1L).otherwise(-1L)).as("n"),
          sum(when(adds, col("x")).otherwise(-col("x"))).as("x"))
        .filter(col("n") > 0L).select("k", "x")
        .as[(Long, Long)].collect().sorted.toSeq
    }
    def live(): Seq[(Long, Long)] = ManifestLand.read(spark, out)
      .select("k", "x").as[(Long, Long)].collect().sorted.toSeq
    commit(0L)
    assert(ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k")) == 0L)
    commit(1L) // marker 0 < applied 1: the window is un-relayed
    // round 10: the update lands INSIDE the un-relayed window...
    assert(ManifestLand.updateWhere(spark, out, col("k") === 3L,
      Seq("x" -> lit(303L))) == 1L)
    assert(live().contains((3L, 303L)))
    // ...and the WINDOW relays it exactly: the removed position is an
    // update_preimage (never a suppressed delete), the postimage rides
    // the insert side, and the row-algebra fold equals the live landing
    assert(ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k")) == 1L)
    val winLog = spark.read.parquet(deltaDir)
    assert(winLog.filter(col("_change_type") === "update_preimage" &&
      col("k") === 3L && col("x") === 15L).count() == 1L,
      "windowed update must emit its preimage")
    assert(winLog.filter(col("_change_type") === "insert" &&
      col("k") === 3L && col("x") === 303L).count() == 1L,
      "windowed update's postimage must ride the insert side")
    assert(foldLog() == live() && live().contains((3L, 303L)))
    // lost accounted list on the LIVE state (canonical name — the name
    // itself hashes the u-file set, so the list was accounted and merely
    // lost): since round 11 the verb SELF-RESTORES the list in place —
    // the relay's step-3 kernel — and proceeds; no manual relay pass
    val mState = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(deltaDir, "_cf_applied")), "UTF-8")
      .trim.split("\t", -1)(1)
    val accF = new java.io.File(new java.io.File(deltaDir, mState), "_accounted_upd")
    assert(accF.exists() && accF.delete())
    assert(ManifestLand.updateWhere(spark, out, col("k") === 4L,
      Seq("x" -> lit(404L))) == 1L)
    assert(accF.exists(),
      "updateWhere must restore the lost accounted-update list in place")
    ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k"))
    assert(foldLog() == live() && live().contains((4L, 404L)))
    // AMBIGUOUS LOSS: the list vanishes after updates WERE accounted and
    // NEW late evidence lands (state name mismatch) — "all accounted"
    // would relay the late delete but silently drop any lost postimage,
    // so the relay must refuse; restoring the list (the operator's
    // acknowledgment) recovers and the fold stays exact
    val mState2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(deltaDir, "_cf_applied")), "UTF-8")
      .trim.split("\t", -1)(1)
    val accF2 = new java.io.File(new java.io.File(deltaDir, mState2), "_accounted_upd")
    val savedList = java.nio.file.Files.readAllBytes(accF2.toPath)
    ManifestLand.deleteWhere(spark, out, col("k") === 6L) // new dv evidence
    assert(accF2.delete())
    val exAmb = intercept[IllegalArgumentException] {
      ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k"))
    }
    assert(exAmb.getMessage.contains("_accounted_upd") &&
      exAmb.getMessage.contains("acknowledge"), exAmb.getMessage)
    java.nio.file.Files.write(accF2.toPath, savedList)
    ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k"))
    assert(foldLog() == live() && !live().exists(_._1 == 6L))
    // GENUINELY LEGACY shape (the pre-round-9 landing the round-10
    // verdict called cosmetic): non-canonical state NAME with NO u-files
    // on the synced version — simulated by renaming the state dir and
    // re-pointing the marker. updateWhere stamps the trivially-empty
    // list itself and proceeds; the next relay pass emits the update as
    // late postimage/preimage and the fold stays exact.
    val out4 = Files.createTempDirectory("graft_mland_updlegacy").toString + "/landing"
    val log4 = Files.createTempDirectory("graft_mland_updlegacy_log").toString
    new java.io.File(out4).mkdirs()
    ManifestLand.commitBatch(
      spark.range(0L, 10L).select(col("id").as("k"), (col("id") * 5).as("x")).toDF(),
      0L, out4, statsCols = Seq(ManifestLand.CommitVersionCol),
      rangeParts = 1, trackChanges = true)
    ManifestLand.changeFeedRelay(spark, out4, log4, Seq("k"))
    val marker4 = java.nio.file.Paths.get(log4, "_cf_applied")
    val fields = new String(java.nio.file.Files.readAllBytes(marker4), "UTF-8")
      .trim.split("\t", -1)
    val legacyName = "_cf_state_legacy00"
    assert(new java.io.File(log4, fields(1)).renameTo(
      new java.io.File(log4, legacyName)))
    // a legacy state carries no accounted-update list at all
    val legacyAcc = new java.io.File(new java.io.File(log4, legacyName),
      "_accounted_upd")
    if (legacyAcc.exists()) assert(legacyAcc.delete())
    java.nio.file.Files.write(marker4,
      (fields.updated(1, legacyName)).mkString("\t").getBytes("UTF-8"))
    assert(ManifestLand.updateWhere(spark, out4, col("k") === 2L,
      Seq("x" -> lit(222L))) == 1L)
    assert(legacyAcc.exists() && java.nio.file.Files.readAllBytes(
      legacyAcc.toPath).isEmpty,
      "updateWhere must stamp the trivially-empty accounted list on a legacy state")
    ManifestLand.changeFeedRelay(spark, out4, log4, Seq("k"))
    val log4df = spark.read.parquet(log4)
    assert(log4df.filter(col("_change_type") === "update_postimage" &&
      col("k") === 2L && col("x") === 222L).count() == 1L,
      "the post-upgrade relay must emit the update's postimage")
    val adds4 = col("_change_type").isin("insert", "update_postimage")
    val fold4 = log4df.groupBy("k")
      .agg(sum(when(adds4, 1L).otherwise(-1L)).as("n"),
        sum(when(adds4, col("x")).otherwise(-col("x"))).as("x"))
      .filter(col("n") > 0L).select("k", "x")
      .as[(Long, Long)].collect().sorted.toSeq
    val live4 = ManifestLand.read(spark, out4)
      .select("k", "x").as[(Long, Long)].collect().sorted.toSeq
    assert(fold4 == live4 && live4.contains((2L, 222L)))
  }

  test("compactIfNeeded refuses to fold un-relayed tombstones on a relay-attached landing") {
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_cguard").toString + "/landing"
    val deltaDir = Files.createTempDirectory("graft_mland_cguard_log").toString
    new java.io.File(out).mkdirs()
    def commit(v: Long, lo: Long, hi: Long): Unit = ManifestLand.applyBatch(
      spark.range(lo, hi).select(col("id").as("k"), (col("id") * 2).as("x"))
        .toDF().coalesce(1),
      v, out, statsCols = Seq(ManifestLand.CommitVersionCol), rangeParts = 1,
      trackChanges = true)
    (0 until 3).foreach(v => commit(v.toLong, v * 10L, (v + 1) * 10L))
    ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k"))
    // tombstones on the SYNCED version, not yet relayed: folding them
    // would erase the late-delete diff's only evidence — refuse
    ManifestLand.deleteWhere(spark, out, col("k") === 1L)
    val ex = intercept[IllegalArgumentException] {
      ManifestLand.compactIfNeeded(spark, out, maxFiles = 1, targetFiles = 1)
    }
    assert(ex.getMessage.contains("changeFeedRelay"), ex.getMessage)
    // once the relay accounts them the same compaction passes, and the
    // folded log still reconstructs the live landing
    ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k"))
    ManifestLand.compactIfNeeded(spark, out, maxFiles = 1, targetFiles = 1)
    def foldLog(): Seq[Long] = {
      val log = spark.read.parquet(deltaDir)
      log.filter(col("_change_type") === "insert").select("k")
        .join(log.filter(col("_change_type") === "delete").select("k"),
          Seq("k"), "left_anti").as[Long].collect().sorted.toSeq
    }
    val live = ManifestLand.read(spark, out).select("k")
      .as[Long].collect().sorted.toSeq
    assert(foldLog() == live && !live.contains(1L))
    // a marker BEHIND the current version is safe to fold past: the
    // un-relayed WINDOW's deletes survive via the exact anti-join rung
    commit(3L, 100L, 110L)
    ManifestLand.deleteWhere(spark, out, col("k") === 2L)
    ManifestLand.compactIfNeeded(spark, out, maxFiles = 1, targetFiles = 1)
    ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k"))
    assert(foldLog() == ManifestLand.read(spark, out).select("k")
      .as[Long].collect().sorted.toSeq)
    assert(!foldLog().contains(2L))
    // a change log deleted out from under a live relay still refuses
    // (guessing "detached" would silently lose deletes); the explicit
    // detach is the only way to re-enable folding
    graft.TempCleanup.rmrf(new java.io.File(deltaDir))
    commit(4L, 200L, 210L)
    ManifestLand.deleteWhere(spark, out, col("k") === 3L)
    intercept[IllegalArgumentException] {
      ManifestLand.compactIfNeeded(spark, out, maxFiles = 1, targetFiles = 1)
    }
    assert(ManifestLand.detachRelay(out))
    ManifestLand.compactIfNeeded(spark, out, maxFiles = 1, targetFiles = 1)
    assert(ManifestLand.read(spark, out).count() ==
      ManifestLand.read(spark, out).select("k").distinct().count())
  }

  test("randomized relay soak: appends, deletes, compactions, and crash debris interleave exactly") {
    val spark = this.spark
    import spark.implicits._
    // seeded driver over the full op mix; after EVERY relay pass the
    // folded change log must equal the live landing, no hidden debris
    // may survive, and a change file, once visible, must never change
    // bytes (the publication-protocol invariant a checkpointed consumer
    // depends on)
    val rnd = new scala.util.Random(0xC0FFEE)
    val out = Files.createTempDirectory("graft_mland_rsoak").toString + "/landing"
    val deltaDir = Files.createTempDirectory("graft_mland_rsoak_log").toString
    new java.io.File(out).mkdirs()
    var nextV = 0L
    var nextKey = 0L
    def append(): Unit = {
      val n = 10 + rnd.nextInt(20)
      ManifestLand.applyBatch(
        spark.range(nextKey, nextKey + n)
          .select(col("id").as("k"), (col("id") * 3).as("x")).toDF().coalesce(1),
        nextV, out, statsCols = Seq(ManifestLand.CommitVersionCol),
        rangeParts = 1, trackChanges = true)
      nextV += 1; nextKey += n
    }
    def liveKeys(): Seq[Long] =
      ManifestLand.read(spark, out).select("k").as[Long].collect().sorted.toSeq
    def foldLog(): Seq[Long] = {
      val log = spark.read.parquet(deltaDir)
      log.filter(col("_change_type") === "insert").select("k")
        .join(log.filter(col("_change_type") === "delete").select("k"),
          Seq("k"), "left_anti").as[Long].collect().sorted.toSeq
    }
    val sigs = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    append(); ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k"))
    for (round <- 1 to 18) {
      rnd.nextInt(4) match {
        case 0 => append()
        case 1 =>
          val ks = liveKeys()
          if (ks.nonEmpty) {
            ManifestLand.deleteWhere(spark, out,
              col("k") === ks(rnd.nextInt(ks.size)))
            ()
          }
        case 2 =>
          // the guard may refuse (un-relayed tombstones on the synced
          // version): relay, then the same compaction must pass
          try ManifestLand.compactIfNeeded(spark, out, maxFiles = 2, targetFiles = 1)
          catch { case e: IllegalArgumentException =>
            assert(e.getMessage.contains("changeFeedRelay"), e.getMessage)
            ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k"))
            ManifestLand.compactIfNeeded(spark, out, maxFiles = 2, targetFiles = 1)
          }
        case 3 => () // idle round → the relay below is a no-change pass
      }
      // crash debris: a stranded hidden attempt (invalid bytes — it
      // must be swept by NAME, never parsed) ...
      if (rnd.nextInt(3) == 0)
        java.nio.file.Files.write(java.nio.file.Paths.get(deltaDir,
          s".cf${rnd.nextInt(100)}dgarbage${round}_00000.parquet"),
          Array[Byte](1, 2, 3))
      // ... and sometimes a committed file left un-promoted
      // (mid-promotion death); rename preserves (length, mtime), so the
      // immutability signature must survive the recovery round-trip
      if (rnd.nextInt(4) == 0) {
        val mp = java.nio.file.Paths.get(deltaDir, "_cf_applied")
        val parts = new String(java.nio.file.Files.readAllBytes(mp), "UTF-8")
          .trim.split("\t", -1)
        if (parts.length == 3 && parts(2).nonEmpty) {
          val n = parts(2).split(",").head
          val vis = new java.io.File(deltaDir, n)
          if (vis.exists()) {
            java.nio.file.Files.move(vis.toPath,
              new java.io.File(deltaDir, "." + n).toPath)
            ()
          }
        }
      }
      ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k"))
      assert(foldLog() == liveKeys(), s"round $round: fold mismatch")
      assert(Option(new java.io.File(deltaDir).listFiles()).getOrElse(Array.empty)
        .forall(f => !f.getName.startsWith(".cf")),
        s"round $round: hidden debris survived")
      Option(new java.io.File(deltaDir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("cf") && f.getName.endsWith(".parquet"))
        .foreach { f =>
          val sig = (f.length(), f.lastModified())
          sigs.get(f.getName).foreach(old => assert(old == sig,
            s"round $round: published ${f.getName} mutated"))
          sigs(f.getName) = sig
        }
    }
  }

  test("relay consumer restart: a checkpointed stream over the change log reads only the increment") {
    val spark = this.spark
    import spark.implicits._
    // the s31 architecture's restart claim, pinned: the change log is a
    // PLAIN file-stream source, so a complete-mode stateful consumer
    // with a persistent checkpoint resumes across relay rounds reading
    // only the NEW change files — state carries the old fold
    val out = Files.createTempDirectory("graft_mland_rivm").toString + "/landing"
    val deltaDir = Files.createTempDirectory("graft_mland_rivm_log").toString
    val ckpt = Files.createTempDirectory("graft_mland_rivm_ck").toString
    new java.io.File(out).mkdirs()
    (0 until 3).foreach { v =>
      ManifestLand.applyBatch(
        spark.range(v * 1000L, (v + 1) * 1000L)
          .select(col("id").as("k"), (col("id") % 5).as("g")).toDF().coalesce(1),
        v.toLong, out, statsCols = Seq(ManifestLand.CommitVersionCol),
        rangeParts = 1, trackChanges = true)
    }
    ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k"))
    val logSchema = org.apache.spark.sql.types.StructType(
      ManifestLand.read(spark, out).schema.fields :+
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType))
    def runConsumer(): Map[Long, Long] = {
      val view = spark.readStream.schema(logSchema).parquet(deltaDir)
        .groupBy("g")
        .agg(sum(when(col("_change_type") === "insert", 1L).otherwise(-1L)).as("n"))
      val q = view.writeStream.outputMode("complete").format("memory")
        .queryName("relay_ivm").option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val res = spark.table("relay_ivm").as[(Long, Long)].collect().toMap
      spark.catalog.dropTempView("relay_ivm")
      res
    }
    assert(runConsumer() == (0L until 5L).map(_ -> 600L).toMap)
    // landing advances: a delete (late for v2) + a new batch; re-relay
    ManifestLand.deleteWhere(spark, out, col("k") < 10L)
    ManifestLand.applyBatch(
      spark.range(3000L, 3100L).select(col("id").as("k"), (col("id") % 5).as("g"))
        .toDF().coalesce(1), 3L, out,
      statsCols = Seq(ManifestLand.CommitVersionCol), rangeParts = 1,
      trackChanges = true)
    ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k"))
    val recs = new java.util.concurrent.atomic.AtomicLong
    val lsn = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) { recs.addAndGet(te.taskMetrics.inputMetrics.recordsRead); () }
    }
    spark.sparkContext.addSparkListener(lsn)
    val snap2 =
      try { val r = runConsumer(); Thread.sleep(1000); r }
      finally spark.sparkContext.removeSparkListener(lsn)
    // folded view = 3100 live rows minus the 10 deleted, per residue
    val expect = ManifestLand.read(spark, out).groupBy("g").agg(count(lit(1)))
      .as[(Long, Long)].collect().toMap
    assert(snap2 == expect)
    // the restart read the ~110 new change rows, not the 3000-row log
    assert(recs.get() < 1500L,
      s"restarted consumer re-read the whole change log: ${recs.get()} records")
  }

  test("change feed: incremental inserts prune by version zones, deletes survive compaction") {
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_cdf").toString + "/landing"
    new java.io.File(out).mkdirs()
    // 4 tracked batches, _commit_version declared as a zone-map column
    (0 until 4).foreach { i =>
      val b = spark.range(i * 100L, (i + 1) * 100L)
        .select(col("id").as("k"), (col("id") * 2).as("payload"))
      ManifestLand.applyBatch(b.toDF(), i, out,
        statsCols = Seq(ManifestLand.CommitVersionCol), rangeParts = 1,
        trackChanges = true)
    }
    // the insert path's file cut is visible through the zone maps alone
    assert(ManifestLand.prunedLiveFiles(out,
      Seq((ManifestLand.CommitVersionCol, 2L, 3L))).size == 2)
    // delete a window row (inserted v2) and a pre-window row (inserted v0)
    ManifestLand.deleteWhere(spark, out, col("k") === 250L || col("k") === 50L)
    def feed(): Map[(String, Long), Long] =
      ManifestLand.changeFeed(spark, out, 1L, 3L, Seq("k"))
        .select(col("_change_type"), col("k"), col("payload"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val f1 = feed()
    // net effect: k=250 was inserted AND deleted inside the window → absent
    assert(!f1.contains(("insert", 250L)) && !f1.contains(("delete", 250L)))
    // k=50 existed at v1, gone at v3 → a delete
    assert(f1(("delete", 50L)) == 100L)
    // inserts are exactly the window's surviving rows
    assert(f1.count(_._1._1 == "insert") == 199)
    assert(f1(("insert", 399L)) == 798L)
    // compaction folds the vectors and rewrites every file; the feed is
    // unchanged because lineage is a COLUMN, not a file name
    ManifestLand.compactIfNeeded(spark, out, maxFiles = 2, targetFiles = 2)
    assert(feed() == f1)
    // an untracked landing is refused
    val plain = Files.createTempDirectory("graft_mland_cdf2").toString + "/landing"
    new java.io.File(plain).mkdirs()
    ManifestLand.applyBatch(Seq(1L).toDF("k"), 0L, plain)
    ManifestLand.applyBatch(Seq(2L).toDF("k"), 1L, plain)
    intercept[IllegalArgumentException] {
      ManifestLand.changeFeed(spark, plain, 0L, 1L, Seq("k")).collect()
    }
  }

  test("schema evolution: additive columns NULL-fill old files; drops and retypes refused") {
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_evo").toString + "/landing"
    new java.io.File(out).mkdirs()
    ManifestLand.applyBatch(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), 0L, out)
    // additive evolution: new nullable column
    ManifestLand.applyBatch(
      Seq((3L, 30L, "x"), (4L, 40L, "y")).toDF("k", "v", "tag"), 1L, out)
    val got = ManifestLand.read(spark, out)
      .select(col("k"), col("v"), col("tag"))
      .as[(Long, Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 10L, None), (2L, 20L, None),
      (3L, 30L, Some("x")), (4L, 40L, Some("y"))))
    // dropping a column is refused
    intercept[IllegalArgumentException] {
      ManifestLand.applyBatch(Seq(5L).toDF("k"), 2L, out)
    }
    // retyping a column is refused
    intercept[IllegalArgumentException] {
      ManifestLand.applyBatch(
        Seq((6L, "oops", "z")).toDF("k", "v", "tag"), 2L, out)
    }
    // compaction reads through the evolved schema and keeps the NULL fill
    ManifestLand.applyBatch(Seq((5L, 50L, "z")).toDF("k", "v", "tag"), 2L, out)
    ManifestLand.compactIfNeeded(spark, out, maxFiles = 1, targetFiles = 1)
    val after = ManifestLand.read(spark, out)
      .select(col("k"), col("tag")).as[(Long, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(after == Seq((1L, None), (2L, None),
      (3L, Some("x")), (4L, Some("y")), (5L, Some("z"))))
  }

  test("z-order + multi-column zone maps: either dimension prunes alone, both prune harder") {
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_zz").toString + "/landing"
    new java.io.File(out).mkdirs()
    // two independent 8-bit dims: batch i carries x ∈ [i·64, (i+1)·64),
    // all y — 4 batches × 4 files clustered by the Morton key of (x, y)
    val zkey = expr(graft.queries.PipelineOps.zkeyExpr("x", "y"))
    (0 until 4).foreach { i =>
      val b = spark.range(i * 16384L, (i + 1) * 16384L)
        .select(((col("id") / 256L).cast("long") % 256L).as("x"),
          (col("id") % 256L).as("y"))
      ManifestLand.applyBatch(b.toDF(), i, out,
        statsCols = Seq("x", "y"), rangeParts = 4, clusterBy = Some(zkey))
    }
    assert(ManifestLand.liveFiles(out).size == 16)
    // x alone: one batch's worth of files
    assert(ManifestLand.prunedLiveFiles(out, Seq(("x", 0L, 63L))).size <= 4)
    // y alone: the z-order means each batch's files carry tight y-boxes
    // too — a quarter-range of y must skip at least half of ALL files
    val yOnly = ManifestLand.prunedLiveFiles(out, Seq(("y", 0L, 40L)))
    assert(yOnly.size <= 8, s"y-range failed to prune the z-ordered landing: $yOnly")
    // both axes: the rectangle keeps at most a couple of files
    val both = ManifestLand.prunedLiveFiles(out, Seq(("x", 0L, 40L), ("y", 0L, 40L)))
    assert(both.size <= 2, s"rectangle kept too many files: $both")
    // exactness: pruned + residual == full + filter on the rectangle
    val viaZones = ManifestLand.readPruned(spark, out, Seq(("x", 10L, 50L), ("y", 100L, 140L)))
      .filter(col("x").between(10L, 50L) && col("y").between(100L, 140L))
      .as[(Long, Long)].collect().sorted.toSeq
    val full = ManifestLand.read(spark, out)
      .filter(col("x").between(10L, 50L) && col("y").between(100L, 140L))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(viaZones == full && full.nonEmpty, "rectangle diverged through the zone maps")
  }

  test("deletion vectors: no data file rewritten; history retained; compaction folds") {
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_dv").toString + "/landing"
    new java.io.File(out).mkdirs()
    (0 until 3).foreach { i =>
      val b = spark.range(i * 10L, (i + 1) * 10L).select(col("id").as("k"))
      ManifestLand.applyBatch(b.toDF(), i, out)
    }
    val filesBefore = ManifestLand.liveFiles(out).toSet
    val bytesBefore = filesBefore.map(n =>
      n -> new java.io.File(out, n).length()).toMap
    // merge-on-read delete: every k in [5, 14]
    val n = ManifestLand.deleteWhere(spark, out, col("k") >= 5L && col("k") <= 14L)
    assert(n == 10L, s"tombstoned $n rows")
    // no data file touched — same names, same bytes; only a dv sidecar
    assert(ManifestLand.liveFiles(out).toSet == filesBefore)
    filesBefore.foreach(f =>
      assert(new java.io.File(out, f).length() == bytesBefore(f), s"$f rewritten"))
    val expect = (0L to 4L) ++ (15L to 29L)
    assert(ManifestLand.read(spark, out).as[Long].collect().sorted.toSeq == expect)
    // current version == current read (erasure includes the live snapshot)
    assert(ManifestLand.readVersion(spark, out, 2).as[Long].collect().sorted.toSeq
      == expect)
    // re-running the same delete tombstones nothing new
    assert(ManifestLand.deleteWhere(spark, out, col("k") >= 5L && col("k") <= 14L) == 0L)
    // pre-delete history is still served until expiry (retention-bounded
    // erasure): version 1 = batches 0..1, tombstones not yet written
    assert(ManifestLand.readVersion(spark, out, 1).as[Long].collect().sorted.toSeq
      == (0L to 19L))
    // a second, overlapping delete merges into ONE live vector sidecar
    assert(ManifestLand.deleteWhere(spark, out, col("k") === 20L) == 1L)
    assert(ManifestLand.readManifest(out).dvs.size == 1)
    assert(ManifestLand.read(spark, out).as[Long].collect().sorted.toSeq ==
      ((0L to 4L) ++ (15L to 19L) ++ (21L to 29L)))
    // compaction folds the vectors into clean files: rows stay gone, no
    // dv line survives, and expiry + vacuum drop the superseded bytes
    ManifestLand.compactIfNeeded(spark, out, maxFiles = 1, targetFiles = 1)
    assert(ManifestLand.readManifest(out).dvs.isEmpty)
    assert(ManifestLand.read(spark, out).as[Long].collect().sorted.toSeq ==
      ((0L to 4L) ++ (15L to 19L) ++ (21L to 29L)))
    ManifestLand.expireVersions(out, keep = 1)
    assert(diskParquet(out) == ManifestLand.liveFiles(out).toSet,
      "expiry + vacuum must leave disk == manifest")
  }

  test("updateWhere: atomic tombstone+rewrite flip; history, CDF, pruning, compaction all hold") {
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_upd").toString + "/landing"
    new java.io.File(out).mkdirs()
    // change-tracked landing with zone maps + blooms on k
    (0 until 3).foreach { i =>
      val b = spark.range(i * 10L, (i + 1) * 10L)
        .select(col("id").as("k"), (col("id") * 100L).as("v"))
      ManifestLand.applyBatch(b.toDF(), i, out,
        statsCols = Seq(ManifestLand.CommitVersionCol, "k"),
        bloomCol = Some("k"), trackChanges = true)
    }
    val filesBefore = ManifestLand.liveFiles(out).toSet
    // UPDATE v = v + 7 WHERE k between 5 and 14 (spans two batches)
    val n = ManifestLand.updateWhere(spark, out,
      col("k") >= 5L && col("k") <= 14L, Seq("v" -> (col("v") + 7L)))
    assert(n == 10L, s"updated $n rows")
    // old files untouched, new u-files joined the landing
    assert(filesBefore.subsetOf(ManifestLand.liveFiles(out).toSet))
    assert(ManifestLand.liveFiles(out).toSet != filesBefore)
    def kv(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select("k", "v").as[(Long, Long)].collect().toMap
    val expect = (0L until 30L).map(k =>
      k -> (if (k >= 5 && k <= 14) k * 100 + 7 else k * 100)).toMap
    // exactly one row per key, updated values in place
    assert(ManifestLand.read(spark, out).count() == 30L)
    assert(kv(ManifestLand.read(spark, out)) == expect)
    // current version == read; history below still serves pre-update rows
    assert(kv(ManifestLand.readVersion(spark, out, 2)) == expect)
    assert(kv(ManifestLand.readVersion(spark, out, 1)) ==
      (0L until 20L).map(k => k -> k * 100).toMap)
    // the same cond matches the rewritten rows again (v plays no part) —
    // a second update must update them AGAIN, not re-surface old rows
    assert(ManifestLand.updateWhere(spark, out,
      col("k") >= 5L && col("k") <= 14L, Seq("v" -> (col("v") + 7L))) == 10L)
    val expect2 = (0L until 30L).map(k =>
      k -> (if (k >= 5 && k <= 14) k * 100 + 14 else k * 100)).toMap
    assert(kv(ManifestLand.read(spark, out)) == expect2)
    // CDF over (1, 2]: batch 2's inserts PLUS the update's postimages as
    // UPSERTS — and NO delete rows, because every updated key still
    // exists at the window's end (net-effect-BY-KEY: a MERGE consumer
    // applies inserts by key, replacing the preimage)
    val feed = ManifestLand.changeFeed(spark, out, fromV = 1L, toV = 2L,
      keyCols = Seq("k"))
    val ins = feed.filter(col("_change_type") === "insert")
      .select("k", "v").as[(Long, Long)].collect().toMap
    val del = feed.filter(col("_change_type") === "delete")
      .select("k", "v").as[(Long, Long)].collect().toMap
    assert(ins == (20L until 30L).map(k => k -> k * 100).toMap ++
      (5L to 14L).map(k => k -> (k * 100 + 14)).toMap, ins.toString)
    assert(del == Map.empty[Long, Long], del.toString)
    // point-lookup pruning serves the rewritten keys from the new files
    val hitFiles = ManifestLand.prunedLiveFilesEq(out, 7L)
    assert(hitFiles.nonEmpty &&
      hitFiles.exists(f => !filesBefore.contains(f)),
      s"bloom cut $hitFiles misses the rewrite files")
    assert(ManifestLand.readPrunedEq(spark, out, 7L).filter(col("k") === 7L)
      .select("k", "v").as[(Long, Long)].collect().toSeq == Seq(7L -> 714L),
      "the pruned read must serve the REWRITTEN row exactly once")
    // refusals: engine-managed + unknown columns
    intercept[IllegalArgumentException] {
      ManifestLand.updateWhere(spark, out, col("k") === 1L,
        Seq(ManifestLand.CommitVersionCol -> org.apache.spark.sql.functions.lit(9L)))
    }
    intercept[IllegalArgumentException] {
      ManifestLand.updateWhere(spark, out, col("k") === 1L,
        Seq("nope" -> org.apache.spark.sql.functions.lit(9L)))
    }
    // updateMatching: the key-frame form patches exactly the given ids
    val keys = spark.range(3).select((col("id") * 2L).as("k")) // 0, 2, 4
    assert(ManifestLand.updateMatching(spark, out, keys.toDF(), Seq("k"),
      Seq("v" -> (col("v") + 1L))) == 3L)
    val expect3 = expect2.map { case (k, v) =>
      k -> (if (k == 0 || k == 2 || k == 4) v + 1 else v)
    }
    assert(kv(ManifestLand.read(spark, out)) == expect3)
    // a relay-attached landing ACCEPTS updates since round 9 (the late
    // accounting emits the postimages as update_postimage batches) —
    // provided the relay is SYNCED to the current version, the exact
    // late path (an un-relayed window refuses: see the guard spec) —
    // and compaction on that landing refuses until the relay accounts
    // them: folding the u-files would erase the late diff's evidence
    val rDelta = Files.createTempDirectory("graft_mland_upd_relay").toString
    ManifestLand.changeFeedRelay(spark, out, rDelta, Seq("k"))
    assert(ManifestLand.updateWhere(spark, out, col("k") === 1L,
      Seq("v" -> (col("v") + 1L))) == 1L)
    val expect4 = expect3.map { case (k, v) => k -> (if (k == 1) v + 1 else v) }
    assert(kv(ManifestLand.read(spark, out)) == expect4)
    val cErr = intercept[IllegalArgumentException] {
      ManifestLand.compactIfNeeded(spark, out, maxFiles = 1, targetFiles = 1)
    }
    assert(cErr.getMessage.contains("changeFeedRelay"), cErr.getMessage)
    assert(new java.io.File(out, ManifestLand.RelayAttachFile).delete())
    // compaction folds the update's tombstones; content survives
    ManifestLand.compactIfNeeded(spark, out, maxFiles = 1, targetFiles = 1)
    assert(ManifestLand.readManifest(out).dvs.isEmpty)
    assert(kv(ManifestLand.read(spark, out)) == expect4)
    ManifestLand.expireVersions(out, keep = 1)
    assert(diskParquet(out) == ManifestLand.liveFiles(out).toSet,
      "expiry + vacuum must leave disk == manifest")
  }

  test("statsCols cannot change mid-landing; all-NULL stats record an impossible zone") {
    // ADVICE r6 pair: (1) a statsCols change mid-landing would render old
    // entry lines whose bounds arity no longer matches the new stats=
    // header — every later parseManifest would throw, so applyBatch must
    // refuse up front; (2) an all-NULL stats file must not unbox to a
    // [0,0] zone that wrongly claims it may contain value 0.
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_scols").toString + "/landing"
    new java.io.File(out).mkdirs()
    ManifestLand.applyBatch(
      Seq((0L, 10L), (1L, 20L)).toDF("id", "x"), 0, out, statsCols = Seq("x"))
    intercept[IllegalArgumentException](ManifestLand.applyBatch(
      Seq((2L, 30L)).toDF("id", "x"), 1, out, statsCols = Seq("id")))
    // the landing is still readable and parseable after the refusal
    assert(ManifestLand.read(spark, out).count() == 2L)
    // batch of all-NULL stats values: its files must prune on EVERY range
    ManifestLand.applyBatch(
      Seq((2L, Option.empty[Long]), (3L, Option.empty[Long])).toDF("id", "x"),
      1, out, statsCols = Seq("x"))
    val kept = ManifestLand.prunedLiveFiles(out, Long.MinValue + 1, Long.MaxValue)
    assert(kept.forall(_.startsWith("b0_")),
      s"an all-NULL stats file survived pruning: $kept")
    // the full read still serves the NULL rows (pruning only applies to
    // range residuals, which NULL never satisfies)
    assert(ManifestLand.read(spark, out).count() == 4L)
  }

  test("randomized landing soak: zone maps, deletes, compaction interleave exactly") {
    val spark = this.spark
    import spark.implicits._
    for (seed <- Seq(5, 21)) {
      val rnd = new scala.util.Random(seed)
      val out = Files.createTempDirectory(s"graft_mland_soak$seed").toString + "/landing"
      new java.io.File(out).mkdirs()
      // model: the rows the landing must serve (id -> x)
      val model = scala.collection.mutable.Map.empty[Long, Long]
      var nextId = 0L
      def check(tag: String): Unit = {
        val got = ManifestLand.read(spark, out)
          .as[(Long, Long)].collect().sorted.toSeq
        assert(got == model.toSeq.sorted, s"seed=$seed $tag: landing != model")
        val (lo, hi) = { val a = rnd.nextInt(1000).toLong; (a, a + rnd.nextInt(300)) }
        val viaZones = ManifestLand.readPruned(spark, out, lo, hi)
          .filter(col("x").between(lo, hi)).as[(Long, Long)].collect().sorted.toSeq
        val want = model.toSeq.filter(kv => kv._2 >= lo && kv._2 <= hi).sorted
        assert(viaZones == want, s"seed=$seed $tag: pruned range [$lo,$hi] diverged")
      }
      for (b <- 0 until 6) {
        val rows = (0 until 50 + rnd.nextInt(100)).map { _ =>
          val r = (nextId, rnd.nextInt(1000).toLong); nextId += 1; r
        }
        ManifestLand.commitBatch(rows.toDF("id", "x"), b.toLong, out,
          statsCols = Seq("x"), rangeParts = 2)
        rows.foreach(r => model(r._1) = r._2)
        if (rnd.nextBoolean()) {
          val (dlo, dhi) = { val a = rnd.nextInt(1000).toLong; (a, a + rnd.nextInt(200)) }
          ManifestLand.deleteWhere(spark, out, col("x").between(dlo, dhi))
          model.filterInPlace((_, x) => x < dlo || x > dhi)
        }
        if (rnd.nextBoolean()) {
          // round-8 UPDATE verb joins the interleave: patch a random x
          // stripe (MOD stays inside the zone-mapped domain so pruning
          // keeps being exercised on post-update files)
          val (ulo, uhi) = { val a = rnd.nextInt(1000).toLong; (a, a + rnd.nextInt(200)) }
          val n = ManifestLand.updateWhere(spark, out,
            col("x").between(ulo, uhi),
            Seq("x" -> ((col("x") + 37L) % 1000L)))
          val expected = model.count(kv => kv._2 >= ulo && kv._2 <= uhi)
          assert(n == expected, s"seed=$seed batch $b: updated $n != $expected")
          model.mapValuesInPlace((_, x) =>
            if (x >= ulo && x <= uhi) (x + 37L) % 1000L else x)
        }
        if (rnd.nextInt(3) == 0)
          ManifestLand.compactIfNeeded(spark, out, maxFiles = 3, targetFiles = 2)
        check(s"after batch $b")
      }
    }
  }

  test("a lost relay marker over published change files refuses everywhere") {
    // round-10 review finding: deleting _cf_applied while cf* files stand
    // used to make the next relay re-bootstrap (double-count for
    // checkpointed consumers) and let maintenance verbs mutate the
    // landing silently. Both paths must refuse; a FRESH attach (no
    // marker, no files) must keep working.
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_lostmk").toString + "/landing"
    val deltaDir = Files.createTempDirectory("graft_mland_lostmk_log").toString
    new java.io.File(out).mkdirs()
    (0 until 2).foreach { v =>
      ManifestLand.applyBatch(
        spark.range(v * 10L, (v + 1) * 10L)
          .select(col("id").as("k"), (col("id") * 5).as("x")).toDF(),
        v.toLong, out, statsCols = Seq(ManifestLand.CommitVersionCol),
        rangeParts = 1, trackChanges = true)
    }
    assert(ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k")) == 1L)
    // simulate the loss
    assert(new java.io.File(deltaDir, "_cf_applied").delete())
    val exR = intercept[IllegalArgumentException] {
      ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("k"))
    }
    assert(exR.getMessage.contains("no _cf_applied marker"), exR.getMessage)
    val exU = intercept[IllegalArgumentException] {
      ManifestLand.updateWhere(spark, out, col("k") === 3L, Seq("x" -> lit(0L)))
    }
    assert(exU.getMessage.contains("no _cf_applied marker"), exU.getMessage)
    val exD = intercept[IllegalArgumentException] {
      ManifestLand.deleteWhere(spark, out, col("k") === 3L)
    }
    assert(exD.getMessage.contains("no _cf_applied marker"), exD.getMessage)
    // a FRESH attach still bootstraps: new landing, empty delta dir
    val out2 = Files.createTempDirectory("graft_mland_lostmk2").toString + "/landing"
    val delta2 = Files.createTempDirectory("graft_mland_lostmk2_log").toString
    new java.io.File(out2).mkdirs()
    ManifestLand.applyBatch(Seq((1L, 5L)).toDF("k", "x"), 0L, out2,
      statsCols = Seq(ManifestLand.CommitVersionCol), rangeParts = 1,
      trackChanges = true)
    assert(ManifestLand.changeFeedRelay(spark, out2, delta2, Seq("k")) == 0L)
  }
}
