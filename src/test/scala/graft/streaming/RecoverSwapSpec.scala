package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkFunSuite

/** Crash-recovery contract of the s13 compaction swap
  * ([[ParquetLand.recoverSwap]]): a process death between the two swap
  * renames must not lose the landing, and swap debris must not
  * accumulate. Also pins TempCleanup.rmrf's no-follow-symlink rule —
  * the sharded gate fixtures are symlink trees into read-only testdata,
  * so a deleter that recursed THROUGH links would destroy source data.
  */
class RecoverSwapSpec extends SparkFunSuite {

  test("half-swap crash (outDir renamed away, swap-in not run) is recovered") {
    val spark = this.spark
    import spark.implicits._
    val parent = Files.createTempDirectory("graft_swap").toString
    val out = s"$parent/landing"
    // Simulate the crash window: the compacted rewrite sits in
    // .compact7, the original was renamed to .old7, outDir is GONE.
    Seq(1L, 2L, 3L).toDF("v").write.parquet(s"$out.compact7")
    Seq(9L).toDF("v").write.parquet(s"$out.old7")
    // A stale earlier rewrite that a previous run already superseded:
    Seq(8L).toDF("v").write.parquet(s"$out.compact3")

    ParquetLand.recoverSwap(out)

    assert(new java.io.File(out).isDirectory, "landing not restored")
    assert(spark.read.parquet(out).as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L),
      "recovered landing must be the NEWEST completed rewrite")
    val leftovers = new java.io.File(parent).listFiles().map(_.getName).toSet
    assert(leftovers == Set("landing"), s"debris not swept: $leftovers")
  }

  test("a crashed-mid-write rewrite (no _SUCCESS) is swept, never promoted") {
    val spark = this.spark
    import spark.implicits._
    val parent = Files.createTempDirectory("graft_swap3").toString
    val out = s"$parent/landing"
    // CdcLand's FIRST batch crash window: outDir never existed and the
    // merge rewrite died mid-write. Promoting the partial dir would make
    // the replayed batch read it as the current snapshot instead of
    // calling init() — silent loss of every init row the partial write
    // missed. recoverSwap must treat it as debris.
    Seq(1L, 2L, 3L).toDF("v").write.parquet(s"$out.compact0")
    assert(new java.io.File(s"$out.compact0/_SUCCESS").delete(),
      "fixture: simulate a mid-write crash by removing the commit marker")

    ParquetLand.recoverSwap(out)

    assert(!new java.io.File(out).exists(),
      "a partial rewrite must NOT be promoted to the landing")
    val leftovers = new java.io.File(parent).listFiles().map(_.getName).toSet
    assert(leftovers.isEmpty, s"partial-rewrite debris not swept: $leftovers")
  }

  test("healthy landing is untouched; stale debris is swept") {
    val spark = this.spark
    import spark.implicits._
    val parent = Files.createTempDirectory("graft_swap2").toString
    val out = s"$parent/landing"
    Seq(1L, 2L).toDF("v").write.parquet(out)
    Seq(9L).toDF("v").write.parquet(s"$out.old4")
    Seq(8L).toDF("v").write.parquet(s"$out.compact4")

    ParquetLand.recoverSwap(out)

    assert(spark.read.parquet(out).as[Long].collect().sorted.toSeq == Seq(1L, 2L),
      "healthy landing must not change")
    val leftovers = new java.io.File(parent).listFiles().map(_.getName).toSet
    assert(leftovers == Set("landing"), s"debris not swept: $leftovers")
  }

  test("applyBatch is exactly-once under replay, including crashed half-applies") {
    val spark = this.spark
    import spark.implicits._
    val parent = Files.createTempDirectory("graft_apply").toString
    val out = s"$parent/landing"
    val df = Seq(1L, 2L, 3L, 4L).toDF("v")
    def landed(): Seq[Long] =
      spark.read.parquet(out).as[Long].collect().sorted.toSeq

    ParquetLand.applyBatch(df, 7, out)
    assert(landed() == Seq(1L, 2L, 3L, 4L))
    // full replay after commit: the marker short-circuits — even a
    // DIFFERENT frame for the same batchId must not land
    ParquetLand.applyBatch(df.unionAll(df), 7, out)
    assert(landed() == Seq(1L, 2L, 3L, 4L), "post-marker replay must be a no-op")
    // crashed half-apply: files moved but the high-water commit never
    // written (simulated by deleting the _applied file) plus a stale
    // extra part the crashed attempt left; replay must rebuild exactly
    assert(new java.io.File(s"$out._applied").delete())
    Seq(99L).toDF("v").coalesce(1).write.parquet(s"$parent/stale")
    val stalePart = new java.io.File(s"$parent/stale").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(stalePart.toPath, Paths.get(out, "b7_99999.parquet"))
    ParquetLand.applyBatch(df, 7, out)
    assert(landed() == Seq(1L, 2L, 3L, 4L),
      "pre-marker replay must replace ALL of the crashed attempt's files")
    // a different batch id appends rather than replaces
    ParquetLand.applyBatch(Seq(9L).toDF("v"), 8, out)
    assert(landed() == Seq(1L, 2L, 3L, 4L, 9L))
  }

  test("stageParts stages as a hidden sibling and sweeps a crashed attempt's stage debris") {
    val spark = this.spark
    import spark.implicits._
    val parent = Files.createTempDirectory("graft_stage_sib").toString
    val out = s"$parent/landing"
    // crashed-attempt debris: a stale hidden stage dir with a file in it
    val stale = Paths.get(parent, ".landing.stage_crashed")
    Files.createDirectories(stale)
    Files.writeString(stale.resolve("leftover.parquet"), "junk")
    // a DIFFERENT landing's in-flight stage in the same parent: the
    // sweep is name-scoped, so an over-broad "sweep all hidden
    // siblings" regression must fail here, not delete a neighbor's
    // mid-write data
    val neighbor = Paths.get(parent, ".other.stage_inflight")
    Files.createDirectories(neighbor)
    Files.writeString(neighbor.resolve("part.parquet"), "neighbor bytes")
    ParquetLand.applyBatch(Seq(1L, 2L).toDF("v"), 0, out)
    assert(!Files.exists(stale), "stale stage debris must be swept at entry")
    assert(Files.exists(neighbor.resolve("part.parquet")),
      "the sweep must NOT touch another landing's stage dir")
    assert(spark.read.parquet(out).as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // no own-stage dir survives a successful apply; only the landing,
    // its marker, and the untouched neighbor remain (same-FS staging
    // means the moves were true renames)
    val leftovers = new java.io.File(parent).listFiles().map(_.getName).toSet
    assert(leftovers == Set("landing", "landing._applied", ".other.stage_inflight"),
      s"unexpected siblings: $leftovers")
  }

  test("rmrf unlinks directory symlinks without deleting their targets") {
    val target = Files.createTempDirectory("graft_rmrf_target")
    val kept = target.resolve("keep.txt")
    Files.writeString(kept, "survives")
    val scratch = Files.createTempDirectory("graft_rmrf_scratch")
    Files.createSymbolicLink(scratch.resolve("link"), target)
    Files.writeString(scratch.resolve("own.txt"), "goes")

    graft.TempCleanup.rmrf(scratch.toFile)

    assert(!Files.exists(scratch), "scratch dir must be fully removed")
    assert(Files.exists(kept), "rmrf must NOT follow the symlink into the target")
  }
}
