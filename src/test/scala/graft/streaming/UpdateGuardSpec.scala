package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Round 12 (VERDICT r11 #4): the ONE remaining updateWhere refusal —
  * the synced version's relay state has u-files, no `_accounted_upd`,
  * and a non-canonical state name — named, pinned non-destructive, and
  * its operator runbook exercised end-to-end. The refusal is permanent
  * by design: the lost accounted list is the only artifact that could
  * tell already-relayed postimages from un-relayed ones (the state name
  * hashes the set, it does not enumerate it), so guessing either way
  * silently loses or double-emits rows for checkpointed consumers.
  */
class UpdateGuardSpec extends graft.SparkFunSuite {

  test("ambiguous _accounted_upd loss: updateWhere refuses, destroys nothing, runbook recovers exactly") {
    val s = spark
    import s.implicits._
    val out = Files.createTempDirectory("graft_updguard2").toString + "/landing"
    val log = Files.createTempDirectory("graft_updguard2_log").toString
    new java.io.File(out).mkdirs()
    ManifestLand.commitBatch(
      s.range(0L, 10L).select(col("id").as("k"), (col("id") * 5).as("x")).toDF(),
      0L, out, statsCols = Seq(ManifestLand.CommitVersionCol),
      rangeParts = 1, trackChanges = true)
    ManifestLand.changeFeedRelay(spark, out, log, Seq("k"))
    // first update, relayed: its u-file is ACCOUNTED (canonical state)
    assert(ManifestLand.updateWhere(spark, out, col("k") === 1L,
      Seq("x" -> lit(111L))) == 1L)
    ManifestLand.changeFeedRelay(spark, out, log, Seq("k"))
    val state = new String(Files.readAllBytes(
      java.nio.file.Paths.get(log, "_cf_applied")), "UTF-8")
      .trim.split("\t", -1)(1)
    val accF = new java.io.File(new java.io.File(log, state), "_accounted_upd")
    assert(accF.exists())
    val savedList = Files.readAllBytes(accF.toPath)
    // second update, NOT relayed: new u-files land, the state name is now
    // non-canonical relative to the current u-file set
    assert(ManifestLand.updateWhere(spark, out, col("k") === 2L,
      Seq("x" -> lit(222L))) == 1L)
    // ...and the accounted list vanishes: the EXACT ambiguous shape —
    // non-canonical name WITH u-files, no list. No artifact left on disk
    // can tell the first (already relayed) u-file from the second.
    assert(accF.delete())
    val before = ManifestLand.read(spark, out)
      .select("k", "x").as[(Long, Long)].collect().sorted.toSeq
    val ex = intercept[IllegalStateException] {
      ManifestLand.updateWhere(spark, out, col("k") === 3L,
        Seq("x" -> lit(333L)))
    }
    assert(ex.getMessage.contains("cannot tell accounted") &&
      ex.getMessage.contains("_accounted_upd"), ex.getMessage)
    // non-destructive: landing rows, manifest, and log all untouched
    val after = ManifestLand.read(spark, out)
      .select("k", "x").as[(Long, Long)].collect().sorted.toSeq
    assert(after == before && after.contains((2L, 222L)))
    assert(!accF.exists(), "the refusal must not fabricate an accounted list")
    // runbook step (a): the operator, knowing the FIRST u-file was
    // relayed and the second was not, restores the accounted list that
    // names exactly the relayed set — the verb proceeds
    Files.write(accF.toPath, savedList)
    assert(ManifestLand.updateWhere(spark, out, col("k") === 3L,
      Seq("x" -> lit(333L))) == 1L)
    // the next relay emits BOTH un-relayed updates (k=2 late, k=3 new)
    // exactly once each, and the row-algebra fold equals the landing
    ManifestLand.changeFeedRelay(spark, out, log, Seq("k"))
    val logDf = s.read.parquet(log)
    Seq((2L, 222L), (3L, 333L)).foreach { case (k, x) =>
      assert(logDf.filter(col("_change_type") === "update_postimage" &&
        col("k") === k && col("x") === x).count() == 1L, s"postimage k=$k")
    }
    val adds = col("_change_type").isin("insert", "update_postimage")
    val fold = logDf.groupBy("k")
      .agg(sum(when(adds, 1L).otherwise(-1L)).as("n"),
        sum(when(adds, col("x")).otherwise(-col("x"))).as("x"))
      .filter(col("n") > 0L).select("k", "x")
      .as[(Long, Long)].collect().sorted.toSeq
    val live = ManifestLand.read(spark, out)
      .select("k", "x").as[(Long, Long)].collect().sorted.toSeq
    assert(fold == live && live.contains((3L, 333L)))
  }
}
