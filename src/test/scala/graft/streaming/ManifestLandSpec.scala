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

  test("applyAndCommit is exactly-once under replay; vacuum sweeps crash orphans") {
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mland_apply").toString + "/landing"
    new java.io.File(out).mkdirs()
    val df = Seq(1L, 2L, 3L).toDF("v")
    def landed(): Seq[Long] =
      ManifestLand.read(spark, out).as[Long].collect().sorted.toSeq

    ManifestLand.applyAndCommit(df, 5, out, maxFiles = 100, targetFiles = 1)
    assert(landed() == Seq(1L, 2L, 3L))
    // post-commit replay: detected via the live b5_ prefix — a no-op
    // even for a different frame carrying the same batch id
    ManifestLand.applyAndCommit(df.unionAll(df), 5, out, maxFiles = 100, targetFiles = 1)
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
    ManifestLand.applyAndCommit(Seq(99L).toDF("v"), 9, out, maxFiles = 100, targetFiles = 1)
    assert(landed() == Seq(1L, 2L, 3L, 99L))
  }
}
