package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkFunSuite

/** CdcLand's contracts: last-writer-wins upsert/delete application in
  * batch order, the swap-commit crash window, and the merge-idempotence
  * property its exactly-once story rests on.
  */
class CdcLandSpec extends SparkFunSuite {

  private val changeSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType),
    StructField("op", StringType)))

  // the test merge: tombstoned last-writer-wins by (k), batch-latest row
  // picked by max v (unique per batch in the fixtures)
  private def merge(snap: DataFrame, batch: Dataset[Row]): DataFrame = {
    val latest = batch.groupBy("k")
      .agg(max_by(struct(col("v"), col("op")), col("v")).as("m"))
      .select(col("k"), col("m.v").as("v"), col("m.op").as("op"))
    graft.operators.MergeInto(snap, latest, "k",
      deleteWhen = lit(false),
      outCols = Seq(
        "k" -> ((col("s.k"), col("b.k"), col("s.k"))),
        "v" -> ((when(col("s.op") === "U", col("s.v")).otherwise(col("b.v")),
          col("b.v"), col("s.v"))),
        "deleted" -> ((col("s.op") === "D", col("b.deleted"),
          col("s.op") === "D"))))
  }

  private def landOne(df: DataFrame, dir: String, name: String): Unit = {
    val stage = Files.createTempDirectory("graft_cdc_part").toString
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, Paths.get(s"$dir/$name"))
    Thread.sleep(25)
  }

  test("upsert applies batches in order: updates override, deletes tombstone, reinserts revive") {
    val spark = this.spark
    import spark.implicits._
    val land = Files.createTempDirectory("graft_cdc_land").toString
    val out = Files.createTempDirectory("graft_cdc_out").toString + "/snapshot"
    val ckpt = Files.createTempDirectory("graft_cdc_ckpt").toString
    // batch 0: insert 1→10, 2→20; batch 1: update 1→11, delete 2;
    // batch 2: reinsert 2→22, insert 3→30
    landOne(Seq((1L, 10L, "U"), (2L, 20L, "U")).toDF("k", "v", "op"), land, "000.parquet")
    landOne(Seq((1L, 11L, "U"), (2L, 21L, "D")).toDF("k", "v", "op"), land, "001.parquet")
    landOne(Seq((2L, 22L, "U"), (3L, 30L, "U")).toDF("k", "v", "op"), land, "002.parquet")
    val stream = spark.readStream.schema(changeSchema)
      .option("maxFilesPerTrigger", 1).parquet(land)
    CdcLand.upsert(stream, out, ckpt,
      init = () => Seq.empty[(Long, Long)].toDF("k", "v")
        .withColumn("deleted", lit(false)))(merge)
    val got = spark.read.parquet(out).filter(!col("deleted"))
      .select("k", "v").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 11L), (2L, 22L), (3L, 30L)), s"got $got")
  }

  test("merge is a fixpoint under replay; a crash between the renames recovers") {
    val spark = this.spark
    import spark.implicits._
    val out = Files.createTempDirectory("graft_cdc_crash").toString + "/snapshot"
    val batch = Seq((1L, 5L, "U"), (2L, 6L, "D")).toDF("k", "v", "op")
    val init = Seq((2L, 2L)).toDF("k", "v").withColumn("deleted", lit(false))
    // first application
    merge(init, batch).write.mode("overwrite").parquet(out)
    val once = spark.read.parquet(out).as[(Long, Long, Boolean)].collect().sorted.toSeq
    // replay: re-merging the SAME batch into the post-batch snapshot must
    // be a no-op — the idempotence CdcLand's exactly-once relies on
    val tmp = s"$out.compact7"
    merge(spark.read.parquet(out), batch).write.mode("overwrite").parquet(tmp)
    // crash window: swap-out happened (outDir gone), swap-in did not
    graft.TempCleanup.rmrf(new java.io.File(out))
    ParquetLand.recoverSwap(out)
    val twice = spark.read.parquet(out).as[(Long, Long, Boolean)].collect().sorted.toSeq
    assert(twice == once, s"replay diverged: $twice vs $once")
    assert(!new java.io.File(tmp).exists(), "recovery left the .compact dir behind")
  }
}
