package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.{ParquetLand, StreamingOps}

/** Every streaming query's stream builder must land real parquet files
  * through the production sink path (round-3 verdict #6): the memory sink
  * is the oracle-gate read; these tests drive the SAME builders through
  * ParquetLand and assert the landed files carry the same answer.
  */
class StreamingSinkSpec extends SparkFunSuite {
  private val sf = "/root/testdata/sf0.001"

  private def tmp(tag: String): (String, String) =
    (Files.createTempDirectory(s"graft_land_$tag").toString,
      Files.createTempDirectory(s"graft_land_${tag}_ckpt").toString)

  private def canon(df: DataFrame): Set[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf)).toSet

  test("s01 hourly agg lands as a complete-mode parquet snapshot") {
    val (out, ckpt) = tmp("s01")
    ParquetLand.completeSnapshot(StreamingOps.hourlyAggStream(spark, sf), out, ckpt)
    val landed = spark.read.parquet(out)
    assert(canon(landed) == canon(StreamingOps.hourlyAgg(spark, sf)))
    assert(landed.count() > 0)
  }

  test("s02 stateful sessions land as an update-mode journal") {
    val (out, ckpt) = tmp("s02")
    ParquetLand.updateJournal(StreamingOps.statefulSessionsStream(spark, sf), out, ckpt)
    val journal = spark.read.parquet(out)
    assert(journal.columns.contains("_batch_id"), "journal must stamp batch ids")
    val state = ParquetLand.journalState(journal, Seq("user_id"))
    assert(canon(state) == canon(StreamingOps.statefulSessions(spark, sf)))
  }

  test("s03 streaming dedup lands as a complete-mode parquet snapshot") {
    val (out, ckpt) = tmp("s03")
    ParquetLand.completeSnapshot(StreamingOps.streamingDedupStream(spark, sf), out, ckpt)
    val rollup = spark.read.parquet(out)
      .groupBy("source").agg(count(lit(1)).as("n_unique_docs"))
    assert(canon(rollup) == canon(StreamingOps.streamingDedup(spark, sf)))
  }

  test("s04 stream-static join lands as a complete-mode parquet snapshot") {
    val (out, ckpt) = tmp("s04")
    ParquetLand.completeSnapshot(StreamingOps.streamStaticJoinStream(spark, sf), out, ckpt)
    assert(canon(spark.read.parquet(out)) ==
      canon(StreamingOps.streamStaticJoin(spark, sf)))
  }

  test("s05 stream-stream join pairs land via the native append sink with commit log") {
    val (out, ckpt) = tmp("s05")
    ParquetLand.append(StreamingOps.streamStreamJoinStream(spark, sf), out, ckpt)
    // exactly-once bookkeeping: the native sink writes _spark_metadata
    assert(new java.io.File(s"$out/_spark_metadata").exists(),
      "native parquet sink must write its commit log")
    val rollup = spark.read.parquet(out)
      .groupBy(col("uid_v").as("user_id"))
      .agg(count(lit(1)).as("n_conversions"))
    assert(canon(rollup) == canon(StreamingOps.streamStreamJoin(spark, sf)))
  }

  test("s08 streaming contamination lands as a complete-mode parquet snapshot") {
    val (out, ckpt) = tmp("s08")
    ParquetLand.completeSnapshot(
      StreamingOps.streamingContaminationStream(spark, sf), out, ckpt)
    val finalized = spark.read.parquet(out)
      .select(col("doc_id"), col("n_shingles"), col("n_hits"),
        expr("CAST(1000 * n_hits div n_shingles AS BIGINT)").as("contam_permille"))
    assert(canon(finalized) == canon(StreamingOps.streamingContamination(spark, sf)))
  }

  test("s10 session windows land as a complete-mode parquet snapshot") {
    val (out, ckpt) = tmp("s10")
    ParquetLand.completeSnapshot(StreamingOps.sessionWindowStream(spark, sf), out, ckpt)
    assert(canon(spark.read.parquet(out)) ==
      canon(StreamingOps.sessionWindows(spark, sf)))
  }

  test("s09 streaming KMV lands as an update-mode journal") {
    val (out, ckpt) = tmp("s09")
    ParquetLand.updateJournal(StreamingOps.streamingKmvStream(spark, sf), out, ckpt)
    val state = ParquetLand.journalState(spark.read.parquet(out), Seq("l_returnflag"))
      .select(col("l_returnflag"),
        expr("CAST(CASE WHEN kth IS NULL THEN n_h ELSE (255 * CAST(4294967296 AS BIGINT)) div kth END AS BIGINT)")
          .as("est_distinct"))
    assert(canon(state) == canon(StreamingOps.streamingKmv(spark, sf)))
  }
}
