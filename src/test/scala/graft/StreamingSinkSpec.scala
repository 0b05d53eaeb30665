package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

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

  /** Write `df` as ONE parquet file named `$dir/$name`, with strictly
    * increasing mod times so the file stream replays oldest-first.
    */
  private def land(df: DataFrame, dir: String, name: String): Unit = {
    val stage = Files.createTempDirectory("graft_split_part").toString
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/$name"))
    Thread.sleep(20)
  }

  test("s14 streaming ANN equals the batch e01 answer across micro-batches") {
    // 3 query files consumed one per trigger: the per-batch broadcast
    // scoring must compose to exactly the batch top-k (landed through
    // the production parquet append inside the builder itself).
    // MULTISET comparison (sorted rows, not a Set): a replayed batch's
    // duplicate appends must fail here the same way they would fail the
    // driver's hash gate.
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
    val got = rows(StreamingOps.streamingAnn(spark, sf))
    val want = rows(graft.queries.VectorOps.cosineTopK(spark, sf))
    assert(got == want)
  }

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

  test("s12 left-outer join pairs land via the native append sink, outer rows included") {
    val (out, ckpt) = tmp("s12")
    ParquetLand.append(StreamingOps.leftOuterFunnelStream(spark, sf), out, ckpt)
    val landed = spark.read.parquet(out)
    // the watermark sentinels must have flushed real outer (NULL-purchase)
    // rows into the durable sink, not just the inner matches
    assert(landed.filter(col("t_p").isNull && col("uid_v") >= 0).count() > 0,
      "no outer rows landed — watermark finalization failed")
    val rollup = landed.filter(col("uid_v") >= 0)
      .groupBy(col("uid_v").as("user_id"))
      .agg(count(lit(1)).as("n_rows"), count(col("t_p")).as("n_converted"))
    assert(canon(rollup) == canon(StreamingOps.leftOuterFunnel(spark, sf)))
  }

  test("s13 compacting landing keeps the file count bounded across batches") {
    val (rollup, out) = StreamingOps.streamEtlCompactedWithDir(spark, sf)
    val n = rollup.count() // materialize: drives the 4-batch stream + compactions
    assert(n > 0)
    val parts = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    // 4 appended batches would leave >= 4 files; the in-loop compactor
    // must hold the landing at or under its 2-file target + one append
    assert(parts <= 3, s"compactor failed to bound the landing: $parts files")
    // content survives every rewrite: equals the direct batch rollup
    val batch = graft.queries.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(floor((value) * 10000 + 0.5) AS BIGINT)")).as("sum_value_e4"),
        countDistinct(col("user_id")).as("n_users"))
    assert(canon(spark.read.parquet(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_e4")).as("sum_value_e4"),
        countDistinct(col("user_id")).as("n_users"))) == canon(batch))
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

  test("s02 sessions: 3-file one-per-trigger split equals the single batch") {
    import org.apache.spark.sql.functions._
    // time-ordered 3-way split (sessions document time-ordered arrival,
    // the replayed-landing-directory contract)
    val dir = Files.createTempDirectory("graft_split_ev").toString
    val ev = graft.queries.Tables.events(spark, sf)
    val ts = ev.select("ts").orderBy("ts").collect().map(_.getLong(0))
    val (t1, t2) = (ts(ts.length / 3), ts(2 * ts.length / 3))
    land(ev.filter(col("ts") <= t1), dir, "events0.parquet")
    land(ev.filter(col("ts") > t1 && col("ts") <= t2), dir, "events1.parquet")
    land(ev.filter(col("ts") > t2), dir, "events2.parquet")
    val (out, ckpt) = tmp("s02split")
    ParquetLand.updateJournal(
      StreamingOps.statefulSessionsStream(spark, dir, maxFilesPerTrigger = Some(1)),
      out, ckpt)
    val journal = spark.read.parquet(out)
    assert(journal.select("_batch_id").distinct().count() >= 3,
      "expected at least 3 micro-batches")
    assert(canon(ParquetLand.journalState(journal, Seq("user_id"))) ==
      canon(StreamingOps.statefulSessions(spark, sf)),
      "session state diverged across micro-batch boundaries")
  }

  test("s18 transformWithState: 3-file split equals the single batch (RocksDB state)") {
    import org.apache.spark.sql.functions._
    // same time-ordered split contract as s02 — the point is that the
    // NEW API's ValueState survives micro-batch boundaries identically
    val dir = Files.createTempDirectory("graft_split_tws").toString
    val ev = graft.queries.Tables.events(spark, sf)
    val ts = ev.select("ts").orderBy("ts").collect().map(_.getLong(0))
    val (t1, t2) = (ts(ts.length / 3), ts(2 * ts.length / 3))
    land(ev.filter(col("ts") <= t1), dir, "events0.parquet")
    land(ev.filter(col("ts") > t1 && col("ts") <= t2), dir, "events1.parquet")
    land(ev.filter(col("ts") > t2), dir, "events2.parquet")
    val (out, ckpt) = tmp("s18split")
    graft.streaming.StateStores.withRocksDb(spark) {
      ParquetLand.updateJournal(
        StreamingOps.transformWithStateStream(spark, dir, maxFilesPerTrigger = Some(1)),
        out, ckpt)
    }
    val journal = spark.read.parquet(out)
    assert(journal.select("_batch_id").distinct().count() >= 3,
      "expected at least 3 micro-batches")
    assert(canon(ParquetLand.journalState(journal, Seq("user_id"))) ==
      canon(StreamingOps.transformWithStateSessions(spark, sf)),
      "transformWithState state diverged across micro-batch boundaries")
  }

  test("s09 KMV: arbitrary 3-file split equals the single batch (mergeable state)") {
    import org.apache.spark.sql.functions._
    // ARBITRARY split (not time-ordered): the KMV merge is commutative
    // and idempotent, so any batch assignment must yield the same sketch
    val dir = Files.createTempDirectory("graft_split_li").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    (0 until 3).foreach { i =>
      land(li.filter(pmod(col("l_orderkey"), lit(3)) === i), dir, s"lineitem$i.parquet")
    }
    val (out, ckpt) = tmp("s09split")
    ParquetLand.updateJournal(
      StreamingOps.streamingKmvStream(spark, dir, maxFilesPerTrigger = Some(1)),
      out, ckpt)
    val journal = spark.read.parquet(out)
    assert(journal.select("_batch_id").distinct().count() >= 3)
    val est = ParquetLand.journalState(journal, Seq("l_returnflag"))
      .select(col("l_returnflag"),
        expr("CAST(CASE WHEN kth IS NULL THEN n_h ELSE (255 * CAST(4294967296 AS BIGINT)) div kth END AS BIGINT)")
          .as("est_distinct"))
    assert(canon(est) == canon(StreamingOps.streamingKmv(spark, sf)),
      "KMV sketch state diverged across micro-batch boundaries")
  }

  test("s10 session windows land as a complete-mode parquet snapshot") {
    val (out, ckpt) = tmp("s10")
    ParquetLand.completeSnapshot(StreamingOps.sessionWindowStream(spark, sf), out, ckpt)
    assert(canon(spark.read.parquet(out)) ==
      canon(StreamingOps.sessionWindows(spark, sf)))
  }

  test("s11 streaming top-k counts land as a complete-mode parquet snapshot") {
    val (out, ckpt) = tmp("s11")
    ParquetLand.completeSnapshot(StreamingOps.hourlyTopTypesStream(spark, sf), out, ckpt)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("hour_bucket")
      .orderBy(col("n").desc, col("event_type").asc)
    val ranked = spark.read.parquet(out)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 2)
      .select(col("hour_bucket"), col("event_type"), col("n"),
        col("rnk").cast("long").as("rnk"))
    assert(canon(ranked) == canon(StreamingOps.hourlyTopTypes(spark, sf)))
  }

  /** All files under `dir`, recursively. */
  private def filesUnder(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir))
  }

  test("s02 sessions under the RocksDB state store equal the batch result") {
    val (out, ckpt) = tmp("s02rocks")
    graft.streaming.StateStores.withRocksDb(spark) {
      ParquetLand.updateJournal(StreamingOps.statefulSessionsStream(spark, sf), out, ckpt)
    }
    val state = ParquetLand.journalState(spark.read.parquet(out), Seq("user_id"))
    assert(canon(state) == canon(StreamingOps.statefulSessions(spark, sf)))
    // the checkpoint must actually carry RocksDB artifacts (changelog /
    // snapshot zip), not the HDFS provider's .delta files
    val stateFiles = filesUnder(s"$ckpt/state").map(_.getName)
    assert(stateFiles.exists(n => n.endsWith(".changelog") || n.endsWith(".zip")),
      s"no RocksDB artifacts in checkpoint: $stateFiles")
    assert(!stateFiles.exists(_.endsWith(".delta")),
      s"HDFS-provider delta files present — RocksDB conf not honored: $stateFiles")
  }

  test("two overlapping withRocksDb scopes: the first exit must not restore the provider early") {
    // Pins the round-6 concurrency fix (StateStores refcounted scopes),
    // found by the 8-way gate, not a test: scope A exiting while scope B
    // is live must NOT flip the session provider back to HDFS — a
    // transformWithState query starting in B right then would refuse the
    // provider (the original s21 failure under 8-way Verify).
    val sp = this.spark
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = sp.conf.getOption(providerKey)
    val aEntered = new java.util.concurrent.CountDownLatch(1)
    val aMayExit = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => graft.streaming.StateStores.withRocksDb(sp) {
      aEntered.countDown()
      aMayExit.await()
    })
    t.start(); aEntered.await()
    graft.streaming.StateStores.withRocksDb(sp) {
      assert(sp.conf.get(providerKey) == graft.streaming.StateStores.RocksDbProvider)
      aMayExit.countDown(); t.join()
      // scope A is gone, this scope is still live: still RocksDB
      assert(sp.conf.get(providerKey) == graft.streaming.StateStores.RocksDbProvider,
        "first scope's exit restored the provider under a live scope")
      // the real failure mode: a transformWithState query STARTING now
      // reads the session conf and refuses anything but RocksDB
      val (out, ckpt) = tmp("twoscope")
      ParquetLand.updateJournal(
        StreamingOps.transformWithStateStream(sp, sf), out, ckpt)
      assert(spark.read.parquet(out).count() > 0)
    }
    assert(sp.conf.getOption(providerKey) == before,
      "last scope out must restore the original provider")
  }

  test("s03 streaming dedup under the RocksDB state store equals the batch result") {
    val (out, ckpt) = tmp("s03rocks")
    graft.streaming.StateStores.withRocksDb(spark) {
      ParquetLand.completeSnapshot(StreamingOps.streamingDedupStream(spark, sf), out, ckpt)
    }
    val rollup = spark.read.parquet(out)
      .groupBy("source").agg(count(lit(1)).as("n_unique_docs"))
    assert(canon(rollup) == canon(StreamingOps.streamingDedup(spark, sf)))
  }

  test("stateful aggregation resumes from the RocksDB changelog checkpoint across a restart") {
    // the recovery half of the RocksDB story (SURVEY §9 round-6 #3):
    // phase 1 aggregates half the events and STOPS; phase 2 is a fresh
    // query on the SAME checkpoint over new files only. If the per-user
    // counts weren't recovered from the changelog checkpoint, returning
    // users' phase-2 journal rows would restart from zero and the final
    // journal state could not equal the all-events batch answer.
    val landDir = Files.createTempDirectory("graft_restart_land").toString
    val (out, ckpt) = tmp("restart_rocks")
    val ev = graft.queries.Tables.events(spark, sf)
    def agg() = spark.readStream.schema(StreamingOps.eventsSchema).parquet(landDir)
      .select(col("user_id"),
        expr("CAST(floor((value) * 10000 + 0.5) AS BIGINT)").as("value_e4"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("value_e4").as("sum_value_e4"))
    graft.streaming.StateStores.withRocksDb(spark) {
      land(ev.filter(col("event_id") % 4 <= 1), landDir, "000_a.parquet")
      ParquetLand.updateJournal(agg(), out, ckpt) // drains, then the query STOPS
      land(ev.filter(col("event_id") % 4 > 1), landDir, "001_b.parquet")
      ParquetLand.updateJournal(agg(), out, ckpt) // fresh query, same checkpoint
    }
    val state = ParquetLand.journalState(spark.read.parquet(out), Seq("user_id"))
    val want = ev.select(col("user_id"),
        expr("CAST(floor((value) * 10000 + 0.5) AS BIGINT)").as("value_e4"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("value_e4").as("sum_value_e4"))
    assert(canon(state) == canon(want))
    // recovery must have gone through RocksDB changelog artifacts
    val stateFiles = filesUnder(s"$ckpt/state").map(_.getName)
    assert(stateFiles.exists(_.endsWith(".changelog")),
      s"no changelog artifacts in checkpoint: $stateFiles")
  }

  test("RocksDB state soak: 10^6 dedup keys live in RocksDB, not executor heap") {
    import java.util.concurrent.atomic.AtomicLong
    import org.apache.spark.sql.streaming.Trigger
    // 2M rows over 1M distinct keys, landed as 4 files consumed one per
    // trigger — dedup state grows to 10^6 keys ACROSS micro-batches
    val n = 1000000L
    val dir = Files.createTempDirectory("graft_rocks_soak").toString
    val src = spark.range(2 * n)
    (0 until 4).foreach { i =>
      land(src.filter(col("id") % 4 === i)
        .select((col("id") % n).as("key"), (col("id") % 97).as("payload")),
        dir, s"part$i.parquet")
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.LongType)))
    val kept = new AtomicLong
    val ckpt = Files.createTempDirectory("graft_rocks_soak_ckpt").toString
    val progress = graft.streaming.StateStores.withRocksDb(spark) {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .dropDuplicates("key")
        .writeStream.outputMode("append")
        .foreachBatch { (b: DataFrame, _: Long) => kept.addAndGet(b.count()); () }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.recentProgress.toSeq
    }
    assert(kept.get() == n, s"dedup kept ${kept.get()} of $n distinct keys")
    val stateOps = progress.flatMap(_.stateOperators).filter(_.numRowsTotal > 0)
    assert(stateOps.nonEmpty, "no state operator progress recorded")
    val last = stateOps.last
    assert(last.numRowsTotal == n, s"state rows ${last.numRowsTotal} != $n")
    // provider proof + heap story: RocksDB reports its own memory metrics
    val cm = last.customMetrics
    assert(cm.keySet.asScala.exists(_.startsWith("rocksdb")),
      s"state operator reports no rocksdb metrics: ${cm.keySet}")
    val memStats = cm.asScala.collect {
      case (k, v) if k.startsWith("rocksdb") &&
        (k.toLowerCase.contains("memory") || k.toLowerCase.contains("sstfile")) =>
        s"$k=$v"
    }
    info(s"rocksdb soak: ${last.numRowsTotal} keys, ${memStats.mkString(" ")}")
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
