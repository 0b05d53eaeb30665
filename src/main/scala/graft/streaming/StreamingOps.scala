package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2.5: an extension beyond the
  * reference, which has no stream processing). The same hourly event
  * aggregation as the batch q14, expressed as a file-source stream with
  * event-time windows + watermark — on a cluster this runs continuously
  * over a landing directory; here `Trigger.AvailableNow` drains the
  * existing files and stops, which makes the result comparable to the
  * batch oracle.
  *
  * Each query is split into a STREAM BUILDER (`xxxStream` — the
  * unterminated streaming DataFrame) and a runner that drains it. The
  * oracle gate drains to a memory sink (cheap to read back); the
  * production deployment path drains the SAME builders through
  * [[ParquetLand]]'s durable parquet sinks — native append + commit log
  * for append-mode streams, foreachBatch snapshot/journal for
  * complete/update-mode ones — exercised per stream in StreamingSinkSpec.
  */
object StreamingOps {

  /** events landing schema with the engine's canonical BIGINT-ns `ts`
    * (what engine-written event landings carry on disk).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** events schema as the driver's round-6+ fixtures encode it on disk
    * (`ts` TIMESTAMP(MICROS) → TIMESTAMP_NTZ under a UTC session).
    */
  private val eventsSchemaMicros: StructType = StructType(
    eventsSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = TimestampNTZType) else f))

  /** documents.parquet physical schema for the streaming reader. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-stream source for one testdata table, handling BOTH physical
    * layouts: the driver's monolithic `$dir/$name.parquet` file (streamed
    * via a glob filter over the sf dir — `$name*.parquet` also matches the
    * split-file landing tests' `events0.parquet`...) and a SHARDED
    * `$dir/$name.parquet/` directory of part files
    * (tools/shard_testdata.py) — the engine's real many-splits read path
    * at 100 TB, which the sharded gate run exercises end to end.
    */
  private def streamSource(
      spark: SparkSession, dir: String, name: String, schema: StructType,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val tablePath = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = tablePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    if (fs.exists(tablePath) && fs.getFileStatus(tablePath).isDirectory)
      reader.parquet(tablePath.toString)
    else
      reader.option("pathGlobFilter", s"$name*.parquet").parquet(dir)
  }

  /** Streaming events source normalized to the canonical BIGINT-ns `ts`
    * (the streaming counterpart of [[graft.queries.Tables.events]]).
    *
    * A file stream needs its schema declared up front, and the landing's
    * physical `ts` encoding varies: driver fixtures carry TIMESTAMP
    * (MICROS since round 6; NANOS before), engine-written landings carry
    * the canonical BIGINT. One cheap batch footer read (driver-side, once
    * per stream build — not per batch) sniffs which, then the stream
    * declares the matching schema and rescales to exact integer nanos so
    * every downstream watermark/join/window expression is encoding-
    * agnostic. The sniff honours the same glob the stream uses, so
    * landing dirs holding `events0.parquet`-style split fixtures sniff
    * their own files, not the sf table.
    */
  private def eventsSource(
      spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tablePath = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val fs = tablePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val physical =
      if (fs.exists(tablePath) && fs.getFileStatus(tablePath).isDirectory)
        spark.read.parquet(tablePath.toString).schema
      else
        spark.read.option("pathGlobFilter", "events*.parquet").parquet(dir).schema
    val micros = physical("ts").dataType != LongType
    val src = streamSource(spark, dir, "events",
      if (micros) eventsSchemaMicros else eventsSchema, maxFilesPerTrigger)
    if (micros)
      src.withColumn("ts", expr("unix_micros(CAST(ts AS TIMESTAMP)) * 1000L"))
    else src
  }

  /** Drain a finite stream into a uniquely-named memory sink and return
    * the sink table (the oracle-gate read path).
    */
  private def drainToMemory(
      stream: DataFrame, prefix: String, mode: String): DataFrame = {
    val name = prefix + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = stream.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // copy the sink contents into a local relation and DROP the memory
    // sink — otherwise each uniquely-named drain leaves its rows pinned
    // in driver memory for the session lifetime, accumulating across the
    // 9 streaming queries + sink-spec reruns per session (ADVICE r4).
    // Results are small by construction (≤20k rows), so a driver-local
    // copy is the right trade.
    val spark = stream.sparkSession
    val sink = spark.table(name)
    val out = spark.createDataFrame(sink.collectAsList(), sink.schema)
    spark.catalog.dropTempView(name)
    out
  }

  /** Hourly tumbling-window counts/sums over a stream of event files
    * (complete-mode aggregate).
    */
  def hourlyAggStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    eventsSource(spark, dir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        // integer 1e-4 units: same IEEE expression as DuckDB's oracle, so
        // the sum is exact and engine-version-proof (round-1 lesson)
        sum(expr("CAST(floor((value) * 10000 + 0.5) AS BIGINT)")).as("sum_value_e4"))
      .select(
        (unix_timestamp(col("window.start")) / 3600).cast(LongType).as("hour_bucket"),
        col("n_events"), col("sum_value_e4"))
  }

  def hourlyAgg(spark: SparkSession, dir: String): DataFrame =
    drainToMemory(hourlyAggStream(spark, dir), "graft_stream_hourly_", "complete")

  /** s26: SLIDING (hopping) windows — the overlap case s01's tumbling
    * hour doesn't exercise: 2-hour windows every 30 minutes, so each
    * event belongs to exactly size/slide = 4 windows and Spark expands
    * it into 4 window rows BEFORE the shuffle (map-side, no self-join —
    * the expansion factor, not the corpus, is the cost knob at 100 TB).
    * Window starts align to epoch multiples of the slide in BOTH
    * engines, so the oracle reproduces the window set exactly with a
    * 4-offset unnest — integer µs arithmetic, no timestamp rounding.
    */
  def slidingAggStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    eventsSource(spark, dir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "2 hours", "30 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(floor((value) * 10000 + 0.5) AS BIGINT)")).as("sum_value_e4"))
      .select(
        (unix_timestamp(col("window.start")) / 1800).cast(LongType).as("slide_bucket"),
        col("event_type"), col("n_events"), col("sum_value_e4"))
  }

  def slidingAgg(spark: SparkSession, dir: String): DataFrame =
    drainToMemory(slidingAggStream(spark, dir), "graft_stream_sliding_", "complete")

  final case class UserEvent(user_id: Long, tsu: Long)
  final case class SessionState(lastTs: Long, sessions: Long)

  /** Custom streaming state (SURVEY §2.5's `flatMapGroupsWithState` row):
    * per-user session counting with a 30-minute inactivity gap, state
    * carried across micro-batches. Each batch's events are processed in
    * event-time order against the persisted (lastTs, count) state, so the
    * final emission equals the batch q15 answer regardless of how the
    * files split into batches (as long as batches arrive time-ordered,
    * which a replayed landing directory does — StreamingSinkSpec proves
    * the invariance with a 3-file, one-file-per-trigger split).
    *
    * @param maxFilesPerTrigger bound files per micro-batch (the
    *        multi-batch test path; None = drain everything in one batch)
    */
  def statefulSessionsStream(
      spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import spark.implicits._
    val updateFn: (Long, Iterator[UserEvent], GroupState[SessionState]) => Iterator[(Long, Long)] =
      (uid, evs, state) => {
        val sorted = evs.toSeq.sortBy(_.tsu)
        var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L))
        sorted.foreach { e =>
          if (st.lastTs == Long.MinValue || e.tsu - st.lastTs > 1800000000L)
            st = SessionState(e.tsu, st.sessions + 1)
          else st = SessionState(e.tsu, st.sessions)
        }
        state.update(st)
        Iterator.single((uid, st.sessions))
      }
    eventsSource(spark, dir, maxFilesPerTrigger)
      .select(col("user_id"), expr("ts div 1000").as("tsu"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(updateFn)
      .toDF("user_id", "n_sessions")
  }

  def statefulSessions(spark: SparkSession, dir: String): DataFrame =
    // the last update per user is the final count
    drainToMemory(statefulSessionsStream(spark, dir), "graft_stream_sessions_", "update")
      .groupBy("user_id")
      .agg(max(col("n_sessions")).as("n_sessions"))

  final case class SessionStats(lastTs: Long, sessions: Long, events: Long)
  final case class UserSessionStats(user_id: Long, n_sessions: Long, n_events: Long)

  /** s02's session fold re-expressed through Spark 4's `transformWithState`
    * — the arbitrary-state API that REPLACES flatMapGroupsWithState: typed
    * named state slots on a [[StatefulProcessorHandle]] (value/list/map,
    * each independently TTL-able), timers decoupled from output mode, and
    * a RocksDB-only runtime (state off-heap, changelog-checkpointed). The
    * per-key fold is the same event-time-ordered session merge as s02, so
    * the two APIs are gate-verified observationally identical; the extra
    * `events` counter rides in the SAME state row to exercise composite
    * state (one slot, multi-field product encoder).
    */
  private class SessionStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, UserEvent, UserSessionStats] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[SessionStats] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[SessionStats](
        "sessionStats",
        org.apache.spark.sql.Encoders.product[SessionStats],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        uid: Long, rows: Iterator[UserEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserSessionStats] = {
      val sorted = rows.toSeq.sortBy(_.tsu)
      var st =
        if (state.exists()) state.get()
        else SessionStats(Long.MinValue, 0L, 0L)
      sorted.foreach { e =>
        val newSession =
          st.lastTs == Long.MinValue || e.tsu - st.lastTs > 1800000000L
        st = SessionStats(e.tsu,
          if (newSession) st.sessions + 1 else st.sessions,
          st.events + 1)
      }
      state.update(st)
      Iterator.single(UserSessionStats(uid, st.sessions, st.events))
    }
  }

  /** Per-user session/event counters via [[SessionStatsProcessor]].
    * Requires the RocksDB state store (the API refuses the HDFS
    * provider) — the runner scopes it via [[StateStores.withRocksDb]].
    */
  def transformWithStateStream(
      spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    eventsSource(spark, dir, maxFilesPerTrigger)
      .select(col("user_id"), expr("ts div 1000").as("tsu"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
      .toDF()
  }

  def transformWithStateSessions(spark: SparkSession, dir: String): DataFrame =
    StateStores.withRocksDb(spark) {
      // both counters are monotone per user, so the final state is the
      // max over the per-batch update emissions whatever the batching
      drainToMemory(
        transformWithStateStream(spark, dir), "graft_stream_tws_", "update")
        .groupBy("user_id")
        .agg(max(col("n_sessions")).as("n_sessions"),
          max(col("n_events")).as("n_events"))
    }

  final case class TimerEvent(user_id: Long, tsu: Long,
      event_time: java.sql.Timestamp)
  final case class OpenSession(startTs: Long, lastTs: Long, events: Long)
  final case class ClosedSession(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long)

  private val SessionGapUs = 1800000000L // 30 min in µs

  /** s21: EVENT-TIME TIMERS — the `transformWithState` API corner s18
    * leaves out. Sessions are emitted EXACTLY ONCE each, when they CLOSE:
    * either a later event opens the next session (emitted from
    * `handleInputRows`), or the watermark passes lastTs + gap and the
    * registered event-time timer fires (`handleExpiredTimer` — the only
    * way a user's FINAL session ever emits on an unbounded stream). One
    * live timer per key, re-armed to the open session's expiry each
    * batch. Emission TIMING depends on batching, but the SET of closed
    * sessions is the gap-island decomposition of the input — batch-
    * invariant under the time-ordered landing contract, which is what
    * the oracle replays.
    *
    * Under AvailableNow the stream would end with every user's last
    * session still open (no event after it, watermark never passes it),
    * so the landing appends the s12 watermark-sentinel trick: a far-
    * future reserved-key event raises the watermark past every live
    * timer, and because a watermark raised in batch N only APPLIES in
    * batch N+1, TWO sentinel files are landed (the second batch is where
    * every timer actually fires). The processor ignores the reserved key
    * entirely — sentinel rows exist only to move the clock.
    */
  private class TimerSessionProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, TimerEvent, ClosedSession] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[OpenSession] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[OpenSession](
        "openSession",
        org.apache.spark.sql.Encoders.product[OpenSession],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        uid: Long, rows: Iterator[TimerEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[ClosedSession] = {
      if (uid < 0L) return Iterator.empty // watermark sentinel key
      val sorted = rows.toSeq.sortBy(_.tsu)
      if (sorted.isEmpty) return Iterator.empty
      var closed = List.empty[ClosedSession]
      var st = if (state.exists()) Some(state.get()) else None
      sorted.foreach { e =>
        st match {
          case Some(s) if e.tsu - s.lastTs > SessionGapUs =>
            closed ::= ClosedSession(uid, s.startTs, s.lastTs, s.events)
            st = Some(OpenSession(e.tsu, e.tsu, 1L))
          case Some(s) =>
            st = Some(OpenSession(s.startTs, e.tsu, s.events + 1L))
          case None =>
            st = Some(OpenSession(e.tsu, e.tsu, 1L))
        }
      }
      state.update(st.get)
      // one live timer per key: re-arm to the open session's expiry
      // (timer clock is WALL-MS; our domain is µs)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer((st.get.lastTs + SessionGapUs) / 1000L + 1L)
      closed.reverseIterator
    }

    override def handleExpiredTimer(
        uid: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[ClosedSession] = {
      if (!state.exists()) Iterator.empty
      else {
        val s = state.get()
        state.clear()
        Iterator.single(ClosedSession(uid, s.startTs, s.lastTs, s.events))
      }
    }
  }

  def timerSessionsStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val land = java.nio.file.Files.createTempDirectory("graft_s21_land").toString
    graft.TempCleanup.registerDir(land)
    val ev = graft.queries.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    val (mn, mx, step) = quartileCut(ev, expr("ts div 1000"))
    for (k <- 0 until 4)
      landFile(ev.filter(inQuartile(expr("ts div 1000"), mn, step, k)),
        land, f"00${k}%d_events.parquet")
    // two watermark-raising sentinel batches (see the processor doc)
    for (k <- 4 to 5)
      landFile(
        spark.range(1).select(
          lit(-1L - k).as("event_id"),
          lit((mx + 10L * SessionGapUs + k) * 1000L).as("ts"),
          lit(-1L).as("user_id"),
          lit("sentinel").as("event_type"),
          lit(0.0).as("value"),
          lit(null).cast("string").as("props")),
        land, f"00${k}%d_events.parquet")
    spark.readStream.schema(eventsSchema)
      .option("maxFilesPerTrigger", 1).parquet(land)
      .select(col("user_id"), expr("ts div 1000").as("tsu"),
        timestamp_micros(expr("ts div 1000")).as("event_time"))
      .withWatermark("event_time", "1 second")
      .as[TimerEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new TimerSessionProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
      .toDF()
  }

  def timerSessions(spark: SparkSession, dir: String): DataFrame =
    StateStores.withRocksDb(spark) {
      drainToMemory(timerSessionsStream(spark, dir), "graft_stream_timer_", "append")
    }

  /** Streaming exact dedup: a document stream deduplicated on content as
    * it lands, keeping a DETERMINISTIC winner per text — the min-doc_id
    * row — via a stateful `min_by` aggregation (state store keyed on
    * text), then summarized per source.
    *
    * Round-1 advisor fix: `dropDuplicates("text")` keeps an *arbitrary*
    * first across parallel partitions/batches, so per-source counts could
    * flip nondeterministically when a text is duplicated across sources
    * (sf0.1 has 8 such texts). `min_by(source, doc_id)` is a merge-able
    * aggregate — the winner is the same no matter how files split into
    * micro-batches or partitions.
    */
  def streamingDedupStream(spark: SparkSession, dir: String): DataFrame =
    streamSource(spark, dir, "documents", documentsSchema)
      .groupBy("text")
      .agg(min_by(col("source"), col("doc_id")).as("source"))

  def streamingDedup(spark: SparkSession, dir: String): DataFrame =
    drainToMemory(streamingDedupStream(spark, dir), "graft_stream_dedup_", "complete")
      .groupBy("source")
      .agg(count(lit(1)).as("n_unique_docs"))

  /** p03: the PREP PIPELINE AS A STREAM — p01's composition argument
    * carried to streaming: normalize (d41's canonicalization) → exact
    * dedup on the NORMALIZED text keeping the min-doc_id winner (the
    * mergeable min_by state of s03 — deterministic under any batch
    * split) → token-count quality gate → per-source accounting, all in
    * one streaming query. Per-doc stages are stateless maps; the one
    * state store is the dedup aggregation, exactly where p01's batch
    * plan shuffles. The gate proves the streamed pipeline equals the
    * batch composition the oracle computes from scratch — stage
    * composition, not just stages, verified under streaming execution.
    */
  def streamingPrepPipeline(spark: SparkSession, dir: String): DataFrame = {
    val deduped = streamSource(spark, dir, "documents", documentsSchema)
      .select(col("doc_id"), col("source"),
        lower(trim(regexp_replace(col("text"), " +", " "))).as("norm"))
      .withColumn("toks", size(split(col("norm"), " ")).cast(LongType))
      .groupBy("norm")
      .agg(min_by(struct(col("doc_id"), col("source"), col("toks")),
        col("doc_id")).as("w"))
    drainToMemory(deduped, "graft_stream_prep_", "complete")
      .select(col("w.source").as("source"), col("w.toks").as("toks"))
      .filter(col("toks") >= 30L)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("toks").as("sum_tokens"))
  }

  /** Stream-static join: the event stream enriched against a static
    * dimension (customer → market segment), then aggregated. The static
    * side is broadcast per micro-batch — on a cluster the stream side
    * never shuffles for the join, only for the final segment rollup.
    */
  def streamStaticJoinStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dim = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    eventsSource(spark, dir)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(floor((value) * 10000 + 0.5) AS BIGINT)")).as("sum_value_e4"))
  }

  def streamStaticJoin(spark: SparkSession, dir: String): DataFrame =
    drainToMemory(streamStaticJoinStream(spark, dir), "graft_stream_dim_", "complete")

  /** Stream-stream time-interval join: view → purchase conversion within
    * 30 minutes for the same user. Both sides carry watermarks (state
    * cleanup on a real cluster); inner-join matches emit eagerly, so with
    * `AvailableNow` the emitted SET of pairs equals the batch answer —
    * the sink collects the appended pairs and the per-user rollup runs as
    * a batch query on top (an aggregation above a stream-stream join
    * would finalize only up to the watermark, dropping the tail — the
    * classic drained-stream pitfall).
    */
  def streamStreamJoinStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def side(tag: String) = eventsSource(spark, dir)
      .select(col("event_type").as(s"type_$tag"),
        col("user_id").as(s"uid_$tag"),
        timestamp_micros(expr("ts div 1000")).as(s"t_$tag"))
      .withWatermark(s"t_$tag", "1 hour")
    val views = side("v").filter(col("type_v") === "view")
    val purchases = side("p").filter(col("type_p") === "purchase")
    views.join(purchases,
      expr("uid_v = uid_p AND t_p >= t_v AND t_p <= t_v + interval 30 minutes"))
  }

  def streamStreamJoin(spark: SparkSession, dir: String): DataFrame =
    drainToMemory(streamStreamJoinStream(spark, dir), "graft_stream_funnel_", "append")
      .groupBy(col("uid_v").as("user_id"))
      .agg(count(lit(1)).as("n_conversions"))

  /** THE quartile boundary arithmetic every multi-batch harness lands
    * with and every matching DuckDB oracle reproduces as
    * `(x - mn) // step`: one definition, six call sites (s13/s15-family
    * etlSource, s16, s21, s25, s27, s29) — an off-by-one here must change
    * everywhere at once or the oracles' batch cuts silently diverge.
    * Returns (mn, mx, step) over the (integer) cut column.
    */
  private def quartileCut(df: DataFrame, c: Column): (Long, Long, Long) = {
    val Seq(mn, mx) = df.agg(min(c), max(c)).head().toSeq.map(_.asInstanceOf[Long])
    (mn, mx, (mx - mn) / 4 + 1)
  }

  /** Quartile k's membership predicate over the same cut column. */
  private def inQuartile(c: Column, mn: Long, step: Long, k: Int): Column =
    c >= mn + k * step && c < mn + (k + 1) * step

  /** Write `df` as ONE parquet file at `$landDir/$name`, with strictly
    * increasing mod times so a file-stream source replays the landed
    * files oldest-first (the multi-batch harness used by s12/s13).
    */
  private def landFile(df: DataFrame, landDir: String, name: String): Unit = {
    val stage = java.nio.file.Files.createTempDirectory("graft_land_stage").toString
    graft.TempCleanup.registerDir(stage)
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$landDir/$name"))
    Thread.sleep(30) // distinct mtimes → deterministic trigger order
  }

  /** s12: watermarked LEFT-OUTER stream-stream join — the abandonment
    * audit: every view row joins its ≤30-minute purchases, OR emits with
    * a NULL purchase time once the watermark PROVES no conversion can
    * still arrive. Outer state only flushes when a later batch advances
    * the watermark, so the source is re-landed as two time-ordered files
    * consumed one per trigger: (1) all real events; (2) a single
    * far-future sentinel row (type "zz_sentinel" — it passes both
    * watermark nodes, which sit BEFORE the type filters, but never
    * enters either join input) whose only job is to push the watermark
    * past every real view's join window so the final no-data batch
    * evicts and emits the unmatched state. This is the production
    * "close the books on period N once the stream reaches N+1" pattern;
    * the batch oracle is a plain LEFT JOIN.
    */
  /** Shared landing/sentinel/side machinery for the OUTER stream-stream
    * join queries (s12 left, s30 full) — one implementation so the
    * sentinel mechanics can never diverge between them.
    *
    * TWO sentinel files, each holding a far-future VIEW and PURCHASE for
    * the nonexistent user -1 (excluded from the rollup). Two subtleties,
    * both observed on the gate:
    *  - Catalyst pushes the event_type filters BELOW the watermark
    *    operators into the parquet scan, so a neutral "zz_sentinel" row
    *    never reaches either watermark node and the watermark freezes —
    *    the sentinel must survive BOTH pushed filters, hence one row per
    *    join side (the purchase 2 h after the view, outside the 30-min
    *    window, so the sentinels never match each other);
    *  - the watermark computed from batch N only takes effect in batch
    *    N+1 and AvailableNow stops at the last file, so sentinel #1
    *    raises the watermark and sentinel #2's batch APPLIES it,
    *    evicting (and emitting) every real view's unmatched state.
    */
  private def outerFunnelStream(
      spark: SparkSession, dir: String, joinType: String, tag: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val land = java.nio.file.Files.createTempDirectory(s"graft_${tag}_land").toString
    graft.TempCleanup.registerDir(land)
    val ev = graft.queries.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    landFile(ev, land, "000_events.parquet")
    val maxTs = ev.agg(max("ts")).head().getLong(0)
    def sentinel(name: String, offsetDays: Long): Unit = {
      val t0 = maxTs + offsetDays * 86400L * 1000000000L
      landFile(spark.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row(-1L, t0, -1L, "view", 0.0, "{}"),
          org.apache.spark.sql.Row(-1L, t0 + 7200L * 1000000000L, -1L,
            "purchase", 0.0, "{}")),
        eventsSchema), land, name)
    }
    sentinel("001_sentinel.parquet", 1L)
    sentinel("002_sentinel.parquet", 2L)
    def side(t: String) = spark.readStream.schema(eventsSchema)
      .option("maxFilesPerTrigger", 1).parquet(land)
      .select(col("event_type").as(s"type_$t"),
        col("user_id").as(s"uid_$t"),
        timestamp_micros(expr("ts div 1000")).as(s"t_$t"))
      .withWatermark(s"t_$t", "1 hour")
    val views = side("v").filter(col("type_v") === "view")
    val purchases = side("p").filter(col("type_p") === "purchase")
    views.join(purchases,
      expr("uid_v = uid_p AND t_p >= t_v AND t_p <= t_v + interval 30 minutes"),
      joinType)
  }

  def leftOuterFunnelStream(spark: SparkSession, dir: String): DataFrame =
    outerFunnelStream(spark, dir, "left_outer", "s12")

  def leftOuterFunnel(spark: SparkSession, dir: String): DataFrame =
    drainToMemory(leftOuterFunnelStream(spark, dir), "graft_stream_abandon_", "append")
      .filter(col("uid_v") >= 0) // drop the watermark-sentinel user
      .groupBy(col("uid_v").as("user_id"))
      .agg(count(lit(1)).as("n_rows"), count(col("t_p")).as("n_converted"))

  /** s30: watermarked FULL-OUTER stream-stream join — completes the
    * stream-join matrix (s05 inner, s12 left-outer): matched funnel
    * pairs emit eagerly, abandoned views AND orphan purchases (a
    * purchase with no view inside the window — the attribution-gap
    * signal) each emit with NULLs once the watermark proves their match
    * can no longer arrive. Same two-sentinel-file finalization as s12
    * (each sentinel carries one row per join side so it survives both
    * pushed-down type filters; the second file applies the watermark the
    * first raised — and in FULL outer the sentinels themselves emit as
    * unmatched rows, which the rollup's user filter drops). The batch
    * oracle is a plain FULL OUTER JOIN with the same interval predicate.
    */
  def fullOuterFunnelStream(spark: SparkSession, dir: String): DataFrame =
    outerFunnelStream(spark, dir, "full_outer", "s30")

  def fullOuterFunnel(spark: SparkSession, dir: String): DataFrame =
    drainToMemory(fullOuterFunnelStream(spark, dir), "graft_stream_fouter_", "append")
      .filter(coalesce(col("uid_v"), col("uid_p")) >= 0) // drop sentinels
      .groupBy(coalesce(col("uid_v"), col("uid_p")).as("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("uid_v").isNotNull && col("t_p").isNotNull, 1)).as("n_matched"),
        count(when(col("uid_v").isNull, 1)).as("n_orphan_purchases"),
        count(when(col("t_p").isNull, 1)).as("n_abandoned_views"))

  /** The 4-file ETL source stream shared by s13/s15: events re-landed as
    * four time-range files consumed one per trigger, so the in-loop
    * compactor demonstrably fires mid-stream.
    */
  private def etlSource(spark: SparkSession, dir: String, tag: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val land = java.nio.file.Files.createTempDirectory(s"graft_${tag}_land").toString
    graft.TempCleanup.registerDir(land)
    val ev = graft.queries.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    // quartile boundaries in µs, not ns: DuckDB sees parquet ns
    // timestamps truncated to µs, so an oracle that must reproduce a
    // PREFIX of the batch sequence (s17's time travel) can only express
    // µs-exact cuts — `ts div 1000` here ↔ `epoch_us(ts)` there
    val (mn, mx, step) = quartileCut(ev, expr("ts div 1000"))
    for (k <- 0 until 4)
      landFile(ev.filter(inQuartile(expr("ts div 1000"), mn, step, k)),
        land, f"00${k}%d_events.parquet")
    spark.readStream.schema(eventsSchema)
      .option("maxFilesPerTrigger", 1).parquet(land)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("tsu"),
        expr("CAST(floor((value) * 10000 + 0.5) AS BIGINT)").as("value_e4"))
  }

  private def etlRollup(landed: DataFrame): DataFrame =
    landed.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_e4")).as("sum_value_e4"),
        countDistinct(col("user_id")).as("n_users"))

  /** s13: continuous-ETL landing with IN-LOOP compaction — s06's shape
    * plus the maintenance a production landing needs:
    * [[ParquetLand.appendCompacting]] applies each micro-batch exactly
    * once and rewrites the directory to a bounded file count whenever it
    * exceeds the cap, so the landing never accumulates per-batch small
    * files no matter how long the stream runs (StreamingSinkSpec pins
    * the file-count invariant); the rollup over the final compacted
    * landing must equal the batch answer — content survives every
    * rewrite.
    *
    * @return (rollup over the compacted landing, landing dir)
    */
  def streamEtlCompactedWithDir(spark: SparkSession, dir: String): (DataFrame, String) = {
    val src = etlSource(spark, dir, "s13")
    val out = java.nio.file.Files.createTempDirectory("graft_s13_out").toString + "/landing"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s13_ckpt").toString
    graft.TempCleanup.registerDir(new java.io.File(out).getParent)
    graft.TempCleanup.registerDir(ckpt)
    ParquetLand.appendCompacting(src, out, ckpt, maxFiles = 2, targetFiles = 2)
    (etlRollup(spark.read.parquet(out)), out)
  }

  def streamEtlCompacted(spark: SparkSession, dir: String): DataFrame =
    streamEtlCompactedWithDir(spark, dir)._1

  /** s15: s13's continuous-ETL + in-loop-compaction shape committed
    * through the OBJECT-STORE protocol ([[ManifestLand]]): visibility is
    * one atomic manifest-file flip per commit — no directory renames, so
    * the same landing logic deploys against an S3-class store where
    * rename is not atomic (the rename-swap s13 uses is local/HDFS-only).
    * Same rollup, same oracle: the two commit protocols must be
    * observationally identical.
    */
  /** s16: STREAMING CDC apply — q64's MERGE INTO contract run as a
    * stream. The same change feed (one row per order, mapped to
    * upsert/delete) is split into four TIME-ORDERED micro-batches
    * (disjoint `ord` quartiles, so each batch's latest-per-key is the
    * global latest among the batches seen so far) and each batch is
    * full-outer-merged into the keyed snapshot through [[CdcLand]]'s
    * swap-committed rewrite.
    *
    * Last-writer-wins composes: a key's final state is decided by the
    * latest change in the LAST batch that touches it, which is its
    * globally-latest change — so the drained snapshot must equal the
    * one-shot batch MERGE, and s16 shares q64's oracle verbatim.
    * Deletes are TOMBSTONES inside the snapshot (deleted flag, dropped
    * on read): that is what lets a deleted base customer resurrected by
    * a later update report `updated` (base membership survives the
    * delete), exactly as the batch MERGE classifies it.
    */
  def streamCdcApply(spark: SparkSession, dir: String): DataFrame = {
    import graft.queries.PipelineOps
    val land = java.nio.file.Files.createTempDirectory("graft_s16_land").toString
    graft.TempCleanup.registerDir(land)
    val feed = PipelineOps.changeFeed(spark, dir)
    val (mn, mx, step) = quartileCut(feed, col("ord"))
    for (k <- 0 until 4)
      landFile(feed.filter(inQuartile(col("ord"), mn, step, k)),
        land, f"00${k}%d_changes.parquet")
    val changesSchema = StructType(Seq(
      StructField("custkey", LongType), StructField("c_name", StringType),
      StructField("ord", LongType), StructField("bal_cents", LongType),
      StructField("op", StringType)))
    val stream = spark.readStream.schema(changesSchema)
      .option("maxFilesPerTrigger", 1).parquet(land)
    val out = java.nio.file.Files.createTempDirectory("graft_s16_out").toString + "/snapshot"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s16_ckpt").toString
    graft.TempCleanup.registerDir(new java.io.File(out).getParent)
    graft.TempCleanup.registerDir(ckpt)
    CdcLand.upsert(stream, out, ckpt,
      init = () => PipelineOps.mergeBase(spark, dir)
        .withColumn("row_status", lit("kept"))
        .withColumn("in_base", lit(true))
        .withColumn("deleted", lit(false))) { (snap, batch) =>
      graft.operators.MergeInto(
        snap, PipelineOps.latestChanges(batch.toDF()), "custkey",
        // no physical delete: tombstone instead (deleted flag below)
        deleteWhen = lit(false),
        outCols = Seq(
          "custkey" -> ((col("s.custkey"), col("b.custkey"), col("s.custkey"))),
          "c_name" -> ((col("b.c_name"), col("b.c_name"), col("s.c_name"))),
          "bal_cents" -> ((when(col("s.op") === "U", col("s.bal_cents"))
            .otherwise(col("b.bal_cents")), col("b.bal_cents"), col("s.bal_cents"))),
          "row_status" -> ((when(col("b.in_base"), lit("updated"))
            .otherwise(lit("inserted")), col("b.row_status"), lit("inserted"))),
          "in_base" -> ((col("b.in_base"), col("b.in_base"), lit(false))),
          "deleted" -> ((col("s.op") === "D", col("b.deleted"),
            col("s.op") === "D"))))
    }
    spark.read.parquet(out)
      .filter(!col("deleted"))
      .select(col("custkey").as("c_custkey"), col("c_name"),
        col("bal_cents"), col("row_status"))
  }

  /** s17: TIME TRAVEL over the manifest landing — s15's exact ETL with
    * version retention on, read back AS OF version 2 (the state after
    * the first three of four micro-batches). Compaction fires mid-run
    * (maxFiles = 2), so the versioned read proves retention keeps the
    * superseded files alive: the rollup must equal the batch answer over
    * the first three µs-quartiles of the event stream, which is exactly
    * what the oracle computes independently.
    */
  def streamEtlTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val src = etlSource(spark, dir, "s17")
    val out = java.nio.file.Files.createTempDirectory("graft_s17_out").toString + "/landing"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s17_ckpt").toString
    graft.TempCleanup.registerDir(new java.io.File(out).getParent)
    graft.TempCleanup.registerDir(ckpt)
    ManifestLand.appendCompacting(src, out, ckpt, maxFiles = 2, targetFiles = 2,
      keepVersions = 8)
    etlRollup(ManifestLand.readVersion(spark, out, 2))
  }

  /** s19: MANIFEST ZONE MAPS — s15's ETL landed with per-file [min,max]
    * stats on `tsu` and each batch range-clustered by it, then a
    * middle-half range rollup served through [[ManifestLand.readPruned]]:
    * the manifest prunes non-overlapping files BEFORE any parquet footer
    * is opened (the Iceberg manifest-stats / Delta data-skipping scan
    * path; ManifestLandSpec asserts files are really skipped — here the
    * gate proves the pruned read computes the exact answer). At 100 TB
    * this is the difference between listing a prefix and reading it.
    */
  def streamEtlZoneMap(spark: SparkSession, dir: String): DataFrame = {
    val src = etlSource(spark, dir, "s19")
    val out = java.nio.file.Files.createTempDirectory("graft_s19_out").toString + "/landing"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s19_ckpt").toString
    graft.TempCleanup.registerDir(new java.io.File(out).getParent)
    graft.TempCleanup.registerDir(ckpt)
    ManifestLand.appendCompacting(src, out, ckpt, maxFiles = 64, targetFiles = 4,
      statsCols = Seq("tsu"), rangeParts = 2)
    val Seq(mn, mx) = ManifestLand.read(spark, out)
      .agg(min("tsu"), max("tsu")).head().toSeq.map(_.asInstanceOf[Long])
    val (lo, hi) = (mn + (mx - mn) / 4, mn + 3 * ((mx - mn) / 4))
    ManifestLand.readPruned(spark, out, lo, hi)
      .filter(col("tsu") >= lo && col("tsu") <= hi) // residual, like a reader
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_e4")).as("sum_value_e4"))
  }

  /** s22: Z-ORDER × ZONE MAPS — the two storage levers composed: the
    * landing declares TWO stats columns (user_id, tsu) and clusters every
    * batch and compaction rewrite by the MORTON KEY of their bucketed
    * forms (q61's bit-interleave, statically unrolled), so each file's
    * box is tight in BOTH dimensions at once and a rectangle predicate
    * (user range × time range) prunes files on both axes — rank this
    * over one-dimension clustering, where the second dimension's spans
    * stay full-width (StorageLayoutSpec measured exactly that on the
    * plain landing). The rollup reads through `readPruned` with both
    * predicates and applies the residual filter like any reader.
    */
  def streamZorderZoneMap(spark: SparkSession, dir: String): DataFrame = {
    val src = etlSource(spark, dir, "s22")
    val out = java.nio.file.Files.createTempDirectory("graft_s22_out").toString + "/landing"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s22_ckpt").toString
    graft.TempCleanup.registerDir(new java.io.File(out).getParent)
    graft.TempCleanup.registerDir(ckpt)
    val zkey = expr(graft.queries.PipelineOps.zkeyExpr(
      "(user_id & 65535)", "((tsu div 3600000000) & 65535)"))
    ManifestLand.appendCompacting(src, out, ckpt, maxFiles = 64, targetFiles = 4,
      statsCols = Seq("user_id", "tsu"), rangeParts = 4, clusterBy = Some(zkey))
    val Seq(umn, umx, tmn, tmx) = ManifestLand.read(spark, out)
      .agg(min("user_id"), max("user_id"), min("tsu"), max("tsu"))
      .head().toSeq.map(_.asInstanceOf[Long])
    val (ulo, uhi) = (umn + (umx - umn) / 4, umn + 3 * ((umx - umn) / 4))
    val (tlo, thi) = (tmn + (tmx - tmn) / 4, tmn + 3 * ((tmx - tmn) / 4))
    ManifestLand.readPruned(spark, out,
        Seq(("user_id", ulo, uhi), ("tsu", tlo, thi)))
      .filter(col("user_id") >= ulo && col("user_id") <= uhi &&
        col("tsu") >= tlo && col("tsu") <= thi)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_e4")).as("sum_value_e4"))
  }

  /** s23: MANIFEST BLOOM FILTERS — the POINT-LOOKUP pruning lever, where
    * zone maps stop helping: a high-cardinality key (user_id) is spread
    * across every file, so every file's [min,max] box covers every probe
    * and a range scan reads the whole landing. Each committed file
    * instead records a bloom filter over the key in its manifest line
    * (built from the staged bytes by one map-side-OR BloomAgg pass, the
    * Iceberg-puffin idea folded into the one-pointer manifest kernel),
    * and [[ManifestLand.readPrunedEq]] opens ONLY the files whose bloom
    * may contain the probed key — at 100 TB, ~99% of a needle lookup's
    * files are rejected from the manifest alone, no footer reads. The
    * gate proves the pruned read computes the exact per-type rollup for
    * the probed user; ManifestLandSpec asserts files are really skipped.
    */
  def streamManifestBloom(spark: SparkSession, dir: String): DataFrame = {
    val src = etlSource(spark, dir, "s23")
    val out = java.nio.file.Files.createTempDirectory("graft_s23_out").toString + "/landing"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s23_ckpt").toString
    graft.TempCleanup.registerDir(new java.io.File(out).getParent)
    graft.TempCleanup.registerDir(ckpt)
    ManifestLand.appendCompacting(src, out, ckpt, maxFiles = 64, targetFiles = 4,
      bloomCol = Some("user_id"))
    val probe = ManifestLand.read(spark, out).agg(min("user_id")).head().getLong(0)
    ManifestLand.readPrunedEq(spark, out, probe)
      .filter(col("user_id") === probe) // residual, like a reader
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_e4")).as("sum_value_e4"))
  }

  /** s32: BLOOM BACKFILL + IN-LIST POINT LOOKUP — the round-8 bloom
    * machinery end-to-end under the oracle: the SAME landing shape as
    * s23 but committed WITHOUT a bloom column (a pre-existing landing),
    * then [[ManifestLand.backfillBlooms]] declares `user_id` in
    * restartable chunks (no data file rewritten — at 100 TB this is the
    * only affordable way to add point-lookup pruning to history), and
    * the lookup is the semi-join shape: a BATCH of keys served by ONE
    * manifest parse via [[ManifestLand.readPrunedIn]], per-file union
    * of the probe bits. The gate proves the backfilled, IN-pruned read
    * computes the exact two-user rollup.
    */
  def streamBloomBackfillIn(spark: SparkSession, dir: String): DataFrame = {
    val src = etlSource(spark, dir, "s32")
    val out = java.nio.file.Files.createTempDirectory("graft_s32_out").toString + "/landing"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s32_ckpt").toString
    graft.TempCleanup.registerDir(new java.io.File(out).getParent)
    graft.TempCleanup.registerDir(ckpt)
    // landed with NO bloom column — history to retrofit
    ManifestLand.appendCompacting(src, out, ckpt, maxFiles = 64, targetFiles = 4)
    ManifestLand.backfillBlooms(spark, out, "user_id", chunkFiles = 2)
    val Seq(lo, hi) = ManifestLand.read(spark, out)
      .agg(min("user_id"), max("user_id")).head().toSeq.map(_.asInstanceOf[Long])
    ManifestLand.readPrunedIn(spark, out, Seq(lo, hi))
      .filter(col("user_id").isin(lo, hi)) // residual, like a reader
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_e4")).as("sum_value_e4"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** s25: AT-LEAST-ONCE DEDUP via `dropDuplicatesWithinWatermark` — the
    * bounded-state production dedup API (Spark 3.5+), distinct from
    * s03's stateful min_by: here the upstream REDELIVERS data (every
    * quartile file lands twice — the at-least-once delivery model of any
    * queue/file relay) and the operator drops the re-arrivals while
    * holding each key only until the watermark passes it — state is
    * bounded by the delay window, not the corpus, which is what lets the
    * same query run forever at 100 TB (plain dropDuplicates state grows
    * monotonically). The delay is sized to one quartile step + 1 s, so
    * every duplicate provably arrives while its original is still in
    * state (the re-delivered batch advances the watermark by NOTHING —
    * same max event time — and the originals' times all sit inside one
    * step of it); the emitted set is then exactly the distinct corpus
    * and the rollup hash-matches the batch oracle.
    */
  def streamDedupWatermark(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val land = java.nio.file.Files.createTempDirectory("graft_s25_land").toString
    graft.TempCleanup.registerDir(land)
    val ev = graft.queries.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    val (mn, mx, step) = quartileCut(ev, expr("ts div 1000"))
    for (k <- 0 until 4; r <- 0 until 2) // each quartile delivered TWICE
      landFile(ev.filter(inQuartile(expr("ts div 1000"), mn, step, k)),
        land, f"0$k%d$r%d_events.parquet")
    val delayMs = step / 1000L + 1000L
    // engine-written landing: canonical BIGINT-ns ts, read directly (the
    // etlSource pattern) — the encoding sniff is for driver fixtures
    val deduped = spark.readStream.schema(eventsSchema)
      .option("maxFilesPerTrigger", 1).parquet(land)
      .select(col("event_id"), col("event_type"),
        timestamp_micros(expr("ts div 1000")).as("t"),
        expr("CAST(floor((value) * 10000 + 0.5) AS BIGINT)").as("value_e4"))
      .withWatermark("t", s"$delayMs milliseconds")
      .dropDuplicatesWithinWatermark("event_id")
    drainToMemory(deduped, "graft_s25_", "append")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_e4")).as("sum_value_e4"),
        countDistinct(col("event_id")).as("n_ids"))
  }

  /** s28: INCREMENTAL VIEW MAINTENANCE from the change feed — the
    * pattern s24's feed exists FOR: a derived per-user aggregate is
    * maintained by FOLDING each version window's deltas (inserts add,
    * deletes subtract — count/sum are abelian, so the fold is exact),
    * never recomputing from the landing after the v0 base. At 100 TB
    * the maintenance cost per sync is proportional to the CHANGED rows
    * (served file-pruned by the version zone maps), not the table — the
    * materialized-view refresh model of Delta/Materialize, reduced to
    * its algebraic kernel. The gate proves the folded view equals the
    * from-scratch rollup of the surviving rows; a user whose rows all
    * die drops out of the view exactly when its count reaches zero.
    * Each fold round localCheckpoints the small view frame (the
    * round-5 iterative-loop rule — lineage must not grow per version).
    */
  /** The change-tracked landing both IVM forms maintain a view over:
    * s15's ETL landed with `_commit_version` + tsu zone maps, then a
    * merge-on-read DELETE applied after the stream (so the final
    * version's window carries tombstone deletes for the feed to serve).
    */
  private def ivmLanding(spark: SparkSession, dir: String, tag: String): String = {
    val src = etlSource(spark, dir, tag)
    val out = java.nio.file.Files.createTempDirectory(s"graft_${tag}_out").toString + "/landing"
    val ckpt = java.nio.file.Files.createTempDirectory(s"graft_${tag}_ckpt").toString
    graft.TempCleanup.registerDir(new java.io.File(out).getParent)
    graft.TempCleanup.registerDir(ckpt)
    ManifestLand.appendCompacting(src, out, ckpt, maxFiles = 64, targetFiles = 4,
      keepVersions = 8, statsCols = Seq(ManifestLand.CommitVersionCol, "tsu"),
      rangeParts = 2, clusterBy = Some(col("tsu")), trackChanges = true)
    ManifestLand.deleteWhere(spark, out,
      col("event_type") === "click" && col("value_e4") < 1000000L)
    out
  }

  def streamIncrementalView(spark: SparkSession, dir: String): DataFrame = {
    val out = ivmLanding(spark, dir, "s28")
    def rollup(df: DataFrame): DataFrame = df.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("value_e4").as("sum_value_e4"))
    var view = rollup(ManifestLand.readVersion(spark, out, 0L)).localCheckpoint()
    for (v <- 1L to 3L) {
      val delta = ManifestLand.changeFeed(spark, out, v - 1L, v, Seq("event_id"))
        .groupBy("user_id")
        .agg(sum(when(col("_change_type") === "insert", 1L).otherwise(-1L))
          .as("dn"),
          sum(when(col("_change_type") === "insert", col("value_e4"))
            .otherwise(-col("value_e4"))).as("ds"))
      view = view.join(delta, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          (coalesce(col("n_events"), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as("n_events"),
          (coalesce(col("sum_value_e4"), lit(0L)) + coalesce(col("ds"), lit(0L)))
            .as("sum_value_e4"))
        .filter(col("n_events") > 0L)
        .localCheckpoint()
    }
    view
  }

  /** s31: PUSH-BASED INCREMENTAL VIEW MAINTENANCE — the change feed AS
    * A STREAMING SOURCE (round-8; s28's fold turned inside-out): the
    * relay ([[ManifestLand.changeFeedRelay]]) incrementally materializes
    * each committed version's net-effect deltas into an append-only
    * change-log landing — exactly-once via its own applied marker,
    * every window served by the delete ladder (O(changes), not
    * O(landing)) — and the view is then a STANDARD Structured Streaming
    * stateful aggregation over `readStream.parquet(change-log)`:
    * versions arrive as micro-batches, insert rows add, delete rows
    * subtract, complete-mode state holds exactly the per-user counters.
    * No custom source machinery: the change log IS the streamable form
    * of the feed (the Delta CDF architecture — change files + a plain
    * stream reader), so watermarks, checkpoints, and AvailableNow all
    * just work. The gate pins it to the SAME oracle as s28: the
    * push-maintained view must equal the batch fold and the
    * from-scratch rollup of the surviving rows.
    *
    * Scale note: the view's state is one counter row per key — at
    * billions of keys that is exactly what the RocksDB state store
    * ([[StateStores]]) exists for, and the production sink is
    * update-mode + MERGE upserts into a landing rather than this
    * gate's complete-mode memory table (bounded here: the corpus has
    * thousands of users).
    */
  def streamPushIvm(spark: SparkSession, dir: String): DataFrame = {
    val src = etlSource(spark, dir, "s31")
    val out = java.nio.file.Files.createTempDirectory("graft_s31_out").toString + "/landing"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s31_ckpt").toString
    val deltaDir = java.nio.file.Files.createTempDirectory("graft_s31_delta").toString
    graft.TempCleanup.registerDir(new java.io.File(out).getParent)
    graft.TempCleanup.registerDir(ckpt)
    graft.TempCleanup.registerDir(deltaDir)
    // the COMPOSED loop: every batch commit relays its window into the
    // change log in the same foreachBatch turn — the log is a live
    // by-product of the landing, not a separately scheduled sync
    ManifestLand.appendCompacting(src, out, ckpt, maxFiles = 64, targetFiles = 4,
      keepVersions = 8, statsCols = Seq(ManifestLand.CommitVersionCol, "tsu"),
      rangeParts = 2, clusterBy = Some(col("tsu")), trackChanges = true,
      relayTo = Some(deltaDir), relayKeys = Seq("event_id"))
    // a LATE delete — it re-flips a version the loop already relayed;
    // the next sync must emit it as its own late-delete batch (the
    // relay's accounted-tombstone diff), not lose it
    ManifestLand.deleteWhere(spark, out,
      col("event_type") === "click" && col("value_e4") < 1000000L)
    ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("event_id"))
    // change-log schema = the landing's tracked schema + the change tag
    val logSchema = StructType(
      ManifestLand.read(spark, out).schema.fields :+
        StructField("_change_type", StringType))
    val view = spark.readStream.schema(logSchema)
      .option("maxFilesPerTrigger", 1).parquet(deltaDir)
      .groupBy("user_id")
      .agg(sum(when(col("_change_type") === "insert", 1L).otherwise(-1L))
          .as("n_events"),
        sum(when(col("_change_type") === "insert", col("value_e4"))
          .otherwise(-col("value_e4"))).as("sum_value_e4"))
    drainToMemory(view, "graft_s31_", "complete")
      .filter(col("n_events") > 0L)
  }

  /** s34: LATE UPDATE THROUGH THE RELAY (round 9 — the verb × feature
    * composition that used to refuse): a row UPDATE re-flips a version
    * the change-feed relay has ALREADY published, so its postimage rows
    * exist in no relayed window. The relay's late accounting now covers
    * updates symmetrically to deletes — the next sync emits the
    * Delta-CDF pair (`update_preimage` for the removed positions,
    * `update_postimage` for the rewritten rows, fetched positionally
    * from only the affected files) alongside plain late `delete` rows,
    * so the log stays exact for BOTH consumer models with no ordering
    * assumption: a row-algebra fold subtracts preimages like deletes
    * and adds postimages like inserts (this query's consumer), and a
    * key-upsert MERGE consumer applies postimages by key and ignores
    * preimages. The gate pins the folded view to the from-scratch
    * rollup with the delete and the update applied (s33's CASE oracle
    * composed with s31's delete predicate). Scale shape: the late pass
    * costs O(the late change volume) — tombstone-delta diff plus a
    * positional fetch — never a rescan of the landing.
    */
  def streamRelayUpsert(spark: SparkSession, dir: String): DataFrame = {
    val src = etlSource(spark, dir, "s34")
    val out = java.nio.file.Files.createTempDirectory("graft_s34_out").toString + "/landing"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s34_ckpt").toString
    val deltaDir = java.nio.file.Files.createTempDirectory("graft_s34_delta").toString
    graft.TempCleanup.registerDir(new java.io.File(out).getParent)
    graft.TempCleanup.registerDir(ckpt)
    graft.TempCleanup.registerDir(deltaDir)
    ManifestLand.appendCompacting(src, out, ckpt, maxFiles = 64, targetFiles = 4,
      keepVersions = 8, statsCols = Seq(ManifestLand.CommitVersionCol, "tsu"),
      rangeParts = 2, clusterBy = Some(col("tsu")), trackChanges = true,
      relayTo = Some(deltaDir), relayKeys = Seq("event_id"))
    // BOTH late verbs on the already-relayed current version: a delete
    // (low-value clicks purged) and an update (errors relabeled with a
    // value bump — s33's patch, previously refused while attached)
    ManifestLand.deleteWhere(spark, out,
      col("event_type") === "click" && col("value_e4") < 1000000L)
    ManifestLand.updateWhere(spark, out, col("event_type") === "error",
      Seq("event_type" -> lit("error_handled"),
        "value_e4" -> (col("value_e4") + 1000000L)))
    ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("event_id"))
    val logSchema = StructType(
      ManifestLand.read(spark, out).schema.fields :+
        StructField("_change_type", StringType))
    // update-aware row-algebra fold: insert/update_postimage add,
    // delete/update_preimage subtract — the 'error' group nets to zero
    // (its rows all moved to 'error_handled') and drops out at the
    // n_events > 0 cut, exactly like a fully-deleted key in s31
    val adds = col("_change_type") === "insert" ||
      col("_change_type") === "update_postimage"
    val view = spark.readStream.schema(logSchema)
      .option("maxFilesPerTrigger", 1).parquet(deltaDir)
      .groupBy("event_type")
      .agg(sum(when(adds, 1L).otherwise(-1L)).as("n_events"),
        sum(when(adds, col("value_e4")).otherwise(-col("value_e4")))
          .as("sum_value_e4"))
    drainToMemory(view, "graft_s34_", "complete")
      .filter(col("n_events") > 0L)
  }

  /** s35: CHANGE-LOG GENERATION SWAP (round 9 — the relay's one
    * documented bound, closed): the append-only change log grows with
    * TOTAL change volume, so a long-lived relay periodically swaps
    * generations — [[ManifestLand.relayGenerationSwap]] bootstraps a
    * NEW log dir from the landing's CURRENT snapshot as pure inserts
    * (live-sized, not lifetime churn; history windows would replay an
    * applied UPDATE through the key-level ladder and leave pre-update
    * phantoms) and re-points the attach marker so every later sync
    * maintains the new dir; the old dir is frozen for its draining
    * consumers. This query runs s34's full history (stream + late
    * delete + late update) into generation 1, SHRINKS retention, swaps
    * to generation 2, then lands one more LATE delete through the new
    * generation — and folds ONLY the new log. The gate pins that fold to the from-scratch rollup with all
    * three verbs applied: a fresh consumer adopting the new generation
    * sees exactly the truth, with no memory of the old log required.
    */
  def streamRelayGenerationSwap(spark: SparkSession, dir: String): DataFrame = {
    val src = etlSource(spark, dir, "s35")
    val out = java.nio.file.Files.createTempDirectory("graft_s35_out").toString + "/landing"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s35_ckpt").toString
    val log1 = java.nio.file.Files.createTempDirectory("graft_s35_log1").toString
    val log2 = java.nio.file.Files.createTempDirectory("graft_s35_log2").toString
    graft.TempCleanup.registerDir(new java.io.File(out).getParent)
    graft.TempCleanup.registerDir(ckpt)
    graft.TempCleanup.registerDir(log1)
    graft.TempCleanup.registerDir(log2)
    ManifestLand.appendCompacting(src, out, ckpt, maxFiles = 64, targetFiles = 4,
      keepVersions = 8, statsCols = Seq(ManifestLand.CommitVersionCol, "tsu"),
      rangeParts = 2, clusterBy = Some(col("tsu")), trackChanges = true,
      relayTo = Some(log1), relayKeys = Seq("event_id"))
    // generation 1 absorbs s34's late history
    ManifestLand.deleteWhere(spark, out,
      col("event_type") === "click" && col("value_e4") < 1000000L)
    ManifestLand.updateWhere(spark, out, col("event_type") === "error",
      Seq("event_type" -> lit("error_handled"),
        "value_e4" -> (col("value_e4") + 1000000L)))
    ManifestLand.changeFeedRelay(spark, out, log1, Seq("event_id"))
    // shrink retention, then swap: generation 2's bootstrap is bounded
    // by the 2-version window, not the landing's lifetime churn
    ManifestLand.expireVersions(out, keep = 2)
    ManifestLand.relayGenerationSwap(spark, out, log2, Seq("event_id"))
    // post-swap maintenance flows to the NEW generation only: a late
    // purge of low-value views, relayed through log2's own state diff
    ManifestLand.deleteWhere(spark, out,
      col("event_type") === "view" && col("value_e4") < 500000L)
    ManifestLand.changeFeedRelay(spark, out, log2, Seq("event_id"))
    val logSchema = StructType(
      ManifestLand.read(spark, out).schema.fields :+
        StructField("_change_type", StringType))
    val adds = col("_change_type") === "insert" ||
      col("_change_type") === "update_postimage"
    val view = spark.readStream.schema(logSchema)
      .option("maxFilesPerTrigger", 1).parquet(log2)
      .groupBy("event_type")
      .agg(sum(when(adds, 1L).otherwise(-1L)).as("n_events"),
        sum(when(adds, col("value_e4")).otherwise(-col("value_e4")))
          .as("sum_value_e4"))
    drainToMemory(view, "graft_s35_", "complete")
      .filter(col("n_events") > 0L)
  }

  /** s36: UPDATE INSIDE AN UN-RELAYED WINDOW, COMPACTED BEFORE THE RELAY
    * (round 10 — the rung-3 caveat closed, lifting updateWhere's last
    * refusal): the stream lands and relays (marker = current), then a
    * CORRECTION batch commits a new version the relay has NOT seen, and
    * BOTH maintenance verbs land inside that un-relayed window — a purge
    * of low-value views and s33's error relabel (which round 9 refused
    * here). A compaction then folds the window's tombstones and rewrite
    * files away BEFORE the relay runs — positional identity gone — so
    * the sync must serve the window through the two-snapshot rung, whose
    * round-10 in-window re-commit flag tags each updated row's removed
    * position `update_preimage` instead of suppressing it. The gate pins
    * the update-aware row-algebra fold of the log to the from-scratch
    * rollup with the correction, the purge, and the relabel all applied
    * — the composition that double-counted every relabeled key under the
    * round-9 key-level rung. Scale shape: the snapshot rung reads the
    * two snapshots once (same shape as the anti-join it replaces), and
    * only when a compaction actually landed inside the window; cheaper
    * rungs still serve every other sync.
    */
  def streamRelayUpdateWindow(spark: SparkSession, dir: String): DataFrame = {
    val src = etlSource(spark, dir, "s36")
    val out = java.nio.file.Files.createTempDirectory("graft_s36_out").toString + "/landing"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s36_ckpt").toString
    val deltaDir = java.nio.file.Files.createTempDirectory("graft_s36_delta").toString
    graft.TempCleanup.registerDir(new java.io.File(out).getParent)
    graft.TempCleanup.registerDir(ckpt)
    graft.TempCleanup.registerDir(deltaDir)
    ManifestLand.appendCompacting(src, out, ckpt, maxFiles = 64, targetFiles = 4,
      keepVersions = 8, statsCols = Seq(ManifestLand.CommitVersionCol, "tsu"),
      rangeParts = 2, clusterBy = Some(col("tsu")), trackChanges = true,
      relayTo = Some(deltaDir), relayKeys = Seq("event_id"))
    // a correction batch opens an UN-RELAYED window: high-value clicks
    // re-landed as a vip segment under fresh keys (-id - 1 — strictly
    // negative, so no collision with the fixture's 0-based event_ids)
    val correction = ManifestLand.read(spark, out)
      .filter(col("event_type") === "click" && col("value_e4") >= 1000000L)
      .select((-col("event_id") - 1L).as("event_id"), col("user_id"),
        lit("click_vip").as("event_type"), col("tsu"), col("value_e4"))
    ManifestLand.commitBatch(correction, 4L, out,
      statsCols = Seq(ManifestLand.CommitVersionCol, "tsu"), rangeParts = 2,
      clusterBy = Some(col("tsu")), trackChanges = true)
    // both verbs land INSIDE the un-relayed window (the update refused
    // here until round 10) ...
    ManifestLand.deleteWhere(spark, out,
      col("event_type") === "view" && col("value_e4") < 500000L)
    ManifestLand.updateWhere(spark, out, col("event_type") === "error",
      Seq("event_type" -> lit("error_handled"),
        "value_e4" -> (col("value_e4") + 1000000L)))
    // ... and a compaction folds the window's evidence BEFORE the relay
    // (allowed: the marker is behind the current version), forcing the
    // sync below through the exact two-snapshot rung
    ManifestLand.compactIfNeeded(spark, out, maxFiles = 1, targetFiles = 2,
      clusterBy = Some(col("tsu")))
    ManifestLand.changeFeedRelay(spark, out, deltaDir, Seq("event_id"))
    val logSchema = StructType(
      ManifestLand.read(spark, out).schema.fields :+
        StructField("_change_type", StringType))
    val adds = col("_change_type") === "insert" ||
      col("_change_type") === "update_postimage"
    val view = spark.readStream.schema(logSchema)
      .option("maxFilesPerTrigger", 1).parquet(deltaDir)
      .groupBy("event_type")
      .agg(sum(when(adds, 1L).otherwise(-1L)).as("n_events"),
        sum(when(adds, col("value_e4")).otherwise(-col("value_e4")))
          .as("sum_value_e4"))
    drainToMemory(view, "graft_s36_", "complete")
      .filter(col("n_events") > 0L)
  }

  /** s27: SCHEMA EVOLUTION on the manifest landing — the lakehouse
    * contract q73 shows for ad-hoc frames, enforced at the STORAGE
    * layer: the landing's schema lives in the tracked `_schema` (not in
    * whichever file a reader samples), a commit may ADD nullable
    * columns — the tracked schema advances and every read serves
    * pre-evolution files with the new columns NULL, no mergeSchema
    * footer sweep — and drops/retypes are REFUSED at commit (silently
    * reading a retyped column through the old schema corrupts rather
    * than errors). Writer is the batch commit path: a file stream
    * declares one fixed schema, so real evolutions happen between
    * stream incarnations or from backfill writers, which commitBatch
    * models. The last two quartiles carry a new `channel` column; the
    * rollup reads old rows as channel IS NULL → 'legacy'.
    */
  /** s33: MERGE-ON-READ ROW UPDATE — the remaining lakehouse verb over
    * the manifest landing: events land as four quartile commits, then
    * [[ManifestLand.updateWhere]] patches every error row (relabel +
    * value bump) in ONE atomic flip — tombstones on the old positions
    * plus rewritten files with fresh zone maps, never a data file
    * rewritten in place. The rollup over the merged read must equal the
    * batch CASE-expression answer; ManifestLandSpec pins the mechanics
    * (atomicity, history, CDF upsert shape, pruning, compaction fold).
    */
  def streamRowUpdate(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val out = java.nio.file.Files.createTempDirectory("graft_s33_out").toString + "/landing"
    graft.TempCleanup.registerDir(new java.io.File(out).getParent)
    val ev = graft.queries.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("tsu"),
        expr("CAST(floor((value) * 10000 + 0.5) AS BIGINT)").as("value_e4"))
    val (mn, mx, step) = quartileCut(ev, col("tsu"))
    for (k <- 0 until 4)
      ManifestLand.commitBatch(ev.filter(inQuartile(col("tsu"), mn, step, k)),
        k.toLong, out, statsCols = Seq("tsu"))
    ManifestLand.updateWhere(spark, out, col("event_type") === "error",
      Seq("event_type" -> lit("error_handled"),
        "value_e4" -> (col("value_e4") + 1000000L)))
    ManifestLand.read(spark, out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_e4")).as("sum_value_e4"))
  }

  def streamSchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val out = java.nio.file.Files.createTempDirectory("graft_s27_out").toString + "/landing"
    graft.TempCleanup.registerDir(new java.io.File(out).getParent)
    val ev = graft.queries.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("tsu"),
        expr("CAST(floor((value) * 10000 + 0.5) AS BIGINT)").as("value_e4"))
    val (mn, mx, step) = quartileCut(ev, col("tsu"))
    for (k <- 0 until 4) {
      val b = ev.filter(inQuartile(col("tsu"), mn, step, k))
      val batch =
        if (k < 2) b
        else b.withColumn("channel",
          concat(col("event_type"), lit("_"), expr("CAST(user_id % 3 AS STRING)")))
      ManifestLand.commitBatch(batch, k.toLong, out)
    }
    ManifestLand.read(spark, out)
      .groupBy(coalesce(col("channel"), lit("legacy")).as("channel"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_e4")).as("sum_value_e4"))
  }

  /** s29: STACKED STATEFUL OPERATORS — Spark 4's multi-stateful pipeline
    * support (pre-3.4 engines refuse this shape): at-least-once dedup
    * (`dropDuplicatesWithinWatermark`, s25's operator) feeding a
    * windowed aggregation IN ONE STREAMING QUERY, two state stores deep.
    * Append mode is REQUIRED for stacked stateful ops, so the trailing
    * windows only finalize when the watermark passes them — the s12
    * sentinel lesson applies verbatim: two far-future sentinel files
    * (the second applies the watermark the first one raised) flush
    * every real window, and the sentinel's own window is filtered out
    * of the result by its hour bucket. The emitted set must then equal
    * s01's batch hourly rollup over the distinct corpus, which is the
    * oracle.
    */
  def streamStackedStateful(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val land = java.nio.file.Files.createTempDirectory("graft_s29_land").toString
    graft.TempCleanup.registerDir(land)
    val ev = graft.queries.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    val (mn, mx, step) = quartileCut(ev, expr("ts div 1000"))
    for (k <- 0 until 4; r <- 0 until 2) // each quartile delivered TWICE
      landFile(ev.filter(inQuartile(expr("ts div 1000"), mn, step, k)),
        land, f"0$k%d$r%d_events.parquet")
    // two sentinel files: the first raises the watermark past every real
    // window, the second makes it APPLY (a watermark raised by batch N
    // takes effect in batch N+1 — the s12 two-file lesson). The offset
    // must clear the last real window's HOUR CEILING, not just mx: with a
    // data-span-proportional offset alone (10×step vs the step+1s delay),
    // any corpus spanning under ~27 minutes would never flush its final
    // hourly window and silently drop rows — so add two hours per
    // sentinel on top of the span-scaled part (the s21 fixed-anchor
    // lesson applied here).
    import spark.implicits._
    for (j <- 1 to 2)
      landFile(Seq((-j.toLong, (mx + (step * 10 + 7200000000L) * j) * 1000L,
          -1L, "sentinel", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
        land, f"09$j%d_sentinel.parquet")
    val lastRealHour = mx / 3600000000L
    val delayMs = step / 1000L + 1000L
    val out = spark.readStream.schema(eventsSchema)
      .option("maxFilesPerTrigger", 1).parquet(land)
      .select(col("event_id"), col("event_type"),
        timestamp_micros(expr("ts div 1000")).as("t"),
        expr("CAST(floor((value) * 10000 + 0.5) AS BIGINT)").as("value_e4"))
      .withWatermark("t", s"$delayMs milliseconds")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("t"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_e4")).as("sum_value_e4"))
      .select(
        (unix_timestamp(col("window.start")) / 3600).cast(LongType).as("hour_bucket"),
        col("n_events"), col("sum_value_e4"))
    drainToMemory(out, "graft_s29_", "append")
      .filter(col("hour_bucket") <= lastRealHour) // drop the sentinel windows
  }

  /** s24: CHANGE DATA FEED — the incremental-consumption read over the
    * manifest landing (Delta CDF / Iceberg incremental scan): s15's ETL
    * landed change-tracked with [[ManifestLand.CommitVersionCol]] among
    * its zone-map stats, a merge-on-read DELETE applied after the
    * stream, then `changeFeed(v1 → current)` emits the NET row changes
    * of the window — inserts served INCREMENTALLY (the version zone maps
    * cut the scan to the window's files; at 100 TB a sync reads the new
    * files, not the table) and deletes recovered by key anti-join of the
    * two retained snapshots, which stays sound after compaction folds
    * the deletion vectors away. The gate proves the feed equals the
    * from-scratch batch diff the oracle computes from the quartile cuts.
    */
  def streamChangeFeed(spark: SparkSession, dir: String): DataFrame = {
    val src = etlSource(spark, dir, "s24")
    val out = java.nio.file.Files.createTempDirectory("graft_s24_out").toString + "/landing"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s24_ckpt").toString
    graft.TempCleanup.registerDir(new java.io.File(out).getParent)
    graft.TempCleanup.registerDir(ckpt)
    ManifestLand.appendCompacting(src, out, ckpt, maxFiles = 64, targetFiles = 4,
      keepVersions = 8, statsCols = Seq(ManifestLand.CommitVersionCol, "tsu"),
      rangeParts = 2, clusterBy = Some(col("tsu")), trackChanges = true)
    ManifestLand.deleteWhere(spark, out,
      col("event_type") === "click" && col("value_e4") < 1000000L)
    ManifestLand.changeFeed(spark, out, fromV = 1L, toV = 3L,
        keyCols = Seq("event_id"))
      .groupBy(col("_change_type").as("change_type"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_e4")).as("sum_value_e4"))
  }

  /** s20: DELETION VECTORS — s15's ETL landed with history retention,
    * then a merge-on-read DELETE (cheap clicks tombstoned positionally,
    * no data file rewritten) and the rollup over the tombstone-filtered
    * read. ManifestLandSpec pins the mechanics (files untouched, history
    * pre-delete, compaction folds the vectors); the gate proves the
    * merged view computes exactly the batch answer with the deleted rows
    * gone.
    */
  def streamDeletionVectors(spark: SparkSession, dir: String): DataFrame = {
    val src = etlSource(spark, dir, "s20")
    val out = java.nio.file.Files.createTempDirectory("graft_s20_out").toString + "/landing"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s20_ckpt").toString
    graft.TempCleanup.registerDir(new java.io.File(out).getParent)
    graft.TempCleanup.registerDir(ckpt)
    ManifestLand.appendCompacting(src, out, ckpt, maxFiles = 64, targetFiles = 4,
      keepVersions = 4)
    ManifestLand.deleteWhere(spark, out,
      col("event_type") === "click" && col("value_e4") < 1000000L)
    etlRollup(ManifestLand.read(spark, out))
  }

  def streamEtlManifest(spark: SparkSession, dir: String): DataFrame = {
    val src = etlSource(spark, dir, "s15")
    val out = java.nio.file.Files.createTempDirectory("graft_s15_out").toString + "/landing"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s15_ckpt").toString
    graft.TempCleanup.registerDir(new java.io.File(out).getParent)
    graft.TempCleanup.registerDir(ckpt)
    ManifestLand.appendCompacting(src, out, ckpt, maxFiles = 2, targetFiles = 2)
    etlRollup(ManifestLand.read(spark, out))
  }

  /** s14: STREAMING ANN retrieval — arriving query vectors are scored
    * against the static corpus per micro-batch. This is the
    * online-retrieval shape at 100 TB: the corpus is the big side and
    * NEVER moves (no shuffle, no state store; cached across triggers
    * here — on a cluster it would be a cached table or a storage-local
    * scan); each trigger's handful of queries is broadcast into the SAME
    * scoring pipeline as the batch e01 ([[graft.queries.VectorOps
    * .scoreTopK]] — one piece of code, so the two can never diverge
    * under their shared oracle), and each batch appends its finished
    * top-k rows to the landing (at-least-once, the standard foreachBatch
    * contract). The 10 query vectors land as 3 files consumed one per
    * trigger so the scoring demonstrably runs across micro-batch
    * boundaries; per-query top-k is batch-independent, so the appended
    * landing must equal the batch e01 answer exactly — which is the
    * oracle.
    */
  def streamingAnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = graft.queries.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      .cache() // scanned once, probed by every trigger
    val land = java.nio.file.Files.createTempDirectory("graft_s14_land").toString
    graft.TempCleanup.registerDir(land)
    val q = graft.queries.Tables.t(spark, dir, "embeddings")
      .filter(col("vec_id") < 10).select("vec_id", "embedding", "label")
      .cache() // one embeddings scan feeds all three landed files
    for ((lo, hi) <- Seq((0, 4), (4, 8), (8, 10)))
      landFile(q.filter(col("vec_id") >= lo && col("vec_id") < hi),
        land, f"00${lo}%d_queries.parquet")
    q.unpersist()
    val out = java.nio.file.Files.createTempDirectory("graft_s14_out").toString + "/landing"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s14_ckpt").toString
    graft.TempCleanup.registerDir(new java.io.File(out).getParent)
    graft.TempCleanup.registerDir(ckpt)
    // schema from the just-landed files (written from the same table) —
    // a hand-copied StructType would silently drift from the fixtures
    val src = spark.readStream.schema(spark.read.parquet(land).schema)
      .option("maxFilesPerTrigger", 1).parquet(land)
    val query = src.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val qb = batch.select(col("vec_id").as("qid"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("qe"))
        // EXACTLY-ONCE landing (SURVEY §9 round-6 #1): each batch owns
        // the dir b<batchId> and overwrites it — a checkpoint-replayed
        // batch rewrites its own output instead of appending duplicates
        graft.queries.VectorOps.scoreTopK(corpus, qb, 5)
          .write.mode("overwrite").parquet(s"$out/b$batchId")
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    corpus.unpersist()
    spark.read.option("recursiveFileLookup", "true").parquet(out)
  }

  /** Continuous-ETL landing: stream → narrow transforms → PARQUET sink
    * (the production sink, not the verification memory table), then a
    * batch rollup over the landed files. Transform-only append streams
    * have no watermark-finalization tail, so the landed rows equal the
    * batch answer exactly; exactly-once comes from the sink's commit log
    * (_spark_metadata) + checkpoint.
    */
  def streamEtlStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    eventsSource(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("tsu"),
        expr("CAST(floor((value) * 10000 + 0.5) AS BIGINT)").as("value_e4"))
  }

  def streamEtlParquet(spark: SparkSession, dir: String): DataFrame = {
    val outDir = java.nio.file.Files.createTempDirectory("graft_stream_etl").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_etl_ckpt").toString
    graft.TempCleanup.registerDir(outDir)
    graft.TempCleanup.registerDir(ckpt)
    ParquetLand.append(streamEtlStream(spark, dir), outDir, ckpt)
    spark.read.parquet(outDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_e4")).as("sum_value_e4"),
        min(col("tsu")).as("first_tsu"),
        max(col("tsu")).as("last_tsu"))
  }

  /** Streaming contamination gate: the d27 bloom sketch (built once from
    * the static eval set, 8 KiB) is broadcast into every micro-batch of a
    * document stream; each arriving doc's 5-gram hashes probe the bitset
    * with pure codegen'd integer arithmetic. This is the production shape
    * for filtering a live crawl against a benchmark set — per-batch cost
    * is narrow (no stream-side state beyond the final per-doc counts),
    * and the emitted answer must equal the batch d27 audit exactly.
    *
    * Per-doc shingle dedup happens inside an array (`array_distinct`
    * before the explode) rather than a stateful stream `distinct`, so no
    * cross-batch dedup state is needed — a doc's shingles arrive with the
    * doc.
    */
  def streamingContaminationStream(spark: SparkSession, dir: String): DataFrame = {
    val bloom = graft.queries.PipelineOps.d27Bloom(spark, dir)
      .withColumn("k", lit(1))
    val grams5 =
      "transform(sequence(1, size(ws) - 4), i -> concat_ws(' ', slice(ws, i, 5)))"
    streamSource(spark, dir, "documents", documentsSchema)
      .filter(col("source") =!= "src0")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 5)
      .select(col("doc_id"),
        explode(expr(s"array_distinct(transform($grams5, g -> xxhash64(g)))")).as("h"))
      .withColumn("k", lit(1))
      .join(broadcast(bloom), "k")
      .select(col("doc_id"),
        when(expr(graft.functions.BloomAgg.memberExpr("words", "h")), 1L)
          .otherwise(0L).as("hit"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), sum(col("hit")).as("n_hits"))
  }

  def streamingContamination(spark: SparkSession, dir: String): DataFrame =
    drainToMemory(streamingContaminationStream(spark, dir), "graft_stream_contam_", "complete")
      .select(col("doc_id"), col("n_shingles"), col("n_hits"),
        expr("CAST(1000 * n_hits div n_shingles AS BIGINT)").as("contam_permille"))

  val queries: Seq[graft.queries.Q] = Seq(
    // deterministic winner: each distinct text belongs to the source of
    // its min-doc_id row — exactly what the min_by state keeps
    graft.queries.Q("s03_streaming_dedup", (s, dir) => streamingDedup(s, dir),
      Some("""SELECT source, COUNT(*) AS n_unique_docs FROM (
             |  SELECT source FROM (
             |    SELECT source, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
             |    FROM documents)
             |  WHERE rn = 1)
             |GROUP BY source""".stripMargin)),
    graft.queries.Q("s01_streaming_hourly", (s, dir) => hourlyAgg(s, dir),
      // identical to the batch hourly rollup — the streaming window must
      // agree with DuckDB's batch answer
      Some("""SELECT epoch_us(ts) // 3600000000 AS hour_bucket,
             |  COUNT(*) AS n_events,
             |  CAST(SUM(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_e4
             |FROM events GROUP BY 1""".stripMargin)),
    graft.queries.Q("s26_sliding_window", (s, dir) => slidingAgg(s, dir),
      // every event lands in exactly 4 overlapping windows; the window
      // starts are epoch-aligned to the slide in both engines
      Some("""WITH e AS (SELECT epoch_us(ts) AS tsu, event_type,
             |             CAST(floor((value) * 10000 + 0.5) AS BIGINT) AS value_e4
             |           FROM events),
             |w AS (SELECT (tsu // 1800000000 - k) AS slide_bucket, event_type, value_e4
             |      FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k))
             |SELECT slide_bucket, event_type, COUNT(*) AS n_events,
             |  CAST(SUM(value_e4) AS BIGINT) AS sum_value_e4
             |FROM w GROUP BY 1, 2""".stripMargin)),
    graft.queries.Q("s02_stateful_sessions", (s, dir) => statefulSessions(s, dir),
      // must agree with the batch sessionization (q15's oracle)
      Some("""WITH d AS (
             |  SELECT user_id,
             |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
             |SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions
             |FROM d GROUP BY user_id""".stripMargin)),
    graft.queries.Q("s18_transform_with_state",
      (s, dir) => transformWithStateSessions(s, dir),
      // s02's session islands + the per-user event count, one state row
      Some("""WITH d AS (
             |  SELECT user_id,
             |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
             |SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions,
             |       CAST(COUNT(*) AS BIGINT) AS n_events
             |FROM d GROUP BY user_id""".stripMargin)),
    graft.queries.Q("s21_timer_sessions", (s, dir) => timerSessions(s, dir),
      // every gap-island session, emitted exactly once at close time —
      // the full session LIST (s02 reports per-user counts; s10's
      // session_window uses >=, this API's fold uses s02's >)
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
             |m AS (SELECT user_id, event_id, tsu,
             |        CASE WHEN lag(tsu) OVER w IS NULL
             |               OR tsu - lag(tsu) OVER w > 1800000000
             |             THEN 1 ELSE 0 END AS new_s
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
             |i AS (SELECT user_id, tsu,
             |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsu, event_id
             |                         ROWS UNBOUNDED PRECEDING) AS sid
             |      FROM m)
             |SELECT user_id, CAST(MIN(tsu) AS BIGINT) AS session_start_us,
             |       CAST(MAX(tsu) AS BIGINT) AS session_end_us,
             |       CAST(COUNT(*) AS BIGINT) AS n_events
             |FROM i GROUP BY user_id, sid""".stripMargin)),
    graft.queries.Q("s04_stream_static_join", (s, dir) => streamStaticJoin(s, dir),
      Some("""SELECT c_mktsegment, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_e4
             |FROM events JOIN customer ON user_id = c_custkey
             |GROUP BY c_mktsegment""".stripMargin)),
    graft.queries.Q("s05_stream_stream_join", (s, dir) => streamStreamJoin(s, dir),
      // inclusive 30-minute window on both bounds, exact µs domain
      Some("""SELECT v.user_id, COUNT(*) AS n_conversions
             |FROM (SELECT user_id, epoch_us(ts) AS vt FROM events WHERE event_type = 'view') v
             |JOIN (SELECT user_id, epoch_us(ts) AS pt FROM events WHERE event_type = 'purchase') p
             |  ON v.user_id = p.user_id AND p.pt >= v.vt AND p.pt <= v.vt + 1800000000
             |GROUP BY v.user_id""".stripMargin)),
    graft.queries.Q("s12_stream_left_outer_join", (s, dir) => leftOuterFunnel(s, dir),
      // the batch LEFT JOIN the watermark-evicted stream must reproduce:
      // one row per (view, matching purchase) plus one NULL row per
      // never-converted view; COUNT(pt) skips the NULLs in both engines
      Some("""WITH v AS (SELECT user_id, epoch_us(ts) AS vt FROM events WHERE event_type = 'view'),
             |p AS (SELECT user_id AS pu, epoch_us(ts) AS pt FROM events WHERE event_type = 'purchase'),
             |j AS (SELECT v.user_id, v.vt, p.pt FROM v LEFT JOIN p
             |      ON p.pu = v.user_id AND p.pt >= v.vt AND p.pt <= v.vt + 1800000000)
             |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(COUNT(pt) AS BIGINT) AS n_converted
             |FROM j GROUP BY user_id""".stripMargin)),
    // per-query top-k is batch-independent, so the micro-batched scoring
    // must reproduce the batch e01 oracle verbatim
    graft.queries.Q("s14_streaming_ann", (s, dir) => streamingAnn(s, dir),
      Some(graft.queries.VectorOps.oracleCosine("vec_id < 10", "", 5))),
    graft.queries.Q("s13_stream_etl_compacted", (s, dir) => streamEtlCompacted(s, dir),
      Some("""SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_e4,
             |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM events GROUP BY event_type""".stripMargin)),
    // shares q64's oracle verbatim: the streaming CDC apply must land the
    // exact snapshot the one-shot batch MERGE computes
    graft.queries.Q("s16_stream_cdc_apply", (s, dir) => streamCdcApply(s, dir),
      Some(graft.queries.PipelineOps.q64Oracle)),
    // the versioned read is a PREFIX of the batch sequence: the oracle
    // recomputes the first three µs-quartiles of the stream directly
    graft.queries.Q("s17_time_travel", (s, dir) => streamEtlTimeTravel(s, dir),
      Some("""WITH b AS (SELECT MIN(epoch_us(ts)) AS mnu,
             |         (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 4 + 1 AS step
             |       FROM events),
             |e AS (SELECT event_type, value, user_id FROM events, b
             |      WHERE epoch_us(ts) < b.mnu + 3 * b.step)
             |SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_e4,
             |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM e GROUP BY event_type""".stripMargin)),
    graft.queries.Q("s19_manifest_zonemap", (s, dir) => streamEtlZoneMap(s, dir),
      // the pruned+residual read must equal the plain range rollup
      Some("""WITH e AS (SELECT event_type, epoch_us(ts) AS tsu,
             |             CAST(floor((value) * 10000 + 0.5) AS BIGINT) AS value_e4
             |           FROM events),
             |b AS (SELECT MIN(tsu) AS mn, MAX(tsu) AS mx FROM e),
             |r AS (SELECT e.* FROM e, b
             |      WHERE tsu >= mn + (mx - mn) // 4
             |        AND tsu <= mn + 3 * ((mx - mn) // 4))
             |SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(value_e4) AS BIGINT) AS sum_value_e4
             |FROM r GROUP BY event_type""".stripMargin)),
    graft.queries.Q("s22_zorder_zonemap", (s, dir) => streamZorderZoneMap(s, dir),
      // the two-axis pruned read must equal the plain rectangle rollup
      Some("""WITH e AS (SELECT event_type, user_id, epoch_us(ts) AS tsu,
             |             CAST(floor((value) * 10000 + 0.5) AS BIGINT) AS value_e4
             |           FROM events),
             |b AS (SELECT MIN(user_id) AS umn, MAX(user_id) AS umx,
             |             MIN(tsu) AS tmn, MAX(tsu) AS tmx FROM e),
             |r AS (SELECT e.* FROM e, b
             |      WHERE user_id >= umn + (umx - umn) // 4
             |        AND user_id <= umn + 3 * ((umx - umn) // 4)
             |        AND tsu >= tmn + (tmx - tmn) // 4
             |        AND tsu <= tmn + 3 * ((tmx - tmn) // 4))
             |SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(value_e4) AS BIGINT) AS sum_value_e4
             |FROM r GROUP BY event_type""".stripMargin)),
    graft.queries.Q("s23_manifest_bloom", (s, dir) => streamManifestBloom(s, dir),
      // the bloom-pruned point lookup must equal the plain equality rollup
      Some("""WITH e AS (SELECT event_type, user_id,
             |             CAST(floor((value) * 10000 + 0.5) AS BIGINT) AS value_e4
             |           FROM events),
             |p AS (SELECT MIN(user_id) AS u FROM e)
             |SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(value_e4) AS BIGINT) AS sum_value_e4
             |FROM e, p WHERE user_id = u GROUP BY event_type""".stripMargin)),
    graft.queries.Q("s32_bloom_backfill_in", (s, dir) => streamBloomBackfillIn(s, dir),
      // the backfilled, IN-pruned lookup must equal the plain two-user
      // rollup (min and max user of the corpus)
      Some("""WITH e AS (SELECT event_type, user_id,
             |             CAST(floor((value) * 10000 + 0.5) AS BIGINT) AS value_e4
             |           FROM events),
             |p AS (SELECT MIN(user_id) AS lo, MAX(user_id) AS hi FROM e)
             |SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(value_e4) AS BIGINT) AS sum_value_e4,
             |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM e, p WHERE user_id IN (lo, hi) GROUP BY event_type""".stripMargin)),
    graft.queries.Q("s33_row_update", (s, dir) => streamRowUpdate(s, dir),
      // the atomically-updated landing's rollup must equal the batch
      // CASE-expression answer over the raw events
      Some("""WITH e AS (SELECT event_type,
             |             CAST(floor((value) * 10000 + 0.5) AS BIGINT) AS value_e4
             |           FROM events),
             |u AS (SELECT CASE WHEN event_type = 'error' THEN 'error_handled'
             |               ELSE event_type END AS event_type,
             |             CASE WHEN event_type = 'error' THEN value_e4 + 1000000
             |               ELSE value_e4 END AS value_e4
             |      FROM e)
             |SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(value_e4) AS BIGINT) AS sum_value_e4
             |FROM u GROUP BY event_type""".stripMargin)),
    graft.queries.Q("s25_dedup_within_watermark", (s, dir) => streamDedupWatermark(s, dir),
      // the doubly-delivered stream deduped within the watermark must
      // equal the plain distinct-corpus rollup
      Some("""WITH e AS (SELECT event_id, event_type,
             |             CAST(floor((value) * 10000 + 0.5) AS BIGINT) AS value_e4
             |           FROM events)
             |SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(value_e4) AS BIGINT) AS sum_value_e4,
             |  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids
             |FROM e GROUP BY event_type""".stripMargin)),
    graft.queries.Q("s30_stream_full_outer_join", (s, dir) => fullOuterFunnel(s, dir),
      // matched pairs + abandoned views + orphan purchases must equal
      // the batch FULL OUTER JOIN with the same interval predicate
      Some("""WITH v AS (SELECT user_id AS u, epoch_us(ts) AS tv FROM events WHERE event_type = 'view'),
             |p AS (SELECT user_id AS u, epoch_us(ts) AS tp FROM events WHERE event_type = 'purchase'),
             |j AS (SELECT v.u AS uv, p.u AS up, tv, tp
             |      FROM v FULL OUTER JOIN p
             |        ON p.u = v.u AND tp >= tv AND tp <= tv + 1800000000)
             |SELECT COALESCE(uv, up) AS user_id,
             |  COUNT(*) AS n_rows,
             |  CAST(COUNT(CASE WHEN uv IS NOT NULL AND tp IS NOT NULL THEN 1 END) AS BIGINT) AS n_matched,
             |  CAST(COUNT(CASE WHEN uv IS NULL THEN 1 END) AS BIGINT) AS n_orphan_purchases,
             |  CAST(COUNT(CASE WHEN tp IS NULL THEN 1 END) AS BIGINT) AS n_abandoned_views
             |FROM j GROUP BY 1""".stripMargin)),
    graft.queries.Q("p03_streaming_prep", (s, dir) => streamingPrepPipeline(s, dir),
      // the streamed normalize→dedup→gate→account composition must equal
      // the batch pipeline computed from scratch
      Some("""WITH n AS (SELECT doc_id, source,
             |             lower(trim(regexp_replace(text, ' +', ' ', 'g'))) AS norm
             |           FROM documents),
             |w AS (SELECT doc_id, source, norm,
             |        CAST(len(string_split(norm, ' ')) AS BIGINT) AS toks FROM n),
             |d AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY norm ORDER BY doc_id) AS rn FROM w),
             |k AS (SELECT * FROM d WHERE rn = 1 AND toks >= 30)
             |SELECT source, COUNT(*) AS n_docs,
             |  CAST(SUM(toks) AS BIGINT) AS sum_tokens
             |FROM k GROUP BY source""".stripMargin)),
    graft.queries.Q("s29_stacked_stateful", (s, dir) => streamStackedStateful(s, dir),
      // dedup → windowed agg, two state stores deep, must equal the
      // batch hourly rollup over the distinct corpus (s01's oracle)
      Some("""SELECT epoch_us(ts) // 3600000000 AS hour_bucket,
             |  COUNT(*) AS n_events,
             |  CAST(SUM(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_e4
             |FROM events GROUP BY 1""".stripMargin)),
    graft.queries.Q("s28_incremental_view", (s, dir) => streamIncrementalView(s, dir),
      // the delta-folded view must equal the from-scratch rollup of the
      // surviving (non-deleted) rows, per user
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
             |             CAST(floor((value) * 10000 + 0.5) AS BIGINT) AS value_e4
             |           FROM events)
             |SELECT user_id, COUNT(*) AS n_events,
             |  CAST(SUM(value_e4) AS BIGINT) AS sum_value_e4
             |FROM e
             |WHERE NOT (event_type = 'click' AND value_e4 < 1000000)
             |GROUP BY user_id""".stripMargin)),
    graft.queries.Q("s31_push_ivm", (s, dir) => streamPushIvm(s, dir),
      // the push-maintained view must equal s28's batch-folded one:
      // the from-scratch rollup of the surviving rows, per user
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
             |             CAST(floor((value) * 10000 + 0.5) AS BIGINT) AS value_e4
             |           FROM events)
             |SELECT user_id, COUNT(*) AS n_events,
             |  CAST(SUM(value_e4) AS BIGINT) AS sum_value_e4
             |FROM e
             |WHERE NOT (event_type = 'click' AND value_e4 < 1000000)
             |GROUP BY user_id""".stripMargin)),
    graft.queries.Q("s34_relay_upsert", (s, dir) => streamRelayUpsert(s, dir),
      // the update-aware fold of the relayed change log must equal the
      // from-scratch rollup with the late delete AND the late update
      // applied (s33's CASE patch composed with s31's delete predicate)
      Some("""WITH e AS (SELECT event_type,
             |             CAST(floor((value) * 10000 + 0.5) AS BIGINT) AS value_e4
             |           FROM events),
             |s AS (SELECT * FROM e
             |      WHERE NOT (event_type = 'click' AND value_e4 < 1000000)),
             |u AS (SELECT CASE WHEN event_type = 'error' THEN 'error_handled'
             |               ELSE event_type END AS event_type,
             |             CASE WHEN event_type = 'error' THEN value_e4 + 1000000
             |               ELSE value_e4 END AS value_e4
             |      FROM s)
             |SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(value_e4) AS BIGINT) AS sum_value_e4
             |FROM u GROUP BY event_type""".stripMargin)),
    graft.queries.Q("s35_relay_genswap",
      (s, dir) => streamRelayGenerationSwap(s, dir),
      // fold of ONLY the new generation (bootstrapped from retained
      // history after the swap, then one more late delete through it)
      // = the from-scratch rollup with all three verbs applied: s34's
      // late delete + update, composed with the post-swap view purge
      Some("""WITH e AS (SELECT event_type,
             |             CAST(floor((value) * 10000 + 0.5) AS BIGINT) AS value_e4
             |           FROM events),
             |s AS (SELECT * FROM e
             |      WHERE NOT (event_type = 'click' AND value_e4 < 1000000)),
             |u AS (SELECT CASE WHEN event_type = 'error' THEN 'error_handled'
             |               ELSE event_type END AS event_type,
             |             CASE WHEN event_type = 'error' THEN value_e4 + 1000000
             |               ELSE value_e4 END AS value_e4
             |      FROM s),
             |f AS (SELECT * FROM u
             |      WHERE NOT (event_type = 'view' AND value_e4 < 500000))
             |SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(value_e4) AS BIGINT) AS sum_value_e4
             |FROM f GROUP BY event_type""".stripMargin)),
    graft.queries.Q("s36_relay_update_window",
      (s, dir) => streamRelayUpdateWindow(s, dir),
      // update + purge land inside an UN-RELAYED window, a compaction
      // folds the window's evidence, then the relay syncs it through
      // the exact two-snapshot rung: the fold of the log must equal the
      // from-scratch rollup with the vip correction, the view purge,
      // and the error relabel all applied
      Some("""WITH e AS (SELECT event_type,
             |             CAST(floor((value) * 10000 + 0.5) AS BIGINT) AS value_e4
             |           FROM events),
             |c AS (SELECT event_type, value_e4 FROM e
             |      UNION ALL
             |      SELECT 'click_vip' AS event_type, value_e4 FROM e
             |      WHERE event_type = 'click' AND value_e4 >= 1000000),
             |s AS (SELECT * FROM c
             |      WHERE NOT (event_type = 'view' AND value_e4 < 500000)),
             |u AS (SELECT CASE WHEN event_type = 'error' THEN 'error_handled'
             |               ELSE event_type END AS event_type,
             |             CASE WHEN event_type = 'error' THEN value_e4 + 1000000
             |               ELSE value_e4 END AS value_e4
             |      FROM s)
             |SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(value_e4) AS BIGINT) AS sum_value_e4
             |FROM u GROUP BY event_type""".stripMargin)),
    graft.queries.Q("s27_schema_evolution", (s, dir) => streamSchemaEvolution(s, dir),
      // pre-evolution rows read with the added column NULL ('legacy');
      // post-evolution rows carry the derived channel
      Some("""WITH e AS (SELECT event_type, user_id, epoch_us(ts) AS tsu,
             |             CAST(floor((value) * 10000 + 0.5) AS BIGINT) AS value_e4
             |           FROM events),
             |b AS (SELECT MIN(tsu) AS mnu,
             |             (MAX(tsu) - MIN(tsu)) // 4 + 1 AS step FROM e),
             |k AS (SELECT e.*, (tsu - mnu) // step AS batch FROM e, b),
             |c AS (SELECT CASE WHEN batch >= 2
             |               THEN event_type || '_' || CAST(user_id % 3 AS VARCHAR)
             |               ELSE 'legacy' END AS channel, value_e4
             |      FROM k)
             |SELECT channel, COUNT(*) AS n_events,
             |  CAST(SUM(value_e4) AS BIGINT) AS sum_value_e4
             |FROM c GROUP BY channel""".stripMargin)),
    graft.queries.Q("s24_change_feed", (s, dir) => streamChangeFeed(s, dir),
      // the incremental feed must equal the from-scratch batch diff:
      // inserts = the window's quartiles minus the deleted rows, deletes
      // = pre-window rows hit by the post-stream DELETE
      Some("""WITH e AS (SELECT event_type, epoch_us(ts) AS tsu,
             |             CAST(floor((value) * 10000 + 0.5) AS BIGINT) AS value_e4
             |           FROM events),
             |b AS (SELECT MIN(tsu) AS mnu,
             |             (MAX(tsu) - MIN(tsu)) // 4 + 1 AS step FROM e),
             |k AS (SELECT e.*, (tsu - mnu) // step AS batch FROM e, b),
             |c AS (SELECT 'insert' AS change_type, event_type, value_e4 FROM k
             |      WHERE batch >= 2 AND NOT (event_type = 'click' AND value_e4 < 1000000)
             |      UNION ALL
             |      SELECT 'delete' AS change_type, event_type, value_e4 FROM k
             |      WHERE batch <= 1 AND (event_type = 'click' AND value_e4 < 1000000))
             |SELECT change_type, event_type, COUNT(*) AS n_events,
             |  CAST(SUM(value_e4) AS BIGINT) AS sum_value_e4
             |FROM c GROUP BY 1, 2""".stripMargin)),
    graft.queries.Q("s20_deletion_vectors", (s, dir) => streamDeletionVectors(s, dir),
      // the merge-on-read view must equal the batch answer minus the
      // tombstoned rows
      Some("""WITH e AS (SELECT event_type, user_id,
             |             CAST(floor((value) * 10000 + 0.5) AS BIGINT) AS value_e4
             |           FROM events)
             |SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(value_e4) AS BIGINT) AS sum_value_e4,
             |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM e
             |WHERE NOT (event_type = 'click' AND value_e4 < 1000000)
             |GROUP BY event_type""".stripMargin)),
    // same rollup, same oracle as s13: the manifest-flip commit protocol
    // must be observationally identical to the rename-swap one
    graft.queries.Q("s15_stream_etl_manifest", (s, dir) => streamEtlManifest(s, dir),
      Some("""SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_e4,
             |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM events GROUP BY event_type""".stripMargin)),
    graft.queries.Q("s06_stream_etl_parquet", (s, dir) => streamEtlParquet(s, dir),
      Some("""SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_e4,
             |  MIN(epoch_us(ts)) AS first_tsu,
             |  MAX(epoch_us(ts)) AS last_tsu
             |FROM events GROUP BY event_type""".stripMargin)),
    // must equal the batch d27 bloom audit: same replay of the exported
    // bitset + probe hashes (the streamed probe set is identical by
    // construction — per-doc array_distinct of the same 5-gram hashes)
    graft.queries.Q("s08_streaming_contamination",
      (s, dir) => streamingContamination(s, dir),
      Some {
        import graft.functions.BloomAgg.{NumBits, NumProbes, WordBits}
        s"""WITH wds AS (SELECT idx, word FROM '{OUT}/_aux/s08_streaming_contamination/aux_bloom/*.parquet'),
           |pr AS (SELECT doc_id, h FROM '{OUT}/_aux/s08_streaming_contamination/aux_probes/*.parquet'),
           |ph AS (SELECT doc_id, h, h & ${NumBits - 1} AS h1,
           |              ((h & 4294967295) // 65536) | 1 AS h2 FROM pr),
           |pos AS (SELECT doc_id, h, (h1 + r.range * h2) % $NumBits AS pos
           |        FROM ph, range(0, $NumProbes) r),
           |bit AS (SELECT p.doc_id, p.h,
           |          CASE WHEN (w.word & (CAST(1 AS BIGINT) << CAST(pos % $WordBits AS INT))) != 0
           |               THEN 1 ELSE 0 END AS b
           |        FROM pos p JOIN wds w ON w.idx = p.pos // $WordBits),
           |mem AS (SELECT doc_id, h, MIN(b) AS is_m FROM bit GROUP BY doc_id, h)
           |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
           |  CAST(SUM(is_m) AS BIGINT) AS n_hits,
           |  CAST(1000 * SUM(is_m) // COUNT(*) AS BIGINT) AS contam_permille
           |FROM mem GROUP BY doc_id""".stripMargin
      },
      aux = Seq(
        "aux_bloom" -> ((s: SparkSession, dir: String) =>
          graft.queries.PipelineOps.d27Bloom(s, dir)
            .select(posexplode(col("words")).as(Seq("idx", "word")))),
        "aux_probes" -> ((s: SparkSession, dir: String) =>
          graft.queries.PipelineOps.d27Probes(s, dir)))),

    // engine-native session windows must agree with DuckDB's gap-island
    // sessionization (>= boundary: exclusive session end — see the
    // sessionWindowStream doc)
    graft.queries.Q("s10_session_window", (s, dir) => sessionWindows(s, dir),
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu,
             |         CAST(floor((value) * 10000 + 0.5) AS BIGINT) AS v4 FROM events),
             |m AS (SELECT user_id, event_id, tsu, v4,
             |        CASE WHEN lag(tsu) OVER w IS NULL
             |               OR tsu - lag(tsu) OVER w >= 1800000000
             |             THEN 1 ELSE 0 END AS new_s
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
             |i AS (SELECT user_id, tsu, v4,
             |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsu, event_id
             |                         ROWS UNBOUNDED PRECEDING) AS sid
             |      FROM m)
             |SELECT user_id, CAST(MIN(tsu) AS BIGINT) AS session_start_us,
             |       COUNT(*) AS n_events, CAST(SUM(v4) AS BIGINT) AS sum_value_e4
             |FROM i GROUP BY user_id, sid""".stripMargin)),

    // top-2 event types per hour from the streamed counts — must equal
    // the batch rank over the same counts
    graft.queries.Q("s11_streaming_topk", (s, dir) => hourlyTopTypes(s, dir),
      Some("""WITH c AS (SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
             |         CAST(COUNT(*) AS BIGINT) AS n
             |       FROM events GROUP BY hour_bucket, event_type),
             |r AS (SELECT hour_bucket, event_type, n,
             |        ROW_NUMBER() OVER (PARTITION BY hour_bucket
             |                           ORDER BY n DESC, event_type ASC) AS rnk
             |      FROM c)
             |SELECT hour_bucket, event_type, n, CAST(rnk AS BIGINT) AS rnk
             |FROM r WHERE rnk <= 2""".stripMargin)),

    // streaming KMV distinct sketch: cross-batch mergeable state. The
    // per-key state is the set of ≤256 smallest distinct md5-prefix
    // hashes — a commutative, idempotent merge, so the final estimate is
    // INDEPENDENT of how files split into micro-batches and equals the
    // batch q48 sketch exactly (same oracle, minus the exact column a
    // stream can't cheaply carry). n_h grows and the k-th minimum only
    // falls as batches arrive, so max(n_h)/min(kth) over the update
    // stream reads the final state.
    graft.queries.Q("s09_streaming_kmv", (s, dir) => streamingKmv(s, dir),
      Some("""WITH h AS (SELECT DISTINCT l_returnflag,
             |    CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8)) AS BIGINT) AS h
             |  FROM lineitem),
             |r AS (SELECT l_returnflag, h,
             |             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
             |      FROM h),
             |s AS (SELECT l_returnflag,
             |             MAX(CASE WHEN rn = 256 THEN h END) AS kth,
             |             CAST(COUNT(*) AS BIGINT) AS n_h
             |      FROM r WHERE rn <= 256 GROUP BY l_returnflag)
             |SELECT l_returnflag,
             |       CAST(CASE WHEN kth IS NULL THEN n_h
             |                 ELSE (255 * CAST(4294967296 AS BIGINT)) // kth END AS BIGINT) AS est_distinct
             |FROM s""".stripMargin))
  )

  /** Native session-window streaming aggregation (s10): Spark's
    * `session_window` merges events into per-user sessions with a
    * 30-minute inactivity gap INSIDE the state store — the engine-level
    * counterpart of s02's hand-rolled flatMapGroupsWithState. Boundary
    * semantics: a session's range is [event, event+gap) with an exclusive
    * end, so an event landing exactly gap after its predecessor starts a
    * NEW session (`>=` in the oracle, vs s02's `>`).
    */
  def sessionWindowStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    eventsSource(spark, dir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "1 hour")
      .groupBy(col("user_id"), session_window(col("event_time"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(floor((value) * 10000 + 0.5) AS BIGINT)")).as("sum_value_e4"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"), col("sum_value_e4"))
  }

  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    drainToMemory(sessionWindowStream(spark, dir), "graft_stream_sesswin_", "complete")

  /** Streaming windowed top-k (s11): the hourly (bucket, type) counts
    * accumulate in the stream (complete-mode state); the per-bucket
    * top-2 rank runs as a batch query over the drained sink — ranking
    * above a streaming aggregation inside the stream would re-rank every
    * bucket on every batch for no benefit. Full sort key (n DESC,
    * event_type ASC) as always.
    */
  def hourlyTopTypesStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    eventsSource(spark, dir)
      .select(expr("(ts div 1000) div 3600000000").as("hour_bucket"),
        col("event_type"))
      .groupBy("hour_bucket", "event_type")
      .agg(count(lit(1)).as("n"))
  }

  def hourlyTopTypes(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("hour_bucket")
      .orderBy(col("n").desc, col("event_type").asc)
    drainToMemory(hourlyTopTypesStream(spark, dir), "graft_stream_topk_", "complete")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 2)
      .select(col("hour_bucket"), col("event_type"), col("n"),
        col("rnk").cast(LongType).as("rnk"))
  }

  /** lineitem columns the KMV stream needs (parquet projects by name). */
  private val lineitemKmvSchema: StructType = StructType(Seq(
    StructField("l_partkey", LongType),
    StructField("l_returnflag", StringType)))

  final case class KmvIn(flag: String, h: Long)
  final case class KmvState(hs: Array[Long])

  /** See s09 doc above. flatMapGroupsWithState keyed on l_returnflag;
    * the state merge is `(old ∪ batch).distinct.sorted.take(256)` — a
    * commutative, idempotent merge, so unlike s02 the answer is batch-
    * split invariant in ANY file order (proved in StreamingSinkSpec).
    * "No k-th minimum yet" is a NULL kth, NOT a numeric sentinel
    * (round-3 advisor: a sentinel in the hash domain could collide with
    * a legitimate hash value and silently skew the min over updates).
    */
  def streamingKmvStream(
      spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val K = 256
    val updateFn: (String, Iterator[KmvIn], GroupState[KmvState]) => Iterator[(String, Long, Option[Long])] =
      (flag, evs, state) => {
        val old = state.getOption.map(_.hs).getOrElse(Array.empty[Long])
        val merged = (old ++ evs.map(_.h)).distinct.sorted.take(K)
        state.update(KmvState(merged))
        val kth = if (merged.length >= K) Some(merged(K - 1)) else Option.empty[Long]
        Iterator.single((flag, merged.length.toLong, kth))
      }
    streamSource(spark, dir, "lineitem", lineitemKmvSchema, maxFilesPerTrigger)
      .select(col("l_returnflag").as("flag"),
        expr("CAST(conv(substr(md5(CAST(l_partkey AS STRING)), 1, 8), 16, 10) AS BIGINT)").as("h"))
      .as[KmvIn]
      .groupByKey(_.flag)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(updateFn)
      .toDF("l_returnflag", "n_h", "kth")
  }

  def streamingKmv(spark: SparkSession, dir: String): DataFrame =
    drainToMemory(streamingKmvStream(spark, dir), "graft_stream_kmv_", "update")
      .groupBy("l_returnflag")
      // min skips NULLs: the k-th minimum only falls over updates, so the
      // smallest non-null kth is the final one
      .agg(max("n_h").as("n_h"), min(col("kth")).as("kth"))
      .select(col("l_returnflag"),
        expr("CAST(CASE WHEN kth IS NULL THEN n_h ELSE (255 * CAST(4294967296 AS BIGINT)) div kth END AS BIGINT)")
          .as("est_distinct"))
}
