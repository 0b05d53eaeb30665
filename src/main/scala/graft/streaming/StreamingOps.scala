package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2.5: an extension beyond the
  * reference, which has no stream processing). The same hourly event
  * aggregation as the batch q14, expressed as a file-source stream with
  * event-time windows + watermark — on a cluster this runs continuously
  * over a landing directory; here `Trigger.AvailableNow` drains the
  * existing files and stops, which makes the result comparable to the
  * batch oracle.
  */
object StreamingOps {

  /** events.parquet physical schema (ts as bigint nanos via nanosAsLong). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Hourly tumbling-window counts/sums over a stream of event files.
    * Returns the completed result as a batch DataFrame (memory sink).
    */
  def hourlyAgg(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file source needs a directory: stream the sf dir, filtered to
    // the events table's file(s)
    val stream = spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DecimalType(18, 4)).as("sum_value"))
      .select(
        (unix_timestamp(col("window.start")) / 3600).cast(LongType).as("hour_bucket"),
        col("n_events"), col("sum_value"))
    val name = "graft_stream_hourly_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  val queries: Seq[graft.queries.Q] = Seq(
    graft.queries.Q("s01_streaming_hourly", (s, dir) => hourlyAgg(s, dir),
      // identical to the batch hourly rollup — the streaming window must
      // agree with DuckDB's batch answer
      Some("""SELECT epoch_us(ts) // 3600000000 AS hour_bucket,
             |  COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_value
             |FROM events GROUP BY 1""".stripMargin))
  )
}
