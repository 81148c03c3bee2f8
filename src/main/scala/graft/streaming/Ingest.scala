package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming ingest path (SURVEY.md §2.9, §3.1).
  *
  * The reference's ingest is a scheduled micro-batch: a producer streams
  * for STREAM_SECONDS into a 1-shard Kinesis stream, a consumer polls for
  * RUN_SECONDS, writes one CSV under `landing/YYYY/MM/DD/`, then the
  * stream is deleted until the next run. In Spark that whole state
  * machine is one `readStream → transform → writeStream` with
  * `Trigger.AvailableNow()` (drain-what-exists-then-stop) — scheduling
  * stays external, checkpointing upgrades delivery from at-least-once to
  * exactly-once into the file sink.
  *
  * The source here is any streaming DataFrame of raw records
  * (record_id, ts, payload-JSON) — a file source or MemoryStream in
  * tests, a Kinesis/Kafka connector in production. The `events` testdata
  * table models the upstream.
  */
object Ingest {

  /** Tweet payload schema (stream_listener.py:63-69 producer dict). */
  val payloadSchema: StructType = StructType(Seq(
    StructField("created", StringType),
    StructField("tweet_id", StringType),
    StructField("user_name", StringType),
    StructField("rt_count", IntegerType),
    StructField("hashtags", StringType),
    StructField("text", StringType),
  ))

  /** S11 + J1: parse the JSON payload and flatten. `from_json` +
    * `select(record.*)` replaces the reference's parse-then-self-join
    * (kinesis-consumer-s3.py:93-107) — no join needed. */
  def parseRecords(raw: DataFrame): DataFrame =
    raw.select(
        col("record_id").cast("string"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("timestamp"),
        from_json(col("payload"), payloadSchema).as("tw"))
      .select(col("record_id"), col("timestamp"), col("tw.*"))

  /** F3/F4: the listener-side predicates that survive into the engine
    * (popularity threshold, non-empty hashtags/text —
    * stream_listener.py:59). F1/F2 (retweet-only, lang=en) act on fields
    * the producer never forwards, so they stay upstream. */
  val listenerFilter: Column =
    col("rt_count") > 99 && col("hashtags") =!= "" && col("text") =!= ""

  /** §2.9 watermark + cross-batch dedup: the reference handles late data
    * with an N-hour lookback re-scan plus within-batch dedup — exactly
    * Spark's watermark + dropDuplicatesWithinWatermark pattern, but with
    * state, so duplicates are dropped across batches too. */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, horizonHours: Int,
                           keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, s"$horizonHours hours")
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Ingest sink: landing CSV partitioned by ingest date, exactly-once
    * via checkpoint, drained with AvailableNow (one scheduled run =
    * one drain, like the reference's RUN_SECONDS poll loop). */
  def ingestToLanding(parsed: DataFrame, landingRoot: String,
                      checkpoint: String): StreamingQuery = {
    val withDate = parsed
      .withColumn("__ts", to_timestamp(col("timestamp"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("year", year(col("__ts")))
      .withColumn("month", month(col("__ts")))
      .withColumn("day", dayofmonth(col("__ts")))
      .drop("__ts")
    withDate.writeStream
      .format("csv")
      .option("header", "false")
      .option("path", landingRoot)
      .option("checkpointLocation", checkpoint)
      .partitionBy("year", "month", "day")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  // ------------------------------------------------------- window exemplars

  /** Tumbling window aggregate (works on both batch and streaming DFs). */
  def tumblingCounts(df: DataFrame, tsCol: String, width: String): DataFrame =
    df.groupBy(window(col(tsCol), width).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"), col("n"))

  /** Sliding window aggregate. */
  def slidingCounts(df: DataFrame, tsCol: String, width: String, slide: String): DataFrame =
    df.groupBy(window(col(tsCol), width, slide).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"), col("n"))

  /** Session window aggregate (gap-based). */
  def sessionCounts(df: DataFrame, tsCol: String, keyCol: String, gap: String): DataFrame =
    df.groupBy(col(keyCol), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n"))

  /** Streaming watermarked tumbling aggregate — the shape a production
    * hashtag-popularity dashboard feed would use. */
  def streamingHourlyCounts(stream: DataFrame, tsCol: String,
                            horizonHours: Int): DataFrame =
    stream
      .withColumn("__ts", to_timestamp(col(tsCol), "yyyy-MM-dd HH:mm:ss"))
      .withWatermark("__ts", s"$horizonHours hours")
      .groupBy(window(col("__ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("n"))
}
