package graft

import org.apache.spark.sql.types._

/** StructType registry for the four zone tables (SURVEY.md §1.1,
  * FIXTURES.md B.2–B.5). Replaces the reference's runtime Glue Catalog
  * lookups (staging-transform.py:64-94) with compile-time constants —
  * schema is external and fixed, never inferred.
  */
object Schemas {

  /** Landing zone: header-less CSV written by the stream consumer
    * (kinesis-consumer-s3.py:93-120). `record_id` is an explicit column —
    * the reference's leaked pandas index is an artifact, not a semantic
    * (SURVEY.md S7). Timestamps stay strings in flight, exactly like the
    * CSV the consumer writes; staging parses them.
    */
  val landing: StructType = StructType(Seq(
    StructField("record_id", StringType),
    StructField("timestamp", StringType),   // arrival time, "yyyy-MM-dd HH:mm:ss"
    StructField("created", StringType),     // tweet creation time
    StructField("tweet_id", StringType),
    StructField("user_name", StringType),
    StructField("rt_count", IntegerType),
    StructField("hashtags", StringType),    // space-joined
    StructField("text", StringType),
  ))

  /** Staging: CSV table `staging.hashtags_proc`
    * (create_hashtags_proc.hql:1-23); partition values stored as ordinary
    * trailing columns. */
  val staging: StructType = StructType(Seq(
    StructField("hash_id", StringType),
    StructField("record_id", StringType),
    StructField("time_stamp", TimestampType),
    StructField("created", TimestampType),
    StructField("tweet_id", StringType),
    StructField("user_name", StringType),
    StructField("rt_count", IntegerType),
    StructField("hashtag", StringType),
    StructField("polarity", FloatType),
    StructField("subjectivity", FloatType),
    StructField("text", StringType),
    StructField("year", IntegerType),
    StructField("month", IntegerType),
    StructField("day", IntegerType),
  ))

  /** Analytical: ORC table `analytical.hashtag_data`, PARTITIONED BY
    * (year, month, day) (create_hashtags_data.hql:1-24). Staging's `text`
    * lands in `text_clean` positionally (SURVEY.md J3). */
  val analytical: StructType = StructType(Seq(
    StructField("hash_id", StringType),
    StructField("record_id", StringType),
    StructField("time_stamp", TimestampType),
    StructField("created", TimestampType),
    StructField("tweet_id", StringType),
    StructField("user_name", StringType),
    StructField("rt_count", IntegerType),
    StructField("hashtag", StringType),
    StructField("polarity", FloatType),
    StructField("subjectivity", FloatType),
    StructField("text_clean", StringType),
    StructField("year", IntegerType),
    StructField("month", IntegerType),
    StructField("day", IntegerType),
  ))

  /** Operational audit log `operational.data_update_log`
    * (create_update_log.hql:1-16); `time_stamp` is a STRING there —
    * reference quirk preserved because consumers read it as text. */
  val updateLog: StructType = StructType(Seq(
    StructField("time_stamp", StringType),
    StructField("table_name", StringType),
    StructField("records_inserted", IntegerType),
    StructField("year", IntegerType),
    StructField("month", IntegerType),
    StructField("day", IntegerType),
  ))
}
