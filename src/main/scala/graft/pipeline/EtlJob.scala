package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Schemas
import graft.functions.{Sentiment, TextFunctions}
import graft.zones.Zones

/** The reference's transform+load state machine
  * (`LandingAnalyticalStateMachine`, SURVEY.md §3.2) as one Spark driver
  * program: landing CSV → staging transform → staging CSV (overwrite) →
  * audit row → analytical ORC append (gated on non-empty) → audit row.
  *
  * Control flow that was five Lambdas + Step Functions JSONPath plumbing
  * is now function composition; the audit-record side channel is a
  * returned case class. Stage order inside [[stagingTransform]] follows
  * staging-transform.py:227-256 exactly (casts → timestamps → clean →
  * sentiment → hashtag clean/split/explode → drop-empty → surrogate key →
  * dedup → partition cols → conforming projection).
  */
object EtlJob {

  /** Audit record (update-data-log.py:17-19 shape). */
  final case class LogRecord(timeStamp: String, tableName: String,
                             recordsInserted: Long, year: Int, month: Int, day: Int)

  final case class RunResult(stagingLog: LogRecord, analyticalLog: Option[LogRecord])

  /** The staging transform (ProcessDataToStaging). `runTime` is passed in
    * for determinism — the reference threads `record_time` the same way
    * (staging-transform.py:216,:258); no current_timestamp() in the data
    * path. Partition columns derive from the ARRIVAL timestamp, not
    * `created` (staging-transform.py:195-205,:250-252).
    */
  def stagingTransform(landing: DataFrame): DataFrame = {
    val s = Sentiment.sentiment(col("text_clean"))
    landing
      .withColumn("time_stamp", to_timestamp(col("timestamp"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("created_ts", to_timestamp(col("created"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("text_clean", TextFunctions.cleanTweet(col("text")))
      .withColumn("polarity", s.getField("polarity").cast("float"))
      .withColumn("subjectivity", s.getField("subjectivity").cast("float"))
      .withColumn("hashtag",
        explode(TextFunctions.tokens(TextFunctions.cleanHashtags(col("hashtags")))))
      .filter(col("hashtag") =!= "")
      .withColumn("hash_id", TextFunctions.surrogateKey(
        col("record_id"), col("tweet_id"), col("hashtag")))
      .dropDuplicates("hash_id")
      .withColumn("year", year(col("time_stamp")))
      .withColumn("month", month(col("time_stamp")))
      .withColumn("day", dayofmonth(col("time_stamp")))
      .select(
        col("hash_id"), col("record_id"), col("time_stamp"),
        col("created_ts").as("created"), col("tweet_id"), col("user_name"),
        col("rt_count"), col("hashtag"), col("polarity"), col("subjectivity"),
        col("text_clean").as("text"), col("year"), col("month"), col("day"))
  }

  /** Full run for one landing day. Mirrors the state machine:
    * DeleteStagingOld+ProcessDataToStaging (overwrite), RunUpdateLog,
    * LoadToAnalytical gated on count>0 (F7), RunUpdateLog again.
    *
    * `idempotent = true` anti-joins on hash_id against the existing
    * analytical table before appending, making re-runs of the same
    * lookback window exact no-ops — the reference's within-batch dedup
    * allows cross-run duplicates (SURVEY.md §2.9 "stateful ops"); this is
    * the strictly-stronger variant.
    */
  def run(spark: SparkSession, landingRoot: String, stagingPath: String,
          analyticalPath: String, logPath: String,
          year: Int, month: Int, day: Int, runTime: String,
          idempotent: Boolean = false): RunResult = {

    val landing = Zones.readLandingDay(spark, landingRoot, year, month, day)
    val staged = stagingTransform(landing)
    // the staging row count rides the write's own execution (observe →
    // CollectMetrics) instead of a second pass over the transform
    val nStaged = Observe.countedAction(spark, staged, "graft_staging_write") {
      Zones.writeStaging(_, stagingPath)
    }

    val stagedBack = Zones.readStaging(spark, stagingPath)
    Zones.appendLog(spark, logPath, runTime, "staging.hashtags_proc",
      nStaged.toInt, year, month, day)
    val stagingLog = LogRecord(runTime, "staging.hashtags_proc", nStaged, year, month, day)

    // F7: run the load only when staging is non-empty (COUNT-gate,
    // analytical-transform.py:24,:114-123)
    val analyticalLog = if (nStaged > 0) {
      val toLoad =
        if (idempotent && Zones.pathExists(spark, analyticalPath)) {
          val existing = Zones.readAnalytical(spark, analyticalPath)
            .select(col("hash_id"))
          stagedBack.join(existing, Seq("hash_id"), "left_anti")
        } else stagedBack
      // count the anti-joined load set inside the append itself — the
      // idempotency anti-join (and the CSV re-read under it) runs once
      val n = Observe.countedAction(spark, toLoad, "graft_analytical_load") {
        Zones.appendAnalytical(_, analyticalPath)
      }
      // S12: invalidate cached plans/listings over the table we just
      // appended to (the reference's UpdateQuicksight BI-refresh slot)
      Zones.refreshAnalytical(spark, analyticalPath)
      Zones.appendLog(spark, logPath, runTime, "analytical.hashtag_data",
        n.toInt, year, month, day)
      Some(LogRecord(runTime, "analytical.hashtag_data", n, year, month, day))
    } else None

    RunResult(stagingLog, analyticalLog)
  }
}
