package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.KmvAggregator._
import graft.zones.Zones

/** Streaming rolling-distinct-actives: the q113 sketch-merge shape kept
  * incrementally current by a stream — per micro-batch, the arriving
  * events collapse to per-day partial KMV sketches (one bounded
  * ≤k-long row per day per batch) that APPEND to a standing sketch
  * table; a rolling window query then merges the table's per-day rows,
  * never re-reading an event. The DedupStream protocol applied to the
  * sketch modality:
  *
  *  - **append, don't merge, per batch**: the per-batch write is a blind
  *    append of partial sketches — no read-modify-write of the standing
  *    table inside the hot path. Rows per day grow with batch count,
  *    bounded by the compaction trigger below.
  *  - **replay is idempotent BY ALGEBRA**: a crash-replayed batch
  *    re-appends duplicate partial sketches, and the KMV merge
  *    (k smallest DISTINCT hashes) absorbs duplicates exactly — no
  *    idempotency ledger, no anti-join, no crash window at all. This is
  *    the property that makes sketch tables the easiest streaming state
  *    to operate: [[KmvStreamSpec]] proves drain → duplicate-replay →
  *    identical estimates.
  *  - **compaction**: when the table's file count passes the trigger,
  *    rows merge to ONE sketch row per day (explode + re-aggregate —
  *    lossless, the q113 merge property) through the backup-keeping
  *    swap: the sketch table is the source of truth once the raw events
  *    age out, so the swap never leaves zero copies on disk, and [[run]]
  *    repairs a mid-swap crash at startup.
  *
  * At 100 TB cadence the numbers: k=256 longs ≈ 2 KB per day per batch;
  * a year of hourly batches is ~18 MB per year uncompacted, one 2 KB
  * row per day after compaction — the standing state for "distinct
  * actives over any trailing window, any day" is effectively free.
  */
object KmvStream {

  /** @param eventStream streaming DF carrying `tsCol` + `keyCol`
    * @param sketchPath  standing per-day partial-sketch table
    *                    `(dt, mins)`; may not exist yet
    * @param compactAfterFiles when > 0, merge to one row per day when
    *                    the table's file count reaches this. 0 disables.
    * @param k           sketch capacity (must match across runs)
    * @return the started query (AvailableNow: drains and stops) */
  def run(spark: SparkSession, eventStream: DataFrame, sketchPath: String,
          checkpoint: String, tsCol: String = "ts", keyCol: String = "user_id",
          k: Int = 256, compactAfterFiles: Int = 0): StreamingQuery = {
    require(compactAfterFiles >= 0,
      s"compactAfterFiles must be >= 0: $compactAfterFiles")
    Zones.recoverBackup(spark, sketchPath)
    eventStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val partial = batch
          .select(to_date(col(tsCol)).as("dt"), kmvHash(col(keyCol)).as("h"))
          .groupBy(col("dt"))
          .agg(kmv(k)(col("h")).as("mins"))
        partial.write.mode("append").parquet(sketchPath)
        if (compactAfterFiles > 0 &&
            Zones.dataFileCount(spark, sketchPath) >= compactAfterFiles)
          Zones.replaceKeepingBackup(spark, sketchPath) { tmp =>
            mergedDaily(spark.read.parquet(sketchPath), k)
              .coalesce(1).write.parquet(tmp)
          }
        ()
      }
      .start()
  }

  /** One merged sketch row per day from a table of per-batch partials —
    * lossless (per-day k-minima of partials are the k-minima of the
    * union; duplicates from replays collapse in the distinct merge). */
  def mergedDaily(sketches: DataFrame, k: Int = 256): DataFrame =
    sketches.select(col("dt"), explode(col("mins")).as("h"))
      .groupBy(col("dt"))
      .agg(kmv(k)(col("h")).as("mins"))

  /** The q113 surface over the standing table: rolling `windowDays`
    * distinct-actives estimate per day, touching only sketch rows. */
  def rollingActive(sketches: DataFrame, windowDays: Int = 7,
                    k: Int = 256): DataFrame = {
    val daily = mergedDaily(sketches, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val days = daily.select(col("dt"))
    days.join(daily.select(col("dt").as("adt"), col("mins")),
        datediff(col("dt"), col("adt")).between(0, windowDays - 1))
      .select(col("dt"), explode(col("mins")).as("h"))
      .groupBy(col("dt"))
      .agg(kmv(k)(col("h")).as("mins"))
      .select(date_format(col("dt"), "yyyy-MM-dd").as("day"),
        kmvEstimate(col("mins"), k).as("active_est"))
      .orderBy(col("day"))
  }
}
