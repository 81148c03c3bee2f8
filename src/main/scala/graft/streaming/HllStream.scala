package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.{Hll, KmvAggregator}
import graft.zones.Zones

/** Streaming rolling-distinct-actives on HyperLogLog registers — the
  * q116 sketch kept current by a stream, and the END of the streaming
  * sketch-protocol spectrum the family documents:
  *
  *   - Count-Min (CmsStream): sum-merge — NOT idempotent, needs batch-id
  *     provenance to collapse replays;
  *   - KMV (KmvStream) / bottom-k sample (SampleStream): set-union-merge
  *     — idempotent for exact duplicates (KMV by distinct hashes, the
  *     sample after a key dedup);
  *   - HLL (THIS): elementwise MAX-merge — idempotent, commutative,
  *     associative, AND monotone. Not just duplicate appends: ANY
  *     re-aggregation of any subset of past data collapses (max of a
  *     part never exceeds max of the whole), so a replay that re-binned
  *     events differently across batches — the case that would corrupt
  *     a ledger-free sum and is merely tolerated by set-union — is
  *     harmless BY ALGEBRA. The weakest merge requirements of the
  *     family, which is exactly why register sketches are the default
  *     distinct-state for always-on pipelines.
  *
  * Per micro-batch: arriving events collapse to per-day register
  * vectors ((48−p+1 max-rank construction of [[graft.functions
  * .HllAggregator]]) — one m-int row per day per batch — appended to a
  * standing sketch table. The rolling surface merges registers by
  * (day, bucket) max, never re-reading an event. Compaction rewrites to
  * one row per day through the backup-keeping swap.
  *
  * State arithmetic at 100 TB cadence: m = 2^p bytes of true state per
  * day (the int-array parquet rows are wider but compact to one row per
  * day); a year of days at p = 12 is ~1.5 MB for "distinct actives over
  * any trailing window, any day, ±1.04/√4096".
  */
object HllStream {

  /** @param eventStream streaming DF carrying `tsCol` + `keyCol`
    * @param sketchPath  standing per-day register table `(dt, regs)`
    * @param compactAfterFiles when > 0, merge to one row per day when
    *                    the table's file count reaches this. 0 disables.
    * @return the started query (AvailableNow: drains and stops) */
  def run(spark: SparkSession, eventStream: DataFrame, sketchPath: String,
          checkpoint: String, tsCol: String = "ts", keyCol: String = "user_id",
          p: Int = 6, compactAfterFiles: Int = 0): StreamingQuery = {
    require(compactAfterFiles >= 0,
      s"compactAfterFiles must be >= 0: $compactAfterFiles")
    Zones.recoverBackup(spark, sketchPath)
    eventStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch
          .select(to_date(col(tsCol)).as("dt"),
            KmvAggregator.kmvHash(col(keyCol)).as("h"))
          .groupBy(col("dt"))
          .agg(Hll.hll(p)(col("h")).as("regs"))
          .write.mode("append").parquet(sketchPath)
        if (compactAfterFiles > 0 &&
            Zones.dataFileCount(spark, sketchPath) >= compactAfterFiles)
          Zones.replaceKeepingBackup(spark, sketchPath) { tmp =>
            mergedDaily(spark.read.parquet(sketchPath))
              .coalesce(1).write.parquet(tmp)
          }
        ()
      }
      .start()
  }

  /** One merged register row per day: elementwise max over the day's
    * partial vectors — lossless, idempotent, subset-replay-safe. */
  def mergedDaily(sketches: DataFrame): DataFrame =
    sketches.select(col("dt"), posexplode(col("regs")))
      .toDF("dt", "pos", "reg")
      .groupBy(col("dt"), col("pos")).agg(max(col("reg")).as("reg"))
      .groupBy(col("dt"))
      .agg(array_sort(collect_list(struct(col("pos"), col("reg"))))
        .as("packed"))
      .select(col("dt"),
        transform(col("packed"), s => s.getField("reg")).as("regs"))

  /** Rolling `windowDays` distinct-actives estimate per day from the
    * standing register table — registers merge by (day-in-window,
    * bucket) max, the estimate is the q116 fixed-point construction
    * with the ln-based small-range correction applied in-engine (this
    * surface is T-gated; the oracle-gated estimate construction lives
    * in q116). */
  def rollingActive(sketches: DataFrame, windowDays: Int = 7,
                    p: Int = 6): DataFrame = {
    val m = 1 << p
    val daily = sketches.select(col("dt"), posexplode(col("regs")))
      .toDF("dt", "pos", "reg")
      .groupBy(col("dt"), col("pos")).agg(max(col("reg")).as("reg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val days = daily.select(col("dt")).distinct()
    val winRegs = days.join(
        daily.select(col("dt").as("adt"), col("pos"), col("reg")),
        datediff(col("dt"), col("adt")).between(0, windowDays - 1))
      .groupBy(col("dt"), col("pos")).agg(max(col("reg")).as("reg"))
    val stats = winRegs.groupBy(col("dt")).agg(
      sum(when(col("reg") === 0, 1L).otherwise(0L)).as("zeros"),
      sum(pow(lit(2.0), lit(48 - p + 1) - col("reg")).cast("long")).as("s"))
    stats
      .withColumn("raw_est", Hll.rawEstimate(col("s"), p))
      .select(date_format(col("dt"), "yyyy-MM-dd").as("day"),
        when(col("raw_est") <= lit(2.5 * m) && col("zeros") > 0,
          Hll.linearCount(col("zeros"), p))
          .otherwise(col("raw_est")).as("active_est"))
      .orderBy(col("day"))
  }
}
