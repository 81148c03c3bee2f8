package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.pipeline.EtlJob
import graft.zones.Zones

/** The reference's TWO state machines (ingest + transform/load,
  * SURVEY.md §3.1–3.2) unified into one streaming pipeline: raw records
  * stream in, each micro-batch runs the full staging transform and lands
  * directly in the analytical zone, with one audit row per batch.
  *
  * `foreachBatch` is the integration point: inside it the batch is a
  * plain DataFrame, so the exact same `EtlJob.stagingTransform` (and its
  * tests) powers both the scheduled-batch and the streaming deployment —
  * one transform definition, two execution modes. Checkpointing makes
  * batch replays idempotent at the sink when paired with the
  * hash_id anti-join (same mechanism as EtlJob's idempotent mode).
  */
object StreamingEtl {

  /** @param rawStream streaming DF of (record_id, ts, payload-JSON)
    * @return the started query (AvailableNow: drains and stops) */
  def run(spark: SparkSession, rawStream: DataFrame,
          analyticalPath: String, logPath: String,
          checkpoint: String, idempotent: Boolean = true): StreamingQuery = {

    val parsed = Ingest.parseRecords(rawStream).filter(Ingest.listenerFilter)

    parsed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // The batch feeds three actions (count, analytical write, max-ts
        // audit). Both frames are cached so the staging transform AND the
        // idempotency anti-join each run exactly once per micro-batch —
        // the first action fills both caches in one pass, the rest read
        // memory. (StreamingEtlSpec pins single evaluation with an
        // accumulator.)
        val staged = EtlJob.stagingTransform(batch)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val toLoad =
          if (idempotent && Zones.pathExists(spark, analyticalPath)) {
            val existing = Zones.readAnalytical(spark, analyticalPath)
              .select(col("hash_id"))
            staged.join(existing, Seq("hash_id"), "left_anti")
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          } else staged
        try {
          val n = toLoad.count()
          if (n > 0) {
            Zones.appendAnalytical(toLoad, analyticalPath)
            // S12 refresh hook: downstream cached readers see this batch
            Zones.refreshAnalytical(spark, analyticalPath)
          }
          // audit partition from the batch's own arrival dates (epoch day
          // for an empty batch), mirroring the reference's run-date stamp
          val maxTs = staged.agg(max(col("time_stamp"))).head()
          val day = if (maxTs.isNullAt(0)) java.time.LocalDate.EPOCH
            else maxTs.getTimestamp(0).toLocalDateTime.toLocalDate
          Zones.appendLog(spark, logPath,
            f"batch_$batchId%05d", "analytical.hashtag_data", n.toInt,
            day.getYear, day.getMonthValue, day.getDayOfMonth)
        } finally {
          toLoad.unpersist()
          staged.unpersist()
        }
        ()
      }
      .start()
  }
}
