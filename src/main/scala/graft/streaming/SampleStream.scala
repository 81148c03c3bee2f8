package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.SampleSketch
import graft.zones.Zones

/** Streaming bottom-k quantile sample: the q115 distribution sketch kept
  * incrementally current by a stream — completing the streaming twins of
  * the mergeable-sketch family (KmvStream = distinct, CmsStream =
  * frequency, THIS = distribution shape). Per micro-batch, arriving rows
  * collapse to a per-group bottom-k partial sample (≤ k rows per group
  * per batch) that APPENDs to a standing sample table; the quantile
  * surface re-cuts the merged sample, never re-reading an event.
  *
  * Protocol position between its two siblings: like KMV — and unlike
  * Count-Min — replay is idempotent WITHOUT provenance, but by a
  * slightly different algebra: the bottom-k merge does not collapse
  * duplicates on its own (two copies of the same row would take two
  * ranks and push a legitimate row out), yet every sampled row carries
  * its unique source key, so an exact `dropDuplicates` on (group, key)
  * BEFORE the cut restores idempotence — dedup on a unique key is the
  * one extra step, and it needs no batch-id ledger because the key IS
  * the provenance. [[SampleStreamSpec]] proves drain → duplicate-replay
  * → identical samples and quantiles.
  *
  * Mergeability is exact: bottom-k of a union is the bottom-k of the
  * parts' bottom-k samples, so per-batch partials lose nothing.
  * Compaction (file-count trigger) rewrites the table to exactly the
  * merged ≤ k rows per group through the backup-keeping swap — the
  * sample table is the source of truth once raw events age out, so the
  * swap never leaves zero copies on disk.
  *
  * At 100 TB cadence: k = 512 rows ≈ 20 KB per group per batch; after
  * compaction the standing state for "any quantile of the full history,
  * per group" is ≤ k rows per group, total — and the per-batch work
  * never shuffles more than k rows per group per task (the q115
  * WindowGroupLimit shape inside each micro-batch).
  */
object SampleStream {

  /** @param eventStream streaming DF carrying `groupCol` + unique
    *                     `keyCol` + numeric `valueCol`
    * @param samplePath   standing sample table (group, key, value)
    * @param compactAfterFiles when > 0, rewrite to the merged ≤ k rows
    *                     per group when the file count reaches this.
    * @return the started query (AvailableNow: drains and stops) */
  def run(spark: SparkSession, eventStream: DataFrame, samplePath: String,
          checkpoint: String, groupCol: String = "event_type",
          keyCol: String = "event_id", valueCol: String = "value",
          k: Int = 512, compactAfterFiles: Int = 0): StreamingQuery = {
    require(compactAfterFiles >= 0,
      s"compactAfterFiles must be >= 0: $compactAfterFiles")
    Zones.recoverBackup(spark, samplePath)
    eventStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch
          .select(col(groupCol), col(keyCol), col(valueCol))
          .filter(col(valueCol).isNotNull)
        SampleSketch.bottomK(rows, Seq(groupCol), col(keyCol), k)
          .write.mode("append").parquet(samplePath)
        if (compactAfterFiles > 0 &&
            Zones.dataFileCount(spark, samplePath) >= compactAfterFiles)
          Zones.replaceKeepingBackup(spark, samplePath) { tmp =>
            merged(spark.read.parquet(samplePath), groupCol, keyCol, k)
              .coalesce(1).write.parquet(tmp)
          }
        ()
      }
      .start()
  }

  /** The merged ≤ k-row-per-group sample from a table of per-batch
    * partials: exact-dedup on the unique key (replayed appends collapse
    * here — the key is the provenance), then one bottom-k cut (lossless:
    * bottom-k of a union is bottom-k of the parts' bottom-k). */
  def merged(samples: DataFrame, groupCol: String = "event_type",
             keyCol: String = "event_id", k: Int = 512): DataFrame =
    SampleSketch.bottomK(samples.dropDuplicates(groupCol, keyCol),
      Seq(groupCol), col(keyCol), k)

  /** The q115 quantile surface over the standing table: p50/p90
    * estimates per group, touching only sample rows. */
  def quantiles(samples: DataFrame, groupCol: String = "event_type",
                keyCol: String = "event_id", valueCol: String = "value",
                k: Int = 512): DataFrame =
    merged(samples, groupCol, keyCol, k)
      .groupBy(col(groupCol)).agg(
        expr(s"percentile($valueCol, 0.5)").as("p50_est"),
        expr(s"percentile($valueCol, 0.9)").as("p90_est"))
      .orderBy(col(groupCol))
}
