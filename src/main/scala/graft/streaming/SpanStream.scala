package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.SpanDedup
import graft.zones.Zones

/** Streaming incremental substring-span detection — the span family's
  * streaming member (batch q121, scrub q128, standing probe q127).
  * Each micro-batch's documents are scored against the standing
  * GRAM-EXISTENCE table with [[SpanDedup.incrementalSpanStats]]'
  * asymmetric rule (any gram the corpus has seen marks every batch
  * occurrence; batch-internal repeats keep their batch-first copy),
  * the per-doc span stats append to the result sink, and the batch's
  * distinct gram hashes append to the standing table.
  *
  * Replay protocol — SINK-AS-LEDGER, a distinct point on the stream
  * spectrum (CMS: batch-id ledger; KMV/sample: union idempotence; HLL:
  * monotone max): a document's stats row is IMMUTABLE once written.
  * The batch body orders sink-before-grams — stats append (anti-joined
  * on doc_id against the sink) strictly before the gram append — so a
  * gram append can only exist for a batch whose sink rows committed.
  * A crash-replayed batch therefore recomputes its stats against a
  * standing table that may already contain its own grams — a DIFFERENT
  * answer — but those rows can never land: the doc-id anti-join
  * discards them and the sink keeps the original, consistent rows.
  * Batch ids are deliberately NOT part of the protocol: they are only
  * monotonic within one checkpoint lineage, and the standing table
  * outlives checkpoints (new streams legitimately share it).
  *
  * Gram existence is a set, so duplicate appends from replays are
  * harmless (existence is union-idempotent) and compaction is a plain
  * distinct-collapse through the backup-keeping swap (the standing
  * table is a source of truth once raw batches age out — the swap
  * never leaves zero copies on disk).
  *
  * 100 TB shape: per batch, the standing table is filtered by a
  * broadcast of the batch's gram hashes before any exchange (the q127
  * probe plan — the corpus is never re-tokenized), and the per-batch
  * append is the batch's gram VOCABULARY (distinct hashes, not
  * occurrences). */
object SpanStream {

  /** @param docStream streaming DF carrying `doc_id` (globally unique
    *                  across the stream) + `textCol`
    * @param gramPath  standing gram table `(hv)`; may not exist yet
    * @param outPath   per-doc span-stats sink (q121 schema)
    * @param l         gram length (must match across runs)
    * @param compactAfterFiles when > 0, collapse the gram table to one
    *                  row per hash when its file count reaches this. */
  def run(spark: SparkSession, docStream: DataFrame, gramPath: String,
          outPath: String, checkpoint: String, textCol: String = "text",
          l: Int = 4, compactAfterFiles: Int = 0): StreamingQuery = {
    require(compactAfterFiles >= 0,
      s"compactAfterFiles must be >= 0: $compactAfterFiles")
    Zones.recoverBackup(spark, gramPath)
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val standing =
          if (Zones.pathExists(s, gramPath))
            s.read.parquet(gramPath).select(col("hv"), lit(1L).as("cnt"))
          else s.range(0).select(col("id").as("hv"), col("id").as("cnt"))
        val stats = SpanDedup.incrementalSpanStats(
          batch, "doc_id", textCol, l, standing)
        val fresh =
          if (Zones.pathExists(s, outPath))
            stats.join(s.read.parquet(outPath).select(col("doc_id")),
              Seq("doc_id"), "left_anti")
          else stats
        // ORDER IS THE PROTOCOL: sink commit strictly before the gram
        // append — see the scaladoc's replay argument
        fresh.write.mode("append").parquet(outPath)
        SpanDedup.buildGramStats(batch, "doc_id", textCol, l)
          .select(col("hv"))
          .write.mode("append").parquet(gramPath)
        if (compactAfterFiles > 0 &&
            Zones.dataFileCount(s, gramPath) >= compactAfterFiles)
          Zones.replaceKeepingBackup(s, gramPath) { tmp =>
            s.read.parquet(gramPath).distinct()
              .coalesce(1).write.parquet(tmp)
          }
        ()
      }
      .start()
  }
}
