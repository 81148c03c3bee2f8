package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup
import graft.zones.Zones

/** Continuous-ingest near-dup dedup: each arriving micro-batch of
  * documents is deduped within itself ([[Dedup.minhashDedup]]) and then
  * against the standing corpus's MinHash signature table
  * ([[Dedup.incrementalDedup]]); survivors land in the survivor sink and
  * — when `growCorpus` — their signatures append to the signature table,
  * so later batches also dedup against earlier accepted data. The
  * standing corpus is only ever touched through its signature table:
  * corpus TEXT is read zero times per batch, which is what makes the
  * loop viable against a 100 TB history.
  *
  * Same `foreachBatch` integration as [[StreamingEtl]]: inside the batch
  * the exact batch-mode operators (and their oracles/tests) run
  * unchanged — one dedup definition, two execution modes.
  *
  * Replay semantics: a micro-batch replayed after a crash re-appends its
  * survivors' signatures; duplicate signature rows are harmless for
  * correctness (a doc matching one copy matches all copies) and the
  * survivor sink stays exact when `idempotent` anti-joins replayed ids.
  * That anti-join scans the sink's id column per batch (column-pruned —
  * a narrow parquet read, not the payloads); for very long sink
  * histories swap it for a bounded replay ledger keyed on batch id.
  */
object DedupStream {

  /** @param docStream streaming DF carrying `idCol` + `textCol`
    * @param sigPath   parquet dir of [[Dedup.minhashSignatures]] rows —
    *                  may not exist yet (bootstraps on first batch)
    * @param outPath   survivor sink (parquet, batch schema)
    * @return the started query (AvailableNow: drains and stops) */
  def run(spark: SparkSession, docStream: DataFrame, sigPath: String,
          outPath: String, checkpoint: String,
          idCol: String = "doc_id", textCol: String = "text",
          shingleSize: Int = 5, k: Int = 128, bands: Int = 16,
          threshold: Double = 0.8, growCorpus: Boolean = true,
          idempotent: Boolean = true): StreamingQuery = {
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the batch feeds banding + verify + anti-join; cache it so
        // arriving text is scanned once per micro-batch
        val cached = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val within = Dedup.minhashDedup(cached, idCol, textCol,
          shingleSize, k, bands, threshold)
        val vsCorpus =
          if (Zones.pathExists(spark, sigPath)) {
            val sigs = spark.read.parquet(sigPath)
            Dedup.incrementalDedup(within, idCol, textCol, sigs,
              shingleSize, k, bands, threshold)
          } else within
        val survivors0 =
          if (idempotent && Zones.pathExists(spark, outPath)) {
            val seen = spark.read.parquet(outPath).select(col(idCol))
            vsCorpus.join(seen, Seq(idCol), "left_anti")
          } else vsCorpus
        // EAGER checkpoint, not persist: the appends below write to the
        // very paths the survivor plan reads (outPath via the idempotency
        // anti-join, sigPath via the corpus join), and Spark invalidates
        // cached plans that reference a written path — a persisted
        // survivors would be recomputed against the just-appended sink
        // and the signature append would see itself filtered to nothing.
        // Checkpointing truncates the lineage so neither append can
        // invalidate it. (The checkpoint RDD is freed by ContextCleaner
        // when the batch's references drop.)
        val survivors = survivors0.localCheckpoint()
        try {
          if (survivors.count() > 0) {
            survivors.write.mode("append").parquet(outPath)
            if (growCorpus)
              Dedup.minhashSignatures(survivors, idCol, textCol, shingleSize, k)
                .write.mode("append").parquet(sigPath)
          }
        } finally cached.unpersist()
        ()
      }
      .start()
  }
}
