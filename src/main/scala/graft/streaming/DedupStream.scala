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
  * With `bandPath` set the probe goes one step further: the corpus LSH
  * band set is materialized once ([[Dedup.writeBandTable]]) and each
  * batch broadcast-probes it ([[Dedup.incrementalDedupBanded]]) — no
  * per-batch corpus band derivation or exchange at all, the measured
  * O(batch) shape from the batch workflow (q104), now kept in sync by
  * the stream itself: survivors' bands append after every signature
  * append, the signature-compaction trigger rebuilds the band table,
  * and startup repairs every crash window because bands are derived
  * data (the signature table is the source of truth).
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
  *
  * The OTHER crash window — survivors committed to the sink but the
  * process dying before their signature append — is NOT closed by
  * replay: the replayed batch's idempotent anti-join filters those
  * survivors out, so their signatures would never be written and future
  * near-dups of them would pass dedup forever. [[run]] repairs this at
  * startup: any sink id absent from the signature table gets its
  * signature re-derived from the sink row and appended before the first
  * batch processes.
  */
object DedupStream {

  /** Sink ids missing from the signature table get their signatures
    * re-derived and appended — the startup repair for the
    * append-gap crash window described above. No-op when the sink does
    * not exist yet or nothing is missing. */
  private def backfillSignatures(spark: SparkSession, sigPath: String,
                                 outPath: String, idCol: String,
                                 textCol: String, shingleSize: Int,
                                 k: Int): Unit = {
    if (!Zones.pathExists(spark, outPath)) return
    val out = spark.read.parquet(outPath)
    val missing =
      if (Zones.pathExists(spark, sigPath))
        out.join(spark.read.parquet(sigPath).select(col("id").as(idCol)),
          Seq(idCol), "left_anti")
      else out
    // eager checkpoint before the append: the plan reads sigPath, and an
    // append to a read path invalidates (and would recompute) it
    val sigs = Dedup.minhashSignatures(missing, idCol, textCol,
      shingleSize, k).localCheckpoint()
    if (sigs.count() > 0) sigs.write.mode("append").parquet(sigPath)
  }

  /** Bring the band table in sync with the signature table at startup:
    * builds it wholesale from the signatures when absent (bootstrap, or
    * a crash mid-rebuild), else appends bands for any signature id the
    * band table is missing — the sig-appended/band-append-died crash
    * window, which replay cannot close for the same reason as the
    * signature gap (the idempotent anti-join hides replayed survivors).
    * Cost is one narrow id-column scan of the band table, paid once at
    * startup, never per batch. */
  private def backfillBands(spark: SparkSession, sigPath: String,
                            bandPath: String, k: Int, bands: Int,
                            fileBuckets: Int): Unit = {
    if (!Zones.pathExists(spark, sigPath)) return
    val sigs = spark.read.parquet(sigPath)
    if (!Zones.pathExists(spark, bandPath)) {
      Dedup.writeBandTable(sigs, bandPath, k, bands, fileBuckets)
    } else {
      // eager checkpoint: the missing-id plan reads bandPath, which the
      // append below writes
      val missing = sigs.join(
          spark.read.parquet(bandPath).select(col("id")).distinct(),
          Seq("id"), "left_anti").localCheckpoint()
      if (missing.count() > 0)
        Dedup.appendBandTable(missing, bandPath, k, bands, fileBuckets)
    }
  }

  /** Rewrite the signature table through the curated sink: per-batch
    * appends accumulate one small file per micro-batch, and a year of
    * micro-batches is millions of files — an ever-slower corpus scan.
    * The signature table is the SOURCE OF TRUTH (backfill re-derives
    * signatures only for ids present in the sink; a pre-seeded corpus
    * never emitted to the sink could not be rebuilt), so the swap keeps
    * a backup copy alive at every instant ([[Zones.replaceKeepingBackup]])
    * and [[run]] closes the mid-swap crash window with
    * [[Zones.recoverBackup]] at startup. */
  private def compactSignatures(spark: SparkSession, sigPath: String,
                                targetFiles: Int): Unit =
    Zones.replaceKeepingBackup(spark, sigPath) { tmp =>
      Zones.writeCurated(
        spark.read.parquet(sigPath).repartition(targetFiles),
        tmp, partitionCols = Seq.empty, sortCols = Seq("id"),
        maxRecordsPerFile = 10000000L, cluster = false)
    }

  /** Rebuild the band table from the (just-compacted) signature table,
    * through the same temp-dir + rename swap. Crash-safe at every point:
    * dying before the rename leaves the old table intact; dying between
    * the delete and the rename leaves no band table, which the startup
    * [[backfillBands]] rebuilds wholesale from the signatures (bands are
    * derived data — the signature table is the source of truth). */
  private def rebuildBandTable(spark: SparkSession, sigPath: String,
                               bandPath: String, k: Int, bands: Int,
                               fileBuckets: Int): Unit =
    Zones.replaceAtomically(spark, bandPath) { tmp =>
      Dedup.writeBandTable(spark.read.parquet(sigPath), tmp,
        k, bands, fileBuckets)
    }

  /** @param docStream streaming DF carrying `idCol` + `textCol`
    * @param sigPath   parquet dir of [[Dedup.minhashSignatures]] rows —
    *                  may not exist yet (bootstraps on first batch)
    * @param outPath   survivor sink (parquet, batch schema)
    * @param compactSigsAfterFiles when > 0, rewrite the signature table
    *                  through the curated sink whenever its file count
    *                  reaches this threshold (checked after each batch's
    *                  append); 0 disables. Compaction changes file
    *                  layout only — dedup results are identical across
    *                  the boundary (DedupStreamSpec proves it). In
    *                  banded mode the same trigger also rebuilds the
    *                  band table from the compacted signatures (its
    *                  per-batch appends accumulate small files at the
    *                  same rate, so one trigger serves both).
    * @param compactSinkAfterFiles when > 0, rewrite the survivor sink
    *                  (sorted by id, curated file sizes) whenever its
    *                  file count reaches this threshold — the per-batch
    *                  appends otherwise grow the sink's file count
    *                  without bound at production cadence (the next
    *                  small-files problem after the signature table).
    *                  The sink is primary output (nothing else holds the
    *                  survivor payloads), so the swap keeps a backup
    *                  copy alive at every instant and [[run]] repairs a
    *                  mid-swap crash at startup. Layout-only: sink
    *                  content, idempotent replay decisions, and dedup
    *                  results are identical across the boundary
    *                  (DedupStreamSpec proves it). 0 disables.
    * @param bandPath  when set, the corpus probe runs against a
    *                  materialized [[Dedup.writeBandTable]] band table
    *                  at this path instead of re-deriving (and
    *                  re-shuffling) the corpus band set from `sigPath`
    *                  every batch — per-batch corpus cost drops from
    *                  O(corpus) to the banded probe's O(batch) shape,
    *                  which is what survives a standing 100 TB corpus
    *                  with micro-batch arrivals. The table is built from
    *                  the signature table at startup if absent and kept
    *                  in sync per batch ([[Dedup.appendBandTable]] after
    *                  each signature append); every crash window is
    *                  repaired at startup because bands are derived
    *                  data — signatures remain the source of truth.
    * @param fileBuckets band-table disk-partition count (banded mode
    *                  only); must match across runs on the same table.
    * @return the started query (AvailableNow: drains and stops) */
  def run(spark: SparkSession, docStream: DataFrame, sigPath: String,
          outPath: String, checkpoint: String,
          idCol: String = "doc_id", textCol: String = "text",
          shingleSize: Int = 5, k: Int = 128, bands: Int = 16,
          threshold: Double = 0.8, growCorpus: Boolean = true,
          idempotent: Boolean = true,
          compactSigsAfterFiles: Int = 0,
          compactSinkAfterFiles: Int = 0,
          bandPath: Option[String] = None,
          fileBuckets: Int = 64): StreamingQuery = {
    require(compactSigsAfterFiles >= 0,
      s"compactSigsAfterFiles must be >= 0: $compactSigsAfterFiles")
    require(compactSinkAfterFiles >= 0,
      s"compactSinkAfterFiles must be >= 0: $compactSinkAfterFiles")
    repairAtStartup(spark, sigPath, outPath, idCol, textCol, shingleSize,
      k, bands, growCorpus, bandPath, fileBuckets)
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(spark, batch, sigPath, outPath, idCol, textCol,
          shingleSize, k, bands, threshold, growCorpus, idempotent,
          compactSigsAfterFiles, compactSinkAfterFiles, bandPath,
          fileBuckets)
        ()
      }
      .start()
  }

  /** Crash-window repair shared by every drain protocol riding this
    * stream ([[run]], [[CrawlStream.run]]): backup-swap recovery for the
    * two rewritten tables, the survivors-committed/signatures-missing
    * backfill, and the band-table sync — all BEFORE the first batch. */
  private[streaming] def repairAtStartup(spark: SparkSession,
      sigPath: String, outPath: String, idCol: String, textCol: String,
      shingleSize: Int, k: Int, bands: Int, growCorpus: Boolean,
      bandPath: Option[String], fileBuckets: Int): Unit = {
    // restore the signature table first if a compaction swap died between
    // its two renames (source-of-truth table: backup swap, not
    // delete-then-rename), then repair the derived/sink gaps below;
    // the sink gets the same treatment BEFORE the backfills read it
    Zones.recoverBackup(spark, sigPath)
    Zones.recoverBackup(spark, outPath)
    // repair the survivors-committed / signatures-missing crash window
    // before any batch runs (replay cannot: the idempotent anti-join
    // hides replayed survivors from the signature append), then bring
    // the band table in sync with the repaired signatures
    if (growCorpus)
      backfillSignatures(spark, sigPath, outPath, idCol, textCol,
        shingleSize, k)
    bandPath.foreach(bp =>
      backfillBands(spark, sigPath, bp, k, bands, fileBuckets))
  }

  /** One micro-batch of the dedup-ingest protocol: within-batch dedup →
    * standing-corpus probe → idempotent sink append → signature/band
    * growth → compaction triggers. Factored out so other foreachBatch
    * drains (the crawl-ingest stream) ride the exact same protocol —
    * and the same crash-window guarantees DedupStreamSpec gates. */
  private[streaming] def processBatch(spark: SparkSession,
      batch: DataFrame, sigPath: String, outPath: String, idCol: String,
      textCol: String, shingleSize: Int, k: Int, bands: Int,
      threshold: Double, growCorpus: Boolean, idempotent: Boolean,
      compactSigsAfterFiles: Int, compactSinkAfterFiles: Int,
      bandPath: Option[String], fileBuckets: Int): Unit = {
    {
        // the batch feeds banding + verify + anti-join; cache it so
        // arriving text is scanned once per micro-batch
        val cached = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // persistShingles/persistBatch = false throughout: the batch is
        // already persisted as `cached`, and the operators' own persists
        // would register a cached projection per micro-batch that
        // nothing unpersists (the leak ADVICE r7 flagged on the
        // embedding stream exists identically here)
        val within = Dedup.minhashDedup(cached, idCol, textCol,
          shingleSize, k, bands, threshold, persistShingles = false)
        val vsCorpus =
          if (Zones.pathExists(spark, sigPath)) {
            val sigs = spark.read.parquet(sigPath)
            bandPath match {
              case Some(bp) if Zones.pathExists(spark, bp) =>
                Dedup.incrementalDedupBanded(within, idCol, textCol,
                  spark.read.parquet(bp), sigs, shingleSize, k, bands,
                  threshold, fileBuckets, persistBatch = false)
              case _ =>
                Dedup.incrementalDedup(within, idCol, textCol, sigs,
                  shingleSize, k, bands, threshold, persistBatch = false)
            }
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
            if (growCorpus) {
              // survivors is checkpointed, so deriving signatures twice
              // (sig append + band append) re-runs only the minhash
              // projection over the small batch, never upstream reads
              val newSigs = Dedup.minhashSignatures(survivors, idCol,
                textCol, shingleSize, k)
              newSigs.write.mode("append").parquet(sigPath)
              bandPath.foreach(bp =>
                Dedup.appendBandTable(newSigs, bp, k, bands, fileBuckets))
              if (compactSigsAfterFiles > 0 &&
                  Zones.dataFileCount(spark, sigPath) >= compactSigsAfterFiles) {
                compactSignatures(spark, sigPath,
                  targetFiles = spark.sparkContext.defaultParallelism)
                bandPath.foreach(bp =>
                  rebuildBandTable(spark, sigPath, bp, k, bands, fileBuckets))
              }
            }
            // survivor-sink compaction rides its own trigger: the sink
            // gains exactly one file run per batch regardless of
            // growCorpus, and nothing downstream derives from layout
            if (compactSinkAfterFiles > 0 &&
                Zones.dataFileCount(spark, outPath) >= compactSinkAfterFiles)
              Zones.replaceKeepingBackup(spark, outPath) { tmp =>
                Zones.writeCurated(
                  spark.read.parquet(outPath)
                    .repartition(spark.sparkContext.defaultParallelism),
                  tmp, partitionCols = Seq.empty, sortCols = Seq(idCol),
                  maxRecordsPerFile = 10000000L, cluster = false)
              }
          }
        } finally cached.unpersist()
    }
  }
}
