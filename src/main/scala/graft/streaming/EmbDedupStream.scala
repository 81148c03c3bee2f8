package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Similarity
import graft.zones.Zones

/** Continuous-ingest near-dup dedup for the EMBEDDING modality — the
  * [[DedupStream]] protocol (accept → append source-of-truth → append
  * bands → compaction → startup crash repair) ported to vector data
  * (VERDICT r6 #6).
  *
  * Structure mirrors DedupStream with one simplification that falls out
  * of the modality: for text the source of truth is a DERIVED signature
  * table (minhash over text) that must be recomputed from sink rows
  * during repair; for embeddings the vector itself is the signature, so
  * the standing table at `vecPath` is just `(idCol, vecCol)` and startup
  * repair is a column projection of the sink, never a recompute. Bands
  * remain derived data in both modalities: `bandPath` is rebuilt
  * wholesale from `vecPath` whenever it is absent, and topped up by an
  * id anti-join when it merely lags (the sig-appended/band-append-died
  * crash window, which replay cannot close because the idempotent
  * anti-join hides replayed survivors).
  *
  * Per batch: dedup within the batch ([[Similarity.embeddingNearDupDedup]],
  * smallest-id survivor), then against the corpus — broadcast-probing
  * the materialized band table when `bandPath` is set
  * ([[Similarity.incrementalEmbDedup]]: zero corpus-side exchange, the
  * O(batch) shape from the q108 batch workflow), else deriving the
  * corpus band set in-flight (the O(corpus)-per-batch legacy shape, kept
  * for corpora too small to be worth a standing band table). Survivors
  * land in the sink, then their vectors append to `vecPath`, then their
  * bands to `bandPath` — the same commit order as DedupStream, so every
  * crash window between the three appends is closed by the startup
  * backfills.
  *
  * Replay semantics are DedupStream's verbatim: duplicate vector rows
  * after a replayed append are harmless (matching one copy ≡ matching
  * all), and `idempotent` keeps the sink exact by anti-joining replayed
  * ids against the sink's id column (column-pruned narrow read).
  */
object EmbDedupStream {

  /** Sink ids missing from the vector table get their vector rows
    * projected back and appended — the startup repair for the
    * survivors-committed / vector-append-died crash window. No-op when
    * the sink does not exist yet or nothing is missing. */
  private def backfillVectors(spark: SparkSession, vecPath: String,
                              outPath: String, idCol: String,
                              vecCol: String): Unit = {
    if (!Zones.pathExists(spark, outPath)) return
    val out = spark.read.parquet(outPath).select(col(idCol), col(vecCol))
    val missing =
      if (Zones.pathExists(spark, vecPath))
        out.join(spark.read.parquet(vecPath).select(col(idCol)),
          Seq(idCol), "left_anti")
      else out
    // eager checkpoint before the append: the plan reads vecPath, and an
    // append to a read path invalidates (and would recompute) it
    val rows = missing.localCheckpoint()
    if (rows.count() > 0) rows.write.mode("append").parquet(vecPath)
  }

  /** Bring the band table in sync with the vector table at startup:
    * build wholesale when absent (bootstrap, or a crash mid-rebuild),
    * else append bands for any vector id the band table is missing.
    * One narrow id scan of the band table, paid at startup, never per
    * batch. */
  private def backfillBands(spark: SparkSession, vecPath: String,
                            bandPath: String, idCol: String, vecCol: String,
                            bands: Int, bitsPerBand: Int, dim: Int,
                            fileBuckets: Int): Unit = {
    if (!Zones.pathExists(spark, vecPath)) return
    val vecs = spark.read.parquet(vecPath)
    if (!Zones.pathExists(spark, bandPath)) {
      Similarity.writeEmbBandTable(vecs, idCol, vecCol, bandPath,
        bands, bitsPerBand, dim, fileBuckets)
    } else {
      // eager checkpoint: the missing-id plan reads bandPath, which the
      // append below writes
      val missing = vecs.join(
          spark.read.parquet(bandPath).select(col("id").as(idCol)).distinct(),
          Seq(idCol), "left_anti").localCheckpoint()
      if (missing.count() > 0)
        Similarity.appendEmbBandTable(missing, idCol, vecCol, bandPath,
          bands, bitsPerBand, dim, fileBuckets)
    }
  }

  /** @param vecStream streaming DF carrying `idCol` + `vecCol`
    * @param vecPath   standing corpus vector table `(idCol, vecCol)` —
    *                  the source of truth; may not exist yet (bootstraps
    *                  on first batch)
    * @param outPath   survivor sink (parquet, batch schema)
    * @param compactVecsAfterFiles when > 0, rewrite the vector table
    *                  (sorted by id, curated file sizes) whenever its
    *                  file count reaches this threshold; the same
    *                  trigger rebuilds the band table from the compacted
    *                  vectors. 0 disables. Layout-only — dedup results
    *                  are identical across the boundary.
    * @param compactSinkAfterFiles when > 0, rewrite the survivor sink
    *                  (sorted by id, curated file sizes) whenever its
    *                  file count reaches this threshold — per-batch
    *                  appends otherwise grow the sink without bound.
    *                  Primary output → backup-keeping swap, mid-swap
    *                  crash repaired at startup. Layout-only. 0 disables.
    * @param bandPath  when set, the corpus probe broadcast-probes a
    *                  materialized [[Similarity.writeEmbBandTable]] at
    *                  this path (O(batch) per batch); built from
    *                  `vecPath` at startup if absent, kept in sync per
    *                  batch, crash windows repaired at startup.
    * @param fileBuckets band-table disk-partition count; must match
    *                  across runs on the same table.
    * @return the started query (AvailableNow: drains and stops) */
  def run(spark: SparkSession, vecStream: DataFrame, vecPath: String,
          outPath: String, checkpoint: String,
          idCol: String = "vec_id", vecCol: String = "embedding",
          threshold: Double = 0.95, bands: Int = 8, bitsPerBand: Int = 8,
          dim: Int = 64, growCorpus: Boolean = true,
          idempotent: Boolean = true,
          compactVecsAfterFiles: Int = 0,
          compactSinkAfterFiles: Int = 0,
          bandPath: Option[String] = None,
          fileBuckets: Int = 64): StreamingQuery = {
    require(compactVecsAfterFiles >= 0,
      s"compactVecsAfterFiles must be >= 0: $compactVecsAfterFiles")
    require(compactSinkAfterFiles >= 0,
      s"compactSinkAfterFiles must be >= 0: $compactSinkAfterFiles")
    // vecPath is the SOURCE OF TRUTH (backfillVectors can only rebuild
    // rows present in the sink — a pre-seeded standing corpus could not
    // be recovered): restore an interrupted compaction swap before any
    // repair logic reads the table; the sink likewise, BEFORE backfills
    Zones.recoverBackup(spark, vecPath)
    Zones.recoverBackup(spark, outPath)
    if (growCorpus)
      backfillVectors(spark, vecPath, outPath, idCol, vecCol)
    bandPath.foreach(bp => backfillBands(spark, vecPath, bp, idCol, vecCol,
      bands, bitsPerBand, dim, fileBuckets))
    vecStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // banding + verify + anti-join all read the batch; one scan
        val cached = batch.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val within = Similarity.embeddingNearDupDedup(cached, idCol, vecCol,
          threshold, bands, bitsPerBand, dim)
        val vsCorpus =
          if (Zones.pathExists(spark, vecPath)) {
            val corpus = spark.read.parquet(vecPath)
            val bandTable = bandPath match {
              case Some(bp) if Zones.pathExists(spark, bp) =>
                spark.read.parquet(bp)
              case _ =>
                // legacy shape: derive the corpus band set in-flight
                Similarity.embBandRows(corpus, idCol, vecCol,
                  bands, bitsPerBand, dim, fileBuckets)
            }
            // persistBatch = false: the batch is already persisted as
            // `cached` above; the operator's own persist would register a
            // cached projection per micro-batch that nothing unpersists
            Similarity.incrementalEmbDedup(within, idCol, vecCol,
              bandTable, corpus, threshold, bands, bitsPerBand, dim,
              fileBuckets, persistBatch = false)
          } else within
        val survivors0 =
          if (idempotent && Zones.pathExists(spark, outPath)) {
            val seen = spark.read.parquet(outPath).select(col(idCol))
            vsCorpus.join(seen, Seq(idCol), "left_anti")
          } else vsCorpus
        // EAGER checkpoint for the same reason as DedupStream: the
        // appends below write the very paths this plan reads (outPath
        // via idempotency, vecPath via the corpus probe), and a lazily
        // cached plan would be invalidated by its own append and see
        // itself filtered to nothing.
        val survivors = survivors0.localCheckpoint()
        try {
          if (survivors.count() > 0) {
            survivors.write.mode("append").parquet(outPath)
            if (growCorpus) {
              val newVecs = survivors.select(col(idCol), col(vecCol))
              newVecs.write.mode("append").parquet(vecPath)
              bandPath.foreach(bp =>
                Similarity.appendEmbBandTable(newVecs, idCol, vecCol, bp,
                  bands, bitsPerBand, dim, fileBuckets))
              if (compactVecsAfterFiles > 0 &&
                  Zones.dataFileCount(spark, vecPath) >= compactVecsAfterFiles) {
                // source of truth → backup-keeping swap (never zero copies)
                Zones.replaceKeepingBackup(spark, vecPath) { tmp =>
                  Zones.writeCurated(
                    spark.read.parquet(vecPath)
                      .repartition(spark.sparkContext.defaultParallelism),
                    tmp, partitionCols = Seq.empty, sortCols = Seq(idCol),
                    maxRecordsPerFile = 10000000L, cluster = false)
                }
                bandPath.foreach(bp =>
                  Zones.replaceAtomically(spark, bp) { tmp =>
                    Similarity.writeEmbBandTable(
                      spark.read.parquet(vecPath), idCol, vecCol, tmp,
                      bands, bitsPerBand, dim, fileBuckets)
                  })
              }
            }
            // survivor-sink compaction (one file run added per batch
            // regardless of growCorpus; layout-only rewrite)
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
        ()
      }
      .start()
  }
}
