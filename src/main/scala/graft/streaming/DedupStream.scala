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

  /** Number of data files currently under a parquet table path. */
  private def dataFileCount(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(_.getPath.getName.startsWith("part-"))
  }

  /** Rewrite the signature table through the curated sink: per-batch
    * appends accumulate one small file per micro-batch, and a year of
    * micro-batches is millions of files — an ever-slower corpus scan.
    * The rewrite lands in a sibling temp dir first and swaps in with a
    * directory rename, so a crash mid-compaction leaves the original
    * table intact (the half-written temp dir is deleted on the next
    * attempt). */
  private def compactSignatures(spark: SparkSession, sigPath: String,
                                targetFiles: Int): Unit = {
    val hc = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(sigPath)
    val fs = p.getFileSystem(hc)
    val tmp = new org.apache.hadoop.fs.Path(sigPath + "__compacting")
    fs.delete(tmp, true)
    Zones.writeCurated(
      spark.read.parquet(sigPath).repartition(targetFiles),
      tmp.toString, partitionCols = Seq.empty, sortCols = Seq("id"),
      maxRecordsPerFile = 10000000L, cluster = false)
    fs.delete(p, true)
    fs.rename(tmp, p)
    spark.catalog.refreshByPath(sigPath)
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
    *                  the boundary (DedupStreamSpec proves it).
    * @return the started query (AvailableNow: drains and stops) */
  def run(spark: SparkSession, docStream: DataFrame, sigPath: String,
          outPath: String, checkpoint: String,
          idCol: String = "doc_id", textCol: String = "text",
          shingleSize: Int = 5, k: Int = 128, bands: Int = 16,
          threshold: Double = 0.8, growCorpus: Boolean = true,
          idempotent: Boolean = true,
          compactSigsAfterFiles: Int = 0): StreamingQuery = {
    require(compactSigsAfterFiles >= 0,
      s"compactSigsAfterFiles must be >= 0: $compactSigsAfterFiles")
    // repair the survivors-committed / signatures-missing crash window
    // before any batch runs (replay cannot: the idempotent anti-join
    // hides replayed survivors from the signature append)
    if (growCorpus)
      backfillSignatures(spark, sigPath, outPath, idCol, textCol,
        shingleSize, k)
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
            if (growCorpus) {
              Dedup.minhashSignatures(survivors, idCol, textCol, shingleSize, k)
                .write.mode("append").parquet(sigPath)
              if (compactSigsAfterFiles > 0 &&
                  dataFileCount(spark, sigPath) >= compactSigsAfterFiles)
                compactSignatures(spark, sigPath,
                  targetFiles = spark.sparkContext.defaultParallelism)
            }
          }
        } finally cached.unpersist()
        ()
      }
      .start()
  }
}
