package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Unigram
import graft.zones.Zones

/** Continuous-ingest UNIGRAM-TOKENIZER maintenance (VERDICT r12 #5) —
  * the tokenizer was the last standing artifact without a streaming
  * twin (dedup/CC/DBSCAN/IVF-PQ/k-NN-graph all have one): document
  * micro-batches keep a [[Unigram]] vocabulary current without
  * re-learning per drain.
  *
  * Census protocol = the [[CmsStream]] SUM protocol, not KMV's
  * distinct-collapse: a word census MERGES BY ADDITION, so a
  * crash-replayed batch would double its words' counts. Every per-drain
  * census delta therefore carries its micro-batch id, and
  * [[mergedCensus]] first collapses replicas per (batch_id, w) — a
  * replayed drain recomputes the bit-identical delta, so `max` keeps
  * exactly one copy — then sums across batches.
  *
  * Fit protocol = the [[IvfPqStream]]/[[KnnGraphStream]] generation
  * protocol: the vocabulary table is ONE flat parquet path carrying
  * part = 'piece' rows (piece, cnt, wt) and a part = 'meta' row
  * (gen, words-at-fit). Drains only append census deltas; when the
  * merged census total outgrows the fitted total by `growth`, the full
  * [[Unigram.fitWeights]] EM re-runs over the merged census under the
  * next generation and the table swaps atomically
  * ([[Zones.replaceKeepingBackup]]) — so cross-drain maintenance is
  * BIT-EQUAL to a batch fit over the same census (fit-from-census is
  * the same code path, the spec's headline gate). Encodes serve from
  * the standing generation ([[encodeStats]] → [[Unigram
  * .encodeStatsWith]]) and report it, so a consumer can pin outputs to
  * the vocabulary that produced them.
  *
  * Crash windows, repaired at [[run]] startup:
  *  - a swap died mid-rename → [[Zones.recoverBackup]];
  *  - census deltas landed but the triggered re-fit never did → the
  *    startup growth check re-fires it (merge-is-the-repair);
  *  - a replayed drain → the batch-id replica collapse above.
  *
  * 100 TB shape: the census delta log is vocabulary-class (distinct
  * words per drain), the EM fit is the q218 vocabulary-class plan, and
  * the growth check is one sum over the merged census — the corpus
  * itself never lands in the state path.
  */
object UnigramStream {

  final case class Params(maxPieceLen: Int = 4, topN: Int = 24,
                          emIters: Int = 2, maxWordLen: Int = 16,
                          growth: Double = 2.0)

  private def metaRow(spark: SparkSession, gen: Long,
                      fitWords: Long): DataFrame =
    spark.range(1).select(lit("meta").as("part"),
      lit(null).cast("string").as("piece"), lit(fitWords).as("cnt"),
      lit(null).cast("long").as("wt"), lit(gen).as("gen"))

  private def modelMeta(vocab: DataFrame): (Long, Long) = {
    val r = vocab.filter(col("part") === "meta")
      .select(col("gen"), col("cnt")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Replica-collapsed summed census: at most one (w, cnt) row per
    * word. `max` per (batch_id, w) is exact — a replayed drain's delta
    * is bit-identical to the original. */
  def mergedCensus(census: DataFrame): DataFrame =
    census.groupBy(col("batch_id"), col("w"))
      .agg(max(col("cnt")).as("cnt"))
      .groupBy(col("w")).agg(sum(col("cnt")).as("cnt"))

  private def censusWords(spark: SparkSession, censusPath: String,
                          p: Params): DataFrame =
    // length guard already ran at append time (wordCensus raises on
    // over-length words before a delta ever lands)
    mergedCensus(spark.read.parquet(censusPath))
      .withColumn("len", length(col("w")).cast("long"))

  private def fitAndSwap(spark: SparkSession, censusPath: String,
                         vocabPath: String, p: Params, gen: Long): Unit = {
    val words = censusWords(spark, censusPath, p)
    val total = words.agg(coalesce(sum(col("cnt")), lit(0L)))
      .head().getLong(0)
    val fitted = Unigram.fitWeights(words, p.maxPieceLen, p.topN,
      p.emIters, p.maxWordLen)
    val table = fitted
      .select(lit("piece").as("part"), col("piece"), col("cnt"),
        col("wt"), lit(gen).as("gen"))
      .unionByName(metaRow(spark, gen, total))
      .localCheckpoint() // the swap replaces a path this plan may read
    Zones.replaceKeepingBackup(spark, vocabPath)(tmp =>
      table.write.parquet(tmp))
    graft.operators.Checkpoints.freeCheckpoint(fitted)
    graft.operators.Checkpoints.freeCheckpoint(table)
  }

  private[streaming] def repairAtStartup(spark: SparkSession,
      censusPath: String, vocabPath: String, p: Params): Unit = {
    Zones.recoverBackup(spark, vocabPath)
    if (!Zones.pathExists(spark, censusPath)) return
    if (!Zones.pathExists(spark, vocabPath)) {
      fitAndSwap(spark, censusPath, vocabPath, p, gen = 1L)
      return
    }
    val (gen, fitWords) = modelMeta(spark.read.parquet(vocabPath))
    val total = censusWords(spark, censusPath, p)
      .agg(coalesce(sum(col("cnt")), lit(0L))).head().getLong(0)
    if (total >= p.growth * fitWords)
      fitAndSwap(spark, censusPath, vocabPath, p, gen + 1L)
  }

  private[streaming] def processBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, textCol: String, censusPath: String,
      vocabPath: String, p: Params): Unit = {
    val prior = SparkSession.getActiveSession
    SparkSession.setActiveSession(spark)
    try {
      val local = spark.createDataFrame(batch.rdd, batch.schema)
      val delta = Unigram.wordCensus(local, textCol, p.maxWordLen)
        .select(lit(batchId).as("batch_id"), col("w"), col("cnt"))
        .localCheckpoint() // materialized once, written once
      val empty = delta.isEmpty
      if (!empty) delta.write.mode("append").parquet(censusPath)
      graft.operators.Checkpoints.freeCheckpoint(delta)
      if (empty) return
      if (!Zones.pathExists(spark, vocabPath)) {
        fitAndSwap(spark, censusPath, vocabPath, p, gen = 1L)
        return
      }
      val (gen, fitWords) = modelMeta(spark.read.parquet(vocabPath))
      val total = censusWords(spark, censusPath, p)
        .agg(coalesce(sum(col("cnt")), lit(0L))).head().getLong(0)
      if (total >= p.growth * fitWords)
        fitAndSwap(spark, censusPath, vocabPath, p, gen + 1L)
    } finally {
      prior.foreach(SparkSession.setActiveSession)
    }
  }

  /** @param docStream streaming DF carrying `textCol`
    * @return the started query (AvailableNow: drains and stops) */
  def run(spark: SparkSession, docStream: DataFrame, censusPath: String,
          vocabPath: String, checkpoint: String,
          textCol: String = "text",
          params: Params = Params()): StreamingQuery = {
    repairAtStartup(spark, censusPath, vocabPath, params)
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, textCol, censusPath,
          vocabPath, params)
        ()
      }
      .start()
  }

  /** Per-source tokenization stats under the STANDING vocabulary,
    * stamped with the generation that produced them — the
    * generation-pinned serving path. */
  def encodeStats(spark: SparkSession, docs: DataFrame, textCol: String,
                  sourceCol: String, vocabPath: String,
                  params: Params = Params()): DataFrame = {
    val vocab = spark.read.parquet(vocabPath)
    val (gen, _) = modelMeta(vocab)
    val weights = vocab.filter(col("part") === "piece")
      .select(col("piece"), col("wt"))
    Unigram.encodeStatsWith(docs, textCol, sourceCol, weights,
        params.maxPieceLen, params.maxWordLen)
      .withColumn("gen", lit(gen))
  }
}
