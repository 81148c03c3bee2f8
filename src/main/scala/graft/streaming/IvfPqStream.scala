package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Clustering
import graft.zones.Zones

/** Continuous-ingest IVF-PQ index maintenance — the ANN member of the
  * standing-corpus streaming family (dedup [[DedupStream]], graph
  * [[CcStream]], density [[DbscanStream]]; VERDICT r10 #7): vector
  * micro-batches keep a SERVING index current without retraining it.
  * Per drain, new vectors assign to the STANDING coarse cells and
  * encode against the STANDING codebook ([[Clustering.pqAssignEncode]]
  * — O(batch) map-side work); the model itself rebuilds only when the
  * corpus has outgrown its training snapshot (the COMPACTION trigger:
  * log count ≥ `growth` × the model's training size), at which point
  * cells + codebook retrain wholesale from the log and every entry
  * re-encodes — the classic quantization-index refresh cadence
  * (assignments stay exact against whichever codebook is current;
  * codebook QUALITY, not correctness, is what decays between
  * rebuilds, and the q207 metrics are how a user prices that decay).
  *
  * State layout:
  *  - `vecLogPath` — append-only (vec_id, embedding) log: SOURCE OF
  *    TRUTH and idempotency ledger (replayed/duplicate ids anti-join
  *    away — the [[DbscanStream]] rule; `vec_id` is globally unique
  *    and immutable).
  *  - `modelPath` — ONE flat table holding coarse cells + codebook +
  *    a generation row ([[Clustering.pqTrainModel]] rows plus
  *    part = 'meta' carrying (gen, train_n)), swapped atomically via
  *    [[Zones.replaceKeepingBackup]]. One table so cells and codebook
  *    can never come from different generations.
  *  - `entriesPath` — the standing entry table (vec_id, cell_id, sm,
  *    cid, gen): append-only between compactions, rewritten at them.
  *    Every row is stamped with the model generation it was encoded
  *    under.
  *
  * Crash windows, all repaired at startup ([[repairAtStartup]]):
  *  - either swap died mid-rename → [[Zones.recoverBackup]];
  *  - vectors appended but not encoded → log ids absent from the
  *    entry table re-encode against the current model (the per-drain
  *    merge IS the repair);
  *  - compaction died between the model swap and the entry rewrite →
  *    entries carry a STALE generation stamp; the repair drops every
  *    entry whose gen ≠ the model's and re-encodes those ids — codes
  *    from an old codebook can never silently serve under a new one.
  */
object IvfPqStream {

  final case class Params(dims: Int = 64, m: Int = 8, k: Int = 16,
                          iters: Int = 2, cells: Int = 16,
                          growth: Double = 2.0)

  private def metaRow(spark: SparkSession, gen: Long, trainN: Long): DataFrame =
    spark.range(1).select(lit("meta").as("part"), lit(gen).as("cell_id"),
      lit(trainN).as("sm"), lit(null).cast("long").as("cid"),
      lit(null).cast("array<long>").as("c"))

  /** (generation, training-set size) of the persisted model. */
  private def modelMeta(model: DataFrame): (Long, Long) = {
    val r = model.filter(col("part") === "meta")
      .select(col("cell_id"), col("sm")).head()
    (r.getLong(0), r.getLong(1))
  }

  private def trainAndWrite(spark: SparkSession, log: DataFrame,
      idCol: String, vecCol: String, p: Params, gen: Long,
      modelPath: String, entriesPath: String): Unit = {
    val n = log.count()
    val model = Clustering.pqTrainModel(log, idCol, vecCol,
        p.dims, p.m, p.k, p.iters, p.cells)
      .unionByName(metaRow(spark, gen, n))
      .localCheckpoint() // the swap replaces a path this plan may read
    // MODEL FIRST, then entries: a crash in between leaves stale-gen
    // entries, which the startup repair detects and re-encodes; the
    // reverse order could serve new-gen codes against an old codebook
    // with nothing to notice.
    Zones.replaceKeepingBackup(spark, modelPath)(tmp =>
      model.write.parquet(tmp))
    val entries = Clustering.pqAssignEncode(log, idCol, vecCol,
        p.dims, p.m, model)
      .withColumn("gen", lit(gen))
      .localCheckpoint()
    Zones.replaceKeepingBackup(spark, entriesPath)(tmp =>
      entries.write.parquet(tmp))
  }

  /** Encode `vecs` under the current model and append (the per-drain
    * path and the missing-id repair path — same code, the
    * [[CcStream]] merge-is-the-repair property). */
  private def encodeAppend(spark: SparkSession, vecs: DataFrame,
      idCol: String, vecCol: String, p: Params, model: DataFrame,
      gen: Long, entriesPath: String): Unit =
    Clustering.pqAssignEncode(vecs, idCol, vecCol, p.dims, p.m, model)
      .withColumn("gen", lit(gen))
      .write.mode("append").parquet(entriesPath)

  private[streaming] def repairAtStartup(spark: SparkSession,
      vecLogPath: String, modelPath: String, entriesPath: String,
      idCol: String, vecCol: String, p: Params): Unit = {
    Zones.recoverBackup(spark, modelPath)
    Zones.recoverBackup(spark, entriesPath)
    if (!Zones.pathExists(spark, vecLogPath)) return
    if (!Zones.pathExists(spark, modelPath)) {
      // log exists but the first build never completed
      trainAndWrite(spark, spark.read.parquet(vecLogPath), idCol, vecCol,
        p, gen = 1L, modelPath, entriesPath)
      return
    }
    val model = spark.read.parquet(modelPath)
    val (gen, _) = modelMeta(model)
    // stale-generation entries (compaction died between the two swaps)
    // are dropped wholesale before the missing-id probe re-encodes
    if (Zones.pathExists(spark, entriesPath)) {
      val entries = spark.read.parquet(entriesPath)
      if (entries.filter(col("gen") =!= gen).limit(1).count() > 0) {
        val current = entries.filter(col("gen") === gen).localCheckpoint()
        Zones.replaceKeepingBackup(spark, entriesPath)(tmp =>
          current.write.parquet(tmp))
      }
    }
    val encoded =
      if (Zones.pathExists(spark, entriesPath))
        spark.read.parquet(entriesPath).select(col("vec_id")).distinct()
      else spark.range(0).select(col("id").as("vec_id"))
    val missing = spark.read.parquet(vecLogPath)
      .join(encoded, Seq("vec_id"), "left_anti")
      .localCheckpoint()
    if (missing.count() > 0)
      encodeAppend(spark, missing, idCol, vecCol, p, model, gen, entriesPath)
  }

  /** One micro-batch: dedup + ledger anti-join, vector-log append
    * (source of truth, FIRST), then either the O(batch) encode-append
    * or — when the log has outgrown the training snapshot by
    * `growth` — a full model rebuild + entry rewrite. */
  private[streaming] def processBatch(spark: SparkSession, batch: DataFrame,
      vecLogPath: String, modelPath: String, entriesPath: String,
      idCol: String, vecCol: String, p: Params): Unit = {
    val prior = SparkSession.getActiveSession
    SparkSession.setActiveSession(spark)
    try {
      val raw = batch.select(col(idCol), col(vecCol)).dropDuplicates(idCol)
      val pts0 = spark.createDataFrame(raw.rdd, raw.schema)
      val fresh = (
        if (Zones.pathExists(spark, vecLogPath))
          pts0.join(spark.read.parquet(vecLogPath).select(col(idCol)),
            Seq(idCol), "left_anti")
        else pts0
      ).localCheckpoint() // read by the append AND the encode
      if (fresh.isEmpty) return
      fresh.write.mode("append").parquet(vecLogPath)
      if (!Zones.pathExists(spark, modelPath)) {
        trainAndWrite(spark, spark.read.parquet(vecLogPath), idCol, vecCol,
          p, gen = 1L, modelPath, entriesPath)
        return
      }
      val model = spark.read.parquet(modelPath).localCheckpoint()
      val (gen, trainN) = modelMeta(model)
      val logN = spark.read.parquet(vecLogPath).count()
      if (logN >= p.growth * trainN) {
        // compaction: retrain on the full log under the next generation
        trainAndWrite(spark, spark.read.parquet(vecLogPath), idCol, vecCol,
          p, gen + 1L, modelPath, entriesPath)
      } else {
        encodeAppend(spark, fresh, idCol, vecCol, p, model, gen, entriesPath)
      }
    } finally {
      prior.foreach(SparkSession.setActiveSession)
    }
  }

  /** @param vecStream streaming DF carrying `idCol` + `vecCol`
    * @return the started query (AvailableNow: drains and stops) */
  def run(spark: SparkSession, vecStream: DataFrame, vecLogPath: String,
          modelPath: String, entriesPath: String, checkpoint: String,
          idCol: String = "vec_id", vecCol: String = "embedding",
          params: Params = Params()): StreamingQuery = {
    repairAtStartup(spark, vecLogPath, modelPath, entriesPath,
      idCol, vecCol, params)
    vecStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(spark, batch, vecLogPath, modelPath, entriesPath,
          idCol, vecCol, params)
        ()
      }
      .start()
  }

  /** ADC probe of a query batch against the standing state (the
    * serving read path). */
  def probe(spark: SparkSession, queries: DataFrame, modelPath: String,
            entriesPath: String, idCol: String = "vec_id",
            vecCol: String = "embedding", nprobe: Int = 2, topK: Int = 5,
            params: Params = Params()): DataFrame =
    Clustering.pqAdcProbe(queries, idCol, vecCol, params.dims, params.m,
      nprobe, topK, spark.read.parquet(modelPath),
      spark.read.parquet(entriesPath))
}
