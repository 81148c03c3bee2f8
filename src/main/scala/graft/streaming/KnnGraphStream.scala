package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Similarity
import graft.zones.Zones

/** Continuous-ingest k-NN-GRAPH maintenance — the graph-ANN member of
  * the standing-corpus streaming family (quantization [[IvfPqStream]],
  * dedup [[DedupStream]], components [[CcStream]], density
  * [[DbscanStream]]; VERDICT r11 #2): vector micro-batches keep a
  * serving k-NN graph current without re-running the NN-Descent build.
  *
  * Per drain, each new vector INSERTS the way HNSW inserts: a
  * deterministic beam walk over the GENERATION-BASE graph
  * ([[Similarity.nnDescentSearch]] — the q214 serving operation) finds
  * its k nearest base nodes, and those become its edge rows. Because
  * every insertion walks the SAME base graph and scores against the
  * SAME base corpus, insertions are per-vector independent — which
  * drain a vector arrives in cannot change its edges, so cross-drain
  * growth is BIT-EQUAL to a single-drain growth (the spec's gate).
  * What insertion deliberately does NOT do: discover new→new edges or
  * refresh base nodes' lists — that is graph QUALITY decaying between
  * rebuilds, not correctness (reverse edges make appended nodes
  * reachable to the serving walk immediately), priced exactly like
  * codebook decay in the quantization tier and repaired wholesale at
  * the growth trigger: when the log outgrows the base by `growth`, the
  * full [[Similarity.nnDescentKnn]] build re-runs over the log under
  * the next GENERATION and the table swaps atomically.
  *
  * State layout (the [[IvfPqStream]] protocol):
  *  - `vecLogPath` — append-only (vec_id, embedding) log: source of
  *    truth and idempotency ledger (duplicate ids anti-join away;
  *    vec_id is globally unique and immutable).
  *  - `graphPath` — ONE flat table: edge rows (part = 'edge':
  *    query_id, neighbor_id, cos, rank, base, gen) plus part = 'meta'
  *    carrying (gen, train_n). Rebuilds swap it atomically via
  *    [[Zones.replaceKeepingBackup]] with every row base = true;
  *    drain insertions append base = false rows under the current gen.
  *    One table so edges and generation can never disagree.
  *
  * Crash windows, all repaired at startup ([[repairAtStartup]]):
  *  - a swap died mid-rename → [[Zones.recoverBackup]];
  *  - vectors appended to the log but their edges never landed → log
  *    ids absent from the graph re-insert via the SAME walk (the
  *    merge-is-the-repair rule);
  *  - a torn append left rows stamped with a generation ≠ the meta
  *    row's → those rows drop wholesale and their ids re-insert —
  *    edges walked against an old base can never silently serve under
  *    a new one.
  */
object KnnGraphStream {

  final case class Params(k: Int = 8, cells: Int = 16, rounds: Int = 2,
                          beam: Int = 8, steps: Int = 3,
                          growth: Double = 2.0)

  private def metaRow(spark: SparkSession, gen: Long, trainN: Long): DataFrame =
    spark.range(1).select(lit("meta").as("part"),
      lit(gen).as("query_id"), lit(trainN).as("neighbor_id"),
      lit(null).cast("double").as("cos"), lit(null).cast("int").as("rank"),
      lit(null).cast("boolean").as("base"), lit(gen).as("gen"))

  private def modelMeta(graph: DataFrame): (Long, Long) = {
    val r = graph.filter(col("part") === "meta")
      .select(col("query_id"), col("neighbor_id")).head()
    (r.getLong(0), r.getLong(1))
  }

  private def edgeRows(graph: DataFrame): DataFrame =
    graph.filter(col("part") === "edge")

  /** Full NN-Descent rebuild over the log under generation `gen`,
    * swapped atomically. Every edge row is base = true — the next
    * generation's insertion substrate. */
  private def buildAndWrite(spark: SparkSession, log: DataFrame,
      idCol: String, vecCol: String, p: Params, gen: Long,
      graphPath: String): Unit = {
    val n = log.count()
    val edges = Similarity.nnDescentKnn(log, idCol, vecCol,
        p.k, p.cells, p.rounds)
      .select(lit("edge").as("part"), col("query_id"), col("neighbor_id"),
        col("cos"), col("rank"), lit(true).as("base"), lit(gen).as("gen"))
      .unionByName(metaRow(spark, gen, n))
      .localCheckpoint() // the swap replaces a path this plan may read
    Zones.replaceKeepingBackup(spark, graphPath)(tmp =>
      edges.write.parquet(tmp))
  }

  /** Insert `vecs` against the generation-base graph: one beam walk
    * per vector over base edges + base corpus, appended as
    * base = false rows under the current generation (the per-drain
    * path AND the missing-id repair path — same code). */
  private def insertAppend(spark: SparkSession, vecs: DataFrame,
      idCol: String, vecCol: String, p: Params, gen: Long,
      vecLogPath: String, graphPath: String): Unit = {
    val base = edgeRows(spark.read.parquet(graphPath))
      .filter(col("base") && col("gen") === gen)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint()
    val baseIds = base.select(col("query_id")).distinct()
    val baseCorpus = spark.read.parquet(vecLogPath)
      .join(baseIds.withColumnRenamed("query_id", idCol),
        Seq(idCol), "left_semi")
    Similarity.nnDescentSearch(base, baseCorpus, idCol, vecCol,
        vecs, idCol, vecCol, p.k, p.cells, p.beam, p.steps)
      .select(lit("edge").as("part"), col("query_id"), col("neighbor_id"),
        col("cos"), col("rank"), lit(false).as("base"), lit(gen).as("gen"))
      .write.mode("append").parquet(graphPath)
    graft.operators.Checkpoints.freeCheckpoint(base)
  }

  private[streaming] def repairAtStartup(spark: SparkSession,
      vecLogPath: String, graphPath: String,
      idCol: String, vecCol: String, p: Params): Unit = {
    Zones.recoverBackup(spark, graphPath)
    if (!Zones.pathExists(spark, vecLogPath)) return
    if (!Zones.pathExists(spark, graphPath)) {
      buildAndWrite(spark, spark.read.parquet(vecLogPath), idCol, vecCol,
        p, gen = 1L, graphPath)
      return
    }
    val graph = spark.read.parquet(graphPath)
    val (gen, _) = modelMeta(graph)
    // torn-append rows under a foreign generation drop wholesale
    if (edgeRows(graph).filter(col("gen") =!= gen).limit(1).count() > 0) {
      val current = graph.filter(col("gen") === gen).localCheckpoint()
      Zones.replaceKeepingBackup(spark, graphPath)(tmp =>
        current.write.parquet(tmp))
    }
    val inGraph = edgeRows(spark.read.parquet(graphPath))
      .select(col("query_id").as(idCol)).distinct()
    val missing = spark.read.parquet(vecLogPath)
      .join(inGraph, Seq(idCol), "left_anti")
      .localCheckpoint()
    if (missing.count() > 0)
      insertAppend(spark, missing, idCol, vecCol, p, gen,
        vecLogPath, graphPath)
  }

  /** One micro-batch: dedup + ledger anti-join, vector-log append
    * (source of truth, FIRST), then either the O(batch) walk-insert or
    * — when the log has outgrown the base by `growth` — a wholesale
    * NN-Descent rebuild under the next generation. */
  private[streaming] def processBatch(spark: SparkSession, batch: DataFrame,
      vecLogPath: String, graphPath: String,
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
      ).localCheckpoint() // read by the append AND the insert
      if (fresh.isEmpty) return
      fresh.write.mode("append").parquet(vecLogPath)
      if (!Zones.pathExists(spark, graphPath)) {
        buildAndWrite(spark, spark.read.parquet(vecLogPath), idCol, vecCol,
          p, gen = 1L, graphPath)
        return
      }
      val (gen, trainN) = modelMeta(spark.read.parquet(graphPath))
      val logN = spark.read.parquet(vecLogPath).count()
      if (logN >= p.growth * trainN) {
        buildAndWrite(spark, spark.read.parquet(vecLogPath), idCol, vecCol,
          p, gen + 1L, graphPath)
      } else {
        insertAppend(spark, fresh, idCol, vecCol, p, gen,
          vecLogPath, graphPath)
      }
    } finally {
      prior.foreach(SparkSession.setActiveSession)
    }
  }

  /** @param vecStream streaming DF carrying `idCol` + `vecCol`
    * @return the started query (AvailableNow: drains and stops) */
  def run(spark: SparkSession, vecStream: DataFrame, vecLogPath: String,
          graphPath: String, checkpoint: String,
          idCol: String = "vec_id", vecCol: String = "embedding",
          params: Params = Params()): StreamingQuery = {
    repairAtStartup(spark, vecLogPath, graphPath, idCol, vecCol, params)
    vecStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(spark, batch, vecLogPath, graphPath,
          idCol, vecCol, params)
        ()
      }
      .start()
  }

  /** Serve out-of-corpus queries against the standing state: a beam
    * walk over the FULL adjacency (base + appended, the current
    * generation) scored against the whole log — appended nodes are
    * reachable through reverse edges the moment their drain lands. */
  def probe(spark: SparkSession, queries: DataFrame, vecLogPath: String,
            graphPath: String, idCol: String = "vec_id",
            vecCol: String = "embedding", topK: Int = 5,
            params: Params = Params()): DataFrame = {
    val graph = spark.read.parquet(graphPath)
    val (gen, _) = modelMeta(graph)
    val edges = edgeRows(graph).filter(col("gen") === gen)
      .select(col("query_id"), col("neighbor_id"))
    Similarity.nnDescentSearch(edges, spark.read.parquet(vecLogPath),
      idCol, vecCol, queries, idCol, vecCol,
      topK, params.cells, params.beam, params.steps)
  }
}
