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
  *    query_id, neighbor_id, cos, rank, base, gen, batch) plus
  *    part = 'meta' carrying (gen, train_n) and one part = 'ins'
  *    accounting row PER insert append carrying (batch, expected edge
  *    count) — written in the SAME parquet job as its edge rows.
  *    Rebuilds swap it atomically via [[Zones.replaceKeepingBackup]]
  *    with every row base = true; drain insertions append base = false
  *    rows under the current gen. One table so edges and generation
  *    can never disagree.
  *
  * Crash windows, all repaired at startup ([[repairAtStartup]]):
  *  - a swap died mid-rename → [[Zones.recoverBackup]];
  *  - vectors appended to the log but their edges never landed → log
  *    ids absent from the graph re-insert via the SAME walk (the
  *    merge-is-the-repair rule);
  *  - a torn append left rows stamped with a generation ≠ the meta
  *    row's → those rows drop wholesale and their ids re-insert —
  *    edges walked against an old base can never silently serve under
  *    a new one;
  *  - a torn append left a SUBSET of one insert batch's part files
  *    (ADVICE r12: an id whose rank list landed truncated still passes
  *    a bare presence check) → every base = false batch must account
  *    exactly against its 'ins' ledger row (edge-row count == the
  *    recorded expectation, ledger row present); any batch that does
  *    not drops wholesale and its ids re-insert — and because
  *    insertion is per-vector deterministic over the generation base,
  *    the re-insert is bit-equal to the append that tore.
  */
object KnnGraphStream {

  final case class Params(k: Int = 8, cells: Int = 16, rounds: Int = 2,
                          beam: Int = 8, steps: Int = 3,
                          growth: Double = 2.0,
                          maxTombstoneFrac: Double = 0.2)

  /** Sibling-path convention for the tombstone log. */
  def tombstonesOf(vecLogPath: String): String =
    s"${vecLogPath}_tombstones"

  /** The LIVE corpus view: the vector log minus tombstoned ids. */
  private def liveLog(spark: SparkSession, vecLogPath: String,
                      idCol: String): DataFrame = {
    val log = spark.read.parquet(vecLogPath)
    val tp = tombstonesOf(vecLogPath)
    if (!Zones.pathExists(spark, tp)) log
    else log.join(spark.read.parquet(tp), Seq(idCol), "left_anti")
  }

  private def tombstoneCount(spark: SparkSession,
                             vecLogPath: String): Long = {
    val tp = tombstonesOf(vecLogPath)
    if (!Zones.pathExists(spark, tp)) 0L
    else spark.read.parquet(tp).count()
  }

  private def metaRow(spark: SparkSession, gen: Long, trainN: Long): DataFrame =
    spark.range(1).select(lit("meta").as("part"),
      lit(gen).as("query_id"), lit(trainN).as("neighbor_id"),
      lit(null).cast("double").as("cos"), lit(null).cast("int").as("rank"),
      lit(null).cast("boolean").as("base"), lit(gen).as("gen"),
      lit(null).cast("long").as("batch"))

  private def modelMeta(graph: DataFrame): (Long, Long) = {
    val r = graph.filter(col("part") === "meta")
      .select(col("query_id"), col("neighbor_id")).head()
    (r.getLong(0), r.getLong(1))
  }

  private def edgeRows(graph: DataFrame): DataFrame =
    graph.filter(col("part") === "edge")

  /** Full NN-Descent rebuild over the log under generation `gen`,
    * swapped atomically. Every edge row is base = true — the next
    * generation's insertion substrate. The serving ENTRY SAMPLE (the
    * sha-ordered `cells`-row recipe) is materialized alongside as
    * part = 'entry' rows (VERDICT r12 nit #2: re-deriving it per walk
    * is a corpus-sized TakeOrderedAndProject scan on every drain and
    * every probe; persisted with the graph it is free, and rebuilt at
    * exactly the moment its substrate changes — the generation swap). */
  private def buildAndWrite(spark: SparkSession, log: DataFrame,
      idCol: String, vecCol: String, p: Params, gen: Long,
      graphPath: String): Unit = {
    val n = log.count()
    val entries = log
      .orderBy(sha2(concat(col(idCol).cast("string"), lit(":ivf")), 256),
        col(idCol))
      .limit(p.cells)
      .select(lit("entry").as("part"), col(idCol).as("query_id"),
        lit(null).cast("long").as("neighbor_id"),
        lit(null).cast("double").as("cos"), lit(null).cast("int").as("rank"),
        lit(true).as("base"), lit(gen).as("gen"),
        lit(null).cast("long").as("batch"))
    val edges = Similarity.nnDescentKnn(log, idCol, vecCol,
        p.k, p.cells, p.rounds)
      .select(lit("edge").as("part"), col("query_id"), col("neighbor_id"),
        col("cos"), col("rank"), lit(true).as("base"), lit(gen).as("gen"),
        lit(null).cast("long").as("batch"))
      .unionByName(metaRow(spark, gen, n))
      .unionByName(entries)
      .localCheckpoint() // the swap replaces a path this plan may read
    Zones.replaceKeepingBackup(spark, graphPath)(tmp =>
      edges.write.parquet(tmp))
  }

  /** The persisted serving entry sample of the current generation —
    * base-corpus ids by construction. */
  private def entryRows(graph: DataFrame, gen: Long): DataFrame =
    graph.filter(col("part") === "entry" && col("gen") === gen)
      .select(col("query_id").as("node"))

  /** Insert `vecs` against the generation-base graph: one beam walk
    * per vector over base edges + base corpus, appended as
    * base = false rows under the current generation (the per-drain
    * path AND the missing-id repair path — same code). Each append is
    * stamped with the next batch id and rides with one 'ins' ledger
    * row carrying its expected edge count — in the SAME parquet job,
    * so [[repairAtStartup]] can tell a fully-committed batch from one
    * whose commit tore mid-rename (ADVICE r12). */
  private def insertAppend(spark: SparkSession, vecs: DataFrame,
      idCol: String, vecCol: String, p: Params, gen: Long,
      vecLogPath: String, graphPath: String): Unit = {
    val graph = spark.read.parquet(graphPath)
    // batch ids only need uniqueness among the table's CURRENT
    // base = false rows (a rebuild clears them all), so max+1 over the
    // ledger is enough — and deterministic given drain order
    val batchId = 1L + graph.filter(col("part") === "ins")
      .agg(coalesce(max(col("batch")), lit(0L))).head().getLong(0)
    val base = edgeRows(graph)
      .filter(col("base") && col("gen") === gen)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint()
    val baseIds = base.select(col("query_id")).distinct()
    val baseCorpus = spark.read.parquet(vecLogPath)
      .join(baseIds.withColumnRenamed("query_id", idCol),
        Seq(idCol), "left_semi")
    val inserted = Similarity.nnDescentSearchFrom(base, baseCorpus, idCol,
        vecCol, vecs, idCol, vecCol, entryRows(graph, gen),
        p.k, p.beam, p.steps)
      .select(lit("edge").as("part"), col("query_id"), col("neighbor_id"),
        col("cos"), col("rank"), lit(false).as("base"), lit(gen).as("gen"),
        lit(batchId).as("batch"))
      .localCheckpoint() // counted for the ledger, then written
    val ledger = spark.range(1).select(lit("ins").as("part"),
      lit(batchId).as("query_id"), lit(inserted.count()).as("neighbor_id"),
      lit(null).cast("double").as("cos"), lit(null).cast("int").as("rank"),
      lit(false).as("base"), lit(gen).as("gen"), lit(batchId).as("batch"))
    inserted.unionByName(ledger).write.mode("append").parquet(graphPath)
    graft.operators.Checkpoints.freeCheckpoint(inserted)
    graft.operators.Checkpoints.freeCheckpoint(base)
  }

  private[streaming] def repairAtStartup(spark: SparkSession,
      vecLogPath: String, graphPath: String,
      idCol: String, vecCol: String, p: Params): Unit = {
    Zones.recoverBackup(spark, graphPath)
    if (!Zones.pathExists(spark, vecLogPath)) return
    if (!Zones.pathExists(spark, graphPath)) {
      buildAndWrite(spark, liveLog(spark, vecLogPath, idCol), idCol,
        vecCol, p, gen = 1L, graphPath)
      return
    }
    val graph = spark.read.parquet(graphPath)
    val (gen, _) = modelMeta(graph)
    // torn-append rows under a foreign generation drop wholesale
    val hasForeign = graph.filter(col("part") =!= "meta" &&
      col("gen") =!= gen).limit(1).count() > 0
    val current = graph.filter(col("part") === "meta" ||
      col("gen") === gen)
    // incomplete insert batches (ADVICE r12): an insert append is one
    // multi-file parquet job, and a crash mid-commit can land a SUBSET
    // of its part files — an id whose rank list landed truncated still
    // passes the bare presence check below, so every base = false
    // batch must account exactly against its 'ins' ledger row (count
    // match, ledger present). Any batch that does not — and any
    // base = false edge row with no batch stamp at all — drops
    // wholesale; the missing-id re-insert below then regenerates it
    // bit-equal (insertion is per-vector deterministic over the base).
    val expected = current.filter(col("part") === "ins")
      .select(col("batch"), col("neighbor_id").as("expect_n"))
    val actual = current.filter(col("part") === "edge" && !col("base"))
      .filter(col("batch").isNotNull)
      .groupBy(col("batch")).agg(count(lit(1)).as("actual_n"))
    val badBatches = expected.join(actual, Seq("batch"), "full_outer")
      .filter(!(col("expect_n") <=> col("actual_n")))
      .select(col("batch"))
      .localCheckpoint()
    val hasUnstamped = current.filter(col("part") === "edge" &&
      !col("base") && col("batch").isNull).limit(1).count() > 0
    if (hasForeign || hasUnstamped || badBatches.limit(1).count() > 0) {
      val kept = current
        .filter(!(col("part") === "edge" && !col("base") &&
          col("batch").isNull))
        .join(badBatches, Seq("batch"), "left_anti")
        .localCheckpoint()
      Zones.replaceKeepingBackup(spark, graphPath)(tmp =>
        kept.write.parquet(tmp))
      graft.operators.Checkpoints.freeCheckpoint(kept)
    }
    graft.operators.Checkpoints.freeCheckpoint(badBatches)
    val inGraph = edgeRows(spark.read.parquet(graphPath))
      .select(col("query_id").as(idCol)).distinct()
    // the missing-id scan runs over the LIVE log: a tombstoned id that
    // a rebuild already excised must NOT re-insert
    val missing = liveLog(spark, vecLogPath, idCol)
      .join(inGraph, Seq(idCol), "left_anti")
      .localCheckpoint()
    if (missing.count() > 0)
      insertAppend(spark, missing, idCol, vecCol, p, gen,
        vecLogPath, graphPath)
    // a delete whose triggered excision rebuild died re-fires here
    rebuildIfPressured(spark, vecLogPath, graphPath, idCol, vecCol, p)
  }

  /** Excision rebuild when the tombstone log outgrows
    * `maxTombstoneFrac` of the live corpus — mark-and-filter serving
    * stays correct at any tombstone count, but every tombstone is a
    * routable-yet-unservable node the walk still pays for; the
    * pressure trigger bounds that overhead the way `growth` bounds
    * insertion decay. */
  private def rebuildIfPressured(spark: SparkSession, vecLogPath: String,
      graphPath: String, idCol: String, vecCol: String,
      p: Params): Unit = {
    if (!Zones.pathExists(spark, graphPath)) return
    val nT = tombstoneCount(spark, vecLogPath)
    if (nT == 0L) return
    val live = liveLog(spark, vecLogPath, idCol).count()
    if (nT >= p.maxTombstoneFrac * math.max(live, 1L)) {
      val (gen, _) = modelMeta(spark.read.parquet(graphPath))
      buildAndWrite(spark, liveLog(spark, vecLogPath, idCol), idCol,
        vecCol, p, gen + 1L, graphPath)
    }
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
        buildAndWrite(spark, liveLog(spark, vecLogPath, idCol), idCol,
          vecCol, p, gen = 1L, graphPath)
        return
      }
      val (gen, trainN) = modelMeta(spark.read.parquet(graphPath))
      val logN = liveLog(spark, vecLogPath, idCol).count()
      if (logN >= p.growth * trainN) {
        buildAndWrite(spark, liveLog(spark, vecLogPath, idCol), idCol,
          vecCol, p, gen + 1L, graphPath)
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
    * generation) scored against the whole log, entered from the
    * PERSISTED generation entry sample (appended nodes are reachable
    * through reverse edges the moment their drain lands; no corpus
    * scan per probe — VERDICT r12 nit #2). Tombstoned ids are
    * MARK-AND-FILTERED (the HNSW deletion discipline): they stay
    * routable — their edges still carry the walk through their
    * neighborhood — but never serve; the final beam filters them and
    * re-ranks. The answer under-fills only when fewer than `topK`
    * LIVE rows remain in the walked beam, so a serving config under
    * active deletion sizes `beam` with tombstone headroom above
    * `topK` — the ef-vs-k discipline, priced exactly like HNSW's. */
  def probe(spark: SparkSession, queries: DataFrame, vecLogPath: String,
            graphPath: String, idCol: String = "vec_id",
            vecCol: String = "embedding", topK: Int = 5,
            params: Params = Params()): DataFrame = {
    val graph = spark.read.parquet(graphPath)
    val (gen, _) = modelMeta(graph)
    val edges = edgeRows(graph).filter(col("gen") === gen)
      .select(col("query_id"), col("neighbor_id"))
    // serve the FULL beam, then filter + re-rank: a tombstone at rank 1
    // must not shrink the answer below topK while live beam rows remain
    val beamOut = Similarity.nnDescentSearchFrom(edges,
      spark.read.parquet(vecLogPath), idCol, vecCol, queries, idCol,
      vecCol, entryRows(graph, gen), params.beam, params.beam,
      params.steps)
    val tp = tombstonesOf(vecLogPath)
    val live =
      if (!Zones.pathExists(spark, tp)) beamOut
      else beamOut.join(
        spark.read.parquet(tp).select(col(idCol).as("neighbor_id")),
        Seq("neighbor_id"), "left_anti")
    live.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** DELETE vectors from the standing index (the GDPR-removal path the
    * append-only family needs): ids append to the TOMBSTONE log —
    * idempotent (already-tombstoned and never-ingested ids no-op) —
    * and take effect immediately through [[probe]]'s mark-and-filter;
    * the physical EXCISION happens at the next rebuild (pressure
    * trigger here and at every drain/startup: tombstones >
    * `maxTombstoneFrac` of the live corpus force it), after which the
    * ids are gone from graph, entries, and training set alike. A
    * deleted id can never resurrect: the vector log still carries it,
    * so the ingest ledger anti-join drops any re-arrival. */
  def delete(spark: SparkSession, ids: DataFrame, vecLogPath: String,
             graphPath: String, idCol: String = "vec_id",
             vecCol: String = "embedding",
             params: Params = Params()): Long = {
    if (!Zones.pathExists(spark, vecLogPath)) return 0L
    val tp = tombstonesOf(vecLogPath)
    val known = ids.select(col(idCol)).distinct()
      .join(spark.read.parquet(vecLogPath).select(col(idCol)),
        Seq(idCol), "left_semi")
    val fresh = (
      if (Zones.pathExists(spark, tp))
        known.join(spark.read.parquet(tp), Seq(idCol), "left_anti")
      else known
    ).localCheckpoint()
    val n = fresh.count()
    if (n > 0L) {
      fresh.write.mode("append").parquet(tp)
      rebuildIfPressured(spark, vecLogPath, graphPath, idCol, vecCol,
        params)
    }
    graft.operators.Checkpoints.freeCheckpoint(fresh)
    n
  }
}
