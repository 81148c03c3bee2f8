package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Clustering
import graft.zones.Zones

/** Continuous-ingest grid-DBSCAN: vector micro-batches maintain the
  * standing cell census and core-cluster labels through
  * [[Clustering.mergeCensus]] / [[Clustering.mergeCoreLabels]] — the
  * streaming twin of q197, completing the standing-corpus trio
  * (dedup [[DedupStream]], graph [[CcStream]], density clustering
  * here). Each batch is delta-priced: census rows merge by addition
  * (core-ness is monotone) and only components touched by newly-core
  * cells re-solve.
  *
  * State layout:
  *  - `pointsPath` — append-only (vec_id, cx, cy) point log, the
  *    SOURCE OF TRUTH and the idempotency ledger: a replayed batch's
  *    ids anti-join away before anything merges, so checkpoint replay
  *    can never double-count a cell (the [[DedupStream]] sink-ledger
  *    rule, cell edition). Narrow — three longs per vector,
  *    column-pruned to one long for the anti-join.
  *  - `censusPath` — the standing (cx, cy, cell, cnt) census,
  *    rewritten per batch via [[Zones.replaceKeepingBackup]]. Derived
  *    from the point log (rebuildable wholesale), but maintained
  *    incrementally.
  *  - `labelPath` — the standing (cell, cluster) core-label table,
  *    same swap discipline.
  *
  * Crash windows, all repaired at startup:
  *  - either swap died mid-rename → [[Zones.recoverBackup]];
  *  - points appended but census not merged → detected by
  *    Σ census.cnt ≠ count(points) and repaired by REBUILDING the
  *    census from the log (one narrow aggregate — the log is the
  *    source of truth precisely so this repair is wholesale-cheap);
  *  - census merged but labels not → repaired by
  *    [[Clustering.mergeCoreLabels]] itself: cells the label table
  *    missed are still "newly-core" relative to it, so the per-batch
  *    merge IS the repair (the [[CcStream]] property, density
  *    edition). */
object DbscanStream {

  private def emptyLabels(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("cell"), col("id").as("cluster"))

  private def standing(spark: SparkSession, path: String,
                       empty: => DataFrame): DataFrame =
    if (Zones.pathExists(spark, path)) spark.read.parquet(path) else empty

  private def emptyCensus(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("cx"), col("id").as("cy"),
      col("id").as("cell"), col("id").as("cnt"))

  private def censusFromPoints(pts: DataFrame): DataFrame =
    Clustering.mergeCensus(
      pts.groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("cnt")),
      pts.sparkSession.range(0).select(col("id").as("cx"),
        col("id").as("cy"), col("id").as("cnt")))

  private[streaming] def repairAtStartup(outer: SparkSession,
      pointsPath: String, censusPath: String, labelPath: String,
      minPts: Long, ccRounds: Int): Unit = {
    val spark = CcStream.mergeSession(outer) // star iteration inside the label merge
    Zones.recoverBackup(spark, censusPath)
    Zones.recoverBackup(spark, labelPath)
    if (!Zones.pathExists(spark, pointsPath)) return
    val pts = spark.read.parquet(pointsPath)
    val nPts = pts.count()
    val census0 = standing(spark, censusPath, emptyCensus(spark))
    val censusSum = census0.agg(coalesce(sum(col("cnt")), lit(0L)))
      .head().getLong(0)
    val census =
      if (censusSum == nPts) census0
      else {
        // points-appended / census-unmerged gap: rebuild wholesale
        // from the log (source of truth) and swap in
        val rebuilt = censusFromPoints(pts)
        Zones.replaceKeepingBackup(spark, censusPath)(tmp =>
          rebuilt.write.parquet(tmp))
        rebuilt
      }
    // census-merged / labels-unmerged gap (or the rebuild above grew
    // the core set): the merge IS the repair — no-op when in sync
    val labels0 = standing(spark, labelPath, emptyLabels(spark))
    val missing = census.filter(col("cnt") >= minPts)
      .join(labels0.select(col("cell")), Seq("cell"), "left_anti")
      .limit(1).count()
    if (missing > 0) {
      // toFixedPoint: the repair must never re-throw on a round budget
      // (the CcStream poison-batch rule, density edition)
      val merged = Clustering
        .mergeCoreLabels(census, labels0, minPts, ccRounds,
          toFixedPoint = true)
        .localCheckpoint() // the plan reads labelPath, which we replace
      Zones.replaceKeepingBackup(spark, labelPath)(tmp =>
        merged.write.parquet(tmp))
    }
  }

  /** One micro-batch: project to cells, drop replayed ids against the
    * point log, append survivors (source of truth, FIRST), then the
    * census merge and the core-label merge, each swapped in. Runs on
    * [[CcStream.mergeSession]] (constraint propagation off for the
    * star iteration, isolated from the shared outer session — the
    * ADVICE r10 conf race) and solves labels to a verified fixed
    * point (no poison batch on an undersized round budget).
    *
    * Id contract: `vec_id` is globally unique and immutable — the
    * point log is an IDENTITY ledger, not a version store. Duplicate
    * ids WITHIN a batch collapse to one row (`dropDuplicates` below;
    * a batch that carries the same vector twice must not double-count
    * its cell), and an id already in the log anti-joins away even if
    * its vector bytes changed — reusing an id for new content is a
    * producer bug this sink cannot detect (it would need the vector
    * bytes in the ledger) and silently ignores. */
  private[streaming] def processBatch(outer: SparkSession, batch: DataFrame,
      pointsPath: String, censusPath: String, labelPath: String,
      idCol: String, vecCol: String, dims: Int, cellWidth: Long,
      minPts: Long, ccRounds: Int): Unit = {
    val spark = CcStream.mergeSession(outer)
    val prior = SparkSession.getActiveSession
    SparkSession.setActiveSession(spark)
    try {
      val raw = Clustering.pointCells(batch, idCol, vecCol, dims, cellWidth)
      val pts0 = spark.createDataFrame(raw.rdd, raw.schema)
        .dropDuplicates("vec_id")
      val fresh = (
        if (Zones.pathExists(spark, pointsPath))
          pts0.join(spark.read.parquet(pointsPath).select(col("vec_id")),
            Seq("vec_id"), "left_anti")
        else pts0
      ).localCheckpoint() // read by the append AND both merges
      if (fresh.isEmpty) return
      fresh.write.mode("append").parquet(pointsPath)
      val census = Clustering.mergeCensus(
        standing(spark, censusPath, emptyCensus(spark)),
        fresh.groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("cnt")))
      Zones.replaceKeepingBackup(spark, censusPath)(tmp =>
        census.write.parquet(tmp))
      val labels = Clustering.mergeCoreLabels(census,
          standing(spark, labelPath, emptyLabels(spark)), minPts, ccRounds,
          toFixedPoint = true)
        .localCheckpoint() // the plan reads labelPath, which we replace
      Zones.replaceKeepingBackup(spark, labelPath)(tmp =>
        labels.write.parquet(tmp))
    } finally {
      prior.foreach(SparkSession.setActiveSession)
    }
  }

  /** @param vecStream streaming DF carrying `idCol` + `vecCol`
    * @return the started query (AvailableNow: drains and stops) */
  def run(spark: SparkSession, vecStream: DataFrame, pointsPath: String,
          censusPath: String, labelPath: String, checkpoint: String,
          idCol: String = "vec_id", vecCol: String = "embedding",
          dims: Int = 64, cellWidth: Long = 524288L, minPts: Long = 12L,
          ccRounds: Int = 8): StreamingQuery = {
    repairAtStartup(spark, pointsPath, censusPath, labelPath, minPts,
      ccRounds)
    vecStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(spark, batch, pointsPath, censusPath, labelPath,
          idCol, vecCol, dims, cellWidth, minPts, ccRounds)
        ()
      }
      .start()
  }
}
