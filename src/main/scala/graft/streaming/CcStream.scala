package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Graphs
import graft.zones.Zones

/** Continuous-ingest connected components: each arriving micro-batch of
  * undirected edges merges into a STANDING label table through
  * [[Graphs.incrementalCc]] — only components the batch touches
  * re-solve; everything else passes through label-identical. This is
  * the streaming twin of q195 (the [[DedupStream]] protocol in the
  * graph column): a link graph absorbing crawl increments never pays a
  * full-graph recompute at batch cadence.
  *
  * State layout:
  *  - `edgeLogPath` — append-only edge log, the SOURCE OF TRUTH. Each
  *    batch appends FIRST; replayed batches append duplicate rows,
  *    which are harmless (CC is idempotent on duplicate edges) and die
  *    in [[Graphs.ccLargeSmallStar]]'s per-round dedup if a wholesale
  *    rebuild ever replays the log.
  *  - `labelPath` — the standing (id, label) table, rewritten per
  *    batch through [[Zones.replaceKeepingBackup]] (labels are what
  *    downstream reads; never zero copies on disk). At 100 TB the
  *    rewrite becomes a partitioned merge touching only changed
  *    components' partitions — the merge SET is already delta-sized
  *    here, the full rewrite is this single-node sink's simplification
  *    and is documented as such.
  *
  * Crash windows, all repaired at startup ([[repairAtStartup]]):
  *  - label swap died mid-rename → [[Zones.recoverBackup]];
  *  - edges appended but the process died before the label merge →
  *    the INCONSISTENT-EDGE probe: any log edge whose endpoint labels
  *    are missing or unequal is exactly the unmerged gap, and feeding
  *    those edges back through [[Graphs.incrementalCc]] is the repair
  *    (the q195 operator IS the recovery path — no separate machinery).
  *    Checkpoint replay alone cannot close this window: the replayed
  *    batch would re-merge, but a batch committed to the checkpoint
  *    AFTER the edge append yet BEFORE the label swap never replays.
  */
object CcStream {

  private def emptyLabels(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id"), col("id").as("label"))

  private def standingLabels(spark: SparkSession,
                             labelPath: String): DataFrame =
    if (Zones.pathExists(spark, labelPath)) spark.read.parquet(labelPath)
    else emptyLabels(spark)

  /** Inconsistent-edge probe + repair: log edges whose endpoint labels
    * are missing or unequal are the edges-appended/labels-unmerged
    * crash gap; re-merging them restores the invariant (every log edge
    * joins two equal labels). No-op when log or gap is empty. */
  private[streaming] def repairAtStartup(spark: SparkSession,
      edgeLogPath: String, labelPath: String, rounds: Int): Unit = {
    Zones.recoverBackup(spark, labelPath)
    if (!Zones.pathExists(spark, edgeLogPath)) return
    val edges = spark.read.parquet(edgeLogPath)
      .filter(col("id_a") =!= col("id_b"))
    val labels = standingLabels(spark, labelPath)
    val bad = edges
      .join(labels.select(col("id").as("id_a"), col("label").as("la")),
        Seq("id_a"), "left")
      .join(labels.select(col("id").as("id_b"), col("label").as("lb")),
        Seq("id_b"), "left")
      .filter(col("la").isNull || col("lb").isNull ||
        col("la") =!= col("lb"))
      .select(col("id_a"), col("id_b"))
      .localCheckpoint() // materialize: the merge below rewrites labelPath
    if (bad.count() > 0) {
      val merged = Graphs.incrementalCc(labels, bad, rounds)
        .localCheckpoint() // the plan reads labelPath, which we replace
      Zones.replaceKeepingBackup(spark, labelPath)(tmp =>
        merged.write.parquet(tmp))
    }
  }

  /** One micro-batch: edge-log append (source of truth, FIRST), then
    * the incremental label merge, then the label-table swap.
    *
    * The body runs with the OUTER session restored as the thread's
    * active session: foreachBatch executes user code on the stream
    * thread with the streaming session CLONE active (streaming confs —
    * AQE off among them), and the star iteration's self-union
    * constraint rewrite breaks under that planner profile
    * ("key not found: u#…" from UnionBase.rewriteConstraints). The
    * merge is genuinely batch work and runs under batch confs. */
  private[streaming] def processBatch(spark: SparkSession, batch: DataFrame,
      edgeLogPath: String, labelPath: String, rounds: Int): Unit = {
    val prior = SparkSession.getActiveSession
    SparkSession.setActiveSession(spark)
    // Under the streaming drain, the star iteration's self-union of a
    // localCheckpoint frame trips Spark's Union constraint rewrite
    // ("key not found: u#…" in UnionBase.rewriteConstraints — the
    // re-instanced relation's constraints still reference the original
    // attribute ids). Constraint propagation buys nothing for these
    // bare (long, long) plans; switch it off for the merge and restore.
    val cpKey = "spark.sql.constraintPropagation.enabled"
    val cpPrev = spark.conf.get(cpKey, "true")
    spark.conf.set(cpKey, "false")
    try {
      val raw = batch
        .select(col("id_a").cast("long").as("id_a"),
          col("id_b").cast("long").as("id_b"))
        .filter(col("id_a") =!= col("id_b"))
      // detach from the micro-batch's incremental plan before the
      // iterative merge (plain batch lineage for the checkpoint rounds;
      // the batch is scanned once either way)
      val edges = spark.createDataFrame(raw.rdd, raw.schema)
        .localCheckpoint() // read by the append AND the merge
      if (edges.isEmpty) return
      edges.write.mode("append").parquet(edgeLogPath)
      val merged = Graphs.incrementalCc(
          standingLabels(spark, labelPath), edges, rounds)
        .localCheckpoint() // the plan reads labelPath, which we replace
      Zones.replaceKeepingBackup(spark, labelPath)(tmp =>
        merged.write.parquet(tmp))
    } finally {
      spark.conf.set(cpKey, cpPrev)
      prior.foreach(SparkSession.setActiveSession)
    }
  }

  /** @param edgeStream streaming DF carrying `id_a`, `id_b`
    * @return the started query (AvailableNow: drains and stops) */
  def run(spark: SparkSession, edgeStream: DataFrame, edgeLogPath: String,
          labelPath: String, checkpoint: String,
          rounds: Int = 8): StreamingQuery = {
    repairAtStartup(spark, edgeLogPath, labelPath, rounds)
    edgeStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(spark, batch, edgeLogPath, labelPath, rounds)
        ()
      }
      .start()
  }
}
