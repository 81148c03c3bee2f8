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
  /** Dedicated batch-profile session for the label merges. The star
    * iteration's self-union of a localCheckpoint frame trips Spark's
    * Union constraint rewrite ("key not found: u#…" in
    * UnionBase.rewriteConstraints — the re-instanced relation's
    * constraints still reference the original attribute ids), both
    * under the streaming clone's planner profile and, in principle,
    * under any session with constraint propagation on. Constraint
    * propagation buys nothing for these bare (long, long) plans, so
    * the merge runs on a DERIVED session that has it off permanently —
    * instead of a set/restore toggle on the shared outer session,
    * which races: two concurrent drains (CcStream + DbscanStream on
    * one session) could interleave so one batch's restore re-trips the
    * crash mid-merge of the other, or strand the conf false for every
    * later query (ADVICE r10). `newSession` shares the SparkContext —
    * cached blocks, localCheckpoints, and the parquet state paths are
    * all visible — but owns an isolated SQLConf, so nothing leaks.
    * One derived session per outer session, cached (SessionState
    * construction is not free at micro-batch cadence). */
  private val mergeSessions =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]()
  private[streaming] def mergeSession(outer: SparkSession): SparkSession =
    mergeSessions.computeIfAbsent(outer, o => {
      val s = o.newSession()
      s.conf.set("spark.sql.constraintPropagation.enabled", "false")
      s
    })

  private[streaming] def repairAtStartup(outer: SparkSession,
      edgeLogPath: String, labelPath: String, rounds: Int): Unit = {
    val spark = mergeSession(outer)
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
      // toFixedPoint: the repair path must never re-throw on a round
      // budget — a merge that poisoned the log under an undersized
      // fixed budget is exactly what this call clears (ADVICE r10)
      val merged = Graphs
        .incrementalCc(labels, bad, rounds, toFixedPoint = true)
        .localCheckpoint() // the plan reads labelPath, which we replace
      Zones.replaceKeepingBackup(spark, labelPath)(tmp =>
        merged.write.parquet(tmp))
    }
  }

  /** One micro-batch: edge-log append (source of truth, FIRST), then
    * the incremental label merge, then the label-table swap. The body
    * runs on [[mergeSession]] (batch planner profile, constraint
    * propagation off — see its doc) set as the thread's active
    * session; foreachBatch executes user code on the stream thread
    * with the streaming CLONE active, and the merge is genuinely batch
    * work. The merge solves to a VERIFIED fixed point, not a fixed
    * round count: a fixed cap that throws after the edge append is a
    * poison batch — restart repair re-runs the identical failing
    * merge (ADVICE r10). */
  private[streaming] def processBatch(outer: SparkSession, batch: DataFrame,
      edgeLogPath: String, labelPath: String, rounds: Int): Unit = {
    val spark = mergeSession(outer)
    val prior = SparkSession.getActiveSession
    SparkSession.setActiveSession(spark)
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
          standingLabels(spark, labelPath), edges, rounds,
          toFixedPoint = true)
        .localCheckpoint() // the plan reads labelPath, which we replace
      Zones.replaceKeepingBackup(spark, labelPath)(tmp =>
        merged.write.parquet(tmp))
    } finally {
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
