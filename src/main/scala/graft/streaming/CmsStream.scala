package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.FreqSketch
import graft.zones.Zones

/** Streaming Count-Min: the q114 frequency sketch kept current by a
  * stream — per micro-batch the arriving keys collapse to a partial
  * depth×width grid that blind-appends to a standing grid table, and
  * estimates come from summing partials, never re-reading a key.
  *
  * The protocol contrast with [[KmvStream]] is the point: KMV's merge
  * is a DISTINCT min-k, so duplicate partials from a crash-replayed
  * batch collapse and replay is idempotent by algebra. CMS's merge is a
  * SUM — a replayed batch's re-appended partial would DOUBLE its keys'
  * counts. Replay safety therefore needs provenance: every partial row
  * carries its micro-batch id, and [[mergedGrid]] first collapses
  * replicas per (batch_id, depth, bucket) — a replayed batch recomputes
  * the bit-identical partial, so keeping one copy is exact — and only
  * then sums across batches.
  *
  * Compaction respects the ledger: Structured Streaming commits epochs
  * in order, so only the NEWEST batch can ever replay. The trigger
  * freezes every older batch into a single summed row set under
  * `batch_id = -1` (one row per bucket — successive freezes stay
  * consistent because the previous freeze left exactly one -1 row per
  * bucket) and keeps the newest batch's rows verbatim, so a replay
  * arriving after compaction still finds its batch id to collapse
  * against. File count and row count stay bounded at ~2 × depth×width.
  */
object CmsStream {

  /** @param keyStream streaming DF carrying `keyCol`
    * @param gridPath  standing partial-grid table
    *                  `(batch_id, depth, bucket, cnt)`
    * @param compactAfterFiles when > 0, freeze-and-sum when the table's
    *                  file count reaches this. 0 disables. */
  def run(spark: SparkSession, keyStream: DataFrame, gridPath: String,
          checkpoint: String, keyCol: String = "token",
          depth: Int = 4, width: Int = 1024,
          compactAfterFiles: Int = 0): StreamingQuery = {
    require(compactAfterFiles >= 0,
      s"compactAfterFiles must be >= 0: $compactAfterFiles")
    Zones.recoverBackup(spark, gridPath)
    keyStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        FreqSketch.countMin(batch, col(keyCol), depth, width)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(gridPath)
        if (compactAfterFiles > 0 &&
            Zones.dataFileCount(spark, gridPath) >= compactAfterFiles)
          Zones.replaceKeepingBackup(spark, gridPath) { tmp =>
            compacted(spark.read.parquet(gridPath))
              .coalesce(1).write.parquet(tmp)
          }
        ()
      }
      .start()
  }

  /** Replica-collapsed per-batch partials: at most one row per
    * (batch_id, depth, bucket). `max` is exact — a replayed batch's
    * partial is bit-identical to the original. */
  private def deduped(grid: DataFrame): DataFrame =
    grid.groupBy(col("batch_id"), col("depth"), col("bucket"))
      .agg(max(col("cnt")).as("cnt"))

  /** Freeze every batch but the newest into one summed row set under
    * batch_id = -1; keep the newest batch's rows for replay collapse. */
  private def compacted(grid: DataFrame): DataFrame = {
    val d = deduped(grid)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val maxB = d.agg(max(col("batch_id"))).head().getLong(0)
    val frozen = d.filter(col("batch_id") =!= maxB)
      .groupBy(col("depth"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
      .select(lit(-1L).as("batch_id"), col("depth"), col("bucket"), col("cnt"))
    frozen.unionByName(d.filter(col("batch_id") === maxB))
  }

  /** The merged (depth, bucket, cnt) grid the q114 estimator consumes:
    * replica collapse, then sum across batches. */
  def mergedGrid(grid: DataFrame): DataFrame =
    deduped(grid).groupBy(col("depth"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point estimates against the standing table —
    * [[FreqSketch.estimate]] over [[mergedGrid]]. */
  def estimate(grid: DataFrame, probes: DataFrame, keyCol: String,
               depth: Int = 4, width: Int = 1024): DataFrame =
    FreqSketch.estimate(mergedGrid(grid), probes, keyCol, depth, width)
}
