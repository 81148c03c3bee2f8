package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.pipeline.CrawlPipeline
import graft.zones.Zones

/** Streaming crawl ingest: WARC shards ARRIVE (a file stream of shard
  * rows, the [[graft.operators.Multimodal.MediaRow]] schema), each
  * micro-batch runs the full [[CrawlPipeline.transform]] chain — record
  * explode, encoding gate, markup/entity/NFC text, URL + robots +
  * domain cap, PII scrub — and the clean documents ride
  * [[DedupStream.processBatch]] unchanged: within-batch near-dup dedup,
  * the standing-corpus signature probe, idempotent sink append,
  * signature/band growth, compaction triggers. One crawl definition,
  * two execution modes (the [[StreamingEtl]] contract), and the dedup
  * protocol's crash-window repairs apply verbatim because they ARE the
  * same code path.
  *
  * Domain-cap semantics across batches: [[CrawlPipeline.run]]'s cap is
  * global over its one bounded input; a stream admits GREEDILY — each
  * batch caps itself (the transform's own per-batch cap), then a
  * STANDING per-domain budget derived from the survivor sink
  * (`domainCap` minus previously admitted) filters the batch's
  * (quality, id)-ranked rows. Greedy admission can differ from the
  * global cap only when a binding cap spans drains — the inherent
  * stream/batch difference (a stream cannot un-admit an earlier
  * publisher page when a better one arrives later); on any single
  * drain against an empty sink the output matches [[CrawlPipeline.run]]
  * row for row (CrawlStreamSpec gates this). The budget read is one
  * column-pruned scan of the sink's domain column per batch, and it is
  * crash-consistent by construction: the sink IS the admission record,
  * so a replayed batch sees its own committed admissions and the
  * idempotent anti-join keeps the sink exact.
  *
  * 100 TB shape: everything the batch pipeline guarantees (map-only
  * stages, bytes never shuffle, robots broadcast, one domain-key
  * exchange) now bounded per micro-batch; the standing-corpus probe is
  * the banded O(batch) shape when `bandPath` is set. Corpus text is
  * read zero times per batch.
  */
object CrawlStream {

  /** @param warcStream streaming DF of shard rows (media_id, kind,
    *                   bytes, meta — the MediaRow schema)
    * @param robotsRules (domain, rtype, prefix) rules, batch-side
    * @param outPath    clean-document survivor sink (parquet)
    * @param sigPath    standing MinHash signature table
    * @return the started query (AvailableNow: drains and stops) */
  def run(spark: SparkSession, warcStream: DataFrame,
          robotsRules: DataFrame, outPath: String, sigPath: String,
          checkpoint: String, maxBadBytes: Int = 0, domainCap: Int = 100,
          shingleSize: Int = 5, k: Int = 128, bands: Int = 16,
          threshold: Double = 0.8, growCorpus: Boolean = true,
          idempotent: Boolean = true, compactSigsAfterFiles: Int = 0,
          compactSinkAfterFiles: Int = 0, bandPath: Option[String] = None,
          fileBuckets: Int = 64): StreamingQuery = {
    require(domainCap >= 1, s"bad domainCap: $domainCap")
    DedupStream.repairAtStartup(spark, sigPath, outPath, "doc_id", "text",
      shingleSize, k, bands, growCorpus, bandPath, fileBuckets)
    warcStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val clean = CrawlPipeline.transform(spark, batch, robotsRules,
          maxBadBytes, domainCap)
        // standing per-domain budget: the sink is the admission record
        val admitted =
          if (Zones.pathExists(spark, outPath))
            spark.read.parquet(outPath)
              .groupBy(col("domain")).agg(count(lit(1)).as("used"))
          else null
        val capped =
          if (admitted == null) clean
          else {
            // same (quality, id) order as the transform's own cap, so a
            // non-binding budget admits the identical row set
            val w = Window.partitionBy(col("domain"))
              .orderBy(length(col("text")).desc, col("doc_id"))
            clean.withColumn("__rk", row_number().over(w))
              .join(admitted, Seq("domain"), "left")
              .filter(col("__rk") <=
                lit(domainCap.toLong) - coalesce(col("used"), lit(0L)))
              .select(clean.columns.map(col): _*) // stable sink column order
          }
        DedupStream.processBatch(spark, capped, sigPath, outPath,
          "doc_id", "text", shingleSize, k, bands, threshold, growCorpus,
          idempotent, compactSigsAfterFiles, compactSinkAfterFiles,
          bandPath, fileBuckets)
        ()
      }
      .start()
  }
}
