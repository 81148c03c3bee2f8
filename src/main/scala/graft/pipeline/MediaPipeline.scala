package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}
import graft.zones.Zones

/** End-to-end media curation — the image edition of [[CurationPipeline]],
  * chaining the independently-oracled media operators into one driver:
  *
  *   metadata gate → exact (byte) dedup → perceptual (dHash) dedup →
  *   bilinear thumbnail → feature extraction → curated sink
  *
  * Every stage materializes to `outRoot/<stage>` through the curated
  * writer with its row count riding the stage's OWN write via
  * `Dataset.observe` ([[Observe.countedAction]] — zero extra passes).
  * That is also the 100 TB shape: stage outputs are restart points,
  * image bytes cross exactly the per-stage writes (never a shuffle —
  * the dedup exchanges carry band ints and ids only), and the byte
  * column is DROPPED at the feature stage so the final table is
  * features-sized, not media-sized.
  *
  * Stages are q37/q118/q184/q181/q109's operators; this driver adds
  * composition, not new correctness surface — MediaPipelineSpec gates
  * the composition with a planted victim per stage and a ledger ≡ disk
  * check. The perceptual stage uses [[Multimodal.dhashBmpBands]], which
  * requires the (w/2 − 1)·h = 64 dHash geometry (the corpus contract;
  * anything else rejects loudly inside the codec).
  */
object MediaPipeline {

  final case class StageAudit(stage: String, rows: Long)
  final case class Result(audits: Seq[StageAudit], outPath: String) {
    def rowsOf(stage: String): Long =
      audits.find(_.stage == stage).map(_.rows)
        .getOrElse(throw new NoSuchElementException(stage))
  }

  /** @param media      (media_id, kind, bytes, meta) rows — BMP images
    * @param outRoot    stage outputs land at `outRoot/<stage>`
    * @param minWidth   s1 metadata gate: minimum decoded width
    * @param minHeight  s1 metadata gate: minimum decoded height
    * @param thumbW     s4 bilinear thumbnail width
    * @param thumbH     s4 bilinear thumbnail height
    * @param maxHamming s3 perceptual near-dup Hamming cut (dHash, 64-bit) */
  def run(spark: SparkSession, media: DataFrame, outRoot: String,
          minWidth: Int = 10, minHeight: Int = 6,
          thumbW: Int = 9, thumbH: Int = 8,
          maxHamming: Int = 6): Result = {
    val audits = scala.collection.mutable.ArrayBuffer.empty[StageAudit]
    def stage(name: String, df: DataFrame): DataFrame = {
      val path = s"$outRoot/$name"
      val n = Observe.countedAction(spark, df, name)(d =>
        Zones.writeCurated(d, path, partitionCols = Seq.empty,
          sortCols = Seq("media_id"), maxRecordsPerFile = 10000000L,
          cluster = false))
      audits += StageAudit(name, n)
      spark.read.parquet(path)
    }

    // 1. metadata gate: prunes on the typed meta struct — column
    // pruning keeps the byte column unread for rejected rows
    val gated = stage("s1_meta_gate", media.filter(
      col("kind") === "image" &&
        col("meta.width") >= minWidth && col("meta.height") >= minHeight))

    // 2. exact byte dedup: sha256(bytes)-keyed winners (smallest id),
    // the media analogue of Dedup.byFingerprint — bytes hash map-side,
    // only (hash, id) crosses the winner shuffle
    val hashed = gated.withColumn("__bh", sha2(col("bytes"), 256))
    val winners = hashed.groupBy(col("__bh"))
      .agg(min(col("media_id")).as("media_id"))
    val exact = stage("s2_exact_dedup",
      hashed.join(winners, Seq("__bh", "media_id")).drop("__bh"))

    // 3. perceptual near-dup dedup: the q184 rule — dHash bands once
    // per image, banded-Hamming pairs, connected components, the
    // component-minimum survives; singletons pass untouched
    val pairs = Multimodal.dhashNearDupPairs(
        Multimodal.dhashBands(exact.select(
          col("media_id"), col("kind"), col("bytes"), col("meta"))).toDF(),
        maxHamming)
      .select(col("a").as("id_a"), col("b").as("id_b"))
    val labels = Dedup.connectedComponents(pairs)
      .withColumnRenamed("id", "media_id")
    val survivors = stage("s3_perceptual_dedup",
      exact.join(labels, Seq("media_id"), "left")
        .filter(col("label").isNull || col("label") === col("media_id"))
        .drop("label"))

    // 4. bilinear thumbnail: the q181 fixed-point kernel
    val thumbs = stage("s4_thumbs",
      Multimodal.resizeBmpBilinear(survivors, thumbW, thumbH))

    // 5. features from the REAL decoder; bytes die here — the curated
    // output is (media_id, kind, 8 lanes), features-sized
    val path = s"$outRoot/s5_features"
    val feats = Multimodal.extractFeatures(thumbs, Multimodal.decodeBmp).toDF()
    val n = Observe.countedAction(spark, feats, "s5_features")(d =>
      Zones.writeCurated(d, path, partitionCols = Seq.empty,
        sortCols = Seq("media_id"), maxRecordsPerFile = 10000000L,
        cluster = false))
    audits += StageAudit("s5_features", n)
    Result(audits.toSeq, path)
  }
}
