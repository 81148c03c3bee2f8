package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expressions.{HtmlEntityDecodeFn, NfcNormalizeFn, Utf8StatsFn}
import graft.operators.{Curation, Multimodal, TextAnalysis}
import graft.zones.Zones

/** Crawl-ingest front end: raw WARC shard bytes → the clean document
  * table [[CurationPipeline]] consumes. The round-9 crawl operators
  * chained in their production order, each stage materialized through
  * the curated writer with its row count riding the write
  * ([[Observe.countedAction]]):
  *
  *   WARC record explode (responses only) → UTF-8 encoding gate →
  *   markup strip + character-reference decode + NFC → URL normalize +
  *   robots.txt filter + per-registered-domain cap → PII scrub
  *
  * Ordering rationale, stated once because every choice is a bug when
  * inverted: the ENCODING gate runs on raw bytes before any string op
  * (a String built from invalid UTF-8 has already replaced the evidence
  * with U+FFFD); tags are stripped BEFORE character references are
  * decoded (decoding first would turn `&lt;script&gt;` into live markup
  * and over-strip); NFC runs after decoding (references can produce
  * combining marks); PII scrubbing runs LAST so redaction sees final
  * text and nothing re-introduces a scrubbed span.
  *
  * Every stage is an independently-oracled operator (q158/q159/q82+q162/
  * q155/q151/q154/q160 families) — this driver adds composition, not new
  * correctness surface; CrawlPipelineSpec gates the composition with one
  * planted victim per stage and a ledger ≡ disk check.
  *
  * 100 TB shape: stages 1-3 and 5 are map-only (parse + codegen
  * expressions riding the scan; archive bytes never cross a shuffle);
  * stage 4's movement is the robots broadcast plus the domain-cap's one
  * domain-key exchange carrying (id, url, domain, quality) — document
  * text re-joins by id only for the capped survivors.
  */
object CrawlPipeline {

  /** Doc ids are media_id * MaxRecords + member_idx: stable, join-free,
    * and collision-free for shards under 1M records (ISO 28500 shards
    * are conventionally ~1 GB ≈ thousands of records). */
  val MaxRecords = 1000000L

  def run(spark: SparkSession, warcShards: DataFrame, robotsRules: DataFrame,
          outRoot: String, maxBadBytes: Int = 0,
          domainCap: Int = 100): CurationPipeline.Result = {
    val audits = scala.collection.mutable.ArrayBuffer.empty[CurationPipeline.StageAudit]
    def stage(name: String, df: DataFrame): DataFrame = {
      val path = s"$outRoot/$name"
      val n = Observe.countedAction(spark, df, name)(d =>
        Zones.writeCurated(d, path, partitionCols = Seq.empty,
          sortCols = Seq("doc_id"), maxRecordsPerFile = 10000000L,
          cluster = false))
      audits += CurationPipeline.StageAudit(name, n)
      spark.read.parquet(path)
    }
    chain(spark, warcShards, robotsRules, maxBadBytes, domainCap, stage)
    CurationPipeline.Result(audits.toSeq, s"$outRoot/c5_pii")
  }

  /** The five-stage transform as ONE lazy plan — no stage writes, no
    * audit ledger: the per-micro-batch form [[graft.streaming.CrawlStream]]
    * runs inside its foreachBatch (a micro-batch is already a bounded
    * materialization unit; staging it through disk five times per batch
    * would turn the stream's latency into its write amplification).
    * Identical row semantics to [[run]] — the batch stages are pure
    * materialization barriers. */
  def transform(spark: SparkSession, warcShards: DataFrame,
                robotsRules: DataFrame, maxBadBytes: Int = 0,
                domainCap: Int = 100): DataFrame =
    chain(spark, warcShards, robotsRules, maxBadBytes, domainCap,
      (_, df) => df)

  private def chain(spark: SparkSession, warcShards: DataFrame,
                    robotsRules: DataFrame, maxBadBytes: Int,
                    domainCap: Int,
                    stage: (String, DataFrame) => DataFrame): DataFrame = {
    // 1. record explode: WARC responses become candidate documents;
    // requests/metadata/warcinfo are crawler bookkeeping, not corpus
    val records = stage("c1_records", {
      import spark.implicits._
      Multimodal.extractMembers(warcShards, Multimodal.decodeWarc)
        .filter(_.method == 1) // response
        .map(m => (m.media_id * MaxRecords + m.member_idx, m.name, m.content))
        .toDF("doc_id", "url", "bytes")
    })

    // 2. encoding gate on RAW bytes, then the one sanctioned decode
    val encoded = stage("c2_encoding", records
      .withColumn("u8", Utf8StatsFn(col("bytes")))
      .filter(col("u8.n_bad_lead") + col("u8.n_stray_cont") <= maxBadBytes)
      .select(col("doc_id"), col("url"),
        col("bytes").cast("string").as("raw_text")))

    // 3. markup strip (script/style dropped, tags to spaces) → character
    // references → NFC → whitespace collapse; entity decode count kept
    // as a page-quality signal
    val texted = stage("c3_text", {
      val noScript = regexp_replace(col("raw_text"),
        "(?is)<script[^>]*>.*?</script>", " ")
      val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
      val noTags = regexp_replace(noStyle, "(?s)<[^>]*>", " ")
      encoded.withColumn("dec", HtmlEntityDecodeFn(noTags))
        .select(col("doc_id"), col("url"),
          trim(regexp_replace(NfcNormalizeFn(col("dec.decoded")),
            "\\s+", " ")).as("text"),
          col("dec.n_decoded").as("n_entities"))
        .filter(length(col("text")) > 0)
    })

    // 4. URL compliance + publisher cap: normalize, robots longest-match
    // filter, then keep the best `domainCap` docs per registered domain
    // by (text length, id) — text itself never enters the cap's shuffle
    val urled = stage("c4_urls", {
      val parsed = texted
        .withColumn("url_norm", Curation.normalizeUrl(col("url")))
        .withColumn("host", regexp_replace(regexp_replace(
          lower(regexp_extract(col("url"),
            "^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)", 1)),
          ":[0-9]+$", ""), "^www\\.", ""))
        .withColumn("domain", Curation.registeredDomain(col("host")))
        .withColumn("path", regexp_extract(col("url_norm"),
          "^[a-z][a-z0-9+.\\-]*://[^/?#]*(/[^?#]*)?", 1))
      val allowed = Curation.robotsFilter(
          parsed.select(col("doc_id"), col("domain"), col("path")),
          "doc_id", "domain", "path", robotsRules)
        .filter(col("allowed"))
        .select(col("doc_id"))
      val kept = parsed.join(allowed, "doc_id")
      val capped = Curation.domainCap(
          kept.withColumn("n_chars", length(col("text")).cast("long")),
          "url_norm", "n_chars", "doc_id", cap = domainCap)
        .select(col("doc_id"))
      kept.join(capped, "doc_id")
        .select(col("doc_id"), col("url_norm"), col("domain"),
          col("text"), col("n_entities"))
    })

    // 5. PII scrub: final text, typed redaction counts carried forward
    stage("c5_pii", TextAnalysis.piiScrub(urled, "text")
      .select(col("doc_id"), col("url_norm"), col("domain"),
        col("text_clean").as("text"), col("n_entities"),
        col("n_email") + col("n_card") + col("n_ssn") +
          col("n_phone") + col("n_ip") as "n_pii"))
  }
}
