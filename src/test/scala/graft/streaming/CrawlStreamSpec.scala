package graft.streaming

import graft.SparkSpec
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRow}
import graft.pipeline.CrawlPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** [[CrawlStream]] — the streaming execution mode of the crawl-ingest
  * chain. The stages are oracled individually and the batch composition
  * is gated by CrawlPipelineSpec; this spec gates the STREAM contracts:
  * single-drain equality with the batch pipeline, cross-drain standing
  * dedup + domain budget, and the crash-window repair riding the
  * [[DedupStream]] protocol unchanged. */
class CrawlStreamSpec extends SparkSpec {
  import spark.implicits._

  private def rec(wtype: String, uri: String, body: String): Array[Byte] =
    Multimodal.encodeWarcRecord(wtype, Some(uri), body.getBytes("UTF-8"))

  private def shardRow(id: Long, recs: Array[Byte]): MediaRow =
    MediaRow(id, "archive", recs, MediaMeta(0, 0, 0, "warc", 0, 0))

  private val rules = Seq(
    ("blocked.org", "disallow", "/private"),
    ("blocked.org", "allow", "/public"))

  private val proseA =
    "<p>the quick brown fox jumps over the lazy dog while the cat " +
      "watches from the warm windowsill in the afternoon sun</p>"
  private val proseB =
    "<p>completely different content about spark query engines shuffles " +
      "and the art of distributed deduplication at corpus scale</p>"
  private val proseC =
    "<p>a genuinely novel document that matches nothing else at all in " +
      "this synthetic crawl of carefully planted fixture pages</p>"

  test("single drain on an empty sink matches batch CrawlPipeline row for row") {
    val root = Files.createTempDirectory("graft-cstream-eq").toString
    // one shard exercising every stage: a robots victim, a domain-cap
    // pair (cap = 1 keeps the longer page), markup + entities + PII
    val shard =
      rec("response", "https://www.Site-A.com:443/p/x?b=2&a=1#f",
        "<html><script>var x = 1;</script>" + proseA +
          " mail bob@x.com <b>ok</b></html>") ++
      rec("request", "https://site-a.com/p/x", "GET /p/x") ++
      rec("response", "https://blocked.org/private/x", proseB) ++
      rec("response", "https://a.dup.net/a", proseB) ++
      rec("response", "https://b.dup.net/b", "<p>short</p>")
    val shards = Seq(shardRow(0L, shard))
    val rulesDf = rules.toDF("domain", "rtype", "prefix")

    val batch = CrawlPipeline.run(spark, shards.toDF(), rulesDf,
      s"$root/batch", domainCap = 1)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "url_norm", "domain", "text", "n_entities", "n_pii")
        .as[(Long, String, String, String, Long, Long)].collect().toSet
    val batchRows = canon(spark.read.parquet(batch.outPath))
    assert(batchRows.nonEmpty)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[MediaRow]
    mem.addData(shards: _*)
    CrawlStream.run(spark, mem.toDF(), rulesDf, s"$root/out",
      s"$root/sigs", s"$root/ckpt", domainCap = 1)
      .awaitTermination(120000)
    assert(canon(spark.read.parquet(s"$root/out")) == batchRows)
  }

  test("cross-drain: standing domain budget and standing dedup both bind") {
    val root = Files.createTempDirectory("graft-cstream-grow").toString
    val rulesDf = rules.toDF("domain", "rtype", "prefix")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[MediaRow]

    // drain 1: pub.net admits its one budgeted page; one novel page
    mem.addData(shardRow(1L,
      rec("response", "https://a.pub.net/a", proseA) ++
      rec("response", "https://other.io/n", proseB)))
    def drain() = CrawlStream.run(spark, mem.toDF(), rulesDf,
      s"$root/out", s"$root/sigs", s"$root/ckpt", domainCap = 1,
      threshold = 0.6).awaitTermination(120000)
    drain()
    val kept1 = spark.read.parquet(s"$root/out")
      .select("doc_id").as[Long].collect().toSet
    assert(kept1 == Set(1000000L, 1000001L), s"got $kept1")

    // drain 2: a LONGER pub.net page passes the per-batch cap but the
    // standing budget (1 admitted) must cut it; a near-dup of drain-1's
    // other.io page must fall to the standing signature probe; a novel
    // page survives
    mem.addData(shardRow(2L,
      rec("response", "https://b.pub.net/b",
        proseA + proseA) ++ // longer ⇒ wins any within-batch cap
      rec("response", "https://elsewhere.org/d",
        proseB.replace("</p>", " today</p>")) ++
      rec("response", "https://fresh.io/f", proseC)))
    drain()
    val kept2 = spark.read.parquet(s"$root/out")
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == Set(1000000L, 1000001L, 2000002L), s"got $kept2")
    // the signature table grew with exactly the admitted documents
    val sigIds = spark.read.parquet(s"$root/sigs")
      .select("id").as[Long].collect().sorted.toSeq
    assert(sigIds == Seq(1000000L, 1000001L, 2000002L), s"got $sigIds")
  }

  test("crash window: sink committed without signatures is repaired before the first batch") {
    val root = Files.createTempDirectory("graft-cstream-crash").toString
    val rulesDf = rules.toDF("domain", "rtype", "prefix")
    // simulate the crash: a clean document committed to the sink, but
    // the process died before ANY signature write (no sig table at all)
    Seq((1000000L, "https://other.io/n", "other.io",
        proseB.replaceAll("</?p>", "").trim, 0L, 0L))
      .toDF("doc_id", "url_norm", "domain", "text", "n_entities", "n_pii")
      .write.parquet(s"$root/out")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[MediaRow]
    // without the startup backfill the near-dup of the sink doc would
    // pass dedup forever; the novel page must still survive
    mem.addData(shardRow(5L,
      rec("response", "https://elsewhere.org/d",
        proseB.replace("</p>", " addendum</p>")) ++
      rec("response", "https://fresh.io/f", proseC)))
    CrawlStream.run(spark, mem.toDF(), rulesDf, s"$root/out",
      s"$root/sigs", s"$root/ckpt", domainCap = 1, threshold = 0.6)
      .awaitTermination(120000)
    val kept = spark.read.parquet(s"$root/out")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1000000L, 5000001L), s"got $kept")
    val sigIds = spark.read.parquet(s"$root/sigs")
      .select("id").as[Long].collect().sorted.toSeq
    assert(sigIds == Seq(1000000L, 5000001L), s"got $sigIds")
  }
}
