package graft.pipeline

import graft.SparkSpec
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRow}
import java.nio.file.Files

/** [[CrawlPipeline]] — composition gate: one WARC shard whose records
  * plant exactly one victim per stage, so the audit ledger is fully
  * predictable and a regression in any stage shifts a specific count.
  * The operators are oracled individually (q158/q159/q162/q155/q151/
  * q154/q160); this spec gates the CHAIN and its ordering contracts
  * (encoding gate on raw bytes, strip-before-decode, PII last).
  */
class CrawlPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def rec(wtype: String, uri: String, body: String): Array[Byte] =
    Multimodal.encodeWarcRecord(wtype, Some(uri), body.getBytes("UTF-8"))

  private val pageHtml =
    "<html><script>var x = 1;</script><p>Caf&eacute; &amp; tea</p> " +
      "mail bob@x.com <b>ok</b></html>"

  private def shard: Array[Byte] =
    // idx 0: the reference survivor — markup, entities, PII, messy URL
    rec("response", "https://www.Site-A.com:443/p/x?b=2&a=1#f", pageHtml) ++
    // idx 1: c1 victim — request records are crawler bookkeeping
    rec("request", "https://site-a.com/p/x", "GET /p/x") ++
    // idx 2: c2 victim — stray continuation byte in the payload
    Multimodal.encodeWarcRecord("response", Some("https://enc.org/bad"),
      "ok text ".getBytes("UTF-8") ++ Array(0x80.toByte)) ++
    // idx 3: c4 robots victim — path under the disallowed prefix
    rec("response", "https://blocked.org/private/x", "<p>secret prose</p>") ++
    // idx 4+5: c4 cap victims — same registered domain via two
    // subdomains, cap=1 keeps the longer text (a.dup.net)
    rec("response", "https://a.dup.net/a",
      "<p>long article body with many words of real prose</p>") ++
    rec("response", "https://b.dup.net/b", "<p>short</p>") ++
    // idx 6: c3 victim — nothing but markup, empty after stripping
    rec("response", "https://empty.io/only-tags", "<div><br/></div>")

  private def shards = Seq(
    MediaRow(0L, "archive", shard, MediaMeta(7, 0, 0, "warc", 0, 0))).toDF()

  private def rules = Seq(
    ("blocked.org", "disallow", "/private"),
    ("blocked.org", "allow", "/public"),
  ).toDF("domain", "rtype", "prefix")

  test("one planted victim per stage; ledger matches disk; ordering contracts hold") {
    val out = Files.createTempDirectory("crawlpipe").toString
    val r = CrawlPipeline.run(spark, shards, rules, out, domainCap = 1)
    // ledger: 7 records -> 6 responses -> 5 valid-utf8 -> 4 with text ->
    // 2 after robots+cap -> 2 scrubbed
    assert(r.audits.map(a => (a.stage, a.rows)) == Seq(
      ("c1_records", 6L), ("c2_encoding", 5L), ("c3_text", 4L),
      ("c4_urls", 2L), ("c5_pii", 2L)))
    val fin = spark.read.parquet(r.outPath)
      .select("doc_id", "url_norm", "domain", "text", "n_entities", "n_pii")
      .as[(Long, String, String, String, Int, Long)]
      .collect().sortBy(_._1).toSeq
    // ledger ≡ disk
    assert(fin.length == 2)
    // the survivor: URL normalized (case, default port, www, fragment,
    // query sort), markup stripped BEFORE entity decode, é arrives NFC,
    // the email is typed-redacted, counts carried
    assert(fin.head == ((0L, "https://site-a.com/p/x?a=1&b=2", "site-a.com",
      "Café & tea mail <EMAIL> ok", 2, 1L)))
    // the cap winner: longer text on the shared registered domain
    assert(fin(1)._2 == "https://a.dup.net/a" && fin(1)._3 == "dup.net")
    assert(fin(1)._4 == "long article body with many words of real prose")
  }

  test("encoding gate runs on raw bytes: relaxing maxBadBytes admits the victim") {
    val out = Files.createTempDirectory("crawlpipe2").toString
    val r = CrawlPipeline.run(spark, shards, rules, out, maxBadBytes = 1,
      domainCap = 1)
    assert(r.audits.map(a => (a.stage, a.rows)) == Seq(
      ("c1_records", 6L), ("c2_encoding", 6L), ("c3_text", 5L),
      ("c4_urls", 3L), ("c5_pii", 3L)))
    // the admitted doc decoded with U+FFFD replacing the stray byte
    val enc = spark.read.parquet(s"$out/c5_pii")
      .filter($"domain" === "enc.org").select("text").as[String].head()
    assert(enc == "ok text �")
  }
}
