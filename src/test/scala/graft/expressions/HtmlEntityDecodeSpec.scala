package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlEntityDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def dec(ss: String*): Seq[(String, Int)] =
    ss.toSeq.toDF("s").select(HtmlEntityDecodeFn(col("s")).as("d"))
      .select("d.*").as[(String, Int)].collect().toSeq

  test("named, decimal, and hex references decode; counts are per-reference") {
    assert(dec(
      "fish &amp; chips &lt;b&gt;",
      "caf&eacute; vs &#233; vs &#xE9; vs &#XE9;",
      "&nbsp;&szlig;&hellip;",
      "snow &#9731; &#x2603; emoji &#x1F600;",
    ) == Seq(
      ("fish & chips <b>", 3),
      ("café vs é vs é vs é", 4),
      (" ß…", 3),
      ("snow ☃ ☃ emoji 😀", 3)))
  }

  test("single pass: decoded output is never re-scanned") {
    assert(dec("&amp;amp;", "&amp;#65;") == Seq(("&amp;", 1), ("&#65;", 1)))
  }

  test("lossless defaults: unknown names, bare ampersands, invalid code points stay verbatim") {
    assert(dec(
      "AT&T and R&D; etc",
      "&unknown; &gt &#; &#x;",
      "&#xD800; &#55296; &#x110000; &#1114112;",
      "trailing &",
      "",
    ) == Seq(
      ("AT&T and R&D; etc", 0),
      ("&unknown; &gt &#; &#x;", 0),
      ("&#xD800; &#55296; &#x110000; &#1114112;", 0),
      ("trailing &", 0),
      ("", 0)))
  }

  test("null propagates; SQL registration works") {
    val got = Seq((1L, "&amp;"), (2L, null)).toDF("id", "s")
      .select(HtmlEntityDecodeFn(col("s"))).collect()
      .map(r => r.isNullAt(0)).toSeq
    assert(got == Seq(false, true))
    graft.GraftExtensions.register(spark)
    assert(spark.sql("SELECT html_entity_decode('&copy; 2026').decoded")
      .as[String].head() == "© 2026")
  }
}
