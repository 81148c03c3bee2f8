package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("surrogateKey matches the reference's known-answer vector (C8)") {
    // FIXTURES.md B.6: base64(sha1 digest) of "12345first_tweet_idhello"
    val got = Seq(("12345", "first_tweet_id", "hello")).toDF("a", "b", "c")
      .select(TextFunctions.surrogateKey($"a", $"b", $"c").as("k"))
      .head().getString(0)
    assert(got == "ndZ/aJsTFIXIqB1vQBMM3k/JHr4=")
  }

  test("cleanTweet strips urls, quotes, RT/amp tokens, symbols; collapses ws") {
    val in = """RT "Check https://t.co/xyz this &amp; that!!  #wow""""
    val got = Seq(in).toDF("t").select(TextFunctions.cleanTweet($"t")).head().getString(0)
    assert(!got.contains("https"))
    assert(!got.contains("\""))
    assert(!got.contains("!"))
    assert(!got.matches(".*\\bRT\\b.*"))
    assert(!got.contains("  "))
    // word-interior letters survive (unlike the reference's RT-anywhere bug)
    val keep = Seq("heaRTfelt ample").toDF("t")
      .select(TextFunctions.cleanTweet($"t")).head().getString(0)
    assert(keep == "heaRTfelt ample")
  }

  test("cleanHashtags keeps only alphanumerics and whitespace (C2)") {
    val got = Seq("#Foo!! bar-9 $x").toDF("t")
      .select(TextFunctions.cleanHashtags($"t")).head().getString(0)
    assert(got == "Foo bar9 x")
  }

  test("tokens drops empties; tokenCount counts whitespace tokens") {
    val df = Seq(("a  b   c", 3), ("", 0), ("  ", 0), ("one", 1)).toDF("t", "n")
    val bad = df.filter(TextFunctions.tokenCount($"t") =!= $"n").count()
    assert(bad == 0)
  }

  test("charShingles: count = len - n + 1; short strings give empty array") {
    val got = Seq("abcdef").toDF("t")
      .select(TextFunctions.charShingles($"t", 4).as("s"))
      .head().getSeq[String](0)
    assert(got == Seq("abcd", "bcde", "cdef"))
    val short = Seq("abc").toDF("t")
      .select(TextFunctions.charShingles($"t", 4).as("s"))
      .head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("wordShingles over token array") {
    val got = Seq("a b c d").toDF("t")
      .select(TextFunctions.wordShingles(TextFunctions.tokens($"t"), 2).as("s"))
      .head().getSeq[String](0)
    assert(got == Seq("a b", "b c", "c d"))
  }

  test("fingerprint is invariant to case and whitespace runs") {
    val df = Seq(("Hello  World", "hello world"), ("a\tb", "a b")).toDF("x", "y")
    val bad = df.filter(
      TextFunctions.fingerprint($"x") =!= TextFunctions.fingerprint($"y")).count()
    assert(bad == 0)
  }

  test("bpeTokenCount splits long words and counts punctuation") {
    val got = Seq("internationalization, 42!").toDF("t")
      .select(TextFunctions.bpeTokenCount($"t").as("n")).head().getInt(0)
    // "internationalization" = 5 chunks of <=4 letters, "," , "4","2", "!"
    assert(got == 9)
  }

  test("redactPii replaces emails, IPs, and phone runs; leaves clean text alone") {
    val cases = Seq(
      ("mail bob.smith+tag@sub.example.co.uk now", "mail <EMAIL> now"),
      ("server at 192.168.001.7 fell over", "server at <IP> fell over"),
      ("call +1 (555) 010-4242 today", "call <PHONE> today"),
      ("call 555-010-4242 or 555 010 4243", "call <PHONE> or <PHONE>"),
      // email digits must not leak into a phone match; IP before phone
      ("a@b.io 10.0.0.1 +44 20 7946 0958", "<EMAIL> <IP> <PHONE>"),
      // 7-digit local forms, bare and separated
      ("reach 555-0100 or 5551234 now", "reach <PHONE> or <PHONE> now"),
      // 5-6 digit spans are NOT phones: digit count decides, not span length
      ("pages 100-200 of 2024-08", "pages 100-200 of 2024-08"),
      ("just words, and the year 2024 alone", "just words, and the year 2024 alone"),
      ("", ""),
    ).toDF("in", "want")
    val bad = cases.filter(TextFunctions.redactPii($"in") =!= $"want")
      .select(TextFunctions.redactPii($"in"), $"want")
    assert(bad.count() == 0, bad.collect().mkString("\n"))
  }

  test("stripMarkup: tags to spaces, script/style dropped, entities unescaped, ws collapsed") {
    val cases = Seq(
      ("<p>Hello <b>world</b></p>", "Hello world"),
      // tag as separator: a<br>b must stay two words
      ("a<br>b", "a b"),
      // script/style bodies are code, not prose — dropped whole, even
      // with '<' inside and mixed case
      ("x<SCRIPT type=\"a\">if (1 < 2) alert('y')</script>z", "x z"),
      ("x<style>p { color: red; }</style>z", "x z"),
      ("Q&amp;A &lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b", "Q&A <tag> \"q\" 's' a b"),
      // &amp; unescapes LAST: '&amp;lt;' is literal '&lt;', not '<'
      ("&amp;lt;", "&lt;"),
      // markup-free prose passes through (modulo ws collapse)
      ("plain  text", "plain text"),
      ("", ""),
    ).toDF("in", "want")
    val bad = cases.filter(TextFunctions.stripMarkup($"in") =!= $"want")
      .select(TextFunctions.stripMarkup($"in"), $"want")
    assert(bad.count() == 0, bad.collect().mkString("\n"))
  }
}
