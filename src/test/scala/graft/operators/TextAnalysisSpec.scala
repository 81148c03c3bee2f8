package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("languageId picks the language with the strongest stopword overlap") {
    val df = Seq(
      ("the cat sat on the mat and it is happy", "en"),
      ("el perro y la casa de los amigos se ven por la ventana", "es"),
      ("der hund und die katze sind nicht von den leuten", "de"),
      ("le chat et les amis de la maison est une merveille", "fr"),
      ("zxqv qqq www", "und"),
    ).toDF("text", "want")
    val bad = df.filter(TextAnalysis.languageId($"text") =!= $"want").count()
    assert(bad == 0)
  }

  test("qualityScore is in [0,1]; clean prose beats junk") {
    val rows = Seq(
      "The quick brown fox jumps over the lazy dog and it is a fine day for running in the park with friends.",
      "!!!! ???? ....",
      "",
    ).toDF("text").select(TextAnalysis.qualityScore($"text").as("q"))
      .as[Double].collect()
    assert(rows.forall(q => q >= 0 && q <= 1))
    assert(rows(0) > rows(1))
  }

  test("tokenCount and bpeTokenCount are monotone on concatenation") {
    val a = "some reasonable text here"
    val row = Seq((a, a + " plus more words")).toDF("x", "y")
      .select(TextAnalysis.tokenCount($"x").as("tx"),
        TextAnalysis.tokenCount($"y").as("ty"),
        TextAnalysis.bpeTokenCount($"x").as("bx"),
        TextAnalysis.bpeTokenCount($"y").as("by"))
      .head()
    assert(row.getInt(0) < row.getInt(1))
    assert(row.getInt(2) < row.getInt(3))
  }

  test("native TextStats matches the declarative references on real data") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"text")
      .unionByName(Seq("", "   ", "el la de !!", "x").toDF("text"))
    val bad = docs.select(
        TextAnalysis.languageId($"text").as("n_lang"),
        TextAnalysis.languageIdDeclarative($"text").as("d_lang"),
        TextAnalysis.qualityScore($"text").as("n_q"),
        TextAnalysis.qualityScoreDeclarative($"text").as("d_q"),
        TextAnalysis.bpeTokenCount($"text").as("n_bpe"),
        graft.functions.TextFunctions.bpeTokenCount($"text").as("d_bpe"))
      .filter($"n_lang" =!= $"d_lang" || $"n_q" =!= $"d_q" || $"n_bpe" =!= $"d_bpe")
    assert(bad.count() == 0, bad.collect().take(3).mkString("\n"))
  }

  test("annotate adds the full analysis column set") {
    val df = TextAnalysis.annotate(Seq((1L, "the cat is happy")).toDF("id", "text"), "text")
    val cols = df.columns.toSet
    assert(Set("lang_pred", "quality", "n_tokens", "n_bpe_tokens", "fp").subsetOf(cols))
  }

  test("native RepetitionStats matches the declarative reference on real data") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"text")
      .unionByName(Seq("", "   ", "a b a b a b", "x", "Tab\tand\nnewline  runs")
        .toDF("text"))
    val bad = docs.select(
        TextAnalysis.repetitionStats($"text").as("n"),
        TextAnalysis.repetitionStatsDeclarative($"text").as("d"))
      .filter($"n.n_tok" =!= $"d.n_tok" || $"n.n_uniq_tok" =!= $"d.n_uniq_tok" ||
        $"n.ttr" =!= $"d.ttr" || $"n.uniq_2gram_frac" =!= $"d.uniq_2gram_frac")
    assert(bad.count() == 0, bad.collect().take(3).mkString("\n"))
  }

  test("repetitionStats: known values, degenerate loops score low") {
    val df = Seq(
      (1L, "a b a b a b"),          // 6 tok, 2 uniq; 5 2-grams, 2 uniq
      (2L, "one two three four"),   // all distinct: ttr=1, grams distinct
      (3L, ""),                     // empty: all zeros
      (4L, "word"),                 // single token: no 2-grams
    ).toDF("doc_id", "text")
    val st = TextAnalysis.repetitionStats(col("text"))
    val got = df.select(col("doc_id"), st.getField("n_tok"),
        st.getField("n_uniq_tok"), st.getField("ttr"),
        st.getField("uniq_2gram_frac"))
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 6L, 2L, 0.3333, 0.4)))
    assert(got(2L) == ((2L, 4L, 4L, 1.0, 1.0)))
    assert(got(3L) == ((3L, 0L, 0L, 0.0, 0.0)))
    assert(got(4L) == ((4L, 1L, 1L, 1.0, 0.0)))
  }

  test("boilerplateNgrams counts each gram once per doc, ordered (freq desc, gram)") {
    val df = Seq(
      (1L, "click here to continue click here to continue"), // dup inside one doc
      (2L, "click here to continue reading more"),
      (3L, "click here to unsubscribe now"),
      (4L, "totally unrelated content entirely"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.boilerplateNgrams(df, "text", n = 3, topK = 3)
      .as[(String, Long)].collect().toSeq
    // "click here to" in docs 1,2,3 = 3 (doc 1 counts ONCE despite repeat);
    // "here to continue" in docs 1,2 = 2; ties at 1 broken by gram asc
    assert(got.head == (("click here to", 3L)))
    assert(got(1) == (("here to continue", 2L)))
    assert(got(2)._2 == 1L)
  }

  test("lineDedup removes cross-doc frequent lines, preserves order, drops all-boilerplate docs") {
    val df = Seq(
      (1L, "UNIQUE OPENING\nSubscribe to our newsletter\nreal content one"),
      (2L, "Subscribe to our newsletter\nreal content two\nAnother unique line"),
      (3L, "Subscribe to our newsletter"),                    // only boilerplate
      (4L, "solo doc untouched\nwith two lines"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lineDedup(df, "doc_id", "text", minDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "UNIQUE OPENING\nreal content one")
    assert(got(2L) == "real content two\nAnother unique line")
    assert(!got.contains(3L)) // every line was boilerplate
    assert(got(4L) == "solo doc untouched\nwith two lines")
  }

  test("lineDedup matches on normalized lines (case/whitespace-insensitive)") {
    val df = Seq(
      (1L, "Cookie   Notice\nbody a"),
      (2L, "cookie notice\nbody b"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lineDedup(df, "doc_id", "text", minDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "body a", 2L -> "body b"))
  }

  test("tfidf: known tf/df/weight values; everywhere-tokens weigh zero") {
    val df = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidf(df, "doc_id", "text")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got((1L, "a")) == ((2L, 2L, 0.0)))       // ln(2/2) = 0
    assert(got((2L, "a")) == ((1L, 2L, 0.0)))
    assert(got((1L, "b")) == ((1L, 1L, math.log(2.0))))
    assert(got((2L, "c")) == ((1L, 1L, math.log(2.0))))
    assert(got.size == 4)
  }

  test("tokenEntropy: uniform distribution hits ln(V); single-token source hits 0") {
    val df = Seq(
      ("u", "a b c d"),       // 4 distinct tokens, tf=1 each -> H = ln 4
      ("z", "x x x x")        // one token -> H = 0
    ).toDF("source", "text")
    val got = TextAnalysis.tokenEntropy(df, "text", "source")
      .select("source", "n_tok", "n_vocab", "entropy")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("u")._2 === 4L && got("u")._3 === 4L)
    assert(math.abs(got("u")._4 - math.log(4.0)) < 1e-12)
    assert(got("z")._3 === 1L && math.abs(got("z")._4) < 1e-12)
  }

  test("vocabOverlap: known Jaccard between small vocabularies") {
    val df = Seq(
      ("s1", "a b c"), ("s2", "b c d"), ("s3", "x")
    ).toDF("source", "text")
    val got = TextAnalysis.vocabOverlap(df, "text", "source")
      .select("g_a", "g_b", "n_common", "jaccard")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // {a,b,c} vs {b,c,d}: common 2 of 4 -> 0.5; s3 is disjoint (no row)
    assert(got((("s1"), ("s2"))) === ((2L, 0.5)))
    assert(!got.contains(("s1", "s3")) && !got.contains(("s2", "s3")))
  }

  test("tokenHistogram: correct bins, counts conserve docs, shares sum to 1 per group") {
    // 2, 3, 150, and 250 tokens → bins 0, 0, 100, 200 at width 100
    val df = Seq(
      ("s1", "a b"), ("s1", "a b c"),
      ("s1", Seq.fill(150)("t").mkString(" ")),
      ("s2", Seq.fill(250)("t").mkString(" "))
    ).toDF("source", "text")
    val h = TextAnalysis.tokenHistogram(df, "text", "source", 100)
    val got = h.select("source", "bin_lo", "n_docs")
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("s1", 0L, 2L), ("s1", 100L, 1L), ("s2", 200L, 1L)))
    val shares = h.groupBy("source").agg(sum("share").as("s"))
      .as[(String, Double)].collect().toMap
    assert(shares.values.forall(s => math.abs(s - 1.0) < 1e-12))
  }

  test("piiScrub: every type redacts; precedence and boundary decoys hold") {
    val rows = Seq(
      (1L, "write bob.smith+x@sub.mail.co today"),
      (2L, "cards 4111 1111 1111 1234 and 4111-1111-1111-9999"),
      (3L, "ssn 123-45-6789 phone 555-123-4567 cell (555) 123-4567"),
      (4L, "ip 192.168.0.1 version 1.2.3.4000 run 123-456-78901"),
      (5L, "nothing here"),
    ).toDF("id", "text")
    val got = TextAnalysis.piiScrub(rows, "text")
      .select("id", "text_clean", "n_email", "n_card", "n_ssn", "n_phone", "n_ip")
      .as[(Long, String, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "write <EMAIL> today", 1L, 0L, 0L, 0L, 0L),
      // 16-digit groups are ONE card each — never also ssn/phone
      (2L, "cards <CARD> and <CARD>", 0L, 2L, 0L, 0L, 0L),
      (3L, "ssn <SSN> phone <PHONE> cell <PHONE>", 0L, 0L, 1L, 2L, 0L),
      // version octet "4000" and 5-digit tail both fail the boundary
      (4L, "ip <IP> version 1.2.3.4000 run 123-456-78901", 0L, 0L, 0L, 0L, 1L),
      (5L, "nothing here", 0L, 0L, 0L, 0L, 0L)))
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.piiScrub(rows.withColumn("n_email", lit(1)), "text")
    }
    assert(e.getMessage.contains("n_email"))
  }

  test("blocklistFilter: word boundaries, phrase entries, occurrence vs distinct counts") {
    val list = Seq("bad", "worse", "very bad")
    val df = Seq(
      (1L, "bad bad things and a very bad day"),  // bad x2(+1 in phrase), very bad x1
      (2L, "badge and badlands pass"),            // substrings must NOT match
      (3L, "a perfectly clean document"),
      (4L, "WORSE,")                               // punct glues: "worse," is not "worse"
    ).toDF("doc_id", "text")
    val got = TextAnalysis.blocklistFilter(df, "doc_id", "text", list)
      .select("doc_id", "n_hits", "n_terms", "keep")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // doc 1: unigram "bad" occurs 3x (incl. inside the phrase span —
    // occurrence counting is per-view), phrase "very bad" once -> 4 hits,
    // 2 distinct entries
    assert(got(1L) === ((1L, 4L, 2L, false)))
    assert(got(2L) === ((2L, 0L, 0L, true)), "no substring matches")
    assert(got(3L) === ((3L, 0L, 0L, true)))
    assert(got(4L) === ((4L, 0L, 0L, true)), "tokenization is whitespace, not punct-aware")
  }

  test("blocklistFilter: overlapping bigram occurrences each count") {
    val df = Seq((1L, "row scan row scan")).toDF("doc_id", "text")
    // bigrams: "row scan", "scan row", "row scan" -> 2 phrase hits
    val got = TextAnalysis.blocklistFilter(df, "doc_id", "text",
        Seq("row scan")).select("n_hits", "n_terms")
      .as[(Long, Long)].head()
    assert(got === ((2L, 1L)))
  }

  test("blocklistFilter rejects malformed lists") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklistFilter(df, "doc_id", "text", Seq("Upper"))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklistFilter(df, "doc_id", "text", Seq("three word phrase"))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklistFilter(df, "doc_id", "text", Seq.empty)
    }
  }

  test("pmiCollocations: hand-computed counts and ln ratio on a pinned corpus") {
    // corpus: "a b a b" + "a c" -> tokens N=6: a x3, b x2, c x1
    // bigrams: (a b) x2, (b a) x1, (a c) x1
    val df = Seq("a b a b", "a c").toDF("text")
    val got = TextAnalysis.pmiCollocations(df, "text", minCount = 1L)
      .select("w1", "w2", "c_ab", "c_a", "c_b", "pmi")
      .as[(String, String, Long, Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got(("a", "b")) === (("a", "b", 2L, 3L, 2L,
      math.log(2.0 * 6 / (3.0 * 2)))))
    assert(got(("b", "a")) === (("b", "a", 1L, 2L, 3L,
      math.log(1.0 * 6 / (2.0 * 3)))))
    assert(got(("a", "c")) === (("a", "c", 1L, 3L, 1L,
      math.log(1.0 * 6 / (3.0 * 1)))))
    assert(got.size === 3)
  }

  test("pmiCollocations: glued rare pair outranks a frequent-by-chance pair") {
    // "new york" always together (rare but glued); "of the" frequent but
    // both words everywhere -> PMI(new york) > PMI(of the)
    val docs = Seq.fill(5)("new york") ++
      Seq.fill(10)("of the") ++ Seq.fill(10)("the of") ++
      Seq.fill(10)("of x") ++ Seq.fill(10)("the y")
    val got = TextAnalysis.pmiCollocations(docs.toDF("text"), "text", 1L)
      .select("w1", "w2", "pmi")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("new", "york")) > got(("of", "the")))
  }

  test("pmiCollocations: minCount cuts below-threshold pairs") {
    val df = Seq("a b a b a b", "c d").toDF("text")
    val got = TextAnalysis.pmiCollocations(df, "text", minCount = 3L)
      .select("w1", "w2").as[(String, String)].collect().toSet
    assert(got === Set(("a", "b")))
  }

  // ---- Aho-Corasick multi-pattern scan (q150) ----

  test("AhoCorasick counts the textbook he/she/his/hers matches in 'ushers'") {
    val ac = graft.functions.AhoCorasick.build(Seq("he", "she", "his", "hers"))
    // ushers: "she" ends at 3, "he" ends at 3 (suffix of she), "hers" at 5
    assert(ac.scan("ushers") == ((3L, 3)))
    assert(ac.scan("his hers") == ((3L, 3))) // his@0, he@4, hers@4
  }

  test("AhoCorasick counts overlapping and self-overlapping occurrences") {
    val ac = graft.functions.AhoCorasick.build(Seq("aa"))
    assert(ac.scan("aaaa") == ((3L, 1)))
    val nested = graft.functions.AhoCorasick.build(Seq("a", "aa", "aaa"))
    assert(nested.scan("aaaa") == ((4L + 3L + 2L, 3)))
    val spaced = graft.functions.AhoCorasick.build(Seq("a a"))
    assert(spaced.scan("a a a a") == ((3L, 1)))
  }

  test("AhoCorasick agrees with brute-force counting on a pinned pseudo-random corpus") {
    val pats = Seq("ab", "ba", "aab", "bba", "abab", "b", "aaa")
    val ac = graft.functions.AhoCorasick.build(pats)
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 50) {
      val txt = Array.fill(200)(if (rnd.nextBoolean()) 'a' else 'b').mkString
      var brute = 0L
      val seen = scala.collection.mutable.Set[String]()
      for (p <- pats; j <- 0 to txt.length - p.length
           if txt.regionMatches(j, p, 0, p.length)) {
        brute += 1; seen += p
      }
      assert(ac.scan(txt) == ((brute, seen.size)), s"mismatch on $txt")
    }
  }

  test("multiPatternScan: keep semantics, case folding, and empty-text safety") {
    val df = Seq(
      (1L, "The TABLE has a tablet"),   // 'table' x2 (in tablet too), 'le' x2
      (2L, "nothing here"),
      (3L, ""),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.multiPatternScan(df, "doc_id", "text",
        Seq("table", "le"))
      .orderBy("doc_id")
      .select("doc_id", "n_hits", "n_patterns", "keep")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((1L, 4L, 2L, false), (2L, 0L, 0L, true), (3L, 0L, 0L, true)))
  }

  test("multiPatternScan carries a non-numeric id column through untouched") {
    // string/UUID-style ids must survive: the id field rides the row
    // encoder, no long cast anywhere (ANSI mode would throw on one)
    val df = Seq(
      ("doc-aa11", "the table is set"),
      ("7f9e-uuid-like", "nothing here")).toDF("doc_id", "text")
    val got = TextAnalysis.multiPatternScan(df, "doc_id", "text", Seq("table"))
      .orderBy("doc_id")
      .select("doc_id", "n_hits", "keep")
      .as[(String, Long, Boolean)].collect().toSeq
    assert(got == Seq(("7f9e-uuid-like", 0L, true), ("doc-aa11", 1L, false)))
  }

  test("scriptMix: per-script character counts, the confusable spoof, and the mixed verdict") {
    val df = Seq(
      (1L, "hello world"),            // Latin only
      (2L, "pаypal login"),      // Cyrillic а inside a Latin token
      (3L, "中文 test"),      // Han + Latin
      (4L, "123 !!! \n"),             // no script at all
      (5L, "αβγ"),     // Greek only
      (6L, "مرحبا")) // Arabic only
      .toDF("doc_id", "text")
    val got = TextAnalysis.scriptMix(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_latin", "n_cyrillic", "n_greek", "n_han",
        "n_arabic", "n_scripts", "mixed")
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSeq
    assert(got == Seq(
      (1L, 10L, 0L, 0L, 0L, 0L, 1L, false),
      (2L, 10L, 1L, 0L, 0L, 0L, 2L, true),
      (3L, 4L, 0L, 0L, 2L, 0L, 2L, true),
      (4L, 0L, 0L, 0L, 0L, 0L, 0L, false),
      (5L, 0L, 0L, 3L, 0L, 0L, 1L, false),
      (6L, 0L, 0L, 0L, 0L, 5L, 1L, false)))
  }

  test("vocabCoverage: hand-computed curve with deterministic tie order") {
    // a:4 b:2 c:1 d:1 -> total 8, vocab 4; ranks a=1 b=2 c=3 d=4
    val df = Seq((1L, "a a A b"), (2L, "a  b c"), (3L, "d")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(df, "text", Seq(50, 75, 80, 100))
      .orderBy("pct")
      .select("pct", "vocab_rank", "covered_tok", "total_tok", "total_vocab")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (50L, 1L, 4L, 8L, 4L),   // a alone covers exactly 50%
      (75L, 2L, 6L, 8L, 4L),   // a+b cover exactly 75%
      (80L, 3L, 7L, 8L, 4L),   // needs c (ties c/d break by token asc)
      (100L, 4L, 8L, 8L, 4L)))
  }

  test("vocabCoverage rejects bad percent lists") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.vocabCoverage(df, "text", Seq(0))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.vocabCoverage(df, "text", Seq(50, 50))
    }
  }

  test("scriptMix rejects column collisions") {
    val df = Seq((1L, "x")).toDF("doc_id", "text").withColumn("mixed", lit(1))
    intercept[IllegalArgumentException] {
      TextAnalysis.scriptMix(df, "doc_id", "text")
    }
  }
}
