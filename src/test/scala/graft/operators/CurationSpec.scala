package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.range(0, 1000).select(col("id").as("doc_id"),
    concat(lit("doc number "), col("id")).as("text"))

  test("fimTransform: segments partition the token stream; sentinels reassemble the original") {
    val varied = spark.range(0, 300).select(col("id").as("doc_id"),
      concat(lit("alpha beta gamma delta "), col("id"),
        lit(" epsilon zeta")).as("text"))
    val out = Curation.fimTransform(varied, "doc_id", "text",
      ratePct = 100, salt = "fs").collect()
    assert(out.length == 300)
    val srcToks = varied.select(col("doc_id"),
        split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ").as("t"))
      .as[(Long, Seq[String])].collect().toMap
    var sawPsm = false; var sawSpm = false
    var sawEmptyPre = false; var sawEmptySuf = false
    for (r <- out) {
      val toks = srcToks(r.getLong(0))
      val mode = r.getString(2)
      assert(mode == "psm" || mode == "spm", s"rate 100 must transform all")
      assert(r.getInt(3) + r.getInt(4) + r.getInt(5) == toks.length,
        s"doc ${r.getLong(0)}: segment counts don't partition the tokens")
      // parse the sentinels back out and reassemble in document order
      val txt = r.getString(1)
      def between(a: String, b: String): Seq[String] = {
        val s0 = txt.indexOf(a) + a.length
        val s1 = if (b == null) txt.length else txt.indexOf(b)
        txt.substring(s0, s1).trim.split("\\s+").filter(_.nonEmpty).toSeq
      }
      val (pre, mid, suf) =
        if (mode == "psm") (between("<PRE>", "<SUF>"), between("<MID>", null),
          between("<SUF>", "<MID>"))
        else (between("<PRE>", "<MID>"), between("<MID>", null),
          between("<SUF>", "<PRE>"))
      assert(pre ++ mid ++ suf == toks,
        s"doc ${r.getLong(0)} ($mode): reassembly differs from source tokens")
      assert(pre.length == r.getInt(3) && mid.length == r.getInt(4) &&
        suf.length == r.getInt(5), s"doc ${r.getLong(0)}: counts vs parse")
      if (mode == "psm") sawPsm = true else sawSpm = true
      if (pre.isEmpty) sawEmptyPre = true
      if (suf.isEmpty) sawEmptySuf = true
      // null-skipped empty segments: never a double space
      assert(!txt.contains("  "), s"doc ${r.getLong(0)}: double space")
    }
    assert(sawPsm && sawSpm, "both layouts must occur at 300 docs")
    assert(sawEmptyPre && sawEmptySuf,
      "cut-point extremes (empty prefix/suffix) must occur")
  }

  test("fimTransform: rate 0 passes every document through verbatim; output is layout-invariant") {
    val out0 = Curation.fimTransform(docs, "doc_id", "text", ratePct = 0)
      .as[(Long, String, String, Int, Int, Int)].collect().sortBy(_._1)
    val src = docs.as[(Long, String)].collect().sortBy(_._1)
    assert(out0.forall(_._3 == "none") &&
      out0.map(r => (r._1, r._2)).toSeq == src.map(r => (r._1, r._2)).toSeq)
    assert(out0.forall(r => r._4 == 0 && r._5 == 0 && r._6 == 0))
    val a = Curation.fimTransform(docs, "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    val b = Curation.fimTransform(docs.repartition(13), "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b, "membership/cuts must not depend on partition layout")
  }

  test("packBoundaries: per-sequence index agrees with the packing rows it summarizes") {
    val varied = spark.range(0, 500).select(col("id").as("doc_id"),
      concat_ws(" ", (0 to 40).map(k =>
        when(pmod(col("id") + k, lit(41)) < pmod(col("id"), lit(37)) + 2,
          lit(s"t$k"))): _*).as("text"))
    val packed = Curation.packSequences(varied, "doc_id", "text",
      capacity = 64L, salt = "pb", shardHexChars = 1)
    val packRows = packed.as[(Long, String, Long, Long, Long)].collect()
    val idx = Curation.packBoundaries(packed, "doc_id", capacity = 64L)
      .collect()
    val bySeq = packRows.groupBy(r => (r._2, r._3))
    assert(idx.length == bySeq.size, "one index row per sequence")
    for (r <- idx) {
      val key = (r.getString(0), r.getLong(1))
      val members = bySeq(key).sortBy(m => (m._4, m._1)) // (tok_start, id)
      val bounds = r.getAs[scala.collection.Seq[Long]]("boundaries").toSeq
      val ids = r.getAs[scala.collection.Seq[Long]]("doc_ids").toSeq
      assert(bounds == members.map(_._4).toSeq, s"$key: boundaries")
      assert(ids == members.map(_._1).toSeq, s"$key: member ids")
      assert(bounds.head == 0L, s"$key: first boundary must be 0")
      assert(bounds == bounds.sorted, s"$key: boundaries must ascend")
      assert(r.getAs[Long]("fill") == members.map(_._5).sum, s"$key: fill")
      assert(r.getAs[Long]("n_docs") == members.length, s"$key: n_docs")
      assert(r.getAs[Double]("fill_frac") ==
        members.map(_._5).sum.toDouble / 64, s"$key: fill_frac")
      // capacity respected unless a single overlong doc owns the sequence
      assert(r.getAs[Long]("fill") <= 64 || members.length == 1,
        s"$key: multi-doc sequence over capacity")
    }
    assert(idx.exists(_.getAs[Long]("n_docs") > 1), "no multi-doc sequence sampled")
  }

  test("epochRepeat: copy counts match a serial sha reference; fractional rates land within quantization") {
    val in = spark.range(0, 2000).select(col("id").as("doc_id"),
      (pmod(col("id"), lit(4)) * 100 + 50).cast("int").as("pct")) // 50/150/250/350
    val out = Curation.epochRepeat(in, "doc_id", col("pct"), salt = "er")
      .as[(Long, Int, Int)].collect()
    def hashByte(id: Long): Int =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"$id:er".getBytes("UTF-8")).head & 0xff
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    var dropped = 0
    for (id <- 0L until 2000L) {
      val pct = (id % 4).toInt * 100 + 50
      val k = pct / 100 + (if (hashByte(id) < (pct % 100) * 256 / 100) 1 else 0)
      if (k == 0) { dropped += 1; assert(!byDoc.contains(id), s"doc $id: expected no copies") }
      else assert(byDoc(id) == (0 until k), s"doc $id: expected $k contiguous copies")
    }
    assert(dropped > 0, "the sub-unit regime must drop some docs")
    // per-rate totals sit within the 1/256 quantization of the cut:
    // thr = floor(50*256/100) = 128 → exactly thr/256 of docs get the
    // extra copy in expectation; at 500 docs/rate allow binomial spread
    for (r <- 0 to 3) {
      val pct = r * 100 + 50
      val n = out.count(_._2 == pct)
      val expected = 500.0 * (pct / 100 + 128.0 / 256)
      assert(math.abs(n - expected) < 60, s"rate $pct: $n vs ~$expected")
    }
    val a = Curation.epochRepeat(in, "doc_id", col("pct"), "er")
      .collect().map(_.toString).sorted.toSeq
    val b = Curation.epochRepeat(in.repartition(11), "doc_id", col("pct"), "er")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b, "copy set must not depend on partition layout")
  }

  test("lengthBucketBatches: batches are homogeneous, contiguous, and pad to their own max") {
    val varied = spark.range(0, 400).select(col("id").as("doc_id"),
      concat_ws(" ", (0 to 60).map(k =>
        when(pmod(col("id") * 7 + k, lit(61)) < pmod(col("id"), lit(55)) + 3,
          lit(s"w$k"))): _*).as("text"))
    val out = Curation.lengthBucketBatches(varied, "doc_id", "text",
      batchRows = 8, salt = "lb", edges = Seq(8, 16, 32), subBuckets = 4)
      .as[(Long, Int, Int, Int, Int, Int, Int, Int)].collect()
    assert(out.length == 400)
    for ((id, n, bucket, sub, _, _, padTo, waste) <- out) {
      val expectBucket = Seq(8, 16, 32).count(n >= _)
      assert(bucket == expectBucket, s"doc $id: bucket")
      assert(sub >= 0 && sub < 4)
      assert(waste == padTo - n && waste >= 0, s"doc $id: waste")
    }
    for (((b, s, bi), rows) <- out.groupBy(r => (r._3, r._4, r._5))) {
      assert(rows.map(_._6).sorted.toSeq == (0 until rows.length),
        s"batch ($b,$s,$bi): slots not contiguous from 0")
      assert(rows.map(_._7).distinct.length == 1 &&
        rows.head._7 == rows.map(_._2).max,
        s"batch ($b,$s,$bi): pad_to is not the batch max")
      // only the LAST batch of a (bucket, sub) may be short
      val maxBi = out.filter(r => r._3 == b && r._4 == s).map(_._5).max
      if (bi < maxBi) assert(rows.length == 8, s"batch ($b,$s,$bi): short")
    }
    // the layout's point: length-desc batching wastes less padding than
    // batching the same partitions in plain hash order
    val byPart = out.groupBy(r => (r._3, r._4))
    val hashOrderWaste = byPart.values.map { rows =>
      rows.sortBy(r => r._1).grouped(8)
        .map(g => g.map(_._2).max * g.length - g.map(_._2).sum).sum
    }.sum
    assert(out.map(_._8).sum <= hashOrderWaste,
      "length-grouped batching must not waste more than hash-order batching")
    val a = Curation.lengthBucketBatches(varied, "doc_id", "text",
      8, "lb", Seq(8, 16, 32), 4).collect().map(_.toString).sorted.toSeq
    val b = Curation.lengthBucketBatches(varied.repartition(17), "doc_id",
      "text", 8, "lb", Seq(8, 16, 32), 4).collect().map(_.toString).sorted.toSeq
    assert(a == b, "batch assignment must not depend on partition layout")
  }

  test("weightedSample matches a serial ticket-minimum reference and is layout-invariant") {
    // serial reference: identical ticket construction via MessageDigest
    def ticket(id: Long, j: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"t:$id:$j".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(12), 16)
    }
    val weights = (0L until 500L).map(id => id -> (1L + id % 5)).toMap
    val expected = weights.toSeq
      .map { case (id, w) => (id, w, (0L until w).map(ticket(id, _)).min) }
      .sortBy { case (id, _, tk) => (tk, id) }
      .take(40)
      .zipWithIndex
      .map { case ((id, w, tk), i) => (id, w, tk, i + 1L) }
    val in = weights.toSeq.toDF("doc_id", "w")
    val got = Curation.weightedSample(in, "doc_id", "w", k = 40, salt = "t")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4).toSeq
    assert(got == expected)
    val repart = Curation.weightedSample(in.repartition(13), "doc_id", "w",
      k = 40, salt = "t").as[(Long, Long, Long, Long)]
      .collect().sortBy(_._4).toSeq
    assert(repart == expected)
  }

  test("weightedSample selects proportionally to weight and rejects bad weights") {
    // two weight classes, 8:1 — among the top 200 of 2000 docs the
    // heavy class (half the docs, 8/9 of the mass) must dominate.
    // Deterministic given the hash; the margin is far outside noise.
    val in = spark.range(0, 2000).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, 8).otherwise(1).as("w"))
    val heavy = Curation.weightedSample(in, "doc_id", "w", k = 200, salt = "p")
      .filter(col("weight") === 8).count()
    assert(heavy > 150, s"heavy class won only $heavy of 200")
    val bad = spark.range(0, 5).select(col("id").as("doc_id"),
      lit(0).as("w"))
    val e = intercept[Exception] {
      Curation.weightedSample(bad, "doc_id", "w", k = 3, salt = "p").collect()
    }
    assert(e.getMessage.contains("weight out of"))
  }

  test("extractLinks takes double-quoted hrefs only, in document order") {
    val html = """<a href="https://a.com/1">x</a> <img src="https://no.com/i.png">
      |<a href='https://squote.com/'>y</a> <a data-href="https://dh.com/">z</a>
      |href="https://bare.com/at-start-of-line"
      |<A HREF="https://upper.com/">case-sensitive: no</A>
      |<a href="https://a.com/2">again</a>""".stripMargin
    val got = Curation.extractLinks(Seq((1L, html)).toDF("id", "html"),
      "id", "html").as[(Long, Long, String)].collect().sortBy(_._2).toSeq
    // bare href=" after a newline IS an href attribute form we accept
    // (preceded by non-word char); HREF uppercase is not (exact name)
    assert(got == Seq((1L, 0L, "https://a.com/1"),
      (1L, 1L, "https://bare.com/at-start-of-line"),
      (1L, 2L, "https://a.com/2")))
  }

  test("linkGraph: registered-domain endpoints, self/unparseable dropped, pages vs links") {
    val pages = Seq(
      // page 1 on spam.com links twice to the SAME publisher via two
      // different subdomains + once to b.org; self-link dropped
      (1L, "spam.com", """<a href="https://a.target.com/x"><a href="https://WWW.B.TARGET.COM:443/y">
        |<a href="https://b.org/"><a href="https://sub.spam.com/self">""".stripMargin),
      // page 2 links target.com once and carries only decoys otherwise
      (2L, "other.org", """<a href="https://target.com/z"><a href="/rel">
        |<a href="ftp://files.example.net/f">""".stripMargin),
    ).toDF("id", "dom", "html")
    val got = Curation.linkGraph(pages, "id", "dom", "html")
      .as[(String, String, Long, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      // ftp scheme parses (any scheme://); example.net is its domain
      ("other.org", "example.net", 1L, 1L),
      ("other.org", "target.com", 1L, 1L),
      ("spam.com", "b.org", 1L, 1L),
      ("spam.com", "target.com", 2L, 1L)))
  }

  test("hashSplit is exhaustive, roughly proportioned, and repartition-stable") {
    val split = docs.select(col("doc_id"),
      Curation.hashSplit(col("doc_id"), "split:42").as("s"))
    val counts = split.groupBy("s").count().as[(String, Long)]
      .collect().toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.values.sum == 1000)
    // e6/f3 cuts: expect ~898/~51/~51; allow generous binomial slack
    assert(counts("train") > 850 && counts("train") < 940)
    assert(counts("val") > 20 && counts("val") < 90)
    assert(counts("test") > 20 && counts("test") < 90)
    // membership is a function of the key alone — any partitioning of the
    // same rows yields the identical assignment (the property rand(seed)
    // does NOT have)
    val again = docs.repartition(7).select(col("doc_id"),
      Curation.hashSplit(col("doc_id"), "split:42").as("s"))
    assert(split.except(again).isEmpty && again.except(split).isEmpty)
  }

  test("shuffleKey orders deterministically and differs by salt") {
    val a = docs.orderBy(Curation.shuffleKey(col("doc_id"), "sh:1"))
      .select("doc_id").as[Long].collect()
    val b = docs.orderBy(Curation.shuffleKey(col("doc_id"), "sh:1"))
      .select("doc_id").as[Long].collect()
    val c = docs.orderBy(Curation.shuffleKey(col("doc_id"), "sh:2"))
      .select("doc_id").as[Long].collect()
    assert(a.sameElements(b))
    assert(!a.sameElements(c))
    assert(a.sorted.sameElements(c.sorted))
  }

  test("tokenChunks emits half-open windows covering exactly n_tok") {
    val df = Seq(
      (1L, "a b c d e"),   // 5 tokens, window 2 -> [0,2) [2,4) [4,5)
      (2L, "x y"),         // exact multiple -> [0,2)
      (3L, ""),            // zero tokens -> no rows
      (4L, "   "),         // whitespace only -> no rows
    ).toDF("doc_id", "text")
    val got = Curation.tokenChunks(df, "doc_id", "text", windowTokens = 2)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 2L), (1L, 1L, 2L, 4L), (1L, 2L, 4L, 5L),
      (2L, 0L, 0L, 2L)))
  }

  test("tokenChunks windows tile each document without gap or overlap") {
    val chunks = Curation.tokenChunks(docs, "doc_id", "text", 2)
    val bad = chunks.groupBy("doc_id")
      .agg(min("tok_start").as("lo"), max("tok_end").as("hi"),
        sum(col("tok_end") - col("tok_start")).as("covered"))
      .filter(col("lo") =!= 0 || col("covered") =!= col("hi"))
    assert(bad.isEmpty)
  }

  test("weightedMixture keeps all at KeepAll, none at 00, ~fraction between") {
    assert(Curation.weightedMixture(docs, col("doc_id"),
      lit(Curation.KeepAll), "mix:1").count() == 1000)
    assert(Curation.weightedMixture(docs, col("doc_id"),
      lit("00"), "mix:1").count() == 0)
    val half = Curation.weightedMixture(docs, col("doc_id"),
      lit("80"), "mix:1").count()
    assert(half > 420 && half < 580)
  }

  test("weightedMixture subsets nest as the weight grows") {
    val low = Curation.weightedMixture(docs, col("doc_id"), lit("20"), "mix:9")
    val high = Curation.weightedMixture(docs, col("doc_id"), lit("a0"), "mix:9")
    assert(low.except(high).isEmpty)
    assert(low.count() < high.count())
  }

  private def contaminationFixture = (
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),       // clean
      (3L, "sphinx of black quartz judge my vow today"),     // clean
      (4L, "a quick brown fox ran far away from here"),      // 1 hit
      (5L, ""),                                              // empty: clean
    ).toDF("doc_id", "text"),
    Seq(
      (100L, "the quick brown fox appears in benchmarks"),
      (101L, "jumps over the lazy dog again"),
    ).toDF("doc_id", "text"))

  test("contaminationStats counts distinct shared n-grams; empty/clean rows flag false") {
    val (corpus, bench) = contaminationFixture
    val got = Curation.contaminationStats(corpus, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    // doc 1 shares: "the quick brown", "quick brown fox" (bench 100) +
    // "jumps over the", "over the lazy", "the lazy dog" (bench 101) = 5
    assert(got == Seq(
      (1L, 5L, true), (2L, 0L, false), (3L, 0L, false),
      (4L, 1L, true), (5L, 0L, false)))
  }

  test("contaminationStats: hashed broadcast path is equivalent to the string path") {
    val (corpus, bench) = contaminationFixture
    val hashed = Curation.contaminationStats(corpus, bench, "doc_id", "text",
      n = 3, hashed = true)
    val strings = Curation.contaminationStats(corpus, bench, "doc_id", "text",
      n = 3, hashed = false)
    assert(hashed.except(strings).isEmpty && strings.except(hashed).isEmpty)
  }

  test("decontaminate drops exactly the contaminated rows, keeping all columns") {
    val (corpus, bench) = contaminationFixture
    val kept = Curation.decontaminate(corpus, bench, "doc_id", "text", n = 3)
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 5L))
  }

  test("native WordNgramStrings matches the declarative recipe on real data") {
    import graft.functions.TextFunctions
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
      .unionByName(Seq("", "   ", "a b", "One  Two\tTHREE four", "x y z x y z")
        .toDF("text"))
    val declarative = array_distinct(TextFunctions.wordShingles(
      TextFunctions.tokens(TextFunctions.normalizeWs($"text")), 3))
    val bad = real.select(
        graft.expressions.WordNgrams.wordNgramStrings($"text", 3).as("n"),
        declarative.as("d"))
      .filter($"n" =!= $"d")
    assert(bad.count() == 0, bad.collect().take(3).mkString("\n"))
  }

  test("native WordNgramHashes has the same gram count as the string path on real data") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bad = real.select(
        size(graft.expressions.WordNgrams.wordNgramHashes($"text", 3)).as("nh"),
        size(graft.expressions.WordNgrams.wordNgramStrings($"text", 3)).as("ns"))
      .filter($"nh" =!= $"ns")
    assert(bad.count() == 0)
  }

  test("decontaminate and contaminationStats agree on real data (different join shapes)") {
    // the two operators take different plans (semi-join short-circuit vs
    // left-join count); membership must coincide exactly
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
    val kept = Curation.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .select("doc_id")
    val clean = Curation.contaminationStats(corpus, bench, "doc_id", "text", n = 3)
      .filter(!col("contaminated")).select("doc_id")
    assert(kept.except(clean).isEmpty && clean.except(kept).isEmpty)
  }

  test("decontaminate with an empty benchmark keeps everything") {
    val (corpus, bench) = contaminationFixture
    val kept = Curation.decontaminate(corpus, bench.filter(lit(false)),
      "doc_id", "text", n = 3)
    assert(kept.count() == corpus.count())
  }

  test("bloomDecontaminate matches the exact path on the planted fixture") {
    val (corpus, bench) = contaminationFixture
    val got = Curation.bloomDecontaminate(corpus, bench, "doc_id", "text", n = 3)
    assert(got.columns.toSeq == Seq("doc_id", "text"))
    assert(got.select("doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 5L))
  }

  test("bloomDecontaminate is bit-identical to decontaminate on real data, even at absurd fpp") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
    val exact = Curation.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .select("doc_id")
    // fpp 0.5 floods the verify join with false positives; the result must
    // not move (no false negatives + exact verification)
    for (fpp <- Seq(0.01, 0.5)) {
      val bloom = Curation.bloomDecontaminate(corpus, bench, "doc_id", "text",
        n = 3, fpp = fpp).select("doc_id")
      assert(bloom.except(exact).isEmpty && exact.except(bloom).isEmpty,
        s"fpp=$fpp membership diverged")
    }
  }

  test("bloomDecontaminate: empty benchmark keeps everything; undersized expectedGrams stays exact") {
    val (corpus, bench) = contaminationFixture
    val empty = Curation.bloomDecontaminate(corpus, bench.filter(lit(false)),
      "doc_id", "text", n = 3)
    assert(empty.count() == corpus.count())
    // a wrong size hint degrades fpp, never correctness
    val tiny = Curation.bloomDecontaminate(corpus, bench, "doc_id", "text",
      n = 3, expectedGrams = 1L)
    assert(tiny.select("doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 5L))
  }

  test("tokenBudgetSample: per-source running token sum stops at the budget") {
    val df = Seq(
      (1L, "s1", "a b c"), (2L, "s1", "d e"), (3L, "s1", "f g h i"),
      (4L, "s2", "one two three four five six"),
    ).toDF("doc_id", "source", "text")
    val got = Curation.tokenBudgetSample(df, "doc_id", "text", "source",
        budget = 5L, salt = "t")
      .select("doc_id", "n_tok", "cum_tok")
      .as[(Long, Long, Long)].collect().toSet
    // s1 docs admitted in hash order until cum > 5; s2's only doc is 6
    // tokens -> over budget, excluded entirely
    val kept = got.map(_._1)
    assert(!kept.contains(4L))
    assert(got.forall(_._3 <= 5L))
    assert(kept.nonEmpty && kept.subsetOf(Set(1L, 2L, 3L)))
  }

  test("tokenBudgetSample sub-buckets: per-bucket budgets sum to the budget, admitted set is bucket-bounded and layout-independent") {
    val docs = (0L until 300L)
      .map(i => (i, if (i % 3 == 0) "s1" else "s2", "tok " * (1 + (i % 9).toInt)))
      .toDF("doc_id", "source", "text")
    val n = 8
    val budget = 100L
    val got = Curation.tokenBudgetSample(docs, "doc_id", "text", "source",
      budget, salt = "tb", subBuckets = n)
    val rows = got.select("doc_id", "source", "sub_bucket", "n_tok", "cum_tok")
      .as[(Long, String, Int, Long, Long)].collect()
    assert(rows.nonEmpty)
    // bucket ids are in range and the per-bucket running sum respects the
    // integer split: budget/n, with the first budget%n buckets one larger
    for ((_, _, b, _, cum) <- rows) {
      assert(b >= 0 && b < n)
      val perBucket = budget / n + (if (b < budget % n) 1L else 0L)
      assert(cum <= perBucket, s"bucket $b cum $cum over $perBucket")
    }
    // per-source admitted totals never exceed the full budget
    for ((_, grp) <- rows.groupBy(_._2))
      assert(grp.map(_._4).sum <= budget)
    // deterministic under a different partition layout
    val re = Curation.tokenBudgetSample(docs.repartition(7), "doc_id",
      "text", "source", budget, salt = "tb", subBuckets = n)
    assert(got.exceptAll(re).isEmpty && re.exceptAll(got).isEmpty)
    // the scale property itself: the window partitions by (source,
    // sub_bucket) — a single giant source fans out over n window tasks
    // instead of serializing through one
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("sub_bucket"), plan.take(2000))
    val winPart = "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(plan)
      .map(_.group(1)).filter(_.contains("sub_bucket"))
    assert(winPart.nonEmpty && winPart.forall(_.contains("source")),
      s"window exchange not partitioned by (source, sub_bucket): ${plan.take(2000)}")
    // subBuckets = 1 preserves the original single-window semantics
    val one = Curation.tokenBudgetSample(docs, "doc_id", "text", "source",
      budget, salt = "tb")
    val legacy = Curation.tokenBudgetSample(docs, "doc_id", "text", "source",
      budget, salt = "tb", subBuckets = 1)
    assert(one.exceptAll(legacy).isEmpty && legacy.exceptAll(one).isEmpty)
    assert(!one.columns.contains("sub_bucket"))
  }

  test("packSequences: capacity respected, offsets contiguous, membership total, layout-independent") {
    val docs = (0L until 60L).map(i => (i, "tok " * (1 + (i % 7).toInt)))
      .toDF("doc_id", "text")
    val packed = Curation.packSequences(docs, "doc_id", "text",
      capacity = 10L, salt = "p", shardHexChars = 1)
    val rows = packed.as[(Long, String, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.sameElements(0L until 60L)) // every doc packed once
    for (((_, seq), grp) <- rows.groupBy(r => (r._2, r._3))) {
      val sorted = grp.sortBy(_._4)
      // offsets are the running sum of lengths (contiguous packing)
      assert(sorted.map(_._4).sameElements(sorted.scanLeft(0L)(_ + _._5).init))
      // a sequence over capacity can only be a single oversized doc
      assert(sorted.map(_._5).sum <= 10L || sorted.length == 1)
    }
    // same packing regardless of the input's partition layout
    val re = Curation.packSequences(docs.repartition(7), "doc_id", "text",
      capacity = 10L, salt = "p", shardHexChars = 1)
    assert(packed.exceptAll(re).isEmpty && re.exceptAll(packed).isEmpty)
  }

  test("quantilePrune keeps rows at or above the per-group interpolated quantile") {
    val df = Seq(
      ("g1", 1.0), ("g1", 2.0), ("g1", 3.0), ("g1", 4.0), // median 2.5
      ("g2", 5.0),                                        // median 5.0 (on a point)
    ).toDF("grp", "score")
    val got = Curation.quantilePrune(df, "grp", "score", 0.5)
      .as[(String, Double, Double, Long)].collect().toSet
    assert(got == Set(("g1", 3.0, 2.5, 4L), ("g1", 4.0, 2.5, 4L),
      ("g2", 5.0, 5.0, 1L)))
  }

  test("quantilePrune approx mode agrees with exact on a bounded score grid") {
    // 201 rows so the exact median lands ON a data point (rank 100 = 4.0)
    // — approx_percentile returns data values, never interpolations, so
    // the two modes only coincide when the quantile is a data point
    val df = Seq.tabulate(201)(i => ("g", (i % 10).toDouble)).toDF("grp", "score")
    val exact = Curation.quantilePrune(df, "grp", "score", 0.5)
    val approx = Curation.quantilePrune(df, "grp", "score", 0.5, accuracy = 10000)
    assert(exact.count() == approx.count())
  }

  test("stridedChunks: overlap coverage, clipping, and the non-overlap special case") {
    // 10 tokens, window 4, stride 2 -> starts 0,2,4,6; last ends exactly at 10
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, "a b c"),   // shorter than the window -> one clipped chunk
      (3L, "")         // zero tokens -> no rows
    ).toDF("doc_id", "text")
    val got = Curation.stridedChunks(df, "doc_id", "text", 4, 2)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 0L, 0L, 4L), (1L, 1L, 2L, 6L), (1L, 2L, 4L, 8L), (1L, 3L, 6L, 10L),
      (2L, 0L, 0L, 3L)))
    // stride == window degenerates to tokenChunks' disjoint layout
    val disjoint = Curation.stridedChunks(df, "doc_id", "text", 4, 4)
      .select("doc_id", "chunk_idx", "tok_start", "tok_end")
      .as[(Long, Long, Long, Long)].collect().toSet
    val plain = Curation.tokenChunks(df, "doc_id", "text", 4)
      .select("doc_id", "chunk_idx", "tok_start", "tok_end")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(disjoint === plain)
  }

  test("stratifiedSample: exact k per stratum, layout-invariant, WindowGroupLimit plan") {
    val df = spark.range(500).select(col("id"),
      concat(lit("s"), pmod(col("id"), lit(3))).as("src"))
    val sampled = Curation.stratifiedSample(df, "src", "id", k = 7, salt = "t:1")
    val sizes = sampled.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(sizes.values.toSet === Set(7L) && sizes.size === 3)
    // small strata are taken whole
    val tiny = Curation.stratifiedSample(df.filter(col("id") < 2), "src", "id", 7, "t:1")
    assert(tiny.count() === 2)
    // membership is partition-layout invariant
    val re = Curation.stratifiedSample(df.repartition(11), "src", "id", 7, "t:1")
    val a = sampled.select("id").as[Long].collect().sorted.toSeq
    val b = re.select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
    // rank-limit rewrites to WindowGroupLimit: tasks forward ≤k rows per
    // group instead of sorting whole strata through the window
    assert(sampled.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("temperatureMixture: floor(scale*sqrt(n)) per source, keep-all for tiny sources, layout-invariant") {
    // sources of 400 / 100 / 9 docs: targets 2*sqrt -> 40 / 20 / 6
    val df = spark.range(509).select(col("id"),
      when(col("id") < 400, "big").when(col("id") < 500, "mid")
        .otherwise("tiny").as("src"))
    val out = Curation.temperatureMixture(df, "src", "id", scale = 2.0, salt = "t:2")
    val sizes = out.groupBy("src").count().as[(String, Long)].collect().toMap
    // alpha=1/2: a 4x bigger source contributes only 2x the docs
    assert(sizes === Map("big" -> 40L, "mid" -> 20L, "tiny" -> 6L), sizes.toString)
    // schema passthrough, no internal columns leak
    assert(out.columns.toSeq === df.columns.toSeq)
    // membership (not just counts) is partition-layout invariant
    val re = Curation.temperatureMixture(df.repartition(13), "src", "id", 2.0, "t:2")
    assert(out.select("id").as[Long].collect().sorted.toSeq ===
      re.select("id").as[Long].collect().sorted.toSeq)
    // a target beyond the source size keeps the whole source
    val all = Curation.temperatureMixture(df.filter(col("src") === "tiny"),
      "src", "id", scale = 100.0, salt = "t:2")
    assert(all.count() === 9)
  }

  test("temperatureMixture sub-buckets: split targets sum to the source target, window partitions by (source, sub_bucket)") {
    // dense sources so every hash bucket holds more rows than its split
    // target: s1 1600 docs -> target floor(2*sqrt(1600)) = 80 (8*10, no
    // remainder); s2 4800 -> 138 = 8*17 + 2 (buckets 0-1 take 18). Bucket
    // populations are ~200/~600 >> the per-bucket targets, so every
    // bucket fills and the admitted totals hit the FULL source targets —
    // the integer split Σ(floor(t/N) + [b < t%N]) = t, end to end.
    val df = spark.range(6400).select(col("id"),
      when(pmod(col("id"), lit(4)) === 0, "s1").otherwise("s2").as("src"))
    val out = Curation.temperatureMixture(df, "src", "id", scale = 2.0,
      salt = "t:3", subBuckets = 8)
    val sizes = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(sizes === Map("s1" -> 80L, "s2" -> 138L), sizes.toString)
    // schema passthrough, no internal columns leak
    assert(out.columns.toSeq === df.columns.toSeq)
    // membership is partition-layout invariant
    val re = Curation.temperatureMixture(df.repartition(13), "src", "id",
      2.0, "t:3", subBuckets = 8)
    assert(out.select("id").as[Long].collect().sorted.toSeq ===
      re.select("id").as[Long].collect().sorted.toSeq)
    // the scale property itself: the window exchange partitions by
    // (source, sub_bucket) — a giant source admits through N parallel
    // window tasks instead of serializing through one
    val plan = out.queryExecution.executedPlan.toString
    val winPart = "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(plan)
      .map(_.group(1)).filter(_.contains("__sb")).toSeq
    assert(winPart.nonEmpty && winPart.forall(_.contains("src")),
      s"window exchange not partitioned by (source, sub_bucket): ${plan.take(2000)}")
    // subBuckets = 1 (the default) is the original single-window path
    val one = Curation.temperatureMixture(df, "src", "id", 2.0, "t:3")
    val legacy = Curation.temperatureMixture(df, "src", "id", 2.0, "t:3",
      subBuckets = 1)
    assert(one.exceptAll(legacy).isEmpty && legacy.exceptAll(one).isEmpty)
  }

  test("temperatureMixture: NULL-source rows are dropped in both paths (documented contract)") {
    val df = spark.range(100).select(col("id"),
      when(col("id") < 50, "s").otherwise(lit(null)).as("src"))
    // scale large enough to keep every attributable row
    for (n <- Seq(1, 8)) {
      val out = Curation.temperatureMixture(df, "src", "id", scale = 100.0,
        salt = "t:4", subBuckets = n)
      assert(out.count() === 50, s"subBuckets=$n")
      assert(out.filter(col("src").isNull).count() === 0)
    }
  }

  private def iw(rows: Seq[(Long, String, String)],
                 target: String, buckets: Int = 1024): Map[Long, (Long, Double)] =
    Curation.importanceWeights(rows.toDF("doc_id", "text", "source"),
        "doc_id", "text", "source", target, buckets)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap

  test("importanceWeights matches a serial replay of the smoothed model") {
    import java.security.MessageDigest
    val rows = Seq(
      (1L, "alpha beta gamma alpha", "tg"),
      (2L, "beta delta", "tg"),
      (3L, "alpha beta epsilon zeta", "raw"),
      (4L, "eta theta iota", "raw"))
    val b = 64
    def grams(text: String): Seq[String] = {
      val tk = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      tk ++ tk.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
    }
    def bucket(g: String): Long = {
      val hex = MessageDigest.getInstance("SHA-256")
        .digest(g.getBytes("UTF-8")).take(6)
        .map(x => f"${x & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) % b
    }
    val all = rows.flatMap { case (id, t, s) => grams(t).map(g => (id, s, bucket(g))) }
    val cr = all.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ct = all.filter(_._2 == "tg").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tr = all.size.toLong; val tt = all.count(_._2 == "tg").toLong
    def lw(bk: Long): Double =
      math.log((ct.getOrElse(bk, 0L) + 1).toDouble / (tt + b)) -
        math.log((cr(bk) + 1).toDouble / (tr + b))
    val expected = rows.map { case (id, t, _) =>
      val gs = grams(t).map(bucket)
      id -> ((gs.size.toLong, gs.map(lw).sum))
    }.toMap
    val got = iw(rows, "tg", b)
    assert(got.keySet === expected.keySet)
    for ((id, (n, w)) <- expected) {
      assert(got(id)._1 === n, s"doc $id gram count")
      assert(math.abs(got(id)._2 - w) < 1e-9, s"doc $id weight: ${got(id)._2} vs $w")
    }
  }

  test("importanceWeights: target-vocabulary docs score positive, alien docs negative") {
    val targetDocs = (0L until 10L).map(i =>
      (i, "tw1 tw2 tw3 tw4 tw5 tw6 tw7 tw8", "tg"))
    val rawDocs = (10L until 40L).map(i =>
      (i, "rw1 rw2 rw3 rw4 rw5 rw6 rw7 rw8", "raw"))
    // a raw doc written in target vocabulary, and one in raw vocabulary
    val probes = Seq(
      (100L, "tw1 tw2 tw3 tw4 tw5 tw6", "raw"),
      (101L, "rw1 rw2 rw3 rw4 rw5 rw6", "raw"))
    val got = iw(targetDocs ++ rawDocs ++ probes, "tg")
    assert(got(100L)._2 > 0, s"target-like doc must score positive: ${got(100L)}")
    assert(got(101L)._2 < 0, s"raw-only doc must score negative: ${got(101L)}")
    assert(got(100L)._2 > got(101L)._2)
  }

  test("importanceWeights: empty documents keep a zero row") {
    val got = iw(Seq((1L, "", "raw"), (2L, "a b", "tg")), "tg")
    assert(got(1L) === ((0L, 0.0)))
    assert(got(2L)._1 === 3L) // 2 unigrams + 1 bigram
  }

  // ---- hashed linear quality classifier (q163) ----

  test("linearQualityScore matches a serial replay of the integer model") {
    import java.security.MessageDigest
    val b = 64
    val weights = Array.tabulate(b)(i => ((i * 7) % 21).toLong - 10L)
    val bias = 3L; val thrNum = 1L; val thrDen = 2L
    val rows = Seq(
      (1L, "Alpha beta  GAMMA alpha"), // case fold + ws collapse
      (2L, "beta"),                    // single token, no bigram
      (3L, ""),                        // empty: bias-only decision
      (4L, "   \t  "),                 // whitespace-only == empty
      (5L, "x y z x y z x y"))
    def bucket(g: String): Int = {
      val hex = MessageDigest.getInstance("SHA-256")
        .digest(g.getBytes("UTF-8")).take(6)
        .map(x => f"${x & 0xff}%02x").mkString
      (java.lang.Long.parseLong(hex, 16) % b).toInt
    }
    val expected = rows.map { case (id, text) =>
      val tk = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val gs = tk ++ tk.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      val n = gs.size.toLong
      val ssum = gs.map(g => weights(bucket(g))).sum
      val num = bias * math.max(n, 1L) + ssum
      id -> ((n, ssum, num, num * thrDen >= thrNum * math.max(n, 1L)))
    }.toMap
    val got = Curation.linearQualityScore(rows.toDF("doc_id", "text"),
        "doc_id", "text", weights, bias, thrNum, thrDen)
      .select("doc_id", "n_grams", "score_sum", "score_num", "keep")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(got === expected)
  }

  test("linearQualityScore agrees with the explode + weight-join reference shape") {
    import graft.functions.{KmvAggregator, TextFunctions}
    val b = 128
    val weights = Array.tabulate(b)(i => (i % 17).toLong - 8L)
    val df = spark.range(0, 200).select(col("id").as("doc_id"),
      concat(lit("tok"), (col("id") % 11).cast("string"), lit(" word "),
        (col("id") % 7).cast("string"), lit(" filler text number "),
        col("id").cast("string")).as("text"))
    val got = Curation.linearQualityScore(df, "doc_id", "text",
        weights, bias = 5L, thrNum = 3L, thrDen = 4L)
      .select("doc_id", "n_grams", "score_sum")
    // reference: the vocab-scale broadcast-join shape the scaladoc names
    val wdf = weights.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toSeq.toDF("b", "w")
    val grams = df
      .withColumn("tk", TextFunctions.tokens(TextFunctions.normalizeWs(col("text"))))
      .select(col("doc_id"),
        explode(concat(col("tk"), TextFunctions.wordShingles(col("tk"), 2))).as("g"))
      .select(col("doc_id"), pmod(KmvAggregator.kmvHash(col("g")), lit(b.toLong)).as("b"))
    val ref = grams.join(broadcast(wdf), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), sum(col("w")).as("score_sum"))
    assert(got.except(ref).isEmpty && ref.except(got).isEmpty)
  }

  test("linearQualityScore is a map-only plan — zero exchanges") {
    val out = Curation.linearQualityScore(docs, "doc_id", "text",
      Array.tabulate(32)(_.toLong - 16L), bias = 0L, thrNum = 0L, thrDen = 1L)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"classifier inference must not shuffle\n$p")
    assert(!p.contains("Generate"), s"grams must stay in the row\n$p")
  }

  // ---- weighted fair interleave (q164) ----

  private def ilCorpus(ws: Map[String, Long], m: Int) =
    ws.toSeq.sortBy(_._1).flatMap { case (s, w) =>
      (0L until m * w).map(i => (s.hashCode.toLong * 100000 + i, s))
    }.toDF("doc_id", "source")

  test("weightedInterleaveKey: every prefix is weight-proportional within the smooth-WRR bound") {
    val ws = Map("a" -> 3L, "b" -> 1L, "c" -> 2L)
    val wTot = ws.values.sum.toDouble
    for (n <- Seq(1, 4)) {
      val rows = Curation.weightedInterleaveKey(ilCorpus(ws, 30),
          "doc_id", "source", ws, subBuckets = n)
        .orderBy(col("pos_key"), col("source"), col("src_idx"))
        .select("source").as[String].collect()
      val seen = scala.collection.mutable.Map.empty[String, Int]
      for ((s, idx) <- rows.zipWithIndex) {
        seen(s) = seen.getOrElse(s, 0) + 1
        val prefix = idx + 1
        for ((src, w) <- ws) {
          val dev = math.abs(seen.getOrElse(src, 0) - prefix * w / wTot)
          assert(dev <= 1.5,
            s"subBuckets=$n prefix=$prefix source=$src deviation=$dev")
        }
      }
    }
  }

  test("weightedInterleaveKey: src_idx is a dense per-source bijection, any subBuckets") {
    val ws = Map("a" -> 2L, "b" -> 5L)
    for (n <- Seq(1, 3, 16)) {
      val got = Curation.weightedInterleaveKey(ilCorpus(ws, 8),
          "doc_id", "source", ws, subBuckets = n)
      for ((s, w) <- ws) {
        val idx = got.filter(col("source") === s)
          .select("src_idx").as[Long].collect().sorted
        assert(idx.toSeq == (0L until 8 * w), s"subBuckets=$n source=$s")
      }
    }
  }

  test("weightedInterleaveKey: layout invariance and unmapped sources dropped") {
    val ws = Map("a" -> 1L, "b" -> 4L)
    val base = ilCorpus(ws, 10)
      .unionByName(Seq((999L, "ghost")).toDF("doc_id", "source"))
    val x = Curation.weightedInterleaveKey(base, "doc_id", "source", ws, 2)
      .select("doc_id", "source", "src_idx", "pos_key")
    val y = Curation.weightedInterleaveKey(base.repartition(7),
        "doc_id", "source", ws, 2)
      .select("doc_id", "source", "src_idx", "pos_key")
    assert(x.except(y).isEmpty && y.except(x).isEmpty)
    assert(x.filter(col("source") === "ghost").count() === 0)
    // exact key formula: lcm(1,4) = 4 -> stride a=4, b=1
    val bad = x.filter(col("pos_key") =!=
      (col("src_idx") * 2 + 1) * when(col("source") === "a", 4L).otherwise(1L))
    assert(bad.count() === 0)
  }

  test("weightedInterleaveKey guard rails") {
    val df = Seq((1L, "a")).toDF("doc_id", "source")
    intercept[IllegalArgumentException] {
      Curation.weightedInterleaveKey(df, "doc_id", "source", Map("a" -> 0L))
    }
    intercept[IllegalArgumentException] {
      Curation.weightedInterleaveKey(df, "doc_id", "source", Map("a" -> 2000L))
    }
    intercept[IllegalArgumentException] { // coprime pile blows the lcm bound
      Curation.weightedInterleaveKey(df, "doc_id", "source",
        Map("a" -> 1021L, "b" -> 1019L, "c" -> 1013L))
    }
    intercept[IllegalArgumentException] {
      Curation.weightedInterleaveKey(df.withColumn("pos_key", lit(1L)),
        "doc_id", "source", Map("a" -> 1L))
    }
  }

  // ---- rendezvous shard assignment (q165) ----

  private def rvAssign(ids: Seq[Long], shards: Map[String, Int]) =
    Curation.rendezvousShard(ids.toDF("doc_id"), "doc_id", shards, "t:rv")
      .select("doc_id", "shard").as[(Long, String)].collect().toMap

  test("rendezvousShard matches a serial replay of the virtual-node argmax") {
    import java.security.MessageDigest
    val shards = Map("a" -> 1, "b" -> 2)
    def h(s: String): Long = {
      val hex = MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).take(6)
        .map(x => f"${x & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val ids = 0L until 50L
    val expected = ids.map { id =>
      val best = (for ((s, w) <- shards.toSeq; v <- 0 until w)
        yield (h(s"$id:$s:$v:t:rv"), s)).max // (score, shard) lexicographic
      id -> best._2
    }.toMap
    assert(rvAssign(ids, shards) === expected)
  }

  test("rendezvousShard: adding a shard or weight only pulls rows TO the change (minimal disruption)") {
    val ids = 0L until 2000L
    val base = rvAssign(ids, Map("a" -> 1, "b" -> 1, "c" -> 1))
    // new shard d: every changed row moved to d, nothing else moved
    val plusShard = rvAssign(ids, Map("a" -> 1, "b" -> 1, "c" -> 1, "d" -> 1))
    val movedToD = ids.count(id => base(id) != plusShard(id))
    assert(ids.forall(id => base(id) == plusShard(id) || plusShard(id) == "d"))
    assert(movedToD > 0 && movedToD < ids.size / 2) // ~1/4 expected
    // weight bump on a: every changed row moved to a
    val bumped = rvAssign(ids, Map("a" -> 2, "b" -> 1, "c" -> 1))
    assert(ids.forall(id => base(id) == bumped(id) || bumped(id) == "a"))
    // contrast: hash mod N has NO such property (documented reason for HRW)
  }

  test("rendezvousShard: shares track weights") {
    val got = rvAssign(0L until 2000L, Map("a" -> 1, "b" -> 3))
    val bShare = got.values.count(_ == "b").toDouble / got.size
    assert(math.abs(bShare - 0.75) < 0.05, s"b share $bShare")
  }

  test("rendezvousShard guard rails") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Curation.rendezvousShard(df, "doc_id", Map.empty[String, Int], "s")
    }
    intercept[IllegalArgumentException] {
      Curation.rendezvousShard(df, "doc_id", Map("a" -> 0), "s")
    }
    intercept[IllegalArgumentException] { // 5 shards x 64 = 320 vnodes > 256
      Curation.rendezvousShard(df, "doc_id",
        (1 to 5).map(i => s"s$i" -> 64).toMap, "s")
    }
    intercept[IllegalArgumentException] {
      Curation.rendezvousShard(df.withColumn("shard", lit("x")),
        "doc_id", Map("a" -> 1), "s")
    }
  }

  test("linearQualityScore guard rails") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Curation.linearQualityScore(df, "doc_id", "text", Array(1L), 0L, 0L, 1L)
    }
    intercept[IllegalArgumentException] {
      Curation.linearQualityScore(df, "doc_id", "text",
        Array(1L, (1L << 21)), 0L, 0L, 1L)
    }
    intercept[IllegalArgumentException] {
      Curation.linearQualityScore(df, "doc_id", "text",
        Array(1L, 2L), 0L, 0L, 0L) // thrDen < 1
    }
    intercept[IllegalArgumentException] {
      Curation.linearQualityScore(df.withColumn("keep", lit(true)),
        "doc_id", "text", Array(1L, 2L), 0L, 0L, 1L)
    }
  }

  // ---- URL normalization + per-domain cap (q151) ----

  private def norm(urls: String*): Seq[String] =
    urls.toSeq.toDF("u")
      .select(Curation.normalizeUrl(col("u"))).as[String].collect().toSeq

  test("normalizeUrl: every documented rule on known answers") {
    assert(norm(
      "HTTP://WWW.Site.COM:80/a/?b=2&a=1#x",  // all rules at once
      "https://Site.io:443/p",                 // default https port
      "http://host:443/p",                     // NON-default for http: kept
      "https://www.x.co.uk:8080/",             // non-default port + root slash
      "https://a.com/p/?x=1",                  // trailing slash before query
      "https://a.com/",                        // bare root
      "https://a.com/A/B?z=1&Y=2",             // path/query case preserved
    ) == Seq(
      "http://site.com/a?a=1&b=2",
      "https://site.io/p",
      "http://host:443/p",
      "https://x.co.uk:8080",
      "https://a.com/p?x=1",
      "https://a.com",
      "https://a.com/A/B?Y=2&z=1",
    ))
  }

  test("registeredDomain: ccTLD second-level heuristic and short hosts") {
    val got = Seq("a.b.site.co.uk", "x.site.com", "site.io", "localhost",
        "deep.sub.ac.jp", "co.uk")
      .toDF("h").select(Curation.registeredDomain(col("h")))
      .as[String].collect().toSeq
    assert(got == Seq("site.co.uk", "site.com", "site.io", "localhost",
      "sub.ac.jp", "co.uk"))
  }

  test("robotsFilter: longest match wins, allow wins ties, default allows, empty prefix blankets") {
    val urls = Seq(
      (1L, "d.com", "/p/12"),  // longer allow overrides shorter disallow
      (2L, "d.com", "/p/11"),  // only the disallow prefix matches
      (3L, "d.com", "/p/1"),   // exact disallow
      (4L, "d.com", "/a/x"),   // allow/disallow tie at '/a' -> allow
      (5L, "d.com", "/free"),  // no rule matches -> default allow
      (6L, "none.com", "/p/1"),// domain without rules -> default allow
      (7L, "all.com", "/any"), // empty-prefix disallow blankets the domain
      (8L, "all.com", "/ok/x"),// ...except the longer allow carve-out
    ).toDF("id", "domain", "path")
    val rules = Seq(
      ("d.com", "disallow", "/p/1"), ("d.com", "allow", "/p/12"),
      ("d.com", "allow", "/a"), ("d.com", "disallow", "/a"),
      ("all.com", "disallow", ""), ("all.com", "allow", "/ok"),
    ).toDF("domain", "rtype", "prefix")
    val got = Curation.robotsFilter(urls, "id", "domain", "path", rules)
      .select("id", "allowed", "rule").as[(Long, Boolean, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, true, "/p/12"), (2L, false, "/p/1"), (3L, false, "/p/1"),
      (4L, true, "/a"), (5L, true, ""), (6L, true, ""),
      (7L, false, ""), (8L, true, "/ok")))
  }

  test("domainCap: subdomains share the publisher key; cap ranks by (quality desc, id)") {
    val rows = Seq(
      (1L, "https://a.spam.com/x", 10L),
      (2L, "https://b.spam.com/y", 30L),
      (3L, "https://www.spam.com/z", 20L),
      (4L, "https://c.spam.com/w", 5L),
      (5L, "https://ok.org/", 1L),
    ).toDF("doc_id", "url", "quality")
    val got = Curation.domainCap(rows, "url", "quality", "doc_id", cap = 2)
      .select("doc_id", "domain", "rk").as[(Long, String, Int)]
      .collect().toSet
    assert(got == Set((2L, "spam.com", 1), (3L, "spam.com", 2),
      (5L, "ok.org", 1)))
  }

  // ---- exactStratifiedSplit (q193) ---------------------------------

  test("exactStratifiedSplit guarantees floor-exact per-stratum counts") {
    // strata sizes chosen so hashSplit could never guarantee these:
    // 7, 10, 23, 1 → train/val/test = (5,1,1), (8,1,1), (18,2,3), (0,0,1)
    val rows = (0L until 41L).map { i =>
      val src = if (i < 7) "a" else if (i < 17) "b" else if (i < 40) "c" else "d"
      (i, src)
    }.toDF("doc_id", "source")
    val got = Curation.exactStratifiedSplit(rows, "source", "doc_id",
        "xsplit:42", 80, 10)
      .groupBy("source", "split").count()
      .as[(String, String, Long)].collect()
      .map { case (s, sp, n) => (s, sp) -> n }.toMap
    def expect(n: Long): Map[String, Long] = {
      val tr = n * 80 / 100; val va = n * 90 / 100 - tr
      Map("train" -> tr, "val" -> va, "test" -> (n - n * 90 / 100))
        .filter(_._2 > 0)
    }
    val want = Map("a" -> 7L, "b" -> 10L, "c" -> 23L, "d" -> 1L).flatMap {
      case (s, n) => expect(n).map { case (sp, c) => (s, sp) -> c }
    }
    assert(got == want, s"got $got")
  }

  test("exactStratifiedSplit membership is layout-invariant and hash-ordered") {
    val rows = (0L until 200L).map(i => (i, s"s${i % 3}"))
    val a = Curation.exactStratifiedSplit(
        rows.toDF("doc_id", "source").repartition(1),
        "source", "doc_id", "xsplit:42", 80, 10)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = Curation.exactStratifiedSplit(
        rows.toDF("doc_id", "source").repartition(32),
        "source", "doc_id", "xsplit:42", 80, 10)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
    // and a different salt reshuffles membership (not a trivial id order)
    val c = Curation.exactStratifiedSplit(rows.toDF("doc_id", "source"),
        "source", "doc_id", "other:7", 80, 10)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a != c)
  }

  // ---- groupKFolds (q204) ------------------------------------------

  test("groupKFolds: whole groups per fold, snake order, serial agreement") {
    // 10 groups with distinct sizes so the snake order is data-driven
    val rows = (0L until 10L).flatMap { g =>
      (0L until (3 + g * 2)).map(j => (g * 1000 + j, s"grp$g"))
    }
    val got = Curation.groupKFolds(rows.toDF("doc_id", "source"),
        "source", 4)
      .select("doc_id", "source", "fold")
      .as[(Long, String, Long)].collect()
    // leakage law: every group lands wholly in one fold
    val byGroup = got.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
    assert(byGroup.values.forall(_.size == 1), byGroup.toString)
    // serial snake reference: size desc, sha256(group || ':gkf') hex, group
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def shaHex(s: String): String =
      md.digest((s + ":gkf").getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    val sizes = rows.groupBy(_._2).view.mapValues(_.size).toMap
    val order = sizes.keys.toSeq
      .sortBy(g => (-sizes(g), shaHex(g), g))
    val wantFold = order.zipWithIndex.map { case (g, i) =>
      val p = i % 8
      g -> (if (p < 4) p.toLong else (7 - p).toLong)
    }.toMap
    assert(byGroup.map { case (g, fs) => g -> fs.head } == wantFold)
    // every row kept, folds within range
    assert(got.length == rows.length && got.forall(r => r._3 >= 0 && r._3 < 4))
    // refuse a pre-existing fold column
    intercept[IllegalArgumentException] {
      Curation.groupKFolds(Seq((1L, "a", 0L)).toDF("doc_id", "source", "fold"),
        "source", 4)
    }
  }

  test("groupKFolds keeps null-group rows (null-safe join) and refuses k=1") {
    val rows: Seq[(Long, String)] = (0L until 6L).map(i => (i, "a")) ++
      (6L until 10L).map(i => (i, "b")) ++
      Seq((10L, null), (11L, null))
    val got = Curation.groupKFolds(rows.toDF("doc_id", "source"),
        "source", 2)
      .select("doc_id", "fold").as[(Long, Long)].collect().toMap
    // every row — including the null-source pair — lands in a fold
    assert(got.keySet == rows.map(_._1).toSet, got.toString)
    assert(got(10L) == got(11L), "null is ONE group — rows stay together")
    intercept[IllegalArgumentException] {
      Curation.groupKFolds(rows.toDF("doc_id", "source"), "source", 1)
    }
  }

  test("groupKFolds balances equal-size groups perfectly") {
    val rows = (0L until 16L).flatMap(g =>
      (0L until 5L).map(j => (g * 100 + j, s"g$g")))
    val got = Curation.groupKFolds(rows.toDF("doc_id", "source"),
        "source", 4)
      .groupBy("fold").count().as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 20L, 1L -> 20L, 2L -> 20L, 3L -> 20L), got.toString)
  }

  // ---- isotonicCalibrate (q213) ------------------------------------

  /** Serial stack PAVA (pool adjacent violators, the textbook
    * algorithm) over a score census — the reference the minimax
    * identity must equal (Robertson/Wright/Dykstra Thm 1.4.4). Block
    * means compared exactly via cross products; emitted values as the
    * same single division of exact longs the operator performs. */
  private def serialPava(census: Seq[(Long, Long, Long)]): Map[Long, Double] = {
    // census rows: (score, n, pos), ascending score
    case class Block(lo: Int, hi: Int, n: Long, pos: Long)
    val sorted = census.sortBy(_._1)
    var stack = List.empty[Block]
    for ((b, i) <- sorted.zipWithIndex) {
      var cur = Block(i, i, b._2, b._3)
      // pool while the previous block's mean exceeds the current's:
      // pos_prev * n_cur > pos_cur * n_prev (exact)
      while (stack.nonEmpty &&
          stack.head.pos * cur.n > cur.pos * stack.head.n) {
        val p = stack.head
        stack = stack.tail
        cur = Block(p.lo, cur.hi, p.n + cur.n, p.pos + cur.pos)
      }
      stack = cur :: stack
    }
    stack.flatMap { b =>
      (b.lo to b.hi).map(i =>
        sorted(i)._1 -> (b.pos.toDouble / b.n.toDouble))
    }.toMap
  }

  test("isotonicCalibrate equals serial stack PAVA exactly on random " +
      "censuses, is non-decreasing, and preserves weighted mass") {
    val rnd = new scala.util.Random(61)
    for (trial <- 1 to 4) {
      val census = (0 until 40).map { s =>
        val n = 1L + rnd.nextInt(30)
        (s.toLong, n, (0L to n).drop(rnd.nextInt(n.toInt + 1)).head)
      }
      val rows = census.flatMap { case (s, n, pos) =>
        (0L until n).map(j => (s, if (j < pos) 1L else 0L))
      }
      val got = Curation.isotonicCalibrate(
          rows.toDF("s", "y"), "s", "y")
        .select($"s", $"n", $"pos", $"cal")
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
      // exact double equality with the stack algorithm: both sides end
      // at one division of the same exact integers
      val want = serialPava(census)
      got.foreach { case (s, _, _, cal) =>
        assert(cal == want(s), s"trial $trial score $s: $cal != ${want(s)}")
      }
      // monotone law
      got.sliding(2).foreach { case Array(a, b) =>
        assert(a._4 <= b._4, s"trial $trial not monotone at ${b._1}")
      }
      // weighted mass preservation: Σ g·n = Σ pos (PAVA is a
      // projection that conserves the weighted mean) — compare in
      // exact rationals via the pooled blocks of the reference
      val totPos = census.map(_._3).sum.toDouble
      val massed = got.map { case (_, n, _, cal) => cal * n }.sum
      assert(math.abs(massed - totPos) < 1e-6 * totPos + 1e-9,
        s"trial $trial mass $massed != $totPos")
    }
    // degenerate shapes: already-isotonic input is returned verbatim;
    // anti-monotone input pools to one global block
    val iso = Seq((1L, 0L), (1L, 0L), (2L, 1L), (2L, 0L), (3L, 1L))
    val gotIso = Curation.isotonicCalibrate(iso.toDF("s", "y"), "s", "y")
      .select($"s", $"cal").as[(Long, Double)].collect().toMap
    assert(gotIso == Map(1L -> 0.0, 2L -> 0.5, 3L -> 1.0))
    val anti = Seq((1L, 1L), (2L, 0L), (3L, 0L))
    val gotAnti = Curation.isotonicCalibrate(anti.toDF("s", "y"), "s", "y")
      .select($"cal").as[Double].collect()
    assert(gotAnti.forall(_ == 1.0 / 3.0))
  }

  // ---- spanCorruption (q202) ---------------------------------------

  test("spanCorruption reassembles to the original tokens (sentinel splice law)") {
    val docs = (0L until 200L).map(i =>
      (i, (0 until (i % 25).toInt).map(j => s"w${(i + j) % 11}")
        .mkString(" ")))
    val got = Curation.spanCorruption(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Long, String, String)].collect()
    assert(got.length == docs.length)
    val sentRe = "<extra_id_(\\d+)>".r
    for ((id, nTok, nMasked, nSpans, inp, tgt) <- got) {
      val orig = docs.find(_._1 == id).get._2
        .trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      assert(nTok == orig.length, s"doc $id n_tok")
      // parse the target into sentinel-keyed runs
      var runs = Map.empty[Int, Vector[String]]
      var cur = -1
      for (tok <- tgt.split(" ").toSeq) tok match {
        case sentRe(k) => cur = k.toInt; runs += cur -> Vector()
        case w => runs += cur -> (runs(cur) :+ w)
      }
      // the paper's convention: target ends with the EMPTY sentinel K
      assert(runs.contains(nSpans.toInt) && runs(nSpans.toInt).isEmpty,
        s"doc $id final sentinel")
      // splice the runs back into the input → the original document
      val inToks = if (inp.isEmpty) Seq.empty[String] else inp.split(" ").toSeq
      val spliced = inToks.flatMap {
        case sentRe(k) => runs(k.toInt)
        case w => Seq(w)
      }
      assert(spliced == orig, s"doc $id splice")
      val maskedCount = runs.collect {
        case (k, r) if k < nSpans => r.size
      }.sum
      assert(nMasked == maskedCount, s"doc $id n_masked")
    }
    // the seed rate actually bites (≈15% seeds, mean span 2)
    val tot = got.map(_._2).sum.toDouble
    val msk = got.map(_._3).sum.toDouble
    assert(msk / tot > 0.10 && msk / tot < 0.45, s"mask rate ${msk / tot}")
    // layout invariance
    val b = Curation.spanCorruption(
        docs.toDF("doc_id", "text").repartition(32), "doc_id", "text")
      .as[(Long, Long, Long, Long, String, String)].collect().toSet
    assert(b == got.toSet)
  }

  // ---- quantileNormalize (q198) ------------------------------------

  test("quantileNormalize maps within-group ranks onto the global distribution") {
    val rows = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "a", 40L),
      (5L, "b", 100L), (6L, "b", 200L), (7L, "c", 5L))
    val got = Curation.quantileNormalize(
        rows.toDF("doc_id", "source", "score"), "source", "score", "doc_id")
      .select("doc_id", "calibrated").as[(Long, Long)].collect().toMap
    // independent serial replay of the midpoint-quantile rule
    val global = rows.map(_._3).sorted
    def cum(v: Long): Long = global.count(_ <= v).toLong
    val byGroup = rows.groupBy(_._2)
    val want = rows.map { case (id, g, _) =>
      val grp = byGroup(g).sortBy(x => (x._3, x._1))
      val r = grp.indexWhere(_._1 == id) + 1L
      val ng = grp.size.toLong
      val n = global.size.toLong
      id -> global.distinct.find(v => 2 * ng * cum(v) >= (2 * r - 1) * n).get
    }.toMap
    assert(got == want)
    // a single-row group lands on the global median
    assert(got(7L) == 30L)
    // within a group, calibration preserves the score order
    val aCal = Seq(1L, 2L, 3L, 4L).map(got)
    assert(aCal == aCal.sorted)
  }

  test("quantileNormalize is layout-invariant and refuses column collisions") {
    val rows = (0L until 300L).map(i => (i, s"s${i % 4}", (i * 37) % 50))
    def run(parts: Int): Map[Long, Long] = Curation.quantileNormalize(
        rows.toDF("doc_id", "source", "score").repartition(parts),
        "source", "score", "doc_id")
      .select("doc_id", "calibrated").as[(Long, Long)].collect().toMap
    assert(run(1) == run(32))
    intercept[IllegalArgumentException] {
      Curation.quantileNormalize(
        Seq((1L, "a", 1L, 2L)).toDF("doc_id", "source", "score", "__r"),
        "source", "score", "doc_id")
    }
  }

  test("exactStratifiedSplit refuses colliding internal columns and bad percentages") {
    val df = Seq((1L, "a", 0)).toDF("doc_id", "source", "__rn")
    intercept[IllegalArgumentException] {
      Curation.exactStratifiedSplit(df, "source", "doc_id", "s", 80, 10)
    }
    intercept[IllegalArgumentException] {
      Curation.exactStratifiedSplit(
        Seq((1L, "a")).toDF("doc_id", "source"),
        "source", "doc_id", "s", 80, 30)
    }
  }
}
