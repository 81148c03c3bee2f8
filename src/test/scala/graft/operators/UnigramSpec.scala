package graft.operators

import graft.SparkSpec

/** Unigram-LM tokenizer training: census selection, the scaled-long
  * weight formula, Viterbi segmentation behavior (frequent substrings
  * win over char-level splits), the coverage guarantee, hard-EM
  * convergence, and the over-length raise. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  // "abab" appears often → pieces "ab"/"abab" dominate; "zq" is rare
  private def corpus = Seq(
    (1L, "abab abab abab cdcd", "s1"),
    (2L, "abab cdcd abab abab", "s1"),
    (3L, "abab abab zq cdcd", "s2"),
    (4L, "abab cdcd cdcd abab", "s2"),
  ).toDF("doc_id", "text", "source")

  test("learn output covers every candidate at every iteration, single " +
      "chars always survive selection, and counts conserve the corpus") {
    val out = Unigram.learn(corpus, "text", maxPieceLen = 4, topN = 6,
      emIters = 2).collect()
    val byIter = out.groupBy(_.getLong(0))
    assert(byIter.keySet == Set(0L, 1L, 2L))
    val pieces0 = byIter(0L).map(_.getString(1)).toSet
    // same candidate set at every iteration (smoothing keeps all alive)
    for (k <- Seq(1L, 2L))
      assert(byIter(k).map(_.getString(1)).toSet == pieces0)
    // coverage: all corpus characters present as single-char pieces
    for (c <- "abcdzq") assert(pieces0.contains(c.toString), s"missing $c")
    // Viterbi counts at iter >= 1: total characters covered equals the
    // corpus character count (every word fully segmented, exactly once)
    val chars = corpus.as[(Long, String, String)].collect()
      .map(_._2.replace(" ", "").length).sum
    for (k <- Seq(1L, 2L)) {
      val covered = byIter(k)
        .map(r => r.getString(1).length * r.getLong(2)).sum
      assert(covered == chars, s"iter $k covered $covered != $chars")
    }
  }

  test("frequent multi-char pieces win the segmentation over " +
      "char-level splits") {
    val out = Unigram.learn(corpus, "text", maxPieceLen = 4, topN = 6,
      emIters = 2).filter($"iter" === 2).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    // "abab" occurs 10 times as a word; its Viterbi count must reflect
    // a multi-char segmentation, not 4 single chars
    assert(out.getOrElse("abab", 0L) == 10L ||
      out.getOrElse("ab", 0L) >= 20L,
      s"multi-char pieces unused: $out")
    // single chars a/b carry no count once "ab(ab)" wins
    assert(out("a") == 0L && out("b") == 0L, s"char-level leak: $out")
  }

  test("encodeStats: pieces strictly below chars (compression) and " +
      "words/chars match the corpus exactly") {
    val st = Unigram.encodeStats(corpus, "text", "source",
      maxPieceLen = 4, topN = 6, emIters = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(st.keySet == Set("s1", "s2"))
    assert(st("s1")._1 == 8 && st("s2")._1 == 8) // 4 words per doc
    val chars1 = Seq("abab abab abab cdcd", "abab cdcd abab abab")
      .map(_.replace(" ", "").length).sum
    assert(st("s1")._2 == chars1)
    for ((s, (_, ch, pc)) <- st)
      assert(pc < ch, s"$s: no compression ($pc vs $ch)")
  }

  test("pruneStats: single chars always survive, exactly the top-keepN " +
      "used multi-char pieces survive, pruned mass flows to survivors " +
      "(corpus conservation), and pruned pieces count zero") {
    val out = Unigram.pruneStats(corpus, "text", maxPieceLen = 4,
      topN = 6, emIters = 2, keepN = 2).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // coverage: every single char kept
    for ((p, (kept, _, _)) <- out if p.length == 1)
      assert(kept == 1L, s"single char $p pruned")
    // exactly keepN multi-char survivors (the corpus has >= 2 used)
    val multiKept = out.filter { case (p, (k, _, _)) => p.length > 1 && k == 1L }
    assert(multiKept.size == 2, s"want 2 multi-char survivors: $multiKept")
    // survivors are the top-2 pre-prune counts among used multi-char
    val topPre = out.filter { case (p, (_, pre, _)) => p.length > 1 && pre > 0 }
      .toSeq.sortBy { case (p, (_, pre, _)) => (-pre, p) }.take(2).map(_._1).toSet
    assert(multiKept.keySet == topPre)
    // pruned pieces count zero post; conservation: post counts cover
    // the corpus character mass exactly
    for ((p, (k, _, post)) <- out if k == 0L)
      assert(post == 0L, s"pruned $p has post count")
    val chars = corpus.as[(Long, String, String)].collect()
      .map(_._2.replace(" ", "").length).sum
    val covered = out.map { case (p, (_, _, post)) => p.length * post }.sum
    assert(covered == chars, s"post-prune covered $covered != $chars")
  }

  test("deterministic: two runs produce identical outputs") {
    val a = Unigram.learn(corpus, "text", emIters = 2).collect().toSet
    val b = Unigram.learn(corpus, "text", emIters = 2).collect().toSet
    assert(a == b)
  }

  test("ccnetBuckets: gibberish scores worse than reference-like text " +
      "under the piece LM, OOV chars mark n_oov, buckets split per " +
      "source, and the whole chain is deterministic") {
    import org.apache.spark.sql.functions.{floor, lit}
    val docs = Seq(
      (1L, "abab cdcd abab cdcd abab", "src0"),
      (2L, "cdcd abab cdcd abab cdcd", "src0"),
      (3L, "abab cdcd abab cdcd", "srcA"), // fluent: reference bigrams
      (4L, "dbca adbc bdac cadb", "srcA"), // gibberish: same chars, alien order
      (5L, "abab xyxy cdcd", "srcB") // x/y never seen by src0 → OOV word
    ).toDF("doc_id", "text", "source")
    val r4 = (c: org.apache.spark.sql.Column) =>
      floor(c * 10000 + lit(0.5)) / 10000
    def run() = Unigram.ccnetBuckets(docs, "doc_id", "text", "source",
      "src0", r4, buckets = 3, maxPieceLen = 4, topN = 6, emIters = 2)
    val out = run().collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // gibberish: every piece pair falls to the backoff floor → higher
    // cross-entropy and a strictly worse bucket than its fluent sibling
    assert(out(4L).getDouble(5) > out(3L).getDouble(5),
      s"gibberish xsb ${out(4L).getDouble(5)} !> ${out(3L).getDouble(5)}")
    assert(out(4L).getLong(6) > out(3L).getLong(6))
    // OOV: 'xyxy' has no lattice path under src0's vocabulary — it
    // encodes as exactly one marker piece, counted in n_oov
    assert(out(5L).getLong(3) == 1L && out(1L).getLong(3) == 0L)
    // the marker rides the stream: doc 5 still has all three words
    // represented (abab + marker + cdcd pieces)
    assert(out(5L).getLong(2) >= 3L)
    // determinism: a second full run is bit-identical
    assert(run().collect().map(_.toSeq).toSet ==
      out.values.map(_.toSeq).toSet)
  }

  test("over-length words raise loudly inside the plan") {
    val bad = Seq((1L, "a" * 40, "s1")).toDF("doc_id", "text", "source")
    val e = intercept[Exception] {
      Unigram.learn(bad, "text", maxWordLen = 16).collect()
    }
    assert(e.getMessage != null)
  }
}
