package graft.operators

import graft.SparkSpec

/** Contracts of BPE merge learning (q120's engine). The oracle replays
  * the full 6-round evolution on the documents corpus; this spec pins
  * the semantics on corpora small enough to verify by hand: the
  * textbook merge sequence, the documented single-scan replace
  * semantics on repeated pairs, layout invariance of the winner order,
  * and the symbol-count accounting identity. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def learn(texts: Seq[String], rounds: Int) =
    Bpe.learnMerges(texts.toDF("text"), "text", rounds)
      .as[(Int, String, String, String, Long, Long, Long)].collect().toSeq

  test("textbook corpus learns the expected first merges") {
    // 'low' x3, 'lower' x2, 'newest' x1 — pair counts round 1:
    // (l,o)=5, (o,w)=5, (w,</w>)=3, (w,e)=2, (e,r)=2, (r,</w>)=2,
    // (n,e)=1, (e,w)=1, (e,s)=1, (s,t)=1, (t,</w>)=1
    // winner = (l,o) by the lexicographic tiebreak against (o,w)
    val rows = learn(Seq("low low low lower", "lower newest"), 2)
    val r1 = rows.find(_._1 == 1).get
    assert((r1._2, r1._3, r1._4, r1._5) == ("l", "o", "lo", 5L))
    // round 2: (lo,w)=5 is now the unique max
    val r2 = rows.find(_._1 == 2).get
    assert((r2._2, r2._3, r2._4, r2._5) == ("lo", "w", "low", 5L))
  }

  test("single-scan replace semantics: an immediate pair run merges once per scan") {
    // 'aaa' = a a a </w>; (a,a) counts twice but replace merges only the
    // first occurrence: ' a a a ' -> ' aa a ' (the documented contract)
    val rows = learn(Seq("aaa"), 1)
    val r1 = rows.head
    assert((r1._2, r1._3, r1._5) == ("a", "a", 2L))
    // after the merge: aa a </w> = 3 symbols (not 2)
    assert(r1._7 == 3L)
  }

  test("winner selection is layout invariant") {
    val texts = (0 until 500).map(i => s"token$i alpha beta gamma alpha")
    val a = Bpe.learnMerges(texts.toDF("text").repartition(1), "text", 3)
      .collect().toSeq.map(_.toSeq)
    val b = Bpe.learnMerges(texts.toDF("text").repartition(32), "text", 3)
      .collect().toSeq.map(_.toSeq)
    assert(a == b)
  }

  test("symbol accounting: each round removes at most pair_count symbols, always at least one") {
    val rows = learn(Seq("the quick brown fox the quick", "the the quick"), 4)
    val corpusBefore =
      rows.sortBy(_._1).scanLeft(0L)((_, r) => r._7).drop(1)
    for (Seq(prev, cur) <- (rows.map(_._7)).sliding(2).toSeq
         if rows.size >= 2) {
      assert(cur < prev, s"corpus symbols must strictly shrink: $rows")
    }
    for (r <- rows.sortBy(_._1).drop(1).zip(rows.sortBy(_._1))) {
      val (later, earlier) = r
      assert(earlier._7 - later._7 <= later._5,
        s"round ${later._1} removed more symbols than its pair count: $rows")
    }
    assert(corpusBefore.nonEmpty)
  }

  test("encodeStats: known-answer per-source compression") {
    // src a: "aaaa aaaa" — after merges (a,a)→aa then (aa,aa)→aaaa (or
    // marker merges, depending on counts) symbols shrink; exact values
    // pinned by hand for 2 rounds: words serialize as
    // " a a a a </w> " (5 syms each, before = 4 chars + 1 marker)
    val df = Seq(("a1", "aaaa aaaa"), ("b2", "aaaa bc")).toDF("source", "text")
    val r = Bpe.encodeStats(df, "text", "source", 2)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .toSeq.sortBy(_._1)
    // round 1 winner: (a,a), pc 9. Single-scan replace consumes the
    // separator, so " a a a a </w> " merges ONCE per scan:
    // " aa a a </w> " (4 syms — the documented pair-run semantics).
    // round 2: pc-3 tie among (a,a), (a,</w>), (aa,a) → lexicographic
    // winner (a,</w>) ('<' < 'a') → " aa a a</w> " = 3 syms;
    // " b c </w> " is untouched at 3 syms.
    // a1: 2×3 = 6 after (before 2×5 = 10); b2: 3 + 3 = 6 (before 8).
    assert(r == Seq(("a1", 2L, 10L, 6L), ("b2", 2L, 8L, 6L)))
  }

  test("encodeStats totals agree with learnMerges' corpus accounting") {
    // the apply side and the learn side compute corpus_symbols_after
    // independently (per-source weighted join vs global word table) —
    // they must agree exactly
    val texts = (0 until 200).map(i =>
      (s"s${i % 4}", s"alpha beta gamma tok$i alpha beta"))
    val df = texts.toDF("source", "text")
    val learn = Bpe.learnMerges(df, "text", 4).collect()
      .map(r => r.getInt(0).toLong -> r.getLong(6)).toMap
    val enc = Bpe.encodeStats(df, "text", "source", 4)
      .agg(org.apache.spark.sql.functions.sum("syms_after")).head().getLong(0)
    assert(enc == learn(4L),
      s"encode total $enc != learnMerges round-4 corpus symbols ${learn(4L)}")
  }

  test("encodeStats is layout invariant") {
    val texts = (0 until 300).map(i => (s"s${i % 3}", s"tok${i % 11} shared words tok${i % 5}"))
    val a = Bpe.encodeStats(texts.toDF("source", "text").repartition(1),
      "text", "source", 3).collect().toSeq.map(_.toSeq)
    val b = Bpe.encodeStats(texts.toDF("source", "text").repartition(32),
      "text", "source", 3).collect().toSeq.map(_.toSeq)
    assert(a == b)
  }
}
