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
}
