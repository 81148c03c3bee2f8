package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Prefix-filter exact similarity join (q129's operator). The contract is
  * LOSSLESSNESS: the filtered join must reproduce the brute-force
  * all-pairs result exactly — known-answer pairs pin the Jaccard
  * arithmetic, a seeded corpus pins set-equality against the quadratic
  * reference, and a plan check pins the no-cartesian shape. */
class SimilarityJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: Seq[(Long, String)], n: Int = 3,
                    t: Double = 0.6): Set[(Long, Long, Double)] =
    SimilarityJoin.prefixFilterJoin(rows.toDF("doc_id", "text"),
        "doc_id", "text", n, t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def brute(rows: Seq[(Long, String)], n: Int = 3,
                    t: Double = 0.6): Set[(Long, Long, Double)] =
    SimilarityJoin.bruteForcePairs(rows.toDF("doc_id", "text"),
        "doc_id", "text", n, t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("known-answer: 6-of-10 gram overlap lands exactly ON t=0.6") {
    // A and B share an 8-token prefix -> 6 shared internal grams; each
    // adds 2 grams from a disjoint tail alphabet -> |A|=|B|=8,
    // j = 6/(8+8-6) = 0.6 exactly; >= keeps the borderline pair.
    val pre = (1 to 8).map(i => s"p$i").mkString(" ")
    val corpus = Seq(
      1L -> s"$pre ax ay",
      2L -> s"$pre bx by",
      3L -> "zq zr zs zt zu zv zw zx zy zz")
    val got = pairs(corpus)
    assert(got === Set((1L, 2L, 0.6)))
  }

  test("below-threshold shared prefix is excluded") {
    // 7-token shared prefix -> 5 shared grams of 8 each: j = 5/11 < 0.6
    val pre = (1 to 7).map(i => s"p$i").mkString(" ")
    val corpus = Seq(
      1L -> s"$pre ax ay az",
      2L -> s"$pre bx by bz")
    assert(pairs(corpus).isEmpty)
  }

  test("t=1.0 finds exactly the format-variant duplicates") {
    val corpus = Seq(
      1L -> "The Quick   Brown Fox Jumps",
      2L -> "the quick brown fox jumps",     // case/ws variant: same grams
      3L -> "the quick brown fox leaps")     // one token off: j < 1
    assert(pairs(corpus, t = 1.0) === Set((1L, 2L, 1.0)))
  }

  test("docs shorter than n tokens are dropped, not crashed") {
    val corpus = Seq(1L -> "a b", 2L -> "a b", 3L -> "", 4L -> "x y z w")
    assert(pairs(corpus).isEmpty)
  }

  test("losslessness: prefix-filtered result == brute force on a seeded corpus") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 40).map(i => s"w$i")
    def doc(): String =
      (0 until 6 + rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    val base = (0 until 40).map(i => (i.toLong, doc()))
    // plant near-dup variants: append/perturb a few tokens
    val variants = (0 until 12).map { i =>
      val (_, txt) = base(i)
      (100L + i, txt + s" extra$i")
    }
    val corpus = base ++ variants
    for (t <- Seq(0.3, 0.5, 0.6, 0.8, 0.95)) {
      assert(pairs(corpus, t = t) === brute(corpus, t = t),
        s"mismatch at t=$t")
    }
  }

  test("plan: no cartesian product; candidate join is hash-equi on the gram key") {
    val df = (0 until 30).map(i => (i.toLong, s"tok$i a b c d e f g$i"))
      .toDF("doc_id", "text")
    val plan = SimilarityJoin.prefixFilterJoin(df, "doc_id", "text", 3, 0.6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  private def snm(rows: Seq[(Long, String)], t: Double = 0.6, w: Int = 4,
                  blockLen: Int = 2): Set[(Long, Long)] =
    SimilarityJoin.sortedNeighborhoodPairs(rows.toDF("doc_id", "text"),
        "doc_id", "text", 3, t, w, blockLen)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("SNM: shared-prefix near-dups sort adjacently and are found") {
    val common = (1 to 30).map(i => s"c$i").mkString(" ")
    val corpus = Seq(
      1L -> s"$common alpha",
      2L -> s"$common beta",        // same long prefix → adjacent in pass 1
      3L -> "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll")
    assert(snm(corpus) === Set((1L, 2L)))
  }

  test("SNM: a first-token edit is invisible to pass 1 but caught by pass 2") {
    // different first characters put A and B in DIFFERENT pass-1 blocks;
    // the token-sorted key of pass 2 starts with the (identical) common
    // tokens — the edited tokens sort to the END — so it sorts them
    // adjacently
    val common = (1 to 30).map(i => s"m$i").mkString(" ")
    val corpus = Seq(
      1L -> s"zebra $common",
      2L -> s"yak $common",
      3L -> "qa qb qc qd qe qf qg qh qi qj qk ql")
    val got = snm(corpus)
    assert(got.contains((1L, 2L)), s"pass 2 must recover the pair: $got")
    // sanity: pass 1 alone cannot see it (blocks 'ze' vs 'ap' differ)
  }

  test("SNM: candidate volume is linear even on an all-duplicates block") {
    // 30 identical docs: brute force reports C(30,2) = 435 pairs; the
    // window caps SNM at ≤ 2·(w−1)·N candidates — the no-skew-mode
    // contract (the price is recall, never blowup)
    val corpus = (0L until 30L).map(i => i -> "a b c d e f g h i j")
    val got = snm(corpus)
    val bound = 2 * 3 * corpus.size
    assert(got.nonEmpty && got.size <= bound,
      s"${got.size} pairs must be ≤ $bound (brute force would be 435)")
  }

  private def contain(rows: Seq[(Long, String)], tauNum: Long = 4,
                      tauDen: Long = 5): Map[(Long, Long), Double] =
    SimilarityJoin.containmentJoin(rows.toDF("doc_id", "text"),
        "doc_id", "text", 3, tauNum, tauDen)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("containment: a truncation is found in one direction only — where Jaccard fails") {
    val full = (1 to 40).map(i => s"w$i").mkString(" ")
    val half = (1 to 20).map(i => s"w$i").mkString(" ")
    val corpus = Seq(1L -> full, 2L -> half,
      3L -> "zq zr zs zt zu zv zw zx zy zz")
    val got = contain(corpus)
    assert(got.keySet === Set((2L, 1L)), s"only half→full qualifies: $got")
    assert(got((2L, 1L)) === 1.0) // every gram of the truncation is in full
    // the symmetric join at the same bar misses this pair entirely:
    // j = 18/38 ≈ 0.47
    assert(!pairs(corpus, t = 0.8).contains((1L, 2L, 1.0)))
  }

  test("containment: overlap exactly at τ = 4/5 is kept (integer ≥ semantics)") {
    // A = 7 tokens -> 5 grams; B shares A's first 4 grams, then diverges
    val a = (1 to 7).map(i => s"p$i").mkString(" ")
    val b = (1 to 6).map(i => s"p$i").mkString(" ") + " qx qy qz"
    val got = contain(Seq(1L -> a, 2L -> b))
    assert(got.contains((1L, 2L)), s"exact-τ pair must be kept: $got")
    assert(got((1L, 2L)) === 0.8)
    assert(!got.contains((2L, 1L)), "the larger doc is not contained")
  }

  test("containment: lossless vs a brute-force reference on a seeded corpus") {
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 40).map(i => s"v$i")
    def doc(len: Int): String =
      (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0 until 30).map(i => (i.toLong, doc(8 + rnd.nextInt(20))))
    // plant truncations: first 60% of tokens of every 4th doc
    val truncs = (0 until 8).map { i =>
      val toks = base(i)._2.split(" ")
      (200L + i, toks.take(math.max(4, toks.length * 3 / 5)).mkString(" "))
    }
    val corpus = base ++ truncs
    // brute force in plain Scala over string gram sets
    def gramsOf(t: String): Set[String] =
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        .sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    val gm = corpus.map { case (id, t) => id -> gramsOf(t) }
      .filter(_._2.nonEmpty).toMap
    val expected = (for {
      (ia, ga) <- gm.toSeq; (ib, gb) <- gm.toSeq
      if ia != ib
      ov = (ga & gb).size
      if 5L * ov >= 4L * ga.size
    } yield (ia, ib) -> ov.toDouble / ga.size).toMap
    assert(contain(corpus) === expected)
  }

  private def withIdx(rows: Seq[(Long, String)])(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("q136idx").toString
    try {
      SimilarityJoin.writeGramIndex(rows.toDF("doc_id", "text"),
        "doc_id", "text", 3, dir)
      f(dir)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("incremental exact probe equals brute-force cross pairs") {
    val rnd = new scala.util.Random(31)
    val vocab = (0 until 40).map(i => s"c$i")
    def doc(): String =
      (0 until 8 + rnd.nextInt(16)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    val corpus = (0 until 40).map(i => (i.toLong, doc()))
    // batch: near-dups of some corpus docs, one exact dup, one alien
    val batch = (0 until 8).map(i => (500L + i, corpus(i)._2 + s" tail$i")) ++
      Seq((600L, corpus(20)._2), (601L, "zz yy xx ww vv uu tt ss rr"))
    withIdx(corpus) { dir =>
      val got = SimilarityJoin.incrementalExactDupPairs(
          batch.toDF("doc_id", "text"), "doc_id", "text", 3, 0.6,
          spark.read.parquet(s"$dir/docs"),
          spark.read.parquet(s"$dir/postings"),
          spark.read.parquet(s"$dir/df"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // brute force cross in plain Scala
      def gset(t: String): Set[String] =
        t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
          .sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
      val expected = (for {
        (ib, tb) <- batch; (ic, tc) <- corpus
        gb = gset(tb); gc = gset(tc)
        if gb.nonEmpty && gc.nonEmpty
        j = (gb & gc).size.toDouble / (gb | gc).size
        if j >= 0.6
      } yield (ib, ic, j)).toSet
      assert(got === expected)
      assert(got.exists(_._1 == 600L), "the exact dup must be found at j=1")
      assert(!got.exists(_._1 == 601L), "the alien doc matches nothing")
    }
  }

  test("incremental exact probe: corpus side is scanned, never shuffled") {
    val corpus = (0 until 30).map(i =>
      (i.toLong, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"))
    val batch = Seq((900L, corpus(3)._2))
    withIdx(corpus) { dir =>
      val plan = SimilarityJoin.incrementalExactDupPairs(
          batch.toDF("doc_id", "text"), "doc_id", "text", 3, 0.6,
          spark.read.parquet(s"$dir/docs"),
          spark.read.parquet(s"$dir/postings"),
          spark.read.parquet(s"$dir/df"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"),
        s"corpus-side sort-merge means the corpus shuffled:\n$plan")
      assert(plan.contains("BroadcastHashJoin"), plan)
    }
  }

  test("SNM: reported pairs are a sound subset of brute force with equal jaccard") {
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 50).map(i => s"t$i")
    def doc(): String =
      (0 until 10 + rnd.nextInt(15)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    val base = (0 until 30).map(i => (i.toLong, doc()))
    val variants = (0 until 8).map { i =>
      (100L + i, base(i)._2 + s" x$i") }
    val corpus = base ++ variants
    val bruteMap = brute(corpus, t = 0.6)
      .map(p => (p._1, p._2) -> p._3).toMap
    val gotRows = SimilarityJoin.sortedNeighborhoodPairs(
        corpus.toDF("doc_id", "text"), "doc_id", "text", 3, 0.6, 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    for ((a, b, j) <- gotRows) {
      assert(bruteMap.get((a, b)).contains(j),
        s"($a,$b,$j) must appear in brute force with the same jaccard")
    }
  }

  // ---- editDistanceJoin (q146's operator) -------------------------------

  private def edPairs(rows: Seq[(Long, String)], k: Int = 2, q: Int = 3)
      : Set[(Long, Long, Long)] =
    SimilarityJoin.editDistanceJoin(rows.toDF("id", "s"), "id", "s", k, q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def edBrute(rows: Seq[(Long, String)], k: Int)
      : Set[(Long, Long, Long)] =
    SimilarityJoin.bruteForceEditPairs(rows.toDF("id", "s"), "id", "s", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("edit join: distance exactly k kept, k+1 dropped") {
    val corpus = Seq(
      1L -> "correct horse battery staple",
      2L -> "correct horse battery stAple",   // 1 substitution
      3L -> "correct horse bAttery stAple",   // 2 substitutions
      4L -> "correct hOrse bAttery stAple",   // 3 substitutions: out
      5L -> "a completely different sentence")
    assert(edPairs(corpus) === Set((1L, 2L, 1L), (1L, 3L, 2L), (2L, 3L, 1L),
      (2L, 4L, 2L), (3L, 4L, 1L)))
  }

  test("edit join: insertions and deletions count, not just substitutions") {
    val corpus = Seq(
      1L -> "abcdefghijkl",
      2L -> "abcdefghijklXY",   // 2 insertions at the tail
      3L -> "abcdefghij",       // 2 deletions
      4L -> "Xabcdefghijkl")    // 1 insertion at the head
    // (2,4) and (3,4) sit at distance 3 — the head insertion desyncs
    // every later position — and must be excluded at k=2
    assert(edPairs(corpus) === Set((1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 1L)))
    assert(edPairs(corpus) === edBrute(corpus, 2))
  }

  test("edit join: strings below the prefix bound route through the short fallback") {
    // k=2, q=3: shortMax = 8. Pure-short pairs (len < q has NO grams at
    // all) and the mixed short(8)xlong(10) pair a short-x-short-only
    // fallback would silently miss.
    val corpus = Seq(
      1L -> "ab",            // no grams
      2L -> "ad",            // dist 1 to "ab"
      3L -> "abcdefgh",      // len 8: short (7 grams < kq+1)
      4L -> "abcdefghXY",    // len 10: long side of a mixed pair, dist 2
      5L -> "")              // empty: dist 2 to "ab"/"ad"
    val got = edPairs(corpus)
    assert(got === edBrute(corpus, 2))
    assert(got.contains((1L, 2L, 1L)))
    assert(got.contains((3L, 4L, 2L)), "mixed short x long pair must survive")
    assert(got.contains((1L, 5L, 2L)) && got.contains((2L, 5L, 2L)))
  }

  test("edit join: lossless vs brute force on a seeded mixed-length corpus") {
    val rnd = new scala.util.Random(20260815L)
    val words = Vector("data", "spark", "table", "row", "scan", "fast",
      "slow", "key", "agg", "join")
    // lengths straddle the short boundary; planted edits at varied
    // positions create true pairs at distances 0, 1, 2, and 3
    val base = (0 until 80).map { i =>
      val len = 2 + rnd.nextInt(6)
      i.toLong -> Seq.fill(len)(words(rnd.nextInt(words.size))).mkString(" ")
    }
    val edited = (0 until 80 by 4).map { i =>
      val s = base(i)._2
      val p = 1 + rnd.nextInt(math.max(1, s.length - 1))
      val mutated = rnd.nextInt(3) match {
        case 0 => s.take(p - 1) + "#" + s.drop(p)            // substitute
        case 1 => s.take(p - 1) + s.drop(p)                  // delete
        case _ => s.take(p) + "#" + s.drop(p)                // insert
      }
      (1000L + i) -> mutated
    }
    val corpus = base ++ edited
    val got = edPairs(corpus)
    val want = edBrute(corpus, 2)
    assert(want.nonEmpty, "seeded corpus must contain true pairs")
    assert(got === want)
  }

  test("edit join: result is invariant to input layout") {
    val corpus = Seq(1L -> "abcdefghijkl", 2L -> "abcdefghijkX",
      3L -> "zz", 4L -> "zy").toDF("id", "s")
    val one = SimilarityJoin.editDistanceJoin(corpus.repartition(1),
      "id", "s").collect().toSet
    val many = SimilarityJoin.editDistanceJoin(corpus.repartition(7),
      "id", "s").collect().toSet
    assert(one === many)
  }
}
