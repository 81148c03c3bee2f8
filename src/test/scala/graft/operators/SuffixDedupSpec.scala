package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact arbitrary-length span dedup via bounded prefix doubling:
  * rank equality-consistency against brute-force window comparison,
  * output equality with the hash-gram tier where both are exact,
  * planted long-passage boundaries, and the in-doc/cross-doc edge
  * cases. */
class SuffixDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: per-doc stats from direct L-window string
    * comparison with the same canonical-first marking + island merge. */
  private def bruteStats(docs: Seq[(Long, String)], l: Int): Map[Long, (Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val windows = for {
      (id, s) <- toks
      i <- 1 to s.length - l + 1
    } yield (s.slice(i - 1, i - 1 + l).mkString(" "), id, i.toLong)
    val marks = windows.groupBy(_._1).filter(_._2.size >= 2).toSeq
      .flatMap { case (_, occ) =>
        val keep = occ.map(o => (o._2, o._3)).min
        occ.filter(o => (o._2, o._3) != keep)
          .map(o => (o._2, o._3, o._3 + l - 1))
      }
    val byDoc = marks.groupBy(_._1).map { case (id, ms) =>
      val sorted = ms.map(m => (m._2, m._3)).sortBy(_._1)
      val merged = sorted.foldLeft(List.empty[(Long, Long)]) {
        case (acc, (st, en)) => acc match {
          case (ps, pe) :: rest if st <= pe + 1 =>
            (ps, math.max(pe, en)) :: rest
          case _ => (st, en) :: acc
        }
      }
      id -> (merged.size.toLong, merged.map(s => s._2 - s._1 + 1).sum)
    }
    toks.map { case (id, s) =>
      val (spans, tok) = byDoc.getOrElse(id, (0L, 0L))
      id -> (s.length.toLong, spans, tok)
    }.toMap
  }

  private def runStats(docs: Seq[(Long, String)], l: Int): Map[Long, (Long, Long, Long)] =
    SuffixDedup.exactSpanStats(docs.toDF("doc_id", "text"), "doc_id", "text", l)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("matches brute-force window comparison on a random corpus, several L") {
    val rnd = new scala.util.Random(11)
    // small vocab so repeats actually occur, lengths straddling L
    val docs = (0L until 40L).map { id =>
      val n = 5 + rnd.nextInt(60)
      id -> (0 until n).map(_ => s"w${rnd.nextInt(12)}").mkString(" ")
    }
    for (l <- Seq(2, 3, 5, 8, 13)) {
      assert(runStats(docs, l) == bruteStats(docs, l), s"mismatch at L=$l")
    }
  }

  test("agrees with the hash-gram tier where 48-bit hashing is collision-free") {
    val rnd = new scala.util.Random(23)
    val docs = (0L until 30L).map { id =>
      val n = 10 + rnd.nextInt(40)
      id -> (0 until n).map(_ => s"t${rnd.nextInt(9)}").mkString(" ")
    }
    val exact = runStats(docs, 4)
    val hashed = SpanDedup.spanStats(docs.toDF("doc_id", "text"),
        "doc_id", "text", 4)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(exact == hashed)
  }

  test("planted 37-token shared passage at L=32: exact boundaries, canonical kept") {
    val passage = (0 until 37).map(i => s"p$i").mkString(" ")
    def filler(seed: Int, n: Int) =
      (0 until n).map(i => s"u${seed}_$i").mkString(" ")
    val docs = Seq(
      1L -> s"${filler(1, 10)} $passage ${filler(2, 5)}",
      2L -> s"${filler(3, 3)} $passage ${filler(4, 12)}",
      3L -> filler(5, 50))
    val got = runStats(docs, 32)
    // doc 1 holds the canonical first copy: no marks
    assert(got(1L) == (52L, 0L, 0L))
    // doc 2's copy: positions 4..40 → one span of all 37 tokens
    assert(got(2L) == (52L, 1L, 37L))
    assert(got(3L) == (50L, 0L, 0L))
  }

  test("repeat WITHIN one document is found (suffix-grade, not doc-pair)") {
    val run = (0 until 9).map(i => s"r$i").mkString(" ")
    val docs = Seq(1L -> s"$run a b c $run", 2L -> "x y z")
    val got = runStats(docs, 8)
    // second in-doc occurrence starts at position 13; windows 13 and 14
    // (the 8-windows of the 9-token run) merge to [13, 21]
    assert(got(1L) == (21L, 1L, 9L))
    assert(got(2L) == (3L, 0L, 0L))
  }

  test("L longer than every document yields zeros; L equal to doc length works") {
    val docs = Seq(1L -> "a b c d", 2L -> "a b c d", 3L -> "e f g h")
    assert(runStats(docs, 5).values.forall(v => v._2 == 0 && v._3 == 0))
    val at4 = runStats(docs, 4)
    assert(at4(1L) == (4L, 0L, 0L)) // canonical
    assert(at4(2L) == (4L, 1L, 4L)) // whole-doc duplicate
    assert(at4(3L) == (4L, 0L, 0L))
  }

  test("power-of-two L hits the h == l fast path") {
    val rnd = new scala.util.Random(31)
    val docs = (0L until 20L).map { id =>
      id -> (0 until 30).map(_ => s"k${rnd.nextInt(6)}").mkString(" ")
    }
    assert(runStats(docs, 8) == bruteStats(docs, 8))
    assert(runStats(docs, 16) == bruteStats(docs, 16))
  }

  // ---- spanDecontaminate (q206) ------------------------------------

  /** Brute-force reference for cross-corpus decontamination: every
    * corpus L-window equal to ANY eval L-window marks (no canonical
    * exemption), islands merge. */
  private def bruteDecontam(corpus: Seq[(Long, String)],
      eval: Seq[(Long, String)], l: Int): Map[Long, (Long, Long, Long)] = {
    def windows(t: String, l: Int): Seq[(String, Long)] = {
      val s = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      (1 to s.length - l + 1).map(i =>
        (s.slice(i - 1, i - 1 + l).mkString(" "), i.toLong))
    }
    val evalSet = eval.flatMap(d => windows(d._2, l).map(_._1)).toSet
    corpus.map { case (id, t) =>
      val n = t.toLowerCase.trim.split("\\s+").count(_.nonEmpty).toLong
      val marks = windows(t, l).filter(w => evalSet(w._1))
        .map(w => (w._2, w._2 + l - 1)).sortBy(_._1)
      val merged = marks.foldLeft(List.empty[(Long, Long)]) {
        case ((ps, pe) :: rest, (st, en)) if st <= pe + 1 =>
          (ps, math.max(pe, en)) :: rest
        case (acc, (st, en)) => (st, en) :: acc
      }
      id -> (n, merged.size.toLong, merged.map(s => s._2 - s._1 + 1).sum)
    }.toMap
  }

  private def runDecontam(corpus: Seq[(Long, String)],
      eval: Seq[(Long, String)], l: Int): Map[Long, (Long, Long, Long)] =
    SuffixDedup.spanDecontaminate(corpus.toDF("doc_id", "text"),
        eval.toDF("doc_id", "text"), "doc_id", "text", l)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("spanDecontaminate matches brute force on a random cross-corpus, " +
      "several L, overlapping id spaces") {
    val rnd = new scala.util.Random(47)
    def mk(n: Int, lo: Long): Seq[(Long, String)] = (lo until lo + n).map {
      id => id -> (0 until 8 + rnd.nextInt(40))
        .map(_ => s"w${rnd.nextInt(10)}").mkString(" ")
    }
    val corpus = mk(30, 0L)
    val eval = mk(8, 0L) // ids COLLIDE with corpus ids on purpose
    for (l <- Seq(2, 3, 4, 8))
      assert(runDecontam(corpus, eval, l) == bruteDecontam(corpus, eval, l),
        s"mismatch at L=$l")
  }

  test("spanDecontaminate has NO canonical-keeper exemption: every " +
      "corpus copy of an eval passage marks, and corpus-only repeats " +
      "never mark") {
    val passage = (0 until 20).map(i => s"e$i").mkString(" ")
    val corpusRun = (0 until 20).map(i => s"c$i").mkString(" ")
    val corpus = Seq(
      1L -> s"alpha beta $passage gamma",       // copy 1 — marks
      2L -> s"$passage delta epsilon zeta",     // copy 2 — ALSO marks
      3L -> s"one $corpusRun two",              // corpus-internal dup:
      4L -> s"three $corpusRun four")           //   clean in BOTH docs
    val eval = Seq(100L -> s"header $passage footer")
    val got = runDecontam(corpus, eval, 16)
    assert(got(1L)._3 == 20L && got(2L)._3 == 20L,
      s"both verbatim copies must mark fully: $got")
    assert(got(3L) == (22L, 0L, 0L) && got(4L) == (22L, 0L, 0L),
      "corpus-internal duplication is dedup's job, not decontamination's")
  }

  test("per-round rank checkpoints are all released; residual is ≤ 1 block") {
    // contract: every doubling round's checkpoint is freed when its
    // successor materializes, and only the documented small `marks`
    // checkpoint may ride the returned plan (ContextCleaner reclaims it
    // once the frame is unreferenced) — NOT one block per round
    def cached(): Int = spark.sparkContext.getPersistentRDDs.size
    val docs = (0L until 10L).map(id => id -> "a b c d e f g h i j")
    val before = cached()
    // L = 6 → h = 4 → 3 round tables + marks; a leak would add ≥ 4
    SuffixDedup.exactSpanStats(docs.toDF("doc_id", "text"),
      "doc_id", "text", 6).collect()
    assert(cached() <= before + 1,
      s"exactSpanStats leaked round checkpoints: $before -> ${cached()}")
  }
}
