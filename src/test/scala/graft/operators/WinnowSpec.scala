package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fps(rows: Seq[(Long, String)], k: Int = 4, w: Int = 4) =
    Winnow.fingerprints(rows.toDF("doc_id", "text"), "doc_id", "text", k, w)
      .as[(Long, Long, Long)].collect().toSet

  private def pairs(rows: Seq[(Long, String)], k: Int = 4, w: Int = 4,
                    minShared: Long = 1, maxDf: Long = 64) =
    Winnow.fingerprintPairs(rows.toDF("doc_id", "text"),
        "doc_id", "text", k, w, minShared, maxDf)
      .as[(Long, Long, Long)].collect().toSet

  /** Serial robust-winnowing reference: same tokenization, same 48-bit
    * sha gram hash, min by (hash, −pos) per fully-populated window. */
  private def serialFps(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    val toks = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    if (toks.size < k + w - 1) return Set.empty
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def hash48(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    val grams = (0 to toks.size - k).map { i =>
      (i + 1).toLong -> hash48(toks.slice(i, i + k).mkString(" "))
    }
    (0 to grams.size - w).map { s =>
      val win = grams.slice(s, s + w)
      win.minBy { case (p, h) => (h, -p) }.swap
    }.toSet.map((t: (Long, Long)) => (t._2, t._1)) // (pos, hv)
  }

  test("fingerprints match the serial robust-winnowing reference") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again today",
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      3L -> "short text only")
    val got = fps(docs)
    val want = docs.flatMap { case (id, tx) =>
      serialFps(tx, 4, 4).map { case (p, h) => (id, p, h) }
    }.toSet
    assert(got == want)
  }

  test("a shared passage of length ≥ w + k − 1 always yields a shared fingerprint") {
    // the winnowing guarantee (Schleimer et al. §3): with k = 4, w = 4
    // any common substring of ≥ 7 tokens must produce at least one
    // common selected fingerprint. Plant the same 8-token passage into
    // otherwise-disjoint documents at different offsets.
    val passage = "zero one two three four five six seven"
    val docs = Seq(
      1L -> s"aa bb cc dd $passage ee ff gg hh",
      2L -> s"xx yy $passage zz ww vv uu tt ss rr")
    val p = pairs(docs)
    assert(p.exists { case (a, b, s) => a == 1L && b == 2L && s >= 1 },
      s"guaranteed shared fingerprint missing: $p")
  }

  test("ties select the RIGHTMOST minimal hash (robust winnowing)") {
    // a doc that repeats one gram: both occurrences hash identically, so
    // any window containing both must select the RIGHT one. Build
    // "x x x x x x x ..." — every 4-gram is the same, so every window
    // ties across all w positions and must select its last position.
    val n = 12
    val doc = Seq(1L -> Seq.fill(n)("x").mkString(" "))
    val got = fps(doc)
    // n−3 grams, n−6 windows at starts 1..n−6; window at start s ties
    // across s..s+3 → selects pos s+3; distinct positions 4..n−3
    val hv = got.head._3
    assert(got == (4 to n - 3).map(p => (1L, p.toLong, hv)).toSet, s"$got")
  }

  test("documents shorter than k + w − 1 tokens yield no fingerprints") {
    assert(fps(Seq(1L -> "one two three four five six")).isEmpty) // 6 < 7
    assert(fps(Seq(1L -> "one two three four five six seven")).nonEmpty)
  }

  test("the df band drops boilerplate fingerprints from matching") {
    // the same passage in ALL four docs (df = 4) is boilerplate under
    // maxDf = 3 → no pairs; raising maxDf restores them
    val passage = "common header line used on every single document here"
    val docs = (1L to 4L).map(i => i -> s"$passage unique$i tail$i")
    assert(pairs(docs, maxDf = 3).isEmpty)
    assert(pairs(docs, maxDf = 4).size == 6) // all C(4,2) pairs
  }

  test("fingerprintPairs is invariant to input partitioning") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("data", "spark", "row", "key", "scan", "agg", "join",
      "fast", "slow", "table")
    val docs = (1L to 40L).map { i =>
      i -> Seq.fill(20)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val a = Winnow.fingerprintPairs(docs.toDF("doc_id", "text")
        .repartition(1), "doc_id", "text", 4, 4, 1, 64)
      .as[(Long, Long, Long)].collect().toSet
    val b = Winnow.fingerprintPairs(docs.toDF("doc_id", "text")
        .repartition(13), "doc_id", "text", 4, 4, 1, 64)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
