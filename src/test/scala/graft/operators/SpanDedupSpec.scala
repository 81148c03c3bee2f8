package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Repeated-substring span dedup (q121's operator). Known-answer corpora
  * exercise the parts the oracle replay can't isolate: canonical-copy
  * election, adjacency merging, within-doc repeats, and the n < L
  * degenerate case. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def stats(rows: Seq[(Long, String)], l: Int = 4): Map[Long, (Long, Long, Long)] =
    SpanDedup.spanStats(rows.toDF("doc_id", "text"), "doc_id", "text", l)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("first corpus-wide copy is kept, later occurrences are marked") {
    val m = stats(Seq(
      1L -> "a b c d x y z w",   // canonical copy of "a b c d"
      2L -> "p q a b c d r s"))  // repeat → one 4-token span
    assert(m(1L) === ((8L, 0L, 0L)))
    assert(m(2L) === ((8L, 1L, 4L)))
  }

  test("overlapping grams of one long duplicated run merge to one span") {
    // 6-token run shared → doc 2 carries starts 3 and 4 and 5 (4-grams),
    // all overlapping → exactly one span of 6 tokens
    val m = stats(Seq(
      1L -> "u v w x y z",
      2L -> "m n u v w x y z"))
    assert(m(2L) === ((8L, 1L, 6L)))
  }

  test("adjacent but disjoint duplicated runs merge (start = prev end + 1)") {
    // two different 4-grams, back-to-back in doc 3: [1,4] and [5,8] are
    // adjacent → one 8-token span
    val m = stats(Seq(
      1L -> "a b c d",
      2L -> "e f g h",
      3L -> "a b c d e f g h"))
    assert(m(3L) === ((8L, 1L, 8L)))
  }

  test("separated duplicated runs stay two spans") {
    val m = stats(Seq(
      1L -> "a b c d",
      2L -> "e f g h",
      3L -> "a b c d gap1 gap2 e f g h"))
    assert(m(3L) === ((10L, 2L, 8L)))
  }

  test("within-doc repeat marks only the second occurrence") {
    val m = stats(Seq(1L -> "a b c d k1 k2 a b c d"))
    assert(m(1L) === ((10L, 1L, 4L)))
  }

  test("documents shorter than L report zeros, not errors") {
    val m = stats(Seq(1L -> "a b c", 2L -> "a b c", 3L -> ""))
    assert(m(1L) === ((3L, 0L, 0L)))
    assert(m(2L) === ((3L, 0L, 0L)))
    assert(m(3L) === ((0L, 0L, 0L)))
  }

  private def incStats(corpus: Seq[(Long, String)], batch: Seq[(Long, String)],
                       l: Int = 4): Map[Long, (Long, Long, Long)] = {
    val cs = SpanDedup.buildGramStats(corpus.toDF("doc_id", "text"),
      "doc_id", "text", l)
    SpanDedup.incrementalSpanStats(batch.toDF("doc_id", "text"),
        "doc_id", "text", l, cs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("incremental: a corpus gram marks EVERY batch occurrence (corpus is canonical)") {
    val m = incStats(
      corpus = Seq(100L -> "a b c d x y"),
      batch = Seq(1L -> "a b c d p q")) // batch's FIRST copy still marks
    assert(m(1L) === ((6L, 1L, 4L)))
  }

  test("incremental with an empty corpus equals batch-only spanStats") {
    val batch = Seq(
      1L -> "a b c d k1 k2 a b c d",
      2L -> "p q r s t",
      3L -> "p q r s t")
    val inc = incStats(corpus = Seq(999L -> "zz"), batch = batch)
    val direct = stats(batch)
    assert(inc === direct)
  }

  test("incremental: batch-internal repeat keeps the batch-first copy") {
    val m = incStats(
      corpus = Seq(100L -> "unrelated corpus text here"),
      batch = Seq(1L -> "e f g h", 2L -> "m n e f g h"))
    assert(m(1L) === ((4L, 0L, 0L)))
    assert(m(2L) === ((6L, 1L, 4L)))
  }

  test("incremental probe plans a broadcast of the batch gram set") {
    val cs = SpanDedup.buildGramStats(
      (0L until 50L).map(i => i -> s"corpus doc $i shares words")
        .toDF("doc_id", "text"), "doc_id", "text", 4)
    val plan = SpanDedup.incrementalSpanStats(
        Seq(1000L -> "a small batch of words").toDF("doc_id", "text"),
        "doc_id", "text", 4, cs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"corpus stats must be probed via a broadcast of batch hashes:\n$plan")
  }

  private def scrub(rows: Seq[(Long, String)], l: Int = 4): Map[Long, (String, Long)] =
    SpanDedup.scrubSpans(rows.toDF("doc_id", "text"), "doc_id", "text", l)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap

  test("scrub removes the duplicated run and keeps the canonical copy verbatim") {
    val m = scrub(Seq(
      1L -> "a b c d x y z w",
      2L -> "p q a b c d r s"))
    assert(m(1L) === (("a b c d x y z w", 0L)))
    assert(m(2L) === (("p q r s", 4L)))
  }

  test("scrub of a fully duplicated document yields the empty string") {
    val m = scrub(Seq(1L -> "u v w x", 2L -> "u v w x"))
    assert(m(1L) === (("u v w x", 0L)))
    assert(m(2L) === (("", 4L)))
  }

  test("scrubbed token count agrees with spanStats' dup_tokens everywhere") {
    // the measuring operator and the rewriting operator are independent
    // plans over the same marking rule — their token accounting must
    // agree on every document
    val rows = (0L until 60L).map { i =>
      i -> (s"tok${i % 9} tok${(i + 1) % 9} tok${(i + 2) % 9} " +
        s"shared run of common tokens ${i % 4} tail${i % 13}")
    }
    val st = stats(rows)
    val sc = scrub(rows)
    for ((id, (_, _, dup)) <- st)
      assert(sc(id)._2 == dup,
        s"doc $id: scrub removed ${sc(id)._2} but spanStats counted $dup")
  }

  test("stats are invariant to input partitioning/layout") {
    val rows = (0L until 40L).map(i =>
      i -> s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 7} shared run of tokens ${i % 3}")
    val a = stats(rows)
    val df: DataFrame = rows.toDF("doc_id", "text").repartition(7)
    val b = SpanDedup.spanStats(df, "doc_id", "text", 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(a === b)
  }
}
