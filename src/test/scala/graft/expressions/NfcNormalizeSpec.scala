package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(ss: String*): Seq[String] =
    ss.toSeq.toDF("s").select(NfcNormalizeFn(col("s"))).as[String].collect().toSeq

  test("composes Latin combining marks and Hangul jamo to canonical forms") {
    assert(nfc(
      "e\u0301",               // e + combining acute
      "A\u030A",               // A + combining ring above
      "\u00E9",                // already precomposed
      "\u1100\u1161\u11A8",  // Hangul jamo LVT
      "plain ascii",
      "",
    ) == Seq("\u00E9", "\u00C5", "\u00E9", "\uAC01", "plain ascii", ""))
  }

  test("is idempotent and leaves NFC text byte-identical") {
    val inputs = Seq("e\u0301 mixed \u1100\u1161 tail", "abc", "\u00E9\u00C5\uAC01")
    val once = nfc(inputs: _*)
    val twice = once.flatMap(s => nfc(s))
    assert(once == twice)
    assert(once.head == "\u00E9 mixed \uAC00 tail")
  }

  test("non-composing marks are preserved, not dropped") {
    // q + combining acute has no precomposed form: NFC must keep both
    // code points (a normalizer that strips marks would corrupt text)
    assert(nfc("q\u0301") == Seq("q\u0301"))
  }

  test("null propagates through the native expression") {
    val got = Seq[(java.lang.Long, String)]((1L, "e\u0301"), (2L, null))
      .toDF("id", "s")
      .select(NfcNormalizeFn(col("s"))).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got == Seq("\u00E9", null))
  }
}
