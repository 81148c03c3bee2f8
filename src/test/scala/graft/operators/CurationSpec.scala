package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.range(0, 1000).select(col("id").as("doc_id"),
    concat(lit("doc number "), col("id")).as("text"))

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
}
