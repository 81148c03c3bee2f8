package graft.expressions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class MinHashSpec extends SparkSpec {
  import spark.implicits._

  test("native signature matches the declarative formulation on same input") {
    val df = Seq(
      (Seq(12345L, -987654321L, 42L, 0L), 1),
      (Seq.empty[Long], 2),
      (Seq(Long.MaxValue, Long.MinValue), 3),
    ).toDF("xs", "id")
    val bad = df.select(
      MinHash.minhashSignature(col("xs"), 16).as("native"),
      Dedup.minhashSignatureFromHashes(col("xs"), 16).as("decl"))
      .filter(col("native") =!= col("decl")).count()
    assert(bad == 0)
  }

  test("hashedCharShingles: sorted, distinct, correct count") {
    val got = Seq("abcabc").toDF("t")
      .select(MinHash.hashedCharShingles(col("t"), 3).as("h"))
      .head().getSeq[Long](0)
    // windows: abc bca cab abc -> 3 distinct
    assert(got.length == 3)
    assert(got == got.sorted)
    val short = Seq("ab").toDF("t")
      .select(MinHash.hashedCharShingles(col("t"), 3).as("h"))
      .head().getSeq[Long](0)
    assert(short.isEmpty)
  }

  test("identical strings give identical shingle sets; different differ") {
    val df = Seq(("hello world repeated text", "hello world repeated text"),
      ("hello world repeated text", "totally other content here")).toDF("a", "b")
    val eq = df.select((MinHash.hashedCharShingles(col("a"), 5) ===
      MinHash.hashedCharShingles(col("b"), 5)).as("e")).as[Boolean].collect()
    assert(eq(0) && !eq(1))
  }

  test("simhash64 codegen and interpreted agree; identical inputs collide") {
    val df = Seq("the quick brown fox", "the quick brown fox", "other words")
      .toDF("t").select(
        SimHash64.simhash64(split(col("t"), " ")).as("h"))
    val hs = df.as[Long].collect()
    assert(hs(0) == hs(1))
    assert(hs(0) != hs(2))
  }
}
