package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SampleSketchSpec extends SparkSpec {
  import spark.implicits._

  private def rows(g: String, ids: Range) =
    ids.map(i => (g, i.toLong, i.toDouble)).toDF("g", "id", "v")

  test("bottomK is deterministic, k-bounded, and schema-preserving") {
    val df = rows("a", 1 to 100).unionByName(rows("b", 1000 to 1019))
    val s1 = SampleSketch.bottomK(df, Seq("g"), $"id", 10)
    val s2 = SampleSketch.bottomK(df, Seq("g"), $"id", 10)
    assert(s1.columns.toSeq == df.columns.toSeq)
    val counts = s1.groupBy($"g").count().as[(String, Long)].collect().toMap
    assert(counts == Map("a" -> 10L, "b" -> 10L), s"got $counts")
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty,
      "two identical builds produced different samples")
  }

  test("groups smaller than k pass through whole") {
    val df = rows("a", 1 to 5)
    assert(SampleSketch.bottomK(df, Seq("g"), $"id", 512).count() == 5)
  }

  test("mergeability: bottom-k of a union == bottom-k over the parts' bottom-k samples") {
    val part1 = rows("a", 1 to 500)
    val part2 = rows("a", 501 to 1000)
    val direct = SampleSketch.bottomK(part1.unionByName(part2), Seq("g"), $"id", 32)
    val merged = SampleSketch.bottomK(
      SampleSketch.bottomK(part1, Seq("g"), $"id", 32)
        .unionByName(SampleSketch.bottomK(part2, Seq("g"), $"id", 32)),
      Seq("g"), $"id", 32)
    assert(direct.exceptAll(merged).isEmpty && merged.exceptAll(direct).isEmpty,
      "merged per-part samples differ from the union's sample")
  }

  test("sample quantiles land near population quantiles (rank error within 2/sqrt(k))") {
    // values 1..4000 uniformly: population p50 = ~2000, p90 = ~3600
    val df = rows("a", 1 to 4000)
    val k = 256
    val samp = SampleSketch.bottomK(df, Seq("g"), $"id", k)
    val p50 = samp.agg(expr("percentile(v, 0.5)")).head().getDouble(0)
    val p90 = samp.agg(expr("percentile(v, 0.9)")).head().getDouble(0)
    val tol = 2.0 / math.sqrt(k) // ~0.125 rank error at 2 sigma
    assert(math.abs(p50 / 4000.0 - 0.5) < tol, s"p50 sample estimate $p50")
    assert(math.abs(p90 / 4000.0 - 0.9) < tol, s"p90 sample estimate $p90")
  }
}
