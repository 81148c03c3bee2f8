package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private def keysOf(pairs: (String, Int)*) =
    pairs.flatMap { case (k, n) => Seq.fill(n)(k) }.toDF("k")

  test("estimates never undershoot and are exact without collisions") {
    val df = keysOf("a" -> 100, "b" -> 7, "c" -> 1)
    val sketch = FreqSketch.countMin(df, $"k", depth = 4, width = 1024)
    val est = FreqSketch.estimate(sketch, Seq("a", "b", "c").toDF("k"), "k",
        depth = 4, width = 1024)
      .as[(String, Long)].collect().toMap
    // 3 keys in a 4x1024 grid: collision probability is negligible and
    // the estimator is exact; the >= direction holds structurally
    assert(est == Map("a" -> 100L, "b" -> 7L, "c" -> 1L), s"got $est")
  }

  test("absent keys estimate to zero; grid size is bounded at depth x width") {
    val df = keysOf("a" -> 5)
    val sketch = FreqSketch.countMin(df, $"k", depth = 3, width = 64)
    assert(sketch.count() <= 3L * 64, "grid exceeded depth x width")
    val est = FreqSketch.estimate(sketch, Seq("zzz").toDF("k"), "k",
        depth = 3, width = 64)
      .as[(String, Long)].collect().toMap
    assert(est("zzz") == 0L, s"absent key estimated ${est("zzz")}")
  }

  test("sketches merge by summing grids: merged == sketch of the union") {
    val a = keysOf("x" -> 10, "y" -> 3)
    val b = keysOf("x" -> 5, "z" -> 8)
    val merged = FreqSketch.countMin(a, $"k").unionByName(FreqSketch.countMin(b, $"k"))
      .groupBy($"depth", $"bucket").agg(sum($"cnt").as("cnt"))
    val direct = FreqSketch.countMin(a.unionByName(b), $"k")
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "summed grids differ from the union's sketch")
  }

  test("under forced collisions (tiny width) estimates still never undershoot") {
    val df = keysOf((1 to 50).map(i => s"k$i" -> i): _*)
    val sketch = FreqSketch.countMin(df, $"k", depth = 2, width = 16)
    val probes = (1 to 50).map(i => s"k$i").toDF("k")
    val est = FreqSketch.estimate(sketch, probes, "k", depth = 2, width = 16)
      .as[(String, Long)].collect().toMap
    for (i <- 1 to 50)
      assert(est(s"k$i") >= i, s"k$i estimated ${est(s"k$i")} < true count $i")
  }
}
