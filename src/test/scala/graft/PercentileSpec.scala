package graft

import org.apache.spark.sql.functions._

/** Pins the q55 sketch-percentile contract (SparkEntry q55 comment):
  *  1. at accuracy 1e6 on sf-scale groups, `approx_percentile` is
  *     rank-EXACT — so the DuckDB `quantile_disc` oracle only has to
  *     match exact discrete-median semantics, not sketch internals;
  *  2. at low accuracy the documented rank-error bound (ε = 1/accuracy
  *     of the rank) holds — the property a 100 TB deployment relies on
  *     when exactness is no longer free.
  */
class PercentileSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  /** Rank window of value `v` in sorted `xs`: (#values < v, #values <= v). */
  private def rankRange(xs: Array[Double], v: Double): (Long, Long) =
    (xs.count(_ < v).toLong, xs.count(_ <= v).toLong)

  /** Asserts `v` is a valid p-quantile of `xs` within rank error eps*n:
    * some admissible rank in [p*n - eps*n, p*n + eps*n] lands inside
    * v's occupancy window. */
  private def assertWithinRankError(xs: Array[Double], v: Double,
                                    p: Double, eps: Double): Unit = {
    val n = xs.length.toDouble
    val (lo, hi) = rankRange(xs, v)
    val target = p * n
    assert(lo <= target + eps * n + 1 && hi >= target - eps * n - 1,
      s"value $v occupies ranks ($lo, $hi] but target is $target ± ${eps * n}")
  }

  test("q55 contract: accuracy 1e6 is rank-exact per group on lineitem quantities") {
    val li = Tables.lineitem(spark, d)
    val approx = li.groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_quantity, 0.5, 1000000)")
        .cast("double").as("m"))
      .as[(String, Double)].collect().toMap
    for ((flag, v) <- approx) {
      val xs = li.filter($"l_returnflag" === flag)
        .select($"l_quantity".cast("double")).as[Double].collect().sorted
      assertWithinRankError(xs, v, 0.5, eps = 0.0)
      assert(xs.contains(v), s"approx median $v is not an element of group $flag")
    }
  }

  test("low accuracy stays within the documented rank-error bound") {
    // distinct values, no ties: rank error is visible if the sketch errs
    val df = spark.range(1, 10001).select($"id".cast("double").as("x"))
      .repartition(4)
    val xs = (1 to 10000).map(_.toDouble).toArray
    for (p <- Seq(0.1, 0.5, 0.9)) {
      val v = df.agg(expr(s"approx_percentile(x, $p, 50)").cast("double"))
        .as[Double].head()
      // accuracy 50 → rank error ≤ n/50 = 200 ranks
      assertWithinRankError(xs, v, p, eps = 1.0 / 50)
    }
  }
}
