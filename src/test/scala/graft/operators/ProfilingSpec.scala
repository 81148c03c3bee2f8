package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some(2.0), Some("a")),
    (2L, Some(4.0), None),
    (3L, None, Some("b")),
    (4L, Some(4.0), Some("a"))
  ).toDF("id", "x", "s")

  test("exact profile: counts, nulls, distinct, typed min/max") {
    val p = Profiling.profile(fixture, Seq("x", "s"), exact = true)
      .orderBy("col_name").collect()
    val x = p(1)
    assert(x.getAs[String]("col_name") === "x")
    assert(x.getAs[Long]("n") === 4L && x.getAs[Long]("n_null") === 1L)
    assert(x.getAs[Long]("n_distinct") === 2L)
    assert(x.getAs[Double]("min_num") === 2.0 && x.getAs[Double]("max_num") === 4.0)
    assert(x.isNullAt(x.fieldIndex("min_str")))
    val s = p(0)
    assert(s.getAs[String]("col_name") === "s")
    assert(s.getAs[Long]("n_null") === 1L && s.getAs[Long]("n_distinct") === 2L)
    assert(s.getAs[String]("min_str") === "a" && s.getAs[String]("max_str") === "b")
    assert(s.isNullAt(s.fieldIndex("min_num")))
  }

  test("approx profile plans one pass: no Expand, single scan, HLL sketches") {
    val plan = Profiling.profile(fixture, Seq("id", "x", "s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx mode must not expand:\n$plan")
    assert(plan.contains("approx_count_distinct"))
  }

  test("exact profile: per-column pruned subplans, no Expand anywhere") {
    val exactPlan = Profiling.profile(fixture, Seq("id", "x"), exact = true)
      .queryExecution.executedPlan.toString
    // the multi-count(DISTINCT) single-pass formulation would Expand
    // rows x columns; the union-of-narrow-aggregates shape must not
    assert(!exactPlan.contains("Expand"), exactPlan)
  }

  test("approx distinct counts land within HLL tolerance on real cardinalities") {
    val n = 5000
    val df = spark.range(n).select(col("id"),
      (col("id") % 97).as("m"), concat(lit("v"), col("id") % 1000).as("s"))
    val p = Profiling.profile(df, Seq("m", "s")).orderBy("col_name").collect()
    val m = p(0).getAs[Long]("n_distinct").toDouble
    val s = p(1).getAs[Long]("n_distinct").toDouble
    assert(math.abs(m - 97) / 97 < 0.1 && math.abs(s - 1000) / 1000 < 0.1)
  }

  // ---- rankAuc (q201) ----------------------------------------------

  private def aucOf(rows: Seq[(String, Long, Boolean)]): Map[String, (Long, Long, Long)] =
    Profiling.rankAuc(rows.toDF("grp", "score", "lbl"), "grp", "score",
        col("lbl"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("rankAuc equals a brute-force pairwise U with half-credit ties") {
    val rows = (0L until 400L).map { i =>
      val g = s"g${i % 3}"
      val score = (i * 7919) % 23 // heavy ties
      (g, score, (i * 31 + i % 5) % 3 == 0)
    }
    val got = aucOf(rows)
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val pos = rs.filter(_._3).map(_._2)
      val neg = rs.filterNot(_._3).map(_._2)
      val u2 = (for (p <- pos; n <- neg)
        yield if (p > n) 2L else if (p == n) 1L else 0L).sum
      g -> ((pos.size.toLong, neg.size.toLong, u2))
    }
    assert(got == want)
  }

  test("rankAuc laws: perfect separation, reversal, and all-ties") {
    // perfect: every positive above every negative → u2 = 2·np·nn
    val perfect = (0L until 20L).map(i => ("a", i, i >= 10L))
    assert(aucOf(perfect)("a") == ((10L, 10L, 200L)))
    // reversed: u2 = 0
    val reversed = (0L until 20L).map(i => ("a", i, i < 10L))
    assert(aucOf(reversed)("a") == ((10L, 10L, 0L)))
    // single score value: u2 = np·nn (AUC exactly 1/2)
    val ties = (0L until 20L).map(i => ("a", 7L, i < 8L))
    assert(aucOf(ties)("a") == ((8L, 12L, 96L)))
  }
}
