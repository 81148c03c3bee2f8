package graft

import org.apache.spark.sql.functions._

/** Pins the q35 HLL++ contract the way PercentileSpec pins q55. The
  * DuckDB oracle cannot gate sketch internals (engine-specific), so two
  * gates share the work: q35's oracle hash-checks the TOLERANCE boolean
  * (estimate within 10% of exact, per group) at the driver's SF, and
  * this spec asserts the same documented-accuracy contract across all
  * three SFs plus the rsd knob. The engine's replayable approx-distinct
  * surface — where the estimate itself is hash-gated — is the KMV
  * sketch (q102 / SQL `kmv_sketch_256`); approx_count_distinct (HLL)
  * is the mergeable interop alias carrying this tolerance contract. A
  * 100 TB deployment leans on exactly this bound when exact distinct
  * counts stop being affordable.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("q35 contract: HLL++ estimates within tolerance vs exact, per group, at all three SFs") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val li = Tables.lineitem(spark, s"/root/testdata/$sf")
      val rows = li.groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx"),
          approx_count_distinct(col("l_partkey"), 0.01).as("approx_tight"),
          countDistinct(col("l_partkey")).as("exact"))
        .as[(String, Long, Long, Long)].collect()
      assert(rows.nonEmpty)
      for ((flag, approx, tight, exact) <- rows) {
        val relErr = math.abs(approx - exact).toDouble / exact
        val relErrTight = math.abs(tight - exact).toDouble / exact
        // the q35 oracle's bound: 2 sigma on the default rsd=0.05
        assert(relErr <= 0.1, s"$sf/$flag: default rsd estimate $approx vs exact $exact")
        assert(relErrTight < 4 * 0.01, s"$sf/$flag: rsd=0.01 estimate $tight vs exact $exact")
        assert(relErrTight <= relErr || relErrTight < 0.01,
          s"$sf/$flag: tighter rsd should not be wildly worse ($relErrTight vs $relErr)")
      }
    }
  }

  test("HLL sketches merge: union of partial groups equals whole-input estimate") {
    val df = spark.range(100000).select((col("id") % 7919).as("v"),
      (col("id") % 2).as("half"))
    // per-half HLL sketches unioned via re-aggregation of the sketch
    val merged = df.groupBy("half").agg(hll_sketch_agg(col("v")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n"))
      .as[Long].head()
    val whole = df.agg(hll_sketch_estimate(hll_sketch_agg(col("v"))).as("n"))
      .as[Long].head()
    // the point of a mergeable sketch: partial aggregation then union is
    // the SAME estimator, so estimates agree closely (both ~7919)
    assert(math.abs(merged - whole).toDouble / whole < 0.05,
      s"merged $merged vs whole $whole")
    assert(math.abs(whole - 7919).toDouble / 7919 < 0.05)
  }
}
