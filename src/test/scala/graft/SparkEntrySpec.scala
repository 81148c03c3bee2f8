package graft

class SparkEntrySpec extends SparkSpec {

  test("expandRounding rewrites rN markers to the floor formula") {
    assert(SparkEntry.expandRounding("r2(sum(x))") ==
      "floor((sum(x)) * 100 + 0.5) / 100.0")
    assert(SparkEntry.expandRounding("SELECT r4(avg(a + b)) AS m FROM t") ==
      "SELECT floor((avg(a + b)) * 10000 + 0.5) / 10000.0 AS m FROM t")
    // nested parens and multiple markers
    assert(SparkEntry.expandRounding("r2(f(g(x), h(y))) r6(z)") ==
      "floor((f(g(x), h(y))) * 100 + 0.5) / 100.0 floor((z) * 1000000 + 0.5) / 1000000.0")
    // no markers -> unchanged
    assert(SparkEntry.expandRounding("round(x, 2) rn r2x(") == "round(x, 2) rn r2x(")
  }

  test("every oracled query exists in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query carries an oracle, except the explicit no-oracle allowlist") {
    // q35: HLL sketch internals are engine-specific by construction
    // (SketchSpec pins its contract); anything else without an oracle
    // silently downgrades the driver's gate to rows-only — fail loudly
    // here instead.
    val allowNoOracle = Set("q35_approx_distinct")
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled == allowNoOracle,
      s"queries without oracles beyond the allowlist: ${unoracled -- allowNoOracle}")
  }

  test("oracle SQL contains no unexpanded rN markers") {
    for ((k, sql) <- SparkEntry.oracleSql)
      assert(!sql.matches("(?s).*\\br[246]\\(.*"), s"unexpanded marker in $k")
  }

  test("queries build against sf0.001 without execution errors (plan check)") {
    for ((name, fn) <- SparkEntry.queries) {
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.schema.nonEmpty, s"$name has empty schema")
    }
  }
}
