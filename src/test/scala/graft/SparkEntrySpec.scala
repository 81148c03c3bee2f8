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

  test("every query carries an oracle — no exceptions") {
    // Since round 6 the allowlist is EMPTY: even q35's HLL (whose sketch
    // values are engine-specific by construction) gates through a
    // tolerance oracle — the estimate-within-10%-of-exact boolean sits
    // under the value hash, and the replayable-estimate gate is q102's
    // KMV sketch. A query without an oracle silently downgrades the
    // driver's gate to rows-only — fail loudly here instead.
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"queries without oracles: $unoracled")
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
