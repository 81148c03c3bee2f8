package graft.functions

import graft.SparkSpec
import graft.functions.KmvAggregator._
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("below capacity the sketch IS the distinct set (exact count, dedup'd)") {
    val df = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("v")
      .select(lit("g").as("g"), kmvHash($"v").as("h"))
    val mins = df.groupBy($"g").agg(kmv(16)($"h").as("mins"))
      .select($"mins").as[Seq[Long]].head()
    assert(mins.length == 3)
    assert(mins == mins.sorted && mins.distinct == mins)
    val est = df.groupBy($"g").agg(kmv(16)($"h").as("mins"))
      .select(kmvEstimate($"mins", 16)).as[Double].head()
    assert(est == 3.0)
  }

  test("at capacity the sketch keeps exactly the k smallest distinct hashes") {
    val k = 8
    val df = spark.range(100).select(lit("g").as("g"), kmvHash($"id").as("h"))
    val mins = df.groupBy($"g").agg(kmv(k)($"h").as("mins"))
      .select($"mins").as[Seq[Long]].head()
    val expected = df.select($"h").as[Long].collect().distinct.sorted.take(k).toSeq
    assert(mins == expected)
  }

  test("merge is partition-layout invariant") {
    val base = spark.range(5000).select(
      (col("id") % 4).cast("string").as("g"), kmvHash($"id").as("h"))
    def run(parts: Int) =
      base.repartition(parts).groupBy($"g").agg(kmv(64)($"h").as("mins"))
        .select($"g", $"mins").as[(String, Seq[Long])].collect().toMap
    assert(run(1) == run(32))
  }

  test("estimator lands near the true distinct count") {
    val k = 256
    val est = spark.range(20000)
      .select(lit("g").as("g"), kmvHash($"id").as("h"))
      .groupBy($"g").agg(kmv(k)($"h").as("mins"))
      .select(kmvEstimate($"mins", k)).as[Double].head()
    // KMV stderr ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
    assert(math.abs(est - 20000.0) / 20000.0 < 0.25, s"est=$est")
  }
}
