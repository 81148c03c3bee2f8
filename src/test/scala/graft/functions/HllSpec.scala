package graft.functions

import graft.SparkSpec
import graft.functions.KmvAggregator.kmvHash
import org.apache.spark.sql.functions._

/** Contracts of the replayable register-vector HLL (q116's engine).
  * The hash-gated surface (registers, zeros, fixed-point S, raw
  * estimate, merge proof) is covered by the q116 oracle; this spec pins
  * the properties the oracle can't see: the native aggregator against
  * an in-Spark declarative replay, layout invariance, the max-merge
  * union law on arbitrary splits, and the ln-based small-range
  * correction (not cross-engine exact, so T-gated here with tolerance
  * rather than oracle-gated). */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private val p = 6
  private val m = 1 << p
  private val maxRank = 48 - p + 1

  /** Declarative register replay: groupBy bucket / max rank via built-in
    * column functions only — the independent formulation the aggregator
    * must agree with (the native≡declarative pattern). */
  private def declarativeRegs(df: org.apache.spark.sql.DataFrame)
    : Map[Int, Int] =
    df.select(pmod(col("h"), lit(m.toLong)).cast("int").as("bucket"),
        shiftrightunsigned(col("h"), p).as("w"))
      .select(col("bucket"),
        when(col("w") === 0, maxRank)
          .otherwise(lit(maxRank) - length(conv(col("w"), 10, 2)))
          .cast("int").as("rank"))
      .groupBy("bucket").agg(max("rank").as("reg"))
      .as[(Int, Int)].collect().toMap

  private def nativeRegs(df: org.apache.spark.sql.DataFrame): Seq[Int] =
    df.agg(Hll.hll(p)(col("h")).as("regs")).as[Seq[Int]].head()

  test("native aggregator registers equal a declarative bucket/max-rank replay") {
    val df = spark.range(5000).select(kmvHash(col("id")).as("h"))
    val native = nativeRegs(df)
    val decl = declarativeRegs(df)
    assert(native.length == m)
    for (b <- 0 until m)
      assert(native(b) == decl.getOrElse(b, 0),
        s"bucket $b: native ${native(b)} vs declarative ${decl.getOrElse(b, 0)}")
  }

  test("registers are partition-layout invariant (merge is exercised, result identical)") {
    val base = spark.range(20000).select(kmvHash(col("id")).as("h"))
    assert(nativeRegs(base.repartition(1)) == nativeRegs(base.repartition(32)))
  }

  test("max-merge union law: merge of arbitrary split sketches equals whole-input sketch") {
    val df = spark.range(30000).select((col("id") % 5).as("part"),
      kmvHash(col("id") % 7001).as("h"))
    val whole = nativeRegs(df)
    val parts = df.groupBy("part").agg(Hll.hll(p)(col("h")).as("regs"))
      .select("regs").as[Seq[Int]].collect()
    val merged = parts.reduce((a, b) => a.zip(b).map { case (x, y) => math.max(x, y) })
    assert(merged == whole)
    // idempotence: re-merging any part changes nothing (the streaming
    // replay-collapse property)
    assert(parts.head.zip(whole).map { case (x, y) => math.max(x, y) } == whole)
  }

  test("raw estimator lands within 4 sigma in its operating range at several cardinalities") {
    for (n <- Seq(200, 2000, 50000)) {
      val df = spark.range(n).select(kmvHash(col("id") * 31 + 7).as("h"))
      val est = df.agg(Hll.hll(p)(col("h")).as("regs"))
        .select(Hll.rawEstimate(Hll.harmonicS(col("regs"), p), p))
        .as[Double].head()
      // sigma ~ 1.04/sqrt(64) = 13%; raw estimator bias grows toward the
      // small-range boundary, 4 sigma absorbs it down to n ~ 3m
      assert(math.abs(est - n) / n < 0.52, s"n=$n est=$est")
    }
  }

  test("small range: linear counting corrects the raw estimate (ln-based, T-gated only)") {
    val n = 40 // well under 2.5m = 160
    val df = spark.range(n).select(kmvHash(col("id")).as("h"))
    val row = df.agg(Hll.hll(p)(col("h")).as("regs"))
      .select(Hll.zeros(col("regs")).as("z"),
        Hll.rawEstimate(Hll.harmonicS(col("regs"), p), p).as("raw"))
    val (z, raw) = row.as[(Long, Double)].head()
    assert(z > 0)
    val lin = row.select(Hll.linearCount(col("z"), p)).as[Double].head()
    // the raw estimator is badly biased down here; linear counting is the
    // published small-range fix and must land close
    assert(math.abs(lin - n) / n < 0.25, s"lin=$lin raw=$raw")
    assert(math.abs(lin - n) <= math.abs(raw - n),
      s"linear counting ($lin) should beat raw ($raw) at n=$n")
  }

  test("fixed state: register vector is exactly m entries, every rank in [0, maxRank]") {
    val regs = nativeRegs(
      spark.range(100000).select(kmvHash(col("id")).as("h")))
    assert(regs.length == m)
    assert(regs.forall(r => r >= 0 && r <= maxRank))
    // at n >> m ln m, every bucket is occupied
    assert(regs.forall(_ >= 1))
  }
}
