package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md §4 / the 100 TB design notes).
  *
  * AQE's skew-join split handles moderate skew at runtime, but two
  * cases need explicit salting: (a) a single group key that dominates a
  * shuffle aggregation (AQE cannot split one reduce key), and (b) a
  * shuffle join where one hot key floods a partition. Both helpers are
  * deterministic — salt comes from hashing row content, not rand() — so
  * re-runs and the test oracle see identical results.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(keys + salt) partial results,
    * then groupBy(keys) to merge. The hot key's rows spread over
    * `saltBuckets` reducers in phase 1; phase 2 merges `saltBuckets`
    * rows per key — O(keys × salt), tiny. Supports algebraic aggregates
    * (sum/count/min/max); avg = salted sum + salted count composed. */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int)(
      aggs: (Seq[(Column, String)], Seq[(Column, String)])): DataFrame = {
    val (phase1, phase2) = aggs
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.toSeq.map(col): _*)), lit(saltBuckets.toLong)))
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(phase1.head._1.as(phase1.head._2),
        phase1.tail.map { case (c, n) => c.as(n) }: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(phase2.head._1.as(phase2.head._2),
        phase2.tail.map { case (c, n) => c.as(n) }: _*)
  }

  /** Salted count per key — the common case packaged. */
  def saltedCount(df: DataFrame, keys: Seq[String], saltBuckets: Int = 16): DataFrame =
    saltedAgg(df, keys, saltBuckets)(
      (Seq(count(lit(1)) -> "__n"), Seq(sum(col("__n")) -> "n")))

  /** Salted sum per key. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                saltBuckets: Int = 16): DataFrame =
    saltedAgg(df, keys, saltBuckets)(
      (Seq(sum(col(valueCol)) -> "__s"), Seq(sum(col("__s")) -> s"sum_$valueCol")))

  /** Skew join: the big (skewed) side gets a deterministic salt in
    * [0, n); the small side is replicated n times with every salt value.
    * The join key becomes (key, salt), spreading each hot key across n
    * partitions at the cost of n× the small side — the classic
    * replicate-and-salt trade. Use when the small side is too big to
    * broadcast but the key distribution is skewed. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int = 8): DataFrame = {
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.toSeq.map(col): _*)), lit(saltBuckets.toLong)))
    val smallS = small.withColumn("__salt",
      explode(array((0 until saltBuckets).map(i => lit(i.toLong)): _*)))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
