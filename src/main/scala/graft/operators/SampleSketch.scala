package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bottom-k uniform row sample — the quantile member of the engine's
  * mergeable-sketch family (KMV q102/q113 = distinct counting,
  * Count-Min q114 = frequencies, this = distribution shape). The
  * sample is the k rows whose unique row key hashes smallest under the
  * deterministic sha256-prefix hash ([[graft.functions.KmvAggregator
  * .kmvHash]]), which buys three properties at once:
  *
  *  - **uniformity**: a cryptographic hash of a unique key is a
  *    uniform random draw, so the sample is an unbiased row sample and
  *    its empirical quantiles carry the standard rank-error bound
  *    |F(q̂_p) − p| = O(1/√k);
  *  - **mergeability**: bottom-k of a union is the bottom-k of the
  *    parts' bottom-k samples — per-partition (or per-day) samples
  *    merge losslessly, the same property KMV rests on;
  *  - **replayability**: any ANSI engine recomputes the hash order, so
  *    the SAMPLE ITSELF — and therefore every quantile computed from
  *    it — is deterministic and sits under a value-hash gate (q115),
  *    unlike t-digest/KLL whose internals are engine-specific.
  *
  * Scale shape: the rank cut plans as WindowGroupLimit — a map-side
  * partial top-k BEFORE the exchange — so at most k rows per group per
  * task cross the shuffle regardless of corpus size (pinned in
  * PlanSpec for q115).
  */
object SampleSketch {

  /** The k rows of each group with the smallest `kmvHash(rowKey)`,
    * original schema preserved. `rowKey` must be unique per row (ties
    * break on the key itself, so a duplicated key would bias the
    * sample toward itself). */
  def bottomK(df: DataFrame, groupCols: Seq[String], rowKey: Column,
              k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(graft.functions.KmvAggregator.kmvHash(rowKey), rowKey)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
