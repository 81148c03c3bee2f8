package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min frequency sketch — the frequency member of the engine's
  * mergeable-sketch family (KMV = distinct counting, q102; this =
  * per-key frequency estimation). For "how often does each of these
  * tokens/urls/ngrams appear in 100 TB" the exact answer is a groupBy
  * whose state is proportional to the KEY CARDINALITY; the sketch's
  * state is a FIXED depth×width counter grid, so the aggregation's
  * map-side state, shuffle volume, and final size are all constants
  * chosen up front — and two corpora's sketches merge by summing
  * grids, the same property that makes per-day KMV partials
  * window-mergeable in q113.
  *
  * Like KMV, the hash is the deterministic sha256-prefix construction
  * (48 bits via hex digits — [[graft.functions.KmvAggregator.kmvHash]]'s
  * recipe, salted per depth row), so ANY ANSI engine replays the whole
  * sketch: bucket assignment, grid counts, and the min-over-depths
  * estimate are integer arithmetic end to end. That puts the ESTIMATES
  * under the DuckDB value hash (q114) — not a tolerance contract.
  *
  * Estimator guarantees (Cormode & Muthukrishnan 2005): estimates never
  * undershoot (every occurrence lands in all `depth` counted buckets);
  * overshoot comes from collisions and is ≤ 2n/width with probability
  * 1 - (1/2)^depth per key, n = total occurrences.
  */
object FreqSketch {

  /** Bucket of `key` in depth row `d`: 48-bit sha256-prefix hash of
    * "d:key", mod `width`. String-cast keys only (the kmvHash caveat:
    * float formatting is engine-specific). */
  def bucketOf(key: Column, d: Int, width: Int): Column =
    pmod(conv(substring(sha2(concat(lit(s"$d:"), key.cast("string")), 256),
      1, 12), 16, 10).cast("long"), lit(width.toLong))

  private def bucketed(key: Column, depth: Int, width: Int) =
    posexplode(array((0 until depth).map(d => bucketOf(key, d, width)): _*))

  /** The sketch as a DataFrame: `(depth, bucket, cnt)` — at most
    * depth×width rows regardless of corpus size. One pass over the
    * keys; the partial aggregate bounds map-side state at the grid
    * size, and the exchange carries at most depth×width rows per task
    * (PlanSpec pins the partial+final pair on q114). Merge two corpora:
    * union the frames and re-aggregate with `sum`. */
  def countMin(keys: DataFrame, key: Column, depth: Int = 4,
               width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
    require(width >= 16, s"width too small: $width")
    keys.select(bucketed(key, depth, width))
      .toDF("depth", "bucket")
      .groupBy(col("depth"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes`' `keyCol` values against a
    * [[countMin]] sketch: min over depth rows of the key's bucket
    * count (0 when a bucket is empty — no occurrences at all). The
    * sketch is grid-sized, so it broadcasts; the probe side never
    * shuffles more than (key, depth, bucket) triples. */
  def estimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
               depth: Int = 4, width: Int = 1024): DataFrame =
    probes.select(col(keyCol), bucketed(col(keyCol), depth, width))
      .toDF(keyCol, "depth", "bucket")
      .join(broadcast(sketch), Seq("depth", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
