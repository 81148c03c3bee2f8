package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — classify every key across two table versions as
  * inserted / deleted / changed / unchanged. The audit a pipeline runs
  * when a new drop of an upstream table arrives (how much actually
  * changed?), and the precondition check for incremental loads.
  *
  * Scale shape: both sides project to (keys, xxhash64(packed non-key
  * columns)) BEFORE the full outer join, so the join shuffles fixed-width
  * rows — key + 8 bytes — never the payloads, and the classification is
  * a null/equality check on the hashes. One shuffle per side.
  */
object Diff {

  /** Per-key classification. Returns (keys..., change_type). */
  def snapshotDiff(old: DataFrame, current: DataFrame,
                   keys: Seq[String]): DataFrame = {
    def hashed(df: DataFrame, hcol: String) = {
      val payload = df.columns.filterNot(keys.contains).map(col)
      df.select(keys.map(col) :+ xxhash64(struct(payload.toSeq: _*)).as(hcol): _*)
    }
    hashed(old, "__h_old")
      .join(hashed(current, "__h_new"), keys, "full_outer")
      .select(keys.map(col) :+
        when(col("__h_old").isNull, "inserted")
          .when(col("__h_new").isNull, "deleted")
          .when(col("__h_old") === col("__h_new"), "unchanged")
          .otherwise("changed").as("change_type"): _*)
  }

  /** Aggregate diff report: one row per change_type with counts. */
  def diffSummary(old: DataFrame, current: DataFrame,
                  keys: Seq[String]): DataFrame =
    snapshotDiff(old, current, keys)
      .groupBy(col("change_type")).agg(count(lit(1)).as("n"))

  /** Two-sample Kolmogorov–Smirnov drift: D = sup_x |F_a(x) − F_b(x)|,
    * the standard distribution-shift alarm between training-data
    * snapshots (new crawl vs old, this week's events vs last). The
    * diff family's numeric sibling: [[snapshotDiff]] answers "which
    * rows changed", this answers "did the DISTRIBUTION move".
    *
    * `buckets` = 0 computes D exactly at every distinct value — right
    * when the column's distinct count is bounded (grades, quantities,
    * categories-as-codes). `buckets` > 0 first bins values into
    * fixed-width buckets over the combined [min, max]; the sup is then
    * taken at bucket boundaries, an under-estimate by at most the mass
    * of one bucket — the documented approximation that keeps the
    * cumulative pass bucket-sized for continuous columns.
    *
    * The statistic itself is INTEGER-EXACT: D = max |cumA·m − cumB·n|
    * / (n·m), computed as an integer max before the single final
    * division (no float accumulation anywhere; n·m ≤ 2^63 guards via
    * require). Returns one row (d, n_a, n_b).
    *
    * 100 TB shape: one union scan with per-side indicator columns, one
    * partial-agg'd groupBy on value/bucket, then the cumulative sums
    * run over the AGGREGATED frame — bucket-count-sized (or
    * distinct-value-sized), not corpus-sized, which is what makes the
    * single-partition window acceptable; min/max travel as a 1-row
    * broadcast scalar. */
  def ksDrift(a: DataFrame, b: DataFrame, valueCol: String,
              buckets: Int = 0): DataFrame = {
    require(buckets == 0 || buckets >= 2,
      s"buckets must be 0 (exact) or >= 2: $buckets")
    import org.apache.spark.sql.expressions.Window
    val av = a.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .select(col("v"), lit(1L).as("sa"), lit(0L).as("sb"))
    val bv = b.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .select(col("v"), lit(0L).as("sa"), lit(1L).as("sb"))
    val u = av.unionByName(bv)
    val keyed =
      if (buckets == 0) u.withColumn("k", col("v"))
      else {
        val mm = u.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
        u.crossJoin(broadcast(mm)).withColumn("k",
          when(col("hi") > col("lo"),
            least(floor((col("v") - col("lo")) / (col("hi") - col("lo"))
              * buckets), lit(buckets - 1L)).cast("double"))
            .otherwise(lit(0.0)))
      }
    val cnt = keyed.groupBy(col("k"))
      .agg(sum(col("sa")).as("ca"), sum(col("sb")).as("cb"))
    val tot = cnt.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val w = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // cross-multiplied integer form: |cumA·m − cumB·n| in DECIMAL(38,0)
    // (long products overflow past n·m ≈ 2^63, i.e. ~3·10^9 rows a
    // side); the max is exact, only the single final division is float
    cnt
      .withColumn("cuma", sum(col("ca")).over(w).cast("decimal(38,0)"))
      .withColumn("cumb", sum(col("cb")).over(w).cast("decimal(38,0)"))
      .crossJoin(broadcast(tot))
      .agg(max(abs(col("cuma") * col("n_b").cast("decimal(38,0)") -
          col("cumb") * col("n_a").cast("decimal(38,0)"))).as("dnum"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      .select(
        (col("dnum").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double"))).as("d"),
        col("n_a"), col("n_b"))
  }
}
