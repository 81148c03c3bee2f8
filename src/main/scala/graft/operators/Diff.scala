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
}
