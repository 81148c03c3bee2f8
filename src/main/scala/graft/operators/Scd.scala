package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC / slowly-changing-dimension operators — the incremental-load
  * semantics behind the reference's landing→analytical flow (SURVEY §3.2:
  * staging-transform.py's hash_id anti-join is an append-only special
  * case). This family generalizes it to the standard warehouse merge
  * shapes: latest-state compaction, no-op-change removal, type-2
  * versioned history, and an idempotent history merge.
  *
  * Scale shape: every operator is ONE hash shuffle on the business key.
  * [[latestByKey]] is a hash aggregate (map-side partial combine — per-key
  * state is a single row, no per-partition sort). The history operators
  * are windows over the same (key, order) spec, which Catalyst collapses
  * onto a single Exchange.
  */
object Scd {

  /** Latest-state table from a change log: one row per key — the row with
    * the greatest (orderCol, tieBreak). A `max_by` aggregate, not a
    * window: partial aggregation runs map-side, so only one candidate row
    * per key per task reaches the shuffle — the right shape when the log
    * is large and keys are many.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], orderCol: String,
                  tieBreak: String): DataFrame = {
    val rest = df.columns.filterNot(keys.contains)
    val payload = struct(rest.toSeq.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, struct(col(orderCol), col(tieBreak))).as("__latest"))
      .select(keys.map(col) ++ rest.map(c => col(s"__latest.`$c`").as(c)): _*)
  }

  /** Change compaction: drop log rows whose tracked attributes equal the
    * previous row's for the same key in (orderCol, tieBreak) order — the
    * no-op updates a CDC feed is full of. Null-safe struct compare, so a
    * null attribute equals a null attribute (no phantom changes). */
  def changeCompact(df: DataFrame, keys: Seq[String], orderCol: String,
                    tieBreak: String, attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol), col(tieBreak))
    val a = struct(attrs.map(col): _*)
    df.withColumn("__prev", lag(a, 1).over(w))
      .filter(!(col("__prev") <=> a))
      .drop("__prev")
  }

  /** Type-2 history from a change log: compacted changes become versioned
    * rows with [effective_from, effective_to) ranges over `orderCol`;
    * `effective_to` is null on the current version. `version` counts from
    * 1 per key. Both windows share the compaction's (key, order) spec —
    * one Exchange in the physical plan. */
  def scdHistory(df: DataFrame, keys: Seq[String], orderCol: String,
                 tieBreak: String, attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol), col(tieBreak))
    changeCompact(df, keys, orderCol, tieBreak, attrs)
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("effective_from", col(orderCol))
      .withColumn("effective_to", lead(col(orderCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
  }

  /** Time-window dedup (alarm dampening): keep a row only if its
    * IMMEDIATE predecessor for the same key is more than `windowMicros`
    * older — i.e. suppress repeats that arrive within the window of the
    * previous occurrence (gap semantics, the same boundary rule as
    * sessionization: any burst closer-spaced than the window collapses to
    * its first row). A single lag() pass, one shuffle on the key — no
    * iterative "first per fixed window" state needed.
    */
  def windowDedup(df: DataFrame, keys: Seq[String], tsMicrosCol: String,
                  tieBreak: String, windowMicros: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsMicrosCol), col(tieBreak))
    val prev = lag(col(tsMicrosCol), 1).over(w)
    df.withColumn("__prev_ts", prev)
      .filter(col("__prev_ts").isNull ||
        col(tsMicrosCol) - col("__prev_ts") > windowMicros)
      .drop("__prev_ts")
  }

  /** Idempotent SCD2 merge: existing history rows ARE a change log (each
    * version is a change at its `effective_from`), so merging = unioning
    * that log with the new batch and re-deriving [[scdHistory]]. Inserts,
    * updates, and replayed/no-op rows are handled uniformly; applying a
    * batch twice — or in two halves — produces identical history (the
    * compaction drops the replays). One shuffle on the key, same as a
    * from-scratch build over the incremental slice.
    */
  def scdMerge(history: DataFrame, updates: DataFrame, keys: Seq[String],
               orderCol: String, tieBreak: String, attrs: Seq[String]): DataFrame = {
    val logCols = (keys ++ Seq(tieBreak) ++ attrs).distinct
    // effective_from is re-aliased AS orderCol below; a name collision
    // would build a select with two identically-named columns and fail
    // (or mis-bind) at analysis — refuse with a clear message instead
    require(!logCols.contains(orderCol),
      s"scdMerge: orderCol '$orderCol' must not also appear in keys/tieBreak/attrs")
    val asLog = history
      .select((logCols.map(col) :+ col("effective_from").as(orderCol)): _*)
    scdHistory(asLog.unionByName(updates.select((logCols :+ orderCol).map(col): _*)),
      keys, orderCol, tieBreak, attrs)
  }
}
