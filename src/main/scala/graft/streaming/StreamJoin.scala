package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (SURVEY.md §2.9): correlate two live streams —
  * e.g. ad impressions with clicks, or error events with the purchase
  * that preceded them — without landing either to storage first.
  *
  * Scale shape: Structured Streaming keys the join state by the equi-join
  * column, so state is partitioned across executors like any shuffle; the
  * interval bound plus both watermarks let the engine EVICT state older
  * than `watermark + interval`, making state size proportional to the
  * in-flight window, not the stream's history. An interval join without
  * watermarks would grow state forever — this API makes the bound
  * mandatory.
  */
object StreamJoin {

  /** Inner interval join: rows pair when `left.key == right.key` and
    * `right.ts` falls in `[left.ts, left.ts + within]`.
    *
    * Right columns are prefixed `r_` (the key and timestamps stay once,
    * disambiguated) so the caller never deals with duplicate names.
    *
    * @param within   interval literal, e.g. "1 hour"
    * @param lateness watermark delay for BOTH sides, e.g. "10 minutes" —
    *                 state eviction horizon = lateness + within
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   within: String, lateness: String): DataFrame = {
    val l = left.withWatermark(leftTs, lateness).alias("l")
    val r0 = right.withWatermark(rightTs, lateness)
    val r = r0.select(r0.columns.map(c => col(c).as(s"r_$c")).toIndexedSeq: _*)
      .alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.r_$key") &&
        col(s"r.r_$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.r_$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $within"))
      .drop(col(s"r.r_$key"))
  }

  /** Left-outer variant: unmatched left rows emit once the watermark
    * proves no right row can still arrive (right columns null). Same
    * state-eviction bound as [[intervalJoin]]. */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame, key: String,
                            leftTs: String, rightTs: String,
                            within: String, lateness: String): DataFrame = {
    val l = left.withWatermark(leftTs, lateness).alias("l")
    val r0 = right.withWatermark(rightTs, lateness)
    val r = r0.select(r0.columns.map(c => col(c).as(s"r_$c")).toIndexedSeq: _*)
      .alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.r_$key") &&
        col(s"r.r_$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.r_$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $within"),
      "left_outer")
      .drop(col(s"r.r_$key"))
  }
}
