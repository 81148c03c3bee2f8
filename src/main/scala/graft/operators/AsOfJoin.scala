package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — backward (most recent right row with `rightTs <=
  * leftTs`), forward (earliest right row with `rightTs >= leftTs`), and
  * nearest (whichever side is closer in time, ties to backward) — per
  * equality-key group (J2 gap exemplar — Spark has no built-in as-of
  * join; the direction trio mirrors pandas `merge_asof`).
  *
  * Implementation is the union + sort + running-match technique rather
  * than a range join: both sides are tagged and unioned, one shuffle
  * partitions by key, and a running `last` (backward) / `first` (forward)
  * with `ignoreNulls` over (ts, side) ordering makes the matching right
  * payload visible to every left row. At equal timestamps the right row
  * sorts inside the frame, so both directions are inclusive — identical
  * to DuckDB `ASOF JOIN ... ON r.ts <= l.ts` / `>= l.ts` semantics.
  * [[nearest]] evaluates both windows over the SAME keyed union — one
  * Exchange, two sorts — and resolves by microsecond distance.
  *
  * Null timestamps match nothing, matching pandas `merge_asof` and
  * DuckDB ASOF: right rows with a null timestamp are dropped from the
  * union, and a left row with a null timestamp survives (left-outer)
  * with null right columns. Among right rows tied on (keys, ts), all
  * three directions deterministically pick the smallest packed payload
  * struct (see [[orderCols]]).
  *
  * Scale shape: cost is one shuffle of (keys + ts + payload) and per-key
  * sorts — linear in |L|+|R|, immune to the candidate blow-up a
  * theta/range join would risk. Skewed keys behave like any window
  * partition (AQE cannot split a window partition; salt the key upstream
  * if one key dominates).
  */
object AsOfJoin {

  /** Tagged union of both sides: keys, __ts, __side (right=0, left=1),
    * __rv = struct(__rts, right values), __lrow = full left row. */
  private def tagged(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String,
                     rightValueCols: Seq[String]): DataFrame = {
    val rv = struct(col(rightTs).cast("timestamp").as("__rts") +:
      rightValueCols.map(col): _*)
    val lrow = struct(left.columns.toSeq.map(col): _*)
    val rvType = right.select(rv.as("v")).schema("v").dataType
    val lrowType = left.select(lrow.as("v")).schema("v").dataType

    val keyCols = keys.map(col)
    // A null rightTs can never satisfy either inequality: drop those rows
    // before the union (pandas merge_asof and DuckDB ASOF likewise never
    // match null timestamps — unfiltered, nulls sort first and a
    // forward/nearest first() would wrongly bind them).
    val r2 = right.select(keyCols
      :+ col(rightTs).cast("timestamp").as("__ts")
      :+ lit(0).as("__side")
      :+ rv.as("__rv")
      :+ lit(null).cast(lrowType).as("__lrow"): _*)
      .filter(col("__ts").isNotNull)
    val l2 = left.select(keyCols
      :+ col(leftTs).cast("timestamp").as("__ts")
      :+ lit(1).as("__side")
      :+ lit(null).cast(rvType).as("__rv")
      :+ lrow.as("__lrow"): _*)
    r2.unionByName(l2)
  }

  /** A left row with a null timestamp is incomparable to every right
    * timestamp: it survives in the output (as-of is left-outer) but must
    * match nothing — without this guard it sorts first and the forward
    * frame's first() would bind it to the earliest right row. */
  private def nullSafeMatch(m: Column): Column =
    when(col("__ts").isNotNull, m)

  /** True when the packed right-payload struct admits SQL ordering — the
    * precondition for using it as a deterministic tie-break key. Payloads
    * containing unorderable types (maps) fall back to (ts, side) ordering
    * alone: correct, but the pick among right rows that share BOTH keys
    * and timestamp is then sort-unstable (document rows must be
    * distinguishable by ts for full determinism in that case). */
  private def rvOrderable(right: DataFrame, rightTs: String,
                          rightValueCols: Seq[String]): Boolean = {
    val rv = struct(col(rightTs).cast("timestamp").as("__rts") +:
      rightValueCols.map(col): _*)
    org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
      right.select(rv.as("v")).schema("v").dataType)
  }

  /** Both directions resolve ties among right rows sharing (keys, ts) to
    * the SAME row: the smallest packed payload struct. forward's first()
    * reads tied rows in __rv ASC order; backward's last() reads them in
    * __rv DESC order so the frame edge also lands on the minimum. One
    * convention means backward/forward/nearest — and any SQL oracle
    * replay pinned to min-payload — agree even on colliding timestamps. */
  private def orderCols(forward: Boolean, tieBreak: Boolean) = {
    val side = if (forward) col("__side").desc else col("__side").asc
    if (tieBreak) {
      val rv = if (forward) col("__rv").asc else col("__rv").desc_nulls_last
      Seq(col("__ts").asc, side, rv)
    } else Seq(col("__ts").asc, side)
  }

  /** Backward window: right rows sort before an equal-ts left row, so the
    * running `last` over (ts asc, side asc) is inclusive. `__rv` as the
    * final sort key (when orderable) makes the pick among right rows
    * sharing (keys, ts) deterministic — without it the frame edge lands
    * on whichever tied row the unstable sort left last, varying with
    * partition layout and retries. */
  private def backWindow(keys: Seq[String], tieBreak: Boolean) = Window
    .partitionBy(keys.map(col): _*)
    .orderBy(orderCols(forward = false, tieBreak): _*)
    .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Forward window: side DESC puts an equal-ts right row AFTER the left
    * row, so the running `first` over the following frame is inclusive;
    * `__rv` deterministically orders tied right rows (see backWindow). */
  private def fwdWindow(keys: Seq[String], tieBreak: Boolean) = Window
    .partitionBy(keys.map(col): _*)
    .orderBy(orderCols(forward = true, tieBreak): _*)
    .rowsBetween(Window.currentRow, Window.unboundedFollowing)

  private def project(left: DataFrame, keys: Seq[String],
                      rightValueCols: Seq[String], rightSuffix: String,
                      matched: DataFrame): DataFrame = {
    val leftCols = left.columns.toSeq
    val usedNames = leftCols.toSet ++ keys
    val outLeft: Seq[Column] = leftCols.map(c => col(s"__lrow.`$c`").as(c))
    val outRight: Seq[Column] = rightValueCols.map { c =>
      val name = if (usedNames.contains(c)) c + rightSuffix else c
      col(s"__match.`$c`").as(name)
    }
    matched.filter(col("__side") === 1).select(outLeft ++ outRight: _*)
  }

  /** @param rightValueCols right columns to surface (suffixed with
    *                       `rightSuffix` on name collisions with left) */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightValueCols: Seq[String],
               rightSuffix: String = "_right"): DataFrame = {
    val tb = rvOrderable(right, rightTs, rightValueCols)
    val u = tagged(left, right, keys, leftTs, rightTs, rightValueCols)
      .withColumn("__match", nullSafeMatch(last(col("__rv"), ignoreNulls = true)
        .over(backWindow(keys, tb))))
    project(left, keys, rightValueCols, rightSuffix, u)
  }

  /** Earliest right row with `rightTs >= leftTs` (inclusive). */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String,
              rightValueCols: Seq[String],
              rightSuffix: String = "_right"): DataFrame = {
    val tb = rvOrderable(right, rightTs, rightValueCols)
    val u = tagged(left, right, keys, leftTs, rightTs, rightValueCols)
      .withColumn("__match", nullSafeMatch(first(col("__rv"), ignoreNulls = true)
        .over(fwdWindow(keys, tb))))
    project(left, keys, rightValueCols, rightSuffix, u)
  }

  /** Closest right row in either direction; equal distances (and
    * equal-ts matches) resolve BACKWARD. Both directional matches ride
    * the same keyed union — one shuffle, two sorts. */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String,
              rightValueCols: Seq[String],
              rightSuffix: String = "_right"): DataFrame = {
    val tb = rvOrderable(right, rightTs, rightValueCols)
    val u = tagged(left, right, keys, leftTs, rightTs, rightValueCols)
      .withColumn("__b", nullSafeMatch(last(col("__rv"), ignoreNulls = true)
        .over(backWindow(keys, tb))))
      .withColumn("__f", nullSafeMatch(first(col("__rv"), ignoreNulls = true)
        .over(fwdWindow(keys, tb))))
      .withColumn("__match",
        when(col("__b").isNull, col("__f"))
          .when(col("__f").isNull, col("__b"))
          .when(unix_micros(col("__ts")) - unix_micros(col("__b.__rts")) <=
                unix_micros(col("__f.__rts")) - unix_micros(col("__ts")),
            col("__b"))
          .otherwise(col("__f")))
    project(left, keys, rightValueCols, rightSuffix, u)
  }
}
