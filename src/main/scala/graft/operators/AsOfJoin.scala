package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the most recent right row with
  * `rightTs <= leftTs` among rows sharing the equality keys (J2 gap
  * exemplar — Spark has no built-in as-of join).
  *
  * Implementation is the union + sort + running-`last` technique rather
  * than a range join: both sides are tagged and unioned on
  * (keys, ts, side), one shuffle partitions by key, and a running
  * `last(right_payload, ignoreNulls)` over (ts, side) ordering makes the
  * latest right payload visible to every subsequent left row. At equal
  * timestamps the right row sorts first, so the match is inclusive —
  * identical to DuckDB/pandas `ASOF JOIN ... ON r.ts <= l.ts` semantics.
  *
  * Scale shape: cost is one shuffle of (keys + ts + payload) and a
  * per-key sort — linear in |L|+|R|, immune to the candidate blow-up a
  * theta/range join would risk. Skewed keys behave like any window
  * partition (AQE cannot split a window partition; salt the key upstream
  * if one key dominates).
  */
object AsOfJoin {

  /** @param rightValueCols right columns to surface (suffixed with
    *                       `rightSuffix` on name collisions with left) */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightValueCols: Seq[String],
               rightSuffix: String = "_right"): DataFrame = {
    val leftCols = left.columns.toSeq
    val rv = struct(rightValueCols.map(col): _*)
    val lrow = struct(leftCols.map(col): _*)
    val rvType = right.select(rv.as("v")).schema("v").dataType
    val lrowType = left.select(lrow.as("v")).schema("v").dataType

    val keyCols = keys.map(col)
    val r2 = right.select(keyCols
      :+ col(rightTs).cast("timestamp").as("__ts")
      :+ lit(0).as("__side")
      :+ rv.as("__rv")
      :+ lit(null).cast(lrowType).as("__lrow"): _*)
    val l2 = left.select(keyCols
      :+ col(leftTs).cast("timestamp").as("__ts")
      :+ lit(1).as("__side")
      :+ lit(null).cast(rvType).as("__rv")
      :+ lrow.as("__lrow"): _*)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val outLeft: Seq[Column] = leftCols.map(c => col(s"__lrow.$c").as(c))
    val usedNames = leftCols.toSet ++ keys
    val outRight: Seq[Column] = rightValueCols.map { c =>
      val name = if (usedNames.contains(c)) c + rightSuffix else c
      col(s"__match.$c").as(name)
    }

    r2.unionByName(l2)
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(outLeft ++ outRight: _*)
  }
}
