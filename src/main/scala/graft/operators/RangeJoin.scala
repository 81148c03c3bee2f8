package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Bounded time-range join (J2 gap exemplar): pairs of rows whose
  * timestamps lie within `toleranceSec` of each other, optionally sharing
  * equality keys.
  *
  * A naive theta join `|l.ts - r.ts| <= tol` plans as a nested-loop
  * cross product — O(|L|×|R|) compares, fatal at scale. This operator
  * buckets both sides by floor(ts / tol) and replicates the LEFT side
  * into its own and the two adjacent buckets: any qualifying pair shares
  * a bucket, so the join is an equi-join on (keys, bucket) — shuffle
  * volume 3×|L| + |R|, compare volume proportional to bucket occupancy.
  * The exact predicate re-filters bucket collisions.
  */
object RangeJoin {

  def withinTolerance(left: DataFrame, right: DataFrame,
                      keys: Seq[String], leftTs: String, rightTs: String,
                      toleranceSec: Long,
                      leftPrefix: String = "l_", rightPrefix: String = "r_"):
      DataFrame = {
    val tol = lit(toleranceSec)
    val lSec = unix_timestamp(col(leftTs))
    val rSec = unix_timestamp(col(rightTs))

    val lRenamed = left.columns.foldLeft(left) { (df, c) =>
      if (keys.contains(c)) df else df.withColumnRenamed(c, leftPrefix + c)
    }
    val rRenamed = right.columns.foldLeft(right) { (df, c) =>
      if (keys.contains(c)) df else df.withColumnRenamed(c, rightPrefix + c)
    }

    val lBucketed = lRenamed.withColumn("__bucket", explode(array(
        (unix_timestamp(col(leftPrefix + leftTs)) / tol).cast("long") - 1,
        (unix_timestamp(col(leftPrefix + leftTs)) / tol).cast("long"),
        (unix_timestamp(col(leftPrefix + leftTs)) / tol).cast("long") + 1)))
    val rBucketed = rRenamed.withColumn("__bucket",
      (unix_timestamp(col(rightPrefix + rightTs)) / tol).cast("long"))

    lBucketed.join(rBucketed, keys :+ "__bucket")
      .filter(abs(unix_timestamp(col(leftPrefix + leftTs)) -
        unix_timestamp(col(rightPrefix + rightTs))) <= tol)
      .drop("__bucket")
  }
}
