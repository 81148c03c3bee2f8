package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional write layout: Z-order (Morton) clustering, the
  * lakehouse `OPTIMIZE ZORDER BY` technique. Sorting a write by the
  * interleaved bits of per-column quantile ranks places rows that are
  * close in EVERY dimension into the same files, so parquet min/max
  * stats prune multi-predicate scans — a single-column sort only prunes
  * its leading column.
  *
  * Scale shape: one approx_percentile pass computes 2^bits quantile cuts
  * per column (a driver-side collect of cols × 2^bits doubles — an
  * index-build step, like IVF's centroid broadcast; this is a write-time
  * layout JOB, eagerness is inherent and documented). Rank assignment is
  * then a map-side scan against the broadcast cut arrays, and the final
  * range-partitioned sort on the z-key is the only shuffle — never a
  * global percent_rank, which would serialize the corpus through one
  * task.
  */
object Layout {

  /** Adds `zCol` with the Morton interleave of the columns' quantile
    * ranks. `bits` per dimension (default 8 = 256 buckets; bits × number
    * of columns must stay ≤ 63). Column types must be numeric. */
  def withZOrderKey(df: DataFrame, cols: Seq[String], bits: Int = 8,
                    zCol: String = "__z"): DataFrame = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(bits > 0 && bits * cols.size <= 63,
      s"bits($bits) x cols(${cols.size}) must fit a signed long")
    // validate BEFORE the sketch pass: an ANSI cast failure inside the
    // agg would otherwise surface as an opaque runtime error
    for (c <- cols) {
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"z-order column '$c' must be numeric, found ${dt.simpleString}")
    }
    val n = 1 << bits
    val qs = (1 until n).map(q => q.toDouble / n)
    // one pass: every column's cut points from the same mergeable sketch
    val cutExprs = cols.map(c =>
      expr(s"approx_percentile(CAST(`$c` AS DOUBLE), array(${qs.mkString(",")}), 10000)")
        .as(s"__cuts_$c"))
    val cutRow = df.agg(cutExprs.head, cutExprs.tail: _*).head()
    val colCuts = cols.zipWithIndex.map { case (c, i) =>
      // approx_percentile over zero non-null values returns SQL NULL;
      // getSeq would then NPE inside the lit() mapping below. An
      // all-null dimension carries no clustering signal — rank it 0
      // everywhere explicitly (empty cut list).
      c -> (if (cutRow.isNullAt(i)) Seq.empty[Double]
            else cutRow.getSeq[Double](i).toSeq)
    }
    zOrderKeyFromCuts(df, colCuts, bits, zCol)
  }

  /** The deterministic half of [[withZOrderKey]]: rank each column
    * against EXPLICIT cut points and Morton-interleave the ranks —
    * integer bit math with no sketch involved, which is what lets the
    * q99 oracle replay key construction in SQL (only the sketch-cut
    * estimation above stays engine-specific). Callers with precomputed
    * or domain-known cuts (e.g. a stable production layout spec) use
    * this directly. */
  def zOrderKeyFromCuts(df: DataFrame, colCuts: Seq[(String, Seq[Double])],
                        bits: Int = 8, zCol: String = "__z"): DataFrame = {
    require(colCuts.nonEmpty, "z-order needs at least one column")
    require(bits > 0 && bits * colCuts.size <= 63,
      s"bits($bits) x cols(${colCuts.size}) must fit a signed long")
    val maxCuts = (1 << bits) - 1
    // a non-numeric column would cast to all-null doubles and silently
    // z-rank every row 0 in that dimension — refuse up front
    for ((c, cuts) <- colCuts) {
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"z-order column '$c' must be numeric, found ${dt.simpleString}")
      require(cuts.size <= maxCuts,
        s"column '$c': ${cuts.size} cuts exceed 2^$bits - 1 = $maxCuts buckets")
    }
    val ranked = colCuts.zipWithIndex.foldLeft(df) { case (acc, ((c, cuts), i)) =>
      // rank = number of cuts STRICTLY below the value (counting the
      // value's own cut would push the top bucket to 2^bits, overflowing
      // the per-dimension bit budget) — a codegen'd scan of the broadcast
      // (2^bits - 1)-element literal array, map-side
      val rank =
        if (cuts.isEmpty) lit(0L)
        else aggregate(array(cuts.map(lit): _*), lit(0L),
          (a, cut) => a + when(col(c).cast("double") > cut, 1L).otherwise(0L))
      acc.withColumn(s"__zr_$i", rank)
    }
    // Morton interleave: bit b of rank i lands at position b*dims + i
    val dims = colCuts.size
    val z = (0 until bits).flatMap { b =>
      (0 until dims).map { i =>
        shiftleft(shiftright(col(s"__zr_$i"), b).bitwiseAND(lit(1L)),
          b * dims + i)
      }
    }.reduce((a, c) => a.bitwiseOR(c))
    ranked.withColumn(zCol, z).drop((0 until dims).map(i => s"__zr_$i"): _*)
  }
}
