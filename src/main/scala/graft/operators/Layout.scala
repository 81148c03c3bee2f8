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
      acc.withColumn(s"__zr_$i", rankAgainstCuts(c, cuts))
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

  /** rank = number of cuts STRICTLY below the value (counting the
    * value's own cut would push the top bucket to 2^bits, overflowing
    * the per-dimension bit budget). OPTIMIZATION r13 (guide §4 — no
    * interpreted expressions in per-row hot paths): the
    * aggregate-over-literal-array form evaluated its lambda INTERPRETED
    * per row per cut; a flat sum of when() terms is the same count
    * fully inside whole-stage codegen (cuts ≤ 2^bits − 1 ≤ 255 by the
    * callers' require, well inside codegen's expression-split limits).
    * The cast is hoisted so the value converts once per row, not once
    * per cut. */
  private def rankAgainstCuts(c: String, cuts: Seq[Double]): Column =
    if (cuts.isEmpty) lit(0L)
    else {
      val v = col(c).cast("double")
      cuts.map(cut => when(v > lit(cut), 1L).otherwise(0L))
        .reduce(_ + _).cast("long")
    }

  /** The d = 2 Hilbert index of integer coordinate columns in
    * [0, 2^bits) — the published xy2d bit recurrence (Hilbert 1891;
    * the loop form popularized by Warren's Hacker's Delight /
    * Wikipedia): per level s = 2^(bits−1)…1, quadrant digit
    * (3·rx) XOR ry weighted by s², then the Gray-code rotation
    * (reflect at n−1 when rx = 1 ∧ ry = 0, swap when ry = 0). Pure
    * integer Column arithmetic, fully unrolled — replayable in an ANSI
    * oracle level by level. `bits` ≤ 8: each unroll level roughly
    * doubles the expression tree (x references the previous y twice),
    * so 8 levels is the codegen-friendly ceiling — and 2^8 × 2^8 cells
    * is already finer than file-level clustering resolves. */
  def hilbertIndex(xCol: Column, yCol: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 8, s"bits out of range: $bits")
    val n = 1L << bits
    var x = xCol
    var y = yCol
    var d: Column = lit(0L)
    for (i <- 0 until bits) {
      val s = 1L << (bits - 1 - i)
      val rx = when(x.bitwiseAND(lit(s)) > lit(0L), lit(1L)).otherwise(lit(0L))
      val ry = when(y.bitwiseAND(lit(s)) > lit(0L), lit(1L)).otherwise(lit(0L))
      d = d + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry)
      val nx = when(ry === lit(0L),
          when(rx === lit(1L), lit(n - 1) - y).otherwise(y))
        .otherwise(x)
      val ny = when(ry === lit(0L),
          when(rx === lit(1L), lit(n - 1) - x).otherwise(x))
        .otherwise(y)
      x = nx
      y = ny
    }
    d
  }

  /** Hilbert-curve layout key over two columns ranked against EXPLICIT
    * cut points — the d = 2 sibling of [[zOrderKeyFromCuts]]. Hilbert
    * ordering is strictly more local than Morton: every pair of
    * consecutive key values is an ADJACENT grid cell (Morton takes
    * diagonal jumps at every power-of-two boundary), so file min/max
    * ranges under a Hilbert sort are tighter on both dimensions — the
    * reason lakehouse OPTIMIZE implementations moved from ZORDER to
    * Hilbert. Same scale shape as z-order: map-side rank against the
    * broadcast cut arrays, integer bit math, and the final
    * range-partitioned sort on the key is the only shuffle. */
  def hilbertKeyFromCuts(df: DataFrame, xSpec: (String, Seq[Double]),
                         ySpec: (String, Seq[Double]), bits: Int = 4,
                         hCol: String = "__h"): DataFrame = {
    val maxCuts = (1 << bits) - 1
    for ((c, cuts) <- Seq(xSpec, ySpec)) {
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"hilbert column '$c' must be numeric, found ${dt.simpleString}")
      require(cuts.size <= maxCuts,
        s"column '$c': ${cuts.size} cuts exceed 2^$bits - 1 = $maxCuts buckets")
    }
    // ranks become attributes BEFORE the unrolled recurrence references
    // them: each unroll level duplicates the previous x/y trees, so an
    // inlined rank expression (a cut-array scan) would be copied
    // O(2^bits) times into the key expression — as attributes the copies
    // are bound references and each rank is computed once per row
    df.withColumn("__hx", rankAgainstCuts(xSpec._1, xSpec._2))
      .withColumn("__hy", rankAgainstCuts(ySpec._1, ySpec._2))
      .withColumn(hCol, hilbertIndex(col("__hx"), col("__hy"), bits))
      .drop("__hx", "__hy")
  }
}
