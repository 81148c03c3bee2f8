package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Data-quality column profiling — the audit pass a pipeline runs before
  * trusting a new drop of data (row counts, null fractions, cardinality,
  * ranges). The reference's only audit is a row-count insert (SURVEY §2.1
  * S9); this generalizes it to per-column statistics.
  *
  * Scale shape: ONE aggregation over the scan producing a single row of
  * packed statistics (every stat is algebraic / sketch-mergeable, so
  * partial aggregation runs map-side), then a driver-free explode of that
  * row into the long (column, stats) format. With `exact = false`
  * (the 100 TB default) distinct counts come from approx_count_distinct
  * (HLL++) and the plan contains no Expand — one pass over the data, a
  * few KB through the shuffle. `exact = true` switches to count(DISTINCT),
  * which Catalyst rewrites via Expand into rows × profiled-columns
  * aggregation input — acceptable for a handful of columns, and the mode
  * the DuckDB oracle gates bit-exactly.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    val schema = df.schema
    def isNum(c: String) = schema(c).dataType.isInstanceOf[NumericType]
    val aggs: Seq[Column] =
      count(lit(1)).as("__n") +: cols.flatMap { c =>
        val nd = if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
        val (mnN, mxN) =
          if (isNum(c)) (min(col(c)).cast("double"), max(col(c)).cast("double"))
          else (first(lit(null).cast("double")), first(lit(null).cast("double")))
        val (mnS, mxS) =
          if (isNum(c)) (first(lit(null).cast("string")), first(lit(null).cast("string")))
          else (min(col(c)).cast("string"), max(col(c)).cast("string"))
        Seq(count(col(c)).as(s"__nn_$c"), nd.as(s"__nd_$c"),
          mnN.as(s"__mnn_$c"), mxN.as(s"__mxn_$c"),
          mnS.as(s"__mns_$c"), mxS.as(s"__mxs_$c"))
      }
    val packed = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mnn_$c").as("min_num"), col(s"__mxn_$c").as("max_num"),
        col(s"__mns_$c").as("min_str"), col(s"__mxs_$c").as("max_str"))
    }
    packed.select(explode(array(entries: _*)).as("p")).select("p.*")
  }
}
