package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Data-quality column profiling — the audit pass a pipeline runs before
  * trusting a new drop of data (row counts, null fractions, cardinality,
  * ranges). The reference's only audit is a row-count insert (SURVEY §2.1
  * S9); this generalizes it to per-column statistics.
  *
  * Two modes with deliberately different 100 TB shapes:
  *
  *  - `exact = false` (the scale default): ONE aggregation over one scan;
  *    every stat is algebraic or a mergeable HLL++ sketch
  *    (approx_count_distinct), all buffers are mutable primitives, so the
  *    plan is a partial+final HashAggregate with no Expand — a few KB
  *    cross the shuffle.
  *  - `exact = true`: exact distinct counts. A single-pass formulation
  *    would pay twice: multiple count(DISTINCT) rewrite via Expand
  *    (rows × columns through the aggregate) AND string min/max buffers
  *    (immutable → SortAggregate, sorting the expanded rows). Instead the
  *    profile unions one narrow aggregate per column, each scanning ONLY
  *    its column (parquet pruning) — the same total bytes as the one-scan
  *    variant, no Expand, no wide sorts, and the per-column subplans run
  *    as independent stages. This is the mode the DuckDB oracle gates
  *    bit-exactly.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    if (exact) cols.map(profileOne(df, _)).reduce(_.unionByName(_))
    else approxProfile(df, cols)
  }

  private def isNum(df: DataFrame, c: String) =
    df.schema(c).dataType.isInstanceOf[NumericType]

  /** Narrow exact profile of one column: the subplan prunes the scan to
    * this column alone, and the single-distinct aggregate plans as a
    * two-phase grouped aggregate — no Expand. */
  private def profileOne(df: DataFrame, c: String): DataFrame = {
    val (mnN, mxN, mnS, mxS) = minMax(df, c)
    df.select(col(c))
      .agg(count(lit(1)).as("n"), count(col(c)).as("n_nonnull"),
        countDistinct(col(c)).as("n_distinct"),
        mnN.as("min_num"), mxN.as("max_num"),
        mnS.as("min_str"), mxS.as("max_str"))
      .select(lit(c).as("col_name"), col("n"),
        (col("n") - col("n_nonnull")).as("n_null"), col("n_distinct"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
  }

  private def minMax(df: DataFrame, c: String): (Column, Column, Column, Column) =
    if (isNum(df, c))
      (min(col(c)).cast("double"), max(col(c)).cast("double"),
        first(lit(null).cast("string")), first(lit(null).cast("string")))
    else
      (first(lit(null).cast("double")), first(lit(null).cast("double")),
        min(col(c)).cast("string"), max(col(c)).cast("string"))

  /** One-pass sketch profile: single scan, HashAggregate, no Expand. */
  private def approxProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      count(lit(1)).as("__n") +: cols.flatMap { c =>
        val (mnN, mxN, mnS, mxS) = minMax(df, c)
        Seq(count(col(c)).as(s"__nn_$c"),
          approx_count_distinct(col(c)).as(s"__nd_$c"),
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

  /** Exact tie-aware ROC AUC per group — the Mann–Whitney rank-sum
    * form, the evaluation metric a quality-classifier pipeline reports
    * per source/language before trusting its threshold (q163's
    * classifier, q167's LM filter, any scored gate). Kept as an exact
    * integer pair so the metric replays in any engine (q201's hash
    * gate; a float AUC over averaged tie ranks is reduce-order
    * sensitive):
    *
    *   u2 = 2·U = Σ over distinct scores s:
    *          n_pos(s) · (2·negBelow(s) + n_neg(s))
    *   AUC  = u2 / (2 · n_pos · n_neg)
    *
    * (each positive counts 2 per negative strictly below it and 1 per
    * tied negative — the standard ½-credit tie convention, doubled
    * into integers).
    *
    * Scale shape: one (group, score) pre-aggregation — map-side
    * combine collapses the corpus to distinct-score rows per group
    * BEFORE the exchange — then a group-keyed cumulative window over
    * those rows and a final per-group aggregate riding the same
    * partitioning. Nothing pairwise, nothing global.
    *
    * Returns (groupCol, n_pos, n_neg, u2); AUC itself is u2 /
    * (2·n_pos·n_neg) — left to the caller so the gated columns stay
    * integers (a group with zero positives or negatives has no AUC). */
  def rankAuc(df: DataFrame, groupCol: String, scoreCol: String,
              isPositive: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(groupCol).as("grp"), col(scoreCol).as("s"),
        when(isPositive, 1L).otherwise(0L).as("pos"))
      .groupBy(col("grp"), col("s"))
      .agg(sum(col("pos")).as("np"), sum(lit(1L) - col("pos")).as("nn"))
      .withColumn("below", coalesce(sum(col("nn")).over(w), lit(0L)))
      .groupBy(col("grp").as(groupCol))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * (col("below") * 2 + col("nn"))).as("u2"))
  }
}
