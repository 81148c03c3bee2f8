package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Pins the data-dependent assumption behind the q46 (IVF) oracle: its
  * rank comparisons (probe cut at rank nprobe, assignment at rank 1,
  * final top-k) compare cosines computed independently by Spark and
  * DuckDB, which can differ by a few ulps from summation order. The gate
  * is only deterministic while the cosine GAPS at those boundaries dwarf
  * ulp noise. This test measures the minimum boundary gaps on the real
  * corpus — if a regenerated testdata drop ever makes them collapse
  * toward 1e-12, this fails loudly BEFORE the oracle flakes.
  * (q28's SimHash oracle needs no such pin: it is integer-exact.)
  */
class OracleGeometrySpec extends SparkSpec {
  import spark.implicits._

  test("q46 probe/assignment/top-k cosine boundary gaps dwarf cross-engine ulps") {
    val d = "/root/testdata/sf0.001"
    val vecs = Tables.embeddings(spark, d)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
    // the same centroid sample the operator takes (cells = 16, q46)
    val centroids = vecs
      .orderBy(sha2(concat(col("id").cast("string"), lit(":ivf")), 256), col("id"))
      .limit(16)
      .select(col("id").as("cell_id"), col("v").as("cv"))
    val scored = vecs.crossJoin(broadcast(centroids))
      .select(col("id"),
        operators.Similarity.cosine(col("v"), col("cv")).as("ccos"))
    val w = Window.partitionBy(col("id")).orderBy(col("ccos").desc)
    val gaps = scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .withColumn("next", lead(col("ccos"), 1).over(w))
      .filter(col("next").isNotNull)
      .select((col("ccos") - col("next")).as("gap"), col("rk"))
    // rank1->2 is the assignment boundary, rank2->3 the nprobe=2 cut
    val minGaps = gaps.groupBy(col("rk")).agg(min(col("gap")).as("g"))
      .as[(Int, Double)].collect().toMap
    assert(minGaps(1) > 1e-9, s"assignment boundary gap ${minGaps(1)} too tight")
    assert(minGaps(2) > 1e-9, s"probe-cut boundary gap ${minGaps(2)} too tight")
  }
}
