package graft.zones

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing exemplar (SURVEY.md §2.3 J2 scale note): two tables bucketed
  * on the join key co-locate, so the join runs shuffle-free — the storage
  * layout choice that matters most for repeated large-table joins at
  * 100 TB. Local Derby metastore + default warehouse dir.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key plans without a shuffle") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    spark.read.parquet(s"$dir/customer.parquet")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")

    // disable broadcast so the co-located join path is what gets planned
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not introduce a shuffle of either side:
      // SortMergeJoin reads bucketed scans directly (the only Exchange
      // allowed is the one for the final groupBy)
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning(o_custkey"),
        s"orders side was shuffled:\n$plan")
      assert(!joinSection.contains("Exchange hashpartitioning(c_custkey"),
        s"customer side was shuffled:\n$plan")
      // correctness: same result as the plain parquet join
      val expect = spark.read.parquet(s"$dir/orders.parquet")
        .join(spark.read.parquet(s"$dir/customer.parquet"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      assert(joined.as[(String, Long)].collect().toMap == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
