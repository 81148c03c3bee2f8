package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key
  private def skewed = (1 to 1000).map { i =>
    (if (i <= 900) "hot" else s"k${i % 17}", i.toDouble)
  }.toDF("k", "v")

  test("saltedCount matches plain groupBy count") {
    val plain = skewed.groupBy("k").count()
      .withColumnRenamed("count", "n").as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(skewed, Seq("k"), saltBuckets = 8)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("saltedSum matches plain groupBy sum") {
    val plain = skewed.groupBy("k").agg(sum($"v").as("s"))
      .as[(String, Double)].collect().toMap
    val salted = Skew.saltedSum(skewed, Seq("k"), "v", saltBuckets = 8)
      .as[(String, Double)].collect().toMap
    assert(salted.keySet == plain.keySet)
    for ((k, v) <- plain) assert(math.abs(salted(k) - v) < 1e-9, k)
  }

  test("saltedJoin matches a plain inner join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).count()
    val salted = Skew.saltedJoin(skewed, dim, "k", saltBuckets = 4).count()
    assert(salted == plain)
  }
}
