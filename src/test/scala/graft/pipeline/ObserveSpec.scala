package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, udf}

class ObserveSpec extends SparkSpec {
  import spark.implicits._

  test("countedAction: exact count from the action's own single execution") {
    val acc = spark.sparkContext.longAccumulator("observe-evals")
    val bump = udf { s: String => acc.add(1); s }.asNondeterministic()
    val df = Seq.tabulate(37)(i => (i.toLong, s"v$i")).toDF("id", "v")
      .withColumn("v", bump(col("v")))
    val root = java.nio.file.Files.createTempDirectory("graft-observe").toString
    val n = Observe.countedAction(spark, df, "obs_test") {
      _.write.parquet(s"$root/out")
    }
    assert(n === 37L)
    // the count came from the write's execution, not a second pass
    assert(acc.value === 37L,
      s"plan evaluated ${acc.value} times for 37 rows — count re-ran the lineage")
  }

  test("countedAction reports zero on an empty write") {
    val df = Seq.empty[(Long, String)].toDF("id", "v")
    val root = java.nio.file.Files.createTempDirectory("graft-observe0").toString
    val n = Observe.countedAction(spark, df, "obs_empty") {
      _.write.parquet(s"$root/out")
    }
    assert(n === 0L)
  }
}
