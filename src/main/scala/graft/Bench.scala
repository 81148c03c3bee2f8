package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: initialize codegen, parquet readers, and shuffle
    // machinery so the first timed query measures the operator, not JVM
    // startup.
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().queryExecution.toRdd.count()
    // Queries run in sorted name order (Map iteration order is
    // hash-dependent and would shift JVM-warmup cost between queries
    // across builds). Timing materializes the final physical plan's rows
    // via toRdd — a bare df.count() lets Catalyst prune every column and
    // would measure a scan, not the operator.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).queryExecution.toRdd.count() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
