package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler: time a named subset of SparkEntry.queries
  * individually, separating plan/optimize time from execution time.
  * Usage: runMain graft.Profile q66_embedding_quantize q67_... */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().queryExecution.toRdd.count()
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val qe = df.queryExecution
        qe.executedPlan // force analysis+optimization+planning
        val t1 = System.nanoTime()
        val n = qe.toRdd.count()
        val t2 = System.nanoTime()
        println(f"[profile] $name run$i rows=$n plan=${(t1 - t0) / 1e9}%.2fs exec=${(t2 - t1) / 1e9}%.2fs")
        if (i == 1 && sys.env.contains("SPARK_GRAFT_EXPLAIN"))
          println(s"[plan] $name\n${qe.executedPlan}")
        // same cleanup contract as Bench: clearCache misses RDD-level
        // persists (localCheckpoint), and broadcasts free only on GC
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
      }
    }
    spark.stop()
  }
}
