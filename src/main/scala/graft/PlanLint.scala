package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: sweep every SparkEntry query's physical plan for join
  * anti-patterns (cartesian products, nested-loop joins) and print the
  * offenders — the data behind PlanSpec's global lint. */
object PlanLint {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    SparkEntry.queries.keys.toSeq.sorted.foreach { q =>
      try {
        val p = SparkEntry.queries(q)(spark, d).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        val flags = Seq(
          "CartesianProduct" -> p.contains("CartesianProduct"),
          "BroadcastNestedLoopJoin" -> p.contains("BroadcastNestedLoopJoin"))
          .collect { case (n, true) => n }
        if (flags.nonEmpty) println(s"[planlint] $q: ${flags.mkString(", ")}")
      } catch { case e: Throwable => println(s"[planlint] $q ERROR ${e.getMessage}") }
    }
    println("[planlint] sweep complete")
    spark.stop()
  }
}
