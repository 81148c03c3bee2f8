package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke runner: exercises the driver's t1 contract —
  * `SparkEntry.entry` on sf0.001 must return >0 rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(10, truncate = false)
    println(s"[smoke] entry rows=$n " + (if (n > 0) "OK" else "EMPTY"))

    // SQL function registration surface
    GraftExtensions.register(spark)
    Tables.documents(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("documents")
    val sqlOut = spark.sql(
      """SELECT doc_id, simhash64(split(text, ' ')) AS sh,
        |  size(minhash_signature(hashed_char_shingles(text, 5), 32)) AS sig_len
        |FROM documents LIMIT 3""".stripMargin)
    sqlOut.show(false)
    println(s"[smoke] sql functions OK rows=${sqlOut.count()}")
    spark.stop()
  }
}
