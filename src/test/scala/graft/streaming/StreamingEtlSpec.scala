package graft.streaming

import graft.SparkSpec
import graft.zones.Zones
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files
import java.sql.Timestamp

class StreamingEtlSpec extends SparkSpec {
  import spark.implicits._

  private def payload(id: String, rt: Int, tags: String, text: String): String =
    s"""{"created":"2024-03-05 09:00:00","tweet_id":"$id","user_name":"u",""" +
      s""""rt_count":$rt,"hashtags":"$tags","text":"$text"}"""

  test("unified streaming ETL: stream -> staging transform -> analytical + audit, idempotent") {
    val root = Files.createTempDirectory("graft-setl").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, String)]
    mem.addData(
      ("r1", Timestamp.valueOf("2024-03-05 10:00:00"),
        payload("t1", 150, "Spark BigData", "great stuff")),
      ("r2", Timestamp.valueOf("2024-03-05 10:01:00"),
        payload("t2", 50, "Low", "filtered")),
    )
    val raw = mem.toDF().toDF("record_id", "ts", "payload")

    val q1 = StreamingEtl.run(spark, raw, s"$root/analytical", s"$root/log",
      s"$root/ckpt")
    q1.awaitTermination(120000)

    val analytical = Zones.readAnalytical(spark, s"$root/analytical")
    // r1 -> 2 hashtags; r2 filtered by rt_count
    assert(analytical.count() == 2)
    val tags = analytical.select("hashtag").as[String].collect().toSet
    assert(tags == Set("Spark", "BigData"))

    // second drain with one new record and one replayed-equivalent dup
    mem.addData(
      ("r3", Timestamp.valueOf("2024-03-05 10:02:00"),
        payload("t3", 200, "Spark", "more")),
      ("r1", Timestamp.valueOf("2024-03-05 10:00:00"),
        payload("t1", 150, "Spark BigData", "great stuff")),  // dup of r1
    )
    val q2 = StreamingEtl.run(spark, raw, s"$root/analytical", s"$root/log",
      s"$root/ckpt")
    q2.awaitTermination(120000)

    // idempotent: r1's rows not duplicated; r3 adds exactly one row
    assert(Zones.readAnalytical(spark, s"$root/analytical").count() == 3)
    // audit: one row per non-trivial batch, counts 2 then 1
    val log = Zones.readLog(spark, s"$root/log")
      .select("records_inserted").as[Int].collect().sorted
    assert(log.toSeq == Seq(1, 2))
  }

  test("micro-batch transform evaluates exactly once per drain (cached inside foreachBatch)") {
    val root = Files.createTempDirectory("graft-setl-once").toString
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, udf}
    // Each input row pays the accumulator exactly once IF the micro-batch
    // is cached: count / analytical write / max-ts audit are three actions
    // over the same transform, and an uncached batch would re-run the
    // whole lineage (this UDF included) once per action.
    val acc = spark.sparkContext.longAccumulator("payload-evals")
    val countEvals = udf { s: String => acc.add(1); s }.asNondeterministic()
    val mem = MemoryStream[(String, Timestamp, String)]
    mem.addData(
      ("r1", Timestamp.valueOf("2024-03-05 10:00:00"),
        payload("t1", 150, "Spark BigData", "great stuff")),
      ("r2", Timestamp.valueOf("2024-03-05 10:01:00"),
        payload("t2", 120, "Flink", "also good")),
    )
    val raw = mem.toDF().toDF("record_id", "ts", "payload")
      .withColumn("payload", countEvals(col("payload")))
    val q = StreamingEtl.run(spark, raw, s"$root/analytical", s"$root/log",
      s"$root/ckpt")
    q.awaitTermination(120000)
    assert(acc.value == 2,
      s"payload evaluated ${acc.value} times for 2 rows — micro-batch recomputed")
  }

  test("landing compaction merges small files and preserves rows") {
    val root = Files.createTempDirectory("graft-compact").toString
    import org.apache.spark.sql.functions._
    val landing = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").cast("string").as("record_id"),
        lit("2024-03-05 10:00:00").as("timestamp"),
        lit("2024-03-05 09:00:00").as("created"),
        col("doc_id").cast("string").as("tweet_id"),
        col("source").as("user_name"), lit(100).as("rt_count"),
        col("lang").as("hashtags"), col("text"))
      .repartition(20)  // produce many small files
    Zones.writeLandingDay(landing, s"$root/landing", 2024, 3, 5)
    val dir = new java.io.File(s"$root/landing/2024/03/05")
    val before = dir.listFiles().count(_.getName.endsWith(".csv"))
    assert(before >= 20)
    val rowsBefore = Zones.readLandingDay(spark, s"$root/landing", 2024, 3, 5).count()

    Zones.compactLandingDay(spark, s"$root/landing", 2024, 3, 5)
    val after = dir.listFiles().count(_.getName.endsWith(".csv"))
    assert(after == 1, s"expected 1 compacted file, got $after")
    assert(Zones.readLandingDay(spark, s"$root/landing", 2024, 3, 5).count() == rowsBefore)
  }
}
