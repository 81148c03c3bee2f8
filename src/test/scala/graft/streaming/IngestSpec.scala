package graft.streaming

import graft.SparkSpec
import graft.zones.Zones
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import java.sql.Timestamp

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def payload(id: String, rt: Int, tags: String, text: String): String =
    s"""{"created":"2024-03-05 09:00:00","tweet_id":"$id","user_name":"u",""" +
      s""""rt_count":$rt,"hashtags":"$tags","text":"$text"}"""

  test("end-to-end ingest: MemoryStream -> parse -> filter -> partitioned landing CSV") {
    val root = Files.createTempDirectory("graft-stream").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, String)]
    mem.addData(
      ("r1", Timestamp.valueOf("2024-03-05 10:00:00"), payload("t1", 150, "Spark", "hello")),
      ("r2", Timestamp.valueOf("2024-03-05 10:00:01"), payload("t2", 50, "Low", "below threshold")),
      ("r3", Timestamp.valueOf("2024-03-05 10:00:02"), payload("t3", 200, "", "no tags")),
      ("r4", Timestamp.valueOf("2024-03-06 10:00:03"), payload("t4", 300, "Big Data", "next day")),
    )
    val raw = mem.toDF().toDF("record_id", "ts", "payload")
    val parsed = Ingest.parseRecords(raw).filter(Ingest.listenerFilter)
    val q = Ingest.ingestToLanding(parsed, s"$root/landing", s"$root/ckpt")
    q.awaitTermination(60000)

    // r2 (rt<=99) and r3 (empty hashtags) filtered; r1 and r4 land in
    // their arrival-date partitions
    val day5 = Zones.readLanding(spark, s"$root/landing/year=2024/month=3/day=5")
    val day6 = Zones.readLanding(spark, s"$root/landing/year=2024/month=3/day=6")
    assert(day5.count() == 1 && day6.count() == 1)
    assert(day5.select("tweet_id").as[String].head() == "t1")

    // AvailableNow drains and stops; a second start with no new data
    // writes nothing more (exactly-once via checkpoint)
    val q2 = Ingest.ingestToLanding(parsed, s"$root/landing", s"$root/ckpt")
    q2.awaitTermination(60000)
    assert(Zones.readLanding(spark, s"$root/landing/year=2024/month=3/day=5").count() == 1)
  }

  test("streaming watermark dedup drops cross-batch duplicate keys") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-dedup").toString
    val mem = MemoryStream[(String, Timestamp)]
    val deduped = Ingest.dedupWithinWatermark(
      mem.toDF().toDF("record_id", "ts"), "ts", horizonHours = 2, Seq("record_id"))
    // file sink + shared checkpoint: the second drain RESUMES with state
    // (a fresh checkpoint-less query would replay from offset zero and
    // race with addData)
    def drain(): Unit = {
      val q = deduped.writeStream.format("parquet")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    mem.addData(
      ("a", Timestamp.valueOf("2024-03-05 10:00:00")),
      ("a", Timestamp.valueOf("2024-03-05 10:05:00")),   // dup within batch
      ("b", Timestamp.valueOf("2024-03-05 10:10:00")))
    drain()
    mem.addData(("a", Timestamp.valueOf("2024-03-05 10:20:00")))  // dup across batch
    drain()
    val keys = spark.read.parquet(s"$root/out")
      .select("record_id").as[String].collect().sorted
    assert(keys.toSeq == Seq("a", "b"), s"expected exactly (a, b), got ${keys.toSeq}")
  }

  test("tumbling / sliding / session windows on the events table") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val tumbling = Ingest.tumblingCounts(ev, "ts", "1 hour")
    assert(tumbling.count() > 0)
    val total = tumbling.agg(org.apache.spark.sql.functions.sum("n"))
      .head().getLong(0)
    assert(total == ev.count())

    val sliding = Ingest.slidingCounts(ev, "ts", "2 hours", "1 hour")
    // each event falls in exactly 2 sliding windows
    val slidingTotal = sliding.agg(org.apache.spark.sql.functions.sum("n"))
      .head().getLong(0)
    assert(slidingTotal == 2 * ev.count())

    val sessions = Ingest.sessionCounts(ev, "ts", "user_id", "5 minutes")
    assert(sessions.count() > 0)
    val sessTotal = sessions.agg(org.apache.spark.sql.functions.sum("n"))
      .head().getLong(0)
    assert(sessTotal == ev.count())
  }

  test("streamingHourlyCounts produces watermarked windowed aggregates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData("2024-03-05 10:05:00", "2024-03-05 10:55:00", "2024-03-05 11:05:00")
    val agg = Ingest.streamingHourlyCounts(
      mem.toDF().toDF("timestamp"), "timestamp", horizonHours = 1)
    val q = agg.writeStream.format("memory").queryName("hourly_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("hourly_out").collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    assert(rows("2024-03-05 10:00:00.0") == 2)
    assert(rows("2024-03-05 11:00:00.0") == 1)
  }
}
