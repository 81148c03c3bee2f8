package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  case class View(user_id: Long, view_id: Long, ts: Timestamp)
  case class Click(user_id: Long, click_id: Long, ts: Timestamp)

  test("interval join pairs rows in-window and drops out-of-window rows") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[View]
    val clicks = MemoryStream[Click]
    views.addData(
      View(1, 10, ts("2024-03-05 10:00:00")),
      View(2, 20, ts("2024-03-05 10:00:00")))
    clicks.addData(
      Click(1, 100, ts("2024-03-05 10:05:00")),  // in window (<= +1h)
      Click(1, 101, ts("2024-03-05 11:30:00")),  // out: past +1h
      Click(2, 200, ts("2024-03-05 09:30:00")),  // out: before the view
      Click(3, 300, ts("2024-03-05 10:10:00")))  // no matching view

    val joined = StreamJoin.intervalJoin(views.toDF(), clicks.toDF(),
      key = "user_id", leftTs = "ts", rightTs = "ts",
      within = "1 hour", lateness = "10 minutes")

    val root = java.nio.file.Files.createTempDirectory("graft-ssj").toString
    val q = joined.writeStream.format("parquet")
      .option("path", s"$root/out").option("checkpointLocation", s"$root/ckpt")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.read.parquet(s"$root/out")
      .select("view_id", "r_click_id").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 100L)))
  }

  test("left-outer interval join emits unmatched left rows after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[View]
    val clicks = MemoryStream[Click]
    views.addData(
      View(1, 10, ts("2024-03-05 10:00:00")),   // will match
      View(2, 20, ts("2024-03-05 10:00:00")))   // never matches
    clicks.addData(Click(1, 100, ts("2024-03-05 10:05:00")))

    val joined = StreamJoin.intervalJoinLeftOuter(views.toDF(), clicks.toDF(),
      key = "user_id", leftTs = "ts", rightTs = "ts",
      within = "1 hour", lateness = "10 minutes")

    val root = java.nio.file.Files.createTempDirectory("graft-ssjo").toString
    def drain(): Unit = {
      val q = joined.writeStream.format("parquet")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    drain()
    // push both watermarks past view 20's eviction horizon (+1h window
    // +10m lateness); the null-padded row lands a batch after that
    views.addData(View(99, 990, ts("2024-03-06 12:00:00")))
    clicks.addData(Click(99, 991, ts("2024-03-06 12:00:00")))
    drain()
    views.addData(View(99, 992, ts("2024-03-06 13:00:00")))
    clicks.addData(Click(99, 993, ts("2024-03-06 13:00:00")))
    drain()

    val got = spark.read.parquet(s"$root/out")
      .select("view_id", "r_click_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(got.contains((10L, 100L)), got)    // matched pair
    assert(got.contains((20L, -1L)), got)     // unmatched left, null right
  }

  test("stream-static enrichment join: broadcast dimension lookup per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.broadcast
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val events = MemoryStream[View]
    events.addData(
      View(1, 10, ts("2024-03-05 10:00:00")),
      View(2, 20, ts("2024-03-05 10:01:00")),
      View(9, 90, ts("2024-03-05 10:02:00")))  // not in the dimension
    // the canonical streaming enrichment shape: static side broadcast,
    // left outer so unknown keys survive with a null segment
    val enriched = events.toDF()
      .join(broadcast(dim), Seq("user_id"), "left")
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q = enriched.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("view_id", "segment").collect().foreach(r =>
          sink.add((r.getLong(0), if (r.isNullAt(1)) "none" else r.getString(1))))
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(sink.toArray(Array.empty[(Long, String)]).toSet ===
      Set((10L, "gold"), (20L, "silver"), (90L, "none")))
  }
}
