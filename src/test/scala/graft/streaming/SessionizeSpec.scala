package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("flatMapGroupsWithState sessionization closes sessions on gap + watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    // user 7: two events 2 min apart (one session), then a 30-min gap,
    // then one event (second session). The final far-future event from
    // user 99 advances the watermark past every timeout.
    mem.addData(
      Sessionize.Event(7, ts("2024-03-05 10:00:00")),
      Sessionize.Event(7, ts("2024-03-05 10:02:00")),
      Sessionize.Event(7, ts("2024-03-05 10:32:00")),
      Sessionize.Event(8, ts("2024-03-05 10:05:00")),
    )
    val root = java.nio.file.Files.createTempDirectory("graft-sess").toString
    val sessions = Sessionize.sessionize(mem.toDS(), gapMs = 10 * 60 * 1000)
    // file sink + checkpoint: each AvailableNow drain RESUMES (a fresh
    // query without checkpoint would replay everything as one batch and
    // stop before any event-time timeout can fire)
    def drain(): Unit = {
      val q = sessions.writeStream.format("parquet")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    drain()
    // advance watermark far past all timeouts; the watermark update lands
    // at the END of a batch, so timeouts fire one batch later — drain again
    mem.addData(Sessionize.Event(99, ts("2024-03-06 12:00:00")))
    drain()
    mem.addData(Sessionize.Event(99, ts("2024-03-06 13:00:00")))
    drain()

    val all = spark.read.parquet(s"$root/out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getInt(3)))
      .toSet
    // user 7 session 1: 10:00-10:02 with 2 events (closed by in-batch gap)
    assert(all.contains((7L, "2024-03-05 10:00:00.0", "2024-03-05 10:02:00.0", 2)), all)
    // user 7 session 2: single event at 10:32 (closed by timeout)
    assert(all.contains((7L, "2024-03-05 10:32:00.0", "2024-03-05 10:32:00.0", 1)), all)
    // user 8: single event session
    assert(all.contains((8L, "2024-03-05 10:05:00.0", "2024-03-05 10:05:00.0", 1)), all)
  }
}
