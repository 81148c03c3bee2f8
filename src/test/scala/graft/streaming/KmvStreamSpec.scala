package graft.streaming

import graft.SparkSpec
import graft.functions.KmvAggregator._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** [[KmvStream]] — the q113 sketch-merge shape maintained by a stream.
  * The interesting contract is replay idempotence BY ALGEBRA: duplicate
  * partial-sketch appends collapse in the distinct KMV merge, so a
  * crash-replayed batch cannot change any estimate.
  */
class KmvStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, i: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-$day%02d 10:$i%02d:00")

  /** (ts, user_id) events: day d carries users 0 until perDay(d). */
  private def events(perDay: Map[Int, Int]): Seq[(Timestamp, Long)] =
    perDay.toSeq.flatMap { case (d, n) =>
      (0 until n).map(u => (ts(d, u % 60), u.toLong))
    }

  private def batchTruth(rows: Seq[(Timestamp, Long)]) = {
    val daily = rows.toDF("ts", "user_id")
      .select(to_date($"ts").as("dt"), kmvHash($"user_id").as("h"))
      .groupBy($"dt").agg(kmv(256)($"h").as("mins"))
    KmvStream.rollingActive(daily)
      .as[(String, Double)].collect().toMap
  }

  private def drain(mem: MemoryStream[(Timestamp, Long)], root: String,
                    compactAfter: Int = 0): Unit =
    KmvStream.run(spark, mem.toDF().toDF("ts", "user_id"),
      s"$root/sketch", s"$root/ckpt", compactAfterFiles = compactAfter)
      .awaitTermination(120000)

  test("streamed sketches reproduce the batch rolling-actives estimates exactly") {
    val root = Files.createTempDirectory("graft-kmvstream").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val batch1 = events(Map(1 -> 40, 2 -> 25))
    val batch2 = events(Map(2 -> 30, 3 -> 50)) // day 2 arrives across batches
    mem.addData(batch1: _*)
    drain(mem, root)
    mem.addData(batch2: _*)
    drain(mem, root)
    val streamed = KmvStream.rollingActive(
        spark.read.parquet(s"$root/sketch"))
      .as[(String, Double)].collect().toMap
    assert(streamed == batchTruth(batch1 ++ batch2),
      s"streamed $streamed vs batch truth")
  }

  test("replayed batches change nothing: duplicate partials collapse in the merge") {
    val root = Files.createTempDirectory("graft-kmvreplay").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val batch = events(Map(1 -> 40, 2 -> 25))
    mem.addData(batch: _*)
    drain(mem, root)
    // simulate a crash-replay: same data, FRESH checkpoint, so the
    // micro-batch reprocesses and re-appends its partial sketches
    val mem2 = MemoryStream[(Timestamp, Long)]
    mem2.addData(batch: _*)
    KmvStream.run(spark, mem2.toDF().toDF("ts", "user_id"),
      s"$root/sketch", s"$root/ckpt2").awaitTermination(120000)
    // the table has duplicate rows per day, the estimates do not move
    val streamed = KmvStream.rollingActive(
        spark.read.parquet(s"$root/sketch"))
      .as[(String, Double)].collect().toMap
    assert(streamed == batchTruth(batch), s"replay changed estimates: $streamed")
  }

  test("compaction merges to one row per day and preserves estimates") {
    def runAll(root: String, compactAfter: Int): Unit = {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Timestamp, Long)]
      mem.addData(events(Map(1 -> 40, 2 -> 25)): _*)
      drain(mem, root, compactAfter)
      mem.addData(events(Map(2 -> 30, 3 -> 50)): _*)
      drain(mem, root, compactAfter)
    }
    val plain = Files.createTempDirectory("graft-kmv-plain").toString
    val compacted = Files.createTempDirectory("graft-kmv-compact").toString
    runAll(plain, 0)
    runAll(compacted, 1)
    def est(root: String) = KmvStream.rollingActive(
        spark.read.parquet(s"$root/sketch"))
      .as[(String, Double)].collect().toMap
    assert(est(plain) == est(compacted))
    // compacted: exactly one merged row per day
    val perDay = spark.read.parquet(s"$compacted/sketch")
      .groupBy($"dt").count().as[(java.sql.Date, Long)].collect()
    assert(perDay.forall(_._2 == 1L), s"got ${perDay.toSeq}")
  }
}
