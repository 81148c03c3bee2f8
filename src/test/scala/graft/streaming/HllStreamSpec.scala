package graft.streaming

import graft.SparkSpec
import graft.functions.{Hll, KmvAggregator}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** [[HllStream]] — rolling distinct actives on HLL registers. The
  * contract under test is the strongest replay algebra in the streaming
  * sketch family: max-merge is idempotent AND monotone, so not only
  * duplicate batch appends but arbitrary SUBSET re-aggregations of past
  * events collapse without a ledger — the case sum-merge corrupts and
  * set-union merely tolerates. */
class HllStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, i: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-$day%02d 10:$i%02d:00")

  private def events(perDay: Map[Int, Int]): Seq[(Timestamp, Long)] =
    perDay.toSeq.flatMap { case (d, n) =>
      (0 until n).map(u => (ts(d, u % 60), u.toLong))
    }

  private def batchTruth(rows: Seq[(Timestamp, Long)]): Map[String, Double] = {
    val daily = rows.toDF("ts", "user_id")
      .select(to_date($"ts").as("dt"), KmvAggregator.kmvHash($"user_id").as("h"))
      .groupBy($"dt").agg(Hll.hll(6)($"h").as("regs"))
    HllStream.rollingActive(daily).as[(String, Double)].collect().toMap
  }

  private def drain(mem: MemoryStream[(Timestamp, Long)], root: String,
                    compactAfter: Int = 0): Unit =
    HllStream.run(spark, mem.toDF().toDF("ts", "user_id"),
      s"$root/sketch", s"$root/ckpt", compactAfterFiles = compactAfter)
      .awaitTermination(120000)

  private def streamed(root: String): Map[String, Double] =
    HllStream.rollingActive(spark.read.parquet(s"$root/sketch"))
      .as[(String, Double)].collect().toMap

  test("streamed registers reproduce the batch rolling-actives estimates exactly") {
    val root = Files.createTempDirectory("graft-hllstream").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val b1 = events(Map(1 -> 40, 2 -> 25))
    val b2 = events(Map(2 -> 30, 3 -> 50)) // day 2 arrives across batches
    mem.addData(b1: _*)
    drain(mem, root)
    mem.addData(b2: _*)
    drain(mem, root)
    assert(streamed(root) == batchTruth(b1 ++ b2))
  }

  test("subset re-aggregation collapses: replay with DIFFERENT batch boundaries changes nothing") {
    val all = events(Map(1 -> 40, 2 -> 25))
    // first run: one batch with everything
    val root = Files.createTempDirectory("graft-hllreplay").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    mem.addData(all: _*)
    drain(mem, root)
    val before = streamed(root)
    // replay the SAME events re-binned into two different batches with a
    // fresh checkpoint — a sum-merge would double-count, a set-union
    // would need exact-duplicate rows; max-merge absorbs any re-binning
    val mem2 = MemoryStream[(Timestamp, Long)]
    val (h1, h2) = all.splitAt(all.size / 3)
    mem2.addData(h1: _*)
    HllStream.run(spark, mem2.toDF().toDF("ts", "user_id"),
      s"$root/sketch", s"$root/ckpt2").awaitTermination(120000)
    mem2.addData(h2: _*)
    HllStream.run(spark, mem2.toDF().toDF("ts", "user_id"),
      s"$root/sketch", s"$root/ckpt2").awaitTermination(120000)
    assert(spark.read.parquet(s"$root/sketch").count() > 2,
      "replay should have appended extra partial registers")
    assert(streamed(root) == before)
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
    val plain = Files.createTempDirectory("graft-hll-plain").toString
    val compacted = Files.createTempDirectory("graft-hll-compact").toString
    runAll(plain, 0)
    runAll(compacted, 1)
    assert(streamed(plain) == streamed(compacted))
    val perDay = spark.read.parquet(s"$compacted/sketch")
      .groupBy($"dt").count().as[(java.sql.Date, Long)].collect()
    assert(perDay.forall(_._2 == 1L), s"got ${perDay.toSeq}")
    // compacted registers are full m-length vectors
    val lens = spark.read.parquet(s"$compacted/sketch")
      .select(size($"regs")).as[Int].collect()
    assert(lens.forall(_ == 64), lens.toSeq.toString)
  }
}
