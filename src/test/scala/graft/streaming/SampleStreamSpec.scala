package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[SampleStream]] — the q115 bottom-k quantile sample maintained by a
  * stream. The contract under test is the family protocol position:
  * replay idempotence WITHOUT a batch ledger, restored by exact dedup
  * on the unique row key before the cut (the key is the provenance),
  * plus exact mergeability (bottom-k of partials ≡ global bottom-k)
  * and compaction invariance through the backup-keeping swap.
  */
class SampleStreamSpec extends SparkSpec {
  import spark.implicits._

  /** (event_type, event_id, value) rows; ids globally unique. */
  private def rows(types: Seq[String], idsPerType: Int,
                   idOffset: Int = 0): Seq[(String, Long, Double)] =
    types.zipWithIndex.flatMap { case (t, ti) =>
      (0 until idsPerType).map { i =>
        val id = (ti * 1000000 + idOffset + i).toLong
        (t, id, (id % 997).toDouble / 10.0)
      }
    }

  private def batchTruth(all: Seq[(String, Long, Double)])
    : Map[String, (Double, Double)] =
    SampleStream.quantiles(all.toDF("event_type", "event_id", "value")
        .limit(all.size)) // no-op; keeps a non-streaming plan
      .as[(String, Double, Double)].collect()
      .map { case (t, a, b) => t -> (a, b) }.toMap

  private def drain(mem: MemoryStream[(String, Long, Double)], root: String,
                    compactAfter: Int = 0): Unit =
    SampleStream.run(spark,
      mem.toDF().toDF("event_type", "event_id", "value"),
      s"$root/sample", s"$root/ckpt", compactAfterFiles = compactAfter)
      .awaitTermination(120000)

  private def streamedQ(root: String): Map[String, (Double, Double)] =
    SampleStream.quantiles(spark.read.parquet(s"$root/sample"))
      .as[(String, Double, Double)].collect()
      .map { case (t, a, b) => t -> (a, b) }.toMap

  test("streamed partial samples reproduce the batch quantiles exactly") {
    val root = Files.createTempDirectory("graft-samplestream").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val b1 = rows(Seq("click", "view"), 900)
    val b2 = rows(Seq("click", "view"), 700, idOffset = 5000)
    mem.addData(b1: _*)
    drain(mem, root)
    mem.addData(b2: _*)
    drain(mem, root)
    assert(streamedQ(root) == batchTruth(b1 ++ b2))
    // the standing table holds at most k rows per group per batch, not
    // the raw stream
    val cnt = spark.read.parquet(s"$root/sample")
      .groupBy($"event_type").count().as[(String, Long)].collect().toMap
    assert(cnt.values.forall(_ <= 2 * 512L), cnt.toString)
  }

  test("replayed batches change nothing: key-dedup restores idempotence without a ledger") {
    val root = Files.createTempDirectory("graft-samplereplay").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val b = rows(Seq("click", "view"), 900)
    mem.addData(b: _*)
    drain(mem, root)
    val before = streamedQ(root)
    // crash-replay: same data, fresh checkpoint — the partial sample is
    // re-appended in full
    val mem2 = MemoryStream[(String, Long, Double)]
    mem2.addData(b: _*)
    SampleStream.run(spark, mem2.toDF().toDF("event_type", "event_id", "value"),
      s"$root/sample", s"$root/ckpt2").awaitTermination(120000)
    assert(spark.read.parquet(s"$root/sample").count() > 2 * 512L,
      "replay should have appended duplicate partials")
    assert(streamedQ(root) == before)
    assert(streamedQ(root) == batchTruth(b))
  }

  test("compaction rewrites to <= k rows per group and preserves the merged sample") {
    def runAll(root: String, compactAfter: Int): Unit = {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(String, Long, Double)]
      mem.addData(rows(Seq("click", "view"), 900): _*)
      drain(mem, root, compactAfter)
      mem.addData(rows(Seq("click", "view"), 700, idOffset = 5000): _*)
      drain(mem, root, compactAfter)
    }
    val plain = Files.createTempDirectory("graft-sample-plain").toString
    val compacted = Files.createTempDirectory("graft-sample-compact").toString
    runAll(plain, 0)
    runAll(compacted, 1)
    assert(streamedQ(plain) == streamedQ(compacted))
    val perGroup = spark.read.parquet(s"$compacted/sample")
      .groupBy($"event_type").count().as[(String, Long)].collect()
    assert(perGroup.forall(_._2 <= 512L), perGroup.toSeq.toString)
  }
}
