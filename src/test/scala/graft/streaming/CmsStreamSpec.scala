package graft.streaming

import graft.SparkSpec
import graft.operators.FreqSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[CmsStream]] — streaming Count-Min with batch-id replay provenance.
  * CMS merge is a SUM, so unlike [[KmvStream]] a re-appended partial
  * would double counts; these tests pin the ledger that prevents it.
  */
class CmsStreamSpec extends SparkSpec {
  import spark.implicits._

  private val (depth, width) = (4, 256)

  private def keysOf(pairs: (String, Int)*): Seq[String] =
    pairs.flatMap { case (k, n) => Seq.fill(n)(k) }

  private def estimates(root: String, keys: Seq[String]): Map[String, Long] =
    CmsStream.estimate(spark.read.parquet(s"$root/grid"),
        keys.toDF("token"), "token", depth, width)
      .as[(String, Long)].collect().toMap

  private def drain(mem: MemoryStream[String], root: String,
                    compactAfter: Int = 0, ckpt: String = "ckpt"): Unit =
    CmsStream.run(spark, mem.toDF().toDF("token"), s"$root/grid",
      s"$root/$ckpt", depth = depth, width = width,
      compactAfterFiles = compactAfter).awaitTermination(120000)

  test("streamed grid reproduces the batch sketch's estimates across drains") {
    val root = Files.createTempDirectory("graft-cms").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val b1 = keysOf("a" -> 30, "b" -> 5)
    val b2 = keysOf("a" -> 12, "c" -> 9)
    mem.addData(b1: _*)
    drain(mem, root)
    mem.addData(b2: _*)
    drain(mem, root)
    val batchTruth = FreqSketch.estimate(
        FreqSketch.countMin((b1 ++ b2).toDF("token"), $"token", depth, width),
        Seq("a", "b", "c").toDF("token"), "token", depth, width)
      .as[(String, Long)].collect().toMap
    assert(estimates(root, Seq("a", "b", "c")) == batchTruth)
    assert(batchTruth == Map("a" -> 42L, "b" -> 5L, "c" -> 9L), s"$batchTruth")
  }

  test("a replayed batch cannot double counts: replicas collapse on batch_id") {
    val root = Files.createTempDirectory("graft-cms-replay").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val b = keysOf("a" -> 30, "b" -> 5)
    mem.addData(b: _*)
    drain(mem, root)
    // crash replay: same data, fresh checkpoint -> same batch id 0,
    // partial re-appended
    val mem2 = MemoryStream[String]
    mem2.addData(b: _*)
    drain(mem2, root, ckpt = "ckpt2")
    assert(spark.read.parquet(s"$root/grid").count() >
      CmsStream.mergedGrid(spark.read.parquet(s"$root/grid")).count(),
      "expected duplicate partial rows on disk")
    assert(estimates(root, Seq("a", "b")) == Map("a" -> 30L, "b" -> 5L))
  }

  test("compaction freezes old batches, keeps the newest for replay collapse, preserves estimates") {
    val root = Files.createTempDirectory("graft-cms-compact").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData(keysOf("a" -> 30, "b" -> 5): _*)
    drain(mem, root, compactAfter = 1)
    mem.addData(keysOf("a" -> 12, "c" -> 9): _*)
    drain(mem, root, compactAfter = 1)
    val grid = spark.read.parquet(s"$root/grid")
    // exactly two batch ids remain: the frozen aggregate and the newest
    val ids = grid.select($"batch_id").distinct().as[Long].collect().toSet
    assert(ids.size == 2 && ids.contains(-1L), s"got $ids")
    assert(estimates(root, Seq("a", "b", "c")) ==
      Map("a" -> 42L, "b" -> 5L, "c" -> 9L))
    // the crash window compaction must survive: the newest batch's
    // partial re-appended (append done, checkpoint not committed)
    val newest = ids.max
    val replayRows = grid.filter($"batch_id" === newest)
    replayRows.write.mode("append").parquet(s"$root/grid")
    assert(estimates(root, Seq("a", "b", "c")) ==
      Map("a" -> 42L, "b" -> 5L, "c" -> 9L),
      "replayed newest-batch partial changed estimates after compaction")
  }
}
