package graft.streaming

import graft.SparkSpec
import graft.operators.SpanDedup
import graft.zones.Zones
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[SpanStream]] — streaming incremental substring spans. The load-
  * bearing contracts: cross-batch marking equals the batch operator's
  * asymmetric rule; a crash-replayed batch sees exactly the standing
  * state the original saw (the bid < current filter) so replays change
  * nothing; compaction preserves both. */
class SpanStreamSpec extends SparkSpec {
  import spark.implicits._

  private def drain(mem: MemoryStream[(Long, String)], root: String,
                    compactAfter: Int = 0): Unit =
    SpanStream.run(spark, mem.toDF().toDF("doc_id", "text"),
      s"$root/grams", s"$root/out", s"$root/ckpt",
      compactAfterFiles = compactAfter)
      .awaitTermination(120000)

  private def sink(root: String): Map[Long, (Long, Long, Long)] =
    spark.read.parquet(s"$root/out")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("cross-batch marking follows the standing-corpus rule") {
    val root = Files.createTempDirectory("graft-spanstream").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(1L -> "a b c d x y") // canonical copy lands in batch 1
    drain(mem, root)
    mem.addData(2L -> "p q a b c d", 3L -> "fresh words only here now")
    drain(mem, root)
    val got = sink(root)
    assert(got(1L) === ((6L, 0L, 0L)), s"batch-1 doc must be clean: $got")
    assert(got(2L) === ((6L, 1L, 4L)),
      s"batch-2 repeat of a standing gram must mark: $got")
    assert(got(3L) === ((5L, 0L, 0L)))
  }

  test("single-batch stream equals the batch operator with an empty corpus") {
    val root = Files.createTempDirectory("graft-spanstream1").toString
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      10L -> "m n o p k1 k2 m n o p",
      11L -> "unique tokens all along",
      12L -> "m n o p trailing")
    val mem = MemoryStream[(Long, String)]
    mem.addData(docs: _*)
    drain(mem, root)
    val direct = SpanDedup.spanStats(docs.toDF("doc_id", "text"),
        "doc_id", "text", 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(sink(root) === direct)
  }

  test("a replayed batch changes neither the sink nor future marking") {
    val root = Files.createTempDirectory("graft-spanreplay").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(1L -> "a b c d x y")
    drain(mem, root)
    mem.addData(2L -> "p q a b c d")
    drain(mem, root)
    val before = sink(root)
    val rows = spark.read.parquet(s"$root/out").count()
    // crash-replay: a fresh source + fresh checkpoint re-delivers the
    // SAME data from batch 0. The replayed batches recompute against a
    // standing table that already holds their own grams (a different
    // answer!) — the sink-as-ledger anti-join must discard those rows
    // and keep the original stats exactly-once
    val mem2 = MemoryStream[(Long, String)]
    mem2.addData(1L -> "a b c d x y")
    mem2.addData(2L -> "p q a b c d")
    SpanStream.run(spark, mem2.toDF().toDF("doc_id", "text"),
      s"$root/grams", s"$root/out", s"$root/ckpt2")
      .awaitTermination(120000)
    assert(sink(root) === before, "replay must not change any stats")
    assert(spark.read.parquet(s"$root/out").count() == rows,
      "replay must not duplicate sink rows")
    // and the standing table still marks future repeats exactly once
    val mem3 = MemoryStream[(Long, String)]
    mem3.addData(4L -> "tail a b c d")
    SpanStream.run(spark, mem3.toDF().toDF("doc_id", "text"),
      s"$root/grams", s"$root/out", s"$root/ckpt3")
      .awaitTermination(120000)
    assert(sink(root)(4L) === ((5L, 1L, 4L)))
  }

  test("compaction preserves marking across the boundary") {
    val rootA = Files.createTempDirectory("graft-spancompA").toString
    val rootB = Files.createTempDirectory("graft-spancompB").toString
    implicit val sqlCtx = spark.sqlContext
    for ((root, compact) <- Seq((rootA, 0), (rootB, 1))) {
      val mem = MemoryStream[(Long, String)]
      mem.addData(1L -> "a b c d x y", 2L -> "e f g h i j")
      drain(mem, root, compactAfter = compact)
      mem.addData(3L -> "p q a b c d e f g h")
      drain(mem, root, compactAfter = compact)
      mem.addData(4L -> "x p q a b c d tail")
      drain(mem, root, compactAfter = compact)
    }
    assert(sink(rootA) === sink(rootB),
      "compaction must not change any document's stats")
    assert(Zones.dataFileCount(spark, s"$rootB/grams") <
      Zones.dataFileCount(spark, s"$rootA/grams"),
      "compaction must actually reduce the gram table's file count")
  }
}
