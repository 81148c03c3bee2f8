package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** The streaming twin of q195: standing labels absorb edge
  * micro-batches through incrementalCc; the edge log is the source of
  * truth and every crash window repairs at startup. */
class CcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(path: String): Map[Long, Long] =
    spark.read.parquet(path).as[(Long, Long)].collect().toMap

  private def fullCc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("streaming CC: labels grow across drains and merge components exactly") {
    val root = Files.createTempDirectory("graft-ccstream").toString
    val (logPath, labPath) = (s"$root/edges", s"$root/labels")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val edges = mem.toDF().toDF("id_a", "id_b")

    // drain 1: two separate components
    mem.addData((1L, 2L), (3L, 4L))
    CcStream.run(spark, edges, logPath, labPath, s"$root/ckpt")
      .awaitTermination(120000)
    assert(labelsOf(labPath) == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))

    // drain 2: a bridging edge merges them; an unrelated pair appears;
    // a replayed duplicate edge changes nothing
    mem.addData((2L, 3L), (10L, 11L), (1L, 2L))
    CcStream.run(spark, edges, logPath, labPath, s"$root/ckpt")
      .awaitTermination(120000)
    val got = labelsOf(labPath)
    val wholeLog = spark.read.parquet(logPath)
      .as[(Long, Long)].collect().toSeq
    assert(got == fullCc(wholeLog), s"got $got")
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("streaming CC repairs the edges-appended/labels-unmerged crash window") {
    val root = Files.createTempDirectory("graft-ccstream2").toString
    val (logPath, labPath) = (s"$root/edges", s"$root/labels")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val edges = mem.toDF().toDF("id_a", "id_b")
    mem.addData((1L, 2L), (5L, 6L))
    CcStream.run(spark, edges, logPath, labPath, s"$root/ckpt")
      .awaitTermination(120000)

    // simulate the crash: edges land in the log but the process dies
    // before the label merge (checkpoint replay will never re-offer
    // this batch — only the startup probe can close the gap)
    Seq((2L, 5L), (20L, 21L)).toDF("id_a", "id_b")
      .write.mode("append").parquet(logPath)
    assert(labelsOf(labPath) == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L))

    // next drain (empty batch stream) runs the startup repair
    CcStream.run(spark, edges, logPath, labPath, s"$root/ckpt2")
      .awaitTermination(120000)
    val got = labelsOf(labPath)
    val wholeLog = spark.read.parquet(logPath)
      .as[(Long, Long)].collect().toSeq
    assert(got == fullCc(wholeLog), s"got $got")
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L,
      20L -> 20L, 21L -> 20L))
  }

  test("a delta chain past the round hint converges (no poison batch) " +
      "and the outer session's conf is never touched (ADVICE r10)") {
    val root = Files.createTempDirectory("graft-ccstream3").toString
    val (logPath, labPath) = (s"$root/edges", s"$root/labels")
    implicit val sqlCtx = spark.sqlContext
    val cpKey = "spark.sql.constraintPropagation.enabled"
    val cpBefore = spark.conf.get(cpKey, "true")
    val mem = MemoryStream[(Long, Long)]
    val edges = mem.toDF().toDF("id_a", "id_b")
    // one batch carrying a 600-link chain: ~1.4*log2(n) ≈ 13 star
    // alternations needed, far past rounds=2 — the fixed-round solver
    // would throw AFTER the edge append and poison the log
    mem.addData((0L until 600L).map(i => (i, i + 1)): _*)
    CcStream.run(spark, edges, logPath, labPath, s"$root/ckpt", rounds = 2)
      .awaitTermination(180000)
    val got = labelsOf(labPath)
    assert(got.size == 601 && got.values.toSet == Set(0L), s"got ${got.size}")
    // the merge ran on the derived session — the shared conf is intact
    assert(spark.conf.get(cpKey, "true") == cpBefore)
  }
}
