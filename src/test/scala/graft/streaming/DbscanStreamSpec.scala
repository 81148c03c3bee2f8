package graft.streaming

import graft.SparkSpec
import graft.operators.Clustering
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** The streaming twin of q197: standing census + core labels absorb
  * vector micro-batches; the point log is the source of truth and the
  * idempotency ledger; every crash window repairs at startup. */
class DbscanStreamSpec extends SparkSpec {
  import spark.implicits._

  private val W = 262144L
  private val MP = 10L

  private def fixture(lo: Long, hi: Long): Seq[(Long, Seq[Float])] =
    (lo until hi).map { i =>
      val blob = (i % 3).toInt
      val (bx, by) = Seq((0.45, 0.45), (-0.45, 0.45), (0.45, -0.45))(blob)
      val v = (0 until 64).map { d =>
        val jitter = math.sin(i.toDouble * 7.3 + d * 1.7) * 0.015
        (if (d == 0) bx else if (d == 1) by else 0.0) + jitter
      }
      (i, v.map(_.toFloat))
    }

  private def batchTruth(rows: Seq[(Long, Seq[Float])])
      : (Map[(Long, Long), Long], Map[Long, Long]) = {
    val states = Clustering.cellStates(
      Clustering.cellCensus(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", 64, W), MP, 8)
      .select($"cx", $"cy", $"cnt", $"role", $"cell", $"cluster")
      .collect()
    val census = states.map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val labels = states.filter(_.getString(3) == "core")
      .map(r => r.getLong(4) -> r.getLong(5)).toMap
    (census, labels)
  }

  private def diskState(censusPath: String, labelPath: String)
      : (Map[(Long, Long), Long], Map[Long, Long]) = (
    spark.read.parquet(censusPath).select("cx", "cy", "cnt")
      .as[(Long, Long, Long)].collect()
      .map { case (x, y, c) => (x, y) -> c }.toMap,
    spark.read.parquet(labelPath).as[(Long, Long)].collect().toMap)

  test("streaming DBSCAN state equals the batch recompute; replayed ids are no-ops") {
    val root = Files.createTempDirectory("graft-dbstream").toString
    val (pp, cp, lp) = (s"$root/points", s"$root/census", s"$root/labels")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val vecs = mem.toDF().toDF("vec_id", "embedding")
    val b1 = fixture(0, 150)
    val b2 = fixture(150, 300)

    mem.addData(b1: _*)
    DbscanStream.run(spark, vecs, pp, cp, lp, s"$root/ckpt",
      cellWidth = W, minPts = MP).awaitTermination(180000)
    assert(diskState(cp, lp) == batchTruth(b1))

    // drain 2 carries 30 REPLAYED ids alongside the new batch — the
    // point-log ledger must drop them before any count merges
    mem.addData((b2 ++ b1.take(30)): _*)
    DbscanStream.run(spark, vecs, pp, cp, lp, s"$root/ckpt",
      cellWidth = W, minPts = MP).awaitTermination(180000)
    assert(diskState(cp, lp) == batchTruth(b1 ++ b2))
    assert(spark.read.parquet(pp).count() == 300L)
  }

  test("duplicate vec_ids inside one batch count their cell once (ADVICE r10)") {
    val root = Files.createTempDirectory("graft-dbstream3").toString
    val (pp, cp, lp) = (s"$root/points", s"$root/census", s"$root/labels")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val vecs = mem.toDF().toDF("vec_id", "embedding")
    val b1 = fixture(0, 150)
    // the batch carries 40 rows TWICE — an at-least-once producer can
    // duplicate within a delivery, not only across replays
    mem.addData((b1 ++ b1.take(40)): _*)
    DbscanStream.run(spark, vecs, pp, cp, lp, s"$root/ckpt",
      cellWidth = W, minPts = MP).awaitTermination(180000)
    assert(diskState(cp, lp) == batchTruth(b1))
    assert(spark.read.parquet(pp).count() == 150L,
      "the point log must hold one row per id")
  }

  test("streaming DBSCAN repairs the points-appended/census-unmerged crash window") {
    val root = Files.createTempDirectory("graft-dbstream2").toString
    val (pp, cp, lp) = (s"$root/points", s"$root/census", s"$root/labels")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val vecs = mem.toDF().toDF("vec_id", "embedding")
    val b1 = fixture(0, 150)
    mem.addData(b1: _*)
    DbscanStream.run(spark, vecs, pp, cp, lp, s"$root/ckpt",
      cellWidth = W, minPts = MP).awaitTermination(180000)

    // simulate the crash: a batch's points reach the log but neither
    // the census nor the labels were merged
    val ghost = fixture(300, 420)
    Clustering.pointCells(ghost.toDF("vec_id", "embedding"),
        "vec_id", "embedding", 64, W)
      .write.mode("append").parquet(pp)
    assert(diskState(cp, lp) == batchTruth(b1)) // stale, by construction

    // the next drain's startup repair rebuilds census from the log and
    // re-merges labels — even though the stream delivers no new data
    DbscanStream.run(spark, vecs, pp, cp, lp, s"$root/ckpt2",
      cellWidth = W, minPts = MP).awaitTermination(180000)
    assert(diskState(cp, lp) == batchTruth(b1 ++ ghost))
  }
}
