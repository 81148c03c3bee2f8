package graft.streaming

import graft.SparkSpec
import graft.operators.Clustering
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** The streaming ANN member of the standing-corpus family: per-drain
  * O(batch) assign+encode against the standing model, compaction
  * retrain on the growth trigger, generation-stamped entries, and
  * every crash window repaired at startup. */
class IvfPqStreamSpec extends SparkSpec {
  import spark.implicits._

  private val P = IvfPqStream.Params(dims = 64, m = 8, k = 4, iters = 2,
    cells = 4, growth = 2.0)

  private def fixture(lo: Long, hi: Long): Seq[(Long, Seq[Float])] =
    (lo until hi).map { i =>
      val blob = (i % 4).toInt
      val v = (0 until 64).map { d =>
        val base = if (d == blob * 16) 1.0 else 0.0
        base + math.sin(i.toDouble * 3.7 + d * 1.3) * 0.02
      }
      (i, v.map(_.toFloat))
    }

  private def entrySet(path: String): Set[(Long, Long, Long, Long, Long)] =
    spark.read.parquet(path)
      .select("vec_id", "cell_id", "sm", "cid", "gen")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  private def refEntries(corpus: Seq[(Long, Seq[Float])],
                         model: DataFrame): Set[(Long, Long, Long, Long)] =
    Clustering.pqAssignEncode(corpus.toDF("vec_id", "embedding"),
        "vec_id", "embedding", P.dims, P.m, model)
      .as[(Long, Long, Long, Long)].collect().toSet

  private def drain(mem: MemoryStream[(Long, Seq[Float])], root: String,
                    ckpt: String): Unit =
    IvfPqStream.run(spark, mem.toDF().toDF("vec_id", "embedding"),
      s"$root/log", s"$root/model", s"$root/entries", s"$root/$ckpt",
      params = P).awaitTermination(180000)

  test("drains below the growth trigger keep the generation-1 model and " +
      "price O(batch): entries equal the reference encode under that model") {
    val root = Files.createTempDirectory("graft-ivfpq").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val b1 = fixture(0, 120)
    val b2 = fixture(120, 160) // 160 < 2.0 * 120 — no compaction

    mem.addData(b1: _*)
    drain(mem, root, "ckpt")
    val model1 = spark.read.parquet(s"$root/model")
    // the model trained on exactly b1 (gen 1): reference = public train
    val refModel = Clustering.pqTrainModel(b1.toDF("vec_id", "embedding"),
      "vec_id", "embedding", P.dims, P.m, P.k, P.iters, P.cells)
    assert(model1.filter($"part" =!= "meta")
      .as[(String, Option[Long], Option[Long], Option[Long], Seq[Long])]
      .collect().toSet ==
      refModel.as[(String, Option[Long], Option[Long], Option[Long], Seq[Long])]
        .collect().toSet)

    mem.addData((b2 ++ b1.take(25)): _*) // 25 replayed ids must no-op
    drain(mem, root, "ckpt")
    assert(spark.read.parquet(s"$root/log").count() == 160L)
    // still generation 1 — and EVERY entry (old + new) encodes under
    // the gen-1 model exactly as a from-scratch encode of the union
    val want = refEntries(b1 ++ b2, model1).map(e =>
      (e._1, e._2, e._3, e._4, 1L))
    assert(entrySet(s"$root/entries") == want)
  }

  test("the growth trigger retrains: model and entries equal a wholesale " +
      "batch rebuild on the union corpus (gen 2)") {
    val root = Files.createTempDirectory("graft-ivfpq2").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val b1 = fixture(0, 60)
    val b2 = fixture(60, 180) // 180 >= 2.0 * 60 — compaction fires

    mem.addData(b1: _*)
    drain(mem, root, "ckpt")
    mem.addData(b2: _*)
    drain(mem, root, "ckpt")

    val union = b1 ++ b2
    val refModel = Clustering.pqTrainModel(union.toDF("vec_id", "embedding"),
      "vec_id", "embedding", P.dims, P.m, P.k, P.iters, P.cells)
    val model = spark.read.parquet(s"$root/model")
    assert(model.filter($"part" === "meta")
      .select($"cell_id", $"sm").as[(Long, Long)].head() == ((2L, 180L)))
    assert(model.filter($"part" =!= "meta")
      .as[(String, Option[Long], Option[Long], Option[Long], Seq[Long])]
      .collect().toSet ==
      refModel.as[(String, Option[Long], Option[Long], Option[Long], Seq[Long])]
        .collect().toSet)
    assert(entrySet(s"$root/entries") ==
      refEntries(union, refModel).map(e => (e._1, e._2, e._3, e._4, 2L)))
  }

  test("probe serves in-cluster neighbors from the standing state and " +
      "equals the batch probe against identical tables") {
    val root = Files.createTempDirectory("graft-ivfpq3").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val all = fixture(0, 120)
    mem.addData(all: _*)
    drain(mem, root, "ckpt")
    val queries = all.filter(_._1 % 10 == 0).toDF("vec_id", "embedding")
    val got = IvfPqStream.probe(spark, queries, s"$root/model",
        s"$root/entries", nprobe = 2, topK = 3, params = P)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect()
    assert(got.nonEmpty)
    // the four blobs are far apart: every served neighbor shares the
    // query's blob (i mod 4)
    got.foreach { case (q, n, _) =>
      assert(q % 4 == n % 4, s"$q -> $n crossed blobs")
    }
  }

  test("crash windows repair at startup: appended-but-unencoded vectors " +
      "re-encode, and stale-generation entries are dropped and re-encoded") {
    val root = Files.createTempDirectory("graft-ivfpq4").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val b1 = fixture(0, 100)
    mem.addData(b1: _*)
    drain(mem, root, "ckpt")
    val model1 = spark.read.parquet(s"$root/model").localCheckpoint()

    // window 1: vectors reach the log, the process dies before encode
    val ghost = fixture(100, 130)
    ghost.toDF("vec_id", "embedding").write.mode("append")
      .parquet(s"$root/log")
    drain(mem, root, "ckpt2") // empty drain → startup repair only
    assert(entrySet(s"$root/entries") ==
      refEntries(b1 ++ ghost, model1).map(e => (e._1, e._2, e._3, e._4, 1L)))

    // window 2: a compaction swapped the model (gen 2) but died before
    // the entry rewrite — simulate by rewriting the model alone
    val union = b1 ++ ghost
    val model2 = Clustering.pqTrainModel(union.toDF("vec_id", "embedding"),
        "vec_id", "embedding", P.dims, P.m, P.k, P.iters, P.cells)
      .unionByName(spark.range(1).select(lit("meta").as("part"),
        lit(2L).as("cell_id"), lit(130L).as("sm"),
        lit(null).cast("long").as("cid"),
        lit(null).cast("array<long>").as("c")))
      .localCheckpoint()
    graft.zones.Zones.replaceKeepingBackup(spark, s"$root/model")(tmp =>
      model2.write.parquet(tmp))
    drain(mem, root, "ckpt3") // repair: stale gen-1 entries must go
    assert(entrySet(s"$root/entries") ==
      refEntries(union, model2).map(e => (e._1, e._2, e._3, e._4, 2L)))
  }
}
