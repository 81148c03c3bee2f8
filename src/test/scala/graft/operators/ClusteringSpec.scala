package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer-exact Lloyd k-means (q124's operator). The oracle gate
  * proves replay equality; these tests pin the SEMANTICS on known
  * geometry: separation, centroid arithmetic, empty-cluster behavior,
  * and reduce-order independence. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def pad(v: Seq[Double]): Seq[Float] =
    (v ++ Seq.fill(64 - v.size)(0.0)).map(_.toFloat)

  private def assignOf(rows: Seq[(Long, Seq[Float], Int)], k: Int, iters: Int) =
    Clustering.kmeansAssign(
      rows.toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding", "label", k, iters)

  test("two well-separated blobs split perfectly at k = 2") {
    // blob A near (0.4, 0.4, …), blob B near (-0.4, -0.4, …)
    val rows = (0L until 10L).map { i =>
      val base = if (i < 5) 0.4 else -0.4
      (i, pad(Seq(base + 0.001 * i, base - 0.001 * i)), if (i < 5) 0 else 1)
    }
    val got = assignOf(rows, 2, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val clustersOfA = (0L until 5L).map(got).toSet
    val clustersOfB = (5L until 10L).map(got).toSet
    assert(clustersOfA.size == 1 && clustersOfB.size == 1 &&
      clustersOfA != clustersOfB, s"assignment: $got")
  }

  test("centroid of a converged cluster is the shifted floor mean") {
    // one tight pair, one far singleton → after 1 iteration the pair's
    // centroid dim-0 is floor((q1 + q2)/2) via the shifted division
    val rows = Seq(
      (1L, pad(Seq(0.25)), 0),
      (2L, pad(Seq(0.25000190734863281)), 0), // 0.25 + 2/2^20
      (3L, pad(Seq(-0.4)), 1))
    val out = assignOf(rows, 2, 2).collect()
    val byVec = out.map(r => r.getLong(0) ->
      (r.getLong(2), r.getSeq[Long](3))).toMap
    assert(byVec(1L)._1 == byVec(2L)._1)
    assert(byVec(3L)._1 != byVec(1L)._1)
    val q1 = math.floor(0.25 * 1048576).toLong
    val q2 = math.floor(0.25000190734863281 * 1048576).toLong
    assert(byVec(1L)._2.head == (q1 + q2) / 2,
      s"centroid dim0 ${byVec(1L)._2.head} != ${(q1 + q2) / 2}")
  }

  test("an empty cluster keeps its seed centroid") {
    // two exact duplicate groups and k = 3: the third seed is a
    // duplicate of another seed, ties go to the smaller cid, so the
    // duplicate-seed cluster gets no members and must retain its seed
    val a = pad(Seq(0.3, 0.1))
    val b = pad(Seq(-0.3, -0.1))
    val rows = (0L until 4L).map(i => (i, a, 0)) ++
      (4L until 8L).map(i => (i, b, 1))
    val out = assignOf(rows, 3, 2)
    val sizes = out.groupBy("cid").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.size == 2, s"one cluster must be empty: $sizes")
    assert(sizes.values.toSet == Set(4L))
  }

  test("diversitySample caps every cluster and covers every mode") {
    // two blobs of very different sizes: a global top-6 sample would be
    // swamped by the big blob; the cluster cap must cover both
    val rows = (0L until 20L).map(i => (i, pad(Seq(0.4, 0.4)), 0)) ++
      (20L until 23L).map(i => (i, pad(Seq(-0.4, -0.4)), 1))
    val got = Clustering.diversitySample(
      rows.toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding", "label", 2, 2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val perCluster = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perCluster.values.forall(_ <= 3), s"cap violated: $perCluster")
    assert(got.map(_._3).toSet == Set(0, 1),
      s"both modes must appear in the sample: ${got.toSeq}")
  }

  test("assignment is invariant to input partitioning") {
    val rows = (0L until 60L).map(i =>
      (i, pad(Seq(math.sin(i.toDouble), math.cos(i.toDouble / 3)).map(_ * 0.4)), (i % 4).toInt))
    val a = Clustering.kmeansLabelProfile(
      rows.toDF("vec_id", "embedding", "label").repartition(1),
      "vec_id", "embedding", "label", 4, 3).collect().map(_.toSeq).toSeq
    val b = Clustering.kmeansLabelProfile(
      rows.toDF("vec_id", "embedding", "label").repartition(17),
      "vec_id", "embedding", "label", 4, 3).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
