package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HyperBallSpec extends SparkSpec {
  import spark.implicits._

  private def run(und: Seq[(Long, Long)], rounds: Int, parts: Int = 4) =
    Graphs.hyperBall(
        (und ++ und.map(_.swap)).distinct.toDF("src", "dst")
          .repartition(parts), rounds, p = 6)
      .as[(Long, Long, Long)].collect().sortBy(_._1)

  /** Serial register-exact reference: same sha48 hash, same p = 6
    * bucket/rank spec, exact BFS balls. */
  private def serial(und: Seq[(Long, Long)], rounds: Int): Seq[(Long, Long, Long)] = {
    val edges = (und ++ und.map(_.swap)).distinct
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def hash48(v: Long): Long = java.lang.Long.parseLong(
      md.digest(v.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(12), 16)
    def regsOf(ball: Set[Long]): Array[Int] = {
      val regs = new Array[Int](64)
      for (u <- ball) {
        val h = hash48(u)
        val bucket = (h & 63).toInt
        val w = h >>> 6
        val rank = if (w == 0) 43
          else 43 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rank > regs(bucket)) regs(bucket) = rank
      }
      regs
    }
    var balls = nodes.map(v => v -> Set(v)).toMap
    (0 to rounds).map { t =>
      if (t > 0) balls = balls.map { case (v, b) =>
        v -> (b ++ adj.getOrElse(v, Set.empty).flatMap(balls))
      }
      val perNode = nodes.map { v =>
        val regs = regsOf(balls(v))
        val s = regs.map(r => 1L << (43 - r)).sum
        val est = (0.709 * 4096.0) * math.pow(2.0, 43) / s.toDouble
        (regs.map(_.toLong).sum, math.floor(est * 1000000.0 + 0.5).toLong)
      }
      (t.toLong, perNode.map(_._1).sum, perNode.map(_._2).sum)
    }
  }

  test("packed byte aggregators carry the exact registers of the array form") {
    // the wire-format change (array<int> -> m-byte binary) must be
    // value-invisible: hllBytes ∘ unpack ≡ hll, and the packed max-merge
    // of two groups ≡ the array merge
    import graft.functions.{Hll, KmvAggregator}
    val df = (0L until 500L).map(i => (i % 7, i)).toDF("g", "v")
      .withColumn("h", KmvAggregator.kmvHash(col("v")))
    val arr = df.groupBy("g").agg(Hll.hll(6)(col("h")).as("regs"))
      .select(col("g"), col("regs").cast("array<int>"))
      .as[(Long, Seq[Int])].collect().toMap
    val packed = df.groupBy("g")
      .agg(Hll.hllBytes(6)(col("h")).as("pb"))
      .select(col("g"), Hll.unpackRegs(col("pb")))
      .as[(Long, Seq[Int])].collect().toMap
    assert(packed == arr && arr.nonEmpty)
    // merge equivalence: collapse the 7 groups to one via both paths
    val mArr = df.groupBy("g").agg(Hll.hll(6)(col("h")).as("regs"))
      .agg(Hll.hllMerge(6)(col("regs"))).as[Seq[Int]].head()
    val mPacked = df.groupBy("g").agg(Hll.hllBytes(6)(col("h")).as("pb"))
      .agg(Hll.hllMergeBytes(6)(col("pb")).as("mb"))
      .select(Hll.unpackRegs(col("mb"))).as[Seq[Int]].head()
    assert(mArr == mPacked)
  }

  test("hyperBall matches the register-exact serial reference on a mixed graph") {
    // two components: a path 0—1—2—3—4 and a triangle 10,11,12
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L))
    assert(run(und, 4).toSeq == serial(und, 4))
  }

  test("N(t) and reg_sum are monotone and saturate at the diameter") {
    // star: diameter 2 — everything is reachable by t = 2
    val und = (1L to 12L).map(v => (0L, v))
    val got = run(und, 4)
    assert(got.map(_._2).sliding(2).forall(s => s(0) <= s(1)), s"$got")
    assert(got.map(_._3).sliding(2).forall(s => s(0) <= s(1)), s"$got")
    assert((got(2)._2, got(2)._3) == (got(3)._2, got(3)._3) &&
      (got(3)._2, got(3)._3) == (got(4)._2, got(4)._3),
      s"past the diameter every counter is the full component: ${got.toSeq}")
  }

  test("saturated estimate is within HLL error of n² (raw-estimator operating range)") {
    // two-scale circulant on 300 nodes: offsets {1..5} ∪ {30,60,…,150}
    // — every residue r decomposes as 30q + s with |q|,|s| ≤ 5, so any
    // node is reachable in ≤ 2 hops and by t = 3 every ball is the full
    // 300-node set — inside the raw estimator's documented operating
    // range (n ≥ 2.5m = 160; below it raw HLL overestimates and the
    // gated queries would switch to linear counting). N(3) must
    // estimate 300² within HLL tolerance — per-node errors are fully
    // correlated here (every ball is the SAME set), so the total
    // carries one σ ≈ 13%, allow 3σ.
    val offs = (1L to 5L) ++ (1L to 5L).map(_ * 30L)
    val und = (for (u <- 0L until 300L; o <- offs)
      yield (u, (u + o) % 300L)).filter(e => e._1 != e._2)
    val got = run(und.toSeq.distinct, 3)
    assert(got.map(_._3).sliding(2).forall(s => s(0) <= s(1)))
    val est = got.last._3.toDouble / 1e6
    val exact = 300.0 * 300.0
    assert(math.abs(est - exact) / exact < 0.4, s"est=$est exact=$exact")
  }

  test("output is invariant to input partitioning") {
    val und = (for (u <- 0L until 20L; v <- (u + 1) until 20L
                    if (u * 5 + v * 3) % 7 == 0) yield (u, v)).toSeq
    assert(run(und, 3, parts = 1).toSeq == run(und, 3, parts = 13).toSeq)
  }
}
