package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  /** All shuffle exchanges in the final (post-AQE) executed plan. */
  private def collectShuffles(plan: SparkPlan): Seq[ShuffleExchangeExec] = {
    val here = plan match {
      case e: ShuffleExchangeExec => Seq(e)
      case _ => Seq.empty
    }
    val kids = plan match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case p => p.children
    }
    here ++ kids.flatMap(collectShuffles)
  }

  /** Exchanges hash-partitioned on an LSH band column — the candidate-
    * generation shuffle. The 100 TB contract: these must carry ids only,
    * never the vectors (an array column here multiplies shuffle volume by
    * the band count on both sides of the self-join). */
  private def assertBandExchangesCarryNoArrays(df: DataFrame): Unit = {
    df.collect()
    val shuffles = collectShuffles(df.queryExecution.executedPlan)
    val bandShuffles = shuffles.filter(_.outputPartitioning match {
      case h: HashPartitioning =>
        h.expressions.exists(_.references.exists(_.name == "band"))
      case _ => false
    })
    assert(bandShuffles.nonEmpty, "expected a shuffle on the band key; " +
      s"got partitionings ${shuffles.map(_.outputPartitioning)}")
    for (e <- bandShuffles)
      assert(!e.output.exists(_.dataType.isInstanceOf[ArrayType]),
        s"band exchange ships an array column: ${e.output}")
  }

  /** Runs `body` with broadcast joins disabled so band joins must plan a
    * real shuffle exchange (at test row counts everything broadcasts). */
  private def withoutBroadcast[T](body: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, prev)
  }

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)),   // near 0
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),    // orthogonal to 0
    (3L, Array(0.0f, 0.98f, 0.2f, 0.0f)),   // near 2
    (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),   // opposite of 0
  ).toDF("vec_id", "embedding")

  test("cosine of identical vectors is 1, orthogonal 0, opposite -1") {
    val df = Seq(
      (Array(1.0, 2.0), Array(1.0, 2.0), 1.0),
      (Array(1.0, 0.0), Array(0.0, 3.0), 0.0),
      (Array(1.0, 1.0), Array(-1.0, -1.0), -1.0),
    ).toDF("a", "b", "want")
    val bad = df.filter(
      abs(Similarity.cosine($"a", $"b") - $"want") > 1e-12).count()
    assert(bad == 0)
  }

  test("bruteForceTopK ranks the planted neighbor first, excludes self") {
    val top = Similarity.bruteForceTopK(vecs, vecs, "vec_id", "embedding", k = 2)
      .filter($"query_id" === 0 && $"rank" === 1)
      .select("neighbor_id").as[Long].head()
    assert(top == 1L)
    val selfs = Similarity.bruteForceTopK(vecs, vecs, "vec_id", "embedding", 4)
      .filter($"query_id" === $"neighbor_id").count()
    assert(selfs == 0)
  }

  test("bruteForceTopK returns exactly k rows per query with ranks 1..k") {
    val df = Similarity.bruteForceTopK(vecs, vecs, "vec_id", "embedding", 3)
    val counts = df.groupBy("query_id").count().select("count").as[Long].collect()
    assert(counts.forall(_ == 3))
    val ranks = df.filter($"query_id" === 2).select("rank").as[Int].collect().sorted
    assert(ranks.toSeq == Seq(1, 2, 3))
  }

  test("shaPlanes known vectors: centered first byte of sha256(p:d:lshp)") {
    // the cross-engine contract behind the q106/q107 oracles: weight(p,d)
    // is (first byte of sha256("p:d:lshp")) - 128, computable by any
    // engine with sha256. Pin a few hand-derived values so a silent
    // change to the tag or centering breaks loudly here, not at the gate.
    val md = java.security.MessageDigest.getInstance("SHA-256")
    for ((p, d) <- Seq((0, 0), (3, 17), (63, 63))) {
      val expect = (md.digest(s"$p:$d:lshp".getBytes("UTF-8"))(0) & 0xff) - 128
      assert(Similarity.shaPlanes(64, 64)(p)(d) == expect.toLong)
    }
    // weights span both signs (a degenerate all-positive plane set would
    // hash every vector near the all-ones signature)
    val flat = Similarity.shaPlanes(64, 64).flatten
    assert(flat.exists(_ < 0) && flat.exists(_ > 0))
    assert(flat.forall(w => w >= -128 && w <= 127))
  }

  test("quantize is floor(v*2^20 + 0.5) exactly, as longs") {
    val df = Seq((1L, Array(0.5f, -0.25f, 0.0f, 1.0f))).toDF("id", "v")
    val out = df.select(Similarity.quantize(
        Similarity.asDouble($"v")).as("q"))
      .as[Seq[Long]].head()
    assert(out == Seq(524288L, -262144L, 0L, 1048576L))
  }

  test("native LshBands == declarative quantize+lshSignature, element-wise") {
    // the fused expression the operators actually run must be the exact
    // function the declarative reference (and therefore the q106/q107
    // SQL oracles) define — on varied vectors including sign boundaries
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(16)(j =>
        (math.sin(i * 16 + j) * (if ((i + j) % 3 == 0) -0.7 else 0.4)).toFloat))
    }.toDF("id", "v")
    val planes = Similarity.shaPlanes(12, 16)
    val both = vecs.select($"id",
      graft.expressions.LshBands.lshBands(
        Similarity.asDouble($"v"), bands = 3, bitsPerBand = 4, dim = 16).as("native"),
      Similarity.lshSignature(
        Similarity.quantize(Similarity.asDouble($"v")), planes, 4).as("decl"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    assert(both.length == 40)
    for ((id, n, dcl) <- both) assert(n == dcl, s"vector $id: $n != $dcl")
  }

  test("lshTopK recovers the true nearest neighbor for clustered vectors") {
    // 64-dim: two tight clusters around e1 and e2
    def e(i: Int, eps: Float): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(i) = 1.0f; a((i + 1) % 64) = eps; a
    }
    val df = Seq(
      (0L, e(0, 0.0f)), (1L, e(0, 0.05f)), (2L, e(0, 0.1f)),
      (10L, e(30, 0.0f)), (11L, e(30, 0.05f)), (12L, e(30, 0.1f)),
    ).toDF("vec_id", "embedding")
    val nn = Similarity.lshTopK(df, "vec_id", "embedding", k = 1,
      bands = 8, bitsPerBand = 4, dim = 64)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    // each cluster member's NN must come from its own cluster
    for ((q, n) <- nn) assert((q < 10) == (n < 10), s"$q -> $n crossed clusters")
  }

  test("ivfTopK finds in-cluster nearest neighbors") {
    def e(i: Int, eps: Float): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(i) = 1.0f; a((i + 1) % 64) = eps; a
    }
    val df = (0 until 8).flatMap { c =>
      (0 until 4).map(j => ((c * 10 + j).toLong, e(c * 8, 0.03f * j)))
    }.toDF("vec_id", "embedding")
    val nn = Similarity.ivfTopK(df, "vec_id", "embedding", k = 1,
      cells = 8, nprobe = 2)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    // every vector's nearest neighbor must be from its own tight cluster
    for ((q, n) <- nn) assert(q / 10 == n / 10, s"$q -> $n crossed clusters")
    assert(nn.size == 32)
  }

  test("nnDescentKnn: refinement recovers cross-cell true neighbors the " +
      "ring init misses, recall vs brute force is high, and a converged " +
      "graph is a fixed point") {
    // 12 tight clusters of 6 — more clusters than IVF cells (4), so the
    // ring init mixes clusters within a cell and only the
    // neighbor-of-neighbor rounds can sort each node's true cluster to
    // the top ranks
    def e(i: Int, eps: Float): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(i) = 1.0f; a((i + 1) % 64) = eps; a
    }
    val df = (0 until 12).flatMap { c =>
      (0 until 6).map(j => ((c * 10 + j).toLong, e(c * 5, 0.02f * j)))
    }.toDF("vec_id", "embedding")
    val knn = Similarity.nnDescentKnn(df, "vec_id", "embedding",
        k = 5, cells = 4, rounds = 4)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect()
    val byQ = knn.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byQ.size == 72 && knn.forall(_._3 <= 5))
    // ground truth: the 5 true NNs are exactly the other 5 cluster members
    val truth = (0 until 12).flatMap { c =>
      (0 until 6).map { j =>
        (c * 10 + j).toLong ->
          (0 until 6).filter(_ != j).map(x => (c * 10 + x).toLong).toSet
      }
    }.toMap
    val recall = byQ.map { case (q, got) =>
      got.intersect(truth(q)).size.toDouble / 5.0 }.sum / byQ.size
    assert(recall >= 0.9, s"NN-Descent recall $recall < 0.9")
    // fixed point: once converged, more rounds change nothing (the
    // early-stop + oracle-unroll equivalence contract)
    val more = Similarity.nnDescentKnn(df, "vec_id", "embedding",
        k = 5, cells = 4, rounds = 8)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect()
    assert(more.toSet == knn.toSet)
  }

  test("nnDescentSearch: out-of-corpus queries route through the beam " +
      "walk to their true nearest corpus vector, far beyond what the " +
      "entry points alone could answer, and a converged walk is a " +
      "fixed point") {
    // 40 corpus points around a circle — the k-NN graph is a connected
    // band (each node's true 4-NN are its ±2 angular neighbors), so a
    // walk can NAVIGATE: cosine to the query improves monotonically
    // along the circle, the property graph-ANN serving exploits
    def ev(theta: Double): Array[Float] = {
      val a = Array.fill(64)(0.0f)
      a(0) = math.cos(theta).toFloat; a(1) = math.sin(theta).toFloat; a
    }
    val step = 2 * math.Pi / 40
    val corpus = (0 until 40).map(i => (i.toLong, ev(i * step)))
      .toDF("vec_id", "embedding")
    // queries sit at angle (2j + 0.3) steps — strictly nearest to
    // corpus point 2j, and NOT in the corpus
    val queries = (0 until 20).map(j => (1000L + j, ev((2 * j + 0.3) * step)))
      .toDF("vec_id", "embedding")
    val graph = Similarity.nnDescentKnn(corpus, "vec_id", "embedding",
      k = 4, cells = 4, rounds = 4)
    val walk = Similarity.nnDescentSearch(graph, corpus, "vec_id",
      "embedding", queries, "vec_id", "embedding",
      k = 1, cells = 4, beam = 4, steps = 8)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(walk.length == 20)
    for ((q, n) <- walk)
      assert(n == 2 * (q - 1000), s"query $q routed to $n, " +
        s"expected ${2 * (q - 1000)}")
    // the 20 distinct answers exceed the 4 entry representatives — the
    // WALK found them, not the entry rescoring
    assert(walk.map(_._2).distinct.length == 20)
    // fixed point: extra steps change nothing (the early-stop +
    // oracle-unroll equivalence contract)
    val more = Similarity.nnDescentSearch(graph, corpus, "vec_id",
      "embedding", queries, "vec_id", "embedding",
      k = 1, cells = 4, beam = 4, steps = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(more.toSet == walk.toSet)
  }

  test("hnswSearch: the hierarchical descent from a SINGLE top-layer " +
      "entry navigates every out-of-corpus query to its true nearest, " +
      "matches the flat-entry walk's answers at equal layer-0 budget, " +
      "and is deterministic") {
    def ev(theta: Double): Array[Float] = {
      val a = Array.fill(64)(0.0f)
      a(0) = math.cos(theta).toFloat; a(1) = math.sin(theta).toFloat; a
    }
    val step = 2 * math.Pi / 40
    val corpus = (0 until 40).map(i => (i.toLong, ev(i * step)))
      .toDF("vec_id", "embedding")
    val queries = (0 until 20).map(j => (1000L + j, ev((2 * j + 0.3) * step)))
      .toDF("vec_id", "embedding")
    def run() = Similarity.hnswSearch(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 1, knnK = 4, cells = 4,
        rounds = 4, beam = 4, steps = 8, maxLevel = 2, upperBeam = 2,
        upperSteps = 2)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    val walk = run()
    assert(walk.length == 20)
    for ((q, n) <- walk)
      assert(n == 2 * (q - 1000), s"query $q routed to $n, " +
        s"expected ${2 * (q - 1000)}")
    // 20 distinct answers from ONE entry point: the descent + layer-0
    // walk found them, not entry rescoring (flat q214 needed 4 entries)
    assert(walk.map(_._2).distinct.length == 20)
    assert(run().toSet == walk.toSet, "hierarchical walk not deterministic")
    // equal-budget parity with the flat-entry walk at layer 0
    val graph = Similarity.nnDescentKnn(corpus, "vec_id", "embedding",
      k = 4, cells = 4, rounds = 4)
    val flat = Similarity.nnDescentSearch(graph, corpus, "vec_id",
        "embedding", queries, "vec_id", "embedding",
        k = 1, cells = 4, beam = 4, steps = 8)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(walk.toSet == flat.toSet)
  }

  test("at EQUAL entry budget the hierarchical descent strictly beats " +
      "the flat sha-sample: descended entries are near-optimal where " +
      "sampled entries are random — the scaling claim, measured") {
    // the fixture corpus (clustered 64-dim blobs, held-out queries):
    // flat recall grows only by spending MORE entries (cells), which is
    // exactly the cost that grows with the corpus; the descent turns
    // the same entry count into walk-chosen near entries at log cost
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = emb.filter($"vec_id" % 13 =!= 0).localCheckpoint()
    val qs = emb.filter($"vec_id" % 13 === 0).localCheckpoint()
    val truth = Similarity.bruteForceTopK(qs, corpus, "vec_id",
      "embedding", k = 8).localCheckpoint()
    def recall(walk: org.apache.spark.sql.DataFrame): Double =
      Retrieval.rankingQuality(truth, walk, 8)
        .agg(avg($"recall_k")).head().getDouble(0)
    val g0 = Similarity.nnDescentKnn(corpus, "vec_id", "embedding",
      8, 16, 2)
    for (budget <- Seq(2, 8)) {
      val flat = recall(Similarity.nnDescentSearch(g0, corpus, "vec_id",
        "embedding", qs, "vec_id", "embedding", 8, budget, 8, 2))
      val hier = recall(Similarity.hnswSearch(corpus, "vec_id",
        "embedding", qs, "vec_id", "embedding", k = 8, knnK = 8,
        cells = 16, rounds = 2, beam = 8, steps = 2, maxLevel = 2,
        upperBeam = budget, upperSteps = 2))
      assert(hier > flat,
        f"entry budget $budget: hier $hier%.4f !> flat $flat%.4f")
    }
  }

  test("hnswLevel: hash-geometric layer sizes shrink ~4x per level and " +
      "the assignment is a pure id property") {
    val ids = spark.range(0, 4096).select($"id".as("vec_id"))
    val counts = ids
      .select(Similarity.hnswLevel($"vec_id", 7).as("lvl"))
      .groupBy($"lvl").count().as[(Int, Long)].collect().toMap
    // P(level >= 1) = 1/4: expect ~1024 of 4096 at level >= 1
    val above1 = counts.filter(_._1 >= 1).values.sum
    assert(above1 > 700 && above1 < 1400, s"level>=1 count $above1")
    val above2 = counts.filter(_._1 >= 2).values.sum
    assert(above2 > 150 && above2 < 400, s"level>=2 count $above2")
    // deterministic: same ids, same levels
    val again = ids.select(Similarity.hnswLevel($"vec_id", 7).as("lvl"))
      .groupBy($"lvl").count().as[(Int, Long)].collect().toMap
    assert(again == counts)
  }

  test("lshTopK band-join shuffles carry ids only, never vectors") {
    def e(i: Int): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(i) = 1.0f; a
    }
    val df = (0 until 12).map(i => (i.toLong, e(i % 4))).toDF("vec_id", "embedding")
    withoutBroadcast {
      assertBandExchangesCarryNoArrays(
        Similarity.lshTopK(df, "vec_id", "embedding", k = 2,
          bands = 4, bitsPerBand = 4, dim = 64))
    }
  }

  test("embeddingNearDupPairs band-join shuffles carry ids only, never vectors") {
    val df = Seq(
      (0L, Array.fill(64)(0.5f)),
      (1L, Array.fill(64)(0.5001f)),
      (2L, Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)),
    ).toDF("vec_id", "embedding")
    withoutBroadcast {
      assertBandExchangesCarryNoArrays(
        Similarity.embeddingNearDupPairs(df, "vec_id", "embedding",
          threshold = 0.999))
    }
  }

  test("ivfTopK with explicit cells launches no Spark job at plan-construction time") {
    val sc = spark.sparkContext
    def jobs(): Int = sc.statusTracker.getJobIdsForGroup(null).length
    val before = jobs()
    val df = Similarity.ivfTopK(vecs, "vec_id", "embedding", k = 1,
      cells = 2, nprobe = 1)
    // Flush the async status listener with one sentinel job: the listener
    // bus is FIFO, so any job started during plan construction above must
    // be visible by the time the sentinel is.
    sc.parallelize(1 to 2, 1).count()
    val deadline = System.currentTimeMillis + 30000
    while (jobs() < before + 1 && System.currentTimeMillis < deadline)
      Thread.sleep(50)
    assert(jobs() == before + 1,
      s"expected only the sentinel job, got ${jobs() - before}")
    assert(df.count() > 0)  // the frame still computes when acted on
  }

  test("embeddingNearDupPairs finds only the near-identical pair") {
    val df = Seq(
      (0L, Array.fill(64)(0.5f)),
      (1L, Array.fill(64)(0.5001f)),                       // cos ~ 1
      (2L, Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)),
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDupPairs(df, "vec_id", "embedding",
      threshold = 0.999)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("incrementalEmbNearDups over the band table == symmetric path; " +
       "O(batch) plan shape") {
    // deterministic varied corpus; batch = perturbed copies of the even
    // ids (each with exactly one corpus near-dup) + one unrelated vector
    val corpus = (0L until 20L).map(i =>
      (i, Array.tabulate(64)(j => math.sin(i * 64.0 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val batch = (0L until 20L by 2).map(i =>
      (i + 1000L, Array.tabulate(64)(j =>
        (math.sin(i * 64.0 + j) + (if (j == 0) 0.001 else 0.0)).toFloat)))
      .:+((2000L, Array.fill(64)(0.5f)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_embband").toString
    Similarity.writeEmbBandTable(corpus, "vec_id", "embedding", dir)
    val banded = Similarity.incrementalEmbNearDups(batch, "vec_id", "embedding",
      spark.read.parquet(dir), corpus, threshold = 0.999)
    // identical cross-pair set (ids AND cosines) to the symmetric path
    // over the union — the band table adds nothing the in-flight band
    // derivation doesn't compute
    val symmetric = Similarity.embeddingNearDupPairs(
        corpus.unionByName(batch), "vec_id", "embedding", threshold = 0.999)
      .filter($"id_a" < 1000L && $"id_b" >= 1000L)
      .select($"id_b".as("id_new"), $"id_a".as("id_corpus"), $"cos")
    assert(banded.exceptAll(symmetric).isEmpty &&
      symmetric.exceptAll(banded).isEmpty)
    val got = banded.select($"id_new", $"id_corpus").as[(Long, Long)]
      .collect().toSet
    assert(got == (0L until 20L by 2).map(i => (i + 1000L, i)).toSet, s"got $got")
    banded.collect()
    // plan pin — the O(batch) shape: both corpus-side joins are broadcast
    // probes (corpus streamed, batch/candidates built), nothing sorts or
    // sort-merge-joins, and every shuffle carries candidate PAIR IDS only
    val plan = banded.queryExecution.executedPlan
    val planStr = plan.toString
    assert(!planStr.contains("SortMergeJoin"), planStr)
    assert("BroadcastHashJoin".r.findAllIn(planStr).size >= 3, planStr)
    for (e <- collectShuffles(plan)) {
      assert(e.output.forall(a => Set("id_new", "id_corpus").contains(a.name)),
        s"exchange carries non-pair columns: ${e.output}")
      assert(!e.output.exists(_.dataType.isInstanceOf[ArrayType]),
        s"exchange ships an array column: ${e.output}")
    }
  }
}
