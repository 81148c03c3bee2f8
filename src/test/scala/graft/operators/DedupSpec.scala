package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill in the afternoon sun"

  /** corpus with planted near-dups: 0/1 near-identical, 2/3 identical,
    * 4..9 unrelated */
  private def corpus = Seq(
    (0L, base),
    (1L, base + " today"),                       // near-dup of 0
    (2L, "completely different content about spark query engines and shuffles"),
    (3L, "completely different content about spark query engines and shuffles"),
    (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (5L, "one two three four five six seven eight nine ten eleven twelve"),
    (6L, "red orange yellow green blue indigo violet colors of the rainbow sky"),
    (7L, "sphinx of black quartz judge my vow pack my box with five dozen jugs"),
    (8L, "data pipelines require careful partitioning and deduplication at scale"),
    (9L, "entirely unrelated musings on the philosophy of distributed systems"),
  ).toDF("doc_id", "text")

  test("exact dedup keeps one row per key") {
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    assert(Dedup.exact(df, Seq("k")).count() == 2)
  }

  test("exactDeterministic keeps the smallest orderCol row per key") {
    val df = Seq((1, 10, "keep"), (1, 20, "drop"), (2, 5, "keep")).toDF("k", "ord", "tag")
    val got = Dedup.exactDeterministic(df, Seq("k"), "ord")
      .filter($"tag" === "drop").count()
    assert(got == 0)
  }

  test("byFingerprint collapses case/whitespace variants, keeps min id") {
    val df = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other")).toDF("id", "text")
    val kept = Dedup.byFingerprint(df, "id", "text").select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("minhashDupPairs finds planted near-dups and identical pairs, no false positives") {
    val pairs = Dedup.minhashDupPairs(corpus, "doc_id", "text",
      shingleSize = 5, k = 128, bands = 16, threshold = 0.6)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"missing near-dup pair, got $pairs")
    assert(pairs.contains((2L, 3L)), s"missing identical pair, got $pairs")
    assert(pairs.size == 2, s"false positives: $pairs")
  }

  test("minhashDedup drops the higher-id member of each dup cluster") {
    val kept = Dedup.minhashDedup(corpus, "doc_id", "text",
      shingleSize = 5, k = 128, bands = 16, threshold = 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(1L) && !kept.contains(3L))
    assert(kept.contains(0L) && kept.contains(2L))
    assert(kept.size == 8)
  }

  test("incrementalDupPairs/incrementalDedup: batch vs standing-corpus signatures") {
    // corpus = docs 0,2,4..9; batch = near-dup of 0, copy of 2, novel doc
    val corpusDocs = corpus.filter($"doc_id" =!= 1L && $"doc_id" =!= 3L)
    val sigs = Dedup.minhashSignatures(corpusDocs, "doc_id", "text")
    val batch = Seq(
      (100L, base + " today"),                    // near-dup of corpus 0
      (101L, "completely different content about spark query engines and shuffles"),
      (102L, "a genuinely novel document that matches nothing in the corpus"),
    ).toDF("doc_id", "text")
    val pairs = Dedup.incrementalDupPairs(batch, "doc_id", "text", sigs,
        threshold = 0.6)
      .select($"id_new", $"id_corpus").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 0L), (101L, 2L)), s"got $pairs")
    val kept = Dedup.incrementalDedup(batch, "doc_id", "text", sigs,
        threshold = 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(102L), s"got $kept")
    // batch schema passes through unchanged
    val out = Dedup.incrementalDedup(batch, "doc_id", "text", sigs, threshold = 0.6)
    assert(out.columns.toSeq == batch.columns.toSeq)
  }

  test("incremental band exchanges carry ids only, never shingle arrays") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.types.ArrayType
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val corpusDocs = corpus.filter($"doc_id" =!= 1L && $"doc_id" =!= 3L)
      val sigs = Dedup.minhashSignatures(corpusDocs, "doc_id", "text")
      val batch = Seq((100L, base + " today")).toDF("doc_id", "text")
      val df = Dedup.incrementalDupPairs(batch, "doc_id", "text", sigs,
        threshold = 0.6)
      df.collect()
      def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] = {
        val here = p match { case s: ShuffleExchangeExec => Seq(s); case _ => Nil }
        val kids = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            Seq(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        here ++ kids.flatMap(shuffles)
      }
      val bandShuffles = shuffles(df.queryExecution.executedPlan)
        .filter(_.outputPartitioning match {
          case h: HashPartitioning =>
            h.expressions.exists(_.references.exists(_.name == "band"))
          case _ => false
        })
      assert(bandShuffles.nonEmpty, "expected a shuffle on the band key")
      for (e <- bandShuffles)
        assert(!e.output.exists(_.dataType.isInstanceOf[ArrayType]),
          s"band exchange ships an array column: ${e.output}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("banded probe: matches the legacy path, corpus never shuffles, exchanges carry pair ids only") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.ArrayType
    val dir = java.nio.file.Files.createTempDirectory("graft_band").toString
    val corpusDocs = corpus.filter($"doc_id" =!= 1L && $"doc_id" =!= 3L)
    // the standing-table workflow: signatures + band table materialized
    // once, probed per batch
    Dedup.minhashSignatures(corpusDocs, "doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/sigs")
    val sigs = spark.read.parquet(s"$dir/sigs")
    Dedup.writeBandTable(sigs, s"$dir/band")
    val bandTable = spark.read.parquet(s"$dir/band")
    val batch = Seq(
      (100L, base + " today"),
      (101L, "completely different content about spark query engines and shuffles"),
      (102L, "a genuinely novel document that matches nothing in the corpus"),
    ).toDF("doc_id", "text")
    val banded = Dedup.incrementalDupPairsBanded(batch, "doc_id", "text",
      bandTable, sigs, threshold = 0.6)
    val legacy = Dedup.incrementalDupPairs(batch, "doc_id", "text", sigs,
      threshold = 0.6)
    // identical pair set (ids AND jaccard values) to the legacy path
    assert(banded.exceptAll(legacy).isEmpty && legacy.exceptAll(banded).isEmpty)
    banded.collect()
    // plan pin — the O(batch) shape: both corpus-side joins are broadcast
    // probes (corpus streamed, batch/candidates built), nothing sorts or
    // sort-merge-joins, and every shuffle carries candidate PAIR IDS only
    // — exchange volume is batch-proportional, never corpus-proportional
    def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] = {
      val here = p match { case s: ShuffleExchangeExec => Seq(s); case _ => Nil }
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(shuffles)
    }
    val plan = banded.queryExecution.executedPlan
    val planStr = plan.toString
    assert(!planStr.contains("SortMergeJoin"), planStr)
    assert("BroadcastHashJoin".r.findAllIn(planStr).size >= 3, planStr)
    for (e <- shuffles(plan)) {
      assert(e.output.forall(a => Set("id_new", "id_corpus").contains(a.name)),
        s"exchange carries non-pair columns: ${e.output}")
      assert(!e.output.exists(_.dataType.isInstanceOf[ArrayType]),
        s"exchange ships an array column: ${e.output}")
    }
    // the dedup wrapper rides the same probe
    val kept = Dedup.incrementalDedupBanded(batch, "doc_id", "text",
        bandTable, sigs, threshold = 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(102L), s"got $kept")
  }

  test("incrementalDedup does not dedup the batch against itself") {
    val sigs = Dedup.minhashSignatures(
      Seq((0L, "standing corpus content entirely unlike the arriving batch docs"))
        .toDF("doc_id", "text"), "doc_id", "text")
    val twin = base + " twice over"
    val batch = Seq((10L, twin), (11L, twin)).toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(batch, "doc_id", "text", sigs, threshold = 0.6)
      .select("doc_id").as[Long].collect().toSet
    // both batch-internal twins survive: vs-corpus only, by contract
    assert(kept == Set(10L, 11L), s"got $kept")
  }

  test("minhash jaccard estimate is exact for identical docs") {
    val j = Dedup.minhashDupPairs(corpus, "doc_id", "text", threshold = 0.99)
      .filter($"id_a" === 2 && $"id_b" === 3)
      .select("jaccard").as[Double].head()
    assert(j == 1.0)
  }

  test("simhashDupPairs: identical docs at hamming 0; near-dups within budget") {
    val pairs = Dedup.simhashDupPairs(corpus, "doc_id", "text", maxHamming = 12)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((2L, 3L)) == 0)
    assert(m.contains((0L, 1L)))
  }

  test("ngramJaccardPairs finds word-level near-dups") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((2L, 3L)))
  }

  test("connectedComponents labels transitive clusters with the min id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 1L)
    assert(labels(10L) == 10L && labels(11L) == 10L)
  }

  test("connectedComponents converges on a 60-link chain within default maxIter (pointer doubling)") {
    // One-hop-per-round propagation would need 60 iterations; the
    // label-chasing round is O(log diameter), so the default budget of 20
    // covers it with a wide margin. Base id offset checks min-id labeling
    // isn't accidentally 0-based.
    val chain = (100L until 160L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(chain)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 61)
    assert(got.values.forall(_ == 100L), s"chain not fully merged")
  }

  test("connectedComponents fails loudly when the iteration budget is too small") {
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("connectedComponents survives deep iteration: 14-node chain, bounded plan depth") {
    // A chain propagates the min label one hop per round, so 13 edges
    // force >= 8 full iterations — the naive loop would stack 13 joins of
    // lineage and re-execute round 1 thirteen times; the checkpointed
    // loop's final plan stays one round deep.
    val chain = (0L until 13L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(chain, maxIter = 20)
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got.size == 14)
    assert(got.values.forall(_ == 0L), s"chain not fully merged: $got")
    // lineage is truncated: the returned plan reads a materialized round,
    // not a 13-round join tower
    val planDepth = {
      def depth(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
        if (p.children.isEmpty) 1 else 1 + p.children.map(depth).max
      depth(labels.queryExecution.optimizedPlan)
    }
    assert(planDepth <= 5, s"plan depth $planDepth — lineage not truncated")
  }

  test("keepBestPerCluster keeps the top-score doc per cluster, singletons survive") {
    import org.apache.spark.sql.functions.col
    // clusters: {1,2,3} labeled 1, {7,8} labeled 7; 5 is a singleton
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 30L), (5L, 1L), (7L, 5L), (8L, 4L))
      .toDF("doc_id", "score")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("id", "label")
    val out = Dedup.keepBestPerCluster(docs, clusters, "doc_id", col("score"))
      .orderBy("doc_id")
      .select("doc_id", "cluster_label").as[(Long, Long)].collect().toSeq
    // cluster 1: 2 and 3 tie on score 30 → smaller id 2 wins; cluster 7:
    // higher score 7 wins; singleton 5 survives as its own label
    assert(out === Seq((2L, 1L), (5L, 5L), (7L, 7L)))
  }

  test("dedup is idempotent: f(f(x)) == f(x)") {
    val once = Dedup.minhashDedup(corpus, "doc_id", "text", threshold = 0.6)
    val twice = Dedup.minhashDedup(once, "doc_id", "text", threshold = 0.6)
    assert(once.count() == twice.count())
  }
}
