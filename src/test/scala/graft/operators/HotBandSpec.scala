package graft.operators

import graft.{ProbeCorpus, SparkSpec}
import org.apache.spark.sql.functions._

/** The hot-band skew escape hatch (VERDICT r7 #1): candidate generation
  * through a band value is linear in its corpus occupancy, so boilerplate
  * corpora (large clusters of templated near-identical docs) make the
  * banded probe cost track the corpus. [[Dedup.hotBands]] caps each hot
  * band value to a bounded representative set; these tests pin
  *  (a) the no-op contract: an empty hot table (cap above occupancy)
  *      reproduces the uncapped pair set byte-for-byte — the property
  *      that keeps q104/q108 hash-green on the gated corpora;
  *  (b) the binding contract: on a planted boilerplate corpus the cap
  *      bounds candidate volume while preserving DEDUP decisions (the
  *      match-exists semantics the incremental workflow consumes);
  *  (c) the embedding-modality analog through the shared machinery.
  */
class HotBandSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_hot_$tag").toString

  /** Build the standing tables for a doc corpus, returning
    * (bandTable, sigs, hot) with the given cap/reps. */
  private def standing(corpus: org.apache.spark.sql.DataFrame,
                       dir: String, cap: Int, reps: Int) = {
    Dedup.minhashSignatures(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/sigs")
    val sigs = spark.read.parquet(s"$dir/sigs")
    Dedup.writeBandTable(sigs, s"$dir/band")
    val bandTable = spark.read.parquet(s"$dir/band")
    Dedup.hotBands(bandTable, cap = cap, reps = reps)
      .write.mode("overwrite").parquet(s"$dir/hot")
    (bandTable, sigs, spark.read.parquet(s"$dir/hot"))
  }

  test("empty hot table (cap above occupancy) reproduces the uncapped pair set exactly") {
    val all = ProbeCorpus.boilerplateCorpus(spark, 400L, hotPerMille = 250)
    val batch = all.filter(pmod($"doc_id", lit(10)) < 2)
    val corpus = all.filter(pmod($"doc_id", lit(10)) >= 2)
    val dir = tmp("noop")
    val (bandTable, sigs, hot) = standing(corpus, dir, cap = 1000000, reps = 4)
    assert(hot.count() == 0, "cap above any occupancy must yield an empty hot table")
    val capped = Dedup.incrementalDupPairsBanded(batch, "doc_id", "text",
      bandTable, sigs, hot = Some(hot))
    val uncapped = Dedup.incrementalDupPairsBanded(batch, "doc_id", "text",
      bandTable, sigs)
    assert(capped.exceptAll(uncapped).isEmpty && uncapped.exceptAll(capped).isEmpty,
      "empty hot table changed the pair set")
  }

  test("binding cap bounds candidate volume and preserves dedup decisions on a boilerplate corpus") {
    // 250‰ hot: 100 of 400 docs share the template -> corpus-side hot
    // cluster of ~80 docs piles into the same band values
    val all = ProbeCorpus.boilerplateCorpus(spark, 400L, hotPerMille = 250)
    val batch = all.filter(pmod($"doc_id", lit(10)) < 2)
    val corpus = all.filter(pmod($"doc_id", lit(10)) >= 2)
    val dir = tmp("bind")
    val cap = 8
    val reps = 4
    val (bandTable, sigs, hot) = standing(corpus, dir, cap, reps)
    assert(hot.count() > 0, "planted boilerplate cluster must produce hot bands")
    // every hot row: freq really exceeds the cap, reps bounded and sorted
    val bad = hot.filter($"freq" <= cap || size($"reps") > reps).count()
    assert(bad == 0, "hot rows must have freq > cap and at most `reps` representatives")

    val capped = Dedup.incrementalDupPairsBanded(batch, "doc_id", "text",
      bandTable, sigs, hot = Some(hot))
    val uncapped = Dedup.incrementalDupPairsBanded(batch, "doc_id", "text",
      bandTable, sigs)
    val cappedN = capped.count()
    val uncappedN = uncapped.count()
    assert(cappedN < uncappedN,
      s"cap never bound: capped=$cappedN uncapped=$uncappedN")
    // per-doc partner bound: each of the 16 bands contributes at most its
    // own `reps` representatives (rep sets differ slightly across band
    // values, so the union is larger than `reps` but bounded by bands*reps
    // — vs the unbounded hot-bucket occupancy on the uncapped path)
    val maxPartners = capped.groupBy($"id_new").count()
      .agg(max($"count")).as[Long].head()
    val uncappedMax = uncapped.groupBy($"id_new").count()
      .agg(max($"count")).as[Long].head()
    assert(maxPartners <= 16L * reps,
      s"a batch doc kept $maxPartners partners, expected <= ${16 * reps}")
    assert(maxPartners < uncappedMax,
      s"cap did not reduce the per-doc partner count ($maxPartners vs $uncappedMax)")
    // the decisions the dedup workflow consumes are unchanged: the same
    // batch docs have at least one verified corpus match
    val cappedMatched = capped.select($"id_new").distinct().as[Long].collect().toSet
    val uncappedMatched = uncapped.select($"id_new").distinct().as[Long].collect().toSet
    assert(cappedMatched == uncappedMatched,
      "capping changed which batch docs match the corpus")
    val keptCapped = Dedup.incrementalDedupBanded(batch, "doc_id", "text",
      bandTable, sigs, hot = Some(hot)).select($"doc_id").as[Long].collect().toSet
    val keptUncapped = Dedup.incrementalDedupBanded(batch, "doc_id", "text",
      bandTable, sigs).select($"doc_id").as[Long].collect().toSet
    assert(keptCapped == keptUncapped, "capping changed the survivor set")
  }

  test("embedding analog: binding cap preserves dedup decisions through the shared hot machinery") {
    val all = ProbeCorpus.boilerplateEmbeddings(spark, 400L, dim = 16,
      hotPerMille = 250)
    val batch = all.filter(pmod($"vec_id", lit(10)) < 2)
    val corpus = all.filter(pmod($"vec_id", lit(10)) >= 2)
    val dir = tmp("emb")
    Similarity.writeEmbBandTable(corpus, "vec_id", "embedding", s"$dir/band",
      bands = 4, bitsPerBand = 8, dim = 16)
    val bandTable = spark.read.parquet(s"$dir/band")
    val hot = Dedup.hotBands(bandTable, cap = 8, reps = 4)
    assert(hot.count() > 0, "near-identical vector cluster must produce hot bands")
    val capped = Similarity.incrementalEmbNearDups(batch, "vec_id", "embedding",
      bandTable, corpus, threshold = 0.999, bands = 4, bitsPerBand = 8,
      dim = 16, hot = Some(hot))
    val uncapped = Similarity.incrementalEmbNearDups(batch, "vec_id", "embedding",
      bandTable, corpus, threshold = 0.999, bands = 4, bitsPerBand = 8, dim = 16)
    assert(capped.count() < uncapped.count(), "cap never bound on the embedding corpus")
    val cappedMatched = capped.select($"id_new").distinct().as[Long].collect().toSet
    val uncappedMatched = uncapped.select($"id_new").distinct().as[Long].collect().toSet
    assert(cappedMatched == uncappedMatched,
      "capping changed which batch vectors match the corpus")
  }

  test("self-join hotCap: no-op below occupancy, bounded star above it, survivor set preserved") {
    val corpus = ProbeCorpus.boilerplateCorpus(spark, 300L, hotPerMille = 300)
    // cap far above any occupancy: candidate/pair sets byte-identical
    val uncapped = Dedup.minhashDupPairs(corpus, "doc_id", "text")
    val noop = Dedup.minhashDupPairs(corpus, "doc_id", "text", hotCap = 1000000)
    assert(noop.exceptAll(uncapped).isEmpty && uncapped.exceptAll(noop).isEmpty,
      "hotCap above occupancy changed the pair set")
    // binding cap: pair volume bounded, dedup survivors unchanged (the
    // band minimum is always a representative, and hot-band members are
    // near-identical, so every member still meets the pair that kills it)
    val capped = Dedup.minhashDupPairs(corpus, "doc_id", "text", hotCap = 8)
    assert(capped.count() < uncapped.count(),
      "binding hotCap did not reduce pair volume")
    val keptCapped = Dedup.minhashDedup(corpus, "doc_id", "text", hotCap = 8)
      .select($"doc_id").as[Long].collect().toSet
    val keptUncapped = Dedup.minhashDedup(corpus, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(keptCapped == keptUncapped,
      s"capped survivors $keptCapped != uncapped $keptUncapped")
    // clustering survives the star: same connected components
    val cc = Dedup.connectedComponents(
      capped.select($"id_a", $"id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val ccU = Dedup.connectedComponents(
      uncapped.select($"id_a", $"id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cc == ccU, "star candidates changed the cluster labels")
  }

  test("self-join hotCap: embedding modality no-op and survivor preservation") {
    val corpus = ProbeCorpus.boilerplateEmbeddings(spark, 300L, dim = 16,
      hotPerMille = 300)
    val uncapped = Similarity.embeddingNearDupPairs(corpus, "vec_id",
      "embedding", threshold = 0.999, bands = 4, bitsPerBand = 8, dim = 16)
    val capped = Similarity.embeddingNearDupPairs(corpus, "vec_id",
      "embedding", threshold = 0.999, bands = 4, bitsPerBand = 8, dim = 16,
      hotCap = 8)
    assert(capped.count() < uncapped.count(), "cap never bound")
    val keptCapped = Similarity.embeddingNearDupDedup(corpus, "vec_id",
        "embedding", threshold = 0.999, bands = 4, bitsPerBand = 8, dim = 16,
        hotCap = 8)
      .select($"vec_id").as[Long].collect().toSet
    val keptUncapped = Similarity.embeddingNearDupDedup(corpus, "vec_id",
        "embedding", threshold = 0.999, bands = 4, bitsPerBand = 8, dim = 16)
      .select($"vec_id").as[Long].collect().toSet
    assert(keptCapped == keptUncapped,
      s"capped survivors differ: $keptCapped vs $keptUncapped")
  }

  test("capped probe plan keeps the corpus un-shuffled (broadcast probes only)") {
    val all = ProbeCorpus.boilerplateCorpus(spark, 400L, hotPerMille = 250)
    val batch = all.filter(pmod($"doc_id", lit(10)) < 2)
    val corpus = all.filter(pmod($"doc_id", lit(10)) >= 2)
    val dir = tmp("plan")
    val (bandTable, sigs, hot) = standing(corpus, dir, cap = 8, reps = 4)
    val df = Dedup.incrementalDupPairsBanded(batch, "doc_id", "text",
      bandTable, sigs, hot = Some(hot))
    df.collect()
    val plan = df.queryExecution.executedPlan
    // no sort-merge join anywhere: every corpus-side join is a broadcast
    // probe with the corpus as the streamed side
    val smj = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smj.isEmpty, s"capped probe planned a sort-merge join:\n$plan")
    // exchanges never carry shingle arrays — pair ids only
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    for (e <- shuffles)
      assert(!e.output.exists(_.dataType.typeName.startsWith("array")),
        s"exchange ships an array column: ${e.output}")
  }
}
