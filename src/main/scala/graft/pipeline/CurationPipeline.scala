package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Layout, TextAnalysis}
import graft.zones.Zones

/** End-to-end LLM training-data curation: the proven single-purpose
  * operators chained into one driver (VERDICT r7 #8) —
  *
  *   quality/language gate → exact (fingerprint) dedup → MinHash-LSH
  *   near-dup dedup → benchmark decontamination → temperature mixture
  *   rebalance → greedy sequence packing → z-ordered curated sink
  *
  * Every stage materializes to `outRoot/<stage>` through the curated
  * writer and its row count rides the stage's OWN write via
  * `Dataset.observe` ([[Observe.countedAction]] — zero extra passes),
  * which is also the production shape for a multi-day 100 TB curation
  * run: stage outputs are restart points, and the audit trail is the
  * per-stage row ledger a data-governance review asks for first.
  * Each stage is one of the independently-oracled operators (q29/q19/
  * q27/q61/q103/q75/q99 families), so this driver adds composition, not
  * new correctness surface — CurationPipelineSpec gates the composition
  * on a pinned corpus.
  */
object CurationPipeline {

  final case class StageAudit(stage: String, rows: Long)
  final case class Result(audits: Seq[StageAudit], outPath: String) {
    def rowsOf(stage: String): Long =
      audits.find(_.stage == stage).map(_.rows)
        .getOrElse(throw new NoSuchElementException(stage))
  }

  /** @param docs       input corpus carrying `idCol`, `textCol`, `srcCol`
    * @param benchmark  eval set to decontaminate against (`textCol`)
    * @param outRoot    stage outputs land at `outRoot/<stage>`
    * @param minQuality stage-1 quality cut ([[TextAnalysis.qualityScore]])
    * @param keepLangs  stage-1 language allowlist ([[TextAnalysis.languageId]])
    * @param nearDupThreshold MinHash-LSH Jaccard cut (stage 3)
    * @param nearDupHotCap stage-3 hot-band occupancy cap (star
    *                   candidates above it — the boilerplate-skew
    *                   escape hatch; a no-op below the cap, which a
    *                   post-exact-dedup corpus usually is, but exactly
    *                   the guard a templated web corpus needs)
    * @param mixtureScale temperature-mixture sqrt scale (stage 5):
    *                   per-source target = floor(scale * sqrt(n))
    * @param packCapacity token capacity per packed sequence (stage 6)
    * @param spanDecontamL when > 0, stage 4 uses EXACT-SPAN
    *                   decontamination ([[graft.operators.SuffixDedup
    *                   .spanDecontaminate]], the Lee et al. rule): any
    *                   doc carrying a verbatim ≥ L-token benchmark
    *                   window drops — the exact-form upgrade of the
    *                   default n-gram-overlap gate (no hash identity,
    *                   no fixed-gram blind spots)
    * @param qualityLabels when provided — (`idCol`, `label` ∈ {0, 1})
    *                   human keep/drop labels on a corpus sample —
    *                   stage 1b calibrates the raw quality score with
    *                   [[Curation.isotonicCalibrate]] (PAVA) and gates
    *                   on CALIBRATED P(keep) ≥ `minCalProb` instead of
    *                   trusting the raw score's scale: a score band the
    *                   labels mark bad drops even when its raw value
    *                   clears `minQuality` (the q213 lane's production
    *                   use — VERDICT r11 #8)
    * @param minCalProb stage-1b calibrated-probability cut
    * @param docEmbeddings when provided with `benchmarkEmbeddings` —
    *                   (`idCol`, `embedding`) per corpus doc — stage 4b
    *                   drops docs whose embedding sits within
    *                   `embDecontamThreshold` cosine of ANY benchmark
    *                   embedding ([[graft.operators.Similarity
    *                   .embeddingDecontaminate]]): the paraphrase-leak
    *                   gate the exact-text stages cannot see (VERDICT
    *                   r11 #3)
    * @param benchmarkEmbeddings (`embEvalIdCol`, `embVecCol`) per
    *                   benchmark item — benchmark-sized by contract
    *                   (broadcast)
    * @param embDecontamThreshold stage-4b cosine cut
    * @param embDecontamDim stage-4b embedding dimensionality; 0 (the
    *                   default) derives it from the first doc-embedding
    *                   row, and [[graft.operators.Similarity
    *                   .embeddingDecontaminate]] raises in-plan on any
    *                   vector of a different length — a mis-sized
    *                   embedding column fails loudly instead of banding
    *                   against wrong-width hyperplanes (ADVICE r12)
    * @param embVecCol  embedding column name in BOTH embedding inputs
    * @param embEvalIdCol id column name in `benchmarkEmbeddings`
    * @param lmRefSource when provided, stage 1c runs the CCNet
    *                   piece-LM quality gate ([[graft.operators
    *                   .Unigram.ccnetBuckets]] — q221's production
    *                   use): the unigram-LM vocabulary fits on THIS
    *                   source's slice, Stupid Backoff over its piece
    *                   bigrams scores every doc, and only docs in
    *                   per-source bucket ≤ `lmMaxBucket` survive —
    *                   the LM member of the quality stage, catching
    *                   fluent-looking word salad the surface stats
    *                   pass (VERDICT r12 #1)
    * @param lmBuckets  stage-1c per-source bucket count
    * @param lmMaxBucket stage-1c keep cut (CCNet: head + middle) */
  def run(spark: SparkSession, docs: DataFrame, benchmark: DataFrame,
          outRoot: String, idCol: String = "doc_id",
          textCol: String = "text", srcCol: String = "source",
          minQuality: Double = 0.2, keepLangs: Seq[String] = Seq("en"),
          nearDupThreshold: Double = 0.8, nearDupHotCap: Int = 1024,
          exactNearDup: Boolean = false,
          mixtureScale: Double = 8.0,
          packCapacity: Long = 512L, salt: String = "curation",
          spanDecontamL: Int = 0,
          qualityLabels: Option[DataFrame] = None,
          minCalProb: Double = 0.5,
          docEmbeddings: Option[DataFrame] = None,
          benchmarkEmbeddings: Option[DataFrame] = None,
          embDecontamThreshold: Double = 0.95,
          embDecontamDim: Int = 0,
          embVecCol: String = "embedding",
          embEvalIdCol: String = "eval_id",
          lmRefSource: Option[String] = None,
          lmBuckets: Int = 3,
          lmMaxBucket: Int = 2): Result = {
    val audits = scala.collection.mutable.ArrayBuffer.empty[StageAudit]
    def stage(name: String, df: DataFrame,
              sortCols: Seq[String] = Seq(idCol)): DataFrame = {
      val path = s"$outRoot/$name"
      val n = Observe.countedAction(spark, df, name)(d =>
        Zones.writeCurated(d, path, partitionCols = Seq.empty,
          sortCols = sortCols, maxRecordsPerFile = 10000000L,
          cluster = false))
      audits += StageAudit(name, n)
      spark.read.parquet(path)
    }

    // 1. quality/language gate — one codegen pass over text (TextStats),
    // quality carried forward for the z-ordered layout at the end
    val gated = stage("s1_quality", docs
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("lang_pred", TextAnalysis.languageId(col(textCol)))
      .filter(col("quality") >= minQuality &&
        col("lang_pred").isin(keepLangs: _*)))

    // 1b. OPTIONAL isotonic-calibrated quality gate: fit PAVA on the
    // labeled sample's (scaled score, label) census, apply the
    // non-decreasing step function to every doc (largest fitted score
    // ≤ the doc's — the calibration table is census-bounded, so the
    // range probe broadcasts), and gate on calibrated P(keep). Docs
    // scoring below the smallest fitted score clamp to its calibrated
    // value (the step function's left edge).
    val calibrated = qualityLabels match {
      case None => gated
      case Some(labels) =>
        val sCol = (col("quality") * 1000).cast("long")
        val labeled = gated
          .join(labels.select(col(idCol), col("label")), Seq(idCol))
          .select(sCol.as("s"), col("label").cast("long").as("y"))
        // loud, not silent: an empty labeled sample (no label ids
        // survive stage 1) would calibrate NOTHING and the null-prob
        // filter below would drop the whole corpus
        require(!labeled.isEmpty,
          "qualityLabels: no labeled doc survives the raw quality gate")
        val cal = Curation.isotonicCalibrate(labeled, "s", "y")
          .select(col("s").as("cs"), col("cal"))
        val floorCal = broadcast(cal.agg(
          min_by(col("cal"), col("cs")).as("floor_cal")))
        val perDoc = gated.select(col(idCol), sCol.as("s"))
          .join(broadcast(cal), col("cs") <= col("s"), "left")
          .groupBy(col(idCol))
          .agg(max_by(col("cal"), col("cs")).as("cal_prob"))
          .crossJoin(floorCal)
          .select(col(idCol),
            coalesce(col("cal_prob"), col("floor_cal")).as("cal_prob"))
        stage("s1b_calibrated", gated.join(perDoc, Seq(idCol))
          .filter(col("cal_prob") >= minCalProb))
    }

    // 1c. OPTIONAL CCNet piece-LM quality gate (Wenzek et al. 2020 —
    // the LM member of the quality stage, q221's production use): fit
    // the unigram-LM vocabulary on the designated clean reference
    // source, score every surviving doc's piece bigrams under Stupid
    // Backoff trained on the reference's piece stream, bucket PER
    // SOURCE at fixed percentile cuts, and keep bucket <= lmMaxBucket
    // (CCNet keeps head+middle, drops the tail). This catches what the
    // surface stats cannot: word salad built from clean-looking tokens
    // passes length/punctuation/stopword ratios but its piece
    // transitions fall to the backoff floor. Docs with fewer than two
    // pieces are unscorable and drop (nothing to defend them — the
    // strictest action, the stage-4 convention).
    val lmGated = lmRefSource match {
      case None => calibrated
      case Some(ref) =>
        val r4 = (c: org.apache.spark.sql.Column) =>
          floor(c * 10000 + lit(0.5)) / 10000
        val keep = graft.operators.Unigram.ccnetBuckets(calibrated, idCol,
            textCol, srcCol, ref, r4, buckets = lmBuckets)
          .filter(col("bucket") <= lmMaxBucket)
          .select(col("doc_id").as(idCol))
        stage("s1c_lm_gated",
          calibrated.join(keep, Seq(idCol), "left_semi"))
    }

    // 2. exact dedup on the normalized-text fingerprint (map-side
    // aggregate winners, smallest id survives)
    val exact = stage("s2_exact_dedup",
      Dedup.byFingerprint(lmGated, idCol, textCol))

    // 3. near-dup dedup: MinHash-LSH banding by default (id-only
    // candidate joins, hot-band capped); `exactNearDup` swaps in the
    // lossless prefix-filter join (same drop rule, provably complete
    // pair discovery) when recall guarantees matter more than the
    // extra candidate volume
    val near = stage("s3_near_dedup",
      if (exactNearDup)
        graft.operators.SimilarityJoin.prefixFilterDedup(exact, idCol, textCol,
          threshold = nearDupThreshold)
      else
        Dedup.minhashDedup(exact, idCol, textCol,
          threshold = nearDupThreshold, hotCap = nearDupHotCap))

    // 4. benchmark decontamination: broadcast gram semi-join by
    // default; `spanDecontamL` swaps in the exact-span rule (drop any
    // doc with contam_tokens > 0 — eval text must not leak, so the
    // action is the strictest one)
    val clean = stage("s4_decontaminated",
      if (spanDecontamL > 0) {
        // benchmark rows carry no id — synthesize a collision-free one
        // (row_number over the deterministic text ordering; the
        // benchmark set is bounded, so the global window is too; eval
        // ids never reach the output)
        val evalDocs = benchmark.select(col(textCol)).distinct()
          .withColumn(idCol, row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy(col(textCol)))
            .cast("long"))
        val contaminated = graft.operators.SuffixDedup
          .spanDecontaminate(near, evalDocs, idCol, textCol, spanDecontamL)
          .filter(col("contam_tokens") > 0)
          .select(col("doc_id").as(idCol))
        near.join(contaminated, Seq(idCol), "left_anti")
      } else Curation.decontaminate(near, benchmark, idCol, textCol))

    // 4b. OPTIONAL embedding-space decontamination: the paraphrase-leak
    // gate — an eval item reworded past token-window equality still
    // sits next to its source in embedding space, so docs within the
    // cosine threshold of any benchmark embedding drop (strictest
    // action, same as the text stages; eval must not leak)
    val embClean = (docEmbeddings, benchmarkEmbeddings) match {
      case (Some(de), Some(be)) =>
        // dim = 0 derives from the data (one head over the embedding
        // table — a metadata-sized probe next to the stage's own scan);
        // the operator then asserts EVERY vector matches it in-plan
        val dim =
          if (embDecontamDim > 0) embDecontamDim
          else {
            val h = de.select(size(col(embVecCol))).head(1)
            require(h.nonEmpty, "docEmbeddings is empty: pass " +
              "embDecontamDim explicitly or omit the stage")
            h(0).getInt(0)
          }
        val contaminated = graft.operators.Similarity
          .embeddingDecontaminate(
            de.join(clean.select(col(idCol)), Seq(idCol), "left_semi"),
            idCol, embVecCol, be, embEvalIdCol, embVecCol,
            threshold = embDecontamThreshold, dim = dim)
          .select(col("doc_id").as(idCol))
        stage("s4b_emb_decontaminated",
          clean.join(contaminated, Seq(idCol), "left_anti"))
      case _ => clean
    }

    // 5. temperature mixture: per-source sqrt targets, hash-ordered
    // admission (deterministic, engine-replayable)
    val mixed = stage("s5_mixture",
      Curation.temperatureMixture(embClean, srcCol, idCol,
        scale = mixtureScale, salt = salt))

    // 6. greedy sequence packing: shard-parallel, content-hash order;
    // packing METADATA joins back onto the docs so the final table
    // carries both payload and (shard, seq_id, tok_start)
    val packed = stage("s6_packed", mixed.join(
      Curation.packSequences(mixed, idCol, textCol,
        capacity = packCapacity, salt = salt),
      Seq(idCol)))

    // 7. curated z-ordered sink: interleave (n_tok, scaled quality) so
    // scans pruning on either token-length or quality ranges skip files
    val path = s"$outRoot/s7_curated"
    val zkeyed = Layout.withZOrderKey(
      packed.withColumn("q1000", (col("quality") * 1000).cast("long")),
      Seq("n_tok", "q1000"), bits = 8)
    val n = Observe.countedAction(spark, zkeyed, "s7_curated")(d =>
      Zones.writeCurated(d, path, partitionCols = Seq.empty,
        sortCols = Seq("__z"), maxRecordsPerFile = 10000000L,
        cluster = false))
    audits += StageAudit("s7_curated", n)
    Result(audits.toSeq, path)
  }
}
