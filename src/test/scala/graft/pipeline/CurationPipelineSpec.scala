package graft.pipeline

import graft.SparkSpec
import java.nio.file.Files

/** [[CurationPipeline]] — composition gate over a pinned corpus where
  * every stage has exactly one planted victim, so the audit ledger is
  * fully predictable and a regression in any stage shifts a specific
  * count. The operators themselves are oracled individually (q29/q19/
  * q27/q61/q103/q75/q99 families); this spec gates the CHAIN.
  */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val a1 =
    "the quick brown fox jumps over the lazy dog and the cat sits on the warm mat in the sun"
  private val a2 =
    "distributed query engines shuffle and partition the data while the optimizer prunes every scan"
  private val a3 =
    "a library of operators for training data curation should compose without new correctness surface"
  private val a4 =
    "the stream drains into the landing zone and the batch job conforms it to the analytical schema"
  private val b1 =
    "sketches and samples keep the working set bounded while the estimates stay within tolerance"

  private def corpus = Seq(
    (1L, a1, "a"),
    (2L, a2, "a"),
    (3L, a3, "a"),
    (4L, a4, "a"),
    (10L, b1, "b"),
    (20L, "???? !!!! .... %%%% @@@@", "a"),            // s1 victim: junk
    (21L, "  THE quick   Brown fox JUMPS over the lazy dog and the cat sits on the warm mat in the sun ", "a"), // s2 victim: case/ws variant of 1
    (22L, a2 + " indeed", "a"),                         // s3 victim: near-dup of 2
    (23L, "this answer leaks the capital of france question verbatim", "a"), // s4 victim
  ).toDF("doc_id", "text", "source")

  private def benchmark =
    Seq("what is the capital of france paris").toDF("text")

  test("every stage removes exactly its planted victim; audits ride the writes") {
    val root = Files.createTempDirectory("graft-curation").toString
    val res = CurationPipeline.run(spark, corpus, benchmark, root,
      mixtureScale = 1.0, packCapacity = 30L)

    assert(res.rowsOf("s1_quality") == 8, res.audits)        // junk 20 out
    assert(res.rowsOf("s2_exact_dedup") == 7, res.audits)    // 21 collapsed into 1
    assert(res.rowsOf("s3_near_dedup") == 6, res.audits)     // 22 collapsed into 2
    assert(res.rowsOf("s4_decontaminated") == 5, res.audits) // 23 leaked a gram
    // temperature targets at scale 1.0: floor(sqrt(4))=2 of source a,
    // floor(sqrt(1))=1 of source b
    assert(res.rowsOf("s5_mixture") == 3, res.audits)
    assert(res.rowsOf("s6_packed") == 3, res.audits)
    assert(res.rowsOf("s7_curated") == 3, res.audits)

    // the right docs survived the dedup/contamination stages
    val s4 = spark.read.parquet(s"$root/s4_decontaminated")
      .select("doc_id").as[Long].collect().toSet
    assert(s4 == Set(1L, 2L, 3L, 4L, 10L), s"got $s4")
    // mixture keeps per-source counts, not specific hash-ordered ids
    val s5 = spark.read.parquet(s"$root/s5_mixture")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(s5 == Map("a" -> 2L, "b" -> 1L), s"got $s5")

    // the audit ledger matches what actually landed on disk (the observe
    // metric rode the write, so a divergence means the count measured a
    // different execution)
    for (sa <- res.audits) {
      val stagePath =
        if (sa.stage == "s7_curated") res.outPath else s"$root/${sa.stage}"
      assert(spark.read.parquet(stagePath).count() == sa.rows,
        s"${sa.stage}: ledger ${sa.rows} vs disk")
    }

    // final table carries payload + packing metadata + the z-key
    val cols = spark.read.parquet(res.outPath).columns.toSet
    for (c <- Seq("doc_id", "text", "source", "shard", "seq_id",
        "tok_start", "n_tok", "__z"))
      assert(cols.contains(c), s"missing $c in $cols")
    // packing respected capacity: no sequence exceeds 30 tokens
    import org.apache.spark.sql.functions.{sum, count, lit}
    val overfull = spark.read.parquet(res.outPath)
      .groupBy($"shard", $"seq_id")
      .agg(sum($"n_tok").as("tok"), count(lit(1)).as("n"))
      // a single doc longer than capacity legitimately overflows alone
      .filter($"tok" > 30 && $"n" > 1)
      .count()
    assert(overfull == 0, "a packed sequence exceeds capacity")
  }

  test("exactNearDup mode removes the same planted victim through the lossless join") {
    val root = Files.createTempDirectory("graft-cur-exact").toString
    val res = CurationPipeline.run(spark, corpus, benchmark, root,
      mixtureScale = 1.0, packCapacity = 30L, exactNearDup = true)
    // identical stage ledger: on this corpus the LSH bands already
    // caught the full exact pair set, so the lossless path must agree
    assert(res.rowsOf("s3_near_dedup") == 6, res.audits)
    val s3 = spark.read.parquet(s"$root/s3_near_dedup")
      .select("doc_id").as[Long].collect().toSet
    assert(!s3.contains(22L), "the near-dup victim must be dropped")
    assert(s3.contains(2L), "the smaller-id member survives")
  }

  test("spanDecontamL mode drops exactly the verbatim-span victim the " +
      "gram gate would also have to catch, and keeps paraphrases") {
    val evalText = "which planet of the solar system has the largest " +
      "volume and mass according to the survey"
    // victim 30 embeds a verbatim 16-token eval window mid-document;
    // doc 31 paraphrases (shares vocabulary, no 8-token run)
    val corpus2 = Seq(
      (1L, a1, "a"),
      (2L, a2, "a"),
      (3L, a3, "a"),
      (30L, "students often ask " + evalText + " during class", "a"),
      (31L, "the largest planet by mass in our solar system is a gas " +
        "giant according to every survey", "a"),
    ).toDF("doc_id", "text", "source")
    val root = Files.createTempDirectory("graft-cur-span").toString
    val res = CurationPipeline.run(spark, corpus2,
      Seq(evalText).toDF("text"), root,
      mixtureScale = 8.0, packCapacity = 30L, spanDecontamL = 8)
    assert(res.rowsOf("s3_near_dedup") == 5, res.audits)
    assert(res.rowsOf("s4_decontaminated") == 4, res.audits)
    val s4 = spark.read.parquet(s"$root/s4_decontaminated")
      .select("doc_id").as[Long].collect().toSet
    assert(s4 == Set(1L, 2L, 3L, 31L), s"got $s4")
  }

  test("qualityLabels mode drops exactly the miscalibrated-score victim: " +
      "raw quality clears the cut, calibrated P(keep) does not") {
    import org.apache.spark.sql.functions.col
    // victim 50: under-50-chars text — the length component drops its
    // raw score to 0.79, above minQuality=0.1 but strictly BELOW every
    // legit doc's 1.0, so the labeled sample (victim = 0, everything
    // else = 1) calibrates its score band to P(keep) = 0 while every
    // other band pools to 1
    val victimText = "the cat sat on the mat today and then it slept"
    val corpus3 = Seq(
      (1L, a1, "a"), (2L, a2, "a"), (3L, a3, "a"), (4L, a4, "a"),
      (50L, victimText, "a"),
    ).toDF("doc_id", "text", "source")
    // precondition the construction relies on: victim's raw quality is
    // the strict minimum yet clears the raw gate
    val q = corpus3
      .withColumn("q", graft.operators.TextAnalysis.qualityScore(col("text")))
      .select($"doc_id", $"q").as[(Long, Double)].collect().toMap
    assert(q(50L) >= 0.1, s"victim must clear the raw gate: ${q(50L)}")
    for ((id, v) <- q if id != 50L)
      assert(v > q(50L), s"victim must score strictly lowest ($id: $v)")
    val labels = Seq((1L, 1), (2L, 1), (3L, 1), (4L, 1), (50L, 0))
      .toDF("doc_id", "label")
    val root = Files.createTempDirectory("graft-cur-cal").toString
    val res = CurationPipeline.run(spark, corpus3, benchmark, root,
      minQuality = 0.1, mixtureScale = 8.0, packCapacity = 30L,
      qualityLabels = Some(labels), minCalProb = 0.5)
    assert(res.rowsOf("s1_quality") == 5, res.audits)   // raw gate keeps all
    assert(res.rowsOf("s1b_calibrated") == 4, res.audits) // calibration drops 50
    val s1b = spark.read.parquet(s"$root/s1b_calibrated")
      .select("doc_id").as[Long].collect().toSet
    assert(s1b == Set(1L, 2L, 3L, 4L), s"got $s1b")
  }

  test("embedding decontamination drops exactly the paraphrase-leak " +
      "victim the exact-text stages keep") {
    // victim 60 PARAPHRASES the eval item (shared vocabulary, no long
    // verbatim run — the span stage keeps it), but its embedding is the
    // q107 IEEE-exact perturbation of the benchmark's (cos ~ 1-1e-7)
    val evalText = "which planet of the solar system has the largest " +
      "volume and mass according to the survey"
    val corpus4 = Seq(
      (1L, a1, "a"), (2L, a2, "a"), (3L, a3, "a"),
      (60L, "the largest planet by mass in our solar system is a gas " +
        "giant according to every survey", "a"),
    ).toDF("doc_id", "text", "source")
    def basis(i: Int, eps: Float): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(i) = 1.0f; a(0) = a(0) + eps; a
    }
    val benchEmb = Seq((100L, basis(7, 0.0f))).toDF("eval_id", "embedding")
    val docEmb = Seq(
      (1L, basis(1, 0.0f)), (2L, basis(2, 0.0f)), (3L, basis(3, 0.0f)),
      (60L, basis(7, 0.001f)), // the planted semantic leak
    ).toDF("doc_id", "embedding")
    val root = Files.createTempDirectory("graft-cur-emb").toString
    val res = CurationPipeline.run(spark, corpus4,
      Seq(evalText).toDF("text"), root,
      mixtureScale = 8.0, packCapacity = 30L, spanDecontamL = 8,
      docEmbeddings = Some(docEmb), benchmarkEmbeddings = Some(benchEmb),
      embDecontamThreshold = 0.999)
    // the span stage keeps the paraphrase; the embedding stage drops it
    assert(res.rowsOf("s4_decontaminated") == 4, res.audits)
    assert(res.rowsOf("s4b_emb_decontaminated") == 3, res.audits)
    val s4b = spark.read.parquet(s"$root/s4b_emb_decontaminated")
      .select("doc_id").as[Long].collect().toSet
    assert(s4b == Set(1L, 2L, 3L), s"got $s4b")
  }

  test("lmRefSource mode drops exactly the fluent-LOOKING word salad " +
      "the surface gate passes: its piece bigrams fall to the backoff " +
      "floor under the reference-fitted vocabulary") {
    import graft.operators.TextAnalysis
    // stopwords and clean punctuation — surface stats look fine — but
    // the content words never occur in the reference, so every piece
    // transition scores the Stupid-Backoff floor
    val salad = "the xqzj vwkp the gllm znrb the pqvd wmtt near okra"
    val corpusLm = Seq(
      (101L, a1, "r"), (102L, a2, "r"), (103L, a3, "r"),
      (104L, a4, "r"), (105L, b1, "r"), // the clean reference slice
      (1L, a1, "a"), (2L, a2, "a"), (3L, a3, "a"), (4L, a4, "a"),
      (30L, salad, "a")
    ).toDF("doc_id", "text", "source")
    val vq = corpusLm.filter($"doc_id" === 30L)
      .select(TextAnalysis.qualityScore($"text")).as[Double].head()
    val langs = corpusLm.select(TextAnalysis.languageId($"text"))
      .as[String].collect().distinct.toSeq
    val root = Files.createTempDirectory("graft-cur-lm").toString
    val res = CurationPipeline.run(spark, corpusLm, benchmark, root,
      minQuality = math.min(vq, 0.0), keepLangs = langs,
      mixtureScale = 8.0, packCapacity = 30L,
      lmRefSource = Some("r"))
    // the surface gate keeps everything — the salad included
    assert(res.rowsOf("s1_quality") == 10, res.audits.toString)
    val s1c = spark.read.parquet(s"$root/s1c_lm_gated")
      .select("doc_id").as[Long].collect().toSet
    assert(!s1c.contains(30L), "word salad survived the LM gate")
    assert(Set(1L, 2L, 3L, 4L).subsetOf(s1c),
      s"fluent siblings dropped: $s1c")
    // per-source thirds: source a loses exactly the salad; the
    // reference pool loses only its own tail doc (CCNet keeps
    // head+middle per pool)
    assert(s1c.size == 8, s"unexpected stage-1c ledger: $s1c")
  }

  test("pipeline is deterministic: two runs produce identical curated tables") {
    val r1 = Files.createTempDirectory("graft-cur1").toString
    val r2 = Files.createTempDirectory("graft-cur2").toString
    val res1 = CurationPipeline.run(spark, corpus, benchmark, r1,
      mixtureScale = 1.0, packCapacity = 30L)
    val res2 = CurationPipeline.run(spark, corpus, benchmark, r2,
      mixtureScale = 1.0, packCapacity = 30L)
    val t1 = spark.read.parquet(res1.outPath)
    val t2 = spark.read.parquet(res2.outPath)
    assert(t1.exceptAll(t2).isEmpty && t2.exceptAll(t1).isEmpty)
    assert(res1.audits == res2.audits)
  }
}
