package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Language-model perplexity filtering, CCNet-style (Wenzek et al.
  * 2020): score every document by its perplexity under a language model
  * trained on a CLEAN REFERENCE corpus, then split the pool into
  * head / middle / tail quality buckets — the standard web-corpus
  * curation step between rule-based quality heuristics and expensive
  * classifier filtering. CCNet uses a 5-gram KenLM; the distributed
  * re-expression here is an add-one-smoothed UNIGRAM model, which keeps
  * the whole pipeline — training included — two aggregates and one
  * join, and makes every score replayable in an ANSI oracle (the n-gram
  * generalization reuses [[SpanDedup.gramOccurrences]] but needs
  * backoff weights that have no closed replay).
  *
  * Model: p(w) = (c_ref(w) + 1) / (T + V + 1), where c_ref counts the
  * reference corpus, T = Σ c_ref, V = |ref vocab|, and the +1 bucket is
  * the shared OOV mass (an unseen w has c_ref = 0). Per-doc
  * cross-entropy H(d) = −(Σ_w∈d ln p(w)) / n_d over TOKEN OCCURRENCES
  * (tf-weighted); perplexity = e^{H}. Zero-token documents are dropped
  * (CCNet's behavior — there is nothing to score).
  *
  * 100 TB shape: training is ONE partial-agg'd token count over the
  * reference slice; scoring joins each document's (token, tf) rows to
  * the count table on token — the reference model is corpus-vocabulary
  * sized (shuffle join, NOT a broadcast; web-scale vocabs run 10^7+)
  * while T and V travel as a 1-row broadcast scalar; the per-doc sum is
  * one partial-agg'd groupBy. Bucketing splits at fixed percentile cut
  * scores (the paper's rule) broadcast to a map-side assignment — see
  * [[perplexityBuckets]]; no corpus row ever enters a global window.
  */
object Perplexity {

  private def toks(c: org.apache.spark.sql.Column) =
    TextFunctions.tokens(TextFunctions.normalizeWs(c))

  /** Per-document cross-entropy and perplexity under the add-one
    * unigram model of `ref`: (doc_id, n_tokens, xent, ppl). */
  def unigramPerplexity(docs: DataFrame, idCol: String, textCol: String,
                        ref: DataFrame, refTextCol: String): DataFrame = {
    val refCounts = ref
      .select(explode(toks(col(refTextCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
    val scalars = refCounts.agg(
      sum(col("c")).cast("double").as("t"),
      count(lit(1)).cast("double").as("v"))
    val docTf = docs
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    docTf
      .join(refCounts, Seq("token"), "left")
      .crossJoin(broadcast(scalars))
      .withColumn("lp",
        log((coalesce(col("c"), lit(0L)) + lit(1.0)) /
          (col("t") + col("v") + lit(1.0))))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        (-sum(col("tf") * col("lp")) / sum(col("tf"))).as("xent"))
      .withColumn("ppl", exp(col("xent")))
  }

  /** Stupid Backoff bigram scoring (Brants et al. 2007, "Large Language
    * Models in Machine Translation") — the context-sensitive member of
    * the LM-filter family, and the n-gram generalization the
    * [[unigramPerplexity]] scaladoc rules out for Katz/Kneser–Ney:
    * Stupid Backoff is the backoff scheme WITH a closed replay, because
    * its backoff weight is the fixed constant α = 0.4 = 2/5 and scores
    * are deliberately unnormalized (the paper's "S", not "p"):
    *
    *   S(w2 | w1) = c2(w1 w2) / c1(w1)               if c2 > 0
    *              = α · (c1(w2) + 1) / (T + V + 1)   otherwise
    *
    * — the backoff lands on the SAME add-one unigram floor
    * [[unigramPerplexity]] uses, so unseen continuations (including
    * OOV words) score the shared OOV mass times α. Per-document score
    * logsb = Σ ln S over adjacent token pairs (occurrence-weighted);
    * documents with fewer than two tokens have no pairs and drop —
    * there is nothing to score.
    *
    * 100 TB shape: training is two partial-agg'd count passes over the
    * reference slice (bigrams + unigrams); scoring joins the document
    * pair table to the bigram counts on (w1, w2) and to the unigram
    * counts on each side — the models are corpus-vocabulary sized
    * (shuffle joins, NOT broadcasts; a web-scale bigram table runs 10^9
    * rows), T and V travel as a 1-row broadcast scalar, and the per-doc
    * ln-sum partial-aggregates before its one doc-keyed exchange. The
    * per-pair lns differ across libms by ≤ 1 ulp and summation-order
    * jitter is absorbed by the caller's rounding (the q71/q134
    * convention). */
  /** Per-document adjacent-token bigram rows (doc_id, w1, w2) — the
    * map-side explode shared by [[stupidBackoffScore]] and
    * [[kneserNeyBigrams]]; doc boundaries never wrap. */
  private def bigramPairs(df: DataFrame, id: org.apache.spark.sql.Column,
                          text: String): DataFrame = {
    val withTk = df.select(id.as("doc_id"), toks(col(text)).as("__tk"))
      .filter(size(col("__tk")) >= 2)
    val cnt = size(col("__tk"))
    withTk.select(col("doc_id"),
        explode(zip_with(
          slice(col("__tk"), lit(1), cnt - 1),
          slice(col("__tk"), lit(2), cnt - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
  }

  def stupidBackoffScore(docs: DataFrame, idCol: String, textCol: String,
                         ref: DataFrame, refTextCol: String): DataFrame = {
    def pairsOf(df: DataFrame, id: org.apache.spark.sql.Column,
                text: String): DataFrame = bigramPairs(df, id, text)
    val refUni = ref
      .select(explode(toks(col(refTextCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c1"))
    val refBi = pairsOf(ref, lit(0L), refTextCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val scalars = refUni.agg(
      sum(col("c1")).cast("double").as("t"),
      count(lit(1)).cast("double").as("v"))
    val docPairs = pairsOf(docs, col(idCol), textCol)
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("pf"))
    docPairs
      .join(refBi, Seq("w1", "w2"), "left")
      .join(refUni.select(col("token").as("w1"), col("c1").as("c1w1")),
        Seq("w1"), "left")
      .join(refUni.select(col("token").as("w2"), col("c1").as("c1w2")),
        Seq("w2"), "left")
      .crossJoin(broadcast(scalars))
      .withColumn("lp",
        when(coalesce(col("c2"), lit(0L)) > 0L,
          log(col("c2").cast("double") / col("c1w1")))
        .otherwise(
          log(lit(0.4) * (coalesce(col("c1w2"), lit(0L)) + lit(1.0)) /
            (col("t") + col("v") + lit(1.0)))))
      .groupBy(col("doc_id"))
      .agg(sum(col("pf")).as("n_pairs"),
        sum(col("pf") * col("lp")).as("logsb"))
  }

  /** CCNet head/middle/tail split by FIXED PERCENTILE CUT SCORES — the
    * paper's actual rule (Wenzek et al. 2020 §4.4 cut the pool at fixed
    * perplexity percentiles), and the form that scales: no row of the
    * scored corpus ever enters a global window.
    *
    * Cut points are exact `percentile_disc` order statistics of the
    * rounded score: for b in 1..k−1, cut_b = the smallest ppl whose
    * cumulative count reaches ⌈b·N/k⌉. A document lands in bucket
    * 1 + |{b : ppl > cut_b}| — every tie at a cut value goes to the
    * LOWER (better) bucket, so bucket sizes deviate from N/k exactly by
    * the tied mass (on an all-distinct score column this reproduces
    * ntile's split; see [[perplexityBucketsExact]] for rank-exact
    * splits). The caller passes the rounding so cut points sit on the
    * same values the cross-engine gate compares, and the whole rule —
    * histogram, cumulative counts, ⌈b·N/k⌉ via the integer cross-product
    * `cum·k ≥ b·N`, strict-greater assignment — replays exactly in ANSI
    * SQL.
    *
    * 100 TB shape: the only window runs over the DISTINCT rounded-score
    * histogram (cardinality bounded by the rounding granularity, e.g.
    * ~10^6 at 4 decimals over a bounded ppl range — the vocabCoverage
    * precedent), the k−1 cut rows collapse to a one-row broadcast array,
    * and bucket assignment is a map-side array scan over the scored
    * corpus. Returns (doc_id, n_tokens, ppl, bucket), bucket 1 = lowest
    * perplexity (head). */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        ref: DataFrame, refTextCol: String, buckets: Int,
                        round: org.apache.spark.sql.Column =>
                          org.apache.spark.sql.Column): DataFrame = {
    require(buckets >= 2 && buckets <= 100, s"buckets out of range: $buckets")
    val k = buckets.toLong
    val scored = unigramPerplexity(docs, idCol, textCol, ref, refTextCol)
      .withColumn("ppl", round(col("ppl")))
    val hist = scored.groupBy(col("ppl")).agg(count(lit(1)).as("cnt"))
    // distinct-value-sized cumulation (histogram rows, never corpus rows)
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("ppl"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val total = hist.agg(sum(col("cnt")).as("n"))
    // cum ≥ ⌈b·n/k⌉ ⟺ cum·k ≥ b·n on integers; N·k ≤ 100·N fits a long
    val cuts = cum.crossJoin(broadcast(total))
      .select(col("ppl"), col("cum"), col("n"),
        explode(sequence(lit(1L), lit(k - 1L))).as("b"))
      .filter(col("cum") * lit(k) >= col("b") * col("n"))
      .groupBy(col("b")).agg(min(col("ppl")).as("cut"))
    // k−1 cut values (duplicates preserved: a value spanning several
    // percentile ranks legitimately empties the buckets between them)
    val cutArr = cuts.agg(sort_array(collect_list(col("cut"))).as("cuts"))
    scored.crossJoin(broadcast(cutArr))
      .withColumn("bucket",
        (lit(1) + size(filter(col("cuts"), c => col("ppl") > c)))
          .cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("ppl"), col("bucket"))
  }

  /** Rank-exact head/middle/tail split: ntile(`buckets`) over the
    * (roundedPpl, doc_id) order. SMALL-SCALE ONLY — the unpartitioned
    * window sorts every scored document through one task; it exists for
    * callers who need ntile's exact equal-size split (ties broken by
    * doc_id) on pools that fit a single executor. Production corpora use
    * [[perplexityBuckets]]' percentile-cut form. */
  def perplexityBucketsExact(docs: DataFrame, idCol: String, textCol: String,
                             ref: DataFrame, refTextCol: String, buckets: Int,
                             round: org.apache.spark.sql.Column =>
                               org.apache.spark.sql.Column): DataFrame = {
    require(buckets >= 2 && buckets <= 100, s"buckets out of range: $buckets")
    val scored = unigramPerplexity(docs, idCol, textCol, ref, refTextCol)
      .withColumn("ppl", round(col("ppl")))
    val w = Window.orderBy(col("ppl"), col("doc_id"))
    scored
      .withColumn("bucket", ntile(buckets).over(w).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("ppl"), col("bucket"))
  }

  /** Interpolated Kneser–Ney bigram probabilities as EXACT integer
    * rationals — the classic LM smoothing (Kneser & Ney 1995; Chen &
    * Goodman 1999's interpolated form), next to [[stupidBackoffScore]]
    * the way q117's exact PageRank sits next to float formulations:
    * with the discount fixed at the standard d = 3/4, every
    * probability is the ratio of two integers, so the model replays
    * bit-for-bit in any engine (a float KN is order-sensitive):
    *
    *   P(w2|w1) = max(c12 − d, 0)/c1 + (d·N1p(w1)/c1)·N1c(w2)/B
    *            = [max(4·c12 − 3, 0)·B + 3·N1p(w1)·N1c(w2)]
    *              / (4·c1·B)                          (numer / denom)
    *
    * where c12 = bigram count, c1 = Σ_w2 c12 (w1's history count),
    * N1p(w1) = distinct continuations of w1, N1c(w2) = distinct
    * histories of w2 (the CONTINUATION count — KN's insight: "Francisco"
    * is frequent but follows only "San"), B = distinct bigram types.
    * The interpolation telescopes: Σ_{w2∈V} numer = denom exactly
    * (spec-gated unity law, an integer identity).
    *
    * Scale shape: one corpus pass to bigram counts (map-side explode +
    * one hash agg), then three bigram-table-sized aggregates (c1/N1p,
    * N1c, B) and a broadcast scalar; the report is
    * TakeOrderedAndProject on (c12 desc, w1, w2). Returns the top-K
    * bigrams: (w1, w2, c12, numer, denom).
    *
    * Caching contract (the klSourceDrift convention): the bigram-count
    * table is localCheckpointed — it feeds four aggregates and the
    * report — and its blocks free when the returned frame (which reads
    * them) is garbage-collected; a long-lived session issuing many
    * calls should consume each result promptly. */
  def kneserNeyBigrams(docs: DataFrame, idCol: String, textCol: String,
                       topK: Int): DataFrame = {
    require(topK >= 1, s"topK out of range: $topK")
    val bi = bigramPairs(docs, col(idCol), textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint() // read by four aggregates + the report
    val c1 = bi.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p"))
    val n1c = bi.groupBy(col("w2")).agg(count(lit(1)).as("n1c"))
    val bRow = broadcast(bi.agg(count(lit(1)).as("b")))
    bi.join(c1, Seq("w1"))
      .join(n1c, Seq("w2"))
      .crossJoin(bRow)
      .select(col("w1"), col("w2"), col("c12"),
        (greatest(col("c12") * 4 - 3, lit(0L)) * col("b")
          + col("n1p") * col("n1c") * 3).as("numer"),
        (col("c1") * 4 * col("b")).as("denom"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(topK)
  }
}
