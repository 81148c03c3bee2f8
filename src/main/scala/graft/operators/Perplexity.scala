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
  * one partial-agg'd groupBy. Bucketing here uses ntile over the global
  * (score, id) order for exact replay; at corpus scale the production
  * path is the q72 recipe — approx-percentile cut scores broadcast to a
  * map-side bucket assignment — with identical semantics up to sketch
  * error, leaving no global window anywhere.
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

  /** CCNet head/middle/tail split: ntile(`buckets`) over the
    * (roundedPpl, doc_id) order — the caller passes the rounding so
    * bucket boundaries sit on the same values the cross-engine gate
    * compares. Returns (doc_id, n_tokens, ppl, bucket) with bucket 1 =
    * lowest perplexity (head). */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
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
}
