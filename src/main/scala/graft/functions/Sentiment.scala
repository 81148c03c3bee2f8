package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Lexicon-based text sentiment (SURVEY.md C3; reference behavior at
  * staging-transform.py:184-187 — TextBlob PatternAnalyzer producing
  * (polarity, subjectivity)).
  *
  * Exact float parity with TextBlob is neither attainable nor required
  * (SURVEY.md §7.4): this is our own deterministic, documented lexicon
  * with the same contract — polarity ∈ [-1, 1], subjectivity ∈ [0, 1],
  * returned as a single struct<polarity:double, subjectivity:double>
  * (skipping the reference's "p s" string round-trip at
  * staging-transform.py:234-237).
  *
  * Implementation note: the lexicon is inlined as Catalyst map literals
  * and the scoring is `transform`/`aggregate` higher-order functions, so
  * the whole thing is native expressions — no UDF, no JVM⇄interpreter
  * boundary, stays inside whole-stage codegen, and broadcasts with the
  * plan (the map literal is part of the serialized expression tree —
  * fine at this lexicon size; a 100k-word lexicon would move to a
  * broadcast join against a lexicon table instead).
  */
object Sentiment {

  /** word -> (polarity, subjectivity). Small, deterministic, documented. */
  val lexicon: Map[String, (Double, Double)] = Map(
    "good" -> (0.7, 0.6), "great" -> (0.8, 0.75), "excellent" -> (1.0, 1.0),
    "awesome" -> (1.0, 1.0), "amazing" -> (0.9, 0.85), "love" -> (0.5, 0.6),
    "best" -> (1.0, 0.3), "happy" -> (0.8, 1.0), "nice" -> (0.6, 1.0),
    "wonderful" -> (1.0, 1.0), "fantastic" -> (0.9, 0.9), "win" -> (0.8, 0.4),
    "fast" -> (0.2, 0.6), "beautiful" -> (0.85, 1.0), "perfect" -> (1.0, 1.0),
    "fun" -> (0.3, 0.2), "cool" -> (0.35, 0.65), "like" -> (0.2, 0.3),
    "better" -> (0.5, 0.5), "super" -> (0.3, 0.95), "easy" -> (0.43, 0.83),
    "bad" -> (-0.7, 0.67), "terrible" -> (-1.0, 1.0), "awful" -> (-1.0, 1.0),
    "horrible" -> (-1.0, 1.0), "hate" -> (-0.8, 0.9), "worst" -> (-1.0, 0.3),
    "sad" -> (-0.5, 1.0), "angry" -> (-0.5, 1.0), "slow" -> (-0.3, 0.4),
    "broken" -> (-0.4, 0.7), "fail" -> (-0.7, 0.5), "wrong" -> (-0.5, 0.5),
    "poor" -> (-0.4, 0.6), "ugly" -> (-0.7, 1.0), "boring" -> (-1.0, 1.0),
    "lose" -> (-0.4, 0.4), "hard" -> (-0.29, 0.54), "problem" -> (-0.3, 0.4),
    "error" -> (-0.4, 0.4), "small" -> (-0.25, 0.4), "big" -> (0.0, 0.1),
  )

  private def mapLit(m: Map[String, Double]): Column =
    if (m.isEmpty) map()
    else map(m.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  private lazy val polarityMap: Column = mapLit(lexicon.map { case (k, v) => k -> v._1 })
  private lazy val subjectivityMap: Column = mapLit(lexicon.map { case (k, v) => k -> v._2 })

  /** Mean score of lexicon-matched tokens; 0.0 when nothing matches
    * (TextBlob's neutral default). */
  private def meanScore(matched: Column, scores: Column): Column = {
    val n = size(matched)
    when(n === 0, lit(0.0)).otherwise(
      aggregate(matched, lit(0.0), (acc, t) => acc + element_at(scores, t)) / n)
  }

  /** struct<polarity double, subjectivity double> for a text column.
    * Backed by the native codegen [[graft.expressions.SentimentScore]];
    * [[sentimentDeclarative]] is the built-ins-only reference
    * implementation the equivalence test pins it against. */
  def sentiment(text: Column): Column =
    graft.expressions.SentimentScore(text)

  /** Reference implementation in pure built-in higher-order functions. */
  def sentimentDeclarative(text: Column): Column = {
    val toks = TextFunctions.tokens(lower(text))
    val matched = filter(toks, t => map_contains_key(polarityMap, t))
    struct(
      meanScore(matched, polarityMap).as("polarity"),
      meanScore(matched, subjectivityMap).as("subjectivity"))
  }

  def polarity(text: Column): Column = sentiment(text).getField("polarity")
  def subjectivity(text: Column): Column = sentiment(text).getField("subjectivity")
}
