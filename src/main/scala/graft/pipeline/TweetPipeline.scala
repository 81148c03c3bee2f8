package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Sentiment, TextFunctions}

/** The reference's core pipeline (SURVEY.md §3.2: landing → staging →
  * analytical), re-expressed as pure `DataFrame => DataFrame` stages
  * composed by a thin driver. Stage order mirrors
  * staging-transform.py:227-256; each stage is a narrow transformation
  * except dedup (one shuffle) and the final aggregate.
  */
object TweetPipeline {

  /** C1: clean raw text into `text_clean`. */
  def clean(textCol: String)(df: DataFrame): DataFrame =
    df.withColumn("text_clean", TextFunctions.cleanTweet(col(textCol)))

  /** C3: sentiment struct → flat polarity/subjectivity columns. */
  def scoreSentiment(df: DataFrame): DataFrame = {
    val s = Sentiment.sentiment(col("text_clean"))
    df.withColumn("polarity", s.getField("polarity"))
      .withColumn("subjectivity", s.getField("subjectivity"))
  }

  /** C5/C6 + F6: split cleaned text and explode to one row per tag,
    * dropping empties (the reference's replace(''→nan)+dropna). */
  def explodeTags(df: DataFrame): DataFrame =
    df.withColumn("tag",
        explode(TextFunctions.tokens(lower(col("text_clean")))))
      .filter(col("tag") =!= "")

  /** C7/C8: surrogate primary key over the identifying columns. Uses the
    * U+0001-delimited key so boundary-ambiguous id/tag pairs (doc_id 12 +
    * tag "3x" vs doc_id 1 + tag "23x") can't collapse into one hash —
    * dedup here must be exactly DISTINCT (doc_id, tag), which is what the
    * q31 oracle asserts. (EtlJob keeps the reference's undelimited C8
    * key for parity.) */
  def surrogate(idCols: Seq[String])(df: DataFrame): DataFrame =
    df.withColumn("hash_id",
      TextFunctions.surrogateKeyDelimited(idCols.map(c => col(c).cast("string")): _*))

  /** A3: idempotent dedup on the surrogate key (re-runs of the lookback
    * window insert no duplicates — the reference's late-data strategy,
    * staging-transform.py:108,:248). */
  def dedup(df: DataFrame): DataFrame = df.dropDuplicates("hash_id")

  /** A4: flagship top-K tag popularity + sentiment aggregate — the query
    * the reference's dashboard computes downstream (README.md:51-53).
    * Rounding uses floor(x*f+0.5)/f, not `round()`: the pure-IEEE formula
    * evaluates bit-identically in Spark and the DuckDB oracle (engine
    * `round` semantics differ on doubles — see SparkEntry.rn). */
  def topTags(df: DataFrame, k: Int): DataFrame = {
    def r4(c: org.apache.spark.sql.Column) = floor(c * 10000.0 + 0.5) / 10000.0
    df.groupBy(col("tag"))
      .agg(
        count(lit(1)).as("n_mentions"),
        r4(avg(col("polarity"))).as("avg_polarity"),
        r4(avg(col("subjectivity"))).as("avg_subjectivity"))
      .orderBy(col("n_mentions").desc, col("tag"))
      .limit(k)
  }

  /** End-to-end flagship on the `documents` table (tweet stand-in,
    * FIXTURES.md): clean → sentiment → explode → key → dedup → top-K. */
  def flagship(spark: SparkSession, dir: String, k: Int = 100): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val staged = (clean("text") _ andThen scoreSentiment andThen explodeTags)(docs)
    val keyed = surrogate(Seq("doc_id", "tag"))(staged)
    topTags(dedup(keyed), k)
  }
}
