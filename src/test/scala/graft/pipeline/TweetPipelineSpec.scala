package graft.pipeline

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class TweetPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "Spark is great great for big data"),
    (2L, "bad bad day for the pipeline"),
    (3L, ""),
  ).toDF("doc_id", "text")

  test("explode conservation: one output row per non-empty token occurrence") {
    val staged = (TweetPipeline.clean("text") _ andThen
      TweetPipeline.scoreSentiment andThen TweetPipeline.explodeTags)(docs)
    val expected = docs.select(
      sum(TextFunctions.tokenCount(TextFunctions.cleanTweet(lower($"text")))))
      .head().getLong(0)
    assert(staged.count() == expected)
  }

  test("surrogate + dedup collapses repeated (doc, tag) occurrences") {
    val staged = (TweetPipeline.clean("text") _ andThen
      TweetPipeline.scoreSentiment andThen TweetPipeline.explodeTags)(docs)
    val keyed = TweetPipeline.surrogate(Seq("doc_id", "tag"))(staged)
    val deduped = TweetPipeline.dedup(keyed)
    // "great" appears twice in doc 1, "bad" twice in doc 2 -> 2 fewer rows
    assert(deduped.count() == keyed.count() - 2)
    // idempotent re-run (the reference's late-data re-scan guarantee)
    assert(TweetPipeline.dedup(deduped).count() == deduped.count())
  }

  test("topTags orders by mentions desc and bounds k") {
    val staged = (TweetPipeline.clean("text") _ andThen
      TweetPipeline.scoreSentiment andThen TweetPipeline.explodeTags)(docs)
    val keyed = TweetPipeline.surrogate(Seq("doc_id", "tag"))(staged)
    val top = TweetPipeline.topTags(TweetPipeline.dedup(keyed), 3).collect()
    assert(top.length <= 3)
    val counts = top.map(_.getLong(1))
    assert(counts.sameElements(counts.sorted.reverse))
  }

  test("flagship runs end-to-end on sf0.001 with rows > 0 (t1 contract)") {
    val out = TweetPipeline.flagship(spark, "/root/testdata/sf0.001", 20)
    assert(out.count() > 0)
    val cols = out.columns.toSeq
    assert(cols == Seq("tag", "n_mentions", "avg_polarity", "avg_subjectivity"))
  }
}
