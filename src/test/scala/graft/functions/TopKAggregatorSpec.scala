package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("topK keeps the k largest values per group, descending") {
    val df = Seq(
      ("a", 5.0), ("a", 1.0), ("a", 9.0), ("a", 7.0),
      ("b", 2.0), ("b", 3.0),
    ).toDF("g", "v")
    val topk = TopKAggregator.topK(3)
    val out = df.groupBy($"g").agg(topk($"v").as("t"))
      .as[(String, Seq[Double])].collect().toMap
    assert(out("a") == Seq(9.0, 7.0, 5.0))
    assert(out("b") == Seq(3.0, 2.0))
  }

  test("duplicate values are kept (multiset semantics)") {
    val df = Seq(("a", 4.0), ("a", 4.0), ("a", 1.0)).toDF("g", "v")
    val topk = TopKAggregator.topK(2)
    val out = df.groupBy($"g").agg(topk($"v").as("t"))
      .as[(String, Seq[Double])].collect().toMap
    assert(out("a") == Seq(4.0, 4.0))
  }

  test("GraftExtensions.register makes the native functions callable from SQL") {
    graft.GraftExtensions.register(spark)
    Seq(("near duplicate text content here", "near duplicate text content her"))
      .toDF("a", "b").createOrReplaceTempView("sqlfn_docs")
    val row = spark.sql(
      """SELECT simhash64(split(a, ' ')) AS sh,
        |  sorted_array_jaccard(hashed_char_shingles(a, 5),
        |                       hashed_char_shingles(b, 5)) AS j,
        |  minhash_signature(hashed_char_shingles(a, 5), 16) AS sig,
        |  repetition_stats(a).ttr AS ttr
        |FROM sqlfn_docs""".stripMargin).head()
    assert(row.getLong(0) != 0L)
    assert(row.getDouble(1) > 0.8 && row.getDouble(1) < 1.0)
    assert(row.getSeq[Long](2).length == 16)
    assert(row.getDouble(3) == 1.0) // 5 distinct tokens / 5 tokens

    val row2 = spark.sql(
      """SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos,
        |  sentiment_score('good great fine').polarity AS pol,
        |  text_stats('the quick brown fox is here for the test').lang_pred AS lang,
        |  word_ngram_strings('a b c d', 3) AS gs,
        |  size(word_ngram_hashes('a b c d', 3)) AS nh""".stripMargin).head()
    assert(row2.getDouble(0) == 1.0)
    assert(row2.getDouble(1) > 0.0)
    assert(row2.getString(2) == "en")
    assert(row2.getSeq[String](3) == Seq("a b c", "b c d"))
    assert(row2.getInt(4) == 2)

    // UDAF surface: the KMV sketch from pure SQL (3 distinct of 4 rows,
    // below capacity -> the sketch IS the sorted distinct hash set)
    val row3 = spark.sql(
      """SELECT kmv_sketch_256(h) AS mins FROM (
        |  SELECT CAST(conv(substring(sha2(CAST(v AS STRING), 256), 1, 12),
        |                   16, 10) AS BIGINT) AS h
        |  FROM VALUES (1), (2), (2), (3) AS t(v))""".stripMargin).head()
    val mins = row3.getSeq[Long](0)
    assert(mins.length == 3 && mins == mins.sorted)
  }
}
