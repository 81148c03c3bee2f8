package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def scores(docs: Seq[(Long, String)], q: Seq[(Long, String)],
                     k1: Double = 1.2, b: Double = 0.75): Map[(Long, Long), Double] =
    Retrieval.bm25Scores(docs.toDF("doc_id", "text"), "doc_id", "text",
        q.toDF("query_id", "term"), k1, b)
      .as[(Long, Long, Double)].collect()
      .map { case (qi, di, s) => (qi, di) -> s }.toMap

  /** Serial BM25 with the same formula, token spec, and constant
    * folding ((k1+1), (1−b) precomputed as doubles). */
  private def serial(docs: Seq[(Long, String)], terms: Seq[String],
                     k1: Double, b: Double): Map[Long, Double] = {
    val toked = docs.map { case (id, tx) =>
      id -> tx.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val n = toked.size.toDouble
    val avgdl = toked.map(_._2.size).sum.toDouble / n
    val dfm = terms.map(t => t -> toked.count(_._2.contains(t))).toMap
    toked.flatMap { case (id, tk) =>
      val dl = tk.size
      val s = terms.filter(tk.contains).map { t =>
        val tf = tk.count(_ == t).toDouble
        val idf = math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
        idf * (tf * (k1 + 1.0)) /
          (tf + k1 * ((1.0 - b) + b * dl / avgdl))
      }.sum
      if (terms.exists(tk.contains)) Some(id -> s) else None
    }.toMap
  }

  test("bm25Scores matches the serial reference to float tolerance") {
    val docs = Seq(
      1L -> "apple banana cherry apple date",
      2L -> "banana banana cherry fig grape honey",
      3L -> "apple kiwi lemon mango nectarine orange peach quince",
      4L -> "cherry cherry cherry")
    val terms = Seq("apple", "cherry")
    val got = scores(docs, terms.map(0L -> _))
    val want = serial(docs, terms, 1.2, 0.75)
    assert(got.keySet == want.keySet.map(0L -> _))
    for ((k, v) <- want)
      assert(math.abs(got((0L, k)) - v) < 1e-9, s"doc $k: ${got((0L, k))} vs $v")
  }

  test("term frequency raises the score; saturation keeps it bounded") {
    val docs = Seq(
      1L -> "topic filler filler filler filler",
      2L -> "topic topic filler filler filler",
      3L -> "topic topic topic topic filler")
    val s = scores(docs, Seq(0L -> "topic"))
    assert(s((0L, 1L)) < s((0L, 2L)) && s((0L, 2L)) < s((0L, 3L)))
    // saturation: the tf 1→2 gain exceeds the 2→4 per-occurrence gain
    assert(s((0L, 2L)) - s((0L, 1L)) >
      (s((0L, 3L)) - s((0L, 2L))) / 2)
  }

  test("rarer terms weigh more (IDF) and shorter docs win at equal tf (dl norm)") {
    val docs = Seq(
      1L -> "rare common pad1 pad2",
      2L -> "common pad3 pad4 pad5",
      3L -> "common pad6 pad7 pad8",
      4L -> "common pad9 padA padB")
    val s = scores(docs, Seq(0L -> "rare", 1L -> "common"))
    assert(s((0L, 1L)) > s((1L, 1L)), "df=1 term must outweigh df=4 term")
    val docs2 = Seq(1L -> "hit a b c", 2L -> "hit a b c d e f g")
    val s2 = scores(docs2, Seq(0L -> "hit"))
    assert(s2((0L, 1L)) > s2((0L, 2L)), "shorter doc must score higher")
    // b = 0 disables length normalization → equal scores
    val s3 = scores(docs2, Seq(0L -> "hit"), b = 0.0)
    assert(math.abs(s3((0L, 1L)) - s3((0L, 2L))) < 1e-12)
  }

  test("bm25TopK ranks by (score desc, doc_id) and cuts at k") {
    val docs = Seq(
      1L -> "x x x y",
      2L -> "x x y y",
      3L -> "x y y y",
      4L -> "y y y y")
    val got = Retrieval.bm25TopK(docs.toDF("doc_id", "text"),
        "doc_id", "text", Seq(9L -> "x").toDF("query_id", "term"), topK = 2)
      .select(col("doc_id"), col("rank"))
      .as[(Long, Int)].collect().toSet
    assert(got == Set((1L, 1), (2L, 2)))
  }

  test("rrfFuse: consensus across lists outranks a single better rank") {
    // doc 5: rank 3 in BOTH lists → 2/(60+3); doc 9: rank 1 in one list
    // only → 1/61. 2/63 > 1/61, so consensus wins — the RRF property.
    val l1 = Seq((0L, 5L, 3L), (0L, 9L, 1L), (0L, 7L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val l2 = Seq((0L, 5L, 3L), (0L, 8L, 1L), (0L, 7L, 50L))
      .toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(l1, l2), kConst = 60, topK = 10)
      .select("doc_id", "rrf", "n_lists", "rank")
      .as[(Long, Double, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(5L)._3 == 1, s"consensus doc must rank first: $got")
    assert(got(5L)._2 == 2)
    assert(math.abs(got(5L)._1 - 2.0 / 63.0) < 1e-15)
    // doc 7's two middling ranks (1/62 + 1/110) still beat either
    // single rank-1 (1/61) — consensus again
    assert(got(7L)._3 == 2)
    assert(math.abs(got(7L)._1 - (1.0 / 62 + 1.0 / 110)) < 1e-15)
    assert(got(8L)._3 == 3 && got(9L)._3 == 4,
      "equal single-list scores (both 1/61) tie-break by doc_id")
  }

  test("rrfFuse cuts at topK per query independently") {
    val l = (for (q <- Seq(0L, 1L); r <- 1L to 8L)
      yield (q, 100L + r, r)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(l), kConst = 60, topK = 3)
      .select("query_id", "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 101L), (0L, 102L), (0L, 103L),
      (1L, 101L), (1L, 102L), (1L, 103L)))
  }

  test("scores are invariant to input partitioning") {
    val rnd = new scala.util.Random(3)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = (1L to 30L).map { i =>
      i -> Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val q = Seq(0L -> "a", 0L -> "b", 1L -> "c")
    def go(parts: Int) =
      Retrieval.bm25Scores(docs.toDF("doc_id", "text").repartition(parts),
          "doc_id", "text", q.toDF("query_id", "term"))
        .select(col("query_id"), col("doc_id"),
          (floor(col("score") * 1e10 + 0.5)).as("s"))
        .as[(Long, Long, Long)].collect().toSet
    assert(go(1) == go(7) && go(1).nonEmpty)
  }

  // ---- MaxSim late interaction (q152) ----

  test("maxSimTopK: hand-computed two-doc example") {
    // doc 1 tokens: (1,0), (0,1); doc 2 tokens: (2,0), (0,3)
    // query 9 tokens: (1,1), (2,0)
    // score(9, 1) = max(1,1) + max(2,0) = 1 + 2 = 3
    // score(9, 2) = max(2,3) + max(4,0) = 3 + 4 = 7
    val corpus = Seq(
      (1L, 0, Seq(1, 0)), (1L, 1, Seq(0, 1)),
      (2L, 0, Seq(2, 0)), (2L, 1, Seq(0, 3)),
    ).toDF("doc_id", "token_idx", "q")
    val queries = Seq(
      (9L, 0, Seq(1, 1)), (9L, 1, Seq(2, 0)),
    ).toDF("query_id", "token_idx", "q")
    val got = Retrieval.maxSimTopK(corpus, queries, topK = 2)
      .select("query_id", "doc_id", "maxsim", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got == Set((9L, 2L, 7L, 1), (9L, 1L, 3L, 2)))
  }

  test("maxSimTopK agrees with a brute-force serial MaxSim on pinned random bags") {
    val rnd = new scala.util.Random(7)
    def vec(): Seq[Int] = Seq.fill(8)(rnd.nextInt(255) - 127)
    val corpus = for (d <- 0L until 12L; t <- 0 until 3) yield (d, t, vec())
    val queries = for (q <- Seq(100L, 101L); t <- 0 until 2) yield (q, t, vec())
    val got = Retrieval.maxSimTopK(
        corpus.toDF("doc_id", "token_idx", "q"),
        queries.toDF("query_id", "token_idx", "q"), topK = 4)
      .select("query_id", "doc_id", "maxsim", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    def dot(a: Seq[Int], b: Seq[Int]): Long =
      a.zip(b).map { case (x, y) => x.toLong * y }.sum
    val expected = (for (q <- Seq(100L, 101L)) yield {
      val qtoks = queries.filter(_._1 == q).map(_._3)
      val scores = (0L until 12L).map { d =>
        val dtoks = corpus.filter(_._1 == d).map(_._3)
        d -> qtoks.map(qt => dtoks.map(dt => dot(qt, dt)).max).sum
      }.sortBy { case (d, s) => (-s, d) }.take(4)
      scores.zipWithIndex.map { case ((d, s), i) => (q, d, s, i + 1) }
    }).flatten.toSet
    assert(got == expected)
  }

  test("maxSimTopK excludes the query's own doc id from the ranking") {
    val corpus = Seq((1L, 0, Seq(5, 5)), (2L, 0, Seq(1, 1)))
      .toDF("doc_id", "token_idx", "q")
    val queries = Seq((1L, 0, Seq(5, 5))).toDF("query_id", "token_idx", "q")
    val got = Retrieval.maxSimTopK(corpus, queries, topK = 5)
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(2L))
  }

  // ---- rankingQuality (q207) ---------------------------------------

  test("rankingQuality: hand-computed recall/MRR/nDCG, zero-score for " +
      "a fully-missed query, perfect scores for a perfect ranking") {
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 20L), (2L, 21L), (2L, 22L),
      (3L, 30L), (3L, 31L), (3L, 32L)).toDF("query_id", "neighbor_id")
    val ranking = Seq(
      (1L, 10L, 1), (1L, 99L, 2), (1L, 12L, 3),  // 2 hits at ranks 1, 3
      (2L, 98L, 1), (2L, 97L, 2), (2L, 96L, 3),  // total miss
      (3L, 30L, 1), (3L, 31L, 2), (3L, 32L, 3))  // perfect
      .toDF("query_id", "neighbor_id", "rank")
    val got = Retrieval.rankingQuality(truth, ranking, k = 3)
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val w = (1 to 3).map(Retrieval.dcgWeight)
    val idcg = w.sum.toDouble
    assert(got(1L) == (2.0 / 3.0, 1.0, (w(0) + w(2)) / idcg))
    assert(got(2L) == (0.0, 0.0, 0.0))
    assert(got(3L) == (1.0, 1.0, 1.0))
  }

  test("rankingQuality evaluates the NN-Descent tier: clustered vectors " +
      "score near-perfect recall against brute force") {
    def e(i: Int, eps: Float): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(i) = 1.0f; a((i + 1) % 64) = eps; a
    }
    val df = (0 until 12).flatMap { c =>
      (0 until 6).map(j => ((c * 10 + j).toLong, e(c * 5, 0.02f * j)))
    }.toDF("vec_id", "embedding")
    val truth = Similarity.bruteForceTopK(df, df, "vec_id", "embedding",
      k = 5)
    val ann = Similarity.nnDescentKnn(df, "vec_id", "embedding",
      k = 5, cells = 4, rounds = 4)
    val m = Retrieval.rankingQuality(truth, ann, k = 5)
      .as[(Long, Double, Double, Double)].collect()
    assert(m.length == 72)
    val meanRecall = m.map(_._2).sum / m.length
    assert(meanRecall >= 0.9, s"mean recall@5 $meanRecall")
    assert(m.forall(r => r._3 >= 0.0 && r._3 <= 1.0 &&
      r._4 >= 0.0 && r._4 <= 1.0))
  }
}
