package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PerplexitySpec extends SparkSpec {
  import spark.implicits._

  private def ppl(docs: Seq[(Long, String)], ref: Seq[String]): Map[Long, (Long, Double)] =
    Perplexity.unigramPerplexity(docs.toDF("doc_id", "text"),
        "doc_id", "text", ref.map(Tuple1(_)).toDF("text"), "text")
      .select("doc_id", "n_tokens", "ppl")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, p) => id -> ((n, p)) }.toMap

  /** Serial add-one unigram reference. */
  private def serial(doc: String, ref: Seq[String]): Double = {
    val rc = ref.flatMap(_.toLowerCase.trim.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size).toMap
    val t = rc.values.sum.toDouble
    val v = rc.size.toDouble
    val toks = doc.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    val h = -toks.map(w =>
      math.log((rc.getOrElse(w, 0) + 1.0) / (t + v + 1.0))).sum / toks.length
    math.exp(h)
  }

  test("unigramPerplexity matches the serial add-one model") {
    val ref = Seq("the cat sat on the mat", "the dog sat on the log")
    val docs = Seq(
      1L -> "the cat sat",
      2L -> "the dog ate my homework",
      3L -> "completely unseen vocabulary everywhere")
    val got = ppl(docs, ref)
    for ((id, tx) <- docs) {
      assert(math.abs(got(id)._2 - serial(tx, ref)) < 1e-9, s"doc $id")
      assert(got(id)._1 == tx.split("\\s+").length)
    }
  }

  test("in-model text scores lower perplexity than OOV text; all-OOV hits the ceiling") {
    val ref = Seq("alpha beta gamma alpha beta alpha")
    val got = ppl(Seq(
      1L -> "alpha alpha beta",
      2L -> "alpha zz beta",
      3L -> "xx yy zz"), ref)
    assert(got(1L)._2 < got(2L)._2 && got(2L)._2 < got(3L)._2, s"$got")
    // every token of doc 3 is OOV: p = 1/(T+V+1) each, so ppl = T+V+1
    // exactly (T = 6, V = 3 → 10)
    assert(math.abs(got(3L)._2 - 10.0) < 1e-9, s"${got(3L)}")
  }

  test("zero-token documents are dropped, not scored") {
    val got = ppl(Seq(1L -> "alpha beta", 2L -> "   "),
      Seq("alpha beta"))
    assert(got.keySet == Set(1L))
  }

  test("perplexityBuckets: bucket 1 is the head (lowest ppl); distinct scores split ntile-even") {
    val ref = Seq("a b c d e f a b c d")
    val docs = (1L to 9L).map { i =>
      // increasing OOV fraction with i → increasing perplexity
      val known = Seq.fill((9 - i).toInt)("a")
      val oov = Seq.fill(i.toInt)(s"oov$i")
      i -> (known ++ oov).mkString(" ")
    }
    val got = Perplexity.perplexityBuckets(docs.toDF("doc_id", "text"),
        "doc_id", "text", ref.map(Tuple1(_)).toDF("text"), "text",
        buckets = 3, c => c)
      .select("doc_id", "ppl", "bucket")
      .as[(Long, Double, Long)].collect()
    assert(got.groupBy(_._3).view.mapValues(_.length).toMap ==
      Map(1L -> 3, 2L -> 3, 3L -> 3))
    val byBucket = got.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket(1L).max <= byBucket(2L).min &&
      byBucket(2L).max <= byBucket(3L).min)
  }

  test("perplexityBuckets: ties at a cut score all land in the LOWER bucket") {
    val ref = Seq("a a a a")
    // 5 identical docs (one score, all ties) + 1 all-OOV doc: with k=3
    // both cuts land on the tied score, so the 5 share bucket 1 and the
    // outlier — strictly above BOTH cuts — lands in bucket 3 (bucket 2
    // is legitimately empty under the fixed-percentile rule)
    val docs = (1L to 5L).map(i => i -> "a a") :+ (6L -> "zz zz")
    val got = Perplexity.perplexityBuckets(docs.toDF("doc_id", "text"),
        "doc_id", "text", ref.map(Tuple1(_)).toDF("text"), "text",
        buckets = 3, c => c)
      .select("doc_id", "bucket").as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(got(_) == 1L), s"$got")
    assert(got(6L) == 3L, s"$got")
  }

  test("perplexityBuckets (cuts) ≡ perplexityBucketsExact (ntile) on all-distinct scores") {
    // fixed length 21, strictly increasing OOV fraction i/21 → strictly
    // distinct cross-entropies (xent = ((21−i)·ln p_a + i·ln p_oov)/21);
    // verify distinctness before comparing so the premise holds
    val docs = (1L to 20L).map { i =>
      i -> (Seq.fill((21 - i).toInt)("a") ++
        Seq.fill(i.toInt)(s"oov$i")).mkString(" ")
    }
    val ref = Seq(Tuple1("a b c d e a b c a b a"))
    def run(f: (org.apache.spark.sql.DataFrame, String, String,
                org.apache.spark.sql.DataFrame, String, Int,
                org.apache.spark.sql.Column => org.apache.spark.sql.Column)
              => org.apache.spark.sql.DataFrame) =
      f(docs.toDF("doc_id", "text"), "doc_id", "text",
        ref.toDF("text"), "text", 4, c => c)
        .select("doc_id", "ppl", "bucket")
        .as[(Long, Double, Long)].collect().sortBy(_._1)
    val cut = run(Perplexity.perplexityBuckets)
    assume(cut.map(_._2).distinct.length == cut.length)
    assert(cut.sameElements(run(Perplexity.perplexityBucketsExact)))
  }

  test("perplexityBucketsExact: ntile splits rank-even regardless of ties") {
    val ref = Seq("a a a a")
    val docs = (1L to 6L).map(i => i -> "a a")
    val got = Perplexity.perplexityBucketsExact(docs.toDF("doc_id", "text"),
        "doc_id", "text", ref.map(Tuple1(_)).toDF("text"), "text",
        buckets = 3, c => c)
      .select("doc_id", "bucket").as[(Long, Long)].collect()
    assert(got.groupBy(_._2).view.mapValues(_.length).toMap ==
      Map(1L -> 2, 2L -> 2, 3L -> 2))
  }

  test("scores are invariant to input partitioning") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "oov1", "oov2")
    val docs = (1L to 25L).map { i =>
      i -> Seq.fill(15)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val ref = Seq(Tuple1("a b c d e f g a b c"))
    def go(parts: Int) =
      Perplexity.unigramPerplexity(
          docs.toDF("doc_id", "text").repartition(parts),
          "doc_id", "text", ref.toDF("text"), "text")
        .select(col("doc_id"), floor(col("ppl") * 1e9 + 0.5).as("p"))
        .as[(Long, Long)].collect().toSet
    assert(go(1) == go(11) && go(1).nonEmpty)
  }

  // ---- Stupid Backoff (q167) ----

  private def sb(docs: Seq[(Long, String)], ref: Seq[String]) =
    Perplexity.stupidBackoffScore(docs.toDF("doc_id", "text"),
        "doc_id", "text", ref.map(Tuple1(_)).toDF("text"), "text")
      .select("doc_id", "n_pairs", "logsb")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("stupidBackoffScore matches hand-computed seen and backed-off pairs") {
    // ref "a b a c": c1 = {a:2, b:1, c:1}, T=4, V=3;
    // bigrams (a,b), (b,a), (a,c) each c2 = 1
    val got = sb(Seq(
      (1L, "a b x"),   // (a,b) seen: ln(1/2); (b,x) backoff: ln(0.4*1/8)
      (2L, "c c"),     // (c,c) backoff with seen w2: ln(0.4*(1+1)/8)
      (3L, "a"),       // one token: no pairs, drops
      (4L, "")),       // empty: drops
      Seq("a b a c"))
    assert(got.keySet === Set(1L, 2L))
    val (n1, l1) = got(1L)
    assert(n1 === 2L)
    assert(math.abs(l1 - (math.log(0.5) + math.log(0.4 / 8))) < 1e-12, s"$l1")
    val (n2, l2) = got(2L)
    assert(n2 === 1L)
    assert(math.abs(l2 - math.log(0.4 * 2 / 8)) < 1e-12, s"$l2")
  }

  test("stupidBackoffScore: in-domain word order outranks the shuffled bag") {
    val ref = Seq("the quick brown fox jumps over the lazy dog",
      "the quick brown fox runs")
    val got = sb(Seq(
      (1L, "the quick brown fox"),    // every bigram seen
      (2L, "fox brown quick the")),   // same bag, every bigram backed off
      ref)
    assert(got(1L)._1 === got(2L)._1) // same pair count
    assert(got(1L)._2 > got(2L)._2,
      s"seen order must outscore shuffled: $got")
  }

  test("stupidBackoffScore: repeated pairs weight by occurrence") {
    val got = sb(Seq((1L, "a b a b a b")), Seq("a b"))
    // pairs: (a,b)x3 seen ln(1/1)=0 wait c1(a)=1 -> ln(1/1)=0; (b,a)x2 backoff
    val (n, l) = got(1L)
    assert(n === 5L)
    val backoff = math.log(0.4 * (1 + 1) / (2 + 2 + 1.0)) // c1(a)=1 +1 / T=2,V=2
    assert(math.abs(l - (3 * 0.0 + 2 * backoff)) < 1e-12, s"$l vs ${2 * backoff}")
  }

  // ---- kneserNeyBigrams (q200) -------------------------------------

  test("kneserNeyBigrams: exact rationals match a serial reference; unity law holds") {
    val texts = Seq("a b a b c", "a b c d", "b a b a", "d c b a")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Perplexity.kneserNeyBigrams(docs, "doc_id", "text", 100)
      .as[(String, String, Long, Long, Long)].collect()
    // serial reference of every count and the d = 3/4 rational
    val bigrams = texts.flatMap { t => val w = t.split(" "); w.zip(w.tail) }
    val c12 = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1m = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1p = c12.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1c = c12.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val b = c12.size.toLong
    val want = c12.map { case ((w1, w2), c) =>
      (w1, w2) -> ((c, math.max(4 * c - 3, 0) * b + 3 * n1p(w1) * n1c(w2),
        4 * c1m(w1) * b))
    }
    assert(got.length == want.size)
    got.foreach { case (w1, w2, c, nu, de) =>
      assert(want((w1, w2)) == ((c, nu, de)), s"($w1, $w2)")
    }
    // report order: count desc, then (w1, w2)
    val order = got.map { case (w1, w2, c, _, _) => (-c, w1, w2) }
    assert(order.sameElements(order.sorted))
    // unity law (the interpolation telescopes): for every history w1,
    // Σ over the w2 vocabulary of numer — unseen bigrams contribute
    // their pure continuation mass — equals denom EXACTLY
    for (w1 <- c1m.keys) {
      // toSeq before map: mapping a SET would collapse equal terms
      val total = n1c.keys.toSeq.map { w2 =>
        val c = c12.getOrElse((w1, w2), 0L)
        math.max(4 * c - 3, 0) * b + 3 * n1p(w1) * n1c(w2)
      }.sum
      assert(total == 4 * c1m(w1) * b, s"unity for '$w1'")
    }
  }
}
