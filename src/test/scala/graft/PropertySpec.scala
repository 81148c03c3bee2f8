package graft

import graft.functions.TextFunctions
import graft.operators.{Curation, Dedup, TextAnalysis}
import graft.pipeline.{EtlJob, TweetPipeline}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.4): dedup idempotence, explode
  * row-count conservation, surrogate-key determinism/injectivity-on-
  * inputs, re-run idempotence of the lookback pattern.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  /** Deterministic sampler: run `body` over `n` seeded samples of `gen`
    * (scalatestplus isn't on the offline classpath, so we drive
    * scalacheck generators directly). */
  private def forSamples[A](gen: Gen[A], n: Int = 20)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private val word = Gen.oneOf("spark", "data", "fast", "slow", "big", "x1", "Y2")
  private val text = Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val docsGen = Gen.chooseNum(1, 12).flatMap(n =>
    Gen.listOfN(n, text)).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  test("dedup idempotence: f(f(x)) == f(x) for exact dedup on any frame") {
    forSamples(docsGen) { docs =>
      val df = docs.toDF("id", "text")
      val once = Dedup.exact(df, Seq("text"))
      val twice = Dedup.exact(once, Seq("text"))
      assert(once.count() == twice.count())
      assert(once.count() == docs.map(_._2).distinct.size)
    }
  }

  test("explode conservation: output rows == total non-empty token count") {
    forSamples(docsGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val exploded = df.select(explode(TextFunctions.tokens(col("text"))))
      val expected = docs.map(_._2.split("\\s+").count(_.nonEmpty)).sum
      assert(exploded.count() == expected)
    }
  }

  test("surrogate key: equal inputs -> equal keys; different inputs -> different keys") {
    forSamples(Gen.listOfN(6, text)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "t")
      val keys = df.select(col("t"),
        TextFunctions.surrogateKey(col("t")).as("k"))
        .collect().map(r => r.getString(0) -> r.getString(1))
      val byInput = keys.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      // deterministic: one key per distinct input
      assert(byInput.values.forall(_.size == 1))
      // injective on these inputs: distinct inputs -> distinct keys
      assert(byInput.map(_._2.head).toSet.size == byInput.size)
    }
  }

  test("staging transform is idempotent under re-run (same input -> same rows)") {
    forSamples(docsGen) { docs =>
      if (docs.nonEmpty) {
        val landing = docs.map { case (i, t) =>
          (s"r$i", "2024-03-05 10:00:00", "2024-03-05 09:00:00", s"t$i", "u", 100, t, t)
        }.toDF("record_id", "timestamp", "created", "tweet_id", "user_name",
          "rt_count", "hashtags", "text")
        val a = EtlJob.stagingTransform(landing)
        val b = EtlJob.stagingTransform(landing)
        assert(a.count() == b.count())
        // dedup on hash_id makes union of two runs the same set
        assert(Dedup.exact(a.unionByName(b), Seq("hash_id")).count() == a.count())
      }
    }
  }

  test("minhash signature length and range invariants") {
    forSamples(Gen.listOfN(4, text)) { texts =>
      val df = texts.zipWithIndex.map(_.swap).toDF("id", "t")
      val sigs = df.select(Dedup.minhashSignature(
        TextFunctions.charShingles(col("t"), 3), k = 16).as("sig"))
        .collect().map(_.getSeq[Long](0))
      assert(sigs.forall(_.length == 16))
      assert(sigs.forall(_.forall(v => v >= 0)))
    }
  }

  test("tfidf conservation: sum of tf per doc == the doc's token count; df <= N") {
    forSamples(docsGen) { docs =>
      val df = docs.toDF("id", "text")
      val out = TextAnalysis.tfidf(df, "id", "text")
        .select($"id", $"tf", $"df").as[(Long, Long, Long)].collect()
      val tfSums = out.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      for ((id, t) <- docs) {
        val expect = t.split("\\s+").count(_.nonEmpty).toLong
        assert(tfSums.getOrElse(id, 0L) == expect, s"doc $id")
      }
      assert(out.forall(r => r._3 >= 1 && r._3 <= docs.size))
    }
  }

  test("stridedChunks coverage: every token of every doc is inside at least one chunk") {
    forSamples(docsGen, n = 12) { docs =>
      val df = docs.toDF("doc_id", "text")
      val nTok = docs.map { case (id, t) =>
        id -> t.split("\\s+").count(_.nonEmpty).toLong }.toMap
      val chunks = Curation.stridedChunks(df, "doc_id", "text", 4, 2)
        .select("doc_id", "tok_start", "tok_end")
        .as[(Long, Long, Long)].collect().groupBy(_._1)
      for ((id, n) <- nTok if n > 0) {
        val ranges = chunks(id).map(c => (c._2, c._3)).sortBy(_._1)
        // contiguous coverage of [0, n): first starts at 0, last ends at n,
        // and each next chunk starts at or before the previous end
        assert(ranges.head._1 == 0L && ranges.last._2 == n, (id, ranges.toSeq, n))
        ranges.sliding(2).foreach {
          case Array((_, endA), (startB, _)) => assert(startB <= endA, (id, ranges.toSeq))
          case _ => ()
        }
        // every chunk is non-empty and within bounds
        assert(ranges.forall { case (s, e) => s < e && e <= n })
      }
      for ((id, n) <- nTok if n == 0) assert(!chunks.contains(id))
    }
  }

  test("scdHistory tiling: per key, ranges abut exactly and exactly one version is current") {
    val logGen = Gen.chooseNum(1, 15).flatMap { n =>
      Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b", "c")
        ts <- Gen.chooseNum(0L, 20L)
        attr <- Gen.oneOf("x", "y", "z")
      } yield (k, ts, attr))
    }.map(_.zipWithIndex.map { case ((k, ts, a), i) => (k, i.toLong, ts, a) })
    forSamples(logGen, n = 12) { log =>
      val df = log.toDF("k", "eid", "ts", "attr")
      val h = operators.Scd.scdHistory(df, Seq("k"), "ts", "eid", Seq("attr"))
        .select("k", "version", "effective_from", "effective_to", "is_current")
        .as[(String, Long, Long, Option[Long], Boolean)].collect()
      h.groupBy(_._1).foreach { case (k, rows) =>
        val sorted = rows.sortBy(_._2)
        assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, (k, sorted.toSeq))
        // ranges abut: each version's effective_to equals the next's from
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._4.contains(b._3), (k, a, b))
          case _ => ()
        }
        assert(sorted.count(_._5) == 1 && sorted.last._5, (k, sorted.toSeq))
      }
    }
  }

  test("packSequences conservation: every doc packed exactly once, offsets within capacity rules") {
    forSamples(docsGen) { docs =>
      val df = docs.toDF("id", "text")
      val packed = Curation.packSequences(df, "id", "text",
          capacity = 5L, salt = "prop", shardHexChars = 1)
        .as[(Long, String, Long, Long, Long)].collect()
      assert(packed.map(_._1).sorted.sameElements(docs.map(_._1).sorted))
      // a doc starting at a nonzero offset never overflows the capacity
      assert(packed.forall(r => r._4 == 0L || r._4 + r._5 <= 5L))
    }
  }

  test("tokenBudgetSample: for any (budget, subBuckets) the admitted set is per-bucket-bounded and a subset of the single-window admissions per bucket") {
    val cfg = for {
      budget <- Gen.chooseNum(1L, 40L)
      n <- Gen.oneOf(1, 2, 3, 8, 16)
    } yield (budget, n)
    val docs = (0L until 60L)
      .map(i => (i, if (i % 2 == 0) "a" else "b", "t " * (1 + (i % 5).toInt)))
      .toDF("doc_id", "source", "text")
    forSamples(cfg, n = 12) { case (budget, n) =>
      val got = Curation.tokenBudgetSample(docs, "doc_id", "text", "source",
        budget, salt = "prop", subBuckets = n)
      if (n == 1) {
        val rows = got.select("cum_tok").as[Long].collect()
        assert(rows.forall(_ <= budget))
      } else {
        val rows = got.select("source", "sub_bucket", "n_tok", "cum_tok")
          .as[(String, Int, Long, Long)].collect()
        // per-bucket running bound, and the bucket budgets sum to budget
        val perBucket = (0 until n)
          .map(b => b -> (budget / n + (if (b < budget % n) 1L else 0L))).toMap
        assert(perBucket.values.sum == budget)
        for ((_, b, _, cum) <- rows) assert(cum <= perBucket(b))
        // source totals never exceed the full budget
        for ((_, grp) <- rows.groupBy(_._1))
          assert(grp.map(_._3).sum <= budget)
      }
    }
  }

  test("KMV sketch: merge-associativity and k-smallest-distinct contract for any input split") {
    import graft.functions.KmvAggregator
    val valuesGen = for {
      n <- Gen.chooseNum(0, 60)
      vs <- Gen.listOfN(n, Gen.chooseNum(-50L, 50L))
      k <- Gen.chooseNum(1, 12)
      cut <- Gen.chooseNum(0, n)
    } yield (vs, k, cut)
    forSamples(valuesGen, n = 40) { case (vs, k, cut) =>
      val agg = new KmvAggregator(k)
      def sketch(xs: Seq[Long]) = xs.foldLeft(agg.zero)(agg.reduce)
      // contract: the sketch IS the k smallest distinct values, sorted
      val whole = sketch(vs)
      assert(whole.toSeq == vs.distinct.sorted.take(k))
      // any split merges to the same sketch (partition-layout freedom)
      val (a, b) = vs.splitAt(cut)
      assert(agg.merge(sketch(a), sketch(b)).toSeq == whole.toSeq)
      assert(agg.merge(sketch(b), sketch(a)).toSeq == whole.toSeq)
    }
  }
}
