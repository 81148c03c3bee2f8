package graft.operators

import graft.SparkSpec

class DiffSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies inserted/deleted/changed/unchanged per key") {
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "s", "v")
    val current = Seq((1L, "a", 10.0),           // unchanged
      (2L, "b", 21.0),                           // changed value
      (4L, "D", 40.0),                           // changed string
      (5L, "e", 50.0)                            // inserted; 3 deleted
    ).toDF("k", "s", "v")
    val got = Diff.snapshotDiff(old, current, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "deleted",
      4L -> "changed", 5L -> "inserted"))
    val summary = Diff.diffSummary(old, current, Seq("k"))
      .as[(String, Long)].collect().toMap
    assert(summary === Map("unchanged" -> 1L, "changed" -> 2L,
      "deleted" -> 1L, "inserted" -> 1L))
  }

  test("diff join shuffles hashes, not payloads: exchanges carry key + 8-byte hash only") {
    val old = Seq((1L, "payload_string_a", 1.0)).toDF("k", "s", "v")
    val current = Seq((1L, "payload_string_b", 2.0)).toDF("k", "s", "v")
    val plan = Diff.snapshotDiff(old, current, Seq("k"))
      .queryExecution.executedPlan.toString
    val exchangeLines = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    // payload columns are hashed away BEFORE the join: no exchange may
    // reference the payload columns themselves
    assert(exchangeLines.nonEmpty)
    assert(!exchangeLines.exists(l => l.contains("s#") || l.contains("v#")),
      s"payload crossed the shuffle:\n$plan")
  }

  import spark.implicits._

  private def ks(a: Seq[Double], b: Seq[Double], buckets: Int = 0): (Double, Long, Long) =
    Diff.ksDrift(a.toDF("v"), b.toDF("v"), "v", buckets)
      .as[(Double, Long, Long)].collect().head

  /** Serial exact two-sample KS. */
  private def serialKs(a: Seq[Double], b: Seq[Double]): Double = {
    val pts = (a ++ b).distinct.sorted
    pts.map { x =>
      math.abs(a.count(_ <= x).toDouble / a.size -
        b.count(_ <= x).toDouble / b.size)
    }.max
  }

  test("ksDrift exact mode matches a serial KS computation") {
    val rnd = new scala.util.Random(19)
    val a = Seq.fill(200)((rnd.nextInt(30) + rnd.nextInt(30)).toDouble)
    val b = Seq.fill(150)((rnd.nextInt(30) + rnd.nextInt(40)).toDouble)
    val (d, na, nb) = ks(a, b)
    assert(na == 200 && nb == 150)
    assert(math.abs(d - serialKs(a, b)) < 1e-12, s"$d vs ${serialKs(a, b)}")
  }

  test("ksDrift endpoints: identical samples → 0, disjoint ranges → 1") {
    val a = Seq(1.0, 2.0, 3.0, 4.0)
    assert(ks(a, a)._1 == 0.0)
    assert(ks(a, Seq(10.0, 11.0, 12.0))._1 == 1.0)
    // the same endpoints hold in bucketed mode
    assert(ks(a, a, buckets = 8)._1 == 0.0)
    assert(ks(a, Seq(10.0, 11.0, 12.0), buckets = 8)._1 == 1.0)
  }

  test("bucketed D under-estimates exact D by at most one bucket's mass") {
    val rnd = new scala.util.Random(23)
    val a = Seq.fill(300)(rnd.nextGaussian() * 10 + 50)
    val b = Seq.fill(300)(rnd.nextGaussian() * 10 + 55)
    val exact = serialKs(a, b)
    for (bk <- Seq(16, 64, 256)) {
      val d = ks(a, b, buckets = bk)._1
      assert(d <= exact + 1e-12, s"buckets=$bk: binned D may not exceed exact")
      // each sample contributes at most ceil(n/bk)·(spread/bucket) mass
      // per bucket; with n = 300 the deviation bound 2·(1/bk)·... is
      // loose — assert the documented qualitative bound instead
      assert(exact - d <= 2.0 / bk * 300 / 300 + 0.25,
        s"buckets=$bk: d=$d exact=$exact")
    }
    // finer buckets converge toward exact
    assert(ks(a, b, buckets = 256)._1 >= ks(a, b, buckets = 16)._1 - 1e-12)
  }

  test("ksDrift is invariant to input partitioning and ignores nulls") {
    val a = (1 to 100).map(i => (i % 17).toDouble)
    val b = (1 to 80).map(i => (i % 23).toDouble)
    val d1 = Diff.ksDrift(a.toDF("v").repartition(1),
      b.toDF("v").repartition(1), "v", 0).as[(Double, Long, Long)].collect().head
    val d2 = Diff.ksDrift(a.toDF("v").repartition(9),
      b.toDF("v").repartition(5), "v", 0).as[(Double, Long, Long)].collect().head
    assert(d1 == d2)
    val withNulls = (a.map(Option(_)) ++ Seq(None, None)).toDF("v")
    val d3 = Diff.ksDrift(withNulls, b.toDF("v"), "v", 0)
      .as[(Double, Long, Long)].collect().head
    assert(d3 == d1, "nulls must be ignored, not counted")
  }

  // ---- per-source KL drift (q169) ----

  private def klOf(rows: Seq[(String, String)]): Map[String, (Long, Long, Double)] =
    Diff.klSourceDrift(rows.toDF("source", "text"), "source", "text")
      .select("source", "n_tok", "vocab_present", "kl")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

  test("klSourceDrift matches the naive full-support serial sum") {
    val rows = Seq(
      ("a", "x x y z"), ("a", "x w"),
      ("b", "y y y z"),
      ("c", "q q r"))
    // serial naive reference: full source x global-vocab support
    def tk(t: String) = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val byToken = rows.flatMap { case (s, t) => tk(t).map(s -> _) }
    val gc = byToken.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tTot = gc.values.sum.toDouble; val v = gc.size.toDouble
    val expected = byToken.groupBy(_._1).map { case (s, ts) =>
      val cs = ts.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val tsTot = cs.values.sum.toDouble
      val kl = gc.map { case (w, c) =>
        val p = (cs.getOrElse(w, 0L) + 1.0) / (tsTot + v)
        val q = (c + 1.0) / (tTot + v)
        p * math.log(p / q)
      }.sum
      s -> ((cs.values.sum, cs.size.toLong, kl))
    }
    val got = klOf(rows)
    assert(got.keySet === expected.keySet)
    for ((s, (n, vp, kl)) <- expected) {
      assert(got(s)._1 === n, s"source $s n_tok")
      assert(got(s)._2 === vp, s"source $s vocab_present")
      assert(math.abs(got(s)._3 - kl) < 1e-9,
        s"source $s kl: ${got(s)._3} vs $kl")
    }
  }

  test("klSourceDrift: pool-like sources score lower than a disjoint-vocab source") {
    val inDist = (1 to 20).map(i => ("a", "the quick brown fox"))
    val inDist2 = (1 to 20).map(i => ("b", "the quick brown fox"))
    val alien = Seq(("z", "zzz qqq www vvv"))
    val got = klOf(inDist ++ inDist2 ++ alien)
    assert(got("z")._3 > got("a")._3 && got("z")._3 > got("b")._3,
      s"alien source must diverge most: $got")
  }
}
