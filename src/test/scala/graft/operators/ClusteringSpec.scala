package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer-exact Lloyd k-means (q124's operator). The oracle gate
  * proves replay equality; these tests pin the SEMANTICS on known
  * geometry: separation, centroid arithmetic, empty-cluster behavior,
  * and reduce-order independence. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def pad(v: Seq[Double]): Seq[Float] =
    (v ++ Seq.fill(64 - v.size)(0.0)).map(_.toFloat)

  private def assignOf(rows: Seq[(Long, Seq[Float], Int)], k: Int, iters: Int) =
    Clustering.kmeansAssign(
      rows.toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding", "label", k, iters)

  test("two well-separated blobs split perfectly at k = 2") {
    // blob A near (0.4, 0.4, …), blob B near (-0.4, -0.4, …)
    val rows = (0L until 10L).map { i =>
      val base = if (i < 5) 0.4 else -0.4
      (i, pad(Seq(base + 0.001 * i, base - 0.001 * i)), if (i < 5) 0 else 1)
    }
    val got = assignOf(rows, 2, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val clustersOfA = (0L until 5L).map(got).toSet
    val clustersOfB = (5L until 10L).map(got).toSet
    assert(clustersOfA.size == 1 && clustersOfB.size == 1 &&
      clustersOfA != clustersOfB, s"assignment: $got")
  }

  test("centroid of a converged cluster is the shifted floor mean") {
    // one tight pair, one far singleton → after 1 iteration the pair's
    // centroid dim-0 is floor((q1 + q2)/2) via the shifted division
    val rows = Seq(
      (1L, pad(Seq(0.25)), 0),
      (2L, pad(Seq(0.25000190734863281)), 0), // 0.25 + 2/2^20
      (3L, pad(Seq(-0.4)), 1))
    val out = assignOf(rows, 2, 2).collect()
    val byVec = out.map(r => r.getLong(0) ->
      (r.getLong(2), r.getSeq[Long](3))).toMap
    assert(byVec(1L)._1 == byVec(2L)._1)
    assert(byVec(3L)._1 != byVec(1L)._1)
    val q1 = math.floor(0.25 * 1048576).toLong
    val q2 = math.floor(0.25000190734863281 * 1048576).toLong
    assert(byVec(1L)._2.head == (q1 + q2) / 2,
      s"centroid dim0 ${byVec(1L)._2.head} != ${(q1 + q2) / 2}")
  }

  test("an empty cluster keeps its seed centroid") {
    // two exact duplicate groups and k = 3: the third seed is a
    // duplicate of another seed, ties go to the smaller cid, so the
    // duplicate-seed cluster gets no members and must retain its seed
    val a = pad(Seq(0.3, 0.1))
    val b = pad(Seq(-0.3, -0.1))
    val rows = (0L until 4L).map(i => (i, a, 0)) ++
      (4L until 8L).map(i => (i, b, 1))
    val out = assignOf(rows, 3, 2)
    val sizes = out.groupBy("cid").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.size == 2, s"one cluster must be empty: $sizes")
    assert(sizes.values.toSet == Set(4L))
  }

  test("diversitySample caps every cluster and covers every mode") {
    // two blobs of very different sizes: a global top-6 sample would be
    // swamped by the big blob; the cluster cap must cover both
    val rows = (0L until 20L).map(i => (i, pad(Seq(0.4, 0.4)), 0)) ++
      (20L until 23L).map(i => (i, pad(Seq(-0.4, -0.4)), 1))
    val got = Clustering.diversitySample(
      rows.toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding", "label", 2, 2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val perCluster = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perCluster.values.forall(_ <= 3), s"cap violated: $perCluster")
    assert(got.map(_._3).toSet == Set(0, 1),
      s"both modes must appear in the sample: ${got.toSeq}")
  }

  test("assignment is invariant to input partitioning") {
    val rows = (0L until 60L).map(i =>
      (i, pad(Seq(math.sin(i.toDouble), math.cos(i.toDouble / 3)).map(_ * 0.4)), (i % 4).toInt))
    val a = Clustering.kmeansLabelProfile(
      rows.toDF("vec_id", "embedding", "label").repartition(1),
      "vec_id", "embedding", "label", 4, 3).collect().map(_.toSeq).toSeq
    val b = Clustering.kmeansLabelProfile(
      rows.toDF("vec_id", "embedding", "label").repartition(17),
      "vec_id", "embedding", "label", 4, 3).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  private def semKept(rows: Seq[(Long, Seq[Float], Int)], k: Int,
                      tauNum: Long = 19, tauDen: Long = 20): Map[Long, Boolean] =
    Clustering.semDedup(rows.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", k, 2, tauNum, tauDen)
      .collect().map(r => r.getLong(1) -> r.getBoolean(3)).toMap

  test("semDedup drops exactly the (hash,id)-later member of each τ-pair") {
    // two angular blobs; inside each, one near-parallel pair (cos > 0.99)
    // and one member at cos ≈ 0.936 < τ = 0.95 of both pair members
    val rows = Seq(
      (1L, pad(Seq(0.4, 0.0)), 0),
      (2L, pad(Seq(0.4, 0.004)), 0),   // cos(1,2) ≈ 0.99995 → dup pair
      (3L, pad(Seq(0.4, 0.15)), 0),    // cos ≈ 0.936 → kept
      (11L, pad(Seq(0.0, -0.4)), 1),
      (12L, pad(Seq(-0.01, -0.4)), 1), // cos ≈ 0.9997 → dup pair
      (13L, pad(Seq(0.15, -0.4)), 1))  // cos ≈ 0.936 → kept
    val kept = semKept(rows, 2)
    assert(kept(3L) && kept(13L), s"sub-τ members must survive: $kept")
    assert(kept(1L) ^ kept(2L), s"exactly one of the pair survives: $kept")
    assert(kept(11L) ^ kept(12L), s"exactly one of the pair survives: $kept")
    // the survivor is the (kmvHash, id)-smaller member — the same
    // admission order the diversity sampler uses
    import graft.functions.KmvAggregator
    val hv = rows.map(_._1).toDF("vec_id")
      .select(col("vec_id"), KmvAggregator.kmvHash(col("vec_id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((a, b) <- Seq((1L, 2L), (11L, 12L))) {
      val first = if (hv(a) < hv(b) || (hv(a) == hv(b) && a < b)) a else b
      assert(kept(first), s"admission-order-first $first must survive")
    }
  }

  test("semDedup integer cosine test cannot overflow: dynamic norm cap scales with tauDen") {
    // both sides of dot²·tauDen² ≥ tauNum²·n2a·n2b are bounded by
    // tauDen²·n2a·n2b (Cauchy–Schwarz; tauNum ≤ tauDen), so the per-row
    // norm cap ⌊√(2^63/tauDen²)⌋ makes wraparound unreachable at ANY τ
    // fraction. An unreduced 95/100 must behave identically to 19/20 —
    // not be refused, not silently wrap.
    val rows = Seq(
      (1L, pad(Seq(0.4, 0.0)), 0),
      (2L, pad(Seq(0.4, 0.004)), 0),   // cos ≈ 0.99995 → τ-pair
      (3L, pad(Seq(0.4, 0.15)), 0),    // cos ≈ 0.936 → kept
      (11L, pad(Seq(0.0, -0.4)), 1),
      (12L, pad(Seq(-0.01, -0.4)), 1))
    assert(semKept(rows, 2, 95, 100) == semKept(rows, 2, 19, 20),
      "unreduced τ fraction must decide identically to its reduced form")
    // tauDen near 2^15 tightens the cap to ≈ 2^16.5, below the ≈ 2^20
    // norm of a unit vector at the 2^10 scale → the loud norm error,
    // never a wrapped comparison
    val ex = intercept[Exception] {
      semKept(rows, 2, 32767L, 32768L)
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(ex).contains("norm too large"), msgs(ex))
    // past 2^15 the cap itself is meaningless → refused up front
    val ex2 = intercept[IllegalArgumentException] {
      Clustering.semDedup(rows.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", 2, 1, 65535L, 65536L)
    }
    assert(ex2.getMessage.contains("2^15"), ex2.getMessage)
  }

  test("semDedup τ boundary: cos exactly at τ is dropped (≥ semantics)") {
    // q = (3,4) vs (4,3) at 2^10 scale: cos = 24/25 exactly; with
    // τ = 24/25 the integer test hits equality → dropped; with a higher
    // τ = 97/100 the same pair survives
    val rows = Seq(
      (1L, pad(Seq(3.0 / 1024, 4.0 / 1024)), 0),
      (2L, pad(Seq(4.0 / 1024, 3.0 / 1024)), 0),
      (3L, pad(Seq(-0.4, -0.4)), 1))
    val atTau = semKept(rows, 2, 24, 25)
    assert(atTau(1L) ^ atTau(2L), s"equality at τ must drop one: $atTau")
    val aboveTau = semKept(rows, 2, 97, 100)
    assert(aboveTau(1L) && aboveTau(2L), s"cos < τ must keep both: $aboveTau")
  }

  test("pqTopK: an exact duplicate of the query ranks first on a separated corpus") {
    // two far-apart blobs with within-blob jitter; query 100 has an
    // exact duplicate at id 7 — identical subvectors → identical codes
    // → the minimum possible ADC distance
    val rnd = new scala.util.Random(5)
    def jit(base: Double) = Seq.fill(16)(base + (rnd.nextDouble() - 0.5) * 0.05)
    val blobA = (0L until 6L).map(i => (i, pad(jit(0.4)), 0))
    val blobB = (10L until 16L).map(i => (i, pad(jit(-0.4)), 1))
    val qvec = pad(jit(0.4))
    val corpus = blobA ++ blobB ++ Seq((7L, qvec, 0), (100L, qvec, 0))
    val got = Clustering.pqTopK(corpus.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", dims = 64, m = 8, k = 4, iters = 2,
        topK = 3, queryMod = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // the dup shares the query's per-subspace argmin codes, so its ADC
    // distance is the MINIMUM possible; blob-mates that collapse to the
    // same code vector tie exactly (integer distances) and the (dist,
    // id) tie-break may outrank it — correct PQ semantics: code
    // collisions are indistinguishable by construction
    val q100 = got.filter(_._1 == 100L)
    val minDist = q100.map(_._3).min
    val dupRow = q100.find(_._2 == 7L)
    assert(dupRow.nonEmpty, s"dup must be in the top-3: ${q100.toSeq}")
    assert(dupRow.get._3 == minDist,
      s"dup must sit at the minimum ADC distance: ${q100.toSeq}")
    // all top-3 neighbors come from the query's blob
    val blobIds = (0L until 8L).toSet
    assert(q100.forall(t => blobIds.contains(t._2)),
      s"neighbors must stay in-blob: ${q100.toSeq}")
  }

  test("pqTopK is invariant to input partitioning") {
    val rows = (0L until 50L).map(i =>
      (i, pad(Seq.tabulate(16)(d => 0.3 * math.sin((i + d).toDouble))), (i % 3).toInt))
    def run(parts: Int) = Clustering.pqTopK(
        rows.toDF("vec_id", "embedding", "label").repartition(parts),
        "vec_id", "embedding", dims = 64, m = 8, k = 8, iters = 2,
        topK = 3, queryMod = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(run(1) === run(13))
  }

  test("ivfPqTopK with cells = 1 degenerates exactly to pqTopK") {
    // one coarse cell ⇒ every vector is a candidate for every query ⇒
    // the composition must reproduce the plain-PQ ranking bit for bit
    val rows = (0L until 40L).map(i =>
      (i, pad(Seq.tabulate(16)(d => 0.3 * math.sin((i + d).toDouble))), (i % 3).toInt))
    val df = rows.toDF("vec_id", "embedding", "label")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select("query_id", "neighbor_id", "dist", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val pq = canon(Clustering.pqTopK(df, "vec_id", "embedding",
      dims = 64, m = 8, k = 8, iters = 2, topK = 3, queryMod = 10L))
    val ivf = canon(Clustering.ivfPqTopK(df, "vec_id", "embedding",
      dims = 64, m = 8, k = 8, iters = 2, cells = 1, nprobe = 1,
      topK = 3, queryMod = 10L))
    assert(ivf.nonEmpty && ivf == pq)
  }

  test("ivfPqTopK recall vs integer-L2 brute force on clustered data") {
    // four tight blobs at the corners of a 2-subspace sign grid; one
    // query per blob (id % 100 == 0)
    val rnd = new scala.util.Random(11)
    val corners = Seq((1, 1), (1, -1), (-1, 1), (-1, -1))
    val corpus = for {
      c <- 0 until 4
      j <- 0 until 15
    } yield {
      val (s1, s2) = corners(c)
      val v = Seq.tabulate(16)(d =>
        (if (d < 8) s1 else s2) * 0.4 + (rnd.nextDouble() - 0.5) * 0.05)
      ((c * 100 + j).toLong, pad(v), c)
    }
    val df = corpus.toDF("vec_id", "embedding", "label")
    // brute force: exact integer L2 on the SAME 2^20 quantization
    def quant(v: Seq[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * (1L << 20)).toLong).toArray
    val qv = corpus.map { case (id, v, _) => id -> quant(v) }.toMap
    val queries = corpus.map(_._1).filter(_ % 100L == 0L)
    def bruteTop3(q: Long): Seq[Long] =
      qv.keys.filter(_ != q).toSeq
        .map(n => (qv(n).zip(qv(q)).map { case (a, b) =>
          (a - b) * (a - b) }.sum, n))
        .sorted.take(3).map(_._2)
    val got = Clustering.ivfPqTopK(df, "vec_id", "embedding",
        dims = 64, m = 8, k = 16, iters = 2, cells = 8, nprobe = 3,
        topK = 12, queryMod = 100L)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // every returned neighbor stays in the query's blob (the routing
    // contract on separated data)…
    for ((q, ns) <- got; n <- ns)
      assert(n / 100 == q / 100, s"query $q retrieved cross-blob $n")
    // …and the exact top-3 survives the composed index
    val recalls = queries.map { q =>
      val b = bruteTop3(q)
      b.count(got.getOrElse(q, Set.empty)).toDouble / b.size
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.75, s"recall@3 in top-12: $recall (per-query $recalls)")
  }

  test("ivfPqTopK is invariant to input partitioning") {
    val rows = (0L until 60L).map(i =>
      (i, pad(Seq.tabulate(16)(d => 0.35 * math.cos((2 * i + d).toDouble))), (i % 4).toInt))
    def run(parts: Int) = Clustering.ivfPqTopK(
        rows.toDF("vec_id", "embedding", "label").repartition(parts),
        "vec_id", "embedding", dims = 64, m = 8, k = 8, iters = 2,
        cells = 4, nprobe = 2, topK = 3, queryMod = 12L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(run(1) === run(13) && run(1).nonEmpty)
  }

  test("semDedup matches a brute-force within-cluster reference") {
    val rnd = new scala.util.Random(7)
    val base = (0L until 40L).map { i =>
      val v = Seq.fill(8)(rnd.nextDouble() - 0.5)
      val n = math.sqrt(v.map(x => x * x).sum)
      (i, pad(v.map(_ / n * 0.4)), (i % 3).toInt)
    }
    // plant near-dups of every 5th vector (tiny perturbation on dim 7)
    val planted = base.filter(_._1 % 5 == 0).map { case (i, v, l) =>
      (100L + i, v.updated(7, v(7) + 0.002f), l)
    }
    val corpus = base ++ planted
    val kept = semKept(corpus, 4)
    // reference: same assignment, brute-force integer rule in Scala
    val assigned = Clustering.kmeansAssign(
      corpus.toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding", "label", 4, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    import graft.functions.KmvAggregator
    val hv = corpus.map(_._1).toDF("vec_id")
      .select(col("vec_id"), KmvAggregator.kmvHash(col("vec_id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q = corpus.map { case (i, v, _) =>
      i -> v.map(x => math.floor(x.toDouble * 1024).toLong)
    }.toMap
    def dot(a: Seq[Long], b: Seq[Long]) = a.zip(b).map { case (x, y) => x * y }.sum
    val expectedKept = corpus.map(_._1).map { i =>
      val dropped = corpus.map(_._1).exists { j =>
        j != i && assigned(j) == assigned(i) &&
          (hv(j) < hv(i) || (hv(j) == hv(i) && j < i)) && {
            val d = dot(q(j), q(i))
            d > 0 && d * d * 400 >= 361 * dot(q(j), q(j)) * dot(q(i), q(i))
          }
      }
      i -> !dropped
    }.toMap
    assert(kept === expectedKept)
  }

  // ---- contrastivePairs (q203) -------------------------------------

  test("contrastivePairs obeys both pick rules against an independent derivation") {
    val rows = (0L until 30L).map { i =>
      val c = (i % 3).toInt
      val base = Seq(0.4, -0.4, 0.0)(c)
      val v = (0 until 64).map(d =>
        (if (d == 0) base else if (d == 1) -base else 0.0)
          + math.sin(i * 3.1 + d) * 0.01)
      (i, v.map(_.toFloat), c)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val asg = Clustering.kmeansAssign(df, "vec_id", "embedding", "label", 3, 3)
      .select(col("vec_id"), col("cid").cast("long"))
      .as[(Long, Long)].collect().toMap
    // independent re-derivation of the pick rules from the assignment
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def hv(id: Long): Long = {
      val h = md.digest(id.toString.getBytes("UTF-8"))
      var x = 0L
      for (b <- 0 until 6) x = (x << 8) | (h(b) & 0xffL)
      x
    }
    val byCluster = asg.groupBy(_._2).view
      .mapValues(_.keys.toSeq.sortBy(id => (hv(id), id))).toMap
    val want = byCluster.toSeq.flatMap { case (cid, members) =>
      val sz = members.size
      if (sz < 2) Nil
      else members.zipWithIndex.flatMap { case (a, idx0) =>
        val r = idx0 + 1
        val ncid = (cid + 1) % 3
        byCluster.get(ncid).map { nm =>
          (a, cid, members(r % sz), ncid, nm(((r - 1) % nm.size).toInt))
        }
      }
    }.toSet
    val got = Clustering.contrastivePairs(df, "vec_id", "embedding",
        "label", 3, 3)
      .select(col("anchor_id"), col("cid").cast("long"), col("pos_id"),
        col("neg_cid").cast("long"), col("neg_id"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == want)
    // structural laws: positive ≠ anchor, same cluster; negative from
    // the next cluster, never the anchor's
    got.foreach { case (a, cid, p, ncid, n) =>
      assert(p != a && asg(p) == cid && ncid == (cid + 1) % 3 &&
        asg(n) == ncid)
    }
    // k = 1 has no distinct negative cluster — rejected loudly
    intercept[IllegalArgumentException] {
      Clustering.contrastivePairs(df, "vec_id", "embedding", "label", 1, 3)
    }
  }

  // ---- gridDbscan (q190) -------------------------------------------

  /** Independent serial re-computation of the grid-DBSCAN spec:
    * quantize, sha-parity signs, project, cell floor, census, BFS over
    * 8-adjacent core cells, border adoption, noise fallback. */
  private def serialDbscan(rows: Seq[(Long, Seq[Float])], w: Long,
                           minPts: Int): Map[Long, (String, Long)] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def signs(axis: Int): IndexedSeq[Long] = (0 until 64).map { d =>
      val h = md.digest(s"dbs:$axis:$d".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) % 2 == 0) 1L else -1L
    }
    val s0 = signs(0); val s1 = signs(1)
    val b = 1L << 20
    def cellOf(v: Seq[Float]): (Long, Long) = {
      val q = v.map(x => math.floor(x.toDouble * (1L << 20)).toLong)
      val px = q.zip(s0).map { case (a, s) => a * s }.sum
      val py = q.zip(s1).map { case (a, s) => a * s }.sum
      (math.floor(px.toDouble / w).toLong, math.floor(py.toDouble / w).toLong)
    }
    def key(c: (Long, Long)): Long = (c._1 + b) * (2 * b) + (c._2 + b)
    val pc = rows.map { case (id, v) => id -> cellOf(v) }
    val counts = pc.groupBy(_._2).view.mapValues(_.size).toMap
    val core = counts.filter(_._2 >= minPts).keySet
    val labels = scala.collection.mutable.Map[(Long, Long), Long]()
    for (c <- core if !labels.contains(c)) {
      var comp = List(c)
      val seen = scala.collection.mutable.Set(c)
      var queue = List(c)
      while (queue.nonEmpty) {
        val h = queue.head; queue = queue.tail
        for (dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0) {
          val n = (h._1 + dx, h._2 + dy)
          if (core(n) && !seen(n)) { seen += n; queue ::= n; comp ::= n }
        }
      }
      val m = comp.map(key).min
      comp.foreach(cc => labels(cc) = m)
    }
    pc.map { case (id, c) =>
      if (core(c)) id -> (("core", labels(c)))
      else {
        val adj = for {
          dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0
          n = (c._1 + dx, c._2 + dy) if core(n)
        } yield labels(n)
        if (adj.nonEmpty) id -> (("border", adj.min))
        else id -> (("noise", -1L))
      }
    }.toMap
  }

  /** Deterministic fixture: three planted 2-D blobs riding dims 0/1
    * plus sine jitter on every dim, and a sparse far-out tail. */
  private def dbscanFixture: Seq[(Long, Seq[Float])] =
    (0L until 260L).map { i =>
      val blob = (i % 4).toInt
      val (bx, by) =
        if (blob == 3 && i > 200) (1.5 + i * 0.05, -1.5 - i * 0.07) // scattered far tail
        else (Seq(0.45, -0.45, 0.45)(blob % 3), Seq(0.45, 0.45, -0.45)(blob % 3))
      val v = (0 until 64).map { d =>
        val jitter = math.sin(i.toDouble * 7.3 + d * 1.7) * 0.015
        (if (d == 0) bx else if (d == 1) by else 0.0) + jitter
      }
      (i, v.map(_.toFloat))
    }

  test("gridDbscan equals a serial re-computation of the cell-DBSCAN spec") {
    val rows = dbscanFixture
    val got = Clustering.gridDbscan(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", dims = 64, cellWidth = 262144L, minPts = 10L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    val want = serialDbscan(rows, 262144L, 10)
    assert(got == want)
    // non-vacuous: the fixture must exercise core AND noise at least
    val roles = got.values.map(_._1).toSet
    assert(roles.contains("core") && roles.contains("noise"), roles.toString)
  }

  test("gridDbscan is partition-layout invariant") {
    val rows = dbscanFixture
    val a = Clustering.gridDbscan(
        rows.toDF("vec_id", "embedding").repartition(1),
        "vec_id", "embedding", 64, 262144L, 10L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = Clustering.gridDbscan(
        rows.toDF("vec_id", "embedding").repartition(32),
        "vec_id", "embedding", 64, 262144L, 10L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("incrementalCellDbscan equals a full recompute on the union corpus") {
    val rows = dbscanFixture
    // 1:4 split — batch 1 alone leaves most cells under minPts, so the
    // merge creates genuinely NEWLY-core cells (vacuity check below)
    val (b1, b2) = rows.partition(_._1 % 5 == 0)
    val c1 = Clustering.cellCensus(b1.toDF("vec_id", "embedding"),
      "vec_id", "embedding", 64, 262144L)
    val lab1 = Clustering.cellStates(c1, 10L, 8)
      .filter($"role" === "core").select($"cell", $"cluster")
    val got = Clustering.incrementalCellDbscan(c1, lab1,
        b2.toDF("vec_id", "embedding"), "vec_id", "embedding",
        64, 262144L, 10L)
      .select("cx", "cy", "cnt", "role", "cluster")
      .as[(Long, Long, Long, String, Long)].collect().toSet
    val want = Clustering.cellStates(
        Clustering.cellCensus(rows.toDF("vec_id", "embedding"),
          "vec_id", "embedding", 64, 262144L), 10L, 8)
      .select("cx", "cy", "cnt", "role", "cluster")
      .as[(Long, Long, Long, String, Long)].collect().toSet
    assert(got == want)
    // non-vacuous: the split must actually create newly-core cells
    // (cells under minPts in batch 1 that cross it after the merge)
    val coreB1 = lab1.count()
    val coreAll = want.count(_._4 == "core")
    assert(coreAll > coreB1, s"fixture split created no newly-core cells")
  }

  test("incrementalCellDbscan never re-iterates untouched core chains (pruning pin)") {
    // the standing state holds a 300-cell core CHAIN (solving it needs
    // ~10 star alternations); the delta lands in real-projection cells
    // (|cx| ≤ ~16 at this width) far from the chain at cx ≥ 1000. With
    // ccRounds = 2 the call succeeds only because the chain never
    // enters the incremental iteration — and its labels must survive
    // byte-identical.
    val b = 1L << 20
    def key(cx: Long, cy: Long): Long = (cx + b) * (2 * b) + (cy + b)
    val chain = (0L until 300L).map(i =>
      (1000L + i, 500L, key(1000L + i, 500L), 10L))
    val standing = chain.toDF("cx", "cy", "cell", "cnt")
    val labels = Clustering.cellStates(standing, 10L, 13)
      .filter($"role" === "core").select($"cell", $"cluster")
    val got = Clustering.incrementalCellDbscan(standing, labels,
        dbscanFixture.take(60).toDF("vec_id", "embedding"),
        "vec_id", "embedding", 64, 262144L, 10L, ccRounds = 2)
      .filter($"cx" >= 1000L)
      .select($"cell", $"cluster").as[(Long, Long)].collect().toMap
    assert(got.size == 300 && got.values.forall(_ == key(1000L, 500L)))
  }

  test("gridDbscan rejects vectors whose length != dims loudly") {
    val rows = Seq((1L, Seq.fill(32)(0.1f)))
    val e = intercept[Exception] {
      Clustering.gridDbscan(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", 64, 262144L, 10L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("vector length != dims")),
      messages(e).mkString(" | "))
  }
}
