package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import java.nio.file.Files

/** The streaming graph-ANN member of the standing-corpus family:
  * per-drain O(batch) walk-inserts against the generation-base graph,
  * wholesale NN-Descent rebuild on the growth trigger,
  * generation-stamped edges, and every crash window repaired at
  * startup. The headline gate: WHICH drain a vector arrives in cannot
  * change its edges (insertions walk the same base), so cross-drain
  * growth is bit-equal to single-drain growth. */
class KnnGraphStreamSpec extends SparkSpec {
  import spark.implicits._

  private val P = KnnGraphStream.Params(k = 4, cells = 4, rounds = 2,
    beam = 4, steps = 3, growth = 100.0) // growth 100: no rebuild

  private def fixture(lo: Long, hi: Long): Seq[(Long, Seq[Float])] =
    (lo until hi).map { i =>
      val blob = (i % 4).toInt
      val v = (0 until 64).map { d =>
        val base = if (d == blob * 16) 1.0 else 0.0
        base + math.sin(i.toDouble * 3.7 + d * 1.3) * 0.02
      }
      (i, v.map(_.toFloat))
    }

  private def edgeSet(path: String): Set[(Long, Long, Int, Boolean, Long)] =
    spark.read.parquet(path).filter($"part" === "edge")
      .select("query_id", "neighbor_id", "rank", "base", "gen")
      .as[(Long, Long, Int, Boolean, Long)].collect().toSet

  private def drain(mem: MemoryStream[(Long, Seq[Float])], root: String,
                    p: KnnGraphStream.Params = P): Unit =
    KnnGraphStream.run(spark, mem.toDF().toDF("vec_id", "embedding"),
      s"$root/log", s"$root/graph", s"$root/ckpt",
      params = p).awaitTermination(180000)

  test("cross-drain growth is bit-equal to single-drain growth: " +
      "insertions walk the generation base, never each other") {
    val b0 = fixture(0, 60)
    val b1 = fixture(60, 72)
    val b2 = fixture(72, 84)
    implicit val sqlCtx = spark.sqlContext

    val rootA = Files.createTempDirectory("graft-knng-a").toString
    val memA = MemoryStream[(Long, Seq[Float])]
    memA.addData(b0: _*); drain(memA, rootA)   // gen-1 base build
    memA.addData(b1: _*); drain(memA, rootA)   // drain 1
    memA.addData(b2: _*); drain(memA, rootA)   // drain 2

    val rootB = Files.createTempDirectory("graft-knng-b").toString
    val memB = MemoryStream[(Long, Seq[Float])]
    memB.addData(b0: _*); drain(memB, rootB)
    memB.addData((b1 ++ b2): _*); drain(memB, rootB) // one drain

    assert(edgeSet(s"$rootA/graph") == edgeSet(s"$rootB/graph"))
    // and the inserted edges equal a hand-run walk against the base
    val base = spark.read.parquet(s"$rootA/graph")
      .filter($"part" === "edge" && $"base")
      .select($"query_id", $"neighbor_id")
    val ref = Similarity.nnDescentSearch(base,
        b0.toDF("vec_id", "embedding"), "vec_id", "embedding",
        (b1 ++ b2).toDF("vec_id", "embedding"), "vec_id", "embedding",
        P.k, P.cells, P.beam, P.steps)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    val appended = edgeSet(s"$rootA/graph").filter(!_._4)
      .map(e => (e._1, e._2, e._3))
    assert(appended == ref)
  }

  test("the growth trigger rebuilds wholesale: edges equal the batch " +
      "NN-Descent build on the full log, generation bumps, all base") {
    val p = P.copy(growth = 1.5)
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-knng-g").toString
    val mem = MemoryStream[(Long, Seq[Float])]
    val b0 = fixture(0, 60)
    val b1 = fixture(60, 100) // 100 >= 1.5 * 60 — triggers rebuild
    mem.addData(b0: _*); drain(mem, root, p)
    mem.addData(b1: _*); drain(mem, root, p)
    val edges = edgeSet(s"$root/graph")
    assert(edges.forall(e => e._4 && e._5 == 2L), "not all base gen-2")
    val ref = Similarity.nnDescentKnn((b0 ++ b1).toDF("vec_id", "embedding"),
        "vec_id", "embedding", p.k, p.cells, p.rounds)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(edges.map(e => (e._1, e._2, e._3)) == ref)
  }

  test("replayed ids no-op: the ledger anti-join keeps log and edges " +
      "unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-knng-r").toString
    val mem = MemoryStream[(Long, Seq[Float])]
    val b0 = fixture(0, 60)
    mem.addData(b0: _*); drain(mem, root)
    mem.addData(fixture(60, 70): _*); drain(mem, root)
    val before = edgeSet(s"$root/graph")
    mem.addData(fixture(55, 70): _*); drain(mem, root) // all replays
    assert(spark.read.parquet(s"$root/log").count() == 70L)
    assert(edgeSet(s"$root/graph") == before)
  }

  test("crash repairs: logged-but-unlinked ids re-insert identically, " +
      "and torn-append rows under a foreign generation drop and " +
      "re-insert") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-knng-c").toString
    val mem = MemoryStream[(Long, Seq[Float])]
    val b0 = fixture(0, 60)
    val b1 = fixture(60, 70)
    mem.addData(b0: _*); drain(mem, root)
    mem.addData(b1: _*); drain(mem, root)
    val want = edgeSet(s"$root/graph")

    // window 1: vectors landed in the log, edges never did — rewrite
    // the graph without b1's rows, then a startup repair must restore
    val stripped = spark.read.parquet(s"$root/graph")
      .filter($"part" === "meta" || $"query_id" < 60).localCheckpoint()
    graft.zones.Zones.replaceKeepingBackup(spark, s"$root/graph")(tmp =>
      stripped.write.parquet(tmp))
    KnnGraphStream.repairAtStartup(spark, s"$root/log", s"$root/graph",
      "vec_id", "embedding", P)
    assert(edgeSet(s"$root/graph") == want, "missing-id repair diverged")

    // window 2: a torn append stamped gen 99 — rows drop, ids re-insert
    spark.read.parquet(s"$root/graph")
      .filter($"part" === "edge" && $"query_id" >= 60)
      .withColumn("gen", org.apache.spark.sql.functions.lit(99L))
      .write.mode("append").parquet(s"$root/graph")
    KnnGraphStream.repairAtStartup(spark, s"$root/log", s"$root/graph",
      "vec_id", "embedding", P)
    assert(edgeSet(s"$root/graph") == want, "stale-gen repair diverged")
  }

  test("a torn insert append — a SUBSET of one batch's part files " +
      "committed — is caught by the batch ledger and repaired " +
      "bit-equal: truncated rank lists cannot pass the presence check") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-knng-t").toString
    val mem = MemoryStream[(Long, Seq[Float])]
    mem.addData(fixture(0, 60): _*); drain(mem, root)
    mem.addData(fixture(60, 70): _*); drain(mem, root)
    val want = edgeSet(s"$root/graph")

    // window 3a: the batch's LEDGER row committed but only the rank-1
    // edge row of each inserted id did — every id still passes a bare
    // inGraph presence check with a silently truncated neighbor list
    val torn = spark.read.parquet(s"$root/graph")
      .filter($"part" =!= "edge" || $"base" || $"rank" === 1)
      .localCheckpoint()
    graft.zones.Zones.replaceKeepingBackup(spark, s"$root/graph")(tmp =>
      torn.write.parquet(tmp))
    val truncated = spark.read.parquet(s"$root/graph")
      .filter($"part" === "edge" && !$"base").count()
    assert(truncated == 10L, s"fixture should truncate to rank-1 rows")
    KnnGraphStream.repairAtStartup(spark, s"$root/log", s"$root/graph",
      "vec_id", "embedding", P)
    assert(edgeSet(s"$root/graph") == want, "truncated-batch repair diverged")

    // window 3b: edge rows committed but the ledger row did not —
    // an unaccounted batch drops and re-inserts identically
    val noLedger = spark.read.parquet(s"$root/graph")
      .filter($"part" =!= "ins").localCheckpoint()
    graft.zones.Zones.replaceKeepingBackup(spark, s"$root/graph")(tmp =>
      noLedger.write.parquet(tmp))
    KnnGraphStream.repairAtStartup(spark, s"$root/log", s"$root/graph",
      "vec_id", "embedding", P)
    assert(edgeSet(s"$root/graph") == want, "orphan-batch repair diverged")
    // and the repaired table accounts: one ledger row per batch, counts
    // matching
    val g = spark.read.parquet(s"$root/graph")
    val nIns = g.filter($"part" === "ins").count()
    val nAppended = g.filter($"part" === "edge" && !$"base").count()
    val ledgerSum = g.filter($"part" === "ins")
      .agg(org.apache.spark.sql.functions.sum($"neighbor_id"))
      .head().getLong(0)
    assert(nIns >= 1L && ledgerSum == nAppended,
      s"ledger does not account: $nIns rows, $ledgerSum vs $nAppended")
  }

  test("deletes: tombstones serve-filter immediately, the pressure " +
      "trigger excises wholesale (bit-equal to a batch build over the " +
      "live corpus), and deleted ids can never resurrect") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-knng-del").toString
    val mem = MemoryStream[(Long, Seq[Float])]
    mem.addData(fixture(0, 60): _*); drain(mem, root)
    mem.addData(fixture(60, 70): _*); drain(mem, root)
    val q = Seq((9000L, fixture(4, 5).head._2)).toDF("vec_id", "embedding")
    // serving beam carries tombstone headroom above topK — the
    // ef-vs-k discipline the probe scaladoc prices
    def top(): Seq[Long] = KnnGraphStream.probe(spark, q, s"$root/log",
        s"$root/graph", topK = 4, params = P.copy(beam = 8))
      .orderBy($"rank").select($"neighbor_id").as[Long].collect().toSeq
    val before = top()
    assert(before.length == 4)
    val victim = before.head
    // 1. mark-and-filter: one delete() call, the victim never serves
    // again, and live rows re-rank to fill topK
    assert(KnnGraphStream.delete(spark,
      Seq(victim).toDF("vec_id"), s"$root/log", s"$root/graph",
      params = P) == 1L)
    val after = top()
    assert(!after.contains(victim), s"deleted $victim still serves")
    assert(after.length == 4, s"filtered answer under-filled: $after")
    // idempotent + unknown-id no-ops
    assert(KnnGraphStream.delete(spark, Seq(victim).toDF("vec_id"),
      s"$root/log", s"$root/graph", params = P) == 0L)
    assert(KnnGraphStream.delete(spark, Seq(424242L).toDF("vec_id"),
      s"$root/log", s"$root/graph", params = P) == 0L)
    // graph untouched so far (mark, not excise): victim edges remain
    assert(edgeSet(s"$root/graph").exists(e =>
      e._1 == victim || e._2 == victim), "premature excision")
    // 2. pressure excision: 14 more tombstones cross maxTombstoneFrac
    // -> wholesale rebuild over the LIVE corpus under the next gen
    val more = (0L until 70L).filter(i => i != victim).take(14)
    assert(KnnGraphStream.delete(spark, more.toDF("vec_id"),
      s"$root/log", s"$root/graph", params = P) == 14L)
    val edges = edgeSet(s"$root/graph")
    assert(edges.forall(e => e._4 && e._5 == 2L), "excision gen/base wrong")
    val dead = (more :+ victim).toSet
    assert(!edges.exists(e => dead(e._1) || dead(e._2)),
      "tombstoned id survived the excision rebuild")
    val live = fixture(0, 70).filterNot(v => dead(v._1))
    val ref = Similarity.nnDescentKnn(live.toDF("vec_id", "embedding"),
        "vec_id", "embedding", P.k, P.cells, P.rounds)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(edges.map(e => (e._1, e._2, e._3)) == ref,
      "excision rebuild != batch build over the live corpus")
    // 3. no resurrection: re-draining a deleted id is a ledger no-op
    mem.addData(fixture(victim, victim + 1): _*); drain(mem, root)
    assert(spark.read.parquet(s"$root/log").count() == 70L)
    assert(!top().contains(victim))
  }

  test("quality decays between rebuilds exactly as documented and the " +
      "rebuild recovers it: a NEW cluster's members interlink only " +
      "after the wholesale rebuild") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-knng-d").toString
    val mem = MemoryStream[(Long, Seq[Float])]
    val b0 = fixture(0, 60)
    mem.addData(b0: _*); drain(mem, root) // gen-1 base: blobs 0..3
    // a NEW blob the base has never seen (basis 32)
    def cvec(j: Int): Seq[Float] = {
      val v = Array.fill(64)(0.0f); v(32) = 1.0f
      v(33) = 0.02f * j; v.toSeq
    }
    val newBlob = (0 until 8).map(j => (2000L + j, cvec(j)))
    mem.addData(newBlob: _*); drain(mem, root)
    val q = Seq((9000L, cvec(9))).toDF("vec_id", "embedding")
    def hits(): Long = KnnGraphStream.probe(spark, q,
        s"$root/log", s"$root/graph", topK = 4, params = P)
      .filter($"neighbor_id" >= 2000L).count()
    val pre = hits()
    // decay is structural pre-rebuild: inserted nodes link only to
    // BASE nodes, so the new blob is not yet interlinked — the walk
    // can reach its members only through shared base neighbors
    val preEdges = spark.read.parquet(s"$root/graph")
      .filter($"part" === "edge" && $"query_id" >= 2000L &&
        $"neighbor_id" >= 2000L).count()
    assert(preEdges == 0L, "inserted nodes must link only to the base")
    // force the rebuild (growth=1.0: any fresh vector trips the
    // trigger) — the whole log re-solves under gen 2
    mem.addData(Seq((3000L, cvec(20))): _*)
    drain(mem, root, P.copy(growth = 1.0))
    val post = hits()
    assert(post >= pre, s"rebuild regressed probe quality: $pre -> $post")
    assert(post == 4L, s"post-rebuild probe must fill top-4 from the " +
      s"new blob, got $post")
    val postEdges = spark.read.parquet(s"$root/graph")
      .filter($"part" === "edge" && $"query_id" >= 2000L &&
        $"neighbor_id" >= 2000L).count()
    assert(postEdges > 0L, "rebuild must interlink the new blob")
  }

  test("the serving probe reaches appended nodes through reverse edges " +
      "the moment their drain lands") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-knng-p").toString
    val mem = MemoryStream[(Long, Seq[Float])]
    val b0 = fixture(0, 60)
    mem.addData(b0: _*); drain(mem, root)
    // appended vector: a blob-0 direction rotated slightly
    val nv = {
      val v = Array.fill(64)(0.0f); v(0) = 0.95f; v(1) = 0.3f; v
    }
    mem.addData(Seq((1000L, nv.toSeq)): _*); drain(mem, root)
    val q = {
      val v = Array.fill(64)(0.0f); v(0) = 0.94f; v(1) = 0.31f; v
    }
    val top = KnnGraphStream.probe(spark,
        Seq((5000L, q.toSeq)).toDF("vec_id", "embedding"),
        s"$root/log", s"$root/graph", topK = 1, params = P)
      .select($"neighbor_id").as[Long].head()
    assert(top == 1000L, s"probe routed to $top, not the appended node")
  }
}
