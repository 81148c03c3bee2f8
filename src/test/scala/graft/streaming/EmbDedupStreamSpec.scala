package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** [[EmbDedupStream]] — the DedupStream protocol in the embedding
  * modality. Geometry: hand-picked 8-dim vectors where near-dups are a
  * +0.001 single-coordinate perturbation (cos ≈ 1-1e-7, far above the
  * 0.999 threshold) and every distinct pair sits at |cos| ≤ 0.71, far
  * below — so results are exact-threshold-determined, not band-luck. */
class EmbDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val threshold = 0.999
  private val (bands, bits, dim) = (4, 4, 8)

  private val v1 = Array(1f, 0f, 1f, 0f, 1f, 0f, 1f, 0f)
  private val v2 = Array(0f, 1f, 0f, 1f, 0f, 1f, 0f, 1f)          // ⊥ v1
  private val v3 = Array(1f, 1f, -1f, -1f, 1f, 1f, -1f, -1f)      // ⊥ v1,v2
  private val v4 = Array(1f, -1f, 1f, -1f, 1f, -1f, 1f, -1f)      // cos ±0.71
  private val v5 = Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)
  private val v6 = Array(8f, 7f, 6f, 5f, 4f, 3f, 2f, 1f)          // cos(v5,v6)=0.59
  private def near(v: Array[Float]): Array[Float] =
    v.updated(0, v(0) + 0.001f)

  private def run(mem: MemoryStream[(Long, Array[Float])], root: String,
                  bandPath: Option[String] = None,
                  compactAfter: Int = 0,
                  compactSink: Int = 0,
                  growCorpus: Boolean = true): Unit =
    EmbDedupStream.run(spark, mem.toDF().toDF("vec_id", "embedding"),
      s"$root/vecs", s"$root/out", s"$root/ckpt",
      threshold = threshold, bands = bands, bitsPerBand = bits, dim = dim,
      growCorpus = growCorpus, compactVecsAfterFiles = compactAfter,
      compactSinkAfterFiles = compactSink, bandPath = bandPath)
      .awaitTermination(120000)

  private def sinkIds(root: String): Set[Long] =
    spark.read.parquet(s"$root/out").select("vec_id").as[Long].collect().toSet
  private def vecIds(root: String): Seq[Long] =
    spark.read.parquet(s"$root/vecs").select("vec_id").as[Long]
      .collect().sorted.toSeq

  test("banded streaming embedding dedup: within-batch, vs-corpus, and corpus growth across drains") {
    val root = Files.createTempDirectory("graft-estream").toString
    // standing corpus: one vector, band table absent — startup builds it
    Seq((0L, v1)).toDF("vec_id", "embedding").write.parquet(s"$root/vecs")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    // drain 1: corpus dup dropped, within-batch twins collapse to the
    // smaller id, novel vector survives
    mem.addData((10L, near(v1)), (11L, v2), (12L, near(v2)), (13L, v3))
    run(mem, root, bandPath = Some(s"$root/bands"))
    assert(sinkIds(root) == Set(11L, 13L), s"got ${sinkIds(root)}")

    // drain 2: near-dup of drain-1 survivor 11 dropped (corpus grew),
    // replay of 13 dropped by idempotency, novel vector survives
    mem.addData((20L, near(v2)), (13L, v3), (21L, v4))
    run(mem, root, bandPath = Some(s"$root/bands"))
    assert(sinkIds(root) == Set(11L, 13L, 21L), s"got ${sinkIds(root)}")

    // vector table carries corpus + accepted exactly once; band table
    // tracks it with one row per (id, band)
    assert(vecIds(root) == Seq(0L, 11L, 13L, 21L), s"got ${vecIds(root)}")
    val bandCounts = spark.read.parquet(s"$root/bands")
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(bandCounts.keySet == Set(0L, 11L, 13L, 21L), s"got $bandCounts")
    assert(bandCounts.values.forall(_ == bands.toLong), s"got $bandCounts")
  }

  test("banded results match the legacy derive-per-batch probe") {
    def drainBoth(root: String, banded: Boolean): Unit = {
      Seq((0L, v1)).toDF("vec_id", "embedding").write.parquet(s"$root/vecs")
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, Array[Float])]
      val bp = if (banded) Some(s"$root/bands") else None
      mem.addData((10L, near(v1)), (11L, v2), (12L, near(v2)), (13L, v3))
      run(mem, root, bandPath = bp)
      mem.addData((20L, near(v2)), (21L, v4))
      run(mem, root, bandPath = bp)
    }
    val legacy = Files.createTempDirectory("graft-estream-leg").toString
    val banded = Files.createTempDirectory("graft-estream-band").toString
    drainBoth(legacy, banded = false)
    drainBoth(banded, banded = true)
    assert(sinkIds(legacy) == sinkIds(banded) &&
      vecIds(legacy) == vecIds(banded),
      s"legacy ${sinkIds(legacy)}/${vecIds(legacy)} vs " +
        s"banded ${sinkIds(banded)}/${vecIds(banded)}")
    assert(sinkIds(banded) == Set(11L, 13L, 21L))
  }

  test("startup backfill repairs the sink->vec and vec->band crash windows together") {
    val root = Files.createTempDirectory("graft-estream-crash").toString
    // crash state: vector table carries 0 and 5, but the band table was
    // built before 5's append (vec->band gap); the sink carries 11 whose
    // vector append never ran (sink->vec gap)
    Seq((0L, v1)).toDF("vec_id", "embedding").write.parquet(s"$root/vecs")
    Similarity.writeEmbBandTable(spark.read.parquet(s"$root/vecs"),
      "vec_id", "embedding", s"$root/bands", bands, bits, dim)
    Seq((5L, v5)).toDF("vec_id", "embedding")
      .write.mode("append").parquet(s"$root/vecs")
    Seq((11L, v2)).toDF("vec_id", "embedding").write.parquet(s"$root/out")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    // 30 near-dups band-missing vector 5; 31 near-dups vec-missing sink
    // vector 11; 32 is novel — only 32 may survive, and only if BOTH
    // windows were repaired before the batch ran
    mem.addData((30L, near(v5)), (31L, near(v2)), (32L, v6))
    run(mem, root, bandPath = Some(s"$root/bands"))

    assert(sinkIds(root) == Set(11L, 32L), s"got ${sinkIds(root)}")
    assert(vecIds(root) == Seq(0L, 5L, 11L, 32L), s"got ${vecIds(root)}")
    val bandIds = spark.read.parquet(s"$root/bands")
      .select("id").distinct().as[Long].collect().sorted.toSeq
    assert(bandIds == Seq(0L, 5L, 11L, 32L), s"got $bandIds")
  }

  test("compaction boundary: results identical, vector and band tables rewritten") {
    def drainAll(root: String, compactAfter: Int): Unit = {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, Array[Float])]
      mem.addData((11L, v2), (13L, v3))
      run(mem, root, bandPath = Some(s"$root/bands"), compactAfter = compactAfter)
      // drain 2 must dedup 20 against the ACCEPTED-then-COMPACTED vector
      // of 11 — the boundary the test exists to cross — and accept 21
      mem.addData((20L, near(v2)), (21L, v4))
      run(mem, root, bandPath = Some(s"$root/bands"), compactAfter = compactAfter)
      // drain 3: one more accepted vector, so the uncompacted run
      // accumulates a third append file while the compacted run keeps
      // rewriting to the bounded defaultParallelism-file layout
      mem.addData((22L, v5))
      run(mem, root, bandPath = Some(s"$root/bands"), compactAfter = compactAfter)
    }
    val plain = Files.createTempDirectory("graft-estream-plain").toString
    val compacted = Files.createTempDirectory("graft-estream-compact").toString
    drainAll(plain, compactAfter = 0)
    drainAll(compacted, compactAfter = 1)
    def bandIds(root: String) = spark.read.parquet(s"$root/bands")
      .select("id").distinct().as[Long].collect().sorted.toSeq
    assert(sinkIds(plain) == sinkIds(compacted) &&
      vecIds(plain) == vecIds(compacted) &&
      bandIds(plain) == bandIds(compacted))
    assert(sinkIds(compacted) == Set(11L, 13L, 21L, 22L))
    def files(dir: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.startsWith("part-")) 1 else 0
      walk(new java.io.File(dir))
    }
    assert(files(s"$compacted/vecs") < files(s"$plain/vecs"),
      s"vecs compacted=${files(s"$compacted/vecs")} plain=${files(s"$plain/vecs")}")
    assert(files(s"$compacted/bands") < files(s"$plain/bands"),
      s"bands compacted=${files(s"$compacted/bands")} plain=${files(s"$plain/bands")}")
  }

  test("sink compaction boundary: idempotent replay preserved (embedding modality)") {
    // growCorpus = false: the sink anti-join is the only replay defense,
    // so the drain-2 replay crosses the compacted-sink boundary bare
    def drainAll(root: String, compactSink: Int): Unit = {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, Array[Float])]
      mem.addData((11L, v2), (13L, v3))
      run(mem, root, compactSink = compactSink, growCorpus = false)
      mem.addData((11L, v2), (30L, v5)) // replay 11 + novel 30
      run(mem, root, compactSink = compactSink, growCorpus = false)
      mem.addData((13L, v3), (31L, v6)) // replay 13 + novel 31, third append
      run(mem, root, compactSink = compactSink, growCorpus = false)
    }
    val plain = Files.createTempDirectory("graft-esink-plain").toString
    val compacted = Files.createTempDirectory("graft-esink-compact").toString
    drainAll(plain, compactSink = 0)
    drainAll(compacted, compactSink = 1)
    def rows(root: String) = spark.read.parquet(s"$root/out")
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(rows(plain) == rows(compacted),
      s"${rows(plain)} vs ${rows(compacted)}")
    assert(rows(compacted) == Seq(11L, 13L, 30L, 31L), s"got ${rows(compacted)}")
    def files(root: String) = new java.io.File(s"$root/out").listFiles()
      .count(_.getName.startsWith("part-"))
    assert(files(compacted) < files(plain),
      s"compacted=${files(compacted)} plain=${files(plain)}")
  }

  test("bootstraps with no pre-existing tables (legacy mode)") {
    val root = Files.createTempDirectory("graft-estream-boot").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    mem.addData((1L, v1), (2L, near(v1)))
    run(mem, root)
    assert(sinkIds(root) == Set(1L), s"got ${sinkIds(root)}")
    assert(spark.read.parquet(s"$root/vecs").count() == 1)
  }
}
