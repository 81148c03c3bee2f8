package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill in the afternoon sun"
  private val other =
    "completely different content about spark query engines shuffles and the art of distributed deduplication"

  test("streaming dedup: within-batch, vs-corpus, and corpus growth across drains") {
    val root = Files.createTempDirectory("graft-dstream").toString
    val (sigPath, outPath) = (s"$root/sigs", s"$root/out")

    // standing corpus: one doc, signatures precomputed (the batch path)
    Dedup.minhashSignatures(
        Seq((0L, base)).toDF("doc_id", "text"), "doc_id", "text")
      .write.parquet(sigPath)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")

    // drain 1: corpus dup dropped, within-batch twins collapse to one,
    // novel doc survives
    mem.addData(
      (10L, base + " today"),        // near-dup of corpus doc 0
      (11L, other), (12L, other),    // within-batch twins -> keep 11
      (13L, "a genuinely novel document that matches nothing else at all"))
    DedupStream.run(spark, docs, sigPath, outPath, s"$root/ckpt",
      threshold = 0.6).awaitTermination(120000)

    val kept1 = spark.read.parquet(outPath)
      .select("doc_id").as[Long].collect().toSet
    assert(kept1 == Set(11L, 13L), s"got $kept1")

    // drain 2: a near-dup of drain-1 survivor 11 must now be dropped
    // (the corpus grew), a replay of 13 is dropped by idempotency, and
    // a new novel doc survives
    mem.addData(
      (20L, other + " addendum"),    // near-dup of accepted doc 11
      (13L, "a genuinely novel document that matches nothing else at all"),
      (21L, "yet another unrelated document closing out the second batch"))
    DedupStream.run(spark, docs, sigPath, outPath, s"$root/ckpt",
      threshold = 0.6).awaitTermination(120000)

    val kept2 = spark.read.parquet(outPath)
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == Set(11L, 13L, 21L), s"got $kept2")

    // signature table carries corpus + all accepted docs exactly once
    val sigIds = spark.read.parquet(sigPath)
      .select("id").as[Long].collect().sorted.toSeq
    assert(sigIds == Seq(0L, 11L, 13L, 21L), s"got $sigIds")
  }

  test("compaction boundary: dedup results identical, signature files rewritten") {
    // two identical runs, one compacting after every append (threshold 1)
    def drainAll(root: String, compactAfter: Int): Unit = {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val docs = mem.toDF().toDF("doc_id", "text")
      // drain 1 accepts 11 and 13; drain 2 must dedup 20 against the
      // ACCEPTED-and-then-compacted signature of 11 — the boundary the
      // test exists to cross — and accept 21
      mem.addData((11L, other),
        (13L, "a genuinely novel document that matches nothing else at all"))
      DedupStream.run(spark, docs, s"$root/sigs", s"$root/out",
        s"$root/ckpt", threshold = 0.6,
        compactSigsAfterFiles = compactAfter).awaitTermination(120000)
      mem.addData((20L, other + " addendum"),
        (21L, "yet another unrelated document closing out the second batch"))
      DedupStream.run(spark, docs, s"$root/sigs", s"$root/out",
        s"$root/ckpt", threshold = 0.6,
        compactSigsAfterFiles = compactAfter).awaitTermination(120000)
      // drain 3 gives the plain run a third signature append so the
      // file-count delta below is observable regardless of how many
      // files each small append happens to produce
      mem.addData((30L, "one final novel document for the third and final drain"))
      DedupStream.run(spark, docs, s"$root/sigs", s"$root/out",
        s"$root/ckpt", threshold = 0.6,
        compactSigsAfterFiles = compactAfter).awaitTermination(120000)
    }
    val plain = Files.createTempDirectory("graft-dstream-plain").toString
    val compacted = Files.createTempDirectory("graft-dstream-compact").toString
    drainAll(plain, compactAfter = 0)
    drainAll(compacted, compactAfter = 1)
    def state(root: String) = (
      spark.read.parquet(s"$root/out").select("doc_id").as[Long].collect().toSet,
      spark.read.parquet(s"$root/sigs").select("id").as[Long].collect().sorted.toSeq)
    assert(state(plain) == state(compacted),
      s"${state(plain)} vs ${state(compacted)}")
    assert(state(compacted)._1 == Set(11L, 13L, 21L, 30L))
    // the compacted table was actually rewritten: a curated single run of
    // files, not one append per batch
    def files(root: String) = new java.io.File(s"$root/sigs").listFiles()
      .count(_.getName.startsWith("part-"))
    assert(files(compacted) < files(plain),
      s"compacted=${files(compacted)} plain=${files(plain)}")
  }

  test("sink compaction boundary: idempotent replay preserved, sink rewritten to curated files") {
    // growCorpus = false isolates the property under test: with no
    // signature growth, the idempotent anti-join against the sink is the
    // ONLY thing standing between a replayed micro-batch and duplicate
    // survivor rows — so the replay in drain 2 crosses the
    // compacted-sink boundary with nothing else to save it
    def drainAll(root: String, compactSink: Int): Unit = {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val docs = mem.toDF().toDF("doc_id", "text")
      mem.addData((11L, other),
        (13L, "a genuinely novel document that matches nothing else at all"))
      DedupStream.run(spark, docs, s"$root/sigs", s"$root/out",
        s"$root/ckpt", threshold = 0.6, growCorpus = false,
        compactSinkAfterFiles = compactSink).awaitTermination(120000)
      // drain 2 REPLAYS survivor 11 and offers novel 30
      mem.addData((11L, other),
        (30L, "yet another unrelated document closing out the replay run"))
      DedupStream.run(spark, docs, s"$root/sigs", s"$root/out",
        s"$root/ckpt", threshold = 0.6, growCorpus = false,
        compactSinkAfterFiles = compactSink).awaitTermination(120000)
      // drain 3 replays across ANOTHER compaction boundary (and gives the
      // plain run a third append, so the file-count delta is observable)
      mem.addData((13L, "a genuinely novel document that matches nothing else at all"),
        (31L, "one final novel document for the third and final drain"))
      DedupStream.run(spark, docs, s"$root/sigs", s"$root/out",
        s"$root/ckpt", threshold = 0.6, growCorpus = false,
        compactSinkAfterFiles = compactSink).awaitTermination(120000)
    }
    val plain = Files.createTempDirectory("graft-dsink-plain").toString
    val compacted = Files.createTempDirectory("graft-dsink-compact").toString
    drainAll(plain, compactSink = 0)
    drainAll(compacted, compactSink = 1)
    // multiset compare: the replayed 11 must appear exactly ONCE — a
    // compaction that broke the anti-join would duplicate it
    def rows(root: String) = spark.read.parquet(s"$root/out")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(rows(plain) == rows(compacted),
      s"${rows(plain)} vs ${rows(compacted)}")
    assert(rows(compacted) == Seq(11L, 13L, 30L, 31L), s"got ${rows(compacted)}")
    // and the sink really was rewritten to fewer files
    def files(root: String) = new java.io.File(s"$root/out").listFiles()
      .count(_.getName.startsWith("part-"))
    assert(files(compacted) < files(plain),
      s"compacted=${files(compacted)} plain=${files(plain)}")
  }

  test("startup backfill closes the survivors-committed/signatures-missing crash window") {
    val root = Files.createTempDirectory("graft-dstream-crash").toString
    val (sigPath, outPath) = (s"$root/sigs", s"$root/out")
    // simulate the crash: doc 11 committed to the survivor sink, but the
    // process died before its signature append — the signature table
    // only carries the original corpus doc 0
    Dedup.minhashSignatures(
        Seq((0L, base)).toDF("doc_id", "text"), "doc_id", "text")
      .write.parquet(sigPath)
    Seq((11L, other)).toDF("doc_id", "text").write.parquet(outPath)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    // without the backfill, 20 (near-dup of sink doc 11) would pass
    // dedup forever; 21 is novel and must still survive
    mem.addData((20L, other + " addendum"),
      (21L, "yet another unrelated document closing out the second batch"))
    DedupStream.run(spark, mem.toDF().toDF("doc_id", "text"),
      sigPath, outPath, s"$root/ckpt",
      threshold = 0.6).awaitTermination(120000)

    val kept = spark.read.parquet(outPath)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L, 21L), s"got $kept")
    // the repaired signature table covers the sink exactly
    val sigIds = spark.read.parquet(sigPath)
      .select("id").as[Long].collect().sorted.toSeq
    assert(sigIds == Seq(0L, 11L, 21L), s"got $sigIds")
  }

  test("banded mode: same results as the legacy probe across drains; " +
       "band table tracks the signature table") {
    val root = Files.createTempDirectory("graft-dstream-band").toString
    val (sigPath, outPath) = (s"$root/sigs", s"$root/out")
    val bandPath = s"$root/bands"
    // corpus signatures exist but no band table: startup must build it
    Dedup.minhashSignatures(
        Seq((0L, base)).toDF("doc_id", "text"), "doc_id", "text")
      .write.parquet(sigPath)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    // same two-drain scenario as the legacy test — results must match
    mem.addData(
      (10L, base + " today"),
      (11L, other), (12L, other),
      (13L, "a genuinely novel document that matches nothing else at all"))
    DedupStream.run(spark, docs, sigPath, outPath, s"$root/ckpt",
      threshold = 0.6, bandPath = Some(bandPath)).awaitTermination(120000)
    mem.addData(
      (20L, other + " addendum"),
      (13L, "a genuinely novel document that matches nothing else at all"),
      (21L, "yet another unrelated document closing out the second batch"))
    DedupStream.run(spark, docs, sigPath, outPath, s"$root/ckpt",
      threshold = 0.6, bandPath = Some(bandPath)).awaitTermination(120000)

    val kept = spark.read.parquet(outPath)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L, 13L, 21L), s"got $kept")
    // the band table carries exactly the signature ids, each with one
    // row per band — the per-batch appends kept it in sync
    val sigIds = spark.read.parquet(sigPath)
      .select("id").as[Long].collect().sorted.toSeq
    assert(sigIds == Seq(0L, 11L, 13L, 21L), s"got $sigIds")
    val bandCounts = spark.read.parquet(bandPath)
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(bandCounts.keySet == sigIds.toSet, s"got ${bandCounts.keySet}")
    assert(bandCounts.values.forall(_ == 16L), s"got $bandCounts")
  }

  test("banded startup backfill repairs the sink->sig and sig->band " +
       "crash windows together") {
    val root = Files.createTempDirectory("graft-dstream-bandcrash").toString
    val (sigPath, outPath) = (s"$root/sigs", s"$root/out")
    val bandPath = s"$root/bands"
    // crash state: signatures carry docs 0 and 5, but the band table was
    // built before 5's append (sig->band gap); the sink carries doc 11
    // whose signature append never ran (sink->sig gap)
    Dedup.minhashSignatures(
        Seq((0L, base)).toDF("doc_id", "text"), "doc_id", "text")
      .write.parquet(sigPath)
    Dedup.writeBandTable(spark.read.parquet(sigPath), bandPath)
    Dedup.minhashSignatures(
        Seq((5L, "an older accepted document about distributed systems and storage engines")).toDF("doc_id", "text"),
        "doc_id", "text")
      .write.mode("append").parquet(sigPath)
    Seq((11L, other)).toDF("doc_id", "text").write.parquet(outPath)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    // 30 near-dups band-missing doc 5; 31 near-dups sig-missing sink doc
    // 11; 32 is novel — only 32 may survive, and only if BOTH windows
    // were repaired before the batch ran
    mem.addData(
      (30L, "an older accepted document about distributed systems and storage engines indeed"),
      (31L, other + " addendum"),
      (32L, "yet another unrelated document closing out the second batch"))
    DedupStream.run(spark, mem.toDF().toDF("doc_id", "text"),
      sigPath, outPath, s"$root/ckpt",
      threshold = 0.6, bandPath = Some(bandPath)).awaitTermination(120000)

    val kept = spark.read.parquet(outPath)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L, 32L), s"got $kept")
    val sigIds = spark.read.parquet(sigPath)
      .select("id").as[Long].collect().sorted.toSeq
    assert(sigIds == Seq(0L, 5L, 11L, 32L), s"got $sigIds")
    val bandIds = spark.read.parquet(bandPath)
      .select("id").distinct().as[Long].collect().sorted.toSeq
    assert(bandIds == sigIds, s"got $bandIds")
  }

  test("banded compaction boundary: results identical, band table rebuilt") {
    def drainAll(root: String, compactAfter: Int): Unit = {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val docs = mem.toDF().toDF("doc_id", "text")
      mem.addData((11L, other),
        (13L, "a genuinely novel document that matches nothing else at all"))
      DedupStream.run(spark, docs, s"$root/sigs", s"$root/out",
        s"$root/ckpt", threshold = 0.6, compactSigsAfterFiles = compactAfter,
        bandPath = Some(s"$root/bands")).awaitTermination(120000)
      mem.addData((20L, other + " addendum"),
        (21L, "yet another unrelated document closing out the second batch"))
      DedupStream.run(spark, docs, s"$root/sigs", s"$root/out",
        s"$root/ckpt", threshold = 0.6, compactSigsAfterFiles = compactAfter,
        bandPath = Some(s"$root/bands")).awaitTermination(120000)
    }
    val plain = Files.createTempDirectory("graft-dstream-bplain").toString
    val compacted = Files.createTempDirectory("graft-dstream-bcompact").toString
    drainAll(plain, compactAfter = 0)
    drainAll(compacted, compactAfter = 1)
    def state(root: String) = (
      spark.read.parquet(s"$root/out").select("doc_id").as[Long].collect().toSet,
      spark.read.parquet(s"$root/sigs").select("id").as[Long].collect().sorted.toSeq,
      spark.read.parquet(s"$root/bands").select("id").distinct()
        .as[Long].collect().sorted.toSeq)
    assert(state(plain) == state(compacted),
      s"${state(plain)} vs ${state(compacted)}")
    assert(state(compacted)._1 == Set(11L, 13L, 21L))
    // the band table was actually rebuilt into a clean run of files
    def bandFiles(root: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.startsWith("part-")) 1 else 0
      walk(new java.io.File(s"$root/bands"))
    }
    assert(bandFiles(compacted) < bandFiles(plain),
      s"compacted=${bandFiles(compacted)} plain=${bandFiles(plain)}")
  }

  test("streaming dedup bootstraps with no pre-existing signature table") {
    val root = Files.createTempDirectory("graft-dstream-boot").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, base), (2L, base + " again"))
    DedupStream.run(spark, mem.toDF().toDF("doc_id", "text"),
      s"$root/sigs", s"$root/out", s"$root/ckpt",
      threshold = 0.6).awaitTermination(120000)
    val kept = spark.read.parquet(s"$root/out")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), s"got $kept")
    assert(spark.read.parquet(s"$root/sigs").count() == 1)
  }
}
