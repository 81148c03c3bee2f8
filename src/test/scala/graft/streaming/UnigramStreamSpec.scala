package graft.streaming

import graft.SparkSpec
import graft.operators.Unigram
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, length, lit}
import java.nio.file.Files

/** The streaming tokenizer-maintenance member of the standing-corpus
  * family: per-drain word-census deltas with batch-id provenance (the
  * CmsStream SUM protocol), wholesale EM re-fit on the growth trigger
  * under the next generation, generation-pinned encodes, and crash
  * windows repaired at startup. Headline gate: cross-drain maintenance
  * is BIT-EQUAL to a batch fit over the same census. */
class UnigramStreamSpec extends SparkSpec {
  import spark.implicits._

  private val P = UnigramStream.Params(maxPieceLen = 4, topN = 6,
    emIters = 2, maxWordLen = 16, growth = 2.0)

  // 20 tokens; "abab"-family words so multi-char pieces matter
  private val b0 = Seq(
    (1L, "abab abab cdcd abab cdcd"),
    (2L, "cdcd abab abab cdcd abab"),
    (3L, "abab cdcd cdcd abab cdcd"),
    (4L, "cdcd abab cdcd abab abab"))
  private val b1 = Seq((5L, "abab zq cdcd zq")) // 4 tokens: below trigger
  private val b2 = Seq( // 20 more tokens: 44 >= 2 * 20 — trigger
    (6L, "zqzq abab zqzq cdcd zqzq"),
    (7L, "abab zqzq abab zqzq cdcd"),
    (8L, "cdcd zqzq cdcd abab zqzq"),
    (9L, "zqzq cdcd zqzq abab abab"))

  private def drain(mem: MemoryStream[(Long, String)], root: String,
                    p: UnigramStream.Params = P): Unit =
    UnigramStream.run(spark, mem.toDF().toDF("doc_id", "text"),
      s"$root/census", s"$root/vocab", s"$root/ckpt",
      params = p).awaitTermination(180000)

  private def pieces(root: String): Set[(String, Long, Long)] =
    spark.read.parquet(s"$root/vocab").filter($"part" === "piece")
      .select($"piece", $"cnt", $"wt")
      .as[(String, Long, Long)].collect().toSet

  private def genOf(root: String): Long =
    spark.read.parquet(s"$root/vocab").filter($"part" === "meta")
      .select($"gen").as[Long].head()

  test("cross-drain maintenance is bit-equal to the batch fit: deltas " +
      "sum, the growth trigger re-fits under the next generation, and " +
      "the re-fit equals one fit over the merged census") {
    implicit val sqlCtx = spark.sqlContext
    val rootA = Files.createTempDirectory("graft-ustream-a").toString
    val memA = MemoryStream[(Long, String)]
    memA.addData(b0: _*); drain(memA, rootA) // gen-1 fit over b0
    assert(genOf(rootA) == 1L)
    val gen1 = pieces(rootA)
    val wantGen1 = Unigram.fitWeights(
        Unigram.wordCensus(b0.toDF("doc_id", "text"), "text", 16),
        4, 6, 2, 16)
      .as[(String, Long, Long)].collect().toSet
    assert(gen1 == wantGen1, "gen-1 fit != batch fit over b0")

    memA.addData(b1: _*); drain(memA, rootA) // 24 < 40: no re-fit
    assert(genOf(rootA) == 1L && pieces(rootA) == gen1,
      "sub-trigger drain must not change the vocabulary")

    memA.addData(b2: _*); drain(memA, rootA) // 44 >= 40: re-fit gen 2
    assert(genOf(rootA) == 2L)
    // bit-equal to one drain of everything (gen 1 there)
    val rootB = Files.createTempDirectory("graft-ustream-b").toString
    val memB = MemoryStream[(Long, String)]
    memB.addData((b0 ++ b1 ++ b2): _*); drain(memB, rootB)
    assert(pieces(rootA) == pieces(rootB),
      "cross-drain re-fit diverged from the single-drain fit")
    // and both equal the direct batch fit over the full corpus census
    val wantFull = Unigram.fitWeights(
        Unigram.wordCensus((b0 ++ b1 ++ b2).toDF("doc_id", "text"),
          "text", 16), 4, 6, 2, 16)
      .as[(String, Long, Long)].collect().toSet
    assert(pieces(rootA) == wantFull)
  }

  test("replayed census deltas cannot double counts: the batch-id " +
      "replica collapse keeps one copy") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-ustream-r").toString
    val mem = MemoryStream[(Long, String)]
    mem.addData(b0: _*); drain(mem, root)
    val before = UnigramStream
      .mergedCensus(spark.read.parquet(s"$root/census"))
      .as[(String, Long)].collect().toSet
    // a crash replay re-appends the bit-identical delta under the SAME
    // batch id
    val replay = spark.read.parquet(s"$root/census")
    replay.write.mode("append").parquet(s"$root/census")
    val after = UnigramStream
      .mergedCensus(spark.read.parquet(s"$root/census"))
      .as[(String, Long)].collect().toSet
    assert(after == before, "replayed delta doubled census counts")
    // and the merged census equals the corpus word census exactly
    val want = Unigram.wordCensus(b0.toDF("doc_id", "text"), "text", 16)
      .select($"w", $"cnt").as[(String, Long)].collect().toSet
    assert(after == want)
  }

  test("crash windows: a census whose triggered re-fit died re-fires " +
      "at startup, and a lost vocabulary refits from the census") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-ustream-c").toString
    val mem = MemoryStream[(Long, String)]
    mem.addData(b0: _*); drain(mem, root)
    assert(genOf(root) == 1L)
    // window 1: deltas landed (enough to trip growth) but the re-fit
    // crashed before the swap — simulate by appending the b2 delta
    // directly, leaving the gen-1 vocabulary in place
    Unigram.wordCensus(b2.toDF("doc_id", "text"), "text", 16)
      .select(lit(99L).as("batch_id"), col("w"), col("cnt"))
      .write.mode("append").parquet(s"$root/census")
    UnigramStream.repairAtStartup(spark, s"$root/census", s"$root/vocab", P)
    assert(genOf(root) == 2L, "startup growth check did not re-fire")
    val wantFull = Unigram.fitWeights(
        Unigram.wordCensus((b0 ++ b2).toDF("doc_id", "text"), "text", 16),
        4, 6, 2, 16)
      .as[(String, Long, Long)].collect().toSet
    assert(pieces(root) == wantFull, "startup re-fit diverged")
    // window 2: the vocabulary table is gone entirely (first fit died
    // before any swap) — startup refits generation 1 from the census
    val vocabDir = new java.io.File(s"$root/vocab")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(vocabDir)
    UnigramStream.repairAtStartup(spark, s"$root/census", s"$root/vocab", P)
    assert(genOf(root) == 1L && pieces(root) == wantFull,
      "missing-vocabulary repair diverged")
  }

  test("encodes serve from the standing generation and report it") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-ustream-e").toString
    val mem = MemoryStream[(Long, String)]
    mem.addData(b0: _*); drain(mem, root)
    val docs = b0.toDF("doc_id", "text")
      .withColumn("source", lit("s1"))
    val enc = UnigramStream.encodeStats(spark, docs, "text", "source",
      s"$root/vocab", P)
    val rows = enc.select($"source", $"words", $"chars", $"pieces", $"gen")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.length == 1 && rows.head._5 == 1L)
    val (_, words, chars, ps, _) = rows.head
    assert(words == 20L)
    assert(ps > 0L && ps < chars, "no compression under the fitted vocab")
    // the pinned encode equals the library path under the same weights
    val vocab = spark.read.parquet(s"$root/vocab")
      .filter($"part" === "piece").select($"piece", $"wt")
    val want = Unigram.encodeStatsWith(docs, "text", "source", vocab, 4, 16)
      .select($"source", $"words", $"chars", $"pieces")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(rows.map(r => (r._1, r._2, r._3, r._4)).toSet == want)
  }
}
