package graft.pipeline

import graft.SparkSpec
import java.nio.file.Files

/** The hybrid-retrieval serving composition: BM25 ∥ graph-ANN → RRF →
  * MaxSim re-rank, gated on the complementarity case the stack exists
  * for — a document that tops NEITHER single retriever but fuses above
  * every single-list champion, then wins the exact re-rank. */
class RagPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ev(x0: Double, x1: Double, ax: Int = -1): Array[Float] = {
    val a = Array.fill(64)(0.0f)
    a(0) = x0.toFloat; a(1) = x1.toFloat
    if (ax >= 0) a(ax) = 1.0f
    a
  }

  // doc 1: lexical champion (dense-invisible); doc 2: dense champion
  // (no query terms); doc 3: the VICTIM — mid-list in both retrievers,
  // token-identical to the query; docs 4-8: one-term fillers
  private def docs = Seq(
    (1L, "alpha beta alpha beta alpha beta alpha beta"),
    (2L, "gamma delta gamma delta"),
    (3L, "alpha beta noise words here"),
    (4L, "alpha filler4 fillerx fillery"),
    (5L, "alpha filler5 fillerx fillery"),
    (6L, "alpha filler6 fillerx fillery"),
    (7L, "alpha filler7 fillerx fillery"),
    (8L, "alpha filler8 fillerx fillery")
  ).toDF("doc_id", "text")

  private def docEmb = Seq(
    (1L, ev(0.10, 0.0, 10)), (2L, ev(0.99, 0.141)), (3L, ev(0.95, 0.312)),
    (4L, ev(0.25, 0.0, 20)), (5L, ev(0.24, 0.0, 21)),
    (6L, ev(0.23, 0.0, 22)), (7L, ev(0.22, 0.0, 23)),
    (8L, ev(0.21, 0.0, 24))
  ).toDF("doc_id", "embedding")

  private def queries = Seq((100L, "alpha beta")).toDF("query_id", "text")
  private def queryEmb = Seq((100L, ev(1.0, 0.0)))
    .toDF("query_id", "embedding")

  private def docTokens = Seq(
    (1L, 0, Array(5, 0, 0, 0)), (1L, 1, Array(0, 5, 0, 0)),
    (2L, 0, Array(0, 0, 10, 0)),
    (3L, 0, Array(10, 0, 0, 0)), (3L, 1, Array(0, 10, 0, 0)),
    (4L, 0, Array(0, 0, 0, 10)), (5L, 0, Array(0, 0, 0, 10)),
    (6L, 0, Array(0, 0, 0, 10)), (7L, 0, Array(0, 0, 0, 10)),
    (8L, 0, Array(0, 0, 0, 10))
  ).toDF("doc_id", "token_idx", "q")
  private def queryTokens = Seq(
    (100L, 0, Array(10, 0, 0, 0)), (100L, 1, Array(0, 10, 0, 0))
  ).toDF("query_id", "token_idx", "q")

  private def runOnce(root: String): RagPipeline.Result =
    RagPipeline.run(spark, docs, queries, docEmb, queryEmb, docTokens,
      queryTokens, root, lexK = 3, denseK = 3, fuseK = 3, finalK = 3,
      knnK = 4, cells = 8, rounds = 2, beam = 8, steps = 2)

  test("the victim tops NEITHER retriever, wins the fusion, and wins " +
      "the exact re-rank; every stage writes its audited list") {
    val root = Files.createTempDirectory("graft-rag").toString
    val res = runOnce(root)
    val lex = spark.read.parquet(s"$root/s1_lexical")
      .select($"doc_id", $"rank").as[(Long, Int)].collect().toMap
    assert(lex.find(_._2 == 1).map(_._1).contains(1L),
      s"lexical champion must top BM25: $lex")
    assert(lex(3L) > 1, "victim must NOT top the lexical list")
    assert(!lex.contains(2L), "the dense champion has no query terms")
    val dense = spark.read.parquet(s"$root/s2_dense")
      .select($"doc_id", $"rank").as[(Long, Int)].collect().toMap
    assert(dense.find(_._2 == 1).map(_._1).contains(2L),
      s"dense champion must top the walk: $dense")
    assert(dense(3L) > 1, "victim must NOT top the dense list")
    val fused = spark.read.parquet(s"$root/s3_fused")
      .select($"doc_id", $"rank").as[(Long, Int)].collect().toMap
    assert(fused.find(_._2 == 1).map(_._1).contains(3L),
      s"only the hybrid fusion surfaces the victim first: $fused")
    val top = spark.read.parquet(res.outPath)
      .select($"doc_id", $"rank", $"maxsim").as[(Long, Int, Long)]
      .collect().sortBy(_._2)
    assert(top.head._1 == 3L, s"re-rank must keep the victim first: " +
      top.mkString(", "))
    assert(top.head._3 == 200L, "victim MaxSim must be the exact 200")
    // ledger: every stage audited, the answer is the finalK pool
    assert(res.rowsOf("s1_lexical") >= 3L &&
      res.rowsOf("s2_dense") == 3L && res.rowsOf("s3_fused") == 3L &&
      res.rowsOf("s4_reranked") == 3L, res.audits.toString)
  }

  test("the pipeline is deterministic: two runs produce identical " +
      "re-ranked answers") {
    val a = Files.createTempDirectory("graft-rag-a").toString
    val b = Files.createTempDirectory("graft-rag-b").toString
    runOnce(a); runOnce(b)
    val ra = spark.read.parquet(s"$a/s4_reranked")
      .select($"query_id", $"doc_id", $"rank").as[(Long, Long, Int)]
      .collect().toSet
    val rb = spark.read.parquet(s"$b/s4_reranked")
      .select($"query_id", $"doc_id", $"rank").as[(Long, Long, Int)]
      .collect().toSet
    assert(ra == rb && ra.nonEmpty)
  }
}
