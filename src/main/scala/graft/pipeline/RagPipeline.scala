package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Retrieval, Similarity}
import graft.zones.Zones

/** End-to-end HYBRID RETRIEVAL serving (VERDICT r12 #7) — the
  * serving-side sibling of [[CurationPipeline]]: the proven retrieval
  * operators chained into one driver, proving they COMPOSE rather than
  * merely pass their gates individually —
  *
  *   BM25 lexical top-k (q139) ∥ graph-ANN dense top-k (q205+q214)
  *   → reciprocal-rank fusion (q144) → MaxSim late-interaction
  *   re-rank over the fused candidates only (q152)
  *
  * — the standard two-tower + fusion + late-interaction stack
  * (Cormack et al. 2009 RRF; Khattab & Zaharia 2020 ColBERT). The
  * pipeline exists for the complementarity case the spec plants: a
  * document that tops NEITHER single retriever but appears mid-list in
  * BOTH out-fuses every single-list champion (two 1/(K+r) contributions
  * beat one), and the exact token-level re-rank then orders the fused
  * pool by what actually matches.
  *
  * Every stage materializes to `outRoot/<stage>` with its row count
  * riding the write ([[Observe.countedAction]] — the CurationPipeline
  * audit-trail contract): lexical and dense lists, the fused pool, and
  * the re-ranked answer are all restart points AND the per-stage
  * evidence a retrieval-quality review asks for first.
  *
  * 100 TB shape: each stage keeps its own proven plan (BM25's one
  * term-keyed exchange; the serving walk's corpus-size-independent
  * beam; RRF over top-k-per-query rows only), and the MaxSim re-rank
  * runs over the FUSED CANDIDATES' token bags, not the corpus — the
  * ANN-preselect-then-exact-rerank contract the q152 scaladoc
  * promises.
  */
object RagPipeline {

  final case class StageAudit(stage: String, rows: Long)
  final case class Result(audits: Seq[StageAudit], outPath: String) {
    def rowsOf(stage: String): Long =
      audits.find(_.stage == stage).map(_.rows)
        .getOrElse(throw new NoSuchElementException(stage))
  }

  /** @param docs          corpus: `idCol`, `textCol`
    * @param queries       serving batch: (query_id, `textCol`)
    * @param docEmbeddings (`idCol`, embedding) per doc
    * @param queryEmbeddings (query_id, embedding) per query
    * @param docTokens     (doc_id, token_idx, q) int8 token codes
    * @param queryTokens   (query_id, token_idx, q) int8 token codes
    * @param lexK/denseK   per-retriever list depth
    * @param fuseK         fused-pool depth (the re-rank candidate set)
    * @param finalK        answer depth after the MaxSim re-rank */
  def run(spark: SparkSession, docs: DataFrame, queries: DataFrame,
          docEmbeddings: DataFrame, queryEmbeddings: DataFrame,
          docTokens: DataFrame, queryTokens: DataFrame, outRoot: String,
          idCol: String = "doc_id", textCol: String = "text",
          lexK: Int = 8, denseK: Int = 8, fuseK: Int = 8, finalK: Int = 5,
          rrfK: Int = 60, knnK: Int = 4, cells: Int = 4, rounds: Int = 2,
          beam: Int = 8, steps: Int = 3): Result = {
    val audits = scala.collection.mutable.ArrayBuffer.empty[StageAudit]
    def stage(name: String, df: DataFrame,
              sortCols: Seq[String]): DataFrame = {
      val path = s"$outRoot/$name"
      val n = Observe.countedAction(spark, df, name)(d =>
        Zones.writeCurated(d, path, partitionCols = Seq.empty,
          sortCols = sortCols, maxRecordsPerFile = 10000000L,
          cluster = false))
      audits += StageAudit(name, n)
      spark.read.parquet(path)
    }

    // 1. lexical: BM25 over terms drawn from the query text itself
    val queryTerms = queries.select(col("query_id"),
      explode(TextFunctions.tokens(
        TextFunctions.normalizeWs(col(textCol)))).as("term"))
    val lex = stage("s1_lexical",
      Retrieval.bm25TopK(docs, idCol, textCol, queryTerms, lexK),
      Seq("query_id", "rank"))

    // 2. dense: the graph-ANN serving walk over the corpus embeddings
    val graph = Similarity.nnDescentKnn(docEmbeddings, idCol, "embedding",
      knnK, cells, rounds)
    val dense = stage("s2_dense",
      Similarity.nnDescentSearch(graph, docEmbeddings, idCol, "embedding",
          queryEmbeddings, "query_id", "embedding", denseK, cells, beam,
          steps)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("cos"), col("rank")),
      Seq("query_id", "rank"))

    // 3. hybrid fusion: ranks only, no score calibration across the
    // heterogeneous retrievers
    val fused = stage("s3_fused",
      Retrieval.rrfFuse(Seq(
        lex.select(col("query_id"), col("doc_id"), col("rank")),
        dense.select(col("query_id"), col("doc_id"), col("rank"))),
        kConst = rrfK, topK = fuseK),
      Seq("query_id", "rank"))

    // 4. exact late-interaction re-rank over the fused candidates ONLY:
    // token bags of non-candidates never enter the scoring pass
    val candTokens = docTokens.join(
      fused.select(col("doc_id")).distinct(), Seq("doc_id"), "left_semi")
    val sims = Retrieval.maxSimTopK(candTokens, queryTokens,
      topK = Int.MaxValue)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("maxsim").desc, col("doc_id"))
    stage("s4_reranked",
      fused.select(col("query_id"), col("doc_id"), col("rrf"))
        .join(sims.select(col("query_id"), col("doc_id"), col("maxsim")),
          Seq("query_id", "doc_id"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= finalK),
      Seq("query_id", "rank"))
    Result(audits.toSeq, s"$outRoot/s4_reranked")
  }
}
