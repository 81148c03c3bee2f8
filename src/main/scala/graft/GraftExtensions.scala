package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.expressions.{CosineSimilarity, EmbeddingQuantStats, HashedCharShingles, HtmlEntityDecode, MinHashSignature, NfcNormalize, RepetitionStats, SentimentScore, SimHash64, SortedArrayJaccard, TextStats, Utf8Stats, WordNgramHashes, WordNgramStrings}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql` users get them too:
  *
  *   spark.sql("SELECT simhash64(split(text, ' ')) FROM docs")
  *   spark.sql("SELECT minhash_signature(hashed_char_shingles(text, 5), 128)")
  *   spark.sql("SELECT sorted_array_jaccard(a, b)")
  *
  * Activate with
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * or `.withExtensions(new GraftExtensions)`.
  */
object GraftExtensions {
  /** Register the same functions on an already-built session (temp
    * functions in its FunctionRegistry) — for notebook/REPL use where the
    * session exists before the library is on the classpath. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("hashed_char_shingles",
      exprs => HashedCharShingles(exprs.head, exprs(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(s"shingle size must be a literal, got $other")
      }), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_signature",
      exprs => MinHashSignature(exprs.head, exprs(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(s"k must be a literal, got $other")
      }, 42L), "scala_udf")
    reg.createOrReplaceTempFunction("sorted_array_jaccard",
      exprs => SortedArrayJaccard(exprs.head, exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("repetition_stats",
      exprs => RepetitionStats(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_similarity",
      exprs => CosineSimilarity(exprs.head, exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("sentiment_score",
      exprs => SentimentScore(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("text_stats",
      exprs => TextStats(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("nfc_normalize",
      exprs => NfcNormalize(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("utf8_stats",
      exprs => Utf8Stats(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("html_entity_decode",
      exprs => HtmlEntityDecode(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("word_ngram_strings",
      exprs => WordNgramStrings(exprs.head, exprs(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(s"n must be a literal, got $other")
      }), "scala_udf")
    reg.createOrReplaceTempFunction("word_ngram_hashes",
      exprs => WordNgramHashes(exprs.head, exprs(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(s"n must be a literal, got $other")
      }), "scala_udf")
    // typed-Aggregator UDAFs register through the udf interface (k is
    // baked into the registered name — SQL has no ctor parameters):
    //   SELECT kmv_sketch_256(h) ... GROUP BY g
    spark.udf.register("kmv_sketch_256",
      org.apache.spark.sql.functions.udaf(
        new graft.functions.KmvAggregator(256)))
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)))

    ext.injectFunction((
      FunctionIdentifier("hashed_char_shingles"),
      new ExpressionInfo(classOf[HashedCharShingles].getName, "hashed_char_shingles"),
      (args: Seq[Expression]) =>
        HashedCharShingles(args.head, intLit(args(1), "shingle size"))))

    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => MinHashSignature(args.head,
        intLit(args(1), "k"),
        if (args.length > 2) longLit(args(2), "seed") else 42L)))

    ext.injectFunction((
      FunctionIdentifier("sorted_array_jaccard"),
      new ExpressionInfo(classOf[SortedArrayJaccard].getName, "sorted_array_jaccard"),
      (args: Seq[Expression]) => SortedArrayJaccard(args.head, args(1))))

    ext.injectFunction((
      FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      (args: Seq[Expression]) => RepetitionStats(args.head)))

    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => CosineSimilarity(args.head, args(1))))

    ext.injectFunction((
      FunctionIdentifier("sentiment_score"),
      new ExpressionInfo(classOf[SentimentScore].getName, "sentiment_score"),
      (args: Seq[Expression]) => SentimentScore(args.head)))

    ext.injectFunction((
      FunctionIdentifier("text_stats"),
      new ExpressionInfo(classOf[TextStats].getName, "text_stats"),
      (args: Seq[Expression]) => TextStats(args.head)))

    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => NfcNormalize(args.head)))

    ext.injectFunction((
      FunctionIdentifier("utf8_stats"),
      new ExpressionInfo(classOf[Utf8Stats].getName, "utf8_stats"),
      (args: Seq[Expression]) => Utf8Stats(args.head)))

    ext.injectFunction((
      FunctionIdentifier("html_entity_decode"),
      new ExpressionInfo(classOf[HtmlEntityDecode].getName, "html_entity_decode"),
      (args: Seq[Expression]) => HtmlEntityDecode(args.head)))

    ext.injectFunction((
      FunctionIdentifier("word_ngram_strings"),
      new ExpressionInfo(classOf[WordNgramStrings].getName, "word_ngram_strings"),
      (args: Seq[Expression]) =>
        WordNgramStrings(args.head, intLit(args(1), "n"))))

    ext.injectFunction((
      FunctionIdentifier("word_ngram_hashes"),
      new ExpressionInfo(classOf[WordNgramHashes].getName, "word_ngram_hashes"),
      (args: Seq[Expression]) =>
        WordNgramHashes(args.head, intLit(args(1), "n"))))

    ext.injectFunction((
      FunctionIdentifier("embedding_quant_stats"),
      new ExpressionInfo(classOf[EmbeddingQuantStats].getName, "embedding_quant_stats"),
      (args: Seq[Expression]) => EmbeddingQuantStats(args.head)))
  }
}
