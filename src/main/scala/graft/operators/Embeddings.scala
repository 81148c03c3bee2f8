package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column utilities for training pipelines: L2 normalization,
  * symmetric int8 quantization (the storage/serving format ANN indexes
  * ship), and corpus-level per-dimension statistics (the input to
  * whitening / scaling decisions).
  *
  * Per-row ops are pure map transforms in double precision (float inputs
  * widen exactly, so results are engine-reproducible). [[dimStats]]
  * explodes to (dim, value) pairs whose partial aggregation collapses to
  * `dims` rows per task BEFORE the only shuffle — at 100 TB the shuffle
  * moves dims × tasks tiny rows, never the vectors.
  */
object Embeddings {

  /** L2 norm in double precision (sequential fold, deterministic). */
  def l2Norm(v: Column): Column = Similarity.norm(Similarity.asDouble(v))

  /** Unit-normalize; the zero vector maps to zeros (not NaN). */
  def l2Normalize(v: Column): Column = {
    val d = Similarity.asDouble(v)
    val n = Similarity.norm(d)
    // norm rides into the lambda via array_repeat + zip_with: a HOF
    // lambda re-evaluates a captured non-attribute child per ELEMENT
    // (HOFs are CodegenFallback), so `x => x / n` recomputed the full
    // O(dims) norm reduction per dimension — O(dims^2) per row.
    // array_repeat evaluates the norm exactly once per row.
    when(n === 0.0, d).otherwise(
      zip_with(d, array_repeat(n, size(d)), (x, nn) => x / nn))
  }

  /** Symmetric per-vector int8 quantization:
    * struct<scale double, q array<int>> with q_i = floor(x_i / scale * 127
    * + 0.5) in [-127, 127] (half-up rounding — floor(x+0.5) — so the
    * rounding rule is reproducible across engines, unlike round-half-even
    * `rint`). The zero vector quantizes to zeros with scale 0. */
  def quantizeInt8(v: Column): Column = {
    val d = Similarity.asDouble(v)
    val scale = array_max(transform(d, x => abs(x)))
    // Same capture-safety rule as [[l2Normalize]]: scale is an O(dims)
    // reduction and must not be re-evaluated per element inside the
    // quantization lambda.
    struct(scale.as("scale"),
      when(scale === 0.0, transform(d, x => lit(0)))
        .otherwise(zip_with(d, array_repeat(scale, size(d)),
          (x, s) => floor(x / s * 127.0 + 0.5).cast("int")))
        .as("q"))
  }

  /** [[l2Norm]] + [[quantizeInt8]] + max dequantization error fused into
    * ONE codegen'd pass: struct<norm, scale, q, max_err>. Semantically
    * identical to composing the declarative pieces (equivalence pinned in
    * EmbeddingsSpec), but the declarative chain re-evaluates its
    * interpreted higher-order functions once per consuming column after
    * projection collapse — this computes the bundle once per row. Use
    * this form when a query reads more than one of the fields. */
  def quantStats(v: Column): Column =
    graft.expressions.EmbeddingQuantStats(v)

  /** Inverse of [[quantizeInt8]]: x̂_i = (q_i * scale) / 127. */
  def dequantizeInt8(quantized: Column): Column = {
    val scale = quantized.getField("scale")
    transform(quantized.getField("q"),
      q => (q.cast("double") * scale) / 127.0)
  }

  /** Feature-hashed document vectors — the "hashing trick" (Weinberger
    * et al. 2009; Vowpal Wabbit's representation): token t contributes
    * sign(t)·1 per occurrence to dimension hash(t) mod dims, giving a
    * fixed-width vector with NO vocabulary and NO fit pass — the
    * text→vector bridge that feeds a corpus into the engine's ANN /
    * clustering / dedup column when no trained embedder is in the loop
    * (the signed hash keeps collision noise zero-mean, the paper's
    * trick). Hash = the engine's standard replayable 48-bit sha256
    * prefix ([[graft.functions.KmvAggregator.kmvHash]] of the token);
    * dim = h mod dims; sign = parity of ⌊h / dims⌋ (the next bit up,
    * independent of the dim bits for power-of-two dims).
    *
    * Returns (id, n_tok, norm2, vec_csv) with the vector serialized as
    * ordered CSV (the q41 list-column precedent) and norm2 = Σ v_d² —
    * both integer-exact, so the whole construction replays in the
    * q194 oracle.
    *
    * 100 TB shape: ONE map-only pass — tokens are hashed and
    * accumulated into the dims-long array inside the row, so nothing
    * (tokens or vectors) crosses a shuffle; downstream consumers chain
    * the usual quantize/LSH/IVF operators. Tokenization is the
    * engine-standard whitespace rule (trim, split \\s+, drop empties). */
  def featureHashVectors(docs: DataFrame, idCol: String, textCol: String,
                         dims: Int): DataFrame =
    featureHashArrays(docs, idCol, textCol, dims)
      .select(col(idCol), col("n_tok"), col("norm2"),
        array_join(col("vec"), ",").as("vec_csv"))

  /** [[featureHashVectors]] with the vector as a live array<long>
    * column instead of CSV — the form downstream similarity/clustering
    * operators consume (q199 runs brute-force cosine straight over
    * these). Same construction, same map-only shape. */
  def featureHashArrays(docs: DataFrame, idCol: String, textCol: String,
                        dims: Int): DataFrame = {
    require(dims >= 2 && dims <= 4096, s"dims out of range: $dims")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, text) =>
          val toks = text.trim.split("\\s+").filter(_.nonEmpty)
          val vec = new Array[Long](dims)
          var i = 0
          while (i < toks.length) {
            val h = md.digest(toks(i).getBytes("UTF-8"))
            // first 12 hex digits of the sha = first 6 bytes, big-endian
            var hv = 0L
            var b = 0
            while (b < 6) { hv = (hv << 8) | (h(b) & 0xffL); b += 1 }
            vec((hv % dims).toInt) += (if ((hv / dims) % 2 == 0) 1L else -1L)
            i += 1
          }
          var norm2 = 0L
          var j = 0
          while (j < dims) { norm2 += vec(j) * vec(j); j += 1 }
          (id, toks.length.toLong, norm2, vec)
        }
      }.toDF(idCol, "n_tok", "norm2", "vec")
  }

  /** Per-dimension corpus statistics: (dim, mean, std, min, max) over
    * every vector. Scale shape: the explode is map-side and the
    * aggregation partially combines to one row per dimension per task, so
    * the shuffle volume is dims × tasks regardless of corpus size. */
  def dimStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(Similarity.asDouble(col(vecCol))))
      .groupBy(col("pos").cast("long").as("dim"))
      .agg(avg(col("col")).as("mean"),
        stddev_samp(col("col")).as("std"),
        min(col("col")).as("dim_min"),
        max(col("col")).as("dim_max"))
}
