package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-corpus curation operators: deterministic train/val/test
  * splits, reproducible corpus shuffling, context-window chunking, and
  * weighted source mixing — the membership/layout half of a training-data
  * pipeline (the content half is [[TextAnalysis]]/[[Dedup]]).
  *
  * Everything here is a pure narrow transform (projection / explode):
  * zero shuffles, so at 100 TB each op runs inside the corpus scan's map
  * stage. Determinism comes from content hashes (sha256 of key + salt),
  * never RNG state, so speculative re-execution, task retries, and
  * engine changes all reproduce the same membership — the property that
  * actually matters for train/val/test hygiene (`rand(seed)` is only
  * stable per partition layout; a repartitioned rerun reassigns rows).
  *
  * Fractions are expressed in 1/256ths via the first hash byte, compared
  * as two lowercase hex chars: both Spark's `sha2` and ANSI SQL engines'
  * `sha256` emit lowercase hex, and ASCII ordering of fixed-width hex is
  * numeric ordering, so the same rows pass the cut in any engine.
  */
object Curation {

  /** First hash byte of `key` under `salt` as two lowercase hex chars —
    * a deterministic uniform draw over 256 buckets. */
  private def hexByte(key: Column, salt: String): Column =
    substring(sha2(concat(key.cast("string"), lit(":" + salt)), 256), 1, 2)

  /** Threshold for "keep everything": lexicographically above "ff". */
  val KeepAll = "g0"

  /** Deterministic split assignment by content hash. Defaults:
    * hash byte < 0xe6 (230/256 ≈ 89.8%) → train, < 0xf3 (+13/256 ≈ 5.1%)
    * → val, remainder (≈ 5.1%) → test. */
  def hashSplit(key: Column, salt: String,
                trainHex: String = "e6", valHex: String = "f3"): Column = {
    val b = hexByte(key, salt)
    when(b < trainHex, "train").when(b < valHex, "val").otherwise("test")
  }

  /** Seeded, reproducible global-shuffle key: writing `ORDER BY` this
    * column is a deterministic corpus shuffle that scales as a
    * range-partitioned sort — no global row numbering through a single
    * partition. */
  def shuffleKey(key: Column, salt: String): Column =
    sha2(concat(key.cast("string"), lit(":" + salt)), 256)

  /** Split each document into fixed-size whitespace-token windows for
    * context-length packing: one output row per (doc, window) with
    * half-open token offsets [tok_start, tok_end). Documents with zero
    * tokens emit no rows. Narrow explode — the fan-out happens map-side,
    * inside whole-stage codegen, with no shuffle. */
  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
                  windowTokens: Int): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive: $windowTokens")
    val w = lit(windowTokens.toLong)
    df.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .select(col(idCol), col("n_tok"),
        ceil(col("n_tok").cast("double") / w).cast("long").as("n_chunks"))
      .filter(col("n_chunks") > 0)
      .select(col(idCol), col("n_tok"),
        explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * w).as("tok_start"),
        least(col("chunk_idx") * w + w, col("n_tok")).as("tok_end"))
  }

  /** Weighted source mixture: keep a deterministic per-row fraction given
    * by `weightHex` — a (possibly per-row, e.g. CASE on a source column)
    * threshold in 1/256ths as two lowercase hex chars ("40" = 25%,
    * "c0" = 75%, [[KeepAll]] = 100%). Membership is a pure filter on the
    * row's own hash: no shuffle, and each source is downsampled uniformly
    * without materializing per-source counts. */
  def weightedMixture(df: DataFrame, key: Column, weightHex: Column,
                      salt: String): DataFrame =
    df.filter(hexByte(key, salt) < weightHex)
}
