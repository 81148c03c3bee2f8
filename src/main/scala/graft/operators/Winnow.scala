package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the algorithm behind MOSS): hash every k-gram, slide a
  * window of w consecutive gram hashes over each document, and select
  * the minimum hash of each window (ties to the RIGHTMOST occurrence —
  * the paper's "robust winnowing", which guarantees a shared substring
  * of length ≥ w + k − 1 always yields at least one shared fingerprint
  * while keeping the selected set sparse). The distinct selected hashes
  * are the document's fingerprint set; documents are compared by
  * fingerprint-set overlap.
  *
  * Where the other dedup families answer "are these two documents
  * near-identical?", winnowing answers the MOSS question: "do these two
  * documents share any sufficiently-long passage?" — partial overlap
  * detection (quotation, template reuse, plagiarism) that whole-document
  * MinHash dilutes away and [[SpanDedup]]'s exact-run marking only
  * reports per-document, not per-pair.
  *
  * Documented spec (chosen for exact replay in the DuckDB oracle):
  * tokens = whitespace split of lowercased ws-normalized text; gram
  * identity is the 48-bit sha256-prefix hash of the space-joined k
  * tokens (the q121 formula, [[SpanDedup.gramOccurrences]]); windows
  * are the n_grams − w + 1 fully-populated positions; selection is
  * min by (hash, −position) — lexicographic struct comparison in both
  * engines.
  *
  * 100 TB shape: gram strings never leave the map-side projection
  * (only (doc_id, st, hash48) rows exist); selection is a per-document
  * ROWS window — one doc_id-keyed exchange, no global ordering, frames
  * never buffer the partition; the pair join ships (doc_id, hash)
  * only. The document-frequency band [2, maxDf] on the pair join is
  * the hot-band cap of this family: a boilerplate fingerprint shared
  * by f documents fans out f·(f−1)/2 pairs, so `maxDf` bounds every
  * hash bucket's pair volume at maxDf²/2 — and is semantically the
  * MOSS move (fingerprints in "too many" documents carry no
  * shared-passage signal and are dropped from matching).
  */
object Winnow {

  /** Selected fingerprints per document: (doc_id, pos, hv), pos the
    * 1-based token start of the selected gram, distinct per (doc, pos,
    * hv). Documents shorter than k + w − 1 tokens have no
    * fully-populated window and yield no fingerprints. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int, w: Int): DataFrame = {
    require(k >= 2 && k <= 64, s"gram length out of range: $k")
    require(w >= 2 && w <= 64, s"window length out of range: $w")
    val occ = SpanDedup.gramOccurrences(docs, idCol, textCol, k)
    val doc = Window.partitionBy("doc_id")
    val frame = doc.orderBy("st").rowsBetween(0, w - 1)
    occ
      // st runs 1..n_grams, so the partition max IS the gram count —
      // no second aggregate over the corpus
      .withColumn("ng", max(col("st")).over(doc))
      .withColumn("fp", min(struct(col("hv"), (-col("st")).as("np")))
        .over(frame))
      // only fully-populated windows select (trailing short frames
      // would re-select with a bias toward the document tail)
      .filter(col("st") <= col("ng") - (w - 1))
      .select(col("doc_id"), (-col("fp.np")).as("pos"),
        col("fp.hv").as("hv"))
      .distinct()
  }

  /** Document pairs ranked by shared distinct fingerprints:
    * (id_a, id_b, shared) with id_a < id_b, shared ≥ minShared, over
    * fingerprints whose document frequency lies in [2, maxDf]. */
  def fingerprintPairs(docs: DataFrame, idCol: String, textCol: String,
                       k: Int, w: Int, minShared: Long,
                       maxDf: Long): DataFrame = {
    require(minShared >= 1, s"minShared out of range: $minShared")
    require(maxDf >= 2, s"maxDf out of range: $maxDf")
    import org.apache.spark.storage.StorageLevel
    // the SET of fingerprints per doc (positions dropped): overlap
    // counts are set-intersection sizes, and the join ships id+hash
    // only
    val fp = fingerprints(docs, idCol, textCol, k, w)
      .select(col("doc_id"), col("hv")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val kept = fp.join(
      fp.groupBy("hv").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= maxDf)
        .select("hv"),
      Seq("hv"))
    kept.select(col("hv"), col("doc_id").as("id_a"))
      .join(kept.select(col("hv"), col("doc_id").as("id_b")), Seq("hv"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
