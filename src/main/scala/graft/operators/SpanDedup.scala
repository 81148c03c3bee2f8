package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{KmvAggregator, TextFunctions}

/** Repeated-substring span dedup — the remaining famous training-data
  * dedup mode (Lee et al. 2022, "Deduplicating Training Data Makes
  * Language Models Better"): find token runs that occur more than once
  * ANYWHERE in the corpus and mark every occurrence except a canonical
  * first copy, merging overlapping marks into contiguous duplicated
  * spans per document. Suffix arrays (the paper's tool) are a
  * single-machine structure; the distributed re-expression is sliding
  * L-token grams — a run of j ≥ L duplicated tokens is covered by
  * j − L + 1 duplicated grams, so merged gram intervals recover exactly
  * the maximal duplicated runs of length ≥ L.
  *
  * Documented spec (chosen for exact replay — q121's hash gate):
  *   - tokens = whitespace split of lowercased, ws-normalized text;
  *   - gram identity is the 48-bit sha256-prefix hash
  *     ([[KmvAggregator.kmvHash]]) of the space-joined L tokens — the
  *     hash IS the identity (at 48 bits a corpus needs ~2^24 distinct
  *     grams before birthday collisions appear; a collision can only
  *     over-mark, never drop a true duplicate, and the oracle replays
  *     the same hash so the gate is representation-exact);
  *   - the canonical (kept) occurrence of a repeated gram is the
  *     (doc_id, start)-minimum; every other occurrence marks the
  *     interval [start, start+L−1];
  *   - overlapping or ADJACENT intervals merge (start ≤ prev_end + 1):
  *     back-to-back duplicated runs are one duplicated region.
  *
  * 100 TB shape: the gram STRING never leaves the map stage — the
  * projection computes kmvHash(gram) inline and ships only
  * (doc_id, start, hash48) ≈ 20 bytes/token. Gram frequencies come from
  * a partially-aggregated groupBy (map-side combine collapses hot
  * boilerplate grams before the exchange); the mark join carries only
  * the ≥2-count survivors and runs under AQE skew splitting — the
  * window-function alternative (count over hv) was rejected because a
  * boilerplate gram repeated 10^8 times would pin one window task,
  * while a skew-split join streams it. The island merge is a per-doc
  * running max — Spark's RANGE/ROWS frames never buffer the partition.
  */
object SpanDedup {

  private def toks(textCol: Column): Column =
    TextFunctions.tokens(TextFunctions.normalizeWs(textCol))

  /** (doc_id, start, hv) for every L-gram occurrence, 1-based starts.
    * The gram string is hashed in the same projection that builds it. */
  private[graft] def gramOccurrences(docs: DataFrame, idCol: String,
                                     textCol: String, l: Int): DataFrame = {
    val s = col("s")
    docs
      .select(col(idCol).as("doc_id"), toks(col(textCol)).as("s"))
      // sequence(1, n-l+1) only when n ≥ l: Spark's sequence DESCENDS
      // for start > stop, so the guard is load-bearing
      .select(col("doc_id"),
        explode(when(size(s) >= l,
          transform(sequence(lit(1), size(s) - (l - 1)),
            i => struct(i.as("st"),
              KmvAggregator.kmvHash(array_join(slice(s, i, lit(l)), " "))
                .as("hv"))))
          .otherwise(array())).as("o"))
      .select(col("doc_id"), col("o.st").cast("long").as("st"), col("o.hv"))
  }

  /** Per-document duplicated-span statistics: (doc_id, total_tokens,
    * dup_spans, dup_tokens). Documents with no duplicated run ≥ L
    * report zeros. */
  def spanStats(docs: DataFrame, idCol: String, textCol: String,
                l: Int): DataFrame = {
    require(l >= 2 && l <= 64, s"gram length out of range: $l")
    // the occurrence table feeds BOTH the frequency aggregate and the
    // mark join; persisting the 20-byte rows avoids re-tokenizing and
    // re-hashing the corpus. At extreme scale where even the hashed
    // occurrences outgrow cluster storage, dropping this persist trades
    // a second corpus scan for zero footprint — the plan is correct
    // either way.
    val occ = gramOccurrences(docs, idCol, textCol, l)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // partial-agg'd frequency + canonical copy per gram; only repeated
    // grams survive to the join (markedIntervals)
    val marks = markedIntervals(occ, l)
    val before = Window.partitionBy("doc_id").orderBy("st")
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy("doc_id").orderBy("st")
      .rowsBetween(Window.unboundedPreceding, 0)
    val spans = marks
      .withColumn("pmax", max(col("en")).over(before))
      .withColumn("nw",
        when(col("pmax").isNull || col("st") > col("pmax") + 1, 1).otherwise(0))
      .withColumn("grp", sum(col("nw")).over(run))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("st")).as("sst"), max(col("en")).as("sen"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dup_spans"),
        sum(col("sen") - col("sst") + 1).as("dup_tokens"))
    docs
      .select(col(idCol).as("doc_id"),
        size(toks(col(textCol))).cast("long").as("total_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("dup_spans", "dup_tokens"))
  }

  /** The marked intervals behind [[spanStats]], pre-island-merge:
    * (doc_id, st, en) for every non-canonical repeated-gram occurrence. */
  private def markedIntervals(occ: DataFrame, l: Int): DataFrame = {
    val repeated = occ
      .groupBy(col("hv"))
      .agg(count(lit(1)).as("c"), min(struct(col("doc_id"), col("st"))).as("keep"))
      .filter(col("c") >= 2)
      .select(col("hv"), col("keep"))
    occ.join(repeated, "hv")
      .filter(struct(col("doc_id"), col("st")) =!= col("keep"))
      .select(col("doc_id"), col("st"), (col("st") + (l - 1)).as("en"))
  }

  /** Substring-span SCRUBBING — the removal step of Lee et al. 2022:
    * rebuild each document's text with every duplicated token run
    * (per [[spanStats]]' marking rule) dropped, keeping the corpus-wide
    * canonical copy untouched. Output is (doc_id, clean_text,
    * removed_tokens) in canonical single-space whitespace; a document
    * that was entirely duplicated scrubs to the empty string.
    *
    * 100 TB shape: marked intervals explode to their covered positions
    * (Σ span widths ≤ corpus tokens — never more than the corpus
    * itself), the kept tokens are an EQUI anti-join on (doc, position)
    * (no range-join machinery), and reconstruction is one per-doc
    * sort_array — the same per-doc grouping every window in the family
    * already shuffles on. */
  def scrubSpans(docs: DataFrame, idCol: String, textCol: String,
                 l: Int): DataFrame = {
    require(l >= 2 && l <= 64, s"gram length out of range: $l")
    val toksOf = docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("s"))
    val positions = toksOf
      .select(col("doc_id"), posexplode(col("s")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("tok"))
    val occ = gramOccurrences(docs, idCol, textCol, l)
    val covered = markedIntervals(occ, l)
      .select(col("doc_id"), explode(sequence(col("st"), col("en"))).as("pos"))
      .distinct()
    val kept = positions.join(covered, Seq("doc_id", "pos"), "left_anti")
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(array_join(
          transform(sort_array(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ").as("clean_text"),
        count(lit(1)).as("kept_tokens"))
    docs
      .select(col(idCol).as("doc_id"),
        size(toks(col(textCol))).cast("long").as("total_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (col("total_tokens") - coalesce(col("kept_tokens"), lit(0L)))
          .as("removed_tokens"))
  }

  /** Standing gram-frequency table for [[incrementalSpanStats]]:
    * (hv, cnt) aggregated over the corpus — gram-VOCABULARY-sized (one
    * row per distinct gram, not per occurrence), built once and
    * amortized over every subsequent batch. */
  def buildGramStats(corpus: DataFrame, idCol: String, textCol: String,
                     l: Int): DataFrame = {
    require(l >= 2 && l <= 64, s"gram length out of range: $l")
    gramOccurrences(corpus, idCol, textCol, l)
      .groupBy(col("hv")).agg(count(lit(1)).as("cnt"))
  }

  /** Per-batch substring-span stats against a STANDING corpus — the
    * span analog of the q104/q108 incremental probes. Documented spec
    * (asymmetric on purpose): the corpus is canonical — a batch
    * occurrence of any gram the corpus has seen is ALWAYS a duplicate
    * (cnt ≥ 1 suffices: corpus copy + batch copy ≥ 2 total, and the
    * canonical copy lives in the corpus); batch-internal repeats keep
    * their batch-first copy exactly as [[spanStats]] does. Returns the
    * same (doc_id, total_tokens, dup_spans, dup_tokens) schema,
    * batch docs only.
    *
    * 100 TB shape: the batch's distinct gram hashes BROADCAST into the
    * corpus-stats scan (a batch is orders of magnitude smaller than
    * the corpus), so the standing table is filtered to the batch's
    * grams before any exchange and the corpus is never re-tokenized or
    * shuffled per batch — per-batch cost tracks the batch, not the
    * corpus. */
  def incrementalSpanStats(batch: DataFrame, idCol: String, textCol: String,
                           l: Int, corpusStats: DataFrame): DataFrame = {
    require(l >= 2 && l <= 64, s"gram length out of range: $l")
    val occ = gramOccurrences(batch, idCol, textCol, l)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bstats = occ.groupBy(col("hv"))
      .agg(count(lit(1)).as("bc"),
        min(struct(col("doc_id"), col("st"))).as("bkeep"))
    val hit = corpusStats
      .join(broadcast(bstats.select(col("hv"))), "hv")
      .select(col("hv"), col("cnt").as("cc"))
    val stats = bstats.join(hit, Seq("hv"), "left")
      .na.fill(0L, Seq("cc"))
    val marks = occ.join(stats, "hv")
      .filter(col("cc") >= 1 ||
        (col("bc") >= 2 && struct(col("doc_id"), col("st")) =!= col("bkeep")))
      .select(col("doc_id"), col("st"), (col("st") + (l - 1)).as("en"))
    val before = Window.partitionBy("doc_id").orderBy("st")
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy("doc_id").orderBy("st")
      .rowsBetween(Window.unboundedPreceding, 0)
    val spans = marks
      .withColumn("pmax", max(col("en")).over(before))
      .withColumn("nw",
        when(col("pmax").isNull || col("st") > col("pmax") + 1, 1).otherwise(0))
      .withColumn("grp", sum(col("nw")).over(run))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("st")).as("sst"), max(col("en")).as("sen"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dup_spans"),
        sum(col("sen") - col("sst") + 1).as("dup_tokens"))
    batch
      .select(col(idCol).as("doc_id"),
        size(toks(col(textCol))).cast("long").as("total_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("dup_spans", "dup_tokens"))
  }
}
