package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** EXACT repeated-substring span dedup at arbitrary window length —
  * the suffix-array-grade upgrade of [[SpanDedup]] (Lee et al. 2022 use
  * suffix arrays at L = 50). q121's sliding grams are cheap — the
  * 48-bit hash is computed in the map projection, so only 20-byte rows
  * ever shuffle — but the hash IS the identity, and exactness can't
  * ride it: an exact gram-identity formulation must ship the L-token
  * window STRING itself through the grouping exchange, an L× byte
  * blowup over the corpus that stops scaling long before L = 50. This
  * operator is exact without shipping any window longer than one token.
  *
  * The distributed re-expression is BOUNDED PREFIX DOUBLING: rank_k(i)
  * is an equality-consistent id for the k-token window starting at
  * position i — two positions share rank_k iff their k-windows are
  * token-identical (no hashing anywhere; the id is the lexicographically
  * first (doc_id, pos) holding that content, so ids are deterministic
  * without a global sort). rank_1 comes from grouping token VALUES;
  * rank_2k from grouping (rank_k(i), rank_k(i+k)) pairs. L-window
  * equality then needs no rank at depth L: with h the largest power of
  * two ≤ L, window_L(i) = window_L(j) iff (rank_h(i), rank_h(i+L−h)) =
  * (rank_h(j), rank_h(j+L−h)) — the two h-windows cover [i, i+L) with
  * overlap. Positions whose window runs off the document end simply
  * drop out of the inner join each round; no terminator tokens needed.
  *
  * Marking semantics match [[SpanDedup.spanStats]] exactly so the two
  * tiers are drop-in comparable: the canonical (kept) occurrence of a
  * repeated window is the (doc_id, start)-minimum, every other
  * occurrence marks [start, start+L−1], and overlapping-or-adjacent
  * marks merge into maximal spans.
  *
  * 100 TB shape: every round ships fixed-size rows — (doc_id, pos,
  * rank) with rank a 16-byte struct — through two hash exchanges (one
  * position-shift join, one pair groupBy; the rank-back join reuses the
  * groupBy's partitioning), and there are ⌈log₂ h⌉ + 1 rounds total:
  * L = 50 costs 6 fixed-width passes where the exact gram-string
  * formulation ships 50× the corpus through one. Rounds follow the
  * eager-localCheckpoint protocol (each round references its parent
  * four times, so a lazy chain grows the analyzed plan 4^rounds and
  * Catalyst re-optimization becomes the bottleneck — the Graphs.scala
  * iterative rule); superseded rounds' blocks are freed
  * unconditionally. Hot boilerplate windows concentrate rank-pair
  * groups, but the
  * aggregate is partial (map-side combine) and emits one row per
  * DISTINCT pair, so a 10^8-fold repeated passage costs its occurrence
  * rows only in the final count, never in a widened exchange. */
object SuffixDedup {

  private def toks(textCol: Column): Column =
    TextFunctions.tokens(TextFunctions.normalizeWs(textCol))

  /** See [[Checkpoints.freeCheckpoint]] — the shared release protocol
    * for round-over-round localCheckpoints. */
  private def freeCheckpoint(df: DataFrame): Unit =
    Checkpoints.freeCheckpoint(df)

  /** (doc_id, pos, rank struct) at depth `h` (a power of two):
    * equality-consistent window ids for every position with a full
    * h-token window. Exposed for tests. */
  private[operators] def ranksAt(tokens: DataFrame, h: Int): DataFrame = {
    require(h >= 1 && (h & (h - 1)) == 0, s"depth must be a power of two: $h")
    // rank_1: group token values; the id is the first (doc, pos) pair.
    // Join-back rather than collect_list: a 10^8-fold stop word must
    // stay one aggregate row + its join fan-out, never one giant array.
    //
    // Rounds use the eager-localCheckpoint protocol (the Graphs.scala
    // iterative rule): each round references its parent FOUR times in
    // the logical plan (cur, the shift of cur, and both sides of the
    // rank-back join), so a persist-only chain grows the ANALYZED plan
    // 4^rounds and Catalyst re-optimization — not execution — becomes
    // the bottleneck by round 5. localCheckpoint truncates the plan to
    // a LogicalRDD; the superseded round's blocks are freed
    // unconditionally once the successor is materialized.
    val ids1 = tokens
      .groupBy(col("tok"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("r"))
    var cur = tokens.join(ids1, Seq("tok"))
      .select(col("doc_id"), col("pos"), col("r"))
      .localCheckpoint() // eager
    var k = 1
    while (k < h) {
      val shifted = cur.select(col("doc_id"),
        (col("pos") - k).as("pos"), col("r").as("r2"))
      // inner: keeps exactly the positions whose 2k-window is in-doc
      val pairs = cur.join(shifted, Seq("doc_id", "pos"))
      val ids = pairs
        .groupBy(col("r"), col("r2"))
        .agg(min(struct(col("doc_id"), col("pos"))).as("nr"))
      val next = pairs.join(ids, Seq("r", "r2"))
        .select(col("doc_id"), col("pos"), col("nr").as("r"))
        .localCheckpoint() // eager: materializes the round, cuts lineage
      freeCheckpoint(cur)
      cur = next
      k *= 2
    }
    cur
  }

  /** Per-document EXACT duplicated-span statistics at window length
    * `l` (2..4096): (doc_id, total_tokens, dup_spans, dup_tokens), the
    * [[SpanDedup.spanStats]] output shape with hash identity replaced
    * by true token equality and no L-sized gram ever materialized. */
  def exactSpanStats(docs: DataFrame, idCol: String, textCol: String,
                     l: Int): DataFrame = {
    require(l >= 2 && l <= 4096, s"window length out of range: $l")
    var h = 1
    while (h * 2 <= l) h *= 2
    val tokens = docs
      .select(col(idCol).as("doc_id"), posexplode(toks(col(textCol))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
    val ranks = ranksAt(tokens, h)
    // composite key for L-window equality: the h-window at i plus the
    // h-window at i + L - h (they overlap when h < L ≤ 2h — always,
    // by choice of h); inner join keeps i with i + L ≤ n + 1
    val tail = ranks.select(col("doc_id"),
      (col("pos") - (l - h)).as("pos"), col("r").as("rt"))
    val keyed =
      if (l == h) ranks.select(col("doc_id"), col("pos"), col("r"),
        col("r").as("rt"))
      else ranks.join(tail, Seq("doc_id", "pos"))
    val repeated = keyed
      .groupBy(col("r"), col("rt"))
      .agg(count(lit(1)).as("c"),
        min(struct(col("doc_id"), col("pos"))).as("keep"))
      .filter(col("c") >= 2)
      .select(col("r"), col("rt"), col("keep"))
    // marks is the small survivor set (non-canonical repeated-window
    // occurrences); checkpointing it eagerly lets the corpus-sized rank
    // table be freed NOW rather than riding the returned plan. The one
    // block behind `marks` is the documented residual — ContextCleaner
    // reclaims it when the returned frame is unreferenced.
    val marks = keyed.join(repeated, Seq("r", "rt"))
      .filter(struct(col("doc_id"), col("pos")) =!= col("keep"))
      .select(col("doc_id"), col("pos").as("st"),
        (col("pos") + (l - 1)).as("en"))
      .localCheckpoint()
    freeCheckpoint(ranks)
    spanStatsFromMarks(docs, idCol, textCol, marks, "dup")
  }

  /** Island-merge per-position marks (doc_id, st, en) into maximal
    * spans and roll up per-document stats joined onto every `docs`
    * row: (doc_id, total_tokens, ${prefix}_spans, ${prefix}_tokens).
    * The marks table is the (small) marked-position set; corpus rows
    * enter only the final total-tokens projection. */
  private def spanStatsFromMarks(docs: DataFrame, idCol: String,
      textCol: String, marks: DataFrame, prefix: String): DataFrame = {
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
      .agg(count(lit(1)).as(s"${prefix}_spans"),
        sum(col("sen") - col("sst") + 1).as(s"${prefix}_tokens"))
    docs
      .select(col(idCol).as("doc_id"),
        size(toks(col(textCol))).cast("long").as("total_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq(s"${prefix}_spans", s"${prefix}_tokens"))
  }

  /** SPAN-LEVEL DECONTAMINATION (the Lee et al. exact-substring rule
    * pointed across corpora — VERDICT r10 #4): every corpus position
    * whose `l`-token window also occurs ANYWHERE in the eval/benchmark
    * set is contaminated; overlapping marks merge into maximal spans.
    * This is the exact-form upgrade of the n-gram-overlap
    * decontamination tier (q61/q76): no hash identity, no l-gram
    * string ever materialized — the same bounded prefix-doubling
    * equality ranks as [[exactSpanStats]], run over the corpus ∪ eval
    * union so rank equality spans both sides. Unlike the dedup
    * marking there is NO canonical-keeper exemption: eval text must
    * not leak into training, so EVERY corpus occurrence marks.
    *
    * `corpus` and `eval` may share an id space (internally remapped to
    * even/odd — ids must be non-negative longs below 2^62, or the
    * ANSI-checked remap throws); output rows cover every corpus doc:
    * (doc_id, total_tokens, contam_spans, contam_tokens) — a doc is
    * clean iff contam_tokens = 0; scrub by dropping the doc or cutting
    * the spans.
    *
    * 100 TB shape: identical to [[exactSpanStats]] — ⌈log₂h⌉+1
    * fixed-width (doc, pos, rank) exchanges over the union corpus; the
    * eval side is benchmark-sized (thousands of docs), so the
    * eval-key set and the mark set are tiny next to the corpus, and
    * the final stats join is one broadcast-or-co-partitioned pass. */
  def spanDecontaminate(corpus: DataFrame, eval: DataFrame, idCol: String,
                        textCol: String, l: Int): DataFrame = {
    require(l >= 2 && l <= 4096, s"window length out of range: $l")
    var h = 1
    while (h * 2 <= l) h *= 2
    def side(df: DataFrame, tag: Int): DataFrame = df
      .select((col(idCol).cast("long") * 2 + tag).as("doc_id"),
        posexplode(toks(col(textCol))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
    val tokens = side(corpus, 0).unionByName(side(eval, 1))
    val ranks = ranksAt(tokens, h)
    val tail = ranks.select(col("doc_id"),
      (col("pos") - (l - h)).as("pos"), col("r").as("rt"))
    val keyed =
      if (l == h) ranks.select(col("doc_id"), col("pos"), col("r"),
        col("r").as("rt"))
      else ranks.join(tail, Seq("doc_id", "pos"))
    val evalKeys = keyed.filter(col("doc_id") % 2 === 1)
      .select(col("r"), col("rt")).distinct()
    val marks = keyed.filter(col("doc_id") % 2 === 0)
      .join(evalKeys, Seq("r", "rt"), "left_semi")
      .select(shiftright(col("doc_id"), 1).as("doc_id"),
        col("pos").as("st"), (col("pos") + (l - 1)).as("en"))
      .localCheckpoint()
    freeCheckpoint(ranks)
    spanStatsFromMarks(corpus, idCol, textCol, marks, "contam")
  }
}
