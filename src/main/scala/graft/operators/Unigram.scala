package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** UNIGRAM-LM (SentencePiece-class) tokenizer training (Kudo 2018) —
  * the OTHER production tokenizer family next to [[Bpe]] (VERDICT r11
  * #5): instead of growing a vocabulary by greedy merges, fix a
  * substring candidate census and fit per-piece scores by EM, where
  * each E-step segments every word by the highest-scoring piece
  * sequence (hard-EM / Viterbi counts — the deterministic member of
  * the EM family) and the M-step re-estimates scores from the counts.
  *
  * Everything replays exactly in SQL — the two discipline choices:
  *
  *  - **Scaled-long weights, no float log.** A piece's Viterbi weight
  *    is `log2lin(c+1) − log2lin(T)` where `log2lin` is the
  *    exponent-mantissa piecewise-linear log2 computed with INTEGER
  *    ops only: `e·2^20 + ((c − 2^e)·2^20 div 2^e)` with
  *    `e = ⌊log2 c⌋ = length(bin(c)) − 1`. Monotone in c, ≤ 0.086-bit
  *    error vs true log2, and bit-identical in any engine — the
  *    float-free "scaled-long E-step" the oracle contract demands
  *    (libm `ln` is not correctly-rounded across engines; this is).
  *    Add-one smoothing keeps every candidate alive between
  *    iterations.
  *  - **Max-plus prefix doubling, total-order tie-break.** The Viterbi
  *    lattice over a word's cut positions is solved by ⌈log2 L⌉
  *    rounds of max-plus path doubling (the q172 rank-build idiom in
  *    the (max, +) semiring); a path is (score, n, mask) with `mask`
  *    the bitmask of internal cut positions, and the kept path per
  *    (word, j, i) is the lexicographic max of (score, −n, −mask) —
  *    highest score, then fewest pieces, then smallest cut mask: a
  *    TOTAL order (mask ↔ segmentation is a bijection), additive per
  *    field, so optimal substructure holds and both engines pick the
  *    same segmentation always.
  *
  * 100 TB shape: the classic [[Bpe]] trick — ONE corpus pass collapses
  * text to the distinct-word census; the candidate census, the edge
  * table, and every DP round are VOCABULARY-class tables (≤ L²/2 path
  * rows per distinct word, L capped), shuffled on the word key;
  * piece/weight tables are top-N-bounded broadcasts. The corpus never
  * rides an exchange after the first pass.
  */
object Unigram {

  private def toks(textCol: Column): Column =
    TextFunctions.tokens(TextFunctions.normalizeWs(textCol))

  /** Integer-only piecewise-linear log2 (scaled 2^20) as a SQL
    * fragment over the expression `x` (must be a positive BIGINT). */
  private def log2linSql(x: String): String = {
    val e = s"(length(bin($x)) - 1)"
    val p = s"shiftleft(cast(1 as bigint), cast($e as int))"
    s"($e * 1048576 + (($x - $p) * 1048576) div $p)"
  }

  /** Distinct-word census of `docs`: (w, cnt, len), with the loud
    * over-length raise inside the plan (the maxScores precedent — a
    * silent truncation would change the learned vocabulary). */
  private def wordCensus(docs: DataFrame, textCol: String,
                         maxWordLen: Int): DataFrame =
    docs.select(explode(toks(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("w", when(length(col("w")) > maxWordLen,
        raise_error(concat(lit(s"unigram: word longer than $maxWordLen"),
          lit(": "), col("w")))).otherwise(col("w")))
      .withColumn("len", length(col("w")).cast("long"))

  /** Substring-candidate census over the word table: every substring
    * of length 1..`maxPieceLen`, weighted by word count × occurrence.
    * Selection: ALL single characters (coverage guarantee) plus the
    * top `topN` longer pieces by (weight desc, piece asc). */
  private def candidateCensus(words: DataFrame, maxPieceLen: Int,
                              topN: Int): DataFrame = {
    val spark = words.sparkSession
    val lens = broadcast(spark.range(1, maxPieceLen + 1L)
      .select(col("id").as("pl")))
    val subs = words.crossJoin(lens)
      .filter(col("pl") <= col("len"))
      .select(col("w"), col("cnt"), col("pl"),
        explode(expr("sequence(0, len - pl)")).as("j"))
      .select(expr("substring(w, cast(j + 1 as int), cast(pl as int))")
        .as("piece"), col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("census"))
    // the rank window runs over the candidate census — vocabulary-class
    // cardinality by construction (≤ vocab × L × maxPieceLen rows)
    val ranked = subs.withColumn("rn",
      when(length(col("piece")) === 1, lit(0L))
        .otherwise(row_number().over(Window
          .partitionBy(length(col("piece")) === 1)
          .orderBy(col("census").desc, col("piece"))).cast("long")))
    ranked.filter(col("rn") <= topN).select(col("piece"), col("census"))
  }

  /** Viterbi-best segmentation of every word in `words` under integer
    * piece weights, by max-plus prefix doubling. Returns
    * (w, n, mask): piece count and internal-cut bitmask of the unique
    * total-order-best path 0 → len(w). */
  private def viterbi(words: DataFrame, pieces: DataFrame,
                      maxPieceLen: Int, rounds: Int): DataFrame = {
    val spark = words.sparkSession
    val lens = broadcast(spark.range(1, maxPieceLen + 1L)
      .select(col("id").as("pl")))
    val edges = words.crossJoin(lens)
      .filter(col("pl") <= col("len"))
      .select(col("w"), col("pl"),
        explode(expr("sequence(0, len - pl)")).as("j"))
      .select(col("w"), col("j"), (col("j") + col("pl")).as("i"),
        expr("substring(w, cast(j + 1 as int), cast(pl as int))")
          .as("piece"))
      .join(broadcast(pieces.select(col("piece"), col("wt"))), Seq("piece"))
      .select(col("w"), col("j"), col("i"), col("wt").as("score"),
        lit(1L).as("n"), lit(0L).as("mask"))
    var paths = edges.localCheckpoint()
    for (_ <- 1 to rounds) {
      val a = paths.select(col("w"), col("j"), col("i").as("m"),
        col("score").as("s1"), col("n").as("n1"), col("mask").as("m1"))
      val b = paths.select(col("w"), col("j").as("m"), col("i"),
        col("score").as("s2"), col("n").as("n2"), col("mask").as("m2"))
      val combined = a.join(b, Seq("w", "m"))
        .select(col("w"), col("j"), col("i"),
          (col("s1") + col("s2")).as("score"),
          (col("n1") + col("n2")).as("n"),
          (col("m1") + col("m2") +
            expr("shiftleft(cast(1 as bigint), cast(m as int))")).as("mask"))
      val next = paths.unionByName(combined)
        .groupBy(col("w"), col("j"), col("i"))
        .agg(max(struct(col("score"), (-col("n")).as("nn"),
          (-col("mask")).as("nm"))).as("b"))
        .select(col("w"), col("j"), col("i"),
          col("b.score").as("score"), (-col("b.nn")).as("n"),
          (-col("b.nm")).as("mask"))
        .localCheckpoint() // eager: the iterative-protocol rule
      Checkpoints.freeCheckpoint(paths)
      paths = next
    }
    val best = paths
      .filter(col("j") === 0 && col("i") === length(col("w")).cast("long"))
      .select(col("w"), col("n"), col("mask"))
      .localCheckpoint()
    Checkpoints.freeCheckpoint(paths)
    best
  }

  /** Decode the best path's pieces: boundaries are 0, len(w), and the
    * set bits of `mask`; pieces are the substrings between consecutive
    * boundaries. Input must carry (w, mask); adds `pieces`. */
  private def withPieces(best: DataFrame): DataFrame = best
    .withColumn("bnds", expr(
      "filter(sequence(0L, cast(length(w) as long)), p -> p = 0 OR " +
        "p = length(w) OR (shiftright(mask, cast(p as int)) % 2) = 1)"))
    .withColumn("pieces", expr(
      "transform(slice(bnds, 1, size(bnds) - 1), (b, k) -> " +
        "substring(w, cast(b + 1 as int), " +
        "cast(element_at(bnds, k + 2) - b as int)))"))
    .drop("bnds")

  /** Weight table from smoothed counts: wt = log2lin(cnt + 1) −
    * log2lin(T) with T = Σ(cnt + 1) over the candidate set. */
  private def weighted(counts: DataFrame): DataFrame = {
    val t = broadcast(counts.agg(
      sum(col("cnt") + 1).cast("long").as("tt")))
    counts.crossJoin(t)
      .withColumn("c1", (col("cnt") + 1).cast("long"))
      .withColumn("wt",
        expr(log2linSql("c1") + " - " + log2linSql("tt")).cast("long"))
      .select(col("piece"), col("cnt"), col("wt"))
  }

  /** One E-step: Viterbi-segment every word under weight table `w`,
    * count used pieces (occurrence-weighted), and return counts over
    * the candidate set `cands` (zero for unused — smoothing keeps them
    * alive downstream). */
  private def estepCounts(words: DataFrame, cands: DataFrame, w: DataFrame,
                          maxPieceLen: Int, rounds: Int): DataFrame = {
    val best = viterbi(words, w, maxPieceLen, rounds)
    val used = withPieces(best.join(words.select(col("w"), col("cnt")),
        Seq("w")))
      .select(explode(col("pieces")).as("piece"), col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("used"))
    cands.select(col("piece"))
      .join(used, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("used"), lit(0L)).as("cnt"))
  }

  /** LEARN: fixed candidate census + `emIters` hard-EM iterations.
    * Returns one row per (iter, piece): `cnt` is the piece's count at
    * that iteration (iter 0 = census weight; iter k ≥ 1 = Viterbi
    * count under iteration k−1's weights, zero when unused) and `wt`
    * the smoothed scaled-long weight DERIVED from that count (the
    * weight the next E-step uses) — so the census, the weight formula,
    * and every E-step's segmentation counts all sit under the gate. */
  def learn(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
            topN: Int = 24, emIters: Int = 2,
            maxWordLen: Int = 16): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 8, "maxPieceLen out of range")
    require(emIters >= 1 && emIters <= 4, "emIters out of range")
    require(maxWordLen >= 2 && maxWordLen <= 32, "maxWordLen out of range")
    val rounds = 32 - Integer.numberOfLeadingZeros(maxWordLen - 1) // ⌈log2⌉
    val words = wordCensus(docs, textCol, maxWordLen).localCheckpoint()
    val cands = candidateCensus(words, maxPieceLen, topN)
      .localCheckpoint()
    var counts = cands.select(col("piece"), col("census").as("cnt"))
    val perIter = (0 to emIters).map { k =>
      val w = weighted(counts)
      if (k < emIters)
        counts = estepCounts(words, cands, w, maxPieceLen, rounds)
      w.select(lit(k.toLong).as("iter"), col("piece"), col("cnt"),
        col("wt"))
    }
    perIter.reduce(_ unionByName _)
  }

  /** PRUNE + RE-FIT (the full SentencePiece loop's third phase): after
    * `emIters` hard-EM iterations over the fixed census, keep all
    * single characters (coverage) plus the top `keepN` multi-char
    * pieces by (EM count desc, piece asc) among those the E-step
    * actually used — the deterministic stand-in for likelihood-loss
    * pruning (hard-EM counts ARE each piece's contribution to the
    * corpus segmentation) — then re-fit: one more E-step under weights
    * renormalized over the SURVIVING set. Returns one row per ORIGINAL
    * candidate: (piece, kept, cnt_pre, cnt_post) — cnt_pre the final
    * pre-prune EM count, cnt_post the post-prune re-fit count (0 for
    * pruned pieces; their mass flows to the survivors, which the
    * corpus-conservation law in the spec pins). */
  def pruneStats(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
                 topN: Int = 24, emIters: Int = 2, keepN: Int = 8,
                 maxWordLen: Int = 16): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 8, "maxPieceLen out of range")
    require(emIters >= 1 && emIters <= 4, "emIters out of range")
    require(keepN >= 0 && keepN <= topN, "keepN out of range")
    require(maxWordLen >= 2 && maxWordLen <= 32, "maxWordLen out of range")
    val rounds = 32 - Integer.numberOfLeadingZeros(maxWordLen - 1)
    val words = wordCensus(docs, textCol, maxWordLen).localCheckpoint()
    val cands = candidateCensus(words, maxPieceLen, topN).localCheckpoint()
    var counts = cands.select(col("piece"), col("census").as("cnt"))
    for (_ <- 0 until emIters)
      counts = estepCounts(words, cands, weighted(counts),
        maxPieceLen, rounds)
    val pre = counts.localCheckpoint()
    val kept = pre
      .withColumn("rn", when(length(col("piece")) === 1, lit(0L))
        .otherwise(row_number().over(Window
          .partitionBy(length(col("piece")) === 1)
          .orderBy(col("cnt").desc, col("piece"))).cast("long")))
      .filter((length(col("piece")) === 1 ||
        col("cnt") > 0) && col("rn") <= keepN)
      .select(col("piece"), col("cnt"))
    val post = estepCounts(words, kept, weighted(kept),
      maxPieceLen, rounds)
    pre.join(kept.select(col("piece"), lit(1L).as("kept")),
        Seq("piece"), "left")
      .join(post.select(col("piece"), col("cnt").as("cnt_post")),
        Seq("piece"), "left")
      .select(col("piece"), coalesce(col("kept"), lit(0L)).as("kept"),
        col("cnt").as("cnt_pre"),
        coalesce(col("cnt_post"), lit(0L)).as("cnt_post"))
  }

  /** ENCODE: per-source tokenization stats under the LEARNED weights
    * (the [[learn]] pipeline run to its final weight table, then one
    * more Viterbi pass): (source, words, chars, pieces) — total word
    * occurrences, characters, and unigram-LM pieces, each weighted by
    * occurrence. The compression the learned vocabulary buys per
    * source, the [[Bpe.encodeStats]] analog. */
  def encodeStats(docs: DataFrame, textCol: String, sourceCol: String,
                  maxPieceLen: Int = 4, topN: Int = 24, emIters: Int = 2,
                  maxWordLen: Int = 16): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 8, "maxPieceLen out of range")
    require(emIters >= 1 && emIters <= 4, "emIters out of range")
    require(maxWordLen >= 2 && maxWordLen <= 32, "maxWordLen out of range")
    val rounds = 32 - Integer.numberOfLeadingZeros(maxWordLen - 1)
    // per-(source, word) counts in ONE corpus pass; the global word
    // table derives from it (no second pass — the Bpe.encodeStats rule)
    val sw = docs.select(col(sourceCol).as("source"),
        explode(toks(col(textCol))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val words = sw.groupBy(col("w")).agg(sum(col("c")).as("cnt"))
      .withColumn("w", when(length(col("w")) > maxWordLen,
        raise_error(concat(lit(s"unigram: word longer than $maxWordLen"),
          lit(": "), col("w")))).otherwise(col("w")))
      .withColumn("len", length(col("w")).cast("long"))
      .localCheckpoint()
    val cands = candidateCensus(words, maxPieceLen, topN).localCheckpoint()
    var counts = cands.select(col("piece"), col("census").as("cnt"))
    for (_ <- 0 until emIters)
      counts = estepCounts(words, cands, weighted(counts),
        maxPieceLen, rounds)
    val best = viterbi(words, weighted(counts), maxPieceLen, rounds)
    sw.join(best.select(col("w"), col("n")), Seq("w"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("words"),
        sum(length(col("w")) * col("c")).as("chars"),
        sum(col("n") * col("c")).as("pieces"))
  }
}
