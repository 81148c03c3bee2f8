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

  /** Deterministic stratified sample: exactly min(k, |stratum|) rows per
    * group, admitted in (content-hash, id) order — the same draw on any
    * partition layout, retry, or engine. One window shuffle on the group
    * key; rank-limit windows rewrite to WindowGroupLimit, so each task
    * forwards at most k rows per group to the shuffle rather than sorting
    * whole strata. */
  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String,
                       k: Int, salt: String): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    // withColumn would silently OVERWRITE caller columns of the same name
    // before we drop them — refuse, as tokenBudgetSample does for its
    // added columns
    for (c <- Seq("__sk", "__rn"))
      require(!df.columns.contains(c),
        s"stratifiedSample uses internal column '$c' but the input has it")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__sk"), col(idCol))
    df.withColumn("__sk", shuffleKey(col(idCol), salt))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__sk", "__rn")
  }

  /** EXACT-proportion stratified split. [[hashSplit]] draws each row
    * independently, so proportions hold only in expectation — a 200-doc
    * stratum can land 74/26 and a small eval set can end up empty.
    * This one GUARANTEES per-stratum counts: within each stratum rows
    * rank by (shuffle hash, id) and rank r goes to
    *   train  iff r ≤ ⌊n·pctTrain/100⌋
    *   val    iff r ≤ ⌊n·(pctTrain+pctVal)/100⌋ (and not train)
    *   test   otherwise
    * — the deterministic eval-carve a training run needs to reproduce
    * across engines, retries, and partition layouts (the hash order is
    * content-keyed, so membership is stable under re-layout exactly
    * like [[hashSplit]]'s).
    *
    * Scale shape: ONE window exchange keyed on the stratum — rank and
    * count ride the same partition — never a global sort. Strata are
    * corpus-sized groups (source, language); the per-stratum sort is
    * the price of exact counts — use [[hashSplit]] when statistical
    * proportions suffice. Integer thresholds use `div` (both engines
    * floor non-negative operands identically). */
  def exactStratifiedSplit(df: DataFrame, strataCol: String, idCol: String,
                           salt: String, pctTrain: Int,
                           pctVal: Int): DataFrame = {
    require(pctTrain >= 0 && pctVal >= 0 && pctTrain + pctVal <= 100,
      s"bad split percentages: $pctTrain/$pctVal")
    for (c <- Seq("__sk", "__rn", "__n"))
      require(!df.columns.contains(c),
        s"exactStratifiedSplit uses internal column '$c' but the input has it")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col("__sk"), col(idCol))
    val wn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
    df.withColumn("__sk", shuffleKey(col(idCol), salt))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
      .withColumn("split",
        when(col("__rn") <= expr(s"(__n * $pctTrain) div 100"), "train")
          .when(col("__rn") <= expr(s"(__n * ${pctTrain + pctVal}) div 100"),
            "val")
          .otherwise("test"))
      .drop("__sk", "__rn", "__n")
  }

  /** Cross-group QUANTILE NORMALIZATION of a score column — the
    * calibration step before mixing per-source quality scores that are
    * not comparable across sources (a CCNet-style pipeline scores each
    * language/source with its own model; rank 50% in one source must
    * mean what rank 50% means in another before a global threshold or
    * mixture weight can touch them). Each row's score is replaced by
    * the GLOBAL score at its within-group quantile:
    *
    *   calibrated(r, n_g) = min { v : 2·n_g·cum(v) ≥ (2r−1)·N }
    *
    * with r = within-group (score, id) rank, n_g the group size,
    * cum(v) the global count of scores ≤ v, N the corpus size — the
    * integer midpoint-quantile mapping, so the whole construction is
    * exact and replayable (q198's hash gate).
    *
    * Scale shape: one group-keyed window exchange (rank + count share
    * it, the q193 shape) plus a DISTINCT-SCORE-sized cumulative
    * histogram broadcast as one row — the [[Diff.ksDrift]] contract:
    * the score column must be bounded-cardinality (quality scores,
    * lengths, bucketed perplexities; quantize first if continuous).
    * The per-row lookup runs map-side over the broadcast array; the
    * HOF lambda references only row attributes (capture-safe). */
  def quantileNormalize(df: DataFrame, groupCol: String, scoreCol: String,
                        idCol: String): DataFrame = {
    for (c <- Seq("__r", "__ng", "__hs", "__n", "__t"))
      require(!df.columns.contains(c),
        s"quantileNormalize uses internal column '$c' but the input has it")
    val w = org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(col(scoreCol).as("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        w.orderBy(col("v")).rowsBetween(w.unboundedPreceding, 0)))
    val histRow = broadcast(hist.agg(
      sort_array(collect_list(struct(col("v"), col("cum")))).as("__hs")))
    val wr = w.partitionBy(col(groupCol)).orderBy(col(scoreCol), col(idCol))
    val wn = w.partitionBy(col(groupCol))
    df.select(col(idCol), col(groupCol), col(scoreCol))
      .withColumn("__r", row_number().over(wr))
      .withColumn("__ng", count(lit(1)).over(wn))
      .crossJoin(histRow)
      .withColumn("__n",
        element_at(col("__hs"), size(col("__hs"))).getField("cum"))
      .withColumn("__t", (col("__r") * 2 - 1) * col("__n"))
      .withColumn("calibrated",
        element_at(filter(col("__hs"),
          e => e.getField("cum") * 2 * col("__ng") >= col("__t")), 1)
          .getField("v"))
      .drop("__r", "__ng", "__hs", "__n", "__t")
  }

  /** EXACT weighted sampling without replacement (k of n, inclusion
    * proportional-to-weight, Efraimidis–Spirtes order) — the data-mixing
    * primitive: "sample 1M documents, quality-weighted" without an RNG.
    *
    * Each row holds an integer weight w ≥ 1 and gets w deterministic
    * 48-bit TICKETS (sha256 prefix of "salt:id:j", j < w); its key is the
    * MINIMUM ticket, and the k smallest keys win. Why this is exactly the
    * E–S weighted order: x → −ln(1 − x/2^48) is strictly monotone, so
    * ticket order equals order of the mapped values, which are iid
    * Exp(1) draws; the min of w of them is Exp(w)-distributed, and
    * ascending order of independent Exp(w_i) minima is precisely
    * successive probability-proportional-to-weight sampling without
    * replacement (the exponential-clocks construction). Integer tickets
    * mean NO floating point anywhere — selection, order, and ties replay
    * bit-identically in any engine with sha256 (48 bits ≪ 2^53 keeps the
    * replay integer-exact in engines that route ints through doubles).
    *
    * Weights are small integers by contract (quality scores, epoch
    * multipliers — the mixing use case); cost is O(Σw) hashes. The w
    * tickets of a row live IN the row, so the min is an `array_min` over
    * a generated array inside whole-stage codegen: no explode, no
    * shuffle — the only movement is TakeOrderedAndProject's k-row
    * per-partition heaps into the driver-side merge (the q13 shape).
    * At 100 TB: a corpus scan plus k rows of traffic.
    *
    * Returns the k winners as (id-col, weight, ticket, rank), rank 1..k
    * in selection order. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, salt: String, maxWeight: Int = 64): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(maxWeight >= 1 && maxWeight <= 4096,
      s"maxWeight must be in 1..4096: $maxWeight")
    val w = col(weightCol).cast("long")
    // a zero/negative/oversized weight is a caller bug — name it rather
    // than silently emitting no tickets (array_min of empty = null, which
    // would SELECT the row first under nulls-first ordering)
    val guarded = when(w < 1L || w > maxWeight.toLong,
      raise_error(concat(lit(s"weightedSample: weight out of [1, $maxWeight]: "),
        w.cast("string")))).otherwise(w)
    val tickets = transform(
      sequence(lit(0L), guarded - 1L),
      j => conv(substring(sha2(concat(lit(salt + ":"),
        col(idCol).cast("string"), lit(":"), j.cast("string")), 256),
        1, 12), 16, 10).cast("long"))
    val picked = df
      .select(col(idCol), w.as("weight"), array_min(tickets).as("ticket"))
      .orderBy(col("ticket"), col(idCol))
      .limit(k)
    // rank the k survivors — a window over ≤ k rows, not corpus-scale
    val rw = org.apache.spark.sql.expressions.Window
      .orderBy(col("ticket"), col(idCol))
    picked.withColumn("rank", row_number().over(rw).cast("long"))
  }

  /** Fill-in-the-middle (FIM) transform (Bavarian et al. 2022,
    * arXiv:2207.14255): deterministically rewrite a `ratePct`-fraction
    * of documents into infilling layout — two token cut points split the
    * document into (prefix, middle, suffix) and the pieces are reordered
    * with sentinel tokens so an autoregressive model learns to fill the
    * middle:
    *
    *   PSM  `<PRE> prefix <SUF> suffix <MID> middle`
    *   SPM  `<SUF> suffix <PRE> prefix <MID> middle`  (50/50 per doc)
    *
    * All randomness is content-keyed sha256 (the [[hashSplit]] idiom),
    * never RNG state: bytes 0-3 of sha256("salt:id") drive the cut
    * points (c1 uniform over [0, n], c2 uniform over [c1, n]), the
    * transform decision (byte2 mod 100 < ratePct), and the PSM/SPM coin
    * — so retries, repartitions, and engine changes reproduce the same
    * corpus. Untransformed documents pass through verbatim with mode
    * 'none'. Segments travel through `concat_ws`'s null-skip (empty
    * segment → NULL) so adjacent sentinels stay single-spaced. Pure
    * codegen map stage, zero shuffle — at 100 TB this is free inside the
    * corpus scan.
    *
    * Returns (id, fim_text, mode, n_pre, n_mid, n_suf) with token counts
    * of the three segments (zeros when mode = 'none'). */
  def fimTransform(docs: DataFrame, idCol: String, textCol: String,
                   ratePct: Int = 50, salt: String = "fim"): DataFrame = {
    require(ratePct >= 0 && ratePct <= 100, s"ratePct out of range: $ratePct")
    import graft.functions.TextFunctions
    val hx = sha2(concat(lit(salt + ":"), col(idCol).cast("string")), 256)
    def hb(k: Int): Column =
      conv(substring(hx, 2 * k + 1, 2), 16, 10).cast("int")
    val s = TextFunctions.tokens(TextFunctions.normalizeWs(col(textCol)))
    val n = size(s)
    val c1 = hb(0) % (n + 1)             // prefix length ∈ [0, n]
    val c2 = c1 + hb(1) % (n - c1 + 1)   // middle end ∈ [c1, n]
    val doFim = (hb(2) % 100 < ratePct) && n > 0
    val spm = hb(3) % 2 === 1
    def seg(a: Column): Column = nullif(array_join(a, " "), lit(""))
    val pre = seg(slice(s, lit(1), c1))
    val mid = seg(slice(s, c1 + 1, c2 - c1))
    val suf = seg(slice(s, c2 + 1, n - c2))
    docs.select(col(idCol),
      when(!doFim, col(textCol))
        .when(spm, concat_ws(" ", lit("<SUF>"), suf, lit("<PRE>"), pre,
          lit("<MID>"), mid))
        .otherwise(concat_ws(" ", lit("<PRE>"), pre, lit("<SUF>"), suf,
          lit("<MID>"), mid)).as("fim_text"),
      when(!doFim, lit("none")).when(spm, lit("spm")).otherwise(lit("psm"))
        .as("mode"),
      when(doFim, c1).otherwise(lit(0)).as("n_pre"),
      when(doFim, c2 - c1).otherwise(lit(0)).as("n_mid"),
      when(doFim, n - c2).otherwise(lit(0)).as("n_suf"))
  }

  /** Group-aware K-fold assignment with SNAKE-DRAFT balancing — the
    * leakage-preventing cross-validation split (GroupKFold): near
    * duplicates, boilerplate, and style leakage live WITHIN a group (a
    * domain, a source, a repo), so evaluation folds must contain whole
    * groups, never rows ([[exactStratifiedSplit]] solves the opposite
    * problem — proportional presence of every stratum in every split).
    * Groups rank by (size desc, content hash, group) and fill folds in
    * boustrophedon order 0…k−1, k−1…0, … — the classic draft rule:
    * deterministic, one pass, and imbalance bounded by group-size
    * differences within a zig-zag round rather than accumulating.
    *
    * Scale shape: the window runs over the GROUP CENSUS (bounded by
    * distinct groups — the ksDrift bounded-cardinality contract), and
    * the fold table broadcasts back onto the corpus rows; corpus rows
    * never enter a window. ASSUMES group cardinality is census-sized
    * (sources, domains, repos — thousands to low millions), NOT
    * row-sized: the draft rank is one global window, so the census
    * serializes through a single partition, and the fold table must
    * broadcast. `maxGroups` (default 1M — a single-partition 1M-row
    * window is seconds; the broadcast stays ≪ executor memory) fails
    * loudly inside the census plan rather than letting a row-sized
    * group key degrade into a one-partition sort of the corpus.
    *
    * A NULL group is a VALID group: the census counts it and the
    * null-safe (`<=>`) join carries its rows into a fold — an
    * equality join would silently drop every null-group row while the
    * census still ranked them (ADVICE r10; [[exactStratifiedSplit]]
    * keeps null strata the same way).
    *
    * Returns the input rows + `fold` ∈ [0, k). */
  def groupKFolds(df: DataFrame, groupCol: String, k: Int,
                  salt: String = "gkf",
                  maxGroups: Long = 1000000L): DataFrame = {
    require(k >= 2 && k <= 64, s"k out of range: $k")
    require(!df.columns.contains("fold"),
      "groupKFolds adds a 'fold' column but the input already has one")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("gsz").desc, shuffleKey(col(groupCol), salt),
        col(groupCol))
    val folds = df.groupBy(col(groupCol)).agg(count(lit(1)).as("gsz"))
      .withColumn("__r", row_number().over(w))
      .withColumn("__r", when(col("__r") <= maxGroups, col("__r"))
        .otherwise(raise_error(lit(s"groupKFolds: more than $maxGroups " +
          "distinct groups — the census window serializes on one " +
          "partition; use a coarser group key or raise maxGroups"))))
      .withColumn("__p", (col("__r") - 1) % (2 * k))
      .select(col(groupCol).as("__gkf_g"),
        when(col("__p") < k, col("__p"))
          .otherwise(lit(2 * k - 1) - col("__p")).cast("long").as("fold"))
    df.join(broadcast(folds), df(groupCol) <=> col("__gkf_g"))
      .drop("__gkf_g")
  }

  /** T5 SPAN CORRUPTION (Raffel et al. 2020 §3.1.4) — the
    * denoising-objective layout next to [[fimTransform]]'s infilling
    * one: deterministic token spans are masked out of the input and
    * collected, sentinel-keyed, into the target:
    *
    *   input  = tokens with each masked RUN replaced by <extra_id_k>
    *   target = <extra_id_0> run0 <extra_id_1> run1 … <extra_id_K>
    *
    * (K = run count; the target always ends with the final sentinel —
    * the paper's convention, so an unmasked document's target is
    * exactly `<extra_id_0>`.) All randomness is content-keyed sha256
    * (the [[hashSplit]] idiom): token i of doc d seeds a span iff byte
    * 0 of sha256("salt:d:i") < 38 (≈15% seed rate), with span length
    * 1 + (byte1 mod 3) ∈ {1,2,3} (mean 2 — the paper's mean-3 knob
    * scaled to this corpus's short documents); overlapping spans merge
    * into runs, exactly the gaps-and-islands rule the q202 oracle
    * replays (token i is masked iff a seed at i−δ has length > δ,
    * δ ∈ {0,1,2}). Tokenization is the engine-standard lower + trim +
    * whitespace split.
    *
    * One map-only pass — per-row hashing and the serial island scan
    * run inside the task ([[Embeddings.featureHashArrays]]'s shape);
    * nothing crosses a shuffle. Returns (id, n_tok, n_masked,
    * n_spans, input_text, target_text). */
  def spanCorruption(docs: DataFrame, idCol: String, textCol: String,
                     salt: String = "sc:42"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, text) =>
          val toks = text.trim.toLowerCase(java.util.Locale.ROOT)
            .split("\\s+").filter(_.nonEmpty)
          val n = toks.length
          val masked = new Array[Boolean](n)
          var i = 0
          while (i < n) {
            val h = md.digest(s"$salt:$id:$i".getBytes("UTF-8"))
            if ((h(0) & 0xff) < 38) {
              val len = 1 + ((h(1) & 0xff) % 3)
              var j = i
              val lim = math.min(n, i + len)
              while (j < lim) { masked(j) = true; j += 1 }
            }
            i += 1
          }
          val inB = new StringBuilder
          val tgB = new StringBuilder
          var k = 0
          var nMasked = 0L
          i = 0
          while (i < n) {
            if (!masked(i)) {
              if (inB.nonEmpty) inB.append(' ')
              inB.append(toks(i))
              i += 1
            } else {
              if (inB.nonEmpty) inB.append(' ')
              inB.append("<extra_id_").append(k).append('>')
              if (tgB.nonEmpty) tgB.append(' ')
              tgB.append("<extra_id_").append(k).append('>')
              while (i < n && masked(i)) {
                tgB.append(' ').append(toks(i))
                nMasked += 1
                i += 1
              }
              k += 1
            }
          }
          if (tgB.nonEmpty) tgB.append(' ')
          tgB.append("<extra_id_").append(k).append('>')
          (id, n.toLong, nMasked, k.toLong, inB.toString, tgB.toString)
        }
      }.toDF(idCol, "n_tok", "n_masked", "n_spans", "input_text",
        "target_text")
  }

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

  /** Strided (overlapping) token windows — the RAG/pretraining layout
    * where consecutive chunks share `windowTokens - stride` tokens of
    * context. Chunk i covers [i·stride, i·stride + windowTokens), clipped
    * to the document; generation stops at the last window that starts
    * inside the document, and every token is covered. Same narrow
    * map-side explode shape as [[tokenChunks]] (which is the
    * stride == windowTokens special case). */
  def stridedChunks(df: DataFrame, idCol: String, textCol: String,
                    windowTokens: Int, stride: Int): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive: $windowTokens")
    require(stride > 0 && stride <= windowTokens,
      s"stride must be in (0, windowTokens]: $stride")
    val w = lit(windowTokens.toLong)
    val st = lit(stride.toLong)
    df.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      // last chunk index: the smallest i with i*stride + window >= n_tok,
      // i.e. ceil((n_tok - window) / stride), floored at 0
      .select(col(idCol), col("n_tok"),
        greatest(lit(0L), ceil((col("n_tok") - w).cast("double") / st)
          .cast("long")).as("last_idx"))
      .select(col(idCol), col("n_tok"),
        explode(sequence(lit(0L), col("last_idx"))).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * st).as("tok_start"),
        least(col("chunk_idx") * st + w, col("n_tok")).as("tok_end"))
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

  /** Pack-boundary index — the per-sequence metadata a packed-corpus
    * writer actually ships next to the token stream: for every
    * (shard, seq_id) from [[packSequences]], the sorted document start
    * offsets (the attention-mask reset points — cross-document attention
    * is masked AT these boundaries), the member ids in position order,
    * the filled token count, and the fill fraction (capacity is a power
    * of two in practice, so the division is exact IEEE scaling and
    * replays bit-identically). One hash-agg shuffle on (shard, seq_id);
    * boundary arrays are per-sequence-sized, never corpus-sized. */
  def packBoundaries(packed: DataFrame, idCol: String,
                     capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    packed.groupBy(col("shard"), col("seq_id"))
      .agg(
        sort_array(collect_list(struct(col("tok_start"), col(idCol))))
          .as("__bd"),
        sum(col("n_tok")).as("fill"),
        count(lit(1)).as("n_docs"))
      .select(col("shard"), col("seq_id"),
        transform(col("__bd"), b => b.getField("tok_start")).as("boundaries"),
        transform(col("__bd"), b => b.getField(idCol)).as("doc_ids"),
        col("fill"), col("n_docs"),
        (col("fill").cast("double") / capacity).as("fill_frac"))
  }

  /** Fractional-epoch upsampling — materialize a mixture like "2.5
    * epochs of wiki, 0.3 of web" (the repeated-high-quality-sources
    * recipe): each row repeats ⌊pct/100⌋ times, plus ONE more copy for a
    * deterministic content-hash-selected (pct mod 100)% of rows — so
    * expected copies per source = pct/100 exactly (up to the 1/256 hash
    * quantization of the fractional cut), and pct < 100 degenerates to
    * the [[weightedMixture]] subsample. `epochsPct` is a per-row column
    * (hundredths of an epoch: 250 = 2.5 epochs) so callers drive it from
    * a source map, a quality score, or any expression. The fractional
    * draw is the [[hashSplit]] idiom (first sha byte < ⌊frac·256/100⌋):
    * retries, layout, and engines reproduce the same copy set. Pure
    * map-side explode — the fan-out happens inside the scan's map stage,
    * zero shuffle, which is what makes epoch materialization affordable
    * at 100 TB (the alternative, a per-epoch union, re-plans the corpus
    * scan per epoch).
    *
    * Output: input columns + `copy_idx` (0-based); rows with zero copies
    * disappear. */
  def epochRepeat(df: DataFrame, idCol: String, epochsPct: Column,
                  salt: String): DataFrame = {
    require(!df.columns.contains("copy_idx"),
      "epochRepeat emits 'copy_idx' but the input already has it")
    val pct = epochsPct.cast("int")
    val b = conv(substring(
      sha2(concat(col(idCol).cast("string"), lit(":" + salt)), 256), 1, 2),
      16, 10).cast("int")
    val base = floor(pct / lit(100)).cast("int")
    val thr = floor((pct % 100) * lit(256) / lit(100)).cast("int")
    val k = base + when(b < thr, 1).otherwise(0)
    // sequence(0, k-1) DESCENDS for k <= 0 — the guard is load-bearing
    df.withColumn("copy_idx",
      explode(when(k >= 1, sequence(lit(0), k - 1))
        .otherwise(array().cast("array<int>"))))
  }

  /** Length-bucketed batch assignment (the "length-grouped sampler"
    * training layout): bucket documents by token count at the given
    * edges, order each bucket by (token count DESC, content hash, id),
    * and cut consecutive runs of `batchRows` docs into batches — so a
    * batch pads every member to its own longest doc, not the corpus's,
    * and the reported `waste` (pad_to − n_tok) is the padding cost the
    * layout actually saves versus random batching. Length-descending
    * order inside the bucket is the real sampler's trick: it packs
    * near-equal lengths together, so `pad_to` hugs each batch's median.
    *
    * Scale shape: the only corpus-scale exchange is the bucket window.
    * With `subBuckets = N > 1` (the [[temperatureMixture]] mitigation)
    * each bucket splits across N deterministic hash sub-buckets —
    * batches never span sub-buckets, so a bucket holding most of the
    * corpus ranks through N independent window tasks instead of one
    * (the q142 lesson: no operator gets to sort the corpus in a single
    * partition). Batch stats (`pad_to`) ride a second window over the
    * same keys + batch_idx; its exchange carries only id-sized rows.
    *
    * Returns (id, n_tok, bucket, sub, batch_idx, slot, pad_to, waste).
    * Deterministic under retries/layout: order keys are content hashes,
    * never RNG or partition state. */
  def lengthBucketBatches(docs: DataFrame, idCol: String, textCol: String,
                          batchRows: Int, salt: String, edges: Seq[Int],
                          subBuckets: Int = 1): DataFrame = {
    import graft.functions.TextFunctions
    import org.apache.spark.sql.expressions.Window
    require(batchRows > 0, s"batchRows must be positive: $batchRows")
    require(edges.nonEmpty && edges == edges.sorted && edges.head > 0,
      s"edges must be sorted positive: $edges")
    require(subBuckets >= 1 && subBuckets <= 256,
      s"subBuckets must be in 1..256: $subBuckets")
    val nTok = TextFunctions.tokenCount(col(textCol)).cast("int")
    val sk = shuffleKey(col(idCol), salt)
    val bucket = edges.foldLeft(lit(0)) { (acc, e) =>
      acc + when(col("n_tok") >= e, 1).otherwise(0) }
    val digits = "0123456789abcdef"
    def hexDigit(i: Int): Column = locate_(substring(col("__sk"), i, 1), digits) - 1
    val sub =
      if (subBuckets == 1) lit(0)
      else (hexDigit(1) * 16 + hexDigit(2)) % subBuckets
    val w = Window.partitionBy(col("bucket"), col("sub"))
      .orderBy(col("n_tok").desc, col("__sk"), col(idCol))
    val wBatch = Window.partitionBy(col("bucket"), col("sub"), col("batch_idx"))
    docs.select(col(idCol), nTok.as("n_tok"), sk.as("__sk"))
      .withColumn("bucket", bucket)
      .withColumn("sub", sub.cast("int"))
      .withColumn("__rn", row_number().over(w) - 1)
      .withColumn("batch_idx", (col("__rn") / batchRows).cast("int"))
      .withColumn("slot", (col("__rn") % batchRows).cast("int"))
      .withColumn("pad_to", max(col("n_tok")).over(wBatch))
      .withColumn("waste", col("pad_to") - col("n_tok"))
      .select(col(idCol), col("n_tok"), col("bucket"), col("sub"),
        col("batch_idx"), col("slot"), col("pad_to"), col("waste"))
  }

  /** Temperature (α = 1/2) source mixture: rebalance sources by keeping
    * `floor(scale · sqrt(n_s))` docs from each source `s`, admitted in
    * deterministic (content-hash, id) order — the standard alpha-sampling
    * rebalance where a source 100× larger contributes only 10× the docs.
    * Unlike [[weightedMixture]] (caller-fixed per-row rates), the rates
    * here derive from the observed source sizes.
    *
    * α is fixed at 1/2 on purpose: sqrt is the one power IEEE 754
    * specifies exactly rounded, so the per-source targets — and therefore
    * the admitted SET, not just its size — are bit-reproducible on any
    * engine and replayable by the q103 oracle; an arbitrary-α `pow` would
    * make target boundaries depend on last-ulp library behavior.
    *
    * Scale shape: one tiny per-source count aggregate broadcast back, then
    * one window shuffle. With `subBuckets = 1` (the engine-exact default)
    * the window partitions by source alone; the rank limit is
    * data-dependent (a column, not a literal), so WindowGroupLimit cannot
    * prune map-side as it does for [[stratifiedSample]] — a giant source
    * sorts in one window partition. At that shape pass `subBuckets = N`
    * (2..256), the same mitigation [[tokenBudgetSample]] uses: each
    * source's target splits integrally across N deterministic hash
    * sub-buckets (bucket = first sample-key byte mod N; per-bucket target
    * = floor(tgt/N), the first tgt%N buckets taking one extra doc — the
    * per-bucket targets sum to the source target EXACTLY), and the window
    * partitions by (source, sub_bucket) so a giant source admits through
    * N independent tasks. The draw stays uniform and engine-replayable:
    * sample-key bytes are i.i.d. uniform, so bucketing by byte then
    * admitting in-bucket in hash order is a stratified version of the
    * same random-looking order (the admitted SET differs from
    * subBuckets = 1, as with any stratification — both sets are
    * deterministic and oracle-gated: q103 / q105).
    *
    * Rows with a NULL source are DROPPED (the targets equi-join never
    * matches a null key): a doc that cannot be attributed to a source has
    * no defined per-source rate. Filter or coalesce upstream to keep them. */
  def temperatureMixture(df: DataFrame, srcCol: String, idCol: String,
                         scale: Double, salt: String,
                         subBuckets: Int = 1): DataFrame = {
    require(scale > 0, s"scale must be positive: $scale")
    require(subBuckets >= 1 && subBuckets <= 256,
      s"subBuckets must be in 1..256: $subBuckets")
    for (c <- Seq("__sk", "__rn", "__tgt", "__sb"))
      require(!df.columns.contains(c),
        s"temperatureMixture uses internal column '$c' but the input has it")
    val targets = df.groupBy(col(srcCol)).agg(
      floor(lit(scale) * sqrt(count(lit(1)).cast("double")))
        .cast("long").as("__tgt"))
    val keyed = df.join(broadcast(targets), Seq(srcCol))
      .withColumn("__sk", shuffleKey(col(idCol), salt))
    val admitted = if (subBuckets == 1) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(srcCol)).orderBy(col("__sk"), col(idCol))
      keyed.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= col("__tgt"))
    } else {
      // first hash byte via hex-digit positions — pure string ops that
      // replay identically in any ANSI engine (same trick as
      // tokenBudgetSample's sub_bucket)
      val digits = "0123456789abcdef"
      def hexDigit(i: Int): Column =
        locate_(substring(col("__sk"), i, 1), digits) - 1
      val bucket = (hexDigit(1) * 16 + hexDigit(2)) % subBuckets
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(srcCol), col("__sb")).orderBy(col("__sk"), col(idCol))
      // integer split of the data-dependent target: floor(tgt/N) each,
      // buckets 0..(tgt%N - 1) one extra — sums to tgt exactly. tgt is a
      // row count < 2^52, so the double division is exact enough for
      // floor (and matches the oracle's floor(t / N) replay).
      val perBucket = floor(col("__tgt") / lit(subBuckets)).cast("long") +
        when(col("__sb") < pmod(col("__tgt"), lit(subBuckets.toLong)), 1L)
          .otherwise(0L)
      keyed.withColumn("__sb", bucket.cast("int"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= perBucket)
    }
    // the join put the source key first — restore the caller's column
    // order (and shed the internals) in one projection
    admitted.select(df.columns.map(col): _*)
  }

  /** Distinct word n-grams of a text column — native single-pass
    * expressions (graft.expressions.WordNgrams); the string variant is
    * equivalence-tested against the declarative
    * array_distinct(wordShingles(tokens(normalizeWs(.)))) recipe, the
    * hashed variant ships 8-byte longs instead of gram strings. */
  private def ngramSet(text: Column, n: Int, hashed: Boolean): Column = {
    val t = coalesce(text, lit(""))
    if (hashed) graft.expressions.WordNgrams.wordNgramHashes(t, n)
    else graft.expressions.WordNgrams.wordNgramStrings(t, n)
  }

  /** The benchmark side as one distinct n-gram per row, broadcast: a
    * BroadcastHashJoin builds its hash table ONCE per task. (The tempting
    * alternative — collect_set into one row and `array_intersect` per
    * corpus row — rebuilds that hash set for EVERY document: O(corpus ×
    * bench), quadratic-ish at scale. Measured 10× slower at sf0.01.) */
  private def benchGrams(benchmark: DataFrame, textCol: String, n: Int,
                         hashed: Boolean): DataFrame =
    broadcast(
      benchmark.select(explode(ngramSet(col(textCol), n, hashed)).as("g"))
        .distinct())

  /** Benchmark decontamination stats: for every corpus document, how many
    * distinct word `n`-grams it shares with a benchmark/eval set —
    * (id, n_hits, contaminated). The standard pre-training hygiene step:
    * training text that quotes an eval set inflates benchmark scores, so
    * overlapping documents must be found (and usually dropped) before
    * training.
    *
    * Scale shape: the benchmark is the SMALL side (eval sets are MBs; the
    * corpus is the 100 TB side). Its distinct grams broadcast; the corpus
    * explodes its per-doc-distinct grams map-side into a broadcast left
    * join (hash table built once per task, probed per gram), and the hit
    * count aggregates partially before the ONLY shuffle — one narrow
    * (id, count) row per doc. `hashed=true` (default) moves xxhash64
    * longs instead of gram strings; identical hits modulo 2^-64
    * collisions. The string path exists for engine-exact comparison (the
    * q61 oracle) and is equivalence-tested against the hashed path in
    * CurationSpec. */
  def contaminationStats(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String, n: Int = 3,
                         hashed: Boolean = true): DataFrame = {
    val bench = benchGrams(benchmark, textCol, n, hashed)
      .withColumn("__hit", lit(1))
    corpus.select(col(idCol), explode_outer(ngramSet(col(textCol), n, hashed)).as("g"))
      .join(bench, Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__hit")).as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0L)
  }

  /** Token-budgeted source sampling: keep a uniform random-looking (but
    * fully deterministic) subset of each source totalling at most
    * `budget` tokens — how real data mixtures are specified ("50 B
    * tokens of web, 10 B of code"), as opposed to row-fraction sampling
    * which ignores document length. Rows are admitted in content-hash
    * order until the source's running token sum crosses the budget;
    * adds (sample_key, n_tok, cum_tok).
    *
    * Scale shape: with `subBuckets = 1` (the engine-exact default), one
    * window shuffle partitioned by source — a source's documents form ONE
    * window partition, so a handful of giant sources serialize through
    * single tasks. At that shape pass `subBuckets = N` (2..256): each
    * source's budget splits across N deterministic hash sub-buckets
    * (bucket = first sample-key byte mod N; per-bucket budget =
    * budget/N, the first budget%N buckets taking one extra token), the
    * window partitions by (source, sub_bucket), and the N windows run as
    * independent tasks — per-source parallelism ×N while the admitted
    * set stays deterministic, budget-bounded (Σ per-bucket budgets =
    * budget exactly) and engine-replayable. The draw stays uniform:
    * sample-key bytes are i.i.d. uniform, so bucketing by byte then
    * admitting in-bucket in hash order is a stratified version of the
    * same random-looking order. */
  def tokenBudgetSample(df: DataFrame, idCol: String, textCol: String,
                        srcCol: String, budget: Long, salt: String,
                        subBuckets: Int = 1): DataFrame = {
    require(subBuckets >= 1 && subBuckets <= 256,
      s"subBuckets must be in 1..256: $subBuckets")
    // withColumn would silently OVERWRITE these if the caller's frame
    // already carries them (e.g. tokenChunks output has n_tok) — refuse,
    // as quantilePrune does for its added columns
    val added = Seq("sample_key", "n_tok", "cum_tok") ++
      (if (subBuckets > 1) Seq("sub_bucket") else Nil)
    for (c <- added)
      require(!df.columns.contains(c),
        s"tokenBudgetSample adds column '$c' but the input already has it")
    import org.apache.spark.sql.expressions.Window
    val keyed = df
      .withColumn("sample_key", shuffleKey(col(idCol), salt))
      .withColumn("n_tok",
        graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long"))
    if (subBuckets == 1) {
      val w = Window.partitionBy(col(srcCol))
        .orderBy(col("sample_key"), col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      keyed.withColumn("cum_tok", sum(col("n_tok")).over(w))
        .filter(col("cum_tok") <= budget)
    } else {
      // first hash byte via hex-digit positions — pure string ops that
      // replay identically in any ANSI engine (no hex-to-int builtin
      // needed): locate() is 1-based, so each digit maps to 0..15
      val digits = "0123456789abcdef"
      def hexDigit(i: Int): Column =
        locate_(substring(col("sample_key"), i, 1), digits) - 1
      val bucket = (hexDigit(1) * 16 + hexDigit(2)) % subBuckets
      val w = Window.partitionBy(col(srcCol), col("sub_bucket"))
        .orderBy(col("sample_key"), col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // integer split of the budget: buckets 0..(budget%N - 1) get one
      // extra token so the per-bucket budgets sum to `budget` exactly
      val perBucket = lit(budget / subBuckets) +
        when(col("sub_bucket") < lit(budget % subBuckets), 1L).otherwise(0L)
      keyed.withColumn("sub_bucket", bucket.cast("int"))
        .withColumn("cum_tok", sum(col("n_tok")).over(w))
        .filter(col("cum_tok") <= perBucket)
    }
  }

  /** `locate` with Column haystack fixed as a literal (functions.locate
    * wants String substr, so wrap expr-free). */
  private def locate_(substr: Column, str: String): Column =
    call_function("locate", substr, lit(str))

  /** Greedy sequence packing: concatenate documents into fixed-capacity
    * token sequences (pretraining batch layout). Documents are assigned
    * to one of 16^`shardHexChars` deterministic shards by content hash,
    * ordered within the shard by (hash, id), and packed first-fit: a doc
    * that would overflow the current sequence starts the next one (a doc
    * longer than `capacity` occupies a sequence alone). Output: (id,
    * shard, seq_id, tok_start, n_tok) — seq_id counts per shard,
    * tok_start is the doc's offset inside its sequence.
    *
    * Packing is inherently sequential, so the parallelism unit is the
    * shard: each packs independently inside its partition (state resets
    * on shard change; membership and order are content-hash-determined,
    * so any partition count or retry reproduces the same packing).
    * Default 2 hex chars = 256 shards; raise it at corpus scale. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    capacity: Long, salt: String,
                    shardHexChars: Int = 2): DataFrame = {
    require(capacity > 0 && shardHexChars >= 1 && shardHexChars <= 8)
    // an id cast would turn non-numeric ids into silent nulls — refuse
    val idType = df.schema(idCol).dataType.typeName
    require(Set("long", "integer", "short", "byte").contains(idType),
      s"packSequences requires an integral id column, $idCol is $idType")
    import df.sparkSession.implicits._
    val keyed = df.select(col(idCol).cast("long").as("id"),
        graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long")
          .as("n_tok"),
        shuffleKey(col(idCol), salt).as("sk"))
      .withColumn("shard", substring(col("sk"), 1, shardHexChars))
      .as[(Long, Long, String, String)]
    keyed.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("sk"), col("id"))
      .mapPartitions { it =>
        var curShard: String = null
        var seq = 0L
        var fill = 0L
        it.map { case (id, n, _, shard) =>
          if (shard != curShard) { curShard = shard; seq = 0L; fill = 0L }
          if (fill > 0 && fill + n > capacity) { seq += 1L; fill = 0L }
          val start = fill
          fill += n
          (id, shard, seq, start, n)
        }
      }
      .toDF(idCol, "shard", "seq_id", "tok_start", "n_tok")
  }

  /** Per-group quantile pruning: keep the rows of each `groupCol` group
    * whose `scoreCol` is at or above the group's `p`-quantile (e.g. drop
    * the bottom-half-quality docs of every source). The returned frame
    * carries two extra columns: `q_cut` (the group's quantile) and
    * `q_total` (the group's pre-prune row count) so callers can report
    * retention without a second pass.
    *
    * `accuracy = 0` (default) uses Spark's exact interpolating
    * `percentile` — a mergeable counts-map aggregate, safe while each
    * group's distinct-score set is modest (bounded score grids like
    * rounded quality scores). For heavy-cardinality scores at corpus
    * scale pass an `approx_percentile` accuracy (e.g. 10000): mergeable
    * sketch, bounded memory, rank error ≤ 1/accuracy.
    *
    * Scale shape: one aggregate shuffle to compute |groups| cut rows,
    * which broadcast back onto the corpus — the corpus itself crosses no
    * shuffle. Determinism: exact mode interpolates identically across
    * engines; the cut value only ever equals a data point when the
    * quantile lands ON one (interpolation between distinct adjacent
    * values yields a value strictly between them), so `>=` keeps the
    * same rows everywhere. */
  def quantilePrune(df: DataFrame, groupCol: String, scoreCol: String,
                    p: Double, accuracy: Int = 0): DataFrame = {
    require(!df.columns.contains("q_cut") && !df.columns.contains("q_total"),
      "quantilePrune adds q_cut/q_total; input must not already have them")
    val cut =
      if (accuracy > 0) percentile_approx(col(scoreCol), lit(p), lit(accuracy))
      else percentile(col(scoreCol), lit(p))
    val cuts = df.groupBy(col(groupCol))
      .agg(cut.as("q_cut"), count(lit(1)).as("q_total"))
    df.join(broadcast(cuts), Seq(groupCol))
      .filter(col(scoreCol) >= col("q_cut"))
  }

  /** Benchmark decontamination: corpus rows sharing NO word `n`-gram with
    * the benchmark set, all columns preserved. Dirty ids come from the
    * same broadcast-join shape as [[contaminationStats]] (semi join, so a
    * document short-circuits on its first hit); the final anti-join is on
    * the id — AQE broadcasts it when the dirty set is small, which for a
    * curated corpus vs an eval set it always is. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, idCol: String,
                    textCol: String, n: Int = 3,
                    hashed: Boolean = true): DataFrame = {
    val dirty = corpus
      .select(col(idCol), explode(ngramSet(col(textCol), n, hashed)).as("g"))
      .join(benchGrams(benchmark, textCol, n, hashed), Seq("g"), "left_semi")
      .select(col(idCol)).distinct()
    corpus.join(dirty, Seq(idCol), "left_anti")
  }

  /** Bloom-prefiltered decontamination: the SAME rows as [[decontaminate]]
    * for the scale where the benchmark's gram set no longer fits a
    * broadcast hash table (leak-scanning against a whole eval battery, or
    * corpus-vs-corpus overlap checks).
    *
    * [[decontaminate]] broadcasts the benchmark's distinct grams and
    * probes a per-task hash table; past a few hundred million grams the
    * broadcast build fails first. Here the benchmark side collapses to a
    * Bloom sketch (~10 bits/gram at the default 1% fpp, ~2 orders of
    * magnitude under a hash table of 8-byte keys), shipped once as a
    * binary literal into Spark's codegen'd `might_contain` — the same
    * expression pair Catalyst's runtime row-level filtering injects — so
    * the prefilter runs INSIDE the corpus scan's map stage. Only grams
    * that might hit (true overlaps plus the fpp tail) reach the exact
    * verification semi-join, shrinking that shuffle from "every gram in
    * the corpus" to "candidate grams only"; no broadcast hint there, so
    * an oversized benchmark sort-merges against the already-thinned
    * candidates instead of dying in a broadcast. Bloom filters admit no
    * false negatives and the verify join removes the false positives, so
    * the output is bit-identical to the exact path (pinned in
    * CurationSpec; q76's DuckDB oracle is the q61 SQL family).
    *
    * `expectedGrams` sizes the sketch; 0 (default) counts the benchmark
    * gram set first — one extra pass over the SMALL side. Collecting the
    * one-row sketch to the driver is the sketch-exchange design (exactly
    * how a broadcast variable moves), not a driver-side compute loop.
    * Sketches above ~8 MiB need
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` raised. */
  /** @param persistBench cache the distinct benchmark-gram frame for the
    *        duration of the job: it is consumed up to three times (the
    *        sizing count, the sketch aggregate, and the exact verify
    *        semi-join in the returned plan), and at the operator's design
    *        point — a benchmark too large to broadcast — each re-derive
    *        is a full shuffle. Caller owns cleanup (unpersist/clearCache)
    *        in long-lived sessions, as with minhashDupPairs/lineDedup. */
  def bloomDecontaminate(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String, n: Int = 3,
                         fpp: Double = 0.01,
                         expectedGrams: Long = 0L,
                         persistBench: Boolean = true): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.util.sketch.BloomFilter

    val bench0 = benchmark
      .select(explode(ngramSet(col(textCol), n, hashed = true)).as("g"))
      .distinct()
    val bench = if (persistBench)
      bench0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else bench0
    val items = math.max(
      if (expectedGrams > 0) expectedGrams else bench.count(), 1L)
    val numBits = BloomFilter.optimalNumOfBits(items, fpp)
    val agg = new BloomFilterAggregate(ColumnBridge.expression(col("g")),
      Literal(items), Literal(numBits)).toAggregateExpression()
    val sketch = bench.select(ColumnBridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    if (sketch == null) {
      // empty benchmark: nothing to strip — and the just-materialized
      // cache has no remaining consumer, so free it rather than leak it
      bench.unpersist(blocking = false)
      return corpus
    }
    val mightHit = ColumnBridge.column(BloomFilterMightContain(
      Literal(sketch), ColumnBridge.expression(col("g"))))
    val dirty = corpus
      .select(col(idCol), explode(ngramSet(col(textCol), n, hashed = true)).as("g"))
      .filter(mightHit)
      .join(bench, Seq("g"), "left_semi")
      .select(col(idCol)).distinct()
    corpus.join(dirty, Seq(idCol), "left_anti")
  }

  /** DSIR-style importance weighting (Xie et al., NeurIPS 2023 — "Data
    * Selection via Importance Resampling"): score every raw document by
    * how much more likely its hashed-n-gram bag is under a TARGET
    * domain's feature distribution than under the raw pool's, with
    * add-one smoothing over the bucket vocabulary:
    *
    *   logw(x) = Σ_grams [ ln (ct_b + 1)/(Tt + B) − ln (cr_b + 1)/(Tr + B) ]
    *
    * over hashed unigram+bigram features (bucket = sha-prefix hash of
    * the gram mod B — the replayable kmvHash, so the whole model gates
    * in an ANSI oracle; the per-term lns differ across libms by ≤1 ulp
    * and the summation-order jitter is absorbed by the caller's r4
    * rounding, the q71 treatment). Positive logw means "looks like the
    * target domain"; resampling by weight is the paper's selection step
    * (the deterministic admission machinery of the temperature mixture
    * applies unchanged).
    *
    * 100 TB shape: gram explode and bucketing are map-side inside the
    * corpus scan; both count models are B-row aggregates (B = buckets,
    * default 1024) with map-side partials; the per-bucket log-ratio
    * table is a broadcast join back into the gram stream; one final
    * per-doc aggregation. The corpus is scanned twice (model build +
    * scoring) or once if the caller persists the gram frame — never
    * more; no shuffle ever carries gram strings, only (doc_id, bucket).
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
                        srcCol: String, targetSource: String,
                        buckets: Int = 1024): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"buckets out of range: $buckets")
    import org.apache.spark.storage.StorageLevel
    import graft.functions.{KmvAggregator, TextFunctions}
    val toks = df.select(col(idCol).as("doc_id"), col(srcCol).as("source"),
      TextFunctions.tokens(TextFunctions.normalizeWs(col(textCol))).as("tk"))
    val grams = toks.select(col("doc_id"), col("source"),
        explode(concat(col("tk"), TextFunctions.wordShingles(col("tk"), 2)))
          .as("gram"))
      .select(col("doc_id"), col("source"),
        pmod(KmvAggregator.kmvHash(col("gram")), lit(buckets.toLong)).as("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val raw = grams.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tgt = grams.filter(col("source") === targetSource)
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val totals = grams.agg(count(lit(1)).as("tr"),
      count(when(col("source") === targetSource, 1)).as("tt"))
    val model = raw.join(tgt, Seq("b"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(totals))
      .select(col("b"),
        (log((col("ct") + 1).cast("double") / (col("tt") + buckets)) -
          log((col("cr") + 1).cast("double") / (col("tr") + buckets)))
          .as("lw"))
    val perDoc = grams.join(broadcast(model), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("lw")).as("logw"))
    toks.select(col("doc_id"), col("source"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_grams"))
      .na.fill(0.0, Seq("logw"))
  }

  /** fastText-style hashed linear classifier INFERENCE — the standard
    * model-based quality-filter stage of CCNet/LLaMA-class pipelines
    * (reference lambdas score text quality with exactly this model
    * family: a linear layer over hashed bag-of-n-gram counts). This op
    * only APPLIES a trained model; the weights arrive as fixed-point
    * Longs, so the score and the keep verdict replay bit-identically in
    * any ANSI engine — no sigmoid is evaluated (monotone, so the
    * probability threshold is pre-mapped to a rational logit threshold
    * thrNum/thrDen by the caller).
    *
    * Features are the hashed gram space [[importanceWeights]] uses:
    * unigrams + word 2-grams of the whitespace-normalized lower-cased
    * text, bucket = kmvHash(gram) mod B where B = weights.length.
    * Scoring is in the MEAN-feature space kept as an integer numerator:
    *
    *   score_sum = Σ over gram OCCURRENCES of weights(bucket(gram))
    *   score_num = bias · max(n_grams, 1) + score_sum
    *   keep      ⇔ score_num · thrDen ≥ thrNum · max(n_grams, 1)
    *
    * (empty documents decide on the bias alone). Output: the input
    * columns + n_grams, score_sum, score_num, keep.
    *
    * 100 TB shape: the weights vector is a foldable plan literal —
    * constant-folded to ONE array constant, sane through B ≈ 2^16 — and
    * the score is computed IN THE ROW by aggregate() over the gram
    * array: a pure map stage with zero exchanges, no explode, no join;
    * nothing per-document ever leaves the scan task. A vocab-scale
    * model (fastText's default 2M buckets) should instead ride the
    * explode + broadcast-weight-join + per-doc re-aggregate shape
    * [[importanceWeights]] demonstrates. Capture hygiene: tokens and
    * grams are materialized attributes before any HOF references them,
    * and the weights literal is foldable, so no lambda re-evaluates a
    * captured expression per element.
    *
    * Overflow (ANSI throws on wrap, so bounds are enforced): |w|, |bias|
    * ≤ 2^20 and thrDen ≤ 2^16 keep |score_num · thrDen| < 2^62 for any
    * document under ~2^25 grams.
    */
  def linearQualityScore(df: DataFrame, idCol: String, textCol: String,
                         weights: Array[Long], bias: Long,
                         thrNum: Long, thrDen: Long): DataFrame = {
    import graft.functions.{KmvAggregator, TextFunctions}
    val b = weights.length
    require(b >= 2 && b <= (1 << 16), s"buckets out of range: $b")
    require(weights.forall(w => math.abs(w) <= (1L << 20)),
      "weights must be fixed-point Longs with |w| <= 2^20")
    require(math.abs(bias) <= (1L << 20), s"bias out of range: $bias")
    require(thrDen >= 1 && thrDen <= (1L << 16),
      s"thrDen out of range: $thrDen")
    require(math.abs(thrNum) <= (1L << 40), s"thrNum out of range: $thrNum")
    for (c <- Seq("__qc_toks", "__qc_grams", "n_grams", "score_sum",
                  "score_num", "keep"))
      require(!df.columns.contains(c),
        s"linearQualityScore writes column '$c' but the input has it")
    val wLit = array(weights.map(lit(_)): _*) // foldable -> one constant
    val n1 = greatest(col("n_grams"), lit(1L))
    df
      .withColumn("__qc_toks",
        TextFunctions.tokens(TextFunctions.normalizeWs(col(textCol))))
      .withColumn("__qc_grams",
        concat(col("__qc_toks"), TextFunctions.wordShingles(col("__qc_toks"), 2)))
      .withColumn("n_grams", size(col("__qc_grams")).cast("long"))
      .withColumn("score_sum",
        aggregate(col("__qc_grams"), lit(0L), (acc, g) =>
          acc + element_at(wLit,
            (pmod(KmvAggregator.kmvHash(g), lit(b.toLong)) + 1L).cast("int"))))
      .withColumn("score_num", lit(bias) * n1 + col("score_sum"))
      .withColumn("keep", col("score_num") * thrDen >= lit(thrNum) * n1)
      .drop("__qc_toks", "__qc_grams")
  }

  /** Deterministic weighted fair interleave — TRAINING-ORDER
    * materialization: given per-source weights, emit an integer sort key
    * under which every prefix of the global order carries each source in
    * proportion to its weight (within ±1 row per source — the smooth
    * weighted-round-robin guarantee). Mixture operators decide
    * MEMBERSHIP; this decides ORDER, the piece a training run actually
    * consumes ("interleave sources 3:2:1", not "shuffle then hope").
    *
    * The schedule is classic stride scheduling / start-time fair
    * queuing: the j-th row of source s has virtual time (2j+1)/w_s and
    * the global order is ascending virtual time. The fraction is carried
    * EXACTLY as an integer: pos_key = (2j+1) · (L/w_s) with
    * L = lcm(weights), so cross-source comparisons are exact rational
    * comparisons — no floats, and the key replays in any ANSI engine.
    * Virtual-time ties break by (source, j): deterministic and
    * partition-independent.
    *
    * Per-source index j is the rank of the row's content ticket
    * (sha-prefix hash of the id — [[KmvAggregator.kmvHash]], the house
    * determinism) within its source. With `subBuckets = 1` that rank is
    * one window per source — engine-exact but serialized per source. At
    * corpus scale pass `subBuckets = N`: rows bucket by ticket mod N,
    * rank inside (source, bucket) windows (N-way parallel per source),
    * and bucket offsets — a sources×N row aggregate, broadcast — make j
    * a dense [0, n_s) bijection again. j values depend on N (a bucketed
    * bijection, not the global ticket rank), which is fine for the
    * interleave law (any per-source bijection yields the same
    * proportionality) and replayed by the oracle with the same N — the
    * q98/q105 sub-bucket convention.
    *
    * Rows whose source is not in `weights` are NOT part of the mixture
    * and are dropped (membership is upstream's job). Output: the input
    * columns + src_idx (j) + pos_key; the caller sorts by
    * (pos_key, source) — a range-partitioned sort, the only corpus-scale
    * exchange beyond the ranking window.
    *
    * Overflow (ANSI throws on wrap, so bounds are enforced): weights in
    * [1, 1024] with lcm(weights) ≤ 2^20 keeps pos_key < 2^62 for any
    * source under ~2^40 rows. */
  def weightedInterleaveKey(df: DataFrame, idCol: String, srcCol: String,
                            weights: Map[String, Long],
                            subBuckets: Int = 1): DataFrame = {
    import graft.functions.KmvAggregator
    require(weights.nonEmpty, "weights must not be empty")
    require(weights.values.forall(w => w >= 1L && w <= 1024L),
      "weights must be in [1, 1024]")
    require(subBuckets >= 1 && subBuckets <= 256,
      s"subBuckets out of range: $subBuckets")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val l = weights.values.reduce((a, b) => a / gcd(a, b) * b)
    require(l <= (1L << 20), s"lcm(weights) = $l exceeds 2^20")
    for (c <- Seq("__il_tk", "__il_sb", "__il_rn", "__il_off",
                  "__il_cnt", "src_idx", "pos_key"))
      require(!df.columns.contains(c),
        s"weightedInterleaveKey writes column '$c' but the input has it")
    // per-source stride L/w as one foldable map literal
    val strideMap = map(weights.toSeq.flatMap { case (s, w) =>
      Seq(lit(s), lit(l / w)) }: _*)
    val keyed = df
      .filter(col(srcCol).isin(weights.keys.toSeq.map(lit(_)): _*))
      .withColumn("__il_tk", KmvAggregator.kmvHash(col(idCol)))
      .withColumn("__il_sb",
        pmod(col("__il_tk"), lit(subBuckets.toLong)).cast("int"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol), col("__il_sb"))
      .orderBy(col("__il_tk"), col(idCol))
    val ranked = keyed.withColumn("__il_rn", row_number().over(w))
    // dense per-source offsets: cumulative counts over the tiny
    // (sources × subBuckets) aggregate, broadcast back
    val ow = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol)).orderBy(col("__il_sb"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col(srcCol), col("__il_sb"))
      .agg(count(lit(1)).as("__il_cnt"))
      .withColumn("__il_off",
        coalesce(sum(col("__il_cnt")).over(ow), lit(0L)))
      .select(col(srcCol), col("__il_sb"), col("__il_off"))
    ranked.join(broadcast(offsets), Seq(srcCol, "__il_sb"))
      .withColumn("src_idx",
        (col("__il_off") + col("__il_rn") - 1L).cast("long"))
      .withColumn("pos_key",
        (col("src_idx") * 2L + 1L) * element_at(strideMap, col(srcCol)))
      .drop("__il_tk", "__il_sb", "__il_rn", "__il_off")
  }

  /** Weighted rendezvous (highest-random-weight) shard assignment —
    * the OUTPUT-SHARDING step: route every document to one of N named
    * shards (training-data output buckets, downstream workers,
    * per-shard dedup domains) such that reweighting or adding/removing
    * a shard only remaps the rows that land on the changed shard —
    * Thaler & Ravishankar's minimal-disruption property, the reason
    * HRW (and not `hash(id) mod N`, which remaps ~everything on any N
    * change) is the standard shard router.
    *
    * Integer-exact weighting: shard s with weight w_s expands into w_s
    * virtual nodes; score(doc, s, v) = the replayable sha-prefix hash
    * ([[KmvAggregator.kmvHash]]) of `id:shard:v:salt`, and the winner
    * is the lexicographic max (score, shard, v) — deterministic,
    * engine-independent, no floats (the classic weighted-HRW
    * −w/ln(u) transform is IEEE-library-dependent and does not
    * replay). Expected share of shard s = w_s / Σw, exact in the hash
    * limit.
    *
    * 100 TB shape: the virtual-node table is a FOLDABLE literal and the
    * argmax runs IN THE ROW (array_max over a generated struct array) —
    * a pure map stage: zero exchanges, no explode, no join; W hashes
    * per row where W = Σ weights (bounded ≤ 256 below — weights are
    * RATIOS, not byte sizes; scale them down to coprime form).
    *
    * Output: the input columns + `shard` (winner name) + `shard_score`
    * (its 48-bit score). `idCol` must be non-null (house convention —
    * hash keys are filtered or coalesced upstream). */
  def rendezvousShard(df: DataFrame, idCol: String,
                      shards: Map[String, Int], salt: String): DataFrame = {
    import graft.functions.KmvAggregator
    require(shards.nonEmpty, "shards must not be empty")
    require(shards.values.forall(w => w >= 1 && w <= 64),
      "shard weights must be in [1, 64]")
    val vnodes = shards.toSeq.sortBy(_._1)
      .flatMap { case (s, w) => (0 until w).map(v => (s, v)) }
    require(vnodes.size <= 256,
      s"total weight ${vnodes.size} exceeds 256 virtual nodes")
    for (c <- Seq("__rv_id", "__rv_w", "shard", "shard_score"))
      require(!df.columns.contains(c),
        s"rendezvousShard writes column '$c' but the input has it")
    val vArr = array(vnodes.map { case (s, v) =>
      struct(lit(s).as("s"), lit(v).as("v")) }: _*) // foldable
    // the id string is an attribute before the lambda captures it
    // (capture hygiene: a lambda re-evaluates captured non-attribute
    // children per element)
    val scored = transform(vArr, p =>
      struct(
        KmvAggregator.kmvHash(concat_ws(":",
          col("__rv_id"), p.getField("s"), p.getField("v").cast("string"),
          lit(salt))).as("sc"),
        p.getField("s").as("s")))
    df.withColumn("__rv_id", col(idCol).cast("string"))
      .withColumn("__rv_w", array_max(scored))
      .withColumn("shard", col("__rv_w.s"))
      .withColumn("shard_score", col("__rv_w.sc"))
      .drop("__rv_id", "__rv_w")
  }

  /** Canonical URL form for crawl curation — the normalization every
    * CommonCrawl-scale pipeline runs before URL-level dedup, so that
    * `HTTP://WWW.Site.COM:80/a/?b=2&a=1#x` and `http://site.com/a?a=1&b=2`
    * collapse to one key. Rules (each expressible in any SQL engine, so
    * the q151 oracle replays the chain verbatim):
    *
    *  1. fragment stripped (`#...` never reaches the server);
    *  2. scheme and host[:port] lowercased (path/query stay case-exact);
    *  3. leading `www.` dropped from the host;
    *  4. default ports dropped (`:80` for http, `:443` for https) —
    *     non-default ports kept;
    *  5. query parameters sorted bytewise (param ORDER is not semantic
    *     for the overwhelming majority of endpoints; a sorted param
    *     string is the canonical dedup key);
    *  6. trailing slashes stripped from the path (`/a/` ≡ `/a`; the
    *     bare-root URL canonicalizes to no path at all).
    *
    * Pure column expression — codegen map stage, no UDF, no shuffle. */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1))
    val rest = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.\\-]*://(.*)$", 1)
    val hostport = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val pathq = rest.substr(length(hostport) + lit(1), length(rest))
    val host = regexp_replace(regexp_replace(hostport, ":[0-9]+$", ""), "^www\\.", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val portNorm = when(port === "", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .otherwise(concat(lit(":"), port))
    val path = regexp_extract(pathq, "^([^?]*)", 1)
    val query = regexp_extract(pathq, "\\?(.*)$", 1)
    val pathNorm = regexp_replace(path, "/+$", "")
    val queryNorm = when(query === "", lit(""))
      .otherwise(concat(lit("?"), array_join(array_sort(split(query, "&")), "&")))
    concat(scheme, lit("://"), host, portNorm, pathNorm, queryNorm)
  }

  /** Registered domain (the per-publisher key): last two host labels,
    * or last THREE when the TLD is a 2-letter country code preceded by a
    * conventional second-level label (co/com/net/org/ac/gov/edu —
    * site.co.uk's owner is `site`, not `co`). A deliberately
    * list-free heuristic: the full public-suffix list is a data file a
    * production deployment ships alongside; the heuristic covers the
    * dominant patterns and, unlike the list, replays in one SQL CASE. */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    // clamped indices: ANSI element_at(_, 0) throws, and Spark's And does
    // not guarantee short-circuit evaluation — a 1-label host must not
    // evaluate an out-of-range index even on a branch it never takes
    val tld = element_at(labels, -1)
    val sld = element_at(labels, greatest(n - 1, lit(1)))
    when(n >= 3 && length(tld) === 2 &&
        sld.isin("co", "com", "net", "org", "ac", "gov", "edu"),
      concat_ws(".", element_at(labels, greatest(n - 2, lit(1))), sld, tld))
      .when(n >= 2, concat_ws(".", sld, tld))
      .otherwise(host)
  }

  /** robots.txt rule application (RFC 9309 subset) — the compliance
    * stage of crawl curation: per-domain allow/disallow PATH-PREFIX
    * rules, most-specific (longest) matching rule wins, `allow` wins a
    * same-length tie, no matching rule means allowed. The subset is
    * plain prefixes (no `*`/`$` wildcards) — the dominant form in real
    * robots files and the part with exact cross-engine semantics.
    *
    * Inputs: urls (id, domain, path) and rules (domain, rtype ∈
    * {allow, disallow}, prefix). Returns (id, domain, path, allowed,
    * rule) with `rule` the winning prefix ("" when no rule matched).
    *
    * 100 TB shape: the rules table is crawler-memory-resident by nature
    * (humans write robots files) — it BROADCASTS into the URL scan; the
    * winning rule reduces via max(struct(len, isallow, prefix)) with
    * map-side partial aggregation, so the one shuffle carries (id, tiny
    * struct). The unmatched default rides the same aggregate as a
    * sentinel (-1, 1, "") row — no second join back to the URL table. */
  def robotsFilter(urls: DataFrame, idCol: String, domainCol: String,
                   pathCol: String, rules: DataFrame): DataFrame = {
    // distinct column names on each side: `rules` is often DERIVED from
    // `urls` (per-domain rule synthesis), and same-lineage join keys trip
    // Spark's ambiguous-self-join detection
    val u = urls.select(col(idCol), col(domainCol).as("_u_dom"), col(pathCol))
    val r = broadcast(rules.select(col("domain").as("_r_dom"),
      col("rtype"), col("prefix")).distinct())
    val matched = u
      .join(r, col("_u_dom") === col("_r_dom") &&
        col(pathCol).startsWith(col("prefix")), "left")
      .select(col(idCol), col("_u_dom").as("domain"), col(pathCol),
        when(col("prefix").isNull,
          struct(lit(-1).as("l"), lit(1).as("a"), lit("").as("p")))
          .otherwise(struct(length(col("prefix")).as("l"),
            (col("rtype") === "allow").cast("int").as("a"),
            col("prefix").as("p")))
          .as("cand"))
    matched
      .groupBy(col(idCol), col("domain"), col(pathCol))
      .agg(max(col("cand")).as("best"))
      .select(col(idCol), col("domain"), col(pathCol),
        (col("best.l") === -1 || col("best.a") === 1).as("allowed"),
        col("best.p").as("rule"))
  }

  /** URL-canonicalize + per-registered-domain document cap: normalize
    * every URL, key each doc by its registered domain, keep the best
    * `cap` docs per domain by (quality desc, id asc). The standard
    * anti-boilerplate guard in crawl curation — template-heavy sites
    * contribute thousands of near-identical pages; capping per PUBLISHER
    * (registered domain, not full host) closes the subdomain loophole
    * (a.spam.com, b.spam.com, ...).
    *
    * Returns (id, url_norm, domain, rk ≤ cap), kept rows only.
    *
    * 100 TB shape: normalization and domain extraction are codegen map
    * work; the cap is ONE hash shuffle on the domain key feeding a
    * WindowGroupLimit (Spark pushes the rank filter into the window —
    * per-partition top-cap heaps, the q83 contract), carrying
    * (id, url, domain, quality) only — document text never moves. */
  def domainCap(df: DataFrame, urlCol: String, qualityCol: String,
                idCol: String, cap: Int): DataFrame = {
    require(cap >= 1, s"bad cap: $cap")
    val hostport = lower(regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)", 1))
    val host = regexp_replace(
      regexp_replace(hostport, ":[0-9]+$", ""), "^www\\.", "")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain"))
      .orderBy(col(qualityCol).desc, col(idCol))
    df.select(col(idCol), col(qualityCol),
        normalizeUrl(col(urlCol)).as("url_norm"),
        registeredDomain(host).as("domain"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .select(col(idCol), col("url_norm"), col("domain"), col("rk"))
  }

  /** The `href="…"` attribute pattern shared by [[extractLinks]] and
    * [[linkGraph]]: double-quoted values, attribute name preceded by
    * start-of-text or a non-word/non-hyphen character so `data-href=`
    * and friends stay out. The guard CONSUMES the preceding character
    * instead of looking behind — RE2-class engines (the oracle's) have
    * no lookbehind, and href attributes are whitespace-separated in any
    * real markup, so consumption never overlaps a neighboring match.
    * The href value is capture group 2. */
  private val HrefPattern = "(^|[^\\w-])href=\"([^\"]+)\""

  /** Outlink extraction: one row per `href="…"` occurrence in the markup
    * column, document order preserved via the occurrence index. Double-
    * quoted href attributes only (the form every serializer emits);
    * `src=`/text mentions/single-quoted attributes/`data-href=` do NOT
    * match (see [[HrefPattern]]). Narrow explode: regexp_extract_all +
    * posexplode inside the scan's map stage, no shuffle.
    *
    * Returns (id-col, link_idx, href) — raw hrefs; normalize/aggregate
    * downstream (see [[linkGraph]]). */
  def extractLinks(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(regexp_extract_all(col(htmlCol),
          lit(HrefPattern), lit(2))).as(Seq("link_idx", "href")))
      .select(col(idCol), col("link_idx").cast("long").as("link_idx"),
        col("href"))

  /** The crawl's host graph: extract every outlink, normalize it, key
    * both endpoints by REGISTERED domain (the publisher unit, matching
    * [[domainCap]]), and aggregate to weighted edges. Self-edges
    * (intra-publisher navigation) are dropped — they dominate raw counts
    * and carry no cross-site signal; the downstream consumers
    * (PageRank/TrustRank q117/q126, k-core q140, HyperBall q145) all
    * expect the cross-publisher web.
    *
    * Returns (src_domain, dst_domain, n_links, n_pages): total link
    * occurrences and distinct linking pages per edge.
    *
    * 100 TB shape: extraction + normalization + domain mapping are all
    * codegen map work riding the corpus scan; the ONE shuffle is the
    * edge aggregation, keyed (src_domain, dst_domain) and carrying
    * nothing but the two short keys per link — markup never moves. The
    * distinct-page count rides the SAME exchange: a page's links all
    * live in one row pre-explode, so the "first link from this page to
    * this domain" flag is array_position(domains, dst) = own index — a
    * pure in-row computation, no window, no second shuffle. */
  def linkGraph(df: DataFrame, idCol: String, srcDomainCol: String,
                htmlCol: String): DataFrame = {
    def dstDomain(href: Column): Column = {
      val hostport = lower(regexp_extract(href,
        "^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)", 1))
      registeredDomain(regexp_replace(
        regexp_replace(hostport, ":[0-9]+$", ""), "^www\\.", ""))
    }
    df.select(col(srcDomainCol).as("src_domain"),
        transform(regexp_extract_all(col(htmlCol),
          lit(HrefPattern), lit(2)), dstDomain(_)).as("_dsts"))
      .select(col("src_domain"), col("_dsts"),
        posexplode(col("_dsts")).as(Seq("_idx", "dst_domain")))
      // drop self-edges and unparseable hrefs (no scheme → empty host);
      // both filters are group-total (a dst value is either always or
      // never filtered), so the first-occurrence flags stay consistent
      .filter(col("dst_domain") =!= col("src_domain") &&
        col("dst_domain") =!= "")
      .withColumn("_first",
        array_position(col("_dsts"), col("dst_domain")) === col("_idx") + 1)
      .groupBy(col("src_domain"), col("dst_domain"))
      .agg(count(lit(1)).as("n_links"),
        sum(when(col("_first"), 1L).otherwise(0L)).as("n_pages"))
  }

  /** ISOTONIC (PAVA) SCORE CALIBRATION — the order-constrained
    * companion to [[quantileNormalize]] in the calibration lane (q201
    * scores the ranking, q198 aligns distributions, THIS turns a raw
    * score into a calibrated probability): given rows (score, binary
    * label), fit the least-squares NON-DECREASING map g(score) →
    * P(label = 1) — the classic calibration step before trusting a
    * quality classifier's threshold (isotonic regression; Zadrozny &
    * Elkan 2002's non-parametric alternative to Platt scaling).
    *
    * Computed by the MINIMAX identity rather than the sequential
    * pool-adjacent-violators stack (Robertson, Wright & Dykstra 1988,
    * Thm 1.4.4 — the two are the same unique function):
    *
    *   g(i) = max_{j ≤ i} min_{k ≥ i} (pos_j + … + pos_k) /
    *                                   (n_j + … + n_k)
    *
    * which is ITERATION-FREE and exactly cross-engine-replayable:
    * every candidate value is ONE IEEE division of two exact integer
    * prefix-sum differences (bit-identical in any engine), and
    * min/max over a SET of doubles is order-independent — there is no
    * summation-order hazard anywhere, where a distributed PAVA's
    * merge cascade would need data-dependent rounds.
    *
    * Scale shape: the corpus crosses ONE hash aggregate down to the
    * per-distinct-score census; everything after is census-sized —
    * prefix sums via one ordered window over the census (the
    * [[groupKFolds]] bounded-cardinality contract: `maxScores`,
    * default 4096, fails loudly inside the plan — the minimax pair
    * table is census², so an unbounded score key would go quadratic
    * in the wrong place; bucket the score first, which calibration
    * does anyway), the (j ≤ k) pair table with a per-j suffix-min
    * window, and a per-i max aggregate.
    *
    * Returns one row per distinct score: (score, n, pos, cal) with
    * `cal` the calibrated probability, non-decreasing in score. */
  def isotonicCalibrate(df: DataFrame, scoreCol: String, labelCol: String,
                        maxScores: Long = 4096L): DataFrame = {
    val census = df.select(col(scoreCol).cast("long").as("s"),
        col(labelCol).cast("long").as("y"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val pre = census
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("s"))))
      .withColumn("rn", when(col("rn") <= maxScores, col("rn"))
        .otherwise(raise_error(lit(s"isotonicCalibrate: more than " +
          s"$maxScores distinct scores — the minimax pair table is " +
          "census-quadratic; bucket the score first"))))
      .withColumn("cp", sum(col("pos")).over(w))
      .withColumn("cn", sum(col("n")).over(w))
    val left = pre.select(col("rn").as("j"), col("s").as("sj"),
      (col("cp") - col("pos")).as("pj0"), (col("cn") - col("n")).as("nj0"))
    val right = pre.select(col("rn").as("k"), col("cp"), col("cn"))
    // A(j,k) = exact-integer prefix differences under ONE division
    val pairs = left.join(right, col("j") <= col("k"))
      .select(col("j"), col("k"),
        ((col("cp") - col("pj0")) / (col("cn") - col("nj0"))).as("a"))
    val sw = org.apache.spark.sql.expressions.Window.partitionBy(col("j"))
      .orderBy(col("k").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // m(j, i) = min_{k ≥ i} A(j, k): running min over k descending
    val mji = pairs.withColumn("m", min(col("a")).over(sw))
      .select(col("j"), col("k").as("i"), col("m"))
    val g = mji.filter(col("j") <= col("i"))
      .groupBy(col("i"))
      .agg(max(col("m")).as("cal"))
    pre.select(col("rn").as("i"), col("s"), col("n"), col("pos"))
      .join(g, Seq("i"))
      .select(col("s"), col("n"), col("pos"), col("cal"))
  }
}
