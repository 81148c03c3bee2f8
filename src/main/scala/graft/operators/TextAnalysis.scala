package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, fingerprinting. All column-level
  * built-ins (codegen'd); designed to run as narrow map stages — no
  * shuffles — so they compose freely with dedup/filter pipelines.
  */
object TextAnalysis {

  /** Per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Small, deterministic, public common words. */
  val stopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "von", "ist", "mit", "den", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "une", "est"),
    "it" -> Seq("il", "di", "che", "la", "per", "un", "con", "del", "non", "una"),
  )

  /** One-pass native stats struct<lang_pred, quality, n_bpe> — the fast
    * path behind [[languageId]]/[[qualityScore]]/[[bpeTokenCount]]. */
  def textStats(text: Column): Column = graft.expressions.TextStats(text)

  /** Heuristic language ID: the language whose stopword profile has the
    * most distinct hits in the document wins; "und" when nothing hits;
    * ascending language code breaks ties. Native single-pass; the
    * declarative reference below is equivalence-tested against it. */
  def languageId(text: Column): Column = textStats(text).getField("lang_pred")

  /** Declarative reference implementation of [[languageId]]. */
  def languageIdDeclarative(text: Column): Column = {
    val toks = TextFunctions.tokens(TextFunctions.normalizeWs(text))
    val scores: Seq[(String, Column)] = stopwordProfiles.toSeq.sortBy(_._1).map {
      case (lang, words) =>
        lang -> size(array_intersect(toks, array(words.map(lit): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s > 0 && s === best, lit(lang)).otherwise(acc)
    }
  }

  /** Heuristic quality score in [0,1] from cheap surface statistics:
    * length band, punctuation density, stopword ratio, mean word length.
    * The weights mirror published web-corpus filters (C4/Gopher rules —
    * public heuristics), tuned for determinism not fidelity. Native
    * single-pass; declarative reference below. */
  def qualityScore(text: Column): Column = textStats(text).getField("quality")

  /** Declarative reference implementation of [[qualityScore]]. */
  def qualityScoreDeclarative(text: Column): Column = {
    val t = TextFunctions.normalizeWs(text)
    val nChars = length(t).cast("double")
    val toks = TextFunctions.tokens(t)
    val nToks = size(toks).cast("double")
    val punct = size(regexp_extract_all(t, lit("[\\p{Punct}]"), lit(0))).cast("double")
    val stops = array(stopwordProfiles.values.flatten.toSeq.distinct.map(lit): _*)
    val stopRatio = when(nToks === 0, 0.0)
      .otherwise(size(filter(toks, tk => array_contains(stops, tk))).cast("double") / nToks)
    val meanWordLen = when(nToks === 0, 0.0)
      .otherwise((nChars - (nToks - 1)) / nToks)
    val lengthOk = when(nChars.between(50, 20000), 1.0).otherwise(0.3)
    val punctOk = when(nChars === 0, 0.0)
      .otherwise(when(punct / nChars < 0.2, 1.0).otherwise(0.4))
    val wordLenOk = when(meanWordLen.between(2.5, 12.0), 1.0).otherwise(0.4)
    val stopOk = when(stopRatio > 0.05, 1.0).otherwise(0.6)
    round((lengthOk * 0.3 + punctOk * 0.25 + wordLenOk * 0.25 + stopOk * 0.2), 4)
  }

  /** Whitespace token count (codegen'd). */
  def tokenCount(text: Column): Column = TextFunctions.tokenCount(text)

  /** BPE-ish subword token count (native; declarative reference is
    * TextFunctions.bpeTokenCount). */
  def bpeTokenCount(text: Column): Column = textStats(text).getField("n_bpe")

  /** 64-bit content fingerprint over normalized text. */
  def fingerprint(text: Column): Column = TextFunctions.fingerprint(text)

  /** Repetition signals (Gopher-style repetition filters — published
    * web-corpus heuristics): type-token ratio and the distinct fraction
    * of adjacent 2-grams. Low values flag degenerate/boilerplate text
    * that exact/near dedup misses because the repetition is WITHIN the
    * document. Pure per-row math — no explode, no shuffle; at 100 TB this
    * runs inside the scan's map stage like the rest of the curation
    * filters. Native single-pass codegen expression; the declarative
    * reference below is equivalence-tested against it.
    *
    * Returns struct<n_tok, n_uniq_tok, ttr, uniq_2gram_frac>; callers cut
    * on the ratios (e.g. ttr < 0.2 OR uniq_2gram_frac < 0.3 → drop).
    * Ratios are r4-rounded so engine comparisons are bit-stable. */
  def repetitionStats(text: Column): Column =
    graft.expressions.RepetitionStats(text)

  /** Declarative reference implementation of [[repetitionStats]] —
    * four interpreted higher-order passes vs the native one. */
  def repetitionStatsDeclarative(text: Column): Column = {
    val toks = TextFunctions.tokens(TextFunctions.normalizeWs(text))
    val nTok = size(toks).cast("long")
    val nUniq = size(array_distinct(toks)).cast("long")
    // adjacent 2-grams: zip the token array with itself shifted by one
    val gramLen = greatest(nTok - 1, lit(0L)).cast("int")
    val grams = zip_with(slice(toks, lit(1), gramLen),
      slice(toks, lit(2), gramLen),
      (a, b) => concat(a, lit(" "), b))
    val nGram = size(grams).cast("long")
    val nUniqGram = size(array_distinct(grams)).cast("long")
    val r4 = (c: Column) => floor(c * 10000.0 + 0.5) / 10000.0
    struct(
      nTok.as("n_tok"),
      nUniq.as("n_uniq_tok"),
      when(nTok === 0, 0.0).otherwise(
        r4(nUniq.cast("double") / nTok.cast("double"))).as("ttr"),
      when(nGram === 0, 0.0).otherwise(
        r4(nUniqGram.cast("double") / nGram.cast("double")))
        .as("uniq_2gram_frac"))
  }

  /** Corpus-wide boilerplate detection: document frequency of distinct
    * word `n`-grams, top-k by (doc_freq desc, gram asc) — the fuel for
    * template/chrome removal: grams present in a large fraction of
    * documents are layout, not content.
    *
    * Scale shape: grams are de-duplicated WITHIN each document before the
    * explode (so a gram counts once per doc without a countDistinct
    * expand), the count is one hash-aggregate shuffle with map-side
    * partials, and the top-k plans as TakeOrderedAndProject — never a
    * global sort.
    *
    * Input contract: one row per document (the per-row gram dedup is what
    * makes doc_freq a document frequency; duplicate doc rows would
    * inflate it — dedup upstream if needed). */
  def boilerplateNgrams(df: DataFrame, textCol: String,
                        n: Int = 3, topK: Int = 100): DataFrame =
    df.select(explode(graft.expressions.WordNgrams.wordNgramStrings(
        coalesce(col(textCol), lit("")), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("gram").asc)
      .limit(topK)

  /** C4-style line-level dedup: remove every line whose normalized form
    * appears in at least `minDocs` distinct documents (navigation chrome,
    * cookie banners, boilerplate headers — the cross-document repetition
    * that document-level dedup can't see). Returns (id, text) with
    * offending lines dropped and the survivors rejoined in original
    * order; documents whose every line is boilerplate drop out entirely.
    *
    * Scale shape: lines explode map-side and travel as (id, line_no,
    * line, 8-byte hash); the frequent-line set is ONE count-distinct
    * aggregate over the hash and is tiny relative to the corpus (only
    * lines that cross the threshold), so the removal anti-join
    * broadcasts; reassembly is one shuffle on the doc id carrying only
    * surviving lines. The `minDocs` threshold is what keeps the broadcast
    * small — for permissive thresholds on web-scale corpora drop the
    * hint and let AQE decide. */
  /** @param persistLines cache the exploded/hashed line projection: the
    *        plan references it twice (frequency aggregate + removal
    *        anti-join) and the explode+normalize+hash is the dominant map
    *        cost — same rationale as minhashDupPairs' persistShingles.
    *        The blocks stay pinned after the result materializes (an
    *        operator returning a lazy frame cannot know when to free
    *        them): callers owning a long-lived session must
    *        `spark.catalog.clearCache()` (as Bench does per query) or
    *        pass false to keep the operator side-effect free. */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
                minDocs: Int = 2, persistLines: Boolean = true): DataFrame = {
    val lines0 = df
      .select(col(idCol), posexplode(split(col(textCol), "\n")))
      .withColumnRenamed("pos", "line_no").withColumnRenamed("col", "line")
      .withColumn("lh", xxhash64(TextFunctions.normalizeWs(col("line"))))
    val lines = if (persistLines)
      lines0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else lines0
    val frequent = lines.groupBy(col("lh"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("lh")
    lines.join(broadcast(frequent), Seq("lh"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("line_no"), col("line")))),
          s => s.getField("line")), "\n").as(textCol))
  }

  /** TF-IDF term weighting over a document frame: one row per
    * (document, token) with term frequency, document frequency, and
    * weight = tf · ln(N / df) — the classic relevance/keyword signal
    * (tokens present in every document weigh 0). Tokenization is the
    * engine-wide whitespace split of the lowercased text (identical to
    * the sentiment/text-stats family, so oracles mirror it directly).
    *
    * Scale shape: the corpus is scanned and exploded ONCE — tokens
    * explode map-side, tf is one hash-aggregate shuffle on (id, token),
    * and df is a count-window over `tok` on tf's already-aggregated
    * output (a tf ⋈ df self-join would re-scan and re-explode the
    * corpus: column pruning rewrites the df branch's inner aggregate to
    * a distinct, defeating exchange reuse). The corpus-size scalar N is
    * a one-row broadcast, not a driver-side count. Heavy-tail tokens
    * ("the" is in every document) skew the tok partitioning the same
    * way under either shape; AQE skew handling or an upstream stopword
    * filter is the remedy at corpus scale. */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the engine-wide canonical tokenization (TextFunctions.tokens), not
    // an inline re-implementation — the oracles mirror exactly one split
    val toks = df.select(col(idCol),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("tok"))
    val tf = toks.groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("tok"))))
    val n = df.agg(count(lit(1)).as("n_docs"))
    withDf.crossJoin(broadcast(n))
      .select(col(idCol), col("tok"), col("tf"), col("df"),
        (col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
          .as("weight"))
  }

  /** Token-length histogram per group: docs bucketed by
    * floor(n_tok / binWidth) * binWidth, with counts and the within-group
    * share. Distribution reporting stays ONE hash-aggregate pass at any
    * corpus size (bins × groups output rows); the share window runs over
    * that tiny aggregate, not the corpus. */
  def tokenHistogram(df: DataFrame, textCol: String, groupCol: String,
                     binWidth: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(binWidth > 0, "binWidth must be positive")
    val nTok = TextFunctions.tokenCount(col(textCol)).cast("long")
    df.select(col(groupCol),
        (floor(nTok / lit(binWidth)) * binWidth).cast("long").as("bin_lo"))
      .groupBy(col(groupCol), col("bin_lo"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share",
        col("n_docs") / sum(col("n_docs")).over(Window.partitionBy(col(groupCol))))
  }

  /** Per-group unigram token entropy in nats, in the algebraically stable
    * form H = ln(N) − Σ tf·ln(tf) / N (tf are exact longs; only the final
    * ln/divide touch floating point). The standard mixture diagnostic —
    * low entropy flags templated/boilerplate-heavy sources. One explode
    * feeding two partial-aggregating hash aggregations; output is one row
    * per group. */
  def tokenEntropy(df: DataFrame, textCol: String, groupCol: String): DataFrame =
    df.select(col(groupCol),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("tok"))
      .groupBy(col(groupCol), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col(groupCol))
      .agg(sum(col("tf")).as("n_tok"), count(lit(1)).as("n_vocab"),
        sum(col("tf").cast("double") * log(col("tf").cast("double"))).as("__s"))
      .select(col(groupCol), col("n_tok"), col("n_vocab"),
        (log(col("n_tok").cast("double")) - col("__s") / col("n_tok"))
          .as("entropy"))

  /** Pairwise vocabulary overlap between groups: Jaccard of the groups'
    * distinct lower-cased token sets. No cross join — the pair counts
    * come from a self-equi-join on the token (each token contributes its
    * group-pair combinations, bounded by groups², not rows), then two
    * broadcast-size joins attach the per-group vocabulary sizes. */
  def vocabOverlap(df: DataFrame, textCol: String, groupCol: String): DataFrame = {
    val toks = df.select(col(groupCol).as("g"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("tok"))
      .distinct()
    val sizes = toks.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val common = toks.toDF("g_a", "tok")
      .join(toks.toDF("g_b", "tok"), Seq("tok"))
      .filter(col("g_a") < col("g_b"))
      .groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(broadcast(sizes.toDF("g_a", "n_a")), Seq("g_a"))
      .join(broadcast(sizes.toDF("g_b", "n_b")), Seq("g_b"))
      .select(col("g_a"), col("g_b"), col("n_common"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common"))).as("jaccard"))
  }

  /** C4-style blocklist filtering (Raffel et al. 2020 drop any page
    * containing a word from a blocklist; the "bad words" curation
    * stage). Entries are lower-case unigrams or two-word phrases,
    * matched against the whitespace-normalized token stream — word-
    * boundary semantics by construction (no substring false positives:
    * "ass" never matches "pass"), phrase matches via the adjacent-
    * bigram view. Returns the input keyed frame plus
    * (n_hits, n_terms, keep): total match occurrences, distinct
    * blocklist entries matched, and the drop verdict (keep = no hits).
    *
    * 100 TB shape: the blocklist compiles into LITERAL arrays inside
    * codegen'd array HOFs — a pure map stage, zero shuffle, zero
    * broadcast (the list rides the plan, not the cluster); real-world
    * blocklists (100s–1000s of entries) stay well inside literal-array
    * range. Counting is per-occurrence (overlapping bigrams included),
    * so the verdict is monotone under document concatenation. */
  def blocklistFilter(df: DataFrame, idCol: String, textCol: String,
                      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "blocklist must not be empty")
    require(terms.forall(t => t == t.toLowerCase && t.trim == t && t.nonEmpty),
      "blocklist entries must be trimmed lower-case")
    for (c <- Seq("__bl_toks", "__bl_grams"))
      require(!df.columns.contains(c),
        s"blocklistFilter uses internal column '$c' but the input has it")
    val (bi, uni) = terms.distinct.partition(_.contains(" "))
    require(bi.forall(_.split(" ").length == 2),
      "phrase entries must be exactly two words")
    def hits(arr: Column, list: Seq[String]): Column =
      if (list.isEmpty) lit(0)
      else size(filter(arr, t => t.isin(list.map(lit(_)): _*)))
    def matched(arr: Column, list: Seq[String]): Column =
      if (list.isEmpty) lit(0)
      else size(array_intersect(array_distinct(arr),
        array(list.map(lit(_)): _*)))
    // tokens and grams MUST be materialized attributes before the HOFs
    // reference them: an array-HOF lambda re-evaluates any non-attribute
    // child per ELEMENT in interpreted mode, and wordShingles' slice
    // lambda referencing the full tokenize expression meant O(tokens)
    // regex passes per document — 4 HOF consumers made q147 ~70× slower
    // than its own scan cost (24 s vs 0.34 s at sf0.1). Two withColumn
    // steps keep them as attributes; CollapseProject will not inline an
    // alias referenced more than once into lambdas.
    df.withColumn("__bl_toks",
        TextFunctions.tokens(TextFunctions.normalizeWs(col(textCol))))
      .withColumn("__bl_grams",
        TextFunctions.wordShingles(col("__bl_toks"), 2))
      .withColumn("n_hits",
        (hits(col("__bl_toks"), uni) + hits(col("__bl_grams"), bi)).cast("long"))
      .withColumn("n_terms",
        (matched(col("__bl_toks"), uni) +
          matched(col("__bl_grams"), bi)).cast("long"))
      .withColumn("keep", col("n_hits") === 0L)
      .drop("__bl_toks", "__bl_grams")
  }

  /** Multi-pattern SUBSTRING scan — [[blocklistFilter]]'s scale path.
    *
    * q147 compiles its list into codegen literals: right for tens of
    * word-boundary entries, but plan size and per-token cost grow with
    * the list, and token semantics can't catch in-word obfuscations
    * ("spamXspam" hiding "spam"). This operator matches RAW substrings —
    * every occurrence, overlaps and self-overlaps included — of an
    * arbitrary-size pattern list in ONE pass per document via an
    * Aho–Corasick automaton ([[graft.functions.AhoCorasick]]) built once
    * on the driver and BROADCAST: O(|text| + matches) per doc regardless
    * of list size, so a 50k-entry production blocklist costs the same
    * text pass as a 5-entry one.
    *
    * Matching is case-insensitive (text and patterns lowercased). Output:
    * (id, n_hits, n_patterns, keep = no hits) — one row per input row.
    *
    * 100 TB shape: pure map stage (mapPartitions over the id/text
    * projection; automaton rides the broadcast, not the plan), no
    * shuffle, no per-row regex compilation. The pattern list is the
    * small side by definition — it is reviewed by humans. */
  def multiPatternScan(df: DataFrame, idCol: String, textCol: String,
                       patterns: Seq[String]): DataFrame = {
    require(patterns.nonEmpty, "pattern list must not be empty")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val sess = df.sparkSession
    val bc = sess.sparkContext.broadcast(
      graft.functions.AhoCorasick.build(patterns.map(_.toLowerCase)))
    // the id column rides through UNTOUCHED (any type — long, string,
    // UUID): the row encoder carries its original field, so no ANSI
    // cast can throw and no non-numeric id silently nulls
    val proj = df.select(col(idCol),
      coalesce(lower(col(textCol)), lit("")).as("_txt"))
    val outSchema = StructType(proj.schema.head +:
      Seq(StructField("n_hits", LongType, nullable = false),
        StructField("n_patterns", LongType, nullable = false)))
    proj.mapPartitions { it =>
      val ac = bc.value
      it.map { r =>
        val (hits, np) = ac.scan(r.getString(1))
        Row(r.get(0), hits, np.toLong)
      }
    }(Encoders.row(outSchema))
      .withColumn("keep", col("n_hits") === 0L)
  }

  /** Pointwise-mutual-information collocations (Church & Hanks 1990) —
    * the vocabulary-curation diagnostic between raw counts and a
    * learned tokenizer: which adjacent word pairs co-occur far more
    * often than chance? pmi = ln(c_ab · N / (c_a · c_b)) with N the
    * corpus token count and c_a/c_b/c_ab unigram/adjacent-bigram
    * occurrence counts over the whitespace-normalized stream (the
    * Church–Hanks window-1 estimator: unigram probabilities share the
    * token denominator N, so the ratio needs no separate bigram total).
    * High-PMI pairs are multi-word units a tokenizer should learn as
    * one symbol (q120's BPE finds them by raw frequency; PMI finds the
    * RARE-but-glued pairs frequency misses).
    *
    * Returns (w1, w2, c_ab, c_a, c_b, pmi) for pairs with
    * c_ab ≥ minCount, integer counts exact.
    *
    * 100 TB shape: one corpus pass explodes tokens (unigram hash-agg)
    * and one explodes adjacent pairs (bigram hash-agg), both with
    * map-side partial aggregation into vocabulary-bounded frames; the
    * unigram table joins onto the bigram table twice via broadcast
    * (vocab-sized, the q120 contract); the one-row N frame broadcasts
    * into the final projection. Nothing row-scale crosses a shuffle
    * after the two aggregations. */
  def pmiCollocations(df: DataFrame, textCol: String,
                      minCount: Long = 5L): DataFrame = {
    require(minCount >= 1, s"minCount out of range: $minCount")
    val toks = df.select(
      TextFunctions.tokens(TextFunctions.normalizeWs(col(textCol))).as("tk"))
    val uniEx = toks.select(explode(col("tk")).as("w"))
    val uni = uniEx.groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    val n = uniEx.agg(count(lit(1)).as("n_tok"))
    val biCounts = toks
      .select(explode(TextFunctions.wordShingles(col("tk"), 2)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
      .withColumn("w1", split(col("g"), " ").getItem(0))
      .withColumn("w2", split(col("g"), " ").getItem(1))
    biCounts
      .join(broadcast(uni.select(col("w").as("w1"), col("c_w").as("c_a"))),
        Seq("w1"))
      .join(broadcast(uni.select(col("w").as("w2"), col("c_w").as("c_b"))),
        Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        // doubles BEFORE the products: c_a·c_b in long overflows (and
        // ANSI-throws) once corpus token counts pass ~3e9
        log(col("c_ab").cast("double") * col("n_tok").cast("double")
          / (col("c_a").cast("double") * col("c_b").cast("double"))).as("pmi"))
  }

  /** Convenience: annotate a document frame with the full analysis set. */
  def annotate(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("lang_pred", languageId(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("n_bpe_tokens", bpeTokenCount(col(textCol)))
      .withColumn("fp", fingerprint(col(textCol)))

  /** PII redaction patterns, applied in [[piiScrub]]'s fixed order. The
    * syntax stays inside the Java-regex ∩ RE2 common subset (no
    * lookaround, no backreferences) so ANSI engines replay the chain
    * verbatim; alternatives within one pattern start with distinct
    * characters, so leftmost-FIRST (Java/PCRE) and RE2 agree on every
    * match. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    // (name, pattern, replacement)
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    // card BEFORE ssn/phone: a 16-digit group must win over its
    // 3-2-4/3-3-4 substrings
    ("card", "\\b(?:\\d{4}[ -]){3}\\d{4}\\b", "<CARD>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\(\\d{3}\\) ?\\d{3}-\\d{4}|\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
    // ip LAST: version strings scrubbed as emails/cards can't resurface
    ("ip", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"))

  /** C4-style PII scrubbing: emails, payment-card numbers, SSNs, US
    * phone numbers, and IPv4 addresses replaced by type tokens, with a
    * per-type match count. Patterns apply in a FIXED order (see
    * [[PiiPatterns]]) and each counts/replaces on the output of the
    * previous stage, so a 16-digit card is one <CARD>, never also a
    * phone; word-boundary anchors keep version strings ("1.2.3.4000")
    * and long digit runs out.
    *
    * This is the regex tier — the C4/CCNet practice. Names/addresses
    * need an NER model and sit behind the classifier seam, not here.
    *
    * Returns the input plus text_clean and n_email/n_card/n_ssn/
    * n_phone/n_ip. Pure codegen map stage: five regexp_count + five
    * regexp_replace over one row, no shuffle — at 100 TB this rides the
    * corpus scan like every other hygiene pass. */
  def piiScrub(df: DataFrame, textCol: String): DataFrame = {
    val added = "text_clean" +: PiiPatterns.map { case (n, _, _) => s"n_$n" }
    for (c <- added)
      require(!df.columns.contains(c),
        s"piiScrub adds column '$c' but the input already has it")
    val (scrubbed, counts) = PiiPatterns.foldLeft((col(textCol), Seq.empty[Column])) {
      case ((t, cs), (name, pat, rep)) =>
        (regexp_replace(t, pat, rep),
          cs :+ regexp_count(t, lit(pat)).cast("long").as(s"n_$name"))
    }
    df.withColumns(added.zip(scrubbed.as("text_clean") +: counts).toMap)
  }

  /** Vocabulary coverage curve — the tokenizer-design / Zipf analysis:
    * for each requested percentage p, the minimum number of MOST
    * FREQUENT token types whose occurrences cover at least p% of all
    * token occurrences (plus the totals that contextualize it). The
    * standard question behind vocabulary sizing ("how many types cover
    * 95% of the corpus?") and a one-look Zipf-shape diagnostic —
    * boilerplate-heavy corpora cover 95% with suspiciously few types.
    *
    * Frequency ranks order by (count DESC, token ASC) — fully
    * deterministic — and the coverage test is pure integer arithmetic
    * (cum·100 ≥ p·total), so the whole curve replays exactly in an
    * ANSI oracle; no floats anywhere.
    *
    * 100 TB shape: the token count is one partial-agg'd pass over the
    * corpus; everything after operates on the VOCABULARY-sized count
    * table (10^6–10^8 rows at web scale, orders of magnitude below the
    * corpus). The rank/cumsum window here is a single global window
    * over that table — exact and fine to ~10^8; past that, the
    * production path is a range-partitioned two-pass cumsum (partition
    * partial sums broadcast back as offsets), same semantics. Returns
    * one row per requested pct: (pct, vocab_rank, covered_tok,
    * total_tok, total_vocab). */
  def vocabCoverage(df: DataFrame, textCol: String,
                    percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in [1, 100]: $percents")
    require(percents.distinct == percents, "percents must be distinct")
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(explode(TextFunctions.tokens(
        TextFunctions.normalizeWs(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("c").desc, col("token"))
    val ranked = counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = counts.agg(sum(col("c")).as("total_tok"),
      count(lit(1)).as("total_vocab"))
    val session = df.sparkSession
    import session.implicits._
    val pcts = percents.map(_.toLong).toDF("pct")
    ranked.crossJoin(broadcast(totals))
      .crossJoin(broadcast(pcts))
      .filter(col("cum") * 100L >= col("pct") * col("total_tok"))
      .groupBy(col("pct"))
      .agg(min(col("rank")).as("vocab_rank"),
        min(col("cum")).as("covered_tok"),
        first(col("total_tok")).as("total_tok"),
        first(col("total_vocab")).as("total_vocab"))
  }

  /** The five major scripts [[scriptMix]] counts, as (suffix, Java
    * pattern) pairs. Java spells Unicode script classes `\p{IsXxx}`;
    * an RE2 oracle spells the same class `\p{Xxx}` — same Unicode
    * script property, independently implemented tables (the q155
    * two-way-check posture). */
  private val ScriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "\\p{IsLatin}",
    "cyrillic" -> "\\p{IsCyrillic}",
    "greek" -> "\\p{IsGreek}",
    "han" -> "\\p{IsHan}",
    "arabic" -> "\\p{IsArabic}")

  /** Unicode script-mix profile — the mixed-script / homoglyph-spoofing
    * gate a multilingual crawl needs (a Cyrillic а inside an otherwise
    * Latin token is the classic confusable-phishing and
    * corpus-poisoning signature, and honest mixed-script documents
    * confuse language ID): per-document character counts for the five
    * major scripts (Latin, Cyrillic, Greek, Han, Arabic), the number of
    * distinct scripts present, and the mixed verdict (≥ 2 scripts).
    * Counting is per CHARACTER against the Unicode script property —
    * digits, punctuation, and whitespace belong to no script and never
    * count.
    *
    * 100 TB shape: five codegen'd regexp counts over the scanned text —
    * a pure map stage, zero exchanges. Replay: Java and RE2 implement
    * the same Unicode script tables independently, so an ANSI oracle's
    * `\p{Xxx}` counts form a genuine two-way check against the JDK's
    * `\p{IsXxx}` (the q155 NFC posture). */
  def scriptMix(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val added = ScriptClasses.map { case (n, _) => s"n_$n" } ++
      Seq("n_scripts", "mixed")
    for (c <- added)
      require(!df.columns.contains(c),
        s"scriptMix adds column '$c' but the input already has it")
    val counted = ScriptClasses.foldLeft(df) { case (acc, (n, pat)) =>
      acc.withColumn(s"n_$n",
        regexp_count(col(textCol), lit(pat)).cast("long"))
    }
    val present = ScriptClasses.map { case (n, _) =>
      when(col(s"n_$n") > 0L, 1L).otherwise(0L) }.reduce(_ + _)
    counted
      .withColumn("n_scripts", present)
      .withColumn("mixed", col("n_scripts") >= 2L)
  }
}
