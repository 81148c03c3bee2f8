package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions

/** EXACT set-similarity self-join via prefix filtering (the AllPairs /
  * PPJoin family — Bayardo et al., "Scaling Up All Pairs Similarity
  * Search", WWW 2007). The third dedup-blocking strategy in the engine,
  * next to LSH bands (probabilistic recall, q27/q69) and semantic
  * clustering (q130): prefix filtering is LOSSLESS — the output is
  * bit-identical to the brute-force all-pairs join — while only
  * examining candidate pairs that share a RARE set element.
  *
  * The filter: order every document's gram set by ascending corpus
  * document-frequency (rarest first, ties by gram hash). For a Jaccard
  * threshold t, a document x only needs its first
  * p(x) = |x| − ⌈t·|x|⌉ + 1 grams as join keys. Proof sketch: J(x,y) ≥ t
  * implies |x∩y| ≥ t·|x∪y| ≥ ⌈t·max(|x|,|y|)⌉ =: α; the FIRST common
  * gram in the global order has at least α−1 common grams after it in
  * both documents' orderings, so it sits within the first |x|−α+1 ≤ p(x)
  * grams of x AND the first p(y) grams of y. Hence every qualifying pair
  * collides on a prefix-prefix token, and the verify step (exact merge
  * Jaccard over the full sorted sets) removes every false candidate.
  *
  * 100 TB shape: the gram explode carries 8-byte gram hashes,
  * never gram strings; document frequency is one partial-agg'd
  * gram-vocabulary-sized aggregate; the candidate join's inputs are
  * (gram_hash, id, set_size) triples where each document contributes
  * only its ~(1−t)·|x| rarest grams — rare-first ordering makes
  * candidate buckets df-bounded at the rare end of the vocabulary; the
  * verify join moves sorted hash arrays keyed by id exactly once per
  * side. Unlike the LSH family there is NO hot-band cap escape hatch:
  * the operator's contract is exactness, and its candidate volume is
  * output-sensitive (lower-bounded by the true pair count), so a
  * boilerplate-saturated corpus where "everything matches everything"
  * is quadratic in its TRUE duplicate structure — route such corpora
  * through the approximate banded family first.
  *
  * Hash-collision regime matches q69: Jaccard over hashed gram sets
  * equals Jaccard over the string sets absent collisions (the oracle
  * computes the string-set brute force).
  */
object SimilarityJoin {

  /** Shared per-document gram frame all three exact-join operators
    * build on: (id, ord, sh, sz) where `ord` is the gram set in global
    * (df asc, gram asc) RARE-FIRST order (the order the prefix theorems
    * quantify over), `sh` the same set sorted by hash for the merge
    * verify, both from ONE aggregation — extracted so the order-
    * sensitive tie-break lives in exactly one place. Persisted: every
    * caller reads it from ≥2 plan branches. */
  private def orderedGramSets(df: DataFrame, idCol: String, textCol: String,
                              n: Int): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
        graft.expressions.WordNgrams.wordNgramHashes(
          coalesce(col(textCol), lit("")), n).as("gh"))
      .filter(size(col("gh")) > 0)
    val ex = grams.select(col("id"), explode(col("gh")).as("g"))
    val dfreq = ex.groupBy(col("g")).agg(count(lit(1)).as("df"))
    ex.join(dfreq, Seq("g"))
      .groupBy(col("id"))
      .agg(
        transform(array_sort(collect_list(struct(col("df"), col("g")))),
          s => s.getField("g")).as("ord"),
        sort_array(collect_list(col("g"))).as("sh"))
      .withColumn("sz", size(col("ord")))
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** All pairs of documents whose word-n-gram Jaccard similarity is
    * ≥ `threshold`, computed exactly. Returns (id_a, id_b, jaccard)
    * with id_a < id_b.
    */
  def prefixFilterJoin(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, threshold: Double = 0.6): DataFrame = {
    require(n >= 1 && n <= 8, s"n out of range: $n")
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold out of range: $threshold")
    // 1e-9 slack: a float product lying one ulp ABOVE an integral
    // t·|x| would otherwise ceil one higher and shrink the prefix
    // below the lossless bound. Slack only ever widens the prefix.
    val ordered = orderedGramSets(df, idCol, textCol, n)
      .withColumn("p",
        (col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
          .cast("int"))
    val prefix = ordered.select(col("id"), col("sz"),
      explode(slice(col("ord"), lit(1), col("p"))).as("g"))
    val a = prefix.select(col("g"), col("id").as("id_a"), col("sz").as("sz_a"))
    val b = prefix.select(col("g"), col("id").as("id_b"), col("sz").as("sz_b"))
    // Length filter: J ≥ t forces t·max(|x|,|y|) ≤ |x∩y| ≤ min(|x|,|y|);
    // the slack keeps borderline pairs IN (pruning is conservative-only,
    // the verify step owns the exact decision).
    val cand = a.join(b, Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .filter(greatest(col("sz_a"), col("sz_b")) * lit(threshold)
        <= least(col("sz_a"), col("sz_b")).cast("double") + lit(1e-9))
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(ordered.select(col("id").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(ordered.select(col("id").as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.expressions.SortedArrayJaccard(col("sh_a"), col("sh_b"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Survivor-selection form of [[prefixFilterJoin]] — the drop rule the
    * LSH pipeline stage uses (any doc pairing with a smaller id is
    * dropped, the one-hop approximation), but with EXACT pair discovery:
    * the curation pipeline's `exactNearDup` mode swaps this in for
    * MinHash-LSH when lossless dedup is worth the candidate volume. */
  def prefixFilterDedup(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.6): DataFrame = {
    val dropped = prefixFilterJoin(df, idCol, textCol, n, threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dropped, Seq(idCol), "left_anti")
  }

  /** Multi-pass Sorted-Neighborhood near-dup pairs (Hernández & Stolfo,
    * DMKD 1998) — the FOURTH blocking strategy in the engine, next to
    * LSH bands, prefix filtering, and semantic clustering: sort the
    * corpus by a discriminating key and compare only rows whose ranks
    * fall within a sliding window of `w`. Near-identical documents sort
    * adjacently, so the candidate volume is w·N — LINEAR, corpus-size-
    * independent per row, with no hash-bucket skew mode at all (the
    * window caps every row's candidates at w−1 by construction; the
    * price is recall, not blowup, when a block is boilerplate-heavy).
    *
    * Two passes with independent keys, their candidates unioned:
    *   1. the whitespace-normalized text (catches shared-prefix edits);
    *   2. the alphabetically-sorted token sequence (catches reorderings
    *      pass 1's lexicographic sort scatters).
    * Windows never span block boundaries — the window runs inside a
    * key-prefix block (`blockLen` chars), which is exactly what keeps
    * the sort scale-safe: each block is one window partition, there is
    * NO global-rank single-partition window anywhere. Boundary misses
    * are the documented multi-pass trade (each pass's blocks split the
    * corpus differently). At 100 TB, `blockLen` grows until blocks fit
    * a task (the prefix is the range-partitioning key); at the gated
    * corpus 2 chars suffices. Exchanges carry (block, rank, id)
    * triples; gram arrays move once per side in the verify join.
    *
    * Like q118's banded operator, the CONTRACT is the deterministic
    * blocked candidate set + exact verify — not ground-truth recall;
    * the oracle replays both passes' windows and the verification, and
    * the spec measures recall against brute force on the gated corpus.
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, textCol: String,
                              n: Int = 3, threshold: Double = 0.6,
                              window: Int = 4, blockLen: Int = 2): DataFrame = {
    require(window >= 2 && window <= 64, s"window out of range: $window")
    require(blockLen >= 1, s"blockLen out of range: $blockLen")
    import org.apache.spark.sql.expressions.Window
    val norm = TextFunctions.normalizeWs(col(textCol))
    val base = df.select(col(idCol).as("id"),
      norm.as("k1"),
      concat_ws(" ", array_sort(TextFunctions.tokens(norm))).as("k2"),
      graft.expressions.WordNgrams.wordNgramHashes(
        coalesce(col(textCol), lit("")), n).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def passPairs(keyName: String): DataFrame = {
      val ranked = base.select(col("id"), col(keyName).as("key"))
        .withColumn("blk", substring(col("key"), 1, blockLen))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("blk")).orderBy(col("key"), col("id"))))
      val ante = ranked.select(col("blk"), col("rnk"), col("id").as("id_a"))
      val probe = ranked.select(col("blk"), col("id").as("id_b"),
          explode(sequence(col("rnk") - lit(window - 1), col("rnk") - 1))
            .as("rnk"))
        .filter(col("rnk") >= 1)
      ante.join(probe, Seq("blk", "rnk"))
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"))
    }
    val cand = passPairs("k1").unionByName(passPairs("k2")).distinct()
    cand
      .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.expressions.SortedArrayJaccard(col("sh_a"), col("sh_b"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** EXACT set-CONTAINMENT self-join — the asymmetric similarity the
    * symmetric families can't express: C(x→y) = |x∩y| / |x| ≥ τ finds
    * documents substantially CONTAINED in another (truncations,
    * excerpts, quotes) even when |y| ≫ |x| crushes their Jaccard below
    * any usable threshold. Same prefix-filter machinery as
    * [[prefixFilterJoin]], adapted to the asymmetric bound:
    *
    *   - required overlap α = ⌈τ·|x|⌉ depends only on the CONTAINED
    *     side, so only the probe role gets a prefix (its |x| − α + 1
    *     rarest grams, α computed in exact integer arithmetic as
    *     (τnum·|x| + τden − 1) div τden); the container role indexes
    *     its FULL gram list — containment puts no upper bound on |y|,
    *     so no symmetric prefix exists (the classical set-containment
    *     join asymmetry);
    *   - length filter: |x∩y| ≤ |y| forces τden·|y| ≥ τnum·|x|;
    *   - verify: integer overlap count (one merge pass) compared as
    *     τden·overlap ≥ τnum·|x| — no float anywhere in the decision.
    *
    * Every doc plays both roles, pairs are directional (id_a contained
    * in id_b, both orders possible for mutual near-dups). Lossless by
    * the same smallest-common-gram argument: the first common gram in
    * x's rare-first order has ≥ α−1 common grams after it, so it sits
    * within x's prefix, and it sits SOMEWHERE in y's full list.
    *
    * 100 TB shape: identical to prefixFilterJoin except the index side
    * explodes fully — candidate volume is Σ_x Σ_{g∈prefix(x)} df(g),
    * still governed by rare-gram df; exchanges carry 8-byte hashes. */
  def containmentJoin(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, tauNum: Long = 4, tauDen: Long = 5)
      : DataFrame = {
    require(n >= 1 && n <= 8, s"n out of range: $n")
    require(tauNum > 0 && tauDen >= tauNum, s"tau out of range: $tauNum/$tauDen")
    // α = ceil(τ·sz) in exact integer arithmetic
    val ordered = orderedGramSets(df, idCol, textCol, n)
      .withColumn("sz", col("sz").cast("long"))
      .withColumn("p",
        (col("sz") - expr(s"($tauNum * sz + ${tauDen - 1}) div $tauDen") + 1)
          .cast("int"))
    val probe = ordered.select(col("id").as("id_a"), col("sz").as("sz_a"),
      explode(slice(col("ord"), lit(1), col("p"))).as("g"))
    val index = ordered.select(col("id").as("id_b"), col("sz").as("sz_b"),
      explode(col("ord")).as("g"))
    val cand = probe.join(index, Seq("g"))
      .filter(col("id_a") =!= col("id_b"))
      .filter(lit(tauDen) * col("sz_b") >= lit(tauNum) * col("sz_a"))
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(ordered.select(col("id").as("id_a"), col("sh").as("sh_a"),
        col("sz").as("sz_a")), Seq("id_a"))
      .join(ordered.select(col("id").as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
      .withColumn("ov",
        graft.expressions.SortedArrayOverlap(col("sh_a"), col("sh_b")))
      .filter(lit(tauDen) * col("ov") >= lit(tauNum) * col("sz_a"))
      .select(col("id_a"), col("id_b"),
        (col("ov").cast("double") / col("sz_a")).as("containment"))
  }

  /** Build the standing EXACT-dedup gram index for a corpus: three
    * derived tables under `idxPath` —
    *   docs/      (id, sh sorted-hash gram set, sz)
    *   postings/  (id, sz, g) — the full inverted gram index
    *   df/        (g, df)     — corpus document frequencies
    * The exact member of the standing-probe family's build step
    * (q104's banded text / q108's embedding / q127's span builds are
    * the approximate siblings). */
  def writeGramIndex(corpus: DataFrame, idCol: String, textCol: String,
                     n: Int, idxPath: String): Unit = {
    val spark = corpus.sparkSession
    val grams = corpus.select(col(idCol).as("id"),
        graft.expressions.WordNgrams.wordNgramHashes(
          coalesce(col(textCol), lit("")), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sz", size(col("sh")).cast("long"))
    grams.write.mode("overwrite").parquet(s"$idxPath/docs")
    val post = spark.read.parquet(s"$idxPath/docs")
      .select(col("id"), col("sz"), explode(col("sh")).as("g"))
    post.write.mode("overwrite").parquet(s"$idxPath/postings")
    spark.read.parquet(s"$idxPath/postings")
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$idxPath/df")
  }

  /** EXACT incremental near-dup pairs of a batch against a STANDING
    * corpus gram index — the lossless member of the q104/q108/q127
    * standing-probe family: where q104's banded probe trades recall
    * for candidate volume, this one keeps the prefix-filter guarantee.
    * The asymmetry does the work: only the BATCH side takes a prefix
    * (under corpus-rare-first df order — grams absent from the corpus
    * get df 0 and sort first, correctly: they can produce no corpus
    * candidate at all), while the corpus side is the full posting
    * index, so the smallest-common-gram argument needs no order
    * agreement on the corpus side.
    *
    * Plan discipline (the q104 trick, pinned in the spec): every join
    * broadcasts the batch/candidate side — the batch gram stream into
    * the df scan, the batch prefix into the postings scan, the
    * verified-candidate frame into the docs scan. The corpus-sized
    * tables are scanned, never shuffled; per-batch cost tracks the
    * batch, not the corpus. */
  def incrementalExactDupPairs(batch: DataFrame, idCol: String,
                               textCol: String, n: Int, threshold: Double,
                               docsTable: DataFrame, postings: DataFrame,
                               dfTable: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val bg = batch.select(col(idCol).as("id_new"),
        graft.expressions.WordNgrams.wordNgramHashes(
          coalesce(col(textCol), lit("")), n).as("gh"))
      .filter(size(col("gh")) > 0)
      .withColumn("sz_new", size(col("gh")).cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bex = bg.select(col("id_new"), col("sz_new"), explode(col("gh")).as("g"))
    // The batch-preserving df lookup CANNOT be one broadcast join:
    // Spark's BroadcastHashJoin never builds on the outer-preserved
    // side (BuildLeft is only InnerLike/RightOuter, BuildRight only
    // Left* joins), so `broadcast(bex).join(dfTable, "left")` silently
    // drops the hint and the planner is free to shuffle — or broadcast!
    // — the corpus-sized df table. Two supported steps instead: (1) a
    // LeftSemi (BuildRight ✓) streams the df table once against the
    // broadcast batch gram set, leaving a batch-sized df subset; (2)
    // the LeftOuter (BuildRight ✓) joins the batch against THAT tiny
    // subset. Corpus df rows are scanned, never shuffled; unknown
    // grams get df 0 (rarest-first, correctly).
    val dfSmall = dfTable.join(broadcast(bex.select(col("g")).distinct()),
      Seq("g"), "left_semi")
    val withDf = bex.join(broadcast(dfSmall), Seq("g"), "left")
      .na.fill(0L, Seq("df"))
    val orderedB = withDf.groupBy(col("id_new"))
      .agg(max(col("sz_new")).as("sz_new"),
        transform(array_sort(collect_list(struct(col("df"), col("g")))),
          s => s.getField("g")).as("ord"))
      .withColumn("p",
        (col("sz_new") - ceil(lit(threshold) * col("sz_new") - lit(1e-9)) + 1)
          .cast("int"))
    val probe = orderedB.select(col("id_new"), col("sz_new"),
      explode(slice(col("ord"), lit(1), col("p"))).as("g"))
    val cand = broadcast(probe)
      .join(postings.select(col("g"), col("id").as("id_corpus"),
        col("sz").as("sz_corpus")), Seq("g"))
      .filter(greatest(col("sz_new"), col("sz_corpus")) * lit(threshold)
        <= least(col("sz_new"), col("sz_corpus")).cast("double") + lit(1e-9))
      .select(col("id_new"), col("id_corpus")).distinct()
    val withNew = cand
      .join(bg.select(col("id_new"), col("gh").as("sh_new")), Seq("id_new"))
    broadcast(withNew)
      .join(docsTable.select(col("id").as("id_corpus"),
        col("sh").as("sh_corpus")), Seq("id_corpus"))
      .select(col("id_new"), col("id_corpus"),
        graft.expressions.SortedArrayJaccard(col("sh_new"), col("sh_corpus"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** EXACT edit-distance self-join — the CHARACTER-level member of the
    * exact similarity-join family, next to the set-level prefix join
    * (Jaccard), the containment join, and the sorted-neighborhood
    * window: all pairs with Levenshtein distance ≤ `k`, computed
    * exactly. Jaccard over gram SETS is blind to ordering and
    * multiplicity ("aab" vs "aba"); edit distance is the similarity
    * that catches typos, OCR noise, and near-identical URLs/titles the
    * set joins normalize away.
    *
    * Machinery (Gravano et al., "Approximate String Joins in a Database
    * (Almost) for Free", VLDB 2001, for the positional q-gram
    * framework; Xiao, Wang & Lin, "Ed-Join", VLDB 2008, for prefix
    * filtering under a global gram order):
    *
    *   - positional q-grams: string x contributes (pos, gram) for each
    *     of its |x|−q+1 windows, grams as 8-byte xxhash64 content
    *     hashes (collisions only ADD candidates — removed by verify);
    *   - prefix filter: order each string's gram occurrences by global
    *     (df asc, gram, pos); k edits destroy at most k·q gram
    *     occurrences, so among the first k·q+1 at least one SURVIVES
    *     into the partner — and the minimal-content-rank surviving
    *     pair sits inside BOTH prefixes (same smallest-common-gram
    *     argument as [[prefixFilterJoin]], on content rank; ties by
    *     pos stay within the occurrence count so the bound holds);
    *   - position filter: a surviving gram shifts by at most k
    *     positions (each edit shifts later positions by ≤ 1), so
    *     candidates need |Δpos| ≤ k on the matched gram;
    *   - length filter: |Δlen| ≤ k;
    *   - SHORT fallback: a string with fewer than k·q+1 grams
    *     (len ≤ k·q+q−1) can have ALL its grams destroyed, so the
    *     prefix theorem is silent — such strings pair directly against
    *     every string within the length band via a δ-exploded
    *     length-bucket EQUI-join (no nested loop; both sides are
    *     bounded at len ≤ k·q+q−1+k, a constant);
    *   - verify: banded Levenshtein with threshold k (O(k·len) per
    *     candidate, Spark's codegen 3-arg levenshtein) — the exact
    *     decision, so the whole join is LOSSLESS like its siblings.
    *
    * 100 TB shape: gram exchanges carry (id, 8-byte hash, pos, len)
    * rows; the prefix bounds every string's join keys at k·q+1
    * occurrences REGARDLESS of string length (the rare-first order
    * makes candidate buckets df-bounded at the rare end, exactly the
    * prefixFilterJoin story); the pair-id distinct and the verify join
    * move fixed-width rows; strings cross a shuffle only in the final
    * verify, once per side. Like the other exact joins there is no
    * skew escape hatch: candidate volume is output-sensitive, route
    * boilerplate-saturated corpora through the approximate families.
    *
    * Returns (id_a, id_b, dist) with id_a < id_b, dist ≤ k exact.
    */
  def editDistanceJoin(df: DataFrame, idCol: String, strCol: String,
                       k: Int = 2, q: Int = 3): DataFrame = {
    require(k >= 1 && k <= 8, s"k out of range: $k")
    require(q >= 2 && q <= 8, s"q out of range: $q")
    import org.apache.spark.sql.expressions.Window
    val pfx = k * q + 1
    val shortMax = k * q + q - 1
    val s = df.select(col(idCol).as("id"),
        coalesce(col(strCol), lit("")).as("s"))
      .withColumn("len", length(col("s")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val occ = s.filter(col("len") >= q)
      .select(col("id"), col("len"), explode(expr(
        s"transform(sequence(1, len - ${q - 1}), " +
          s"p -> struct(p AS p, xxhash64(substring(s, p, $q)) AS g))"))
        .as("o"))
      .select(col("id"), col("len"), col("o.p").as("p"), col("o.g").as("g"))
    val dfreq = occ.groupBy(col("g")).agg(count(lit(1)).as("df"))
    // rank ≤ kq+1 under (df, g, p): the occurrence-level rare-first
    // prefix; a window, not a collect_list — long strings never build
    // their full gram array in one row
    val prefix = occ.join(dfreq, Seq("g"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("g"), col("p"))))
      .filter(col("rnk") <= pfx)
      .select(col("id"), col("len"), col("g"), col("p"))
    val a = prefix.select(col("g"), col("id").as("id_a"),
      col("len").as("len_a"), col("p").as("p_a"))
    val b = prefix.select(col("g"), col("id").as("id_b"),
      col("len").as("len_b"), col("p").as("p_b"))
    val gramCand = a.join(b, Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .filter(abs(col("len_a") - col("len_b")) <= k)
      .filter(abs(col("p_a") - col("p_b")) <= k)
      .select(col("id_a"), col("id_b"))
    // any pair whose SHORTER side has < kq+1 grams routes here: short
    // strings δ-explode to their k-band of partner lengths and
    // equi-join on len against everything short enough to be a partner
    val shortA = s.filter(col("len") <= shortMax)
    val partner = s.filter(col("len") <= shortMax + k)
    val shortCand = shortA
      .select(col("id").as("id_x"),
        explode(sequence(col("len") - k, col("len") + k)).as("len"))
      .join(partner.select(col("id").as("id_y"), col("len")), Seq("len"))
      .filter(col("id_x") =!= col("id_y"))
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
    val cand = gramCand.unionByName(shortCand).distinct()
    cand
      .join(s.select(col("id").as("id_a"), col("s").as("s_a")), Seq("id_a"))
      .join(s.select(col("id").as("id_b"), col("s").as("s_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b"), k).as("d"))
      .filter(col("d") >= 0)
      .select(col("id_a"), col("id_b"), col("d").cast("long").as("dist"))
  }

  /** Brute-force edit-distance reference for the spec: every pair under
    * the length band, full Levenshtein. Test-support only. */
  def bruteForceEditPairs(df: DataFrame, idCol: String, strCol: String,
                          k: Int): DataFrame = {
    val s = df.select(col(idCol).as("id"),
        coalesce(col(strCol), lit("")).as("s"))
    val l = s.select(col("id").as("id_a"), col("s").as("s_a"))
    val r = s.select(col("id").as("id_b"), col("s").as("s_b"))
    l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b")).cast("long").as("dist"))
      .filter(col("dist") <= k)
  }

  /** Brute-force reference for the spec: every pair's exact Jaccard via
    * the same hashed-gram sets, no filtering. Test-support only — the
    * quadratic join is the semantics being avoided.
    */
  def bruteForcePairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int, threshold: Double): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
        graft.expressions.WordNgrams.wordNgramHashes(
          coalesce(col(textCol), lit("")), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val l = grams.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val r = grams.select(col("id").as("id_b"), col("sh").as("sh_b"))
    l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.expressions.SortedArrayJaccard(col("sh_a"), col("sh_b"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
