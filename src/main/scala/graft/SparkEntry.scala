package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Sentiment, TextFunctions}
import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.pipeline.TweetPipeline

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query aliases computed columns identically in the Spark code and
  * the DuckDB oracle SQL (the driver's compare sorts columns by name), and
  * ends with a fully deterministic ORDER BY. Aggregates over doubles are
  * rounded on both sides to absorb summation-order FP jitter; pass-through
  * values are left untouched (bit-identical by construction).
  */
object SparkEntry {

  private def t(s: SparkSession, d: String, name: String): DataFrame =
    Tables.load(s, d, name)

  /** Deterministic rounding used on BOTH sides of the oracle compare.
    * Engine `round()` semantics differ (Spark rounds the shortest decimal
    * representation of the double; DuckDB rounds the binary value), which
    * makes ~0.1% of per-row roundings disagree by one ulp-of-a-cent. The
    * pure-IEEE formula floor(x*f + 0.5)/f evaluates bit-identically in
    * both engines. The SQL oracles carry matching `rN(...)` markers that
    * [[expandRounding]] rewrites to the same formula.
    */
  private def rn(c: Column, f: Double): Column = floor(c * f + 0.5) / f
  private def r2(c: Column): Column = rn(c, 100.0)
  private def r4(c: Column): Column = rn(c, 10000.0)
  private def r6(c: Column): Column = rn(c, 1000000.0)

  /** Expand `r2(expr)` / `r4(expr)` / `r6(expr)` markers in oracle SQL to
    * `floor((expr) * f + 0.5) / f.0`, matching [[rn]] exactly. */
  private[graft] def expandRounding(sql: String): String = {
    val factors = Map('2' -> "100", '4' -> "10000", '6' -> "1000000")
    var s = sql
    var m = "\\br([246])\\(".r.findFirstMatchIn(s)
    while (m.isDefined) {
      val mm = m.get
      val open = mm.end - 1
      var depth = 0
      var i = open
      var end = -1
      while (end < 0) {
        val ch = s(i)
        if (ch == '(') depth += 1
        else if (ch == ')') { depth -= 1; if (depth == 0) end = i }
        i += 1
      }
      val inner = s.substring(open + 1, end)
      val f = factors(mm.group(1)(0))
      s = s.substring(0, mm.start) + s"floor(($inner) * $f + 0.5) / $f.0" +
        s.substring(end + 1)
      m = "\\br([246])\\(".r.findFirstMatchIn(s)
    }
    s
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TweetPipeline.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1/A4: grouped aggregation with filter (TPC-H Q1 shape)
    "q01_pricing_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          r2(sum(col("l_quantity"))).as("sum_qty"),
          r2(sum(col("l_extendedprice"))).as("sum_base_price"),
          r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
          r4(avg(col("l_quantity"))).as("avg_qty"),
          r4(avg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // P1/P2 + F3: projection + conjunctive filter (pushed to parquet scan)
    "q02_filter_project" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_discount") < 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // J1: inner equi-join + aggregation
    "q03_join_agg" -> ((s, d) => {
      t(s, d, "orders").join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(r2(sum(col("o_totalprice"))).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    }),

    // J1 variant: explicit broadcast join against a small dimension
    "q04_join_broadcast" -> ((s, d) => {
      t(s, d, "lineitem").join(broadcast(t(s, d, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(r2(sum(col("l_extendedprice"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("p_brand"))
    }),

    // J2: multi-way join across the star schema (TPC-H Q5 shape)
    "q05_multi_join" -> ((s, d) => {
      t(s, d, "region")
        .join(t(s, d, "nation"), col("r_regionkey") === col("n_regionkey"))
        .join(t(s, d, "customer"), col("n_nationkey") === col("c_nationkey"))
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // J2: left semi join (EXISTS)
    "q06_semi_join" -> ((s, d) => {
      t(s, d, "customer").join(
          t(s, d, "orders").filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // J2: left anti join (NOT EXISTS)
    "q07_anti_join" -> ((s, d) => {
      t(s, d, "customer").join(t(s, d, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // §2.5: per-group top-k via row_number window
    "q08_window_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // §2.5: lag + running sum window
    "q09_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          r2(sum(col("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .as("running_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // A5: rollup with subtotal rows
    "q10_rollup" -> ((s, d) => {
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          r2(sum(col("o_totalprice"))).as("revenue"))
        .orderBy(col("n_name").asc_nulls_first, col("c_mktsegment").asc_nulls_first)
    }),

    // A5: count distinct
    "q11_distinct_agg" -> ((s, d) => {
      t(s, d, "orders").groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    }),

    // §2.7: intersect / except set ops
    "q12_set_ops" -> ((s, d) => {
      val a = t(s, d, "orders").select(col("o_custkey").as("custkey")).distinct()
      val b = t(s, d, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey")).distinct()
      a.intersect(b).withColumn("op", lit("intersect"))
        .unionByName(a.except(b).withColumn("op", lit("except")))
        .select(col("op"), col("custkey"))
        .orderBy(col("op"), col("custkey"))
    }),

    // §2.6: global top-k (TakeOrderedAndProject)
    "q13_topk" -> ((s, d) => {
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // C5/C6: split + explode + aggregate (token frequency)
    "q14_explode_tokens" -> ((s, d) => {
      t(s, d, "documents")
        .select(explode(TextFunctions.tokens(
          TextFunctions.normalizeWs(col("text")))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(10)
    }),

    // C2/C7 + string built-ins
    "q15_string_funcs" -> ((s, d) => {
      t(s, d, "customer").select(col("c_custkey"),
          upper(col("c_name")).as("name_upper"),
          length(col("c_name")).cast("long").as("name_len"),
          concat(col("c_mktsegment"), lit("#"), col("c_name")).as("tagged"),
          substring(col("c_name"), 1, 8).as("name_prefix"))
        .orderBy(col("c_custkey"))
    }),

    // C9/C10: date part extraction + aggregate
    "q16_date_funcs" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"))
        .agg(count(lit(1)).as("n_orders"),
          r2(sum(col("o_totalprice"))).as("revenue"))
        .orderBy(col("yr"), col("mo"))
    }),

    // S11/C12: JSON field extraction from the events payload
    "q17_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(r4(avg(col("k"))).as("avg_k"),
          max(col("k")).as("max_k"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // C8: surrogate key = base64(raw sha1 digest)
    "q18_surrogate_key" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          TextFunctions.surrogateKey256(col("lang"), col("source"),
            col("doc_id").cast("string")).as("hash_id"))
        .orderBy(col("doc_id"))
    }),

    // A3: exact dedup by normalized content, deterministic winner
    "q19_dedup_exact" -> ((s, d) => {
      t(s, d, "documents")
        .groupBy(TextFunctions.normalizeWs(col("text")).as("norm"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))
        .orderBy(col("keep_id"))
    }),

    // C14: conditional + math scalar functions
    "q20_case_math" -> ((s, d) => {
      t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          when(col("l_discount") > 0.05, lit("high"))
            .when(col("l_discount") > 0.02, lit("mid"))
            .otherwise(lit("low")).as("disc_band"),
          r2(abs(col("l_extendedprice") * col("l_tax"))).as("tax_amt"),
          r4(sqrt(col("l_quantity"))).as("qty_sqrt"),
          pmod(col("l_orderkey"), lit(7)).as("bucket"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // A5: cube grouping sets
    "q21_cube" -> ((s, d) => {
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          r2(sum(col("l_quantity"))).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // §2.9: tumbling-window aggregation over the event stream table
    "q22_events_hourly" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), r2(sum(col("value"))).as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // A3 on the stream table: deterministic first-event-per-key dedup
    "q23_events_dedup" -> ((s, d) => {
      Dedup.exactDeterministic(Tables.events(s, d),
          Seq("user_id", "event_type"), "event_id")
        .select(col("user_id"), col("event_type"), col("event_id"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // Text analysis: token statistics per language
    "q24_token_stats" -> ((s, d) => {
      t(s, d, "documents").groupBy(col("lang"))
        .agg(r4(avg(TextAnalysis.tokenCount(col("text")))).as("avg_tokens"),
          max(TextAnalysis.tokenCount(col("text"))).cast("long").as("max_tokens"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))
    }),

    // Scalar subquery shape: rows above a computed global aggregate
    "q25_scalar_subquery" -> ((s, d) => {
      val avgBal = t(s, d, "customer").agg(avg(col("c_acctbal")).as("avg_bal"))
      t(s, d, "customer").crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .select(col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // Similarity: exact brute-force cosine top-k (correctness baseline)
    "q26_cosine_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 20), emb,
          "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"),
          r6(col("cos")).as("cos"), col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Dedup extension: MinHash-LSH near-duplicate pairs. Hash-gated: the
    // oracle is brute-force exact Jaccard over 5-char shingles in DuckDB,
    // valid because (a) the k=128/bands=16 geometry (r=8) has ~1-1e-6
    // recall at the 0.8 threshold on this corpus (every true pair sits at
    // j >= 0.92), so LSH finds exactly the brute-force pair set, and
    // (b) the exact-verification stage computes the same Jaccard the
    // oracle does (64-bit shingle hashing is collision-free here).
    "q27_minhash_pairs" -> ((s, d) => {
      Dedup.minhashDupPairs(t(s, d, "documents"), "doc_id", "text",
          shingleSize = 5, k = 128, bands = 16, threshold = 0.8)
        .select(col("id_a"), col("id_b"), r4(col("jaccard")).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Dedup extension: SimHash near-duplicate pairs (rows-only check)
    // SimHash near-dup pairs in sha-hash mode: every stage — sha256 token
    // hash, 64-slot voting, 4x16-bit pigeonhole banding, exact Hamming
    // verify — is integer arithmetic an ANSI engine can replay, so the
    // oracle reproduces the operator INCLUDING its candidate generation.
    // (The murmur default keeps its native<->declarative ScalaTest gate.)
    "q28_simhash_pairs" -> ((s, d) => {
      Dedup.simhashDupPairs(t(s, d, "documents"), "doc_id", "text",
          maxHamming = 8, shaHash = true)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Text analysis: language ID + quality scoring. Hash-gated: the
    // DuckDB oracle mirrors TextStatsEval term-for-term (stopword
    // profiles as list literals, IEEE-identical rounding).
    "q29_text_quality" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.languageId(col("text")).as("lang_pred"),
          TextAnalysis.qualityScore(col("text")).as("quality"),
          TextAnalysis.bpeTokenCount(col("text")).cast("long").as("n_bpe"))
        .orderBy(col("doc_id"))
    }),

    // C3: sentiment aggregate per language. Hash-gated: the oracle ports
    // the lexicon as a VALUES literal (see sentimentOracleCtes).
    "q30_sentiment" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("lang"), Sentiment.sentiment(col("text")).as("sent"))
        .groupBy(col("lang"))
        .agg(r4(avg(col("sent.polarity"))).as("avg_polarity"),
          r4(avg(col("sent.subjectivity"))).as("avg_subjectivity"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))
    }),

    // Flagship end-to-end pipeline. Hash-gated: the oracle ports the full
    // clean→sentiment→explode→dedup→top-k chain to DuckDB SQL.
    "q31_flagship_pipeline" -> ((s, d) => TweetPipeline.flagship(s, d, 50)),

    // J2 gap exemplar: backward as-of join (error -> latest prior purchase
    // of the same user), union+window technique
    "q32_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      operators.AsOfJoin.backward(errors, purchases, Seq("user_id"),
          "ts", "ts", Seq("purchase_id"))
        .select(col("event_id"), col("user_id"), col("purchase_id"))
        .orderBy(col("event_id"))
    }),

    // §2.10 UDAF surface: per-group top-k via typed Aggregator
    "q33_topk_agg" -> ((s, d) => {
      val topk = graft.functions.TopKAggregator.topK(3)
      t(s, d, "orders").join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(topk(col("o_totalprice")).as("vals"))
        .select(col("c_mktsegment"), posexplode(col("vals")))
        .select(col("c_mktsegment"), (col("pos") + 1).cast("long").as("rank"),
          col("col").as("o_totalprice"))
        .orderBy(col("c_mktsegment"), col("rank"))
    }),

    // §2.7: UNION ALL across heterogeneous sources (unionByName)
    "q34_union_all" -> ((s, d) => {
      val a = t(s, d, "customer")
        .select(col("c_custkey").as("id"), lit("customer").as("src"))
      val b = t(s, d, "supplier")
        .select(col("s_suppkey").as("id"), lit("supplier").as("src"))
      a.unionByName(b).orderBy(col("src"), col("id"))
    }),

    // A5: HLL approx distinct under a TOLERANCE oracle. The sketch value
    // is engine-specific by design, so the estimate itself can never
    // hash-match an independent engine — but the contract an engine CAN
    // promise (estimate within 10% of exact at rsd=0.05; HLL's 2-sigma
    // band is ~10%) is oracle-checkable: the boolean goes under the
    // DuckDB value hash, so an HLL regression drifting past tolerance
    // turns the gate red. The engine's REPLAYABLE approx-distinct
    // surface is the KMV sketch (q102 / SQL `kmv_sketch_256`), which
    // hash-gates the estimate arithmetic itself; approx_count_distinct
    // (HLL) is the mergeable interop alias with this tolerance contract.
    "q35_approx_distinct" -> ((s, d) => {
      t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.05).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts").cast("double") - col("exact_parts").cast("double"))
            <= lit(0.1) * col("exact_parts").cast("double")).as("hll_within_tol"))
        .orderBy(col("l_returnflag"))
    }),

    // A5: pivot (wide conditional aggregation)
    "q36_pivot" -> ((s, d) => {
      t(s, d, "lineitem").groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("A", "N", "R"))
        .orderBy(col("l_linestatus"))
    }),

    // Multimodal: synthesize media -> per-partition feature extraction.
    // Hash-gated: bytes are sha256 chains and the decode stub is
    // integer-exact, so the oracle replays generation AND decode in a
    // recursive CTE (mediaFeatCte). Features project to scalar f0..f7 —
    // integer-valued, so the doubles hash identically in both engines;
    // the array-shaped variant stays covered by MultimodalSpec.
    "q37_media_features" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeMedia(s, 200)
      val feats = operators.Multimodal.extractFeatures(media).toDF()
      val fcols = (0 until 8).map(i =>
        element_at(col("features"), i + 1).cast("double").as(s"f$i"))
      feats.select(col("media_id") +: col("kind") +: fcols: _*)
        .orderBy(col("media_id"))
    }),

    // The codec seam carrying a REAL byte-format decoder (VERDICT r6 #5):
    // synthesizeBmp emits standards-valid uncompressed 24-bit bottom-up
    // BMP files (sha256-chain pixels, stride padding exercised at widths
    // 5/6/7) and decodeBmp PARSES them — magic, little-endian header,
    // row order, padding — inside the same extractFeatures mapPartitions
    // boundary as the stub. The oracle replays the pixel-generation
    // formula, never the parser: any misread header field, flipped row
    // order, or padding slip desyncs the positional feature sums and the
    // hash goes red.
    "q109_bmp_decode" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeBmp(s, 200)
      val feats = operators.Multimodal
        .extractFeatures(media, operators.Multimodal.decodeBmp).toDF()
      val fcols = (0 until 8).map(i =>
        element_at(col("features"), i + 1).cast("double").as(s"f$i"))
      feats.select(col("media_id") +: fcols: _*).orderBy(col("media_id"))
    }),

    // Sobel edge energy over the q109 BMP corpus — the edge/texture
    // quality lane for the image modality: q186's fixed-point luma,
    // then the standard 3×3 Sobel gradients at interior pixels. The
    // oracle replays pixel bytes → luma → a kernel-weighted 3×3
    // neighborhood self-join — a row-order, stride, luma-constant, or
    // kernel-orientation slip desyncs the |gx|/|gy|/positional sums.
    "q191_sobel_edges" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeBmp(s, 200)
      val feats = operators.Multimodal
        .extractFeatures(media, operators.Multimodal.decodeBmpSobel).toDF()
      val fcols = (0 until 8).map(i =>
        element_at(col("features"), i + 1).cast("double").as(s"f$i"))
      feats.select(col("media_id") +: fcols: _*).orderBy(col("media_id"))
    }),

    // The audio-modality counterpart of q109: synthesizeWav emits
    // standards-valid RIFF/WAV PCM files (sha256-chain samples, sha-
    // derived per-row sample counts and rates so header fields vary) and
    // decodeWav PARSES the chunk list — RIFF magic, fmt validation, data
    // chunk, 16-bit LE sample decode. The oracle replays the sample-
    // generation formula; any chunk-walk, sample-width, or byte-order
    // mistake desyncs the signed/positional sums and the hash goes red.
    "q110_wav_decode" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeWav(s, 200)
      val feats = operators.Multimodal
        .extractFeatures(media, operators.Multimodal.decodeWav).toDF()
      val fcols = (0 until 8).map(i =>
        element_at(col("features"), i + 1).cast("double").as(s"f$i"))
      feats.select(col("media_id") +: fcols: _*).orderBy(col("media_id"))
    }),

    // Walsh–Hadamard spectral fingerprint over the q110 WAV corpus —
    // the audio signature lane: 8 integer-exact ±1-basis coefficients
    // over the first 64 decoded samples (dyadic filter bank; the
    // engine-reproducible stand-in for a float FFT). The oracle
    // replays the sample formula and the popcount sign rule — a
    // sample-order, sign-extension, or window slip desyncs the lanes.
    "q192_wht_fingerprint" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeWav(s, 200)
      val feats = operators.Multimodal
        .extractFeatures(media, operators.Multimodal.decodeWavWht).toDF()
      val fcols = (0 until 8).map(i =>
        element_at(col("features"), i + 1).cast("double").as(s"f$i"))
      feats.select(col("media_id") +: fcols: _*).orderBy(col("media_id"))
    }),

    // The first COMPRESSED format through the codec seam: synthesizePng
    // emits CRC-valid 8-bit RGB PNG files (sha256-chain pixels, row
    // filter type r mod 5 so all five PNG filters are in-gate) and
    // decodePng does the full decode — chunk walk + CRC32, IHDR
    // validation, multi-IDAT zlib inflate, and Sub/Up/Average/Paeth
    // scanline reconstruction. The oracle replays the pixel formula:
    // decoded pixels are independent of the deflate representation, so
    // the compressed layer is round-trip-transparent to the hash gate —
    // any filter-inversion or inflate mistake desyncs the sums.
    "q111_png_decode" -> ((s, d) => {
      val media = operators.Multimodal.synthesizePng(s, 200)
      val feats = operators.Multimodal
        .extractFeatures(media, operators.Multimodal.decodePng).toDF()
      val fcols = (0 until 8).map(i =>
        element_at(col("features"), i + 1).cast("double").as(s"f$i"))
      feats.select(col("media_id") +: fcols: _*).orderBy(col("media_id"))
    }),

    // The second compressed format through the codec seam: synthesizeGif
    // emits standards-valid GIF89a files (sha256-chain pixel indices AND
    // palette bytes, sha-derived dimensions) and decodeGif does the full
    // decode — descriptors, global color table, extension skip, and the
    // variable-width LZW stream. The oracle replays pixel indices and
    // palette lookups: decoded indices are independent of the LZW code
    // sequence that carried them (the q111 round-trip-transparency
    // property), so any bit-unpack, dictionary, or palette mistake
    // desyncs the sums and the hash goes red.
    "q112_gif_decode" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeGif(s, 200)
      val feats = operators.Multimodal
        .extractFeatures(media, operators.Multimodal.decodeGif).toDF()
      val fcols = (0 until 8).map(i =>
        element_at(col("features"), i + 1).cast("double").as(s"f$i"))
      feats.select(col("media_id") +: fcols: _*).orderBy(col("media_id"))
    }),

    // Fourth real decoder through the codec seam: QOI — the op-stream
    // compressed format whose coder is implemented end to end here (no
    // JDK helper exists for it, unlike PNG's Inflater). The synthesized
    // corpus plants genuine run structure via a replayable copy mask,
    // so RUN/INDEX ops are exercised in-gate; the oracle replays the
    // mask rule with one running-max window and the pixel formula.
    "q133_qoi_decode" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeQoi(s, 200)
      val feats = operators.Multimodal
        .extractFeatures(media, operators.Multimodal.decodeQoi).toDF()
      val fcols = (0 until 8).map(i =>
        element_at(col("features"), i + 1).cast("double").as(s"f$i"))
      feats.select(col("media_id") +: fcols: _*).orderBy(col("media_id"))
    }),

    // Sixth real decoder through the codec seam, and the first LOSSY
    // format: baseline JPEG (sequential DCT + Huffman, 4:2:0). The
    // synthesis lattice carries only the four DCT bases whose sampled
    // cosines are ±1/√2, so encode is exactly invertible and the oracle
    // replays the pixel formula — Huffman, zigzag, dequant, IDCT,
    // upsample, and the fixed-point color transform are all under the
    // hash gate (operators/Jpeg.scala scaladoc has the full argument).
    "q171_jpeg_decode" -> ((s, d) => {
      val media = operators.Jpeg.synthesizeJpeg(s, 200)
      val feats = operators.Multimodal
        .extractFeatures(media, operators.Jpeg.decodeJpeg).toDF()
      val fcols = (0 until 8).map(i =>
        element_at(col("features"), i + 1).cast("double").as(s"f$i"))
      feats.select(col("media_id") +: fcols: _*).orderBy(col("media_id"))
    }),

    // REAL resize through the BMP codec: parse → nearest-neighbor
    // resample to 7×6 (source dims 4-8 per side, so up- AND down-
    // sampling are both in-gate) → RE-ENCODE as a valid BMP → decodeBmp
    // the output. The oracle replays the resample mapping over the
    // pixel-generation formula (source pixel of target (x,y) is
    // (⌊x·w/7⌋, ⌊y·h/6⌋)); the encoder's header/stride/row-order is
    // gated because a decode of the encoder's own output feeds the hash.
    "q173_resize" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeBmp(s, 200)
      val resized = operators.Multimodal.resizeBmp(media, 7, 6)
      val feats = operators.Multimodal
        .extractFeatures(resized, operators.Multimodal.decodeBmp).toDF()
      val fcols = (0 until 8).map(i =>
        element_at(col("features"), i + 1).cast("double").as(s"f$i"))
      feats.select(col("media_id") +: fcols: _*).orderBy(col("media_id"))
    }),

    // Center crop through the BMP codec (the resize companion): the
    // 4x4 window at (floor((w-4)/2), floor((h-4)/2)) — always inside
    // the 4-8px sources — re-encoded and re-decoded. The oracle shifts
    // the pixel-formula offsets by the crop anchor; an anchor or
    // row-order slip desyncs the positional sums.
    "q185_center_crop" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeBmp(s, 200)
      val cropped = operators.Multimodal.centerCrop(media, 4, 4)
      val feats = operators.Multimodal
        .extractFeatures(cropped, operators.Multimodal.decodeBmp).toDF()
      val fcols = (0 until 8).map(i =>
        element_at(col("features"), i + 1).cast("double").as(s"f$i"))
      feats.select(col("media_id") +: fcols: _*).orderBy(col("media_id"))
    }),

    // Fixed-point BT.601 grayscale (77/151/28 integer luma, +128 >> 8
    // rounding): the oracle replays the luma formula per pixel; the
    // r>g lane goes identically zero (R=G=B) — itself a gated fact.
    "q186_grayscale" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeBmp(s, 200)
      val gray = operators.Multimodal.toGrayscale(media)
      val feats = operators.Multimodal
        .extractFeatures(gray, operators.Multimodal.decodeBmp).toDF()
      val fcols = (0 until 8).map(i =>
        element_at(col("features"), i + 1).cast("double").as(s"f$i"))
      feats.select(col("media_id") +: fcols: _*).orderBy(col("media_id"))
    }),

    // Orientation augmentation quartet: every image through flip_h /
    // rot90 / rot180 / rot270 (the rotations SWAP dims, so the output
    // stride/padding differs from the input's — in-gate via the decode
    // of the operator's own output). Oracle replays the four coordinate
    // remaps over the pixel formula, one UNION branch per mode.
    "q187_orientations" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeBmp(s, 200)
      val all = Seq("flip_h", "rot90", "rot180", "rot270").map { m =>
        operators.Multimodal
          .extractFeatures(operators.Multimodal.orient(media, m),
            operators.Multimodal.decodeBmp).toDF()
          .withColumn("mode", lit(m))
      }.reduce(_ unionByName _)
      val fcols = (0 until 8).map(i =>
        element_at(col("features"), i + 1).cast("double").as(s"f$i"))
      all.select(col("media_id") +: col("mode") +: fcols: _*)
        .orderBy(col("media_id"), col("mode"))
    }),

    // Bilinear fixed-point resize (the quality path next to q173's NN):
    // align-corners 8-bit fractional mapping, four-neighbor integer
    // blend with +32768 >> 16 rounding, re-encode, decode the output.
    // The oracle replays the whole fixed-point kernel over the pixel
    // formula — a weight, corner-clamp, or rounding slip desyncs sums.
    "q181_resize_bilinear" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeBmp(s, 200)
      val resized = operators.Multimodal.resizeBmpBilinear(media, 7, 6)
      val feats = operators.Multimodal
        .extractFeatures(resized, operators.Multimodal.decodeBmp).toDF()
      val fcols = (0 until 8).map(i =>
        element_at(col("features"), i + 1).cast("double").as(s"f$i"))
      feats.select(col("media_id") +: fcols: _*).orderBy(col("media_id"))
    }),

    // REAL audio resample through the WAV codec: parse → nearest-
    // neighbor resample to 10 kHz (source rates 8000-12080 Hz, so up-
    // AND down-sampling are both in-gate) → RE-ENCODE as a valid WAV →
    // decodeWav the output. The oracle replays the index mapping
    // j → ⌊j·rate/10000⌋ over the sample-generation formula; the
    // encoder's header arithmetic is gated because a decode of the
    // operator's own output feeds the hash (the q173 pattern).
    "q175_audio_resample" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeWav(s, 200)
      val resampled = operators.Multimodal.resampleWav(media, 10000)
      val feats = operators.Multimodal
        .extractFeatures(resampled, operators.Multimodal.decodeWav).toDF()
      val fcols = (0 until 8).map(i =>
        element_at(col("features"), i + 1).cast("double").as(s"f$i"))
      feats.select(col("media_id") +: fcols: _*).orderBy(col("media_id"))
    }),

    // Keyframe extraction over TEMPORALLY-CORRELATED animated GIF
    // (frames share ~75% of pixels via a replayable change mask — the
    // q133 copy-mask rule on the time axis): frame 0 always emits,
    // frame k emits iff ≥35% of pixels changed value vs frame k-1. The
    // oracle replays the mask's max-source rule, the value-diff count,
    // the start times, and the selection — a mask slip, a copy-forward
    // bug, or a threshold off-by-one changes the emitted SET.
    "q188_keyframes" -> ((s, d) => {
      operators.Multimodal.keyframes(
          operators.Multimodal.synthesizeAnimatedGifCorrelated(s, 120),
          minChangedPct = 35).toDF()
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // Inter-frame motion features (scene-change primitive): per
    // consecutive frame pair, channel |Δ| sums, changed-pixel count,
    // and peak per-pixel delta — the signal a smart frame sampler cuts
    // on. The oracle replays both frames' pixel formulas and joins them
    // per (x, y); a frame-pairing or channel-order slip desyncs sums.
    "q180_frame_deltas" -> ((s, d) => {
      operators.Multimodal.frameDeltas(
          operators.Multimodal.synthesizeAnimatedGif(s, 120)).toDF()
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // Peak normalization through the WAV codec: every sample scales by
    // 32767/peak in sign-safe integer arithmetic (magnitude-then-sign —
    // engines disagree on negative integer division, magnitudes don't).
    // The oracle replays peak detection and the exact scaling; the gate
    // decodes the operator's own re-encoded output.
    "q183_gain_normalize" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeWav(s, 200)
      val normed = operators.Multimodal.normalizeGain(media)
      val feats = operators.Multimodal
        .extractFeatures(normed, operators.Multimodal.decodeWav).toDF()
      val fcols = (0 until 8).map(i =>
        element_at(col("features"), i + 1).cast("double").as(s"f$i"))
      feats.select(col("media_id") +: fcols: _*).orderBy(col("media_id"))
    }),

    // Silence trimming through the WAV codec: first/last |s| >= 16384
    // scan, inclusive span kept, re-encode, decode the output. The
    // threshold halves the per-sample survival odds, so most files trim
    // a few samples from each end and some trim none — both regimes
    // in-gate. The oracle replays the span scan, the re-indexed
    // positional lane, and the zero-crossing lag over the KEPT span.
    "q182_silence_trim" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeWav(s, 200)
      val trimmed = operators.Multimodal.trimSilence(media, 16384)
      val feats = operators.Multimodal
        .extractFeatures(trimmed, operators.Multimodal.decodeWav).toDF()
      val fcols = (0 until 8).map(i =>
        element_at(col("features"), i + 1).cast("double").as(s"f$i"))
      feats.select(col("media_id") +: fcols: _*).orderBy(col("media_id"))
    }),

    // REAL frame sampling over animated GIF: decode every frame (each
    // through the full LZW path), build the timeline from the Graphic
    // Control Extension delays, emit the active frame's feature lanes at
    // t = 0, 50, 100, … ms. The oracle replays frame pixels, palette
    // lookups, AND the delay/cumulative-start arithmetic — a GCE
    // misparse, a frame-boundary walk slip, or an off-by-one in the
    // active-frame rule (start ≤ t, latest wins) all desync the hash.
    "q174_frame_sample" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeAnimatedGif(s, 120)
      operators.Multimodal.frameSample(media, 50).toDF()
        .orderBy(col("media_id"), col("sample_idx"))
    }),

    // S10: SQL text execution through spark.sql over registered views
    "q38_sql_text" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT o_orderpriority, count(*) AS n, max(o_totalprice) AS max_price
              |FROM orders WHERE o_totalprice > 50000
              |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }),

    // C2 family: pad / translate / reverse string functions
    "q39_string_extras" -> ((s, d) => {
      t(s, d, "part").select(col("p_partkey"),
          lpad(col("p_brand"), 12, "*").as("brand_pad"),
          translate(col("p_type"), "aeiou", "AEIOU").as("type_tr"),
          reverse(col("p_name")).as("name_rev"))
        .orderBy(col("p_partkey"))
    }),

    // C14: null-handling scalars (nullif / coalesce / nvl2 shape)
    "q40_null_handling" -> ((s, d) => {
      t(s, d, "customer").select(col("c_custkey"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("NONE")).as("seg_or_none"),
          when(col("c_acctbal") < 0, lit(null).cast("double"))
            .otherwise(col("c_acctbal")).as("bal_nonneg"))
        .orderBy(col("c_custkey"))
    }),

    // A4/C5: array aggregation with scalar projections (collect + sort)
    "q41_array_agg" -> ((s, d) => {
      t(s, d, "orders").groupBy(col("o_custkey"))
        .agg(sort_array(collect_list(col("o_orderpriority"))).as("pr"))
        .select(col("o_custkey"),
          size(col("pr")).cast("long").as("n_prios"),
          element_at(col("pr"), 1).as("first_prio"),
          array_join(col("pr"), ",").as("prio_csv"))
        .orderBy(col("o_custkey"))
    }),

    // C1 family: regex extraction and counting
    "q42_regex" -> ((s, d) => {
      t(s, d, "documents").select(col("doc_id"),
          regexp_extract(col("text"), "(spark|query)", 1).as("first_kw"),
          size(regexp_extract_all(col("text"), lit("spark"), lit(0)))
            .cast("long").as("n_spark"))
        .orderBy(col("doc_id"))
    }),

    // J2: IN-subquery (rewritten to semi join by Catalyst)
    "q43_in_subquery" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders")
      t(s, d, "customer").createOrReplaceTempView("customer")
      s.sql("""SELECT c_custkey, c_name FROM customer
              |WHERE c_custkey IN (SELECT o_custkey FROM orders
              |                    WHERE o_totalprice > 200000)
              |ORDER BY c_custkey""".stripMargin)
    }),

    // F-family: LIKE / NOT LIKE pattern filters
    "q51_like_filter" -> ((s, d) => {
      t(s, d, "part")
        .filter(col("p_name").like("%widget%") && !col("p_type").like("PROMO%"))
        .select(col("p_partkey"), col("p_name"), col("p_type"))
        .orderBy(col("p_partkey"))
    }),

    // A1: conditional aggregation (TPC-H Q12 shape)
    "q52_conditional_agg" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy(col("yr"))
    }),

    // Correlated scalar subquery (TPC-H Q17 shape): items below 50% of
    // their part's average quantity — Catalyst decorrelates to a join
    "q53_correlated_subquery" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
              |FROM lineitem l1
              |WHERE l_quantity < (SELECT 0.5 * avg(l_quantity)
              |                    FROM lineitem l2
              |                    WHERE l2.l_partkey = l1.l_partkey)
              |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    }),

    // A5: exact continuous percentiles (median / p90)
    "q49_percentiles" -> ((s, d) => {
      t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          r4(expr("percentile(l_quantity, 0.5)")).as("median_qty"),
          r4(expr("percentile(l_extendedprice, 0.9)")).as("p90_price"))
        .orderBy(col("l_returnflag"))
    }),

    // A5: statistical aggregates (stddev / variance / correlation)
    "q50_stats" -> ((s, d) => {
      t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          r4(stddev_samp(col("l_extendedprice"))).as("sd_price"),
          r6(var_samp(col("l_discount"))).as("var_disc"),
          r6(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qp"))
        .orderBy(col("l_returnflag"))
    }),

    // A5: explicit GROUPING SETS (beyond rollup/cube)
    "q48_grouping_sets" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS n
              |FROM lineitem
              |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
              |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
        .stripMargin)
    }),

    // J2 gap exemplar: bounded time-range join via bucketing (errors
    // within one hour of a purchase by the same user)
    "q47_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      operators.RangeJoin.withinTolerance(errors, purchases,
          Seq("user_id"), "ts", "ts", toleranceSec = 3600)
        .select(col("user_id"), col("l_event_id").as("error_id"),
          col("r_event_id").as("purchase_id"))
        .orderBy(col("user_id"), col("error_id"), col("purchase_id"))
    }),

    // Similarity scale path: IVF approximate top-k (rows-only: ANN
    // results are approximate by construction; recall is spec-tested)
    "q46_ivf_topk" -> ((s, d) => {
      Similarity.ivfTopK(t(s, d, "embeddings"), "vec_id", "embedding",
          k = 3, cells = 16, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          r6(col("cos")).as("cos"), col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Skew mitigation: two-phase salted aggregation — semantics must be
    // identical to a plain GROUP BY (the oracle IS the plain GROUP BY)
    "q45_salted_agg" -> ((s, d) => {
      operators.Skew.saltedCount(
          t(s, d, "lineitem").select(col("l_returnflag"), col("l_linestatus")),
          Seq("l_returnflag", "l_linestatus"), saltBuckets = 16)
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // A1 + HAVING-shape post-aggregation filter; date scalars
    "q44_having_dates" -> ((s, d) => {
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          date_add(col("o_orderdate").cast("date"), 30).cast("string").as("due_date"),
          datediff(lit("1998-01-01").cast("date"),
            col("o_orderdate").cast("date")).cast("long").as("days_to_98"),
          last_day(col("o_orderdate").cast("date")).cast("string").as("month_end"),
          quarter(col("o_orderdate")).cast("long").as("qtr"))
        .orderBy(col("o_orderkey"))
    }),

    // A1 + true HAVING: post-aggregation filter on an aggregate value
    // (TPC-H Q11 shape). The filter references the rounded alias so both
    // engines cut on bit-identical values.
    "q54_having" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(r2(sum(col("o_totalprice"))).as("total_spent"),
          count(lit(1)).as("n_orders"))
        .filter(col("total_spent") > 3000000.0)
        .orderBy(col("o_custkey"))
    }),

    // Multimodal + vector dedup composed: near-identical media via
    // feature extraction then LSH-bucketed cosine. Hash-gated: the
    // oracle replays features via mediaFeatCte and brute-forces the
    // cosine threshold — equal to the LSH path because every >= 0.99
    // pair here is a planted near-dup at cos ~ 1-2e-7 (identical band
    // signatures), and the exact rescoring filter discards everything
    // else on both sides.
    "q56_media_neardup" -> ((s, d) => {
      // The near-dup plan references the vector side three times (band
      // signatures + one re-join per pair side); materialize the
      // synthetic fixture once so the sha256-chain generation tree is
      // planned and codegen'd once, not per branch.
      val media = operators.Multimodal.synthesizeMedia(s, 200).localCheckpoint()
      operators.Multimodal.mediaNearDupPairs(media, threshold = 0.99)
        .select(col("id_a"), col("id_b"), r6(col("cos")).as("cos"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // A5: approx percentile — the 100-TB default (mergeable sketch, no
    // per-group sort). Sketch outputs are engine-specific, so the hard
    // gate leans on accuracy 1e6 making the approx answer exact at sf
    // scale; the oracle is DuckDB quantile_disc. The oracle equivalence
    // additionally assumes tie-heavy data (l_quantity is 1..50 integers,
    // so both engines' discrete-quantile picks land on the same value);
    // PercentileSpec pins approx_percentile(1e6) == Spark's exact
    // percentile_approx-free median on this data, and asserts the
    // rank-error bound at low accuracy.
    "q55_approx_percentiles" -> ((s, d) => {
      t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          r4(expr("approx_percentile(l_quantity, 0.5, 1000000)")
            .cast("double")).as("median_qty_approx"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // Curation: deterministic train/val/test split + seeded corpus
    // shuffle — both content-hash-based (sha256), so membership and
    // order are reproducible across engines, retries, and repartitions
    // (unlike rand(seed)). Scale shape: pure projection; the final
    // ORDER BY is a range-partitioned sort, no global row numbering.
    "q57_hash_split" -> ((s, d) => {
      t(s, d, "documents").select(col("doc_id"),
          operators.Curation.hashSplit(col("doc_id"), "split:42").as("split"),
          operators.Curation.shuffleKey(col("doc_id"), "shuffle:42")
            .as("shuffle_key"))
        .orderBy(col("shuffle_key"))
    }),

    // Feature-hashed document vectors (the hashing trick, Weinberger
    // et al. 2009): fixed 64-dim signed-hash vectors with no
    // vocabulary and no fit pass — the text→vector bridge into the
    // ANN/clustering column. One map-only pass (tokens never cross a
    // shuffle); the oracle replays tokenization, the 48-bit sha
    // prefix, dim/sign extraction, the signed sums, the ordered-CSV
    // serialization, and the norm.
    "q194_feature_hash" -> ((s, d) => {
      operators.Embeddings.featureHashVectors(t(s, d, "documents"),
          "doc_id", "text", dims = 64)
        .orderBy(col("doc_id"))
    }),

    // Group-aware K-fold split via snake draft (GroupKFold): whole
    // sources land in one fold — the leakage-preventing CV split —
    // while boustrophedon filling keeps fold sizes balanced. The
    // window runs over the 20-source census, never corpus rows; the
    // oracle replays size-desc-hash ranking and the zig-zag rule.
    "q204_group_folds" -> ((s, d) => {
      operators.Curation.groupKFolds(
          t(s, d, "documents").select(col("doc_id"), col("source")),
          "source", k = 4)
        .select(col("doc_id"), col("source"), col("fold"))
        .orderBy(col("doc_id"))
    }),

    // Timeline frame sampling over the AVI lane — the q174 contract on
    // the strh timebase (equal-length frames, so the GIF edition's
    // variable-delay cursor degenerates to a division); everyMs = 77 is
    // deliberately coprime to the 100 ms tick so sample→frame mapping
    // exercises non-aligned instants. Decode runs once per SAMPLED
    // frame, map-only.
    "q210_avi_frame_sample" -> ((s, d) => {
      val media = operators.Avi.synthesizeAviMjpeg(s, 60)
      operators.Avi.frameSample(media, 77).toDF()
        .orderBy(col("media_id"), col("sample_idx"))
    }),

    // k-NN-graph label densification — the curation read of q205's
    // graph: each vector's predicted label is the majority vote of its
    // NN-Descent neighbors' TRUE labels ((votes desc, label) winner),
    // with the agreement flag against its own label — the k-NN
    // classifier error estimate a curation run reports before trusting
    // propagated labels. The oracle replays the whole construction
    // plus the vote.
    "q211_knn_label_spread" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val knn = Similarity.nnDescentKnn(emb, "vec_id", "embedding",
        k = 8, cells = 16, rounds = 2)
      val lbl = emb.select(col("vec_id").as("neighbor_id"),
        col("label").cast("long").as("nlbl"))
      val votes = knn.join(lbl, Seq("neighbor_id"))
        .groupBy(col("query_id"), col("nlbl"))
        .agg(count(lit(1)).as("votes"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("votes").desc, col("nlbl"))
      val pred = votes.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("query_id").as("vec_id"),
          col("nlbl").as("pred_label"), col("votes"))
      emb.select(col("vec_id"), col("label").cast("long").as("true_label"))
        .join(pred, Seq("vec_id"))
        .select(col("vec_id"), col("true_label"), col("pred_label"),
          col("votes"),
          (col("true_label") === col("pred_label")).cast("long").as("agree"))
        .orderBy(col("vec_id"))
    }),

    // Harmonic centrality from HyperBall's registers (Boldi & Vigna
    // 2014) — the per-node read of the q145 sketch: H(v) =
    // Σ (|B(v,t)|−|B(v,t−1)|)/t over the same lineitem co-order graph,
    // ball sizes as micro-floored HLL estimates and 1/t weights scaled
    // by lcm(1..3)=6 so the accumulation is exact longs. The oracle
    // replays per-node BFS balls + register estimates (the q145
    // machinery, per-node edition).
    "q209_harmonic_centrality" -> ((s, d) => {
      import graft.operators.Graphs
      val li = t(s, d, "lineitem").filter(col("l_linenumber") <= 2)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val pairs = li.alias("a").join(li.alias("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").as("u"), col("b.p").as("v"))
        .distinct()
      val edges = pairs.select(col("u").as("src"), col("v").as("dst"))
        .unionByName(pairs.select(col("v").as("src"), col("u").as("dst")))
      Graphs.harmonicCentrality(edges, rounds = 3, p = 6)
        .orderBy(col("v"))
    }),

    // MJPEG-in-AVI — the first VIDEO modality through the codec seam:
    // a RIFF('AVI ') container whose 'movi' list carries one complete
    // JFIF per '00dc' chunk. Frame f of video v is the q171 lattice
    // JPEG at derived id v·100+f, so the oracle replays per-frame
    // pixels with the UNCHANGED q171 formula over derived ids — the
    // container walk (fourccs, sizes, strh timebase, idx1 offsets) and
    // the whole JPEG path sit under the hash gate; t_ms comes from the
    // validated strh scale/rate tick.
    "q208_mjpeg_avi" -> ((s, d) => {
      val media = operators.Avi.synthesizeAviMjpeg(s, 60)
      val feats = operators.Avi.frameFeatures(media).toDF()
      val fcols = (0 until 8).map(i =>
        element_at(col("features"), i + 1).cast("double").as(s"f$i"))
      feats.select(Seq(col("media_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("t_ms").cast("long").as("t_ms")) ++ fcols: _*)
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // INTERLEAVED audio+video AVI (VERDICT r11 #4): a second 'auds'
    // stream of '01wb' PCM chunks rides the frame-major interleave
    // (00dc_f immediately followed by the 100 ms audio window 01wb_f),
    // and the output is A/V-ALIGNED per-frame features — the 8 JPEG
    // lanes plus the 8 q110 audio lanes of the frame's sample window,
    // joined on the shared strh timeline. Zero new decode math: frame
    // pixels replay under the q171 formula at derived id v·100+f, the
    // audio window under the q110 sample formula re-tagged
    // ('42:avia:v:f:k'). The walker validates BOTH strh chains, the
    // strict interleave order, window sizing against the timebases,
    // and the two-chain idx1.
    "q217_av_avi" -> ((s, d) => {
      val media = operators.Avi.synthesizeAviAv(s, 60)
      val feats = operators.Avi.avFrameFeatures(media).toDF()
      val vcols = (0 until 8).map(i =>
        element_at(col("vfeatures"), i + 1).cast("double").as(s"f$i"))
      val acols = (0 until 8).map(i =>
        element_at(col("afeatures"), i + 1).cast("double").as(s"a$i"))
      feats.select(Seq(col("media_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("t_ms").cast("long").as("t_ms")) ++ vcols ++ acols: _*)
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // Unigram-LM (SentencePiece-class) tokenizer training (VERDICT r11
    // #5): fixed substring-candidate census, 2 hard-EM iterations with
    // the integer-only log2lin scaled weights and the max-plus
    // prefix-doubling Viterbi (total-order tie-break on
    // (score, −pieces, −cutmask)). The gated rows pin the census, the
    // weight formula, and every E-step's segmentation counts.
    "q218_unigram_learn" -> ((s, d) => {
      operators.Unigram.learn(t(s, d, "documents"), "text")
        .orderBy(col("iter"), col("piece"))
    }),

    // The apply side: per-source tokenization stats under the learned
    // unigram-LM weights — the q122 analog for the EM tokenizer
    // family (words / chars / pieces, occurrence-weighted: the
    // compression the learned vocabulary buys on each source).
    "q219_unigram_encode" -> ((s, d) => {
      operators.Unigram.encodeStats(t(s, d, "documents"), "text",
          "source")
        .orderBy(col("source"))
    }),

    // The SentencePiece loop's THIRD phase: prune the EM-fitted
    // vocabulary to all single chars + the top keepN multi-char
    // pieces by EM count (the deterministic stand-in for
    // likelihood-loss pruning — hard-EM counts ARE each piece's
    // segmentation contribution), then re-fit under weights
    // renormalized over the survivors. Gated per ORIGINAL candidate:
    // kept flag, pre-prune count, post-prune re-fit count (pruned
    // pieces' mass flows to survivors).
    "q220_unigram_prune" -> ((s, d) => {
      operators.Unigram.pruneStats(t(s, d, "documents"), "text",
          keepN = 8)
        .orderBy(col("piece"))
    }),

    // CCNet end to end (Wenzek et al. 2020; VERDICT r12 #1): unigram-LM
    // vocabulary learned on the clean src0 slice, the whole corpus
    // Viterbi-encoded into pieces under it, Stupid Backoff trained on
    // src0's piece bigrams scoring every doc, head/middle/tail buckets
    // PER SOURCE at fixed percentile cuts — the piece-LM quality filter
    // the word-level q142/q167 lanes approximate.
    "q221_ccnet_filter" -> ((s, d) => {
      operators.Unigram.ccnetBuckets(t(s, d, "documents"), "doc_id",
          "text", "source", "src0", r4, buckets = 3)
        .orderBy(col("doc_id"))
    }),

    // Ranked-retrieval quality of the IVF tier against brute-force
    // ground truth — recall@10, MRR, nDCG@10 per query as a QUERY, not
    // a spec (index quality per configuration is something a user runs
    // before picking nprobe/cells). All three metrics are ratios of
    // exact integers (integer DCG weights — the tie-aware-AUC rule),
    // so the oracle replays them bit-for-bit on top of the q26 + q46
    // ranking fragments.
    "q207_ann_quality" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val truth = Similarity.bruteForceTopK(emb, emb, "vec_id",
        "embedding", k = 10)
      val ann = Similarity.ivfTopK(emb, "vec_id", "embedding",
        k = 10, cells = 16, nprobe = 2)
      operators.Retrieval.rankingQuality(truth, ann, k = 10)
        .select(col("query_id"), r6(col("recall_k")).as("recall_k"),
          r6(col("mrr")).as("mrr"), r6(col("ndcg_k")).as("ndcg_k"))
        .orderBy(col("query_id"))
    }),

    // Isotonic (PAVA) score calibration via the minimax identity
    // (Robertson/Wright/Dykstra Thm 1.4.4) — the least-squares
    // NON-DECREASING map from a raw score to P(label): score = token
    // count, label = the document contains the token 'the' (longer
    // docs more likely — a genuinely increasing relationship with
    // non-monotone noise for PAVA to pool). Iteration-free and
    // bit-replayable: every candidate is one IEEE division of exact
    // integer prefix sums; min/max over doubles is order-independent.
    "q213_isotonic_calibration" -> ((s, d) => {
      import graft.functions.TextFunctions
      val toks = TextFunctions.tokens(
        TextFunctions.normalizeWs(col("text")))
      val scored = t(s, d, "documents").select(
        size(toks).cast("long").as("s"),
        array_contains(toks, "the").cast("long").as("y"))
      operators.Curation.isotonicCalibrate(scored, "s", "y")
        .select(col("s"), col("n"), col("pos"), r6(col("cal")).as("cal"))
        .orderBy(col("s"))
    }),

    // Ranked-retrieval quality of the NN-DESCENT tier — q207's metric
    // lane pointed at the graph-ANN index, so both ANN families carry
    // an oracle-gated quality report (recall@8 / MRR / nDCG@8 vs
    // brute-force truth, all exact-integer ratios). Together with q207
    // this is "index quality per configuration" as a first-class
    // query, not a spec.
    "q212_nndescent_quality" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val truth = Similarity.bruteForceTopK(emb, emb, "vec_id",
        "embedding", k = 8)
      val ann = Similarity.nnDescentKnn(emb, "vec_id", "embedding",
        k = 8, cells = 16, rounds = 2)
      operators.Retrieval.rankingQuality(truth, ann, k = 8)
        .select(col("query_id"), r6(col("recall_k")).as("recall_k"),
          r6(col("mrr")).as("mrr"), r6(col("ndcg_k")).as("ndcg_k"))
        .orderBy(col("query_id"))
    }),

    // Graph-ANN SERVING search (VERDICT r11 #1): out-of-corpus query
    // vectors (vec_id % 13 = 0, held out of the graph build) route
    // through a deterministic beam walk over the NN-Descent graph —
    // sha-ordered ":ivf" entry points, 2 candidates→rescore→top-beam
    // steps, rank ≤ k of the final beam. The HNSW query side to q205's
    // batch construction; per-query cost is beam·(2k)·steps candidate
    // rows, independent of corpus size.
    "q214_graph_ann_search" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val corpus = emb.filter(col("vec_id") % 13 =!= 0)
      val qs = emb.filter(col("vec_id") % 13 === 0)
      val graph = Similarity.nnDescentKnn(corpus, "vec_id", "embedding",
        k = 8, cells = 16, rounds = 2)
      Similarity.nnDescentSearch(graph, corpus, "vec_id", "embedding",
          qs, "vec_id", "embedding", k = 8, cells = 16, beam = 8,
          steps = 2)
        .select(col("query_id"), col("neighbor_id"),
          r6(col("cos")).as("cos"), col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Walk-vs-brute ranking quality for the serving search — the q207
    // exact-integer metric lane pointed at the beam walk, so the
    // serving tier carries the same per-configuration quality report
    // as both index builds (recall@8 / MRR / nDCG@8 against
    // brute-force truth over the held-out queries).
    "q215_graph_search_quality" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val corpus = emb.filter(col("vec_id") % 13 =!= 0)
      val qs = emb.filter(col("vec_id") % 13 === 0)
      val truth = Similarity.bruteForceTopK(qs, corpus, "vec_id",
        "embedding", k = 8)
      val graph = Similarity.nnDescentKnn(corpus, "vec_id", "embedding",
        k = 8, cells = 16, rounds = 2)
      val walk = Similarity.nnDescentSearch(graph, corpus, "vec_id",
        "embedding", qs, "vec_id", "embedding", k = 8, cells = 16,
        beam = 8, steps = 2)
      operators.Retrieval.rankingQuality(truth, walk, k = 8)
        .select(col("query_id"), r6(col("recall_k")).as("recall_k"),
          r6(col("mrr")).as("mrr"), r6(col("ndcg_k")).as("ndcg_k"))
        .orderBy(col("query_id"))
    }),

    // HIERARCHICAL serving search (VERDICT r12 #2) — HNSW's log-n
    // routing over the q214 walk: hash-geometric levels (4^-l layer
    // membership as a pure id predicate), one NN-Descent graph per
    // layer, descent from the top layer's single sha-min entry through
    // narrow upper-layer walks into the full layer-0 beam walk. The
    // oracle replays every layer build, every descent step, and the
    // final walk; recall >= the flat-entry q214 walk is spec-gated.
    "q222_hnsw_search" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val corpus = emb.filter(col("vec_id") % 13 =!= 0)
      val qs = emb.filter(col("vec_id") % 13 === 0)
      Similarity.hnswSearch(corpus, "vec_id", "embedding", qs, "vec_id",
          "embedding", k = 8, knnK = 8, cells = 16, rounds = 2, beam = 8,
          steps = 2, maxLevel = 2, upperBeam = 2, upperSteps = 2)
        .select(col("query_id"), col("neighbor_id"),
          r6(col("cos")).as("cos"), col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Walk-vs-brute ranking quality for the HIERARCHICAL search — the
    // q215 report pointed at the q222 descent, so the layered tier
    // carries the same per-configuration quality evidence as the flat
    // walk (recall@8 / MRR / nDCG@8 against brute-force truth); the
    // >= flat-entry-recall-at-equal-budget law is spec-gated.
    "q226_hnsw_quality" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val corpus = emb.filter(col("vec_id") % 13 =!= 0)
      val qs = emb.filter(col("vec_id") % 13 === 0)
      val truth = Similarity.bruteForceTopK(qs, corpus, "vec_id",
        "embedding", k = 8)
      val walk = Similarity.hnswSearch(corpus, "vec_id", "embedding",
        qs, "vec_id", "embedding", k = 8, knnK = 8, cells = 16,
        rounds = 2, beam = 8, steps = 2, maxLevel = 2, upperBeam = 2,
        upperSteps = 2)
      operators.Retrieval.rankingQuality(truth, walk, k = 8)
        .select(col("query_id"), r6(col("recall_k")).as("recall_k"),
          r6(col("mrr")).as("mrr"), r6(col("ndcg_k")).as("ndcg_k"))
        .orderBy(col("query_id"))
    }),

    // VIDEO-to-video near-dup (VERDICT r12 #3): per-frame dHash
    // sequences (the q118 perceptual hash over q208's decoded frames),
    // banded frame-hash candidates, Hamming verify, then temporal
    // alignment — matched frames vote for their offset and the pair
    // reports iff the best offset's support covers >= 80% of the
    // shorter video (the q135 containment rule on the time axis).
    // The fixture plants clipped sub-videos (offset +1) and full
    // duplicates (offset 0); the oracle replays pixels -> luma ->
    // cross-multiplied dHash cells -> bands -> join -> vote -> cut.
    "q223_video_neardup" -> ((s, d) => {
      val media = operators.Avi.synthesizeAviNearDup(s, 40)
      operators.Avi.videoNearDupPairs(media, maxHamming = 6,
          minOverlapPct = 80)
        .orderBy(col("video_a"), col("video_b"))
    }),

    // Audio spectral fingerprint (VERDICT r12 #4): fixed-point 64-
    // sample DFT bin energies (integer accumulators, the basis table
    // stamped identically into engine and oracle), Haitsma-Kalker
    // adjacent-bin-compare bits -> one 16-bit print per window. The
    // gated row IS the print, so the whole sample->energy->bit chain
    // replays.
    "q224_audio_fingerprint" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeWavNearDup(s, 40)
      operators.Multimodal.audioFingerprint(media).toDF()
        .select(col("media_id"),
          col("window_idx").cast("long").as("window_idx"),
          col("fp").cast("long").as("fp"))
        .orderBy(col("media_id"), col("window_idx"))
    }),

    // ... and the q223 containment rule on the audio axis: banded
    // print candidates (4-bit nibbles), Hamming verify, offset vote,
    // >= 80% of the shorter audio — clipped and full audio copies
    // surface with their true window offsets.
    "q225_audio_neardup" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeWavNearDup(s, 40)
      operators.Multimodal.audioNearDupPairs(media, maxHamming = 2,
          minOverlapPct = 80)
        .orderBy(col("audio_a"), col("audio_b"))
    }),

    // Span-level decontamination at L = 16 — the exact-form upgrade of
    // q61's n-gram overlap: corpus positions whose 16-token window
    // also occurs in the eval partition (doc_id % 7 = 0, the held-out
    // benchmark stand-in) mark and island-merge into maximal
    // contaminated spans; no canonical-keeper exemption (every corpus
    // occurrence of eval text marks). Prefix-doubling equality ranks
    // over the corpus ∪ eval union — the q172 machinery pointed across
    // corpora. The oracle replays true window equality with the gram
    // string as identity.
    "q206_span_decontaminate" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.operators.SuffixDedup.spanDecontaminate(
          docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0),
          "doc_id", "text", 16)
        .orderBy(col("doc_id"))
    }),

    // NN-Descent k-NN-graph construction (Dong et al. 2011) — the
    // graph-ANN tier above IVF/PQ: iterated neighbor-of-neighbor
    // refinement from an IVF-cell ring init, every step deterministic
    // (sha-ordered ring, (cos desc, id) keeps). The oracle replays the
    // centroid sample, the cell assignment, the ring, and both
    // refinement rounds; recall vs bruteForceTopK is spec-gated.
    "q205_nndescent_knn" -> ((s, d) => {
      Similarity.nnDescentKnn(t(s, d, "embeddings"), "vec_id", "embedding",
          k = 8, cells = 16, rounds = 2)
        .select(col("query_id"), col("neighbor_id"),
          r6(col("cos")).as("cos"), col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // T5 span corruption (Raffel et al. 2020): deterministic masked
    // runs leave the input as sentinel-keyed gaps and collect into
    // the target — the denoising-objective layout next to q176's FIM.
    // The oracle replays seeds, span lengths, the δ ∈ {0,1,2} overlap
    // rule, the gaps-and-islands run numbering, and BOTH reconstructed
    // strings.
    "q202_span_corruption" -> ((s, d) => {
      operators.Curation.spanCorruption(t(s, d, "documents"),
          "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Exact tie-aware per-source ROC AUC (Mann–Whitney rank-sum) of
    // the n_chars signal predicting lang = 'en' — the evaluation
    // metric a scored gate reports per source before trusting its
    // threshold. Integer pair (u2, 2·n_pos·n_neg) under the hash; the
    // r6 AUC rides alongside. Tie-rich by construction (n_chars
    // collides constantly), so the ½-credit convention is in-gate.
    "q201_rank_auc" -> ((s, d) => {
      operators.Profiling.rankAuc(t(s, d, "documents"),
          "source", "n_chars", col("lang") === "en")
        .select(col("source"), col("n_pos"), col("n_neg"), col("u2"),
          when(col("n_pos") > 0 && col("n_neg") > 0,
            r6(col("u2").cast("double")
              / (col("n_pos") * col("n_neg") * 2).cast("double")))
            .as("auc"))
        .orderBy(col("source"))
    }),

    // Interpolated Kneser–Ney bigram probabilities as EXACT integer
    // rationals (d = 3/4): the classic LM smoothing with continuation
    // counts, every probability a ratio of two integers so the model
    // replays bit-for-bit. Top-30 bigrams by count with (numer,
    // denom); the unity law Σ_w2 numer = denom is spec-gated.
    "q200_kneser_ney" -> ((s, d) => {
      operators.Perplexity.kneserNeyBigrams(t(s, d, "documents"),
        "doc_id", "text", topK = 30)
    }),

    // Cross-source quantile normalization of the n_chars score — the
    // calibration step before mixing incomparable per-source quality
    // scores: each row's score becomes the GLOBAL score at its
    // within-source midpoint quantile (integer rule, exact). One
    // source-keyed window exchange + a distinct-score histogram
    // broadcast as one row; the oracle replays rank, histogram, and
    // the min-v threshold lookup per row.
    "q198_quantile_normalize" -> ((s, d) => {
      operators.Curation.quantileNormalize(t(s, d, "documents"),
          "source", "n_chars", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Brute-force cosine top-k over the q194 HASHED vectors — the
    // bridge demo end to end: text → hashing-trick vectors → ANN
    // baseline, no trained embedder anywhere. Query side (doc_id %
    // 50 = 0) broadcasts (the q26 contract); dot products and norms
    // are integer-exact, sqrt/divide IEEE-identical in both engines,
    // ranking on the unrounded cosine, r6 only in the report.
    "q199_hashed_cosine_topk" -> ((s, d) => {
      import graft.operators.Embeddings
      import org.apache.spark.sql.expressions.Window
      val vecs = Embeddings.featureHashArrays(t(s, d, "documents"),
          "doc_id", "text", dims = 64)
        .filter(col("norm2") > 0)
        .localCheckpoint() // built once, read by both sides of the join
      val queries = vecs.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("query_id"), col("vec").as("qv"),
          col("norm2").as("qn"))
      val cand = vecs
        .select(col("doc_id").as("neighbor_id"), col("vec").as("dv"),
          col("norm2").as("dn"))
        .crossJoin(broadcast(queries))
        .filter(col("neighbor_id") =!= col("query_id"))
        // one fused codegen pass over the 500k candidate pairs instead
        // of the interpreted zip_with/aggregate chain (optimization r13,
        // the LongDot kernel; same long arithmetic, hash-identical)
        .withColumn("dot",
          graft.expressions.LongDot(col("qv"), col("dv")))
        .withColumn("cos", col("dot").cast("double")
          / sqrt((col("qn") * col("dn")).cast("double")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      cand.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), r6(col("cos")).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // EXACT-proportion stratified split: q57's hashSplit holds 80/10/10
    // only in expectation; this guarantees ⌊n·pct/100⌋ per source via a
    // within-stratum (hash, id) rank — one stratum-keyed window
    // exchange, never a global sort. The oracle replays rank, count,
    // and both floor-division thresholds.
    "q193_exact_split" -> ((s, d) => {
      operators.Curation.exactStratifiedSplit(t(s, d, "documents"),
          "source", "doc_id", "xsplit:42", pctTrain = 80, pctVal = 10)
        .select(col("doc_id"), col("source"), col("split"))
        .orderBy(col("doc_id"))
    }),

    // Curation: context-window chunking — one row per 64-token window
    // with half-open offsets. Narrow explode inside codegen; no shuffle.
    "q58_token_chunks" -> ((s, d) => {
      operators.Curation.tokenChunks(t(s, d, "documents"),
          "doc_id", "text", windowTokens = 64)
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // Gopher-style repetition filter: type-token ratio + distinct-2-gram
    // fraction, cut into a drop flag. Pure per-row array math (no explode,
    // no shuffle) — catches WITHIN-document repetition that cross-document
    // dedup can't see.
    "q60_repetition" -> ((s, d) => {
      val st = TextAnalysis.repetitionStats(col("text"))
      t(s, d, "documents")
        .select(col("doc_id"),
          st.getField("n_tok").as("n_tok"),
          st.getField("n_uniq_tok").as("n_uniq_tok"),
          st.getField("ttr").as("ttr"),
          st.getField("uniq_2gram_frac").as("uniq_2gram_frac"),
          (st.getField("ttr") < 0.3 ||
            st.getField("uniq_2gram_frac") < 0.55).as("is_repetitive"))
        .orderBy(col("doc_id"))
    }),

    // Curation: weighted source mixture — keep 100% of boosted sources,
    // 75% of other English, 25% of the rest, via a per-row hash cut.
    // Pure filter: no per-source counts, no shuffle, uniform-in-source.
    "q59_source_mixture" -> ((s, d) => {
      val weight = when(col("source").isin("src0", "src1", "src2"),
          lit(operators.Curation.KeepAll))
        .when(col("lang") === "en", lit("c0"))
        .otherwise(lit("40"))
      operators.Curation.weightedMixture(t(s, d, "documents"),
          col("doc_id"), weight, "mix:42")
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Curation: benchmark decontamination — flag every train-split doc
    // that shares a word 3-gram with the test split (the eval set). The
    // benchmark's distinct grams broadcast (hash table built once per
    // task); the corpus explodes map-side into that join and hit counts
    // partial-aggregate before the only shuffle. Runs the hashed scale
    // path (native single-pass gram hashing): the output is COUNTS, which
    // are hash-invariant, so the string-based DuckDB oracle still gates
    // it exactly (modulo 2^-64 hash collisions); hashed≡string is also
    // pinned in CurationSpec.
    "q61_decontamination" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val split = operators.Curation.hashSplit(col("doc_id"), "split:42")
      operators.Curation.contaminationStats(
          docs.filter(split === "train"), docs.filter(split === "test"),
          "doc_id", "text", n = 3)
        .orderBy(col("doc_id"))
    }),

    // Text analysis: corpus-wide boilerplate 3-grams — document frequency
    // of per-doc-distinct grams, top 100. Grams dedup inside each row
    // before the explode (no countDistinct expand); one hash-agg shuffle
    // with map-side partials; the top-k plans as TakeOrderedAndProject.
    "q62_boilerplate_ngrams" -> ((s, d) => {
      TextAnalysis.boilerplateNgrams(t(s, d, "documents"), "text",
        n = 3, topK = 100)
    }),

    // The full curation pipeline end-to-end: annotate (language ID +
    // quality + repetition, two native single-pass expressions) → filter
    // → fingerprint dedup (keep min doc per normalized-content hash) →
    // deterministic hash split → per-(split, source) corpus stats. Every
    // per-doc signal computes in ONE map pass over the scan; the only
    // wide stages are the dedup group and the final stats aggregate. The
    // oracle composes the proven q29/q60/q57 SQL fragments and dedups on
    // the normalized text itself (identical groups to the xxhash64
    // fingerprint modulo collisions).
    "q63_curation_pipeline" -> ((s, d) => {
      val st = TextAnalysis.repetitionStats(col("text"))
      val annotated = t(s, d, "documents").select(
        col("doc_id"), col("source"), col("text"),
        TextAnalysis.languageId(col("text")).as("lang_pred"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        st.getField("ttr").as("ttr"),
        st.getField("uniq_2gram_frac").as("u2"))
      val kept = annotated.filter(col("lang_pred") =!= "und" &&
        col("quality") >= 0.7 && col("ttr") >= 0.3 && col("u2") >= 0.55)
      operators.Dedup.byFingerprint(kept, "doc_id", "text")
        .select(col("source"), col("quality"),
          operators.Curation.hashSplit(col("doc_id"), "split:42").as("split"))
        .groupBy(col("split"), col("source"))
        // avg over exact scaled integers, not doubles: quality sits on a
        // 1e-4 grid, so a group mean can land EXACTLY on the r4 floor
        // boundary — there Spark's partition-order sum and the oracle's
        // sum differ by an ulp and round opposite ways (bit sf0.1).
        // round(quality*1e4) is an exact long in both engines; dividing
        // identical exact sums makes the r4 input bit-identical.
        .agg(count(lit(1)).as("n_docs"),
          r4(sum(round(col("quality") * 10000).cast("long")) /
            (count(lit(1)) * 10000.0)).as("avg_quality"))
        .orderBy(col("split"), col("source"))
    }),

    // C4-style line-level dedup, exercised for real: every doc is wrapped
    // in a shared boilerplate header + footer line (tokens chosen outside
    // the corpus vocabulary so no raw text can collide with them), so the
    // operator must (a) flag exactly those two lines as cross-doc
    // frequent, (b) strip them from every doc, (c) reassemble the unique
    // middle line — i.e. the hash-gated expectation is the ORIGINAL text.
    // Docs whose normalized text duplicates another doc's lose their
    // middle line too and drop out entirely; the oracle mirrors that
    // exactly. Internal newlines are flattened to spaces on BOTH sides
    // first, so the single-middle-line roundtrip is well-defined on any
    // corpus (a raw multi-line doc sharing a blank/repeated inner line
    // across docs would otherwise dedup engine-side only).
    "q64_line_dedup" -> ((s, d) => {
      val wrapped = t(s, d, "documents").select(col("doc_id"),
        concat_ws("\n", lit("### subscribe-to-our-newsletter ###"),
          regexp_replace(col("text"), "\n", " "),
          lit("### all-rights-reserved ###")).as("text"))
      TextAnalysis.lineDedup(wrapped, "doc_id", "text", minDocs = 2)
        .orderBy(col("doc_id"))
    }),

    // Connected components over the MinHash near-dup graph: every doc in
    // a dup pair labeled with the minimum doc id reachable through the
    // graph (the exact-cluster semantics minhashDedup approximates).
    // Oracled via a DuckDB RECURSIVE transitive closure over the
    // exact-Jaccard pair set — which re-verifies the LSH pair generation
    // AND the iterative label propagation in one gate.
    "q65_dup_clusters" -> ((s, d) => {
      val pairs = operators.Dedup.minhashDupPairs(t(s, d, "documents"),
        "doc_id", "text")
      operators.Dedup.connectedComponents(pairs).orderBy(col("id"))
    }),

    // Embedding hygiene: per-vector L2 norm, symmetric int8 quantization
    // (scale + first components) and the max dequantization error. Pure
    // map-side double math; half-up rounding (floor(x+0.5)) keeps the
    // quantized grid reproducible across engines, unlike rint's
    // half-even.
    "q66_embedding_quantize" -> ((s, d) => {
      // quantStats fuses norm + quantize + error into one codegen'd pass;
      // the declarative composition re-ran its interpreted HOF chain once
      // per consuming column after projection collapse (~0.65 ms/row).
      val qz = operators.Embeddings.quantStats(col("embedding"))
      t(s, d, "embeddings")
        .select(col("vec_id"), qz.as("qz"))
        .select(col("vec_id"),
          r6(col("qz.norm")).as("norm"),
          r6(col("qz.scale")).as("scale"),
          col("qz.q")(0).cast("long").as("q0"),
          col("qz.q")(1).cast("long").as("q1"),
          r6(col("qz.max_err")).as("max_err"))
        .orderBy(col("vec_id"))
    }),

    // Batch sessionization — the batch twin of streaming/Sessionize:
    // gap > 30 min cuts a new session per user (lag + running sum over
    // one window partition), then per-session stats. Gap math is in
    // microseconds on both engines (unix_micros / epoch_us both
    // floor-truncate the parquet nanos), so the cut is bit-identical.
    "q70_sessionization" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      val prev = lag(col("us"), 1).over(w)
      ev.withColumn("is_new",
          when(prev.isNull || col("us") - prev > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("is_new")).over(run))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"), max(col("us")).as("end_us"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // Word-n-gram Jaccard near-dup pairs through the MinHash-LSH
    // machinery, gated against brute-force exact word-3-gram Jaccard in
    // DuckDB. Geometry: r = k/bands = 8 keeps candidate volume tight
    // (sub-threshold pairs at j=0.3 band-match with P ≈ 1e-3, vs 12% at
    // r=4 — permissive geometry degenerates toward all-pairs on
    // boilerplate-heavy corpora); a true pair at the corpus's observed
    // minimum similarity (j >= 0.9) still band-matches with P ≈ 1-1e-4,
    // and hashing is seed-deterministic, so the gate is stable — verified
    // to reproduce the exact-Jaccard pair set at this SF.
    "q69_ngram_jaccard" -> ((s, d) => {
      operators.Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id",
          "text", n = 3, threshold = 0.6, k = 128, bands = 16)
        .select(col("id_a"), col("id_b"), r4(col("jaccard")).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // PII redaction, exercised for real (the corpus itself is PII-free —
    // zero digits/@ — so synthetic PII derived from doc_id is planted
    // into every doc and the oracle states the expected redaction
    // CONSTRUCTIVELY, gating the regex chain without needing regex
    // support in the oracle engine).
    "q68_pii_redaction" -> ((s, d) => {
      val planted = concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@mail.example.com via 10.0."),
        pmod(col("doc_id"), lit(256)), lit(".77 or +1 (555) 010-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
      t(s, d, "documents")
        .select(col("doc_id"),
          graft.functions.TextFunctions.redactPii(planted).as("clean"))
        .orderBy(col("doc_id"))
    }),

    // Per-dimension corpus stats over every embedding: the explode is
    // map-side and the aggregate partially combines to one row per
    // dimension per task, so the shuffle is dims x tasks regardless of
    // corpus size.
    "q67_embedding_dim_stats" -> ((s, d) => {
      operators.Embeddings.dimStats(t(s, d, "embeddings"), "embedding")
        .select(col("dim"), r4(col("mean")).as("mean"),
          r4(col("std")).as("std"),
          r6(col("dim_min")).as("dim_min"), r6(col("dim_max")).as("dim_max"))
        .orderBy(col("dim"))
    }),

    // TF-IDF term weighting: tf and df are integer aggregates (exact in
    // both engines); the only fp term is ln(N/df), whose ≤1-ulp libm
    // spread r4 absorbs. Full (doc, token) output — ranking machinery is
    // gated elsewhere (q08/q13/q33); the new surface here is the
    // weighting itself.
    "q71_tfidf" -> ((s, d) => {
      TextAnalysis.tfidf(t(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("tok"), col("tf"), col("df"),
          r4(col("weight")).as("weight"))
        .orderBy(col("doc_id"), col("tok"))
    }),

    // Per-source quality-quantile pruning: keep each source's top-half
    // by quality score, report retention. Cross-engine determinism: the
    // whole computation runs in exact scaled-integer space —
    // round(quality*1e4) is an exact long in both engines, so the
    // median interpolation (k or k+0.5, exact in doubles), the >= cut,
    // and the kept-average division all see bit-identical inputs (the
    // same grid-boundary trap q63 hit at sf0.1).
    "q72_quality_prune" -> ((s, d) => {
      val scored = t(s, d, "documents").select(col("source"),
        round(TextAnalysis.qualityScore(col("text")) * 10000).cast("long")
          .as("quality"))
      operators.Curation.quantilePrune(scored, "source", "quality", 0.5)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), max(col("q_total")).as("n_total"),
          r4(max(col("q_cut")) / 10000.0).as("med_q"),
          r4(sum(col("quality")) / (count(lit(1)) * 10000.0)).as("kept_avg_q"))
        .orderBy(col("source"))
    }),

    // Token-budgeted source sampling: data mixtures are specified in
    // tokens, not rows — admit docs per source in content-hash order
    // until the running token sum crosses the budget. Integer sums in
    // hash-then-id window order: deterministic in both engines.
    "q74_token_budget" -> ((s, d) => {
      operators.Curation.tokenBudgetSample(t(s, d, "documents"),
          "doc_id", "text", "source", budget = 500L, salt = "tb:42")
        .select(col("doc_id"), col("source"), col("n_tok"), col("cum_tok"))
        .orderBy(col("source"), col("doc_id"))
    }),

    // Greedy sequence packing (pretraining batch layout): 16 hash shards
    // (1 hex char — enough docs per shard at this SF that sequences
    // actually fill and roll over), capacity 512 tokens, first-fit in
    // (hash, id) order. The oracle replays the same greedy recurrence as
    // a DuckDB recursive CTE stepping row-by-row per shard.
    "q75_seq_pack" -> ((s, d) => {
      operators.Curation.packSequences(t(s, d, "documents"),
          "doc_id", "text", capacity = 512L, salt = "pack:42",
          shardHexChars = 1)
        .orderBy(col("doc_id"))
    }),

    // Fill-in-the-middle transform (Bavarian et al. 2022): content-keyed
    // sha bytes pick the two token cut points, the 50% transform rate,
    // and the PSM/SPM coin; the oracle replays all four draws plus the
    // segment slicing and concat_ws null-skip — a cut-point off-by-one,
    // a slice-boundary slip, or a sentinel-order mistake desyncs the
    // text hash on every transformed row.
    "q176_fim_transform" -> ((s, d) => {
      operators.Curation.fimTransform(t(s, d, "documents"),
          "doc_id", "text", ratePct = 50, salt = "fim:42")
        .orderBy(col("doc_id"))
    }),

    // Pack-boundary index over q75's packing: per-(shard, seq_id) sorted
    // document start offsets (the attention-mask reset points), member
    // ids, fill, and fill fraction (exact /512 power-of-two scaling).
    // The oracle replays the q75 recurrence and groups it per sequence;
    // the list columns ride the hash as CSV (the q41 precedent — the
    // driver's value hash compares scalars).
    "q179_pack_boundaries" -> ((s, d) => {
      val packed = operators.Curation.packSequences(t(s, d, "documents"),
        "doc_id", "text", capacity = 512L, salt = "pack:42",
        shardHexChars = 1)
      operators.Curation.packBoundaries(packed, "doc_id", capacity = 512L)
        .select(col("shard"), col("seq_id"),
          array_join(transform(col("boundaries"), _.cast("string")), ",")
            .as("boundaries_csv"),
          array_join(transform(col("doc_ids"), _.cast("string")), ",")
            .as("doc_ids_csv"),
          col("fill"), col("n_docs"), col("fill_frac"))
        .orderBy(col("shard"), col("seq_id"))
    }),

    // Fractional-epoch upsampling: per-source epoch factors 0.30-3.29
    // (a formula over the source number, so all four base-copy counts
    // and both sub-/super-unit regimes are in-gate); each doc repeats
    // floor(pct/100) times plus a hash-selected extra. The oracle
    // replays the pct formula, the sha-byte cut, and the copy explode.
    "q178_epoch_repeat" -> ((s, d) => {
      val pct = lit(30) +
        pmod(substring(col("source"), 4, 10).cast("int") * 37, lit(300))
      operators.Curation.epochRepeat(
          t(s, d, "documents").select(col("doc_id"), col("source")),
          "doc_id", pct, salt = "ep:42")
        .orderBy(col("doc_id"), col("copy_idx"))
    }),

    // Length-bucketed batch assignment (the length-grouped sampler):
    // token-count buckets at edges 8/16/32, 4 hash sub-buckets per
    // bucket (no single-partition corpus sort — the q142 lesson),
    // batches of 8 in (n_tok DESC, hash, id) order, per-batch pad width
    // and per-doc padding waste. The oracle replays the bucket edges,
    // the sub-bucket byte, both windows, and the waste arithmetic.
    "q177_length_batches" -> ((s, d) => {
      operators.Curation.lengthBucketBatches(t(s, d, "documents"),
          "doc_id", "text", batchRows = 8, salt = "lb:42",
          edges = Seq(8, 16, 32), subBuckets = 4)
        .orderBy(col("doc_id"))
    }),

    // Embedding-space eval: exact 1-NN label agreement per label (the
    // standard "is this embedding space any good" probe), on a
    // deterministic 1-in-4 query subsample — the corpus-scale eval
    // pattern: probe cost stays linear in the corpus while neighbors
    // still search ALL of it. Brute-force cosine is the documented exact
    // baseline (q26); at scale the same aggregate runs over
    // lshTopK/ivfTopK output. Top-1 ties break on neighbor id; distinct
    // cosine values are ~0.01 apart here, far beyond cross-engine ulps.
    "q73_knn_labels" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val lab = emb.select(col("vec_id"), col("label"))
      Similarity.bruteForceTopK(emb.filter(pmod(col("vec_id"), lit(4)) === 0),
          emb, "vec_id", "embedding", 1)
        .join(lab.toDF("vec_id", "q_label"), col("query_id") === col("vec_id"))
        .drop("vec_id")
        .join(lab.toDF("vec_id", "n_label"), col("neighbor_id") === col("vec_id"))
        .groupBy(col("q_label").as("label"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("q_label") === col("n_label"), 1L).otherwise(0L))
            .as("n_agree"))
        .select(col("label"), col("n"), col("n_agree"),
          r4(col("n_agree").cast("double") / col("n")).as("agree_rate"))
        .orderBy(col("label"))
    }),

    // Bloom-prefiltered decontamination — the scale path for q61's
    // semantics once the benchmark outgrows a broadcast hash table: the
    // benchmark gram set collapses to a ~10-bit/gram Bloom sketch probed
    // by a codegen'd might_contain inside the corpus scan's map stage,
    // and the exact verify semi-join sees only the surviving candidate
    // grams. No false negatives + exact verification ⇒ result identical
    // to the exact path, so the same string-gram DuckDB oracle hash-gates
    // this approximate-prefilter pipeline end to end.
    "q76_bloom_decontaminate" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val split = operators.Curation.hashSplit(col("doc_id"), "split:42")
      operators.Curation.bloomDecontaminate(
          docs.filter(split === "train"), docs.filter(split === "test"),
          "doc_id", "text", n = 3)
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // SCD type-2 history from a CDC change log: per-key no-op compaction
    // (lag struct compare), then versioned [effective_from, effective_to)
    // ranges. All integer/passthrough columns — deterministic in both
    // engines; (us, event_id) is a total order (event_id unique).
    "q77_scd_history" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      operators.Scd.scdHistory(ev, Seq("user_id"), "us", "event_id",
          Seq("event_type"))
        .select(col("user_id"), col("version"), col("event_type"),
          col("effective_from"), col("effective_to"), col("is_current"))
        .orderBy(col("user_id"), col("version"))
    }),

    // CDC latest-state compaction: newest row per key via max_by over the
    // packed payload — a hash aggregate (map-side combine), not a window,
    // so only one candidate row per key per task crosses the shuffle.
    "q78_cdc_latest" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"), col("value"))
      operators.Scd.latestByKey(ev, Seq("user_id"), "us", "event_id")
        .orderBy(col("user_id"))
    }),

    // One-pass column profile (data-quality audit) in exact mode — the
    // mode a SQL oracle can gate bit-exactly; flag_nn synthesizes a
    // null-bearing column (the corpus has none) so the null-count path is
    // exercised. All outputs are counts or passthrough min/max.
    "q79_profile" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .withColumn("flag_nn", nullif(col("l_returnflag"), lit("N")))
      operators.Profiling.profile(li,
          Seq("l_quantity", "l_extendedprice", "l_returnflag", "flag_nn"),
          exact = true)
        .orderBy(col("col_name"))
    }),

    // Dedup survivors: pairs → connected components → keep the
    // best-quality doc per cluster (ties to smallest id), singletons
    // survive. Quality compares in exact scaled-long space (the q72
    // technique), so the winner choice is engine-independent.
    "q80_dedup_survivors" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val pairs = Dedup.minhashDupPairs(docs, "doc_id", "text")
      val clusters = Dedup.connectedComponents(pairs)
      Dedup.keepBestPerCluster(docs, clusters, "doc_id",
          round(TextAnalysis.qualityScore(col("text")) * 10000).cast("long"))
        .select(col("doc_id"), col("cluster_label"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // Token-length distribution per source: integer bucketing + counts
    // (exact in both engines); the share is one double division of exact
    // longs, r4'd on both sides.
    "q81_token_histogram" -> ((s, d) => {
      TextAnalysis.tokenHistogram(t(s, d, "documents"), "text", "source", 100)
        .select(col("source"), col("bin_lo"), col("n_docs"),
          r4(col("share")).as("share"))
        .orderBy(col("source"), col("bin_lo"))
    }),

    // Markup stripping over planted HTML (the corpus itself is
    // markup-free prose): tags → spaces, script block dropped, entities
    // unescaped, whitespace collapsed. The oracle replays the identical
    // RE2-safe regex/replace chain, so the gate is exact strings.
    "q82_strip_markup" -> ((s, d) => {
      val raw = concat(lit("<p id=\"1\">"), col("text"),
        lit("</p><div>Q&amp;A &lt;tags&gt; &quot;quoted&quot;</div>" +
          "<script type=\"text/js\">var x = 1 < 2;</script><br/>end"))
      t(s, d, "documents")
        .select(col("doc_id"), TextFunctions.stripMarkup(raw).as("clean"))
        .orderBy(col("doc_id"))
    }),

    // Gap-based time-window dedup (alarm dampening): a (user, type)
    // repeat within 10 minutes of its predecessor is suppressed. Pure
    // integer lag comparison — deterministic in both engines.
    "q86_window_dedup" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      operators.Scd.windowDedup(ev, Seq("user_id", "event_type"), "us",
          "event_id", windowMicros = 600L * 1000000L)
        .orderBy(col("event_id"))
    }),

    // Trailing RANGE-frame rolling aggregates (q09 pins ROWS frames; the
    // interval frame is separate machinery): per user, events + value sum
    // over the trailing 30 minutes at every event. Equal-us peers are in
    // the frame by SQL range semantics in both engines.
    "q87_rolling_window" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-1800L * 1000000L, 0L)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("value"))
        .withColumn("n_30m", count(lit(1)).over(w))
        .withColumn("sum_30m", r4(sum(col("value")).over(w)))
        .drop("value")
        .orderBy(col("event_id"))
    }),

    // Forward as-of: earliest purchase at-or-after each error, per user —
    // the union+window technique run in the opposite direction.
    "q84_asof_forward" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      operators.AsOfJoin.forward(errors, purchases, Seq("user_id"),
          "ts", "ts", Seq("purchase_id"))
        .select(col("event_id"), col("user_id"), col("purchase_id"))
        .orderBy(col("event_id"))
    }),

    // Nearest as-of: closest purchase in either direction, distance ties
    // (and equal timestamps) resolve backward. Distances compare as exact
    // microsecond longs — engine-independent.
    "q85_asof_nearest" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      operators.AsOfJoin.nearest(errors, purchases, Seq("user_id"),
          "ts", "ts", Seq("purchase_id"))
        .select(col("event_id"), col("user_id"), col("purchase_id"))
        .orderBy(col("event_id"))
    }),

    // Rolling 7-day distinct active users per day. Exact formulation:
    // dedup to (day, user) grain first (the big shuffle), then each
    // target day joins its trailing window — the join fan-out is bounded
    // by 7 × daily-active rows, NOT raw events. At 100 TB the same query
    // drops the join for merged per-day sketches — IMPLEMENTED as
    // q113_rolling_kmv (per-day KMV partials, window-merged, fully
    // hash-gated); day-grain exactness is what THIS oracle gates.
    "q96_rolling_active" -> ((s, d) => {
      // only (dt, user_id) cross the big distinct shuffle; the display
      // string derives from the 30-row aggregate
      val dayUsers = Tables.events(s, d)
        .select(to_date(col("ts")).as("dt"), col("user_id"))
        .distinct()
      val days = dayUsers.select(col("dt")).distinct()
      days.join(dayUsers.select(col("dt").as("adt"), col("user_id")),
          datediff(col("dt"), col("adt")).between(0, 6))
        .groupBy(col("dt"))
        .agg(countDistinct(col("user_id")).as("active_7d"))
        .select(date_format(col("dt"), "yyyy-MM-dd").as("day"), col("active_7d"))
        .orderBy(col("day"))
    }),

    // rank vs dense_rank on a tie-heavy ordering (integer quantities):
    // the two must diverge exactly where ties occur.
    "q97_dense_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity").desc)
      t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"))
        .withColumn("rk", rank().over(w).cast("long"))
        .withColumn("drk", dense_rank().over(w).cast("long"))
        .groupBy(col("l_returnflag"))
        .agg(max(col("rk")).as("max_rank"),
          max(col("drk")).as("max_dense_rank"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // tokenBudgetSample's 100-TB shape: the per-source budget splits
    // across 8 hash sub-buckets (first sample-key byte mod 8; buckets
    // 0..3 take the 500%8=4 remainder tokens), so one giant source runs
    // as 8 parallel window tasks instead of serializing through one.
    // Same salt as q74 — the two admitted sets are directly comparable.
    "q98_token_budget_buckets" -> ((s, d) => {
      operators.Curation.tokenBudgetSample(t(s, d, "documents"),
          "doc_id", "text", "source", budget = 500L, salt = "tb:42",
          subBuckets = 8)
        .select(col("doc_id"), col("source"), col("sub_bucket"),
          col("n_tok"), col("cum_tok"))
        .orderBy(col("source"), col("sub_bucket"), col("doc_id"))
    }),

    // Z-order key construction on explicit cuts (the deterministic half
    // of the write-clustering operator — withZOrderKey adds only the
    // sketch-estimated cuts on top): rank-per-dimension + Morton
    // interleave is integer bit math, replayed verbatim by the oracle.
    // File-skip superiority stays measured in LayoutSpec.
    "q99_zorder_key" -> ((s, d) => {
      operators.Layout.zOrderKeyFromCuts(
          t(s, d, "lineitem"),
          Seq("l_quantity" -> zQtyCuts, "l_extendedprice" -> zPriceCuts),
          bits = 4, zCol = "zkey")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("zkey"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Ordered funnel (view → click → purchase): each stage's timestamp
    // must follow the previous stage's FIRST occurrence per user. All
    // min/count over exact microsecond longs. Joins and aggregations all
    // key on user_id — one partitioning reused down the pipeline.
    "q94_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t_view"))
      val clicks = ev.filter(col("event_type") === "click")
        .join(views, Seq("user_id"))
        .filter(col("us") >= col("t_view"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t_click"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .join(clicks, Seq("user_id"))
        .filter(col("us") >= col("t_click"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t_purchase"))
      views.agg(count(lit(1)).as("n")).select(lit("1_view").as("stage"), col("n"))
        .unionByName(clicks.agg(count(lit(1)).as("n"))
          .select(lit("2_click").as("stage"), col("n")))
        .unionByName(purchases.agg(count(lit(1)).as("n"))
          .select(lit("3_purchase").as("stage"), col("n")))
        .orderBy(col("stage"))
    }),

    // Retention cohorts: users grouped by first-active day, distinct
    // active users at day offsets 0/1/7/14/28. Dates derive from the
    // UTC session timezone on both sides (q16 precedent); counts exact.
    "q95_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val first = ev.groupBy(col("user_id")).agg(min(col("d")).as("cohort_day"))
      ev.join(first, Seq("user_id"))
        .select(col("user_id"), col("cohort_day"),
          datediff(col("d"), col("cohort_day")).as("day_offset"))
        .filter(col("day_offset").isin(0, 1, 7, 14, 28))
        // ISO string, not DATE: the harness canonicalizes date columns
        // differently per engine (python date objects vs datetime64)
        .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .withColumn("day_offset", col("day_offset").cast("long"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // Distribution-rank window family (ntile / percent_rank / cume_dist)
    // — q08/q09 pin rank/lag; these are the remaining standard-SQL
    // ranking functions, identical semantics in both engines. Ordering
    // key (o_totalprice, o_orderkey) is total, so every rank is
    // deterministic; percent_rank/cume_dist are exact small-int ratios
    // r4'd on both sides.
    "q93_rank_distribution" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .withColumn("decile", ntile(10).over(w).cast("long"))
        .withColumn("pct_rank", r4(percent_rank().over(w)))
        .withColumn("cume", r4(cume_dist().over(w)))
        .drop("o_totalprice")
        .orderBy(col("o_orderkey"))
    }),

    // Left outer join with null-side aggregation: every customer with
    // their order stats, order-less customers kept with zero counts —
    // completes the outer-join family (q07 anti, q91 full outer).
    "q92_left_join" -> ((s, d) => {
      val ords = t(s, d, "orders")
        .select(col("o_custkey"), col("o_totalprice"))
      t(s, d, "customer").select(col("c_custkey"), col("c_mktsegment"))
        .join(ords, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_mktsegment"))
        .agg(count(col("o_totalprice")).as("n_orders"),
          r2(coalesce(sum(col("o_totalprice")), lit(0.0))).as("total_spend"))
        .orderBy(col("c_custkey"))
    }),

    // Snapshot diff over a deterministic second version of orders
    // (every 7th key deleted, every 5th repriced, every 11th re-inserted
    // under a negated key): per-key classification via a full outer join
    // on fixed-width payload hashes, aggregated to a change report. The
    // oracle classifies by actual column equality — identical up to an
    // xxhash64 collision (~n·2⁻⁶⁴).
    "q91_snapshot_diff" -> ((s, d) => {
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      val current = o.filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
        .withColumn("o_totalprice",
          when(pmod(col("o_orderkey"), lit(5)) === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
        .unionByName(o.filter(pmod(col("o_orderkey"), lit(11)) === 0)
          .select((-col("o_orderkey")).as("o_orderkey"),
            col("o_totalprice"), col("o_orderstatus")))
      operators.Diff.diffSummary(o, current, Seq("o_orderkey"))
        .orderBy(col("change_type"))
    }),

    // Strided overlapping chunks (RAG layout): window 32, stride 16 —
    // adjacent chunks share 16 tokens (docs run 10-99 tokens, so most
    // emit several overlapping chunks). Pure integer arithmetic.
    "q90_strided_chunks" -> ((s, d) => {
      operators.Curation.stridedChunks(t(s, d, "documents"),
          "doc_id", "text", windowTokens = 32, stride = 16)
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // Per-source unigram entropy: tf counts are exact ints; the stable
    // form ln(N) - sum(tf*ln tf)/N keeps fp to the last step, and the
    // cross-engine summation-order spread (~1e-11 abs) sits far inside
    // the r4 grid.
    "q88_source_entropy" -> ((s, d) => {
      TextAnalysis.tokenEntropy(t(s, d, "documents"), "text", "source")
        .select(col("source"), col("n_tok"), col("n_vocab"),
          r4(col("entropy")).as("entropy"))
        .orderBy(col("source"))
    }),

    // Pairwise vocabulary Jaccard between sources: all counts exact ints,
    // one double division, r4'd both sides.
    "q89_vocab_overlap" -> ((s, d) => {
      TextAnalysis.vocabOverlap(t(s, d, "documents"), "text", "source")
        .select(col("g_a").as("source_a"), col("g_b").as("source_b"),
          col("n_common"), r4(col("jaccard")).as("jaccard"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    // Stratified eval-set draw: exactly 20 docs per source in
    // (sha256 content-hash, id) order — pure integer/hash determinism,
    // identical membership in any engine or partition layout.
    "q83_stratified_sample" -> ((s, d) => {
      operators.Curation.stratifiedSample(t(s, d, "documents"),
          "source", "doc_id", k = 20, salt = "strat:42")
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Incremental dedup, pairs view: an arriving batch (doc_id % 10 < 2)
    // joined against the standing corpus's precomputed MinHash signature
    // table — corpus text is never re-read. Same q27 geometry
    // (k=128/b=16/r=8) and the same oracle-equivalence argument: the
    // brute-force exact-Jaccard oracle agrees because in-data near-dup
    // pairs sit well above the 0.8 threshold where LSH recall is ~1 (the
    // cross-split pair set here is a SUBSET of q27's gated unordered
    // pairs).
    "q100_incremental_pairs" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val corpus = Dedup.minhashSignatures(
        docs.filter(pmod(col("doc_id"), lit(10)) >= 2), "doc_id", "text")
      Dedup.incrementalDupPairs(
          docs.filter(pmod(col("doc_id"), lit(10)) < 2), "doc_id", "text", corpus)
        .select(col("id_new"), col("id_corpus"), r4(col("jaccard")).as("jaccard"))
        .orderBy(col("id_new"), col("id_corpus"))
    }),

    // Incremental dedup, survivor view: the batch minus every doc with a
    // >= 0.8 corpus match. Docs too short to shingle (< 5 normalized
    // chars) have empty shingle sets, match nothing, and survive — on
    // both sides.
    "q101_incremental_dedup" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val corpus = Dedup.minhashSignatures(
        docs.filter(pmod(col("doc_id"), lit(10)) >= 2), "doc_id", "text")
      Dedup.incrementalDedup(
          docs.filter(pmod(col("doc_id"), lit(10)) < 2), "doc_id", "text", corpus)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // Incremental dedup over the MATERIALIZED band table — the
    // O(batch)-per-batch probe path. The corpus's signature and band
    // tables are written to parquet (the standing-table workflow this
    // operator exists for: built once, probed per batch) and the batch
    // broadcast-probes them with no corpus-side exchange — the plan
    // invariant DedupSpec/PlanSpec pin. Same split, geometry, and output
    // as q100: the two paths must produce the identical pair set.
    "q104_incremental_banded" -> ((s, d) => {
      standingSplits("q104_incremental_banded").build(s, d)
      standingSplits("q104_incremental_banded").probe(s, d)
    }),

    // Temperature (alpha = 1/2) source rebalance: per-source targets are
    // floor(scale * sqrt(n)) — sqrt is IEEE-exact, so set membership is
    // engine-identical. scale=3 downsamples at every SF (25-doc sources
    // keep 15; 250-doc keep 47); the keep-all branch is CurationSpec's.
    "q103_temperature_mixture" -> ((s, d) => {
      operators.Curation.temperatureMixture(t(s, d, "documents"),
          "source", "doc_id", scale = 3.0, salt = "temp:42")
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // temperatureMixture's 100-TB shape: the per-source target
    // floor(3*sqrt(n)) splits integrally across 8 hash sub-buckets
    // (first sample-key byte mod 8; buckets 0..(tgt%8 - 1) take one
    // extra doc, so the per-bucket targets sum to the source target
    // exactly) and the window partitions by (source, sub_bucket) — one
    // giant source admits through 8 parallel tasks instead of
    // serializing through one. Same salt/scale as q103 — the two
    // admitted sets are directly comparable.
    "q105_temperature_buckets" -> ((s, d) => {
      operators.Curation.temperatureMixture(t(s, d, "documents"),
          "source", "doc_id", scale = 3.0, salt = "temp:42", subBuckets = 8)
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // ANN LSH under the hash gate (q46's treatment for the other ANN
    // tier): sha256-derived integer hyperplanes + 2^20 fixed-point
    // quantized sign bits make every signature — and therefore the
    // candidate set itself — bit-exact integer arithmetic both engines
    // replay, with no float-summation hazard at the sign knife-edge.
    // The oracle rebuilds planes, signatures, bands, candidates, exact
    // rescoring, and top-k. Rank stability: min adjacent-cos gap within
    // any query's top-4 is 1.5e-5 at sf0.01 (measured) — ten orders
    // above cross-engine summation ulps.
    "q106_lsh_topk" -> ((s, d) => {
      Similarity.lshTopK(t(s, d, "embeddings"), "vec_id", "embedding",
          k = 3, bands = 8, bitsPerBand = 8, dim = 64)
        .select(col("query_id"), col("neighbor_id"),
          r6(col("cos")).as("cos"), col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Embedding near-dup pairs under the hash gate. The corpus has no
    // natural near-dups (max pairwise cos 0.51), so the query plants
    // them: a double-precision copy of every vector with +0.001 on
    // coordinate 0 (IEEE-exact in both engines) unioned at id+1e6 —
    // cos(v, v') ~ 1-1e-7, three decades above the 0.999 threshold,
    // while natural pairs sit three decades below. The oracle replays
    // the full band structure (not a brute-force recall assumption), so
    // the candidate set — hits AND misses — is the gated artifact.
    "q107_embedding_neardup" -> ((s, d) => {
      val vecs = t(s, d, "embeddings").select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("embedding"))
      val planted = vecs.select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.001)).otherwise(x)).as("embedding"))
      Similarity.embeddingNearDupPairs(vecs.unionByName(planted),
          "vec_id", "embedding", threshold = 0.999,
          bands = 8, bitsPerBand = 8, dim = 64)
        .select(col("id_a"), col("id_b"), r6(col("cos")).as("cos"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // EMBEDDING-SPACE eval decontamination (VERDICT r11 #3): the q107
    // band machinery pointed ACROSS corpora — corpus vectors whose
    // cosine to any eval vector clears the threshold mark as
    // contaminated, the paraphrase-leak gate q206's exact-text stage
    // cannot see. Eval items are the q107 IEEE-exact +0.001
    // perturbations of every 11th vector (a reworded eval item's
    // stand-in: near, not identical), so every eval item has exactly
    // one planted corpus leak and the oracle replays band structure,
    // rescore, and the per-doc aggregate end to end.
    "q216_embedding_decontam" -> ((s, d) => {
      val vecs = t(s, d, "embeddings").select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("embedding"))
      val evalSet = vecs.filter(col("vec_id") % 11 === 0).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.001)).otherwise(x)).as("embedding"))
      Similarity.embeddingDecontaminate(vecs, "vec_id", "embedding",
          evalSet, "vec_id", "embedding", threshold = 0.999,
          bands = 8, bitsPerBand = 8, dim = 64)
        .select(col("doc_id"), col("n_eval_hits"),
          r6(col("max_cos")).as("max_cos"), col("first_eval_id"))
        .orderBy(col("doc_id"))
    }),

    // The flagship standing-corpus probe (q104) in the embedding
    // modality: the corpus's LSH band table is MATERIALIZED once
    // (writeEmbBandTable) and an arriving batch — q107's planted
    // +0.001-coord-0 perturbation of every tenth vector, each with
    // exactly one corpus near-dup at cos ~ 1-1e-7 — broadcast-probes it
    // with no corpus-side exchange (the plan invariant SimilaritySpec
    // pins). The oracle replays the full band structure over corpus and
    // batch and keeps only cross pairs, so the candidate set — hits AND
    // misses — is the gated artifact, same as q107.
    "q108_incremental_embdup" -> ((s, d) => {
      standingSplits("q108_incremental_embdup").build(s, d)
      standingSplits("q108_incremental_embdup").probe(s, d)
    }),

    // Approximate distinct via the KMV sketch — q35's mergeable-sketch
    // shape (bounded map-side state, sorted-merge combine) but with a
    // deterministic sha256-prefix hash, so the DuckDB oracle replays the
    // sketch EXACTLY: distinct 48-bit hashes, k-th order statistic,
    // (k-1)/v_k estimate. Below capacity the sketch is the distinct set
    // (exact count) — sf0.001 exercises that branch, larger SFs the
    // estimator branch.
    "q102_kmv_distinct" -> ((s, d) => {
      import graft.functions.KmvAggregator._
      val k = 256
      t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_partkey"),
          kmvHash(col("l_partkey")).as("h"))
        .groupBy(col("l_returnflag"))
        .agg(kmv(k)(col("h")).as("mins"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"),
          r4(kmvEstimate(col("mins"), k)).as("est_distinct"),
          col("exact_parts"))
        .orderBy(col("l_returnflag"))
    }),

    // q96's 100 TB shape (VERDICT r7 #2): rolling 7-day distinct actives
    // via MERGED per-day KMV sketches instead of the day×user join. The
    // raw events stream crosses exactly ONE aggregation keyed by day —
    // the exchange after the partial carries one bounded ≤k-long sketch
    // row per (task, day), never (day, user) pairs — and the 7-day merge
    // then runs on ~30 sketch rows (explode + re-aggregate through the
    // same kmv aggregator: per-day k-minima are lossless for the union's
    // k-minima, the standard KMV merge property). Same deterministic
    // sha256-prefix hash as q102, so DuckDB replays the per-day
    // sketches, the window merge, and the (k-1)/v_k estimate exactly.
    "q113_rolling_kmv" -> ((s, d) => {
      import graft.functions.KmvAggregator._
      val k = 256
      // persisted (≤ ~30 bounded sketch rows): the join references the
      // frame twice, and without the pin the raw events would be
      // aggregated once per reference — at 100 TB the equivalent is
      // materializing the per-day sketch table to storage (the band-table
      // pattern), so one scan of raw events is the modeled shape
      val daySketch = Tables.events(s, d)
        .select(to_date(col("ts")).as("dt"), kmvHash(col("user_id")).as("h"))
        .groupBy(col("dt"))
        .agg(kmv(k)(col("h")).as("mins"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val days = daySketch.select(col("dt"))
      days.join(daySketch.select(col("dt").as("adt"), col("mins")),
          datediff(col("dt"), col("adt")).between(0, 6))
        .select(col("dt"), explode(col("mins")).as("h"))
        .groupBy(col("dt"))
        .agg(kmv(k)(col("h")).as("mins"))
        .select(date_format(col("dt"), "yyyy-MM-dd").as("day"),
          r4(kmvEstimate(col("mins"), k)).as("active_7d_est"))
        .orderBy(col("day"))
    }),

    // Count-Min frequency sketch — the frequency member of the
    // mergeable-sketch family (KMV q102/q113 = distinct; this = per-key
    // counts in FIXED depth×width state regardless of key cardinality).
    // Same deterministic sha256-prefix hashing, so the oracle replays
    // bucket assignment, grid counts, and the min-over-depths estimates
    // exactly — the ESTIMATES ride the value hash, and the structural
    // never-undershoots guarantee is asserted as a gated boolean.
    // The token frame is persisted (two consumers: the grid aggregate
    // and the exact top-k the estimates are judged against).
    "q114_cms_freq" -> ((s, d) => {
      import operators.FreqSketch
      val toks = t(s, d, "documents")
        .select(explode(TextFunctions.tokens(
          TextFunctions.normalizeWs(col("text")))).as("token"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sketch = FreqSketch.countMin(toks, col("token"))
      val top = toks.groupBy(col("token")).agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("token")).limit(15)
      FreqSketch.estimate(sketch, top, "token")
        .join(top, Seq("token"))
        .select(col("token"), col("exact_cnt"), col("est"),
          (col("est") >= col("exact_cnt")).as("never_undershoots"))
        .orderBy(col("exact_cnt").desc, col("token"))
    }),

    // Quantile sketch via a bottom-k hash sample — the distribution
    // member of the mergeable-sketch family (KMV = distinct, CMS =
    // frequency). The sample is the k rows with the smallest sha-prefix
    // hash of their unique event_id, so unlike t-digest/KLL the sample
    // — and every quantile computed from it — is deterministic and
    // engine-replayable: the sample quantiles ride the value hash, and
    // the estimator's rank-error bound (|F(q̂_p) − p| = O(1/√k)) is
    // gated as integer-arithmetic booleans against the FULL population
    // (comparisons use the r4-rounded estimates so both engines count
    // against bit-identical cut values).
    "q115_sample_quantiles" -> ((s, d) => {
      import operators.SampleSketch
      val k = 512
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("event_id"), col("value"))
        .filter(col("value").isNotNull)
      val est = SampleSketch.bottomK(ev, Seq("event_type"), col("event_id"), k)
        .groupBy(col("event_type")).agg(
          r4(expr("percentile(value, 0.5)")).as("p50_est"),
          r4(expr("percentile(value, 0.9)")).as("p90_est"))
      ev.join(broadcast(est), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") <= col("p50_est"), 1L).otherwise(0L)).as("c50"),
          sum(when(col("value") <= col("p90_est"), 1L).otherwise(0L)).as("c90"),
          max(col("p50_est")).as("p50_est"),
          max(col("p90_est")).as("p90_est"))
        .select(col("event_type"), col("n"), col("p50_est"), col("p90_est"),
          (abs(col("c50") * 10 - col("n") * 5) <= col("n")).as("p50_rank_ok"),
          (abs(col("c90") * 10 - col("n") * 9) <= col("n")).as("p90_rank_ok"))
        .orderBy(col("event_type"))
    }),

    // Register-vector HyperLogLog under the hash gate — the engine's
    // third distinct surface (exact / KMV q102 / THIS), chosen when the
    // per-group state must be a fixed byte vector with a max-merge (the
    // cheapest mergeable-sketch merge; idempotent, so streaming replay
    // collapses for free). The sha256-prefix hash makes bucket, rank,
    // registers, and the fixed-point harmonic sum S integer-exact, so
    // the oracle replays the RAW ESTIMATES bit-for-bit; the '__all__'
    // row additionally proves mergeability under the gate: elementwise
    // max of the per-type registers must equal the directly-computed
    // global registers (`merge_ok`). Groups are chosen inside the raw
    // estimator's range (n ≥ 2.5m at every SF); the small-range linear
    // counting path is ln-based (not cross-engine exact) and is T-gated
    // in HllSpec instead.
    "q116_hll_distinct" -> ((s, d) => {
      import graft.functions.{Hll, KmvAggregator}
      val p = 6
      val hllAgg = Hll.hll(p)
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("event_id"),
          KmvAggregator.kmvHash(col("event_id")).as("h"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val perType = ev.groupBy("event_type")
        .agg(hllAgg(col("h")).as("regs"),
          countDistinct(col("event_id")).as("exact_cnt"))
      val global = ev
        .agg(hllAgg(col("h")).as("regs"),
          countDistinct(col("event_id")).as("exact_cnt"))
        .select(lit("__all__").as("event_type"), col("regs"),
          col("exact_cnt"))
      // mergeability proof: max-of-per-type registers ≡ direct global
      val merged = perType.select(posexplode(col("regs")))
        .toDF("pos", "reg")
        .groupBy("pos").agg(max(col("reg")).as("mreg"))
      val mergeOk = global.select(posexplode(col("regs"))).toDF("pos", "reg")
        .join(merged, Seq("pos"))
        .agg((sum(when(col("reg") === col("mreg"), 0)
          .otherwise(1)) === 0).as("merge_ok"))
      perType.unionByName(global)
        .select(col("event_type"), col("exact_cnt"),
          Hll.zeros(col("regs")).as("zeros"),
          Hll.harmonicS(col("regs"), p).as("s"))
        .withColumn("raw_est", Hll.rawEstimate(col("s"), p))
        .withColumn("err_ok",
          abs(col("raw_est") - col("exact_cnt").cast("double")) * lit(2.0) <=
            col("exact_cnt").cast("double"))
        .crossJoin(mergeOk) // 1-row broadcast scalar
        .orderBy(col("event_type"))
    }),

    // Integer-exact PageRank (power iteration, fixed 3 rounds) over the
    // symmetrized customer↔supplier co-purchase graph — the
    // power-iteration member of the iterative-graph family (connected
    // components q65 / survivors q80 are the pointer-doubling members).
    // The fixed-point formulation (damping as the exact rational 17/20,
    // floor divisions, integer contribution sums) makes every iteration
    // associative-exact, so the DuckDB oracle replays all three rounds
    // and the final ranks bit-for-bit — a floating PageRank could only
    // be tolerance-gated. Customers map to even node ids, suppliers to
    // odd (disjoint by parity). See operators/Graphs.integerPageRank
    // for the 100 TB shape (edges hashed+persisted once, only the rank
    // table moves per iteration).
    "q117_pagerank" -> ((s, d) => {
      import graft.operators.Graphs
      val pairs = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
      Graphs.integerPageRank(edges, 3)
        .select(col("nid"),
          when(col("nid") % 2 === 0, "customer")
            .otherwise("supplier").as("kind"),
          col("pr"))
        .orderBy(col("pr").desc, col("nid")).limit(20)
    }),

    // Connected components by alternating large-star/small-star
    // (Kiveris et al. 2014 — the published trillion-edge CC algorithm),
    // the second, edge-rewriting CC implementation next to q65's
    // pointer doubling: no label table, each round rewrites the edge
    // set itself toward a star forest, so the working set SHRINKS
    // monotonically and every exchange carries bare (long, long) pairs.
    // Graph: the same-nation customer→supplier co-trade graph
    // (customers even ids, suppliers odd) — 25 nation-blocked
    // components whose census is the output. Fixed 5 alternations
    // (post-convergence rounds replay as no-ops at every SF); the
    // operator ASSERTS label consistency over every input edge, so an
    // insufficient budget fails loudly instead of splitting components.
    // The oracle replays all 5 unrolled rounds — emit rules, dedup,
    // orientation, and the final forest-to-label left join.
    "q189_cc_stars" -> ((s, d) => {
      import graft.operators.Graphs
      val pairs = t(s, d, "orders")
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") === col("s_nationkey"))
        .select((col("c_custkey") * 2).as("id_a"),
          (col("s_suppkey") * 2 + 1).as("id_b"))
        .distinct()
      Graphs.ccLargeSmallStar(pairs, 5)
        .groupBy(col("label").as("component"))
        .agg(count(lit(1)).as("members"))
        .orderBy(col("members").desc, col("component"))
    }),

    // INCREMENTAL grid-DBSCAN state maintenance — the q195 pattern in
    // the density-clustering column: the standing embeddings build the
    // cell census + core labels, a delta batch (reversed vectors,
    // shifted ids) arrives, counts merge BY ADDITION (core-ness is
    // monotone) and only components touched by newly-core cells
    // re-solve via incrementalCc. Output is the merged CELL state
    // table; the oracle recomputes grid-DBSCAN from scratch on the
    // union corpus, so any stale label, census slip, or missed
    // newly-core edge desyncs.
    "q197_incremental_dbscan" -> ((s, d) => {
      import graft.operators.Clustering
      val base = Tables.embeddings(s, d)
      val standingCensus = Clustering.cellCensus(
        base, "vec_id", "embedding", 64, 524288L)
      val standingLabels = Clustering.cellStates(standingCensus, 12L, 8)
        .filter(col("role") === "core")
        .select(col("cell"), col("cluster"))
      val delta = base.select((col("vec_id") + 100000L).as("vec_id"),
        reverse(col("embedding")).as("embedding"))
      Clustering.incrementalCellDbscan(standingCensus, standingLabels,
          delta, "vec_id", "embedding", 64, 524288L, 12L)
        .select(col("cx"), col("cy"), col("cnt"), col("role"),
          col("cluster"))
        .orderBy(col("cx"), col("cy"))
    }),

    // Deterministic random-walk corpus (DeepWalk's input) over the
    // q189 co-trade graph: one 4-step walk per node, next hop =
    // neighbor minimizing the replayable 48-bit hash of (salt, start,
    // step, neighbor) — uniform-over-neighbors in distribution, yet
    // bit-reproducible on any layout/engine (a rand()-driven walk is
    // not). The oracle replays all four frontier joins and argmin
    // picks, path strings included.
    "q196_hash_walks" -> ((s, d) => {
      import graft.operators.Graphs
      val pairs = t(s, d, "orders")
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") === col("s_nationkey"))
        .select((col("c_custkey") * 2).as("a"),
          (col("s_suppkey") * 2 + 1).as("b"))
        .distinct()
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
      Graphs.hashRandomWalks(edges, steps = 4, salt = "rw:42")
        .orderBy(col("start"))
    }),

    // Incremental connected components against STANDING labels — the
    // graph member of the standing-corpus family: batch-1 edges
    // ((cust + supp) % 3 ≠ 0) build standing labels, the remaining
    // third arrives as the delta, and only TOUCHED components
    // re-solve (star edges are connectivity-equivalent stand-ins for
    // their components, so the subgraph solve is exact and
    // delta-priced). Output: full-union component census plus the
    // relabeled count per component. The oracle replays BOTH star
    // pyramids — standing subset and full union — so a merge bug,
    // a pruning bug, or a stale-label leak all desync the census.
    "q195_incremental_cc" -> ((s, d) => {
      import graft.operators.Graphs
      val all = t(s, d, "orders")
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") === col("s_nationkey"))
        .select((col("c_custkey") * 2).as("id_a"),
          (col("s_suppkey") * 2 + 1).as("id_b"),
          ((col("c_custkey") + col("s_suppkey")) % 3).as("m"))
        .distinct()
      val standing = Graphs.ccLargeSmallStar(
        all.filter(col("m") =!= 0).select("id_a", "id_b"), 5)
      val merged = Graphs.incrementalCc(standing,
        all.filter(col("m") === 0).select("id_a", "id_b"), 5)
      merged
        .join(standing.withColumnRenamed("label", "old_label"),
          Seq("id"), "left")
        .groupBy(col("label").as("component"))
        .agg(count(lit(1)).as("members"),
          sum(when(coalesce(col("old_label"), col("id")) =!= col("label"),
            1L).otherwise(0L)).as("relabeled"))
        .orderBy(col("members").desc, col("component"))
    }),

    // Grid-granular DBSCAN over a 2-D signed random projection of the
    // embedding space — density clustering with an explicit NOISE
    // class (k-means q124 partitions everything; DBSCAN quarantines
    // off-manifold vectors). Cell width 2^19, minPts 12, q124
    // quantization, sha-parity projection signs, clusters = 8-connected
    // core-cell components via ccLargeSmallStar (q189's operator
    // composed). The oracle replays quantization, signs, projection,
    // cell floor, census, adjacency, a recursive component closure,
    // and the core/border/noise role rules per point.
    "q190_grid_dbscan" -> ((s, d) => {
      import graft.operators.Clustering
      Clustering.gridDbscan(Tables.embeddings(s, d), "vec_id", "embedding",
          dims = 64, cellWidth = 524288L, minPts = 12L)
        .orderBy(col("vec_id"))
    }),

    // Perceptual-hash image near-dup: the codec family (q109–q112)
    // meets the dedup family. synthesizeDhashBmp emits genuine 18×8 BMP
    // files in groups sharing a pixel chain, each perturbed in 2
    // sha-derived bytes; dhashBmpBands PARSES the files and computes an
    // integer-exact 64-bit difference hash as four 16-bit band values;
    // dhashNearDupPairs runs the SimHash pigeonhole (band-collision
    // candidates, xor+bit_count verify at Hamming ≤ 6). The oracle
    // replays generation formula → grayscale cells → bits → bands →
    // band join → Hamming, so a parser slip, a bit-packing mistake, or
    // a banding change all go red. Pairs and misses both ride the gate
    // (the contract replayed is banded recall, not ground truth).
    "q118_dhash_neardup" -> ((s, d) => {
      import graft.operators.Multimodal
      val media = Multimodal.synthesizeDhashBmp(s, 80, 3)
      Multimodal.dhashNearDupPairs(Multimodal.dhashBands(media).toDF())
        .orderBy(col("a"), col("b"))
    }),

    // IMAGE dedup end to end: the q118 perceptual pairs through q65's
    // connected components — every image gets a cluster label (min id;
    // singletons label themselves) and the label holder survives, the
    // media edition of q80's survivor selection. The oracle extends the
    // q118 replay with a recursive transitive closure.
    "q184_media_dup_clusters" -> ((s, d) => {
      import graft.operators.Multimodal
      val media = Multimodal.synthesizeDhashBmp(s, 80, 3)
      val pairs = Multimodal.dhashNearDupPairs(
          Multimodal.dhashBands(media).toDF(), maxHamming = 6)
        .select(col("a").as("id_a"), col("b").as("id_b"))
      val labels = operators.Dedup.connectedComponents(pairs)
        .withColumnRenamed("id", "media_id")
      media.select(col("media_id"))
        .join(labels, Seq("media_id"), "left")
        .select(col("media_id"),
          coalesce(col("label"), col("media_id")).as("cluster_label"))
        .withColumn("kept", col("media_id") === col("cluster_label"))
        .orderBy(col("media_id"))
    }),

    // Heavy hitters with a broadcast-CMS shuffle guard — the q114 grid
    // used the way a 100 TB token pipeline uses it: the fixed-size
    // sketch BROADCASTS, each row's estimate is computed MAP-SIDE (one
    // BroadcastHashJoin per depth row, least() over the lanes), and
    // rows whose estimate misses the threshold never reach the exact
    // aggregation's exchange — the long tail is dropped before the
    // shuffle instead of inside it. CMS never undershoots, so no true
    // heavy hitter can be dropped (no false negatives by construction;
    // false positives die in the exact verify). The key stream is a
    // planted geometric distribution (bit-length of the event-id hash's
    // low 16 bits — the engine's replayable Zipf stand-in, since the
    // synthetic corpora are deliberately uniform): ~50% of rows carry
    // k16, ~25% k15, …, giving 6 true heavies at the 1% threshold at
    // every SF. Everything — hash, bucket lanes, grid, estimates,
    // threshold, verify — is integer and rides the value hash.
    "q119_heavy_hitters" -> ((s, d) => {
      import graft.functions.KmvAggregator
      import graft.operators.FreqSketch
      val keys = Tables.events(s, d)
        .select(concat(lit("k"), lpad(length(conv(
          (KmvAggregator.kmvHash(col("event_id")) % 65536 + 1).cast("string"),
          10, 2)).cast("string"), 2, "0")).as("key"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val grid = FreqSketch.countMin(keys, col("key"))
      val total = keys.agg(count(lit(1)).as("total"))
      var probed = keys
      for (dep <- 0 until 4) {
        val gd = grid.filter(col("depth") === dep)
          .select(col("bucket").as(s"bk$dep"), col("cnt").as(s"c$dep"))
        probed = probed.join(broadcast(gd),
          FreqSketch.bucketOf(col("key"), dep, 1024) === col(s"bk$dep"),
          "left").drop(s"bk$dep")
      }
      probed
        .withColumn("est",
          least((0 until 4).map(dd => coalesce(col(s"c$dd"), lit(0L))): _*))
        .crossJoin(broadcast(total)) // 1-row scalar
        .filter(col("est") >= expr("total div 100"))
        .groupBy(col("key"))
        .agg(count(lit(1)).as("exact_cnt"), max(col("est")).as("est"),
          max(expr("total div 100")).as("t"))
        .filter(col("exact_cnt") >= col("t"))
        .select(col("key"), col("exact_cnt"), col("est"),
          (col("est") >= col("exact_cnt")).as("never_undershoots"))
        .orderBy(col("exact_cnt").desc, col("key"))
    }),

    // BPE merge learning — tokenizer training as a distributed op. One
    // corpus pass builds the distinct-word table; each of the 6 rounds
    // is a vocabulary-sized pair-count aggregate whose 1-row winner
    // joins back as a broadcast scalar (the whole 6-round computation is
    // one lazy plan, no driver collects). Winner order (count desc,
    // then lexicographic pair) and the single-scan replace-merge are
    // engine-exact, so the oracle replays all 6 unrolled rounds: chosen
    // pairs, their counts, and the vocab/corpus symbol totals after
    // each merge.
    "q120_bpe_merges" -> ((s, d) => {
      graft.operators.Bpe.learnMerges(t(s, d, "documents"), "text", 6)
    }),

    // Repeated-substring span dedup (Lee et al. 2022) — the dedup mode
    // the engine did not yet own: exact duplicated TOKEN RUNS across
    // the whole corpus, not whole-doc or near-doc duplicates. Sliding
    // 4-gram hashes (48-bit sha256 prefix, computed in the same
    // projection that builds the gram — the string never shuffles),
    // corpus-wide canonical-first-copy election, island-merged spans.
    // The oracle replays tokenization, gram slicing, the hash, the
    // (doc_id, start)-minimum keeper, and the window-function island
    // merge, so the gate is representation-exact end to end. See
    // operators/SpanDedup.spanStats for the 100 TB shape.
    "q121_substring_spans" -> ((s, d) => {
      graft.operators.SpanDedup.spanStats(t(s, d, "documents"), "doc_id", "text", 4)
        .orderBy(col("doc_id"))
    }),

    // EXACT substring spans at Lee et al.'s L = 50 — the suffix-array-
    // grade tier above q121's hashed 4-grams: bounded prefix-doubling
    // equality ranks (6 fixed-width passes, no 50-token gram string ever
    // materialized, no hash identity anywhere). Same marking semantics
    // as q121 (canonical-first keeper, island merge), so the two tiers
    // are drop-in comparable; the oracle replays true window equality
    // with the gram STRING as identity — any rank-composition mistake
    // (wrong shift, off-by-one window, cross-doc leak) desyncs the
    // span sums. See operators/SuffixDedup.scala for the 100 TB shape.
    "q172_exact_spans" -> ((s, d) => {
      graft.operators.SuffixDedup.exactSpanStats(
          t(s, d, "documents"), "doc_id", "text", 50)
        .orderBy(col("doc_id"))
    }),

    // BPE ENCODE — the apply side of q120's merge learning: the same 6
    // merges, applied to every word, rolled up as per-source symbol
    // counts (the compression the learned vocabulary buys on each
    // source). One corpus pass (per-(source, word) counts); everything
    // else — learning AND application — is vocabulary-sized, with the
    // original word string riding the symbol table so encoded lengths
    // join back by word. The oracle replays the full chain: tokenize,
    // learn all 6 winners, apply, re-weight by source.
    "q122_bpe_encode" -> ((s, d) => {
      graft.operators.Bpe.encodeStats(t(s, d, "documents"), "text", "source", 6)
    }),

    // Exact triangle counting over the parts-co-ordered-together graph
    // (parts sharing an order, first 3 line numbers to bound the
    // per-order clique) — the third iterative-graph family member next
    // to pointer-doubling components (q65) and power-iteration
    // PageRank (q117). Degree orientation bounds every wedge fan-out
    // by ~sqrt(2m) on ANY degree distribution — the graph analog of
    // the hot-band cap. All integer, all joins — the oracle replays
    // edge build, degrees, orientation, wedges, closure, and the
    // per-node rollup.
    "q123_triangles" -> ((s, d) => {
      import graft.operators.Graphs
      val li = t(s, d, "lineitem")
        .filter(col("l_linenumber") <= 3)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val edges = li.alias("a").join(li.alias("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").as("u"), col("b.p").as("v"))
        .distinct()
      Graphs.triangleCounts(edges)
        .select(col("n").as("part_id"), col("degree"), col("triangles"))
        .orderBy(col("triangles").desc, col("part_id")).limit(50)
    }),

    // Integer-exact k-means over quantized embeddings — semantic
    // clustering for curation, hash-gated the q117 way: power-of-two
    // quantization makes the double multiply exact, shifted floor
    // division makes centroid means engine-independent, and integer
    // distance sums are associative, so THREE full Lloyd iterations
    // (seeds, every assignment, every centroid update) replay
    // bit-identically in the oracle. Output: per-(cluster, label)
    // membership with the centroid checksum riding every row. See
    // operators/Clustering for the broadcast-argmin 100 TB shape.
    "q124_kmeans" -> ((s, d) => {
      graft.operators.Clustering.kmeansLabelProfile(
        t(s, d, "embeddings"), "vec_id", "embedding", "label", 8, 3)
    }),

    // Cluster-balanced diversity sampling — the curation payoff of
    // q124's clustering: ≤ 5 vectors per semantic cluster by hash-order
    // admission, so every mode the clustering found is covered instead
    // of the dominant one swamping a global sample. The per-cluster
    // rank is a WindowGroupLimit plan (≤ m rows per cluster survive
    // each task before the exchange).
    "q125_diverse_sample" -> ((s, d) => {
      graft.operators.Clustering.diversitySample(
        t(s, d, "embeddings"), "vec_id", "embedding", "label", 8, 3, 5)
    }),

    // Contrastive pair mining from the q124 clusters — the
    // supervision generator for embedding training: anchor/positive
    // from the same cluster (cyclic next in hash order), negative
    // hash-aligned from the next cluster. The oracle replays kmeans,
    // the within-cluster ranks, and both modular pick rules.
    "q203_contrastive_pairs" -> ((s, d) => {
      graft.operators.Clustering.contrastivePairs(
          t(s, d, "embeddings"), "vec_id", "embedding", "label", 8, 3)
        .orderBy(col("anchor_id"))
    }),

    // TrustRank (Gyöngyi et al. 2004) — seeded PageRank for
    // source-quality propagation: teleport mass flows only to a
    // trusted seed set (BUILDING-segment customers), so a node's score
    // is its link-proximity to trust. Same integer-exact fixed-point
    // machinery as q117; the oracle replays all 3 seeded iterations
    // including the zero-base non-seed branch.
    "q126_trustrank" -> ((s, d) => {
      import graft.operators.Graphs
      val pairs = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
      val seeds = t(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select((col("c_custkey") * 2).as("nid"))
      Graphs.integerTrustRank(edges, seeds, 3)
        .select(col("nid"),
          when(col("nid") % 2 === 0, "customer")
            .otherwise("supplier").as("kind"),
          col("tr"))
        .orderBy(col("tr").desc, col("nid")).limit(20)
    }),

    // Incremental substring-span probe against a STANDING gram-stats
    // corpus — the span analog of q104/q108 (build once, probe per
    // batch; the batch's gram hashes broadcast into the corpus-stats
    // scan, the corpus is never re-tokenized per batch). Same mod-10
    // corpus/batch split as q104. The oracle replays the asymmetric
    // canonical rule: corpus grams always win, batch-internal repeats
    // keep their batch-first copy.
    "q127_incremental_spans" -> ((s, d) => {
      standingSplits("q127_incremental_spans").build(s, d)
      standingSplits("q127_incremental_spans").probe(s, d)
    }),

    // Substring-span SCRUBBING — the removal step of Lee et al. 2022
    // (q121 measures, q128 actually rewrites): every duplicated token
    // run is dropped, the corpus-wide canonical copy survives, and the
    // cleaned text is rebuilt in canonical whitespace. The oracle
    // replays marking, coverage explosion, the (doc, position) equi
    // anti-join, and the ordered reconstruction — a single token
    // misplaced anywhere in 5000 documents desyncs the hash.
    "q128_span_scrub" -> ((s, d) => {
      graft.operators.SpanDedup.scrubSpans(t(s, d, "documents"), "doc_id", "text", 4)
        .orderBy(col("doc_id"))
    }),

    // EXACT set-similarity self-join via prefix filtering (AllPairs /
    // PPJoin) — the lossless counterpart of q69's MinHash-LSH: documents
    // join only on their (1-t)-fraction RAREST grams (rare-first global
    // df order), yet the theorem guarantees every qualifying pair
    // collides, so the output is bit-identical to the brute-force join
    // the shared oracle computes. Same 3-gram space and threshold as
    // q69, so the two strategies' pair sets cross-check each other.
    "q129_prefix_join" -> ((s, d) => {
      operators.SimilarityJoin.prefixFilterJoin(t(s, d, "documents"),
          "doc_id", "text", n = 3, threshold = 0.6)
        .select(col("id_a"), col("id_b"), r4(col("jaccard")).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Semantic dedup (SemDeDup): k-means clusters as similarity blocking,
    // within-cluster integer-cosine pruning at τ = 0.95, (hash, id)
    // admission order. The corpus has no natural near-dups (max pairwise
    // cos 0.60), so the query plants q107's +0.001-coord-0 copies of
    // every tenth vector — each lands in its source's cluster (cos
    // ~ 1-1e-7 vs centroid gaps) and is dropped, while every natural
    // pair sits three decades below τ. The oracle replays the ENTIRE
    // decision: three Lloyd iterations over the planted union, 2^10
    // re-quantization, pairwise integer dots, and the admission order.
    "q130_semdedup" -> ((s, d) => {
      val base = t(s, d, "embeddings").select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("embedding"), col("label"))
      val planted = base.filter(col("vec_id") % 10 === 0).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.001)).otherwise(x))
          .as("embedding"),
        col("label"))
      graft.operators.Clustering.semDedup(base.unionByName(planted),
          "vec_id", "embedding", "label", 8, 3)
        .orderBy(col("cid"), col("vec_id"))
    }),

    // Multi-pass sorted-neighborhood near-dup pairs — the linear-cost
    // blocking strategy (w·N candidates by construction, no skew mode):
    // two sort keys (normalized text; alphabetically-sorted tokens),
    // block-prefix windows of 4, exact 3-gram Jaccard verify. The
    // oracle replays both passes' rank windows and the verification;
    // on this corpus the two passes together recover the full exact
    // pair set (the spec measures recall against brute force), so the
    // result coincides with q129's — by blocking, not by construction.
    "q131_sorted_neighborhood" -> ((s, d) => {
      operators.SimilarityJoin.sortedNeighborhoodPairs(t(s, d, "documents"),
          "doc_id", "text", n = 3, threshold = 0.6, window = 4, blockLen = 2)
        .select(col("id_a"), col("id_b"), r4(col("jaccard")).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Label-propagation communities over the q117/q126 co-purchase
    // graph — frequency-argmax with the deterministic (−count, label)
    // tie-break, three synchronous rounds, community rollup with a
    // membership checksum. The oracle unrolls all three majority votes;
    // a single vote flipping anywhere desyncs the rollup hash.
    "q132_label_prop" -> ((s, d) => {
      import graft.operators.Graphs
      val pairs = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
      Graphs.labelPropagation(edges, 3)
        .groupBy(col("lbl").as("community"))
        .agg(count(lit(1)).as("n_members"), sum(col("nid")).as("nid_sum"))
        .orderBy(col("community"))
    }),

    // DSIR importance weighting — data selection for a target domain:
    // hashed unigram+bigram bag models (replayable sha-prefix buckets,
    // B = 1024) for the raw pool and the src0 target slice, add-one
    // smoothing, per-doc log importance weight. The oracle replays
    // tokenization, bucketing, both count models, and the smoothed
    // log-ratio sum; r4 absorbs libm-ln ulps and summation order.
    "q134_importance_weights" -> ((s, d) => {
      operators.Curation.importanceWeights(t(s, d, "documents"),
          "doc_id", "text", "source", targetSource = "src0")
        .select(col("doc_id"), col("source"), col("n_grams"),
          r4(col("logw")).as("logw"))
        .orderBy(col("doc_id"))
    }),

    // Product-quantization ANN — the fourth ANN tier (brute q26, LSH
    // q106, IVF q46): per-subspace integer codebooks, m-code vectors,
    // broadcast LUT + ADC ranking. Everything is integer arithmetic —
    // codebook training, codes, LUT entries, distances, (dist, id)
    // ranks — so the ENTIRE index lifecycle replays in the oracle with
    // no rounding marker anywhere.
    "q137_pq_topk" -> ((s, d) => {
      graft.operators.Clustering.pqTopK(t(s, d, "embeddings"),
          "vec_id", "embedding", dims = 64, m = 8, k = 16, iters = 2,
          topK = 3, queryMod = 50L)
        .select(col("query_id"), col("neighbor_id"), col("dist"),
          col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Winnowing fingerprint overlap (Schleimer et al. 2003 / MOSS) —
    // partial-passage detection: document pairs sharing ≥ 2 selected
    // fingerprints, df-banded [2, 32] to drop boilerplate hashes. The
    // oracle replays tokenization, 4-gram sha hashing, the w=4
    // rightmost-min window selection (struct min — lexicographic in
    // both engines), the df band, and the pair rollup.
    "q138_winnow_pairs" -> ((s, d) => {
      graft.operators.Winnow.fingerprintPairs(t(s, d, "documents"),
          "doc_id", "text", k = 4, w = 4, minShared = 2, maxDf = 32)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // BM25 top-k retrieval (Okapi weighting, Lucene-style non-negative
    // IDF) — query-by-example: three corpus documents as queries, each
    // retrieving its top 10 by summed term weight. Ranking is on the
    // r4-ROUNDED score (then doc_id) so near-ties resolve identically
    // in both engines; r4 also absorbs libm-ln ulps and float summation
    // order. The oracle replays tokenization, tf/df/dl/avgdl, the exact
    // IDF and saturation formulas (constants written as the same folded
    // IEEE literals), and the ranked cut.
    "q139_bm25_topk" -> ((s, d) => {
      import graft.functions.TextFunctions
      val docs = t(s, d, "documents")
      val qt = docs.filter(col("doc_id").isin(7L, 20L, 33L))
        .select(col("doc_id").as("query_id"),
          explode(TextFunctions.tokens(
            TextFunctions.normalizeWs(col("text")))).as("term"))
        .distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
      operators.Retrieval.bm25Scores(docs, "doc_id", "text", qt)
        .withColumn("score", r4(col("score")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // k-core decomposition (k = 4) over the SPARSE parts graph (first 2
    // line numbers → one co-order edge per order) — dense graphs peel
    // in one round, this one cascades for up to 4 (measured at sf0.1).
    // The operator early-stops at the monotone fixpoint; the oracle
    // unrolls 8 synchronous peel rounds, no-ops once converged, so the
    // two agree whether or not the data used every round.
    "q140_kcore" -> ((s, d) => {
      import graft.operators.Graphs
      val li = t(s, d, "lineitem").filter(col("l_linenumber") <= 2)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val pairs = li.alias("a").join(li.alias("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").as("u"), col("b.p").as("v"))
        .distinct()
      val edges = pairs.select(col("u").as("src"), col("v").as("dst"))
        .unionByName(pairs.select(col("v").as("src"), col("u").as("dst")))
      Graphs.kCore(edges, k = 4, maxRounds = 8).orderBy(col("nid"))
    }),

    // Hilbert-curve layout key — q99's Morton sibling on the same
    // (quantity, price) rank grid: strictly better locality (every
    // consecutive key step is an adjacent cell; Morton jumps diagonally
    // at power-of-two boundaries). Pure unrolled integer bit math; the
    // oracle replays the xy2d recurrence level by level through
    // MATERIALIZED CTEs.
    "q141_hilbert_key" -> ((s, d) => {
      operators.Layout.hilbertKeyFromCuts(
          t(s, d, "lineitem"),
          "l_quantity" -> zQtyCuts, "l_extendedprice" -> zPriceCuts,
          bits = 4, hCol = "hkey")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("hkey"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // CCNet-style LM perplexity buckets (Wenzek et al. 2020): add-one
    // unigram model trained on the src0 reference slice, every document
    // scored by cross-entropy, head/middle/tail split at fixed
    // percentile cut scores (the paper's rule — exact percentile_disc
    // order statistics of the r4-rounded score, ties to the lower
    // bucket) assigned map-side from a broadcast cut array. The oracle
    // replays training, smoothing, the tf-weighted ln-sum, the integer
    // cum·k ≥ b·N cut selection, and the strict-greater assignment.
    "q142_lm_perplexity" -> ((s, d) => {
      val docs = t(s, d, "documents")
      operators.Perplexity.perplexityBuckets(docs, "doc_id", "text",
          docs.filter(col("source") === "src0"), "text",
          buckets = 3, r4)
        .orderBy(col("doc_id"))
    }),

    // Two-sample Kolmogorov–Smirnov drift between data slices — the
    // distribution-shift alarm for snapshot-over-snapshot pipelines:
    // exact per-distinct-value D for the bounded-cardinality quantity
    // column, 1024-bucket binned D for the continuous price column.
    // The statistic is integer-exact (decimal cross-multiplication,
    // one final division); the oracle replays binning, cumulative
    // counts, and the sup.
    "q143_ks_drift" -> ((s, d) => {
      import graft.operators.Diff
      val li = t(s, d, "lineitem")
      val price = Diff.ksDrift(
          li.filter(year(col("l_shipdate")) === 1995),
          li.filter(year(col("l_shipdate")) === 2000),
          "l_extendedprice", buckets = 1024)
        .withColumn("metric", lit("price_1995_vs_2000"))
      val qty = Diff.ksDrift(
          li.filter(col("l_returnflag") === "A"),
          li.filter(col("l_returnflag") === "R"),
          "l_quantity", buckets = 0)
        .withColumn("metric", lit("qty_A_vs_R"))
      price.unionByName(qty)
        .select(col("metric"), r6(col("d")).as("d"),
          col("n_a"), col("n_b"))
        .orderBy(col("metric"))
    }),

    // Reciprocal-rank fusion (Cormack et al. 2009) — hybrid retrieval:
    // the q139 BM25 ranking fused with a brute-force embedding-cosine
    // ranking for the same three example queries, 1/(60 + rank) each,
    // top 10 by fused score. Both input rankings rank on ROUNDED scores
    // (r4 BM25 / r6 cosine) so every rank — and therefore every fused
    // double — replays identically in the oracle.
    "q144_rrf_hybrid" -> ((s, d) => {
      import graft.functions.TextFunctions
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, d, "documents")
      val qt = docs.filter(col("doc_id").isin(7L, 20L, 33L))
        .select(col("doc_id").as("query_id"),
          explode(TextFunctions.tokens(
            TextFunctions.normalizeWs(col("text")))).as("term"))
        .distinct()
      val wb = Window.partitionBy("query_id")
        .orderBy(col("score").desc, col("doc_id"))
      val bm25 = operators.Retrieval.bm25Scores(docs, "doc_id", "text", qt)
        .withColumn("score", r4(col("score")))
        .withColumn("rank", row_number().over(wb))
        .filter(col("rank") <= 20)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val emb = t(s, d, "embeddings")
      val we = Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("doc_id"))
      val embList = emb
        .select(col("vec_id").as("doc_id"),
          Similarity.asDouble(col("embedding")).as("cv"))
        .crossJoin(broadcast(emb.filter(col("vec_id").isin(7L, 20L, 33L))
          .select(col("vec_id").as("query_id"),
            Similarity.asDouble(col("embedding")).as("qv"))))
        .withColumn("cos", r6(Similarity.cosine(col("qv"), col("cv"))))
        .withColumn("rank", row_number().over(we))
        .filter(col("rank") <= 20)
        .select(col("query_id"), col("doc_id"), col("rank"))
      operators.Retrieval.rrfFuse(Seq(bm25, embList), kConst = 60, topK = 10)
        .select(col("query_id"), col("doc_id"), r6(col("rrf")).as("rrf"),
          col("n_lists"), col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // HyperBall (Boldi–Vigna 2013): neighborhood function N(t) for
    // t = 0..3 over the sparse parts graph via per-node HLL counters
    // (p = 6, the q116 register spec). reg_sum pins the registers
    // integer-exactly; nf_micro sums per-node estimates pre-rounded to
    // micro-units so the total is order-independent. The oracle pays
    // the EXACT cost the sketch avoids: materialized BFS balls (20M
    // membership rows at sf0.1 by t = 3, vs 64-byte counters here).
    "q145_hyperball" -> ((s, d) => {
      import graft.operators.Graphs
      val li = t(s, d, "lineitem").filter(col("l_linenumber") <= 2)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val pairs = li.alias("a").join(li.alias("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").as("u"), col("b.p").as("v"))
        .distinct()
      val edges = pairs.select(col("u").as("src"), col("v").as("dst"))
        .unionByName(pairs.select(col("v").as("src"), col("u").as("dst")))
      Graphs.hyperBall(edges, rounds = 3, p = 6).orderBy(col("t"))
    }),

    // EXACT standing-corpus near-dup probe — the lossless member of
    // the q104/q108/q127 standing-probe family: a batch prefix-probes
    // the corpus's inverted gram index under corpus-rare-first order;
    // candidate generation is provably complete, the verify is exact.
    // Same mod-10 split as q104, so q104's banded pair set is this
    // query's pair set iff the bands missed nothing (cross-checked in
    // the spec). The oracle is brute-force cross Jaccard — exactness
    // IS the gate.
    "q136_incremental_exact" -> ((s, d) => {
      standingSplits("q136_incremental_exact").build(s, d)
      standingSplits("q136_incremental_exact").probe(s, d)
    }),

    // EXACT containment join at τ = 4/5 — the asymmetric similarity:
    // finds docs substantially contained in another (truncations,
    // excerpts) that symmetric Jaccard misses when the container is
    // much larger. Directional pairs; the decision is pure integer
    // arithmetic (τden·overlap ≥ τnum·|x|). Gates against brute force:
    // prefix filtering on the contained side is lossless.
    "q135_containment_join" -> ((s, d) => {
      operators.SimilarityJoin.containmentJoin(t(s, d, "documents"),
          "doc_id", "text", n = 3, tauNum = 4, tauDen = 5)
        .select(col("id_a"), col("id_b"),
          r4(col("containment")).as("containment"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // EXACT edit-distance join at k = 2 over 32-char lowercased text
    // keys — the CHARACTER-level exact similarity join (typos, OCR
    // noise, near-identical titles) next to the set-level Jaccard /
    // containment joins. Ed-Join prefix filtering (k·q+1 rare-first
    // positional grams) + length/position filters + banded Levenshtein
    // verify; the corpus is the doc_id % 5 slice with deterministic
    // planted edits (one substitution or one deletion at char 8) so
    // the pair set is non-trivial at every SF. Gates against DuckDB's
    // own levenshtein over the brute-force length-banded pair space:
    // losslessness IS the gate.
    "q146_edit_join" -> ((s, d) => {
      val base = t(s, d, "documents")
        .filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("id"),
          substring(lower(col("text")), 1, 32).as("s"))
      val planted = base.filter(col("id") % 25 === 0)
        .select((col("id") + 1000000L).as("id"),
          when(col("id") % 50 === 0,
            concat(substring(col("s"), 1, 7), lit("x"),
              substring(col("s"), 9, 24)))
          .otherwise(concat(substring(col("s"), 1, 7),
            substring(col("s"), 9, 24))).as("s"))
      operators.SimilarityJoin.editDistanceJoin(
          base.unionByName(planted), "id", "s", k = 2, q = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // C4-style blocklist filtering: unigram + two-word-phrase entries
    // matched on the normalized token stream (word-boundary semantics
    // by construction), per-doc occurrence and distinct-entry counts,
    // keep = no hits. Pure map stage — the list rides the plan as
    // codegen literals. The oracle replays tokenization, the bigram
    // view, and both counters.
    "q147_blocklist" -> ((s, d) => {
      operators.TextAnalysis.blocklistFilter(t(s, d, "documents"),
          "doc_id", "text", Seq("slow", "broken", "fast table", "row scan"))
        .select(col("doc_id"), col("n_hits"), col("n_terms"), col("keep"))
        .orderBy(col("doc_id"))
    }),

    // PMI collocations (Church & Hanks): which adjacent word pairs
    // co-occur beyond chance — the vocabulary-curation signal BPE's raw
    // frequency misses. Integer unigram/bigram/total counts are exact;
    // the ln ratio rides r4 (the q71/q134 libm-ulp convention).
    "q148_pmi" -> ((s, d) => {
      operators.TextAnalysis.pmiCollocations(t(s, d, "documents"),
          "text", minCount = 20L)
        .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
          r4(col("pmi")).as("pmi"))
        .orderBy(col("w1"), col("w2"))
    }),

    // First CONTAINER format through the codec seam: synthesizeZip emits
    // standards-valid ZIP archives (1-3 members; sha256-chain names,
    // sizes, and content; stored/deflate alternating by parity) and
    // decodeZip does the full parse — EOCD backward scan, central
    // directory walk, local-header cross-check, raw-deflate bodies, and
    // per-member CRC32 validation — exploding each blob into member ROWS
    // (the binary explode). The oracle replays the member-content
    // formula: decoded bytes are independent of the compression
    // representation, so any offset, inflate, or directory-walk mistake
    // desyncs the integer lanes and the hash goes red.
    "q149_zip_members" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeZip(s, 200)
      operators.Multimodal.memberFeatures(
          operators.Multimodal.extractMembers(media, operators.Multimodal.decodeZip))
        .toDF()
        .orderBy(col("media_id"), col("member_idx"))
    }),

    // Aho-Corasick multi-pattern SUBSTRING scan — q147's scale path:
    // every occurrence (overlaps included) of every pattern in one text
    // pass, pattern list broadcast as an automaton instead of riding the
    // plan as literals. The pattern set exercises the automaton's hard
    // edges in-gate: "le" ends inside "table" (fail-link emission),
    // "scan" is a prefix of "row scan"-adjacent text, "a a" self-overlaps
    // in "a a a" runs, "an" fires inside "scan". The oracle is
    // brute-force substring counting over every (position, pattern) pair:
    // losslessness IS the gate.
    "q150_ac_scan" -> ((s, d) => {
      operators.TextAnalysis.multiPatternScan(t(s, d, "documents"),
          "doc_id", "text",
          Seq("table", "le", "a a", "scan", "an", "row scan", "t t"))
        .orderBy(col("doc_id"))
    }),

    // URL canonicalization + per-registered-domain cap — the crawl
    // curation stage before URL-level dedup. URLs are synthesized from
    // doc_id by a formula both engines replay (mixed-case scheme/host,
    // www prefixes, default and non-default ports, unsorted query
    // params, fragments, trailing slashes — every normalization rule
    // exercised in-gate, including the http://host:443 trap where the
    // NON-matching default port must be kept); the gated artifact is the
    // normalize → registered-domain → top-3-per-domain chain.
    "q151_url_domain_cap" -> ((s, d) => {
      val i = col("doc_id")
      val url = concat(
        when(i % 5 === 0, lit("HTTP")).otherwise(lit("https")),
        lit("://"),
        when(i % 3 === 0, lit("www.")).otherwise(lit("")),
        when(i % 9 === 0, lit("SiTe")).otherwise(lit("site")),
        (i % 17).cast("string"), lit("."),
        element_at(array(lit("com"), lit("org"), lit("co.uk"), lit("io")),
          (i % 4).cast("int") + 1),
        when(i % 10 === 0, lit(":80")).when(i % 7 === 0, lit(":8080"))
          .when(i % 11 === 0, lit(":443")).otherwise(lit("")),
        lit("/p/"), (i % 13).cast("string"),
        when(i % 6 === 0, lit("/")).otherwise(lit("")),
        when(i % 2 === 0,
          concat(lit("?b="), (i % 5).cast("string"), lit("&a=1")))
          .otherwise(lit("")),
        when(i % 4 === 0, lit("#sec")).otherwise(lit("")))
      operators.Curation.domainCap(
          t(s, d, "documents").withColumn("url", url),
          "url", "n_chars", "doc_id", cap = 3)
        .select(col("doc_id"), col("url_norm"), col("domain"),
          col("rk").cast("long").as("rk"))
        .orderBy(col("doc_id"))
    }),

    // Second container format through the codec seam: concatenated gzip
    // members (the crawl-dump shard shape). synthesizeGzip cycles every
    // RFC 1952 optional header field (FNAME/FEXTRA/FCOMMENT/FHCRC) so
    // all header paths are in-gate; decodeGzipMembers walks headers,
    // validates header CRC16 + trailer CRC32 + ISIZE, and explodes
    // members into rows through the same extractMembers seam as q149.
    "q153_gzip_members" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeGzip(s, 200)
      operators.Multimodal.memberFeatures(
          operators.Multimodal.extractMembers(media,
            operators.Multimodal.decodeGzipMembers))
        .toDF()
        .orderBy(col("media_id"), col("member_idx"))
    }),

    // Third container format through the codec seam, and the first with
    // TEXT headers: WARC (ISO 28500) — the shard format every public
    // crawl ships as. synthesizeWarc cycles both version lines, a
    // skippable extension header, LOWERCASE header names (the
    // case-insensitivity contract), absent target URIs, and three record
    // types; block content is raw sha bytes that can contain "WARC/1.0",
    // so a separator-scanning parser (instead of Content-Length
    // delimiting) desyncs the lanes.
    "q158_warc_records" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeWarc(s, 200)
      operators.Multimodal.memberFeatures(
          operators.Multimodal.extractMembers(media,
            operators.Multimodal.decodeWarc))
        .toDF()
        .orderBy(col("media_id"), col("member_idx"))
    }),

    // Fourth container through the codec seam: POSIX ustar tar — the
    // fixed-width-octal-header family (vs ZIP's little-endian binary,
    // gzip's bit-packed deflate, WARC's free-text headers). Checksums
    // validated with the blanked-field rule, octal sizes parsed, content
    // blocks rounded to 512 with zero padding verified, end marker
    // checked. Directories ((id+k) % 4 = 0) keep the zero-size path
    // in-gate: their feature lanes take the documented -1 endpoints.
    "q161_tar_entries" -> ((s, d) => {
      val media = operators.Multimodal.synthesizeTar(s, 200)
      operators.Multimodal.memberFeatures(
          operators.Multimodal.extractMembers(media,
            operators.Multimodal.decodeTar))
        .toDF()
        .orderBy(col("media_id"), col("member_idx"))
    }),

    // HTML character-reference decoding (13th native expression): the
    // markup-stripping companion — named subset + decimal/hex numeric
    // forms, one left-to-right pass with no re-scan (&amp;amp; decodes
    // once), invalid code points and unknown names verbatim. Planted
    // tails cover named/decimal/hex (all resolving to the same é in
    // class 2 — a case-folding or dedup slip desyncs), astral-plane
    // code points, and the full decoy set (AT&T, unknown names,
    // surrogates, missing semicolons). The oracle holds the EXPECTED
    // decoded text via chr() literals — the engine must earn it by
    // actually decoding.
    "q162_entity_decode" -> ((s, d) => {
      val m = col("doc_id") % 6
      val tail = when(m === 1, lit(" fish &amp; chips &lt;b&gt;"))
        .when(m === 2, lit(" caf&eacute; &#233; &#xE9;"))
        .when(m === 3, lit(" snow &#x2603; &#9731; &#x1F600;"))
        .when(m === 4, lit(" AT&T &notreal; &#xD800; &gt"))
        .when(m === 5, lit(" q&hellip; &laquo;x&raquo;"))
        .otherwise(lit(""))
      t(s, d, "documents")
        .select(col("doc_id"),
          expressions.HtmlEntityDecodeFn(concat(col("text"), tail)).as("s"))
        .select(col("doc_id"), col("s.decoded").as("decoded"),
          col("s.n_decoded").as("n_decoded"))
        .orderBy(col("doc_id"))
    }),

    // fastText-style hashed linear quality classifier INFERENCE — the
    // model-based quality-filter stage of CCNet/LLaMA-class pipelines:
    // a fixed-point linear model over hashed unigram+bigram counts,
    // scored IN THE ROW (zero exchanges: the weights vector folds to
    // one plan constant, nothing per-document leaves the scan task;
    // plan pinned in PlanSpec). The synthetic model is a deterministic
    // LCG over the bucket id, so the oracle rebuilds identical weights
    // and replays bucket hashing (sha-prefix kmvHash mod 512),
    // occurrence sums, and the bias/threshold decision — everything
    // Long, no rounding marker anywhere.
    "q163_quality_classifier" -> ((s, d) => {
      val weights = Array.tabulate(512)(b =>
        (b.toLong * 1103515245L + 12345L) % 2001L - 1000L)
      operators.Curation.linearQualityScore(t(s, d, "documents"),
          "doc_id", "text", weights, bias = 50L, thrNum = 25L, thrDen = 2L)
        .select(col("doc_id"), col("n_grams"), col("score_sum"),
          col("score_num"), col("keep"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic weighted fair interleave — the training-order
    // materialization step: smooth weighted round-robin carried as an
    // EXACT integer virtual-time key (the j-th row of source s sorts by
    // (2j+1)·(lcm/w_s)), per-source ranks from sub-bucketed windows
    // (N = 4, the q98/q105 scale convention) with broadcast offsets.
    // Weights derive from the source suffix (1 + suffix mod 4, lcm 12)
    // so the oracle rebuilds them in a CASE and replays ticket hashing,
    // bucket ranks, offsets, and the key — everything Long.
    "q164_interleave_key" -> ((s, d) => {
      val weights = (0 until 20).map(k => s"src$k" -> (1L + k % 4)).toMap
      operators.Curation.weightedInterleaveKey(t(s, d, "documents"),
          "doc_id", "source", weights, subBuckets = 4)
        .select(col("doc_id"), col("source"), col("src_idx"), col("pos_key"))
        .orderBy(col("pos_key"), col("source"))
    }),

    // Weighted rendezvous (HRW) shard assignment — output sharding with
    // the minimal-disruption property (hash mod N remaps everything on
    // any N change; HRW remaps only the changed shard's share). Shard s
    // at weight w expands to w virtual nodes; winner = lexicographic
    // max (sha-prefix score, shard) — integer-exact, so the oracle
    // replays every score and the argmax. Computed IN THE ROW against
    // one folded vnode literal: zero exchanges (PlanSpec-pinned).
    "q165_rendezvous_shard" -> ((s, d) => {
      operators.Curation.rendezvousShard(t(s, d, "documents"),
          "doc_id", Map("shard_a" -> 1, "shard_b" -> 2, "shard_c" -> 3),
          salt = "rv9")
        .select(col("doc_id"), col("shard"), col("shard_score"))
        .orderBy(col("doc_id"))
    }),

    // Unicode script-mix profile — the mixed-script / homoglyph gate:
    // per-doc character counts for the five major scripts + the mixed
    // verdict. Planted tails cover each script and the confusable
    // classic (Cyrillic а inside a Latin token). Both engines count the
    // SAME Unicode script property through independent regex engines
    // (JDK \p{IsXxx} vs RE2 \p{Xxx}) — a genuine two-way check, the
    // q155 posture.
    "q166_script_mix" -> ((s, d) => {
      val m = col("doc_id") % 6
      val tail = when(m === 1, lit(" привет"))
        .when(m === 2, lit(" αβγ"))
        .when(m === 3, lit(" 中文"))
        .when(m === 4, lit(" مرحبا"))
        .when(m === 5, lit(" pаypal"))
        .otherwise(lit(""))
      operators.TextAnalysis.scriptMix(
          t(s, d, "documents")
            .select(col("doc_id"), concat(col("text"), tail).as("text")),
          "doc_id", "text")
        .select(col("doc_id"), col("n_latin"), col("n_cyrillic"),
          col("n_greek"), col("n_han"), col("n_arabic"),
          col("n_scripts"), col("mixed"))
        .orderBy(col("doc_id"))
    }),

    // Stupid Backoff bigram LM scoring (Brants et al. 2007) — the
    // context-sensitive LM filter next to q142's unigram perplexity,
    // and the one backoff scheme with a CLOSED oracle replay (fixed
    // α = 0.4, deliberately unnormalized). Model trained on the src0
    // slice; every adjacent token pair of every document scores
    // c2/c1(w1) or α·add-one-unigram; ln-sums under r4 (the q71/q134
    // libm-ulp convention).
    "q167_stupid_backoff" -> ((s, d) => {
      val docs = t(s, d, "documents")
      operators.Perplexity.stupidBackoffScore(docs, "doc_id", "text",
          docs.filter(col("source") === "src0"), "text")
        .select(col("doc_id"), col("n_pairs"), r4(col("logsb")).as("logsb"))
        .orderBy(col("doc_id"))
    }),

    // Vocabulary coverage curve — "how many token types cover p% of
    // occurrences": Zipf diagnostic + vocabulary-sizing analysis.
    // Ranks order by (count DESC, token), the coverage test is pure
    // integer cross-multiplication — the whole curve replays exactly.
    "q168_vocab_coverage" -> ((s, d) => {
      operators.TextAnalysis.vocabCoverage(t(s, d, "documents"), "text",
          Seq(50, 90, 95, 99))
        .orderBy(col("pct"))
    }),

    // Per-source KL divergence from the corpus pool — the categorical
    // drift alarm next to q143's numeric KS. The engine computes the
    // absent-word decomposition (no source×vocab cross); the oracle
    // replays the NAIVE full-support sum, so the r4 gate checks the
    // decomposition algebra itself.
    "q169_kl_source_drift" -> ((s, d) => {
      operators.Diff.klSourceDrift(t(s, d, "documents"), "source", "text")
        .select(col("source"), col("n_tok"), col("vocab_present"),
          r4(col("kl")).as("kl"))
        .orderBy(col("source"))
    }),

    // Composed IVF-PQ (FAISS IVFADC) — the production ANN serving tier
    // uniting q46's inverted-file routing with q137's product-
    // quantization ADC: queries probe their nprobe nearest coarse cells
    // and only vectors assigned there are ADC-ranked. Integer-exact end
    // to end (sha-sampled coarse cells scored by integer L2, the q137
    // codebook unchanged), so the oracle replays the entire composed
    // index — cells, routing, probes, codes, LUT, ranks — with no
    // rounding marker.
    "q170_ivfpq_topk" -> ((s, d) => {
      graft.operators.Clustering.ivfPqTopK(t(s, d, "embeddings"),
          "vec_id", "embedding", dims = 64, m = 8, k = 16, iters = 2,
          cells = 16, nprobe = 4, topK = 3, queryMod = 50L)
        .select(col("query_id"), col("neighbor_id"), col("dist"),
          col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // C4-style PII scrubbing: emails, cards, SSNs, phones, IPv4 replaced
    // by type tokens in a FIXED chain (card before ssn/phone so 16-digit
    // groups win over their substrings; ip last), per-type counts taken
    // on each stage's input. Planted tails cover every pattern plus
    // decoys (version string, 5-4 digit run) that word boundaries must
    // keep out. Both engines run the same chain — the patterns live in
    // the Java-regex ∩ RE2 common subset by construction.
    "q160_pii_scrub" -> ((s, d) => {
      val i = col("doc_id")
      val m = i % 8
      val tail = when(m === 1, concat(lit(" mail user"), i.cast("string"),
          lit("@example"), (i % 7).cast("string"), lit(".com ok")))
        .when(m === 2, concat(lit(" card 4111 1111 1111 "),
          (lit(1000) + i % 9000).cast("string")))
        .when(m === 3, concat(lit(" ssn 123-45-"),
          (lit(1000) + i % 9000).cast("string")))
        .when(m === 4, concat(lit(" call (555) "),
          (lit(100) + i % 900).cast("string"), lit("-"),
          (lit(1000) + i % 9000).cast("string")))
        .when(m === 5, concat(lit(" phone 555-"),
          (lit(100) + i % 900).cast("string"), lit("-"),
          (lit(1000) + i % 9000).cast("string")))
        .when(m === 6, concat(lit(" host 10."), (i % 256).cast("string"),
          lit(".0."), (i % 250).cast("string")))
        .when(m === 7, lit(" version 1.2.3.4000 build 123-456-78901"))
        .otherwise(lit(""))
      operators.TextAnalysis.piiScrub(
          t(s, d, "documents").select(col("doc_id"),
            concat(col("text"), tail).as("text")),
          "text")
        .select(col("doc_id"), col("text_clean"), col("n_email"),
          col("n_card"), col("n_ssn"), col("n_phone"), col("n_ip"))
        .orderBy(col("doc_id"))
    }),

    // UTF-8 validation stats (12th native expression): RFC 3629
    // well-formedness scanned byte-by-byte with skip-1 recovery over a
    // BINARY column — the encoding-hygiene gate before any text op. The
    // synthesized corpus is sha-chain random bytes (a dense mix of every
    // malformed shape) plus per-class planted tails covering each
    // verdict lane: valid 2/3/4-byte sequences, a UTF-16 surrogate
    // (ED A0 80), and a truncated lead (C3 41). The oracle replays the
    // POSITION-LOCAL formulation (classify each byte from ≤3 neighbors
    // via window functions — equivalent to the sequential scan by
    // UTF-8's self-synchronization, the property Utf8StatsSpec fuzzes).
    "q159_utf8_stats" -> ((s, d) => {
      import s.implicits._
      val bin = t(s, d, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          def sha(tag: String): Array[Byte] =
            java.security.MessageDigest.getInstance("SHA-256")
              .digest(s"42:$tag:$id".getBytes("UTF-8"))
          val len = 16 + (sha("u8len")(0) & 0xff) % 32
          val rnd = (sha("u8") ++ sha("u8b")).take(len)
          val tail = ((id % 6).toInt match {
            case 1 => Array(0xC3, 0xA9)             // é
            case 2 => Array(0xE2, 0x82, 0xAC)       // €
            case 3 => Array(0xF0, 0x9F, 0x92, 0x96) // 4-byte emoji
            case 4 => Array(0xED, 0xA0, 0x80)       // surrogate D800
            case 5 => Array(0xC3, 0x41)             // truncated lead
            case _ => Array.empty[Int]
          }).map(_.toByte)
          (id, rnd ++ tail)
        }.toDF("doc_id", "bytes")
      bin.select(col("doc_id"), expressions.Utf8StatsFn(col("bytes")).as("s"))
        .select(col("doc_id"), col("s.*"))
        .orderBy(col("doc_id"))
    }),

    // robots.txt rule application (RFC 9309 subset): per-domain
    // allow/disallow path-prefix rules, longest match wins, allow wins
    // same-length ties, default allow. The synthesized rule sets (keyed
    // by domain-length class) plant every semantic branch in-gate: a
    // shorter disallow overridden by a longer allow, an exact
    // allow/disallow TIE, a blanket disallow with one carve-out, and
    // rule-free domains. The rules broadcast; the winner reduces via a
    // partial-aggregating max(struct), never a second URL-scale join.
    "q154_robots_rules" -> ((s, d) => {
      import s.implicits._
      val i = col("doc_id")
      val urls = t(s, d, "documents").select(col("doc_id"),
        concat(lit("site"), (i % 17).cast("string"), lit("."),
          element_at(array(lit("com"), lit("org"), lit("co.uk"), lit("io")),
            (i % 4).cast("int") + 1)).as("domain"),
        concat(lit("/p/"), (i % 13).cast("string")).as("path"))
      val doms = urls.select("domain").distinct()
        .withColumn("rs", length(col("domain")) % 3)
      val ruleDefs = Seq(
        (0, "disallow", "/p/1"), (0, "allow", "/p/12"),
        (0, "allow", "/p/3"), (0, "disallow", "/p/3"),
        (1, "disallow", "/p/"), (1, "allow", "/p/7"),
      ).toDF("rs", "rtype", "prefix")
      val rules = doms.join(ruleDefs, "rs").select("domain", "rtype", "prefix")
      operators.Curation.robotsFilter(urls, "doc_id", "domain", "path", rules)
        .orderBy(col("doc_id"))
    }),

    // Unicode NFC normalization through the 11th native codegen
    // expression: real crawls carry "é" both precomposed (U+00E9) and
    // decomposed (e + U+0301), and every byte-level dedup key treats
    // them as different documents until someone canonicalizes. Planted
    // tails exercise Latin combining marks (compose), precomposed text
    // (already NFC — the fast path), and algorithmic Hangul jamo
    // composition (LVT → one syllable). The oracle is a genuine TWO-WAY
    // implementation check, not a replay: DuckDB's nfc_normalize is
    // utf8proc, the Spark side is java.text.Normalizer — two independent
    // UAX #15 implementations that must agree byte-for-byte.
    "q155_nfc_normalize" -> ((s, d) => {
      val m = col("doc_id") % 5
      val tail = when(m === 0, lit("e\u0301"))       // e + COMBINING ACUTE
        .when(m === 1, lit("A\u030A"))               // A + COMBINING RING ABOVE
        .when(m === 2, lit("\u00E9"))                // precomposed e-acute
        .when(m === 3, lit("\u1100\u1161\u11A8"))  // Hangul jamo LVT -> U+AC01
        .otherwise(lit(""))
      val fl = concat(col("text"), lit(" "), tail)
      t(s, d, "documents")
        .select(col("doc_id"),
          length(fl).cast("long").as("raw_len"),
          length(expressions.NfcNormalizeFn(fl)).cast("long").as("nfc_len"),
          (expressions.NfcNormalizeFn(fl) =!= fl).as("changed"),
          expressions.NfcNormalizeFn(tail).as("tail_nfc"))
        .orderBy(col("doc_id"))
    }),

    // EXACT weighted sampling without replacement — the data-mixing
    // primitive: k docs, inclusion proportional to an integer quality
    // weight, Efraimidis–Spirtes order realized through integer ticket
    // minima (min of w 48-bit sha256 tickets per row; monotone map to
    // exponential clocks makes the ascending-ticket order EXACTLY the
    // successive weighted draw). No floating point anywhere: selection,
    // order, and ranks replay bit-identically in the oracle — a wrong
    // ticket, a wrong min, or a wrong tie-break desyncs the whole list.
    // Weights 1..8 derive from n_chars so every weight class is in-gate.
    "q156_weighted_sample" -> ((s, d) => {
      operators.Curation.weightedSample(
          t(s, d, "documents")
            .withColumn("w", (col("n_chars") % 8 + 1).cast("int")),
          "doc_id", "w", k = 100, salt = "ws")
        .orderBy(col("rank"))
    }),

    // Host-graph extraction: the crawl's markup becomes the weighted
    // cross-publisher edge list that PageRank/TrustRank/k-core/HyperBall
    // (q117/q126/q140/q145) consume. The engine EXTRACTS from real
    // markup (regexp over synthesized anchors); the oracle replays the
    // anchor GENERATION formula — so a regex that swallows a decoy
    // (img src, single-quoted href, data-href, relative href) or misses
    // a real anchor desyncs rows/counts. Planted in-gate: self-links
    // (doc_id % 17 = 0 pages link themselves — dropped), duplicate
    // links (doc_id % 5 = 0 pages link their first target twice —
    // n_links > n_pages), www prefixes and all four TLDs.
    "q157_link_graph" -> ((s, d) => {
      val i = col("doc_id")
      def tld(off: Column) = element_at(
        array(lit("com"), lit("org"), lit("co.uk"), lit("io")),
        (off % 4).cast("int") + 1)
      def anchor(j: Int) = when(i % 3 >= j, concat(
        lit(" <a href=\"https://"),
        when((i + j) % 3 === 0, lit("www.")).otherwise(lit("")),
        lit("site"), ((i * 7 + j) % 17).cast("string"), lit("."),
        tld(i + lit(j)),
        lit("/p/"), ((i + j) % 13).cast("string"),
        lit("\">x</a>"))).otherwise(lit(""))
      val dup = when(i % 5 === 0, concat(
        lit(" <a href=\"https://site"), ((i * 7) % 17).cast("string"),
        lit("."), tld(i), lit("/again\">x2</a>"))).otherwise(lit(""))
      val html = concat(col("text"),
        lit(" <img src=\"https://decoy.net/x.png\">"),
        lit(" <a href='https://squot.org/'>y</a>"),
        lit(" <a data-href=\"https://datahref.io/\">z</a>"),
        lit(" <a href=\"/relative/path\">r</a>"),
        anchor(0), anchor(1), anchor(2), dup)
      val src = concat(lit("site"), (i % 17).cast("string"), lit("."), tld(i))
      operators.Curation.linkGraph(
          t(s, d, "documents").select(col("doc_id"),
            src.as("src_domain"), html.as("html")),
          "doc_id", "src_domain", "html")
        .orderBy(col("src_domain"), col("dst_domain"))
    }),

    // ColBERT-style MaxSim late-interaction retrieval: embeddings become
    // multi-vector documents (vec_id DIV 8 = doc, vec_id % 8 = token
    // position), queries are every 20th doc's first 4 token vectors, and
    // score(q, d) = sum over query tokens of the best-matching doc-token
    // dot product — all over int8 codes from quantizeInt8, so every dot,
    // max, sum, and rank replays exactly in the oracle (no rounding
    // marker). Completes the retrieval column: lexical (q139), fused
    // (q144), single-vector ANN (q26/q46/q106/q137), late interaction.
    "q152_maxsim_topk" -> ((s, d) => {
      val toks = t(s, d, "embeddings").select(
        expr("vec_id DIV 8").as("doc_id"),
        expr("vec_id % 8").as("token_idx"),
        operators.Embeddings.quantizeInt8(col("embedding"))
          .getField("q").as("q"))
      val queries = toks
        .filter(col("doc_id") % 20 === 0 && col("token_idx") < 4)
        .select(col("doc_id").as("query_id"), col("token_idx"), col("q"))
      operators.Retrieval.maxSimTopK(toks, queries, topK = 5)
        .select(col("query_id"), col("doc_id"), col("maxsim"),
          col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),
  )

  /** Bench-side split of the standing-corpus probes (VERDICT r6 #4).
    *
    * The graded queries q104/q108 stay end-to-end — corpus standing-table
    * build THEN batch probe — so the DuckDB hash gate covers the whole
    * workflow. But the number the 100 TB design argues for is the
    * PER-BATCH probe cost against an already-built corpus (the build is a
    * one-time cost amortized over every subsequent batch), and folding an
    * O(corpus) parquet write into the timed body made q104/q108 the two
    * most expensive bench entries for the wrong reason. Bench times
    * `build` and `probe` as separate metrics; the query fns above compose
    * exactly these two steps, so the gated artifact is unchanged.
    */
  final case class StandingSplit(
      build: (SparkSession, String) => Unit,
      probe: (SparkSession, String) => DataFrame)

  private def q104Paths(d: String): (String, String) = {
    val sf = new java.io.File(d).getName
    (s"/tmp/graft_q104_sigs_$sf", s"/tmp/graft_q104_band_$sf")
  }
  // Both standing probes run the CAPPED path in production shape: the
  // build writes the hotBands sidecar next to the band table, the probe
  // consumes it. On the gated corpora no band value exceeds the default
  // occupancy cap (SkewSpec pins this), so the sidecar is empty and the
  // pair set is byte-identical to the uncapped oracle replay — the cap
  // binds only on boilerplate-skewed corpora (ScaleProbe `skew` mode).
  private def hotPath(bandPath: String): String = bandPath + "_hot"
  private def q108BandPath(d: String): String =
    s"/tmp/graft_q108_band_${new java.io.File(d).getName}"
  private def q108Corpus(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings").select(col("vec_id"),
      Similarity.asDouble(col("embedding")).as("embedding"))

  def standingSplits: Map[String, StandingSplit] = Map(
    "q104_incremental_banded" -> StandingSplit(
      build = (s, d) => {
        val (sigPath, bandPath) = q104Paths(d)
        val docs = t(s, d, "documents")
        Dedup.minhashSignatures(
            docs.filter(pmod(col("doc_id"), lit(10)) >= 2), "doc_id", "text")
          .write.mode("overwrite").parquet(sigPath)
        Dedup.writeBandTable(s.read.parquet(sigPath), bandPath)
        Dedup.hotBands(s.read.parquet(bandPath))
          .write.mode("overwrite").parquet(hotPath(bandPath))
      },
      probe = (s, d) => {
        val (sigPath, bandPath) = q104Paths(d)
        Dedup.incrementalDupPairsBanded(
            t(s, d, "documents").filter(pmod(col("doc_id"), lit(10)) < 2),
            "doc_id", "text",
            s.read.parquet(bandPath), s.read.parquet(sigPath),
            hot = Some(s.read.parquet(hotPath(bandPath))))
          .select(col("id_new"), col("id_corpus"),
            r4(col("jaccard")).as("jaccard"))
          .orderBy(col("id_new"), col("id_corpus"))
      }),
    "q108_incremental_embdup" -> StandingSplit(
      build = (s, d) => {
        Similarity.writeEmbBandTable(
          q108Corpus(s, d), "vec_id", "embedding", q108BandPath(d))
        Dedup.hotBands(s.read.parquet(q108BandPath(d)))
          .write.mode("overwrite").parquet(hotPath(q108BandPath(d)))
      },
      probe = (s, d) => {
        val corpus = q108Corpus(s, d)
        val batch = corpus.filter(pmod(col("vec_id"), lit(10)) === 0).select(
          (col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, x + lit(0.001)).otherwise(x)).as("embedding"))
        Similarity.incrementalEmbNearDups(batch, "vec_id", "embedding",
            s.read.parquet(q108BandPath(d)), corpus, threshold = 0.999,
            bands = 8, bitsPerBand = 8, dim = 64,
            hot = Some(s.read.parquet(hotPath(q108BandPath(d)))))
          .select(col("id_new"), col("id_corpus"), r6(col("cos")).as("cos"))
          .orderBy(col("id_new"), col("id_corpus"))
      }),

    "q136_incremental_exact" -> StandingSplit(
      build = (s, d) => {
        val sf = new java.io.File(d).getName
        operators.SimilarityJoin.writeGramIndex(
          t(s, d, "documents").filter(pmod(col("doc_id"), lit(10)) >= 2),
          "doc_id", "text", 3, s"/tmp/graft_q136_idx_$sf")
      },
      probe = (s, d) => {
        val idx = s"/tmp/graft_q136_idx_${new java.io.File(d).getName}"
        operators.SimilarityJoin.incrementalExactDupPairs(
            t(s, d, "documents").filter(pmod(col("doc_id"), lit(10)) < 2),
            "doc_id", "text", 3, 0.6,
            s.read.parquet(s"$idx/docs"), s.read.parquet(s"$idx/postings"),
            s.read.parquet(s"$idx/df"))
          .select(col("id_new"), col("id_corpus"),
            r4(col("jaccard")).as("jaccard"))
          .orderBy(col("id_new"), col("id_corpus"))
      }),

    "q127_incremental_spans" -> StandingSplit(
      build = (s, d) => {
        val sf = new java.io.File(d).getName
        graft.operators.SpanDedup.buildGramStats(
            t(s, d, "documents").filter(pmod(col("doc_id"), lit(10)) >= 2),
            "doc_id", "text", 4)
          .write.mode("overwrite").parquet(s"/tmp/graft_q127_grams_$sf")
      },
      probe = (s, d) => {
        val sf = new java.io.File(d).getName
        graft.operators.SpanDedup.incrementalSpanStats(
            t(s, d, "documents").filter(pmod(col("doc_id"), lit(10)) < 2),
            "doc_id", "text", 4,
            s.read.parquet(s"/tmp/graft_q127_grams_$sf"))
          .orderBy(col("doc_id"))
      }))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    rawOracleSql.map { case (k, v) => k -> expandRounding(v) }

  /** The sentiment lexicon (graft.functions.Sentiment.lexicon) as a DuckDB
    * VALUES literal — identical double literals parse to identical IEEE
    * values in both engines, so per-token scores match bit-for-bit. */
  private lazy val lexiconValues: String =
    graft.functions.Sentiment.lexicon.toSeq.sortBy(_._1)
      .map { case (w, (p, sj)) => s"('$w', $p, $sj)" }
      .mkString(", ")

  /** Shared oracle CTEs for the sentiment family: tokenize lowered text,
    * join the lexicon, mean-score per doc with the 0.0 neutral default —
    * mirrors Sentiment.sentimentDeclarative (which the native
    * SentimentScore expression is equivalence-tested against). `src` must
    * expose (doc_id, <textExpr> AS body, ...). */
  private def sentimentCtes(src: String): String =
    s"""WITH lex(word, pol, subj) AS (VALUES $lexiconValues),
       |src AS ($src),
       |toks AS (
       |  SELECT doc_id, unnest(list_filter(
       |    string_split_regex(trim(lower(body)), '\\s+'), x -> x <> '')) AS tok
       |  FROM src),
       |matched AS (
       |  SELECT doc_id, sum(l.pol) AS sp, sum(l.subj) AS ss, count(*) AS n
       |  FROM toks t JOIN lex l ON t.tok = l.word GROUP BY doc_id),
       |sent AS (
       |  SELECT s.doc_id,
       |    coalesce(m.sp / m.n, 0.0) AS pol,
       |    coalesce(m.ss / m.n, 0.0) AS subj
       |  FROM src s LEFT JOIN matched m ON s.doc_id = m.doc_id)""".stripMargin

  /** TextFunctions.cleanTweet as DuckDB SQL (RE2 and Java regex agree on
    * \\w, \\s and \\b over this corpus): URLs → quotes → RT/amp markers →
    * non-word chars → whitespace collapse. */
  private val cleanTweetSql: String =
    """trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |  regexp_replace(text, 'https?://\S+|www\.\S+', ' ', 'g'),
      |  '"', '', 'g'),
      |  '\b(RT|amp)\b', ' ', 'g'),
      |  '[^\w\s]+', ' ', 'g'),
      |  '\s+', ' ', 'g'))""".stripMargin

  /** The q106/q107 LSH band machinery as a CTE fragment: given a prior
    * CTE `v(id, vec DOUBLE[64])`, rebuilds Similarity.shaPlanes (centered
    * first-byte of sha256("p:d:lshp")), the 2^20 fixed-point quantized
    * vectors, the 64 integer sign-bit dots, and the 8×8-bit band values —
    * every step exact integer arithmetic, so `banded(id, band_idx, band)`
    * is bit-identical to the Spark side by construction. */
  private lazy val lshBandCte: String = {
    val alpha = "'0123456789abcdef'"
    s"""pd AS (
       |  SELECT pp.g AS p, dd.g AS d,
       |    sha256(CAST(pp.g AS VARCHAR) || ':' || CAST(dd.g AS VARCHAR) || ':lshp') AS h
       |  FROM generate_series(0, 63) pp(g), generate_series(0, 63) dd(g)),
       |planes AS (
       |  SELECT p, d,
       |    CAST((strpos($alpha, substr(h, 1, 1)) - 1) * 16
       |       + (strpos($alpha, substr(h, 2, 1)) - 1) - 128 AS BIGINT) AS w
       |  FROM pd),
       |qv AS (
       |  SELECT id, dd.g AS d,
       |    CAST(floor(vec[dd.g + 1] * 1048576.0 + 0.5) AS BIGINT) AS q
       |  FROM v, generate_series(0, 63) dd(g)),
       |dots AS (
       |  SELECT qv.id, pl.p, sum(qv.q * pl.w) AS dot
       |  FROM qv JOIN planes pl ON pl.d = qv.d GROUP BY qv.id, pl.p),
       |banded AS (
       |  SELECT id, CAST(p // 8 AS BIGINT) AS band_idx,
       |    sum(CASE WHEN dot >= 0 THEN 1::BIGINT ELSE 0 END
       |        * (1::BIGINT << (p % 8))) AS band
       |  FROM dots GROUP BY id, p // 8)""".stripMargin
  }

  /** The q37/q56 media pipeline as a recursive-CTE preamble: replays
    * Multimodal.synthesizeMedia (sha256-chained bytes, planted near-dup
    * low-bit flip via a translate alphabet) and decodeStub (unsigned-byte
    * rolling hash wrapping mod 2^64 — HUGEINT arithmetic reduced each
    * step — with mean-centered integer lane accumulators). Ends with
    * feat(media_id, kind, s0..s7); s* are the exact integer features.
    * Byte values come from hex-pair strpos over the alphabet, so no
    * hex-to-int builtin is assumed. */
  private lazy val mediaFeatCte: String = {
    val alpha = "'0123456789abcdef'"
    // value of the 0-based byte j of hx (chars 2j+1, 2j+2)
    val byteJ =
      s"(strpos($alpha, substr(hx, 2 * j + 1, 1)) - 1) * 16 " +
      s"+ (strpos($alpha, substr(hx, 2 * j + 2, 1)) - 1)"
    val hNext = s"(h * 31 + $byteJ) % CAST('18446744073709551616' AS HUGEINT)"
    // single line: a "\n || " join would lose its leading | to stripMargin
    val shaChunks = (0 to 7)
      .map(k => s"sha256('42:' || CAST(src AS VARCHAR) || ':$k')")
      .mkString(" || ")
    val lanes = (0 to 7).map(k =>
      s"    s$k + CASE WHEN j % 8 = $k THEN CAST(($hNext) % 1000 AS BIGINT) - 500 ELSE 0 END").mkString(",\n")
    val zeroes = (0 to 7).map(k => s"CAST(0 AS BIGINT) AS s$k").mkString(", ")
    val ss = (0 to 7).map(k => s"s$k").mkString(", ")
    s"""WITH RECURSIVE base AS (
       |  SELECT i, CASE WHEN i % 10 = 9 AND i >= 3 THEN i - 3 ELSE i END AS src
       |  FROM range(200) t(i)),
       |keyed AS (
       |  SELECT i, src,
       |    64 + ((strpos($alpha, substr(sha256('42:' || CAST(src AS VARCHAR) || ':len'), 1, 1)) - 1) * 16
       |        + (strpos($alpha, substr(sha256('42:' || CAST(src AS VARCHAR) || ':len'), 2, 1)) - 1)) % 192 AS len,
       |    $shaChunks AS hexfull
       |  FROM base),
       |cut AS (
       |  SELECT i, src, len,
       |    CASE WHEN i <> src THEN substr(hexfull, 1, 2 * len - 1)
       |        || translate(substr(hexfull, 2 * len, 1), '0123456789abcdef', '1032547698badcfe')
       |      ELSE substr(hexfull, 1, 2 * len) END AS hx
       |  FROM keyed),
       |roll AS (
       |  SELECT i, src, len, hx, 0 AS j, CAST(1125899906842597 AS HUGEINT) AS h, $zeroes
       |  FROM cut
       |  UNION ALL
       |  SELECT i, src, len, hx, j + 1, $hNext,
       |$lanes
       |  FROM roll WHERE j < len),
       |feat AS (
       |  SELECT i AS media_id,
       |    CASE WHEN src % 3 = 0 THEN 'image' WHEN src % 3 = 1 THEN 'audio'
       |      ELSE 'video' END AS kind, $ss
       |  FROM roll WHERE j = len)""".stripMargin
  }

  /** q118 oracle: replay the dHash pipeline end to end — group pixel
    * chain with the two per-image byte splices (the p1 CASE arm first:
    * the Spark side splices p0 then p1, so p1 wins a collision), 18×8
    * bottom-up stride-56 geometry, 2-pixel grayscale cells, adjacent
    * compares packed into four 16-bit bands, band-collision candidates,
    * and the xor+bit_count Hamming verify. Every step is integer, so
    * pairs AND misses replay exactly (the gated contract is the banded
    * operator, not ground-truth Hamming). */
  private lazy val dhashOracleSql: String =
    "WITH " + dhashCteBody + """
      |SELECT a, b, CAST(hd AS INT) AS hd FROM ver
      |WHERE hd <= 6 ORDER BY a, b""".stripMargin

  /** q118/q184 shared body (no WITH prefix — q184 needs RECURSIVE):
    * the dHash corpus replay down to verified pair distances (`ver`). */
  private lazy val dhashCteBody: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(src: String, off: String): String =
      s"(strpos($alpha, substr($src, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr($src, 2 * ($off) + 2, 1)) - 1)"
    val shaChunks = (0 until 14)
      .map(k => s"sha256('42:g' || CAST(g AS VARCHAR) || ':dh:$k')")
      .mkString(" || ")
    s"""img AS (
       |  SELECT i, i % 80 AS g FROM range(240) t(i)),
       |src AS (
       |  SELECT i, $shaChunks AS hexfull,
       |    sha256('42:i' || CAST(i AS VARCHAR) || ':pos') AS ph,
       |    sha256('42:i' || CAST(i AS VARCHAR) || ':pb') AS pbh
       |  FROM img),
       |pert AS (
       |  SELECT i, hexfull,
       |    ((${byteAt("ph", "0")}) * 256 + (${byteAt("ph", "1")})) % 448 AS p0,
       |    ((${byteAt("ph", "2")}) * 256 + (${byteAt("ph", "3")})) % 448 AS p1,
       |    ${byteAt("pbh", "0")} AS pb0, ${byteAt("pbh", "1")} AS pb1
       |  FROM src),
       |cell AS (
       |  SELECT i, gx, gy, sum(CASE
       |      WHEN off = p1 THEN pb1 WHEN off = p0 THEN pb0
       |      ELSE ${byteAt("hexfull", "off")} END) AS gsum
       |  FROM (
       |    SELECT p.i, p.hexfull, p.p0, p.p1, p.pb0, p.pb1,
       |      CAST(e // 6 AS INT) AS gx, gy.gy,
       |      (8 - 1 - gy.gy) * 56
       |        + 3 * (2 * (e // 6) + (e % 6) // 3) + (e % 3) AS off
       |    FROM pert p, range(54) r(e), range(8) gy(gy)) q
       |  GROUP BY 1, 2, 3),
       |bitrow AS (
       |  SELECT c1.i, c1.gy * 8 + c1.gx AS k,
       |    CASE WHEN c2.gsum > c1.gsum THEN 1 ELSE 0 END AS bit
       |  FROM cell c1 JOIN cell c2 ON c2.i = c1.i AND c2.gy = c1.gy
       |    AND c2.gx = c1.gx + 1
       |  WHERE c1.gx < 8),
       |bands AS (
       |  SELECT i, CAST(k // 16 AS INT) AS band_idx,
       |    CAST(sum(bit * (1 << (k % 16))) AS INT) AS band_val
       |  FROM bitrow GROUP BY 1, 2),
       |hashes AS (
       |  SELECT i,
       |    max(CASE WHEN band_idx = 0 THEN band_val END) AS b0,
       |    max(CASE WHEN band_idx = 1 THEN band_val END) AS b1,
       |    max(CASE WHEN band_idx = 2 THEN band_val END) AS b2,
       |    max(CASE WHEN band_idx = 3 THEN band_val END) AS b3
       |  FROM bands GROUP BY 1),
       |cand AS (
       |  SELECT DISTINCT x.i AS a, y.i AS b
       |  FROM bands x JOIN bands y ON x.band_idx = y.band_idx
       |    AND x.band_val = y.band_val AND x.i < y.i),
       |ver AS (
       |  SELECT c.a, c.b,
       |    bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1)) +
       |    bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3)) AS hd
       |  FROM cand c JOIN hashes ha ON ha.i = c.a
       |  JOIN hashes hb ON hb.i = c.b)""".stripMargin
  }

  /** q184 oracle: the q118 pair replay extended with a recursive
    * transitive closure (the q65 technique) — component label = min id,
    * singletons label themselves, survivor = the label holder. */
  private lazy val mediaDupClustersOracleSql: String =
    "WITH RECURSIVE " + dhashCteBody + """,
      |edges AS (
      |  SELECT a, b FROM ver WHERE hd <= 6
      |  UNION SELECT b, a FROM ver WHERE hd <= 6),
      |reach AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      |lab AS (SELECT a AS i, least(a, min(b)) AS label FROM reach GROUP BY a)
      |SELECT img.i AS media_id,
      |  COALESCE(lab.label, img.i) AS cluster_label,
      |  img.i = COALESCE(lab.label, img.i) AS kept
      |FROM img LEFT JOIN lab ON lab.i = img.i
      |ORDER BY media_id""".stripMargin

  /** q189 oracle: replay all `rounds` large-star/small-star
    * alternations, unrolled (the q117/q120 fixed-round technique) —
    * each alternation is the symmetric-neighborhood min + larger-
    * neighbor emit (large star), then the big→small orientation, min,
    * and attach-all emit (small star), each half deduplicated. After
    * the last round, labels come from the final star forest (left
    * join keeps early-absorbed nodes), then the component census. */
  private def ccStarsRoundsCte(p: String, rounds: Int): String = {
    // every layer is referenced 2-4 times by its successors; DuckDB
    // INLINES plain CTEs (each reference re-expands the subtree), so an
    // unrolled multi-reference chain would grow exponentially — 5 rounds
    // exhausted the process fd limit re-scanning the base parquet
    // thousands of times. AS MATERIALIZED evaluates each layer once.
    // `p` namespaces the pyramid so q195 can run two of them (standing
    // subset + full union) in one statement; ends with ${p}lab(id,
    // label) — final-forest labels left-joined onto ${p}e1's node set
    // so early-absorbed nodes keep a label.
    def round(n: Int): String =
      s"""${p}nb$n AS MATERIALIZED (SELECT u, v FROM ${p}e$n UNION SELECT v, u FROM ${p}e$n),
         |${p}mn$n AS MATERIALIZED (SELECT u, least(u, min(v)) AS m FROM ${p}nb$n GROUP BY u),
         |${p}ls$n AS MATERIALIZED (SELECT DISTINCT n.v AS u, m.m AS v
         |         FROM ${p}nb$n n JOIN ${p}mn$n m ON m.u = n.u WHERE n.v > n.u),
         |${p}sb$n AS MATERIALIZED (SELECT greatest(u, v) AS u, least(u, v) AS v
         |         FROM ${p}ls$n WHERE u <> v),
         |${p}sm$n AS MATERIALIZED (SELECT u, least(u, min(v)) AS m FROM ${p}sb$n GROUP BY u),
         |${p}e${n + 1} AS MATERIALIZED (
         |  SELECT DISTINCT u, v FROM (
         |    SELECT s.v AS u, m.m AS v FROM ${p}sb$n s JOIN ${p}sm$n m ON m.u = s.u
         |    UNION SELECT u, m FROM ${p}sm$n) x WHERE u <> v)""".stripMargin
    val layers = (1 to rounds).map(round).mkString(",\n")
    s"""$layers,
       |${p}fnb AS MATERIALIZED (SELECT u, v FROM ${p}e${rounds + 1}
       |        UNION SELECT v, u FROM ${p}e${rounds + 1}),
       |${p}flab AS (SELECT u AS id, least(u, min(v)) AS label
       |         FROM ${p}fnb GROUP BY u),
       |${p}nodes AS (SELECT u AS id FROM ${p}e1 UNION SELECT v FROM ${p}e1),
       |${p}lab AS MATERIALIZED (SELECT n.id, COALESCE(f.label, n.id) AS label
       |        FROM ${p}nodes n LEFT JOIN ${p}flab f ON f.id = n.id)""".stripMargin
  }

  /** The q189/q195 edge set: the same-nation customer→supplier
    * co-trade graph (customers even node ids, suppliers odd). */
  private val ccStarsEdgesSql: String =
    """SELECT DISTINCT c_custkey * 2 AS u, s_suppkey * 2 + 1 AS v
      |  FROM orders
      |  JOIN lineitem ON o_orderkey = l_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  WHERE c_nationkey = s_nationkey""".stripMargin

  /** q207 oracle: brute-force ground truth (the q26 shape) + the IVF
    * ranking (the q46 fragment) + recall@k / MRR / nDCG@k as ratios of
    * exact integers. The DCG weight table embeds the SAME
    * round(10^6/ln(r+1)) integers [[graft.operators.Retrieval
    * .dcgWeight]] uses, so no float sum exists on either side. */
  private def annQualityOracleSql(k: Int, cells: Int, nprobe: Int): String = {
    val wts = (1 to k)
      .map(r => s"($r, ${graft.operators.Retrieval.dcgWeight(r)})")
      .mkString(", ")
    val cums = (1 to k).map(graft.operators.Retrieval.dcgWeight)
      .scanLeft(0L)(_ + _).tail
    val idcgVals = (1 to k).map(n => s"($n, ${cums(n - 1)})").mkString(", ")
    s"""WITH v AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
       |  FROM embeddings),
       |bf AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.id AS query_id, n.id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.id
       |        ORDER BY list_cosine_similarity(q.vec, n.vec) DESC, n.id)
       |        AS rank
       |    FROM v q JOIN v n ON q.id <> n.id)
       |  WHERE rank <= $k),
       |cent AS (
       |  SELECT id AS cell_id, vec AS cv FROM v
       |  ORDER BY sha256(CAST(id AS VARCHAR) || ':ivf'), id LIMIT $cells),
       |scored AS (
       |  SELECT v.id, c.cell_id,
       |    row_number() OVER (PARTITION BY v.id
       |      ORDER BY list_cosine_similarity(v.vec, c.cv) DESC, c.cell_id)
       |      AS crank
       |  FROM v CROSS JOIN cent c),
       |probed AS (SELECT id, cell_id FROM scored WHERE crank <= $nprobe),
       |assigned AS (SELECT id AS neighbor_id, cell_id FROM scored
       |             WHERE crank = 1),
       |cand AS (
       |  SELECT DISTINCT p.id AS query_id, a.neighbor_id
       |  FROM probed p JOIN assigned a USING (cell_id)
       |  WHERE p.id <> a.neighbor_id),
       |ann AS (
       |  SELECT query_id, neighbor_id, rank FROM (
       |    SELECT query_id, neighbor_id, row_number() OVER (
       |      PARTITION BY query_id
       |      ORDER BY list_cosine_similarity(q.vec, n.vec) DESC,
       |        neighbor_id) AS rank
       |    FROM cand JOIN v q ON q.id = query_id
       |    JOIN v n ON n.id = neighbor_id)
       |  WHERE rank <= $k),
       |wt(rank, w) AS (VALUES $wts),
       |iw(n, iws) AS (VALUES $idcgVals),
       |hits AS (
       |  SELECT a.query_id, count(*) AS nhits, min(a.rank) AS minr,
       |    sum(w.w) AS dcg
       |  FROM ann a JOIN bf b USING (query_id, neighbor_id)
       |  JOIN wt w ON w.rank = a.rank
       |  GROUP BY 1),
       |tc AS (SELECT query_id, LEAST(count(*), $k) AS denom
       |       FROM bf GROUP BY 1)
       |SELECT t.query_id,
       |  r6(COALESCE(h.nhits, 0) / CAST(t.denom AS DOUBLE)) AS recall_k,
       |  r6(COALESCE(CAST(1 AS DOUBLE) / h.minr, CAST(0 AS DOUBLE)))
       |    AS mrr,
       |  r6(COALESCE(h.dcg, 0) / CAST(i.iws AS DOUBLE)) AS ndcg_k
       |FROM tc t JOIN iw i ON i.n = t.denom
       |LEFT JOIN hits h ON h.query_id = t.query_id
       |ORDER BY t.query_id""".stripMargin
  }

  /** q205 oracle: replay the whole NN-Descent construction — the q46
    * centroid sample + cell assignment, the sha-ordered ring init, and
    * `rounds` neighbor-of-neighbor refinement rounds, each a
    * (B ∪ B⁻¹) self-join + exact cosine rescore + (cos desc, id)
    * top-k. Converged rounds are no-ops, so the engine's early stop
    * never desyncs the unrolled replay. */
  private def nnDescentOracleSql(k: Int, cells: Int, rounds: Int): String =
    s"""${nnDescentCtes(k, cells, rounds)}
       |SELECT u AS query_id, w AS neighbor_id, r6(cos) AS cos,
       |  CAST(rank AS BIGINT) AS rank
       |FROM b$rounds ORDER BY query_id, rank""".stripMargin

  /** q211 oracle: the q205 construction + a neighbor-label majority
    * vote per node — (votes desc, label) winner, agreement flag. */
  private def knnLabelSpreadOracleSql(k: Int, cells: Int,
                                      rounds: Int): String =
    s"""${nnDescentCtes(k, cells, rounds)},
       |lbl AS (SELECT vec_id AS w, CAST(label AS BIGINT) AS nlbl
       |        FROM embeddings),
       |votes AS (
       |  SELECT b.u, l.nlbl, count(*) AS votes
       |  FROM b$rounds b JOIN lbl l ON l.w = b.w GROUP BY 1, 2),
       |pred AS (
       |  SELECT u, nlbl, votes FROM (
       |    SELECT u, nlbl, votes, row_number() OVER (
       |      PARTITION BY u ORDER BY votes DESC, nlbl) AS rk
       |    FROM votes)
       |  WHERE rk = 1)
       |SELECT e.vec_id, CAST(e.label AS BIGINT) AS true_label,
       |  p.nlbl AS pred_label, p.votes,
       |  CAST(CAST(e.label AS BIGINT) = p.nlbl AS BIGINT) AS agree
       |FROM embeddings e JOIN pred p ON p.u = e.vec_id
       |ORDER BY e.vec_id""".stripMargin

  /** q212 oracle: the q205 construction + the q207 metric block —
    * brute-force truth over the same `v`, hits against b<rounds>,
    * integer DCG weights, exact-ratio metrics. */
  private def nnDescentQualityOracleSql(k: Int, cells: Int,
                                        rounds: Int): String = {
    val wts = (1 to k)
      .map(r => s"($r, ${graft.operators.Retrieval.dcgWeight(r)})")
      .mkString(", ")
    val cums = (1 to k).map(graft.operators.Retrieval.dcgWeight)
      .scanLeft(0L)(_ + _).tail
    val idcgVals = (1 to k).map(n => s"($n, ${cums(n - 1)})").mkString(", ")
    s"""${nnDescentCtes(k, cells, rounds)},
       |bf AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.id AS query_id, n.id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.id
       |        ORDER BY list_cosine_similarity(q.vec, n.vec) DESC, n.id)
       |        AS rank
       |    FROM v q JOIN v n ON q.id <> n.id)
       |  WHERE rank <= $k),
       |wt(rank, w) AS (VALUES $wts),
       |iw(n, iws) AS (VALUES $idcgVals),
       |hits AS (
       |  SELECT a.u AS query_id, count(*) AS nhits, min(a.rank) AS minr,
       |    sum(w.w) AS dcg
       |  FROM b$rounds a JOIN bf b
       |    ON b.query_id = a.u AND b.neighbor_id = a.w
       |  JOIN wt w ON w.rank = a.rank
       |  GROUP BY 1),
       |tc AS (SELECT query_id, LEAST(count(*), $k) AS denom
       |       FROM bf GROUP BY 1)
       |SELECT t.query_id,
       |  r6(COALESCE(h.nhits, 0) / CAST(t.denom AS DOUBLE)) AS recall_k,
       |  r6(COALESCE(CAST(1 AS DOUBLE) / h.minr, CAST(0 AS DOUBLE)))
       |    AS mrr,
       |  r6(COALESCE(h.dcg, 0) / CAST(i.iws AS DOUBLE)) AS ndcg_k
       |FROM tc t JOIN iw i ON i.n = t.denom
       |LEFT JOIN hits h ON h.query_id = t.query_id
       |ORDER BY t.query_id""".stripMargin
  }

  /** q214 CTEs: replay the serving beam walk — the q205 graph build
    * over the held-out-query corpus (vec_id % 13 <> 0), the sha-ordered
    * ":ivf" entry sample, and `steps` unrolled candidates → rescore →
    * top-beam rounds per query. Converged steps are engine no-ops, so
    * the fixed unroll never desyncs with the engine's early stop. */
  private def graphSearchCtes(k: Int, cells: Int, rounds: Int, beam: Int,
                              steps: Int): String = {
    def stepCte(i: Int): String = {
      val prev = if (i == 1) "s0" else s"s${i - 1}"
      s"""n$i AS (
         |  SELECT DISTINCT qid, node FROM (
         |    SELECT s.qid, a.w AS node FROM $prev s JOIN adj a ON a.u = s.node
         |    UNION ALL SELECT qid, node FROM $prev)),
         |s$i AS MATERIALIZED (
         |  SELECT qid, node, cos, rank FROM (
         |    SELECT n.qid, n.node,
         |      list_cosine_similarity(q.qv, b.vec) AS cos,
         |      row_number() OVER (PARTITION BY n.qid
         |        ORDER BY list_cosine_similarity(q.qv, b.vec) DESC, n.node)
         |        AS rank
         |    FROM n$i n JOIN qs q ON q.qid = n.qid JOIN v b ON b.id = n.node)
         |  WHERE rank <= $beam)""".stripMargin
    }
    s"""${nnDescentCtes(k, cells, rounds, " WHERE vec_id % 13 <> 0")},
       |adj AS (
       |  SELECT DISTINCT u, w FROM (
       |    SELECT u, w FROM b$rounds UNION ALL SELECT w, u FROM b$rounds)),
       |qs AS (
       |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id % 13 = 0),
       |ent AS (
       |  SELECT id FROM v
       |  ORDER BY sha256(CAST(id AS VARCHAR) || ':ivf'), id LIMIT $cells),
       |s0 AS MATERIALIZED (
       |  SELECT qid, node, cos, rank FROM (
       |    SELECT q.qid, e.id AS node,
       |      list_cosine_similarity(q.qv, b.vec) AS cos,
       |      row_number() OVER (PARTITION BY q.qid
       |        ORDER BY list_cosine_similarity(q.qv, b.vec) DESC, e.id)
       |        AS rank
       |    FROM qs q CROSS JOIN ent e JOIN v b ON b.id = e.id)
       |  WHERE rank <= $beam),
       |${(1 to steps).map(stepCte).mkString(",\n")}""".stripMargin
  }

  private def graphSearchOracleSql(k: Int, cells: Int, rounds: Int,
                                   beam: Int, steps: Int): String =
    s"""${graphSearchCtes(k, cells, rounds, beam, steps)}
       |SELECT qid AS query_id, node AS neighbor_id, r6(cos) AS cos,
       |  CAST(rank AS BIGINT) AS rank
       |FROM s$steps WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** q215 oracle: the q214 walk + the q207 metric block — brute-force
    * truth over the held-out queries vs the corpus, hits against the
    * final beam, integer DCG weights, exact-ratio metrics. */
  private def graphSearchQualityOracleSql(k: Int, cells: Int, rounds: Int,
                                          beam: Int, steps: Int): String = {
    val wts = (1 to k)
      .map(r => s"($r, ${graft.operators.Retrieval.dcgWeight(r)})")
      .mkString(", ")
    val cums = (1 to k).map(graft.operators.Retrieval.dcgWeight)
      .scanLeft(0L)(_ + _).tail
    val idcgVals = (1 to k).map(n => s"($n, ${cums(n - 1)})").mkString(", ")
    s"""${graphSearchCtes(k, cells, rounds, beam, steps)},
       |bf AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.qid AS query_id, n.id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.qid
       |        ORDER BY list_cosine_similarity(q.qv, n.vec) DESC, n.id)
       |        AS rank
       |    FROM qs q JOIN v n ON q.qid <> n.id)
       |  WHERE rank <= $k),
       |wt(rank, w) AS (VALUES $wts),
       |iw(n, iws) AS (VALUES $idcgVals),
       |hits AS (
       |  SELECT a.qid AS query_id, count(*) AS nhits, min(a.rank) AS minr,
       |    sum(w.w) AS dcg
       |  FROM s$steps a JOIN bf b
       |    ON b.query_id = a.qid AND b.neighbor_id = a.node
       |  JOIN wt w ON w.rank = a.rank
       |  WHERE a.rank <= $k
       |  GROUP BY 1),
       |tc AS (SELECT query_id, LEAST(count(*), $k) AS denom
       |       FROM bf GROUP BY 1)
       |SELECT t.query_id,
       |  r6(COALESCE(h.nhits, 0) / CAST(t.denom AS DOUBLE)) AS recall_k,
       |  r6(COALESCE(CAST(1 AS DOUBLE) / h.minr, CAST(0 AS DOUBLE)))
       |    AS mrr,
       |  r6(COALESCE(h.dcg, 0) / CAST(i.iws AS DOUBLE)) AS ndcg_k
       |FROM tc t JOIN iw i ON i.n = t.denom
       |LEFT JOIN hits h ON h.query_id = t.query_id
       |ORDER BY t.query_id""".stripMargin
  }

  /** q222 oracle: the full hierarchical descent replayed — one q205
    * graph build PER LAYER (layer ℓ = corpus nodes whose hash-geometric
    * level ≥ ℓ, cells shrinking 4^−ℓ), the top layer's single sha-min
    * entry, an unrolled narrow walk per upper layer seeding the next
    * layer down, and the full q214 walk at layer 0. */
  private def hnswSearchCtes(k: Int, knnK: Int, cells: Int,
                             rounds: Int, beam: Int, steps: Int,
                             maxLevel: Int, upperBeam: Int,
                             upperSteps: Int): String = {
    val alpha = "'0123456789abcdef'"
    def nib(i: Int): String =
      s"(strpos($alpha, substr(sha256(CAST(vec_id AS VARCHAR) " +
        s"|| ':lvl'), $i, 1)) - 1)"
    val h = s"(${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 " +
      s"+ ${nib(4)})"
    val lvl = s"least($maxLevel, (16 - length(bin(CAST($h AS BIGINT)))) // 2)"
    def layerWhere(l: Int): String =
      if (l == 0) " WHERE vec_id % 13 <> 0"
      else s" WHERE vec_id % 13 <> 0 AND $lvl >= $l"
    val builds = (0 to maxLevel).map { l =>
      nnDescentCtes(knnK, math.max(1, cells >> (2 * l)), rounds,
        layerWhere(l), s"g$l", lead = if (l == maxLevel) "WITH " else "")
    }.reverse.mkString(",\n")
    def adjCte(l: Int): String =
      s"""w${l}adj AS (
         |  SELECT DISTINCT u, w FROM (
         |    SELECT u, w FROM g${l}b$rounds
         |    UNION ALL SELECT w, u FROM g${l}b$rounds))""".stripMargin
    def stepCte(l: Int, i: Int, lBeam: Int): String = {
      val prev = s"w${l}s${i - 1}"
      s"""w${l}n$i AS (
         |  SELECT DISTINCT qid, node FROM (
         |    SELECT s.qid, a.w AS node FROM $prev s
         |    JOIN w${l}adj a ON a.u = s.node
         |    UNION ALL SELECT qid, node FROM $prev)),
         |w${l}s$i AS MATERIALIZED (
         |  SELECT qid, node, cos, rank FROM (
         |    SELECT n.qid, n.node,
         |      list_cosine_similarity(q.qv, b.vec) AS cos,
         |      row_number() OVER (PARTITION BY n.qid
         |        ORDER BY list_cosine_similarity(q.qv, b.vec) DESC, n.node)
         |        AS rank
         |    FROM w${l}n$i n JOIN qs q ON q.qid = n.qid
         |    JOIN g${l}v b ON b.id = n.node)
         |  WHERE rank <= $lBeam)""".stripMargin
    }
    def s0Cte(l: Int, entrySql: String, lBeam: Int): String =
      s"""w${l}s0 AS MATERIALIZED (
         |  SELECT qid, node, cos, rank FROM (
         |    SELECT e.qid, e.node,
         |      list_cosine_similarity(q.qv, b.vec) AS cos,
         |      row_number() OVER (PARTITION BY e.qid
         |        ORDER BY list_cosine_similarity(q.qv, b.vec) DESC, e.node)
         |        AS rank
         |    FROM ($entrySql) e JOIN qs q ON q.qid = e.qid
         |    JOIN g${l}v b ON b.id = e.node)
         |  WHERE rank <= $lBeam)""".stripMargin
    val walks = (maxLevel to 0 by -1).map { l =>
      val lBeam = if (l == 0) beam else upperBeam
      val lSteps = if (l == 0) steps else upperSteps
      val entrySql =
        if (l == maxLevel)
          "SELECT q.qid, e.id AS node FROM qs q CROSS JOIN ent e"
        else
          s"SELECT DISTINCT qid, node FROM w${l + 1}s$upperSteps"
      (Seq(adjCte(l), s0Cte(l, entrySql, lBeam)) ++
        (1 to lSteps).map(i => stepCte(l, i, lBeam))).mkString(",\n")
    }.mkString(",\n")
    s"""$builds,
       |qs AS (
       |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id % 13 = 0),
       |ent AS (
       |  SELECT id FROM g${maxLevel}v
       |  ORDER BY sha256(CAST(id AS VARCHAR) || ':ivf'), id LIMIT 1),
       |$walks""".stripMargin
  }

  private def hnswSearchOracleSql(k: Int, knnK: Int, cells: Int,
                                  rounds: Int, beam: Int, steps: Int,
                                  maxLevel: Int, upperBeam: Int,
                                  upperSteps: Int): String =
    s"""${hnswSearchCtes(k, knnK, cells, rounds, beam, steps, maxLevel,
          upperBeam, upperSteps)}
       |SELECT qid AS query_id, node AS neighbor_id, r6(cos) AS cos,
       |  CAST(rank AS BIGINT) AS rank
       |FROM w0s$steps WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** q226 oracle: the q222 hierarchical chain + the q215 metric block
    * — brute-force truth over the held-out queries vs the layer-0
    * corpus, hits against the final walk beam, integer DCG weights,
    * exact-ratio metrics. */
  private def hnswQualityOracleSql(k: Int, knnK: Int, cells: Int,
                                   rounds: Int, beam: Int, steps: Int,
                                   maxLevel: Int, upperBeam: Int,
                                   upperSteps: Int): String = {
    val wts = (1 to k)
      .map(r => s"($r, ${graft.operators.Retrieval.dcgWeight(r)})")
      .mkString(", ")
    val cums = (1 to k).map(graft.operators.Retrieval.dcgWeight)
      .scanLeft(0L)(_ + _).tail
    val idcgVals = (1 to k).map(n => s"($n, ${cums(n - 1)})").mkString(", ")
    s"""${hnswSearchCtes(k, knnK, cells, rounds, beam, steps, maxLevel,
          upperBeam, upperSteps)},
       |bf AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.qid AS query_id, n.id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.qid
       |        ORDER BY list_cosine_similarity(q.qv, n.vec) DESC, n.id)
       |        AS rank
       |    FROM qs q JOIN g0v n ON q.qid <> n.id)
       |  WHERE rank <= $k),
       |wt(rank, w) AS (VALUES $wts),
       |iw(n, iws) AS (VALUES $idcgVals),
       |hits AS (
       |  SELECT a.qid AS query_id, count(*) AS nhits, min(a.rank) AS minr,
       |    sum(w.w) AS dcg
       |  FROM w0s$steps a JOIN bf b
       |    ON b.query_id = a.qid AND b.neighbor_id = a.node
       |  JOIN wt w ON w.rank = a.rank
       |  WHERE a.rank <= $k
       |  GROUP BY 1),
       |tc AS (SELECT query_id, LEAST(count(*), $k) AS denom
       |       FROM bf GROUP BY 1)
       |SELECT t.query_id,
       |  r6(COALESCE(h.nhits, 0) / CAST(t.denom AS DOUBLE)) AS recall_k,
       |  r6(COALESCE(CAST(1 AS DOUBLE) / h.minr, CAST(0 AS DOUBLE)))
       |    AS mrr,
       |  r6(COALESCE(h.dcg, 0) / CAST(i.iws AS DOUBLE)) AS ndcg_k
       |FROM tc t JOIN iw i ON i.n = t.denom
       |LEFT JOIN hits h ON h.query_id = t.query_id
       |ORDER BY t.query_id""".stripMargin
  }

  private def nnDescentCtes(k: Int, cells: Int, rounds: Int,
                            vWhere: String = "", p: String = "",
                            lead: String = "WITH "): String = {
    def roundCte(i: Int): String = {
      val prev = if (i == 1) s"${p}b0" else s"${p}b${i - 1}"
      s"""${p}c$i AS (SELECT u, w FROM $prev UNION ALL SELECT w, u FROM $prev),
         |${p}cd$i AS (
         |  SELECT DISTINCT u, w FROM (
         |    SELECT c1.u, c2.w FROM ${p}c$i c1 JOIN ${p}c$i c2 ON c1.w = c2.u
         |    WHERE c2.w <> c1.u
         |    UNION ALL SELECT u, w FROM $prev)),
         |${p}b$i AS MATERIALIZED (
         |  SELECT u, w, cos, rank FROM (
         |    SELECT d.u, d.w, list_cosine_similarity(a.vec, b.vec) AS cos,
         |      row_number() OVER (PARTITION BY d.u
         |        ORDER BY list_cosine_similarity(a.vec, b.vec) DESC, d.w)
         |        AS rank
         |    FROM ${p}cd$i d JOIN ${p}v a ON a.id = d.u
         |    JOIN ${p}v b ON b.id = d.w)
         |  WHERE rank <= $k)""".stripMargin
    }
    s"""$lead${p}v AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
       |  FROM embeddings$vWhere),
       |${p}cent AS (
       |  SELECT id AS cell_id, vec AS cv FROM ${p}v
       |  ORDER BY sha256(CAST(id AS VARCHAR) || ':ivf'), id LIMIT $cells),
       |${p}asg AS (
       |  SELECT id, cell_id FROM (
       |    SELECT v.id, c.cell_id, row_number() OVER (PARTITION BY v.id
       |      ORDER BY list_cosine_similarity(v.vec, c.cv) DESC, c.cell_id)
       |      AS crank
       |    FROM ${p}v v CROSS JOIN ${p}cent c)
       |  WHERE crank = 1),
       |${p}ring AS (
       |  SELECT id, cell_id,
       |    row_number() OVER (PARTITION BY cell_id
       |      ORDER BY sha256(CAST(id AS VARCHAR) || ':nnd'), id) AS r,
       |    count(*) OVER (PARTITION BY cell_id) AS sz
       |  FROM ${p}asg),
       |${p}ic AS (
       |  SELECT g.id AS u, p.id AS w
       |  FROM ${p}ring g, unnest(generate_series(1, $k)) AS t(j)
       |  JOIN ${p}ring p ON p.cell_id = g.cell_id
       |    AND p.r = ((g.r - 1 + j) % g.sz) + 1
       |  WHERE j < g.sz),
       |${p}b0 AS MATERIALIZED (
       |  SELECT u, w, cos, rank FROM (
       |    SELECT d.u, d.w, list_cosine_similarity(a.vec, b.vec) AS cos,
       |      row_number() OVER (PARTITION BY d.u
       |        ORDER BY list_cosine_similarity(a.vec, b.vec) DESC, d.w)
       |        AS rank
       |    FROM (SELECT DISTINCT u, w FROM ${p}ic) d
       |    JOIN ${p}v a ON a.id = d.u JOIN ${p}v b ON b.id = d.w)
       |  WHERE rank <= $k),
       |${(1 to rounds).map(roundCte).mkString(",\n")}""".stripMargin
  }

  private def ccStarsOracleSql(rounds: Int): String =
    s"""WITH e1 AS MATERIALIZED (
       |  $ccStarsEdgesSql),
       |${ccStarsRoundsCte("", rounds)}
       |SELECT label AS component, count(*) AS members
       |FROM lab GROUP BY 1 ORDER BY members DESC, component""".stripMargin

  /** q195 oracle: the incremental result must equal a FULL recompute,
    * so the oracle replays BOTH pyramids — standing labels from the
    * batch-1 edge subset (prefix `s`) and the union labels (prefix
    * `f`) — then reports the per-component census with the relabeled
    * count (members whose standing label, self for nodes new to the
    * graph, differs from the merged label). */
  private def incrementalCcOracleSql(rounds: Int): String =
    s"""WITH fe1 AS MATERIALIZED (
       |  $ccStarsEdgesSql),
       |se1 AS MATERIALIZED (
       |  SELECT u, v FROM fe1 WHERE ((u // 2) + (v // 2)) % 3 <> 0),
       |${ccStarsRoundsCte("s", rounds)},
       |${ccStarsRoundsCte("f", rounds)}
       |SELECT f.label AS component, count(*) AS members,
       |  CAST(sum(CASE WHEN COALESCE(s.label, f.id) <> f.label
       |    THEN 1 ELSE 0 END) AS BIGINT) AS relabeled
       |FROM flab f LEFT JOIN slab s ON s.id = f.id
       |GROUP BY 1 ORDER BY members DESC, component""".stripMargin

  /** q196 oracle: replay every frontier join and hash-argmin pick of
    * the walk, unrolled — candidate hashes use the engine's standard
    * 48-bit sha prefix over the exact (salt, start, step, neighbor)
    * key string, ties break to the smaller neighbor id, and the path
    * string accretes per step. */
  private def hashWalksOracleSql(steps: Int): String = {
    def hv(key: String): String =
      s"""CAST(list_sum([(strpos('0123456789abcdef', substr(
         |      sha256($key), i, 1)) - 1) * pow(16.0, 12 - i)
         |      for i in generate_series(1, 12)]) AS BIGINT)""".stripMargin
    def step(t: Int): String = {
      val key = s"'rw:42:' || CAST(w.start AS VARCHAR) || ':$t:' " +
        "|| CAST(e.v AS VARCHAR)"
      s"""c$t AS MATERIALIZED (
         |  SELECT w.start, e.v AS dst, ${hv(key)} AS h
         |  FROM w${t - 1} w JOIN nb e ON e.u = w.cur),
         |n$t AS MATERIALIZED (
         |  SELECT start, dst FROM (
         |    SELECT start, dst,
         |      row_number() OVER (PARTITION BY start ORDER BY h, dst) AS rn
         |    FROM c$t) WHERE rn = 1),
         |w$t AS MATERIALIZED (
         |  SELECT w.start, n.dst AS cur,
         |    w.path || ',' || CAST(n.dst AS VARCHAR) AS path
         |  FROM w${t - 1} w JOIN n$t n ON n.start = w.start)""".stripMargin
    }
    val layers = (1 to steps).map(step).mkString(",\n")
    s"""WITH e1 AS MATERIALIZED (
       |  $ccStarsEdgesSql),
       |nb AS MATERIALIZED (SELECT u, v FROM e1 UNION SELECT v, u FROM e1),
       |w0 AS MATERIALIZED (
       |  SELECT DISTINCT u AS start, u AS cur, CAST(u AS VARCHAR) AS path
       |  FROM nb),
       |$layers
       |SELECT start, path FROM w$steps ORDER BY start""".stripMargin
  }

  /** q194/q199 shared CTE: per-document feature-hash construction —
    * tokenization, the 48-bit sha prefix, dim/sign split, signed sums,
    * densified to all 64 dims as `fullv(doc_id, d, v)`. */
  private lazy val featureHashCte: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(
      |    string_split_regex(trim(text), '\s+'), x -> x <> '')) AS w
      |  FROM documents),
      |h AS (
      |  SELECT doc_id, CAST(list_sum(
      |      [(strpos('0123456789abcdef', substr(sha256(w), i, 1)) - 1)
      |       * pow(16.0, 12 - i) for i in generate_series(1, 12)])
      |    AS BIGINT) AS hv
      |  FROM toks),
      |dimv AS (
      |  SELECT doc_id, CAST(hv % 64 AS BIGINT) AS d,
      |    CAST(sum(CASE WHEN (hv // 64) % 2 = 0 THEN 1 ELSE -1 END)
      |      AS BIGINT) AS v
      |  FROM h GROUP BY 1, 2),
      |fullv AS MATERIALIZED (
      |  SELECT doc.doc_id, r.range AS d,
      |    CAST(COALESCE(dimv.v, 0) AS BIGINT) AS v
      |  FROM (SELECT doc_id FROM documents) doc
      |  CROSS JOIN range(64) r
      |  LEFT JOIN dimv ON dimv.doc_id = doc.doc_id AND dimv.d = r.range)""".stripMargin

  /** q190 oracle: replay the grid-DBSCAN spec end to end — q124
    * quantization, sha-parity signs, the 2-D signed projection, exact
    * double-floor cells, the census, core threshold, 8-adjacency
    * between core cells, a recursive min-label closure over the (tiny,
    * cell-granular) core graph, border adoption of the minimum
    * adjacent cluster, and the noise fallback. Cell keys replay the
    * (cx+2^20)·2^21+(cy+2^20) encoding. */
  private lazy val gridDbscanOracleSql: String = dbscanOracleSql(
    """SELECT vec_id,
      |    [CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)
      |     for x in embedding] AS q
      |  FROM embeddings""".stripMargin,
    """SELECT p.vec_id, COALESCE(cl.role, 'noise') AS role,
      |  COALESCE(cl.cluster, CAST(-1 AS BIGINT)) AS cluster
      |FROM pts p LEFT JOIN cellab cl
      |  ON cl.cell = (p.cx + 1048576) * 2097152 + (p.cy + 1048576)
      |ORDER BY vec_id""".stripMargin)

  /** q197 oracle: a FULL grid-DBSCAN recompute over the union corpus
    * (standing embeddings + the reversed-vector delta with shifted
    * ids) reported at CELL level — the incremental path must
    * reproduce it exactly, so a census-merge slip, a missed
    * newly-core edge, or a stale standing label all desync. */
  private lazy val incrementalDbscanOracleSql: String = dbscanOracleSql(
    """SELECT vec_id,
      |    [CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)
      |     for x in embedding] AS q
      |  FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000,
      |    [CAST(floor(CAST(embedding[65 - i] AS DOUBLE) * 1048576) AS BIGINT)
      |     for i in generate_series(1, 64)]
      |  FROM embeddings""".stripMargin,
    """SELECT c.cx, c.cy, c.cnt, COALESCE(cl.role, 'noise') AS role,
      |  COALESCE(cl.cluster, CAST(-1 AS BIGINT)) AS cluster
      |FROM cells c LEFT JOIN cellab cl ON cl.cell = c.cell
      |ORDER BY c.cx, c.cy""".stripMargin)

  /** Shared q190/q197 grid-DBSCAN replay: `qvSelect` supplies the
    * quantized-vector table, `finalSelect` the report (point-level for
    * q190, cell-level for q197); everything between — signs,
    * projection, cells, core closure, border adoption — is the one
    * spec. */
  private def dbscanOracleSql(qvSelect: String, finalSelect: String): String =
    s"""WITH RECURSIVE qv AS MATERIALIZED (
      |  $qvSelect),
      |sg AS MATERIALIZED (
      |  SELECT a.axis, d.range AS d,
      |    CASE WHEN (strpos('0123456789abcdef',
      |        substr(sha256('dbs:' || a.axis || ':' || d.range), 1, 1)) - 1)
      |        % 2 = 0 THEN 1 ELSE -1 END AS s
      |  FROM (VALUES (0), (1)) a(axis), range(64) d),
      |pts AS MATERIALIZED (
      |  SELECT vec_id,
      |    CAST(floor(sum(CASE WHEN axis = 0 THEN q[d + 1] * s ELSE 0 END)
      |      / 524288.0) AS BIGINT) AS cx,
      |    CAST(floor(sum(CASE WHEN axis = 1 THEN q[d + 1] * s ELSE 0 END)
      |      / 524288.0) AS BIGINT) AS cy
      |  FROM qv, sg GROUP BY vec_id),
      |cells AS MATERIALIZED (
      |  SELECT cx, cy, (cx + 1048576) * 2097152 + (cy + 1048576) AS cell,
      |    count(*) AS cnt
      |  FROM pts GROUP BY 1, 2),
      |core AS MATERIALIZED (SELECT cx, cy, cell FROM cells WHERE cnt >= 12),
      |sh AS MATERIALIZED (
      |  SELECT dx.range - 1 AS dx, dy.range - 1 AS dy
      |  FROM range(3) dx, range(3) dy
      |  WHERE NOT (dx.range = 1 AND dy.range = 1)),
      |ce AS MATERIALIZED (
      |  SELECT a.cell AS ca, b.cell AS cb
      |  FROM core a CROSS JOIN sh
      |  JOIN core b ON b.cx = a.cx + sh.dx AND b.cy = a.cy + sh.dy
      |  WHERE a.cell < b.cell),
      |edges AS MATERIALIZED (
      |  SELECT ca AS a, cb AS b FROM ce UNION SELECT cb, ca FROM ce),
      |reach AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      |lab AS MATERIALIZED (
      |  SELECT a AS cell, least(a, min(b)) AS cluster FROM reach GROUP BY a),
      |corelab AS MATERIALIZED (
      |  SELECT c.cx, c.cy, c.cell, COALESCE(l.cluster, c.cell) AS cluster
      |  FROM core c LEFT JOIN lab l ON l.cell = c.cell),
      |border AS MATERIALIZED (
      |  SELECT nc.cell, min(cl.cluster) AS cluster
      |  FROM (SELECT cx, cy, cell FROM cells WHERE cnt < 12) nc
      |  CROSS JOIN sh
      |  JOIN corelab cl ON cl.cx = nc.cx + sh.dx AND cl.cy = nc.cy + sh.dy
      |  GROUP BY nc.cell),
      |cellab AS MATERIALIZED (
      |  SELECT cell, cluster, 'core' AS role FROM corelab
      |  UNION ALL SELECT cell, cluster, 'border' AS role FROM border)
      |$finalSelect""".stripMargin

  /** q120 oracle: replay all `rounds` BPE merge rounds, unrolled — the
    * distinct-word table, per-round adjacent-pair counts, the
    * (count desc, lexicographic) winner, the single-scan replace-merge,
    * and the post-merge vocab/corpus symbol totals. Everything is
    * integer/string arithmetic with a total order, so every column
    * rides the value hash. */
  private def bpeOracleSql(rounds: Int): String = {
    def layer(n: Int): String =
      s"""p$n AS (
         |  SELECT s[i] AS l, s[i+1] AS r, sum(cnt) AS pc
         |  FROM (SELECT string_split(trim(word), ' ') AS s, cnt,
         |          unnest(generate_series(1,
         |            len(string_split(trim(word), ' ')) - 1)) AS i
         |        FROM w$n)
         |  GROUP BY 1, 2),
         |win$n AS (SELECT l, r, pc FROM p$n ORDER BY pc DESC, l, r LIMIT 1),
         |w${n + 1} AS (
         |  SELECT replace(word, ' ' || l || ' ' || r || ' ',
         |    ' ' || l || r || ' ') AS word, cnt
         |  FROM w$n, win$n),
         |st$n AS (
         |  SELECT sum(len(string_split(trim(word), ' '))) AS vs,
         |         sum(len(string_split(trim(word), ' ')) * cnt) AS cs
         |  FROM w${n + 1})""".stripMargin
    val layers = (1 to rounds).map(layer).mkString(",\n")
    val finals = (1 to rounds).map(n =>
      s"""SELECT $n AS round, l AS left_sym, r AS right_sym,
         |  l || r AS merged, CAST(pc AS BIGINT) AS pair_count,
         |  CAST(vs AS BIGINT) AS vocab_symbols_after,
         |  CAST(cs AS BIGINT) AS corpus_symbols_after
         |FROM win$n, st$n""".stripMargin).mkString("\nUNION ALL\n")
    s"""WITH toks AS (
       |  SELECT unnest(string_split_regex(
       |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
       |    '\\s+')) AS w
       |  FROM documents),
       |wc AS (SELECT w, count(*) AS cnt FROM toks WHERE w <> '' GROUP BY 1),
       |w1 AS (
       |  SELECT ' ' || list_aggregate(list_transform(
       |      generate_series(1, len(w)), i -> substr(w, i, 1)),
       |      'string_agg', ' ') || ' </w> ' AS word, cnt
       |  FROM wc),
       |$layers
       |$finals ORDER BY round""".stripMargin
  }

  /** q122 oracle: the bpeOracleSql learning chain with the original word
    * carried through every merge layer (`orig`), so the encoded symbol
    * count joins back to the per-(source, word) occurrence table. */
  private def bpeEncodeOracleSql(rounds: Int): String = {
    def layer(n: Int): String =
      s"""p$n AS (
         |  SELECT s[i] AS l, s[i+1] AS r, sum(cnt) AS pc
         |  FROM (SELECT string_split(trim(word), ' ') AS s, cnt,
         |          unnest(generate_series(1,
         |            len(string_split(trim(word), ' ')) - 1)) AS i
         |        FROM w$n)
         |  GROUP BY 1, 2),
         |win$n AS (SELECT l, r FROM p$n ORDER BY pc DESC, l, r LIMIT 1),
         |w${n + 1} AS (
         |  SELECT orig, replace(word, ' ' || l || ' ' || r || ' ',
         |    ' ' || l || r || ' ') AS word, cnt
         |  FROM w$n, win$n)""".stripMargin
    val layers = (1 to rounds).map(layer).mkString(",\n")
    s"""WITH toks AS (
       |  SELECT source, unnest(string_split_regex(
       |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
       |    '\\s+')) AS w
       |  FROM documents),
       |swc AS (SELECT source, w, count(*) AS c FROM toks
       |        WHERE w <> '' GROUP BY 1, 2),
       |wc AS (SELECT w, sum(c) AS cnt FROM swc GROUP BY 1),
       |w1 AS (
       |  SELECT w AS orig, ' ' || list_aggregate(list_transform(
       |      generate_series(1, len(w)), i -> substr(w, i, 1)),
       |      'string_agg', ' ') || ' </w> ' AS word, cnt
       |  FROM wc),
       |$layers,
       |enc AS (SELECT orig, len(string_split(trim(word), ' ')) AS sym
       |        FROM w${rounds + 1})
       |SELECT source, CAST(sum(c) AS BIGINT) AS words,
       |  CAST(sum(c * (length(w) + 1)) AS BIGINT) AS syms_before,
       |  CAST(sum(c * sym) AS BIGINT) AS syms_after
       |FROM swc JOIN enc ON w = orig
       |GROUP BY source ORDER BY source""".stripMargin
  }

  /** q124 oracle: unrolled integer Lloyd iterations. Each layer replays
    * assignment (cross join against the k-row centroid table, list-
    * comprehension distance, window argmin) and the shifted floor-
    * division centroid update; DuckDB's sum → HUGEINT widening is
    * re-cast at every step to keep the BIGINT dtype contract. */
  private def kmeansOracleCore(k: Int, iters: Int, dims: Int,
                               src: String = "embeddings",
                               pre: String = ""): String = {
    val hash = "CAST(list_sum([(strpos('0123456789abcdef', substr(sha256(" +
      "CAST(vec_id AS VARCHAR)), i, 1)) - 1) * pow(16.0, 12 - i) " +
      "for i in generate_series(1, 12)]) AS BIGINT)"
    def layer(n: Int): String =
      s"""d$n AS (
         |  SELECT v.vec_id, v.label, v.q, c.cid,
         |    list_sum([(v.q[i] - c.c[i]) * (v.q[i] - c.c[i])
         |      for i in generate_series(1, $dims)]) AS dist
         |  FROM v, c${n - 1} c),
         |a$n AS (
         |  SELECT vec_id, label, q, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY dist, cid) AS rn FROM d$n)
         |  WHERE rn = 1),
         |u$n AS (
         |  SELECT cid, i AS dim, sum(q[i]) AS s, count(*) AS n
         |  FROM a$n, unnest(generate_series(1, $dims)) t(i) GROUP BY 1, 2),
         |nc$n AS (
         |  SELECT cid, list(CAST((s + n * 2097152) // n - 2097152
         |    AS BIGINT) ORDER BY dim) AS c
         |  FROM u$n GROUP BY cid),
         |c$n AS (SELECT p.cid, COALESCE(nc$n.c, p.c) AS c
         |        FROM c${n - 1} p LEFT JOIN nc$n ON nc$n.cid = p.cid)"""
        .stripMargin
    val layers = (1 to iters).map(layer).mkString(",\n")
    s"""WITH ${pre}v AS (
       |  SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)
       |      * 1048576) AS BIGINT)) AS q
       |  FROM $src),
       |hv AS (SELECT vec_id, q, $hash AS h FROM v),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1
       |    AS BIGINT) AS cid, q AS c
       |  FROM (SELECT * FROM hv ORDER BY h, vec_id LIMIT $k)),
       |$layers,
       |df AS (
       |  SELECT v.vec_id, v.label, c.cid,
       |    list_sum([(v.q[i] - c.c[i]) * (v.q[i] - c.c[i])
       |      for i in generate_series(1, $dims)]) AS dist
       |  FROM v, c$iters c),
       |af AS (
       |  SELECT vec_id, label, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY dist, cid) AS rn FROM df)
       |  WHERE rn = 1)""".stripMargin
  }

  /** Brute-force exact word-3-gram Jaccard pairs at t = 0.6 — the shared
    * oracle of q69 (MinHash-LSH, reproduces the exact set at this SF by
    * measured recall) and q129 (prefix filtering, reproduces it by
    * construction). The length prefilter in the ON clause is sound:
    * j <= min(|A|,|B|)/max(|A|,|B|).
    */
  private lazy val ngramJaccardBruteSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |        x -> x <> '') AS t
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(generate_series(1, len(t) - 2),
      |      i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS g
      |  FROM toks WHERE len(t) >= 3),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    len(list_intersect(a.g, b.g))::DOUBLE
      |      / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS j
      |  FROM grams a JOIN grams b
      |    ON a.doc_id < b.doc_id
      |   AND least(len(a.g), len(b.g))::DOUBLE >= 0.6 * greatest(len(a.g), len(b.g)))
      |SELECT id_a, id_b, r4(j) AS jaccard FROM pairs
      |WHERE j >= 0.6 ORDER BY id_a, id_b""".stripMargin

  private def kmeansOracleSql(k: Int, iters: Int, dims: Int): String =
    s"""${kmeansOracleCore(k, iters, dims)},
       |chk AS (SELECT cid, CAST(list_sum(c) AS BIGINT) AS cs FROM c$iters)
       |SELECT af.cid AS cid, af.label AS label, count(*) AS n,
       |  chk.cs AS centroid_sum
       |FROM af JOIN chk ON chk.cid = af.cid
       |GROUP BY 1, 2, 4 ORDER BY cid, label""".stripMargin

  /** q125 oracle: the q124 Lloyd chain, then the per-cluster hash-order
    * sample (reusing the hv CTE's vec_id hash). */
  private def diversitySampleOracleSql(k: Int, iters: Int, dims: Int,
                                       m: Int): String =
    s"""${kmeansOracleCore(k, iters, dims)},
       |rk AS (
       |  SELECT af.cid, af.vec_id, af.label,
       |    row_number() OVER (PARTITION BY af.cid
       |      ORDER BY hv.h, af.vec_id) AS rnk
       |  FROM af JOIN hv ON hv.vec_id = af.vec_id)
       |SELECT cid, vec_id, label FROM rk WHERE rnk <= $m
       |ORDER BY cid, vec_id""".stripMargin

  /** q203 oracle: the q124 Lloyd chain, then within-cluster (hash, id)
    * ranks + sizes, the cyclic positive rule (r mod sz)+1, and the
    * hash-aligned negative rule ((r−1) mod sz')+1 in cluster
    * (cid+1) mod k. */
  private def contrastivePairsOracleSql(k: Int, iters: Int,
                                        dims: Int): String =
    s"""${kmeansOracleCore(k, iters, dims)},
       |rk AS MATERIALIZED (
       |  SELECT af.cid, af.vec_id,
       |    row_number() OVER (PARTITION BY af.cid
       |      ORDER BY hv.h, af.vec_id) AS rnk,
       |    count(*) OVER (PARTITION BY af.cid) AS sz
       |  FROM af JOIN hv ON hv.vec_id = af.vec_id),
       |csz AS (SELECT cid, max(sz) AS sz FROM rk GROUP BY cid)
       |SELECT a.vec_id AS anchor_id, a.cid, p.vec_id AS pos_id,
       |  (a.cid + 1) % $k AS neg_cid, g.vec_id AS neg_id
       |FROM rk a
       |JOIN rk p ON p.cid = a.cid AND p.rnk = (a.rnk % a.sz) + 1
       |JOIN csz n ON n.cid = (a.cid + 1) % $k
       |JOIN rk g ON g.cid = (a.cid + 1) % $k
       |  AND g.rnk = ((a.rnk - 1) % n.sz) + 1
       |WHERE a.sz >= 2
       |ORDER BY anchor_id""".stripMargin

  /** q137 oracle: the full PQ index build and query replayed — per-
    * subspace integer Lloyd (shared (hash, id) seeds, shifted floor
    * division), final codes, per-query LUTs, ADC sums, and the
    * (dist, id) rank — all integer arithmetic, no rounding marker
    * needed anywhere. */
  /** Shared PQ-index CTE chain (quantize → seeds → subvectors → `iters`
    * Lloyd layers → final codes + query LUT), the common core of the
    * q137 and q170 oracles. Ends with `codes`, `qsub`, `lut`. */
  private def pqCoreCtes(mSub: Int, k: Int, iters: Int, dims: Int,
                         queryMod: Int): String = {
    val sd = dims / mSub
    val hash = "CAST(list_sum([(strpos('0123456789abcdef', substr(sha256(" +
      "CAST(vec_id AS VARCHAR)), i, 1)) - 1) * pow(16.0, 12 - i) " +
      "for i in generate_series(1, 12)]) AS BIGINT)"
    def layer(n: Int): String =
      s"""d$n AS (
         |  SELECT s.vec_id, s.m, c.cid,
         |    list_sum([(s.qs[i] - c.c[i]) * (s.qs[i] - c.c[i])
         |      for i in generate_series(1, $sd)]) AS dist
         |  FROM sub s JOIN c${n - 1} c ON c.m = s.m),
         |a$n AS (
         |  SELECT vec_id, m, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
         |      ORDER BY dist, cid) AS rn FROM d$n)
         |  WHERE rn = 1),
         |u$n AS (
         |  SELECT a.m, a.cid, i AS dim, sum(s.qs[i]) AS sv, count(*) AS n
         |  FROM a$n a JOIN sub s ON s.vec_id = a.vec_id AND s.m = a.m,
         |    unnest(generate_series(1, $sd)) t(i) GROUP BY 1, 2, 3),
         |nc$n AS (
         |  SELECT m, cid, list(CAST((sv + n * 2097152) // n - 2097152
         |    AS BIGINT) ORDER BY dim) AS c
         |  FROM u$n GROUP BY 1, 2),
         |c$n AS (SELECT p.m, p.cid, COALESCE(nc$n.c, p.c) AS c
         |        FROM c${n - 1} p LEFT JOIN nc$n
         |          ON nc$n.m = p.m AND nc$n.cid = p.cid)""".stripMargin
    val layers = (1 to iters).map(layer).mkString(",\n")
    s"""v AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)
       |      * 1048576) AS BIGINT)) AS q
       |  FROM embeddings),
       |hv AS (SELECT vec_id, $hash AS h FROM v),
       |seeds AS (
       |  SELECT vec_id, CAST(row_number() OVER (ORDER BY h, vec_id) - 1
       |    AS BIGINT) AS cid
       |  FROM (SELECT * FROM hv ORDER BY h, vec_id LIMIT $k)),
       |sub AS (
       |  SELECT vec_id, CAST(m AS BIGINT) AS m,
       |    [q[m * $sd + i] for i in generate_series(1, $sd)] AS qs
       |  FROM v, range($mSub) t(m)),
       |c0 AS (SELECT s.m, se.cid, s.qs AS c
       |       FROM sub s JOIN seeds se ON se.vec_id = s.vec_id),
       |$layers,
       |dfin AS (
       |  SELECT s.vec_id, s.m, c.cid,
       |    list_sum([(s.qs[i] - c.c[i]) * (s.qs[i] - c.c[i])
       |      for i in generate_series(1, $sd)]) AS dist
       |  FROM sub s JOIN c$iters c ON c.m = s.m),
       |codes AS (
       |  SELECT vec_id, m, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
       |      ORDER BY dist, cid) AS rn FROM dfin)
       |  WHERE rn = 1),
       |qsub AS (SELECT vec_id AS query_id, m, qs FROM sub
       |         WHERE vec_id % $queryMod = 0),
       |lut AS (
       |  SELECT q.query_id, c.m, c.cid,
       |    CAST(list_sum([(q.qs[i] - c.c[i]) * (q.qs[i] - c.c[i])
       |      for i in generate_series(1, $sd)]) AS BIGINT) AS dm
       |  FROM qsub q JOIN c$iters c ON c.m = q.m)""".stripMargin
  }

  private def pqOracleSql(mSub: Int, k: Int, iters: Int, dims: Int,
                          topK: Int, queryMod: Int): String =
    s"""WITH ${pqCoreCtes(mSub, k, iters, dims, queryMod)},
       |ad AS (
       |  SELECT l.query_id, co.vec_id AS neighbor_id,
       |    CAST(sum(l.dm) AS BIGINT) AS dist
       |  FROM codes co JOIN lut l ON l.m = co.m AND l.cid = co.cid
       |  GROUP BY 1, 2),
       |rk AS (
       |  SELECT query_id, neighbor_id, dist,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY dist, neighbor_id) AS rnk
       |  FROM ad WHERE neighbor_id <> query_id)
       |SELECT query_id, neighbor_id, dist, CAST(rnk AS BIGINT) AS rank
       |FROM rk WHERE rnk <= $topK ORDER BY query_id, rank""".stripMargin

  /** q170 oracle: the q137 PQ core plus the IVF composition — coarse
    * cells from the sha-ordered sample (the q46 recipe, ':ivfpq' tag),
    * integer-L2 routing of every vector to its nearest cell, nprobe
    * probe cells per query, ADC re-rank restricted to candidates
    * assigned to the probed cells. */
  private def ivfPqOracleSql(mSub: Int, k: Int, iters: Int, dims: Int,
                             topK: Int, queryMod: Int, cells: Int,
                             nprobe: Int): String =
    s"""WITH ${pqCoreCtes(mSub, k, iters, dims, queryMod)},
       |cc AS (
       |  SELECT vec_id, CAST(row_number() OVER (ORDER BY sh, vec_id) - 1
       |    AS BIGINT) AS cell_id
       |  FROM (SELECT vec_id,
       |          sha256(CAST(vec_id AS VARCHAR) || ':ivfpq') AS sh
       |        FROM v ORDER BY sh, vec_id LIMIT $cells)),
       |ccv AS (SELECT cc.cell_id, v.q AS cq FROM cc JOIN v USING (vec_id)),
       |cdist AS (
       |  SELECT v.vec_id, c.cell_id,
       |    list_sum([(v.q[i] - c.cq[i]) * (v.q[i] - c.cq[i])
       |      for i in generate_series(1, $dims)]) AS cd
       |  FROM v CROSS JOIN ccv c),
       |crk AS (
       |  SELECT vec_id, cell_id,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cd, cell_id) AS rn
       |  FROM cdist),
       |asg AS (SELECT vec_id AS neighbor_id, cell_id FROM crk WHERE rn = 1),
       |probes AS (SELECT vec_id AS query_id, cell_id FROM crk
       |           WHERE rn <= $nprobe AND vec_id % $queryMod = 0),
       |cand AS (
       |  SELECT p.query_id, a.neighbor_id
       |  FROM probes p JOIN asg a USING (cell_id)
       |  WHERE a.neighbor_id <> p.query_id),
       |ad AS (
       |  SELECT ca.query_id, ca.neighbor_id,
       |    CAST(sum(l.dm) AS BIGINT) AS dist
       |  FROM cand ca
       |    JOIN codes co ON co.vec_id = ca.neighbor_id
       |    JOIN lut l ON l.query_id = ca.query_id
       |      AND l.m = co.m AND l.cid = co.cid
       |  GROUP BY 1, 2),
       |rk AS (
       |  SELECT query_id, neighbor_id, dist,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY dist, neighbor_id) AS rnk
       |  FROM ad)
       |SELECT query_id, neighbor_id, dist, CAST(rnk AS BIGINT) AS rank
       |FROM rk WHERE rnk <= $topK ORDER BY query_id, rank""".stripMargin

  /** q130 oracle: the q124 Lloyd chain over corpus ∪ planted near-dups,
    * then the SemDeDup within-cluster integer cosine pruning — pairwise
    * dot at 2^10 quantization, τ = 19/20 tested as
    * dot²·400 ≥ 361·n2a·n2b, (hash, id) admission order. */
  private def semDedupOracleSql(k: Int, iters: Int, dims: Int): String = {
    val pre =
      s"""src AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding, label
         |  FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000,
         |    [CASE WHEN i = 1 THEN CAST(embedding AS DOUBLE[])[i] + 0.001
         |          ELSE CAST(embedding AS DOUBLE[])[i] END
         |     for i in generate_series(1, $dims)], label
         |  FROM embeddings WHERE vec_id % 10 = 0),
         |""".stripMargin
    s"""${kmeansOracleCore(k, iters, dims, src = "src", pre = pre)},
       |s10 AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS qs
       |  FROM src),
       |m AS (
       |  SELECT af.vec_id, af.label, af.cid, h.h, s10.qs,
       |    CAST(list_sum([s10.qs[i] * s10.qs[i]
       |      for i in generate_series(1, $dims)]) AS BIGINT) AS n2
       |  FROM af JOIN hv h ON h.vec_id = af.vec_id
       |    JOIN s10 ON s10.vec_id = af.vec_id),
       |pr AS (
       |  SELECT b.vec_id AS ib, a.n2 AS na, b.n2 AS nb,
       |    CAST(list_sum([a.qs[i] * b.qs[i]
       |      for i in generate_series(1, $dims)]) AS BIGINT) AS dot
       |  FROM m a JOIN m b ON a.cid = b.cid
       |    AND (a.h < b.h OR (a.h = b.h AND a.vec_id < b.vec_id))),
       |dp AS (SELECT DISTINCT ib AS vec_id FROM pr
       |       WHERE dot > 0 AND dot * dot * 400 >= 361 * na * nb)
       |SELECT m.cid AS cid, m.vec_id AS vec_id, m.label AS label,
       |  m.vec_id NOT IN (SELECT vec_id FROM dp) AS kept
       |FROM m ORDER BY cid, vec_id""".stripMargin
  }

  /** q109 oracle: replay the BMP pixel-generation formula (NOT the
    * parser). Pixel (x, y-top-down) of image i lives at pixel-array
    * offset (h-1-y)*stride + 3x (bottom-up rows, 4-byte stride), channels
    * B,G,R in file order; every byte is the sha256 hex chain's byte at
    * that offset. The feature sums are integer-exact, so the DOUBLE
    * projection hashes identically against the parsed-bytes Spark side. */
  private lazy val bmpFeatCte: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(off: String): String =
      s"(strpos($alpha, substr(hexfull, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr(hexfull, 2 * ($off) + 2, 1)) - 1)"
    val shaChunks = (0 to 7)
      .map(k => s"sha256('42:' || CAST(i AS VARCHAR) || ':$k')")
      .mkString(" || ")
    val dimByte0 =
      s"(strpos($alpha, substr(dh, 1, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 2, 1)) - 1)"
    val dimByte1 =
      s"(strpos($alpha, substr(dh, 3, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 4, 1)) - 1)"
    s"""WITH dim AS (
       |  SELECT i, 4 + ($dimByte0) % 5 AS w, 4 + ($dimByte1) % 5 AS h, hexfull
       |  FROM (SELECT i, sha256('42:' || CAST(i AS VARCHAR) || ':dim') AS dh,
       |               $shaChunks AS hexfull
       |        FROM range(200) t(i))),
       |px AS (
       |  SELECT i, w, h, hexfull,
       |    CAST(j % w AS INT) AS x, CAST(j // w AS INT) AS yt,
       |    (h - 1 - (j // w)) * (((3 * w + 3) // 4) * 4) + 3 * (j % w) AS off
       |  FROM dim, range(64) r(j) WHERE j < w * h),
       |chan AS (
       |  SELECT i, w, h, x, yt,
       |    ${byteAt("off")} AS b, ${byteAt("off + 1")} AS g,
       |    ${byteAt("off + 2")} AS rr
       |  FROM px),
       |feat AS (
       |  SELECT i AS media_id,
       |    sum(rr) AS f0, sum(g) AS f1, sum(b) AS f2,
       |    sum(rr * (x + 1)) AS f3, sum(g * (yt + 1)) AS f4,
       |    sum(b * (x + 1) * (yt + 1)) AS f5,
       |    max(w * 256 + h) AS f6,
       |    sum(CASE WHEN rr > g THEN 1 ELSE 0 END) AS f7
       |  FROM chan GROUP BY i)""".stripMargin
  }

  /** q191 oracle: the q109 pixel replay extended to luma and a
    * kernel-weighted 3×3 neighborhood self-join. Sobel weights are
    * generated, not tabulated: gx weight = dx·(2−|dy|), gy weight =
    * dy·(2−|dx|) over dx,dy ∈ {−1,0,1}. Interior is never empty
    * (w,h ≥ 4), so the per-image aggregates join 1:1 with the
    * whole-image luma lanes. */
  private lazy val sobelBmpFeatCte: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(off: String): String =
      s"(strpos($alpha, substr(hexfull, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr(hexfull, 2 * ($off) + 2, 1)) - 1)"
    val shaChunks = (0 to 7)
      .map(k => s"sha256('42:' || CAST(i AS VARCHAR) || ':$k')")
      .mkString(" || ")
    val dimByte0 =
      s"(strpos($alpha, substr(dh, 1, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 2, 1)) - 1)"
    val dimByte1 =
      s"(strpos($alpha, substr(dh, 3, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 4, 1)) - 1)"
    s"""WITH dim AS MATERIALIZED (
       |  SELECT i, 4 + ($dimByte0) % 5 AS w, 4 + ($dimByte1) % 5 AS h, hexfull
       |  FROM (SELECT i, sha256('42:' || CAST(i AS VARCHAR) || ':dim') AS dh,
       |               $shaChunks AS hexfull
       |        FROM range(200) t(i))),
       |px AS (
       |  SELECT i, w, h, hexfull,
       |    CAST(j % w AS INT) AS x, CAST(j // w AS INT) AS yt,
       |    (h - 1 - (j // w)) * (((3 * w + 3) // 4) * 4) + 3 * (j % w) AS off
       |  FROM dim, range(64) r(j) WHERE j < w * h),
       |lum AS MATERIALIZED (
       |  SELECT i, w, h, x, yt,
       |    (77 * (${byteAt("off + 2")}) + 151 * (${byteAt("off + 1")})
       |     + 28 * (${byteAt("off")}) + 128) // 256 AS l
       |  FROM px),
       |g AS MATERIALIZED (
       |  SELECT c.i, c.x, c.yt, c.w,
       |    sum(n.l * (k.dx * (2 - abs(k.dy)))) AS gx,
       |    sum(n.l * (k.dy * (2 - abs(k.dx)))) AS gy
       |  FROM lum c
       |  CROSS JOIN (SELECT dx.range - 1 AS dx, dy.range - 1 AS dy
       |              FROM range(3) dx, range(3) dy) k
       |  JOIN lum n ON n.i = c.i AND n.x = c.x + k.dx AND n.yt = c.yt + k.dy
       |  WHERE c.x >= 1 AND c.x <= c.w - 2 AND c.yt >= 1 AND c.yt <= c.h - 2
       |  GROUP BY c.i, c.x, c.yt, c.w),
       |feat AS (
       |  SELECT la.i AS media_id,
       |    ga.s0 AS f0, ga.s1 AS f1, ga.m2 AS f2, ga.e3 AS f3,
       |    ga.p4 AS f4, ga.n5 AS f5, la.w * 256 + la.h AS f6, la.ls AS f7
       |  FROM (SELECT i, max(w) AS w, max(h) AS h, sum(l) AS ls
       |        FROM lum GROUP BY i) la
       |  JOIN (SELECT i, sum(abs(gx)) AS s0, sum(abs(gy)) AS s1,
       |          max(abs(gx) + abs(gy)) AS m2,
       |          sum(CASE WHEN abs(gx) + abs(gy) >= 256 THEN 1 ELSE 0 END) AS e3,
       |          sum((abs(gx) + abs(gy)) * ((yt * w + x) % 97 + 1)) AS p4,
       |          count(*) AS n5
       |        FROM g GROUP BY i) ga ON ga.i = la.i)""".stripMargin
  }

  /** q75/q179 shared CTE: the greedy first-fit packing recurrence,
    * stepped row-by-row per shard (recursion depth = max docs/shard).
    * Ends with `pack(doc_id, n_tok, shard, rn, seq_id, tok_start)`. */
  private lazy val packRecurrenceCte: String =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
      |      x -> x <> '')) AS BIGINT) AS n_tok,
      |    sha256(CAST(doc_id AS VARCHAR) || ':pack:42') AS sk
      |  FROM documents),
      |o AS (
      |  SELECT doc_id, n_tok, substring(sk, 1, 1) AS shard,
      |    row_number() OVER (PARTITION BY substring(sk, 1, 1)
      |      ORDER BY sk, doc_id) AS rn
      |  FROM t),
      |pack AS (
      |  SELECT doc_id, n_tok, shard, rn,
      |    0::BIGINT AS seq_id, 0::BIGINT AS tok_start
      |  FROM o WHERE rn = 1
      |  UNION ALL
      |  SELECT o.doc_id, o.n_tok, o.shard, o.rn,
      |    CASE WHEN p.tok_start + p.n_tok > 0
      |           AND p.tok_start + p.n_tok + o.n_tok > 512
      |         THEN p.seq_id + 1 ELSE p.seq_id END,
      |    CASE WHEN p.tok_start + p.n_tok > 0
      |           AND p.tok_start + p.n_tok + o.n_tok > 512
      |         THEN 0 ELSE p.tok_start + p.n_tok END
      |  FROM pack p JOIN o ON o.shard = p.shard AND o.rn = p.rn + 1)""".stripMargin

  /** q173 oracle: replay the nearest-neighbor resample over the BMP
    * pixel-generation formula (NOT the parser, NOT the encoder — those
    * are gated by the Spark side decoding its own re-encoded output).
    * Target pixel (x, yt) of the 7×6 result reads source pixel
    * (⌊x·w/7⌋, ⌊yt·h/6⌋), which lives at bottom-up offset
    * (h-1-sy)·stride + 3·sx of the source chain bytes. */
  private lazy val resizeBmpFeatCte: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(off: String): String =
      s"(strpos($alpha, substr(hexfull, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr(hexfull, 2 * ($off) + 2, 1)) - 1)"
    val shaChunks = (0 to 7)
      .map(k => s"sha256('42:' || CAST(i AS VARCHAR) || ':$k')")
      .mkString(" || ")
    val dimByte0 =
      s"(strpos($alpha, substr(dh, 1, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 2, 1)) - 1)"
    val dimByte1 =
      s"(strpos($alpha, substr(dh, 3, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 4, 1)) - 1)"
    s"""WITH dim AS (
       |  SELECT i, 4 + ($dimByte0) % 5 AS w, 4 + ($dimByte1) % 5 AS h, hexfull
       |  FROM (SELECT i, sha256('42:' || CAST(i AS VARCHAR) || ':dim') AS dh,
       |               $shaChunks AS hexfull
       |        FROM range(200) t(i))),
       |px AS (
       |  SELECT i, hexfull,
       |    CAST(j % 7 AS INT) AS x, CAST(j // 7 AS INT) AS yt,
       |    (h - 1 - (((j // 7) * h) // 6)) * (((3 * w + 3) // 4) * 4)
       |      + 3 * (((j % 7) * w) // 7) AS off
       |  FROM dim, range(42) r(j)),
       |chan AS (
       |  SELECT i, x, yt,
       |    ${byteAt("off")} AS b, ${byteAt("off + 1")} AS g,
       |    ${byteAt("off + 2")} AS rr
       |  FROM px),
       |feat AS (
       |  SELECT i AS media_id,
       |    sum(rr) AS f0, sum(g) AS f1, sum(b) AS f2,
       |    sum(rr * (x + 1)) AS f3, sum(g * (yt + 1)) AS f4,
       |    sum(b * (x + 1) * (yt + 1)) AS f5,
       |    max(7 * 256 + 6) AS f6,
       |    sum(CASE WHEN rr > g THEN 1 ELSE 0 END) AS f7
       |  FROM chan GROUP BY i)""".stripMargin
  }

  /** q174 oracle: replay the animated-GIF frame-generation formulas (NOT
    * the parser): frame k's pixels are the "agif{k}" chain bytes through
    * the "agifpal" palette, its delay is 10·(2 + dlybyte(k) mod 8) ms,
    * frame k starts at the cumulative sum of earlier delays, and sample
    * instant t = 50·s (t < total duration) carries the LATEST frame with
    * start ≤ t. Every lane is integer-exact; the delay windowing and the
    * active-frame max both replay in plain SQL. */
  /** Shared q174/q180 prefix: the animated-GIF corpus replay down to
    * per-frame per-pixel channels — dim (dims, frame count, delays,
    * palette chains), fr (per-frame delay + pixel chains), px (pixel
    * indices), chan (palette-RGB channels per (i, k, x, yt)). */
  private lazy val agifChanCte: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(src: String, off: String): String =
      s"(strpos($alpha, substr($src, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr($src, 2 * ($off) + 2, 1)) - 1)"
    val iv = "CAST(i AS VARCHAR)"
    val kv = "CAST(k AS VARCHAR)"
    val palChunks = (0 to 23)
      .map(c => s"sha256('42:agifpal:' || $iv || ':$c')")
      .mkString(" || ")
    val pixChunks = (0 to 7)
      .map(c => s"sha256('42:agif' || $kv || ':' || $iv || ':$c')")
      .mkString(" || ")
    val dimByte0 =
      s"(strpos($alpha, substr(dh, 1, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 2, 1)) - 1)"
    val dimByte1 =
      s"(strpos($alpha, substr(dh, 3, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 4, 1)) - 1)"
    s"""WITH dim AS (
       |  SELECT i, 4 + ($dimByte0) % 5 AS w, 4 + ($dimByte1) % 5 AS h,
       |    2 + (${byteAt(s"sha256('42:agifnf:' || $iv)", "0")}) % 4 AS nf,
       |    sha256('42:agifdly:' || $iv) AS dlyhex, palhex
       |  FROM (SELECT i, sha256('42:agifdim:' || $iv) AS dh,
       |               $palChunks AS palhex
       |        FROM range(120) t(i))),
       |fr AS (
       |  SELECT i, CAST(k AS INT) AS k, w, h, palhex,
       |    10 * (2 + (${byteAt("dlyhex", "k")}) % 8) AS delay_ms,
       |    $pixChunks AS pixhex
       |  FROM dim, range(5) r(k) WHERE k < nf),
       |px AS (
       |  SELECT i, k, w, h, palhex,
       |    CAST(j % w AS INT) AS x, CAST(j // w AS INT) AS yt,
       |    ${byteAt("pixhex", "j")} AS idx
       |  FROM fr, range(64) r(j) WHERE j < w * h),
       |chan AS (
       |  SELECT i, k, w, h, x, yt,
       |    ${byteAt("palhex", "3 * idx")} AS rr,
       |    ${byteAt("palhex", "3 * idx + 1")} AS g,
       |    ${byteAt("palhex", "3 * idx + 2")} AS b
       |  FROM px)""".stripMargin
  }

  private lazy val frameSampleCte: String =
    agifChanCte + """,
       |st AS (
       |  SELECT i, k, delay_ms,
       |    COALESCE(CAST(sum(delay_ms) OVER (PARTITION BY i ORDER BY k
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS INT), 0)
       |      AS start_ms,
       |    CAST(sum(delay_ms) OVER (PARTITION BY i) AS INT) AS dur_ms
       |  FROM fr),
       |samp AS (
       |  SELECT d.i, CAST(s AS INT) AS s, CAST(s * 50 AS INT) AS t
       |  FROM (SELECT DISTINCT i, dur_ms FROM st) d, range(16) r(s)
       |  WHERE s * 50 < d.dur_ms),
       |act AS (
       |  SELECT samp.i, samp.s, samp.t, max(st.k) AS k
       |  FROM samp JOIN st ON st.i = samp.i AND st.start_ms <= samp.t
       |  GROUP BY 1, 2, 3),
       |ffeat AS (
       |  SELECT i, k,
       |    sum(rr) AS f0, sum(g) AS f1, sum(b) AS f2,
       |    sum(rr * (x + 1)) AS f3, sum(g * (yt + 1)) AS f4,
       |    sum(b * (x + 1) * (yt + 1)) AS f5,
       |    max(w * 256 + h) AS f6,
       |    sum(CASE WHEN rr > g THEN 1 ELSE 0 END) AS f7
       |  FROM chan GROUP BY i, k)""".stripMargin

  /** q175 oracle: replay the nearest-neighbor resample over the WAV
    * sample-generation formula (NOT the parser or encoder — those are
    * gated by the Spark side decoding its own re-encoded output).
    * Output sample j of file i is source sample ⌊j·rate/10000⌋ (the
    * 16-bit signed LE chain value), output length ⌊ns·10000/rate⌋;
    * lanes and the zero-crossing lag are identical to q110's but over
    * the resampled sequence. */
  private lazy val resampleWavCte: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(off: String): String =
      s"(strpos($alpha, substr(hexfull, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr(hexfull, 2 * ($off) + 2, 1)) - 1)"
    val shaChunks = (0 to 7)
      .map(k => s"sha256('42:' || CAST(i AS VARCHAR) || ':$k')")
      .mkString(" || ")
    val lenByte0 =
      s"(strpos($alpha, substr(lh, 1, 1)) - 1) * 16 + (strpos($alpha, substr(lh, 2, 1)) - 1)"
    val lenByte1 =
      s"(strpos($alpha, substr(lh, 3, 1)) - 1) * 16 + (strpos($alpha, substr(lh, 4, 1)) - 1)"
    s"""WITH dim AS (
       |  SELECT i, 32 + ($lenByte0) % 64 AS ns, 8000 + ($lenByte1) * 16 AS rate,
       |         hexfull
       |  FROM (SELECT i, sha256('42:' || CAST(i AS VARCHAR) || ':len') AS lh,
       |               $shaChunks AS hexfull
       |        FROM range(200) t(i))),
       |smp AS (
       |  SELECT i, j, (j * rate) // 10000 AS k,
       |    ${byteAt("2 * ((j * rate) // 10000)")} AS b0,
       |    (${byteAt("2 * ((j * rate) // 10000)")})
       |      + 256 * (${byteAt("2 * ((j * rate) // 10000) + 1")})
       |      - CASE WHEN (${byteAt("2 * ((j * rate) // 10000)")})
       |               + 256 * (${byteAt("2 * ((j * rate) // 10000) + 1")})
       |             >= 32768 THEN 65536 ELSE 0 END AS s
       |  FROM dim, range(128) r(j) WHERE j < (ns * 10000) // rate),
       |sgn AS (
       |  SELECT i, j, s, b0,
       |    CASE WHEN j > 0 AND ((s >= 0) <>
       |        (lag(s) OVER (PARTITION BY i ORDER BY j) >= 0))
       |      THEN 1 ELSE 0 END AS zc
       |  FROM smp),
       |feat AS (
       |  SELECT i AS media_id,
       |    sum(s) AS f0, sum(abs(s)) AS f1, max(s) AS f2, min(s) AS f3,
       |    sum(zc) AS f4, sum(b0 * (j + 1)) AS f5,
       |    max(10000) AS f6, count(*) AS f7
       |  FROM sgn GROUP BY i)""".stripMargin
  }

  /** q181 oracle: replay the fixed-point bilinear resample over the BMP
    * pixel-generation formula. Target (x, yt) of the 7×6 result blends
    * the four source neighbors of the align-corners mapping
    * sx_fp = x·(w−1)·256/6, sy_fp = yt·(h−1)·256/5 with 8-bit fractional
    * weights and the +32768 >> 16 rounding — all integer, so the DOUBLE
    * projection hashes identically against the decoded-output Spark
    * side. */
  private lazy val bilinearBmpFeatCte: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(off: String): String =
      s"(strpos($alpha, substr(hexfull, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr(hexfull, 2 * ($off) + 2, 1)) - 1)"
    val shaChunks = (0 to 7)
      .map(k => s"sha256('42:' || CAST(i AS VARCHAR) || ':$k')")
      .mkString(" || ")
    val dimByte0 =
      s"(strpos($alpha, substr(dh, 1, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 2, 1)) - 1)"
    val dimByte1 =
      s"(strpos($alpha, substr(dh, 3, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 4, 1)) - 1)"
    def off(sx: String, sy: String): String =
      s"(h - 1 - ($sy)) * (((3 * w + 3) // 4) * 4) + 3 * ($sx)"
    // corner channel columns: c<chan><yx> with chan b/g/r offsets 0/1/2
    val corners = (for ((cn, co) <- Seq(("b", 0), ("g", 1), ("r", 2));
                        (yx, sx, sy) <- Seq(("00", "x0", "y0"), ("10", "x1", "y0"),
                                            ("01", "x0", "y1"), ("11", "x1", "y1")))
      yield s"${byteAt(s"${off(sx, sy)} + $co")} AS c$cn$yx").mkString(",\n    ")
    def blend(cn: String): String =
      s"(c${cn}00 * (256 - fx) * (256 - fy) + c${cn}10 * fx * (256 - fy)" +
        s" + c${cn}01 * (256 - fx) * fy + c${cn}11 * fx * fy + 32768) // 65536"
    s"""WITH dim AS (
       |  SELECT i, 4 + ($dimByte0) % 5 AS w, 4 + ($dimByte1) % 5 AS h, hexfull
       |  FROM (SELECT i, sha256('42:' || CAST(i AS VARCHAR) || ':dim') AS dh,
       |               $shaChunks AS hexfull
       |        FROM range(200) t(i))),
       |grid AS (
       |  SELECT i, w, h, hexfull,
       |    CAST(j % 7 AS INT) AS x, CAST(j // 7 AS INT) AS yt,
       |    ((j % 7) * (w - 1) * 256) // 6 AS sxfp,
       |    ((j // 7) * (h - 1) * 256) // 5 AS syfp
       |  FROM dim, range(42) r(j)),
       |pos AS (
       |  SELECT i, w, h, hexfull, x, yt,
       |    sxfp // 256 AS x0, least(sxfp // 256 + 1, w - 1) AS x1,
       |    sxfp % 256 AS fx,
       |    syfp // 256 AS y0, least(syfp // 256 + 1, h - 1) AS y1,
       |    syfp % 256 AS fy
       |  FROM grid),
       |cor AS (
       |  SELECT i, x, yt, fx, fy,
       |    $corners
       |  FROM pos),
       |chan AS (
       |  SELECT i, x, yt,
       |    ${blend("r")} AS rr, ${blend("g")} AS g, ${blend("b")} AS b
       |  FROM cor),
       |feat AS (
       |  SELECT i AS media_id,
       |    sum(rr) AS f0, sum(g) AS f1, sum(b) AS f2,
       |    sum(rr * (x + 1)) AS f3, sum(g * (yt + 1)) AS f4,
       |    sum(b * (x + 1) * (yt + 1)) AS f5,
       |    max(7 * 256 + 6) AS f6,
       |    sum(CASE WHEN rr > g THEN 1 ELSE 0 END) AS f7
       |  FROM chan GROUP BY i)""".stripMargin
  }

  /** q183 oracle: replay peak detection and the sign-safe gain scaling
    * over the WAV sample formula — s' = sign(s)·((|s|·32767) // peak),
    * low byte re-derived from the stored two's-complement form for the
    * positional lane. Corpus peaks are never 0 (uniform 16-bit chains),
    * so the pass-through branch never fires here; MultimodalSpec pins
    * it. */
  private lazy val gainWavCte: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(off: String): String =
      s"(strpos($alpha, substr(hexfull, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr(hexfull, 2 * ($off) + 2, 1)) - 1)"
    val shaChunks = (0 to 7)
      .map(k => s"sha256('42:' || CAST(i AS VARCHAR) || ':$k')")
      .mkString(" || ")
    val lenByte0 =
      s"(strpos($alpha, substr(lh, 1, 1)) - 1) * 16 + (strpos($alpha, substr(lh, 2, 1)) - 1)"
    val lenByte1 =
      s"(strpos($alpha, substr(lh, 3, 1)) - 1) * 16 + (strpos($alpha, substr(lh, 4, 1)) - 1)"
    s"""WITH dim AS (
       |  SELECT i, 32 + ($lenByte0) % 64 AS ns, 8000 + ($lenByte1) * 16 AS rate,
       |         hexfull
       |  FROM (SELECT i, sha256('42:' || CAST(i AS VARCHAR) || ':len') AS lh,
       |               $shaChunks AS hexfull
       |        FROM range(200) t(i))),
       |smp AS (
       |  SELECT i, ns, rate, j,
       |    (${byteAt("2 * j")}) + 256 * (${byteAt("2 * j + 1")})
       |      - CASE WHEN (${byteAt("2 * j")}) + 256 * (${byteAt("2 * j + 1")})
       |             >= 32768 THEN 65536 ELSE 0 END AS s
       |  FROM dim, range(96) r(j) WHERE j < ns),
       |pk AS (SELECT i, max(abs(s)) AS peak FROM smp GROUP BY i),
       |sc AS (
       |  SELECT smp.i, smp.ns, smp.rate, smp.j,
       |    CASE WHEN s < 0 THEN -(((-s) * 32767) // peak)
       |         ELSE (s * 32767) // peak END AS s
       |  FROM smp JOIN pk ON pk.i = smp.i),
       |lb AS (
       |  SELECT i, ns, rate, j, s,
       |    (s + CASE WHEN s < 0 THEN 65536 ELSE 0 END) % 256 AS b0
       |  FROM sc),
       |sgn AS (
       |  SELECT i, ns, rate, j, s, b0,
       |    CASE WHEN j > 0 AND ((s >= 0) <>
       |        (lag(s) OVER (PARTITION BY i ORDER BY j) >= 0))
       |      THEN 1 ELSE 0 END AS zc
       |  FROM lb),
       |feat AS (
       |  SELECT i AS media_id,
       |    sum(s) AS f0, sum(abs(s)) AS f1, max(s) AS f2, min(s) AS f3,
       |    sum(zc) AS f4, sum(b0 * (j + 1)) AS f5,
       |    max(rate) AS f6, max(ns) AS f7
       |  FROM sgn GROUP BY i)""".stripMargin
  }

  /** q182 oracle: replay the silence-trim span scan over the WAV sample
    * formula — first/last |s| ≥ 16384 bound the kept inclusive span,
    * positions re-index from the span start (the trimmed file's sample
    * j − first), and the lanes/zero-crossing lag run over the KEPT
    * sequence only. The synthesized corpus never goes all-silent
    * (P ≈ 2⁻³², 32+ uniform samples), so the bounds are always
    * defined. */
  private lazy val trimWavCte: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(off: String): String =
      s"(strpos($alpha, substr(hexfull, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr(hexfull, 2 * ($off) + 2, 1)) - 1)"
    val shaChunks = (0 to 7)
      .map(k => s"sha256('42:' || CAST(i AS VARCHAR) || ':$k')")
      .mkString(" || ")
    val lenByte0 =
      s"(strpos($alpha, substr(lh, 1, 1)) - 1) * 16 + (strpos($alpha, substr(lh, 2, 1)) - 1)"
    val lenByte1 =
      s"(strpos($alpha, substr(lh, 3, 1)) - 1) * 16 + (strpos($alpha, substr(lh, 4, 1)) - 1)"
    s"""WITH dim AS (
       |  SELECT i, 32 + ($lenByte0) % 64 AS ns, 8000 + ($lenByte1) * 16 AS rate,
       |         hexfull
       |  FROM (SELECT i, sha256('42:' || CAST(i AS VARCHAR) || ':len') AS lh,
       |               $shaChunks AS hexfull
       |        FROM range(200) t(i))),
       |smp AS (
       |  SELECT i, rate, j,
       |    ${byteAt("2 * j")} AS b0,
       |    (${byteAt("2 * j")}) + 256 * (${byteAt("2 * j + 1")})
       |      - CASE WHEN (${byteAt("2 * j")}) + 256 * (${byteAt("2 * j + 1")})
       |             >= 32768 THEN 65536 ELSE 0 END AS s
       |  FROM dim, range(96) r(j) WHERE j < ns),
       |bounds AS (
       |  SELECT i, min(j) AS fst, max(j) AS lst
       |  FROM smp WHERE abs(s) >= 16384 GROUP BY i),
       |kept AS (
       |  SELECT smp.i, smp.rate, smp.j - b.fst AS j, smp.b0, smp.s
       |  FROM smp JOIN bounds b ON b.i = smp.i
       |  WHERE smp.j BETWEEN b.fst AND b.lst),
       |sgn AS (
       |  SELECT i, rate, j, s, b0,
       |    CASE WHEN j > 0 AND ((s >= 0) <>
       |        (lag(s) OVER (PARTITION BY i ORDER BY j) >= 0))
       |      THEN 1 ELSE 0 END AS zc
       |  FROM kept),
       |feat AS (
       |  SELECT i AS media_id,
       |    sum(s) AS f0, sum(abs(s)) AS f1, max(s) AS f2, min(s) AS f3,
       |    sum(zc) AS f4, sum(b0 * (j + 1)) AS f5,
       |    max(rate) AS f6, count(*) AS f7
       |  FROM sgn GROUP BY i)""".stripMargin
  }

  /** q185 oracle: replay the center-crop anchor over the BMP pixel
    * formula — target (x, yt) of the 4×4 crop reads source pixel
    * (x0+x, y0+yt) with x0 = ⌊(w−4)/2⌋, y0 = ⌊(h−4)/2⌋. */
  private lazy val cropBmpFeatCte: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(off: String): String =
      s"(strpos($alpha, substr(hexfull, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr(hexfull, 2 * ($off) + 2, 1)) - 1)"
    val shaChunks = (0 to 7)
      .map(k => s"sha256('42:' || CAST(i AS VARCHAR) || ':$k')")
      .mkString(" || ")
    val dimByte0 =
      s"(strpos($alpha, substr(dh, 1, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 2, 1)) - 1)"
    val dimByte1 =
      s"(strpos($alpha, substr(dh, 3, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 4, 1)) - 1)"
    s"""WITH dim AS (
       |  SELECT i, 4 + ($dimByte0) % 5 AS w, 4 + ($dimByte1) % 5 AS h, hexfull
       |  FROM (SELECT i, sha256('42:' || CAST(i AS VARCHAR) || ':dim') AS dh,
       |               $shaChunks AS hexfull
       |        FROM range(200) t(i))),
       |px AS (
       |  SELECT i, hexfull,
       |    CAST(j % 4 AS INT) AS x, CAST(j // 4 AS INT) AS yt,
       |    (h - 1 - ((h - 4) // 2 + j // 4)) * (((3 * w + 3) // 4) * 4)
       |      + 3 * ((w - 4) // 2 + j % 4) AS off
       |  FROM dim, range(16) r(j)),
       |chan AS (
       |  SELECT i, x, yt,
       |    ${byteAt("off")} AS b, ${byteAt("off + 1")} AS g,
       |    ${byteAt("off + 2")} AS rr
       |  FROM px),
       |feat AS (
       |  SELECT i AS media_id,
       |    sum(rr) AS f0, sum(g) AS f1, sum(b) AS f2,
       |    sum(rr * (x + 1)) AS f3, sum(g * (yt + 1)) AS f4,
       |    sum(b * (x + 1) * (yt + 1)) AS f5,
       |    max(4 * 256 + 4) AS f6,
       |    sum(CASE WHEN rr > g THEN 1 ELSE 0 END) AS f7
       |  FROM chan GROUP BY i)""".stripMargin
  }

  /** q187 oracle: replay the four orientation coordinate remaps over
    * the BMP pixel formula — per mode, target (x, yt) reads source
    * (sx, sy) per the documented mapping, with the rotations swapping
    * the reported geometry lane. One UNION ALL branch per mode. */
  private lazy val orientationsOracleSql: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(off: String): String =
      s"(strpos($alpha, substr(hexfull, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr(hexfull, 2 * ($off) + 2, 1)) - 1)"
    val shaChunks = (0 to 7)
      .map(k => s"sha256('42:' || CAST(i AS VARCHAR) || ':$k')")
      .mkString(" || ")
    val dimByte0 =
      s"(strpos($alpha, substr(dh, 1, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 2, 1)) - 1)"
    val dimByte1 =
      s"(strpos($alpha, substr(dh, 3, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 4, 1)) - 1)"
    // target grid width per mode ('w' or 'h'), source coords in terms of
    // target (x, yt) and source dims (w, h), and the geometry lane
    val modes = Seq(
      ("flip_h", "w", "w - 1 - x", "yt", "w * 256 + h"),
      ("rot180", "w", "w - 1 - x", "h - 1 - yt", "w * 256 + h"),
      ("rot90", "h", "yt", "h - 1 - x", "h * 256 + w"),
      ("rot270", "h", "w - 1 - yt", "x", "h * 256 + w"))
    val branches = modes.map { case (mode, gw, sx, sy, f6) =>
      s"""SELECT i AS media_id, '$mode' AS mode,
         |  CAST(sum(rr) AS DOUBLE) AS f0, CAST(sum(g) AS DOUBLE) AS f1,
         |  CAST(sum(b) AS DOUBLE) AS f2,
         |  CAST(sum(rr * (x + 1)) AS DOUBLE) AS f3,
         |  CAST(sum(g * (yt + 1)) AS DOUBLE) AS f4,
         |  CAST(sum(b * (x + 1) * (yt + 1)) AS DOUBLE) AS f5,
         |  CAST(max($f6) AS DOUBLE) AS f6,
         |  CAST(sum(CASE WHEN rr > g THEN 1 ELSE 0 END) AS DOUBLE) AS f7
         |FROM (
         |  SELECT i, w, h, x, yt,
         |    ${byteAt("off")} AS b, ${byteAt("off + 1")} AS g,
         |    ${byteAt("off + 2")} AS rr
         |  FROM (
         |    SELECT i, w, h, hexfull, x, yt,
         |      (h - 1 - ($sy)) * (((3 * w + 3) // 4) * 4) + 3 * ($sx) AS off
         |    FROM (
         |      SELECT i, w, h, hexfull,
         |        CAST(j % $gw AS INT) AS x, CAST(j // $gw AS INT) AS yt
         |      FROM dim, range(64) r(j) WHERE j < w * h) g0) g1) g2
         |GROUP BY i""".stripMargin
    }
    s"""WITH dim AS (
       |  SELECT i, 4 + ($dimByte0) % 5 AS w, 4 + ($dimByte1) % 5 AS h, hexfull
       |  FROM (SELECT i, sha256('42:' || CAST(i AS VARCHAR) || ':dim') AS dh,
       |               $shaChunks AS hexfull
       |        FROM range(200) t(i)))
       |${branches.mkString("", "\nUNION ALL\n", "")}
       |ORDER BY media_id, mode""".stripMargin
  }

  /** q186 oracle: replay the fixed-point BT.601 luma over the BMP pixel
    * formula — L = (77·R + 151·G + 28·B + 128) // 256, lanes over
    * R=G=B=L (the r>g lane is identically zero). */
  private lazy val grayBmpFeatCte: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(off: String): String =
      s"(strpos($alpha, substr(hexfull, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr(hexfull, 2 * ($off) + 2, 1)) - 1)"
    val shaChunks = (0 to 7)
      .map(k => s"sha256('42:' || CAST(i AS VARCHAR) || ':$k')")
      .mkString(" || ")
    val dimByte0 =
      s"(strpos($alpha, substr(dh, 1, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 2, 1)) - 1)"
    val dimByte1 =
      s"(strpos($alpha, substr(dh, 3, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 4, 1)) - 1)"
    s"""WITH dim AS (
       |  SELECT i, 4 + ($dimByte0) % 5 AS w, 4 + ($dimByte1) % 5 AS h, hexfull
       |  FROM (SELECT i, sha256('42:' || CAST(i AS VARCHAR) || ':dim') AS dh,
       |               $shaChunks AS hexfull
       |        FROM range(200) t(i))),
       |px AS (
       |  SELECT i, w, h, hexfull,
       |    CAST(j % w AS INT) AS x, CAST(j // w AS INT) AS yt,
       |    (h - 1 - (j // w)) * (((3 * w + 3) // 4) * 4) + 3 * (j % w) AS off
       |  FROM dim, range(64) r(j) WHERE j < w * h),
       |lum AS (
       |  SELECT i, w, h, x, yt,
       |    (77 * (${byteAt("off + 2")}) + 151 * (${byteAt("off + 1")})
       |     + 28 * (${byteAt("off")}) + 128) // 256 AS l
       |  FROM px),
       |feat AS (
       |  SELECT i AS media_id,
       |    sum(l) AS f0, sum(l) AS f1, sum(l) AS f2,
       |    sum(l * (x + 1)) AS f3, sum(l * (yt + 1)) AS f4,
       |    sum(l * (x + 1) * (yt + 1)) AS f5,
       |    max(w * 256 + h) AS f6,
       |    0 AS f7
       |  FROM lum GROUP BY i)""".stripMargin
  }

  /** q188 oracle: replay the correlated-GIF mask rule (pixel j of frame
    * k comes from chain m* = max {m ≤ k : mask(m, j)}, mask(0,·) always
    * set — the q133 copy-mask trick on the time axis), the per-pixel
    * value-difference count between consecutive frames, the cumulative
    * start times, and the keyframe rule (k = 0 or changed% ≥ 35). */
  private lazy val keyframesOracleSql: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(src: String, off: String): String =
      s"(strpos($alpha, substr($src, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr($src, 2 * ($off) + 2, 1)) - 1)"
    val iv = "CAST(i AS VARCHAR)"
    val kv = "CAST(k AS VARCHAR)"
    val palChunks = (0 to 23)
      .map(c => s"sha256('42:cgifpal:' || $iv || ':$c')")
      .mkString(" || ")
    def chunks(tag: String): String = (0 to 7)
      .map(c => s"sha256('42:$tag' || $kv || ':' || $iv || ':$c')")
      .mkString(" || ")
    val dimByte0 =
      s"(strpos($alpha, substr(dh, 1, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 2, 1)) - 1)"
    val dimByte1 =
      s"(strpos($alpha, substr(dh, 3, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 4, 1)) - 1)"
    s"""WITH dim AS (
       |  SELECT i, 4 + ($dimByte0) % 5 AS w, 4 + ($dimByte1) % 5 AS h,
       |    2 + (${byteAt(s"sha256('42:cgifnf:' || $iv)", "0")}) % 4 AS nf,
       |    sha256('42:cgifdly:' || $iv) AS dlyhex, palhex
       |  FROM (SELECT i, sha256('42:cgifdim:' || $iv) AS dh,
       |               $palChunks AS palhex
       |        FROM range(120) t(i))),
       |fr AS (
       |  SELECT i, CAST(k AS INT) AS k, w, h,
       |    10 * (2 + (${byteAt("dlyhex", "k")}) % 8) AS delay_ms,
       |    ${chunks("cgif")} AS pixhex, ${chunks("cgifm")} AS maskhex
       |  FROM dim, range(5) r(k) WHERE k < nf),
       |cell AS (
       |  SELECT i, k AS m, CAST(j AS INT) AS j,
       |    (k = 0 OR (${byteAt("maskhex", "j")}) < 64) AS sel,
       |    ${byteAt("pixhex", "j")} AS pb
       |  FROM fr, range(64) r(j) WHERE j < w * h),
       |ms AS (
       |  SELECT c.i, f.k, c.j, max(c.m) AS msrc
       |  FROM cell c JOIN fr f ON f.i = c.i AND c.m <= f.k
       |  WHERE c.sel GROUP BY 1, 2, 3),
       |pidx AS (
       |  SELECT ms.i, ms.k, ms.j, cell.pb
       |  FROM ms JOIN cell ON cell.i = ms.i AND cell.m = ms.msrc
       |    AND cell.j = ms.j),
       |chan AS (
       |  SELECT p.i, p.k, d.w, d.h,
       |    CAST(p.j % d.w AS INT) AS x, CAST(p.j // d.w AS INT) AS yt,
       |    ${byteAt("d.palhex", "3 * p.pb")} AS rr,
       |    ${byteAt("d.palhex", "3 * p.pb + 1")} AS g,
       |    ${byteAt("d.palhex", "3 * p.pb + 2")} AS b
       |  FROM pidx p JOIN dim d ON d.i = p.i),
       |ffeat AS (
       |  SELECT i, k,
       |    sum(rr) AS f0, sum(g) AS f1, sum(b) AS f2,
       |    sum(rr * (x + 1)) AS f3, sum(g * (yt + 1)) AS f4,
       |    sum(b * (x + 1) * (yt + 1)) AS f5,
       |    max(w * 256 + h) AS f6,
       |    sum(CASE WHEN rr > g THEN 1 ELSE 0 END) AS f7,
       |    max(w * h) AS npx
       |  FROM chan GROUP BY i, k),
       |delta AS (
       |  SELECT a.i, b.k,
       |    CAST(sum(CASE WHEN a.rr <> b.rr OR a.g <> b.g OR a.b <> b.b
       |             THEN 1 ELSE 0 END) AS BIGINT) AS changed
       |  FROM chan a JOIN chan b ON b.i = a.i AND b.k = a.k + 1
       |    AND b.x = a.x AND b.yt = a.yt
       |  GROUP BY 1, 2),
       |st AS (
       |  SELECT i, k, delay_ms,
       |    COALESCE(CAST(sum(delay_ms) OVER (PARTITION BY i ORDER BY k
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS INT), 0)
       |      AS start_ms
       |  FROM fr),
       |key AS (
       |  SELECT f.i, f.k, st.start_ms,
       |    COALESCE(d.changed, 0) AS n_changed,
       |    f.f0, f.f1, f.f2, f.f3, f.f4, f.f5, f.f6, f.f7
       |  FROM ffeat f JOIN st ON st.i = f.i AND st.k = f.k
       |  LEFT JOIN delta d ON d.i = f.i AND d.k = f.k
       |  WHERE f.k = 0 OR COALESCE(d.changed, 0) * 100 >= 35 * f.npx)
       |SELECT i AS media_id, CAST(k AS INT) AS frame_idx,
       |  CAST(start_ms AS INT) AS start_ms,
       |  CAST(n_changed AS BIGINT) AS n_changed,
       |  CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
       |  CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3,
       |  CAST(f4 AS DOUBLE) AS f4, CAST(f5 AS DOUBLE) AS f5,
       |  CAST(f6 AS DOUBLE) AS f6, CAST(f7 AS DOUBLE) AS f7
       |FROM key ORDER BY media_id, frame_idx""".stripMargin
  }

  /** q110 oracle: replay the WAV sample-generation formula (NOT the
    * parser). Sample j of file i is the 16-bit signed LE value at chain
    * bytes (2j, 2j+1); sample count and rate come from the "len" sha
    * bytes. Zero crossings via a lag window; every aggregate is
    * integer-exact so the DOUBLE projection hashes identically against
    * the parsed-bytes Spark side. */
  private lazy val wavFeatCte: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(off: String): String =
      s"(strpos($alpha, substr(hexfull, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr(hexfull, 2 * ($off) + 2, 1)) - 1)"
    val shaChunks = (0 to 7)
      .map(k => s"sha256('42:' || CAST(i AS VARCHAR) || ':$k')")
      .mkString(" || ")
    val lenByte0 =
      s"(strpos($alpha, substr(lh, 1, 1)) - 1) * 16 + (strpos($alpha, substr(lh, 2, 1)) - 1)"
    val lenByte1 =
      s"(strpos($alpha, substr(lh, 3, 1)) - 1) * 16 + (strpos($alpha, substr(lh, 4, 1)) - 1)"
    s"""WITH dim AS (
       |  SELECT i, 32 + ($lenByte0) % 64 AS ns, 8000 + ($lenByte1) * 16 AS rate,
       |         hexfull
       |  FROM (SELECT i, sha256('42:' || CAST(i AS VARCHAR) || ':len') AS lh,
       |               $shaChunks AS hexfull
       |        FROM range(200) t(i))),
       |smp AS (
       |  SELECT i, ns, rate, j,
       |    ${byteAt("2 * j")} AS b0,
       |    (${byteAt("2 * j")}) + 256 * (${byteAt("2 * j + 1")})
       |      - CASE WHEN (${byteAt("2 * j")}) + 256 * (${byteAt("2 * j + 1")})
       |             >= 32768 THEN 65536 ELSE 0 END AS s
       |  FROM dim, range(96) r(j) WHERE j < ns),
       |sgn AS (
       |  SELECT i, ns, rate, j, s, b0,
       |    CASE WHEN j > 0 AND ((s >= 0) <>
       |        (lag(s) OVER (PARTITION BY i ORDER BY j) >= 0))
       |      THEN 1 ELSE 0 END AS zc
       |  FROM smp),
       |feat AS (
       |  SELECT i AS media_id,
       |    sum(s) AS f0, sum(abs(s)) AS f1, max(s) AS f2, min(s) AS f3,
       |    sum(zc) AS f4, sum(b0 * (j + 1)) AS f5,
       |    max(rate) AS f6, max(ns) AS f7
       |  FROM sgn GROUP BY i)""".stripMargin
  }

  /** q192 oracle: the q110 sample replay + the Walsh–Hadamard sign
    * rule — lane k's coefficient is the sample sum signed by
    * popcount(k AND n) parity over the 64-sample window (shorter files
    * analyze their full length). */
  private lazy val whtWavCte: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(off: String): String =
      s"(strpos($alpha, substr(hexfull, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr(hexfull, 2 * ($off) + 2, 1)) - 1)"
    val shaChunks = (0 to 7)
      .map(k => s"sha256('42:' || CAST(i AS VARCHAR) || ':$k')")
      .mkString(" || ")
    val lenByte0 =
      s"(strpos($alpha, substr(lh, 1, 1)) - 1) * 16 + (strpos($alpha, substr(lh, 2, 1)) - 1)"
    s"""WITH dim AS (
       |  SELECT i, 32 + ($lenByte0) % 64 AS ns, hexfull
       |  FROM (SELECT i, sha256('42:' || CAST(i AS VARCHAR) || ':len') AS lh,
       |               $shaChunks AS hexfull
       |        FROM range(200) t(i))),
       |smp AS MATERIALIZED (
       |  SELECT i, j,
       |    (${byteAt("2 * j")}) + 256 * (${byteAt("2 * j + 1")})
       |      - CASE WHEN (${byteAt("2 * j")}) + 256 * (${byteAt("2 * j + 1")})
       |             >= 32768 THEN 65536 ELSE 0 END AS s
       |  FROM dim, range(64) r(j) WHERE j < ns),
       |lanes AS (SELECT * FROM (VALUES (0, 0), (1, 1), (2, 2), (3, 4),
       |  (4, 8), (5, 16), (6, 32), (7, 63)) l(li, k)),
       |wv AS (
       |  SELECT i, li,
       |    sum(CASE WHEN bit_count(k & j) % 2 = 0 THEN s ELSE -s END) AS v
       |  FROM smp CROSS JOIN lanes GROUP BY i, li),
       |feat AS (
       |  SELECT i AS media_id,
       |    max(CASE WHEN li = 0 THEN v END) AS f0,
       |    max(CASE WHEN li = 1 THEN v END) AS f1,
       |    max(CASE WHEN li = 2 THEN v END) AS f2,
       |    max(CASE WHEN li = 3 THEN v END) AS f3,
       |    max(CASE WHEN li = 4 THEN v END) AS f4,
       |    max(CASE WHEN li = 5 THEN v END) AS f5,
       |    max(CASE WHEN li = 6 THEN v END) AS f6,
       |    max(CASE WHEN li = 7 THEN v END) AS f7
       |  FROM wv GROUP BY i)""".stripMargin
  }

  /** q111 oracle: replay the PNG pixel-generation formula (NOT the
    * parser — and NOT the deflate layer, which decoded pixels are
    * independent of). Pixel (x, y) of image i is the "png"-tagged chain
    * bytes at offset 3(y·w + x) + {0,1,2} (RGB, row-major top-down, no
    * stride padding); dimensions from the "png dim" sha bytes. Feature
    * lanes are identical to q109's. */
  private lazy val pngFeatCte: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(off: String): String =
      s"(strpos($alpha, substr(hexfull, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr(hexfull, 2 * ($off) + 2, 1)) - 1)"
    val shaChunks = (0 to 7)
      .map(k => s"sha256('42:png:' || CAST(i AS VARCHAR) || ':$k')")
      .mkString(" || ")
    val dimByte0 =
      s"(strpos($alpha, substr(dh, 1, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 2, 1)) - 1)"
    val dimByte1 =
      s"(strpos($alpha, substr(dh, 3, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 4, 1)) - 1)"
    s"""WITH dim AS (
       |  SELECT i, 4 + ($dimByte0) % 5 AS w, 4 + ($dimByte1) % 5 AS h, hexfull
       |  FROM (SELECT i, sha256('42:png:' || CAST(i AS VARCHAR) || ':dim') AS dh,
       |               $shaChunks AS hexfull
       |        FROM range(200) t(i))),
       |px AS (
       |  SELECT i, w, h, hexfull,
       |    CAST(j % w AS INT) AS x, CAST(j // w AS INT) AS yt,
       |    3 * j AS off
       |  FROM dim, range(64) r(j) WHERE j < w * h),
       |chan AS (
       |  SELECT i, w, h, x, yt,
       |    ${byteAt("off")} AS rr, ${byteAt("off + 1")} AS g,
       |    ${byteAt("off + 2")} AS b
       |  FROM px),
       |feat AS (
       |  SELECT i AS media_id,
       |    sum(rr) AS f0, sum(g) AS f1, sum(b) AS f2,
       |    sum(rr * (x + 1)) AS f3, sum(g * (yt + 1)) AS f4,
       |    sum(b * (x + 1) * (yt + 1)) AS f5,
       |    max(w * 256 + h) AS f6,
       |    sum(CASE WHEN rr > g THEN 1 ELSE 0 END) AS f7
       |  FROM chan GROUP BY i)""".stripMargin
  }

  /** q112 oracle: replay the GIF pixel-index and palette formulas (NOT
    * the parser — and NOT the LZW layer, which decoded indices are
    * independent of). Pixel (x, y) of image i is palette entry
    * chainbyte(y·w + x); palette entry e's R,G,B are the "gifpal" chain
    * bytes at 3e..3e+2. Feature lanes are identical to q109's. */
  private lazy val gifFeatCte: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(src: String, off: String): String =
      s"(strpos($alpha, substr($src, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr($src, 2 * ($off) + 2, 1)) - 1)"
    val pixChunks = (0 to 7)
      .map(k => s"sha256('42:gif:' || CAST(i AS VARCHAR) || ':$k')")
      .mkString(" || ")
    val palChunks = (0 to 23)
      .map(k => s"sha256('42:gifpal:' || CAST(i AS VARCHAR) || ':$k')")
      .mkString(" || ")
    val dimByte0 =
      s"(strpos($alpha, substr(dh, 1, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 2, 1)) - 1)"
    val dimByte1 =
      s"(strpos($alpha, substr(dh, 3, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 4, 1)) - 1)"
    s"""WITH dim AS (
       |  SELECT i, 4 + ($dimByte0) % 5 AS w, 4 + ($dimByte1) % 5 AS h,
       |         pixhex, palhex
       |  FROM (SELECT i, sha256('42:gifdim:' || CAST(i AS VARCHAR)) AS dh,
       |               $pixChunks AS pixhex, $palChunks AS palhex
       |        FROM range(200) t(i))),
       |px AS (
       |  SELECT i, w, h, palhex,
       |    CAST(j % w AS INT) AS x, CAST(j // w AS INT) AS yt,
       |    ${byteAt("pixhex", "j")} AS idx
       |  FROM dim, range(64) r(j) WHERE j < w * h),
       |chan AS (
       |  SELECT i, w, h, x, yt,
       |    ${byteAt("palhex", "3 * idx")} AS rr,
       |    ${byteAt("palhex", "3 * idx + 1")} AS g,
       |    ${byteAt("palhex", "3 * idx + 2")} AS b
       |  FROM px),
       |feat AS (
       |  SELECT i AS media_id,
       |    sum(rr) AS f0, sum(g) AS f1, sum(b) AS f2,
       |    sum(rr * (x + 1)) AS f3, sum(g * (yt + 1)) AS f4,
       |    sum(b * (x + 1) * (yt + 1)) AS f5,
       |    max(w * 256 + h) AS f6,
       |    sum(CASE WHEN rr > g THEN 1 ELSE 0 END) AS f7
       |  FROM chan GROUP BY i)""".stripMargin
  }

  /** q133 oracle: replay the QOI pixel-generation formula (NOT the
    * op-stream coder — decoded pixels are op-choice-independent, the
    * q111 transparency property). Pixel j of image i takes the
    * "qoi"-tagged chain RGB triple of the nearest non-copy index ≤ j;
    * j > 0 is a copy iff its "mask"-chain byte ≡ 0 (mod 4) — one
    * running-max window over anchor indices replays the rule. Feature
    * lanes identical to q109/q111/q112. */
  /** q149 oracle: replay the ZIP member-content formula (NOT the
    * container — decoded member bytes are independent of how the deflate
    * layer represented them, the q111 transparency property extended to
    * archives). Archive i has 1 + dimbyte % 3 members; member k's length
    * is 16 + lenbyte % 48, its bytes the "zip"/"zipc1"-tagged chain, its
    * name the literal formula m{k}_{i}.bin, its method (i+k) parity. */
  private lazy val zipMemberCte: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(src: String, off: String): String =
      s"(strpos($alpha, substr($src, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr($src, 2 * ($off) + 2, 1)) - 1)"
    val iv = "CAST(i AS VARCHAR)"
    val kv = "CAST(k AS VARCHAR)"
    s"""WITH arc AS (
       |  SELECT i,
       |    1 + (${byteAt(s"sha256('42:zipdim:' || $iv)", "0")}) % 3 AS nm
       |  FROM range(200) t(i)),
       |mem AS (
       |  SELECT i, CAST(k AS INT) AS k,
       |    16 + (${byteAt(s"sha256('42:ziplen:' || $iv || ':' || $kv)", "0")}) % 48 AS len,
       |    sha256('42:zip:' || $iv || ':' || $kv) ||
       |      sha256('42:zipc1:' || $iv || ':' || $kv) AS hexfull
       |  FROM arc, range(3) r(k) WHERE k < nm),
       |byt AS (
       |  SELECT i, k, len, CAST(j AS INT) AS j, ${byteAt("hexfull", "j")} AS b
       |  FROM mem, range(63) r(j) WHERE j < len),
       |feat AS (
       |  SELECT i AS media_id, k AS member_idx,
       |    'm' || CAST(k AS VARCHAR) || '_' || CAST(i AS VARCHAR) || '.bin' AS name,
       |    CAST(CASE WHEN (i + k) % 2 = 0 THEN 0 ELSE 8 END AS INT) AS method,
       |    max(len) AS usize,
       |    sum(b) AS f0, sum(b * (j + 1)) AS f1,
       |    max(CASE WHEN j = 0 THEN b END) AS f2,
       |    max(CASE WHEN j = len - 1 THEN b END) AS f3
       |  FROM byt GROUP BY i, k)""".stripMargin
  }

  /** q153 oracle: replay the gzip member-content formula (the zip CTE
    * with gz tags; decoded bytes are deflate-representation-independent).
    * Names replay the FNAME rule: present iff (i + k) is even. */
  private lazy val gzipMemberCte: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(src: String, off: String): String =
      s"(strpos($alpha, substr($src, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr($src, 2 * ($off) + 2, 1)) - 1)"
    val iv = "CAST(i AS VARCHAR)"
    val kv = "CAST(k AS VARCHAR)"
    s"""WITH arc AS (
       |  SELECT i,
       |    1 + (${byteAt(s"sha256('42:gzdim:' || $iv)", "0")}) % 3 AS nm
       |  FROM range(200) t(i)),
       |mem AS (
       |  SELECT i, CAST(k AS INT) AS k,
       |    16 + (${byteAt(s"sha256('42:gzlen:' || $iv || ':' || $kv)", "0")}) % 48 AS len,
       |    sha256('42:gz:' || $iv || ':' || $kv) ||
       |      sha256('42:gzc1:' || $iv || ':' || $kv) AS hexfull
       |  FROM arc, range(3) r(k) WHERE k < nm),
       |byt AS (
       |  SELECT i, k, len, CAST(j AS INT) AS j, ${byteAt("hexfull", "j")} AS b
       |  FROM mem, range(63) r(j) WHERE j < len),
       |feat AS (
       |  SELECT i AS media_id, k AS member_idx,
       |    CASE WHEN (i + k) % 2 = 0
       |         THEN 'g' || CAST(k AS VARCHAR) || '_' || CAST(i AS VARCHAR)
       |         ELSE '' END AS name,
       |    CAST(8 AS INT) AS method,
       |    max(len) AS usize,
       |    sum(b) AS f0, sum(b * (j + 1)) AS f1,
       |    max(CASE WHEN j = 0 THEN b END) AS f2,
       |    max(CASE WHEN j = len - 1 THEN b END) AS f3
       |  FROM byt GROUP BY i, k)""".stripMargin
  }

  /** q158 oracle: replay the WARC block-content formula ("wlen"/"wc"/
    * "wc1" sha chains), the URI rule (present iff (i+k) % 5 != 0), and
    * the type→method mapping (response=1, request=3, metadata=4 in the
    * ISO 28500 §6 type order). Header-layout variation (version lines,
    * lowercase names, extension headers) is representation the parser
    * must see through — the replay is layout-independent by design. */
  private lazy val warcMemberCte: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(src: String, off: String): String =
      s"(strpos($alpha, substr($src, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr($src, 2 * ($off) + 2, 1)) - 1)"
    val iv = "CAST(i AS VARCHAR)"
    val kv = "CAST(k AS VARCHAR)"
    s"""WITH arc AS (
       |  SELECT i,
       |    1 + (${byteAt(s"sha256('42:wdim:' || $iv)", "0")}) % 3 AS nm
       |  FROM range(200) t(i)),
       |mem AS (
       |  SELECT i, CAST(k AS INT) AS k,
       |    16 + (${byteAt(s"sha256('42:wlen:' || $iv || ':' || $kv)", "0")}) % 48 AS len,
       |    sha256('42:wc:' || $iv || ':' || $kv) ||
       |      sha256('42:wc1:' || $iv || ':' || $kv) AS hexfull
       |  FROM arc, range(3) r(k) WHERE k < nm),
       |byt AS (
       |  SELECT i, k, len, CAST(j AS INT) AS j, ${byteAt("hexfull", "j")} AS b
       |  FROM mem, range(63) r(j) WHERE j < len),
       |feat AS (
       |  SELECT i AS media_id, k AS member_idx,
       |    CASE WHEN (i + k) % 5 = 0 THEN ''
       |         ELSE 'http://w' || CAST(k AS VARCHAR) || '.example/' ||
       |              CAST(i AS VARCHAR) END AS name,
       |    CAST(([1, 3, 4])[CAST((i + k) % 3 AS INT) + 1] AS INT) AS method,
       |    max(len) AS usize,
       |    sum(b) AS f0, sum(b * (j + 1)) AS f1,
       |    max(CASE WHEN j = 0 THEN b END) AS f2,
       |    max(CASE WHEN j = len - 1 THEN b END) AS f3
       |  FROM byt GROUP BY i, k)""".stripMargin
  }

  /** q171 oracle: replay the JPEG pixel formula, NOT the codec. The
    * synthesis lattice makes the lossy format lossless by construction
    * (operators/Jpeg.synthesizeJpeg scaladoc), so pixel (x, y) of image
    * i is an exact integer function of its block's four sha-chain
    * parameters — base + a·s(x) + b·s(y) + c·s(x)s(y) for luma, the
    * same shape at half resolution for each chroma plane, then the
    * fixed-point YCbCr→RGB shifts (floor division by 2^16, exact in
    * doubles). Any Huffman, zigzag, dequant, IDCT, upsample, or
    * color-convert mistake desyncs the q109 feature lanes. */
  private lazy val jpegFeatCte: String =
    jpegFeatCtes("SELECT i FROM range(200) t(i)")

  /** The q171 pixel-formula CTE chain over an arbitrary id source
    * (`idSrc` must yield one column `i`): dim → px → par → ycc → chan
    * → feat, with feat keyed media_id = i. q171 feeds range(200);
    * q208 feeds the derived frame ids vid·100 + frame of the
    * MJPEG-in-AVI corpus — SAME formula, zero new pixel math. */
  /** q218/q219 oracle CTEs: the full unigram-LM training replay —
    * word census, substring-candidate census + top-N selection, the
    * integer-only log2lin weight formula, and per EM iteration the
    * max-plus prefix-doubling Viterbi (struct max over
    * (score, −n, −mask) — the engine's total-order tie-break) plus the
    * piece decode from the cut bitmask. `emIters` E-steps replay
    * unrolled; `rounds` doubling rounds per Viterbi. */
  private def unigramCtes(maxPieceLen: Int, topN: Int, emIters: Int,
                          rounds: Int, where: String = ""): String = {
    def l2l(x: String): String = {
      val e = s"(length(bin($x)) - 1)"
      val p = s"(CAST(1 AS BIGINT) << CAST($e AS INT))"
      s"($e * 1048576 + (($x - $p) * 1048576) // $p)"
    }
    def wtCte(k: Int): String =
      s"""wt$k AS MATERIALIZED (
         |  SELECT piece, cnt, CAST(${l2l("c1")} - ${l2l("tt")} AS BIGINT)
         |    AS wt
         |  FROM (SELECT piece, cnt, CAST(cnt + 1 AS BIGINT) AS c1,
         |          CAST(sum(cnt + 1) OVER () AS BIGINT) AS tt
         |        FROM cnt$k))""".stripMargin
    def viterbiCtes(k: Int): String = {
      val e =
        s"""e$k AS MATERIALIZED (
           |  SELECT s.w, s.j, s.i, wt$k.wt AS score,
           |    CAST(1 AS BIGINT) AS n, CAST(0 AS BIGINT) AS mask
           |  FROM (SELECT w, CAST(j - 1 AS BIGINT) AS j,
           |          CAST(j - 1 + pl AS BIGINT) AS i,
           |          substr(w, CAST(j AS INT), CAST(pl AS INT)) AS piece
           |        FROM wds,
           |          unnest(generate_series(1, least($maxPieceLen, len)))
           |            u(pl),
           |          unnest(generate_series(1, len - pl + 1)) s(j)) s
           |  JOIN wt$k USING (piece)),
           |p${k}r0 AS MATERIALIZED (SELECT * FROM e$k)""".stripMargin
      val rs = (1 to rounds).map { r =>
        s"""p${k}r$r AS MATERIALIZED (
           |  SELECT w, j, i,
           |    struct_extract(bb, 's') AS score,
           |    -struct_extract(bb, 'nn') AS n,
           |    -struct_extract(bb, 'nm') AS mask
           |  FROM (
           |    SELECT w, j, i,
           |      max(struct_pack(s := score, nn := -n, nm := -mask)) AS bb
           |    FROM (
           |      SELECT w, j, i, score, n, mask FROM p${k}r${r - 1}
           |      UNION ALL
           |      SELECT a.w, a.j, b.i, a.score + b.score, a.n + b.n,
           |        a.mask + b.mask + (CAST(1 AS BIGINT) << CAST(a.i AS INT))
           |      FROM p${k}r${r - 1} a JOIN p${k}r${r - 1} b
           |        ON a.w = b.w AND a.i = b.j) u
           |    GROUP BY w, j, i) m)""".stripMargin
      }
      val b =
        s"""b$k AS MATERIALIZED (
           |  SELECT p.w, p.n, p.mask, wds.cnt
           |  FROM p${k}r$rounds p JOIN wds ON wds.w = p.w
           |  WHERE p.j = 0 AND p.i = wds.len)""".stripMargin
      (Seq(e) ++ rs ++ Seq(b)).mkString(",\n")
    }
    def cntCte(k: Int): String =
      s"""cnt${k + 1} AS MATERIALIZED (
         |  SELECT c.piece, CAST(coalesce(u.used, 0) AS BIGINT) AS cnt
         |  FROM (SELECT piece FROM cands) c
         |  LEFT JOIN (
         |    SELECT piece, sum(cnt) AS used FROM (
         |      SELECT unnest([substr(w, CAST(bnds[k] + 1 AS INT),
         |          CAST(bnds[k + 1] - bnds[k] AS INT))
         |          for k in generate_series(1, len(bnds) - 1)]) AS piece,
         |        cnt
         |      FROM (SELECT w, cnt,
         |              [p for p in generate_series(0,
         |                 CAST(length(w) AS BIGINT))
         |               if p = 0 OR p = length(w)
         |                 OR ((mask >> p) & 1) = 1] AS bnds
         |            FROM b$k)) GROUP BY piece) u
         |  USING (piece))""".stripMargin
    val iters = (0 until emIters).map(k =>
      s"${wtCte(k)},\n${viterbiCtes(k)},\n${cntCte(k)}").mkString(",\n")
    s"""WITH base AS (
       |  SELECT source,
       |    list_filter(string_split_regex(trim(regexp_replace(
       |      lower(text), '\\s+', ' ', 'g')), '\\s+'), x -> x <> '') AS tk
       |  FROM documents $where),
       |wds AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS cnt,
       |    CAST(length(w) AS BIGINT) AS len
       |  FROM (SELECT unnest(tk) AS w FROM base) GROUP BY w),
       |cands AS MATERIALIZED (
       |  SELECT piece, census FROM (
       |    SELECT piece, census,
       |      CASE WHEN length(piece) = 1 THEN 0
       |        ELSE row_number() OVER (PARTITION BY length(piece) = 1
       |               ORDER BY census DESC, piece) END AS rn
       |    FROM (
       |      SELECT substr(w, CAST(j AS INT), CAST(pl AS INT)) AS piece,
       |        CAST(sum(cnt) AS BIGINT) AS census
       |      FROM wds,
       |        unnest(generate_series(1, least($maxPieceLen, len))) u(pl),
       |        unnest(generate_series(1, len - pl + 1)) s(j)
       |      GROUP BY 1))
       |  WHERE rn <= $topN),
       |cnt0 AS (SELECT piece, census AS cnt FROM cands),
       |$iters,
       |${wtCte(emIters)}""".stripMargin
  }

  private def unigramLearnOracleSql(maxPieceLen: Int, topN: Int,
                                    emIters: Int, rounds: Int): String = {
    val parts = (0 to emIters)
      .map(k => s"SELECT CAST($k AS BIGINT) AS iter, piece, cnt, wt " +
        s"FROM wt$k")
      .mkString("\n  UNION ALL ")
    s"""${unigramCtes(maxPieceLen, topN, emIters, rounds)}
       |SELECT iter, piece, cnt, wt FROM (
       |  $parts)
       |ORDER BY iter, piece""".stripMargin
  }

  /** q220 oracle: the q218 chain + the prune rule (all single chars +
    * top keepN multi-char by (EM count desc, piece) among used ones) +
    * weights renormalized over the survivors + one more unrolled
    * Viterbi E-step, reported per original candidate. */
  private def unigramPruneOracleSql(maxPieceLen: Int, topN: Int,
                                    emIters: Int, rounds: Int,
                                    keepN: Int): String = {
    def l2l(x: String): String = {
      val e = s"(length(bin($x)) - 1)"
      val p = s"(CAST(1 AS BIGINT) << CAST($e AS INT))"
      s"($e * 1048576 + (($x - $p) * 1048576) // $p)"
    }
    val rs = (1 to rounds).map { r =>
      s"""pKr$r AS MATERIALIZED (
         |  SELECT w, j, i,
         |    struct_extract(bb, 's') AS score,
         |    -struct_extract(bb, 'nn') AS n,
         |    -struct_extract(bb, 'nm') AS mask
         |  FROM (
         |    SELECT w, j, i,
         |      max(struct_pack(s := score, nn := -n, nm := -mask)) AS bb
         |    FROM (
         |      SELECT w, j, i, score, n, mask FROM pKr${r - 1}
         |      UNION ALL
         |      SELECT a.w, a.j, b.i, a.score + b.score, a.n + b.n,
         |        a.mask + b.mask + (CAST(1 AS BIGINT) << CAST(a.i AS INT))
         |      FROM pKr${r - 1} a JOIN pKr${r - 1} b
         |        ON a.w = b.w AND a.i = b.j) u
         |    GROUP BY w, j, i) m)""".stripMargin
    }.mkString(",\n")
    s"""${unigramCtes(maxPieceLen, topN, emIters, rounds)},
       |keep AS MATERIALIZED (
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt, CASE WHEN length(piece) = 1 THEN 0
       |      ELSE row_number() OVER (PARTITION BY length(piece) = 1
       |             ORDER BY cnt DESC, piece) END AS rn
       |    FROM cnt$emIters)
       |  WHERE (length(piece) = 1 OR cnt > 0) AND rn <= $keepN),
       |wtK AS MATERIALIZED (
       |  SELECT piece, cnt, CAST(${l2l("c1")} - ${l2l("tt")} AS BIGINT)
       |    AS wt
       |  FROM (SELECT piece, cnt, CAST(cnt + 1 AS BIGINT) AS c1,
       |          CAST(sum(cnt + 1) OVER () AS BIGINT) AS tt
       |        FROM keep)),
       |eK AS MATERIALIZED (
       |  SELECT s.w, s.j, s.i, wtK.wt AS score,
       |    CAST(1 AS BIGINT) AS n, CAST(0 AS BIGINT) AS mask
       |  FROM (SELECT w, CAST(j - 1 AS BIGINT) AS j,
       |          CAST(j - 1 + pl AS BIGINT) AS i,
       |          substr(w, CAST(j AS INT), CAST(pl AS INT)) AS piece
       |        FROM wds,
       |          unnest(generate_series(1, least($maxPieceLen, len)))
       |            u(pl),
       |          unnest(generate_series(1, len - pl + 1)) s(j)) s
       |  JOIN wtK USING (piece)),
       |pKr0 AS MATERIALIZED (SELECT * FROM eK),
       |$rs,
       |bK AS MATERIALIZED (
       |  SELECT p.w, p.n, p.mask, wds.cnt
       |  FROM pKr$rounds p JOIN wds ON wds.w = p.w
       |  WHERE p.j = 0 AND p.i = wds.len),
       |cntK AS MATERIALIZED (
       |  SELECT c.piece, CAST(coalesce(u.used, 0) AS BIGINT) AS cnt
       |  FROM (SELECT piece FROM keep) c
       |  LEFT JOIN (
       |    SELECT piece, sum(cnt) AS used FROM (
       |      SELECT unnest([substr(w, CAST(bnds[k] + 1 AS INT),
       |          CAST(bnds[k + 1] - bnds[k] AS INT))
       |          for k in generate_series(1, len(bnds) - 1)]) AS piece,
       |        cnt
       |      FROM (SELECT w, cnt,
       |              [p for p in generate_series(0,
       |                 CAST(length(w) AS BIGINT))
       |               if p = 0 OR p = length(w)
       |                 OR ((mask >> p) & 1) = 1] AS bnds
       |            FROM bK)) GROUP BY piece) u
       |  USING (piece))
       |SELECT c.piece,
       |  CAST(CASE WHEN k.piece IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
       |    AS kept,
       |  c.cnt AS cnt_pre, CAST(COALESCE(p.cnt, 0) AS BIGINT) AS cnt_post
       |FROM cnt$emIters c
       |LEFT JOIN keep k USING (piece)
       |LEFT JOIN cntK p USING (piece)
       |ORDER BY c.piece""".stripMargin
  }

  private def unigramEncodeOracleSql(maxPieceLen: Int, topN: Int,
                                     emIters: Int, rounds: Int): String = {
    // one more Viterbi under the FINAL weight table wt<emIters>
    def viterbiFinal: String = {
      val e =
        s"""eF AS MATERIALIZED (
           |  SELECT s.w, s.j, s.i, wt$emIters.wt AS score,
           |    CAST(1 AS BIGINT) AS n, CAST(0 AS BIGINT) AS mask
           |  FROM (SELECT w, CAST(j - 1 AS BIGINT) AS j,
           |          CAST(j - 1 + pl AS BIGINT) AS i,
           |          substr(w, CAST(j AS INT), CAST(pl AS INT)) AS piece
           |        FROM wds,
           |          unnest(generate_series(1, least($maxPieceLen, len)))
           |            u(pl),
           |          unnest(generate_series(1, len - pl + 1)) s(j)) s
           |  JOIN wt$emIters USING (piece)),
           |pFr0 AS MATERIALIZED (SELECT * FROM eF)""".stripMargin
      val rs = (1 to rounds).map { r =>
        s"""pFr$r AS MATERIALIZED (
           |  SELECT w, j, i,
           |    struct_extract(bb, 's') AS score,
           |    -struct_extract(bb, 'nn') AS n,
           |    -struct_extract(bb, 'nm') AS mask
           |  FROM (
           |    SELECT w, j, i,
           |      max(struct_pack(s := score, nn := -n, nm := -mask)) AS bb
           |    FROM (
           |      SELECT w, j, i, score, n, mask FROM pFr${r - 1}
           |      UNION ALL
           |      SELECT a.w, a.j, b.i, a.score + b.score, a.n + b.n,
           |        a.mask + b.mask + (CAST(1 AS BIGINT) << CAST(a.i AS INT))
           |      FROM pFr${r - 1} a JOIN pFr${r - 1} b
           |        ON a.w = b.w AND a.i = b.j) u
           |    GROUP BY w, j, i) m)""".stripMargin
      }
      val b =
        s"""bF AS MATERIALIZED (
           |  SELECT p.w, p.n
           |  FROM pFr$rounds p JOIN wds ON wds.w = p.w
           |  WHERE p.j = 0 AND p.i = wds.len)""".stripMargin
      (Seq(e) ++ rs ++ Seq(b)).mkString(",\n")
    }
    s"""${unigramCtes(maxPieceLen, topN, emIters, rounds)},
       |$viterbiFinal,
       |swd AS (
       |  SELECT source, w, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT source, unnest(tk) AS w FROM base) GROUP BY 1, 2)
       |SELECT source, CAST(sum(c) AS BIGINT) AS words,
       |  CAST(sum(length(w) * c) AS BIGINT) AS chars,
       |  CAST(sum(n * c) AS BIGINT) AS pieces
       |FROM swd JOIN bF USING (w)
       |GROUP BY source ORDER BY source""".stripMargin
  }

  /** q221 oracle: the CCNet composition — the q218 learn chain
    * restricted to the clean reference source, one more unrolled
    * Viterbi over the FULL-corpus word census under the final weights,
    * per-doc ordered piece streams (OOV words encode as the
    * `'<'×(maxPieceLen+1)` marker — longer than any real piece),
    * Stupid Backoff over the reference's piece bigrams (the q167
    * formula), and per-source percentile-cut buckets (the q142 integer
    * rule partitioned by source). */
  private def ccnetOracleSql(maxPieceLen: Int, topN: Int, emIters: Int,
                             rounds: Int, buckets: Int,
                             refSource: String): String = {
    val unkLen = maxPieceLen + 1
    val rs = (1 to rounds).map { r =>
      s"""pAr$r AS MATERIALIZED (
         |  SELECT w, j, i,
         |    struct_extract(bb, 's') AS score,
         |    -struct_extract(bb, 'nn') AS n,
         |    -struct_extract(bb, 'nm') AS mask
         |  FROM (
         |    SELECT w, j, i,
         |      max(struct_pack(s := score, nn := -n, nm := -mask)) AS bb
         |    FROM (
         |      SELECT w, j, i, score, n, mask FROM pAr${r - 1}
         |      UNION ALL
         |      SELECT a.w, a.j, b.i, a.score + b.score, a.n + b.n,
         |        a.mask + b.mask + (CAST(1 AS BIGINT) << CAST(a.i AS INT))
         |      FROM pAr${r - 1} a JOIN pAr${r - 1} b
         |        ON a.w = b.w AND a.i = b.j) u
         |    GROUP BY w, j, i) m)""".stripMargin
    }.mkString(",\n")
    s"""${unigramCtes(maxPieceLen, topN, emIters, rounds,
          s"WHERE source = '$refSource'")},
       |baseA AS (
       |  SELECT doc_id, source,
       |    list_filter(string_split_regex(trim(regexp_replace(
       |      lower(text), '\\s+', ' ', 'g')), '\\s+'), x -> x <> '') AS tk
       |  FROM documents),
       |wdsA AS MATERIALIZED (
       |  SELECT w, CAST(length(w) AS BIGINT) AS len
       |  FROM (SELECT unnest(tk) AS w FROM baseA) GROUP BY w),
       |eA AS MATERIALIZED (
       |  SELECT s.w, s.j, s.i, wt$emIters.wt AS score,
       |    CAST(1 AS BIGINT) AS n, CAST(0 AS BIGINT) AS mask
       |  FROM (SELECT w, CAST(j - 1 AS BIGINT) AS j,
       |          CAST(j - 1 + pl AS BIGINT) AS i,
       |          substr(w, CAST(j AS INT), CAST(pl AS INT)) AS piece
       |        FROM wdsA,
       |          unnest(generate_series(1, least($maxPieceLen, len)))
       |            u(pl),
       |          unnest(generate_series(1, len - pl + 1)) s(j)) s
       |  JOIN wt$emIters USING (piece)),
       |pAr0 AS MATERIALIZED (SELECT * FROM eA),
       |$rs,
       |bA AS MATERIALIZED (
       |  SELECT p.w, p.mask
       |  FROM pAr$rounds p JOIN wdsA ON wdsA.w = p.w
       |  WHERE p.j = 0 AND p.i = wdsA.len),
       |segA AS MATERIALIZED (
       |  SELECT w, [substr(w, CAST(bnds[k] + 1 AS INT),
       |      CAST(bnds[k + 1] - bnds[k] AS INT))
       |      for k in generate_series(1, len(bnds) - 1)] AS pcs
       |  FROM (SELECT w,
       |          [p for p in generate_series(0, CAST(length(w) AS BIGINT))
       |           if p = 0 OR p = length(w)
       |             OR ((mask >> p) & 1) = 1] AS bnds
       |        FROM bA)),
       |docw AS (
       |  SELECT doc_id, source, i AS pos, tk[i] AS w
       |  FROM baseA, unnest(generate_series(1, len(tk))) s(i)),
       |streams AS MATERIALIZED (
       |  SELECT doc_id, source, flatten(list(pcs ORDER BY pos)) AS ps,
       |    CAST(sum(oov) AS BIGINT) AS n_oov
       |  FROM (SELECT d.doc_id, d.source, d.pos,
       |          COALESCE(s.pcs, [repeat('<', $unkLen)]) AS pcs,
       |          CASE WHEN s.pcs IS NULL THEN 1 ELSE 0 END AS oov
       |        FROM docw d LEFT JOIN segA s USING (w))
       |  GROUP BY 1, 2),
       |runi AS MATERIALIZED (
       |  SELECT p, count(*) AS c1 FROM (
       |    SELECT unnest(ps) AS p FROM streams
       |    WHERE source = '$refSource') GROUP BY 1),
       |rsc AS (SELECT CAST(sum(c1) AS DOUBLE) AS t,
       |               CAST(count(*) AS DOUBLE) AS v FROM runi),
       |rbi AS MATERIALIZED (
       |  SELECT pr.p1 AS p1, pr.p2 AS p2, count(*) AS c2 FROM (
       |    SELECT unnest(list_transform(generate_series(1, len(ps) - 1),
       |      i -> struct_pack(p1 := ps[i], p2 := ps[i + 1]))) AS pr
       |    FROM streams WHERE source = '$refSource' AND len(ps) >= 2)
       |  GROUP BY 1, 2),
       |pg AS (
       |  SELECT doc_id, pr.p1 AS p1, pr.p2 AS p2, count(*) AS pf FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(generate_series(1, len(ps) - 1),
       |        i -> struct_pack(p1 := ps[i], p2 := ps[i + 1]))) AS pr
       |    FROM streams WHERE len(ps) >= 2)
       |  GROUP BY 1, 2, 3),
       |jn AS (
       |  SELECT pg.doc_id, pg.pf,
       |    CASE WHEN COALESCE(rbi.c2, 0) > 0
       |      THEN ln(CAST(rbi.c2 AS DOUBLE) / u1.c1)
       |      ELSE ln(0.4 * (COALESCE(u2.c1, 0) + 1.0)
       |        / (rsc.t + rsc.v + 1.0))
       |    END AS lp
       |  FROM pg
       |  LEFT JOIN rbi ON rbi.p1 = pg.p1 AND rbi.p2 = pg.p2
       |  LEFT JOIN runi u1 ON u1.p = pg.p1
       |  LEFT JOIN runi u2 ON u2.p = pg.p2, rsc),
       |scored0 AS (
       |  SELECT doc_id, CAST(sum(pf) AS BIGINT) AS n_pairs,
       |    r4(-sum(pf * lp) / sum(pf)) AS xsb
       |  FROM jn GROUP BY 1),
       |ds AS MATERIALIZED (
       |  SELECT s.doc_id, s.source, CAST(len(s.ps) AS BIGINT) AS n_pieces,
       |    s.n_oov, c.n_pairs, c.xsb
       |  FROM streams s JOIN scored0 c USING (doc_id)),
       |snn AS (SELECT source, CAST(count(*) AS BIGINT) AS n
       |        FROM ds GROUP BY 1),
       |scum AS (
       |  SELECT source, xsb,
       |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY xsb)
       |      AS BIGINT) AS cum
       |  FROM (SELECT source, xsb, CAST(count(*) AS BIGINT) AS cnt
       |        FROM ds GROUP BY 1, 2)),
       |cuts AS (
       |  SELECT c.source, t.b, min(c.xsb) AS cut
       |  FROM scum c JOIN snn ON snn.source = c.source
       |  CROSS JOIN range(1, $buckets) t(b)
       |  WHERE c.cum * $buckets >= t.b * snn.n GROUP BY 1, 2)
       |SELECT d.doc_id, d.source, d.n_pieces, d.n_oov, d.n_pairs, d.xsb,
       |  CAST(1 + (SELECT count(*) FROM cuts c
       |            WHERE c.source = d.source AND d.xsb > c.cut)
       |    AS BIGINT) AS bucket
       |FROM ds d ORDER BY doc_id""".stripMargin
  }

  /** q223 oracle: the q208 derived-id pixel replay (the clipped/full
    * copies reference the SAME derived frame ids, so only base frames
    * need pixels) → integer luma → 9×8 cross-multiplied dHash cells →
    * four 16-bit bands → the (video, frame) map → band join → Hamming
    * verify → offset vote → per-pair argmax → containment cut. */
  private def videoNearDupOracleSql(n: Int, maxHamming: Int,
                                    minOverlapPct: Int): String = {
    val alpha = "'0123456789abcdef'"
    val nfB = s"(strpos($alpha, substr(sha256('42:avnd:' " +
      s"|| CAST(v AS VARCHAR) || ':nf'), 1, 1)) - 1) * 16 " +
      s"+ (strpos($alpha, substr(sha256('42:avnd:' " +
      s"|| CAST(v AS VARCHAR) || ':nf'), 2, 1)) - 1)"
    val basesSql = s"SELECT v, 4 + ($nfB) % 3 AS nf FROM range($n) t(v)"
    val idSrc = s"SELECT v * 100 + f AS i FROM ($basesSql) bb, " +
      "range(6) r(f) WHERE f < nf"
    def bandSum(j: Int): String =
      s"CAST(COALESCE(sum(CASE WHEN (r * 8 + c) >= ${16 * j} AND " +
        s"(r * 8 + c) < ${16 * (j + 1)} THEN 1 << ((r * 8 + c) - ${16 * j}) " +
        s"END), 0) AS BIGINT) AS b$j"
    jpegFeatCtes(idSrc) + s""",
       |lum AS (
       |  SELECT i, rr * 299 + g * 587 + b * 114 AS lum,
       |    (x * 9) // w AS c, (yt * 8) // h AS r
       |  FROM chan),
       |cells AS MATERIALIZED (
       |  SELECT i, c, r, CAST(sum(lum) AS BIGINT) AS s,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM lum GROUP BY 1, 2, 3),
       |bits AS (
       |  SELECT a.i, a.r, a.c FROM cells a
       |  JOIN cells b ON b.i = a.i AND b.r = a.r AND b.c = a.c + 1
       |  WHERE a.s * b.n > b.s * a.n),
       |hsh AS MATERIALIZED (
       |  SELECT d.i, ${bandSum(0)}, ${bandSum(1)}, ${bandSum(2)},
       |    ${bandSum(3)}
       |  FROM (SELECT DISTINCT i FROM dim) d
       |  LEFT JOIN bits ON bits.i = d.i GROUP BY d.i),
       |bases AS ($basesSql),
       |vf AS MATERIALIZED (
       |  SELECT v AS video_id, f AS frame_idx, v * 100 + f AS i
       |  FROM bases, range(6) r(f) WHERE f < nf
       |  UNION ALL
       |  SELECT 1000 + v, f - 1, v * 100 + f
       |  FROM bases, range(6) r(f)
       |  WHERE v % 3 = 0 AND f >= 1 AND f < nf - 1
       |  UNION ALL
       |  SELECT 2000 + v, f, v * 100 + f
       |  FROM bases, range(6) r(f) WHERE v % 4 = 0 AND f < nf),
       |fh AS MATERIALIZED (
       |  SELECT video_id, frame_idx, b0, b1, b2, b3
       |  FROM vf JOIN hsh USING (i)),
       |nfv AS (SELECT video_id, CAST(count(*) AS BIGINT) AS nf
       |        FROM fh GROUP BY 1),
       |bd AS (
       |  SELECT video_id, frame_idx, u.band_idx,
       |    CASE u.band_idx WHEN 0 THEN b0 WHEN 1 THEN b1
       |      WHEN 2 THEN b2 ELSE b3 END AS band
       |  FROM fh, unnest(generate_series(0, 3)) u(band_idx)),
       |cand AS (
       |  SELECT DISTINCT x.video_id AS a, x.frame_idx AS fa,
       |    y.video_id AS b, y.frame_idx AS fb
       |  FROM bd x JOIN bd y ON y.band_idx = x.band_idx
       |    AND y.band = x.band AND x.video_id < y.video_id),
       |mt AS (
       |  SELECT c.a, c.fa, c.b, c.fb FROM cand c
       |  JOIN fh p ON p.video_id = c.a AND p.frame_idx = c.fa
       |  JOIN fh q ON q.video_id = c.b AND q.frame_idx = c.fb
       |  WHERE bit_count(xor(p.b0, q.b0)) + bit_count(xor(p.b1, q.b1))
       |    + bit_count(xor(p.b2, q.b2)) + bit_count(xor(p.b3, q.b3))
       |    <= $maxHamming),
       |votes AS (
       |  SELECT a, b, fb - fa AS off,
       |    CAST(count(*) AS BIGINT) AS n_aligned
       |  FROM mt GROUP BY 1, 2, 3),
       |best AS (
       |  SELECT a, b, off, n_aligned FROM (
       |    SELECT *, row_number() OVER (PARTITION BY a, b
       |      ORDER BY n_aligned DESC, off) AS rn
       |    FROM votes) WHERE rn = 1)
       |SELECT best.a AS video_a, best.b AS video_b,
       |  CAST(best.off AS BIGINT) AS "offset", best.n_aligned,
       |  na.nf AS nf_a, nb.nf AS nf_b
       |FROM best
       |JOIN nfv na ON na.video_id = best.a
       |JOIN nfv nb ON nb.video_id = best.b
       |WHERE best.n_aligned * 100 >= least(na.nf, nb.nf) * $minOverlapPct
       |ORDER BY video_a, video_b""".stripMargin
  }

  /** q224/q225 shared CTEs: the '42:andd' sample chains → fixed-point
    * DFT bin energies (the basis table stamped from the SAME
    * [[graft.operators.Multimodal.dftCos]]/dftSin integers the engine
    * loop reads) → Haitsma-Kalker adjacent-bin bits → 16-bit window
    * prints → the (audio, window) family map. */
  private def audioPrintCtes(n: Int): String = {
    val alpha = "'0123456789abcdef'"
    val ctVals = (1 to 17).flatMap(k => (0 until 64).map(nn =>
      s"($k,$nn,${graft.operators.Multimodal.dftCos(k, nn)}," +
        s"${graft.operators.Multimodal.dftSin(k, nn)})")).mkString(",")
    val nwB = s"(strpos($alpha, substr(sha256('42:andd:' " +
      s"|| CAST(a AS VARCHAR) || ':nw'), 1, 1)) - 1) * 16 " +
      s"+ (strpos($alpha, substr(sha256('42:andd:' " +
      s"|| CAST(a AS VARCHAR) || ':nw'), 2, 1)) - 1)"
    val shaChunks = (0 to 3)
      .map(k => "sha256('42:andd:' || CAST(a AS VARCHAR) || ':' " +
        s"|| CAST(w AS VARCHAR) || ':$k')")
      .mkString(" || ")
    def byteAt(off: String): String =
      s"(strpos($alpha, substr(hex, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr(hex, 2 * ($off) + 2, 1)) - 1)"
    s"""WITH ct(k, n, c, s) AS (VALUES $ctVals),
       |abase AS (SELECT a, 6 + ($nwB) % 3 AS nw FROM range($n) t(a)),
       |aw AS (SELECT a, w FROM abase, range(8) r(w) WHERE w < nw),
       |ahx AS (SELECT a, w, $shaChunks AS hex FROM aw),
       |asm AS (
       |  SELECT a, w, CAST(sn AS INT) AS n,
       |    (${byteAt("2 * sn")}) + 256 * (${byteAt("2 * sn + 1")})
       |      - CASE WHEN (${byteAt("2 * sn + 1")}) >= 128
       |        THEN 65536 ELSE 0 END AS x
       |  FROM ahx, range(64) s(sn)),
       |aen AS MATERIALIZED (
       |  SELECT asm.a, asm.w, ct.k,
       |    CAST(sum(asm.x * ct.c) AS BIGINT) AS ec,
       |    CAST(sum(asm.x * ct.s) AS BIGINT) AS es
       |  FROM asm JOIN ct ON ct.n = asm.n GROUP BY 1, 2, 3),
       |abits AS (
       |  SELECT e1.a, e1.w, e1.k FROM aen e1
       |  JOIN aen e2 ON e2.a = e1.a AND e2.w = e1.w AND e2.k = e1.k + 1
       |  WHERE e1.ec * e1.ec + e1.es * e1.es
       |    > e2.ec * e2.ec + e2.es * e2.es),
       |afp AS MATERIALIZED (
       |  SELECT aw.a, aw.w,
       |    CAST(COALESCE(sum(1 << (b.k - 1)), 0) AS BIGINT) AS fp
       |  FROM aw LEFT JOIN abits b ON b.a = aw.a AND b.w = aw.w
       |  GROUP BY 1, 2),
       |avf AS MATERIALIZED (
       |  SELECT a AS audio_id, w AS window_idx, a, w
       |  FROM abase, range(8) r(w) WHERE w < nw
       |  UNION ALL
       |  SELECT 1000 + a, w - 1, a, w
       |  FROM abase, range(8) r(w)
       |  WHERE a % 3 = 0 AND w >= 1 AND w < nw - 1
       |  UNION ALL
       |  SELECT 2000 + a, w, a, w
       |  FROM abase, range(8) r(w) WHERE a % 4 = 0 AND w < nw),
       |afh AS MATERIALIZED (
       |  SELECT v.audio_id, v.window_idx, p.fp
       |  FROM avf v JOIN afp p ON p.a = v.a AND p.w = v.w)""".stripMargin
  }

  private def audioFingerprintOracleSql(n: Int): String =
    s"""${audioPrintCtes(n)}
       |SELECT audio_id AS media_id, CAST(window_idx AS BIGINT)
       |  AS window_idx, fp
       |FROM afh ORDER BY media_id, window_idx""".stripMargin

  private def audioNearDupOracleSql(n: Int, maxHamming: Int,
                                    minOverlapPct: Int): String =
    s"""${audioPrintCtes(n)},
       |anw AS (SELECT audio_id, CAST(count(*) AS BIGINT) AS nw
       |        FROM afh GROUP BY 1),
       |abd AS (
       |  SELECT audio_id, window_idx, u.band_idx,
       |    (fp >> (4 * u.band_idx)) & 15 AS band
       |  FROM afh, unnest(generate_series(0, 3)) u(band_idx)),
       |acand AS (
       |  SELECT DISTINCT x.audio_id AS a, x.window_idx AS fa,
       |    y.audio_id AS b, y.window_idx AS fb
       |  FROM abd x JOIN abd y ON y.band_idx = x.band_idx
       |    AND y.band = x.band AND x.audio_id < y.audio_id),
       |amt AS (
       |  SELECT c.a, c.fa, c.b, c.fb FROM acand c
       |  JOIN afh p ON p.audio_id = c.a AND p.window_idx = c.fa
       |  JOIN afh q ON q.audio_id = c.b AND q.window_idx = c.fb
       |  WHERE bit_count(xor(p.fp, q.fp)) <= $maxHamming),
       |avotes AS (
       |  SELECT a, b, fb - fa AS off,
       |    CAST(count(*) AS BIGINT) AS n_aligned
       |  FROM amt GROUP BY 1, 2, 3),
       |abest AS (
       |  SELECT a, b, off, n_aligned FROM (
       |    SELECT *, row_number() OVER (PARTITION BY a, b
       |      ORDER BY n_aligned DESC, off) AS rn
       |    FROM avotes) WHERE rn = 1)
       |SELECT abest.a AS audio_a, abest.b AS audio_b,
       |  CAST(abest.off AS BIGINT) AS "offset", abest.n_aligned,
       |  na.nw AS nw_a, nb.nw AS nw_b
       |FROM abest
       |JOIN anw na ON na.audio_id = abest.a
       |JOIN anw nb ON nb.audio_id = abest.b
       |WHERE abest.n_aligned * 100 >= least(na.nw, nb.nw) * $minOverlapPct
       |ORDER BY audio_a, audio_b""".stripMargin

  /** q217 oracle: the q208 derived-id pixel replay joined with the
    * q110 audio-lane replay over the '42:avia:v:f:k' sha chains. */
  private lazy val avAviOracleSql: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(off: String): String =
      s"(strpos($alpha, substr(hexfull, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr(hexfull, 2 * ($off) + 2, 1)) - 1)"
    val shaChunks = (0 to 3)
      .map(k => "sha256('42:avia:' || CAST(v AS VARCHAR) || ':' || " +
        s"CAST(f AS VARCHAR) || ':$k')")
      .mkString(" || ")
    val nfExpr =
      """2 + ((strpos('0123456789abcdef', substr(sha256(
        |      '42:avi:' || CAST(v AS VARCHAR) || ':nf'), 1, 1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substr(sha256(
        |      '42:avi:' || CAST(v AS VARCHAR) || ':nf'), 2, 1)) - 1))
        |      % 5""".stripMargin
    jpegFeatCtes(
      s"""SELECT v * 100 + f AS i
         |  FROM (SELECT v, $nfExpr AS nf FROM range(60) t(v)) vids,
         |       range(6) r(f)
         |  WHERE f < nf""".stripMargin) +
      s""",
         |vidsA AS (SELECT v, $nfExpr AS nf FROM range(60) t(v)),
         |aw AS (
         |  SELECT v, f, $shaChunks AS hexfull
         |  FROM vidsA, range(6) r(f) WHERE f < nf),
         |smp AS (
         |  SELECT v, f, j, ${byteAt("2 * j")} AS b0,
         |    (${byteAt("2 * j")}) + 256 * (${byteAt("2 * j + 1")})
         |      - CASE WHEN (${byteAt("2 * j")}) + 256 * (${byteAt("2 * j + 1")})
         |             >= 32768 THEN 65536 ELSE 0 END AS s
         |  FROM aw, range(64) r(j)),
         |sgn AS (
         |  SELECT v, f, j, s, b0,
         |    CASE WHEN j > 0 AND ((s >= 0) <>
         |        (lag(s) OVER (PARTITION BY v, f ORDER BY j) >= 0))
         |      THEN 1 ELSE 0 END AS zc
         |  FROM smp),
         |afeat AS (
         |  SELECT v, f,
         |    sum(s) AS a0, sum(abs(s)) AS a1, max(s) AS a2, min(s) AS a3,
         |    sum(zc) AS a4, sum(b0 * (j + 1)) AS a5,
         |    640 AS a6, count(*) AS a7
         |  FROM sgn GROUP BY v, f)
         |SELECT CAST(afeat.v AS BIGINT) AS media_id,
         |  CAST(afeat.f AS BIGINT) AS frame_idx,
         |  CAST(afeat.f * 100 AS BIGINT) AS t_ms,
         |  CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
         |  CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3,
         |  CAST(f4 AS DOUBLE) AS f4, CAST(f5 AS DOUBLE) AS f5,
         |  CAST(f6 AS DOUBLE) AS f6, CAST(f7 AS DOUBLE) AS f7,
         |  CAST(a0 AS DOUBLE) AS a0, CAST(a1 AS DOUBLE) AS a1,
         |  CAST(a2 AS DOUBLE) AS a2, CAST(a3 AS DOUBLE) AS a3,
         |  CAST(a4 AS DOUBLE) AS a4, CAST(a5 AS DOUBLE) AS a5,
         |  CAST(a6 AS DOUBLE) AS a6, CAST(a7 AS DOUBLE) AS a7
         |FROM afeat JOIN feat ON feat.media_id = afeat.v * 100 + afeat.f
         |ORDER BY media_id, frame_idx""".stripMargin
  }

  private def jpegFeatCtes(idSrc: String): String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(src: String, off: Int): String =
      s"(strpos($alpha, substr($src, ${2 * off + 1}, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr($src, ${2 * off + 2}, 1)) - 1)"
    val tagBase = "'42:jpg:' || CAST(i AS VARCHAR)"
    val mcu = "CAST(y // 16 AS VARCHAR) || ':' || CAST(x // 16 AS VARCHAR)"
    s"""WITH dim AS (
       |  SELECT i, 9 + (${byteAt("dh", 0)}) % 14 AS w,
       |         9 + (${byteAt("dh", 1)}) % 14 AS h
       |  FROM (SELECT i, sha256($tagBase || ':dim') AS dh
       |        FROM ($idSrc))),
       |px AS (
       |  SELECT i, w, h, CAST(j % w AS INT) AS x, CAST(j // w AS INT) AS y
       |  FROM dim, range(484) r(j) WHERE j < w * h),
       |par AS (
       |  SELECT i, w, h, x, y,
       |    sha256($tagBase || ':y:' || CAST(y // 16 AS VARCHAR) || ':'
       |      || CAST(x // 16 AS VARCHAR) || ':'
       |      || CAST((y % 16) // 8 * 2 + (x % 16) // 8 AS VARCHAR)) AS yh,
       |    sha256($tagBase || ':cb:' || $mcu) AS bh,
       |    sha256($tagBase || ':cr:' || $mcu) AS rh,
       |    CASE WHEN (x % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END AS sx,
       |    CASE WHEN (y % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END AS sy,
       |    CASE WHEN ((x % 16) // 2) IN (0, 3, 4, 7) THEN 1 ELSE -1 END AS scx,
       |    CASE WHEN ((y % 16) // 2) IN (0, 3, 4, 7) THEN 1 ELSE -1 END AS scy
       |  FROM px),
       |ycc AS (
       |  SELECT i, w, h, x, y,
       |    128 + ((${byteAt("yh", 0)}) % 193 - 96)
       |        + ((${byteAt("yh", 1)}) % 21 - 10) * sx
       |        + ((${byteAt("yh", 2)}) % 21 - 10) * sy
       |        + ((${byteAt("yh", 3)}) % 21 - 10) * sx * sy AS yv,
       |    ((${byteAt("bh", 0)}) % 161 - 80)
       |        + ((${byteAt("bh", 1)}) % 17 - 8) * scx
       |        + ((${byteAt("bh", 2)}) % 17 - 8) * scy
       |        + ((${byteAt("bh", 3)}) % 17 - 8) * scx * scy AS cb,
       |    ((${byteAt("rh", 0)}) % 161 - 80)
       |        + ((${byteAt("rh", 1)}) % 17 - 8) * scx
       |        + ((${byteAt("rh", 2)}) % 17 - 8) * scy
       |        + ((${byteAt("rh", 3)}) % 17 - 8) * scx * scy AS cr
       |  FROM par),
       |chan AS (
       |  SELECT i, w, h, x, y AS yt,
       |    LEAST(255, GREATEST(0,
       |      yv + CAST(floor((91881 * cr + 32768) / 65536.0) AS INT))) AS rr,
       |    LEAST(255, GREATEST(0,
       |      yv - CAST(floor((22554 * cb + 46802 * cr + 32768) / 65536.0) AS INT))) AS g,
       |    LEAST(255, GREATEST(0,
       |      yv + CAST(floor((116130 * cb + 32768) / 65536.0) AS INT))) AS b
       |  FROM ycc),
       |feat AS (
       |  SELECT i AS media_id,
       |    sum(rr) AS f0, sum(g) AS f1, sum(b) AS f2,
       |    sum(rr * (x + 1)) AS f3, sum(g * (yt + 1)) AS f4,
       |    sum(b * (x + 1) * (yt + 1)) AS f5,
       |    max(w * 256 + h) AS f6,
       |    sum(CASE WHEN rr > g THEN 1 ELSE 0 END) AS f7
       |  FROM chan GROUP BY i)""".stripMargin
  }

  private lazy val qoiFeatCte: String = {
    val alpha = "'0123456789abcdef'"
    def byteAt(src: String, off: String): String =
      s"(strpos($alpha, substr($src, 2 * ($off) + 1, 1)) - 1) * 16 " +
        s"+ (strpos($alpha, substr($src, 2 * ($off) + 2, 1)) - 1)"
    val shaChunks = (0 to 7)
      .map(k => s"sha256('42:qoi:' || CAST(i AS VARCHAR) || ':$k')")
      .mkString(" || ")
    val maskChunks = (0 to 1)
      .map(k => s"sha256('42:qoi:' || CAST(i AS VARCHAR) || ':mask:$k')")
      .mkString(" || ")
    val dimByte0 =
      s"(strpos($alpha, substr(dh, 1, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 2, 1)) - 1)"
    val dimByte1 =
      s"(strpos($alpha, substr(dh, 3, 1)) - 1) * 16 + (strpos($alpha, substr(dh, 4, 1)) - 1)"
    s"""WITH dim AS (
       |  SELECT i, 4 + ($dimByte0) % 5 AS w, 4 + ($dimByte1) % 5 AS h,
       |         hexfull, maskfull
       |  FROM (SELECT i, sha256('42:qoi:' || CAST(i AS VARCHAR) || ':dim') AS dh,
       |               $shaChunks AS hexfull, $maskChunks AS maskfull
       |        FROM range(200) t(i))),
       |px AS (
       |  SELECT i, w, h, hexfull, maskfull, CAST(j AS INT) AS j,
       |    CAST(j % w AS INT) AS x, CAST(j // w AS INT) AS yt
       |  FROM dim, range(64) r(j) WHERE j < w * h),
       |anc AS (
       |  SELECT i, w, h, hexfull, j, x, yt,
       |    CASE WHEN j > 0 AND (${byteAt("maskfull", "j")}) % 4 = 0
       |      THEN NULL ELSE j END AS anchor
       |  FROM px),
       |srcj AS (
       |  SELECT i, w, h, hexfull, x, yt,
       |    max(anchor) OVER (PARTITION BY i ORDER BY j) AS sj
       |  FROM anc),
       |chan AS (
       |  SELECT i, w, h, x, yt,
       |    ${byteAt("hexfull", "3 * sj")} AS rr,
       |    ${byteAt("hexfull", "3 * sj + 1")} AS g,
       |    ${byteAt("hexfull", "3 * sj + 2")} AS b
       |  FROM srcj),
       |feat AS (
       |  SELECT i AS media_id,
       |    sum(rr) AS f0, sum(g) AS f1, sum(b) AS f2,
       |    sum(rr * (x + 1)) AS f3, sum(g * (yt + 1)) AS f4,
       |    sum(b * (x + 1) * (yt + 1)) AS f5,
       |    max(w * 256 + h) AS f6,
       |    sum(CASE WHEN rr > g THEN 1 ELSE 0 END) AS f7
       |  FROM chan GROUP BY i)""".stripMargin
  }

  /** q99 fixed z-order cuts: 15 cuts = 16 buckets per dimension (bits=4),
    * spanning l_quantity's 1..50 grid and l_extendedprice's range. */
  private val zQtyCuts: Seq[Double] = (1 to 15).map(_ * 3.0)
  private val zPriceCuts: Seq[Double] = (1 to 15).map(_ * 4000.0)

  /** The q99 rank + Morton interleave as DuckDB SQL (mirrors
    * Layout.zOrderKeyFromCuts: rank = cuts strictly below the value; bit
    * b of rank i lands at z position b*dims + i; disjoint bits sum). */
  /** Shared q139/q144 BM25 oracle chain: tokenize → postings (tf, dl)
    * → query terms from the three example docs → df over all postings
    * of query terms → the exact Okapi sum per (query, doc), with
    * constants written as the same IEEE-folded literals Spark computes
    * ((1.2 + 1), 0.25). Ends at CTE `sc` (query_id, doc_id, score). */
  private val bm25ScoreCtes: String =
    """base AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(trim(regexp_replace(
      |      lower(text), '\s+', ' ', 'g')), '\s+'), x -> x <> '') AS s
      |  FROM documents),
      |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(len(s)) AS avgdl
      |          FROM base),
      |tf AS (
      |  SELECT doc_id, CAST(len(s) AS BIGINT) AS dl, t.term,
      |    CAST(count(*) AS BIGINT) AS tf
      |  FROM base, unnest(s) AS t(term) GROUP BY 1, 2, 3),
      |qt AS (
      |  SELECT DISTINCT doc_id AS query_id, t.term
      |  FROM base, unnest(s) AS t(term) WHERE doc_id IN (7, 20, 33)),
      |dfc AS (
      |  SELECT term, count(*) AS df FROM tf
      |  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1),
      |sc AS (
      |  SELECT q.query_id, f.doc_id,
      |    sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
      |      * (f.tf * (1.2 + 1))
      |      / (f.tf + 1.2 * (0.25 + 0.75 * f.dl / s.avgdl))) AS score
      |  FROM qt q JOIN tf f USING (term) JOIN dfc d USING (term)
      |  CROSS JOIN stats s
      |  GROUP BY 1, 2)""".stripMargin

  /** q140 oracle: `rounds` unrolled synchronous peel rounds over the
    * sparse parts co-order graph. Peeling is monotone, so rounds after
    * the fixpoint are no-ops — the unroll count only needs to be ≥ the
    * measured convergence depth (4 at sf0.1; 8 gives headroom). */
  private def kCoreOracleSql(k: Int, rounds: Int): String = {
    // every e_i is referenced TWICE by round i+1 (degree count + edge
    // filter); DuckDB inlines plain CTEs, which would expand the base
    // scan 2^rounds times (and exhaust file handles on the parquet
    // view) — MATERIALIZED pins each round to one evaluation
    val head =
      """WITH li AS (SELECT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_linenumber <= 2),
        |pairs AS (SELECT DISTINCT a.p AS u, b.p AS v
        |          FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |e0 AS MATERIALIZED (SELECT u AS src, v AS dst FROM pairs
        |       UNION ALL SELECT v, u FROM pairs)""".stripMargin
    val iters = (1 to rounds).map { i =>
      s"""a$i AS MATERIALIZED (SELECT src AS n FROM e${i - 1} GROUP BY 1
         |        HAVING count(*) >= $k),
         |e$i AS MATERIALIZED (SELECT e.src, e.dst FROM e${i - 1} e
         |        JOIN a$i x ON x.n = e.src JOIN a$i y ON y.n = e.dst)"""
        .stripMargin
    }.mkString(",\n")
    s"""$head,
       |$iters
       |SELECT src AS nid, CAST(count(*) AS BIGINT) AS deg
       |FROM e$rounds GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q141 oracle: the xy2d Hilbert recurrence unrolled level by level.
    * Each level reads the previous level's (x, y, d) twice, so every
    * CTE is MATERIALIZED (plain CTEs would inline the rank scan
    * 2^bits times — the q140 lesson). */
  private def hilbertOracleSql(bits: Int): String = {
    def rank(c: String, cuts: Seq[Double]): String =
      cuts.map(cut => s"(CASE WHEN $c > $cut THEN 1 ELSE 0 END)")
        .mkString("(", " + ", ")")
    val n = 1L << bits
    val levels = (1 to bits).map { i =>
      val s = 1L << (bits - i)
      val rx = s"(CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)"
      s"""h$i AS MATERIALIZED (
         |  SELECT l_orderkey, l_linenumber, l_quantity,
         |    CASE WHEN $ry = 0 THEN
         |      (CASE WHEN $rx = 1 THEN ${n - 1} - y ELSE y END)
         |    ELSE x END AS x,
         |    CASE WHEN $ry = 0 THEN
         |      (CASE WHEN $rx = 1 THEN ${n - 1} - x ELSE x END)
         |    ELSE y END AS y,
         |    d + ${s * s} * xor(3 * $rx, $ry) AS d
         |  FROM h${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH h0 AS MATERIALIZED (
       |  SELECT l_orderkey, l_linenumber, l_quantity,
       |    CAST(${rank("l_quantity", zQtyCuts)} AS BIGINT) AS x,
       |    CAST(${rank("l_extendedprice", zPriceCuts)} AS BIGINT) AS y,
       |    CAST(0 AS BIGINT) AS d
       |  FROM lineitem),
       |$levels
       |SELECT l_orderkey, l_linenumber, l_quantity,
       |  CAST(d AS BIGINT) AS hkey
       |FROM h$bits ORDER BY l_orderkey, l_linenumber""".stripMargin
  }

  /** q145 oracle: the EXACT neighborhood function — BFS ball membership
    * unrolled per round (MATERIALIZED; the t = 3 table is ~20M rows at
    * sf0.1 — the cost the HyperBall sketch exists to avoid), then the
    * q116 register formulas per (node, bucket), the harmonic S with the
    * empty-bucket completion, and per-node estimates floored to
    * micro-units before the integer sum. */
  private def hyperBallOracleSql(rounds: Int): String = {
    val sha =
      """CAST(list_sum([(strpos('0123456789abcdef', substr(
        |      sha256(CAST(v AS VARCHAR)), i, 1)) - 1)
        |      * pow(16.0, 12 - i) for i in generate_series(1, 12)])
        |    AS BIGINT)""".stripMargin
    val balls = (1 to rounds).map { t =>
      s"""b$t AS MATERIALIZED (SELECT DISTINCT v, u FROM (
         |  SELECT e.src AS v, b.u FROM e JOIN b${t - 1} b ON b.v = e.dst
         |  UNION ALL SELECT v, u FROM b${t - 1}))""".stripMargin
    }.mkString(",\n")
    val stats = (0 to rounds).map { t =>
      s"""SELECT CAST($t AS BIGINT) AS t,
         |  CAST(sum(regsum) AS BIGINT) AS reg_sum,
         |  CAST(sum(CAST(floor((((0.709e0 * 4096.0e0) * 8796093022208.0e0)
         |      / CAST(s AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT))
         |    AS BIGINT) AS nf_micro
         |FROM (
         |  SELECT v, CAST(sum(reg) AS BIGINT) AS regsum,
         |    CAST(sum(pow(2.0, 43 - reg)) AS BIGINT)
         |      + CAST(64 - count(*) AS BIGINT)
         |      * CAST(8796093022208 AS BIGINT) AS s
         |  FROM (SELECT b.v, r.bucket, max(r.rank) AS reg
         |        FROM b$t b JOIN rk r ON r.u = b.u GROUP BY 1, 2)
         |  GROUP BY v)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p
       |            FROM lineitem WHERE l_linenumber <= 2),
       |pairs AS (SELECT DISTINCT a.p AS u, b.p AS v
       |          FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
       |e AS MATERIALIZED (SELECT u AS src, v AS dst FROM pairs
       |     UNION ALL SELECT v, u FROM pairs),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS v FROM e),
       |rk AS MATERIALIZED (
       |  SELECT v AS u, hv % 64 AS bucket,
       |    CASE WHEN hv // 64 = 0 THEN 43
       |         ELSE 43 - length(bin(hv // 64)) END AS rank
       |  FROM (SELECT v, $sha AS hv FROM nodes)),
       |b0 AS MATERIALIZED (SELECT v, v AS u FROM nodes),
       |$balls
       |$stats
       |ORDER BY t""".stripMargin
  }

  /** q209 oracle: the q145 per-node machinery, kept per node — exact
    * BFS balls per round, the register formulas, per-node estimates
    * floored to micro-units, then the lcm-scaled inverse-distance
    * accumulation as exact longs. */
  private def harmonicCentralityOracleSql(rounds: Int): String = {
    val lcm = Seq(1L, 1L, 2L, 6L, 12L, 60L, 60L)(rounds)
    val sha =
      """CAST(list_sum([(strpos('0123456789abcdef', substr(
        |      sha256(CAST(v AS VARCHAR)), i, 1)) - 1)
        |      * pow(16.0, 12 - i) for i in generate_series(1, 12)])
        |    AS BIGINT)""".stripMargin
    val balls = (1 to rounds).map { t =>
      s"""b$t AS MATERIALIZED (SELECT DISTINCT v, u FROM (
         |  SELECT e.src AS v, b.u FROM e JOIN b${t - 1} b ON b.v = e.dst
         |  UNION ALL SELECT v, u FROM b${t - 1}))""".stripMargin
    }.mkString(",\n")
    val ests = (0 to rounds).map { t =>
      s"""m$t AS (
         |  SELECT v, CAST(floor((((0.709e0 * 4096.0e0) * 8796093022208.0e0)
         |      / CAST(s AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS m
         |  FROM (
         |    SELECT v,
         |      CAST(sum(pow(2.0, 43 - reg)) AS BIGINT)
         |        + CAST(64 - count(*) AS BIGINT)
         |        * CAST(8796093022208 AS BIGINT) AS s
         |    FROM (SELECT b.v, r.bucket, max(r.rank) AS reg
         |          FROM b$t b JOIN rk r ON r.u = b.u GROUP BY 1, 2)
         |    GROUP BY v))""".stripMargin
    }.mkString(",\n")
    val hc = (1 to rounds)
      .map(t => s"(m$t.m - m${t - 1}.m) * ${lcm / t}")
      .mkString(" + ")
    val joins = (1 to rounds)
      .map(t => s"JOIN m$t ON m$t.v = m0.v").mkString(" ")
    s"""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p
       |            FROM lineitem WHERE l_linenumber <= 2),
       |pairs AS (SELECT DISTINCT a.p AS u, b.p AS v
       |          FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
       |e AS MATERIALIZED (SELECT u AS src, v AS dst FROM pairs
       |     UNION ALL SELECT v, u FROM pairs),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS v FROM e),
       |rk AS MATERIALIZED (
       |  SELECT v AS u, hv % 64 AS bucket,
       |    CASE WHEN hv // 64 = 0 THEN 43
       |         ELSE 43 - length(bin(hv // 64)) END AS rank
       |  FROM (SELECT v, $sha AS hv FROM nodes)),
       |b0 AS MATERIALIZED (SELECT v, v AS u FROM nodes),
       |$balls,
       |$ests
       |SELECT m0.v, CAST($hc AS BIGINT) AS hc
       |FROM m0 $joins ORDER BY m0.v""".stripMargin
  }

  private def zOrderOracleExpr: String = {
    def rank(c: String, cuts: Seq[Double]): String =
      cuts.map(cut => s"(CASE WHEN $c > $cut THEN 1 ELSE 0 END)")
        .mkString("(", " + ", ")")
    val rq = rank("l_quantity", zQtyCuts)
    val rp = rank("l_extendedprice", zPriceCuts)
    val terms = for (b <- 0 until 4; (r, i) <- Seq(rq -> 0, rp -> 1))
      yield s"((($r >> $b) & 1) << ${b * 2 + i})"
    s"CAST(${terms.mkString(" + ")} AS BIGINT)"
  }

  /** Stopword profiles (graft.operators.TextAnalysis.stopwordProfiles) as
    * DuckDB list literals, for the q29 language-ID / quality oracle. */
  private lazy val profileLists: Map[String, String] =
    graft.operators.TextAnalysis.stopwordProfiles.map { case (l, ws) =>
      l -> ws.map(w => s"'$w'").mkString("[", ", ", "]")
    }
  private lazy val allStopsList: String =
    graft.operators.TextAnalysis.stopwordProfiles.values.flatten.toSeq.distinct
      .map(w => s"'$w'").mkString("[", ", ", "]")

  private def rawOracleSql: Map[String, String] = Map(
    "q01_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | r2(sum(l_quantity)) AS sum_qty,
        | r2(sum(l_extendedprice)) AS sum_base_price,
        | r2(sum(l_extendedprice * (1 - l_discount))) AS sum_disc_price,
        | r4(avg(l_quantity)) AS avg_qty,
        | r4(avg(l_discount)) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_join_agg" ->
      """SELECT c_mktsegment, r2(sum(o_totalprice)) AS revenue,
        | count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q04_join_broadcast" ->
      """SELECT p_brand, r2(sum(l_extendedprice)) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q05_multi_join" ->
      """SELECT r_name, n_name,
        | r2(sum(l_extendedprice * (1 - l_discount))) AS revenue,
        | count(*) AS n_items
        |FROM region
        | JOIN nation ON r_regionkey = n_regionkey
        | JOIN customer ON n_nationkey = c_nationkey
        | JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q06_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin,

    "q07_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q08_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q09_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  r2(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q10_rollup" ->
      """SELECT n_name, c_mktsegment, count(*) AS n_orders,
        | r2(sum(o_totalprice)) AS revenue
        |FROM orders
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)
        |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,

    "q11_distinct_agg" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust,
        | count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q12_set_ops" ->
      """SELECT 'intersect' AS op, custkey FROM (
        |  SELECT DISTINCT o_custkey AS custkey FROM orders
        |  INTERSECT
        |  SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
        |UNION ALL
        |SELECT 'except' AS op, custkey FROM (
        |  SELECT DISTINCT o_custkey AS custkey FROM orders
        |  EXCEPT
        |  SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
        |ORDER BY op, custkey""".stripMargin,

    "q13_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q14_explode_tokens" ->
      """SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(string_split_regex(
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')) AS token
        |  FROM documents)
        |WHERE token <> ''
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 10""".stripMargin,

    "q15_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS name_upper,
        | length(c_name) AS name_len,
        | c_mktsegment || '#' || c_name AS tagged,
        | substring(c_name, 1, 8) AS name_prefix
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q16_date_funcs" ->
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        | count(*) AS n_orders, r2(sum(o_totalprice)) AS revenue
        |FROM orders GROUP BY yr, mo ORDER BY yr, mo""".stripMargin,

    "q17_json_extract" ->
      """SELECT event_type, r4(avg(k)) AS avg_k, max(k) AS max_k,
        | count(*) AS n
        |FROM (SELECT event_type,
        |   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q18_surrogate_key" ->
      """SELECT doc_id, to_base64(unhex(sha256(lang || source || CAST(doc_id AS VARCHAR)))) AS hash_id
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q19_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents
        |GROUP BY trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
        |ORDER BY keep_id""".stripMargin,

    "q20_case_math" ->
      """SELECT l_orderkey, l_linenumber,
        | CASE WHEN l_discount > 0.05 THEN 'high'
        |      WHEN l_discount > 0.02 THEN 'mid' ELSE 'low' END AS disc_band,
        | r2(abs(l_extendedprice * l_tax)) AS tax_amt,
        | r4(sqrt(l_quantity)) AS qty_sqrt,
        | l_orderkey % 7 AS bucket
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q21_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | r2(sum(l_quantity)) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q22_events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        | count(*) AS n, r2(sum(value)) AS sum_value
        |FROM events GROUP BY hour, event_type ORDER BY hour, event_type""".stripMargin,

    "q23_events_dedup" ->
      """SELECT user_id, event_type, min(event_id) AS event_id
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,

    "q24_token_stats" ->
      """SELECT lang,
        | r4(avg(n_tok)) AS avg_tokens,
        | max(n_tok) AS max_tokens,
        | count(*) AS n_docs
        |FROM (SELECT lang, len(list_filter(string_split_regex(trim(text), '\s+'),
        |   x -> x <> '')) AS n_tok FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q25_scalar_subquery" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "q26_cosine_topk" ->
      """SELECT query_id, neighbor_id, r6(cos) AS cos, rank FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                           CAST(c.embedding AS DOUBLE[])) AS cos,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                 CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
        |  FROM embeddings q, embeddings c
        |  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // Explicit window replay instead of DuckDB ASOF: ASOF's pick among
    // right rows tied on (key, ts) is unspecified, while the operator
    // pins ties to the smallest payload struct — (ts DESC, event_id ASC)
    // reproduces that rule on any data, collision-bearing or not.
    "q32_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
        |p AS (
        |  SELECT event_id AS pid, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT e.event_id, e.user_id, p.pid,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY p.ts DESC, p.pid ASC) AS rn
        |  FROM e LEFT JOIN p ON e.user_id = p.user_id AND p.ts <= e.ts)
        |SELECT event_id, user_id, pid AS purchase_id
        |FROM m WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q33_topk_agg" ->
      """SELECT c_mktsegment, rank, o_totalprice FROM (
        |  SELECT c_mktsegment, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC) AS rank
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rank <= 3 ORDER BY c_mktsegment, rank""".stripMargin,

    "q34_union_all" ->
      """SELECT c_custkey AS id, 'customer' AS src FROM customer
        |UNION ALL
        |SELECT s_suppkey AS id, 'supplier' AS src FROM supplier
        |ORDER BY src, id""".stripMargin,

    // The HLL tolerance contract: the oracle asserts the estimate lands
    // within 10% of exact by expecting TRUE per group — if Spark's
    // approx_count_distinct drifts past tolerance the boolean flips and
    // the value hash goes red. (The estimate itself is engine-specific;
    // the replayable estimate gate is q102's KMV sketch.)
    "q35_approx_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  TRUE AS hll_within_tol
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q36_pivot" ->
      """SELECT l_linestatus,
        | count(*) FILTER (WHERE l_returnflag = 'A') AS "A",
        | count(*) FILTER (WHERE l_returnflag = 'N') AS "N",
        | count(*) FILTER (WHERE l_returnflag = 'R') AS "R"
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q38_sql_text" ->
      """SELECT o_orderpriority, count(*) AS n, max(o_totalprice) AS max_price
        |FROM orders WHERE o_totalprice > 50000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // The full media pipeline — sha256 byte synthesis, planted near-dup
    // bit flip, rolling-hash decode — replayed as a recursive CTE; the
    // integer lane accumulators ARE the feature floats (exactly
    // representable), so the double projection hashes identically.
    "q37_media_features" ->
      (mediaFeatCte +
        """
          |SELECT media_id, kind,
          |  CAST(s0 AS DOUBLE) AS f0, CAST(s1 AS DOUBLE) AS f1,
          |  CAST(s2 AS DOUBLE) AS f2, CAST(s3 AS DOUBLE) AS f3,
          |  CAST(s4 AS DOUBLE) AS f4, CAST(s5 AS DOUBLE) AS f5,
          |  CAST(s6 AS DOUBLE) AS f6, CAST(s7 AS DOUBLE) AS f7
          |FROM feat ORDER BY media_id""".stripMargin),

    // Brute-force cosine over the replayed features. Products and sums
    // are integer-exact in doubles (< 2^53); sqrt / multiply / divide in
    // the same order as the engine's CosineSimilarity — bit-identical
    // cos, so the threshold admits the same pairs.
    "q56_media_neardup" ->
      (mediaFeatCte +
        """
          |SELECT a.media_id AS id_a, b.media_id AS id_b,
          |  r6(CAST(a.s0*b.s0 + a.s1*b.s1 + a.s2*b.s2 + a.s3*b.s3
          |        + a.s4*b.s4 + a.s5*b.s5 + a.s6*b.s6 + a.s7*b.s7 AS DOUBLE)
          |    / (sqrt(CAST(a.s0*a.s0 + a.s1*a.s1 + a.s2*a.s2 + a.s3*a.s3
          |        + a.s4*a.s4 + a.s5*a.s5 + a.s6*a.s6 + a.s7*a.s7 AS DOUBLE))
          |     * sqrt(CAST(b.s0*b.s0 + b.s1*b.s1 + b.s2*b.s2 + b.s3*b.s3
          |        + b.s4*b.s4 + b.s5*b.s5 + b.s6*b.s6 + b.s7*b.s7 AS DOUBLE))))
          |    AS cos
          |FROM feat a JOIN feat b ON a.media_id < b.media_id
          |WHERE CAST(a.s0*b.s0 + a.s1*b.s1 + a.s2*b.s2 + a.s3*b.s3
          |        + a.s4*b.s4 + a.s5*b.s5 + a.s6*b.s6 + a.s7*b.s7 AS DOUBLE)
          |    / (sqrt(CAST(a.s0*a.s0 + a.s1*a.s1 + a.s2*a.s2 + a.s3*a.s3
          |        + a.s4*a.s4 + a.s5*a.s5 + a.s6*a.s6 + a.s7*a.s7 AS DOUBLE))
          |     * sqrt(CAST(b.s0*b.s0 + b.s1*b.s1 + b.s2*b.s2 + b.s3*b.s3
          |        + b.s4*b.s4 + b.s5*b.s5 + b.s6*b.s6 + b.s7*b.s7 AS DOUBLE)))
          |    >= 0.99
          |ORDER BY id_a, id_b""".stripMargin),

    "q109_bmp_decode" ->
      (bmpFeatCte +
        """
          |SELECT media_id,
          |  CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
          |  CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3,
          |  CAST(f4 AS DOUBLE) AS f4, CAST(f5 AS DOUBLE) AS f5,
          |  CAST(f6 AS DOUBLE) AS f6, CAST(f7 AS DOUBLE) AS f7
          |FROM feat ORDER BY media_id""".stripMargin),

    "q191_sobel_edges" ->
      (sobelBmpFeatCte +
        """
          |SELECT media_id,
          |  CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
          |  CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3,
          |  CAST(f4 AS DOUBLE) AS f4, CAST(f5 AS DOUBLE) AS f5,
          |  CAST(f6 AS DOUBLE) AS f6, CAST(f7 AS DOUBLE) AS f7
          |FROM feat ORDER BY media_id""".stripMargin),

    "q173_resize" ->
      (resizeBmpFeatCte +
        """
          |SELECT media_id,
          |  CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
          |  CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3,
          |  CAST(f4 AS DOUBLE) AS f4, CAST(f5 AS DOUBLE) AS f5,
          |  CAST(f6 AS DOUBLE) AS f6, CAST(f7 AS DOUBLE) AS f7
          |FROM feat ORDER BY media_id""".stripMargin),

    "q187_orientations" -> orientationsOracleSql,

    "q185_center_crop" ->
      (cropBmpFeatCte +
        """
          |SELECT media_id,
          |  CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
          |  CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3,
          |  CAST(f4 AS DOUBLE) AS f4, CAST(f5 AS DOUBLE) AS f5,
          |  CAST(f6 AS DOUBLE) AS f6, CAST(f7 AS DOUBLE) AS f7
          |FROM feat ORDER BY media_id""".stripMargin),

    "q186_grayscale" ->
      (grayBmpFeatCte +
        """
          |SELECT media_id,
          |  CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
          |  CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3,
          |  CAST(f4 AS DOUBLE) AS f4, CAST(f5 AS DOUBLE) AS f5,
          |  CAST(f6 AS DOUBLE) AS f6, CAST(f7 AS DOUBLE) AS f7
          |FROM feat ORDER BY media_id""".stripMargin),

    "q181_resize_bilinear" ->
      (bilinearBmpFeatCte +
        """
          |SELECT media_id,
          |  CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
          |  CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3,
          |  CAST(f4 AS DOUBLE) AS f4, CAST(f5 AS DOUBLE) AS f5,
          |  CAST(f6 AS DOUBLE) AS f6, CAST(f7 AS DOUBLE) AS f7
          |FROM feat ORDER BY media_id""".stripMargin),

    "q183_gain_normalize" ->
      (gainWavCte +
        """
          |SELECT media_id,
          |  CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
          |  CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3,
          |  CAST(f4 AS DOUBLE) AS f4, CAST(f5 AS DOUBLE) AS f5,
          |  CAST(f6 AS DOUBLE) AS f6, CAST(f7 AS DOUBLE) AS f7
          |FROM feat ORDER BY media_id""".stripMargin),

    "q182_silence_trim" ->
      (trimWavCte +
        """
          |SELECT media_id,
          |  CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
          |  CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3,
          |  CAST(f4 AS DOUBLE) AS f4, CAST(f5 AS DOUBLE) AS f5,
          |  CAST(f6 AS DOUBLE) AS f6, CAST(f7 AS DOUBLE) AS f7
          |FROM feat ORDER BY media_id""".stripMargin),

    "q175_audio_resample" ->
      (resampleWavCte +
        """
          |SELECT media_id,
          |  CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
          |  CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3,
          |  CAST(f4 AS DOUBLE) AS f4, CAST(f5 AS DOUBLE) AS f5,
          |  CAST(f6 AS DOUBLE) AS f6, CAST(f7 AS DOUBLE) AS f7
          |FROM feat ORDER BY media_id""".stripMargin),

    "q188_keyframes" -> keyframesOracleSql,

    "q180_frame_deltas" ->
      (agifChanCte + """,
        |delta AS (
        |  SELECT a.i, b.k,
        |    CAST(sum(abs(b.rr - a.rr)) AS BIGINT) AS d_r,
        |    CAST(sum(abs(b.g - a.g)) AS BIGINT) AS d_g,
        |    CAST(sum(abs(b.b - a.b)) AS BIGINT) AS d_b,
        |    CAST(sum(CASE WHEN abs(b.rr - a.rr) + abs(b.g - a.g)
        |        + abs(b.b - a.b) > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_changed,
        |    CAST(max(abs(b.rr - a.rr) + abs(b.g - a.g) + abs(b.b - a.b))
        |      AS INT) AS max_delta
        |  FROM chan a JOIN chan b ON b.i = a.i AND b.k = a.k + 1
        |    AND b.x = a.x AND b.yt = a.yt
        |  GROUP BY 1, 2)
        |SELECT d.i AS media_id, CAST(d.k AS INT) AS frame_idx,
        |  CAST(f.delay_ms AS INT) AS delay_ms,
        |  d_r, d_g, d_b, n_changed, max_delta
        |FROM delta d JOIN fr f ON f.i = d.i AND f.k = d.k
        |ORDER BY media_id, frame_idx""".stripMargin),

    "q174_frame_sample" ->
      (frameSampleCte +
        """
          |SELECT act.i AS media_id, act.s AS sample_idx, act.t AS t_ms,
          |  CAST(act.k AS INT) AS frame_idx,
          |  CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
          |  CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3,
          |  CAST(f4 AS DOUBLE) AS f4, CAST(f5 AS DOUBLE) AS f5,
          |  CAST(f6 AS DOUBLE) AS f6, CAST(f7 AS DOUBLE) AS f7
          |FROM act JOIN ffeat ON ffeat.i = act.i AND ffeat.k = act.k
          |ORDER BY media_id, sample_idx""".stripMargin),

    "q192_wht_fingerprint" ->
      (whtWavCte +
        """
          |SELECT media_id,
          |  CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
          |  CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3,
          |  CAST(f4 AS DOUBLE) AS f4, CAST(f5 AS DOUBLE) AS f5,
          |  CAST(f6 AS DOUBLE) AS f6, CAST(f7 AS DOUBLE) AS f7
          |FROM feat ORDER BY media_id""".stripMargin),

    "q110_wav_decode" ->
      (wavFeatCte +
        """
          |SELECT media_id,
          |  CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
          |  CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3,
          |  CAST(f4 AS DOUBLE) AS f4, CAST(f5 AS DOUBLE) AS f5,
          |  CAST(f6 AS DOUBLE) AS f6, CAST(f7 AS DOUBLE) AS f7
          |FROM feat ORDER BY media_id""".stripMargin),

    "q111_png_decode" ->
      (pngFeatCte +
        """
          |SELECT media_id,
          |  CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
          |  CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3,
          |  CAST(f4 AS DOUBLE) AS f4, CAST(f5 AS DOUBLE) AS f5,
          |  CAST(f6 AS DOUBLE) AS f6, CAST(f7 AS DOUBLE) AS f7
          |FROM feat ORDER BY media_id""".stripMargin),

    "q171_jpeg_decode" ->
      (jpegFeatCte +
        """
          |SELECT media_id,
          |  CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
          |  CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3,
          |  CAST(f4 AS DOUBLE) AS f4, CAST(f5 AS DOUBLE) AS f5,
          |  CAST(f6 AS DOUBLE) AS f6, CAST(f7 AS DOUBLE) AS f7
          |FROM feat ORDER BY media_id""".stripMargin),

    // Entity-decode replay: the oracle states the expected DECODED text
    // directly (chr() for non-ASCII), per planted class; documents text
    // itself carries no '&' (verified corpus property), so decode is
    // identity on it.
    "q162_entity_decode" ->
      """SELECT doc_id,
        |  text || CASE
        |    WHEN doc_id % 6 = 1 THEN ' fish & chips <b>'
        |    WHEN doc_id % 6 = 2 THEN ' caf' || chr(233) || ' ' || chr(233)
        |         || ' ' || chr(233)
        |    WHEN doc_id % 6 = 3 THEN ' snow ' || chr(9731) || ' ' || chr(9731)
        |         || ' ' || chr(128512)
        |    WHEN doc_id % 6 = 4 THEN ' AT&T &notreal; &#xD800; &gt'
        |    WHEN doc_id % 6 = 5 THEN ' q' || chr(8230) || ' ' || chr(171)
        |         || 'x' || chr(187)
        |    ELSE '' END AS decoded,
        |  CAST(CASE WHEN doc_id % 6 = 1 THEN 3
        |            WHEN doc_id % 6 = 2 THEN 3
        |            WHEN doc_id % 6 = 3 THEN 3
        |            WHEN doc_id % 6 = 5 THEN 3
        |            ELSE 0 END AS INT) AS n_decoded
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Classifier replay: q134's gram/bucket CTEs, weights rebuilt from
    // the same LCG over the bucket id, integer score and verdict.
    // DuckDB widens sum(BIGINT) to HUGEINT — re-cast to keep the dtype
    // contract.
    "q163_quality_classifier" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(regexp_replace(
        |      lower(text), '\s+', ' ', 'g')), '\s+'), x -> x <> '') AS tk
        |  FROM documents),
        |uni AS (SELECT doc_id, unnest(tk) AS gram FROM toks),
        |bi AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(tk) - 1),
        |      i -> tk[i] || ' ' || tk[i + 1])) AS gram
        |  FROM toks WHERE len(tk) >= 2),
        |grams AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
        |hb AS (
        |  SELECT doc_id,
        |    CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(sha256(gram), i, 1)) - 1) * pow(16.0, 12 - i)
        |      for i in generate_series(1, 12)]) AS BIGINT) % 512 AS b
        |  FROM grams),
        |pw AS (
        |  SELECT doc_id, count(*) AS n_grams,
        |    CAST(sum((b * 1103515245 + 12345) % 2001 - 1000) AS BIGINT)
        |      AS score_sum
        |  FROM hb GROUP BY 1),
        |sc AS (
        |  SELECT t.doc_id,
        |    COALESCE(pw.n_grams, 0) AS n_grams,
        |    COALESCE(pw.score_sum, 0) AS score_sum,
        |    greatest(COALESCE(pw.n_grams, 0), 1) AS n1
        |  FROM toks t LEFT JOIN pw ON pw.doc_id = t.doc_id)
        |SELECT doc_id, n_grams, score_sum,
        |  50 * n1 + score_sum AS score_num,
        |  (50 * n1 + score_sum) * 2 >= 25 * n1 AS keep
        |FROM sc ORDER BY doc_id""".stripMargin,

    // Interleave replay: ticket hash, mod-4 buckets, per-(source,bucket)
    // ranks, cumulative bucket offsets, and the lcm-scaled virtual-time
    // key. Window sum widens to HUGEINT — re-cast.
    "q164_interleave_key" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(sha256(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
        |      * pow(16.0, 12 - i)
        |      for i in generate_series(1, 12)]) AS BIGINT) AS tk
        |  FROM documents),
        |b AS (SELECT doc_id, source, tk, CAST(tk % 4 AS INT) AS sb FROM t),
        |r AS (
        |  SELECT doc_id, source, sb,
        |    row_number() OVER (PARTITION BY source, sb
        |      ORDER BY tk, doc_id) - 1 AS rn
        |  FROM b),
        |c AS (SELECT source, sb, count(*) AS cnt FROM b GROUP BY 1, 2),
        |o AS (
        |  SELECT source, sb,
        |    CAST(COALESCE(sum(cnt) OVER (PARTITION BY source ORDER BY sb
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS off
        |  FROM c),
        |j AS (
        |  SELECT r.doc_id, r.source, CAST(o.off + r.rn AS BIGINT) AS src_idx,
        |    CASE CAST(substr(r.source, 4) AS INT) % 4
        |      WHEN 0 THEN 12 WHEN 1 THEN 6 WHEN 2 THEN 4 ELSE 3 END AS stride
        |  FROM r JOIN o ON o.source = r.source AND o.sb = r.sb)
        |SELECT doc_id, source, src_idx,
        |  CAST((src_idx * 2 + 1) * stride AS BIGINT) AS pos_key
        |FROM j ORDER BY pos_key, source""".stripMargin,

    // Rendezvous replay: the 6-row virtual-node table cross-joined,
    // every score rebuilt from the same sha prefix, argmax by
    // (score DESC, shard DESC) matching the struct-max tie order.
    "q165_rendezvous_shard" ->
      """WITH v(s, vn) AS (VALUES
        |  ('shard_a', 0), ('shard_b', 0), ('shard_b', 1),
        |  ('shard_c', 0), ('shard_c', 1), ('shard_c', 2)),
        |sc AS (
        |  SELECT d.doc_id, v.s,
        |    CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(sha256(CAST(d.doc_id AS VARCHAR) || ':' || v.s
        |        || ':' || CAST(v.vn AS VARCHAR) || ':rv9'), i, 1)) - 1)
        |      * pow(16.0, 12 - i)
        |      for i in generate_series(1, 12)]) AS BIGINT) AS h
        |  FROM documents d CROSS JOIN v),
        |w AS (
        |  SELECT doc_id, s, h, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY h DESC, s DESC) AS rn
        |  FROM sc)
        |SELECT doc_id, s AS shard, h AS shard_score
        |FROM w WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // Script-mix replay: same tails (chr() literals), the same Unicode
    // script property counted by RE2's independently-implemented tables.
    "q166_script_mix" ->
      """WITH t AS (
        |  SELECT doc_id, text || CASE
        |    WHEN doc_id % 6 = 1 THEN ' ' || chr(1087) || chr(1088)
        |      || chr(1080) || chr(1074) || chr(1077) || chr(1090)
        |    WHEN doc_id % 6 = 2 THEN ' ' || chr(945) || chr(946) || chr(947)
        |    WHEN doc_id % 6 = 3 THEN ' ' || chr(20013) || chr(25991)
        |    WHEN doc_id % 6 = 4 THEN ' ' || chr(1605) || chr(1585)
        |      || chr(1581) || chr(1576) || chr(1575)
        |    WHEN doc_id % 6 = 5 THEN ' p' || chr(1072) || 'ypal'
        |    ELSE '' END AS tx
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(tx, '\p{Latin}')) AS BIGINT) AS n_latin,
        |    CAST(len(regexp_extract_all(tx, '\p{Cyrillic}')) AS BIGINT) AS n_cyrillic,
        |    CAST(len(regexp_extract_all(tx, '\p{Greek}')) AS BIGINT) AS n_greek,
        |    CAST(len(regexp_extract_all(tx, '\p{Han}')) AS BIGINT) AS n_han,
        |    CAST(len(regexp_extract_all(tx, '\p{Arabic}')) AS BIGINT) AS n_arabic
        |  FROM t)
        |SELECT doc_id, n_latin, n_cyrillic, n_greek, n_han, n_arabic,
        |  CAST(CASE WHEN n_latin > 0 THEN 1 ELSE 0 END
        |     + CASE WHEN n_cyrillic > 0 THEN 1 ELSE 0 END
        |     + CASE WHEN n_greek > 0 THEN 1 ELSE 0 END
        |     + CASE WHEN n_han > 0 THEN 1 ELSE 0 END
        |     + CASE WHEN n_arabic > 0 THEN 1 ELSE 0 END AS BIGINT) AS n_scripts,
        |  (CASE WHEN n_latin > 0 THEN 1 ELSE 0 END
        |     + CASE WHEN n_cyrillic > 0 THEN 1 ELSE 0 END
        |     + CASE WHEN n_greek > 0 THEN 1 ELSE 0 END
        |     + CASE WHEN n_han > 0 THEN 1 ELSE 0 END
        |     + CASE WHEN n_arabic > 0 THEN 1 ELSE 0 END) >= 2 AS mixed
        |FROM c ORDER BY doc_id""".stripMargin,

    // Stupid Backoff replay: src0 bigram/unigram counts, T/V scalars,
    // the c2/c1 vs α·add-one CASE, occurrence-weighted ln-sum under r4.
    "q167_stupid_backoff" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(trim(regexp_replace(
        |      lower(text), '\s+', ' ', 'g')), '\s+'), x -> x <> '') AS tk
        |  FROM documents),
        |uc AS (
        |  SELECT token, count(*) AS c1 FROM (
        |    SELECT unnest(tk) AS token FROM toks WHERE source = 'src0')
        |  GROUP BY 1),
        |sc AS (SELECT (SELECT CAST(sum(c1) AS DOUBLE) FROM uc) AS t,
        |              (SELECT CAST(count(*) AS DOUBLE) FROM uc) AS v),
        |rp AS (
        |  SELECT unnest(list_transform(generate_series(1, len(tk) - 1),
        |    i -> struct_pack(w1 := tk[i], w2 := tk[i + 1]))) AS p
        |  FROM toks WHERE source = 'src0' AND len(tk) >= 2),
        |bc AS (SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS c2
        |       FROM rp GROUP BY 1, 2),
        |dp AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 1),
        |    i -> struct_pack(w1 := tk[i], w2 := tk[i + 1]))) AS p
        |  FROM toks WHERE len(tk) >= 2),
        |pg AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2, count(*) AS pf
        |       FROM dp GROUP BY 1, 2, 3),
        |j AS (
        |  SELECT pg.doc_id, pg.pf,
        |    CASE WHEN COALESCE(bc.c2, 0) > 0
        |      THEN ln(CAST(bc.c2 AS DOUBLE) / u1.c1)
        |      ELSE ln(0.4 * (COALESCE(u2.c1, 0) + 1.0) / (sc.t + sc.v + 1.0))
        |    END AS lp
        |  FROM pg
        |  LEFT JOIN bc ON bc.w1 = pg.w1 AND bc.w2 = pg.w2
        |  LEFT JOIN uc u1 ON u1.token = pg.w1
        |  LEFT JOIN uc u2 ON u2.token = pg.w2, sc)
        |SELECT doc_id, CAST(sum(pf) AS BIGINT) AS n_pairs,
        |  r4(sum(pf * lp)) AS logsb
        |FROM j GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // Coverage-curve replay: same counts, same (count DESC, token)
    // ranks, same integer cross-multiplied coverage test.
    "q168_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split_regex(trim(regexp_replace(
        |    lower(text), '\s+', ' ', 'g')), '\s+'), x -> x <> '')) AS token
        |  FROM documents),
        |c AS (SELECT token, count(*) AS c FROM toks GROUP BY 1),
        |r AS (
        |  SELECT token, c,
        |    CAST(row_number() OVER (ORDER BY c DESC, token) AS BIGINT) AS rank,
        |    CAST(sum(c) OVER (ORDER BY c DESC, token
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM c),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS total_tok,
        |             CAST(count(*) AS BIGINT) AS total_vocab FROM c),
        |p(pct) AS (VALUES (CAST(50 AS BIGINT)), (CAST(90 AS BIGINT)),
        |                  (CAST(95 AS BIGINT)), (CAST(99 AS BIGINT)))
        |SELECT p.pct, min(r.rank) AS vocab_rank, min(r.cum) AS covered_tok,
        |  CAST(first(t.total_tok) AS BIGINT) AS total_tok,
        |  CAST(first(t.total_vocab) AS BIGINT) AS total_vocab
        |FROM r, t, p
        |WHERE r.cum * 100 >= p.pct * t.total_tok
        |GROUP BY p.pct ORDER BY p.pct""".stripMargin,

    // KL replay: the naive full-support sum over sources × global
    // vocabulary (a deliberately DIFFERENT summation decomposition from
    // the engine's absent-word algebra — both must agree under r4).
    "q169_kl_source_drift" ->
      """WITH toks AS (
        |  SELECT source,
        |    unnest(list_filter(string_split_regex(trim(regexp_replace(
        |      lower(text), '\s+', ' ', 'g')), '\s+'), x -> x <> '')) AS token
        |  FROM documents),
        |sc AS (SELECT source, token, count(*) AS cs FROM toks GROUP BY 1, 2),
        |gc AS (SELECT token, CAST(sum(cs) AS BIGINT) AS c FROM sc GROUP BY 1),
        |sca AS (SELECT (SELECT CAST(sum(c) AS DOUBLE) FROM gc) AS t,
        |               (SELECT CAST(count(*) AS DOUBLE) FROM gc) AS v),
        |st AS (SELECT source, CAST(sum(cs) AS DOUBLE) AS ts FROM sc GROUP BY 1),
        |srcs AS (SELECT DISTINCT source FROM sc),
        |sup AS (
        |  SELECT s.source, g.token, g.c, COALESCE(x.cs, 0) AS cs
        |  FROM srcs s CROSS JOIN gc g
        |  LEFT JOIN sc x ON x.source = s.source AND x.token = g.token),
        |terms AS (
        |  SELECT f.source, f.cs,
        |    ((f.cs + 1.0) / (st.ts + sca.v))
        |      * ln(((f.cs + 1.0) / (st.ts + sca.v))
        |           / ((f.c + 1.0) / (sca.t + sca.v))) AS term
        |  FROM sup f JOIN st ON st.source = f.source, sca)
        |SELECT source, CAST(sum(cs) AS BIGINT) AS n_tok,
        |  CAST(count(CASE WHEN cs > 0 THEN 1 END) AS BIGINT) AS vocab_present,
        |  r4(sum(term)) AS kl
        |FROM terms GROUP BY source ORDER BY source""".stripMargin,

    // PII replay: same tail construction, same five-stage chain — DuckDB
    // regexp_replace needs the 'g' flag; counts via
    // len(regexp_extract_all) on each stage's input.
    "q160_pii_scrub" -> {
      val pats = Seq(
        ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        ("card", "\\b(?:\\d{4}[ -]){3}\\d{4}\\b", "<CARD>"),
        ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
        ("phone", "\\(\\d{3}\\) ?\\d{3}-\\d{4}|\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
        ("ip", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"))
      // DuckDB '…' literals are not backslash-escaped: regex backslashes
      // pass through verbatim; only quotes need doubling
      def q(s: String): String = s.replace("'", "''")
      // staged CTEs: tN carries the text after stage N and the counts so far
      val stages = pats.zipWithIndex.map { case ((name, pat, rep), ix) =>
        val prev = if (ix == 0) "t0" else s"t$ix"
        // qualify txt with the CTE name: DuckDB allows lateral references
        // to same-SELECT aliases, and the count must see the PRE-replace
        // text, not the stage's own output alias
        s"""t${ix + 1} AS (
           |  SELECT doc_id,
           |    regexp_replace($prev.txt, '${q(pat)}', '${q(rep)}', 'g') AS txt,
           |    ${(0 until ix).map(k => s"n_${pats(k)._1}, ").mkString}
           |    CAST(len(regexp_extract_all($prev.txt, '${q(pat)}')) AS BIGINT)
           |      AS n_$name
           |  FROM $prev)""".stripMargin
      }.mkString(",\n")
      s"""WITH base AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 8 = 1 THEN ' mail user' || CAST(doc_id AS VARCHAR)
         |             || '@example' || CAST(doc_id % 7 AS VARCHAR) || '.com ok'
         |         WHEN doc_id % 8 = 2 THEN ' card 4111 1111 1111 '
         |             || CAST(1000 + doc_id % 9000 AS VARCHAR)
         |         WHEN doc_id % 8 = 3 THEN ' ssn 123-45-'
         |             || CAST(1000 + doc_id % 9000 AS VARCHAR)
         |         WHEN doc_id % 8 = 4 THEN ' call (555) '
         |             || CAST(100 + doc_id % 900 AS VARCHAR) || '-'
         |             || CAST(1000 + doc_id % 9000 AS VARCHAR)
         |         WHEN doc_id % 8 = 5 THEN ' phone 555-'
         |             || CAST(100 + doc_id % 900 AS VARCHAR) || '-'
         |             || CAST(1000 + doc_id % 9000 AS VARCHAR)
         |         WHEN doc_id % 8 = 6 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
         |             || '.0.' || CAST(doc_id % 250 AS VARCHAR)
         |         WHEN doc_id % 8 = 7 THEN ' version 1.2.3.4000 build 123-456-78901'
         |         ELSE '' END AS txt
         |  FROM documents),
         |t0 AS (SELECT doc_id, txt FROM base),
         |$stages
         |SELECT doc_id, txt AS text_clean, n_email, n_card, n_ssn, n_phone, n_ip
         |FROM t5 ORDER BY doc_id""".stripMargin
    },

    // UTF-8 stats replay: the position-local classification — vlen per
    // position from the next ≤3 bytes (RFC 3629 table incl. the E0/ED/
    // F0/F4 constrained-second-byte rows), stray continuations = those
    // not covered by a valid sequence starting ≤3 positions back. By
    // self-synchronization this equals the engine's sequential skip-1
    // scan (Utf8StatsSpec pins the equivalence on fuzz).
    "q159_utf8_stats" -> {
      val alpha = "'0123456789abcdef'"
      def byteAt(src: String, off: String): String =
        s"(strpos($alpha, substr($src, 2 * ($off) + 1, 1)) - 1) * 16 " +
          s"+ (strpos($alpha, substr($src, 2 * ($off) + 2, 1)) - 1)"
      val iv = "CAST(i AS VARCHAR)"
      s"""WITH d AS (
         |  SELECT doc_id AS i,
         |    16 + (${byteAt(s"sha256('42:u8len:' || CAST(doc_id AS VARCHAR))", "0")}) % 32 AS len,
         |    sha256('42:u8:' || CAST(doc_id AS VARCHAR)) ||
         |      sha256('42:u8b:' || CAST(doc_id AS VARCHAR)) AS hexfull
         |  FROM documents),
         |rndb AS (
         |  SELECT i, CAST(j AS INT) AS j, ${byteAt("hexfull", "j")} AS b
         |  FROM d, range(48) r(j) WHERE j < len),
         |tails AS (SELECT * FROM (VALUES
         |  (1, 0, 195), (1, 1, 169),
         |  (2, 0, 226), (2, 1, 130), (2, 2, 172),
         |  (3, 0, 240), (3, 1, 159), (3, 2, 146), (3, 3, 150),
         |  (4, 0, 237), (4, 1, 160), (4, 2, 128),
         |  (5, 0, 195), (5, 1, 65)) v(m, tj, tb)),
         |byt AS (
         |  SELECT i, j, b FROM rndb
         |  UNION ALL
         |  SELECT d.i, CAST(d.len + t.tj AS INT) AS j, t.tb AS b
         |  FROM d JOIN tails t ON t.m = d.i % 6),
         |w AS (
         |  SELECT i, j, b,
         |    lead(b, 1) OVER win AS b1,
         |    lead(b, 2) OVER win AS b2,
         |    lead(b, 3) OVER win AS b3
         |  FROM byt WINDOW win AS (PARTITION BY i ORDER BY j)),
         |v AS (
         |  SELECT i, j, b,
         |    CASE WHEN b < 128 THEN 1
         |         WHEN b BETWEEN 194 AND 223 AND b1 BETWEEN 128 AND 191 THEN 2
         |         WHEN b = 224 AND b1 BETWEEN 160 AND 191
         |              AND b2 BETWEEN 128 AND 191 THEN 3
         |         WHEN b = 237 AND b1 BETWEEN 128 AND 159
         |              AND b2 BETWEEN 128 AND 191 THEN 3
         |         WHEN b BETWEEN 225 AND 239 AND b <> 237
         |              AND b1 BETWEEN 128 AND 191
         |              AND b2 BETWEEN 128 AND 191 THEN 3
         |         WHEN b = 240 AND b1 BETWEEN 144 AND 191
         |              AND b2 BETWEEN 128 AND 191
         |              AND b3 BETWEEN 128 AND 191 THEN 4
         |         WHEN b BETWEEN 241 AND 243 AND b1 BETWEEN 128 AND 191
         |              AND b2 BETWEEN 128 AND 191
         |              AND b3 BETWEEN 128 AND 191 THEN 4
         |         WHEN b = 244 AND b1 BETWEEN 128 AND 143
         |              AND b2 BETWEEN 128 AND 191
         |              AND b3 BETWEEN 128 AND 191 THEN 4
         |         ELSE 0 END AS vlen,
         |    b BETWEEN 128 AND 191 AS isc
         |  FROM w),
         |c AS (
         |  SELECT i, vlen, isc,
         |    lag(vlen, 1, 0) OVER win AS p1,
         |    lag(vlen, 2, 0) OVER win AS p2,
         |    lag(vlen, 3, 0) OVER win AS p3
         |  FROM v WINDOW win AS (PARTITION BY i ORDER BY j))
         |SELECT i AS doc_id,
         |  CAST(count(*) AS INT) AS n_bytes,
         |  CAST(sum(CASE WHEN NOT isc AND vlen = 1 THEN 1 ELSE 0 END) AS INT) AS n_ascii,
         |  CAST(sum(CASE WHEN NOT isc AND vlen = 2 THEN 1 ELSE 0 END) AS INT) AS n_seq2,
         |  CAST(sum(CASE WHEN NOT isc AND vlen = 3 THEN 1 ELSE 0 END) AS INT) AS n_seq3,
         |  CAST(sum(CASE WHEN NOT isc AND vlen = 4 THEN 1 ELSE 0 END) AS INT) AS n_seq4,
         |  CAST(sum(CASE WHEN NOT isc AND vlen = 0 THEN 1 ELSE 0 END) AS INT) AS n_bad_lead,
         |  CAST(sum(CASE WHEN isc AND NOT (p1 >= 2 OR p2 >= 3 OR p3 >= 4)
         |                THEN 1 ELSE 0 END) AS INT) AS n_stray_cont,
         |  sum(CASE WHEN (NOT isc AND vlen = 0) OR
         |                (isc AND NOT (p1 >= 2 OR p2 >= 3 OR p3 >= 4))
         |           THEN 1 ELSE 0 END) = 0 AS is_valid
         |FROM c GROUP BY i ORDER BY doc_id""".stripMargin
    },

    // tar replay: content/name/typeflag regenerated from the sha chains;
    // directory entries (no byte rows) left-join onto the lane aggregate
    // and take the documented 0/-1 lanes. Header layout (octal fields,
    // checksums, padding) is representation the parser must see through.
    "q161_tar_entries" -> {
      val alpha = "'0123456789abcdef'"
      def byteAt(src: String, off: String): String =
        s"(strpos($alpha, substr($src, 2 * ($off) + 1, 1)) - 1) * 16 " +
          s"+ (strpos($alpha, substr($src, 2 * ($off) + 2, 1)) - 1)"
      val iv = "CAST(i AS VARCHAR)"
      val kv = "CAST(k AS VARCHAR)"
      s"""WITH arc AS (
         |  SELECT i,
         |    1 + (${byteAt(s"sha256('42:tdim:' || $iv)", "0")}) % 3 AS nm
         |  FROM range(200) t(i)),
         |mem AS (
         |  SELECT i, CAST(k AS INT) AS k, (i + k) % 4 = 0 AS isdir,
         |    CASE WHEN (i + k) % 4 = 0 THEN 0
         |         ELSE 16 + (${byteAt(s"sha256('42:tlen:' || $iv || ':' || $kv)", "0")}) % 48
         |         END AS len,
         |    sha256('42:tc:' || $iv || ':' || $kv) ||
         |      sha256('42:tc1:' || $iv || ':' || $kv) AS hexfull
         |  FROM arc, range(3) r(k) WHERE k < nm),
         |byt AS (
         |  SELECT i, k, len, CAST(j AS INT) AS j, ${byteAt("hexfull", "j")} AS b
         |  FROM mem, range(63) r(j) WHERE j < len),
         |ba AS (
         |  SELECT i, k, sum(b) AS f0, sum(b * (j + 1)) AS f1,
         |    max(CASE WHEN j = 0 THEN b END) AS f2,
         |    max(CASE WHEN j = len - 1 THEN b END) AS f3
         |  FROM byt GROUP BY i, k)
         |SELECT mem.i AS media_id, mem.k AS member_idx,
         |  CASE WHEN isdir THEN 'd' || CAST(mem.k AS VARCHAR) || '/'
         |       ELSE 'd' || CAST(mem.k AS VARCHAR) || '/f_' || CAST(mem.i AS VARCHAR)
         |       END AS name,
         |  CAST(CASE WHEN isdir THEN 5 ELSE 0 END AS INT) AS method,
         |  CAST(len AS BIGINT) AS usize,
         |  CAST(coalesce(f0, 0) AS BIGINT) AS f0,
         |  CAST(coalesce(f1, 0) AS BIGINT) AS f1,
         |  CAST(coalesce(f2, -1) AS BIGINT) AS f2,
         |  CAST(coalesce(f3, -1) AS BIGINT) AS f3
         |FROM mem LEFT JOIN ba ON ba.i = mem.i AND ba.k = mem.k
         |ORDER BY media_id, member_idx""".stripMargin
    },

    "q158_warc_records" ->
      (warcMemberCte +
        """
          |SELECT media_id, member_idx, name, method,
          |  CAST(usize AS BIGINT) AS usize,
          |  CAST(f0 AS BIGINT) AS f0, CAST(f1 AS BIGINT) AS f1,
          |  CAST(f2 AS BIGINT) AS f2, CAST(f3 AS BIGINT) AS f3
          |FROM feat ORDER BY media_id, member_idx""".stripMargin),

    "q153_gzip_members" ->
      (gzipMemberCte +
        """
          |SELECT media_id, member_idx, name, method,
          |  CAST(usize AS BIGINT) AS usize,
          |  CAST(f0 AS BIGINT) AS f0, CAST(f1 AS BIGINT) AS f1,
          |  CAST(f2 AS BIGINT) AS f2, CAST(f3 AS BIGINT) AS f3
          |FROM feat ORDER BY media_id, member_idx""".stripMargin),

    "q149_zip_members" ->
      (zipMemberCte +
        """
          |SELECT media_id, member_idx, name, method,
          |  CAST(usize AS BIGINT) AS usize,
          |  CAST(f0 AS BIGINT) AS f0, CAST(f1 AS BIGINT) AS f1,
          |  CAST(f2 AS BIGINT) AS f2, CAST(f3 AS BIGINT) AS f3
          |FROM feat ORDER BY media_id, member_idx""".stripMargin),

    // AC-scan replay: brute-force substring counting — for every doc,
    // pattern, and start position, does the slice equal the pattern?
    // Overlaps included by construction (every position tested). The
    // range bound (1024) exceeds the longest document at every SF.
    "q150_ac_scan" ->
      """WITH pats AS (
        |  SELECT * FROM (VALUES ('table'), ('le'), ('a a'), ('scan'),
        |                        ('an'), ('row scan'), ('t t')) p(pat)),
        |d AS (SELECT doc_id, lower(text) AS txt FROM documents),
        |occ AS (
        |  SELECT d.doc_id, p.pat
        |  FROM d, pats p, range(1024) r(j)
        |  WHERE j + len(pat) <= len(txt)
        |    AND substr(txt, CAST(j + 1 AS INT), CAST(len(pat) AS INT)) = pat),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_hits,
        |         count(DISTINCT pat) AS n_patterns
        |  FROM occ GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(a.n_hits, 0) AS BIGINT) AS n_hits,
        |  CAST(coalesce(a.n_patterns, 0) AS BIGINT) AS n_patterns,
        |  coalesce(a.n_hits, 0) = 0 AS keep
        |FROM d LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // URL replay: synthesize the same URL formula, then run the full
    // normalization chain (fragment strip, scheme/host lowercase, www
    // strip, default-port drop, query-param sort, trailing-slash strip),
    // the registered-domain CASE, and the per-domain top-3 window.
    "q151_url_domain_cap" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    (CASE WHEN doc_id % 5 = 0 THEN 'HTTP' ELSE 'https' END) || '://' ||
        |    (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) ||
        |    (CASE WHEN doc_id % 9 = 0 THEN 'SiTe' ELSE 'site' END) ||
        |    CAST(doc_id % 17 AS VARCHAR) || '.' ||
        |    (['com', 'org', 'co.uk', 'io'])[CAST(doc_id % 4 AS INT) + 1] ||
        |    (CASE WHEN doc_id % 10 = 0 THEN ':80'
        |          WHEN doc_id % 7 = 0 THEN ':8080'
        |          WHEN doc_id % 11 = 0 THEN ':443' ELSE '' END) ||
        |    '/p/' || CAST(doc_id % 13 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END) ||
        |    (CASE WHEN doc_id % 2 = 0
        |          THEN '?b=' || CAST(doc_id % 5 AS VARCHAR) || '&a=1'
        |          ELSE '' END) ||
        |    (CASE WHEN doc_id % 4 = 0 THEN '#sec' ELSE '' END) AS url
        |  FROM documents),
        |p2 AS (
        |  SELECT doc_id, n_chars,
        |    lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    regexp_extract(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://(.*)$', 1) AS rest
        |  FROM (SELECT doc_id, n_chars,
        |          regexp_replace(url, '#.*$', '') AS nofrag FROM d)),
        |p3 AS (
        |  SELECT doc_id, n_chars, scheme,
        |    lower(regexp_extract(rest, '^([^/?]*)', 1)) AS hostport,
        |    substr(rest, length(regexp_extract(rest, '^([^/?]*)', 1)) + 1) AS pathq
        |  FROM p2),
        |p4 AS (
        |  SELECT doc_id, n_chars, scheme,
        |    regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''), '^www\.', '') AS host,
        |    regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
        |    regexp_extract(pathq, '^([^?]*)', 1) AS path,
        |    regexp_extract(pathq, '\?(.*)$', 1) AS query
        |  FROM p3),
        |p5 AS (
        |  SELECT doc_id, n_chars, host,
        |    scheme || '://' || host ||
        |    (CASE WHEN port = '' THEN ''
        |          WHEN scheme = 'http' AND port = '80' THEN ''
        |          WHEN scheme = 'https' AND port = '443' THEN ''
        |          ELSE ':' || port END) ||
        |    regexp_replace(path, '/+$', '') ||
        |    (CASE WHEN query = '' THEN ''
        |          ELSE '?' || array_to_string(list_sort(string_split(query, '&')), '&') END)
        |      AS url_norm
        |  FROM p4),
        |dom AS (
        |  SELECT doc_id, n_chars, url_norm,
        |    CASE WHEN len(ls) >= 3 AND length(ls[len(ls)]) = 2
        |              AND list_contains(['co', 'com', 'net', 'org', 'ac', 'gov', 'edu'],
        |                                ls[len(ls) - 1])
        |         THEN ls[len(ls) - 2] || '.' || ls[len(ls) - 1] || '.' || ls[len(ls)]
        |         WHEN len(ls) >= 2 THEN ls[len(ls) - 1] || '.' || ls[len(ls)]
        |         ELSE host END AS domain
        |  FROM (SELECT *, string_split(host, '.') AS ls FROM p5)),
        |ranked AS (
        |  SELECT doc_id, url_norm, domain, row_number() OVER (
        |    PARTITION BY domain ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM dom)
        |SELECT doc_id, url_norm, domain, CAST(rk AS BIGINT) AS rk
        |FROM ranked WHERE rk <= 3 ORDER BY doc_id""".stripMargin,

    // robots replay: same synthesized URL/rule tables, longest-match via
    // a window ordered by (match length desc, allow-wins-ties desc).
    "q154_robots_rules" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'site' || CAST(doc_id % 17 AS VARCHAR) || '.' ||
        |      (['com', 'org', 'co.uk', 'io'])[CAST(doc_id % 4 AS INT) + 1] AS domain,
        |    '/p/' || CAST(doc_id % 13 AS VARCHAR) AS path
        |  FROM documents),
        |rd AS (SELECT * FROM (VALUES
        |  (0, 'disallow', '/p/1'), (0, 'allow', '/p/12'),
        |  (0, 'allow', '/p/3'), (0, 'disallow', '/p/3'),
        |  (1, 'disallow', '/p/'), (1, 'allow', '/p/7')) v(rs, rtype, prefix)),
        |doms AS (SELECT DISTINCT domain, length(domain) % 3 AS rs FROM u),
        |rules AS (SELECT domain, rtype, prefix FROM doms JOIN rd USING (rs)),
        |m AS (
        |  SELECT u.doc_id, u.domain, u.path, r.rtype, r.prefix
        |  FROM u LEFT JOIN rules r
        |    ON r.domain = u.domain AND starts_with(u.path, r.prefix)),
        |best AS (
        |  SELECT doc_id, domain, path, rtype, prefix, row_number() OVER (
        |    PARTITION BY doc_id
        |    ORDER BY CASE WHEN prefix IS NULL THEN -1
        |                  ELSE length(prefix) END DESC,
        |             CASE WHEN rtype IS NULL OR rtype = 'allow'
        |                  THEN 1 ELSE 0 END DESC) AS rn
        |  FROM m)
        |SELECT doc_id, domain, path,
        |  (prefix IS NULL OR rtype = 'allow') AS allowed,
        |  coalesce(prefix, '') AS rule
        |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // NFC two-way check: DuckDB's utf8proc nfc_normalize vs the Spark
    // side's java.text.Normalizer — independent UAX #15 implementations.
    // Tails are built from chr() code points (chr is full-Unicode in
    // DuckDB; the Spark side uses \u literals because Spark's chr is
    // ASCII-mod-256).
    "q155_nfc_normalize" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    CASE WHEN doc_id % 5 = 0 THEN 'e' || chr(769)
        |         WHEN doc_id % 5 = 1 THEN 'A' || chr(778)
        |         WHEN doc_id % 5 = 2 THEN chr(233)
        |         WHEN doc_id % 5 = 3 THEN chr(4352) || chr(4449) || chr(4520)
        |         ELSE '' END AS tail
        |  FROM documents),
        |f AS (SELECT doc_id, text || ' ' || tail AS fl, tail FROM t)
        |SELECT doc_id,
        |  CAST(length(fl) AS BIGINT) AS raw_len,
        |  CAST(length(nfc_normalize(fl)) AS BIGINT) AS nfc_len,
        |  nfc_normalize(fl) <> fl AS changed,
        |  nfc_normalize(tail) AS tail_nfc
        |FROM f ORDER BY doc_id""".stripMargin,

    // Weighted-sample replay: w tickets per doc (48-bit sha256 prefixes
    // via the q114 digit-parse), min per doc, k smallest (ticket, id)
    // win, rank = selection order. Pure integer — exact equality.
    "q156_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id, n_chars % 8 + 1 AS weight FROM documents),
        |tk AS (
        |  SELECT doc_id, weight, CAST(list_sum(
        |      [(strpos('0123456789abcdef', substr(
        |          sha256('ws:' || CAST(doc_id AS VARCHAR) || ':' ||
        |                  CAST(j AS VARCHAR)), i, 1)) - 1)
        |       * pow(16.0, 12 - i) for i in generate_series(1, 12)])
        |    AS BIGINT) AS ticket
        |  FROM w, range(8) r(j) WHERE j < weight),
        |mint AS (
        |  SELECT doc_id, CAST(max(weight) AS BIGINT) AS weight,
        |    min(ticket) AS ticket
        |  FROM tk GROUP BY doc_id),
        |ranked AS (
        |  SELECT doc_id, weight, ticket,
        |    row_number() OVER (ORDER BY ticket, doc_id) AS rank
        |  FROM mint)
        |SELECT doc_id, weight, ticket, CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 100 ORDER BY rank""".stripMargin,

    // Link-graph replay: the oracle regenerates each page's intended
    // outlink DOMAINS from the anchor formula (the engine must get them
    // by parsing the markup); decoys planted on the Spark side produce
    // NO oracle rows, so any extraction slip desyncs. The dup anchor's
    // path differs but its domain matches anchor 0 — n_links counts it,
    // n_pages (distinct pages) does not.
    "q157_link_graph" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    'site' || CAST(doc_id % 17 AS VARCHAR) || '.' ||
        |      (['com', 'org', 'co.uk', 'io'])[CAST(doc_id % 4 AS INT) + 1]
        |      AS src
        |  FROM documents),
        |lnk AS (
        |  SELECT doc_id, src,
        |    'site' || CAST((doc_id * 7 + j) % 17 AS VARCHAR) || '.' ||
        |      (['com', 'org', 'co.uk', 'io'])[CAST((doc_id + j) % 4 AS INT) + 1]
        |      AS dst
        |  FROM d, range(3) r(j) WHERE j <= doc_id % 3
        |  UNION ALL
        |  SELECT doc_id, src,
        |    'site' || CAST((doc_id * 7) % 17 AS VARCHAR) || '.' ||
        |      (['com', 'org', 'co.uk', 'io'])[CAST(doc_id % 4 AS INT) + 1]
        |      AS dst
        |  FROM d WHERE doc_id % 5 = 0)
        |SELECT src AS src_domain, dst AS dst_domain,
        |  CAST(count(*) AS BIGINT) AS n_links,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_pages
        |FROM lnk WHERE dst <> src
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // MaxSim replay: the quantizeInt8 formula (scale = max |x|, half-up
    // rounding), integer dots via list_dot_product over integer-valued
    // DOUBLE lists (|dot| <= 2^20 << 2^53, exact), per-(query-token, doc)
    // max, per-(query, doc) sum, rank by (score desc, doc_id).
    "q152_maxsim_topk" ->
      """WITH e AS (
        |  SELECT vec_id // 8 AS doc_id, vec_id % 8 AS token_idx,
        |    CAST(embedding AS DOUBLE[]) AS vec
        |  FROM embeddings),
        |qz AS (
        |  SELECT doc_id, token_idx,
        |    CASE WHEN s = 0 THEN list_transform(vec, x -> CAST(0 AS DOUBLE))
        |         ELSE list_transform(vec, x -> floor(x / s * 127 + 0.5))
        |    END AS q
        |  FROM (SELECT doc_id, token_idx, vec,
        |          list_max(list_transform(vec, x -> abs(x))) AS s
        |        FROM e)),
        |qs AS (
        |  SELECT doc_id AS query_id, token_idx AS q_tok, q AS qq
        |  FROM qz WHERE doc_id % 20 = 0 AND token_idx < 4),
        |dots AS (
        |  SELECT qs.query_id, qs.q_tok, c.doc_id,
        |    list_dot_product(c.q, qs.qq) AS dot
        |  FROM qz c CROSS JOIN qs
        |  WHERE c.doc_id <> qs.query_id),
        |best AS (
        |  SELECT query_id, q_tok, doc_id, max(dot) AS m
        |  FROM dots GROUP BY 1, 2, 3),
        |score AS (
        |  SELECT query_id, doc_id, CAST(sum(m) AS BIGINT) AS maxsim
        |  FROM best GROUP BY 1, 2),
        |ranked AS (
        |  SELECT query_id, doc_id, maxsim, row_number() OVER (
        |    PARTITION BY query_id ORDER BY maxsim DESC, doc_id) AS rank
        |  FROM score)
        |SELECT query_id, doc_id, maxsim, CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "q133_qoi_decode" ->
      (qoiFeatCte +
        """
          |SELECT media_id,
          |  CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
          |  CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3,
          |  CAST(f4 AS DOUBLE) AS f4, CAST(f5 AS DOUBLE) AS f5,
          |  CAST(f6 AS DOUBLE) AS f6, CAST(f7 AS DOUBLE) AS f7
          |FROM feat ORDER BY media_id""".stripMargin),

    "q112_gif_decode" ->
      (gifFeatCte +
        """
          |SELECT media_id,
          |  CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
          |  CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3,
          |  CAST(f4 AS DOUBLE) AS f4, CAST(f5 AS DOUBLE) AS f5,
          |  CAST(f6 AS DOUBLE) AS f6, CAST(f7 AS DOUBLE) AS f7
          |FROM feat ORDER BY media_id""".stripMargin),

    "q39_string_extras" ->
      """SELECT p_partkey, lpad(p_brand, 12, '*') AS brand_pad,
        | translate(p_type, 'aeiou', 'AEIOU') AS type_tr,
        | reverse(p_name) AS name_rev
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q40_null_handling" ->
      """SELECT c_custkey,
        | coalesce(nullif(c_mktsegment, 'BUILDING'), 'NONE') AS seg_or_none,
        | CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_nonneg
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q41_array_agg" ->
      """SELECT o_custkey,
        | len(list_sort(list(o_orderpriority))) AS n_prios,
        | (list_sort(list(o_orderpriority)))[1] AS first_prio,
        | array_to_string(list_sort(list(o_orderpriority)), ',') AS prio_csv
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q42_regex" ->
      """SELECT doc_id,
        | regexp_extract(text, '(spark|query)', 1) AS first_kw,
        | len(regexp_extract_all(text, 'spark')) AS n_spark
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q43_in_subquery" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_totalprice > 200000)
        |ORDER BY c_custkey""".stripMargin,

    "q51_like_filter" ->
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_name LIKE '%widget%' AND p_type NOT LIKE 'PROMO%'
        |ORDER BY p_partkey""".stripMargin,

    "q52_conditional_agg" ->
      """SELECT year(o_orderdate) AS yr,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders GROUP BY yr ORDER BY yr""".stripMargin,

    "q53_correlated_subquery" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM lineitem l1
        |WHERE l_quantity < (SELECT 0.5 * avg(l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = l1.l_partkey)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q49_percentiles" ->
      """SELECT l_returnflag,
        | r4(quantile_cont(l_quantity, 0.5)) AS median_qty,
        | r4(quantile_cont(l_extendedprice, 0.9)) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q50_stats" ->
      """SELECT l_returnflag,
        | r4(stddev_samp(l_extendedprice)) AS sd_price,
        | r6(var_samp(l_discount)) AS var_disc,
        | r6(corr(l_quantity, l_extendedprice)) AS corr_qp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q48_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q47_range_join" ->
      """SELECT e.user_id, e.event_id AS error_id, p.event_id AS purchase_id
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id
        | AND abs(floor(epoch(e.ts)) - floor(epoch(p.ts))) <= 3600
        |ORDER BY e.user_id, error_id, purchase_id""".stripMargin,

    "q45_salted_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // Mirrors TextStatsEval exactly: language = most DISTINCT stopword
    // hits (ascending code on ties, 'und' on none); quality = weighted
    // surface stats rounded to 4 decimals; n_bpe over the RAW text.
    "q29_text_quality" ->
      s"""WITH toks AS (
         |  SELECT doc_id, text,
         |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt,
         |    list_filter(string_split_regex(
         |      trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+'),
         |      x -> x <> '') AS tk
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, text,
         |    len(list_filter(${profileLists("de")}, w -> list_contains(tk, w))) AS s_de,
         |    len(list_filter(${profileLists("en")}, w -> list_contains(tk, w))) AS s_en,
         |    len(list_filter(${profileLists("es")}, w -> list_contains(tk, w))) AS s_es,
         |    len(list_filter(${profileLists("fr")}, w -> list_contains(tk, w))) AS s_fr,
         |    len(list_filter(${profileLists("it")}, w -> list_contains(tk, w))) AS s_it,
         |    CAST(len(nt) AS DOUBLE) AS nchars,
         |    CAST(len(tk) AS DOUBLE) AS ntoks,
         |    CAST(len(regexp_extract_all(nt, '[[:punct:]]')) AS DOUBLE) AS punct,
         |    CAST(len(list_filter(tk, t -> list_contains($allStopsList, t))) AS DOUBLE) AS stophits
         |  FROM toks),
         |feat AS (
         |  SELECT doc_id, text, s_de, s_en, s_es, s_fr, s_it,
         |    greatest(s_de, s_en, s_es, s_fr, s_it) AS best,
         |    CASE WHEN nchars >= 50 AND nchars <= 20000 THEN 1.0 ELSE 0.3 END AS length_ok,
         |    CASE WHEN nchars = 0 THEN 0.0
         |         WHEN punct / nchars < 0.2 THEN 1.0 ELSE 0.4 END AS punct_ok,
         |    CASE WHEN ntoks = 0 THEN 0.0
         |         ELSE (nchars - (ntoks - 1)) / ntoks END AS mwl,
         |    CASE WHEN ntoks = 0 THEN 0.0 ELSE stophits / ntoks END AS stop_ratio
         |  FROM scored)
         |SELECT doc_id,
         |  CASE WHEN best = 0 THEN 'und'
         |       WHEN s_de = best THEN 'de' WHEN s_en = best THEN 'en'
         |       WHEN s_es = best THEN 'es' WHEN s_fr = best THEN 'fr'
         |       ELSE 'it' END AS lang_pred,
         |  round(length_ok * 0.3 + punct_ok * 0.25 +
         |    (CASE WHEN mwl >= 2.5 AND mwl <= 12.0 THEN 1.0 ELSE 0.4 END) * 0.25 +
         |    (CASE WHEN stop_ratio > 0.05 THEN 1.0 ELSE 0.6 END) * 0.2, 4) AS quality,
         |  CAST(len(regexp_extract_all(text,
         |    '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe
         |FROM feat ORDER BY doc_id""".stripMargin,

    "q30_sentiment" ->
      (sentimentCtes("SELECT doc_id, lang, text AS body FROM documents") +
       """
         |SELECT lang, r4(avg(pol)) AS avg_polarity,
         | r4(avg(subj)) AS avg_subjectivity, count(*) AS n_docs
         |FROM sent JOIN src USING (doc_id)
         |GROUP BY lang ORDER BY lang""".stripMargin),

    "q31_flagship_pipeline" ->
      (sentimentCtes(
         s"SELECT doc_id, $cleanTweetSql AS body FROM documents") +
       """,
         |tags AS (SELECT DISTINCT doc_id, tok AS tag FROM toks)
         |SELECT tag, count(*) AS n_mentions,
         | r4(avg(pol)) AS avg_polarity, r4(avg(subj)) AS avg_subjectivity
         |FROM tags JOIN sent USING (doc_id)
         |GROUP BY tag ORDER BY n_mentions DESC, tag LIMIT 50""".stripMargin),

    // Brute-force exact Jaccard over distinct 5-char shingles of
    // whitespace-normalized lower-cased text — the ground truth the LSH
    // pipeline approximates. The length prefilter is sound (jaccard <=
    // min/max of the set sizes) and keeps the O(n^2) oracle cheap at
    // sf0.01; the engine never runs this plan.
    "q27_minhash_pairs" ->
      """WITH docs AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([substr(t, i, 5) for i in generate_series(1, length(t)-4)]) AS s
        |  FROM docs WHERE length(t) >= 5),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    len(list_intersect(a.s, b.s))::DOUBLE
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
        |  FROM sh a JOIN sh b
        |    ON a.doc_id < b.doc_id
        |   AND least(len(a.s), len(b.s))::DOUBLE >= 0.8 * greatest(len(a.s), len(b.s)))
        |SELECT id_a, id_b, r4(j) AS jaccard FROM pairs
        |WHERE j >= 0.8 ORDER BY id_a, id_b""".stripMargin,

    "q54_having" ->
      """SELECT o_custkey, r2(sum(o_totalprice)) AS total_spent,
        | count(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |HAVING r2(sum(o_totalprice)) > 3000000.0
        |ORDER BY o_custkey""".stripMargin,

    "q55_approx_percentiles" ->
      """SELECT l_returnflag,
        | r4(CAST(quantile_disc(l_quantity, 0.5) AS DOUBLE)) AS median_qty_approx,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q44_having_dates" ->
      """SELECT o_orderkey, o_custkey,
        | CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS due_date,
        | date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
        | CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
        | CAST(quarter(o_orderdate) AS BIGINT) AS qtr
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q57_hash_split" ->
      """SELECT doc_id,
        | CASE WHEN substring(sha256(CAST(doc_id AS VARCHAR) || ':split:42'), 1, 2) < 'e6' THEN 'train'
        |      WHEN substring(sha256(CAST(doc_id AS VARCHAR) || ':split:42'), 1, 2) < 'f3' THEN 'val'
        |      ELSE 'test' END AS split,
        | sha256(CAST(doc_id AS VARCHAR) || ':shuffle:42') AS shuffle_key
        |FROM documents ORDER BY shuffle_key""".stripMargin,

    "q194_feature_hash" ->
      (featureHashCte +
        """,
          |agg AS (
          |  SELECT doc_id,
          |    string_agg(CAST(v AS VARCHAR), ',' ORDER BY d) AS vec_csv,
          |    CAST(sum(v * v) AS BIGINT) AS norm2
          |  FROM fullv GROUP BY doc_id),
          |nt AS (
          |  SELECT doc_id, CAST(len(list_filter(
          |    string_split_regex(trim(text), '\s+'), x -> x <> ''))
          |    AS BIGINT) AS n_tok
          |  FROM documents)
          |SELECT a.doc_id, nt.n_tok, a.norm2, a.vec_csv
          |FROM agg a JOIN nt ON nt.doc_id = a.doc_id
          |ORDER BY a.doc_id""".stripMargin),

    // Brute-force cosine over the replayed hashed vectors: dot and
    // norms integer-exact in doubles, sqrt/divide in the engine's
    // order, rank on the UNROUNDED cosine, r6 only in the report
    // (the q26/q56 contract over the q194 construction).
    "q199_hashed_cosine_topk" ->
      (featureHashCte +
        """,
          |vecs AS MATERIALIZED (
          |  SELECT doc_id, list(v ORDER BY d) AS vec,
          |    CAST(sum(v * v) AS BIGINT) AS norm2
          |  FROM fullv GROUP BY doc_id),
          |nz AS (SELECT * FROM vecs WHERE norm2 > 0),
          |scored AS (
          |  SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
          |    CAST(CAST(list_sum([q.vec[i] * c.vec[i]
          |        for i in generate_series(1, 64)]) AS BIGINT) AS DOUBLE)
          |      / sqrt(CAST(q.norm2 * c.norm2 AS DOUBLE)) AS cos
          |  FROM nz q JOIN nz c
          |    ON q.doc_id % 50 = 0 AND c.doc_id <> q.doc_id),
          |rk AS (
          |  SELECT query_id, neighbor_id, cos,
          |    row_number() OVER (PARTITION BY query_id
          |      ORDER BY cos DESC, neighbor_id) AS rank
          |  FROM scored)
          |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
          |  r6(cos) AS cos
          |FROM rk WHERE rank <= 5
          |ORDER BY query_id, rank""".stripMargin),

    "q193_exact_split" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY sha256(CAST(doc_id AS VARCHAR) || ':xsplit:42'),
        |        doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT doc_id, source,
        |  CASE WHEN rn <= (n * 80) // 100 THEN 'train'
        |       WHEN rn <= (n * 90) // 100 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM r ORDER BY doc_id""".stripMargin,

    "q58_token_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> x <> '')) AS n_tok
        |  FROM documents)
        |SELECT doc_id, t.i AS chunk_idx, t.i * 64 AS tok_start,
        |  least(t.i * 64 + 64, n_tok) AS tok_end
        |FROM toks, unnest(generate_series(0,
        |    CAST(ceil(n_tok / 64.0) AS BIGINT) - 1)) t(i)
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    "q60_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |        x -> x <> '') AS t
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, len(t) AS n_tok, len(list_distinct(t)) AS n_uniq_tok,
        |    list_transform(generate_series(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i + 1]) AS g
        |  FROM toks),
        |ratios AS (
        |  SELECT doc_id, n_tok, n_uniq_tok,
        |    CASE WHEN n_tok = 0 THEN 0.0
        |         ELSE r4(n_uniq_tok / CAST(n_tok AS DOUBLE)) END AS ttr,
        |    CASE WHEN len(g) = 0 THEN 0.0
        |         ELSE r4(len(list_distinct(g)) / CAST(len(g) AS DOUBLE))
        |         END AS uniq_2gram_frac
        |  FROM st)
        |SELECT doc_id, n_tok, n_uniq_tok, ttr, uniq_2gram_frac,
        |  (ttr < 0.3 OR uniq_2gram_frac < 0.55) AS is_repetitive
        |FROM ratios ORDER BY doc_id""".stripMargin,

    "q59_source_mixture" ->
      """SELECT doc_id, source, lang FROM documents
        |WHERE substring(sha256(CAST(doc_id AS VARCHAR) || ':mix:42'), 1, 2) <
        |  CASE WHEN source IN ('src0', 'src1', 'src2') THEN 'g0'
        |       WHEN lang = 'en' THEN 'c0' ELSE '40' END
        |ORDER BY doc_id""".stripMargin,

    // Distinct 3-gram overlap per train doc against the test split's gram
    // set; grams are per-doc-distinct lists, so the join-then-count is
    // exactly |train_grams ∩ bench_grams|.
    "q61_decontamination" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN substring(sha256(CAST(doc_id AS VARCHAR) || ':split:42'), 1, 2) < 'e6' THEN 'train'
        |         WHEN substring(sha256(CAST(doc_id AS VARCHAR) || ':split:42'), 1, 2) < 'f3' THEN 'val'
        |         ELSE 'test' END AS split,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |        x -> x <> '') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, split,
        |    list_distinct(list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS g
        |  FROM toks),
        |bench AS (SELECT DISTINCT unnest(g) AS bg FROM grams WHERE split = 'test'),
        |hits AS (
        |  SELECT tr.doc_id, count(*) AS n_hits
        |  FROM (SELECT doc_id, unnest(g) AS tg FROM grams WHERE split = 'train') tr
        |  JOIN bench b ON tr.tg = b.bg
        |  GROUP BY tr.doc_id)
        |SELECT g.doc_id, coalesce(h.n_hits, 0) AS n_hits,
        |  coalesce(h.n_hits, 0) > 0 AS contaminated
        |FROM grams g LEFT JOIN hits h USING (doc_id)
        |WHERE g.split = 'train' ORDER BY g.doc_id""".stripMargin,

    "q62_boilerplate_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |        x -> x <> '') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))) AS gram
        |  FROM toks)
        |SELECT gram, count(*) AS doc_freq FROM grams
        |GROUP BY gram ORDER BY doc_freq DESC, gram LIMIT 100""".stripMargin,

    // Composes the proven q29 (language/quality), q60 (repetition), and
    // q57 (hash split) fragments; dedup groups on normalized text where
    // the engine groups on its xxhash64 (identical modulo collisions).
    "q63_curation_pipeline" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source,
         |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt,
         |    list_filter(string_split_regex(
         |      trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+'),
         |      x -> x <> '') AS tk
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, source, nt, tk,
         |    len(list_filter(${profileLists("de")}, w -> list_contains(tk, w))) AS s_de,
         |    len(list_filter(${profileLists("en")}, w -> list_contains(tk, w))) AS s_en,
         |    len(list_filter(${profileLists("es")}, w -> list_contains(tk, w))) AS s_es,
         |    len(list_filter(${profileLists("fr")}, w -> list_contains(tk, w))) AS s_fr,
         |    len(list_filter(${profileLists("it")}, w -> list_contains(tk, w))) AS s_it,
         |    CAST(len(nt) AS DOUBLE) AS nchars,
         |    CAST(len(tk) AS DOUBLE) AS ntoks,
         |    CAST(len(regexp_extract_all(nt, '[[:punct:]]')) AS DOUBLE) AS punct,
         |    CAST(len(list_filter(tk, t -> list_contains($allStopsList, t))) AS DOUBLE) AS stophits
         |  FROM toks),
         |feat AS (
         |  SELECT doc_id, source, nt, tk, s_de, s_en, s_es, s_fr, s_it,
         |    greatest(s_de, s_en, s_es, s_fr, s_it) AS best,
         |    CASE WHEN nchars >= 50 AND nchars <= 20000 THEN 1.0 ELSE 0.3 END AS length_ok,
         |    CASE WHEN nchars = 0 THEN 0.0
         |         WHEN punct / nchars < 0.2 THEN 1.0 ELSE 0.4 END AS punct_ok,
         |    CASE WHEN ntoks = 0 THEN 0.0
         |         ELSE (nchars - (ntoks - 1)) / ntoks END AS mwl,
         |    CASE WHEN ntoks = 0 THEN 0.0 ELSE stophits / ntoks END AS stop_ratio
         |  FROM scored),
         |ann AS (
         |  SELECT doc_id, source, nt,
         |    CASE WHEN best = 0 THEN 'und'
         |         WHEN s_de = best THEN 'de' WHEN s_en = best THEN 'en'
         |         WHEN s_es = best THEN 'es' WHEN s_fr = best THEN 'fr'
         |         ELSE 'it' END AS lang_pred,
         |    round(length_ok * 0.3 + punct_ok * 0.25 +
         |      (CASE WHEN mwl >= 2.5 AND mwl <= 12.0 THEN 1.0 ELSE 0.4 END) * 0.25 +
         |      (CASE WHEN stop_ratio > 0.05 THEN 1.0 ELSE 0.6 END) * 0.2, 4) AS quality,
         |    CASE WHEN len(tk) = 0 THEN 0.0
         |         ELSE r4(len(list_distinct(tk)) / CAST(len(tk) AS DOUBLE)) END AS ttr,
         |    CASE WHEN len(tk) - 1 <= 0 THEN 0.0
         |         ELSE r4(len(list_distinct(list_transform(generate_series(1, len(tk) - 1),
         |             i -> tk[i] || ' ' || tk[i + 1]))) / CAST(len(tk) - 1 AS DOUBLE))
         |         END AS u2
         |  FROM feat),
         |kept AS (
         |  SELECT * FROM ann
         |  WHERE lang_pred <> 'und' AND quality >= 0.7
         |    AND ttr >= 0.3 AND u2 >= 0.55),
         |dedup AS (
         |  SELECT doc_id, source, quality FROM (
         |    SELECT doc_id, source, quality,
         |      row_number() OVER (PARTITION BY nt ORDER BY doc_id) AS rn
         |    FROM kept) WHERE rn = 1),
         |labeled AS (
         |  SELECT source, quality,
         |    CASE WHEN substring(sha256(CAST(doc_id AS VARCHAR) || ':split:42'), 1, 2) < 'e6' THEN 'train'
         |         WHEN substring(sha256(CAST(doc_id AS VARCHAR) || ':split:42'), 1, 2) < 'f3' THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM dedup)
         |SELECT split, source, count(*) AS n_docs,
         |  r4(sum(CAST(round(quality * 10000) AS BIGINT)) / (count(*) * 10000.0))
         |    AS avg_quality
         |FROM labeled GROUP BY split, source ORDER BY split, source""".stripMargin,

    "q64_line_dedup" ->
      """WITH norm AS (
        |  SELECT doc_id, replace(text, chr(10), ' ') AS text,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nl
        |  FROM documents),
        |freq AS (
        |  SELECT nl FROM norm GROUP BY nl HAVING count(DISTINCT doc_id) >= 2)
        |SELECT doc_id, text FROM norm WHERE nl NOT IN (SELECT nl FROM freq)
        |ORDER BY doc_id""".stripMargin,

    // Exact-Jaccard pairs (the q27 oracle) + recursive transitive closure:
    // label(a) = min id reachable, computed to a true fixpoint — no
    // iteration cap to coincide with.
    "q65_dup_clusters" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([substr(t, i, 5) for i in generate_series(1, length(t)-4)]) AS s
        |  FROM docs WHERE length(t) >= 5),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b
        |    ON a.doc_id < b.doc_id
        |   AND least(len(a.s), len(b.s))::DOUBLE >= 0.8 * greatest(len(a.s), len(b.s))
        |  WHERE len(list_intersect(a.s, b.s))::DOUBLE
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        |SELECT a AS id, least(a, min(b)) AS label FROM reach
        |GROUP BY a ORDER BY id""".stripMargin,

    "q66_embedding_quantize" ->
      """WITH base AS (
        |  SELECT vec_id, embedding AS e,
        |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS scale
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, e, scale,
        |    CASE WHEN scale = 0 THEN list_transform(e, x -> CAST(0 AS BIGINT))
        |         ELSE list_transform(e,
        |           x -> CAST(floor(x::DOUBLE / scale * 127.0 + 0.5) AS BIGINT))
        |         END AS qv
        |  FROM base)
        |SELECT vec_id,
        |  r6(sqrt(list_sum(list_transform(e, x -> x::DOUBLE * x::DOUBLE)))) AS norm,
        |  r6(scale) AS scale,
        |  qv[1] AS q0, qv[2] AS q1,
        |  r6(list_max(list_transform(generate_series(1, len(e)),
        |    i -> abs(e[i]::DOUBLE - (qv[i] * scale) / 127.0)))) AS max_err
        |FROM q ORDER BY vec_id""".stripMargin,

    "q67_embedding_dim_stats" ->
      """WITH vals AS (
        |  SELECT t.i - 1 AS dim, embedding[t.i]::DOUBLE AS v
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) t(i))
        |SELECT dim, r4(avg(v)) AS mean, r4(stddev_samp(v)) AS std,
        |  r6(min(v)) AS dim_min, r6(max(v)) AS dim_max
        |FROM vals GROUP BY dim ORDER BY dim""".stripMargin,

    "q70_sessionization" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |flags AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |           OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |sess AS (
        |  SELECT user_id, us,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flags)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(us) AS start_us, max(us) AS end_us
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    // Exact word-3-gram Jaccard; the length prefilter is sound
    // (j <= min(|A|,|B|)/max(|A|,|B|)).
    "q69_ngram_jaccard" -> ngramJaccardBruteSql,

    // q129 gates against the IDENTICAL brute-force SQL: prefix filtering
    // is lossless, so the exact join must reproduce the full all-pairs
    // result (q69 reproduces it too at this SF, but by measured LSH
    // recall rather than by construction).
    "q129_prefix_join" -> ngramJaccardBruteSql,

    // Constructive expectation: the corpus is PII-free (verified: zero
    // digit/@ characters), so redacting the planted suffix must yield
    // exactly these three tags.
    "q68_pii_redaction" ->
      """SELECT doc_id,
        |  text || ' contact <EMAIL> via <IP> or <PHONE>' AS clean
        |FROM documents ORDER BY doc_id""".stripMargin,

    // tf and df are exact integer aggregates; ln(N/df) differs by <=1
    // ulp across libm implementations, absorbed by r4.
    "q71_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS nd FROM documents)
        |SELECT t.doc_id, t.tok, t.tf, d.df,
        |  r4(t.tf * ln(nd::DOUBLE / d.df)) AS weight
        |FROM tf t JOIN dfq d USING (tok), n
        |ORDER BY t.doc_id, t.tok""".stripMargin,

    // Quality formula verbatim from the q29 oracle (carried per source);
    // quantile_cont's interpolated median equals a data value only when
    // it lands ON one, so the >= cut is engine-independent.
    "q72_quality_prune" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source,
         |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt,
         |    list_filter(string_split_regex(
         |      trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+'),
         |      x -> x <> '') AS tk
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, source,
         |    CAST(len(nt) AS DOUBLE) AS nchars,
         |    CAST(len(tk) AS DOUBLE) AS ntoks,
         |    CAST(len(regexp_extract_all(nt, '[[:punct:]]')) AS DOUBLE) AS punct,
         |    CAST(len(list_filter(tk, t -> list_contains($allStopsList, t))) AS DOUBLE) AS stophits
         |  FROM toks),
         |feat AS (
         |  SELECT doc_id, source,
         |    CASE WHEN nchars >= 50 AND nchars <= 20000 THEN 1.0 ELSE 0.3 END AS length_ok,
         |    CASE WHEN nchars = 0 THEN 0.0
         |         WHEN punct / nchars < 0.2 THEN 1.0 ELSE 0.4 END AS punct_ok,
         |    CASE WHEN ntoks = 0 THEN 0.0
         |         ELSE (nchars - (ntoks - 1)) / ntoks END AS mwl,
         |    CASE WHEN ntoks = 0 THEN 0.0 ELSE stophits / ntoks END AS stop_ratio
         |  FROM scored),
         |qual AS (
         |  SELECT doc_id, source,
         |    CAST(round(round(length_ok * 0.3 + punct_ok * 0.25 +
         |      (CASE WHEN mwl >= 2.5 AND mwl <= 12.0 THEN 1.0 ELSE 0.4 END) * 0.25 +
         |      (CASE WHEN stop_ratio > 0.05 THEN 1.0 ELSE 0.6 END) * 0.2, 4)
         |      * 10000) AS BIGINT) AS quality
         |  FROM feat),
         |cuts AS (
         |  SELECT source, quantile_cont(quality, 0.5) AS q_cut,
         |    count(*) AS n_total
         |  FROM qual GROUP BY source)
         |SELECT source, count(*) AS n_kept, max(n_total) AS n_total,
         |  r4(max(q_cut) / 10000.0) AS med_q,
         |  r4(sum(quality) / (count(*) * 10000.0)) AS kept_avg_q
         |FROM qual JOIN cuts USING (source)
         |WHERE quality >= q_cut
         |GROUP BY source ORDER BY source""".stripMargin,

    "q74_token_budget" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> x <> '')) AS BIGINT) AS n_tok,
        |    sha256(CAST(doc_id AS VARCHAR) || ':tb:42') AS sk
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tok,
        |    CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY sk, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
        |  FROM t)
        |SELECT doc_id, source, n_tok, cum_tok FROM c
        |WHERE cum_tok <= 500 ORDER BY source, doc_id""".stripMargin,

    // Fractional-epoch replay: pct formula, base copies, the sha-byte
    // fractional cut at floor(frac*256/100), and the copy explode.
    "q178_epoch_repeat" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    30 + (CAST(substr(source, 4) AS INT) * 37) % 300 AS pct,
        |    (strpos('0123456789abcdef', substr(
        |       sha256(CAST(doc_id AS VARCHAR) || ':ep:42'), 1, 1)) - 1) * 16
        |    + (strpos('0123456789abcdef', substr(
        |       sha256(CAST(doc_id AS VARCHAR) || ':ep:42'), 2, 1)) - 1) AS b
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, source,
        |    pct // 100 + CASE WHEN b < (pct % 100) * 256 // 100
        |                      THEN 1 ELSE 0 END AS nc
        |  FROM t)
        |SELECT doc_id, source, CAST(c AS INT) AS copy_idx
        |FROM k, unnest(generate_series(0, nc - 1)) AS u(c)
        |ORDER BY doc_id, copy_idx""".stripMargin,

    // Length-grouped sampler replay: bucket edges, sub-bucket byte,
    // rank window (n_tok DESC, hash, id), batch cut, and pad/waste.
    "q177_length_batches" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> x <> '')) AS INT) AS n_tok,
        |    sha256(CAST(doc_id AS VARCHAR) || ':lb:42') AS sk
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, n_tok, sk,
        |    CAST(CASE WHEN n_tok >= 8 THEN 1 ELSE 0 END
        |       + CASE WHEN n_tok >= 16 THEN 1 ELSE 0 END
        |       + CASE WHEN n_tok >= 32 THEN 1 ELSE 0 END AS INT) AS bucket,
        |    CAST(((strpos('0123456789abcdef', substr(sk, 1, 1)) - 1) * 16
        |        + (strpos('0123456789abcdef', substr(sk, 2, 1)) - 1)) % 4
        |      AS INT) AS sub
        |  FROM t),
        |r AS (
        |  SELECT doc_id, n_tok, bucket, sub,
        |    row_number() OVER (PARTITION BY bucket, sub
        |      ORDER BY n_tok DESC, sk, doc_id) - 1 AS rn
        |  FROM b),
        |bb AS (
        |  SELECT doc_id, n_tok, bucket, sub,
        |    CAST(rn // 8 AS INT) AS batch_idx, CAST(rn % 8 AS INT) AS slot
        |  FROM r),
        |p AS (
        |  SELECT doc_id, n_tok, bucket, sub, batch_idx, slot,
        |    CAST(max(n_tok) OVER (PARTITION BY bucket, sub, batch_idx)
        |      AS INT) AS pad_to
        |  FROM bb)
        |SELECT doc_id, n_tok, bucket, sub, batch_idx, slot, pad_to,
        |  CAST(pad_to - n_tok AS INT) AS waste
        |FROM p ORDER BY doc_id""".stripMargin,

    // FIM replay: the four sha-byte draws (cut points, transform rate,
    // PSM/SPM coin), the token-slice boundaries, and concat_ws's
    // null-skip over empty segments all re-derived in DuckDB.
    "q176_fim_transform" -> {
      val alpha = "'0123456789abcdef'"
      def byteAt(k: Int): String =
        s"(strpos($alpha, substr(hx, ${2 * k + 1}, 1)) - 1) * 16 " +
          s"+ (strpos($alpha, substr(hx, ${2 * k + 2}, 1)) - 1)"
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |    list_filter(string_split_regex(trim(regexp_replace(
         |      lower(text), '\\s+', ' ', 'g')), '\\s+'), x -> x <> '') AS s,
         |    sha256('fim:42:' || CAST(doc_id AS VARCHAR)) AS hx
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, text, s, len(s) AS n,
         |    ${byteAt(0)} AS b0, ${byteAt(1)} AS b1,
         |    ${byteAt(2)} AS b2, ${byteAt(3)} AS b3
         |  FROM base),
         |cut AS (
         |  SELECT doc_id, text, s, n,
         |    (b0 % (n + 1)) AS c1,
         |    (b0 % (n + 1)) + (b1 % (n - (b0 % (n + 1)) + 1)) AS c2,
         |    (b2 % 100 < 50) AND n > 0 AS dofim,
         |    b3 % 2 = 1 AS spm
         |  FROM b),
         |seg AS (
         |  SELECT doc_id, text, n, c1, c2, dofim, spm,
         |    nullif(array_to_string(s[1:c1], ' '), '') AS pre,
         |    nullif(array_to_string(s[c1+1:c2], ' '), '') AS mid,
         |    nullif(array_to_string(s[c2+1:n], ' '), '') AS suf
         |  FROM cut)
         |SELECT doc_id,
         |  CASE WHEN NOT dofim THEN text
         |       WHEN spm THEN concat_ws(' ', '<SUF>', suf, '<PRE>', pre,
         |                               '<MID>', mid)
         |       ELSE concat_ws(' ', '<PRE>', pre, '<SUF>', suf,
         |                      '<MID>', mid) END AS fim_text,
         |  CASE WHEN NOT dofim THEN 'none'
         |       WHEN spm THEN 'spm' ELSE 'psm' END AS mode,
         |  CAST(CASE WHEN dofim THEN c1 ELSE 0 END AS INT) AS n_pre,
         |  CAST(CASE WHEN dofim THEN c2 - c1 ELSE 0 END AS INT) AS n_mid,
         |  CAST(CASE WHEN dofim THEN n - c2 ELSE 0 END AS INT) AS n_suf
         |FROM seg ORDER BY doc_id""".stripMargin
    },

    // The same greedy first-fit recurrence as packSequences, stepped
    // row-by-row per shard (recursion depth = max docs per shard).
    "q75_seq_pack" ->
      (packRecurrenceCte + """
        |SELECT doc_id, shard, seq_id, tok_start, n_tok FROM pack
        |ORDER BY doc_id""".stripMargin),

    // Boundary-index replay: the q75 recurrence grouped per sequence —
    // ordered start lists, member ids, fill, and the exact /512 scaling.
    "q179_pack_boundaries" ->
      (packRecurrenceCte + """
        |SELECT shard, seq_id,
        |  array_to_string(list(CAST(tok_start AS VARCHAR)
        |    ORDER BY tok_start, doc_id), ',') AS boundaries_csv,
        |  array_to_string(list(CAST(doc_id AS VARCHAR)
        |    ORDER BY tok_start, doc_id), ',') AS doc_ids_csv,
        |  CAST(sum(n_tok) AS BIGINT) AS fill,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS DOUBLE) / 512 AS fill_frac
        |FROM pack GROUP BY shard, seq_id
        |ORDER BY shard, seq_id""".stripMargin),

    // Same pair-scoring technique as the q26 oracle; top-1 per query,
    // label agreement aggregated per label.
    "q73_knn_labels" ->
      """WITH v AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings),
        |knn AS (
        |  SELECT q.vec_id, q.label AS ql, c.label AS nl,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.e, c.e) DESC, c.vec_id) AS rk
        |  FROM v q JOIN v c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id % 4 = 0)
        |SELECT ql AS label, count(*) AS n,
        |  count(*) FILTER (WHERE ql = nl) AS n_agree,
        |  r4(CAST(count(*) FILTER (WHERE ql = nl) AS DOUBLE) / count(*))
        |    AS agree_rate
        |FROM knn WHERE rk = 1 GROUP BY ql ORDER BY ql""".stripMargin,

    // q61's CTE family, anti-joined: train docs sharing no 3-gram with
    // the test split. The Bloom prefilter is invisible to the oracle by
    // construction (no false negatives; verify join strips the rest).
    "q76_bloom_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, source, lang,
        |    CASE WHEN substring(sha256(CAST(doc_id AS VARCHAR) || ':split:42'), 1, 2) < 'e6' THEN 'train'
        |         WHEN substring(sha256(CAST(doc_id AS VARCHAR) || ':split:42'), 1, 2) < 'f3' THEN 'val'
        |         ELSE 'test' END AS split,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |        x -> x <> '') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, source, lang, split,
        |    list_distinct(list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS g
        |  FROM toks),
        |bench AS (SELECT DISTINCT unnest(g) AS bg FROM grams WHERE split = 'test'),
        |dirty AS (
        |  SELECT DISTINCT tr.doc_id
        |  FROM (SELECT doc_id, unnest(g) AS tg FROM grams WHERE split = 'train') tr
        |  JOIN bench b ON tr.tg = b.bg)
        |SELECT g.doc_id, g.source, g.lang FROM grams g
        |WHERE g.split = 'train' AND g.doc_id NOT IN (SELECT doc_id FROM dirty)
        |ORDER BY g.doc_id""".stripMargin,

    // Compaction + versioning replayed with lag/lead windows; every
    // output column is integer or passthrough.
    "q77_scd_history" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events),
        |c AS (
        |  SELECT user_id, event_id, us, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      AS prev
        |  FROM e),
        |k AS (
        |  SELECT user_id, event_id, us, event_type FROM c
        |  -- IS DISTINCT FROM mirrors the operator's null-safe <=> compare:
        |  -- value->null and null->value transitions are real changes
        |  WHERE prev IS DISTINCT FROM event_type),
        |v AS (
        |  SELECT user_id, event_type, row_number() OVER w AS version,
        |    us AS effective_from, lead(us) OVER w AS effective_to
        |  FROM k WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT user_id, version, event_type, effective_from, effective_to,
        |  (effective_to IS NULL) AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin,

    "q78_cdc_latest" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type, value
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_id, us, event_type, value, row_number()
        |    OVER (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
        |  FROM e)
        |SELECT user_id, event_id, us, event_type, value FROM r WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "q79_profile" ->
      """WITH li AS (
        |  SELECT *, nullif(l_returnflag, 'N') AS flag_nn FROM lineitem)
        |SELECT * FROM (
        |  SELECT 'l_quantity' AS col_name, count(*) AS n,
        |    count(*) - count(l_quantity) AS n_null,
        |    count(DISTINCT l_quantity) AS n_distinct,
        |    CAST(min(l_quantity) AS DOUBLE) AS min_num,
        |    CAST(max(l_quantity) AS DOUBLE) AS max_num,
        |    CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |  FROM li
        |  UNION ALL
        |  SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
        |    count(DISTINCT l_extendedprice),
        |    CAST(min(l_extendedprice) AS DOUBLE), CAST(max(l_extendedprice) AS DOUBLE),
        |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        |  FROM li
        |  UNION ALL
        |  SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
        |    count(DISTINCT l_returnflag), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |    min(l_returnflag), max(l_returnflag)
        |  FROM li
        |  UNION ALL
        |  SELECT 'flag_nn', count(*), count(*) - count(flag_nn),
        |    count(DISTINCT flag_nn), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |    min(flag_nn), max(flag_nn)
        |  FROM li)
        |ORDER BY col_name""".stripMargin,

    // q65's exact-Jaccard transitive closure + q72's scaled-long quality,
    // composed: one winner per cluster by (quality DESC, doc_id ASC),
    // singletons (docs outside every cluster) survive as their own label.
    "q80_dedup_survivors" ->
      s"""WITH RECURSIVE docs AS (
         |  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id,
         |    list_distinct([substr(t, i, 5) for i in generate_series(1, length(t)-4)]) AS s
         |  FROM docs WHERE length(t) >= 5),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a JOIN sh b
         |    ON a.doc_id < b.doc_id
         |   AND least(len(a.s), len(b.s))::DOUBLE >= 0.8 * greatest(len(a.s), len(b.s))
         |  WHERE len(list_intersect(a.s, b.s))::DOUBLE
         |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8),
         |edges AS (
         |  SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |labels AS (
         |  SELECT a AS doc_id, least(a, min(b)) AS label FROM reach GROUP BY a),
         |toks AS (
         |  SELECT doc_id,
         |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt,
         |    list_filter(string_split_regex(
         |      trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+'),
         |      x -> x <> '') AS tk
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id,
         |    CAST(len(nt) AS DOUBLE) AS nchars,
         |    CAST(len(tk) AS DOUBLE) AS ntoks,
         |    CAST(len(regexp_extract_all(nt, '[[:punct:]]')) AS DOUBLE) AS punct,
         |    CAST(len(list_filter(tk, t -> list_contains($allStopsList, t))) AS DOUBLE) AS stophits
         |  FROM toks),
         |feat AS (
         |  SELECT doc_id,
         |    CASE WHEN nchars >= 50 AND nchars <= 20000 THEN 1.0 ELSE 0.3 END AS length_ok,
         |    CASE WHEN nchars = 0 THEN 0.0
         |         WHEN punct / nchars < 0.2 THEN 1.0 ELSE 0.4 END AS punct_ok,
         |    CASE WHEN ntoks = 0 THEN 0.0
         |         ELSE (nchars - (ntoks - 1)) / ntoks END AS mwl,
         |    CASE WHEN ntoks = 0 THEN 0.0 ELSE stophits / ntoks END AS stop_ratio
         |  FROM scored),
         |qual AS (
         |  SELECT doc_id,
         |    CAST(round(round(length_ok * 0.3 + punct_ok * 0.25 +
         |      (CASE WHEN mwl >= 2.5 AND mwl <= 12.0 THEN 1.0 ELSE 0.4 END) * 0.25 +
         |      (CASE WHEN stop_ratio > 0.05 THEN 1.0 ELSE 0.6 END) * 0.2, 4)
         |      * 10000) AS BIGINT) AS quality
         |  FROM feat),
         |lab AS (
         |  SELECT q.doc_id, coalesce(l.label, q.doc_id) AS cluster_label, q.quality
         |  FROM qual q LEFT JOIN labels l USING (doc_id)),
         |win AS (
         |  SELECT doc_id, cluster_label FROM (
         |    SELECT doc_id, cluster_label, row_number() OVER (
         |      PARTITION BY cluster_label ORDER BY quality DESC, doc_id) AS rk
         |    FROM lab) WHERE rk = 1)
         |SELECT w.doc_id, w.cluster_label, d.source
         |FROM win w JOIN documents d USING (doc_id)
         |ORDER BY w.doc_id""".stripMargin,

    "q81_token_histogram" ->
      """WITH t AS (
        |  SELECT source, CAST(len(list_filter(
        |    string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT)
        |    AS n_tok
        |  FROM documents),
        |g AS (
        |  SELECT source, (n_tok // 100) * 100 AS bin_lo, count(*) AS n_docs
        |  FROM t GROUP BY 1, 2)
        |SELECT source, bin_lo, n_docs,
        |  r4(n_docs / sum(n_docs) OVER (PARTITION BY source)) AS share
        |FROM g ORDER BY source, bin_lo""".stripMargin,

    // The identical strip chain: script block, then tags → space, then
    // entity replaces (&amp; last), then whitespace collapse.
    "q82_strip_markup" ->
      """WITH raw AS (
        |  SELECT doc_id, '<p id="1">' || text ||
        |    '</p><div>Q&amp;A &lt;tags&gt; &quot;quoted&quot;</div>' ||
        |    '<script type="text/js">var x = 1 < 2;</script><br/>end' AS r
        |  FROM documents),
        |steps AS (
        |  SELECT doc_id, replace(replace(replace(replace(replace(replace(
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(r, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |        '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |      '(?s)<[^>]*>', ' ', 'g'),
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |    '&nbsp;', ' '), '&amp;', '&') AS u
        |  FROM raw)
        |SELECT doc_id, trim(regexp_replace(u, '\s+', ' ', 'g')) AS clean
        |FROM steps ORDER BY doc_id""".stripMargin,

    "q86_window_dedup" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        |  FROM events),
        |l AS (
        |  SELECT user_id, event_id, us, event_type,
        |    lag(us) OVER (PARTITION BY user_id, event_type
        |      ORDER BY us, event_id) AS prev
        |  FROM e)
        |SELECT user_id, event_id, us, event_type FROM l
        |WHERE prev IS NULL OR us - prev > 600000000
        |ORDER BY event_id""".stripMargin,

    "q87_rolling_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events)
        |SELECT user_id, event_id, us,
        |  count(*) OVER w AS n_30m,
        |  r4(sum(value) OVER w) AS sum_30m
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    // Explicit window replay (see q32): forward ties pin to
    // (ts ASC, event_id ASC), the operator's smallest-payload rule.
    "q84_asof_forward" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
        |p AS (
        |  SELECT event_id AS pid, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT e.event_id, e.user_id, p.pid,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY p.ts ASC, p.pid ASC) AS rn
        |  FROM e LEFT JOIN p ON e.user_id = p.user_id AND p.ts >= e.ts)
        |SELECT event_id, user_id, pid AS purchase_id
        |FROM m WHERE rn = 1 ORDER BY event_id""".stripMargin,

    // Two directional probes resolved by exact microsecond distance;
    // ties prefer backward (matching AsOfJoin.nearest), and each
    // direction pins tied right rows to min event_id like q32/q84.
    "q85_asof_nearest" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
        |p AS (
        |  SELECT event_id AS pid, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |b AS (
        |  SELECT event_id, user_id, ts, b_pid, b_ts FROM (
        |    SELECT e.event_id, e.user_id, e.ts, p.pid AS b_pid, p.ts AS b_ts,
        |      row_number() OVER (PARTITION BY e.event_id
        |        ORDER BY p.ts DESC, p.pid ASC) AS rn
        |    FROM e LEFT JOIN p ON e.user_id = p.user_id AND p.ts <= e.ts)
        |  WHERE rn = 1),
        |f AS (
        |  SELECT event_id, f_pid, f_ts FROM (
        |    SELECT e.event_id, p.pid AS f_pid, p.ts AS f_ts,
        |      row_number() OVER (PARTITION BY e.event_id
        |        ORDER BY p.ts ASC, p.pid ASC) AS rn
        |    FROM e LEFT JOIN p ON e.user_id = p.user_id AND p.ts >= e.ts)
        |  WHERE rn = 1)
        |SELECT b.event_id, b.user_id,
        |  CASE WHEN b_pid IS NULL THEN f_pid
        |       WHEN f_pid IS NULL THEN b_pid
        |       WHEN epoch_us(b.ts) - epoch_us(b_ts)
        |         <= epoch_us(f_ts) - epoch_us(b.ts) THEN b_pid
        |       ELSE f_pid END AS purchase_id
        |FROM b JOIN f USING (event_id)
        |ORDER BY b.event_id""".stripMargin,

    // The FULL SimHash pipeline replayed in SQL: per-token 64-bit hash =
    // first 16 hex chars of sha256 (bit b = bit (b%4) of hex digit
    // (15 - b/4)), +-1 voting per bit, two-halves assembly into a signed
    // 64-bit value, 4x16-bit pigeonhole bands for candidate generation,
    // exact bit_count(xor) verification. Pure integer arithmetic end to
    // end — the operator's exact row set at any maxHamming.
    "q28_simhash_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS tok
        |  FROM documents),
        |th AS (SELECT doc_id, substr(sha256(tok), 1, 16) AS hx FROM toks),
        |bits AS (
        |  SELECT doc_id, g.b AS b,
        |    2 * sum(((instr('0123456789abcdef',
        |        substr(hx, CAST(16 - g.b // 4 AS INTEGER), 1)) - 1)
        |      >> CAST(g.b % 4 AS INTEGER)) & 1) - count(*) AS tally
        |  FROM th, generate_series(0, 63) AS g(b)
        |  GROUP BY doc_id, g.b),
        |halves AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN tally > 0 AND b < 32
        |             THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS lo,
        |    sum(CASE WHEN tally > 0 AND b >= 32
        |             THEN (CAST(1 AS BIGINT) << CAST(b - 32 AS INTEGER)) ELSE 0 END) AS hi
        |  FROM bits GROUP BY doc_id),
        |sh0 AS (
        |  SELECT doc_id,
        |    hi * CAST(4294967296 AS HUGEINT) + lo AS hu,
        |    CAST(CASE WHEN hi >= 2147483648
        |         THEN hi * CAST(4294967296 AS HUGEINT) + lo - CAST('18446744073709551616' AS HUGEINT)
        |         ELSE hi * CAST(4294967296 AS HUGEINT) + lo END AS BIGINT) AS h
        |  FROM halves),
        |sh AS (
        |  -- token-less docs never reach toks but DO get simhash 0 from the
        |  -- operator (empty tally), banding them together — mirror that
        |  SELECT d.doc_id, coalesce(s.hu, CAST(0 AS HUGEINT)) AS hu,
        |    coalesce(s.h, 0) AS h
        |  FROM documents d LEFT JOIN sh0 s USING (doc_id)),
        |banded AS (
        |  SELECT doc_id, h, g.i AS band_idx,
        |    CAST((hu // (CASE g.i WHEN 0 THEN CAST(1 AS HUGEINT)
        |                          WHEN 1 THEN CAST(65536 AS HUGEINT)
        |                          WHEN 2 THEN CAST(4294967296 AS HUGEINT)
        |                          ELSE CAST(281474976710656 AS HUGEINT) END))
        |      % 65536 AS BIGINT) AS band
        |  FROM sh, generate_series(0, 3) AS g(i)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |    a.h AS ha, b.h AS hb
        |  FROM banded a JOIN banded b
        |    ON a.band_idx = b.band_idx AND a.band = b.band
        |   AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 8
        |ORDER BY id_a, id_b""".stripMargin,

    // The FULL IVF index replayed in SQL: sha256-hex centroid sample
    // (identical ordering in any engine), top-nprobe probe cells per
    // vector, rank-1 assignment, candidate join, exact rescoring, top-k.
    // Possible only because every stage of ivfTopK is deterministic —
    // cosine rank gaps on this corpus are ~1e-2, far beyond the engines'
    // summation-order ulps (the q26/q73 precedent).
    "q46_ivf_topk" ->
      """WITH v AS (
        |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
        |  FROM embeddings),
        |cent AS (
        |  SELECT id AS cell_id, vec AS cv FROM v
        |  ORDER BY sha256(CAST(id AS VARCHAR) || ':ivf'), id LIMIT 16),
        |scored AS (
        |  SELECT v.id, c.cell_id,
        |    list_cosine_similarity(v.vec, c.cv) AS ccos,
        |    row_number() OVER (PARTITION BY v.id
        |      ORDER BY list_cosine_similarity(v.vec, c.cv) DESC, c.cell_id)
        |      AS crank
        |  FROM v CROSS JOIN cent c),
        |probed AS (SELECT id, cell_id FROM scored WHERE crank <= 2),
        |assigned AS (SELECT id AS neighbor_id, cell_id FROM scored WHERE crank = 1),
        |cand AS (
        |  SELECT DISTINCT p.id AS query_id, a.neighbor_id
        |  FROM probed p JOIN assigned a USING (cell_id)
        |  WHERE p.id <> a.neighbor_id),
        |resc AS (
        |  SELECT query_id, neighbor_id,
        |    list_cosine_similarity(q.vec, n.vec) AS cos
        |  FROM cand
        |  JOIN v q ON q.id = query_id
        |  JOIN v n ON n.id = neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cos, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM resc)
        |SELECT query_id, neighbor_id, r6(cos) AS cos,
        |  CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin,

    "q96_rolling_active" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS dt, user_id FROM events),
        |days AS (SELECT DISTINCT dt FROM du)
        |SELECT strftime(d.dt, '%Y-%m-%d') AS day,
        |  count(DISTINCT a.user_id) AS active_7d
        |FROM days d JOIN du a
        |  ON date_diff('day', a.dt, d.dt) BETWEEN 0 AND 6
        |GROUP BY 1 ORDER BY day""".stripMargin,

    "q97_dense_rank" ->
      """WITH r AS (
        |  SELECT l_returnflag,
        |    rank() OVER w AS rk, dense_rank() OVER w AS drk
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity DESC))
        |SELECT l_returnflag, max(rk) AS max_rank,
        |  max(drk) AS max_dense_rank, count(*) AS n
        |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // Sub-bucket assignment replays with pure string ops (strpos over the
    // hex alphabet) — no hex-to-int builtin needed in either engine. The
    // window sum is CAST BIGINT: DuckDB types it HUGEINT, which lands in
    // pandas as float64 and breaks the driver's value hash (the q74
    // round-4 lesson).
    "q98_token_budget_buckets" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> x <> '')) AS BIGINT) AS n_tok,
        |    sha256(CAST(doc_id AS VARCHAR) || ':tb:42') AS sk
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, source, n_tok, sk,
        |    CAST(((strpos('0123456789abcdef', substr(sk, 1, 1)) - 1) * 16
        |        + (strpos('0123456789abcdef', substr(sk, 2, 1)) - 1)) % 8
        |      AS INT) AS sub_bucket
        |  FROM t),
        |c AS (
        |  SELECT doc_id, source, sub_bucket, n_tok,
        |    CAST(sum(n_tok) OVER (PARTITION BY source, sub_bucket
        |      ORDER BY sk, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS cum_tok
        |  FROM b)
        |SELECT doc_id, source, sub_bucket, n_tok, cum_tok FROM c
        |WHERE cum_tok <= 62 + CASE WHEN sub_bucket < 4 THEN 1 ELSE 0 END
        |ORDER BY source, sub_bucket, doc_id""".stripMargin,

    "q99_zorder_key" ->
      s"""SELECT l_orderkey, l_linenumber, l_quantity,
         |  $zOrderOracleExpr AS zkey
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q94_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (
        |  SELECT user_id, min(us) AS t_view FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(us) AS t_click
        |  FROM e JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND us >= t_view GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(us) AS t_purchase
        |  FROM e JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND us >= t_click GROUP BY e.user_id)
        |SELECT '1_view' AS stage, count(*) AS n FROM v
        |UNION ALL SELECT '2_click', count(*) FROM c
        |UNION ALL SELECT '3_purchase', count(*) FROM p
        |ORDER BY stage""".stripMargin,

    "q95_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cohort_day FROM e GROUP BY user_id),
        |o AS (
        |  SELECT e.user_id, cohort_day,
        |    date_diff('day', cohort_day, d) AS day_offset
        |  FROM e JOIN f USING (user_id))
        |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
        |  CAST(day_offset AS BIGINT) AS day_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM o WHERE day_offset IN (0, 1, 7, 14, 28)
        |GROUP BY 1, 2
        |ORDER BY cohort_day, day_offset""".stripMargin,

    "q93_rank_distribution" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(ntile(10) OVER w AS BIGINT) AS decile,
        |  r4(percent_rank() OVER w) AS pct_rank,
        |  r4(cume_dist() OVER w) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q92_left_join" ->
      """SELECT c_custkey, c_mktsegment,
        |  count(o_totalprice) AS n_orders,
        |  r2(coalesce(sum(o_totalprice), 0.0)) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_mktsegment
        |ORDER BY c_custkey""".stripMargin,

    "q91_snapshot_diff" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
        |n AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderstatus
        |  FROM o WHERE o_orderkey % 7 <> 0
        |  UNION ALL
        |  SELECT -o_orderkey, o_totalprice, o_orderstatus FROM o
        |  WHERE o_orderkey % 11 = 0),
        |j AS (
        |  SELECT CASE WHEN o.o_orderkey IS NULL THEN 'inserted'
        |              WHEN n.o_orderkey IS NULL THEN 'deleted'
        |              WHEN o.o_totalprice = n.o_totalprice
        |               AND o.o_orderstatus = n.o_orderstatus THEN 'unchanged'
        |              ELSE 'changed' END AS change_type
        |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
        |SELECT change_type, count(*) AS n FROM j
        |GROUP BY change_type ORDER BY change_type""".stripMargin,

    "q90_strided_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(len(list_filter(
        |    string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT)
        |    AS n_tok
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, n_tok,
        |    greatest(0, CAST(ceil((n_tok - 32)::DOUBLE / 16) AS BIGINT))
        |      AS last_idx
        |  FROM t WHERE n_tok > 0),
        |c AS (
        |  SELECT doc_id, n_tok,
        |    unnest(generate_series(0, last_idx)) AS chunk_idx
        |  FROM d)
        |SELECT doc_id, chunk_idx, chunk_idx * 16 AS tok_start,
        |  least(chunk_idx * 16 + 32, n_tok) AS tok_end
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "q88_source_entropy" ->
      """WITH toks AS (
        |  SELECT source, unnest(list_filter(
        |    string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS tok
        |  FROM documents),
        |tf AS (SELECT source, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        |g AS (
        |  SELECT source, CAST(sum(tf) AS BIGINT) AS n_tok,
        |    count(*) AS n_vocab,
        |    sum(tf * ln(tf::DOUBLE)) AS s
        |  FROM tf GROUP BY source)
        |SELECT source, n_tok, n_vocab,
        |  r4(ln(n_tok::DOUBLE) - s / n_tok) AS entropy
        |FROM g ORDER BY source""".stripMargin,

    "q89_vocab_overlap" ->
      """WITH raw AS (
        |  SELECT source, unnest(list_filter(
        |    string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS tok
        |  FROM documents),
        |toks AS (SELECT DISTINCT source, tok FROM raw),
        |sizes AS (SELECT source, count(*) AS n FROM toks GROUP BY source),
        |common AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    count(*) AS n_common
        |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, n_common,
        |  r4(n_common / (sa.n + sb.n - n_common)) AS jaccard
        |FROM common
        |JOIN sizes sa ON sa.source = source_a
        |JOIN sizes sb ON sb.source = source_b
        |ORDER BY source_a, source_b""".stripMargin,

    "q83_stratified_sample" ->
      """WITH r AS (
        |  SELECT doc_id, source, lang, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY sha256(CAST(doc_id AS VARCHAR) || ':strat:42'), doc_id)
        |    AS rn
        |  FROM documents)
        |SELECT doc_id, source, lang FROM r WHERE rn <= 20
        |ORDER BY doc_id""".stripMargin,

    // q27's brute-force exact-Jaccard replay, restricted to batch x
    // corpus cross pairs (batch = doc_id % 10 < 2). The size-ratio prune
    // is sound: j >= 0.8 forces |smaller| >= 0.8 * |larger|.
    "q100_incremental_pairs" ->
      """WITH docs AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([substr(t, i, 5) for i in generate_series(1, length(t)-4)]) AS s
        |  FROM docs WHERE length(t) >= 5),
        |pairs AS (
        |  SELECT n.doc_id AS id_new, c.doc_id AS id_corpus,
        |    len(list_intersect(n.s, c.s))::DOUBLE
        |      / (len(n.s) + len(c.s) - len(list_intersect(n.s, c.s))) AS j
        |  FROM sh n JOIN sh c
        |    ON n.doc_id % 10 < 2 AND c.doc_id % 10 >= 2
        |   AND least(len(n.s), len(c.s))::DOUBLE >= 0.8 * greatest(len(n.s), len(c.s)))
        |SELECT id_new, id_corpus, r4(j) AS jaccard FROM pairs
        |WHERE j >= 0.8 ORDER BY id_new, id_corpus""".stripMargin,

    // The banded probe path must produce exactly q100's pair set — the
    // oracle is q100's brute-force exact-Jaccard replay, verbatim.
    "q104_incremental_banded" ->
      """WITH docs AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([substr(t, i, 5) for i in generate_series(1, length(t)-4)]) AS s
        |  FROM docs WHERE length(t) >= 5),
        |pairs AS (
        |  SELECT n.doc_id AS id_new, c.doc_id AS id_corpus,
        |    len(list_intersect(n.s, c.s))::DOUBLE
        |      / (len(n.s) + len(c.s) - len(list_intersect(n.s, c.s))) AS j
        |  FROM sh n JOIN sh c
        |    ON n.doc_id % 10 < 2 AND c.doc_id % 10 >= 2
        |   AND least(len(n.s), len(c.s))::DOUBLE >= 0.8 * greatest(len(n.s), len(c.s)))
        |SELECT id_new, id_corpus, r4(j) AS jaccard FROM pairs
        |WHERE j >= 0.8 ORDER BY id_new, id_corpus""".stripMargin,

    // Survivors: batch docs with no >= 0.8 corpus match. Docs shorter
    // than one shingle are absent from sh, match nothing, and survive.
    "q101_incremental_dedup" ->
      """WITH docs AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([substr(t, i, 5) for i in generate_series(1, length(t)-4)]) AS s
        |  FROM docs WHERE length(t) >= 5),
        |matched AS (
        |  SELECT DISTINCT n.doc_id
        |  FROM sh n JOIN sh c
        |    ON n.doc_id % 10 < 2 AND c.doc_id % 10 >= 2
        |   AND least(len(n.s), len(c.s))::DOUBLE >= 0.8 * greatest(len(n.s), len(c.s))
        |   AND len(list_intersect(n.s, c.s))::DOUBLE
        |      / (len(n.s) + len(c.s) - len(list_intersect(n.s, c.s))) >= 0.8)
        |SELECT d.doc_id, d.source, d.n_chars FROM documents d
        |WHERE d.doc_id % 10 < 2
        |  AND d.doc_id NOT IN (SELECT doc_id FROM matched)
        |ORDER BY d.doc_id""".stripMargin,

    // Per-source floor(scale*sqrt(count)) targets, admission in the same
    // (sha256, id) order q83 replays; sqrt/floor identical in both engines.
    "q103_temperature_mixture" ->
      """WITH tgt AS (
        |  SELECT source,
        |    CAST(floor(3.0 * sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS t
        |  FROM documents GROUP BY source),
        |r AS (
        |  SELECT doc_id, source, lang, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY sha256(CAST(doc_id AS VARCHAR) || ':temp:42'), doc_id)
        |    AS rn
        |  FROM documents)
        |SELECT r.doc_id, r.source, r.lang FROM r JOIN tgt USING (source)
        |WHERE r.rn <= tgt.t ORDER BY r.doc_id""".stripMargin,

    // q103's target arithmetic + q98's hex-digit sub-bucket replay: the
    // per-source target floor(3*sqrt(n)) splits as floor(t/8) per bucket
    // with buckets 0..(t%8 - 1) taking one extra; admission is in-bucket
    // (sha256, id) order. floor/sqrt/double-division are IEEE-identical
    // in both engines, so the admitted set matches bit-for-bit.
    "q105_temperature_buckets" ->
      """WITH tgt AS (
        |  SELECT source,
        |    CAST(floor(3.0 * sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS t
        |  FROM documents GROUP BY source),
        |b AS (
        |  SELECT doc_id, source, lang,
        |    sha256(CAST(doc_id AS VARCHAR) || ':temp:42') AS sk
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, lang, sk,
        |    ((strpos('0123456789abcdef', substr(sk, 1, 1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substr(sk, 2, 1)) - 1)) % 8
        |      AS sub_bucket
        |  FROM b),
        |r AS (
        |  SELECT doc_id, source, lang, sub_bucket, row_number() OVER (
        |    PARTITION BY source, sub_bucket ORDER BY sk, doc_id) AS rn
        |  FROM c)
        |SELECT r.doc_id, r.source, r.lang FROM r JOIN tgt USING (source)
        |WHERE r.rn <= CAST(floor(t / 8.0) AS BIGINT)
        |  + CASE WHEN sub_bucket < t % 8 THEN 1 ELSE 0 END
        |ORDER BY r.doc_id""".stripMargin,

    // The FULL random-hyperplane LSH index replayed in SQL (q46's
    // treatment for the second ANN tier): sha-derived integer planes,
    // fixed-point sign bits, band collision candidates, exact rescore,
    // top-k. Signatures are integer-exact in both engines; rescored-cos
    // rank gaps (min 1.5e-5 within top-4 at sf0.01) dwarf summation ulps.
    "q106_lsh_topk" ->
      s"""WITH v AS (
         |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
         |  FROM embeddings),
         |$lshBandCte,
         |cand AS (
         |  SELECT DISTINCT a.id AS query_id, b.id AS neighbor_id
         |  FROM banded a JOIN banded b
         |    ON a.band_idx = b.band_idx AND a.band = b.band
         |  WHERE a.id <> b.id),
         |resc AS (
         |  SELECT query_id, neighbor_id,
         |    list_cosine_similarity(q.vec, n.vec) AS cos
         |  FROM cand
         |  JOIN v q ON q.id = query_id
         |  JOIN v n ON n.id = neighbor_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM resc)
         |SELECT query_id, neighbor_id, r6(cos) AS cos,
         |  CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    // Near-dup pairs over the planted corpus: the +0.001-on-coord-0
    // double perturbation replays exactly (IEEE multiply/add), the band
    // structure replays exactly (integer arithmetic), and the 0.999
    // threshold sits three decades from both populations (planted cos
    // ~ 1-1e-7, natural max 0.51) — no knife-edge anywhere.
    "q107_embedding_neardup" ->
      s"""WITH v0 AS (
         |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
         |  FROM embeddings),
         |v AS (
         |  SELECT id, vec FROM v0
         |  UNION ALL
         |  SELECT id + 1000000,
         |    [CASE WHEN i = 1 THEN vec[i] + 0.001 ELSE vec[i] END
         |     for i in generate_series(1, 64)]
         |  FROM v0),
         |$lshBandCte,
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band_idx = b.band_idx AND a.band = b.band
         |  WHERE a.id < b.id),
         |resc AS (
         |  SELECT id_a, id_b, list_cosine_similarity(x.vec, y.vec) AS cos
         |  FROM cand JOIN v x ON x.id = id_a JOIN v y ON y.id = id_b)
         |SELECT id_a, id_b, r6(cos) AS cos FROM resc
         |WHERE cos >= 0.999 ORDER BY id_a, id_b""".stripMargin,

    "q216_embedding_decontam" ->
      s"""WITH v0 AS (
         |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
         |  FROM embeddings),
         |e0 AS (
         |  SELECT id + 1000000 AS id,
         |    [CASE WHEN i = 1 THEN vec[i] + 0.001 ELSE vec[i] END
         |     for i in generate_series(1, 64)] AS vec
         |  FROM v0 WHERE id % 11 = 0),
         |v AS (
         |  SELECT id, vec FROM v0
         |  UNION ALL
         |  SELECT id, vec FROM e0),
         |$lshBandCte,
         |cand AS (
         |  SELECT DISTINCT a.id AS doc_id, b.id AS eval_id
         |  FROM banded a JOIN banded b
         |    ON a.band_idx = b.band_idx AND a.band = b.band
         |  WHERE a.id < 1000000 AND b.id >= 1000000),
         |resc AS (
         |  SELECT doc_id, eval_id,
         |    list_cosine_similarity(x.vec, y.vec) AS cos
         |  FROM cand JOIN v x ON x.id = doc_id JOIN v y ON y.id = eval_id)
         |SELECT doc_id, count(*) AS n_eval_hits, r6(max(cos)) AS max_cos,
         |  min(eval_id) AS first_eval_id
         |FROM resc WHERE cos >= 0.999
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Standing-corpus probe, embedding modality: the band-table path must
    // produce exactly the pairs the replayed band structure produces over
    // (corpus UNION planted batch) restricted to cross pairs — band
    // membership is integer arithmetic end to end, so the materialized
    // table adds nothing the oracle can't recompute.
    "q108_incremental_embdup" ->
      s"""WITH c AS (
         |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
         |  FROM embeddings),
         |nb AS (
         |  SELECT id + 1000000 AS id,
         |    [CASE WHEN i = 1 THEN vec[i] + 0.001 ELSE vec[i] END
         |     for i in generate_series(1, 64)] AS vec
         |  FROM c WHERE id % 10 = 0),
         |v AS (SELECT id, vec FROM c UNION ALL SELECT id, vec FROM nb),
         |$lshBandCte,
         |cand AS (
         |  SELECT DISTINCT a.id AS id_new, b.id AS id_corpus
         |  FROM banded a JOIN banded b
         |    ON a.band_idx = b.band_idx AND a.band = b.band
         |  WHERE a.id >= 1000000 AND b.id < 1000000),
         |resc AS (
         |  SELECT id_new, id_corpus,
         |    list_cosine_similarity(x.vec, y.vec) AS cos
         |  FROM cand JOIN v x ON x.id = id_new JOIN v y ON y.id = id_corpus)
         |SELECT id_new, id_corpus, r6(cos) AS cos FROM resc
         |WHERE cos >= 0.999 ORDER BY id_new, id_corpus""".stripMargin,

    // Full KMV sketch replay: 48-bit sha256-prefix hash via per-digit
    // strpos arithmetic (every term and sum exactly representable as
    // DOUBLE), distinct hashes, k-th smallest per group, the same
    // (k-1)/v_k estimate. Below-capacity groups fall back to the exact
    // distinct-hash count — in both engines.
    "q102_kmv_distinct" ->
      """WITH hv AS (
        |  SELECT DISTINCT l_returnflag,
        |    list_sum([(strpos('0123456789abcdef', substr(s, i, 1)) - 1)
        |              * pow(16.0, 12 - i) for i in generate_series(1, 12)]) AS h
        |  FROM (SELECT l_returnflag,
        |          sha256(CAST(l_partkey AS VARCHAR)) AS s
        |        FROM lineitem)),
        |r AS (
        |  SELECT l_returnflag, h,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS nd
        |  FROM hv),
        |e AS (
        |  SELECT l_returnflag,
        |    CASE WHEN max(nd) < 256 THEN CAST(max(nd) AS DOUBLE)
        |         ELSE 255.0 / (max(CASE WHEN rn = 256 THEN h END)
        |                       / 281474976710656.0) END AS est
        |  FROM r GROUP BY l_returnflag),
        |x AS (
        |  SELECT l_returnflag,
        |    CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT e.l_returnflag, r4(e.est) AS est_distinct, x.exact_parts
        |FROM e JOIN x USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,

    // Rolling-KMV replay: per-day distinct 48-bit hashes cut to each
    // day's k smallest (the per-day sketch), the 7-day window union of
    // those sketches deduped and re-cut to k (lossless for the union's
    // k-minima — the KMV merge property), then the same estimate
    // arithmetic as q102 in the same operation order.
    "q113_rolling_kmv" ->
      """WITH hv AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS dt,
        |    list_sum([(strpos('0123456789abcdef', substr(s, i, 1)) - 1)
        |              * pow(16.0, 12 - i) for i in generate_series(1, 12)]) AS h
        |  FROM (SELECT ts, sha256(CAST(user_id AS VARCHAR)) AS s
        |        FROM events)),
        |day_k AS (
        |  SELECT dt, h FROM (
        |    SELECT dt, h, row_number() OVER (PARTITION BY dt ORDER BY h) AS rn
        |    FROM hv)
        |  WHERE rn <= 256),
        |merged AS (
        |  SELECT d.dt, a.h
        |  FROM (SELECT DISTINCT dt FROM day_k) d
        |  JOIN day_k a ON date_diff('day', a.dt, d.dt) BETWEEN 0 AND 6
        |  GROUP BY d.dt, a.h),
        |r AS (
        |  SELECT dt, h,
        |    row_number() OVER (PARTITION BY dt ORDER BY h) AS rn,
        |    count(*) OVER (PARTITION BY dt) AS nd
        |  FROM merged),
        |e AS (
        |  SELECT dt,
        |    CASE WHEN max(nd) < 256 THEN CAST(max(nd) AS DOUBLE)
        |         ELSE 255.0 / (max(CASE WHEN rn = 256 THEN h END)
        |                       / 281474976710656.0) END AS est
        |  FROM r GROUP BY dt)
        |SELECT strftime(dt, '%Y-%m-%d') AS day, r4(est) AS active_7d_est
        |FROM e ORDER BY day""".stripMargin,

    // Count-Min replay: bucket = 48-bit sha256-prefix of "d:token" mod
    // width (strpos arithmetic — exact in DOUBLE, cast to BIGINT before
    // the mod), grid = counts per (depth, bucket), estimate = min over
    // depths of the probed bucket's count. All integers.
    "q114_cms_freq" ->
      """WITH toks AS (
        |  SELECT token FROM (
        |    SELECT unnest(string_split_regex(
        |      trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')) AS token
        |    FROM documents)
        |  WHERE token <> ''),
        |grid AS (
        |  SELECT r.d, CAST(list_sum(
        |      [(strpos('0123456789abcdef', substr(
        |          sha256(CAST(r.d AS VARCHAR) || ':' || token), i, 1)) - 1)
        |       * pow(16.0, 12 - i) for i in generate_series(1, 12)])
        |    AS BIGINT) % 1024 AS bucket, count(*) AS cnt
        |  FROM toks, range(4) r(d)
        |  GROUP BY 1, 2),
        |top AS (
        |  SELECT token, count(*) AS exact_cnt FROM toks
        |  GROUP BY token ORDER BY exact_cnt DESC, token LIMIT 15),
        |probed AS (
        |  SELECT t.token, t.exact_cnt, r.d, CAST(list_sum(
        |      [(strpos('0123456789abcdef', substr(
        |          sha256(CAST(r.d AS VARCHAR) || ':' || t.token), i, 1)) - 1)
        |       * pow(16.0, 12 - i) for i in generate_series(1, 12)])
        |    AS BIGINT) % 1024 AS bucket
        |  FROM top t CROSS JOIN range(4) r(d)),
        |est AS (
        |  SELECT p.token, p.exact_cnt,
        |    min(coalesce(g.cnt, 0)) AS est
        |  FROM probed p
        |  LEFT JOIN grid g ON g.d = p.d AND g.bucket = p.bucket
        |  GROUP BY 1, 2)
        |SELECT token, exact_cnt, est, est >= exact_cnt AS never_undershoots
        |FROM est ORDER BY exact_cnt DESC, token""".stripMargin,

    // Bottom-k sample replay: the hash order (48-bit sha256 prefix of
    // the stringified event_id), the rank cut, the interpolated sample
    // quantiles, and the integer rank-error booleans are all
    // deterministic — quantile_cont interpolates with the same formula
    // as Spark's percentile (the q49 equivalence).
    "q115_sample_quantiles" ->
      """WITH ev AS (
        |  SELECT event_type, event_id, value FROM events
        |  WHERE value IS NOT NULL),
        |h AS (
        |  SELECT event_type, event_id, value,
        |    list_sum([(strpos('0123456789abcdef', substr(
        |        sha256(CAST(event_id AS VARCHAR)), i, 1)) - 1)
        |      * pow(16.0, 12 - i) for i in generate_series(1, 12)]) AS hv
        |  FROM ev),
        |samp AS (
        |  SELECT event_type, value FROM (
        |    SELECT event_type, value,
        |      row_number() OVER (PARTITION BY event_type
        |        ORDER BY hv, event_id) AS rn
        |    FROM h)
        |  WHERE rn <= 512),
        |est AS (
        |  SELECT event_type,
        |    r4(quantile_cont(value, 0.5)) AS p50_est,
        |    r4(quantile_cont(value, 0.9)) AS p90_est
        |  FROM samp GROUP BY event_type),
        |chk AS (
        |  SELECT e.event_type, count(*) AS n,
        |    sum(CASE WHEN e.value <= est.p50_est THEN 1 ELSE 0 END) AS c50,
        |    sum(CASE WHEN e.value <= est.p90_est THEN 1 ELSE 0 END) AS c90,
        |    max(est.p50_est) AS p50_est, max(est.p90_est) AS p90_est
        |  FROM ev e JOIN est USING (event_type)
        |  GROUP BY e.event_type)
        |SELECT event_type, n, p50_est, p90_est,
        |  abs(10 * c50 - 5 * n) <= n AS p50_rank_ok,
        |  abs(10 * c90 - 9 * n) <= n AS p90_rank_ok
        |FROM chk ORDER BY event_type""".stripMargin,

    // HyperLogLog full replay: bucket = low 6 hash bits, rank = 43 -
    // bit_length of the remaining 42 bits (bin() length — integer
    // string logic, no floating log), registers = per-bucket max rank,
    // S = sum 2^(43 - reg) in exact fixed point (every pow term and the
    // sum are integers < 2^53, so the double arithmetic never rounds),
    // raw_est = (alpha_64 * m^2) * 2^43 / S with the identical literal
    // fold as the Spark side. merge_ok replays the mergeability proof:
    // elementwise max over per-type registers ≡ direct global registers.
    // Float literals use e-notation (a bare 0.709 parses as DECIMAL in
    // DuckDB and overflows the product).
    "q116_hll_distinct" ->
      """WITH h AS (
        |  SELECT event_type, event_id, CAST(list_sum(
        |      [(strpos('0123456789abcdef', substr(
        |          sha256(CAST(event_id AS VARCHAR)), i, 1)) - 1)
        |       * pow(16.0, 12 - i) for i in generate_series(1, 12)])
        |    AS BIGINT) AS hv
        |  FROM events),
        |r AS (
        |  SELECT event_type, event_id, hv % 64 AS bucket,
        |    CASE WHEN hv // 64 = 0 THEN 43
        |         ELSE 43 - length(bin(hv // 64)) END AS rank
        |  FROM h),
        |regs AS (SELECT event_type, bucket, max(rank) AS reg
        |         FROM r GROUP BY 1, 2),
        |gregs AS (SELECT bucket, max(rank) AS reg FROM r GROUP BY 1),
        |mregs AS (SELECT bucket, max(reg) AS reg FROM regs GROUP BY 1),
        |mok AS (
        |  SELECT count(*) FILTER (WHERE g.reg IS DISTINCT FROM m.reg) = 0
        |    AS merge_ok
        |  FROM gregs g FULL JOIN mregs m USING (bucket)),
        |stats AS (
        |  SELECT event_type, count(*) AS present,
        |    CAST(sum(pow(2.0, 43 - reg)) AS BIGINT) AS s_present
        |  FROM regs GROUP BY 1),
        |ex AS (SELECT event_type, count(DISTINCT event_id) AS exact_cnt
        |       FROM events GROUP BY 1),
        |pertype AS (
        |  SELECT e.event_type, e.exact_cnt, 64 - st.present AS zeros,
        |    st.s_present + CAST(64 - st.present AS BIGINT)
        |      * CAST(8796093022208 AS BIGINT) AS s
        |  FROM ex e JOIN stats st USING (event_type)),
        |gstats AS (SELECT count(*) AS present,
        |    CAST(sum(pow(2.0, 43 - reg)) AS BIGINT) AS s_present
        |  FROM gregs),
        |gex AS (SELECT count(DISTINCT event_id) AS exact_cnt FROM events),
        |gl AS (SELECT '__all__' AS event_type, gex.exact_cnt,
        |    64 - gstats.present AS zeros,
        |    gstats.s_present + CAST(64 - gstats.present AS BIGINT)
        |      * CAST(8796093022208 AS BIGINT) AS s
        |  FROM gex, gstats),
        |allrows AS (SELECT * FROM pertype UNION ALL SELECT * FROM gl),
        |est AS (SELECT event_type, exact_cnt, zeros, s,
        |    ((0.709e0 * 4096.0e0) * 8796093022208.0e0) / CAST(s AS DOUBLE)
        |      AS raw_est
        |  FROM allrows)
        |SELECT event_type, exact_cnt, zeros, s, raw_est,
        |  abs(raw_est - CAST(exact_cnt AS DOUBLE)) * 2.0e0
        |    <= CAST(exact_cnt AS DOUBLE) AS err_ok,
        |  (SELECT merge_ok FROM mok) AS merge_ok
        |FROM est ORDER BY event_type""".stripMargin,

    // Integer PageRank replay: three unrolled power iterations. All
    // arithmetic is non-negative integer (floor division replays `div`
    // exactly), so contribution sums are order-independent and the
    // ranks match bit-for-bit. Each iteration LEFT-joins the
    // contribution aggregate back onto the full node set (deg keys), so
    // in-degree-0 nodes hold the base term instead of dropping out —
    // the operator's documented semantics on directed inputs. DuckDB's
    // sum(BIGINT) widens to HUGEINT — the per-iteration CAST keeps the
    // dtype contract with Spark's long.
    "q117_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (SELECT a AS src, b AS dst FROM pairs
        |          UNION ALL SELECT b, a FROM pairs),
        |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
        |pr0 AS (SELECT src AS nid, CAST(1000000000000 AS BIGINT) AS pr
        |        FROM deg),
        |it1 AS (
        |  SELECT n.src AS nid, CAST(CAST(150000000000 AS BIGINT)
        |      + COALESCE(s.inflow, 0) AS BIGINT) AS pr
        |  FROM deg n LEFT JOIN (
        |    SELECT e.dst AS nid, sum((p.pr * 17) // (20 * d.deg)) AS inflow
        |    FROM edges e JOIN pr0 p ON p.nid = e.src
        |    JOIN deg d ON d.src = e.src GROUP BY 1) s ON s.nid = n.src),
        |it2 AS (
        |  SELECT n.src AS nid, CAST(CAST(150000000000 AS BIGINT)
        |      + COALESCE(s.inflow, 0) AS BIGINT) AS pr
        |  FROM deg n LEFT JOIN (
        |    SELECT e.dst AS nid, sum((p.pr * 17) // (20 * d.deg)) AS inflow
        |    FROM edges e JOIN it1 p ON p.nid = e.src
        |    JOIN deg d ON d.src = e.src GROUP BY 1) s ON s.nid = n.src),
        |it3 AS (
        |  SELECT n.src AS nid, CAST(CAST(150000000000 AS BIGINT)
        |      + COALESCE(s.inflow, 0) AS BIGINT) AS pr
        |  FROM deg n LEFT JOIN (
        |    SELECT e.dst AS nid, sum((p.pr * 17) // (20 * d.deg)) AS inflow
        |    FROM edges e JOIN it2 p ON p.nid = e.src
        |    JOIN deg d ON d.src = e.src GROUP BY 1) s ON s.nid = n.src)
        |SELECT nid,
        |  CASE WHEN nid % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
        |  pr
        |FROM it3 ORDER BY pr DESC, nid LIMIT 20""".stripMargin,

    "q118_dhash_neardup" -> dhashOracleSql,
    "q184_media_dup_clusters" -> mediaDupClustersOracleSql,
    "q189_cc_stars" -> ccStarsOracleSql(5),
    "q195_incremental_cc" -> incrementalCcOracleSql(5),
    "q196_hash_walks" -> hashWalksOracleSql(4),
    "q205_nndescent_knn" -> nnDescentOracleSql(8, 16, 2),
    "q207_ann_quality" -> annQualityOracleSql(10, 16, 2),
    "q211_knn_label_spread" -> knnLabelSpreadOracleSql(8, 16, 2),
    "q212_nndescent_quality" -> nnDescentQualityOracleSql(8, 16, 2),
    "q214_graph_ann_search" -> graphSearchOracleSql(8, 16, 2, 8, 2),
    "q222_hnsw_search" -> hnswSearchOracleSql(8, 8, 16, 2, 8, 2, 2, 2, 2),
    "q226_hnsw_quality" -> hnswQualityOracleSql(8, 8, 16, 2, 8, 2, 2, 2, 2),
    "q215_graph_search_quality" ->
      graphSearchQualityOracleSql(8, 16, 2, 8, 2),

    // Minimax isotonic identity over the token-count census: prefix
    // sums, the (j ≤ k) pair table's one-division averages, per-j
    // suffix min, per-i max — every comparison over bit-identical
    // doubles of exact integer differences.
    "q213_isotonic_calibration" ->
      """WITH base AS (
        |  SELECT list_filter(string_split_regex(trim(regexp_replace(
        |    lower(text), '\s+', ' ', 'g')), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |cen AS (
        |  SELECT CAST(len(t) AS BIGINT) AS s, count(*) AS n,
        |    sum(CASE WHEN list_contains(t, 'the') THEN 1 ELSE 0 END) AS pos
        |  FROM base GROUP BY 1),
        |pre AS (
        |  SELECT s, n, pos,
        |    row_number() OVER (ORDER BY s) AS rn,
        |    sum(pos) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cp,
        |    sum(n) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cn
        |  FROM cen),
        |pairs AS (
        |  SELECT l.rn AS j, r.rn AS k,
        |    CAST(r.cp - (l.cp - l.pos) AS DOUBLE)
        |      / CAST(r.cn - (l.cn - l.n) AS DOUBLE) AS a
        |  FROM pre l JOIN pre r ON l.rn <= r.rn),
        |mji AS (
        |  SELECT j, k AS i, min(a) OVER (PARTITION BY j ORDER BY k DESC
        |    ROWS UNBOUNDED PRECEDING) AS m
        |  FROM pairs),
        |g AS (SELECT i, max(m) AS cal FROM mji WHERE j <= i GROUP BY 1)
        |SELECT pre.s, CAST(pre.n AS BIGINT) AS n,
        |  CAST(pre.pos AS BIGINT) AS pos, r6(g.cal) AS cal
        |FROM pre JOIN g ON g.i = pre.rn ORDER BY s""".stripMargin,

    // Sample instants 0, 77, 154, ... map to frame (s*77)//100 of the
    // 100 ms tick; ffeat is the q171 chain over derived frame ids.
    "q210_avi_frame_sample" ->
      (jpegFeatCtes(
        """SELECT v * 100 + f AS i
          |  FROM (SELECT v,
          |          2 + ((strpos('0123456789abcdef', substr(sha256(
          |            '42:avi:' || CAST(v AS VARCHAR) || ':nf'), 1, 1)) - 1)
          |            * 16
          |            + (strpos('0123456789abcdef', substr(sha256(
          |            '42:avi:' || CAST(v AS VARCHAR) || ':nf'), 2, 1)) - 1))
          |            % 5 AS nf
          |        FROM range(60) t(v)) vids, range(6) r(f)
          |  WHERE f < nf""".stripMargin) +
        """,
          |vids2 AS (SELECT v,
          |    2 + ((strpos('0123456789abcdef', substr(sha256(
          |      '42:avi:' || CAST(v AS VARCHAR) || ':nf'), 1, 1)) - 1) * 16
          |      + (strpos('0123456789abcdef', substr(sha256(
          |      '42:avi:' || CAST(v AS VARCHAR) || ':nf'), 2, 1)) - 1))
          |      % 5 AS nf
          |  FROM range(60) t(v)),
          |samp AS (
          |  SELECT v, CAST(s AS INT) AS s, CAST(s * 77 AS INT) AS t,
          |    CAST((s * 77) // 100 AS INT) AS k
          |  FROM vids2, range(8) r(s) WHERE s * 77 < nf * 100)
          |SELECT samp.v AS media_id, samp.s AS sample_idx,
          |  samp.t AS t_ms, samp.k AS frame_idx,
          |  CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
          |  CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3,
          |  CAST(f4 AS DOUBLE) AS f4, CAST(f5 AS DOUBLE) AS f5,
          |  CAST(f6 AS DOUBLE) AS f6, CAST(f7 AS DOUBLE) AS f7
          |FROM samp JOIN feat ON feat.media_id = samp.v * 100 + samp.k
          |ORDER BY media_id, sample_idx""".stripMargin),

    // Frame ids derive as v*100+f; the pixel formula is the q171 CTE
    // chain verbatim over those ids (jpegFeatCtes), with frames per
    // video = 2 + sha256('42:avi:v:nf')[0] mod 5 and the 100 ms tick.
    "q208_mjpeg_avi" ->
      (jpegFeatCtes(
        """SELECT v * 100 + f AS i
          |  FROM (SELECT v,
          |          2 + ((strpos('0123456789abcdef', substr(sha256(
          |            '42:avi:' || CAST(v AS VARCHAR) || ':nf'), 1, 1)) - 1)
          |            * 16
          |            + (strpos('0123456789abcdef', substr(sha256(
          |            '42:avi:' || CAST(v AS VARCHAR) || ':nf'), 2, 1)) - 1))
          |            % 5 AS nf
          |        FROM range(60) t(v)) vids, range(6) r(f)
          |  WHERE f < nf""".stripMargin) +
        """
          |SELECT CAST(media_id // 100 AS BIGINT) AS media_id,
          |  CAST(media_id % 100 AS BIGINT) AS frame_idx,
          |  CAST((media_id % 100) * 100 AS BIGINT) AS t_ms,
          |  CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
          |  CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3,
          |  CAST(f4 AS DOUBLE) AS f4, CAST(f5 AS DOUBLE) AS f5,
          |  CAST(f6 AS DOUBLE) AS f6, CAST(f7 AS DOUBLE) AS f7
          |FROM feat ORDER BY media_id, frame_idx""".stripMargin),

    // A/V-aligned replay: the q208 per-frame pixel CTEs (derived id
    // v·100+f) joined with the q110 audio-lane formula over the
    // re-tagged sha chains ('42:avia:v:f:k', four digests = one 64-
    // sample 100 ms window at 640 Hz).
    "q217_av_avi" -> avAviOracleSql,

    "q218_unigram_learn" -> unigramLearnOracleSql(4, 24, 2, 4),
    "q219_unigram_encode" -> unigramEncodeOracleSql(4, 24, 2, 4),
    "q220_unigram_prune" -> unigramPruneOracleSql(4, 24, 2, 4, 8),
    "q221_ccnet_filter" -> ccnetOracleSql(4, 24, 2, 4, 3, "src0"),
    "q223_video_neardup" -> videoNearDupOracleSql(40, 6, 80),
    "q224_audio_fingerprint" -> audioFingerprintOracleSql(40),
    "q225_audio_neardup" -> audioNearDupOracleSql(40, 2, 80),

    "q206_span_decontaminate" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(regexp_replace(
        |      lower(text), '\s+', ' ', 'g')), '\s+'), x -> x <> '') AS s
        |  FROM documents),
        |b2 AS (SELECT doc_id, s, len(s) AS n FROM base),
        |grams AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS st,
        |    list_aggregate(s[i:i+15], 'string_agg', ' ') AS g
        |  FROM b2, unnest(generate_series(1, n - 15)) AS t(i)),
        |ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 7 = 0),
        |mk AS (
        |  SELECT doc_id, st, st + 15 AS en FROM grams
        |  WHERE doc_id % 7 <> 0 AND g IN (SELECT g FROM ev)),
        |isl AS (
        |  SELECT doc_id, st, en,
        |    CASE WHEN max(en) OVER (PARTITION BY doc_id ORDER BY st
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR st > max(en) OVER (PARTITION BY doc_id ORDER BY st
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
        |      THEN 1 ELSE 0 END AS nw
        |  FROM mk),
        |isl2 AS (SELECT doc_id, st, en,
        |    sum(nw) OVER (PARTITION BY doc_id ORDER BY st
        |      ROWS UNBOUNDED PRECEDING) AS grp FROM isl),
        |sp AS (SELECT doc_id, grp, min(st) AS sst, max(en) AS sen
        |       FROM isl2 GROUP BY 1, 2),
        |pd AS (SELECT doc_id, count(*) AS contam_spans,
        |         CAST(sum(sen - sst + 1) AS BIGINT) AS contam_tokens
        |       FROM sp GROUP BY 1)
        |SELECT b2.doc_id, CAST(b2.n AS BIGINT) AS total_tokens,
        |  COALESCE(pd.contam_spans, 0) AS contam_spans,
        |  COALESCE(pd.contam_tokens, 0) AS contam_tokens
        |FROM b2 LEFT JOIN pd USING (doc_id)
        |WHERE b2.doc_id % 7 <> 0 ORDER BY doc_id""".stripMargin,

    "q204_group_folds" ->
      """WITH census AS (
        |  SELECT source, count(*) AS gsz FROM documents GROUP BY 1),
        |rk AS (
        |  SELECT source, row_number() OVER (
        |    ORDER BY gsz DESC, sha256(source || ':gkf'), source) AS r
        |  FROM census),
        |fd AS (
        |  SELECT source, CAST(CASE WHEN (r - 1) % 8 < 4 THEN (r - 1) % 8
        |    ELSE 7 - (r - 1) % 8 END AS BIGINT) AS fold
        |  FROM rk)
        |SELECT d.doc_id, d.source, f.fold
        |FROM documents d JOIN fd f ON d.source IS NOT DISTINCT FROM f.source
        |ORDER BY d.doc_id""".stripMargin,

    "q202_span_corruption" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(
        |    regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+'),
        |    x -> x <> '') AS t
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, i - 1 AS i, t[i] AS w
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
        |        FROM tk WHERE len(t) >= 1)),
        |sd AS MATERIALIZED (
        |  SELECT doc_id, i, w,
        |    CASE WHEN (strpos('0123456789abcdef', substr(sha256(
        |          'sc:42:' || CAST(doc_id AS VARCHAR) || ':'
        |          || CAST(i AS VARCHAR)), 1, 1)) - 1) * 16
        |        + (strpos('0123456789abcdef', substr(sha256(
        |          'sc:42:' || CAST(doc_id AS VARCHAR) || ':'
        |          || CAST(i AS VARCHAR)), 2, 1)) - 1) < 38
        |      THEN 1 + ((strpos('0123456789abcdef', substr(sha256(
        |          'sc:42:' || CAST(doc_id AS VARCHAR) || ':'
        |          || CAST(i AS VARCHAR)), 3, 1)) - 1) * 16
        |        + (strpos('0123456789abcdef', substr(sha256(
        |          'sc:42:' || CAST(doc_id AS VARCHAR) || ':'
        |          || CAST(i AS VARCHAR)), 4, 1)) - 1)) % 3
        |      ELSE 0 END AS len0
        |  FROM pos),
        |mk AS MATERIALIZED (
        |  SELECT doc_id, i, w,
        |    (len0 > 0)
        |    OR COALESCE(lag(len0, 1) OVER
        |        (PARTITION BY doc_id ORDER BY i), 0) >= 2
        |    OR COALESCE(lag(len0, 2) OVER
        |        (PARTITION BY doc_id ORDER BY i), 0) >= 3 AS m
        |  FROM sd),
        |isl AS MATERIALIZED (
        |  SELECT doc_id, i, w, m,
        |    CASE WHEN m AND NOT COALESCE(lag(m) OVER
        |        (PARTITION BY doc_id ORDER BY i), FALSE)
        |      THEN 1 ELSE 0 END AS strt
        |  FROM mk),
        |isl2 AS MATERIALIZED (
        |  SELECT doc_id, i, w, m, strt,
        |    sum(strt) OVER (PARTITION BY doc_id ORDER BY i) AS isl_id
        |  FROM isl),
        |inp AS (
        |  SELECT doc_id, string_agg(piece, ' ' ORDER BY i) AS input_text
        |  FROM (SELECT doc_id, i,
        |          CASE WHEN NOT m THEN w
        |               WHEN strt = 1 THEN '<extra_id_'
        |                 || CAST(isl_id - 1 AS VARCHAR) || '>'
        |               ELSE NULL END AS piece
        |        FROM isl2)
        |  WHERE piece IS NOT NULL GROUP BY doc_id),
        |tg AS (
        |  SELECT doc_id,
        |    string_agg(CASE WHEN strt = 1 THEN '<extra_id_'
        |        || CAST(isl_id - 1 AS VARCHAR) || '> ' || w
        |      ELSE w END, ' ' ORDER BY i) AS tgt_body,
        |    CAST(count(*) AS BIGINT) AS n_masked,
        |    CAST(max(isl_id) AS BIGINT) AS k
        |  FROM isl2 WHERE m GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(len(tk.t), 0) AS BIGINT) AS n_tok,
        |  COALESCE(tg.n_masked, 0) AS n_masked,
        |  COALESCE(tg.k, 0) AS n_spans,
        |  COALESCE(inp.input_text, '') AS input_text,
        |  COALESCE(tg.tgt_body || ' ', '')
        |    || '<extra_id_' || CAST(COALESCE(tg.k, 0) AS VARCHAR) || '>'
        |    AS target_text
        |FROM documents d
        |LEFT JOIN tk ON tk.doc_id = d.doc_id
        |LEFT JOIN inp ON inp.doc_id = d.doc_id
        |LEFT JOIN tg ON tg.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q201_rank_auc" ->
      """WITH g AS (
        |  SELECT source, n_chars AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |  FROM documents),
        |ps AS (
        |  SELECT source, s, sum(pos) AS np, sum(1 - pos) AS nn
        |  FROM g GROUP BY 1, 2),
        |w AS (
        |  SELECT source, np, nn,
        |    COALESCE(sum(nn) OVER (PARTITION BY source ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        |  FROM ps),
        |agg AS (
        |  SELECT source, CAST(sum(np) AS BIGINT) AS n_pos,
        |    CAST(sum(nn) AS BIGINT) AS n_neg,
        |    CAST(sum(np * (2 * below + nn)) AS BIGINT) AS u2
        |  FROM w GROUP BY source)
        |SELECT source, n_pos, n_neg, u2,
        |  CASE WHEN n_pos > 0 AND n_neg > 0
        |    THEN r6(CAST(u2 AS DOUBLE) / CAST(2 * n_pos * n_neg AS DOUBLE))
        |    ELSE NULL END AS auc
        |FROM agg ORDER BY source""".stripMargin,

    "q200_kneser_ney" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(
        |    regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+'),
        |    x -> x <> '') AS t
        |  FROM documents),
        |bi0 AS (
        |  SELECT t[i] AS w1, t[i + 1] AS w2
        |  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
        |        FROM tk WHERE len(t) >= 2)),
        |bi AS MATERIALIZED (
        |  SELECT w1, w2, count(*) AS c12 FROM bi0 GROUP BY 1, 2),
        |c1t AS (SELECT w1, sum(c12) AS c1, count(*) AS n1p
        |        FROM bi GROUP BY 1),
        |n1ct AS (SELECT w2, count(*) AS n1c FROM bi GROUP BY 1),
        |bt AS (SELECT count(*) AS b FROM bi)
        |SELECT bi.w1, bi.w2, bi.c12,
        |  CAST(greatest(4 * bi.c12 - 3, 0) * bt.b
        |    + 3 * c1t.n1p * n1ct.n1c AS BIGINT) AS numer,
        |  CAST(4 * c1t.c1 * bt.b AS BIGINT) AS denom
        |FROM bi JOIN c1t USING (w1) JOIN n1ct USING (w2) CROSS JOIN bt
        |ORDER BY c12 DESC, w1, w2 LIMIT 30""".stripMargin,

    "q198_quantile_normalize" ->
      """WITH hist AS (SELECT n_chars AS v, count(*) AS c
        |  FROM documents GROUP BY 1),
        |ch AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM hist),
        |tot AS (SELECT max(cum) AS n FROM ch),
        |r AS (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS r,
        |    count(*) OVER (PARTITION BY source) AS ng
        |  FROM documents)
        |SELECT r.doc_id, r.source, r.n_chars,
        |  (SELECT min(ch.v) FROM ch, tot
        |   WHERE ch.cum * 2 * r.ng >= (2 * r.r - 1) * tot.n) AS calibrated
        |FROM r ORDER BY doc_id""".stripMargin,
    "q190_grid_dbscan" -> gridDbscanOracleSql,
    "q197_incremental_dbscan" -> incrementalDbscanOracleSql,

    // Heavy-hitter replay: the geometric key stream (bit length of the
    // event-id hash's low 16 bits), the q114-style grid, per-key
    // min-over-depth estimates, the integer 1% threshold, and the
    // exact verify. Estimate-filter semantics replay exactly: a key
    // appears iff its CMS estimate AND its exact count both clear the
    // threshold.
    "q119_heavy_hitters" ->
      """WITH h AS (
        |  SELECT CAST(list_sum([(strpos('0123456789abcdef', substr(
        |      sha256(CAST(event_id AS VARCHAR)), i, 1)) - 1)
        |      * pow(16.0, 12 - i) for i in generate_series(1, 12)])
        |    AS BIGINT) AS hv
        |  FROM events),
        |keys AS (
        |  SELECT 'k' || lpad(CAST(length(bin(hv % 65536 + 1)) AS VARCHAR),
        |    2, '0') AS key
        |  FROM h),
        |tot AS (SELECT count(*) AS total FROM keys),
        |grid AS (
        |  SELECT r.d, CAST(list_sum(
        |      [(strpos('0123456789abcdef', substr(
        |          sha256(CAST(r.d AS VARCHAR) || ':' || key), i, 1)) - 1)
        |       * pow(16.0, 12 - i) for i in generate_series(1, 12)])
        |    AS BIGINT) % 1024 AS bucket, count(*) AS cnt
        |  FROM keys, range(4) r(d)
        |  GROUP BY 1, 2),
        |dk AS (SELECT key, count(*) AS exact_cnt FROM keys GROUP BY 1),
        |probe AS (
        |  SELECT dk.key, dk.exact_cnt, r.d, CAST(list_sum(
        |      [(strpos('0123456789abcdef', substr(
        |          sha256(CAST(r.d AS VARCHAR) || ':' || dk.key), i, 1)) - 1)
        |       * pow(16.0, 12 - i) for i in generate_series(1, 12)])
        |    AS BIGINT) % 1024 AS bucket
        |  FROM dk CROSS JOIN range(4) r(d)),
        |est AS (
        |  SELECT p.key, p.exact_cnt, min(coalesce(g.cnt, 0)) AS est
        |  FROM probe p LEFT JOIN grid g ON g.d = p.d AND g.bucket = p.bucket
        |  GROUP BY 1, 2)
        |SELECT key, exact_cnt, est, est >= exact_cnt AS never_undershoots
        |FROM est
        |WHERE est >= (SELECT total // 100 FROM tot)
        |  AND exact_cnt >= (SELECT total // 100 FROM tot)
        |ORDER BY exact_cnt DESC, key""".stripMargin,

    "q120_bpe_merges" -> bpeOracleSql(6),

    // Substring-span replay: tokenization, 4-gram slices, the 48-bit
    // sha256-prefix gram hash (the q119/q102 formula), canonical-copy
    // election via window rank, and the gaps-and-islands merge. DuckDB
    // list slices are 1-based inclusive (s[i:i+3] = 4 elements), and
    // sum(BIGINT) widens to HUGEINT — hence the explicit casts.
    "q121_substring_spans" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(regexp_replace(
        |      lower(text), '\s+', ' ', 'g')), '\s+'), x -> x <> '') AS s
        |  FROM documents),
        |b2 AS (SELECT doc_id, s, len(s) AS n FROM base),
        |grams AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS st,
        |    CAST(list_sum([(strpos('0123456789abcdef', substr(sha256(
        |        list_aggregate(s[i:i+3], 'string_agg', ' ')), j, 1)) - 1)
        |      * pow(16.0, 12 - j) for j in generate_series(1, 12)])
        |      AS BIGINT) AS hv
        |  FROM b2, unnest(generate_series(1, n - 3)) AS t(i)),
        |mk AS (
        |  SELECT doc_id, st, st + 3 AS en
        |  FROM (SELECT doc_id, st,
        |          count(*) OVER (PARTITION BY hv) AS c,
        |          row_number() OVER (PARTITION BY hv ORDER BY doc_id, st) AS rn
        |        FROM grams)
        |  WHERE c >= 2 AND rn > 1),
        |isl AS (
        |  SELECT doc_id, st, en,
        |    CASE WHEN max(en) OVER (PARTITION BY doc_id ORDER BY st
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR st > max(en) OVER (PARTITION BY doc_id ORDER BY st
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
        |      THEN 1 ELSE 0 END AS nw
        |  FROM mk),
        |isl2 AS (SELECT doc_id, st, en,
        |    sum(nw) OVER (PARTITION BY doc_id ORDER BY st
        |      ROWS UNBOUNDED PRECEDING) AS grp FROM isl),
        |sp AS (SELECT doc_id, grp, min(st) AS sst, max(en) AS sen
        |       FROM isl2 GROUP BY 1, 2),
        |pd AS (SELECT doc_id, count(*) AS dup_spans,
        |         CAST(sum(sen - sst + 1) AS BIGINT) AS dup_tokens
        |       FROM sp GROUP BY 1)
        |SELECT b2.doc_id, CAST(b2.n AS BIGINT) AS total_tokens,
        |  COALESCE(pd.dup_spans, 0) AS dup_spans,
        |  COALESCE(pd.dup_tokens, 0) AS dup_tokens
        |FROM b2 LEFT JOIN pd USING (doc_id) ORDER BY doc_id""".stripMargin,

    // Exact-span replay: identical chain to q121's but with the window
    // STRING itself as identity (no hash) at L = 50 — the oracle can
    // afford the 50x gram blowup at test scale that the operator's
    // prefix doubling exists to avoid at 100 TB.
    "q172_exact_spans" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(regexp_replace(
        |      lower(text), '\s+', ' ', 'g')), '\s+'), x -> x <> '') AS s
        |  FROM documents),
        |b2 AS (SELECT doc_id, s, len(s) AS n FROM base),
        |grams AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS st,
        |    list_aggregate(s[i:i+49], 'string_agg', ' ') AS g
        |  FROM b2, unnest(generate_series(1, n - 49)) AS t(i)),
        |mk AS (
        |  SELECT doc_id, st, st + 49 AS en
        |  FROM (SELECT doc_id, st,
        |          count(*) OVER (PARTITION BY g) AS c,
        |          row_number() OVER (PARTITION BY g ORDER BY doc_id, st) AS rn
        |        FROM grams)
        |  WHERE c >= 2 AND rn > 1),
        |isl AS (
        |  SELECT doc_id, st, en,
        |    CASE WHEN max(en) OVER (PARTITION BY doc_id ORDER BY st
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR st > max(en) OVER (PARTITION BY doc_id ORDER BY st
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
        |      THEN 1 ELSE 0 END AS nw
        |  FROM mk),
        |isl2 AS (SELECT doc_id, st, en,
        |    sum(nw) OVER (PARTITION BY doc_id ORDER BY st
        |      ROWS UNBOUNDED PRECEDING) AS grp FROM isl),
        |sp AS (SELECT doc_id, grp, min(st) AS sst, max(en) AS sen
        |       FROM isl2 GROUP BY 1, 2),
        |pd AS (SELECT doc_id, count(*) AS dup_spans,
        |         CAST(sum(sen - sst + 1) AS BIGINT) AS dup_tokens
        |       FROM sp GROUP BY 1)
        |SELECT b2.doc_id, CAST(b2.n AS BIGINT) AS total_tokens,
        |  COALESCE(pd.dup_spans, 0) AS dup_spans,
        |  COALESCE(pd.dup_tokens, 0) AS dup_tokens
        |FROM b2 LEFT JOIN pd USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q122_bpe_encode" -> bpeEncodeOracleSql(6),

    // Triangle replay: co-order edges, degrees over the symmetrized
    // edge set, (degree, id) tuple orientation, the bounded wedge
    // self-join with endpoints ordered by the SAME (degree, id) tuple
    // (raw-id ordering would probe the closing edge backwards whenever
    // the corners' id order disagrees with their (degree, id) order),
    // the closing edge probe, and the per-corner rollup. All integer;
    // tuple comparison is lexicographic in both engines.
    "q123_triangles" ->
      """WITH li AS (SELECT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_linenumber <= 3),
        |e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
        |       FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |eu AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        |deg AS (SELECT u AS n, count(*) AS d FROM eu GROUP BY 1),
        |oe AS (
        |  SELECT CASE WHEN (da.d, e0.u) < (db.d, e0.v)
        |           THEN e0.u ELSE e0.v END AS s,
        |         CASE WHEN (da.d, e0.u) < (db.d, e0.v)
        |           THEN e0.v ELSE e0.u END AS t,
        |         CASE WHEN (da.d, e0.u) < (db.d, e0.v)
        |           THEN db.d ELSE da.d END AS dt
        |  FROM e0 JOIN deg da ON da.n = e0.u JOIN deg db ON db.n = e0.v),
        |tri AS (
        |  SELECT w1.s AS a, w1.t AS b, w2.t AS c
        |  FROM oe w1 JOIN oe w2 ON w1.s = w2.s
        |    AND (w1.dt, w1.t) < (w2.dt, w2.t)
        |  JOIN oe e3 ON e3.s = w1.t AND e3.t = w2.t),
        |pern AS (
        |  SELECT n, count(*) AS tri_cnt FROM (
        |    SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri)
        |  GROUP BY 1)
        |SELECT deg.n AS part_id, deg.d AS degree,
        |  COALESCE(pern.tri_cnt, 0) AS triangles
        |FROM deg LEFT JOIN pern ON pern.n = deg.n
        |ORDER BY triangles DESC, part_id LIMIT 50""".stripMargin,

    "q124_kmeans" -> kmeansOracleSql(8, 3, 64),

    "q125_diverse_sample" -> diversitySampleOracleSql(8, 3, 64, 5),
    "q203_contrastive_pairs" -> contrastivePairsOracleSql(8, 3, 64),
    "q130_semdedup" -> semDedupOracleSql(8, 3, 64),
    "q137_pq_topk" -> pqOracleSql(8, 16, 2, 64, 3, 50),

    "q170_ivfpq_topk" -> ivfPqOracleSql(8, 16, 2, 64, 3, 50, 16, 4),

    // Winnowing replay: tokenization, 4-gram 48-bit sha hashes (the
    // q121 formula), the w=4 rightmost-min selection as a lexicographic
    // struct min over a ROWS window (−st makes "rightmost" the struct
    // minimum), fully-populated windows only (st ≤ n_grams − w + 1),
    // df band [2, 32], shared-count pair rollup.
    "q138_winnow_pairs" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(regexp_replace(
        |      lower(text), '\s+', ' ', 'g')), '\s+'), x -> x <> '') AS s
        |  FROM documents),
        |b2 AS (SELECT doc_id, s, len(s) AS n FROM base),
        |grams AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS st, CAST(n - 3 AS BIGINT) AS ng,
        |    CAST(list_sum([(strpos('0123456789abcdef', substr(sha256(
        |        list_aggregate(s[i:i+3], 'string_agg', ' ')), j, 1)) - 1)
        |      * pow(16.0, 12 - j) for j in generate_series(1, 12)])
        |      AS BIGINT) AS hv
        |  FROM b2, unnest(generate_series(1, n - 3)) AS t(i)),
        |sel AS (
        |  SELECT DISTINCT doc_id, fp.h AS hv FROM (
        |    SELECT doc_id, st, ng,
        |      min({'h': hv, 'p': -st}) OVER (PARTITION BY doc_id ORDER BY st
        |        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        |    FROM grams)
        |  WHERE st <= ng - 3),
        |dfc AS (SELECT hv, count(*) AS df FROM sel GROUP BY 1),
        |kept AS (SELECT s.doc_id, s.hv FROM sel s JOIN dfc USING (hv)
        |         WHERE df BETWEEN 2 AND 32)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(count(*) AS BIGINT) AS shared
        |FROM kept a JOIN kept b ON a.hv = b.hv AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY 1, 2""".stripMargin,

    // BM25 replay: tokenize, (doc, term, tf, dl) postings, query terms
    // from the three example docs, df over ALL postings of query terms,
    // N/avgdl scalars, the exact Okapi sum — constants written as the
    // same IEEE-folded literals Spark computes ((1.2 + 1), 0.25) — and
    // the rank-on-rounded-score cut.
    "q139_bm25_topk" ->
      s"""WITH $bm25ScoreCtes,
         |rk AS (
         |  SELECT query_id, doc_id, r4(score) AS score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY r4(score) DESC, doc_id) AS rank
         |  FROM sc)
         |SELECT query_id, doc_id, score, CAST(rank AS BIGINT) AS rank
         |FROM rk WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "q140_kcore" -> kCoreOracleSql(4, 8),

    "q141_hilbert_key" -> hilbertOracleSql(4),

    "q145_hyperball" -> hyperBallOracleSql(3),
    "q209_harmonic_centrality" -> harmonicCentralityOracleSql(3),

    // Unigram-LM perplexity replay: reference counts from the src0
    // slice, T/V scalars, add-one smoothing with the shared OOV bucket,
    // tf-weighted cross-entropy (sum(tf) widens to HUGEINT — hence the
    // casts), e^H, then the fixed-percentile cut rule: cumulative
    // counts over the DISTINCT rounded-score histogram, cut_b = the
    // smallest ppl with cum·3 ≥ b·N (integer ⌈b·N/3⌉), bucket = 1 +
    // #cuts strictly below the document's score.
    "q142_lm_perplexity" ->
      """WITH base AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(trim(regexp_replace(
        |      lower(text), '\s+', ' ', 'g')), '\s+'), x -> x <> '') AS s
        |  FROM documents),
        |rc AS (
        |  SELECT t.token, count(*) AS c
        |  FROM base b, unnest(b.s) AS t(token)
        |  WHERE b.source = 'src0' GROUP BY 1),
        |sc AS (SELECT CAST(sum(c) AS DOUBLE) AS t,
        |              CAST(count(*) AS DOUBLE) AS v FROM rc),
        |tf AS (
        |  SELECT doc_id, t.token, CAST(count(*) AS BIGINT) AS tf
        |  FROM base b, unnest(b.s) AS t(token) GROUP BY 1, 2),
        |scored AS (
        |  SELECT f.doc_id, CAST(sum(f.tf) AS BIGINT) AS n_tokens,
        |    r4(exp(-CAST(sum(f.tf * ln(
        |        (coalesce(rc.c, 0) + 1.0) / (s.t + s.v + 1.0)))
        |      AS DOUBLE) / CAST(sum(f.tf) AS DOUBLE))) AS ppl
        |  FROM tf f LEFT JOIN rc ON rc.token = f.token CROSS JOIN sc s
        |  GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scored),
        |hist AS (SELECT ppl, CAST(count(*) AS BIGINT) AS cnt
        |         FROM scored GROUP BY 1),
        |cum AS (SELECT ppl,
        |          CAST(sum(cnt) OVER (ORDER BY ppl) AS BIGINT) AS cum
        |        FROM hist),
        |cuts AS (
        |  SELECT t.b, min(c.ppl) AS cut
        |  FROM cum c CROSS JOIN nn CROSS JOIN range(1, 3) t(b)
        |  WHERE c.cum * 3 >= t.b * nn.n GROUP BY 1)
        |SELECT s.doc_id, s.n_tokens, s.ppl,
        |  CAST(1 + (SELECT count(*) FROM cuts c WHERE s.ppl > c.cut)
        |    AS BIGINT) AS bucket
        |FROM scored s ORDER BY doc_id""".stripMargin,

    // KS replay: both comparisons — fixed-width 1024-bucket binning for
    // the continuous price column (same IEEE op order as the Spark
    // side), exact distinct-value cumulation for quantity; HUGEINT
    // cross-products keep the sup integer-exact, one final division.
    "q143_ks_drift" ->
      """WITH pa AS (
        |  SELECT CAST(l_extendedprice AS DOUBLE) AS v, 1 AS sa, 0 AS sb
        |  FROM lineitem WHERE year(l_shipdate) = 1995),
        |pb AS (
        |  SELECT CAST(l_extendedprice AS DOUBLE) AS v, 0 AS sa, 1 AS sb
        |  FROM lineitem WHERE year(l_shipdate) = 2000),
        |pu AS (SELECT * FROM pa UNION ALL SELECT * FROM pb),
        |mm AS (SELECT min(v) AS lo, max(v) AS hi FROM pu),
        |pk AS (
        |  SELECT CASE WHEN m.hi > m.lo
        |      THEN CAST(least(floor((u.v - m.lo) / (m.hi - m.lo) * 1024),
        |                     1023) AS DOUBLE)
        |      ELSE 0.0 END AS k, u.sa, u.sb
        |  FROM pu u CROSS JOIN mm m),
        |pc AS (SELECT k, sum(sa) AS ca, sum(sb) AS cb FROM pk GROUP BY 1),
        |pcum AS (
        |  SELECT sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb FROM pc
        |  WINDOW w AS (ORDER BY k ROWS UNBOUNDED PRECEDING)),
        |ptot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM pc),
        |pres AS (
        |  SELECT 'price_1995_vs_2000' AS metric,
        |    CAST(max(abs(c.cuma * t.nb - c.cumb * t.na)) AS DOUBLE)
        |      / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)) AS d,
        |    CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b
        |  FROM pcum c CROSS JOIN ptot t GROUP BY t.na, t.nb),
        |qu AS (
        |  SELECT CAST(l_quantity AS DOUBLE) AS k, 1 AS sa, 0 AS sb
        |  FROM lineitem WHERE l_returnflag = 'A'
        |  UNION ALL
        |  SELECT CAST(l_quantity AS DOUBLE), 0, 1
        |  FROM lineitem WHERE l_returnflag = 'R'),
        |qc AS (SELECT k, sum(sa) AS ca, sum(sb) AS cb FROM qu GROUP BY 1),
        |qcum AS (
        |  SELECT sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb FROM qc
        |  WINDOW w AS (ORDER BY k ROWS UNBOUNDED PRECEDING)),
        |qtot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM qc),
        |qres AS (
        |  SELECT 'qty_A_vs_R' AS metric,
        |    CAST(max(abs(c.cuma * t.nb - c.cumb * t.na)) AS DOUBLE)
        |      / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)) AS d,
        |    CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b
        |  FROM qcum c CROSS JOIN qtot t GROUP BY t.na, t.nb)
        |SELECT metric, r6(d) AS d, n_a, n_b
        |FROM (SELECT * FROM pres UNION ALL SELECT * FROM qres)
        |ORDER BY metric""".stripMargin,

    // RRF replay: the shared BM25 chain ranked on r4 scores (top 20),
    // the brute cosine ranking on r6 scores (top 20), 1/(60 + rank)
    // contributions, the (query, doc) sum — ≤ 2 addends, a single
    // commutative IEEE addition, so fused doubles are bit-identical —
    // and the fused top-10 cut.
    "q144_rrf_hybrid" ->
      s"""WITH $bm25ScoreCtes,
         |bl AS (
         |  SELECT query_id, doc_id, rank FROM (
         |    SELECT query_id, doc_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY r4(score) DESC, doc_id) AS rank
         |    FROM sc) WHERE rank <= 20),
         |el AS (
         |  SELECT query_id, doc_id, rank FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY r6(list_cosine_similarity(
         |          CAST(q.embedding AS DOUBLE[]),
         |          CAST(c.embedding AS DOUBLE[]))) DESC, c.vec_id) AS rank
         |    FROM embeddings q, embeddings c
         |    WHERE q.vec_id IN (7, 20, 33)) WHERE rank <= 20),
         |u AS (
         |  SELECT query_id, doc_id, 1.0 / (60.0 + rank) AS c FROM bl
         |  UNION ALL
         |  SELECT query_id, doc_id, 1.0 / (60.0 + rank) FROM el),
         |f AS (
         |  SELECT query_id, doc_id, sum(c) AS rrf,
         |    CAST(count(*) AS BIGINT) AS n_lists
         |  FROM u GROUP BY 1, 2)
         |SELECT query_id, doc_id, r6(rrf) AS rrf, n_lists,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY rrf DESC, doc_id) AS rank FROM f)
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // Both SNM passes' block-prefix rank windows replayed, then exact
    // 3-gram Jaccard on the candidate union only. coalesce('') on the
    // token-sorted key: DuckDB's string_agg of an empty list is NULL
    // where Spark's concat_ws is ''.
    "q131_sorted_neighborhood" ->
      """WITH nrm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS k1,
        |    coalesce(list_aggregate(list_sort(list_filter(
        |      string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')),
        |      'string_agg', ' '), '') AS k2
        |  FROM documents),
        |r1 AS (
        |  SELECT doc_id, substr(k1, 1, 2) AS blk,
        |    row_number() OVER (PARTITION BY substr(k1, 1, 2)
        |      ORDER BY k1, doc_id) AS rnk
        |  FROM nrm),
        |r2 AS (
        |  SELECT doc_id, substr(k2, 1, 2) AS blk,
        |    row_number() OVER (PARTITION BY substr(k2, 1, 2)
        |      ORDER BY k2, doc_id) AS rnk
        |  FROM nrm),
        |cand AS (
        |  SELECT DISTINCT least(da, db) AS ia, greatest(da, db) AS ib
        |  FROM (SELECT a.doc_id AS da, b.doc_id AS db FROM r1 a JOIN r1 b
        |          ON a.blk = b.blk AND b.rnk - a.rnk BETWEEN 1 AND 3
        |        UNION ALL
        |        SELECT a.doc_id AS da, b.doc_id AS db FROM r2 a JOIN r2 b
        |          ON a.blk = b.blk AND b.rnk - a.rnk BETWEEN 1 AND 3)),
        |toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |        x -> x <> '') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS g
        |  FROM toks WHERE len(t) >= 3),
        |jv AS (
        |  SELECT ia AS id_a, ib AS id_b,
        |    len(list_intersect(a.g, b.g))::DOUBLE
        |      / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS j
        |  FROM cand JOIN grams a ON a.doc_id = ia
        |    JOIN grams b ON b.doc_id = ib)
        |SELECT id_a, id_b, r4(j) AS jaccard FROM jv
        |WHERE j >= 0.6 ORDER BY id_a, id_b""".stripMargin,

    // Exact cross brute force on the mod-10 split: the lossless
    // standing probe must reproduce ground truth, not a band replay.
    "q136_incremental_exact" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |        x -> x <> '') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS g
        |  FROM toks WHERE len(t) >= 3),
        |c AS (SELECT * FROM grams WHERE doc_id % 10 >= 2),
        |b AS (SELECT * FROM grams WHERE doc_id % 10 < 2),
        |pairs AS (
        |  SELECT b.doc_id AS id_new, c.doc_id AS id_corpus,
        |    len(list_intersect(b.g, c.g))::DOUBLE
        |      / (len(b.g) + len(c.g) - len(list_intersect(b.g, c.g))) AS j
        |  FROM b JOIN c
        |    ON least(len(b.g), len(c.g))::DOUBLE >= 0.6 * greatest(len(b.g), len(c.g)))
        |SELECT id_new, id_corpus, r4(j) AS jaccard FROM pairs
        |WHERE j >= 0.6 ORDER BY id_new, id_corpus""".stripMargin,

    // Containment brute force: every directional pair under the
    // τden·|y| ≥ τnum·|x| length prefilter, integer overlap decision.
    "q135_containment_join" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |        x -> x <> '') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS g
        |  FROM toks WHERE len(t) >= 3),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    len(list_intersect(a.g, b.g)) AS ov, len(a.g) AS sa
        |  FROM grams a JOIN grams b
        |    ON a.doc_id <> b.doc_id AND 5 * len(b.g) >= 4 * len(a.g))
        |SELECT id_a, id_b, r4(ov::DOUBLE / sa) AS containment
        |FROM pairs WHERE 5 * ov >= 4 * sa ORDER BY id_a, id_b""".stripMargin,

    // Edit-join brute force: the query's planted-edit corpus rebuilt in
    // SQL, then every length-banded pair under DuckDB's own levenshtein
    // — the filter cascade must lose nothing.
    "q146_edit_join" ->
      """WITH base AS (
        |  SELECT doc_id AS id, substr(lower(text), 1, 32) AS s
        |  FROM documents WHERE doc_id % 5 = 0),
        |planted AS (
        |  SELECT id + 1000000 AS id,
        |    CASE WHEN id % 50 = 0
        |      THEN substr(s, 1, 7) || 'x' || substr(s, 9, 24)
        |      ELSE substr(s, 1, 7) || substr(s, 9, 24) END AS s
        |  FROM base WHERE id % 25 = 0),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM u a JOIN u b
        |  ON a.id < b.id AND abs(length(a.s) - length(b.s)) <= 2
        |WHERE levenshtein(a.s, b.s) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // Blocklist replay: same tokenization, adjacent-bigram view, and
    // both counters (per-occurrence and distinct-entry) in list HOFs.
    "q147_blocklist" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(regexp_replace(
        |      lower(text), '\s+', ' ', 'g')), '\s+'), x -> x <> '') AS tk
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, tk,
        |    list_transform(generate_series(1, greatest(len(tk) - 1, 0)),
        |      i -> tk[i] || ' ' || tk[i + 1]) AS bg
        |  FROM toks)
        |SELECT doc_id,
        |  CAST(len(list_filter(tk, t -> list_contains(['slow', 'broken'], t)))
        |     + len(list_filter(bg, t -> list_contains(['fast table', 'row scan'], t)))
        |    AS BIGINT) AS n_hits,
        |  CAST(len(list_intersect(list_distinct(tk), ['slow', 'broken']))
        |     + len(list_intersect(list_distinct(bg), ['fast table', 'row scan']))
        |    AS BIGINT) AS n_terms,
        |  (len(list_filter(tk, t -> list_contains(['slow', 'broken'], t)))
        |     + len(list_filter(bg, t -> list_contains(['fast table', 'row scan'], t)))) = 0
        |    AS keep
        |FROM g ORDER BY doc_id""".stripMargin,

    // PMI replay: tokenize, unigram counts + corpus token total,
    // adjacent-bigram counts at the same min-count cut, ln ratio.
    "q148_pmi" ->
      """WITH toks AS (
        |  SELECT list_filter(string_split_regex(trim(regexp_replace(
        |      lower(text), '\s+', ' ', 'g')), '\s+'), x -> x <> '') AS tk
        |  FROM documents),
        |uni AS (SELECT unnest(tk) AS w FROM toks),
        |uc AS (SELECT w, count(*) AS c_w FROM uni GROUP BY 1),
        |n AS (SELECT count(*) AS n_tok FROM uni),
        |bg AS (
        |  SELECT unnest(list_transform(generate_series(1, greatest(len(tk) - 1, 0)),
        |    i -> tk[i] || ' ' || tk[i + 1])) AS gq
        |  FROM toks),
        |bc AS (SELECT gq, count(*) AS c_ab FROM bg GROUP BY 1
        |       HAVING count(*) >= 20),
        |sp AS (SELECT string_split(gq, ' ')[1] AS w1,
        |              string_split(gq, ' ')[2] AS w2, c_ab FROM bc)
        |SELECT w1, w2, c_ab, a.c_w AS c_a, b.c_w AS c_b,
        |  r4(ln(c_ab::DOUBLE * n_tok / (a.c_w::DOUBLE * b.c_w))) AS pmi
        |FROM sp JOIN uc a ON a.w = sp.w1 JOIN uc b ON b.w = sp.w2, n
        |ORDER BY w1, w2""".stripMargin,

    // DSIR replay: unigram+bigram explode, the q102 sha-digit hash mod
    // 1024, raw + target bucket counts, smoothed log-ratio model, and
    // the per-doc weight sum. Docs with no grams keep (0, 0.0).
    "q134_importance_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(trim(regexp_replace(
        |      lower(text), '\s+', ' ', 'g')), '\s+'), x -> x <> '') AS tk
        |  FROM documents),
        |uni AS (SELECT doc_id, source, unnest(tk) AS gram FROM toks),
        |bi AS (
        |  SELECT doc_id, source,
        |    unnest(list_transform(generate_series(1, len(tk) - 1),
        |      i -> tk[i] || ' ' || tk[i + 1])) AS gram
        |  FROM toks WHERE len(tk) >= 2),
        |grams AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
        |hb AS (
        |  SELECT doc_id, source,
        |    CAST(list_sum([(strpos('0123456789abcdef',
        |      substr(sha256(gram), i, 1)) - 1) * pow(16.0, 12 - i)
        |      for i in generate_series(1, 12)]) AS BIGINT) % 1024 AS b
        |  FROM grams),
        |raw AS (SELECT b, count(*) AS cr FROM hb GROUP BY 1),
        |tgt AS (SELECT b, count(*) AS ct FROM hb
        |        WHERE source = 'src0' GROUP BY 1),
        |tot AS (SELECT (SELECT count(*) FROM hb) AS tr,
        |               (SELECT count(*) FROM hb WHERE source = 'src0') AS tt),
        |model AS (
        |  SELECT raw.b,
        |    ln((COALESCE(ct, 0) + 1)::DOUBLE / (tt + 1024))
        |      - ln((cr + 1)::DOUBLE / (tr + 1024)) AS lw
        |  FROM raw LEFT JOIN tgt ON tgt.b = raw.b, tot),
        |pw AS (
        |  SELECT doc_id, count(*) AS n_grams, sum(lw) AS logw
        |  FROM hb JOIN model USING (b) GROUP BY 1)
        |SELECT t.doc_id, t.source,
        |  COALESCE(pw.n_grams, 0) AS n_grams,
        |  r4(COALESCE(pw.logw, 0.0)) AS logw
        |FROM toks t LEFT JOIN pw ON pw.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    // Three unrolled majority votes: per-(node, label) neighbor counts,
    // the (cnt DESC, lbl) window argmax, then the community rollup.
    "q132_label_prop" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (SELECT a AS src, b AS dst FROM pairs
        |          UNION ALL SELECT b, a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS nid FROM edges
        |          UNION SELECT DISTINCT dst FROM edges),
        |l0 AS (SELECT nid, nid AS lbl FROM nodes),
        |i1 AS (SELECT e.dst AS nid, p.lbl AS lbl, count(*) AS cnt
        |       FROM edges e JOIN l0 p ON p.nid = e.src GROUP BY 1, 2),
        |w1 AS (SELECT nid, lbl FROM (
        |         SELECT nid, lbl, row_number() OVER (PARTITION BY nid
        |           ORDER BY cnt DESC, lbl) AS rn FROM i1) WHERE rn = 1),
        |l1 AS (SELECT p.nid, COALESCE(w.lbl, p.lbl) AS lbl
        |       FROM l0 p LEFT JOIN w1 w ON w.nid = p.nid),
        |i2 AS (SELECT e.dst AS nid, p.lbl AS lbl, count(*) AS cnt
        |       FROM edges e JOIN l1 p ON p.nid = e.src GROUP BY 1, 2),
        |w2 AS (SELECT nid, lbl FROM (
        |         SELECT nid, lbl, row_number() OVER (PARTITION BY nid
        |           ORDER BY cnt DESC, lbl) AS rn FROM i2) WHERE rn = 1),
        |l2 AS (SELECT p.nid, COALESCE(w.lbl, p.lbl) AS lbl
        |       FROM l1 p LEFT JOIN w2 w ON w.nid = p.nid),
        |i3 AS (SELECT e.dst AS nid, p.lbl AS lbl, count(*) AS cnt
        |       FROM edges e JOIN l2 p ON p.nid = e.src GROUP BY 1, 2),
        |w3 AS (SELECT nid, lbl FROM (
        |         SELECT nid, lbl, row_number() OVER (PARTITION BY nid
        |           ORDER BY cnt DESC, lbl) AS rn FROM i3) WHERE rn = 1),
        |l3 AS (SELECT p.nid, COALESCE(w.lbl, p.lbl) AS lbl
        |       FROM l2 p LEFT JOIN w3 w ON w.nid = p.nid)
        |SELECT lbl AS community, count(*) AS n_members,
        |  CAST(sum(nid) AS BIGINT) AS nid_sum
        |FROM l3 GROUP BY 1 ORDER BY 1""".stripMargin,

    // Seeded-PageRank replay: the q117 chain with the teleport term
    // gated on seed membership (LEFT JOIN keeps zero-inflow nodes —
    // unlike plain PageRank, a non-seed node's rank can be 0).
    "q126_trustrank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (SELECT a AS src, b AS dst FROM pairs
        |          UNION ALL SELECT b, a FROM pairs),
        |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
        |sd AS (SELECT c_custkey * 2 AS nid FROM customer
        |       WHERE c_mktsegment = 'BUILDING'),
        |nodes AS (
        |  SELECT deg.src AS nid,
        |    CASE WHEN sd.nid IS NULL THEN 0 ELSE 1 END AS is_seed
        |  FROM deg LEFT JOIN sd ON sd.nid = deg.src),
        |tr0 AS (SELECT nid, CAST(is_seed * 1000000000000 AS BIGINT) AS tr
        |        FROM nodes),
        |it1 AS (
        |  SELECT n.nid, CAST(n.is_seed * 150000000000
        |      + COALESCE(s.inflow, 0) AS BIGINT) AS tr
        |  FROM nodes n LEFT JOIN (
        |    SELECT e.dst AS nid, sum((p.tr * 17) // (20 * d.deg)) AS inflow
        |    FROM edges e JOIN tr0 p ON p.nid = e.src
        |    JOIN deg d ON d.src = e.src GROUP BY 1) s ON s.nid = n.nid),
        |it2 AS (
        |  SELECT n.nid, CAST(n.is_seed * 150000000000
        |      + COALESCE(s.inflow, 0) AS BIGINT) AS tr
        |  FROM nodes n LEFT JOIN (
        |    SELECT e.dst AS nid, sum((p.tr * 17) // (20 * d.deg)) AS inflow
        |    FROM edges e JOIN it1 p ON p.nid = e.src
        |    JOIN deg d ON d.src = e.src GROUP BY 1) s ON s.nid = n.nid),
        |it3 AS (
        |  SELECT n.nid, CAST(n.is_seed * 150000000000
        |      + COALESCE(s.inflow, 0) AS BIGINT) AS tr
        |  FROM nodes n LEFT JOIN (
        |    SELECT e.dst AS nid, sum((p.tr * 17) // (20 * d.deg)) AS inflow
        |    FROM edges e JOIN it2 p ON p.nid = e.src
        |    JOIN deg d ON d.src = e.src GROUP BY 1) s ON s.nid = n.nid)
        |SELECT nid,
        |  CASE WHEN nid % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
        |  tr
        |FROM it3 ORDER BY tr DESC, nid LIMIT 20""".stripMargin,

    // Incremental-span replay: corpus gram frequencies (mod-10 ≥ 2),
    // batch gram occurrences (mod-10 < 2), the asymmetric mark rule
    // (corpus hit always marks; batch-internal repeats keep the batch
    // (doc, start)-minimum), and the q121 island merge over batch docs.
    "q127_incremental_spans" ->
      """WITH corp AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(regexp_replace(
        |      lower(text), '\s+', ' ', 'g')), '\s+'), x -> x <> '') AS s
        |  FROM documents WHERE doc_id % 10 >= 2),
        |cb AS (SELECT doc_id, s, len(s) AS n FROM corp),
        |cg AS (
        |  SELECT CAST(list_sum([(strpos('0123456789abcdef', substr(sha256(
        |      list_aggregate(s[i:i+3], 'string_agg', ' ')), j, 1)) - 1)
        |    * pow(16.0, 12 - j) for j in generate_series(1, 12)])
        |    AS BIGINT) AS hv
        |  FROM cb, unnest(generate_series(1, n - 3)) AS t(i)),
        |cs AS (SELECT hv, count(*) AS cc FROM cg GROUP BY 1),
        |bat AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(regexp_replace(
        |      lower(text), '\s+', ' ', 'g')), '\s+'), x -> x <> '') AS s
        |  FROM documents WHERE doc_id % 10 < 2),
        |bb AS (SELECT doc_id, s, len(s) AS n FROM bat),
        |bg AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS st,
        |    CAST(list_sum([(strpos('0123456789abcdef', substr(sha256(
        |        list_aggregate(s[i:i+3], 'string_agg', ' ')), j, 1)) - 1)
        |      * pow(16.0, 12 - j) for j in generate_series(1, 12)])
        |      AS BIGINT) AS hv
        |  FROM bb, unnest(generate_series(1, n - 3)) AS t(i)),
        |bs AS (
        |  SELECT doc_id, st, hv,
        |    count(*) OVER (PARTITION BY hv) AS bc,
        |    row_number() OVER (PARTITION BY hv ORDER BY doc_id, st) AS rn
        |  FROM bg),
        |mk AS (
        |  SELECT b.doc_id, b.st, b.st + 3 AS en
        |  FROM bs b LEFT JOIN cs ON cs.hv = b.hv
        |  WHERE COALESCE(cs.cc, 0) >= 1 OR (b.bc >= 2 AND b.rn > 1)),
        |isl AS (
        |  SELECT doc_id, st, en,
        |    CASE WHEN max(en) OVER (PARTITION BY doc_id ORDER BY st
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR st > max(en) OVER (PARTITION BY doc_id ORDER BY st
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
        |      THEN 1 ELSE 0 END AS nw
        |  FROM mk),
        |isl2 AS (SELECT doc_id, st, en,
        |    sum(nw) OVER (PARTITION BY doc_id ORDER BY st
        |      ROWS UNBOUNDED PRECEDING) AS grp FROM isl),
        |sp AS (SELECT doc_id, grp, min(st) AS sst, max(en) AS sen
        |       FROM isl2 GROUP BY 1, 2),
        |pd AS (SELECT doc_id, count(*) AS dup_spans,
        |         CAST(sum(sen - sst + 1) AS BIGINT) AS dup_tokens
        |       FROM sp GROUP BY 1)
        |SELECT bb.doc_id, CAST(bb.n AS BIGINT) AS total_tokens,
        |  COALESCE(pd.dup_spans, 0) AS dup_spans,
        |  COALESCE(pd.dup_tokens, 0) AS dup_tokens
        |FROM bb LEFT JOIN pd USING (doc_id) ORDER BY doc_id""".stripMargin,

    // Span-scrub replay: q121's marking, positions covered by any mark,
    // kept = anti-join, ordered string_agg reconstruction.
    "q128_span_scrub" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(regexp_replace(
        |      lower(text), '\s+', ' ', 'g')), '\s+'), x -> x <> '') AS s
        |  FROM documents),
        |b2 AS (SELECT doc_id, s, len(s) AS n FROM base),
        |grams AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS st,
        |    CAST(list_sum([(strpos('0123456789abcdef', substr(sha256(
        |        list_aggregate(s[i:i+3], 'string_agg', ' ')), j, 1)) - 1)
        |      * pow(16.0, 12 - j) for j in generate_series(1, 12)])
        |      AS BIGINT) AS hv
        |  FROM b2, unnest(generate_series(1, n - 3)) AS t(i)),
        |mk AS (
        |  SELECT doc_id, st, st + 3 AS en
        |  FROM (SELECT doc_id, st,
        |          count(*) OVER (PARTITION BY hv) AS c,
        |          row_number() OVER (PARTITION BY hv ORDER BY doc_id, st) AS rn
        |        FROM grams)
        |  WHERE c >= 2 AND rn > 1),
        |cov AS (SELECT DISTINCT doc_id, CAST(u.p AS BIGINT) AS pos
        |        FROM mk, unnest(generate_series(st, en)) u(p)),
        |toks AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, s[i] AS tok
        |         FROM b2, unnest(generate_series(1, n)) t(i)),
        |kept AS (
        |  SELECT t.doc_id, t.pos, t.tok
        |  FROM toks t LEFT JOIN cov c
        |    ON c.doc_id = t.doc_id AND c.pos = t.pos
        |  WHERE c.pos IS NULL),
        |reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
        |          count(*) AS kept FROM kept GROUP BY 1)
        |SELECT b2.doc_id, COALESCE(reb.clean_text, '') AS clean_text,
        |  CAST(b2.n - COALESCE(reb.kept, 0) AS BIGINT) AS removed_tokens
        |FROM b2 LEFT JOIN reb USING (doc_id) ORDER BY doc_id""".stripMargin,
  )
}
