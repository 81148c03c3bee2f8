package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.KmvAggregator

/** Distributed k-means (Lloyd's algorithm) over embedding vectors in an
  * INTEGER-EXACT fixed-point formulation — semantic clustering for
  * data curation (cluster-balanced sampling, diversity analysis,
  * per-cluster quality review), and the third member of the iterative
  * family next to pointer-doubling components and power-iteration
  * PageRank. Floating k-means is reduce-order-sensitive (centroid
  * means are float sums); quantized vectors make every step —
  * distances, argmin, centroid updates — associative integer
  * arithmetic, so ANY partitioning, any engine, any reduce order is
  * bit-identical, and the whole run replays in an ANSI oracle
  * (q124's hash gate).
  *
  * Documented spec:
  *   - quantization: q_d = floor(x_d · 2^20) — a power-of-two scale,
  *     so the double multiply is EXACT and floor is engine-independent;
  *   - seeds: the k vectors with the smallest (sha256-prefix hash of
  *     vec_id, vec_id) — deterministic, replayable, input-order-free;
  *     cid 0..k−1 in that order;
  *   - assignment: argmin over centroids of Σ_d (q_d − c_d)², ties to
  *     the smaller cid (argmin over the (dist, cid) tuple);
  *   - update: c'_d = ((Σ q_d + n·S) div n) − S with S = 2^21 — the
  *     shift keeps the numerator non-negative so `div` truncation IS
  *     floor division in every engine regardless of its negative-
  *     operand convention; empty clusters keep their previous centroid;
  *   - `iters` assign→update rounds, then one final assignment against
  *     the last centroids for the report.
  *
  * 100 TB shape: the vector table is scanned once per assignment pass
  * with the k×dim centroid array as a ONE-ROW broadcast (no per-vector
  * shuffle at all — the argmin runs inside the row's projection via
  * array_min over the broadcast centroid structs). The update is one
  * partially-aggregated (cid, dim) groupBy — k·dim result rows — and
  * each iteration's centroid frame is persisted so the lazy chain
  * replays no earlier pass. No driver collect anywhere in the plan. */
object Clustering {

  private val Scale = 1L << 20
  private val Shift = 1L << 21

  private def quantize(e: Column): Column =
    transform(e, x => floor(x.cast("double") * Scale).cast("long"))

  /** One-row frame holding the centroid array: [(cid, c)]. */
  private def toCentRow(cents: DataFrame): DataFrame =
    cents.agg(sort_array(collect_list(struct(col("cid"), col("c"))))
      .as("cents"))

  private def assign(vecs: DataFrame, centRow: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centRow))
      .withColumn("best",
        array_min(transform(col("cents"), s =>
          struct(
            graft.expressions.LongSqDist(col("q"), s.getField("c"))
              .as("dist"),
            s.getField("cid").as("cid")))))
      .select(col("vec_id"), col("label"), col("q"),
        col("best").getField("cid").as("cid"))

  /** Run k-means; returns the final per-vector assignment joined with
    * the final centroids as (vec_id, label, cid, centroid). */
  def kmeansAssign(embeddings: DataFrame, idCol: String, vecCol: String,
                   labelCol: String, k: Int, iters: Int): DataFrame = {
    require(k >= 2 && k <= 256, s"k out of range: $k")
    require(iters >= 1 && iters <= 20, s"iters out of range: $iters")
    import org.apache.spark.storage.StorageLevel
    val vecs = embeddings.select(col(idCol).as("vec_id"),
        col(labelCol).as("label"), quantize(col(vecCol)).as("q"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seeds = vecs
      .select(col("vec_id"), col("q"),
        KmvAggregator.kmvHash(col("vec_id")).as("hv"))
      .orderBy(col("hv"), col("vec_id")).limit(k)
      .withColumn("cid",
        (row_number().over(Window.orderBy(col("hv"), col("vec_id"))) - 1)
          .cast("long"))
      .select(col("cid"), col("q").as("c"))
    var centRow = toCentRow(seeds).persist(StorageLevel.MEMORY_AND_DISK)
    for (_ <- 1 to iters) {
      val assigned = assign(vecs, centRow)
      val sums = assigned
        .select(col("cid"), posexplode(col("q")).as(Seq("dim", "qv")))
        .groupBy(col("cid"), col("dim"))
        .agg(sum(col("qv")).as("s"), count(lit(1)).as("n"))
        .withColumn("cv",
          expr(s"(s + n * $Shift) div n - $Shift"))
      val updated = sums.groupBy(col("cid"))
        .agg(transform(sort_array(collect_list(struct(col("dim"), col("cv")))),
          s => s.getField("cv")).as("c"))
      // empty clusters keep their previous centroid
      val prev = centRow.select(explode(col("cents")).as("pc"))
        .select(col("pc.cid").as("cid"), col("pc.c").as("c_prev"))
      val next = prev.join(updated, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("c"), col("c_prev")).as("c"))
      centRow = toCentRow(next).persist(StorageLevel.MEMORY_AND_DISK)
    }
    assign(vecs, centRow)
      .crossJoin(broadcast(centRow))
      .withColumn("centroid",
        element_at(filter(col("cents"), s => s.getField("cid") === col("cid")), 1)
          .getField("c"))
      .select(col("vec_id"), col("label"), col("cid"), col("centroid"))
  }

  /** q124's rollup: per-(cluster, label) membership counts with the
    * cluster's centroid checksum (Σ_d c_d — pins the full centroid
    * evolution, not just the partition). */
  def kmeansLabelProfile(embeddings: DataFrame, idCol: String, vecCol: String,
                         labelCol: String, k: Int, iters: Int): DataFrame =
    kmeansAssign(embeddings, idCol, vecCol, labelCol, k, iters)
      .groupBy(col("cid"), col("label"))
      .agg(count(lit(1)).as("n"),
        first(aggregate(col("centroid"), lit(0L), (acc, x) => acc + x))
          .as("centroid_sum"))
      .orderBy(col("cid"), col("label"))

  /** Semantic deduplication (SemDeDup — Abbas et al. 2023,
    * arXiv:2303.09540): k-means clusters as similarity BLOCKING, then
    * within-cluster cosine pruning — the quadratic pair search runs only
    * inside each semantic cluster, never across the corpus. The third
    * blocking strategy next to LSH bands (q27/q69/q104) and prefix
    * filtering (q129), and the one that catches SEMANTIC near-dups
    * (paraphrases mapped close in embedding space) the lexical families
    * can't see.
    *
    * Integer-exact formulation so the whole decision replays in the
    * oracle: vectors re-quantized at 2^10 (a power of two — the double
    * multiply is exact), and cos(a,b) ≥ τ for τ = tauNum/tauDen tested
    * as dot > 0 ∧ dot²·tauDen² ≥ tauNum²·‖a‖²·‖b‖² — all associative
    * integer arithmetic (unit-norm inputs keep every term < 2^54).
    * Survivor rule: within a cluster, a vector is dropped iff some
    * τ-similar vector precedes it in (sha-hash, id) admission order —
    * the same deterministic content-independent order the diversity
    * sampler and temperature mixture use. Like the paper's method, the
    * drop decision is conditional on the clustering: a τ-similar pair
    * split across cluster boundaries is NOT dropped (documented recall
    * property of clustering-as-blocking).
    *
    * 100 TB shape: the pair join is keyed by cid, so parallelism equals
    * the cluster count — production k scales with corpus size (the paper
    * runs 50k clusters on 5B docs) keeping per-cluster pair volume
    * bounded and the cid hash partitioning well-spread; each side of the
    * join moves one (cid, id, hash, 8·dim-byte qvec, norm) row per
    * vector, and the drop set that leaves the join carries bare ids. */
  def semDedup(embeddings: DataFrame, idCol: String, vecCol: String,
               labelCol: String, k: Int, iters: Int,
               tauNum: Long = 19, tauDen: Long = 20): DataFrame = {
    require(tauNum > 0 && tauDen >= tauNum,
      s"tau out of range: $tauNum/$tauDen")
    require(tauDen <= (1L << 15),
      s"tauDen $tauDen > 2^15: the norm cap √(2^63/tauDen²) would drop " +
        "below any realistic quantized norm; reduce the fraction by gcd")
    import org.apache.spark.storage.StorageLevel
    val simScale = 1L << 10
    // Overflow-safety of the integer τ-test: Cauchy–Schwarz bounds
    // dot² ≤ n2a·n2b and tauNum ≤ tauDen, so BOTH sides of
    // dot²·tauDen² ≥ tauNum²·n2a·n2b are ≤ tauDen²·n2a·n2b. Capping
    // each per-row norm at ⌊√(2^63/tauDen²)⌋ therefore keeps every
    // intermediate inside Long for ANY accepted row — no silent
    // wraparound is reachable on non-ANSI sessions regardless of the
    // τ fraction (an unreduced 95/100 just tightens the cap slightly
    // vs 19/20; unit-norm vectors at the 2^10 scale sit at n2 ≈ 2^20,
    // far under the cap until tauDen nears 2^15).
    val n2Cap = math.min(1L << 27,
      math.floor(math.sqrt((Long.MaxValue / (tauDen * tauDen)).toDouble))
        .toLong - 1)
    val assigned = kmeansAssign(embeddings, idCol, vecCol, labelCol, k, iters)
      .select(col("vec_id"), col("label"), col("cid"))
    val qv = embeddings.select(col(idCol).as("vec_id"),
      transform(col(vecCol), x => floor(x.cast("double") * simScale)
        .cast("long")).as("qs"))
    val m = assigned.join(qv, Seq("vec_id"))
      .withColumn("hv", KmvAggregator.kmvHash(col("vec_id")))
      .withColumn("n2", graft.expressions.LongDot(col("qs"), col("qs")))
      // ‖q‖² ≤ min(2^27, ⌊√(2^63/tauDen²)⌋) keeps dot²·tauDen² and
      // tauNum²·n2a·n2b inside Long — the unit-norm precondition the
      // integer test relies on, made LOUD instead of an anonymous
      // overflow error (or silent wrap on a non-ANSI session) when
      // someone feeds unnormalized embeddings
      .withColumn("n2",
        when(col("n2") <= lit(n2Cap), col("n2"))
          .otherwise(raise_error(concat(
            lit("semDedup: embedding norm too large for the integer "),
            lit("cosine gate (n2="), col("n2").cast("string"), lit(")")))))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val a = m.select(col("cid"), col("vec_id").as("id_a"),
      col("hv").as("hv_a"), col("qs").as("q_a"), col("n2").as("n2_a"))
    val b = m.select(col("cid"), col("vec_id").as("id_b"),
      col("hv").as("hv_b"), col("qs").as("q_b"), col("n2").as("n2_b"))
    val dropped = a.join(b, Seq("cid"))
      .filter(struct(col("hv_a"), col("id_a")) < struct(col("hv_b"), col("id_b")))
      .withColumn("dot", graft.expressions.LongDot(col("q_a"), col("q_b")))
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * lit(tauDen * tauDen) >=
          lit(tauNum * tauNum) * col("n2_a") * col("n2_b"))
      .select(col("id_b").as("vec_id")).distinct()
    m.select(col("cid"), col("vec_id"), col("label"))
      .join(dropped.withColumn("dp", lit(true)), Seq("vec_id"), "left")
      .withColumn("kept", col("dp").isNull)
      .select(col("cid"), col("vec_id"), col("label"), col("kept"))
  }

  /** Product-quantization ANN (Jégou, Douze & Schmid, TPAMI 2011) — the
    * fourth ANN tier next to brute force (q26), LSH (q106), and IVF
    * (q46), and the one production vector stores lean on for memory:
    * vectors are split into `m` subspaces, each subspace k-means'd into
    * a tiny codebook, and every vector stored as m small codes; query
    * distance is the ADC sum of per-subspace lookup-table entries — the
    * full vector is never touched at query time.
    *
    * Integer-exact end to end (the q124 formulation per subspace:
    * power-of-two quantization, shifted floor-division centroid
    * updates, (hash, id) seeds shared across subspaces), so codebooks,
    * codes, LUTs, and ADC distances are all associative integer
    * arithmetic — the ENTIRE index build and query replay in an ANSI
    * oracle (q137's hash gate), and ranks tie-break on (dist, id) with
    * no float anywhere.
    *
    * 100 TB shape: the codebook (m·k subvectors) is a ONE-ROW broadcast
    * for both training assignment and the query LUT; each training
    * iteration is one scan of the subvector frame plus an (m·k·dims)-
    * row aggregate; the query phase is one broadcast-LUT join over the
    * CODE table (m shorts per vector — the point of PQ) with map-side
    * partial sums. Nothing vector-sized ever shuffles after encoding.
    * The LUT is (queries · m · k) rows, so the broadcast shape holds
    * only for a BOUNDED query batch — that is the serving contract
    * (queries arrive in batches; `queryMod` merely derives a bounded
    * demo batch from the corpus here). Do not point queryMod at a
    * corpus-scale query set: the LUT broadcast is the thing that must
    * stay small, everything corpus-sized stays distributed.
    */
  def pqTopK(embeddings: DataFrame, idCol: String, vecCol: String,
             dims: Int, m: Int, k: Int, iters: Int, topK: Int,
             queryMod: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val idx = buildPqIndex(embeddings, idCol, vecCol, dims, m, k, iters)
    val lut = pqLut(idx, queryMod, dims / m)
    val dists = idx.codes.join(broadcast(lut), Seq("sm", "cid"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("dm")).as("dist"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("neighbor_id"))
    dists.filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }

  /** PQ index internals shared by [[pqTopK]] and [[ivfPqTopK]]:
    * quantized vectors, the subvector frame, the trained one-row
    * codebook, and the per-vector code table. */
  private case class PqIndex(vecs: DataFrame, sub: DataFrame,
                             centRow: DataFrame, codes: DataFrame)

  private def buildPqIndex(embeddings: DataFrame, idCol: String,
                           vecCol: String, dims: Int, m: Int, k: Int,
                           iters: Int): PqIndex = {
    require(dims % m == 0, s"dims $dims not divisible by m $m")
    require(k >= 2 && k <= 256 && iters >= 1 && iters <= 10, "bad k/iters")
    import org.apache.spark.storage.StorageLevel
    import org.apache.spark.sql.expressions.Window
    val sd = dims / m
    val vecs = embeddings.select(col(idCol).as("vec_id"),
        quantize(col(vecCol)).as("q"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sub = vecs.select(col("vec_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sm"), col("q"))
      .withColumn("qs", expr(s"slice(q, sm * $sd + 1, $sd)"))
      .select(col("vec_id"), col("sm"), col("qs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seeds = vecs
      .select(col("vec_id"), KmvAggregator.kmvHash(col("vec_id")).as("hv"))
      .orderBy(col("hv"), col("vec_id")).limit(k)
      .withColumn("cid",
        (row_number().over(Window.orderBy(col("hv"), col("vec_id"))) - 1)
          .cast("long"))
      .select(col("vec_id"), col("cid"))
    def toRow(cents: DataFrame): DataFrame =
      cents.agg(sort_array(collect_list(
        struct(col("sm"), col("cid"), col("c")))).as("cents"))
    var centRow = toRow(sub.join(seeds, Seq("vec_id"))
        .select(col("sm"), col("cid"), col("qs").as("c")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def assign(cr: DataFrame): DataFrame =
      sub.crossJoin(broadcast(cr))
        .withColumn("best", array_min(transform(
          filter(col("cents"), c => c.getField("sm") === col("sm")),
          c => struct(
            graft.expressions.LongSqDist(col("qs"), c.getField("c"))
              .as("dist"),
            c.getField("cid").as("cid")))))
        .select(col("vec_id"), col("sm"), col("qs"),
          col("best").getField("cid").as("cid"))
    for (_ <- 1 to iters) {
      val sums = assign(centRow)
        .select(col("sm"), col("cid"), posexplode(col("qs")).as(Seq("dim", "qv")))
        .groupBy(col("sm"), col("cid"), col("dim"))
        .agg(sum(col("qv")).as("s"), count(lit(1)).as("n"))
        .withColumn("cv", expr(s"(s + n * $Shift) div n - $Shift"))
      val upd = sums.groupBy(col("sm"), col("cid"))
        .agg(transform(sort_array(collect_list(struct(col("dim"), col("cv")))),
          x => x.getField("cv")).as("c"))
      val prev = centRow.select(explode(col("cents")).as("pc"))
        .select(col("pc.sm").as("sm"), col("pc.cid").as("cid"),
          col("pc.c").as("c_prev"))
      val next = prev.join(upd, Seq("sm", "cid"), "left")
        .select(col("sm"), col("cid"),
          coalesce(col("c"), col("c_prev")).as("c"))
      centRow = toRow(next).persist(StorageLevel.MEMORY_AND_DISK)
    }
    val codes = assign(centRow).select(col("vec_id"), col("sm"), col("cid"))
    PqIndex(vecs, sub, centRow, codes)
  }

  /** Per-query ADC lookup table: distance from each query subvector to
    * every codebook centroid of its subspace — (queries · m · k) rows,
    * broadcast-sized for a bounded query batch (the serving contract). */
  private def pqLut(idx: PqIndex, queryMod: Long, sd: Int): DataFrame =
    idx.sub.filter(pmod(col("vec_id"), lit(queryMod)) === 0)
      .select(col("vec_id").as("query_id"), col("sm"), col("qs"))
      .crossJoin(broadcast(idx.centRow))
      .select(col("query_id"), col("sm"), col("qs"),
        explode(filter(col("cents"), c => c.getField("sm") === col("sm")))
          .as("ce"))
      .select(col("query_id"), col("sm"), col("ce").getField("cid").as("cid"),
        graft.expressions.LongSqDist(col("qs"), col("ce").getField("c"))
          .as("dm"))

  /** Composed IVF-PQ ANN — the production FAISS serving shape (Jégou
    * et al. 2011 §IV: `IVFADC`), uniting the two halves this engine
    * already gates separately: q46's inverted-file cell routing bounds
    * WHICH vectors are scored, q137's product-quantization ADC scores
    * them without ever touching the full vectors. A query probes its
    * `nprobe` nearest coarse cells and re-ranks only the vectors
    * ASSIGNED to those cells by summed codebook-lookup distances.
    *
    * Integer-exact end to end: coarse routing uses squared L2 on the
    * q124-quantized vectors against a deterministic sha-ordered coarse
    * sample (the q46 centroid recipe with an `:ivfpq` tag, scored in
    * integers rather than cosine doubles), and the PQ half is q137's
    * integer codebook/LUT/ADC unchanged — so cells, assignments,
    * probes, codes, and final (dist, id) ranks all replay in an ANSI
    * oracle with no rounding marker.
    *
    * 100 TB shape: the coarse cell array (cells × dims longs) and the
    * codebook are ONE-ROW broadcasts; routing and probe selection are
    * IN-ROW array operations over the broadcast cells (sort_array of a
    * cells-length struct array — no window, no shuffle); the candidate
    * join exchanges (query_id | neighbor_id, cell_id) id pairs keyed on
    * cell_id; ADC re-rank joins candidates to the m-shorts code table
    * and the broadcast LUT with map-side partial sums. Versus q137,
    * the scored volume drops from |corpus| to |probed cells| — the
    * knob (`nprobe`/`cells`) that makes exhaustive ADC affordable; the
    * full vectors are touched only at index build, never at query
    * time. Returns (query_id, neighbor_id, dist, rank ≤ topK). */
  def ivfPqTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                dims: Int, m: Int, k: Int, iters: Int, cells: Int,
                nprobe: Int, topK: Int, queryMod: Long): DataFrame = {
    require(cells >= 1 && cells <= 65536, s"cells out of range: $cells")
    require(nprobe >= 1 && nprobe <= cells, s"nprobe out of range: $nprobe")
    require(topK >= 1, s"bad topK: $topK")
    import org.apache.spark.sql.expressions.Window
    val idx = buildPqIndex(embeddings, idCol, vecCol, dims, m, k, iters)
    // coarse cells: sha-ordered deterministic sample (q46's recipe);
    // cell_id 0..cells−1 in (hash, id) order — the window runs over the
    // `cells`-row sample, never the corpus
    val cw = Window.orderBy(
      sha2(concat(col("vec_id").cast("string"), lit(":ivfpq")), 256),
      col("vec_id"))
    val cellRow = broadcast(idx.vecs
      .orderBy(sha2(concat(col("vec_id").cast("string"), lit(":ivfpq")), 256),
        col("vec_id"))
      .limit(cells)
      .withColumn("cell_id", (row_number().over(cw) - 1).cast("long"))
      .agg(sort_array(collect_list(
        struct(col("cell_id"), col("q").as("cq")))).as("cls")))
    // in-row routing: per-vector (dist, cell_id) ranking of every cell
    def routed = idx.vecs.crossJoin(cellRow)
      .withColumn("cd", sort_array(transform(col("cls"), c =>
        struct(
          graft.expressions.LongSqDist(col("q"), c.getField("cq"))
            .as("dist"),
          c.getField("cell_id").as("cell_id")))))
    val assigned = routed.select(col("vec_id").as("neighbor_id"),
      element_at(col("cd"), 1).getField("cell_id").as("cell_id"))
    val probes = routed.filter(pmod(col("vec_id"), lit(queryMod)) === 0)
      .select(col("vec_id").as("query_id"),
        explode(slice(col("cd"), 1, nprobe)).as("p"))
      .select(col("query_id"), col("p").getField("cell_id").as("cell_id"))
    val candidates = probes.join(assigned, Seq("cell_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
    val lut = pqLut(idx, queryMod, dims / m)
    val dists = candidates
      .join(idx.codes.withColumnRenamed("vec_id", "neighbor_id"),
        Seq("neighbor_id"))
      .join(broadcast(lut), Seq("query_id", "sm", "cid"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("dm")).as("dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("neighbor_id"))
    dists.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }

  /** Cluster-balanced DIVERSITY SAMPLING — the curation use of k-means
    * (q125): take at most `m` vectors per semantic cluster, chosen by
    * hash order (deterministic, content-independent within the
    * cluster — the same admission rule as the temperature mixture's).
    * A plain top-n sample over-represents the dominant mode; capping
    * per cluster yields coverage of every mode the clustering found.
    * The per-cluster rank is a WindowGroupLimit plan: only ≤ m rows
    * per cluster survive each task before the window's exchange. */
  def diversitySample(embeddings: DataFrame, idCol: String, vecCol: String,
                      labelCol: String, k: Int, iters: Int,
                      m: Int): DataFrame = {
    require(m >= 1, s"m out of range: $m")
    val w = Window.partitionBy(col("cid"))
      .orderBy(KmvAggregator.kmvHash(col("vec_id")), col("vec_id"))
    kmeansAssign(embeddings, idCol, vecCol, labelCol, k, iters)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= m)
      .select(col("cid"), col("vec_id"), col("label"))
      .orderBy(col("cid"), col("vec_id"))
  }

  /** Contrastive training-pair mining from semantic clusters — the
    * supervision generator for embedding-model training (the
    * cluster-as-weak-label recipe): every member of a multi-member
    * k-means cluster becomes an ANCHOR, its POSITIVE is the cyclically
    * next member of the same cluster in content-hash order, and its
    * NEGATIVE is a hash-aligned member of the NEXT cluster
    * ((cid+1) mod k) — all picks deterministic (the [[diversitySample]]
    * hash order), so retries, layouts, and engines mine the same pairs
    * (q203's hash gate replays kmeans + ranks + both pick rules).
    *
    * Pick rules, exactly as the oracle replays them (r = anchor's
    * within-cluster (hash, id) rank, sz = cluster size):
    *   positive rank = (r mod sz) + 1      (≠ r whenever sz ≥ 2;
    *                                        singleton clusters mine
    *                                        no anchors)
    *   negative rank = ((r−1) mod sz') + 1 in cluster (cid+1) mod k
    *
    * Documented edge: if k-means leaves cluster (cid+1) mod k EMPTY
    * (possible — a centroid can strand with no nearest points), the
    * anchors of cluster cid have no negative under this rule and are
    * DROPPED (the inner join with the size table). That keeps the pick
    * rule a pure function the oracle replays verbatim; a fallback to
    * the next non-empty cluster would make every pick depend on the
    * global emptiness pattern. Requires k ≥ 2 — with one cluster the
    * "negative" would come from the anchor's own cluster.
    *
    * Scale shape: one kmeans assignment pass, ONE cluster-keyed window
    * (rank + size share it), two rank-equi-joins (positives within the
    * cluster partition, negatives via the 8-row broadcast size table +
    * a cluster-keyed join) — no pairwise anything. Returns
    * (anchor_id, cid, pos_id, neg_cid, neg_id).
    *
    * Caching contract: the ranked assignment is localCheckpointed (one
    * kmeans run feeds anchors and both pick sides); its blocks free
    * when the returned frame is garbage-collected. */
  def contrastivePairs(embeddings: DataFrame, idCol: String, vecCol: String,
                       labelCol: String, k: Int, iters: Int): DataFrame = {
    // k = 1 would draw the "negative" from the anchor's own (only)
    // cluster — a contradiction in terms, not a degenerate case worth
    // supporting (ADVICE r10)
    require(k >= 2, s"contrastivePairs needs k >= 2 clusters, got $k")
    val w = Window.partitionBy(col("cid"))
      .orderBy(KmvAggregator.kmvHash(col("vec_id")), col("vec_id"))
    val ranked = kmeansAssign(embeddings, idCol, vecCol, labelCol, k, iters)
      .select(col("vec_id"), col("cid"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("sz", count(lit(1))
        .over(Window.partitionBy(col("cid"))))
      .localCheckpoint() // one kmeans run feeds anchors + both pick sides
    val sizes = broadcast(ranked.groupBy(col("cid").as("ncid"))
      .agg(max(col("sz")).as("nsz")))
    val pos = ranked.select(col("cid"), col("rnk").as("prnk"),
      col("vec_id").as("pos_id"))
    val neg = ranked.select(col("cid").as("ncid"), col("rnk").as("nrnk"),
      col("vec_id").as("neg_id"))
    ranked.filter(col("sz") >= 2)
      .withColumn("prnk", (col("rnk") % col("sz")) + 1)
      .join(pos, Seq("cid", "prnk"))
      .withColumn("ncid", (col("cid") + 1) % k)
      .join(sizes, Seq("ncid"))
      .withColumn("nrnk", ((col("rnk") - 1) % col("nsz")) + 1)
      .join(neg, Seq("ncid", "nrnk"))
      .select(col("vec_id").as("anchor_id"), col("cid"),
        col("pos_id"), col("ncid").as("neg_cid"), col("neg_id"))
  }

  /** ±1 sign vector for the 2-D random projection: sign(axis, d) = +1
    * iff the first hex nibble of sha256("dbs:axis:d") is even — the
    * engine's standard replayable-randomness source (any ANSI engine
    * with sha256 reproduces it). */
  private def dbscanSigns(axis: Int, dims: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    (0 until dims).map { d =>
      val h = md.digest(s"dbs:$axis:$d".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) % 2 == 0) 1L else -1L
    }.toArray
  }

  /** Grid-granular DBSCAN over a 2-D signed random projection of the
    * embedding space — the density-clustering member of the family
    * (k-means q124 partitions EVERYTHING; DBSCAN finds dense modes and
    * calls the rest noise, the outlier-discovery shape curation uses to
    * quarantine off-manifold documents). This is the documented
    * cell-granular variant of DBSCAN (density measured per grid cell,
    * the classic grid/cell formulation used at scale): with cell width
    * = eps, a cell holding ≥ `minPts` points is CORE; clusters are the
    * 8-connected components of core cells; a point in a non-core cell
    * 8-adjacent to a core cell is BORDER (joining the minimum adjacent
    * cluster); everything else is NOISE.
    *
    * Every step is integer-exact and replayable (q190's hash gate):
    *   - quantization: q_d = floor(x_d · 2^20) (the q124 rule);
    *   - projection: p_a = Σ_d q_d · sign(a, d), signs from sha256
    *     parity ([[dbscanSigns]]) — a 2-D Johnson-Lindenstrauss-style
    *     signed projection, so "density" is measured in a space whose
    *     construction any engine replays;
    *   - cells: c = floor(p / cellWidth) via exact double floor (both
    *     engines floor identically; |p| < 2^31 ≪ 2^53);
    *   - cluster ids: encoded cell keys (cx+2^20)·2^21 + (cy+2^20),
    *     component-minimized; coordinates outside ±2^20 raise loudly.
    *
    * 100 TB shape: two map-only passes over the vectors (cell census,
    * then final labeling) — vectors NEVER join vectors; every other
    * table is cell-granular (occupied cells ≪ points), the core-cell
    * adjacency expands exactly 8 shifted keys per core cell against a
    * broadcast shift table, and the component step is
    * [[Graphs.ccLargeSmallStar]] on the (tiny) core-cell graph, which
    * asserts convergence loudly. The cell census is eagerly
    * `localCheckpoint`ed (it is read by three downstream branches;
    * cells are bounded by occupied-cell count, not corpus size).
    *
    * Returns (vec_id, role ∈ core|border|noise, cluster; noise = −1). */
  def gridDbscan(embeddings: DataFrame, idCol: String, vecCol: String,
                 dims: Int, cellWidth: Long, minPts: Long,
                 ccRounds: Int = 8): DataFrame = {
    val pts = dbscanPts(embeddings, idCol, vecCol, dims, cellWidth)
    val states = cellStates(
      cellCensus(embeddings, idCol, vecCol, dims, cellWidth),
      minPts, ccRounds)
    pts.withColumn("cell", cellKey(col("cx"), col("cy")))
      .join(states.select(col("cell"), col("role"), col("cluster")),
        Seq("cell"), "left")
      .select(col("vec_id"),
        coalesce(col("role"), lit("noise")).as("role"),
        coalesce(col("cluster"), lit(-1L)).as("cluster"))
  }

  private val DbsBound = 1L << 20

  /** Encoded cell key (cx+2^20)·2^21 + (cy+2^20); out-of-range
    * coordinates raise loudly. */
  private def cellKey(cx: Column, cy: Column): Column =
    when(abs(cx) >= DbsBound || abs(cy) >= DbsBound,
      raise_error(concat(lit("gridDbscan cell out of range: "),
        cx.cast("string"), lit(","), cy.cast("string"))).cast("long"))
      .otherwise((cx + DbsBound) * lit(2L * DbsBound) + (cy + DbsBound))

  /** (vec_id, cx, cy) of every vector — one map-only projection pass. */
  private def dbscanPts(vecs: DataFrame, idCol: String, vecCol: String,
                        dims: Int, cellWidth: Long): DataFrame = {
    require(cellWidth >= 1, s"cellWidth out of range: $cellWidth")
    def proj(axis: Int): Column =
      aggregate(zip_with(quantize(col(vecCol)),
          array(dbscanSigns(axis, dims).map(lit(_)): _*), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)
    // a vector whose length ≠ dims null-pads the zip_with and the sum
    // goes null — turn that into a loud error, not a silent noise point
    def toCell(p: Column): Column =
      when(p.isNull, raise_error(
        lit(s"gridDbscan: vector length != dims ($dims) or null element"))
        .cast("long"))
        .otherwise(floor(p.cast("double") / cellWidth.toDouble).cast("long"))
    vecs.select(col(idCol).cast("long").as("vec_id"),
      toCell(proj(0)).as("cx"), toCell(proj(1)).as("cy"))
  }

  /** Occupied-cell census (cx, cy, cell, cnt) — the grid-DBSCAN
    * STANDING STATE a streaming corpus maintains (counts only grow, so
    * census rows merge by addition). Eagerly localCheckpointed: it is
    * cell-granular (≪ points) and read by several downstream branches;
    * the blocks free when the frames that read them are
    * garbage-collected (caching contract as in [[Diff.klSourceDrift]]). */
  def cellCensus(vecs: DataFrame, idCol: String, vecCol: String,
                 dims: Int, cellWidth: Long): DataFrame =
    dbscanPts(vecs, idCol, vecCol, dims, cellWidth)
      .groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cell", cellKey(col("cx"), col("cy")))
      .localCheckpoint()

  /** The 8 neighbor offsets as a literal-array explode — a pure
    * map-side fan-out, not a (nested-loop-joined) relation. */
  private def shiftArr: Column =
    array((for { dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0 }
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)

  /** Cell-level DBSCAN states from a census: (cx, cy, cell, cnt, role,
    * cluster) for EVERY occupied cell — core cells carry their
    * 8-connected-component label ([[Graphs.ccLargeSmallStar]], loud
    * convergence assert), border cells the minimum adjacent cluster,
    * noise cells −1. */
  def cellStates(census: DataFrame, minPts: Long, ccRounds: Int): DataFrame = {
    require(minPts >= 1, s"minPts out of range: $minPts")
    val core = census.filter(col("cnt") >= minPts)
      .select(col("cx"), col("cy"), col("cell"))
    val corePairs = core
      .select(col("cell").as("id_a"), col("cx"), col("cy"),
        explode(shiftArr).as("sh"))
      .select(col("id_a"),
        cellKey(col("cx") + col("sh.dx"), col("cy") + col("sh.dy")).as("id_b"))
      .join(core.select(col("cell").as("id_b")), Seq("id_b"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val comp = Graphs.ccLargeSmallStar(corePairs, ccRounds)
    // isolated core cells (no core neighbor) are their own cluster
    val coreLab = core
      .join(comp.withColumnRenamed("id", "cell"), Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("label"), col("cell")).as("cluster"))
    statesFromCore(census, coreLab, minPts)
  }

  /** Assemble per-cell (role, cluster) from a census and the core-cell
    * cluster labels — shared by the batch and incremental paths. */
  private def statesFromCore(census: DataFrame, coreLab: DataFrame,
                             minPts: Long): DataFrame = {
    val borderLab = census.filter(col("cnt") < minPts)
      .select(col("cell"), col("cx"), col("cy"), explode(shiftArr).as("sh"))
      .select(col("cell"),
        cellKey(col("cx") + col("sh.dx"), col("cy") + col("sh.dy")).as("ncell"))
      .join(coreLab.select(col("cell").as("ncell"), col("cluster")),
        Seq("ncell"))
      .groupBy(col("cell"))
      .agg(min(col("cluster")).as("cluster"))
    census
      .join(coreLab.select(col("cell"), col("cluster").as("core_cl")),
        Seq("cell"), "left")
      .join(borderLab.withColumnRenamed("cluster", "bord_cl"),
        Seq("cell"), "left")
      .select(col("cx"), col("cy"), col("cell"), col("cnt"),
        when(col("core_cl").isNotNull, "core")
          .when(col("bord_cl").isNotNull, "border")
          .otherwise("noise").as("role"),
        coalesce(col("core_cl"), col("bord_cl"), lit(-1L)).as("cluster"))
  }

  /** INCREMENTAL grid-DBSCAN state maintenance — the standing-corpus
    * member of the clustering family (the q195 pattern, density
    * edition): a delta batch of vectors arrives, the cell census
    * merges BY ADDITION (counts only grow — core-ness is monotone, so
    * the standing core graph only gains nodes and edges, never loses
    * them), and the core-cell component labels update through
    * [[Graphs.incrementalCc]]: only components touched by NEWLY-core
    * cells re-solve; a standing megacluster's labels pass through
    * untouched. Delta-priced: iteration work is bounded by newly-core
    * cells + their touched components, never the standing grid. Border
    * and noise roles are re-derived from the merged census — they are
    * cell-granular map/join work, not iteration.
    *
    * Inputs: `standingCensus` ([[cellCensus]] of the corpus so far),
    * `standingLabels` (cell, cluster) of the standing CORE cells
    * ([[cellStates]] rows with role = core), and the delta vectors.
    * Returns the MERGED [[cellStates]] — ≡ a full recompute on the
    * union corpus (q197's oracle + spec gate). */
  def incrementalCellDbscan(standingCensus: DataFrame,
                            standingLabels: DataFrame, newVecs: DataFrame,
                            idCol: String, vecCol: String, dims: Int,
                            cellWidth: Long, minPts: Long,
                            ccRounds: Int = 8): DataFrame = {
    require(minPts >= 1, s"minPts out of range: $minPts")
    val deltaCensus = cellCensus(newVecs, idCol, vecCol, dims, cellWidth)
    val merged = mergeCensus(standingCensus, deltaCensus)
    statesFromCore(merged,
      mergeCoreLabels(merged, standingLabels, minPts, ccRounds), minPts)
  }

  /** Add two censuses (counts sum; core-ness is monotone under
    * addition). Eagerly localCheckpointed like [[cellCensus]]. */
  def mergeCensus(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("cx"), col("cy"), col("cnt"))
      .unionByName(b.select(col("cx"), col("cy"), col("cnt")))
      .groupBy(col("cx"), col("cy"))
      .agg(sum(col("cnt")).as("cnt"))
      .withColumn("cell", cellKey(col("cx"), col("cy")))
      .localCheckpoint()

  /** Update standing CORE labels against a (just-merged) census: cells
    * core in the census but absent from `standingLabels` are
    * newly-core; their adjacency edges feed [[Graphs.incrementalCc]]
    * (only touched components re-solve) and isolated newcomers label
    * themselves. Returns the full (cell, cluster) core-label table —
    * shared by [[incrementalCellDbscan]] and the streaming drain's
    * per-batch merge AND its startup repair (a label table that
    * missed a batch is repaired by exactly this call: the missed
    * cells are simply still "newly-core"). */
  def mergeCoreLabels(census: DataFrame, standingLabels: DataFrame,
                      minPts: Long, ccRounds: Int,
                      toFixedPoint: Boolean = false): DataFrame = {
    require(minPts >= 1, s"minPts out of range: $minPts")
    val coreM = census.filter(col("cnt") >= minPts)
      .select(col("cx"), col("cy"), col("cell"))
    // the standing label table's key set IS the standing core set
    val newCore = coreM.join(
      standingLabels.select(col("cell")), Seq("cell"), "left_anti")
    // new core-graph edges = adjacency incident to a newly-core cell
    // (old-core ↔ old-core adjacencies already live in standingLabels'
    // clusters); symmetric closure is the star iteration's job
    val newEdges = newCore
      .select(col("cell").as("id_a"), col("cx"), col("cy"),
        explode(shiftArr).as("sh"))
      .select(col("id_a"),
        cellKey(col("cx") + col("sh.dx"), col("cy") + col("sh.dy")).as("id_b"))
      .join(coreM.select(col("cell").as("id_b")), Seq("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val incLab = Graphs.incrementalCc(
      standingLabels.select(col("cell").as("id"), col("cluster").as("label")),
      newEdges, ccRounds, toFixedPoint)
      .select(col("id").as("cell"), col("label").as("cluster"))
    // newly-core cells with NO core neighbor never enter the delta
    // edge set — they are their own singleton cluster
    val isolated = newCore.select(col("cell"))
      .join(incLab.select(col("cell")), Seq("cell"), "left_anti")
      .select(col("cell"), col("cell").as("cluster"))
    incLab.unionByName(isolated)
  }

  /** (vec_id, cx, cy) of every vector — the public face of the
    * projection pass, for callers that maintain their own point log
    * (the streaming drain's idempotency ledger). */
  def pointCells(vecs: DataFrame, idCol: String, vecCol: String,
                 dims: Int, cellWidth: Long): DataFrame =
    dbscanPts(vecs, idCol, vecCol, dims, cellWidth)

  // ---- IVF-PQ serving-state maintenance surface (VERDICT r10 #7) ----
  //
  // The composed index [[ivfPqTopK]] trains, encodes, and probes in one
  // plan — right for a query, wrong for a STANDING index a stream
  // maintains. These three functions split the same integer-exact
  // recipes (the ':ivfpq' sha coarse sample, the kmvHash-seeded Lloyd
  // codebook, squared-L2 ADC) along the serving lifecycle: TRAIN on a
  // corpus snapshot → persist flat tables; ASSIGN+ENCODE any later
  // batch against the persisted model without retraining; PROBE a
  // bounded query batch against model + entry table. A drain prices
  // O(batch) per micro-batch; the codebook refreshes only on the
  // compaction trigger ([[graft.streaming.IvfPqStream]]).

  /** Train the IVF-PQ model on a snapshot: returns one flat table —
    * coarse-cell rows (part = 'cell': cell_id, c = quantized centroid)
    * and codebook rows (part = 'cb': sm, cid, c) — so the WHOLE model
    * swaps atomically through one path (a two-table model could strand
    * cells and codebook from different generations across a crash).
    * Recipes are [[ivfPqTopK]]'s verbatim. */
  def pqTrainModel(embeddings: DataFrame, idCol: String, vecCol: String,
                   dims: Int, m: Int, k: Int, iters: Int,
                   cells: Int): DataFrame = {
    require(cells >= 1 && cells <= 65536, s"cells out of range: $cells")
    val idx = buildPqIndex(embeddings, idCol, vecCol, dims, m, k, iters)
    val cw = Window.orderBy(
      sha2(concat(col("vec_id").cast("string"), lit(":ivfpq")), 256),
      col("vec_id"))
    val cellRows = idx.vecs
      .orderBy(sha2(concat(col("vec_id").cast("string"), lit(":ivfpq")), 256),
        col("vec_id"))
      .limit(cells)
      .withColumn("cell_id", (row_number().over(cw) - 1).cast("long"))
      .select(lit("cell").as("part"), col("cell_id"),
        lit(null).cast("long").as("sm"), lit(null).cast("long").as("cid"),
        col("q").as("c"))
    val cbRows = idx.centRow.select(explode(col("cents")).as("ce"))
      .select(lit("cb").as("part"), lit(null).cast("long").as("cell_id"),
        col("ce.sm").cast("long").as("sm"), col("ce.cid").as("cid"),
        col("ce.c").as("c"))
    cellRows.unionByName(cbRows)
  }

  private def modelCellRow(model: DataFrame): DataFrame =
    broadcast(model.filter(col("part") === "cell")
      .select(struct(col("cell_id"), col("c").as("cq")).as("s"))
      .agg(sort_array(collect_list(col("s"))).as("cls")))

  private def modelCentRow(model: DataFrame): DataFrame =
    broadcast(model.filter(col("part") === "cb")
      .select(struct(col("sm").cast("int").as("sm"), col("cid"),
        col("c")).as("s"))
      .agg(sort_array(collect_list(col("s"))).as("cents")))

  /** Assign + encode a vector batch against an EXISTING model — no
    * training, no corpus access: in-row coarse routing against the
    * broadcast cell array, then per-subvector nearest-codeword argmin
    * against the broadcast codebook. Returns one row per (vec, sm):
    * (vec_id, cell_id, sm, cid) — the standing ENTRY table's schema.
    * This is the per-drain cost: O(batch · cells + batch · m · k)
    * map-side work, nothing corpus-sized. */
  def pqAssignEncode(vecs: DataFrame, idCol: String, vecCol: String,
                     dims: Int, m: Int, model: DataFrame): DataFrame = {
    require(dims % m == 0, s"dims $dims not divisible by m $m")
    val sd = dims / m
    val q = vecs.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("q"))
    val routed = q.crossJoin(modelCellRow(model))
      .select(col("vec_id"), col("q"),
        array_min(transform(col("cls"), c => struct(
          graft.expressions.LongSqDist(col("q"), c.getField("cq"))
            .as("dist"),
          c.getField("cell_id").as("cell_id"))))
          .getField("cell_id").as("cell_id"))
    // the exploded subspace index is named `smi`, NOT `sm`: aliasing
    // `sm` and referencing it inside the same select's lambda resolves
    // as a LateralColumnAliasReference and trips an internal error
    routed
      .select(col("vec_id"), col("cell_id"),
        explode(sequence(lit(0), lit(m - 1))).as("smi"), col("q"))
      .withColumn("qs", expr(s"slice(q, smi * $sd + 1, $sd)"))
      .crossJoin(modelCentRow(model))
      .select(col("vec_id"), col("cell_id"), col("smi"),
        array_min(transform(
          filter(col("cents"), c => c.getField("sm") === col("smi")),
          c => struct(
            graft.expressions.LongSqDist(col("qs"), c.getField("c"))
              .as("dist"),
            c.getField("cid").as("cid"))))
          .getField("cid").as("cid"))
      .select(col("vec_id"), col("cell_id"),
        col("smi").cast("long").as("sm"), col("cid"))
  }

  /** ADC probe of a bounded query batch against the standing model +
    * entry table: queries route in-row to their `nprobe` nearest
    * cells, candidates are the entries ASSIGNED to those cells, and
    * ranking is the summed codebook-lookup distance — the entries'
    * full vectors are never touched (they are not even stored).
    * Returns (query_id, neighbor_id, dist, rank ≤ topK). */
  def pqAdcProbe(queries: DataFrame, idCol: String, vecCol: String,
                 dims: Int, m: Int, nprobe: Int, topK: Int,
                 model: DataFrame, entries: DataFrame): DataFrame = {
    require(nprobe >= 1 && topK >= 1, s"bad nprobe/topK: $nprobe/$topK")
    val sd = dims / m
    val q = queries.select(col(idCol).as("query_id"),
      quantize(col(vecCol)).as("q"))
    val probes = q.crossJoin(modelCellRow(model))
      .select(col("query_id"), col("q"),
        explode(slice(sort_array(transform(col("cls"), c => struct(
          graft.expressions.LongSqDist(col("q"), c.getField("cq"))
            .as("dist"),
          c.getField("cell_id").as("cell_id")))), 1, nprobe)).as("p"))
      .select(col("query_id"), col("q"), col("p").getField("cell_id").as("cell_id"))
    val lut = broadcast(q
      .select(col("query_id"),
        explode(sequence(lit(0), lit(m - 1))).as("smi"), col("q"))
      .withColumn("qs", expr(s"slice(q, smi * $sd + 1, $sd)"))
      .crossJoin(modelCentRow(model))
      .select(col("query_id"), col("smi"), col("qs"),
        explode(filter(col("cents"), c => c.getField("sm") === col("smi")))
          .as("ce"))
      .select(col("query_id"), col("smi").cast("long").as("sm"),
        col("ce").getField("cid").as("cid"),
        graft.expressions.LongSqDist(col("qs"), col("ce").getField("c"))
          .as("dm")))
    val cands = probes.select(col("query_id"), col("cell_id"))
      .join(entries.select(col("vec_id").as("neighbor_id"), col("cell_id"),
        col("sm"), col("cid")), Seq("cell_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
    val dists = cands.join(lut, Seq("query_id", "sm", "cid"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("dm")).as("dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("neighbor_id"))
    dists.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }
}
