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
            aggregate(
              zip_with(col("q"), s.getField("c"), (a, b) => (a - b) * (a - b)),
              lit(0L), (acc, x) => acc + x).as("dist"),
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
}
