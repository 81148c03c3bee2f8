package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pinned-seed fixture builders for the scale probes (VERDICT r6 #7).
  *
  * Every corpus [[ScaleProbe]] measures against is derived here, from
  * exactly two deterministic sources: the driver's seed-42 testdata
  * (replication with per-copy suffix tokens) and sha256 chains over row
  * ids (the planted dup graph). Nothing samples a clock or a PRNG, so two
  * invocations produce byte-identical corpora — which is what lets
  * 10×/100×/batch-vs-corpus curves be compared ACROSS rounds instead of
  * only within a run. [[fingerprint]] is the proof hook: ProbeCorpusSpec
  * pins count + order-independent content hash across double builds.
  */
object ProbeCorpus {

  /** `copies`× the documents table: copy c appends " copytok<c>" to the
    * text (so exact/fingerprint dedup stays honest — no two rows are
    * byte-equal) and remaps doc_id to id*copies+c (disjoint, stable).
    * Near-dup (MinHash/LSH) queries must NOT run on replicated text —
    * replication inflates their true pair structure; use [[dupCorpus]]
    * for that family. */
  def replicateDocuments(spark: SparkSession, srcDir: String,
                         copies: Int): DataFrame = {
    val docs = Tables.documents(spark, srcDir)
    (0 until copies).map { c =>
      val text = concat(col("text"), lit(s" copytok$c"))
      docs.select((col("doc_id") * copies + c).as("doc_id"), text.as("text"),
        col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    }.reduce(_ unionByName _)
  }

  /** `copies`× the embeddings table, vectors replicated verbatim
    * (per-vector ops only probe this corpus), ids remapped disjointly. */
  def replicateEmbeddings(spark: SparkSession, srcDir: String,
                          copies: Int): DataFrame = {
    val emb = Tables.embeddings(spark, srcDir)
    (0 until copies).map { c =>
      emb.select((col("vec_id") * copies + c).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _)
  }

  /** `copies`× the events table through the schema-adaptive
    * [[Tables.events]] read (normalized TimestampType ts, round-trips
    * whatever encoding the driver regenerates next). user_id is
    * deliberately NOT remapped: `copies`× rows per key is the dimension
    * the window/as-of machinery has to survive. */
  def replicateEvents(spark: SparkSession, srcDir: String,
                      copies: Int): DataFrame = {
    val ev = Tables.events(spark, srcDir)
    (0 until copies).map { c =>
      ev.select((col("event_id") * copies + c).as("event_id"), col("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
  }

  /** Structure-preserving synthetic dup corpus for the ITERATIVE family
    * (q65 clusters / q80 survivors), which plain replication cannot
    * probe: near-identical copies of every doc would merge clusters
    * across copies and inflate the true pair count quadratically. Docs
    * come in clusters of exactly 3 (cluster g = id div 3) sharing a
    * sha256-derived base text (~640 chars), members 1 and 2 appending a
    * 32-char member-specific suffix — within-cluster char-5-shingle
    * Jaccard ~0.9 (above minhashDupPairs' 0.8 cut), cross-cluster
    * overlap ~0. N× the docs = N× the clusters of the SAME size — the
    * workload iterative label propagation must scale against. `seed`
    * salts the sha chain; the default is the pinned probe seed. */
  def dupCorpus(spark: SparkSession, n: Long,
                seed: String = "dup"): DataFrame = {
    val g = expr("id div 3")
    val m = col("id") % 3
    def sha(tag: Column) =
      sha2(concat(lit(seed + ":"), g.cast("string"), lit(":"), tag), 256)
    val base = concat_ws(" ", (0 until 10).map(c => sha(lit(c.toString))): _*)
    val text = when(m === 0, base).otherwise(concat(base, lit(" "),
      substring(sha(concat(lit("m"), m.cast("string"))), 1, 32)))
    spark.range(n).select(
      col("id").as("doc_id"), text.as("text"), lit("en").as("lang"),
      concat(lit("src"), (g % 5).cast("string")).as("source"),
      length(text).cast("long").as("n_chars"))
  }

  /** `copies`× the events table along the KEY-CARDINALITY axis (VERDICT
    * r7 #4): user_id IS remapped disjointly (uid*copies+c), so the corpus
    * gains `copies`× the users at the ORIGINAL per-key depth — the
    * production growth axis for the window/as-of machinery (more users,
    * same history per user), complementing [[replicateEvents]]'s
    * per-key-depth axis (same users, deeper history). Timestamps pass
    * through unchanged: per-key event sequences are exact copies of a
    * real user's, so per-key work is identical by construction and any
    * super-linear wall growth is attributable to the key dimension. */
  def replicateEventsCardinality(spark: SparkSession, srcDir: String,
                                 copies: Int): DataFrame = {
    val ev = Tables.events(spark, srcDir)
    (0 until copies).map { c =>
      ev.select((col("event_id") * copies + c).as("event_id"), col("ts"),
        (col("user_id") * copies + c).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
  }

  /** Boilerplate-skew corpus for the hot-band probes (VERDICT r7 #1):
    * `hotPerMille`‰ of docs (id % 1000 < hotPerMille) share one
    * seed-derived ~640-char template and differ only in a 16-char
    * per-doc suffix — pairwise char-5-shingle Jaccard ≈ 0.95, so they
    * are TRUE near-dups that collide in essentially every LSH band
    * (the templated-boilerplate corpus shape that survives exact dedup
    * and breaks naive banding); the rest get per-doc unique sha-chain
    * text. Same pinned-seed contract as [[dupCorpus]]: no clock, no
    * PRNG. Batch/corpus splits use the usual mod-10 convention. */
  def boilerplateCorpus(spark: SparkSession, n: Long, hotPerMille: Int = 80,
                        seed: String = "boil"): DataFrame = {
    // block = min(n, 1000): at n >= 1000 this is the original id%1000
    // predicate (probe corpora unchanged); below it the threshold scales
    // so hotPerMille stays a RATE instead of degenerating into a
    // contiguous id-prefix size (n=400 at 250‰ = 100 hot docs, not 250)
    val block = math.min(n, 1000L)
    val isHot = col("id") % block < (hotPerMille.toLong * block / 1000L)
    val template = concat_ws(" ",
      (0 until 10).map(c => sha2(lit(s"$seed:tmpl:$c"), 256)): _*)
    val suffix = substring(
      sha2(concat(lit(s"$seed:h:"), col("id").cast("string")), 256), 1, 16)
    val coldText = concat_ws(" ", (0 until 10).map(c =>
      sha2(concat(lit(s"$seed:c:$c:"), col("id").cast("string")), 256)): _*)
    val text = when(isHot, concat(template, lit(" "), suffix)).otherwise(coldText)
    spark.range(n).select(
      col("id").as("doc_id"), text.as("text"), lit("en").as("lang"),
      when(isHot, lit("boiler")).otherwise(
        concat(lit("src"), (col("id") % 5).cast("string"))).as("source"),
      length(text).cast("long").as("n_chars"))
  }

  /** Embedding analog of [[boilerplateCorpus]]: hot vectors are one
    * seed-derived base vector plus a tiny (1e-4-scale) per-id single-
    * coordinate perturbation — pairwise cosine ≈ 1, identical LSH sign
    * bits, so they pile into the same band values; cold vectors are
    * per-id xxhash64-derived noise (probe-only corpus — in-engine
    * determinism suffices, no SQL replay needed). */
  def boilerplateEmbeddings(spark: SparkSession, n: Long, dim: Int = 64,
                            hotPerMille: Int = 80,
                            seed: String = "boilvec"): DataFrame = {
    val block = math.min(n, 1000L) // same rate-preserving scaling as above
    val isHot = col("id") % block < (hotPerMille.toLong * block / 1000L)
    def unit(h: Column) = (pmod(h, lit(1000L)) - lit(500L)).cast("double") / 500.0
    val dims = sequence(lit(0), lit(dim - 1))
    val base = transform(dims, d => unit(xxhash64(concat(lit(s"$seed:b:"), d))))
    val hotVec = transform(base, (x, i) =>
      when(i === pmod(col("id"), lit(dim.toLong)).cast("int"),
        x + (pmod(col("id"), lit(7L)) + 1).cast("double") * 1e-4).otherwise(x))
    val coldVec = transform(dims, d => unit(
      xxhash64(concat(col("id").cast("string"), lit(s":$seed:"), d))))
    spark.range(n).select(
      col("id").as("vec_id"),
      when(isHot, hotVec).otherwise(coldVec).as("embedding"),
      when(isHot, lit("boiler")).otherwise(lit("noise")).as("label"))
  }

  /** Order-independent corpus digest: (row count, XOR of per-row
    * xxhash64 over the canonical column-name-sorted JSON projection).
    * Two corpora with equal fingerprints are content-identical up to row
    * order — the reproducibility contract ProbeCorpusSpec pins. XOR, not
    * sum: ANSI mode is on and summing 64-bit hashes overflows. */
  def fingerprint(df: DataFrame): (Long, Long) = {
    val row = df.agg(
      count(lit(1)).as("n"),
      expr("bit_xor(" +
        "xxhash64(to_json(struct(" +
        df.columns.sorted.map(c => s"`$c`").mkString(", ") +
        "))))").as("h"))
      .head()
    (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
  }
}
