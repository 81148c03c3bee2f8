package graft

/** Reproducibility contract for the scale-probe corpora (VERDICT r6 #7):
  * two independent builds of every probe corpus must agree on row count
  * AND order-independent content hash, so 10×/100×/batch-vs-corpus
  * curves are comparable across invocations and across rounds. */
class ProbeCorpusSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("replicated document/embedding/event corpora are byte-stable across builds") {
    for ((name, build) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
      "documents" -> (() => ProbeCorpus.replicateDocuments(spark, sfDir, 3)),
      "embeddings" -> (() => ProbeCorpus.replicateEmbeddings(spark, sfDir, 3)),
      "events" -> (() => ProbeCorpus.replicateEvents(spark, sfDir, 3)))) {
      val a = ProbeCorpus.fingerprint(build())
      val b = ProbeCorpus.fingerprint(build())
      assert(a == b, s"$name corpus not reproducible: $a vs $b")
      assert(a._1 > 0, s"$name corpus empty")
    }
  }

  test("replication preserves per-copy row counts and disjoint ids") {
    val src = Tables.documents(spark, sfDir).count()
    val rep = ProbeCorpus.replicateDocuments(spark, sfDir, 3)
    assert(rep.count() == 3 * src)
    assert(rep.select("doc_id").distinct().count() == 3 * src,
      "copy id remap collided")
  }

  test("dupCorpus is pinned-seed reproducible and seed-sensitive") {
    val a = ProbeCorpus.fingerprint(ProbeCorpus.dupCorpus(spark, 300L))
    val b = ProbeCorpus.fingerprint(ProbeCorpus.dupCorpus(spark, 300L))
    assert(a == b, s"dup corpus not reproducible: $a vs $b")
    assert(a._1 == 300L)
    // a different seed must change content (same count) — proving the
    // hash actually covers the text, not just ids
    val c = ProbeCorpus.fingerprint(ProbeCorpus.dupCorpus(spark, 300L, seed = "other"))
    assert(c._1 == 300L && c._2 != a._2, "fingerprint blind to text content")
  }

  test("fingerprint is row-order independent but content sensitive") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    val shuffled = df.orderBy(org.apache.spark.sql.functions.col("s").desc)
    assert(ProbeCorpus.fingerprint(df) == ProbeCorpus.fingerprint(shuffled))
    val changed = Seq((1L, "a"), (2L, "b"), (3L, "d")).toDF("id", "s")
    assert(ProbeCorpus.fingerprint(df) != ProbeCorpus.fingerprint(changed))
  }
}
