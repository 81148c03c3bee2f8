package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(3.0f, 4.0f)),          // norm 5
    (2L, Seq(0.0f, 0.0f)),          // zero vector
    (3L, Seq(-1.0f, 0.5f, 0.25f)),  // negative max-abs
  ).toDF("vec_id", "embedding")

  test("l2Norm and l2Normalize: known values, zero vector stays zero") {
    val got = vecs.select($"vec_id", Embeddings.l2Norm($"embedding").as("n"),
        Embeddings.l2Normalize($"embedding").as("u"))
      .as[(Long, Double, Seq[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 5.0)
    assert(got(1L)._3 == Seq(0.6, 0.8))
    assert(got(2L)._2 == 0.0 && got(2L)._3 == Seq(0.0, 0.0))
    // normalized vectors have unit norm
    val renorm = math.sqrt(got(3L)._3.map(x => x * x).sum)
    assert(math.abs(renorm - 1.0) < 1e-12)
  }

  test("quantizeInt8 round-trips within the grid step; zero vector -> zeros") {
    val q = Embeddings.quantizeInt8($"embedding")
    val got = vecs.select($"vec_id", q.getField("scale").as("s"),
        q.getField("q").as("q"),
        Embeddings.dequantizeInt8(q).as("deq"))
      .as[(Long, Double, Seq[Int], Seq[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 4.0 && got(1L)._3 == Seq(95, 127))
    assert(got(2L)._2 == 0.0 && got(2L)._3 == Seq(0, 0))
    assert(got(3L)._3 == Seq(-127, 64, 32))
    // max reconstruction error <= half a grid step (scale / 127 / 2) + eps
    for ((id, (_, s, _, deq)) <- got if s > 0) {
      val orig = vecs.filter($"vec_id" === id)
        .select($"embedding").as[Seq[Float]].head().map(_.toDouble)
      val err = orig.zip(deq).map { case (a, b) => math.abs(a - b) }.max
      assert(err <= s / 127.0 / 2.0 + 1e-12, s"vec $id err $err")
    }
  }

  test("quantStats (native) ≡ declarative l2Norm/quantizeInt8/dequantize on real data") {
    val real = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding")
    val everything = real.unionByName(vecs)
    val qs = Embeddings.quantStats($"embedding")
    val native = everything.select($"vec_id",
      qs.getField("norm").as("norm"), qs.getField("scale").as("scale"),
      qs.getField("q").as("q"), qs.getField("max_err").as("max_err"))
    val dz = Embeddings.quantizeInt8($"embedding")
    val decl = everything.select($"vec_id",
      Embeddings.l2Norm($"embedding").as("norm"),
      dz.getField("scale").as("scale"), dz.getField("q").as("q"),
      array_max(zip_with(Similarity.asDouble($"embedding"),
        Embeddings.dequantizeInt8(dz), (x, y) => abs(x - y))).as("max_err"))
    // bit-identical: same fold order, widening, and rounding rule
    assert(native.exceptAll(decl).isEmpty && decl.exceptAll(native).isEmpty)
  }

  test("quantStats degenerate inputs: empty array is total (zeros), unlike the null-poisoning declarative chain") {
    val got = Seq((1L, Seq.empty[Float])).toDF("vec_id", "embedding")
      .select(Embeddings.quantStats($"embedding").as("qs"))
      .select($"qs.norm", $"qs.scale", $"qs.q", $"qs.max_err")
      .as[(Double, Double, Seq[Int], Double)].head()
    assert(got == ((0.0, 0.0, Seq.empty[Int], 0.0)))
  }

  test("dimStats: mean/std/min/max per dimension") {
    val df = Seq(
      (1L, Seq(1.0f, 10.0f)),
      (2L, Seq(3.0f, 10.0f)),
    ).toDF("vec_id", "embedding")
    val got = Embeddings.dimStats(df, "embedding")
      .orderBy("dim")
      .as[(Long, Double, Double, Double, Double)].collect().toSeq
    assert(got(0) == ((0L, 2.0, math.sqrt(2.0), 1.0, 3.0)))
    assert(got(1) == ((1L, 10.0, 0.0, 10.0, 10.0)))
  }

  // ---- featureHashVectors (q194) -----------------------------------

  /** Serial reference of the hashing-trick spec. */
  private def fhRef(text: String, dims: Int): (Long, Long, String) = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    val vec = new Array[Long](dims)
    for (t <- toks) {
      val h = md.digest(t.getBytes("UTF-8"))
      var hv = 0L
      for (b <- 0 until 6) hv = (hv << 8) | (h(b) & 0xffL)
      vec((hv % dims).toInt) += (if ((hv / dims) % 2 == 0) 1L else -1L)
    }
    (toks.length.toLong, vec.map(v => v * v).sum, vec.mkString(","))
  }

  test("featureHashVectors matches a serial hashing-trick reference") {
    val docs = Seq(
      (1L, "spark hash spark vector hash spark"),
      (2L, "  leading and   trailing   space  "),
      (3L, ""), // zero tokens → zero vector, zero norm
      (4L, "spark hash spark vector hash spark"), // same text as 1
      (5L, (0 until 200).map(i => s"tok$i").mkString(" ")))
    val got = Embeddings.featureHashVectors(
        docs.toDF("doc_id", "text"), "doc_id", "text", 64)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val want = docs.map { case (id, t) => id -> fhRef(t, 64) }.toMap
    assert(got == want)
    // identical text → identical vector; CSV has exactly dims entries
    assert(got(1L) == got(4L))
    assert(got(5L)._3.split(",").length == 64)
    assert(got(3L) == ((0L, 0L, Seq.fill(64)("0").mkString(","))))
  }

  test("featureHashArrays and featureHashVectors agree (CSV = serialized array)") {
    val docs = (0L until 30L).map(i => (i, s"w${i % 5} w${i % 3} w$i"))
    val a = Embeddings.featureHashArrays(
        docs.toDF("doc_id", "text"), "doc_id", "text", 16)
      .select($"doc_id", array_join($"vec", ","))
      .as[(Long, String)].collect().toMap
    val b = Embeddings.featureHashVectors(
        docs.toDF("doc_id", "text"), "doc_id", "text", 16)
      .select($"doc_id", $"vec_csv").as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("featureHashVectors is partition-layout invariant and dims-bounded") {
    val docs = (0L until 100L).map(i => (i, s"a$i b${i % 7} c${i % 3} a$i"))
    val a = Embeddings.featureHashVectors(
        docs.toDF("doc_id", "text").repartition(1), "doc_id", "text", 32)
      .as[(Long, Long, Long, String)].collect().toSet
    val b = Embeddings.featureHashVectors(
        docs.toDF("doc_id", "text").repartition(32), "doc_id", "text", 32)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      Embeddings.featureHashVectors(
        docs.toDF("doc_id", "text"), "doc_id", "text", 1)
    }
  }
}
