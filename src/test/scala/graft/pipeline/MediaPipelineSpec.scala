package graft.pipeline

import graft.SparkSpec
import graft.operators.{Dedup, Multimodal}
import org.apache.spark.sql.functions._

class MediaPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("media pipeline: planted victim per stage, ledger ≡ disk, bytes die at features, determinism") {
    val tmp = java.nio.file.Files.createTempDirectory("mediapipe").toString
    // 12 groups × 3 near-dup members, 18×8 dHash geometry
    val base = Multimodal.synthesizeDhashBmp(spark, 12, 3)
    // stage victims: a too-small image (s1), a non-image (s1), an exact
    // byte copy of image 0 under a losing id (s2)
    val tiny = Multimodal.synthesizeBmp(spark, 1)
      .select(lit(9001L).as("media_id"), col("kind"), col("bytes"), col("meta"))
    val audio = Multimodal.synthesizeWav(spark, 1)
      .select(lit(9002L).as("media_id"), col("kind"), col("bytes"), col("meta"))
    val dup = base.filter(col("media_id") === 0L)
      .select(lit(9000L).as("media_id"), col("kind"), col("bytes"), col("meta"))
    val corpus = base.unionByName(tiny).unionByName(audio).unionByName(dup)

    val res = MediaPipeline.run(spark, corpus, tmp)
    assert(res.rowsOf("s1_meta_gate") == 37, "gate keeps 36 + the byte dup")
    assert(res.rowsOf("s2_exact_dedup") == 36, "byte dup loses to min id 0")

    // expected perceptual survivors, derived independently (q184 rule)
    val pairs = Multimodal.dhashNearDupPairs(
        Multimodal.dhashBands(base).toDF(), maxHamming = 6)
      .select($"a".as("id_a"), $"b".as("id_b"))
    val labels = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val expected = base.select($"media_id").as[Long].collect()
      .filter(id => labels.getOrElse(id, id) == id).toSet
    assert(res.rowsOf("s3_perceptual_dedup") == expected.size)
    assert(res.rowsOf("s3_perceptual_dedup") < 36,
      "planted near-dup groups must collapse")
    assert(res.rowsOf("s4_thumbs") == res.rowsOf("s3_perceptual_dedup"))
    assert(res.rowsOf("s5_features") == res.rowsOf("s4_thumbs"))
    assert(spark.read.parquet(s"$tmp/s3_perceptual_dedup")
      .select($"media_id").as[Long].collect().toSet == expected)

    // ledger ≡ disk for every stage
    for (s <- Seq("s1_meta_gate", "s2_exact_dedup", "s3_perceptual_dedup",
        "s4_thumbs"))
      assert(spark.read.parquet(s"$tmp/$s").count() == res.rowsOf(s), s)
    val feats = spark.read.parquet(res.outPath)
    assert(feats.count() == res.rowsOf("s5_features"))
    assert(!feats.columns.contains("bytes"), "bytes must die at features")

    // thumbnails are REAL 9×8 BMPs: the decoder's geometry lane says so
    val f6 = feats.select(element_at($"features", 7)).as[Float].collect()
    assert(f6.forall(_ == (9 * 256 + 8).toFloat), "thumb geometry lane")

    // determinism: a second run reproduces ledger and features exactly
    val tmp2 = java.nio.file.Files.createTempDirectory("mediapipe2").toString
    val res2 = MediaPipeline.run(spark, corpus, tmp2)
    assert(res2.audits == res.audits, "ledger must reproduce")
    val a = feats.orderBy($"media_id").collect().map(_.toString).toSeq
    val b = spark.read.parquet(res2.outPath).orderBy($"media_id")
      .collect().map(_.toString).toSeq
    assert(a == b, "features must reproduce")
  }
}
