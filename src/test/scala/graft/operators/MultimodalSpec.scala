package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthesizeMedia is deterministic and schema-complete") {
    val a = Multimodal.synthesizeMedia(spark, 30).collect()
    val b = Multimodal.synthesizeMedia(spark, 30).collect()
    assert(a.map(_.getLong(0)).sameElements(b.map(_.getLong(0))))
    val kinds = Multimodal.synthesizeMedia(spark, 30)
      .select("kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("extractFeatures: one 8-float vector per row, deterministic, no bytes in output") {
    val media = Multimodal.synthesizeMedia(spark, 30)
    val f = Multimodal.extractFeatures(media)
    assert(f.count() == 30)
    val first = f.filter(_.media_id == 0L).head().features
    val again = Multimodal.extractFeatures(media).filter(_.media_id == 0L).head().features
    assert(first.sameElements(again))
    assert(first.length == 8)
    assert(!f.toDF().columns.contains("bytes"))
  }

  test("filterByMeta prunes on the metadata struct without touching bytes") {
    val media = Multimodal.synthesizeMedia(spark, 60)
    val wide = Multimodal.filterByMeta(media, minWidth = 64)
    assert(wide.columns.toSeq == Seq("media_id", "width", "height"))
    assert(wide.filter($"width" < 64).count() == 0)
    // the physical plan should not read the binary column
    val plan = wide.queryExecution.executedPlan.toString
    assert(!plan.contains("bytes"), s"binary column not pruned:\n$plan")
  }

  test("frameSampleStub expands video rows by duration") {
    val media = Multimodal.synthesizeMedia(spark, 30)
    val frames = Multimodal.frameSampleStub(media, everyMs = 1000)
    val videos = media.filter($"kind" === "video")
    assert(frames.select("media_id").distinct().count() == videos.count())
    // frame count per video = duration_ms / 1000 (>=1)
    val durs = videos.select($"media_id", $"meta.duration_ms").as[(Long, Int)]
      .collect().toMap
    val counts = frames.groupBy("media_id").count().as[(Long, Long)].collect().toMap
    for ((id, d) <- durs)
      assert(counts(id) == math.max(d / 1000, 1), s"video $id")
  }

  test("injected codec: real-implementation seam honors the batch boundary and checkpoint-once contract") {
    // a "real" codec stand-in injected through the decode interface: it
    // counts every invocation via an accumulator (executor-side, so the
    // count is exact across partitions) and produces a non-stub feature
    // mapping — proving the plumbing is codec-agnostic, not stub-shaped
    val media = Multimodal.synthesizeMedia(spark, 60).repartition(4)
    val calls = spark.sparkContext.longAccumulator("codec_calls")
    val codec: Array[Byte] => Array[Float] = { bytes =>
      calls.add(1)
      Array.tabulate(8)(j => (bytes(j % bytes.length) & 0xff).toFloat)
    }
    // extractFeatures: codec runs exactly once per row, inside the
    // mapPartitions pass (no per-row jobs, no recompute)
    val feats = Multimodal.extractFeatures(media, codec).collect()
    assert(feats.length == 60)
    assert(calls.value == 60, s"codec ran ${calls.value} times for 60 rows")
    assert(feats.forall(_.features.length == 8))
    // checkpoint-once: mediaNearDupPairs references the feature table
    // three times (bands + two rescore sides) but the injected codec
    // still decodes each media row exactly once — the localCheckpoint
    // contract a real (expensive) codec depends on
    calls.reset()
    Multimodal.mediaNearDupPairs(media, threshold = 0.9, codec = codec).collect()
    assert(calls.value == 60,
      s"codec ran ${calls.value} times through mediaNearDupPairs; want 60 (checkpoint-once)")
  }

  test("mediaNearDupPairs flags byte-identical media") {
    import Multimodal._
    val rows = Seq(
      MediaRow(1L, "image", Array.tabulate[Byte](100)(_.toByte), MediaMeta(64, 64, 3, "png", 0, 0)),
      MediaRow(2L, "image", Array.tabulate[Byte](100)(_.toByte), MediaMeta(64, 64, 3, "png", 0, 0)),
      MediaRow(3L, "image", Array.tabulate[Byte](100)(i => (255 - i).toByte), MediaMeta(64, 64, 3, "png", 0, 0)),
    ).toDF()
    val pairs = Multimodal.mediaNearDupPairs(rows)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
