package graft.operators

import graft.SparkSpec

/** MJPEG-in-AVI: container round-trip, strict validation (a synthesis
  * bug on either layer must throw, not desync), the frame-id contract
  * with the q171 lattice generator, and the timeline tick. */
class AviSpec extends SparkSpec {
  import spark.implicits._

  private def firstVideo = Avi.synthesizeAviMjpeg(spark, 3)
    .as[Multimodal.MediaRow].collect().sortBy(_.media_id)

  test("synthesized AVIs round-trip: frame count matches the sha rule, " +
      "tick is 100 ms, and every frame is a decodable JPEG") {
    for (m <- firstVideo) {
      val nfh = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"42:avi:${m.media_id}:nf".getBytes("UTF-8"))
      val wantNf = 2 + (nfh(0) & 0xff) % 5
      val (frames, tick) = Avi.decodeAviFrames(m.bytes)
      assert(frames.length == wantNf && tick == 100)
      assert(m.meta.duration_ms == wantNf * 100)
      frames.foreach(f => assert(Jpeg.decodeJpeg(f).length == 8))
    }
  }

  test("frame f of video v is byte-identical to the lattice JPEG at " +
      "id v*100+f (the oracle's derived-id contract)") {
    for (m <- firstVideo) {
      val (frames, _) = Avi.decodeAviFrames(m.bytes)
      frames.zipWithIndex.foreach { case (fb, f) =>
        val (want, _, _) = Jpeg.latticeJpeg(42L, m.media_id * 100L + f)
        assert(java.util.Arrays.equals(fb, want),
          s"video ${m.media_id} frame $f bytes diverge")
      }
    }
  }

  test("frameFeatures equals decoding the frames by hand, with the " +
      "timeline t_ms = 100*frame_idx") {
    val media = Avi.synthesizeAviMjpeg(spark, 5)
    val got = Avi.frameFeatures(media).collect()
      .map(v => (v.media_id, v.frame_idx) -> (v.t_ms, v.features.toSeq))
      .toMap
    val byHand = media.as[Multimodal.MediaRow].collect().flatMap { m =>
      val (frames, tick) = Avi.decodeAviFrames(m.bytes)
      frames.zipWithIndex.map { case (fb, f) =>
        (m.media_id, f) -> (f * tick, Jpeg.decodeJpeg(fb).toSeq)
      }
    }.toMap
    assert(got == byHand)
  }

  test("frameSample follows the q174 timeline contract on the 100 ms " +
      "tick: instants ascend by everyMs, the active frame is t/tick, " +
      "and features match frameFeatures' decode of that frame") {
    val media = Avi.synthesizeAviMjpeg(spark, 5)
    val byFrame = Avi.frameFeatures(media).collect()
      .map(v => (v.media_id, v.frame_idx) ->
        (v.features(0).toDouble, v.features(5).toDouble)).toMap
    val nfOf = byFrame.keys.groupBy(_._1).view.mapValues(_.size).toMap
    val got = Avi.frameSample(media, 77).collect()
    assert(got.nonEmpty)
    val bySampled = got.groupBy(_.media_id)
    for ((vid, rows) <- bySampled) {
      val sorted = rows.sortBy(_.sample_idx)
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.sample_idx == i && r.t_ms == i * 77)
        assert(r.frame_idx == r.t_ms / 100)
        assert((r.f0, r.f5) == byFrame((vid, r.frame_idx)))
      }
      // sample count covers the whole duration: last instant < nf*100
      val nf = nfOf(vid)
      assert(sorted.length == (nf * 100 + 76) / 77)
    }
  }

  test("the decoder rejects structural corruption loudly") {
    val good = firstVideo.head.bytes
    intercept[IllegalArgumentException] { // bad magic
      Avi.decodeAviFrames("JUNK".getBytes ++ good.drop(4))
    }
    intercept[IllegalArgumentException] { // truncation breaks RIFF size
      Avi.decodeAviFrames(good.dropRight(10))
    }
    // flip one idx1 offset byte: the index cross-check must catch it.
    // idx1 is the final chunk; entry 0's offset lives at idx1+8+8
    val idxPos = {
      var p = 12; var found = -1
      def u32(o: Int) = (good(o) & 0xff) | ((good(o + 1) & 0xff) << 8) |
        ((good(o + 2) & 0xff) << 16) | ((good(o + 3) & 0xff) << 24)
      while (p + 8 <= good.length && found < 0) {
        if (new String(good, p, 4, "US-ASCII") == "idx1") found = p
        else p += 8 + u32(p + 4) + (u32(p + 4) & 1)
      }
      found
    }
    assert(idxPos > 0)
    val mangled = good.clone()
    mangled(idxPos + 16) = (mangled(idxPos + 16) ^ 0x01).toByte
    intercept[IllegalArgumentException] {
      Avi.decodeAviFrames(mangled)
    }
  }
}
