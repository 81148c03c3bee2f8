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

  test("videoNearDupPairs: the clipped copy is contained at offset +1, " +
      "the full duplicate aligns at offset 0, unrelated bases never " +
      "pair, and identical frames hash identically") {
    val media = Avi.synthesizeAviNearDup(spark, 12)
    // identical frame bytes -> identical dHash bands
    val fh = Avi.frameDhash(media).collect()
      .map(r => (r.media_id, r.frame_idx) -> (r.b0, r.b1, r.b2, r.b3))
      .toMap
    val nfh = java.security.MessageDigest.getInstance("SHA-256")
      .digest("42:avnd:0:nf".getBytes("UTF-8"))
    val nf0 = 4 + (nfh(0) & 0xff) % 3
    for (f <- 0 until nf0)
      assert(fh((0L, f)) == fh((2000L, f)), s"full-copy frame $f hash drift")
    for (j <- 0 until nf0 - 2)
      assert(fh((0L, j + 1)) == fh((1000L, j)), s"clip frame $j hash drift")
    val pairs = Avi.videoNearDupPairs(media)
      .select($"video_a", $"video_b", $"offset", $"n_aligned", $"nf_a",
        $"nf_b")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val byPair = pairs.map(p => (p._1, p._2) -> p).toMap
    // every planted relation surfaces with its true offset
    for (v <- 0 until 12 if v % 3 == 0) {
      val p = byPair.getOrElse((v.toLong, 1000L + v),
        fail(s"clipped copy of $v not found"))
      assert(p._3 == -1L && p._4 == p._6, s"clip alignment wrong: $p")
    }
    for (v <- 0 until 12 if v % 4 == 0) {
      val p = byPair.getOrElse((v.toLong, 2000L + v),
        fail(s"full duplicate of $v not found"))
      assert(p._3 == 0L && p._4 == p._5, s"full alignment wrong: $p")
    }
    // no pair crosses base-video families
    for (((a, b), _) <- byPair)
      assert(a % 1000 == b % 1000, s"false positive pair ($a, $b)")
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

  // ---------------------------------------- interleaved audio + video

  private def firstAv = Avi.synthesizeAviAv(spark, 3)
    .as[Multimodal.MediaRow].collect().sortBy(_.media_id)

  test("interleaved AVI round-trips: both stream chains validate, the " +
      "frame count matches the sha rule, each 100 ms audio window " +
      "carries exactly 64 samples replaying the tagged sha chain") {
    for (m <- firstAv) {
      val nfh = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"42:avi:${m.media_id}:nf".getBytes("UTF-8"))
      val wantNf = 2 + (nfh(0) & 0xff) % 5
      val (frames, tick, rate, windows) = Avi.decodeAviAv(m.bytes)
      assert(frames.length == wantNf && tick == 100 && rate == 640)
      assert(windows.length == wantNf)
      for ((w, f) <- windows.zipWithIndex) {
        assert(w.length == 64)
        // replay the audio formula by hand: 4 sha digests, LE 16-bit
        val raw = (0 until 4).flatMap { k =>
          java.security.MessageDigest.getInstance("SHA-256")
            .digest(s"42:avia:${m.media_id}:$f:$k".getBytes("UTF-8"))
        }.toArray
        val want = Array.tabulate(64) { j =>
          ((raw(2 * j) & 0xff) | ((raw(2 * j + 1) & 0xff) << 8)).toShort
        }
        assert(w.sameElements(want), s"audio window $f desynced")
      }
      // video frames are still the q171 lattice at derived ids
      frames.zipWithIndex.foreach { case (fr, f) =>
        assert(fr.sameElements(
          Jpeg.latticeJpeg(42L, m.media_id * 100L + f)._1))
      }
    }
  }

  test("the interleaved walker rejects interleave breaks and " +
      "single-stream files loudly") {
    val good = firstAv.head.bytes
    // a single-stream MJPEG file has no auds chain — reject
    intercept[IllegalArgumentException] {
      Avi.decodeAviAv(firstVideo.head.bytes)
    }
    // swap the first 00dc/01wb pair order by rewriting their fourccs:
    // find the movi list, flip chunk 0's tag to 01wb
    def u32(b: Array[Byte], o: Int) =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    var p = 12; var movi = -1
    while (p + 8 <= good.length && movi < 0) {
      if (new String(good, p, 4, "US-ASCII") == "LIST" &&
          new String(good, p + 8, 4, "US-ASCII") == "movi") movi = p
      else p += 8 + u32(good, p + 4) + (u32(good, p + 4) & 1)
    }
    assert(movi > 0)
    val mangled = good.clone()
    // chunk 0 starts at movi+12; overwrite its fourcc with '01wb'
    "01wb".getBytes("US-ASCII").copyToArray(mangled, movi + 12)
    intercept[IllegalArgumentException] {
      Avi.decodeAviAv(mangled)
    }
    // the old single-stream decoder keeps working on interleaved files?
    // NO — by contract decodeAviFrames sees the extra chunks as opaque
    // and still needs its single-chain idx1; the interleaved file's
    // two-chain idx1 makes it throw rather than silently drop audio
    intercept[IllegalArgumentException] {
      Avi.decodeAviFrames(good)
    }
  }

  test("avFrameFeatures equals decoding both streams by hand") {
    val feats = Avi.avFrameFeatures(Avi.synthesizeAviAv(spark, 3))
      .collect().map(r => (r.media_id, r.frame_idx) -> (r.vfeatures, r.afeatures))
      .toMap
    for (m <- firstAv) {
      val (frames, tick, rate, windows) = Avi.decodeAviAv(m.bytes)
      frames.indices.foreach { f =>
        val (vf, af) = feats((m.media_id, f))
        assert(vf.sameElements(Jpeg.decodeJpeg(frames(f))))
        assert(af.sameElements(Multimodal.audioLanes(windows(f), rate)))
        assert(tick == 100)
      }
    }
  }
}
