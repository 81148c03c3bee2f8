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

  test("decodeBmp parses a BMP written by the JDK's own encoder (ImageIO cross-check)") {
    // Independent proof the parser reads REAL BMPs, not just our
    // synthesizer's output: javax.imageio (pure JDK, no native libs)
    // encodes a BufferedImage with known pixels; decodeBmp must recover
    // the exact feature sums computed straight from those pixels.
    import java.awt.image.BufferedImage
    val w = 7; val h = 5 // width 7 → 3 stride-padding bytes per row
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    def px(x: Int, y: Int): (Int, Int, Int) = // deterministic, asymmetric
      (((x * 53 + y * 17 + 11) % 256), ((x * 29 + y * 71 + 3) % 256),
        ((x * 13 + y * 97 + 201) % 256))
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos), "JDK BMP writer missing")
    val feats = Multimodal.decodeBmp(bos.toByteArray)
    var f0, f1, f2, f3, f4, f5, f7 = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      f0 += r; f1 += g; f2 += b
      f3 += r * (x + 1); f4 += g * (y + 1); f5 += b.toLong * (x + 1) * (y + 1)
      if (r > g) f7 += 1
    }
    assert(feats.toSeq == Seq(f0, f1, f2, f3, f4, f5, w * 256 + h, f7).map(_.toFloat),
      s"parsed features ${feats.toSeq} disagree with pixel-truth")
  }

  test("synthesizeBmp bytes are standards-valid: the JDK's decoder reads them back pixel-identically") {
    // Reverse direction of the cross-check: every synthesized file must
    // be readable by an independent BMP implementation (ImageIO), and
    // the pixels it reports must reproduce decodeBmp's features —
    // proving header, stride padding, and bottom-up row order are all
    // emitted correctly, not just self-consistently.
    val rows = Multimodal.synthesizeBmp(spark, 25)
      .select($"media_id", $"bytes", $"meta.width", $"meta.height")
      .collect()
    assert(rows.length == 25)
    val widths = rows.map(_.getInt(2)).toSet
    assert(widths.exists(w => w % 4 != 0), "no padded width sampled")
    for (row <- rows) {
      val bytes = row.getAs[Array[Byte]]("bytes")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected synthesized BMP ${row.getLong(0)}")
      assert(img.getWidth == row.getInt(2) && img.getHeight == row.getInt(3))
      var f0, f1, f2, f3, f4, f5, f7 = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        f0 += r; f1 += g; f2 += b
        f3 += r * (x + 1); f4 += g * (y + 1); f5 += b.toLong * (x + 1) * (y + 1)
        if (r > g) f7 += 1
      }
      val expected = Seq(f0, f1, f2, f3, f4, f5,
        img.getWidth * 256 + img.getHeight, f7).map(_.toFloat)
      assert(Multimodal.decodeBmp(bytes).toSeq == expected,
        s"media ${row.getLong(0)}: decodeBmp disagrees with ImageIO pixels")
    }
  }

  test("decodeBmp rejects malformed input loudly") {
    intercept[IllegalArgumentException](Multimodal.decodeBmp(Array[Byte](1, 2, 3)))
    val good = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", bos); bos.toByteArray
    }
    val notBmp = good.clone(); notBmp(0) = 'X'
    intercept[IllegalArgumentException](Multimodal.decodeBmp(notBmp))
    val truncated = java.util.Arrays.copyOf(good, good.length - 4)
    intercept[IllegalArgumentException](Multimodal.decodeBmp(truncated))
  }

  test("resizeBmp: identity resample re-encodes byte-identically (encode∘parse = id)") {
    // encodeBmp24 emits the same canonical layout synthesizeBmp does, so
    // resizing to the source's own dimensions must reproduce the input
    // file byte for byte — header fields, stride padding, row order.
    val w = 6; val h = 5
    val px = Array.tabulate(w * h) { j =>
      val x = j % w; val y = j / w
      (((x * 53 + y * 17) % 256) << 16) | (((x * 29 + y * 71) % 256) << 8) |
        ((x * 13 + y * 97) % 256)
    }
    val bytes = Multimodal.encodeBmp24(w, h, px)
    val media = Seq(Multimodal.MediaRow(0L, "image", bytes,
      Multimodal.MediaMeta(w, h, 3, "bmp", 0, 0))).toDF()
    val out = Multimodal.resizeBmp(media, w, h).collect().head
    assert(out.getAs[Array[Byte]]("bytes").sameElements(bytes),
      "identity resize is not byte-identical")
  }

  test("resizeBmp output is a valid BMP whose pixels are the NN resample (ImageIO cross-check)") {
    val src = Multimodal.synthesizeBmp(spark, 15).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    val rows = Multimodal.resizeBmp(Multimodal.synthesizeBmp(spark, 15), 7, 6)
      .select($"media_id", $"bytes", $"meta.width", $"meta.height")
      .collect()
    assert(rows.length == 15)
    for (row <- rows) {
      assert(row.getInt(2) == 7 && row.getInt(3) == 6, "meta not updated")
      val out = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("bytes")))
      assert(out != null, s"ImageIO rejected resized BMP ${row.getLong(0)}")
      assert(out.getWidth == 7 && out.getHeight == 6)
      val in = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(src(row.getLong(0))))
      for (y <- 0 until 6; x <- 0 until 7) {
        val expected = in.getRGB(x * in.getWidth / 7, y * in.getHeight / 6)
        assert((out.getRGB(x, y) & 0xffffff) == (expected & 0xffffff),
          s"media ${row.getLong(0)}: pixel ($x,$y) is not the NN source pixel")
      }
    }
  }

  test("resizeBmp upsamples and downsamples by the exact integer mapping") {
    val px = Array.tabulate(6)(j => j * 0x010203) // 3×2, distinct pixels
    val media = Seq(Multimodal.MediaRow(1L, "image",
      Multimodal.encodeBmp24(3, 2, px),
      Multimodal.MediaMeta(3, 2, 3, "bmp", 0, 0))).toDF()
    val up = Multimodal.resizeBmp(media, 9, 4).collect().head
    val (uw, uh, upx) = Multimodal.parseBmp24(up.getAs[Array[Byte]]("bytes"))
    assert((uw, uh) == (9, 4))
    for (y <- 0 until 4; x <- 0 until 9)
      assert(upx(y * 9 + x) == px((y * 2 / 4) * 3 + x * 3 / 9))
    val down = Multimodal.resizeBmp(media, 1, 1).collect().head
    val (_, _, dpx) = Multimodal.parseBmp24(down.getAs[Array[Byte]]("bytes"))
    assert(dpx.toSeq == Seq(px(0)), "1×1 downsample is the top-left pixel")
  }

  private def wavFeaturesOf(samples: Array[Short], rate: Int): Seq[Float] = {
    var f0, f1, f4, f5 = 0L
    var mx = Int.MinValue; var mn = Int.MaxValue
    for (j <- samples.indices) {
      val s = samples(j).toInt
      f0 += s; f1 += math.abs(s)
      if (s > mx) mx = s
      if (s < mn) mn = s
      if (j > 0 && ((s >= 0) != (samples(j - 1) >= 0))) f4 += 1
      f5 += (s & 0xff).toLong * (j + 1)
    }
    Seq(f0, f1, mx, mn, f4, f5, rate, samples.length).map(_.toFloat)
  }

  private def jdkWavBytes(samples: Array[Short], rate: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate.toFloat,
      16, 1, 2, rate.toFloat, false) // false = little-endian
    val raw = new Array[Byte](samples.length * 2)
    for (j <- samples.indices) {
      raw(2 * j) = (samples(j) & 0xff).toByte
      raw(2 * j + 1) = ((samples(j) >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audioFingerprint matches a literal double-precision loop " +
      "reference bit-for-bit, and audioNearDupPairs surfaces the " +
      "planted clipped/full copies at their true window offsets") {
    import spark.implicits._
    val media = Multimodal.synthesizeWavNearDup(spark, 12)
    val prints = Multimodal.audioFingerprint(media).collect()
      .map(p => (p.media_id, p.window_idx) -> p.fp).toMap
    // literal-loop reference over the decoded samples: double cos/sin
    // basis ROUNDED THROUGH THE SAME fixed-point table, energies as
    // BigInt — any accumulator-width or table slip in the engine loop
    // diverges here
    val rows = media.as[Multimodal.MediaRow].collect()
    for (m <- rows.take(4)) {
      val (_, samples) = Multimodal.parseWav16(m.bytes)
      for (w <- 0 until samples.length / 64) {
        val e = (1 to 17).map { k =>
          var sc = BigInt(0); var ss = BigInt(0)
          for (n <- 0 until 64) {
            sc += BigInt(samples(w * 64 + n).toInt) * Multimodal.dftCos(k, n)
            ss += BigInt(samples(w * 64 + n).toInt) * Multimodal.dftSin(k, n)
          }
          sc * sc + ss * ss
        }
        val want = (0 until 16).map(j => if (e(j) > e(j + 1)) 1 << j else 0).sum
        assert(prints((m.media_id, w)) == want,
          s"fp drift at (${m.media_id}, $w)")
      }
    }
    // identical windows hash identically across the copy family
    val nwh = java.security.MessageDigest.getInstance("SHA-256")
      .digest("42:andd:0:nw".getBytes("UTF-8"))
    val nw0 = 6 + (nwh(0) & 0xff) % 3
    for (w <- 0 until nw0)
      assert(prints((0L, w)) == prints((2000L, w)), s"full-copy drift $w")
    for (j <- 0 until nw0 - 2)
      assert(prints((0L, j + 1)) == prints((1000L, j)), s"clip drift $j")
    // containment pairs with true offsets
    val pairs = Multimodal.audioNearDupPairs(media)
      .select($"audio_a", $"audio_b", $"offset", $"n_aligned", $"nw_a",
        $"nw_b")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val byPair = pairs.map(p => (p._1, p._2) -> p).toMap
    for (a <- 0 until 12 if a % 3 == 0) {
      val p = byPair.getOrElse((a.toLong, 1000L + a),
        fail(s"clipped copy of $a not found"))
      assert(p._3 == -1L && p._4 == p._6, s"clip alignment wrong: $p")
    }
    for (a <- 0 until 12 if a % 4 == 0) {
      val p = byPair.getOrElse((a.toLong, 2000L + a),
        fail(s"full duplicate of $a not found"))
      assert(p._3 == 0L && p._4 == p._5, s"full alignment wrong: $p")
    }
    for (((a, b), _) <- byPair)
      assert(a % 1000 == b % 1000, s"false positive pair ($a, $b)")
  }

  test("decodeWav parses a WAV written by the JDK's own encoder (javax.sound cross-check)") {
    // deterministic asymmetric samples spanning negatives, zero
    // crossings, and the full byte range
    val rate = 11025
    val samples = Array.tabulate[Short](73)(j =>
      ((j * 1103 + 251) % 65536 - 32768).toShort)
    val feats = Multimodal.decodeWav(jdkWavBytes(samples, rate))
    assert(feats.toSeq == wavFeaturesOf(samples, rate),
      s"parsed ${feats.toSeq} disagrees with sample-truth")
  }

  test("synthesizeWav bytes are standards-valid: the JDK's decoder reads them back sample-identically") {
    import javax.sound.sampled._
    val rows = Multimodal.synthesizeWav(spark, 25)
      .select($"media_id", $"bytes", $"meta.sample_rate")
      .collect()
    assert(rows.length == 25)
    for (row <- rows) {
      val bytes = row.getAs[Array[Byte]]("bytes")
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      assert(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16 &&
        !fmt.isBigEndian,
        s"media ${row.getLong(0)}: JDK read unexpected format $fmt")
      assert(fmt.getSampleRate.toInt == row.getInt(2))
      val raw = ais.readAllBytes()
      val samples = Array.tabulate[Short](raw.length / 2)(j =>
        ((raw(2 * j) & 0xff) | (raw(2 * j + 1) << 8)).toShort)
      assert(Multimodal.decodeWav(bytes).toSeq ==
        wavFeaturesOf(samples, fmt.getSampleRate.toInt),
        s"media ${row.getLong(0)}: decodeWav disagrees with JDK samples")
    }
  }

  test("decodeWav walks chunk lists generically and rejects malformed input") {
    // a LIST chunk between fmt and data must be skipped, not tripped on
    val rate = 8000
    val samples = Array[Short](100, -200, 300, -400, 0, 32767, -32768)
    val std = jdkWavBytes(samples, rate)
    // splice an 11-byte (odd → word-aligned to 12) LIST chunk after fmt:
    // find the 'data' fourcc and insert before it
    val dataIdx = std.indices.find(k => k + 4 <= std.length &&
      std(k) == 'd' && std(k + 1) == 'a' && std(k + 2) == 't' && std(k + 3) == 'a').get
    val junk = "LIST".getBytes ++ Array[Byte](11, 0, 0, 0) ++
      Array.fill[Byte](12)(0x5a)
    val spliced = std.take(dataIdx) ++ junk ++ std.drop(dataIdx)
    // fix the RIFF size field (bytes 4-7, little-endian)
    val total = spliced.length - 8
    for (k <- 0 until 4) spliced(4 + k) = ((total >> (8 * k)) & 0xff).toByte
    assert(Multimodal.decodeWav(spliced).toSeq == wavFeaturesOf(samples, rate))

    intercept[IllegalArgumentException](Multimodal.decodeWav(Array[Byte](1, 2, 3)))
    val notWav = std.clone(); notWav(0) = 'X'
    intercept[IllegalArgumentException](Multimodal.decodeWav(notWav))
    intercept[IllegalArgumentException](
      Multimodal.decodeWav(java.util.Arrays.copyOf(std, std.length - 3)))
  }

  test("resizeBmpBilinear: matches a serial fixed-point reference; identity, corners, and constants are exact") {
    // serial reference over the parsed source pixels
    def ref(px: Array[Int], w: Int, h: Int, wo: Int, ho: Int): Array[Int] =
      Array.tabulate(wo * ho) { j =>
        val x = j % wo; val y = j / wo
        val sxFp = if (wo == 1) 0 else x * (w - 1) * 256 / (wo - 1)
        val syFp = if (ho == 1) 0 else y * (h - 1) * 256 / (ho - 1)
        val x0 = sxFp >> 8; val fx = sxFp & 255; val x1 = math.min(x0 + 1, w - 1)
        val y0 = syFp >> 8; val fy = syFp & 255; val y1 = math.min(y0 + 1, h - 1)
        def ch(s: Int): Int = {
          val a = (px(y0 * w + x0) >> s) & 0xff; val b = (px(y0 * w + x1) >> s) & 0xff
          val c = (px(y1 * w + x0) >> s) & 0xff; val d = (px(y1 * w + x1) >> s) & 0xff
          (a * (256 - fx) * (256 - fy) + b * fx * (256 - fy) +
            c * (256 - fx) * fy + d * fx * fy + 32768) >> 16
        }
        (ch(16) << 16) | (ch(8) << 8) | ch(0)
      }
    val srcRows = Multimodal.synthesizeBmp(spark, 12).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    val out = Multimodal
      .resizeBmpBilinear(Multimodal.synthesizeBmp(spark, 12), 7, 6).collect()
    for (row <- out) {
      val (w, h, src) = Multimodal.parseBmp24(srcRows(row.getLong(0)))
      val (wo, ho, got) = Multimodal.parseBmp24(row.getAs[Array[Byte]]("bytes"))
      assert((wo, ho) == (7, 6))
      assert(got.toSeq == ref(src, w, h, 7, 6).toSeq,
        s"media ${row.getLong(0)}: bilinear disagrees with the reference")
      // align-corners: all four output corners equal the source corners
      assert(got(0) == src(0) && got(6) == src(w - 1) &&
        got(5 * 7) == src((h - 1) * w) && got(5 * 7 + 6) == src(h * w - 1),
        s"media ${row.getLong(0)}: corners not preserved")
    }
    // identity dims → fx = fy = 0 everywhere → byte-identical file
    val w0 = 6; val h0 = 5
    val px0 = Array.tabulate(w0 * h0)(j => (j * 41 % 256 << 16) |
      (j * 17 % 256 << 8) | (j * 89 % 256))
    val idBytes = Multimodal.encodeBmp24(w0, h0, px0)
    val idMedia = Seq(Multimodal.MediaRow(0L, "image", idBytes,
      Multimodal.MediaMeta(w0, h0, 3, "bmp", 0, 0))).toDF()
    val idOut = Multimodal.resizeBmpBilinear(idMedia, w0, h0).collect().head
    assert(idOut.getAs[Array[Byte]]("bytes").sameElements(idBytes),
      "identity bilinear resize is not byte-identical")
    // constant image stays constant at any size (weights sum to 65536)
    val cMedia = Seq(Multimodal.MediaRow(1L, "image",
      Multimodal.encodeBmp24(4, 4, Array.fill(16)(0x7a3c19)),
      Multimodal.MediaMeta(4, 4, 3, "bmp", 0, 0))).toDF()
    val (_, _, cOut) = Multimodal.parseBmp24(
      Multimodal.resizeBmpBilinear(cMedia, 9, 3).collect().head
        .getAs[Array[Byte]]("bytes"))
    assert(cOut.forall(_ == 0x7a3c19), "constant image must stay constant")
  }

  test("centerCrop: anchored window matches the source (ImageIO cross-check); undersized input rejects") {
    val src = Multimodal.synthesizeBmp(spark, 10).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    val rows = Multimodal.centerCrop(Multimodal.synthesizeBmp(spark, 10), 4, 4)
      .select($"media_id", $"bytes", $"meta.width", $"meta.height").collect()
    for (row <- rows) {
      assert(row.getInt(2) == 4 && row.getInt(3) == 4, "meta not updated")
      val out = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("bytes")))
      val in = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(src(row.getLong(0))))
      val x0 = (in.getWidth - 4) / 2; val y0 = (in.getHeight - 4) / 2
      for (y <- 0 until 4; x <- 0 until 4)
        assert((out.getRGB(x, y) & 0xffffff) ==
          (in.getRGB(x0 + x, y0 + y) & 0xffffff),
          s"media ${row.getLong(0)}: crop pixel ($x,$y) is not the window pixel")
    }
    val ex = intercept[org.apache.spark.SparkException](
      Multimodal.centerCrop(Multimodal.synthesizeBmp(spark, 5), 9, 9).collect())
    assert(ex.getMessage != null)
  }

  test("orient: pixel remaps match ImageIO per mode; group laws hold byte-identically") {
    val media = Multimodal.synthesizeBmp(spark, 8)
    val src = media.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    def img(b: Array[Byte]) =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    for (mode <- Seq("flip_h", "rot90", "rot180", "rot270")) {
      val rows = Multimodal.orient(media, mode).collect()
      for (row <- rows) {
        val in = img(src(row.getLong(0)))
        val out = img(row.getAs[Array[Byte]]("bytes"))
        val (w, h) = (in.getWidth, in.getHeight)
        val expectDims = if (mode == "flip_h" || mode == "rot180") (w, h) else (h, w)
        assert((out.getWidth, out.getHeight) == expectDims, s"$mode dims")
        for (y <- 0 until out.getHeight; x <- 0 until out.getWidth) {
          val (sx, sy) = mode match {
            case "flip_h" => (w - 1 - x, y)
            case "rot180" => (w - 1 - x, h - 1 - y)
            case "rot90"  => (y, h - 1 - x)
            case "rot270" => (w - 1 - y, x)
          }
          assert((out.getRGB(x, y) & 0xffffff) == (in.getRGB(sx, sy) & 0xffffff),
            s"media ${row.getLong(0)} $mode: pixel ($x,$y)")
        }
      }
    }
    // group laws on the PARSED pixels: flip∘flip = id, rot90² = rot180,
    // rot90⁴ = id. (Raw-byte equality would compare stride PADDING,
    // which synthesizeBmp fills from the sha chain but encodeBmp24
    // canonically zeroes — invisible to every decode by construction.)
    def pixelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Int]] =
      df.collect().map { r =>
        val (_, _, px) = Multimodal.parseBmp24(r.getAs[Array[Byte]]("bytes"))
        r.getLong(0) -> px.toSeq
      }.toMap
    val srcPx = pixelsOf(media)
    val ff = pixelsOf(Multimodal.orient(Multimodal.orient(media, "flip_h"), "flip_h"))
    assert(ff == srcPx, "flip∘flip ≠ id")
    val r90twice = pixelsOf(
      Multimodal.orient(Multimodal.orient(media, "rot90"), "rot90"))
    assert(r90twice == pixelsOf(Multimodal.orient(media, "rot180")),
      "rot90² ≠ rot180")
    val r4 = pixelsOf(Seq.fill(4)("rot90").foldLeft(media)(Multimodal.orient))
    assert(r4 == srcPx, "rot90⁴ ≠ id")
    // the double-applied results ARE byte-identical to each other (both
    // sides went through the canonical encoder)
    val r90x2bytes = Multimodal
      .orient(Multimodal.orient(media, "rot90"), "rot90").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    val r180bytes = Multimodal.orient(media, "rot180").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    assert(r180bytes.forall { case (id, b) => r90x2bytes(id).sameElements(b) },
      "canonical encodings must agree")
  }

  test("toGrayscale: serial luma reference; constant images are a fixed point") {
    val src = Multimodal.synthesizeBmp(spark, 10).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    val out = Multimodal.toGrayscale(Multimodal.synthesizeBmp(spark, 10))
      .select($"media_id", $"bytes").collect()
    for (row <- out) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("bytes")))
      val in = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(src(row.getLong(0))))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val p = in.getRGB(x, y)
        val l = (77 * ((p >> 16) & 0xff) + 151 * ((p >> 8) & 0xff) +
          28 * (p & 0xff) + 128) >> 8
        assert((img.getRGB(x, y) & 0xffffff) == ((l << 16) | (l << 8) | l),
          s"media ${row.getLong(0)}: luma at ($x,$y)")
      }
    }
    // (c,c,c) maps to (256c + 128) >> 8 = c exactly — grayscale input is
    // a fixed point of the transform
    val const = Seq(Multimodal.MediaRow(0L, "image",
      Multimodal.encodeBmp24(4, 4, Array.fill(16)(0x5a5a5a)),
      Multimodal.MediaMeta(4, 4, 3, "bmp", 0, 0))).toDF()
    val cOut = Multimodal.toGrayscale(const).collect().head
    assert(cOut.getAs[Array[Byte]]("bytes").sameElements(
      Multimodal.encodeBmp24(4, 4, Array.fill(16)(0x5a5a5a))),
      "grayscale input must be byte-identical under grayscale")
  }

  test("resampleWav: identity resample re-encodes byte-identically (encode∘parse = id)") {
    val samples = Array.tabulate[Short](50)(j =>
      ((j * 2221 + 17) % 65536 - 32768).toShort)
    val bytes = Multimodal.encodeWav16(10000, samples)
    val media = Seq(Multimodal.MediaRow(0L, "audio", bytes,
      Multimodal.MediaMeta(0, 0, 1, "wav", 5, 10000))).toDF()
    val out = Multimodal.resampleWav(media, 10000).collect().head
    assert(out.getAs[Array[Byte]]("bytes").sameElements(bytes),
      "identity resample is not byte-identical")
  }

  test("resampleWav output is a valid WAV whose samples are the NN resample (javax.sound cross-check)") {
    import javax.sound.sampled._
    val src = Multimodal.synthesizeWav(spark, 15).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    val rows = Multimodal.resampleWav(Multimodal.synthesizeWav(spark, 15), 10000)
      .select($"media_id", $"bytes", $"meta.sample_rate", $"meta.duration_ms")
      .collect()
    assert(rows.length == 15)
    def jdkSamples(bytes: Array[Byte]): (Int, Array[Short]) = {
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val raw = ais.readAllBytes()
      (ais.getFormat.getSampleRate.toInt,
        Array.tabulate[Short](raw.length / 2)(j =>
          ((raw(2 * j) & 0xff) | (raw(2 * j + 1) << 8)).toShort))
    }
    var sawUp = false; var sawDown = false
    for (row <- rows) {
      val (outRate, out) = jdkSamples(row.getAs[Array[Byte]]("bytes"))
      val (inRate, in) = jdkSamples(src(row.getLong(0)))
      assert(outRate == 10000 && row.getInt(2) == 10000, "rate not updated")
      assert(row.getInt(3) == out.length * 1000 / 10000, "duration not updated")
      assert(out.length == (in.length.toLong * 10000 / inRate).toInt,
        s"media ${row.getLong(0)}: output length")
      for (j <- out.indices)
        assert(out(j) == in((j.toLong * inRate / 10000).toInt),
          s"media ${row.getLong(0)}: sample $j is not the NN source sample")
      if (inRate < 10000) sawUp = true else if (inRate > 10000) sawDown = true
    }
    assert(sawUp && sawDown, "corpus sampled only one resample direction")
  }

  test("resampleWav up/downsamples by the exact integer mapping") {
    val samples = Array[Short](10, -20, 30, -40, 50, -60)
    val media = Seq(Multimodal.MediaRow(1L, "audio",
      Multimodal.encodeWav16(8000, samples),
      Multimodal.MediaMeta(0, 0, 1, "wav", 0, 8000))).toDF()
    val up = Multimodal.resampleWav(media, 16000).collect().head
    val (_, upS) = Multimodal.parseWav16(up.getAs[Array[Byte]]("bytes"))
    assert(upS.toSeq == samples.flatMap(s => Seq(s, s)).toSeq,
      "2x upsample must duplicate each sample")
    val down = Multimodal.resampleWav(media, 4000).collect().head
    val (_, downS) = Multimodal.parseWav16(down.getAs[Array[Byte]]("bytes"))
    assert(downS.toSeq == Seq[Short](10, 30, 50),
      "2x downsample must keep every other sample")
  }

  test("trimSilence: span scan, duration update, no-trim and all-silent edges") {
    def wav(samples: Array[Short]): Multimodal.MediaRow =
      Multimodal.MediaRow(samples.headOption.map(_.toLong).getOrElse(0L),
        "audio", Multimodal.encodeWav16(8000, samples),
        Multimodal.MediaMeta(0, 0, 1, "wav", 0, 8000))
    val a = Array[Short](100, -200, 30000, -500, 20000, 10, 5)
    val b = Array[Short](25000, 1, -25000) // loud ends: nothing to trim
    val c = Array[Short](1, -2, 3, -4)     // all silent
    val out = Multimodal.trimSilence(
      Seq(wav(a), wav(b), wav(c)).toDF(), threshold = 16384)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Array[Byte]]("bytes"), r.getAs[org.apache.spark.sql.Row]("meta")))).toMap
    val (_, aS) = Multimodal.parseWav16(out(100L)._1)
    assert(aS.toSeq == Seq[Short](30000, -500, 20000), "inclusive span kept")
    assert(out(100L)._2.getAs[Int]("duration_ms") == 3 * 1000 / 8000)
    val (_, bS) = Multimodal.parseWav16(out(25000L)._1)
    assert(bS.toSeq == b.toSeq, "loud-ended input passes through")
    assert(out(25000L)._1.sameElements(wav(b).bytes),
      "no-trim output is byte-identical")
    val (_, cS) = Multimodal.parseWav16(out(1L)._1)
    assert(cS.isEmpty, "all-silent input trims to a valid zero-sample WAV")
    assert(out(1L)._2.getAs[Int]("duration_ms") == 0)
    // the zero-sample file is still a standards-valid WAV: JDK reads it
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(out(1L)._1))
    assert(ais.readAllBytes().isEmpty)
  }

  test("normalizeGain: peak hits full scale, ratios preserve sign-safe scaling, silence passes through") {
    def wav(id: Long, samples: Array[Short]): Multimodal.MediaRow =
      Multimodal.MediaRow(id, "audio", Multimodal.encodeWav16(8000, samples),
        Multimodal.MediaMeta(0, 0, 1, "wav", 0, 8000))
    val a = Array[Short](100, -8192, 16384, -4096, 0)
    val z = Array[Short](0, 0, 0)
    val out = Multimodal.normalizeGain(Seq(wav(1, a), wav(2, z)).toDF())
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    val (_, aN) = Multimodal.parseWav16(out(1L))
    val expected = a.map { v =>
      val mag = (math.abs(v.toInt).toLong * 32767 / 16384).toInt
      (if (v < 0) -mag else mag).toShort
    }
    assert(aN.toSeq == expected.toSeq, "sign-safe exact scaling")
    assert(aN.map(s => math.abs(s.toInt)).max == 32767, "peak at full scale")
    assert(aN(4) == 0 && (aN(1) < 0) && (aN(2) > 0), "signs and zeros kept")
    assert(out(2L).sameElements(wav(2, z).bytes),
      "digital silence passes through byte-identically")
  }

  test("decodePng parses a PNG written by the JDK's own encoder (ImageIO cross-check)") {
    // ImageIO's PNG writer picks its own scanline filters — parsing its
    // output exercises the filter reconstruction against an independent
    // encoder's choices, not just our own r-mod-5 schedule
    import java.awt.image.BufferedImage
    val w = 19; val h = 13
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    def px(x: Int, y: Int): (Int, Int, Int) =
      (((x * 67 + y * 31 + 5) % 256), ((x * 11 + y * 89 + 140) % 256),
        ((x * 43 + y * 7 + 77) % 256))
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos), "JDK PNG writer missing")
    val feats = Multimodal.decodePng(bos.toByteArray)
    var f0, f1, f2, f3, f4, f5, f7 = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      f0 += r; f1 += g; f2 += b
      f3 += r * (x + 1); f4 += g * (y + 1); f5 += b.toLong * (x + 1) * (y + 1)
      if (r > g) f7 += 1
    }
    assert(feats.toSeq == Seq(f0, f1, f2, f3, f4, f5, w * 256 + h, f7).map(_.toFloat),
      s"parsed features ${feats.toSeq} disagree with pixel-truth")
  }

  test("synthesizePng bytes are standards-valid and exercise all five filters: JDK reads them back pixel-identically") {
    val rows = Multimodal.synthesizePng(spark, 25)
      .select($"media_id", $"bytes", $"meta.width", $"meta.height")
      .collect()
    assert(rows.length == 25)
    // heights ≥5 carry a Paeth (type 4) row under the r-mod-5 schedule
    assert(rows.exists(_.getInt(3) >= 5), "no image tall enough for all 5 filters")
    for (row <- rows) {
      val bytes = row.getAs[Array[Byte]]("bytes")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected synthesized PNG ${row.getLong(0)}")
      assert(img.getWidth == row.getInt(2) && img.getHeight == row.getInt(3))
      var f0, f1, f2, f3, f4, f5, f7 = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        f0 += r; f1 += g; f2 += b
        f3 += r * (x + 1); f4 += g * (y + 1); f5 += b.toLong * (x + 1) * (y + 1)
        if (r > g) f7 += 1
      }
      val expected = Seq(f0, f1, f2, f3, f4, f5,
        img.getWidth * 256 + img.getHeight, f7).map(_.toFloat)
      assert(Multimodal.decodePng(bytes).toSeq == expected,
        s"media ${row.getLong(0)}: decodePng disagrees with ImageIO pixels")
    }
  }

  test("decodePng validates CRCs and rejects malformed input") {
    val good = {
      val img = new java.awt.image.BufferedImage(6, 6,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos); bos.toByteArray
    }
    intercept[IllegalArgumentException](Multimodal.decodePng(Array[Byte](1, 2)))
    val badSig = good.clone(); badSig(1) = 'X'
    intercept[IllegalArgumentException](Multimodal.decodePng(badSig))
    // flip one byte inside the IHDR payload: the CRC check must trip
    val badCrc = good.clone(); badCrc(17) = (badCrc(17) ^ 0x01).toByte
    intercept[IllegalArgumentException](Multimodal.decodePng(badCrc))
    intercept[IllegalArgumentException](
      Multimodal.decodePng(java.util.Arrays.copyOf(good, good.length - 6)))
  }

  /** Deterministic 256-entry palette for the GIF cross-checks. */
  private def gifPalette: (Array[Byte], Array[Byte], Array[Byte]) = {
    val r = Array.tabulate[Byte](256)(i => ((i * 37 + 11) % 256).toByte)
    val g = Array.tabulate[Byte](256)(i => ((i * 73 + 190) % 256).toByte)
    val b = Array.tabulate[Byte](256)(i => ((i * 151 + 3) % 256).toByte)
    (r, g, b)
  }

  test("decodeGif parses a GIF written by the JDK's own encoder (ImageIO cross-check, real LZW)") {
    // ImageIO's GIF writer emits genuinely COMPRESSED LZW (dictionary
    // hits, code-width growth past 9 bits on a 64x64 image) — parsing
    // its output exercises the decoder paths our literal-only synthetic
    // encoding never reaches. An indexed-color source keeps the
    // round-trip lossless, so pixel truth is exact.
    import java.awt.image.{BufferedImage, IndexColorModel}
    val (pr, pg, pb) = gifPalette
    val icm = new IndexColorModel(8, 256, pr, pg, pb)
    val w = 64; val h = 64
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
    def idxAt(x: Int, y: Int): Int = (x * x + y * 3 + (x * y) % 7) % 256
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, idxAt(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos), "JDK GIF writer missing")
    val feats = Multimodal.decodeGif(bos.toByteArray)
    var f0, f1, f2, f3, f4, f5, f7 = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val i = idxAt(x, y)
      val r = pr(i) & 0xff; val g = pg(i) & 0xff; val b = pb(i) & 0xff
      f0 += r; f1 += g; f2 += b
      f3 += r * (x + 1); f4 += g * (y + 1); f5 += b.toLong * (x + 1) * (y + 1)
      if (r > g) f7 += 1
    }
    assert(feats.toSeq == Seq(f0, f1, f2, f3, f4, f5, w * 256 + h, f7).map(_.toFloat),
      s"parsed features ${feats.toSeq} disagree with pixel-truth")
  }

  test("synthesizeGif bytes are standards-valid: JDK reads them back pixel-identically") {
    val rows = Multimodal.synthesizeGif(spark, 25)
      .select($"media_id", $"bytes", $"meta.width", $"meta.height")
      .collect()
    assert(rows.length == 25)
    for (row <- rows) {
      val bytes = row.getAs[Array[Byte]]("bytes")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected synthesized GIF ${row.getLong(0)}")
      assert(img.getWidth == row.getInt(2) && img.getHeight == row.getInt(3))
      var f0, f1, f2, f3, f4, f5, f7 = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        f0 += r; f1 += g; f2 += b
        f3 += r * (x + 1); f4 += g * (y + 1); f5 += b.toLong * (x + 1) * (y + 1)
        if (r > g) f7 += 1
      }
      val expected = Seq(f0, f1, f2, f3, f4, f5,
        img.getWidth * 256 + img.getHeight, f7).map(_.toFloat)
      assert(Multimodal.decodeGif(bytes).toSeq == expected,
        s"media ${row.getLong(0)}: decodeGif disagrees with ImageIO pixels")
    }
  }

  test("decodeGif rejects malformed input") {
    val good = {
      val (pr, pg, pb) = gifPalette
      val icm = new java.awt.image.IndexColorModel(8, 256, pr, pg, pb)
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "gif", bos); bos.toByteArray
    }
    intercept[IllegalArgumentException](Multimodal.decodeGif(Array[Byte](1, 2)))
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](Multimodal.decodeGif(badMagic))
    // truncation mid-stream: the sub-block walk or LZW refill must trip
    intercept[Exception](
      Multimodal.decodeGif(java.util.Arrays.copyOf(good, good.length / 2)))
  }

  test("synthesizeAnimatedGif frames are JDK-readable frame-identically; delays follow the formula") {
    val rows = Multimodal.synthesizeAnimatedGif(spark, 15)
      .select($"media_id", $"bytes", $"meta.duration_ms").collect()
    assert(rows.length == 15)
    var sawMultiFrame = false
    for (row <- rows) {
      val id = row.getLong(0)
      val bytes = row.getAs[Array[Byte]]("bytes")
      val frames = Multimodal.decodeGifFrames(bytes)
      if (frames.length > 2) sawMultiFrame = true
      // delay + count formulas replayed independently of the parser
      def sha(tag: String): Array[Byte] =
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"42:$tag:$id".getBytes("UTF-8"))
      val nf = 2 + (sha("agifnf")(0) & 0xff) % 4
      assert(frames.length == nf, s"media $id: frame count")
      val dly = sha("agifdly")
      for (f <- frames)
        assert(f.delay_ms == 10 * (2 + (dly(f.frame_idx) & 0xff) % 8),
          s"media $id frame ${f.frame_idx}: delay")
      assert(row.getInt(2) == frames.map(_.delay_ms).sum, "meta duration")
      // independent implementation reads every frame pixel-identically
      val rdr = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      rdr.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      assert(rdr.getNumImages(true) == nf, s"media $id: ImageIO frame count")
      for (k <- 0 until nf) {
        val img = rdr.read(k)
        var f0, f1, f2, f3, f4, f5, f7 = 0L
        for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          f0 += r; f1 += g; f2 += b
          f3 += r * (x + 1); f4 += g * (y + 1); f5 += b.toLong * (x + 1) * (y + 1)
          if (r > g) f7 += 1
        }
        val expected = Seq(f0, f1, f2, f3, f4, f5,
          img.getWidth * 256 + img.getHeight, f7).map(_.toFloat)
        assert(frames(k).features.toSeq == expected,
          s"media $id frame $k: decodeGifFrames disagrees with ImageIO pixels")
      }
      rdr.dispose()
    }
    assert(sawMultiFrame, "no >2-frame GIF sampled")
  }

  test("decodeGifFrames degenerates to decodeGif on single-frame files (delay 0)") {
    for (row <- Multimodal.synthesizeGif(spark, 5).select($"bytes").collect()) {
      val bytes = row.getAs[Array[Byte]]("bytes")
      val frames = Multimodal.decodeGifFrames(bytes)
      assert(frames.length == 1 && frames.head.delay_ms == 0)
      assert(frames.head.features.toSeq == Multimodal.decodeGif(bytes).toSeq)
    }
  }

  test("frameSample: timeline semantics — active frame is the latest with start ≤ t, boundaries included") {
    val media = Multimodal.synthesizeAnimatedGif(spark, 12)
    val byId = Multimodal.frameSample(media, 50).collect()
      .groupBy(_.media_id).view.mapValues(_.sortBy(_.sample_idx)).toMap
    for (row <- media.select($"media_id", $"bytes").collect()) {
      val id = row.getLong(0)
      val frames = Multimodal.decodeGifFrames(row.getAs[Array[Byte]]("bytes"))
      val starts = frames.scanLeft(0)(_ + _.delay_ms)
      val expected = Iterator.from(0).map(_ * 50)
        .takeWhile(_ < starts.last).toSeq
      val got = byId(id)
      assert(got.length == expected.length, s"media $id: sample count")
      for ((t, s) <- expected.zipWithIndex) {
        val k = frames.indices.reverse.find(i => starts(i) <= t).get
        assert(got(s).t_ms == t && got(s).frame_idx == k,
          s"media $id sample $s: expected frame $k at t=$t, got ${got(s)}")
        assert(got(s).f0 == frames(k).features(0).toDouble,
          s"media $id sample $s: features not the active frame's")
      }
    }
    // sample instants t = 0 and t = exact frame starts must both resolve:
    // at t = start(k), frame k (not k-1) is active — at least one media
    // row has a 20/30/40/50-ms-multiple start hit by the 50 ms grid
    val boundaryHits = for {
      row <- media.select($"media_id", $"bytes").collect()
      frames = Multimodal.decodeGifFrames(row.getAs[Array[Byte]]("bytes"))
      starts = frames.scanLeft(0)(_ + _.delay_ms).init
      (st, k) <- starts.zipWithIndex if k > 0 && st % 50 == 0
    } yield (row.getLong(0), st, k)
    assert(boundaryHits.nonEmpty, "corpus never hits a frame-start boundary")
    for ((id, st, k) <- boundaryHits) {
      val hit = byId(id).find(_.t_ms == st).get
      assert(hit.frame_idx == k, s"media $id: t=$st must pick frame $k")
    }
  }

  test("correlated GIF frames follow the mask rule; keyframes match a serial ImageIO reference") {
    val media = Multimodal.synthesizeAnimatedGifCorrelated(spark, 20)
    val rows = media.select($"media_id", $"bytes").collect()
    def framesOf(bytes: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
      val rdr = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      rdr.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      val out = (0 until rdr.getNumImages(true)).map(rdr.read)
      rdr.dispose(); out
    }
    // serial mask-rule reference: expected pixel index of frame k
    def sha(tag: String, id: Long): Array[Byte] =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"42:$tag:$id".getBytes("UTF-8"))
    def chain(tag: String, id: Long): Array[Byte] =
      (0 until 8).flatMap(c => java.security.MessageDigest
        .getInstance("SHA-256")
        .digest(s"42:$tag:$id:$c".getBytes("UTF-8"))).toArray
    var frac = List.empty[Double]
    for (row <- rows) {
      val id = row.getLong(0)
      val imgs = framesOf(row.getAs[Array[Byte]]("bytes"))
      val (w, h) = (imgs.head.getWidth, imgs.head.getHeight)
      val pal = (0 until 24).flatMap(c => java.security.MessageDigest
        .getInstance("SHA-256")
        .digest(s"42:cgifpal:$id:$c".getBytes("UTF-8"))).toArray
      val cur = new Array[Int](w * h)
      for (k <- imgs.indices) {
        val pix = chain(s"cgif$k", id); val msk = chain(s"cgifm$k", id)
        for (j <- 0 until w * h)
          if (k == 0 || (msk(j) & 0xff) < 64) cur(j) = pix(j) & 0xff
        var changed = 0
        for (y <- 0 until h; x <- 0 until w) {
          val e = cur(y * w + x) * 3
          val expected = ((pal(e) & 0xff) << 16) | ((pal(e + 1) & 0xff) << 8) |
            (pal(e + 2) & 0xff)
          assert((imgs(k).getRGB(x, y) & 0xffffff) == expected,
            s"media $id frame $k: pixel ($x,$y) breaks the mask rule")
          if (k > 0 && (imgs(k).getRGB(x, y) & 0xffffff) !=
            (imgs(k - 1).getRGB(x, y) & 0xffffff)) changed += 1
        }
        if (k > 0) frac ::= changed.toDouble / (w * h)
      }
    }
    assert(frac.exists(_ * 100 >= 35) && frac.exists(_ * 100 < 35),
      "corpus must produce both keyframe and non-keyframe transitions")
    // keyframe emission matches the serial rule exactly
    val got = Multimodal.keyframes(media, 35).collect()
      .groupBy(_.media_id).view.mapValues(_.map(_.frame_idx).sorted.toSeq).toMap
    for (row <- rows) {
      val id = row.getLong(0)
      val imgs = framesOf(row.getAs[Array[Byte]]("bytes"))
      val (w, h) = (imgs.head.getWidth, imgs.head.getHeight)
      val expected = imgs.indices.filter { k =>
        k == 0 || {
          var c = 0
          for (y <- 0 until h; x <- 0 until w)
            if ((imgs(k).getRGB(x, y) & 0xffffff) !=
              (imgs(k - 1).getRGB(x, y) & 0xffffff)) c += 1
          c * 100 >= 35 * (w * h)
        }
      }
      assert(got(id) == expected, s"media $id: keyframe set")
    }
  }

  test("frameDeltas match an ImageIO-pixel reference; dimension changes reject loudly") {
    val media = Multimodal.synthesizeAnimatedGif(spark, 10)
    val byId = Multimodal.frameDeltas(media).collect()
      .groupBy(_.media_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
    for (row <- media.select($"media_id", $"bytes").collect()) {
      val id = row.getLong(0)
      val rdr = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      rdr.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("bytes"))))
      val n = rdr.getNumImages(true)
      val imgs = (0 until n).map(rdr.read)
      assert(byId(id).length == n - 1, s"media $id: one delta per pair")
      for (k <- 1 until n) {
        val (a, b) = (imgs(k - 1), imgs(k))
        var dr, dg, db, changed = 0L
        var mx = 0
        for (y <- 0 until b.getHeight; x <- 0 until b.getWidth) {
          val pa = a.getRGB(x, y); val pb = b.getRGB(x, y)
          val ddr = math.abs(((pb >> 16) & 0xff) - ((pa >> 16) & 0xff))
          val ddg = math.abs(((pb >> 8) & 0xff) - ((pa >> 8) & 0xff))
          val ddb = math.abs((pb & 0xff) - (pa & 0xff))
          dr += ddr; dg += ddg; db += ddb
          if (ddr + ddg + ddb > 0) changed += 1
          mx = math.max(mx, ddr + ddg + ddb)
        }
        val got = byId(id)(k - 1)
        assert((got.d_r, got.d_g, got.d_b, got.n_changed, got.max_delta) ==
          (dr, dg, db, changed, mx),
          s"media $id frame $k: deltas disagree with ImageIO pixels")
      }
      rdr.dispose()
    }
    // splice a different-dimensioned second frame: must reject loudly,
    // not read garbage (synthesizeGif ids 0 and 2 differ in dims)
    val g = Multimodal.synthesizeGif(spark, 3)
      .select($"media_id", $"bytes", $"meta.width").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    val (b0, b2) = (g(0L), g(2L))
    val dims = Seq(b0, b2).map(b => Multimodal.decodeGifFrames(b).head)
    assume(dims(0).w != dims(1).w || dims(0).h != dims(1).h)
    val spliced = b0.dropRight(1) ++
      b2.slice(13 + 768, b2.length - 1) :+ 0x3b.toByte
    val df2 = Seq(Multimodal.MediaRow(9L, "video", spliced,
      Multimodal.MediaMeta(0, 0, 3, "gif", 0, 0))).toDF()
    val ex = intercept[org.apache.spark.SparkException](
      Multimodal.frameDeltas(df2).collect())
    assert(ex.getMessage != null)
  }

  test("media dup clusters: labels close the dHash pair graph, exactly one survivor per cluster") {
    val media = Multimodal.synthesizeDhashBmp(spark, 40, 3)
    val pairs = Multimodal.dhashNearDupPairs(
        Multimodal.dhashBands(media).toDF(), maxHamming = 6)
      .select($"a".as("id_a"), $"b".as("id_b"))
    val labels = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val pairRows = pairs.as[(Long, Long)].collect()
    assert(pairRows.nonEmpty, "planted corpus must produce pairs")
    for ((a, b) <- pairRows)
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
    for ((id, lab) <- labels) {
      assert(lab <= id, "label is the component minimum")
      assert(labels(lab) == lab, "label holder carries its own label")
    }
    // survivor rule: exactly one kept per cluster, singletons kept
    val all = media.select($"media_id").as[Long].collect().toSet
    val kept = all.map(id => labels.getOrElse(id, id)).toSeq
    assert(kept.toSet.subsetOf(all), "survivors are corpus members")
    val clustered = labels.values.toSet
    assert(clustered.forall(l => labels.getOrElse(l, l) == l),
      "every cluster's survivor is its own label")
  }

  test("decodeGifFrames rejects malformed animated input loudly") {
    val good = Multimodal.synthesizeAnimatedGif(spark, 1)
      .select($"bytes").collect().head.getAs[Array[Byte]]("bytes")
    // cut mid-way through the later frames: sub-block walk / LZW must trip
    intercept[Exception](Multimodal.decodeGifFrames(
      java.util.Arrays.copyOf(good, good.length * 2 / 3)))
    // missing trailer: the block walk runs off the end — checked reader
    intercept[IllegalArgumentException](Multimodal.decodeGifFrames(
      java.util.Arrays.copyOf(good, good.length - 1)))
    // corrupt a GCE introducer into an unknown block type
    val gceAt = {
      var p = 13 + 768 // header + LSD + GCT
      p
    }
    val bad = good.clone(); bad(gceAt) = 0x7e
    intercept[IllegalArgumentException](Multimodal.decodeGifFrames(bad))
  }

  /** Feature lanes over packed 0xRRGGBB pixels — the spec-side reference
    * shared by every QOI test. */
  private def qoiFeatures(w: Int, h: Int, px: Array[Int]): Seq[Float] = {
    var f0, f1, f2, f3, f4, f5, f7 = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val v = px(y * w + x)
      val r = (v >> 16) & 0xff; val g = (v >> 8) & 0xff; val b = v & 0xff
      f0 += r; f1 += g; f2 += b
      f3 += r * (x + 1); f4 += g * (y + 1); f5 += b.toLong * (x + 1) * (y + 1)
      if (r > g) f7 += 1
    }
    Seq(f0, f1, f2, f3, f4, f5, w * 256 + h, f7).map(_.toFloat)
  }

  test("decodeQoi: a handcrafted stream exercising every op type decodes exactly") {
    // 2x3 image: RGB literal, DIFF, LUMA, RUN of 2, INDEX back to px0
    val out = new java.io.ByteArrayOutputStream()
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    for (v <- Seq(0, 0, 0, 2, 0, 0, 0, 3)) out.write(v) // w=2 h=3 BE
    out.write(3); out.write(0)
    out.write(0xfe); out.write(10); out.write(20); out.write(30) // RGB
    out.write(0x76)                    // DIFF +1,-1,0 -> (11,19,30)
    out.write(0xaa); out.write(0x6b)   // LUMA dg=+10, dr-dg=-2, db-dg=+3 -> (19,29,43)
    out.write(0xc0 | 1)                // RUN 2 -> (19,29,43) twice more
    out.write(0x09)                    // INDEX hash(10,20,30)=9 -> (10,20,30)
    for (_ <- 0 until 7) out.write(0); out.write(1)
    val px = Array(
      0x0a141e,           // (10,20,30)
      (11 << 16) | (19 << 8) | 30,
      (19 << 16) | (29 << 8) | 43,
      (19 << 16) | (29 << 8) | 43,
      (19 << 16) | (29 << 8) | 43,
      0x0a141e)
    assert(Multimodal.decodeQoi(out.toByteArray).toSeq === qoiFeatures(2, 3, px))
  }

  test("encodeQoi/decodeQoi round-trip on random pixels; runs compress for real") {
    val rnd = new scala.util.Random(99)
    for (trial <- 0 until 10) {
      val w = 4 + rnd.nextInt(8); val h = 4 + rnd.nextInt(8)
      // mix of random pixels and planted runs (prob 1/3 copy-previous)
      val px = new Array[Int](w * h)
      for (j <- px.indices) {
        px(j) = if (j > 0 && rnd.nextInt(3) == 0) px(j - 1)
          else rnd.nextInt(1 << 24)
      }
      val bytes = Multimodal.encodeQoi(w, h, px)
      assert(Multimodal.decodeQoi(bytes).toSeq === qoiFeatures(w, h, px),
        s"trial $trial round-trip mismatch")
    }
    // a constant-color image must collapse to runs: header 14 + one RGB
    // op 4 + run ops + end marker 8, far below the 4-bytes/px literal floor
    val flat = Array.fill(64)(0x123456)
    val enc = Multimodal.encodeQoi(8, 8, flat)
    assert(enc.length < 64 * 4 + 22, s"runs not engaged: ${enc.length} bytes")
    assert(enc.length <= 14 + 4 + 2 + 8, s"expected 2 run ops: ${enc.length}")
    assert(Multimodal.decodeQoi(enc).toSeq === qoiFeatures(8, 8, flat))
  }

  test("synthesizeQoi decodes to the documented mask-formula pixels") {
    val rows = Multimodal.synthesizeQoi(spark, 25)
      .select($"media_id", $"bytes", $"meta.width", $"meta.height")
      .collect()
    assert(rows.length == 25)
    for (row <- rows) {
      val id = row.getLong(0)
      val w = row.getInt(2); val h = row.getInt(3)
      def sha(tag: String): Array[Byte] =
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"42:qoi:$id:$tag".getBytes("UTF-8"))
      val chain = (0 until 8).flatMap(k => sha(k.toString)).toArray
      val mask = (0 until 2).flatMap(k => sha(s"mask:$k")).toArray
      val px = new Array[Int](w * h)
      var src = 0
      for (j <- 0 until w * h) {
        if (j == 0 || (mask(j) & 0xff) % 4 != 0) src = j
        px(j) = ((chain(3 * src) & 0xff) << 16) |
          ((chain(3 * src + 1) & 0xff) << 8) | (chain(3 * src + 2) & 0xff)
      }
      assert(Multimodal.decodeQoi(row.getAs[Array[Byte]]("bytes")).toSeq
        === qoiFeatures(w, h, px), s"media $id formula mismatch")
    }
  }

  test("decodeQoi rejects malformed input") {
    val good = Multimodal.encodeQoi(4, 4,
      Array.tabulate(16)(j => j * 0x010203))
    assert(Multimodal.decodeQoi(good).length == 8)
    intercept[IllegalArgumentException](Multimodal.decodeQoi(Array[Byte](1)))
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](Multimodal.decodeQoi(badMagic))
    val rgba = good.clone(); rgba(12) = 4 // channels byte
    intercept[IllegalArgumentException](Multimodal.decodeQoi(rgba))
    intercept[IllegalArgumentException](
      Multimodal.decodeQoi(java.util.Arrays.copyOf(good, good.length - 9)))
    val badEnd = good.clone(); badEnd(badEnd.length - 1) = 0
    intercept[IllegalArgumentException](Multimodal.decodeQoi(badEnd))
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

  /** Reference dHash straight from (r+g+b) pixel sums — the q118 spec
    * computed independently of the BMP parser. */
  private def refDhashBands(gray: (Int, Int) => Int, w: Int, h: Int): Seq[Int] = {
    val gcols = w / 2
    val cells = Array.tabulate(gcols, h)((gx, y) =>
      gray(2 * gx, y) + gray(2 * gx + 1, y))
    val bands = new Array[Int](4)
    var k = 0
    for (y <- 0 until h; x <- 0 until gcols - 1) {
      if (cells(x + 1)(y) > cells(x)(y)) bands(k / 16) |= 1 << (k % 16)
      k += 1
    }
    bands.toSeq
  }

  test("dhashBmpBands agrees with a pixel-truth dHash on a JDK-encoded BMP") {
    import java.awt.image.BufferedImage
    val w = 18; val h = 8
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    def px(x: Int, y: Int): (Int, Int, Int) =
      (((x * 53 + y * 17 + 11) % 256), ((x * 29 + y * 71 + 3) % 256),
        ((x * 13 + y * 97 + 201) % 256))
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos), "JDK BMP writer missing")
    val expected = refDhashBands((x, y) => {
      val (r, g, b) = px(x, y); r + g + b
    }, w, h)
    assert(Multimodal.dhashBmpBands(bos.toByteArray).toSeq == expected)
  }

  test("synthesizeDhashBmp is standards-valid; groups are near in Hamming, non-groups far") {
    val rows = Multimodal.synthesizeDhashBmp(spark, 10, 3)
      .select($"media_id", $"bytes").collect()
    assert(rows.length == 30)
    val bands = rows.map { row =>
      val bytes = row.getAs[Array[Byte]]("bytes")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected synthesized BMP ${row.getLong(0)}")
      assert(img.getWidth == 18 && img.getHeight == 8)
      // parser vs independent decoder: dHash from ImageIO pixels must
      // equal dHash from our own parse of the same file
      val viaImageIO = refDhashBands((x, y) => {
        val rgb = img.getRGB(x, y)
        ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
      }, 18, 8)
      val parsed = Multimodal.dhashBmpBands(bytes).toSeq
      assert(parsed == viaImageIO,
        s"media ${row.getLong(0)}: parsed dHash disagrees with ImageIO pixels")
      row.getLong(0) -> parsed
    }.toMap
    def hd(a: Seq[Int], b: Seq[Int]): Int =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    // in-group distances: 2 spliced bytes per image → ≤ 4 affected grid
    // cells per pair → small Hamming; cross-group chains are independent
    val inGroup = for (g <- 0L until 10L; v <- 0 until 2)
      yield hd(bands(g + v * 10), bands(g + (v + 1) * 10))
    val crossGroup = for (g <- 0L until 9L) yield hd(bands(g), bands(g + 1))
    assert(inGroup.forall(_ <= 8), s"in-group distances: $inGroup")
    assert(crossGroup.forall(_ >= 10), s"cross-group distances: $crossGroup")
  }

  test("dhashNearDupPairs finds every in-group pair on the q118 corpus (banded recall)") {
    val media = Multimodal.synthesizeDhashBmp(spark, 20, 3)
    val pairs = Multimodal
      .dhashNearDupPairs(Multimodal.dhashBands(media).toDF())
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    val expectedInGroup = for {
      g <- 0L until 20L; v1 <- 0 until 3; v2 <- (v1 + 1) until 3
    } yield (g + v1 * 20, g + v2 * 20)
    val missing = expectedInGroup.toSet -- pairs
    assert(missing.isEmpty, s"missed in-group pairs: $missing")
    // no cross-group pair should survive the Hamming verify
    assert(pairs.forall { case (a, b) => a % 20 == b % 20 },
      s"cross-group false positives: ${pairs.filterNot { case (a, b) => a % 20 == b % 20 }}")
  }

  test("dhashBmpBands rejects geometry that does not yield a 64-bit hash") {
    // synthesizeBmp's 4-8 px images parse as BMPs but fail the grid
    // contract loudly instead of silently mis-hashing
    val small = Multimodal.synthesizeBmp(spark, 1)
      .select($"bytes").head().getAs[Array[Byte]](0)
    val e = intercept[IllegalArgumentException](Multimodal.dhashBmpBands(small))
    assert(e.getMessage.contains("dhash grid"))
  }

  // ---- ZIP container (q149) ----

  test("decodeZip parses archives written by the JDK's own ZipOutputStream (streaming data descriptors)") {
    // ZipOutputStream writes DEFLATED entries with general-purpose bit 3
    // set: local-header sizes are zero, real sizes live in the central
    // directory and a trailing data descriptor. Our parser reads sizes
    // from the CD, so these must parse — the path encodeZip never emits.
    import java.util.zip.{ZipOutputStream, ZipEntry, CRC32}
    val contents = Seq(
      "a.txt" -> Array.tabulate[Byte](300)(i => ((i * 7 + 3) % 251).toByte),
      "dir/b.bin" -> Array.tabulate[Byte](1000)(i => (i % 17).toByte), // compressible
      "c" -> Array.emptyByteArray)
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    contents.foreach { case (name, data) =>
      zos.putNextEntry(new ZipEntry(name)); zos.write(data); zos.closeEntry()
    }
    zos.close()
    val members = Multimodal.decodeZip(bos.toByteArray)
    assert(members.map(_.name) == contents.map(_._1))
    members.zip(contents).foreach { case (m, (_, data)) =>
      assert(m.usize == data.length)
      assert(m.content.sameElements(data), s"content mismatch for ${m.name}")
    }
    // STORED entry (preset size + crc, no descriptor) through the same writer
    val bos2 = new java.io.ByteArrayOutputStream()
    val zos2 = new ZipOutputStream(bos2)
    val stored = Array.tabulate[Byte](64)(i => (i * 13).toByte)
    val e = new ZipEntry("s.raw")
    e.setMethod(ZipEntry.STORED)
    e.setSize(stored.length.toLong); e.setCompressedSize(stored.length.toLong)
    val crc = new CRC32; crc.update(stored); e.setCrc(crc.getValue)
    zos2.putNextEntry(e); zos2.write(stored); zos2.closeEntry(); zos2.close()
    val ms = Multimodal.decodeZip(bos2.toByteArray)
    assert(ms.length == 1 && ms.head.method == 0 && ms.head.content.sameElements(stored))
  }

  test("synthesizeZip bytes are standards-valid: JDK's ZipInputStream reads them back member-identically") {
    import java.util.zip.ZipInputStream
    val rows = Multimodal.synthesizeZip(spark, 25)
      .select($"media_id", $"bytes").collect()
    assert(rows.length == 25)
    for (row <- rows) {
      val bytes = row.getAs[Array[Byte]]("bytes")
      val ours = Multimodal.decodeZip(bytes)
      val zis = new ZipInputStream(new java.io.ByteArrayInputStream(bytes))
      val jdk = Iterator.continually(zis.getNextEntry).takeWhile(_ != null).map { e =>
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](256)
        Iterator.continually(zis.read(buf)).takeWhile(_ >= 0)
          .foreach(n => bos.write(buf, 0, n))
        (e.getName, bos.toByteArray)
      }.toVector
      assert(jdk.map(_._1) == ours.map(_.name).toVector)
      ours.zip(jdk).foreach { case (m, (_, data)) =>
        assert(m.content.sameElements(data),
          s"JDK and first-principles parse disagree on ${m.name} of archive ${row.getLong(0)}")
      }
    }
  }

  test("synthesizeZip members follow the documented replay formulas") {
    val feats = Multimodal.memberFeatures(
      Multimodal.extractMembers(Multimodal.synthesizeZip(spark, 10),
        Multimodal.decodeZip)).collect().sortBy(m => (m.media_id, m.member_idx))
    def sha(s: String): Array[Byte] =
      java.security.MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
    val expected = (0 until 10).flatMap { i =>
      val nm = 1 + (sha(s"42:zipdim:$i")(0) & 0xff) % 3
      (0 until nm).map { k =>
        val len = 16 + (sha(s"42:ziplen:$i:$k")(0) & 0xff) % 48
        val chain = sha(s"42:zip:$i:$k") ++ sha(s"42:zipc1:$i:$k")
        val content = chain.take(len)
        val f0 = content.map(_ & 0xff).map(_.toLong).sum
        val f1 = content.zipWithIndex.map { case (b, j) => (b & 0xff).toLong * (j + 1) }.sum
        (i.toLong, k, s"m${k}_$i.bin", if ((i + k) % 2 == 0) 0 else 8,
          len.toLong, f0, f1, (content.head & 0xff).toLong, (content.last & 0xff).toLong)
      }
    }
    assert(feats.length == expected.length)
    feats.zip(expected).foreach { case (m, (i, k, nm2, meth, len, f0, f1, f2, f3)) =>
      assert((m.media_id, m.member_idx, m.name, m.method, m.usize,
        m.f0, m.f1, m.f2, m.f3) == ((i, k, nm2, meth, len, f0, f1, f2, f3)))
    }
  }

  // ---- gzip container (q153) ----

  test("decodeGzipMembers parses JDK GZIPOutputStream output, including concatenated members") {
    import java.util.zip.GZIPOutputStream
    def gz(data: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new GZIPOutputStream(bos)
      g.write(data); g.close()
      bos.toByteArray
    }
    val a = Array.tabulate[Byte](500)(i => ((i * 11 + 5) % 251).toByte)
    val b = Array.tabulate[Byte](100)(i => (i % 3).toByte)
    val single = Multimodal.decodeGzipMembers(gz(a))
    assert(single.length == 1 && single.head.content.sameElements(a))
    assert(single.head.name == "") // JDK writes no FNAME
    val multi = Multimodal.decodeGzipMembers(gz(a) ++ gz(b) ++ gz(Array.emptyByteArray))
    assert(multi.length == 3)
    assert(multi(0).content.sameElements(a) && multi(1).content.sameElements(b)
      && multi(2).content.isEmpty)
    assert(multi.map(_.member_idx) == Vector(0, 1, 2))
  }

  test("synthesizeGzip bytes are standards-valid: JDK GZIPInputStream reads them back byte-identically") {
    import java.util.zip.GZIPInputStream
    val rows = Multimodal.synthesizeGzip(spark, 25)
      .select($"media_id", $"bytes").collect()
    for (row <- rows) {
      val bytes = row.getAs[Array[Byte]]("bytes")
      val ours = Multimodal.decodeGzipMembers(bytes)
      // GZIPInputStream transparently concatenates members: total bytes
      // must equal the concatenation of our per-member contents (it also
      // exercises FEXTRA/FNAME/FCOMMENT/FHCRC skipping on real headers)
      val g = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      Iterator.continually(g.read(buf)).takeWhile(_ >= 0)
        .foreach(n => bos.write(buf, 0, n))
      assert(bos.toByteArray.toSeq == ours.flatMap(_.content.toSeq),
        s"JDK and first-principles parse disagree on archive ${row.getLong(0)}")
    }
  }

  test("decodeGzipMembers rejects malformed streams loudly") {
    val good = Multimodal.synthesizeGzip(spark, 1)
      .select($"bytes").head().getAs[Array[Byte]](0)
    // bad magic
    val badMagic = good.clone(); badMagic(0) = 0x1e
    assert(intercept[IllegalArgumentException](
      Multimodal.decodeGzipMembers(badMagic)).getMessage.contains("magic"))
    // reserved FLG bit
    val badFlg = good.clone(); badFlg(3) = (badFlg(3) | 0x80).toByte
    assert(intercept[IllegalArgumentException](
      Multimodal.decodeGzipMembers(badFlg)).getMessage.contains("reserved"))
    // flipped trailer CRC byte (last member trailer is bytes[len-8..len-5])
    val badCrc = good.clone()
    badCrc(badCrc.length - 8) = (badCrc(badCrc.length - 8) ^ 0x01).toByte
    assert(intercept[IllegalArgumentException](
      Multimodal.decodeGzipMembers(badCrc)).getMessage.contains("CRC32"))
    // flipped ISIZE
    val badSz = good.clone()
    badSz(badSz.length - 4) = (badSz(badSz.length - 4) ^ 0x01).toByte
    assert(intercept[IllegalArgumentException](
      Multimodal.decodeGzipMembers(badSz)).getMessage.contains("ISIZE"))
  }

  test("synthesizeGzip members follow the documented replay formulas, header variants included") {
    val feats = Multimodal.memberFeatures(
      Multimodal.extractMembers(Multimodal.synthesizeGzip(spark, 20),
        Multimodal.decodeGzipMembers)).collect()
      .sortBy(m => (m.media_id, m.member_idx))
    def sha(s: String): Array[Byte] =
      java.security.MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
    val expected = (0 until 20).flatMap { i =>
      val nm = 1 + (sha(s"42:gzdim:$i")(0) & 0xff) % 3
      (0 until nm).map { k =>
        val len = 16 + (sha(s"42:gzlen:$i:$k")(0) & 0xff) % 48
        val content = (sha(s"42:gz:$i:$k") ++ sha(s"42:gzc1:$i:$k")).take(len)
        val name = if ((i + k) % 2 == 0) s"g${k}_$i" else ""
        (i.toLong, k, name, len.toLong,
          content.map(_ & 0xff).map(_.toLong).sum)
      }
    }
    assert(feats.length == expected.length)
    feats.zip(expected).foreach { case (m, (i, k, nm2, len, f0)) =>
      assert((m.media_id, m.member_idx, m.name, m.usize, m.f0) ==
        ((i, k, nm2, len, f0)))
      assert(m.method == 8)
    }
  }

  test("decodeZip rejects malformed archives loudly") {
    val good = Multimodal.synthesizeZip(spark, 1)
      .select($"bytes").head().getAs[Array[Byte]](0)
    // flipped content byte: CRC must catch it (flip a byte in the first
    // member's STORED body — archive 0 member 0 is stored, data at
    // local header 0 + 30 + name length)
    val nameLen = (good(26) & 0xff) | ((good(27) & 0xff) << 8)
    val tampered = good.clone()
    tampered(30 + nameLen) = (tampered(30 + nameLen) ^ 0x01).toByte
    val e1 = intercept[IllegalArgumentException](Multimodal.decodeZip(tampered))
    assert(e1.getMessage.contains("CRC32"))
    // truncated tail: EOCD gone
    val e2 = intercept[IllegalArgumentException](
      Multimodal.decodeZip(good.dropRight(3)))
    assert(e2.getMessage.contains("end-of-central-directory"))
    // garbage: no signature anywhere
    val e3 = intercept[IllegalArgumentException](
      Multimodal.decodeZip(Array.fill[Byte](64)(0x41)))
    assert(e3.getMessage.contains("end-of-central-directory"))
  }

  test("declared sizes/offsets ≥ 2^31 hit the validated contract, never raw array errors") {
    def patchLE32(b: Array[Byte], off: Int, v: Long): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte
      b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    val zip = Multimodal.encodeZip(Seq(("a.bin", 0, Array[Byte](1, 2, 3))))
    val eocd = zip.length - 22 // no archive comment in encodeZip output
    val cdOff = ((zip(eocd + 16) & 0xff) | ((zip(eocd + 17) & 0xff) << 8) |
      ((zip(eocd + 18) & 0xff) << 16) | ((zip(eocd + 19) & 0xff) << 24))
    // local-header offset field wraps negative if narrowed before checking
    val z1 = zip.clone(); patchLE32(z1, cdOff + 42, 0x80000000L)
    val e1 = intercept[IllegalArgumentException](Multimodal.decodeZip(z1))
    assert(e1.getMessage.contains("overruns the archive"), e1.getMessage)
    // declared uncompressed size just under the zip64 sentinel
    val z2 = zip.clone(); patchLE32(z2, cdOff + 24, 0xfffffff0L)
    val e2 = intercept[IllegalArgumentException](Multimodal.decodeZip(z2))
    assert(e2.getMessage.contains("2 GiB"), e2.getMessage)
    // tar: a 12-digit octal size (2^33) with a RECOMPUTED checksum, so
    // only the Long-domain overrun bound can reject it
    val tar = Multimodal.encodeTarEntries(Seq(("f", 0, Array[Byte](1))))
    val t1 = tar.clone()
    val oct = f"${1L << 33}%011o".getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1)
    System.arraycopy(oct, 0, t1, 124, oct.length)
    java.util.Arrays.fill(t1, 148, 156, ' '.toByte)
    var sum = 0L; (0 until 512).foreach(j => sum += t1(j) & 0xff)
    val cs = f"$sum%06o".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    System.arraycopy(cs, 0, t1, 148, cs.length)
    t1(154) = 0; t1(155) = ' '.toByte
    val e4 = intercept[IllegalArgumentException](Multimodal.decodeTar(t1))
    assert(e4.getMessage.contains("overruns the stream"), e4.getMessage)
  }

  // ---- tar container (q161) ----

  test("decodeTar roundtrips entries and the header encodes ustar fields at spec offsets") {
    val data = Array.tabulate[Byte](700)(i => ((i * 7 + 3) % 251).toByte)
    val raw = Multimodal.encodeTarEntries(Seq(
      ("dir0/", 5, Array.emptyByteArray),
      ("dir0/file.bin", 0, data),
      ("exact512", 0, Array.fill[Byte](512)(9))))
    // spec offsets on the second header block (starts at 512: the dir
    // entry has no content blocks): octal size at 124, magic at 257
    val h2 = raw.slice(512, 1024)
    assert(new String(h2.slice(124, 135), "ISO-8859-1") == "00000001274") // 700 octal
    assert(new String(h2.slice(257, 262), "ISO-8859-1") == "ustar")
    val got = Multimodal.decodeTar(raw)
    assert(got.map(m => (m.member_idx, m.name, m.method, m.usize)) == Seq(
      (0, "dir0/", 5, 0L), (1, "dir0/file.bin", 0, 700L), (2, "exact512", 0, 512L)))
    assert(got(1).content.sameElements(data))
    assert(got(2).content.forall(_ == 9))
    // total size: headers (3*512) + data (1024 + 512) + end marker (1024)
    assert(raw.length == 3 * 512 + 1024 + 512 + 1024)
  }

  test("decodeTar rejects malformed archives loudly") {
    val good = Multimodal.encodeTarEntries(Seq(("f", 0, Array[Byte](1, 2, 3))))
    def corrupt(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    def expectFail(b: Array[Byte], needle: String): Unit = {
      val e = intercept[IllegalArgumentException](Multimodal.decodeTar(b))
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    expectFail(corrupt(c => c(0) = 'X'), "checksum") // name change breaks sum
    expectFail(corrupt(c => c(259) = 'X'), "magic")   // usta'X'r
    expectFail(corrupt(c => c(515) = 1), "padding")  // nonzero pad after 3 bytes
    expectFail(good.dropRight(512), "two zero blocks") // half an end marker
    expectFail(good.take(512), "multiple of 512")     // truncated mid-structure
    // unsupported typeflag with a VALID checksum (raw flips also break
    // the checksum and fail earlier — also asserted above)
    expectFail(Multimodal.encodeTarEntries(Seq(("f", 7, Array[Byte](1)))),
      "typeflag")
  }

  test("synthesizeTar entries follow the documented replay formulas") {
    val feats = Multimodal.memberFeatures(
      Multimodal.extractMembers(Multimodal.synthesizeTar(spark, 20),
        Multimodal.decodeTar)).collect()
      .sortBy(m => (m.media_id, m.member_idx))
    def sha(s: String): Array[Byte] =
      java.security.MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
    val expected = (0 until 20).flatMap { i =>
      val nm = 1 + (sha(s"42:tdim:$i")(0) & 0xff) % 3
      (0 until nm).map { k =>
        if ((i + k) % 4 == 0) (i.toLong, k, s"d$k/", 5, 0L, 0L, -1L)
        else {
          val len = 16 + (sha(s"42:tlen:$i:$k")(0) & 0xff) % 48
          val content = (sha(s"42:tc:$i:$k") ++ sha(s"42:tc1:$i:$k")).take(len)
          (i.toLong, k, s"d$k/f_$i", 0, len.toLong,
            content.map(_ & 0xff).map(_.toLong).sum, (content(0) & 0xff).toLong)
        }
      }
    }
    assert(feats.length == expected.length)
    feats.zip(expected).foreach { case (f, (mid, k, name, method, len, sum, first)) =>
      assert(f.media_id == mid && f.member_idx == k && f.name == name &&
        f.method == method && f.usize == len && f.f0 == sum && f.f2 == first,
        s"mismatch at ($mid, $k)")
    }
  }

  // ---- WARC container (q158) ----

  test("decodeWarc parses a hand-written record literal with known answers") {
    val payload = "hello WARC world!" // 17 bytes
    val raw = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Date: 2026-08-15T00:00:00Z\r\n" +
      "WARC-Target-URI: http://example.com/a\r\n" +
      "Content-Length: 17\r\n" +
      "\r\n" + payload + "\r\n\r\n").getBytes("ISO-8859-1")
    val got = Multimodal.decodeWarc(raw)
    assert(got.length == 1)
    assert(got.head.name == "http://example.com/a")
    assert(got.head.method == 1) // response
    assert(got.head.usize == 17L)
    assert(new String(got.head.content, "ISO-8859-1") == payload)
  }

  test("decodeWarc is length-delimited: payloads containing WARC markers and CRLFs survive") {
    // the poison payload embeds a full fake record header — a parser
    // that scans for separators instead of honoring Content-Length
    // splits here and fails
    val poison = ("chunk\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 0\r\n\r\n\r\n\r\ntail").getBytes("ISO-8859-1")
    val rec1 = Multimodal.encodeWarcRecord("metadata", None, poison)
    val rec2 = Multimodal.encodeWarcRecord("request",
      Some("http://x.example/"), Array[Byte](1, 2, 3), version = "WARC/1.1",
      extraHeaders = Seq("X-Extra" -> "v"))
    val got = Multimodal.decodeWarc(rec1 ++ rec2)
    assert(got.length == 2)
    assert(got(0).method == 4 && got(0).name == "" &&
      got(0).content.sameElements(poison))
    assert(got(1).method == 3 && got(1).name == "http://x.example/" &&
      got(1).content.sameElements(Array[Byte](1, 2, 3)))
  }

  test("decodeWarc header names are case-insensitive; unknown headers skip") {
    val raw = ("WARC/1.1\r\n" +
      "warc-type: warcinfo\r\n" +
      "X-Unknown-Extension: anything: with: colons\r\n" +
      "CONTENT-LENGTH: 3\r\n" +
      "\r\nabc\r\n\r\n").getBytes("ISO-8859-1")
    val got = Multimodal.decodeWarc(raw)
    assert(got.length == 1 && got.head.method == 0 && got.head.usize == 3L)
  }

  test("decodeWarc rejects malformed records loudly") {
    def expectFail(s: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](
        Multimodal.decodeWarc(s.getBytes("ISO-8859-1")))
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    expectFail("HTTP/1.1\r\nContent-Length: 0\r\n\r\n\r\n\r\n", "version")
    expectFail("WARC/2.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n", "version")
    expectFail("WARC/1.0\r\nWARC-Type: response\r\n\r\n\r\n\r\n",
      "missing Content-Length")
    expectFail("WARC/1.0\r\nWARC-Type: bogus\r\nContent-Length: 0\r\n\r\n\r\n\r\n",
      "unknown WARC-Type")
    expectFail("WARC/1.0\r\nno colon line\r\nContent-Length: 0\r\n\r\n\r\n\r\n",
      "malformed header")
    expectFail("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 10\r\n\r\nshort\r\n\r\n",
      "overruns")
    // block present but terminator bytes wrong
    expectFail("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 3\r\n\r\nabcXXXX",
      "terminator")
  }

  test("synthesizeWarc records follow the documented replay formulas, header variants included") {
    val feats = Multimodal.memberFeatures(
      Multimodal.extractMembers(Multimodal.synthesizeWarc(spark, 20),
        Multimodal.decodeWarc)).collect()
      .sortBy(m => (m.media_id, m.member_idx))
    def sha(s: String): Array[Byte] =
      java.security.MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
    val expected = (0 until 20).flatMap { i =>
      val nm = 1 + (sha(s"42:wdim:$i")(0) & 0xff) % 3
      (0 until nm).map { k =>
        val len = 16 + (sha(s"42:wlen:$i:$k")(0) & 0xff) % 48
        val content = (sha(s"42:wc:$i:$k") ++ sha(s"42:wc1:$i:$k")).take(len)
        val name = if ((i + k) % 5 == 0) "" else s"http://w$k.example/$i"
        val method = Vector(1, 3, 4)((i + k) % 3)
        (i.toLong, k, name, method, len.toLong,
          content.map(_ & 0xff).map(_.toLong).sum)
      }
    }
    assert(feats.length == expected.length)
    feats.zip(expected).foreach { case (f, (mid, k, name, method, len, sum)) =>
      assert(f.media_id == mid && f.member_idx == k && f.name == name &&
        f.method == method && f.usize == len && f.f0 == sum,
        s"mismatch at ($mid, $k)")
    }
  }

  // ---- decodeBmpSobel (q191) ---------------------------------------

  /** Serial Sobel reference over explicit (r, g, b) pixel truth. */
  private def sobelRef(w: Int, h: Int,
                       px: (Int, Int) => (Int, Int, Int)): Seq[Float] = {
    val lum = Array.tabulate(h, w) { (y, x) =>
      val (r, g, b) = px(x, y)
      (77 * r + 151 * g + 28 * b + 128) >> 8
    }
    var sAx, sAy, mMax, edges, posL, interior, lumSum = 0L
    for (y <- 0 until h; x <- 0 until w) lumSum += lum(y)(x)
    for (y <- 1 until h - 1; x <- 1 until w - 1) {
      val gx = -lum(y - 1)(x - 1) + lum(y - 1)(x + 1) -
        2 * lum(y)(x - 1) + 2 * lum(y)(x + 1) -
        lum(y + 1)(x - 1) + lum(y + 1)(x + 1)
      val gy = -lum(y - 1)(x - 1) - 2 * lum(y - 1)(x) - lum(y - 1)(x + 1) +
        lum(y + 1)(x - 1) + 2 * lum(y + 1)(x) + lum(y + 1)(x + 1)
      val m = math.abs(gx) + math.abs(gy)
      sAx += math.abs(gx); sAy += math.abs(gy)
      if (m > mMax) mMax = m
      if (m >= 256) edges += 1
      posL += m.toLong * ((y * w + x) % 97 + 1)
      interior += 1
    }
    Seq(sAx, sAy, mMax, edges, posL, interior, w * 256 + h, lumSum)
      .map(_.toFloat)
  }

  private def jdkBmp(w: Int, h: Int,
                     px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos), "JDK BMP writer missing")
    bos.toByteArray
  }

  // ---- decodeWavWht (q192) -----------------------------------------

  test("decodeWavWht matches a serial transform over JDK-encoded sample truth") {
    val samples = Array.tabulate[Short](80)(j =>
      ((j * 977 + 419) % 65536 - 32768).toShort)
    val got = Multimodal.decodeWavWht(jdkWavBytes(samples, 10000)).toSeq
    val ks = Seq(0, 1, 2, 4, 8, 16, 32, 63)
    val want = ks.map { k =>
      (0 until 64).map { n =>
        (if (java.lang.Integer.bitCount(k & n) % 2 == 0) 1L else -1L) *
          samples(n)
      }.sum.toFloat
    }
    assert(got == want, s"got $got want $want")
  }

  test("decodeWavWht orthogonality laws: DC and alternating signals concentrate in one lane") {
    // constant signal: everything lands in the k=0 (DC) lane
    val dc = Multimodal.decodeWavWht(
      jdkWavBytes(Array.fill[Short](64)(100), 8000)).toSeq
    assert(dc == Seq(6400f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), dc.toString)
    // alternating ±A: sign pattern is (−1)^popcount(1 AND n) → all of
    // the energy lands in the k=1 lane, every other lane cancels
    val alt = Multimodal.decodeWavWht(jdkWavBytes(
      Array.tabulate[Short](64)(n => if (n % 2 == 0) 500 else -500), 8000)).toSeq
    assert(alt == Seq(0f, 32000f, 0f, 0f, 0f, 0f, 0f, 0f), alt.toString)
    // short file: the window is the file, not zero-padded phantom taps
    val short = Multimodal.decodeWavWht(
      jdkWavBytes(Array.fill[Short](40)(100), 8000)).toSeq
    val wantShort = Seq(0, 1, 2, 4, 8, 16, 32, 63).map { k =>
      (0 until 40).map(n =>
        (if (java.lang.Integer.bitCount(k & n) % 2 == 0) 100L else -100L)).sum.toFloat
    }
    assert(short == wantShort, short.toString)
  }

  test("decodeBmpSobel matches a serial Sobel over JDK-encoded pixel truth") {
    val w = 9; val h = 7
    def px(x: Int, y: Int): (Int, Int, Int) =
      (((x * 61 + y * 23 + 7) % 256), ((x * 31 + y * 83 + 101) % 256),
        ((x * 17 + y * 41 + 191) % 256))
    val got = Multimodal.decodeBmpSobel(jdkBmp(w, h, px)).toSeq
    assert(got == sobelRef(w, h, px), s"got $got")
  }

  test("decodeBmpSobel analytic laws: flat image is edgeless, a vertical step has no gy") {
    // constant image: every gradient lane zero, luma/meta lanes alive
    val flat = Multimodal.decodeBmpSobel(jdkBmp(6, 6, (_, _) => (80, 120, 40)))
    val l = (77 * 80 + 151 * 120 + 28 * 40 + 128) >> 8
    assert(flat.toSeq.take(5) == Seq(0f, 0f, 0f, 0f, 0f) &&
      flat(5) == 16f && flat(6) == (6 * 256 + 6).toFloat &&
      flat(7) == (36 * l).toFloat, flat.toSeq.toString)
    // vertical step edge (left dark, right bright): gy = 0 everywhere,
    // gx > 0 at the boundary columns → f1 = 0, f0 > 0
    val step = Multimodal.decodeBmpSobel(
      jdkBmp(8, 6, (x, _) => if (x < 4) (10, 10, 10) else (200, 200, 200)))
    assert(step(1) == 0f && step(0) > 0f, step.toSeq.toString)
    // and the transposed law for a horizontal step
    val hstep = Multimodal.decodeBmpSobel(
      jdkBmp(6, 8, (_, y) => if (y < 4) (10, 10, 10) else (200, 200, 200)))
    assert(hstep(0) == 0f && hstep(1) > 0f, hstep.toSeq.toString)
  }
}
