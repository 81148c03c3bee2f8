package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Baseline JPEG codec: formula-exactness of the synthesis lattice,
  * two-way ImageIO cross-checks (we read ImageIO's files, ImageIO reads
  * ours), restart/ragged-edge/sampling coverage, and the malformed-input
  * battery (every corruption class fails with the validated message, not
  * a raw array error). */
class JpegSpec extends SparkSpec {
  import spark.implicits._

  private def sgn(i: Int): Int =
    if (i == 0 || i == 3 || i == 4 || i == 7) 1 else -1

  /** Reference pixels straight from the generation formula (the q171
    * oracle's rule, in Scala): returns (r, g, b) for pixel (x, y). */
  private def formulaRgb(id: Long, w: Int, h: Int, x: Int, y: Int)
      : (Int, Int, Int) = {
    def sha(tag: String): Array[Byte] =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"42:jpg:$id:$tag".getBytes("UTF-8"))
    def ub(a: Array[Byte], i: Int): Int = a(i) & 0xff
    val mx = x / 16; val my = y / 16
    val bi = (y % 16) / 8 * 2 + (x % 16) / 8
    val yh = sha(s"y:$my:$mx:$bi")
    val sx = sgn(x % 8); val sy = sgn(y % 8)
    val yv = 128 + (ub(yh, 0) % 193 - 96) + (ub(yh, 1) % 21 - 10) * sx +
      (ub(yh, 2) % 21 - 10) * sy + (ub(yh, 3) % 21 - 10) * sx * sy
    val scx = sgn((x % 16) / 2); val scy = sgn((y % 16) / 2)
    def chroma(tag: String): Int = {
      val ch = sha(s"$tag:$my:$mx")
      (ub(ch, 0) % 161 - 80) + (ub(ch, 1) % 17 - 8) * scx +
        (ub(ch, 2) % 17 - 8) * scy + (ub(ch, 3) % 17 - 8) * scx * scy
    }
    val cb = chroma("cb"); val cr = chroma("cr")
    def clamp(v: Int) = math.max(0, math.min(255, v))
    (clamp(yv + ((91881 * cr + 32768) >> 16)),
      clamp(yv - ((22554 * cb + 46802 * cr + 32768) >> 16)),
      clamp(yv + ((116130 * cb + 32768) >> 16)))
  }

  test("decoded features equal the generation-formula replay, all 200 files") {
    val media = Jpeg.synthesizeJpeg(spark, 200).collect()
    assert(media.length == 200)
    media.foreach { row =>
      val id = row.getLong(0)
      val bytes = row.getAs[Array[Byte]]("bytes")
      val meta = row.getStruct(3)
      val w = meta.getInt(0); val h = meta.getInt(1)
      val got = Jpeg.decodeJpeg(bytes)
      // formula-side feature sums
      var f0 = 0L; var f1 = 0L; var f2 = 0L; var f3 = 0L; var f4 = 0L
      var f5 = 0L; var f7 = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = formulaRgb(id, w, h, x, y)
        f0 += r; f1 += g; f2 += b
        f3 += r.toLong * (x + 1); f4 += g.toLong * (y + 1)
        f5 += b.toLong * (x + 1) * (y + 1)
        if (r > g) f7 += 1
      }
      val want = Array(f0, f1, f2, f3, f4, f5, (w * 256 + h).toLong, f7)
        .map(_.toFloat)
      assert(got.toSeq == want.toSeq, s"feature mismatch for media $id (${w}x$h)")
    }
  }

  test("ImageIO reads our synthesized files and agrees with our decoder") {
    // ImageIO (libjpeg) uses a different IDCT, FANCY (triangular) chroma
    // upsampling, and its own YCbCr rounding, while this decoder uses the
    // spec-sanctioned sample replication — at MCU-boundary chroma steps
    // (cd spans ±80) the two legitimately differ by up to ~(Δ/4)·1.772.
    // So the bound is statistical: mean |diff| stays small because only
    // chroma-gradient pixels drift, while a transposed IDCT, wrong
    // zigzag, swapped Cb/Cr, or misplaced block desyncs MOST pixels by
    // ~100 (mean ≫ 10). Max is still bounded by the upsampling algebra.
    val media = Jpeg.synthesizeJpeg(spark, 24).collect()
    var checked = 0
    media.foreach { row =>
      val bytes = row.getAs[Array[Byte]]("bytes")
      val meta = row.getStruct(3)
      val w = meta.getInt(0); val h = meta.getInt(1)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO could not parse our JPEG")
      assert(img.getWidth == w && img.getHeight == h)
      val id = row.getLong(0)
      var worst = 0
      var sumAbs = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val (er, eg, eb) = formulaRgb(id, w, h, x, y)
        val dr = math.abs(((rgb >> 16) & 0xff) - er)
        val dg = math.abs(((rgb >> 8) & 0xff) - eg)
        val db = math.abs((rgb & 0xff) - eb)
        worst = math.max(worst, math.max(dr, math.max(dg, db)))
        sumAbs += dr + dg + db
      }
      val mean = sumAbs.toDouble / (3L * w * h)
      assert(mean <= 10.0, s"media $id: mean ImageIO deviation $mean")
      assert(worst <= 96, s"media $id: ImageIO disagrees by $worst")
      checked += 1
    }
    assert(checked == 24)
  }

  test("our decoder reads ImageIO-written grayscale JPEGs within ±1") {
    // reverse direction, upsampling-free: TYPE_BYTE_GRAY encodes 1
    // component at 1x1 sampling, so the only engine difference left is
    // the IDCT (spec allows ±1). Pixel probe: compare our feature sums
    // against sums over ImageIO's own read-back.
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 6) {
      val w = 9 + rnd.nextInt(24); val h = 9 + rnd.nextInt(24)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) {
        val v = rnd.nextInt(256)
        img.getRaster.setSample(x, y, 0, v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      val bytes = bos.toByteArray
      val got = Jpeg.decodeJpeg(bytes)
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      var f0 = 0L; var worstOk = true
      var sumAbsDiff = 0L
      // reconstruct our decoded Y from feature lanes? lanes are sums —
      // compare lane-by-lane against ImageIO read-back sums instead
      var e = Array(0L, 0L, 0L, 0L, 0L, 0L, (w * 256 + h).toLong, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val v = back.getRaster.getSample(x, y, 0)
        e(0) += v; e(1) += v; e(2) += v
        e(3) += v.toLong * (x + 1); e(4) += v.toLong * (y + 1)
        e(5) += v.toLong * (x + 1) * (y + 1)
      }
      // per-pixel ±1 IDCT slack accumulates in the sums: bound each lane
      val n = w.toLong * h
      val slack = Array(n, n, n, n * w, n * h, n * w * h, 0L, n)
      for (k <- 0 until 7)
        assert(math.abs(got(k).toLong - e(k)) <= slack(k),
          s"trial $trial lane $k: got ${got(k)}, imageio ${e(k)}")
    }
  }

  test("restart markers: all three DRI classes decode and predictors reset") {
    // dri is sha-derived; over 200 files all three classes occur. The
    // formula test already proves correctness; here assert the corpus
    // really contains DRI segments and RST bytes (in-gate coverage).
    val media = Jpeg.synthesizeJpeg(spark, 60).collect()
    val classes = media.map { row =>
      val bytes = row.getAs[Array[Byte]]("bytes")
      // scan for DRI marker FFDD
      (0 until bytes.length - 1).exists(i =>
        (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xdd)
    }
    assert(classes.count(identity) > 10, "expected DRI files in the corpus")
    assert(classes.count(!_) > 10, "expected DRI-free files in the corpus")
  }

  test("malformed battery: every corruption class fails validated") {
    val good = Jpeg.synthesizeJpeg(spark, 1).collect()(0)
      .getAs[Array[Byte]]("bytes")
    def failsWith(mut: Array[Byte] => Array[Byte], frag: String): Unit = {
      val bad = mut(good.clone())
      val e = intercept[IllegalArgumentException](Jpeg.decodeJpeg(bad))
      assert(e.getMessage.contains(frag),
        s"wanted '$frag' in: ${e.getMessage}")
    }
    // not a JPEG
    failsWith(b => { b(0) = 0; b }, "missing SOI")
    // truncation inside entropy data
    failsWith(b => b.take(b.length - 40), "truncated")
    // progressive SOF: rewrite C0 -> C2
    failsWith({ b =>
      var i = 2
      while (!((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xc0)) i += 1
      b(i + 1) = 0xc2.toByte; b
    }, "progressive")
    // 16-bit DQT: set Pq high nibble
    failsWith({ b =>
      var i = 2
      while (!((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xdb)) i += 1
      b(i + 4) = (0x10 | (b(i + 4) & 0x0f)).toByte; b
    }, "16-bit quantization")
    // zero width (SOF payload: len@+2, precision@+4, h@+5..6, w@+7..8)
    failsWith({ b =>
      var i = 2
      while (!((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xc0)) i += 1
      b(i + 7) = 0; b(i + 8) = 0; b
    }, "zero dimension")
    // unsupported sampling 3x1 on Y (first component's h/v byte: SOF
    // payload nc@+9, then per-comp id@+10, hv@+11, tq@+12)
    failsWith({ b =>
      var i = 2
      while (!((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xc0)) i += 1
      b(i + 11) = 0x31.toByte; b
    }, "sampling")
    // stray marker inside entropy data (corrupt stuffing)
    failsWith({ b =>
      // flip a stuffed 00 after FF into a marker-looking byte, if present
      var i = b.length - 3
      var done = false
      while (i > 2 && !done) {
        if ((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0x00) {
          b(i + 1) = 0xc7.toByte; done = true
        }
        i -= 1
      }
      if (!done) b(b.length - 20) = 0xff.toByte // inject a dangling FF
      b
    }, "JPEG")
  }

  test("ragged edges and multi-MCU interleave are present in the corpus") {
    val dims = Jpeg.synthesizeJpeg(spark, 100)
      .select(col("meta.width"), col("meta.height")).as[(Int, Int)].collect()
    assert(dims.forall { case (w, h) => w >= 9 && w <= 22 && h >= 9 && h <= 22 })
    assert(dims.exists { case (w, h) => w > 16 && h > 16 }, "multi-MCU files")
    assert(dims.exists { case (w, _) => w % 16 != 0 }, "ragged edges")
  }
}
