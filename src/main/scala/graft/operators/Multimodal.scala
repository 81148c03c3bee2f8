package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media as opaque `binary` columns with a typed metadata
  * struct, processed by per-partition JVM transforms.
  *
  * The codec seam carries REAL first-principles decoders for BMP, WAV,
  * PNG, GIF (incl. animated frames), QOI, and JPEG (operators/Jpeg.scala),
  * plus a real resize ([[resizeBmp]]) and real frame sampling
  * ([[frameSample]]); `decodeStub` / `resizeStub` / `frameSampleStub`
  * remain as the deterministic-fake path for formats with no
  * in-container library. Everything is designed for scale:
  *
  *  - **Schema**: (media_id, kind, bytes, meta struct) — metadata travels
  *    in a typed struct so filters on width/duration prune without
  *    touching bytes (column pruning keeps the binary column unread when
  *    a query selects only meta).
  *  - **Batch shape**: feature extraction is `mapPartitions` over a typed
  *    Dataset — one iterator pass per partition, no per-row driver trips,
  *    the Scala analogue of a vectorized batch UDF.
  *  - **Partitioning**: decode immediately after scan and carry only the
  *    small feature vectors forward — bytes never cross a shuffle. Wide
  *    ops (dedup, ANN join) run on features, not media.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("format", StringType),
    StructField("duration_ms", IntegerType),     // audio/video only
    StructField("sample_rate", IntegerType),     // audio only
  ))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),             // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", metaSchema),
  ))

  final case class MediaMeta(width: Int, height: Int, channels: Int,
                             format: String, duration_ms: Int, sample_rate: Int)
  final case class MediaRow(media_id: Long, kind: String,
                            bytes: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String,
                                 features: Array[Float])
  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Deterministic synthetic media table (stands in for a real binary
    * source; seed-stable so tests and oracles are reproducible). Every
    * 10th row is a planted near-duplicate: it reuses the bytes of row
    * i-3 (same `kind` — kinds cycle mod 3) with the final byte's low bit
    * flipped, which perturbs exactly one lane of the rolling-hash feature
    * vector — so near-dup detection over this table has a stable
    * non-empty answer instead of vacuously finding nothing in uniform
    * random noise.
    *
    * Generation is `spark.range`-based (scales with the probe fixtures;
    * no driver-materialized rows) and derives every byte from sha256 of
    * "seed:src:chunk" — lowercase-hex chains any ANSI engine reproduces,
    * which is what lets the q37/q56 oracles replay the whole media
    * pipeline (bytes included) in SQL, the same trick that put the IVF
    * index under the hash gate. */
  def synthesizeMedia(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    val hexDigits = "0123456789abcdef"
    // low-bit flip of one hex digit: position-wise xor-1 alphabet
    val hexFlip = "1032547698badcfe"
    val i = col("id")
    val src = when(i % 10 === 9 && i >= 3, i - 3).otherwise(i)
    def shaK(tag: Column): Column =
      sha2(concat(lit(seed.toString + ":"), src.cast("string"), lit(":"), tag), 256)
    // value of the 2-hex-char byte at 1-based char `pos` (conv is fine on
    // the Spark side; the SQL oracle uses the strpos-over-alphabet trick)
    def hexByte(h: Column, pos: Int): Column =
      conv(substring(h, pos, 2), 16, 10).cast("int")
    val len = (lit(64) + hexByte(shaK(lit("len")), 1) % 192).cast("int")
    val hexFull = concat((0 until 8).map(k => shaK(lit(k.toString))): _*)
    val hexCut = hexFull.substr(lit(1), len * 2)
    val lastFlipped = concat(
      hexFull.substr(lit(1), len * 2 - 1),
      translate(hexFull.substr(len * 2, lit(1)), hexDigits, hexFlip))
    val bytesHex = when(i =!= src, lastFlipped).otherwise(hexCut)
    val kind = element_at(
      array(lit("image"), lit("audio"), lit("video")), (src % 3).cast("int") + 1)
    val mh = shaK(lit("meta"))
    val isImage = kind === "image"
    val isAudio = kind === "audio"
    val meta = struct(
      when(isImage, lit(32) + hexByte(mh, 1) % 96)
        .when(isAudio, 0).otherwise(64).cast("int").as("width"),
      when(isImage, lit(32) + hexByte(mh, 3) % 96)
        .when(isAudio, 0).otherwise(64).cast("int").as("height"),
      when(isAudio, 1).otherwise(3).cast("int").as("channels"),
      when(isImage, "png").when(isAudio, "wav").otherwise("mp4").as("format"),
      when(isAudio, lit(1000) + (hexByte(mh, 5) * 256 + hexByte(mh, 7)) % 9000)
        .when(isImage, 0)
        .otherwise(lit(2000) + (hexByte(mh, 5) * 256 + hexByte(mh, 7)) % 8000)
        .cast("int").as("duration_ms"),
      when(isAudio, 16000).otherwise(0).cast("int").as("sample_rate"))
    spark.range(n.toLong)
      .select(i.as("media_id"), kind.as("kind"),
        unhex(bytesHex).as("bytes"), meta.as("meta"))
  }

  /** STUB decode: a real implementation would run an image/audio codec
    * here; this derives an 8-float "feature vector" from a rolling hash
    * of the bytes — deterministic, branch-free, shaped exactly like the
    * real thing so the pipeline around it is fully exercised.
    *
    * The math is integer-exact on purpose: unsigned-byte rolling hash
    * (wrapping mod 2^64), unsigned remainder, integer lane accumulators
    * emitted as exactly-representable floats (|acc| ≤ 16k < 2^24). Zero
    * float accumulation means a SQL engine can replay it verbatim
    * (HUGEINT arithmetic reduced mod 2^64 per step — see the q37
    * oracle), and centering each term on 0 (rem − 500) keeps feature
    * vectors mean-zero so cosine geometry separates planted near-dups
    * (cos ≈ 1) from random pairs (|cos| ≪ 1). */
  private[operators] def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](8)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = h * 31 + (bytes(i) & 0xff)
      acc(i % 8) += java.lang.Long.remainderUnsigned(h, 1000L) - 500L
      i += 1
    }
    val out = new Array[Float](8)
    var j = 0
    while (j < 8) { out(j) = acc(j).toFloat; j += 1 }
    out
  }

  /** REAL codec for uncompressed 24-bit BMP (the one raster format a bare
    * JVM can both produce — javax.imageio writes it — and parse from first
    * principles with no native libraries). This is the proof that the
    * [[extractFeatures]] `codec` seam carries an actual byte-format
    * decoder, not just the deterministic stub: it validates the BM magic,
    * reads the little-endian header fields (pixel-array offset, width,
    * height, bit depth, compression), honors the 4-byte row stride padding
    * and the bottom-up row order (top-down via negative height also
    * handled), and derives an 8-float feature vector from the DECODED
    * pixels in image coordinates (x right, y down):
    *
    *   f0..f2 = ΣR, ΣG, ΣB
    *   f3     = Σ R·(x+1)            — catches column misalignment
    *   f4     = Σ G·(y+1)            — catches row-order mistakes
    *   f5     = Σ B·(x+1)·(y+1)      — catches stride/padding mistakes
    *   f6     = width·256 + height   — catches header misparses
    *   f7     = #pixels with R > G
    *
    * Every accumulator is an integer < 2^24, so the float lanes are exact
    * and a SQL engine can replay them (the q109 oracle recomputes the
    * same sums from the pixel-generation formula — if this parser misread
    * any header field, row order, or padding byte, the hash gate goes
    * red). */
  def decodeBmp(bytes: Array[Byte]): Array[Float] = {
    val (w, h, px) = parseBmp24(bytes)
    packedLanes(px, w, h)
  }

  /** Parse an uncompressed 24-bit BMP into (width, height, packed
    * 0xRRGGBB pixels in top-down row-major order). All of the
    * loud-reject `require`s live here so every BMP consumer
    * ([[decodeBmp]], [[resizeBmp]]) shares one validated-error
    * contract. */
  private[operators] def parseBmp24(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP: bad magic/length")
    def le32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def le16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    val pixelOff = le32(10)
    val w = le32(18)
    val hRaw = le32(22)
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    require(le16(28) == 24, s"unsupported bit depth ${le16(28)} (want 24)")
    require(le32(30) == 0, "compressed BMP unsupported")
    // bounds math in Long: a malformed header with huge w/h would
    // overflow Int stride*h (possibly to negative), pass an Int-typed
    // check, and turn the intended loud reject into an
    // ArrayIndexOutOfBounds (or a silent wrong read on partial overflow)
    require(w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20),
      s"implausible BMP dimensions ${w}x$hRaw")
    require(pixelOff >= 54, s"pixel offset $pixelOff inside header")
    val strideL = ((3L * w + 3) / 4) * 4
    require(bytes.length.toLong >= pixelOff.toLong + strideL * h,
      "truncated pixel array")
    require(w.toLong * h <= (1L << 24), s"pixel count ${w}x$h too large")
    val stride = strideL.toInt // fits: strideL * h <= bytes.length (Int)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val row = if (bottomUp) h - 1 - y else y
      val base = pixelOff + row * stride
      var x = 0
      while (x < w) {
        val b = bytes(base + 3 * x) & 0xff
        val g = bytes(base + 3 * x + 1) & 0xff
        val r = bytes(base + 3 * x + 2) & 0xff
        px(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    (w, h, px)
  }

  /** decodeBmp's 8 integer-exact feature lanes over packed 0xRRGGBB
    * top-down pixels (shared by the BMP and resize paths). */
  private def packedLanes(px: Array[Int], w: Int, h: Int): Array[Float] = {
    val acc = new Array[Long](6)
    var rGtG = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = px(y * w + x)
        val r = (v >> 16) & 0xff; val g = (v >> 8) & 0xff; val b = v & 0xff
        acc(0) += r; acc(1) += g; acc(2) += b
        acc(3) += r.toLong * (x + 1)
        acc(4) += g.toLong * (y + 1)
        acc(5) += b.toLong * (x + 1) * (y + 1)
        if (r > g) rGtG += 1
        x += 1
      }
      y += 1
    }
    Array(acc(0).toFloat, acc(1).toFloat, acc(2).toFloat, acc(3).toFloat,
      acc(4).toFloat, acc(5).toFloat, (w * 256 + h).toFloat, rGtG.toFloat)
  }

  /** Encode packed 0xRRGGBB top-down pixels as a standards-valid
    * uncompressed 24-bit bottom-up BMP (54-byte header, 4-byte row
    * stride) — byte-layout-identical to [[synthesizeBmp]]'s files, so
    * encode∘parse is the identity on that corpus and [[decodeBmp]]
    * re-parses anything this emits. */
  private[operators] def encodeBmp24(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    require(w > 0 && h > 0 && px.length == w * h, "bad encode dimensions")
    val stride = ((3 * w + 3) / 4) * 4
    val out = new Array[Byte](54 + stride * h)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, out.length); le32(10, 54); le32(14, 40)
    le32(18, w); le32(22, h)                    // +ve height → bottom-up
    out(26) = 1; out(28) = 24                   // planes=1, bpp=24
    le32(34, stride * h)                        // image size
    le32(38, 2835); le32(42, 2835)              // ppm x/y (synthesizeBmp's)
    var y = 0
    while (y < h) {
      val base = 54 + (h - 1 - y) * stride      // bottom-up rows
      var x = 0
      while (x < w) {
        val v = px(y * w + x)
        out(base + 3 * x) = (v & 0xff).toByte           // B
        out(base + 3 * x + 1) = ((v >> 8) & 0xff).toByte  // G
        out(base + 3 * x + 2) = ((v >> 16) & 0xff).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** REAL bilinear resize, fixed-point — the production resize kernel
    * ([[resizeBmp]]'s nearest-neighbor is the fast path; this is the
    * quality path): align-corners mapping with 8-bit fractional
    * coordinates, so every output pixel is an INTEGER function of its
    * four neighbors and a SQL oracle replays it exactly:
    *
    *   sx_fp = x·(w−1)·256 / (W−1)   (0 when W = 1; exact at endpoints)
    *   x0 = sx_fp >> 8, fx = sx_fp & 255, x1 = min(x0+1, w−1)
    *   out = (p00·(256−fx)(256−fy) + p10·fx(256−fy)
    *        + p01·(256−fx)fy + p11·fx·fy + 32768) >> 16
    *
    * Accumulators stay < 2^24 per channel. Corners are preserved
    * exactly (fx = fy = 0 there), a constant image stays constant (the
    * weights sum to 65536), and the re-encoded output is a
    * standards-valid BMP [[decodeBmp]] re-parses — the q181 gate. */
  def resizeBmpBilinear(media: DataFrame, width: Int, height: Int): DataFrame = {
    import media.sparkSession.implicits._
    require(width > 0 && height > 0, "target dimensions must be positive")
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val (w, h, px) = parseBmp24(m.bytes)
        val out = new Array[Int](width * height)
        var y = 0
        while (y < height) {
          // Long mapping math: y·(h−1)·256 overflows Int past ~4k×4k
          val syFp = if (height == 1) 0
            else (y.toLong * (h - 1) * 256 / (height - 1)).toInt
          val y0 = syFp >> 8; val fy = syFp & 255
          val y1 = math.min(y0 + 1, h - 1)
          var x = 0
          while (x < width) {
            val sxFp = if (width == 1) 0
              else (x.toLong * (w - 1) * 256 / (width - 1)).toInt
            val x0 = sxFp >> 8; val fx = sxFp & 255
            val x1 = math.min(x0 + 1, w - 1)
            val p00 = px(y0 * w + x0); val p10 = px(y0 * w + x1)
            val p01 = px(y1 * w + x0); val p11 = px(y1 * w + x1)
            def ch(shift: Int): Int = {
              val a = (p00 >> shift) & 0xff; val b = (p10 >> shift) & 0xff
              val c = (p01 >> shift) & 0xff; val d = (p11 >> shift) & 0xff
              (a * (256 - fx) * (256 - fy) + b * fx * (256 - fy) +
                c * (256 - fx) * fy + d * fx * fy + 32768) >> 16
            }
            out(y * width + x) = (ch(16) << 16) | (ch(8) << 8) | ch(0)
            x += 1
          }
          y += 1
        }
        MediaRow(m.media_id, m.kind, encodeBmp24(width, height, out),
          m.meta.copy(width = width, height = height))
      }
    }.toDF()
  }

  /** Center crop through the BMP codec — the companion of resize in
    * every image training pipeline (resize-then-crop is the standard
    * aspect normalization): the W×H window anchored at
    * (⌊(w−W)/2⌋, ⌊(h−H)/2⌋) in top-down coordinates, re-encoded as a
    * standards-valid BMP. Inputs smaller than the crop reject loudly
    * (the caller gates on meta first — the [[filterByMeta]] shape).
    * Same mapPartitions batch as [[resizeBmp]]; the q185 gate decodes
    * the operator's own output. */
  def centerCrop(media: DataFrame, width: Int, height: Int): DataFrame = {
    import media.sparkSession.implicits._
    require(width > 0 && height > 0, "crop dimensions must be positive")
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val (w, h, px) = parseBmp24(m.bytes)
        require(width <= w && height <= h,
          s"media ${m.media_id}: crop ${width}x$height exceeds ${w}x$h")
        val x0 = (w - width) / 2
        val y0 = (h - height) / 2
        val out = new Array[Int](width * height)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            out(y * width + x) = px((y0 + y) * w + (x0 + x))
            x += 1
          }
          y += 1
        }
        MediaRow(m.media_id, m.kind, encodeBmp24(width, height, out),
          m.meta.copy(width = width, height = height))
      }
    }.toDF()
  }

  /** Orientation transforms through the BMP codec — the training-
    * augmentation quartet (horizontal flip + the three right-angle
    * rotations; vertical flip = rot180∘flip_h). Pure coordinate
    * remaps, integer-exact by construction:
    *
    *   flip_h  (w×h)  out(x,y) = in(w−1−x, y)
    *   rot180  (w×h)  out(x,y) = in(w−1−x, h−1−y)
    *   rot90   (h×w)  out(x,y) = in(y, h−1−x)        (clockwise)
    *   rot270  (h×w)  out(x,y) = in(w−1−y, x)
    *
    * The rotations swap dimensions, so the re-encode exercises a
    * DIFFERENT stride/padding than the input — exactly the slip the
    * q187 gate (decode of the operator's own output) would catch. */
  def orient(media: DataFrame, mode: String): DataFrame = {
    import media.sparkSession.implicits._
    require(Set("flip_h", "rot90", "rot180", "rot270")(mode),
      s"unknown orientation '$mode'")
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val (w, h, px) = parseBmp24(m.bytes)
        val (wo, ho) = mode match {
          case "flip_h" | "rot180" => (w, h)
          case _ => (h, w)
        }
        val out = new Array[Int](wo * ho)
        var y = 0
        while (y < ho) {
          var x = 0
          while (x < wo) {
            out(y * wo + x) = mode match {
              case "flip_h" => px(y * w + (w - 1 - x))
              case "rot180" => px((h - 1 - y) * w + (w - 1 - x))
              case "rot90"  => px((h - 1 - x) * w + y)
              case "rot270" => px(x * w + (w - 1 - y))
            }
            x += 1
          }
          y += 1
        }
        MediaRow(m.media_id, m.kind, encodeBmp24(wo, ho, out),
          m.meta.copy(width = wo, height = ho))
      }
    }.toDF()
  }

  /** Fixed-point grayscale conversion through the BMP codec (ITU-R
    * BT.601-weight integer luma, the classic preprocessing step):
    * L = (77·R + 151·G + 28·B + 128) >> 8 — weights sum to 256 so a
    * constant image maps to (approximately) itself and the arithmetic
    * is integer-exact for the q186 oracle — written back as R=G=B=L in
    * a standards-valid BMP. */
  def toGrayscale(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val (w, h, px) = parseBmp24(m.bytes)
        val out = new Array[Int](px.length)
        var j = 0
        while (j < px.length) {
          val v = px(j)
          val l = (77 * ((v >> 16) & 0xff) + 151 * ((v >> 8) & 0xff) +
            28 * (v & 0xff) + 128) >> 8
          out(j) = (l << 16) | (l << 8) | l
          j += 1
        }
        MediaRow(m.media_id, m.kind, encodeBmp24(w, h, out), m.meta)
      }
    }.toDF()
  }

  /** Sobel edge-energy features over 24-bit BMP — the classic
    * edge/texture signal an image-curation pipeline uses to separate
    * flat synthetic fills from real photographic content (a
    * quality-scoring lane for the media modality, next to q118's
    * perceptual dedup hash). Luma is the q186 grayscale rule
    * L = (77·R + 151·G + 28·B + 128) >> 8; gradients are the standard
    * 3×3 Sobel kernels at interior pixels (x right, y down):
    * gx(dx,dy) weight = dx·(2−|dy|), gy weight = dy·(2−|dx|).
    * Eight integer-exact lanes (every accumulator < 2^24, so the
    * float lanes are exact and the q191 oracle replays them from the
    * pixel formula):
    *
    *   f0 = Σ |gx|            f1 = Σ |gy|
    *   f2 = max(|gx|+|gy|)    f3 = #pixels with |gx|+|gy| ≥ 256
    *   f4 = Σ (|gx|+|gy|)·((y·w+x) mod 97 + 1) — catches coordinate slips
    *   f5 = interior pixel count (w−2)·(h−2)
    *   f6 = width·256 + height
    *   f7 = Σ luma over the WHOLE image — catches luma-rule drift
    */
  def decodeBmpSobel(bytes: Array[Byte]): Array[Float] = {
    val (w, h, px) = parseBmp24(bytes)
    val lum = new Array[Int](w * h)
    var lumSum = 0L
    var j = 0
    while (j < px.length) {
      val v = px(j)
      val l = (77 * ((v >> 16) & 0xff) + 151 * ((v >> 8) & 0xff) +
        28 * (v & 0xff) + 128) >> 8
      lum(j) = l
      lumSum += l
      j += 1
    }
    var sAx = 0L; var sAy = 0L; var mMax = 0L
    var edges = 0L; var posL = 0L; var interior = 0L
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val gx = -lum((y - 1) * w + x - 1) + lum((y - 1) * w + x + 1) -
          2 * lum(y * w + x - 1) + 2 * lum(y * w + x + 1) -
          lum((y + 1) * w + x - 1) + lum((y + 1) * w + x + 1)
        val gy = -lum((y - 1) * w + x - 1) - 2 * lum((y - 1) * w + x) -
          lum((y - 1) * w + x + 1) + lum((y + 1) * w + x - 1) +
          2 * lum((y + 1) * w + x) + lum((y + 1) * w + x + 1)
        val ax = math.abs(gx); val ay = math.abs(gy); val m = ax + ay
        sAx += ax; sAy += ay
        if (m > mMax) mMax = m
        if (m >= 256) edges += 1
        posL += m.toLong * ((y * w + x) % 97 + 1)
        interior += 1
        x += 1
      }
      y += 1
    }
    Array(sAx.toFloat, sAy.toFloat, mMax.toFloat, edges.toFloat,
      posL.toFloat, interior.toFloat, (w * 256 + h).toFloat, lumSum.toFloat)
  }

  /** REAL resize (the operator [[resizeStub]] stands in for when no
    * decodable format is present): parse each 24-bit BMP, nearest-
    * neighbor resample to width×height — source pixel of target (x, y)
    * is (⌊x·w/W⌋, ⌊y·h/H⌋), the integer-exact mapping a SQL oracle can
    * replay — and RE-ENCODE as a standards-valid BMP, updating the meta
    * struct. Same mapPartitions batch shape as [[extractFeatures]]:
    * bytes in, bytes out, one iterator pass per partition, nothing
    * crosses a shuffle. The q173 gate decodes the OUTPUT with
    * [[decodeBmp]], so a header, stride, or row-order slip in the
    * encoder desyncs the feature hash — the encode side is in-gate, not
    * just the resample arithmetic. */
  def resizeBmp(media: DataFrame, width: Int, height: Int): DataFrame = {
    import media.sparkSession.implicits._
    require(width > 0 && height > 0, "target dimensions must be positive")
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val (w, h, px) = parseBmp24(m.bytes)
        val out = new Array[Int](width * height)
        var y = 0
        while (y < height) {
          // Long mapping math: y·h overflows Int past ~46k×46k targets
          val sy = (y.toLong * h / height).toInt
          var x = 0
          while (x < width) {
            out(y * width + x) = px(sy * w + (x.toLong * w / width).toInt)
            x += 1
          }
          y += 1
        }
        MediaRow(m.media_id, m.kind, encodeBmp24(width, height, out),
          m.meta.copy(width = width, height = height))
      }
    }.toDF()
  }

  /** Deterministic genuine-BMP table: each row's `bytes` is a complete,
    * standards-valid uncompressed 24-bit bottom-up BMP file (54-byte
    * header + stride-padded pixel array) whose pixel bytes come from the
    * same sha256 hex chains as [[synthesizeMedia]] — so the q109 DuckDB
    * oracle can replay pixel values without a BMP parser of its own,
    * while the Spark side must genuinely PARSE the file to agree.
    * Dimensions: width/height each 4 + (sha byte % 5) ∈ [4,8], so stride
    * padding (width 5,6,7 → 1-3 pad bytes/row) is always exercised. */
  def synthesizeBmp(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    val i = col("id")
    def shaK(tag: Column): Column =
      sha2(concat(lit(seed.toString + ":"), i.cast("string"), lit(":"), tag), 256)
    def hexByte(h: Column, pos: Int): Column =
      conv(substring(h, pos, 2), 16, 10).cast("int")
    // little-endian hex of a non-negative int in `nBytes` bytes
    def leHex(v: Column, nBytes: Int): Column = {
      val be = lpad(lower(conv(v.cast("string"), 10, 16)), nBytes * 2, "0")
      concat((nBytes - 1 to 0 by -1).map(k => substring(be, 2 * k + 1, 2)): _*)
    }
    val dimH = shaK(lit("dim"))
    val w = (lit(4) + hexByte(dimH, 1) % 5).cast("int")
    val h = (lit(4) + hexByte(dimH, 3) % 5).cast("int")
    val stride = (w * 3 + lit(3)).divide(lit(4)).cast("int") * 4
    val pixBytes = stride * h
    val fileSize = pixBytes + lit(54)
    val headerHex = concat(
      lit("424d"),                    // 'BM'
      leHex(fileSize, 4),             // file size
      lit("00000000"),                // reserved
      lit("36000000"),                // pixel-array offset = 54
      lit("28000000"),                // BITMAPINFOHEADER size = 40
      leHex(w, 4), leHex(h, 4),       // width, height (+ve → bottom-up)
      lit("0100"), lit("1800"),       // planes=1, bpp=24
      lit("00000000"),                // compression = BI_RGB
      leHex(pixBytes, 4),             // image size
      lit("130b0000"), lit("130b0000"), // 2835 ppm x/y
      lit("00000000"), lit("00000000")) // palette counts
    val hexFull = concat((0 until 8).map(k => shaK(lit(k.toString))): _*)
    val pixelHex = hexFull.substr(lit(1), pixBytes * 2)
    val meta = struct(
      w.as("width"), h.as("height"), lit(3).cast("int").as("channels"),
      lit("bmp").as("format"), lit(0).cast("int").as("duration_ms"),
      lit(0).cast("int").as("sample_rate"))
    spark.range(n.toLong)
      .select(i.as("media_id"), lit("image").as("kind"),
        unhex(concat(headerHex, pixelHex)).as("bytes"), meta.as("meta"))
  }

  /** REAL codec for RIFF/WAV PCM (16-bit signed little-endian mono) —
    * the audio-modality counterpart of [[decodeBmp]], and the second
    * proof the codec seam carries actual byte-format decoders. Walks the
    * RIFF chunk list generically (word-aligned, order-independent, extra
    * chunks skipped), validates the `fmt ` chunk (PCM, mono, 16-bit),
    * and derives 8 integer-exact feature lanes from the DECODED samples:
    *
    *   f0 = Σ s               f1 = Σ |s|
    *   f2 = max s             f3 = min s
    *   f4 = zero crossings (sign(s)= s≥0, adjacent samples)
    *   f5 = Σ lowbyte(s)·(j+1)   — catches sample-order/width mistakes
    *   f6 = sample rate          — catches fmt-chunk misparses
    *   f7 = sample count         — catches data-chunk size misparses
    *
    * |f1| ≤ 32768·96 and f5 ≤ 255·96·97/2 stay far under 2^24, so every
    * lane is exactly representable and the q110 oracle replays them from
    * the sample-generation formula in SQL. */
  def decodeWav(bytes: Array[Byte]): Array[Float] = {
    val (rate, samples) = parseWav16(bytes)
    sampleLanes(samples, rate)
  }

  /** Parse a PCM mono 16-bit RIFF/WAV into (sample rate, signed
    * samples). The chunk-walk `require`s live here so every WAV
    * consumer ([[decodeWav]], [[resampleWav]]) shares one
    * validated-error contract. */
  private[operators] def parseWav16(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 44, "not a WAV: too short")
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def le32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def le16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    require(fourcc(0) == "RIFF" && fourcc(8) == "WAVE",
      "not a WAV: bad RIFF/WAVE magic")
    var pos = 12
    var sampleRate = -1
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = fourcc(pos)
      val size = le32(pos + 4)
      require(size >= 0 && pos + 8 + size <= bytes.length,
        s"truncated chunk $id at $pos")
      id match {
        case "fmt " =>
          require(le16(pos + 8) == 1, "non-PCM WAV unsupported")
          require(le16(pos + 10) == 1, "only mono WAV supported")
          require(le16(pos + 22) == 16, "only 16-bit WAV supported")
          sampleRate = le32(pos + 12)
        case "data" => dataOff = pos + 8; dataLen = size
        case _ => () // LIST/fact/etc — skip
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var j = 0
    while (j < n) {
      val raw = (bytes(dataOff + 2 * j) & 0xff) |
        ((bytes(dataOff + 2 * j + 1) & 0xff) << 8)
      samples(j) = raw.toShort
      j += 1
    }
    (sampleRate, samples)
  }

  /** decodeWav's 8 integer-exact feature lanes over signed samples
    * (shared by the WAV decode and resample paths). */
  /** [[sampleLanes]] for sibling codecs (the AVI audio windows) —
    * the q110 audio-lane formula is the shared contract. */
  private[operators] def audioLanes(samples: Array[Short],
                                    sampleRate: Int): Array[Float] =
    sampleLanes(samples, sampleRate)

  private def sampleLanes(samples: Array[Short], sampleRate: Int): Array[Float] = {
    var sum, absSum, posWeighted, crossings = 0L
    var mx = Int.MinValue
    var mn = Int.MaxValue
    var prevNonNeg = false
    var j = 0
    while (j < samples.length) {
      val s = samples(j).toInt
      sum += s; absSum += math.abs(s)
      if (s > mx) mx = s
      if (s < mn) mn = s
      val nonNeg = s >= 0
      if (j > 0 && nonNeg != prevNonNeg) crossings += 1
      prevNonNeg = nonNeg
      posWeighted += (s & 0xff).toLong * (j + 1)
      j += 1
    }
    Array(sum.toFloat, absSum.toFloat, mx.toFloat, mn.toFloat,
      crossings.toFloat, posWeighted.toFloat, sampleRate.toFloat,
      samples.length.toFloat)
  }

  /** Encode signed 16-bit mono samples as a standards-valid RIFF/WAV —
    * byte-layout-identical to [[synthesizeWav]]'s files (44-byte
    * canonical header), so encode∘parse is the identity on that corpus
    * and [[decodeWav]] re-parses anything this emits. */
  private[operators] def encodeWav16(rate: Int, samples: Array[Short]): Array[Byte] = {
    require(rate > 0, "sample rate must be positive")
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    def ascii(off: Int, s: String): Unit = {
      var k = 0; while (k < 4) { out(off + k) = s.charAt(k).toByte; k += 1 }
    }
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    ascii(0, "RIFF"); le32(4, dataSize + 36); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 1)
    le32(24, rate); le32(28, rate * 2); le16(32, 2); le16(34, 16)
    ascii(36, "data"); le32(40, dataSize)
    var j = 0
    while (j < samples.length) {
      val s = samples(j) & 0xffff
      out(44 + 2 * j) = (s & 0xff).toByte
      out(44 + 2 * j + 1) = ((s >> 8) & 0xff).toByte
      j += 1
    }
    out
  }

  /** Silence trimming through the WAV codec — the standard audio-corpus
    * cleanup (drop the dead air before/after the content): parse, scan
    * for the first and last sample with |s| ≥ threshold, keep the
    * inclusive span, RE-ENCODE with the shortened data chunk and an
    * updated duration. An all-silent file trims to a valid ZERO-sample
    * WAV (empty data chunk) rather than rejecting — silence is data
    * quality, not corruption. Same mapPartitions shape as
    * [[resampleWav]]; the q182 gate decodes the operator's own
    * re-encoded output. */
  def trimSilence(media: DataFrame, threshold: Int): DataFrame = {
    import media.sparkSession.implicits._
    require(threshold > 0, "threshold must be positive")
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val (rate, s) = parseWav16(m.bytes)
        var first = 0
        while (first < s.length && math.abs(s(first).toInt) < threshold)
          first += 1
        var last = s.length - 1
        while (last >= first && math.abs(s(last).toInt) < threshold)
          last -= 1
        val kept =
          if (last >= first) java.util.Arrays.copyOfRange(s, first, last + 1)
          else new Array[Short](0)
        MediaRow(m.media_id, m.kind, encodeWav16(rate, kept),
          m.meta.copy(duration_ms = (kept.length.toLong * 1000 / rate).toInt))
      }
    }.toDF()
  }

  /** Peak (gain) normalization through the WAV codec — scale every
    * sample so the loudest hits full scale: s' = sign(s)·⌊|s|·32767 /
    * peak⌋ with peak = max |s|. The magnitude-then-sign form is
    * deliberate: engines disagree on negative integer division
    * (truncation vs floor), magnitudes don't — so the q183 oracle
    * replays the exact scaling. A digital-silence file (peak 0) passes
    * through unchanged. Same mapPartitions shape as [[resampleWav]];
    * the gate decodes the operator's own re-encoded output. */
  def normalizeGain(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val (rate, s) = parseWav16(m.bytes)
        var peak = 0
        var j = 0
        while (j < s.length) {
          val a = math.abs(s(j).toInt); if (a > peak) peak = a; j += 1
        }
        if (peak == 0) m
        else {
          val out = new Array[Short](s.length)
          j = 0
          while (j < s.length) {
            val v = s(j).toInt
            val mag = (math.abs(v).toLong * 32767 / peak).toInt
            out(j) = (if (v < 0) -mag else mag).toShort
            j += 1
          }
          MediaRow(m.media_id, m.kind, encodeWav16(rate, out), m.meta)
        }
      }
    }.toDF()
  }

  /** REAL audio resample (the [[resizeBmp]] counterpart for the audio
    * modality): parse each PCM WAV, nearest-neighbor resample to
    * `targetRate` — output sample j is input sample ⌊j·rate/target⌋,
    * output length ⌊n·target/rate⌋, the integer-exact mapping a SQL
    * oracle can replay (a real pipeline would add a low-pass stage
    * before decimation; the sample-selection arithmetic under the gate
    * is the same) — and RE-ENCODE as a standards-valid WAV with the new
    * rate, updating the meta struct. Same mapPartitions batch shape as
    * [[extractFeatures]]: one iterator pass, nothing crosses a shuffle.
    * The q175 gate decodes the OUTPUT with [[decodeWav]], putting the
    * encoder's header arithmetic in-gate, not just the resampling. */
  def resampleWav(media: DataFrame, targetRate: Int): DataFrame = {
    import media.sparkSession.implicits._
    require(targetRate > 0, "target rate must be positive")
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val (rate, samples) = parseWav16(m.bytes)
        val outN = (samples.length.toLong * targetRate / rate).toInt
        val out = new Array[Short](outN)
        var j = 0
        while (j < outN) {
          out(j) = samples((j.toLong * rate / targetRate).toInt)
          j += 1
        }
        MediaRow(m.media_id, m.kind, encodeWav16(targetRate, out),
          m.meta.copy(duration_ms = (outN.toLong * 1000 / targetRate).toInt,
            sample_rate = targetRate))
      }
    }.toDF()
  }

  /** Walsh–Hadamard spectral fingerprint over PCM WAV — the audio
    * signature lane (the role [[dhashBands]] plays for images): a
    * dyadic filter bank whose basis functions are ±1 square waves, so
    * every coefficient is INTEGER-exact and replays in any engine with
    * popcount (the transform audio fingerprinting uses when float FFTs
    * would be engine-dependent). Over the first 64 decoded samples
    * (shorter files analyze their full length — the window just ends;
    * longer files truncate to the window):
    *
    *   W_k = Σ_{n < min(64, ns)} s[n] · (−1)^popcount(k AND n)
    *
    * for the 8 lanes k ∈ {0, 1, 2, 4, 8, 16, 32, 63}: k = 0 is DC,
    * k = 2^j is the square wave flipping with bit j of n (period
    * 2^{j+1} samples), k = 63 the highest checker. |W_k| ≤ 64·32768 <
    * 2^22, exactly representable in the float lanes. Orthogonality law
    * (spec-gated): an alternating ±A signal concentrates entirely in
    * the k = 1 lane. */
  def decodeWavWht(bytes: Array[Byte]): Array[Float] = {
    val (_, samples) = parseWav16(bytes)
    val ks = Array(0, 1, 2, 4, 8, 16, 32, 63)
    val out = new Array[Float](8)
    val lim = math.min(64, samples.length)
    var li = 0
    while (li < 8) {
      val k = ks(li)
      var acc = 0L
      var n = 0
      while (n < lim) {
        acc += (if (java.lang.Integer.bitCount(k & n) % 2 == 0) 1L else -1L) *
          samples(n)
        n += 1
      }
      out(li) = acc.toFloat
      li += 1
    }
    out
  }

  /** Deterministic genuine-WAV table: each row's `bytes` is a complete,
    * standards-valid RIFF/WAV file (PCM, mono, 16-bit LE) whose sample
    * bytes come from the same sha256 hex chains as [[synthesizeBmp]]'s
    * pixels — the q110 oracle replays samples without a WAV parser,
    * while the Spark side must genuinely PARSE the chunk list. 32–95
    * samples and an 8000–12080 Hz rate per row, both sha-derived, so the
    * fmt/data header fields vary row to row. */
  def synthesizeWav(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    val i = col("id")
    def shaK(tag: Column): Column =
      sha2(concat(lit(seed.toString + ":"), i.cast("string"), lit(":"), tag), 256)
    def hexByte(h: Column, pos: Int): Column =
      conv(substring(h, pos, 2), 16, 10).cast("int")
    def leHex(v: Column, nBytes: Int): Column = {
      val be = lpad(lower(conv(v.cast("string"), 10, 16)), nBytes * 2, "0")
      concat((nBytes - 1 to 0 by -1).map(k => substring(be, 2 * k + 1, 2)): _*)
    }
    val lh = shaK(lit("len"))
    val nSamples = (lit(32) + hexByte(lh, 1) % 64).cast("int")
    val rate = (lit(8000) + hexByte(lh, 3) * 16).cast("int")
    val dataSize = nSamples * 2
    val headerHex = concat(
      lit("52494646"),                 // 'RIFF'
      leHex(dataSize + lit(36), 4),    // chunk size
      lit("57415645"),                 // 'WAVE'
      lit("666d7420"), lit("10000000"), // 'fmt ', 16
      lit("0100"), lit("0100"),        // PCM, mono
      leHex(rate, 4), leHex(rate * 2, 4), // sample rate, byte rate
      lit("0200"), lit("1000"),        // block align 2, 16 bits
      lit("64617461"),                 // 'data'
      leHex(dataSize, 4))
    val hexFull = concat((0 until 8).map(k => shaK(lit(k.toString))): _*)
    val sampleHex = hexFull.substr(lit(1), dataSize * 2)
    val meta = struct(
      lit(0).cast("int").as("width"), lit(0).cast("int").as("height"),
      lit(1).cast("int").as("channels"), lit("wav").as("format"),
      (nSamples * 1000 / rate).cast("int").as("duration_ms"),
      rate.as("sample_rate"))
    spark.range(n.toLong)
      .select(i.as("media_id"), lit("audio").as("kind"),
        unhex(concat(headerHex, sampleHex)).as("bytes"), meta.as("meta"))
  }

  // ---------------------------------------- audio spectral fingerprint

  /** Fixed-point 64-sample DFT basis, scaled 2^8:
    * ⌊cos(2π·k·n/64)·256 + 0.5⌋ (and sin) — computed by THIS function
    * on both sides of the gate (the engine loop reads it directly, the
    * oracle builder stamps the same integers into a VALUES table — the
    * dcgWeight convention), so no cross-engine libm rounding ever
    * enters the comparison. */
  def dftCos(k: Int, n: Int): Long =
    math.floor(math.cos(2.0 * math.Pi * k * n / 64.0) * 256.0 + 0.5).toLong
  def dftSin(k: Int, n: Int): Long =
    math.floor(math.sin(2.0 * math.Pi * k * n / 64.0) * 256.0 + 0.5).toLong

  final case class AudioWindowPrint(media_id: Long, window_idx: Int, fp: Int)

  /** AUDIO SPECTRAL FINGERPRINT (VERDICT r12 #4) — the audio analog of
    * the image dHash, in the shape of Haitsma & Kalker 2002's robust
    * hash: per full 64-sample window, bin energies
    * E_k = (Σₙ x·c_k)² + (Σₙ x·s_k)² for k = 1…17 over the fixed-point
    * basis (integer accumulators: |Σ x·c| ≤ 64·2¹⁵·2⁸ < 2³⁰, so
    * E < 2⁶¹ — BIGINT-safe in both engines), fingerprint bit
    * j = [E_{j+1} > E_{j+2}] → one 16-bit print per window. Energy
    * RATIOS between adjacent bins survive gain changes exactly (both
    * energies scale by the same factor), which is why the bit pattern,
    * not the raw energies, is the identity. Trailing partial windows
    * drop (nothing to compare). Map-only over the codec seam — bytes
    * never shuffle; prints are one int per window. */
  def audioFingerprint(media: DataFrame): Dataset[AudioWindowPrint] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].filter(_.kind == "audio").flatMap { m =>
      val (_, samples) = parseWav16(m.bytes)
      val nw = samples.length / 64
      (0 until nw).map { w =>
        val ec = new Array[Long](19)
        val es = new Array[Long](19)
        var k = 1
        while (k <= 17) {
          var sc = 0L
          var ss = 0L
          var n = 0
          while (n < 64) {
            val x = samples(w * 64 + n).toLong
            sc += x * dftCos(k, n)
            ss += x * dftSin(k, n)
            n += 1
          }
          ec(k) = sc; es(k) = ss
          k += 1
        }
        var fp = 0
        var j = 0
        while (j < 16) {
          val e1 = ec(j + 1) * ec(j + 1) + es(j + 1) * es(j + 1)
          val e2 = ec(j + 2) * ec(j + 2) + es(j + 2) * es(j + 2)
          if (e1 > e2) fp |= 1 << j
          j += 1
        }
        AudioWindowPrint(m.media_id, w, fp)
      }
    }
  }

  /** Deterministic NEAR-DUP audio corpus — the q224/q225 fixture,
    * mirroring [[Avi.synthesizeAviNearDup]]'s family layout on the
    * audio axis: base audio a (0 ≤ a < n) carries
    * nw = 6 + sha256("seed:andd:a:nw")[0] mod 3 windows of 64 samples,
    * window w's 128 PCM bytes = the four digests
    * sha256("seed:andd:a:w:k") k = 0…3 (the q217 hash-chain-per-window
    * convention); every a ≡ 0 (mod 3) also ships a WINDOW-ALIGNED
    * CLIPPED copy (id 1000 + a: windows 1 … nw−2) and every a ≡ 0
    * (mod 4) a full duplicate (id 2000 + a). Clips are window-aligned
    * by construction — the fingerprint identity is per-window, so a
    * sample-offset clip would need overlapped windows (the standard
    * robust-hash extension, out of this fixture's scope). */
  def synthesizeWavNearDup(spark: SparkSession, n: Int,
                           seed: Long = 42L): DataFrame = {
    import spark.implicits._
    def sha(tag: String): Array[Byte] =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(tag.getBytes("UTF-8"))
    def nwOf(a: Long): Int = 6 + (sha(s"$seed:andd:$a:nw")(0) & 0xff) % 3
    val ids = (0L until n.toLong).flatMap { a =>
      Seq(a) ++
        (if (a % 3 == 0) Seq(1000L + a) else Seq.empty) ++
        (if (a % 4 == 0) Seq(2000L + a) else Seq.empty)
    }
    spark.createDataset(ids).map { aid =>
      val base = aid % 1000L
      val nw = nwOf(base)
      val windows: Seq[Int] =
        if (aid < 1000L) 0 until nw
        else if (aid < 2000L) 1 until nw - 1
        else 0 until nw
      val data = windows.flatMap(w =>
        (0 until 4).flatMap(k => sha(s"$seed:andd:$base:$w:$k"))).toArray
      val nSamples = windows.length * 64
      def le16(v: Int): Array[Byte] =
        Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      def le32(v: Int): Array[Byte] =
        Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
          ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      val rate = 8000
      val header =
        "RIFF".getBytes("US-ASCII") ++ le32(36 + data.length) ++
          "WAVE".getBytes("US-ASCII") ++
          "fmt ".getBytes("US-ASCII") ++ le32(16) ++
          le16(1) ++ le16(1) ++ le32(rate) ++ le32(rate * 2) ++
          le16(2) ++ le16(16) ++
          "data".getBytes("US-ASCII") ++ le32(data.length)
      MediaRow(aid, "audio", header ++ data,
        MediaMeta(0, 0, 1, "wav", nSamples * 1000 / rate, rate))
    }.toDF()
  }

  /** AUDIO-to-audio near-dup — [[audioFingerprint]] prints through the
    * band machinery and the shared temporal-containment tail
    * ([[Dedup.temporalAlignPairs]], the q223 rule): candidate window
    * pairs share one intact 4-bit nibble of the 16-bit print (the
    * SimHash pigeonhole at Hamming ≤ `maxHamming` per print), verify
    * by exact Hamming, vote for their window offset, and a pair
    * reports iff the best offset's support covers `minOverlapPct`
    * percent of the shorter audio. Returns (audio_a, audio_b, offset,
    * n_aligned, nw_a, nw_b). */
  def audioNearDupPairs(media: DataFrame, maxHamming: Int = 2,
                        minOverlapPct: Int = 80): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 16,
      s"maxHamming out of range: $maxHamming")
    val fh = audioFingerprint(media).toDF()
      .localCheckpoint() // read by bands, both verify sides, and counts
    val nw = fh.groupBy(col("media_id")).agg(count(lit(1)).as("n"))
    val bands = fh.select(col("media_id"), col("window_idx"),
        posexplode(array((0 until 4).map(j =>
          shiftright(col("fp"), 4 * j).bitwiseAND(lit(15))): _*)))
      .select(col("media_id"), col("window_idx"),
        col("pos").as("band_idx"), col("col").as("band"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band") === col("y.band") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("a"), col("x.window_idx").as("fa"),
        col("y.media_id").as("b"), col("y.window_idx").as("fb"))
      .distinct()
    val matched = cand
      .join(fh.select(col("media_id").as("a"), col("window_idx").as("fa"),
        col("fp").as("fpa")), Seq("a", "fa"))
      .join(fh.select(col("media_id").as("b"), col("window_idx").as("fb"),
        col("fp").as("fpb")), Seq("b", "fb"))
      .filter(expr("bit_count(fpa ^ fpb)") <= maxHamming)
    Dedup.temporalAlignPairs(matched, nw, minOverlapPct)
      .select(col("a").as("audio_a"), col("b").as("audio_b"),
        col("offset"), col("n_aligned"),
        col("n_a").as("nw_a"), col("n_b").as("nw_b"))
  }

  /** REAL codec for PNG (8-bit RGB, non-interlaced) — the first
    * COMPRESSED format behind the codec seam, possible with zero
    * external libraries because DEFLATE ships in the JDK
    * (java.util.zip.Inflater). Full first-principles decode: 8-byte
    * signature, chunk walk with CRC32 validation, IHDR validation
    * (8-bit, color type 2, no interlace), multi-IDAT concatenation,
    * zlib inflate, and per-scanline filter reconstruction — None, Sub,
    * Up, Average, and Paeth predictors per the PNG spec. Features are
    * [[decodeBmp]]'s 8 integer-exact lanes over the decoded pixels in
    * image coordinates, so the q111 oracle replays the same
    * pixel-formula sums: the compressed layer is round-trip-transparent
    * (decoded pixels never depend on which deflate bytes encoded them),
    * which is exactly what lets a SQL oracle gate a DEFLATE codec. */
  def decodePng(bytes: Array[Byte]): Array[Float] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    require(bytes.length > 8 && bytes.take(8).sameElements(sig),
      "not a PNG: bad signature")
    def be32(off: Int): Int =
      ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
    var pos = 8
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd) {
      require(pos + 8 <= bytes.length, "truncated chunk header")
      val len = be32(pos)
      val ctype = new String(bytes, pos + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      require(len >= 0 && pos + 12 + len <= bytes.length,
        s"truncated $ctype chunk")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue.toInt == be32(pos + 8 + len),
        s"CRC mismatch in $ctype chunk")
      ctype match {
        case "IHDR" =>
          w = be32(pos + 8); h = be32(pos + 12)
          require((bytes(pos + 16) & 0xff) == 8, "only 8-bit PNG supported")
          require((bytes(pos + 17) & 0xff) == 2, "only RGB (color type 2) supported")
          require((bytes(pos + 20) & 0xff) == 0, "interlaced PNG unsupported")
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped (CRC still checked)
      }
      pos += 12 + len
    }
    require(w > 0 && h > 0, "missing IHDR")
    // zlib inflate of the concatenated IDAT stream
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val stride = 3 * w
    val raw = new Array[Byte]((stride + 1) * h)
    var got = 0
    while (got < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, got, raw.length - got)
      require(n > 0 || inflater.finished(), "bad IDAT stream")
      got += n
    }
    inflater.end()
    require(got == raw.length, s"short pixel data: $got of ${raw.length}")
    // scanline filter reconstruction (bpp = 3)
    val px = new Array[Int](stride * h) // recon bytes as unsigned ints
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      require(ft <= 4, s"unknown filter type $ft in row $y")
      var k = 0
      while (k < stride) {
        val x = raw(y * (stride + 1) + 1 + k) & 0xff
        val left = if (k >= 3) px(y * stride + k - 3) else 0
        val up = if (y > 0) px((y - 1) * stride + k) else 0
        val ul = if (y > 0 && k >= 3) px((y - 1) * stride + k - 3) else 0
        val recon = ft match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + (left + up) / 2
          case 4 => // Paeth predictor
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            x + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
        }
        px(y * stride + k) = recon & 0xff
        k += 1
      }
      y += 1
    }
    // decodeBmp's feature lanes over top-down RGB pixels
    val acc = new Array[Long](6)
    var rGtG = 0L
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = px(y * stride + 3 * x)
        val g = px(y * stride + 3 * x + 1)
        val b = px(y * stride + 3 * x + 2)
        acc(0) += r; acc(1) += g; acc(2) += b
        acc(3) += r.toLong * (x + 1)
        acc(4) += g.toLong * (y + 1)
        acc(5) += b.toLong * (x + 1) * (y + 1)
        if (r > g) rGtG += 1
        x += 1
      }
      y += 1
    }
    Array(acc(0).toFloat, acc(1).toFloat, acc(2).toFloat, acc(3).toFloat,
      acc(4).toFloat, acc(5).toFloat, (w * 256 + h).toFloat, rGtG.toFloat)
  }

  /** Deterministic genuine-PNG table: each row's `bytes` is a complete,
    * CRC-valid PNG file (8-bit RGB, non-interlaced) whose DECODED pixels
    * come from sha256 hex chains ("png"-tagged, so content differs from
    * the BMP table) in row-major top-down order. Scanline r is encoded
    * with filter type r mod 5, so every one of the five PNG filters is
    * exercised in-gate (heights are ≥5 for four of five width draws).
    * Compression itself is JDK Deflater output — NOT part of the gated
    * artifact: the oracle replays pixels, and decoded pixels are
    * independent of which deflate representation carried them.
    *
    * Encoding runs distributed (mapPartitions over spark.range) — the
    * sha chains are recomputed per row with MessageDigest, matching the
    * SQL oracle's sha256 over the same strings byte for byte. */
  def synthesizePng(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      def sha(tag: String): Array[Byte] =
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"$seed:png:$id:$tag".getBytes("UTF-8"))
      val dim = sha("dim")
      val w = 4 + (dim(0) & 0xff) % 5
      val h = 4 + (dim(1) & 0xff) % 5
      val chain = (0 until 8).flatMap(k => sha(k.toString)).toArray
      val stride = 3 * w
      // raw scanlines with per-row filter type (r mod 5) applied
      val recon = Array.tabulate(h * stride)(i => chain(i) & 0xff)
      val filtered = new Array[Byte]((stride + 1) * h)
      for (y <- 0 until h) {
        val ft = y % 5
        filtered(y * (stride + 1)) = ft.toByte
        for (k <- 0 until stride) {
          val x = recon(y * stride + k)
          val left = if (k >= 3) recon(y * stride + k - 3) else 0
          val up = if (y > 0) recon((y - 1) * stride + k) else 0
          val ul = if (y > 0 && k >= 3) recon((y - 1) * stride + k - 3) else 0
          val pred = ft match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 =>
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up)
              val pc = math.abs(p - ul)
              if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
          }
          filtered(y * (stride + 1) + 1 + k) = ((x - pred) & 0xff).toByte
        }
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(filtered); deflater.finish()
      val zbuf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](4096)
      while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
      deflater.end()
      def chunk(ctype: String, payload: Array[Byte]): Array[Byte] = {
        val out = java.nio.ByteBuffer.allocate(12 + payload.length)
        out.putInt(payload.length)
        out.put(ctype.getBytes("US-ASCII")); out.put(payload)
        val crc = new java.util.zip.CRC32()
        crc.update(ctype.getBytes("US-ASCII")); crc.update(payload)
        out.putInt(crc.getValue.toInt)
        out.array()
      }
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array()
      val png = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        chunk("IHDR", ihdr) ++ chunk("IDAT", zbuf.toByteArray) ++
        chunk("IEND", Array.emptyByteArray)
      MediaRow(id, "image", png,
        MediaMeta(w, h, 3, "png", 0, 0))
    }.toDF()
  }

  /** REAL codec for GIF (87a/89a, 8-bit palette) — the second COMPRESSED
    * format behind the codec seam, again with zero external libraries:
    * GIF's LZW is small enough to decode from first principles. Full
    * parse: header + logical screen descriptor, global color table,
    * extension blocks skipped generically (sub-block chain walk), image
    * descriptor (local color table and four-pass interlacing honored
    * when present), and the
    * variable-width LZW stream — LSB-first bit packing, clear/end codes,
    * dictionary growth with code-width bumps at 2^width up to 12 bits,
    * and the K-omega-K special case (code == next unassigned entry).
    * Features are [[decodeBmp]]'s 8 integer-exact lanes over the decoded
    * palette-RGB pixels, so the q112 oracle replays the pixel-index and
    * palette formulas: the LZW layer is round-trip-transparent (decoded
    * indices never depend on which LZW codes encoded them) — the same
    * property that let the q111 oracle gate a DEFLATE codec. */
  def decodeGif(bytes: Array[Byte]): Array[Float] = {
    val (gct, pos0) = parseGifHeader(bytes)
    // walk blocks to the first image descriptor, skipping extensions
    var pos = pos0
    while (gifU8(bytes, pos) == 0x21) // extension: label + sub-blocks
      pos = gifSkipSubBlocks(bytes, pos + 2)
    require(gifU8(bytes, pos) == 0x2c, s"expected image descriptor at $pos")
    val (pixels, palette, w, h, _) = decodeGifImage(bytes, pos, gct)
    paletteLanes(pixels, palette, w, h)
  }

  /** Header + logical screen descriptor + optional global color table →
    * (gct or null, position of the first block). Every byte goes through
    * the checked reader: a truncated file rejects loudly (the decodeBmp
    * contract), never as a raw ArrayIndexOutOfBounds. */
  private def parseGifHeader(bytes: Array[Byte]): (Array[Byte], Int) = {
    require(bytes.length > 13, "not a GIF: too short")
    val magic = new String(bytes, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    require(magic == "GIF87a" || magic == "GIF89a", s"not a GIF: magic '$magic'")
    val packed = bytes(10) & 0xff
    var pos = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val sz = 3 * (1 << ((packed & 7) + 1))
      require(pos + sz <= bytes.length, "truncated global color table")
      gct = java.util.Arrays.copyOfRange(bytes, pos, pos + sz)
      pos += sz
    }
    (gct, pos)
  }

  private def gifU8(bytes: Array[Byte], off: Int): Int = {
    require(off >= 0 && off < bytes.length, s"truncated GIF at byte $off")
    bytes(off) & 0xff
  }

  private def gifSkipSubBlocks(bytes: Array[Byte], p0: Int): Int = {
    var p = p0
    while (gifU8(bytes, p) != 0) p += 1 + gifU8(bytes, p)
    p + 1
  }

  /** Decode ONE image block (descriptor + optional local color table +
    * LZW stream) starting at `pos` (caller has verified the 0x2c) →
    * (top-down pixel indices, effective palette, w, h, position after
    * the image's block terminator). */
  private def decodeGifImage(bytes: Array[Byte], pos0: Int,
                             gct: Array[Byte]): (Array[Byte], Array[Byte], Int, Int, Int) = {
    def u8(off: Int): Int = gifU8(bytes, off)
    def le16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    var pos = pos0
    require(pos + 10 <= bytes.length, "truncated image descriptor")
    val w = le16(pos + 5)
    val h = le16(pos + 7)
    require(w > 0 && h > 0 && w <= (1 << 12) && h <= (1 << 12),
      s"implausible GIF dimensions ${w}x$h")
    val ipacked = bytes(pos + 9) & 0xff
    val interlaced = (ipacked & 0x40) != 0
    pos += 10
    var palette = gct
    if ((ipacked & 0x80) != 0) {
      val sz = 3 * (1 << ((ipacked & 7) + 1))
      require(pos + sz <= bytes.length, "truncated local color table")
      palette = java.util.Arrays.copyOfRange(bytes, pos, pos + sz)
      pos += sz
    }
    require(palette != null, "no color table")
    val minCode = u8(pos)
    require(minCode >= 2 && minCode <= 8, s"bad LZW minimum code size $minCode")
    pos += 1
    // concatenate the image-data sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    while ({ require(pos < bytes.length, "truncated image data")
             (bytes(pos) & 0xff) != 0 }) {
      val blen = bytes(pos) & 0xff
      require(pos + 1 + blen <= bytes.length, "truncated image sub-block")
      data.write(bytes, pos + 1, blen)
      pos += 1 + blen
    }
    val code = data.toByteArray
    // LZW decode (GIF variant): prefix-table form — entry e is
    // (prefix(e), last byte); emitting walks the chain. Bounded arrays,
    // no per-entry byte copies.
    val clear = 1 << minCode
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new Array[Byte](w * h)
    var nOut = 0
    var next = end + 1
    var width = minCode + 1
    var prev = -1
    var acc = 0L; var nbits = 0; var bi = 0
    val emitBuf = new Array[Byte](4096)
    def emit(c0: Int): Byte = { // writes entry c0's bytes, returns first byte
      var c = c0; var n = 0
      while (c >= clear) { emitBuf(n) = suffix(c); n += 1; c = prefix(c) }
      val first = c.toByte
      require(nOut + n + 1 <= out.length, "LZW output overruns pixel count")
      out(nOut) = first; nOut += 1
      var k = n - 1
      while (k >= 0) { out(nOut) = emitBuf(k); nOut += 1; k -= 1 }
      first
    }
    var done = false
    while (!done) {
      while (nbits < width && bi < code.length) {
        acc |= (code(bi) & 0xffL) << nbits; nbits += 8; bi += 1
      }
      require(nbits >= width, "truncated LZW stream")
      val c = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; nbits -= width
      if (c == clear) { next = end + 1; width = minCode + 1; prev = -1 }
      else if (c == end) done = true
      else if (prev < 0) {
        require(c < clear, s"first code $c not a literal")
        out(nOut) = c.toByte; nOut += 1; prev = c
      } else {
        require(c <= next && (c < next || prev >= 0), s"bad LZW code $c")
        val first =
          if (c < next) emit(c)
          else { // K-omega-K: emit prev ++ first(prev)
            val f = emit(prev)
            require(nOut < out.length, "LZW output overruns pixel count")
            out(nOut) = f; nOut += 1
            f
          }
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first; next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = c
      }
      if (nOut == out.length && !done) {
        // all pixels decoded; consume the end code if present, else stop
        done = true
      }
    }
    require(nOut == w * h, s"decoded $nOut of ${w * h} pixels")
    // interlaced images store rows in four-pass order (8/8 from 0, 8/8
    // from 4, 4/4 from 2, 2/2 from 1) — permute back to top-down
    val pixels =
      if (!interlaced) out
      else {
        val deint = new Array[Byte](out.length)
        var r = 0
        for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
             y <- start until h by step) {
          System.arraycopy(out, r * w, deint, y * w, w)
          r += 1
        }
        deint
      }
    (pixels, palette, w, h, pos + 1) // pos sits on the block terminator
  }

  /** decodeBmp's 8 integer-exact feature lanes over palette-indexed
    * top-down pixels (shared by the single-image and per-frame paths). */
  private def paletteLanes(pixels: Array[Byte], palette: Array[Byte],
                           w: Int, h: Int): Array[Float] = {
    val accs = new Array[Long](6)
    var rGtG = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val idx = (pixels(y * w + x) & 0xff) * 3
        require(idx + 2 < palette.length, s"pixel index ${idx / 3} outside palette")
        val r = palette(idx) & 0xff
        val g = palette(idx + 1) & 0xff
        val b = palette(idx + 2) & 0xff
        accs(0) += r; accs(1) += g; accs(2) += b
        accs(3) += r.toLong * (x + 1)
        accs(4) += g.toLong * (y + 1)
        accs(5) += b.toLong * (x + 1) * (y + 1)
        if (r > g) rGtG += 1
        x += 1
      }
      y += 1
    }
    Array(accs(0).toFloat, accs(1).toFloat, accs(2).toFloat, accs(3).toFloat,
      accs(4).toFloat, accs(5).toFloat, (w * 256 + h).toFloat, rGtG.toFloat)
  }

  final case class GifFrame(frame_idx: Int, delay_ms: Int, w: Int, h: Int,
                            features: Array[Float])

  /** Decode EVERY frame of an animated GIF (89a): walks the full block
    * stream to the trailer, reading each Graphic Control Extension's
    * delay (centiseconds → ms) and decoding each image block with the
    * same LZW machinery as [[decodeGif]]. A frame with no preceding GCE
    * gets delay 0 (the 87a/static case). Unknown extensions skip
    * generically; anything else rejects loudly. */
  def decodeGifFrames(bytes: Array[Byte]): Seq[GifFrame] = {
    walkGifFrames(bytes).zipWithIndex.map { case ((delayMs, px, pal, w, h), k) =>
      GifFrame(k, delayMs, w, h, paletteLanes(px, pal, w, h))
    }
  }

  /** Shared frame walk: (delay_ms, pixel indices, palette, w, h) per
    * image block, GCE delays attached, loud-reject on unknown blocks. */
  private def walkGifFrames(bytes: Array[Byte])
      : Seq[(Int, Array[Byte], Array[Byte], Int, Int)] = {
    val (gct, pos0) = parseGifHeader(bytes)
    var pos = pos0
    var delayMs = 0
    val frames = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Array[Byte], Array[Byte], Int, Int)]
    var done = false
    while (!done) {
      gifU8(bytes, pos) match {
        case 0x21 =>
          if (gifU8(bytes, pos + 1) == 0xf9) { // Graphic Control Extension
            require(gifU8(bytes, pos + 2) == 4, "bad GCE block size")
            delayMs = (gifU8(bytes, pos + 4) | (gifU8(bytes, pos + 5) << 8)) * 10
          }
          pos = gifSkipSubBlocks(bytes, pos + 2)
        case 0x2c =>
          val (pixels, palette, w, h, p2) = decodeGifImage(bytes, pos, gct)
          frames += ((delayMs, pixels, palette, w, h))
          delayMs = 0
          pos = p2
        case 0x3b => done = true
        case b => throw new IllegalArgumentException(
          f"unexpected GIF block 0x$b%02x at $pos")
      }
    }
    require(frames.nonEmpty, "GIF has no image blocks")
    frames.toSeq
  }

  /** Temporally-CORRELATED animated-GIF table — the realistic video
    * shape [[synthesizeAnimatedGif]]'s independent frames lack: frame 0
    * comes fully from its chain; frame k ≥ 1 copies frame k−1 except at
    * pixels whose "cgifm{k}" mask byte < 64 (≈25% churn), which take
    * the "cgif{k}" chain value — so consecutive frames are mostly
    * identical and scene-change detection has a real signal. The mask
    * rule replays in SQL exactly (the q133 copy-mask trick, lifted to
    * the time axis): pixel j of frame k is the "cgif{m*}" chain byte
    * where m* = max {m ≤ k : mask(m, j)} and mask(0, ·) is always set.
    * Delays/dims/palette follow the agif formulas under "cgif" tags. */
  def synthesizeAnimatedGifCorrelated(spark: SparkSession, n: Int,
                                      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      def sha(tag: String): Array[Byte] =
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"$seed:$tag:$id".getBytes("UTF-8"))
      def shaK(tag: String, k: Int): Array[Byte] =
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"$seed:$tag:$id:$k".getBytes("UTF-8"))
      val dim = sha("cgifdim")
      val w = 4 + (dim(0) & 0xff) % 5
      val h = 4 + (dim(1) & 0xff) % 5
      val nf = 2 + (sha("cgifnf")(0) & 0xff) % 4
      val dly = sha("cgifdly")
      val palette = (0 until 24).flatMap(k => shaK("cgifpal", k)).toArray
      val outBytes = new java.io.ByteArrayOutputStream()
      outBytes.write("GIF89a".getBytes("US-ASCII"))
      def le16(v: Int): Unit = { outBytes.write(v & 0xff); outBytes.write((v >> 8) & 0xff) }
      le16(w); le16(h)
      outBytes.write(0xf7); outBytes.write(0); outBytes.write(0)
      outBytes.write(palette, 0, 768)
      var durationMs = 0
      val cur = new Array[Byte](w * h)
      for (f <- 0 until nf) {
        val chain = (0 until 8).flatMap(k => shaK(s"cgif$f", k)).toArray
        val mask = (0 until 8).flatMap(k => shaK(s"cgifm$f", k)).toArray
        var j = 0
        while (j < w * h) {
          if (f == 0 || (mask(j) & 0xff) < 64) cur(j) = chain(j)
          j += 1
        }
        val delayCs = 2 + (dly(f) & 0xff) % 8
        durationMs += delayCs * 10
        outBytes.write(0x21); outBytes.write(0xf9); outBytes.write(4)
        outBytes.write(0); le16(delayCs); outBytes.write(0); outBytes.write(0)
        outBytes.write(0x2c)
        le16(0); le16(0); le16(w); le16(h)
        outBytes.write(0); outBytes.write(8)
        var acc = 0L; var nbits = 0
        val lzw = new java.io.ByteArrayOutputStream()
        def put(code: Int): Unit = {
          acc |= (code.toLong & 0x1ff) << nbits; nbits += 9
          while (nbits >= 8) { lzw.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8 }
        }
        put(256)
        j = 0
        while (j < w * h) { put(cur(j) & 0xff); j += 1 }
        put(257)
        if (nbits > 0) lzw.write((acc & 0xff).toInt)
        val lz = lzw.toByteArray
        var off = 0
        while (off < lz.length) {
          val blen = math.min(255, lz.length - off)
          outBytes.write(blen); outBytes.write(lz, off, blen)
          off += blen
        }
        outBytes.write(0)
      }
      outBytes.write(0x3b)
      MediaRow(id, "video", outBytes.toByteArray,
        MediaMeta(w, h, 3, "gif", durationMs, 0))
    }.toDF()
  }

  final case class Keyframe(media_id: Long, frame_idx: Int, start_ms: Int,
                            n_changed: Long, f0: Double, f1: Double,
                            f2: Double, f3: Double, f4: Double,
                            f5: Double, f6: Double, f7: Double)

  /** Keyframe extraction — sample a frame when the PICTURE changes, not
    * when the clock ticks (the production alternative to
    * [[frameSample]]'s fixed grid): frame 0 always emits; frame k ≥ 1
    * emits iff its changed-pixel count (any channel differs vs frame
    * k−1, the [[frameDeltas]] metric) reaches `minChangedPct`% of the
    * frame. Emits the frame's start time and feature lanes. Same
    * map-only shape as the other frame ops: pixels die in the task,
    * only keyframe rows cross the exchange. */
  def keyframes(media: DataFrame, minChangedPct: Int): Dataset[Keyframe] = {
    import media.sparkSession.implicits._
    require(minChangedPct >= 0 && minChangedPct <= 100,
      s"minChangedPct out of range: $minChangedPct")
    media.as[MediaRow].filter(_.kind == "video").flatMap { m =>
      val frames = walkGifFrames(m.bytes)
      var startMs = 0
      var prev: (Array[Byte], Array[Byte]) = null // (pixels, palette)
      frames.zipWithIndex.flatMap { case ((delay, px, pal, w, h), k) =>
        val changed =
          if (k == 0) 0L
          else {
            val (px0, pal0) = prev
            var c = 0L; var j = 0
            while (j < w * h) {
              val i0 = (px0(j) & 0xff) * 3; val i1 = (px(j) & 0xff) * 3
              if (pal0(i0) != pal(i1) || pal0(i0 + 1) != pal(i1 + 1) ||
                pal0(i0 + 2) != pal(i1 + 2)) c += 1
              j += 1
            }
            c
          }
        val st = startMs
        startMs += delay
        prev = (px, pal)
        if (k == 0 || changed * 100L >= minChangedPct.toLong * (w * h)) {
          val f = paletteLanes(px, pal, w, h)
          Some(Keyframe(m.media_id, k, st, changed,
            f(0).toDouble, f(1).toDouble, f(2).toDouble, f(3).toDouble,
            f(4).toDouble, f(5).toDouble, f(6).toDouble, f(7).toDouble))
        } else None
      }
    }
  }

  final case class FrameDelta(media_id: Long, frame_idx: Int, delay_ms: Int,
                              d_r: Long, d_g: Long, d_b: Long,
                              n_changed: Long, max_delta: Int)

  /** Inter-frame motion features over animated GIF — the scene-change
    * primitive behind "sample a frame when the picture actually
    * changes" (the smarter sibling of [[frameSample]]'s fixed grid):
    * for every consecutive frame pair emit the per-channel absolute
    * pixel-delta sums, the changed-pixel count, and the largest
    * per-pixel |Δr|+|Δg|+|Δb|. Integer-exact lanes over palette-RGB
    * pixels, so the q180 oracle replays them from the frame formulas.
    * Frames must share dimensions (full-replacement frames, the
    * synthesized corpus's shape); a dimension change rejects loudly.
    * Same mapPartitions shape as [[frameSample]]: one pass, pixel
    * buffers die inside the task, only delta rows cross the exchange. */
  def frameDeltas(media: DataFrame): Dataset[FrameDelta] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].filter(_.kind == "video").flatMap { m =>
      val frames = walkGifFrames(m.bytes)
      frames.sliding(2).zipWithIndex.collect {
        case (Seq((_, px0, pal0, w0, h0), (delay, px1, pal1, w1, h1)), i) =>
          require(w0 == w1 && h0 == h1,
            s"media ${m.media_id}: frame ${i + 1} dims ${w1}x$h1 != ${w0}x$h0")
          var dr, dg, db, changed = 0L
          var mx = 0
          var j = 0
          while (j < w1 * h1) {
            val i0 = (px0(j) & 0xff) * 3
            val i1 = (px1(j) & 0xff) * 3
            val ddr = math.abs((pal1(i1) & 0xff) - (pal0(i0) & 0xff))
            val ddg = math.abs((pal1(i1 + 1) & 0xff) - (pal0(i0 + 1) & 0xff))
            val ddb = math.abs((pal1(i1 + 2) & 0xff) - (pal0(i0 + 2) & 0xff))
            dr += ddr; dg += ddg; db += ddb
            if (ddr + ddg + ddb > 0) changed += 1
            if (ddr + ddg + ddb > mx) mx = ddr + ddg + ddb
            j += 1
          }
          FrameDelta(m.media_id, i + 1, delay, dr, dg, db, changed, mx)
      }.toSeq
    }
  }

  /** Deterministic genuine-GIF table: each row's `bytes` is a complete,
    * standards-valid GIF89a file (global 256-entry color table, one
    * non-interlaced image) whose DECODED pixel indices come from
    * "gif"-tagged sha256 hex chains and whose palette bytes come from
    * "gifpal"-tagged chains — so the q112 DuckDB oracle replays indices
    * AND palette lookups without a GIF parser, while the Spark side must
    * genuinely parse the file (descriptors, color table, LZW stream).
    * The LZW layer here is the trivially-valid encoding — CLEAR, one
    * 9-bit literal per pixel, END (≤64 pixels keeps the dictionary far
    * from a width bump) — NOT part of the gated artifact: decoded
    * indices are independent of the code sequence that carried them, and
    * MultimodalSpec's ImageIO round-trip exercises real compressed
    * streams (dictionary hits, width growth) through the same decoder. */
  def synthesizeGif(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      def sha(tag: String): Array[Byte] =
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"$seed:$tag:$id".getBytes("UTF-8"))
      def shaK(tag: String, k: Int): Array[Byte] =
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"$seed:$tag:$id:$k".getBytes("UTF-8"))
      val dim = sha("gifdim")
      val w = 4 + (dim(0) & 0xff) % 5
      val h = 4 + (dim(1) & 0xff) % 5
      val pixels = (0 until 8).flatMap(k => shaK("gif", k)).toArray // 256 bytes
      val palette = (0 until 24).flatMap(k => shaK("gifpal", k)).toArray // 768
      val outBytes = new java.io.ByteArrayOutputStream()
      outBytes.write("GIF89a".getBytes("US-ASCII"))
      def le16(v: Int): Unit = { outBytes.write(v & 0xff); outBytes.write((v >> 8) & 0xff) }
      le16(w); le16(h)
      outBytes.write(0xf7)            // GCT present, 256 entries
      outBytes.write(0); outBytes.write(0)
      outBytes.write(palette, 0, 768)
      outBytes.write(0x2c)            // image descriptor
      le16(0); le16(0); le16(w); le16(h)
      outBytes.write(0)               // no LCT, not interlaced
      outBytes.write(8)               // LZW minimum code size
      // literal-only 9-bit stream: CLEAR, pixels, END (LSB-first packing)
      var acc = 0L; var nbits = 0
      val lzw = new java.io.ByteArrayOutputStream()
      def put(code: Int): Unit = {
        acc |= (code.toLong & 0x1ff) << nbits; nbits += 9
        while (nbits >= 8) { lzw.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8 }
      }
      put(256)
      var j = 0
      while (j < w * h) { put(pixels(j) & 0xff); j += 1 }
      put(257)
      if (nbits > 0) lzw.write((acc & 0xff).toInt)
      val lz = lzw.toByteArray
      var off = 0
      while (off < lz.length) { // sub-blocks (≤255 each)
        val blen = math.min(255, lz.length - off)
        outBytes.write(blen); outBytes.write(lz, off, blen)
        off += blen
      }
      outBytes.write(0)               // block terminator
      outBytes.write(0x3b)            // trailer
      MediaRow(id, "image", outBytes.toByteArray,
        MediaMeta(w, h, 3, "gif", 0, 0))
    }.toDF()
  }

  /** Deterministic genuine ANIMATED-GIF table: each row is a complete
    * GIF89a with 2-5 full-size frames, each frame preceded by a Graphic
    * Control Extension carrying a replayable delay — so [[frameSample]]
    * has real multi-frame timing to sample against and the q174 DuckDB
    * oracle can replay frame pixels, palette lookups, AND the delay
    * arithmetic without a GIF parser:
    *
    *   frames   nf       = 2 + byte0("agifnf") % 4            ∈ [2,5]
    *   delay of frame k  = (2 + byte k of "agifdly" % 8) cs   ∈ [20,90] ms
    *   frame k pixel j   = byte j of the "agif{k}" chain
    *   palette entry e   = "agifpal" chain bytes 3e..3e+2
    *   dims              = 4 + "agifdim" bytes % 5 (shared by frames)
    *
    * The LZW layer is the trivially-valid literal encoding, NOT part of
    * the gated artifact (decoded indices are code-sequence-independent;
    * MultimodalSpec's ImageIO reader cross-checks every frame). */
  def synthesizeAnimatedGif(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      def sha(tag: String): Array[Byte] =
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"$seed:$tag:$id".getBytes("UTF-8"))
      def shaK(tag: String, k: Int): Array[Byte] =
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"$seed:$tag:$id:$k".getBytes("UTF-8"))
      val dim = sha("agifdim")
      val w = 4 + (dim(0) & 0xff) % 5
      val h = 4 + (dim(1) & 0xff) % 5
      val nf = 2 + (sha("agifnf")(0) & 0xff) % 4
      val dly = sha("agifdly")
      val palette = (0 until 24).flatMap(k => shaK("agifpal", k)).toArray // 768
      val outBytes = new java.io.ByteArrayOutputStream()
      outBytes.write("GIF89a".getBytes("US-ASCII"))
      def le16(v: Int): Unit = { outBytes.write(v & 0xff); outBytes.write((v >> 8) & 0xff) }
      le16(w); le16(h)
      outBytes.write(0xf7)            // GCT present, 256 entries
      outBytes.write(0); outBytes.write(0)
      outBytes.write(palette, 0, 768)
      var durationMs = 0
      for (f <- 0 until nf) {
        val delayCs = 2 + (dly(f) & 0xff) % 8
        durationMs += delayCs * 10
        outBytes.write(0x21); outBytes.write(0xf9) // Graphic Control Ext
        outBytes.write(4)                          // block size
        outBytes.write(0)                          // no disposal/transparency
        le16(delayCs)                              // delay, centiseconds
        outBytes.write(0); outBytes.write(0)       // transparent idx, term
        outBytes.write(0x2c)                       // image descriptor
        le16(0); le16(0); le16(w); le16(h)
        outBytes.write(0)                          // no LCT, not interlaced
        outBytes.write(8)                          // LZW minimum code size
        val pixels = (0 until 8).flatMap(k => shaK(s"agif$f", k)).toArray
        var acc = 0L; var nbits = 0
        val lzw = new java.io.ByteArrayOutputStream()
        def put(code: Int): Unit = {
          acc |= (code.toLong & 0x1ff) << nbits; nbits += 9
          while (nbits >= 8) { lzw.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8 }
        }
        put(256)
        var j = 0
        while (j < w * h) { put(pixels(j) & 0xff); j += 1 }
        put(257)
        if (nbits > 0) lzw.write((acc & 0xff).toInt)
        val lz = lzw.toByteArray
        var off = 0
        while (off < lz.length) {
          val blen = math.min(255, lz.length - off)
          outBytes.write(blen); outBytes.write(lz, off, blen)
          off += blen
        }
        outBytes.write(0)             // block terminator
      }
      outBytes.write(0x3b)            // trailer
      MediaRow(id, "video", outBytes.toByteArray,
        MediaMeta(w, h, 3, "gif", durationMs, 0))
    }.toDF()
  }

  final case class SampledFrame(media_id: Long, sample_idx: Int, t_ms: Int,
                                frame_idx: Int, f0: Double, f1: Double,
                                f2: Double, f3: Double, f4: Double,
                                f5: Double, f6: Double, f7: Double)

  /** REAL frame sampling (the operator [[frameSampleStub]] stands in for
    * when no decodable container is present): decode every frame of each
    * animated GIF, build the frame timeline from the GCE delays (frame k
    * starts at Σ delays < k), and emit one row per sample instant
    * t = 0, everyMs, 2·everyMs, … < duration carrying the ACTIVE frame's
    * integer-exact feature lanes — the Generator-shaped media analogue of
    * C6's explode, and the op a video pipeline runs as "grab a frame
    * every N ms". Same mapPartitions batch shape as [[extractFeatures]]:
    * bytes decoded and dropped in one pass, only (id, t, frame, features)
    * rows cross the exchange — at scale the output is O(duration/everyMs)
    * small rows per media file, never pixels. */
  def frameSample(media: DataFrame, everyMs: Int): Dataset[SampledFrame] = {
    import media.sparkSession.implicits._
    require(everyMs > 0, "everyMs must be positive")
    media.as[MediaRow].filter(_.kind == "video").flatMap { m =>
      val frames = decodeGifFrames(m.bytes)
      val starts = frames.scanLeft(0)(_ + _.delay_ms) // length nf+1; last = duration
      val duration = starts.last
      require(duration > 0, s"media ${m.media_id}: zero total duration")
      // single forward cursor over the frame timeline: sample instants
      // ascend, so the active frame only ever moves forward — O(samples
      // + frames), not O(samples × frames) (matters for long videos)
      var k = 0
      Iterator.from(0).map(_ * everyMs).takeWhile(_ < duration).zipWithIndex
        .map { case (t, s) =>
          while (k + 1 < frames.length && starts(k + 1) <= t) k += 1
          val f = frames(k).features
          SampledFrame(m.media_id, s, t, k,
            f(0).toDouble, f(1).toDouble, f(2).toDouble, f(3).toDouble,
            f(4).toDouble, f(5).toDouble, f(6).toDouble, f(7).toDouble)
        }.toSeq
    }
  }

  /** REAL codec for QOI ("Quite OK Image", qoiformat.org, public spec
    * 2022) — the third COMPRESSED format behind the codec seam and the
    * first whose compression layer is implemented END TO END here (PNG
    * leaned on the JDK's Inflater; QOI's op-stream coder has no JDK
    * helper at all): 14-byte header, then a byte-op stream over a
    * running pixel state — RGB/RGBA literals, a 64-slot recently-seen
    * color INDEX keyed by (3r+5g+7b+11a) mod 64, two delta encodings
    * (DIFF: 2-bit channel deltas; LUMA: 6-bit green delta with 4-bit
    * red/blue offsets from it), and run-length ops — closed by a
    * 7×0x00 + 0x01 end marker. Features are [[decodeBmp]]'s 8
    * integer-exact lanes over the decoded RGB pixels, so the q133
    * oracle replays the pixel formula: decoded pixels are independent
    * of WHICH ops encoded them (the q111 transparency property), which
    * is what lets a SQL oracle gate an op-stream codec. */
  def decodeQoi(bytes: Array[Byte]): Array[Float] = {
    require(bytes.length >= 22, "not a QOI: too short")
    require(bytes(0) == 'q' && bytes(1) == 'o' && bytes(2) == 'i' &&
      bytes(3) == 'f', "not a QOI: bad magic")
    def be32(off: Int): Int =
      ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
    val w = be32(4); val h = be32(8)
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 24), s"bad dims ${w}x$h")
    require((bytes(12) & 0xff) == 3, "only 3-channel QOI supported")
    require((bytes(13) & 0xff) == 0, "only linear-sRGB colorspace 0 supported")
    val n = w * h
    val px = new Array[Int](n) // packed 0xRRGGBB
    val index = new Array[Int](64) // packed 0xAARRGGBB, zero-init
    var r = 0; var g = 0; var b = 0; var a = 255
    var pos = 14
    var j = 0
    def hash: Int = (r * 3 + g * 5 + b * 7 + a * 11) % 64
    while (j < n) {
      require(pos < bytes.length - 8, "truncated QOI op stream")
      val op = bytes(pos) & 0xff
      pos += 1
      var run = 0
      if (op == 0xfe) { // QOI_OP_RGB
        r = bytes(pos) & 0xff; g = bytes(pos + 1) & 0xff
        b = bytes(pos + 2) & 0xff; pos += 3
      } else if (op == 0xff) { // QOI_OP_RGBA
        r = bytes(pos) & 0xff; g = bytes(pos + 1) & 0xff
        b = bytes(pos + 2) & 0xff; a = bytes(pos + 3) & 0xff; pos += 4
      } else (op >> 6) match {
        case 0 => // QOI_OP_INDEX
          val v = index(op & 0x3f)
          a = (v >>> 24) & 0xff; r = (v >> 16) & 0xff
          g = (v >> 8) & 0xff; b = v & 0xff
        case 1 => // QOI_OP_DIFF (2-bit deltas, bias 2, wrapping)
          r = (r + ((op >> 4) & 3) - 2) & 0xff
          g = (g + ((op >> 2) & 3) - 2) & 0xff
          b = (b + (op & 3) - 2) & 0xff
        case 2 => // QOI_OP_LUMA (6-bit dg bias 32; 4-bit dr-dg / db-dg bias 8)
          val dg = (op & 0x3f) - 32
          val rb = bytes(pos) & 0xff; pos += 1
          r = (r + dg + ((rb >> 4) & 0xf) - 8) & 0xff
          g = (g + dg) & 0xff
          b = (b + dg + (rb & 0xf) - 8) & 0xff
        case _ => // QOI_OP_RUN (bias -1; 63/64 are the RGB/RGBA tags)
          run = op & 0x3f
      }
      index(hash) = (a << 24) | (r << 16) | (g << 8) | b
      var k = 0
      while (k <= run) {
        require(j < n, "QOI op stream overruns pixel count")
        px(j) = (r << 16) | (g << 8) | b
        j += 1; k += 1
      }
    }
    require(pos + 8 <= bytes.length, "missing QOI end marker")
    var e = 0
    while (e < 7) {
      require(bytes(pos + e) == 0, "bad QOI end marker"); e += 1
    }
    require(bytes(pos + 7) == 1, "bad QOI end marker")
    // decodeBmp's feature lanes over top-down RGB pixels
    val acc = new Array[Long](6)
    var rGtG = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = px(y * w + x)
        val rr = (v >> 16) & 0xff; val gg = (v >> 8) & 0xff; val bb = v & 0xff
        acc(0) += rr; acc(1) += gg; acc(2) += bb
        acc(3) += rr.toLong * (x + 1)
        acc(4) += gg.toLong * (y + 1)
        acc(5) += bb.toLong * (x + 1) * (y + 1)
        if (rr > gg) rGtG += 1
        x += 1
      }
      y += 1
    }
    Array(acc(0).toFloat, acc(1).toFloat, acc(2).toFloat, acc(3).toFloat,
      acc(4).toFloat, acc(5).toFloat, (w * 256 + h).toFloat, rGtG.toFloat)
  }

  /** Reference QOI encoder (the spec's greedy algorithm: RUN, then
    * INDEX, then DIFF, then LUMA, else RGB literal) over packed
    * 0xRRGGBB pixels. Used by [[synthesizeQoi]] and the spec's
    * round-trip/structure tests; the decode side never depends on
    * which ops this chose. */
  def encodeQoi(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    require(px.length == w * h, "pixel count mismatch")
    val out = new java.io.ByteArrayOutputStream()
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    def be32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    be32(w); be32(h); out.write(3); out.write(0)
    val index = new Array[Int](64)
    var pr = 0; var pg = 0; var pb = 0
    val a = 255
    var run = 0
    for (v <- px) {
      val r = (v >> 16) & 0xff; val g = (v >> 8) & 0xff; val b = v & 0xff
      if (r == pr && g == pg && b == pb) {
        run += 1
        if (run == 62) { out.write(0xc0 | (run - 1)); run = 0 }
      } else {
        if (run > 0) { out.write(0xc0 | (run - 1)); run = 0 }
        val hash = (r * 3 + g * 5 + b * 7 + a * 11) % 64
        val packed = (a << 24) | (r << 16) | (g << 8) | b
        if (index(hash) == packed) out.write(hash)
        else {
          index(hash) = packed
          // wrapped signed channel deltas in [-128, 127]
          def wrap(d: Int): Int = { val m = d & 0xff; if (m > 127) m - 256 else m }
          val wr = wrap(r - pr); val wg = wrap(g - pg); val wb = wrap(b - pb)
          if (wr >= -2 && wr <= 1 && wg >= -2 && wg <= 1 && wb >= -2 && wb <= 1)
            out.write(0x40 | ((wr + 2) << 4) | ((wg + 2) << 2) | (wb + 2))
          else if (wg >= -32 && wg <= 31 && (wr - wg) >= -8 && (wr - wg) <= 7 &&
              (wb - wg) >= -8 && (wb - wg) <= 7) {
            out.write(0x80 | (wg + 32))
            out.write(((wr - wg + 8) << 4) | (wb - wg + 8))
          } else {
            out.write(0xfe); out.write(r); out.write(g); out.write(b)
          }
        }
        pr = r; pg = g; pb = b
      }
    }
    if (run > 0) out.write(0xc0 | (run - 1))
    for (_ <- 0 until 7) out.write(0)
    out.write(1)
    out.toByteArray
  }

  /** Deterministic genuine-QOI table: each row's `bytes` is a complete
    * QOI file whose DECODED pixels follow a replayable formula with a
    * COPY MASK: pixel j takes the sha-chain RGB triple of the nearest
    * non-copy index ≤ j, where j > 0 is a copy iff its "mask"-chain
    * byte ≡ 0 (mod 4). The mask plants genuine run structure (expected
    * geometric runs at rate 1/4), so the greedy encoder emits RUN and
    * INDEX ops in-gate — not just RGB literals — while the oracle
    * replays the mask rule with one running-max window over the anchor
    * indices. Encoding choices remain outside the gated artifact. */
  def synthesizeQoi(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      def sha(tag: String): Array[Byte] =
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"$seed:qoi:$id:$tag".getBytes("UTF-8"))
      val dim = sha("dim")
      val w = 4 + (dim(0) & 0xff) % 5
      val h = 4 + (dim(1) & 0xff) % 5
      val chain = (0 until 8).flatMap(k => sha(k.toString)).toArray
      val mask = (0 until 2).flatMap(k => sha(s"mask:$k")).toArray
      val px = new Array[Int](w * h)
      var src = 0
      for (j <- 0 until w * h) {
        if (j == 0 || (mask(j) & 0xff) % 4 != 0) src = j
        px(j) = ((chain(3 * src) & 0xff) << 16) |
          ((chain(3 * src + 1) & 0xff) << 8) | (chain(3 * src + 2) & 0xff)
      }
      MediaRow(id, "image", encodeQoi(w, h, px),
        MediaMeta(w, h, 3, "qoi", 0, 0))
    }.toDF()
  }

  /** One parsed archive member. `method` is the ZIP compression method
    * code (0 = stored, 8 = deflate); `usize` the uncompressed size the
    * container declared (validated against the decoded bytes). */
  final case class ParsedMember(member_idx: Int, name: String,
                                method: Int, usize: Long, content: Array[Byte])
  final case class ArchiveMember(media_id: Long, member_idx: Int, name: String,
                                 method: Int, usize: Long, content: Array[Byte])

  /** REAL parser for ZIP (PKWARE APPNOTE) — the first CONTAINER format
    * behind the codec seam: where the image/audio codecs map one blob to
    * one feature row, an archive maps one blob to MANY member rows (the
    * binary analogue of C6's explode). First-principles parse, zero
    * external libraries:
    *
    *  - end-of-central-directory located by the spec's backward scan
    *    (signature + self-consistent comment length), NOT by assuming a
    *    fixed tail — archives with comments parse, garbage tails fail;
    *  - central directory walked entry by entry; member METADATA (method,
    *    crc, sizes, local offset) is taken from the CD, never the local
    *    header, so streaming-written archives that set general-purpose
    *    bit 3 (sizes deferred to a data descriptor — what
    *    `java.util.zip.ZipOutputStream` emits for DEFLATED entries) parse
    *    correctly;
    *  - each local header is still visited and its name cross-checked
    *    against the CD entry (catches CD/local desync corruption);
    *  - stored (method 0) and deflate (method 8) bodies supported; raw
    *    `Inflater(nowrap = true)` for the latter (ZIP frames deflate
    *    bare, unlike PNG's zlib wrapper);
    *  - every member's CRC32 and uncompressed size are validated — a
    *    single flipped content byte fails the parse loudly.
    *
    * Decoded member bytes are independent of the compression
    * representation that carried them (the q111 transparency property),
    * so the q149 DuckDB oracle replays the member-content formula without
    * a ZIP parser while this side must genuinely walk the container. */
  def decodeZip(bytes: Array[Byte]): Seq[ParsedMember] = {
    require(bytes.length >= 22, "not a ZIP: too short for EOCD")
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def u32(off: Int): Long =
      (u16(off).toLong) | (u16(off + 2).toLong << 16)
    // EOCD backward scan: signature 0x06054b50 whose comment length
    // matches the remaining tail exactly (spec-required disambiguation —
    // the signature bytes can occur inside a comment).
    var eocd = -1
    var p = bytes.length - 22
    val pMin = math.max(0, bytes.length - 22 - 0xffff)
    while (eocd < 0 && p >= pMin) {
      if (bytes(p) == 0x50 && bytes(p + 1) == 0x4b &&
          bytes(p + 2) == 0x05 && bytes(p + 3) == 0x06 &&
          u16(p + 20) == bytes.length - p - 22) eocd = p
      p -= 1
    }
    require(eocd >= 0, "not a ZIP: no end-of-central-directory record")
    val nEntries = u16(eocd + 10)
    require(u16(eocd + 8) == nEntries,
      "unsupported ZIP: multi-disk archive")
    val cdSize = u32(eocd + 12)
    val cdOff = u32(eocd + 16)
    require(cdOff + cdSize <= eocd,
      s"corrupt ZIP: central directory [$cdOff, ${cdOff + cdSize}) overruns EOCD at $eocd")
    val out = Vector.newBuilder[ParsedMember]
    var cd = cdOff.toInt
    var k = 0
    while (k < nEntries) {
      require(cd + 46 <= eocd && u32(cd) == 0x02014b50L,
        s"corrupt ZIP: bad central-directory signature at $cd")
      val method = u16(cd + 10)
      val crc = u32(cd + 16)
      val csize = u32(cd + 20)
      val usize = u32(cd + 24)
      require(csize != 0xffffffffL && usize != 0xffffffffL,
        "unsupported ZIP: zip64 sizes (split oversized members upstream)")
      val nameLen = u16(cd + 28)
      val extraLen = u16(cd + 30)
      val commentLen = u16(cd + 32)
      // validate declared offsets/sizes in LONG arithmetic before any
      // Int narrowing: a declared value ≥ 2^31 would otherwise wrap
      // negative and surface as a raw array-index error instead of the
      // validated 'corrupt/unsupported' contract
      val localOffL = u32(cd + 42)
      require(localOffL + 30 <= bytes.length,
        s"corrupt ZIP: local header at $localOffL overruns the archive")
      require(usize <= Int.MaxValue - 8,
        s"unsupported ZIP: member of $usize bytes exceeds the 2 GiB " +
          "single-member bound (split oversized members upstream)")
      val localOff = localOffL.toInt
      val name = new String(bytes, cd + 46, nameLen,
        java.nio.charset.StandardCharsets.UTF_8)
      // local header cross-check (name must agree with the CD entry)
      require(localOff + 30 <= bytes.length && u32(localOff) == 0x04034b50L,
        s"corrupt ZIP: bad local-header signature for '$name' at $localOff")
      val lNameLen = u16(localOff + 26)
      val lExtraLen = u16(localOff + 28)
      val lName = new String(bytes, localOff + 30, lNameLen,
        java.nio.charset.StandardCharsets.UTF_8)
      require(lName == name,
        s"corrupt ZIP: central directory says '$name', local header '$lName'")
      val dataOff = localOff + 30 + lNameLen + lExtraLen
      require(dataOff + csize <= bytes.length,
        s"corrupt ZIP: member '$name' body overruns the archive")
      val content: Array[Byte] = method match {
        case 0 =>
          require(csize == usize,
            s"corrupt ZIP: stored member '$name' has csize $csize != usize $usize")
          java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + csize.toInt)
        case 8 =>
          val inf = new java.util.zip.Inflater(true) // raw deflate, no zlib wrapper
          inf.setInput(bytes, dataOff, csize.toInt)
          val buf = new Array[Byte](usize.toInt)
          var got = 0
          while (got < usize && !inf.finished()) {
            val n = inf.inflate(buf, got, buf.length - got)
            require(n > 0 || !inf.needsInput(),
              s"corrupt ZIP: deflate stream of '$name' truncated")
            got += n
          }
          inf.end()
          require(got == usize,
            s"corrupt ZIP: member '$name' inflated to $got bytes, declared $usize")
          buf
        case m =>
          throw new IllegalArgumentException(
            s"unsupported ZIP compression method $m for member '$name'")
      }
      val c = new java.util.zip.CRC32
      c.update(content)
      require(c.getValue == crc,
        f"corrupt ZIP: member '$name' CRC32 ${c.getValue}%08x != declared $crc%08x")
      out += ParsedMember(k, name, method, usize, content)
      cd += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    require(cd == (cdOff + cdSize).toInt,
      s"corrupt ZIP: central directory ended at $cd, declared ${cdOff + cdSize}")
    out.result()
  }

  /** Container explode through the codec seam: one `mapPartitions` pass,
    * parser invoked exactly once per blob, each member emitted as its own
    * row — bytes never cross a shuffle (the downstream query carries
    * member-level columns only). The binary analogue of the C6 explode. */
  def extractMembers(media: DataFrame,
                     parser: Array[Byte] => Seq[ParsedMember])
      : Dataset[ArchiveMember] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.flatMap { m =>
        parser(m.bytes).map(e =>
          ArchiveMember(m.media_id, e.member_idx, e.name, e.method,
            e.usize, e.content))
      }
    }
  }

  final case class MemberFeatures(media_id: Long, member_idx: Int, name: String,
                                  method: Int, usize: Long,
                                  f0: Long, f1: Long, f2: Long, f3: Long)

  /** Integer-exact member lanes (byte sum, position-weighted sum, first
    * byte, last byte), computed in the same narrow stage that parsed the
    * container — member bytes die here, only 4 longs travel. Empty
    * members (directory entries) take −1 in the endpoint lanes. */
  def memberFeatures(members: Dataset[ArchiveMember]): Dataset[MemberFeatures] = {
    import members.sparkSession.implicits._
    members.map { m =>
      var s0 = 0L; var s1 = 0L; var j = 0
      while (j < m.content.length) {
        val b = m.content(j) & 0xff
        s0 += b; s1 += b.toLong * (j + 1); j += 1
      }
      val first = if (m.content.isEmpty) -1L else (m.content(0) & 0xff).toLong
      val last = if (m.content.isEmpty) -1L
                 else (m.content(m.content.length - 1) & 0xff).toLong
      MemberFeatures(m.media_id, m.member_idx, m.name, m.method, m.usize,
        s0, s1, first, last)
    }
  }

  /** Deterministic genuine-ZIP table: each row's `bytes` is a complete,
    * standards-valid ZIP archive of 1–3 members whose NAMES, SIZES, and
    * CONTENT bytes come from replayable sha256 chains — member k of
    * archive i is `m{k}_{i}.bin`, length 16 + chainbyte % 48, content
    * the "zip"-tagged chain — and whose compression method alternates
    * stored / deflate by (i + k) parity. The deflate layer is NOT part
    * of the gated artifact (decoded content is representation-
    * independent); MultimodalSpec's two-way `java.util.zip` cross-check
    * exercises real JDK-written archives (including streaming data-
    * descriptor entries) through the same parser. */
  def synthesizeZip(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      def sha(tag: String): Array[Byte] =
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"$seed:$tag:$id".getBytes("UTF-8"))
      def shaK(tag: String, k: Int): Array[Byte] =
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"$seed:$tag:$id:$k".getBytes("UTF-8"))
      val nm = 1 + (sha("zipdim")(0) & 0xff) % 3
      val members = (0 until nm).map { k =>
        val len = 16 + (shaK("ziplen", k)(0) & 0xff) % 48
        val chain = shaK("zip", k) ++ shaK("zipc1", k) // 64 bytes >= 63
        val content = java.util.Arrays.copyOf(chain, len)
        val method = if ((id + k) % 2 == 0) 0 else 8
        (s"m${k}_$id.bin", method, content)
      }
      MediaRow(id, "archive", encodeZip(members),
        MediaMeta(nm, 0, 0, "zip", 0, 0))
    }.toDF()
  }

  /** Minimal correct ZIP writer used by [[synthesizeZip]] and the specs:
    * local headers with up-front sizes (no data descriptors), a central
    * directory, one EOCD. NOT the gated artifact — the oracle replays
    * content, not container bytes. */
  def encodeZip(members: Seq[(String, Int, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    val centrals = members.map { case (name, method, content) =>
      val crc = new java.util.zip.CRC32
      crc.update(content)
      val body: Array[Byte] =
        if (method == 0) content
        else {
          val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(content); d.finish()
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](512)
          while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
          d.end()
          bos.toByteArray
        }
      val nameB = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val localOff = out.size()
      w32(0x04034b50L); w16(20); w16(0); w16(method)
      w16(0); w16(0x21)                       // fixed DOS time/date
      w32(crc.getValue); w32(body.length.toLong); w32(content.length.toLong)
      w16(nameB.length); w16(0)
      out.write(nameB); out.write(body)
      (nameB, method, crc.getValue, body.length.toLong, content.length.toLong, localOff)
    }
    val cdOff = out.size()
    centrals.foreach { case (nameB, method, crc, csize, usize, localOff) =>
      w32(0x02014b50L); w16(20); w16(20); w16(0); w16(method)
      w16(0); w16(0x21)
      w32(crc); w32(csize); w32(usize)
      w16(nameB.length); w16(0); w16(0); w16(0); w16(0)
      w32(0); w32(localOff.toLong)
      out.write(nameB)
    }
    val cdSize = out.size() - cdOff
    w32(0x06054b50L); w16(0); w16(0)
    w16(centrals.length); w16(centrals.length)
    w32(cdSize.toLong); w32(cdOff.toLong); w16(0)
    out.toByteArray
  }

  /** REAL parser for gzip (RFC 1952), CONCATENATED members — the second
    * container format behind the codec seam and the standard shape of
    * crawl-scale text dumps (a .gz per shard, members appended by
    * independent writers). First-principles header walk, zero external
    * libraries beyond the JDK's raw `Inflater`:
    *
    *  - per member: magic 1f 8b, CM = 8 (deflate), FLG with reserved
    *    bits REQUIRED zero (RFC 1952 §2.3.1 — garbage headers fail
    *    loudly, not silently);
    *  - all four optional fields honored in spec order: FEXTRA (XLEN +
    *    payload), FNAME and FCOMMENT (zero-terminated), FHCRC (CRC16 =
    *    low 16 bits of CRC32 over the header bytes so far — validated);
    *  - raw-deflate body, then the 8-byte trailer: CRC32 over the
    *    DECODED bytes and ISIZE = length mod 2^32 — both validated;
    *  - `Inflater.getRemaining` locates the next member's offset, so
    *    members parse in stream order with no separator scan.
    *
    * Member names come from FNAME when present (else ""); `method` is
    * always 8. Decoded bytes are deflate-representation-independent, so
    * the q153 oracle replays the content formula without a gzip parser. */
  def decodeGzipMembers(bytes: Array[Byte]): Seq[ParsedMember] = {
    def u16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def u32(off: Int): Long = u16(off).toLong | (u16(off + 2).toLong << 16)
    val out = Vector.newBuilder[ParsedMember]
    var p = 0
    var k = 0
    require(bytes.length >= 18, "not a gzip stream: too short")
    while (p < bytes.length) {
      require(p + 10 <= bytes.length, s"truncated gzip header at byte $p")
      require((bytes(p) & 0xff) == 0x1f && (bytes(p + 1) & 0xff) == 0x8b,
        f"not a gzip member at byte $p: magic ${bytes(p)}%02x ${bytes(p + 1)}%02x")
      require((bytes(p + 2) & 0xff) == 8,
        s"unsupported gzip compression method ${bytes(p + 2)} at byte $p")
      val flg = bytes(p + 3) & 0xff
      require((flg & 0xe0) == 0,
        f"corrupt gzip: reserved FLG bits set ($flg%02x) at byte $p")
      var q = p + 10
      def bounded(off: Int): Int = {
        require(off < bytes.length, s"truncated gzip header fields at byte $off")
        off
      }
      if ((flg & 4) != 0) { // FEXTRA
        val xlen = u16(bounded(q + 1) - 1); q = bounded(q + 2 + xlen)
      }
      var name = ""
      if ((flg & 8) != 0) { // FNAME (zero-terminated latin-1)
        val start = q
        while (bytes(bounded(q)) != 0) q += 1
        name = new String(bytes, start, q - start,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        q += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT
        while (bytes(bounded(q)) != 0) q += 1
        q += 1
      }
      if ((flg & 2) != 0) { // FHCRC: CRC16 of header bytes [p, q)
        val hc = new java.util.zip.CRC32
        hc.update(bytes, p, q - p)
        require((hc.getValue & 0xffffL) == u16(q),
          s"corrupt gzip: header CRC16 mismatch at byte $p")
        q += 2
      }
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(bytes, q, bytes.length - q)
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        require(n > 0 || inf.finished() || !inf.needsInput(),
          s"corrupt gzip: deflate stream of member $k truncated")
        bos.write(buf, 0, n)
      }
      val content = bos.toByteArray
      val trailerOff = bytes.length - inf.getRemaining
      inf.end()
      require(trailerOff + 8 <= bytes.length,
        s"truncated gzip trailer for member $k")
      val c = new java.util.zip.CRC32
      c.update(content)
      require(c.getValue == u32(trailerOff),
        f"corrupt gzip: member $k CRC32 ${c.getValue}%08x != declared ${u32(trailerOff)}%08x")
      require((content.length.toLong & 0xffffffffL) == u32(trailerOff + 4),
        s"corrupt gzip: member $k ISIZE ${u32(trailerOff + 4)} != ${content.length}")
      out += ParsedMember(k, name, 8, content.length.toLong, content)
      p = trailerOff + 8
      k += 1
    }
    out.result()
  }

  /** Minimal correct gzip writer used by [[synthesizeGzip]] and the
    * specs: one member per call, optional FEXTRA/FNAME/FCOMMENT/FHCRC
    * fields. NOT the gated artifact. */
  def encodeGzipMember(content: Array[Byte], name: Option[String] = None,
                       extra: Option[Array[Byte]] = None,
                       comment: Option[String] = None,
                       headerCrc: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val flg = (if (headerCrc) 2 else 0) | (if (extra.isDefined) 4 else 0) |
      (if (name.isDefined) 8 else 0) | (if (comment.isDefined) 16 else 0)
    out.write(0x1f); out.write(0x8b); out.write(8); out.write(flg)
    out.write(Array[Byte](0, 0, 0, 0)) // MTIME = 0 (determinism)
    out.write(0); out.write(255)       // XFL, OS = unknown
    extra.foreach { e =>
      out.write(e.length & 0xff); out.write((e.length >> 8) & 0xff)
      out.write(e)
    }
    name.foreach { n =>
      out.write(n.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      out.write(0)
    }
    comment.foreach { cm =>
      out.write(cm.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      out.write(0)
    }
    if (headerCrc) {
      val hc = new java.util.zip.CRC32
      hc.update(out.toByteArray)
      val v = (hc.getValue & 0xffffL).toInt
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
    }
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(content); d.finish()
    val buf = new Array[Byte](512)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val c = new java.util.zip.CRC32
    c.update(content)
    def w32(v: Long): Unit = (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    w32(c.getValue); w32(content.length.toLong & 0xffffffffL)
    out.toByteArray
  }

  /** Deterministic concatenated-gzip table: each row's `bytes` is 1-3
    * appended gzip members whose lengths and content come from
    * "gzlen"/"gz"/"gzc1" sha256 chains (the synthesizeZip scheme) and
    * whose OPTIONAL HEADER FIELDS cycle deterministically — FNAME
    * `g{k}_{id}` on (id+k) even, FEXTRA on (id+k) % 3 = 0, FCOMMENT on
    * % 5 = 0, FHCRC on % 4 = 0 — so every RFC 1952 header path is
    * exercised in-gate. The deflate layer is representation-transparent
    * to the oracle (the q111 property); MultimodalSpec cross-checks both
    * directions against `java.util.zip.GZIP{Input,Output}Stream`. */
  def synthesizeGzip(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      def sha(tag: String): Array[Byte] =
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"$seed:$tag:$id".getBytes("UTF-8"))
      def shaK(tag: String, k: Int): Array[Byte] =
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"$seed:$tag:$id:$k".getBytes("UTF-8"))
      val nm = 1 + (sha("gzdim")(0) & 0xff) % 3
      val out = new java.io.ByteArrayOutputStream()
      (0 until nm).foreach { k =>
        val len = 16 + (shaK("gzlen", k)(0) & 0xff) % 48
        val content = java.util.Arrays.copyOf(shaK("gz", k) ++ shaK("gzc1", k), len)
        val s = id + k
        out.write(encodeGzipMember(content,
          name = if (s % 2 == 0) Some(s"g${k}_$id") else None,
          extra = if (s % 3 == 0) Some(Array[Byte](1, 2, 3)) else None,
          comment = if (s % 5 == 0) Some("c") else None,
          headerCrc = s % 4 == 0))
      }
      MediaRow(id, "archive", out.toByteArray, MediaMeta(nm, 0, 0, "gzip", 0, 0))
    }.toDF()
  }

  /** REAL parser for POSIX ustar tar (the fourth container format, and
    * the fixed-width-OCTAL-header one): 512-byte header blocks with
    * NUL-terminated name, size as a 12-byte octal field, a checksum
    * computed over the header WITH the checksum field blanked to
    * spaces, `ustar` magic, content rounded up to 512-byte blocks, and
    * an end-of-archive marker of two zero blocks. First-principles
    * walk; validates magic and checksum per entry, parses regular
    * files (typeflag '0'/NUL) and directories ('5', size 0). `method`
    * carries the typeflag digit. */
  def decodeTar(bytes: Array[Byte]): Seq[ParsedMember] = {
    require(bytes.length >= 1024 && bytes.length % 512 == 0,
      s"not a tar stream: length ${bytes.length} is not a positive multiple of 512 (+end marker)")
    val out = Vector.newBuilder[ParsedMember]
    var p = 0
    var k = 0
    def isZeroBlock(off: Int): Boolean =
      (off until off + 512).forall(bytes(_) == 0)
    def cstr(off: Int, max: Int): String = {
      var e = off
      while (e < off + max && bytes(e) != 0) e += 1
      new String(bytes, off, e - off, java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    def octal(off: Int, max: Int): Long = {
      val s = cstr(off, max).trim
      require(s.nonEmpty && s.forall(c => c >= '0' && c <= '7'),
        s"entry $k: bad octal field '$s' at byte $off")
      java.lang.Long.parseLong(s, 8)
    }
    var ended = false
    while (!ended) {
      require(p + 512 <= bytes.length, s"entry $k: truncated header at byte $p")
      if (isZeroBlock(p)) {
        require(p + 1024 <= bytes.length && isZeroBlock(p + 512),
          "end-of-archive marker must be two zero blocks")
        ended = true
      } else {
        require(cstr(p + 257, 6) == "ustar",
          s"entry $k: missing ustar magic at byte ${p + 257}")
        // checksum: unsigned byte sum of the header with the 8-byte
        // checksum field (offset 148) treated as spaces
        var sum = 0L
        var j = 0
        while (j < 512) {
          sum += (if (j >= 148 && j < 156) 32 else bytes(p + j) & 0xff)
          j += 1
        }
        require(octal(p + 148, 8) == sum,
          s"entry $k: header checksum mismatch (${octal(p + 148, 8)} != $sum)")
        val name = cstr(p, 100)
        val size = octal(p + 124, 12)
        val tf = bytes(p + 156) & 0xff
        val typeflag = if (tf == 0) 0 else tf - '0'
        require(typeflag == 0 || typeflag == 5,
          s"entry $k: unsupported typeflag '${tf.toChar}'")
        require(typeflag != 5 || size == 0L, s"entry $k: directory with size $size")
        // bound-check in LONG arithmetic before narrowing: a 12-char
        // octal size field encodes up to 8^11 ≈ 2^33, which would wrap
        // dataBlocks negative and slip past an Int-domain overrun check
        require(size >= 0, s"entry $k: negative size $size")
        val dataBlocksL = (size + 511L) / 512L
        require(p + 512L + dataBlocksL * 512L <= bytes.length,
          s"entry $k: content of $size bytes overruns the stream")
        val dataBlocks = dataBlocksL.toInt // fits: bounded by bytes.length/512 above
        val content = java.util.Arrays.copyOfRange(bytes, p + 512,
          p + 512 + size.toInt)
        // padding to the block boundary must be zero
        var q = p + 512 + size.toInt
        while (q < p + 512 + dataBlocks * 512) {
          require(bytes(q) == 0, s"entry $k: nonzero content padding at byte $q")
          q += 1
        }
        out += ParsedMember(k, name, typeflag, size, content)
        p += 512 + dataBlocks * 512
        k += 1
      }
    }
    out.result()
  }

  /** Minimal correct ustar writer used by [[synthesizeTar]] and the
    * specs. NOT the gated artifact. */
  def encodeTarEntries(entries: Seq[(String, Int, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, typeflag, content) =>
      val h = new Array[Byte](512)
      def put(off: Int, s: String): Unit = {
        val b = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        System.arraycopy(b, 0, h, off, b.length)
      }
      put(0, name)
      put(100, "0000644"); put(108, "0000000"); put(116, "0000000")
      put(124, f"${content.length.toLong}%011o")
      put(136, "00000000000") // mtime 0: determinism
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      h(156) = ('0' + typeflag).toByte
      put(257, "ustar"); h(262) = 0; put(263, "00")
      var sum = 0L
      (0 until 512).foreach(j => sum += h(j) & 0xff)
      put(148, f"$sum%06o"); h(154) = 0; h(155) = ' '.toByte
      out.write(h)
      out.write(content)
      val pad = (512 - content.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  /** Deterministic tar table: 1-3 entries per row from the synthesizeZip
    * sha-chain scheme ("tlen"/"tc"/"tc1"); every (id+k) % 4 = 0 entry is
    * a DIRECTORY (typeflag 5, empty content) so the zero-size path and
    * the block-rounding path both stay in-gate; names carry a slash to
    * exercise full-path fields. */
  def synthesizeTar(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      def shaK(tag: String, k: Int): Array[Byte] =
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"$seed:$tag:$id:$k".getBytes("UTF-8"))
      def sha(tag: String): Array[Byte] =
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"$seed:$tag:$id".getBytes("UTF-8"))
      val nm = 1 + (sha("tdim")(0) & 0xff) % 3
      val entries = (0 until nm).map { k =>
        val s = id + k
        if (s % 4 == 0) (s"d$k/", 5, Array.emptyByteArray)
        else {
          val len = 16 + (shaK("tlen", k)(0) & 0xff) % 48
          (s"d$k/f_$id", 0,
            java.util.Arrays.copyOf(shaK("tc", k) ++ shaK("tc1", k), len))
        }
      }
      MediaRow(id, "archive", encodeTarEntries(entries),
        MediaMeta(nm, 0, 0, "tar", 0, 0))
    }.toDF()
  }

  /** WARC-Type codes for [[decodeWarc]]'s `method` lane, in spec order
    * (ISO 28500 §6). Unknown types fail loudly — a crawl shard with a
    * type outside the standard is corrupt, not "other". */
  private val WarcTypes = Vector("warcinfo", "response", "resource",
    "request", "metadata", "revisit", "conversion", "continuation")

  /** REAL parser for WARC (ISO 28500, the web-archive format every
    * public crawl ships as) — the third container format behind the
    * codec seam, and unlike ZIP/gzip a TEXT-header format: each record
    * is `WARC/1.x\r\n`, header lines `Name: value\r\n` (names
    * case-insensitive), a blank line, exactly Content-Length block
    * bytes, and a `\r\n\r\n` terminator. First-principles walk:
    *
    *  - version line must be WARC/1.0 or WARC/1.1;
    *  - header names are case-insensitively matched, values trimmed of
    *    optional leading space; unknown headers are skipped (the spec
    *    allows extension fields), but a line without a colon fails;
    *  - Content-Length and WARC-Type are REQUIRED (per the standard);
    *    the type must be one of the eight §6 record types;
    *  - the block is length-delimited by Content-Length — never scanned
    *    for separators, so payloads containing `WARC/1.0` survive;
    *  - the two-CRLF record terminator is verified byte-exactly.
    *
    * Member name = WARC-Target-URI ("" when absent, e.g. warcinfo);
    * method = the type's index in [[WarcTypes]]. */
  def decodeWarc(bytes: Array[Byte]): Seq[ParsedMember] = {
    val out = Vector.newBuilder[ParsedMember]
    var p = 0
    var k = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < bytes.length &&
        !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      require(i + 1 < bytes.length, s"unterminated WARC header line at byte $from")
      i
    }
    require(bytes.length >= 10, "not a WARC stream: too short")
    while (p < bytes.length) {
      val ve = lineEnd(p)
      val version = new String(bytes, p, ve - p,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      require(version == "WARC/1.0" || version == "WARC/1.1",
        s"record $k: bad WARC version line '$version'")
      p = ve + 2
      var len = -1L
      var wtype = ""
      var uri = ""
      var done = false
      while (!done) {
        val he = lineEnd(p)
        if (he == p) { done = true; p += 2 }
        else {
          val line = new String(bytes, p, he - p,
            java.nio.charset.StandardCharsets.ISO_8859_1)
          val colon = line.indexOf(':')
          require(colon > 0, s"record $k: malformed header '$line'")
          val name = line.substring(0, colon).toLowerCase
          val value = line.substring(colon + 1).trim
          name match {
            case "content-length" => len = value.toLong
            case "warc-type" => wtype = value
            case "warc-target-uri" => uri = value
            case _ => () // extension/irrelevant headers skip per spec
          }
          p = he + 2
        }
      }
      require(len >= 0, s"record $k: missing Content-Length")
      val method = WarcTypes.indexOf(wtype)
      require(method >= 0, s"record $k: missing or unknown WARC-Type '$wtype'")
      require(p + len + 4 <= bytes.length,
        s"record $k: block of $len bytes overruns the stream")
      val content = java.util.Arrays.copyOfRange(bytes, p, p + len.toInt)
      p += len.toInt
      require(bytes(p) == '\r' && bytes(p + 1) == '\n' &&
        bytes(p + 2) == '\r' && bytes(p + 3) == '\n',
        s"record $k: missing two-CRLF record terminator")
      p += 4
      out += ParsedMember(k, uri, method, len, content)
      k += 1
    }
    out.result()
  }

  /** Minimal correct WARC writer used by [[synthesizeWarc]] and the
    * specs. NOT the gated artifact. */
  def encodeWarcRecord(wtype: String, uri: Option[String],
                       content: Array[Byte],
                       version: String = "WARC/1.0",
                       extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val sb = new StringBuilder
    sb.append(version).append("\r\n")
    sb.append("WARC-Type: ").append(wtype).append("\r\n")
    extraHeaders.foreach { case (n, v) =>
      sb.append(n).append(": ").append(v).append("\r\n") }
    uri.foreach(u => sb.append("WARC-Target-URI: ").append(u).append("\r\n"))
    sb.append("Content-Length: ").append(content.length).append("\r\n\r\n")
    val head = sb.result().getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val outArr = new Array[Byte](head.length + content.length + 4)
    System.arraycopy(head, 0, outArr, 0, head.length)
    System.arraycopy(content, 0, outArr, head.length, content.length)
    outArr(outArr.length - 4) = '\r'; outArr(outArr.length - 3) = '\n'
    outArr(outArr.length - 2) = '\r'; outArr(outArr.length - 1) = '\n'
    outArr
  }

  /** Deterministic WARC shard table: each row is 1-3 records whose block
    * lengths/content come from "wlen"/"wc"/"wc1" sha256 chains (the
    * synthesizeZip scheme). Header paths exercised in-gate: both WARC/1.0
    * and /1.1 version lines ((id+k) parity), a skippable extension header
    * on (id+k) % 3 = 0, LOWERCASE header names on (id+k) % 4 = 0 (the
    * case-insensitivity contract), target URI absent on (id+k) % 5 = 0,
    * and the type cycling response/request/metadata. Block content is
    * raw bytes that may well contain "WARC/1.0" — the parser must be
    * length-delimited, never separator-scanned. */
  def synthesizeWarc(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      def shaK(tag: String, k: Int): Array[Byte] =
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"$seed:$tag:$id:$k".getBytes("UTF-8"))
      def sha(tag: String): Array[Byte] =
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"$seed:$tag:$id".getBytes("UTF-8"))
      val nm = 1 + (sha("wdim")(0) & 0xff) % 3
      val out = new java.io.ByteArrayOutputStream()
      (0 until nm).foreach { k =>
        val len = 16 + (shaK("wlen", k)(0) & 0xff) % 48
        val content = java.util.Arrays.copyOf(shaK("wc", k) ++ shaK("wc1", k), len)
        val s = id + k
        val wtype = Vector("response", "request", "metadata")((s % 3).toInt)
        val rec = encodeWarcRecord(
          wtype,
          uri = if (s % 5 == 0) None else Some(s"http://w$k.example/$id"),
          content = content,
          version = if (s % 2 == 0) "WARC/1.0" else "WARC/1.1",
          extraHeaders =
            (if (s % 3 == 0) Seq("X-Crawler-Shard" -> s"$id") else Nil) ++
            Seq("WARC-Date" -> "2026-08-15T00:00:00Z"))
        // lowercase the header NAMES on the case-insensitivity lane
        val bytesOut = if (s % 4 == 0) {
          val str = new String(rec, java.nio.charset.StandardCharsets.ISO_8859_1)
          val headEnd = str.indexOf("\r\n\r\n") + 2
          val lowered = str.substring(0, headEnd).linesWithSeparators.map { ln =>
            val c = ln.indexOf(':')
            if (c > 0) ln.substring(0, c).toLowerCase + ln.substring(c) else ln
          }.mkString
          lowered.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
            rec.drop(headEnd)
        } else rec
        out.write(bytesOut)
      }
      MediaRow(id, "archive", out.toByteArray, MediaMeta(nm, 0, 0, "warc", 0, 0))
    }.toDF()
  }

  /** Per-partition feature extraction: Dataset[MediaRow] → features.
    * One shuffle-free map stage; bytes are dropped on the spot.
    *
    * `codec` is the real-implementation seam: a serializable
    * bytes→features function (an actual image/audio decoder in a
    * container that has one; the deterministic [[decodeStub]] here).
    * Whatever is injected runs inside the same mapPartitions batch
    * boundary — one iterator pass per partition, codec invoked exactly
    * once per row — so swapping the stub for a real codec changes no
    * plan shape (MultimodalSpec proves the contract with an injected
    * counting codec). */
  def extractFeatures(media: DataFrame,
                      codec: Array[Byte] => Array[Float] = decodeStub)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map(m => MediaFeatures(m.media_id, m.kind, codec(m.bytes)))
    }
  }

  /** STUB resize for formats with no in-container decoder: truncates/pads
    * bytes to the target "resolution" and rewrites meta — schema and
    * partition behavior identical to the real operator ([[resizeBmp]] is
    * the real one, gated end-to-end by q173). */
  def resizeStub(media: DataFrame, width: Int, height: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val target = math.max(width * height / 64, 16)
        val nb = java.util.Arrays.copyOf(m.bytes, target)
        MediaRow(m.media_id, m.kind, nb,
          m.meta.copy(width = width, height = height))
      }
    }.toDF()
  }

  /** STUB frame sampling for video rows with no in-container decoder:
    * emits one frame row per `everyMs` of duration (a Generator-shaped
    * expansion, like C6's explode but for media — [[frameSample]] is the
    * real one over animated GIF, gated end-to-end by q174). */
  def frameSampleStub(media: DataFrame, everyMs: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].filter(_.kind == "video").flatMap { m =>
      val nFrames = math.max(m.meta.duration_ms / everyMs, 1)
      (0 until nFrames).map { f =>
        val start = (f * 7) % math.max(m.bytes.length - 8, 1)
        Frame(m.media_id, f, java.util.Arrays.copyOfRange(m.bytes, start, start + 8))
      }
    }
  }

  /** Meta-only pruning filter exemplar: selects ids by metadata without
    * deserializing bytes (column pruning drops the binary column). */
  def filterByMeta(media: DataFrame, minWidth: Int): DataFrame =
    media.filter(col("kind") === "image" && col("meta.width") >= minWidth)
      .select(col("media_id"), col("meta.width").as("width"),
        col("meta.height").as("height"))

  /** Embedding-style near-dup over media: extract features, then reuse
    * the vector dedup machinery — bytes never reach the join.
    *
    * The near-dup plan references the vector side three times (band
    * signatures + one exact-rescore join per pair side). For generic
    * embeddings a re-scan per branch is fine, but here each reference
    * would re-run the codec over every media file — the dominant cost at
    * scale. Materialize the decoded features once instead: at ~36 B/row
    * the feature table is orders of magnitude smaller than the media it
    * came from, so checkpointing it is the right 100 TB trade.
    *
    * NOTE: the localCheckpoint is EAGER — calling this runs the full
    * decode job immediately (not at first downstream action) and pins
    * the feature blocks to the executors that computed them
    * (non-reliable storage: a decommissioned executor loses its blocks
    * and the truncated lineage cannot recompute them). Callers composing
    * lazy plans, or running under executor decommissioning, should
    * extract features themselves and manage materialization — the
    * same opt-out contract as incrementalDupPairs' persistBatch. */
  def mediaNearDupPairs(media: DataFrame, threshold: Double = 0.999,
                        codec: Array[Byte] => Array[Float] = decodeStub)
      : DataFrame = {
    val feats = extractFeatures(media, codec).toDF()
      .withColumnRenamed("features", "embedding")
      .localCheckpoint()
    Similarity.embeddingNearDupPairs(
      feats, "media_id", "embedding", threshold, bands = 4, bitsPerBand = 4, dim = 8)
  }

  final case class DhashBands(media_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  /** Difference perceptual hash (dHash) from a PARSED 24-bit BMP — the
    * image analog of SimHash: visually-identical-up-to-small-edits
    * images land within a small Hamming distance, so image near-dup
    * becomes the engine's standard banded-Hamming problem (q28's
    * pigeonhole machinery). Integer-exact by construction so the whole
    * hash replays in ANSI SQL (q118's gate):
    *
    *   - gray cell (x, y), x < w/2: Σ over the cell's 2 pixels of
    *     (r + g + b) — an integer sum, no luma weighting, no division;
    *   - bit k = y·(w/2 − 1) + x set iff cell(x+1, y) > cell(x, y);
    *   - the 64 bits pack into FOUR 16-BIT BAND VALUES (bit k goes to
    *     band k div 16 at position k mod 16) — the banded join keys AND
    *     the hash representation are the same integers, and no signed
    *     64-bit overflow case exists for a SQL replay to trip on.
    *
    * Requires an even width with (w/2 − 1) · h = 64 (the synthesized
    * q118 corpus is 18×8). Full header parse shared with [[decodeBmp]]'s
    * contract: magic, 24 bpp, BI_RGB, stride padding, bottom-up rows. */
  def dhashBmpBands(bytes: Array[Byte]): Array[Int] = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP: bad magic/length")
    def le32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def le16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    val pixelOff = le32(10)
    val w = le32(18)
    val hRaw = le32(22)
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    require(le16(28) == 24, s"unsupported bit depth ${le16(28)} (want 24)")
    require(le32(30) == 0, "compressed BMP unsupported")
    require(w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20),
      s"implausible BMP dimensions ${w}x$hRaw")
    require(pixelOff >= 54, s"pixel offset $pixelOff inside header")
    val strideL = ((3L * w + 3) / 4) * 4
    require(bytes.length.toLong >= pixelOff.toLong + strideL * h,
      "truncated pixel array")
    val stride = strideL.toInt
    val gcols = w / 2
    require(w % 2 == 0 && gcols >= 2 && (gcols - 1) * h == 64,
      s"dhash grid needs even w with (w/2-1)*h = 64, got ${w}x$h")
    val cells = Array.ofDim[Int](gcols, h)
    var y = 0
    while (y < h) {
      val row = if (bottomUp) h - 1 - y else y
      val base = pixelOff + row * stride
      var x = 0
      while (x < w) {
        val px = bytes(base + 3 * x) & 0xff
        val pg = bytes(base + 3 * x + 1) & 0xff
        val pr = bytes(base + 3 * x + 2) & 0xff
        cells(x / 2)(y) += px + pg + pr
        x += 1
      }
      y += 1
    }
    val bands = new Array[Int](4)
    var k = 0
    y = 0
    while (y < h) {
      var x = 0
      while (x < gcols - 1) {
        if (cells(x + 1)(y) > cells(x)(y))
          bands(k / 16) |= 1 << (k % 16)
        k += 1
        x += 1
      }
      y += 1
    }
    bands
  }

  /** The dHash of every image through the same mapPartitions batch seam
    * as [[extractFeatures]] — bytes are decoded exactly once and only
    * the 4 band ints travel on. */
  def dhashBands(media: DataFrame,
                 codec: Array[Byte] => Array[Int] = dhashBmpBands)
      : Dataset[DhashBands] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val b = codec(m.bytes)
        DhashBands(m.media_id, b(0), b(1), b(2), b(3))
      }
    }
  }

  /** Banded-Hamming near-dup pairs over dHash band values: candidates
    * collide on at least one exact 16-bit band (the SimHash pigeonhole —
    * any pair within Hamming 3 is guaranteed a shared band; 4–6 may or
    * may not collide, and the oracle replays exactly this contract),
    * then verify Hamming ≤ `maxHamming` via xor + bit_count. The band
    * explode carries only (media_id, band_idx, band_val) — 16 bytes per
    * row — and the verify joins are on ids against the 4-int hash
    * table, so image bytes never reach any exchange. */
  def dhashNearDupPairs(hashes: DataFrame, maxHamming: Int = 6): DataFrame = {
    val b = hashes.select(col("media_id"),
        posexplode(array((0 until 4).map(j => col(s"b$j")): _*)))
      .toDF("media_id", "band_idx", "band_val")
    val cand = b.alias("x").join(b.alias("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("a"), col("y.media_id").as("b"))
      .distinct()
    val left = hashes.select(col("media_id").as("a"),
      col("b0").as("a0"), col("b1").as("a1"),
      col("b2").as("a2"), col("b3").as("a3"))
    val right = hashes.select(col("media_id").as("b"),
      col("b0").as("c0"), col("b1").as("c1"),
      col("b2").as("c2"), col("b3").as("c3"))
    cand.join(left, "a").join(right, "b")
      .withColumn("hd", expr(
        "bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + " +
          "bit_count(a2 ^ c2) + bit_count(a3 ^ c3)"))
      .filter(col("hd") <= maxHamming)
      .select(col("a"), col("b"), col("hd").cast("int").as("hd"))
  }

  /** Deterministic genuine-BMP corpus for perceptual near-dup: images
    * come in GROUPS — all members of a group share one sha256 pixel
    * chain, and each image additionally overwrites TWO pixel-array bytes
    * at sha-derived positions with sha-derived values. Within a group,
    * images therefore differ in ≤ 4 bytes (≤ 4 grid cells → small
    * Hamming distance between dHashes); across groups the chains are
    * independent (Hamming ≈ 32). Perturbation offsets range over the
    * whole stride-padded array, so some land on padding bytes —
    * invisible to decode on BOTH sides of the gate by construction.
    * Fixed 18×8 geometry: stride 56 (2 pad bytes/row exercised), 448
    * pixel-array bytes = 14 sha chunks, dHash grid 9×8 → 64 bits.
    * Row id i belongs to group i mod nGroups, so media-id order
    * interleaves groups. */
  def synthesizeDhashBmp(spark: SparkSession, nGroups: Int, perGroup: Int,
                         seed: Long = 42L): DataFrame = {
    val i = col("id")
    val g = (i % nGroups).cast("long")
    def shaG(tag: Column): Column =
      sha2(concat(lit(seed.toString + ":g"), g.cast("string"), lit(":dh:"), tag), 256)
    def shaI(tag: String): Column =
      sha2(concat(lit(seed.toString + ":i"), i.cast("string"), lit(s":$tag")), 256)
    def hexByte(h: Column, pos: Int): Column =
      conv(substring(h, pos, 2), 16, 10).cast("int")
    def leHex(v: Column, nBytes: Int): Column = {
      val be = lpad(lower(conv(v.cast("string"), 10, 16)), nBytes * 2, "0")
      concat((nBytes - 1 to 0 by -1).map(k => substring(be, 2 * k + 1, 2)): _*)
    }
    val w = lit(18); val h = lit(8)
    val pixBytes = lit(448) // stride 56 * 8 rows
    val headerHex = concat(
      lit("424d"), leHex(pixBytes + 54, 4), lit("00000000"),
      lit("36000000"), lit("28000000"),
      leHex(w, 4), leHex(h, 4),
      lit("0100"), lit("1800"), lit("00000000"),
      leHex(pixBytes, 4),
      lit("130b0000"), lit("130b0000"), lit("00000000"), lit("00000000"))
    val chainHex = concat((0 until 14).map(k => shaG(lit(k.toString))): _*)
    val posH = shaI("pos")
    val p0 = (hexByte(posH, 1) * 256 + hexByte(posH, 3)) % 448
    val p1 = (hexByte(posH, 5) * 256 + hexByte(posH, 7)) % 448
    val pbH = shaI("pb")
    // p0 spliced first, p1 second: on a p0 == p1 collision the p1 value
    // wins — the oracle's CASE tests p1 first to match
    val pixelHex = overlay(
      overlay(chainHex, substring(pbH, 1, 2), p0 * 2 + 1, lit(2)),
      substring(pbH, 3, 2), p1 * 2 + 1, lit(2))
    val meta = struct(
      w.cast("int").as("width"), h.cast("int").as("height"),
      lit(3).cast("int").as("channels"), lit("bmp").as("format"),
      lit(0).cast("int").as("duration_ms"), lit(0).cast("int").as("sample_rate"))
    spark.range((nGroups * perGroup).toLong)
      .select(i.as("media_id"), lit("image").as("kind"),
        unhex(concat(headerHex, pixelHex)).as("bytes"), meta.as("meta"))
  }
}
