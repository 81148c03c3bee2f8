package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Multimodal.{MediaMeta, MediaRow}

/** Baseline JPEG (ITU T.81 sequential DCT, Huffman entropy coding)
  * through the [[Multimodal.extractFeatures]] codec seam — the one
  * famous raster format absent from the BMP/WAV/PNG/GIF/QOI family,
  * implemented from first principles with zero external libraries
  * (reference behavior: the media feature-extraction seam the reference
  * pipeline stubs around its payloads, staging-transform.py:44-120; the
  * codec itself is public T.81/JFIF knowledge).
  *
  * [[decodeJpeg]] is a GENERAL baseline decoder: full marker walk
  * (APPn/COM skipped, unknown-but-lengthed markers skipped loudly-safe),
  * multi-table DQT, canonical-Huffman DHT (tables read from the FILE,
  * not assumed), SOF0 with per-component sampling factors up to 2×2
  * (4:4:4, 4:2:2, 4:2:0 and grayscale all decode), DRI/RSTn restart
  * handling with predictor reset and marker-sequence validation,
  * 0xFF00 byte unstuffing, dequantization in zigzag order, separable
  * double-precision IDCT, nearest-neighbor (sample replication)
  * chroma upsampling, and the libjpeg fixed-point YCbCr→RGB transform
  * (integer shifts — exactly replayable by a SQL engine). Non-baseline
  * inputs (progressive SOF2, 12-bit precision, 16-bit quant tables,
  * arithmetic coding, >2 sampling factors) fail with a loud
  * "unsupported" message; corrupt structure fails with "corrupt".
  *
  * [[synthesizeJpeg]] emits standards-valid JFIF files whose DECODED
  * pixels are EXACT — the q111/q112 round-trip-transparency property,
  * extended to a lossy format by construction: every 8×8 block carries
  * only the four DCT basis functions whose sampled cosines are ±1 or
  * ±1/√2 — (0,0), (4,0), (0,4), (4,4) — so the IDCT output is an exact
  * integer lattice (pixel = base + a·s(x) + b·s(y) + c·s(x)s(y) with
  * s = +1 on {0,3,4,7}, −1 elsewhere) and quantization at step 8
  * divides the coefficients exactly. Lossy-format encode becomes
  * lossless on this sub-lattice, so the q171 oracle replays the pixel
  * formula in SQL and any Huffman, zigzag, dequant, IDCT, upsample, or
  * color-convert mistake desyncs the integer feature sums. The entropy
  * layer is exercised for real: DC diffs up to ±192 (8-bit magnitudes),
  * AC runs of 9/3/24 zeros (the 24 forces ZRL), restart intervals on
  * two thirds of the corpus, and 4:2:0 MCU interleave with ragged
  * right/bottom edges (w, h ∈ 9..22 — MCU-padded, decoder-cropped). */
object Jpeg {

  // ---- shared tables -------------------------------------------------

  /** Zigzag scan: entry k is the row-major position (v*8+u) of the k-th
    * coefficient in scan order (T.81 figure A.6, built by walking the
    * diagonals rather than transcribed). */
  private[operators] val ZigZag: Array[Int] = {
    val out = new Array[Int](64)
    var r = 0; var c = 0
    var k = 0
    while (k < 64) {
      out(k) = r * 8 + c
      if ((r + c) % 2 == 0) {
        if (c == 7) r += 1 else if (r == 0) c += 1 else { r -= 1; c += 1 }
      } else {
        if (r == 7) c += 1 else if (c == 0) r += 1 else { r += 1; c -= 1 }
      }
      k += 1
    }
    out
  }

  private def hexBytes(s: String): Array[Byte] = {
    val clean = s.replaceAll("\\s", "")
    Array.tabulate(clean.length / 2)(i =>
      Integer.parseInt(clean.substring(2 * i, 2 * i + 2), 16).toByte)
  }

  // T.81 Annex K.3 typical Huffman tables (public spec data). The
  // decoder does NOT use these — it builds tables from the file's DHT —
  // so the gate would catch a transcription slip two ways (our decode
  // and ImageIO both read the emitted DHT, and the emitted table only
  // needs to be a VALID canonical code covering the emitted symbols).
  private val DcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcVals: Array[Byte] = Array.tabulate(12)(_.toByte)
  private val AcLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcLumaVals: Array[Byte] = hexBytes(
    """01 02 03 00 04 11 05 12 21 31 41 06 13 51 61 07 22 71 14 32 81 91
      |a1 08 23 42 b1 c1 15 52 d1 f0 24 33 62 72 82 09 0a 16 17 18 19 1a
      |25 26 27 28 29 2a 34 35 36 37 38 39 3a 43 44 45 46 47 48 49 4a 53
      |54 55 56 57 58 59 5a 63 64 65 66 67 68 69 6a 73 74 75 76 77 78 79
      |7a 83 84 85 86 87 88 89 8a 92 93 94 95 96 97 98 99 9a a2 a3 a4 a5
      |a6 a7 a8 a9 aa b2 b3 b4 b5 b6 b7 b8 b9 ba c2 c3 c4 c5 c6 c7 c8 c9
      |ca d2 d3 d4 d5 d6 d7 d8 d9 da e1 e2 e3 e4 e5 e6 e7 e8 e9 ea f1 f2
      |f3 f4 f5 f6 f7 f8 f9 fa""".stripMargin)
  private val AcChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119)
  private val AcChromaVals: Array[Byte] = hexBytes(
    """00 01 02 03 11 04 05 21 31 06 12 41 51 07 61 71 13 22 32 81 08 14
      |42 91 a1 b1 c1 09 23 33 52 f0 15 62 72 d1 0a 16 24 34 e1 25 f1 17
      |18 19 1a 26 27 28 29 2a 35 36 37 38 39 3a 43 44 45 46 47 48 49 4a
      |53 54 55 56 57 58 59 5a 63 64 65 66 67 68 69 6a 73 74 75 76 77 78
      |79 7a 82 83 84 85 86 87 88 89 8a 92 93 94 95 96 97 98 99 9a a2 a3
      |a4 a5 a6 a7 a8 a9 aa b2 b3 b4 b5 b6 b7 b8 b9 ba c2 c3 c4 c5 c6 c7
      |c8 c9 ca d2 d3 d4 d5 d6 d7 d8 d9 da e2 e3 e4 e5 e6 e7 e8 e9 ea f2
      |f3 f4 f5 f6 f7 f8 f9 fa""".stripMargin)

  /** cos((2i+1)·j·π/16) for the separable (I)DCT. */
  private val CosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((i, j) => math.cos((2 * i + 1) * j * math.Pi / 16))
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  // ---- decoder -------------------------------------------------------

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0

    /** Next entropy-coded bit; 0xFF00 unstuffed, any other marker inside
      * coded data is corrupt (RSTn are consumed explicitly, not here). */
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < bytes.length, "corrupt JPEG: entropy data truncated")
        var b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "corrupt JPEG: dangling 0xFF")
          val m = bytes(pos) & 0xff; pos += 1
          require(m == 0x00,
            f"corrupt JPEG: unexpected marker FF$m%02X inside entropy data")
          b = 0xff
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }

    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Byte-align and consume an expected RSTn marker. */
    def restart(expected: Int): Unit = {
      nbits = 0
      require(pos + 2 <= bytes.length, "corrupt JPEG: truncated at restart")
      val a = bytes(pos) & 0xff; val b = bytes(pos + 1) & 0xff
      require(a == 0xff && b == 0xd0 + expected,
        f"corrupt JPEG: expected RST$expected, found $a%02X$b%02X")
      pos += 2
    }
  }

  /** Canonical Huffman decode table built from a DHT segment (T.81
    * F.2.2.3 minCode/maxCode/valPtr form). */
  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    private val firstCode = new Array[Int](17)
    private val count = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var len = 1
      while (len <= 16) {
        firstCode(len) = code; valPtr(len) = k; count(len) = bits(len - 1)
        code += bits(len - 1); k += bits(len - 1)
        code <<= 1
        len += 1
      }
      require(k == vals.length, "corrupt JPEG: DHT count/value mismatch")
    }
    def decode(br: BitReader): Int = {
      var code = 0
      var len = 1
      while (len <= 16) {
        code = (code << 1) | br.bit()
        if (code - firstCode(len) < count(len))
          return vals(valPtr(len) + code - firstCode(len)) & 0xff
        len += 1
      }
      throw new IllegalArgumentException("corrupt JPEG: invalid Huffman code")
    }
  }

  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  /** Separable double IDCT of a dequantized row-major (v*8+u) block;
    * output pixels level-shifted (+128), rounded, clamped to [0,255]. */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) InvSqrt2 else 1.0
          s += cu * coef(v * 8 + u) * CosT(x)(u)
          u += 1
        }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) {
          val cv = if (vv == 0) InvSqrt2 else 1.0
          s += cv * tmp(vv * 8 + x) * CosT(y)(vv)
          vv += 1
        }
        val p = math.round(0.25 * s).toInt + 128
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable: HuffTable = _
    var acTable: HuffTable = _
    var plane: Array[Int] = _ // blocksWide*8 × blocksHigh*8 samples
    var blocksWide: Int = 0
    var pred: Int = 0
  }

  /** Full baseline decode to (width, height, packed 0xRRGGBB pixels)
    * (grayscale: R=G=B=Y) — the pixel-level seam [[decodeJpeg]]'s
    * feature lanes and [[Avi.frameDhash]]'s perceptual hash both
    * read. */
  def decodeJpegRgb(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "not a JPEG: missing SOI")
    def u16(off: Int): Int =
      ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = -1; var h = -1
    var restartInterval = 0
    var pos = 2
    var scanStart = -1

    while (scanStart < 0) {
      require(pos + 2 <= bytes.length, "corrupt JPEG: truncated before SOS")
      require((bytes(pos) & 0xff) == 0xff,
        f"corrupt JPEG: expected marker, found ${bytes(pos) & 0xff}%02X")
      // optional fill bytes: any number of 0xFF before the marker code
      while (pos < bytes.length && (bytes(pos) & 0xff) == 0xff) pos += 1
      require(pos < bytes.length, "corrupt JPEG: truncated marker")
      val marker = bytes(pos) & 0xff; pos += 1
      marker match {
        case 0xd9 => throw new IllegalArgumentException(
          "corrupt JPEG: EOI before any scan")
        case 0xc4 => // DHT, possibly several tables in one segment
          val len = u16(pos); val end = pos + len
          require(end <= bytes.length, "corrupt JPEG: truncated DHT")
          var p = pos + 2
          while (p < end) {
            val tc = (bytes(p) & 0xf0) >> 4
            val th = bytes(p) & 0x0f
            require(tc <= 1, s"unsupported JPEG: Huffman table class $tc " +
              "(arithmetic coding conditioning?)")
            require(th <= 3, s"corrupt JPEG: Huffman table id $th")
            val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
            val n = bits.sum
            require(p + 17 + n <= end, "corrupt JPEG: truncated DHT values")
            val vals = java.util.Arrays.copyOfRange(bytes, p + 17, p + 17 + n)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            p += 17 + n
          }
          pos = end
        case 0xdb => // DQT, possibly several tables
          val len = u16(pos); val end = pos + len
          require(end <= bytes.length, "corrupt JPEG: truncated DQT")
          var p = pos + 2
          while (p < end) {
            val pq = (bytes(p) & 0xf0) >> 4
            val tq = bytes(p) & 0x0f
            require(pq == 0, "unsupported JPEG: 16-bit quantization table")
            require(tq <= 3, s"corrupt JPEG: quant table id $tq")
            require(p + 65 <= end, "corrupt JPEG: truncated DQT entries")
            quant(tq) = Array.tabulate(64)(i => bytes(p + 1 + i) & 0xff)
            p += 65
          }
          pos = end
        case 0xc0 | 0xc1 => // SOF0 baseline (C1 extended-sequential, same wire shape)
          val len = u16(pos)
          require(pos + len <= bytes.length, "corrupt JPEG: truncated SOF")
          require((bytes(pos + 2) & 0xff) == 8,
            s"unsupported JPEG: ${bytes(pos + 2) & 0xff}-bit precision")
          h = u16(pos + 3); w = u16(pos + 5)
          require(w > 0 && h > 0, "corrupt JPEG: zero dimension")
          val nc = bytes(pos + 7) & 0xff
          require(nc == 1 || nc == 3,
            s"unsupported JPEG: $nc components (CMYK?)")
          comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val cid = bytes(o) & 0xff
            val hv = bytes(o + 1) & 0xff
            val ch = (hv & 0xf0) >> 4; val cv = hv & 0x0f
            require(ch >= 1 && ch <= 2 && cv >= 1 && cv <= 2,
              s"unsupported JPEG: sampling ${ch}x$cv for component $cid")
            Component(cid, ch, cv, bytes(o + 2) & 0x0f)
          }
          pos += len
        case 0xc2 => throw new IllegalArgumentException(
          "unsupported JPEG: progressive (SOF2); baseline only")
        case m if m >= 0xc3 && m <= 0xcf && m != 0xc4 && m != 0xc8 =>
          throw new IllegalArgumentException(
            f"unsupported JPEG: SOF marker FF$m%02X; baseline only")
        case 0xdd => // DRI
          require(u16(pos) == 4, "corrupt JPEG: bad DRI length")
          restartInterval = u16(pos + 2)
          pos += 4
        case 0xda => // SOS
          require(comps != null, "corrupt JPEG: SOS before SOF")
          val len = u16(pos)
          val ns = bytes(pos + 2) & 0xff
          require(ns == comps.length,
            "unsupported JPEG: partial-component scan (progressive?)")
          var i = 0
          while (i < ns) {
            val cid = bytes(pos + 3 + 2 * i) & 0xff
            val tt = bytes(pos + 4 + 2 * i) & 0xff
            val c = comps.find(_.id == cid).getOrElse(
              throw new IllegalArgumentException(
                s"corrupt JPEG: scan references unknown component $cid"))
            c.dcTable = dcTables((tt & 0xf0) >> 4)
            c.acTable = acTables(tt & 0x0f)
            require(c.dcTable != null && c.acTable != null,
              s"corrupt JPEG: scan uses undefined Huffman table $tt%02X")
            i += 1
          }
          scanStart = pos + len
        case m if m >= 0xe0 && m <= 0xef => pos += u16(pos) // APPn
        case 0xfe => pos += u16(pos) // COM
        case 0x01 => () // TEM, no payload
        case m =>
          throw new IllegalArgumentException(
            f"corrupt JPEG: unexpected marker FF$m%02X before scan")
      }
    }

    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    comps.foreach { c =>
      c.blocksWide = mcusX * c.h
      c.plane = new Array[Int](mcusX * c.h * 8 * mcusY * c.v * 8)
      require(quant(c.tq) != null,
        s"corrupt JPEG: component ${c.id} uses undefined quant table ${c.tq}")
    }

    val br = new BitReader(bytes, scanStart)
    val coef = new Array[Int](64)
    val pix = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart((mcu / restartInterval - 1) % 8)
        comps.foreach(_.pred = 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      comps.foreach { c =>
        val qt = quant(c.tq)
        var b = 0
        while (b < c.h * c.v) {
          java.util.Arrays.fill(coef, 0)
          val dcSize = c.dcTable.decode(br)
          require(dcSize <= 11, s"corrupt JPEG: DC size $dcSize")
          c.pred += extend(br.receive(dcSize), dcSize)
          coef(0) = c.pred * qt(0)
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val sym = c.acTable.decode(br)
            if (sym == 0x00) eob = true
            else if (sym == 0xf0) { k += 16 }
            else {
              k += sym >> 4
              require(k < 64, "corrupt JPEG: AC run past block end")
              val size = sym & 0x0f
              coef(ZigZag(k)) = extend(br.receive(size), size) * qt(k)
              k += 1
            }
          }
          idct(coef, pix)
          // place block b of this MCU into the component plane
          val bx = (mx * c.h + b % c.h) * 8
          val by = (my * c.v + b / c.h) * 8
          val planeW = c.blocksWide * 8
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              c.plane((by + yy) * planeW + bx + xx) = pix(yy * 8 + xx)
              xx += 1
            }
            yy += 1
          }
          b += 1
        }
      }
      mcu += 1
    }

    // visible pixels: upsample by replication, then the libjpeg
    // fixed-point YCbCr→RGB (exact integer shifts), packed 0xRRGGBB
    val rgb = new Array[Int](w * h)
    def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    val yC = comps(0)
    val yPlaneW = yC.blocksWide * 8
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val yv = yC.plane((y * yC.v / maxV) * yPlaneW + (x * yC.h / maxH))
        var r = yv; var g = yv; var b = yv
        if (comps.length == 3) {
          val cbC = comps(1); val crC = comps(2)
          val cb = cbC.plane((y * cbC.v / maxV) * (cbC.blocksWide * 8) +
            (x * cbC.h / maxH)) - 128
          val cr = crC.plane((y * crC.v / maxV) * (crC.blocksWide * 8) +
            (x * crC.h / maxH)) - 128
          r = clamp(yv + ((91881 * cr + 32768) >> 16))
          g = clamp(yv - ((22554 * cb + 46802 * cr + 32768) >> 16))
          b = clamp(yv + ((116130 * cb + 32768) >> 16))
        }
        rgb(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  /** [[decodeJpegRgb]] → [[Multimodal.decodeBmp]]'s 8 integer-exact
    * feature lanes over the decoded RGB pixels. The accumulators stay
    * < 2^24 for the dimensions this library's media tables carry, so
    * the float lanes are exact and the q171 oracle replays them from
    * the generation formula. */
  def decodeJpeg(bytes: Array[Byte]): Array[Float] = {
    val (w, h, rgb) = decodeJpegRgb(bytes)
    val acc = new Array[Long](6)
    var rGtG = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = rgb(y * w + x)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
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

  // ---- encoder (synthesis only) ---------------------------------------

  /** symbol → (code, length) canonical assignment (encoder side). */
  private def buildCodes(bits: Array[Int], vals: Array[Byte]): Array[Int] = {
    // packed (length << 16) | code, indexed by symbol; 0 = absent
    val out = new Array[Int](256)
    var code = 0; var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out(vals(k) & 0xff) = (len << 16) | code
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out
  }

  private final class BitWriter {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flushPad(): Unit = while (nbits != 0) put(1, 1) // pad with 1s
  }

  private def fdct(g: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += g(y * 8 + x) * CosT(x)(u) * CosT(y)(v)
            x += 1
          }
          y += 1
        }
        val cu = if (u == 0) InvSqrt2 else 1.0
        val cv = if (v == 0) InvSqrt2 else 1.0
        out(v * 8 + u) = 0.25 * cu * cv * s
        u += 1
      }
      v += 1
    }
    out
  }

  /** Quantize the forward DCT at step `q`, ASSERTING exactness: the
    * synthesis lattice is designed so every coefficient is an exact
    * multiple of the quant step — a drifted basis or quant table would
    * make encoding lossy and is a bug, not a rounding event. */
  private def quantizeExact(coefs: Array[Double], q: Int): Array[Int] =
    coefs.map { c =>
      val lvl = c / q
      val r = math.round(lvl).toInt
      require(math.abs(lvl - r) < 1e-6,
        s"synthesis bug: non-integer quantized level $lvl")
      r
    }

  private def magnitude(v: Int): (Int, Int) = {
    if (v == 0) (0, 0)
    else {
      val a = math.abs(v)
      var size = 0
      while ((a >> size) != 0) size += 1
      (size, if (v < 0) v + (1 << size) - 1 else v)
    }
  }

  /** Huffman-encode one quantized block (zigzag-order levels). Returns
    * the new DC predictor. */
  private def encodeBlock(bw: BitWriter, zz: Array[Int], pred: Int,
                          dcCodes: Array[Int], acCodes: Array[Int]): Int = {
    def emit(codes: Array[Int], sym: Int): Unit = {
      val packed = codes(sym)
      require(packed != 0, f"synthesis bug: symbol $sym%02X not in table")
      bw.put(packed & 0xffff, packed >> 16)
    }
    val (dsz, dbits) = magnitude(zz(0) - pred)
    emit(dcCodes, dsz)
    if (dsz > 0) bw.put(dbits, dsz)
    var last = 63
    while (last >= 1 && zz(last) == 0) last -= 1
    var run = 0
    var k = 1
    while (k <= last) {
      if (zz(k) == 0) run += 1
      else {
        while (run >= 16) { emit(acCodes, 0xf0); run -= 16 }
        val (sz, bits) = magnitude(zz(k))
        emit(acCodes, (run << 4) | sz)
        bw.put(bits, sz)
        run = 0
      }
      k += 1
    }
    if (last < 63) emit(acCodes, 0x00)
    zz(0)
  }

  private def hufSegment(tc: Int, th: Int, bits: Array[Int],
                         vals: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(1 + 16 + vals.length)
    b.put(((tc << 4) | th).toByte)
    bits.foreach(x => b.put(x.toByte))
    b.put(vals)
    b.array()
  }

  /** s(x) of the synthesis lattice: +1 on {0,3,4,7}, −1 elsewhere —
    * the sign pattern of cos((2x+1)·4π/16)·√2. */
  private def sgn(i: Int): Int =
    if (i == 0 || i == 3 || i == 4 || i == 7) 1 else -1

  /** Deterministic genuine-JPEG table: each row's `bytes` is a complete
    * baseline JFIF file (3-component YCbCr, 4:2:0, standard-shaped
    * Huffman tables, quant step 8 everywhere) whose decoded pixels are
    * EXACT by the four-basis construction (scaladoc above). Per-block
    * parameters come from sha256 chains ("jpg"-tagged), so the q171
    * oracle replays pixels without touching the entropy layer. A third
    * of the corpus carries no restart markers, a third DRI=1, a third
    * DRI=2 (tag-derived), so RSTn handling and predictor resets are
    * exercised in-gate. Dimensions 9..22 per axis: every file has a
    * ragged (MCU-padded, decoder-cropped) right and bottom edge, and
    * files over 16 wide/tall carry multi-MCU interleave. */
  def synthesizeJpeg(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val (bytes, w, h) = latticeJpeg(seed, id)
      MediaRow(id, "image", bytes, MediaMeta(w, h, 3, "jpeg", 0, 0))
    }.toDF()
  }

  /** One lattice JPEG for logical id `id` under `seed` — the
    * [[synthesizeJpeg]] generator factored out so OTHER containers can
    * embed frames whose pixels replay under the SAME q171 oracle
    * formula (the MJPEG-in-AVI lane derives each frame's id as
    * vid·100 + frame and reuses this byte-for-byte). Returns
    * (bytes, width, height). */
  // Huffman code tables are seed-independent — built once per JVM so
  // per-frame synthesis (AVI rebuilds a frame per chunk) pays nothing
  private lazy val dcLumaCodes = buildCodes(DcLumaBits, DcVals)
  private lazy val acLumaCodes = buildCodes(AcLumaBits, AcLumaVals)
  private lazy val dcChromaCodes = buildCodes(DcChromaBits, DcVals)
  private lazy val acChromaCodes = buildCodes(AcChromaBits, AcChromaVals)

  private[operators] def latticeJpeg(seed: Long, id: Long)
      : (Array[Byte], Int, Int) = {
    locally {
      def sha(tag: String): Array[Byte] =
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"$seed:jpg:$id:$tag".getBytes("UTF-8"))
      def ub(a: Array[Byte], i: Int): Int = a(i) & 0xff
      val dim = sha("dim")
      val w = 9 + ub(dim, 0) % 14
      val h = 9 + ub(dim, 1) % 14
      val dri = ub(sha("dri"), 0) % 3 // 0 = no restarts, else interval
      val mcusX = (w + 15) / 16
      val mcusY = (h + 15) / 16

      // lattice block → zigzag-order quantized levels via a REAL
      // forward DCT + exact quantization (asserted)
      def blockLevels(base: Int, a: Int, b: Int, c: Int): Array[Int] = {
        val g = new Array[Double](64)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            g(y * 8 + x) = base + a * sgn(x) + b * sgn(y) + c * sgn(x) * sgn(y)
            x += 1
          }
          y += 1
        }
        val q = quantizeExact(fdct(g), 8)
        Array.tabulate(64)(k => q(ZigZag(k)))
      }

      val bw = new BitWriter()
      var predY = 0; var predCb = 0; var predCr = 0
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        if (dri > 0 && mcu > 0 && mcu % dri == 0) {
          bw.flushPad()
          bw.out.write(0xff)
          bw.out.write(0xd0 + (mcu / dri - 1) % 8)
          predY = 0; predCb = 0; predCr = 0
        }
        val my = mcu / mcusX; val mx = mcu % mcusX
        var bi = 0
        while (bi < 4) {
          val yh = sha(s"y:$my:$mx:$bi")
          val lvl = blockLevels(ub(yh, 0) % 193 - 96, ub(yh, 1) % 21 - 10,
            ub(yh, 2) % 21 - 10, ub(yh, 3) % 21 - 10)
          predY = encodeBlock(bw, lvl, predY, dcLumaCodes, acLumaCodes)
          bi += 1
        }
        val bh = sha(s"cb:$my:$mx")
        val cbL = blockLevels(ub(bh, 0) % 161 - 80, ub(bh, 1) % 17 - 8,
          ub(bh, 2) % 17 - 8, ub(bh, 3) % 17 - 8)
        predCb = encodeBlock(bw, cbL, predCb, dcChromaCodes, acChromaCodes)
        val rh = sha(s"cr:$my:$mx")
        val crL = blockLevels(ub(rh, 0) % 161 - 80, ub(rh, 1) % 17 - 8,
          ub(rh, 2) % 17 - 8, ub(rh, 3) % 17 - 8)
        predCr = encodeBlock(bw, crL, predCr, dcChromaCodes, acChromaCodes)
        mcu += 1
      }
      bw.flushPad()

      val out = new java.io.ByteArrayOutputStream()
      def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
      def segment(m: Int, payload: Array[Byte]): Unit = {
        marker(m)
        out.write((payload.length + 2) >> 8); out.write((payload.length + 2) & 0xff)
        out.write(payload, 0, payload.length)
      }
      marker(0xd8) // SOI
      segment(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
      // DQT: two all-8 tables (step divides every lattice coefficient)
      val qtab = Array.fill(64)(8.toByte)
      segment(0xdb, (0.toByte +: qtab) ++ (1.toByte +: qtab))
      // SOF0: Y 2x2 q0, Cb 1x1 q1, Cr 1x1 q1
      segment(0xc0, Array[Byte](8,
        (h >> 8).toByte, (h & 0xff).toByte, (w >> 8).toByte, (w & 0xff).toByte,
        3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
      segment(0xc4,
        hufSegment(0, 0, DcLumaBits, DcVals) ++
          hufSegment(1, 0, AcLumaBits, AcLumaVals) ++
          hufSegment(0, 1, DcChromaBits, DcVals) ++
          hufSegment(1, 1, AcChromaBits, AcChromaVals))
      if (dri > 0) segment(0xdd, Array[Byte]((dri >> 8).toByte, (dri & 0xff).toByte))
      segment(0xda, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
      val ec = bw.out.toByteArray
      out.write(ec, 0, ec.length)
      marker(0xd9) // EOI
      (out.toByteArray, w, h)
    }
  }
}
