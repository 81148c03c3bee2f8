package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.operators.Multimodal.{MediaMeta, MediaRow}

/** MJPEG-in-AVI — the first VIDEO modality through the codec seam
  * (VERDICT r10 #6), composed from two parsers the engine already
  * owns: the RIFF chunk discipline (the [[Multimodal.decodeWav]]
  * container family) and the baseline-JPEG decoder ([[Jpeg.decodeJpeg]]).
  * Zero new decode math: an AVI is a RIFF('AVI ') tree whose 'movi'
  * list carries one complete JFIF file per '00dc' chunk, so frame
  * extraction is a strict chunk walk and per-frame pixels are the
  * already-gated JPEG path.
  *
  * Reference behavior modeled on the public AVI RIFF layout
  * (msdn AVI RIFF File Reference; OpenDML AVI v1): RIFF('AVI ')
  * { LIST('hdrl'){ avih, LIST('strl'){ strh('vids'/'MJPG'), strf } },
  *   LIST('movi'){ '00dc'... }, 'idx1' }.
  * The synthesizer writes a fully-formed single-stream file (56-byte
  * avih, 56-byte strh with scale/rate = 1/10 → a 100 ms frame tick,
  * 40-byte BITMAPINFOHEADER strf, even-padded frame chunks, and a
  * complete idx1); the decoder VALIDATES what it walks — fourccs,
  * declared sizes, the strh timebase, and every idx1 entry against the
  * actual '00dc' offsets/sizes — so a synthesis bug on either layer
  * fails loudly rather than desyncing pixels.
  *
  * 100 TB shape: the codec-seam rule (bytes never cross a shuffle) —
  * frame extraction and JPEG decode run inside one map partition over
  * the media table, emitting 8-lane integer feature rows; everything
  * downstream is narrow. Plan-pinned by the q208 lint sweep like every
  * other media query.
  */
object Avi {

  final case class VideoFrameFeatures(media_id: Long, frame_idx: Int,
                                      t_ms: Int, features: Array[Float])

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def u32le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def u16le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Deterministic MJPEG-in-AVI table: video v carries
    * nf = 2 + sha256("seed:avi:v:nf")[0] mod 5 frames; frame f is the
    * [[Jpeg.latticeJpeg]] image with id = v·100 + f, so every frame's
    * pixels replay under the UNCHANGED q171 oracle formula at that
    * derived id. Timebase 10 fps (strh scale/rate = 1/10), frame f
    * starts at t = 100·f ms. avih/strf carry frame 0's dimensions
    * (frames are per-frame-dimensioned, which MJPEG permits and the
    * decoder reads from each JFIF, not the header). */
  /** Single-stream MJPEG-AVI container around `frames`
    * ((jpegBytes, w, h) per frame) — the byte layout
    * [[synthesizeAviMjpeg]] and [[synthesizeAviNearDup]] share. */
  private def mjpegAviBytes(frames: IndexedSeq[(Array[Byte], Int, Int)])
      : Array[Byte] = {
    val nf = frames.length
    val (w0, h0) = (frames.head._2, frames.head._3)

    def chunk(cc: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if (payload.length % 2 == 1) Array(0.toByte)
                else Array.empty[Byte]
      fourcc(cc) ++ u32le(payload.length) ++ payload ++ pad
    }
    def list(listType: String, payload: Array[Byte]): Array[Byte] =
      fourcc("LIST") ++ u32le(payload.length + 4) ++ fourcc(listType) ++
        payload

    val avih = chunk("avih",
      u32le(100000) ++ u32le(0) ++ u32le(0) ++ u32le(0x10) ++
        u32le(nf) ++ u32le(0) ++ u32le(1) ++ u32le(0) ++
        u32le(w0) ++ u32le(h0) ++ u32le(0) ++ u32le(0) ++ u32le(0) ++
        u32le(0))
    val strh = chunk("strh",
      fourcc("vids") ++ fourcc("MJPG") ++ u32le(0) ++ u16le(0) ++
        u16le(0) ++ u32le(0) ++ u32le(1) ++ u32le(10) ++ u32le(0) ++
        u32le(nf) ++ u32le(0) ++ u32le(0) ++ u32le(0) ++
        u16le(0) ++ u16le(0) ++ u16le(w0) ++ u16le(h0))
    val strf = chunk("strf",
      u32le(40) ++ u32le(w0) ++ u32le(h0) ++ u16le(1) ++ u16le(24) ++
        fourcc("MJPG") ++ u32le(0) ++ u32le(0) ++ u32le(0) ++
        u32le(0) ++ u32le(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))

    val frameChunks = frames.map(fr => chunk("00dc", fr._1))
    val movi = list("movi", frameChunks.flatMap(c => c).toArray)
    // idx1 offsets are relative to the 'movi' listType fourcc
    // (the historical convention the validator below pins)
    val offsets = frameChunks.scanLeft(4)(_ + _.length)
    val idx1 = chunk("idx1",
      frames.indices.flatMap(f =>
        fourcc("00dc") ++ u32le(0x10) ++ u32le(offsets(f)) ++
          u32le(frames(f)._1.length)).toArray)

    val body = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
    fourcc("RIFF") ++ u32le(body.length) ++ body
  }

  def synthesizeAviMjpeg(spark: SparkSession, n: Int,
                         seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { vid =>
      val nfh = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"$seed:avi:$vid:nf".getBytes("UTF-8"))
      val nf = 2 + (nfh(0) & 0xff) % 5
      val frames = (0 until nf).map(f => Jpeg.latticeJpeg(seed, vid * 100L + f))
      MediaRow(vid, "video", mjpegAviBytes(frames),
        MediaMeta(frames.head._2, frames.head._3, 3, "avi", nf * 100, 0))
    }.toDF()
  }

  /** Deterministic NEAR-DUP video corpus — the q223 fixture: base
    * video v (0 ≤ v < n) carries nf = 4 + sha256("seed:avnd:v:nf")[0]
    * mod 3 frames with the DERIVED frame ids v·100 + f (the q208
    * lattice chain, so frame pixels replay under the unchanged q171
    * formula); every v ≡ 0 (mod 3) also ships a CLIPPED copy (id
    * 1000 + v: frames 1 … nf−2 of the base — a sub-video at temporal
    * offset +1) and every v ≡ 0 (mod 4) a FULL duplicate (id
    * 2000 + v — the re-encode stand-in at offset 0). Different base
    * videos share no frame ids, so cross-base frame hashes are
    * independent. */
  def synthesizeAviNearDup(spark: SparkSession, n: Int,
                           seed: Long = 42L): DataFrame = {
    import spark.implicits._
    def nfOf(v: Long): Int = {
      val h = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"$seed:avnd:$v:nf".getBytes("UTF-8"))
      4 + (h(0) & 0xff) % 3
    }
    val ids = (0L until n.toLong).flatMap { v =>
      Seq(v) ++
        (if (v % 3 == 0) Seq(1000L + v) else Seq.empty) ++
        (if (v % 4 == 0) Seq(2000L + v) else Seq.empty)
    }
    spark.createDataset(ids).map { vid =>
      val base = vid % 1000L
      val nf = nfOf(base)
      val frameIds: IndexedSeq[Long] =
        if (vid < 1000L) (0 until nf).map(f => base * 100L + f)
        else if (vid < 2000L) (1 until nf - 1).map(f => base * 100L + f)
        else (0 until nf).map(f => base * 100L + f)
      val frames = frameIds.map(i => Jpeg.latticeJpeg(seed, i))
      MediaRow(vid, "video", mjpegAviBytes(frames),
        MediaMeta(frames.head._2, frames.head._3, 3, "avi",
          frames.length * 100, 0))
    }.toDF()
  }

  /** Strict AVI frame extraction: walks the RIFF tree, validates the
    * header chain ('AVI ' fourcc, declared RIFF size, a 'vids' strh
    * whose scale/rate yields a positive frame tick, the idx1 entries
    * against the actual '00dc' chunk offsets/sizes), and returns
    * (frame payloads, frame duration in ms). Truncated or
    * mis-declared containers throw — the lenient-quarantine layer
    * above the codec seam decides what to do with those rows. */
  def decodeAviFrames(bytes: Array[Byte]): (Seq[Array[Byte]], Int) = {
    require(bytes.length >= 12, "not an AVI: too short")
    def cc(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    def u32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    require(cc(0) == "RIFF", "not an AVI: bad RIFF magic")
    require(u32(4) == bytes.length - 8,
      s"RIFF size ${u32(4)} != ${bytes.length - 8}")
    require(cc(8) == "AVI ", s"not an AVI: form '${cc(8)}'")

    var scale = 0
    var rate = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    var idx1: Option[Array[Byte]] = None
    var moviStart = -1

    def walkStrl(off: Int, end: Int): Unit = {
      var p = off
      while (p + 8 <= end) {
        val sz = u32(p + 4)
        if (cc(p) == "strh" && cc(p + 8) == "vids") {
          require(sz >= 56, s"strh too short: $sz")
          scale = u32(p + 8 + 20)
          rate = u32(p + 8 + 24)
        }
        p += 8 + sz + (sz & 1)
      }
    }
    def walkHdrl(off: Int, end: Int): Unit = {
      var p = off
      while (p + 8 <= end) {
        val sz = u32(p + 4)
        if (cc(p) == "LIST" && cc(p + 8) == "strl")
          walkStrl(p + 12, p + 8 + sz)
        p += 8 + sz + (sz & 1)
      }
    }
    def walkMovi(off: Int, end: Int): Unit = {
      var p = off
      while (p + 8 <= end) {
        val sz = u32(p + 4)
        if (cc(p) == "00dc")
          frames += ((p, java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + sz)))
        p += 8 + sz + (sz & 1)
      }
    }
    var p = 12
    while (p + 8 <= bytes.length) {
      val sz = u32(p + 4)
      cc(p) match {
        case "LIST" => cc(p + 8) match {
          case "hdrl" => walkHdrl(p + 12, p + 8 + sz)
          case "movi" => moviStart = p + 8; walkMovi(p + 12, p + 8 + sz)
          case _ => ()
        }
        case "idx1" =>
          idx1 = Some(java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + sz))
        case _ => ()
      }
      p += 8 + sz + (sz & 1)
    }
    require(rate > 0 && scale > 0, s"no vids timebase (scale=$scale rate=$rate)")
    require(moviStart >= 0 && frames.nonEmpty, "no movi frames")
    // idx1 cross-check: entry f must point at frame f's '00dc' chunk
    val ix = idx1.getOrElse(throw new IllegalArgumentException("no idx1"))
    require(ix.length == frames.length * 16,
      s"idx1 holds ${ix.length / 16} entries for ${frames.length} frames")
    def ixU32(off: Int): Int =
      (ix(off) & 0xff) | ((ix(off + 1) & 0xff) << 8) |
        ((ix(off + 2) & 0xff) << 16) | ((ix(off + 3) & 0xff) << 24)
    frames.indices.foreach { f =>
      val e = f * 16
      require(new String(ix, e, 4, "US-ASCII") == "00dc", s"idx1[$f] fourcc")
      require(ixU32(e + 8) == frames(f)._1 - moviStart,
        s"idx1[$f] offset ${ixU32(e + 8)} != ${frames(f)._1 - moviStart}")
      require(ixU32(e + 12) == frames(f)._2.length, s"idx1[$f] size")
    }
    val tickMs = math.toIntExact(1000L * scale / rate)
    require(tickMs > 0, s"zero frame tick (scale=$scale rate=$rate)")
    (frames.map(_._2).toSeq, tickMs)
  }

  /** Timeline frame sampling over MJPEG-in-AVI — the q174 contract
    * ([[Multimodal.frameSample]]) on the strh timebase: sample instants
    * t = s·everyMs ascend over [0, nf·tick); the active frame at t is
    * ⌊t / tick⌋ (AVI frames are equal-length by the stream header,
    * so the GIF edition's variable-delay cursor degenerates to a
    * division). Decode runs once per frame actually sampled, inside
    * the same map partition as the container walk. */
  def frameSample(media: DataFrame, everyMs: Int)
      : Dataset[Multimodal.SampledFrame] = {
    import media.sparkSession.implicits._
    require(everyMs > 0, "everyMs must be positive")
    media.as[MediaRow].filter(_.kind == "video").flatMap { m =>
      val (frames, tickMs) = decodeAviFrames(m.bytes)
      val duration = frames.length * tickMs
      val wanted = Iterator.from(0).map(_ * everyMs)
        .takeWhile(_ < duration).zipWithIndex
        .map { case (t, s) => (s, t, t / tickMs) }.toSeq
      val feats = wanted.map(_._3).distinct
        .map(k => k -> Jpeg.decodeJpeg(frames(k))).toMap
      wanted.map { case (s, t, k) =>
        val f = feats(k)
        Multimodal.SampledFrame(m.media_id, s, t, k,
          f(0).toDouble, f(1).toDouble, f(2).toDouble, f(3).toDouble,
          f(4).toDouble, f(5).toDouble, f(6).toDouble, f(7).toDouble)
      }
    }
  }

  /** Per-frame 8-lane features of every video row: frame extraction +
    * [[Jpeg.decodeJpeg]] inside one map partition (codec-seam rule —
    * bytes never cross a shuffle). t_ms = frame_idx · frame tick from
    * the strh timebase (the q174 timeline convention: a frame's
    * timestamp is its START instant). */
  def frameFeatures(media: DataFrame): Dataset[VideoFrameFeatures] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].filter(_.kind == "video").flatMap { m =>
      val (frames, tickMs) = decodeAviFrames(m.bytes)
      frames.zipWithIndex.map { case (jpg, f) =>
        VideoFrameFeatures(m.media_id, f, f * tickMs, Jpeg.decodeJpeg(jpg))
      }
    }
  }

  final case class FrameDhash(media_id: Long, frame_idx: Int,
                              b0: Int, b1: Int, b2: Int, b3: Int)

  /** Per-frame 64-bit DIFFERENCE HASH over the decoded video frames —
    * the q118 perceptual hash lifted from single images to frame
    * sequences, and the substrate of [[videoNearDupPairs]]: frame →
    * [[Jpeg.decodeJpegRgb]] pixels → integer luma (299·R + 587·G +
    * 114·B) → a 9×8 cell grid (pixel (x, y) lands in cell
    * (⌊x·9/w⌋, ⌊y·8/h⌋) — works at any frame dimension with no
    * resampling float) → bit (r, c) set iff cell (c, r) is brighter
    * than its right neighbor by the CROSS-MULTIPLIED compare
    * sum_c·n_{c+1} > sum_{c+1}·n_c (cells have unequal pixel counts;
    * the ratio compare stays integer-exact) → four 16-bit bands
    * (b0 = bits 0–15, …), the [[Multimodal.dhashBands]] layout, so
    * banded candidate generation needs no 64-bit sign games in either
    * engine. Identical frame bytes hash identically; a re-encoded
    * frame moves few bits. Runs inside the codec seam (map-only,
    * bytes never shuffle). */
  def frameDhash(media: DataFrame): Dataset[FrameDhash] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].filter(_.kind == "video").flatMap { m =>
      val (frames, _) = decodeAviFrames(m.bytes)
      frames.zipWithIndex.map { case (jpg, f) =>
        val (w, h, rgb) = Jpeg.decodeJpegRgb(jpg)
        val sums = Array.ofDim[Long](9, 8)
        val cnts = Array.ofDim[Long](9, 8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = rgb(y * w + x)
            val lum = ((p >> 16) & 0xff) * 299L + ((p >> 8) & 0xff) * 587L +
              (p & 0xff) * 114L
            sums(x * 9 / w)(y * 8 / h) += lum
            cnts(x * 9 / w)(y * 8 / h) += 1
            x += 1
          }
          y += 1
        }
        val bands = new Array[Int](4)
        var r = 0
        while (r < 8) {
          var c = 0
          while (c < 8) {
            if (sums(c)(r) * cnts(c + 1)(r) > sums(c + 1)(r) * cnts(c)(r)) {
              val idx = r * 8 + c
              bands(idx / 16) |= 1 << (idx % 16)
            }
            c += 1
          }
          r += 1
        }
        FrameDhash(m.media_id, f, bands(0), bands(1), bands(2), bands(3))
      }
    }
  }

  /** VIDEO-TO-VIDEO NEAR-DUPLICATE DETECTION (VERDICT r12 #3) — finds
    * re-encoded and CLIPPED duplicate videos, the gap between q118
    * (single images) and q208/q210 (frames of ONE video): per-frame
    * [[frameDhash]] sequences, banded frame-hash candidate join (the
    * SimHash pigeonhole: a pair of frames within Hamming `maxHamming`
    * over 64 bits shares at least one intact 16-bit band), exact
    * Hamming verify, then TEMPORAL ALIGNMENT — the q135
    * asymmetric-containment rule on the time axis: matched frame pairs
    * vote for their offset (f_b − f_a), the best-supported offset per
    * video pair wins (ties to the smallest offset), and the pair
    * reports as near-dup iff the aligned-match count covers at least
    * `minOverlapPct` percent of the SHORTER video — exactly how a
    * clipped sub-video is contained in its source.
    *
    * 100 TB shape: the band join carries only (video, frame, band)
    * rows — frame hashes are 4 ints, pixels and bytes never leave the
    * codec seam — and candidate volume follows band occupancy, not
    * corpus² (the q27 banding economics; a boilerplate-frame-heavy
    * corpus would add the hotBands cap, the q69 escape hatch). The
    * offset vote is one hash aggregate on (a, b, offset) id triples
    * and the per-pair argmax window runs over the candidate-pair set,
    * never over frames.
    *
    * Returns (video_a, video_b, offset, n_aligned, nf_a, nf_b),
    * video_a < video_b. */
  def videoNearDupPairs(media: DataFrame, maxHamming: Int = 6,
                        minOverlapPct: Int = 80): DataFrame = {
    import org.apache.spark.sql.functions._
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming out of range: $maxHamming")
    require(minOverlapPct >= 1 && minOverlapPct <= 100,
      s"minOverlapPct out of range: $minOverlapPct")
    val fh = frameDhash(media).toDF()
      .localCheckpoint() // read by bands, both verify sides, and nf
    val nf = fh.groupBy(col("media_id")).agg(count(lit(1)).as("nf"))
    val bands = fh.select(col("media_id"), col("frame_idx"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))))
      .select(col("media_id"), col("frame_idx"),
        col("pos").as("band_idx"), col("col").as("band"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band") === col("y.band") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("a"), col("x.frame_idx").as("fa"),
        col("y.media_id").as("b"), col("y.frame_idx").as("fb"))
      .distinct()
    val ha = fh.select(col("media_id").as("a"), col("frame_idx").as("fa"),
      col("b0").as("xa0"), col("b1").as("xa1"), col("b2").as("xa2"),
      col("b3").as("xa3"))
    val hb = fh.select(col("media_id").as("b"), col("frame_idx").as("fb"),
      col("b0").as("xb0"), col("b1").as("xb1"), col("b2").as("xb2"),
      col("b3").as("xb3"))
    val matched = cand.join(ha, Seq("a", "fa")).join(hb, Seq("b", "fb"))
      .withColumn("ham", expr(
        "bit_count(xa0 ^ xb0) + bit_count(xa1 ^ xb1) + " +
          "bit_count(xa2 ^ xb2) + bit_count(xa3 ^ xb3)"))
      .filter(col("ham") <= maxHamming)
    Dedup.temporalAlignPairs(matched,
        nf.select(col("media_id"), col("nf").as("n")), minOverlapPct)
      .select(col("a").as("video_a"), col("b").as("video_b"),
        col("offset"), col("n_aligned"),
        col("n_a").as("nf_a"), col("n_b").as("nf_b"))
  }

  // ------------------------------------------ interleaved audio + video

  final case class AvFrameFeatures(media_id: Long, frame_idx: Int,
                                   t_ms: Int, vfeatures: Array[Float],
                                   afeatures: Array[Float])

  /** Samples per 100 ms audio window at the fixed 640 Hz synthetic
    * rate: 64 samples = 128 bytes = exactly four sha256 digests, so
    * each window is one clean hash-chain replay. */
  private val AvAudioRate = 640
  private val AvSamplesPerWindow = 64

  /** Deterministic INTERLEAVED audio+video AVI (VERDICT r11 #4): the
    * [[synthesizeAviMjpeg]] corpus extended with a second 'auds'
    * stream — real AVI carries '01wb' PCM chunks interleaved with the
    * '00dc' video chunks, and this synthesizer writes the standard
    * frame-major interleave (each video frame's chunk immediately
    * followed by the audio chunk covering its 100 ms window).
    *
    * Zero new decode math, the q208 discipline: frame f of video v is
    * still [[Jpeg.latticeJpeg]] at derived id v·100+f (the q171
    * oracle formula), and the audio window for frame f is the q110
    * sample formula re-tagged — 64 signed 16-bit LE samples from
    * sha256("seed:avia:v:f:k"), k = 0..3 (128 bytes = four digests),
    * at 640 Hz so one window is exactly one 100 ms frame tick. The
    * 'auds' strh carries scale/rate = 1/640 and the per-stream sample
    * count; idx1 indexes BOTH chunk chains in file order. */
  def synthesizeAviAv(spark: SparkSession, n: Int,
                      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { vid =>
      def sha(tag: String): Array[Byte] =
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(tag.getBytes("UTF-8"))
      val nf = 2 + (sha(s"$seed:avi:$vid:nf")(0) & 0xff) % 5
      val frames = (0 until nf).map(f => Jpeg.latticeJpeg(seed, vid * 100L + f))
      val (w0, h0) = (frames.head._2, frames.head._3)
      val audioWindows = (0 until nf).map { f =>
        (0 until 4).flatMap(k => sha(s"$seed:avia:$vid:$f:$k")).toArray
      }

      def chunk(cc: String, payload: Array[Byte]): Array[Byte] = {
        val pad = if (payload.length % 2 == 1) Array(0.toByte)
                  else Array.empty[Byte]
        fourcc(cc) ++ u32le(payload.length) ++ payload ++ pad
      }
      def list(listType: String, payload: Array[Byte]): Array[Byte] =
        fourcc("LIST") ++ u32le(payload.length + 4) ++ fourcc(listType) ++
          payload

      val avih = chunk("avih",
        u32le(100000) ++ u32le(0) ++ u32le(0) ++ u32le(0x10) ++
          u32le(nf) ++ u32le(0) ++ u32le(2) ++ u32le(0) ++
          u32le(w0) ++ u32le(h0) ++ u32le(0) ++ u32le(0) ++ u32le(0) ++
          u32le(0))
      val strhV = chunk("strh",
        fourcc("vids") ++ fourcc("MJPG") ++ u32le(0) ++ u16le(0) ++
          u16le(0) ++ u32le(0) ++ u32le(1) ++ u32le(10) ++ u32le(0) ++
          u32le(nf) ++ u32le(0) ++ u32le(0) ++ u32le(0) ++
          u16le(0) ++ u16le(0) ++ u16le(w0) ++ u16le(h0))
      val strfV = chunk("strf",
        u32le(40) ++ u32le(w0) ++ u32le(h0) ++ u16le(1) ++ u16le(24) ++
          fourcc("MJPG") ++ u32le(0) ++ u32le(0) ++ u32le(0) ++
          u32le(0) ++ u32le(0))
      val strhA = chunk("strh",
        fourcc("auds") ++ u32le(0) ++ u32le(0) ++ u16le(0) ++
          u16le(0) ++ u32le(0) ++ u32le(1) ++ u32le(AvAudioRate) ++
          u32le(0) ++ u32le(nf * AvSamplesPerWindow) ++ u32le(0) ++
          u32le(0) ++ u32le(0) ++
          u16le(0) ++ u16le(0) ++ u16le(0) ++ u16le(0))
      // WAVEFORMATEX: PCM, mono, 640 Hz, 16-bit
      val strfA = chunk("strf",
        u16le(1) ++ u16le(1) ++ u32le(AvAudioRate) ++
          u32le(AvAudioRate * 2) ++ u16le(2) ++ u16le(16))
      val hdrl = list("hdrl", avih ++ list("strl", strhV ++ strfV) ++
        list("strl", strhA ++ strfA))

      // frame-major interleave: 00dc_f immediately followed by 01wb_f
      val moviChunks = (0 until nf).flatMap(f =>
        Seq(("00dc", chunk("00dc", frames(f)._1)),
          ("01wb", chunk("01wb", audioWindows(f)))))
      val movi = list("movi", moviChunks.flatMap(_._2).toArray)
      val offsets = moviChunks.map(_._2).scanLeft(4)(_ + _.length)
      val sizes = (0 until nf).flatMap(f =>
        Seq(frames(f)._1.length, audioWindows(f).length))
      val idx1 = chunk("idx1",
        moviChunks.indices.flatMap(c =>
          fourcc(moviChunks(c)._1) ++ u32le(if (c % 2 == 0) 0x10 else 0) ++
            u32le(offsets(c)) ++ u32le(sizes(c))).toArray)

      val body = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
      val bytes = fourcc("RIFF") ++ u32le(body.length) ++ body
      MediaRow(vid, "video", bytes,
        MediaMeta(w0, h0, 3, "avi", nf * 100, AvAudioRate))
    }.toDF()
  }

  /** Strict interleaved-AVI extraction: walks the RIFF tree, validates
    * BOTH stream header chains (a 'vids' strh with a positive frame
    * tick AND an 'auds' strh whose scale/rate matches the strf
    * WAVEFORMATEX sample rate), the STRICT frame-major interleave
    * ('00dc' and '01wb' chunks alternate, equal counts, audio chunk
    * sized to exactly one frame tick of samples), and every idx1 entry
    * (both fourcc chains) against actual offsets/sizes. Returns
    * (video frame payloads, tick ms, audio rate, per-window samples). */
  def decodeAviAv(bytes: Array[Byte])
      : (Seq[Array[Byte]], Int, Int, Seq[Array[Short]]) = {
    require(bytes.length >= 12, "not an AVI: too short")
    def cc(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    def u32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    require(cc(0) == "RIFF", "not an AVI: bad RIFF magic")
    require(u32(4) == bytes.length - 8,
      s"RIFF size ${u32(4)} != ${bytes.length - 8}")
    require(cc(8) == "AVI ", s"not an AVI: form '${cc(8)}'")

    var scaleV = 0; var rateV = 0
    var scaleA = 0; var rateA = 0
    var fmtRate = -1
    val chunks =
      scala.collection.mutable.ArrayBuffer.empty[(String, Int, Array[Byte])]
    var idx1: Option[Array[Byte]] = None
    var moviStart = -1

    def walkStrl(off: Int, end: Int): Unit = {
      var p = off
      var kind = ""
      while (p + 8 <= end) {
        val sz = u32(p + 4)
        cc(p) match {
          case "strh" =>
            kind = cc(p + 8)
            require(sz >= 56, s"strh too short: $sz")
            if (kind == "vids") {
              scaleV = u32(p + 8 + 20); rateV = u32(p + 8 + 24)
            } else if (kind == "auds") {
              scaleA = u32(p + 8 + 20); rateA = u32(p + 8 + 24)
            }
          case "strf" if kind == "auds" =>
            require(sz >= 16, s"auds strf too short: $sz")
            require(u16(p + 8) == 1, "non-PCM audio stream")
            require(u16(p + 8 + 2) == 1, "only mono audio supported")
            require(u16(p + 8 + 14) == 16, "only 16-bit audio supported")
            fmtRate = u32(p + 8 + 4)
          case _ => ()
        }
        p += 8 + sz + (sz & 1)
      }
    }
    def walkHdrl(off: Int, end: Int): Unit = {
      var p = off
      while (p + 8 <= end) {
        val sz = u32(p + 4)
        if (cc(p) == "LIST" && cc(p + 8) == "strl")
          walkStrl(p + 12, p + 8 + sz)
        p += 8 + sz + (sz & 1)
      }
    }
    def walkMovi(off: Int, end: Int): Unit = {
      var p = off
      while (p + 8 <= end) {
        val sz = u32(p + 4)
        val id = cc(p)
        if (id == "00dc" || id == "01wb")
          chunks += ((id, p,
            java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + sz)))
        p += 8 + sz + (sz & 1)
      }
    }
    var p = 12
    while (p + 8 <= bytes.length) {
      val sz = u32(p + 4)
      cc(p) match {
        case "LIST" => cc(p + 8) match {
          case "hdrl" => walkHdrl(p + 12, p + 8 + sz)
          case "movi" => moviStart = p + 8; walkMovi(p + 12, p + 8 + sz)
          case _ => ()
        }
        case "idx1" =>
          idx1 = Some(java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + sz))
        case _ => ()
      }
      p += 8 + sz + (sz & 1)
    }
    require(rateV > 0 && scaleV > 0,
      s"no vids timebase (scale=$scaleV rate=$rateV)")
    require(rateA > 0 && scaleA > 0,
      s"no auds timebase (scale=$scaleA rate=$rateA)")
    val audioRate = rateA / scaleA
    require(fmtRate == audioRate,
      s"auds strh rate $audioRate != strf WAVEFORMATEX rate $fmtRate")
    require(moviStart >= 0 && chunks.nonEmpty, "no movi chunks")
    // STRICT frame-major interleave: 00dc_f immediately followed by
    // 01wb_f, equal counts
    require(chunks.length % 2 == 0,
      s"odd chunk count ${chunks.length}: unpaired A/V")
    val nf = chunks.length / 2
    chunks.indices.foreach { c =>
      val expect = if (c % 2 == 0) "00dc" else "01wb"
      require(chunks(c)._1 == expect,
        s"interleave break at chunk $c: '${chunks(c)._1}' (want '$expect')")
    }
    val tickMs = math.toIntExact(1000L * scaleV / rateV)
    require(tickMs > 0, s"zero frame tick (scale=$scaleV rate=$rateV)")
    // each audio chunk covers exactly one frame tick of samples
    val spw = math.toIntExact(audioRate.toLong * tickMs / 1000)
    require(spw > 0, s"zero samples per window (rate=$audioRate tick=$tickMs)")
    // idx1 cross-check over BOTH chains, file order
    val ix = idx1.getOrElse(throw new IllegalArgumentException("no idx1"))
    require(ix.length == chunks.length * 16,
      s"idx1 holds ${ix.length / 16} entries for ${chunks.length} chunks")
    def ixU32(off: Int): Int =
      (ix(off) & 0xff) | ((ix(off + 1) & 0xff) << 8) |
        ((ix(off + 2) & 0xff) << 16) | ((ix(off + 3) & 0xff) << 24)
    chunks.indices.foreach { c =>
      val e = c * 16
      require(new String(ix, e, 4, "US-ASCII") == chunks(c)._1,
        s"idx1[$c] fourcc")
      require(ixU32(e + 8) == chunks(c)._2 - moviStart,
        s"idx1[$c] offset ${ixU32(e + 8)} != ${chunks(c)._2 - moviStart}")
      require(ixU32(e + 12) == chunks(c)._3.length, s"idx1[$c] size")
    }
    val frames = (0 until nf).map(f => chunks(2 * f)._3)
    val windows = (0 until nf).map { f =>
      val raw = chunks(2 * f + 1)._3
      require(raw.length == spw * 2,
        s"audio window $f carries ${raw.length / 2} samples, want $spw")
      Array.tabulate(spw) { j =>
        ((raw(2 * j) & 0xff) | ((raw(2 * j + 1) & 0xff) << 8)).toShort
      }
    }
    (frames, tickMs, audioRate, windows)
  }

  /** A/V-ALIGNED per-frame features over interleaved AVI: for frame f,
    * the 8 JPEG lanes ([[Jpeg.decodeJpeg]]) plus the 8 audio lanes of
    * its 100 ms sample window ([[Multimodal]]'s q110 sampleLanes
    * formula — sum, |sum|, max, min, zero crossings, position-weighted
    * low bytes, rate, count) — the per-sample-window + active-frame
    * join on the shared timeline, evaluated where the codec seam rule
    * demands: both decodes in ONE map partition, bytes never cross a
    * shuffle. */
  def avFrameFeatures(media: DataFrame): Dataset[AvFrameFeatures] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].filter(_.kind == "video").flatMap { m =>
      val (frames, tickMs, audioRate, windows) = decodeAviAv(m.bytes)
      frames.indices.map { f =>
        AvFrameFeatures(m.media_id, f, f * tickMs,
          Jpeg.decodeJpeg(frames(f)),
          Multimodal.audioLanes(windows(f), audioRate))
      }
    }
  }
}
