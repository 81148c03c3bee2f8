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
  def synthesizeAviMjpeg(spark: SparkSession, n: Int,
                         seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { vid =>
      val nfh = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"$seed:avi:$vid:nf".getBytes("UTF-8"))
      val nf = 2 + (nfh(0) & 0xff) % 5
      val frames = (0 until nf).map(f => Jpeg.latticeJpeg(seed, vid * 100L + f))
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
      val bytes = fourcc("RIFF") ++ u32le(body.length) ++ body
      MediaRow(vid, "video", bytes,
        MediaMeta(w0, h0, 3, "avi", nf * 100, 0))
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
}
