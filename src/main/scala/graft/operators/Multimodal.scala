package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media as opaque `binary` columns with a typed metadata
  * struct, processed by per-partition JVM transforms.
  *
  * The codec layer is STUBBED — this container has no image/audio
  * libraries, so `decodeStub` / `resizeStub` / `frameSampleStub` produce
  * deterministic fakes derived from the bytes. Everything around the stub
  * is real and designed for scale:
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
    * i-3 (same `kind` — kinds cycle mod 3) with the final byte shifted
    * by ±1, which moves the rolling-hash feature vector by ~1/(1000·n)
    * in one dimension — so near-dup detection over this table has a
    * stable non-empty answer instead of vacuously finding nothing in
    * uniform random noise. */
  def synthesizeMedia(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val kinds = Array("image", "audio", "video")
    val rows = new scala.collection.mutable.ArrayBuffer[MediaRow](n)
    (0L until n.toLong).foreach { i =>
      val rnd = new scala.util.Random(seed + i)
      val kind = kinds((i % 3).toInt)
      val len = 64 + rnd.nextInt(192)
      val bytes = Array.fill[Byte](len)(rnd.nextInt(256).toByte)
      val meta = kind match {
        case "image" => MediaMeta(32 + rnd.nextInt(96), 32 + rnd.nextInt(96), 3, "png", 0, 0)
        case "audio" => MediaMeta(0, 0, 1, "wav", 1000 + rnd.nextInt(9000), 16000)
        case _       => MediaMeta(64, 64, 3, "mp4", 2000 + rnd.nextInt(8000), 0)
      }
      rows += (if (i % 10 == 9 && i >= 3) {
        val src = rows((i - 3).toInt)
        val nb = src.bytes.clone()
        nb(nb.length - 1) = (nb(nb.length - 1) ^ 0x01).toByte
        MediaRow(i, src.kind, nb, src.meta)
      } else MediaRow(i, kind, bytes, meta))
    }
    rows.toSeq.toDF()
  }

  /** STUB decode: a real implementation would run an image/audio codec
    * here; this derives an 8-float "feature vector" from a rolling hash
    * of the bytes — deterministic, branch-free, shaped exactly like the
    * real thing so the pipeline around it is fully exercised. */
  private[operators] def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = h * 31 + bytes(i)
      out(i % 8) += (h % 1000L).toFloat / 1000f
      i += 1
    }
    val n = math.max(bytes.length / 8, 1)
    var j = 0
    while (j < 8) { out(j) /= n; j += 1 }
    out
  }

  /** Per-partition feature extraction: Dataset[MediaRow] → features.
    * One shuffle-free map stage; bytes are dropped on the spot. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map(m => MediaFeatures(m.media_id, m.kind, decodeStub(m.bytes)))
    }
  }

  /** STUB resize: real impl re-encodes pixels; the stub truncates/pads
    * bytes to the target "resolution" and rewrites meta — schema and
    * partition behavior identical to the real operator. */
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

  /** STUB frame sampling for video rows: emits one frame row per
    * `everyMs` of duration (a Generator-shaped expansion, like C6's
    * explode but for media). */
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
    * the vector dedup machinery — bytes never reach the join. */
  def mediaNearDupPairs(media: DataFrame, threshold: Double = 0.999): DataFrame =
    Similarity.embeddingNearDupPairs(
      extractFeatures(media).toDF().withColumnRenamed("features", "embedding"),
      "media_id", "embedding", threshold, bands = 4, bitsPerBand = 4, dim = 8)
}
