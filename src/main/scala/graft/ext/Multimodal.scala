package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (north-star per SURVEY.md §0): media
  * payloads ride through the engine as opaque `binary` columns with a
  * typed metadata struct; decode / feature-extraction / resize /
  * frame-sampling run per partition over batches of rows.
  *
  * Scale design: the Spark-side plumbing is the real thing —
  * `mapPartitions` with case-class encoders so each task decodes its
  * partition's batch locally (the pattern a Python stack expresses as
  * `mapInPandas`); binary payloads never shuffle unless the caller asks
  * for it, and feature rows are small. Partition sizing is controlled by
  * the upstream source (`maxPartitionBytes`), which bounds task memory.
  *
  * STUB boundary: this container has no image/audio codecs, so
  * [[MediaCodec.decodeStub]] derives features deterministically from the
  * bytes (length + md5 bits) instead of a real JPEG/PCM decode. The
  * function is the single seam to swap for a real codec; everything
  * around it (schema, batching, explode shape) is production plumbing.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])

  /** Decoded per-item features. */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int)

  /** One sampled frame of a (pseudo-)video payload. */
  final case class Frame(media_id: Long, frame_idx: Int, frame_hash: Long)

  object MediaCodec {
    /** Engine-portable 60-bit hash of raw bytes (same definition as
      * [[Hashing.md5Long]] — first 15 hex chars of md5). Delegates to
      * the [[graft.functions.Md5Hash]] kernel primitive (first 8 digest
      * bytes >>> 4 — bit-identical, no hex-string round trip): one
      * definition of the engine's hottest hash, one place it can ever
      * change. */
    def md5Long(bytes: Array[Byte]): Long =
      graft.functions.Md5Hash.hash(bytes)

    /** STUB decode: a real implementation would parse the container and
      * codec (JPEG/PNG/PCM/H.264) here. Deterministic fake: dimensions
      * derived from the content hash, so results are reproducible and
      * externally checkable. */
    def decodeStub(r: MediaRow): MediaFeatures = {
      val h = md5Long(r.content)
      MediaFeatures(r.media_id, r.kind, r.content.length,
        width = (16 + h % 1024).toInt,
        height = (16 + (h >> 10) % 1024).toInt)
    }

    /** md5 of raw bytes as the 32-char hex string. */
    def md5Hex(bytes: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map(b => f"$b%02x").mkString

    /** STUB perceptual hash: a real implementation decodes, downscales
      * to a small grayscale grid, and takes the difference hash (dHash
      * — bit i set iff pixel i is brighter than pixel i+1). Fake
      * pixels: 61 hex nibbles of md5(content) ++ md5(content ++ "1"),
      * a deterministic 0..15 "grayscale" grid the oracle recomputes.
      * `reenc` models a LOSSY RE-ENCODE: it perturbs pixels 7 and 31
      * by +1 (mod 16), which moves at most 2 dHash bits per pixel —
      * so a re-encoded copy sits within hamming distance 4 of its
      * original, the invariant the banding below relies on. 60 bits
      * keeps the packed hash positive (the engine-wide convention). */
    def dhashStub(content: Array[Byte], reenc: Int): Long = {
      val hex = md5Hex(content) + md5Hex(content ++ "1".getBytes("UTF-8"))
      val px = new Array[Int](61)
      var i = 0
      while (i < 61) { px(i) = Character.digit(hex.charAt(i), 16); i += 1 }
      if (reenc != 0) {
        px(7) = (px(7) + reenc) % 16
        px(31) = (px(31) + reenc) % 16
      }
      var h = 0L; i = 0
      while (i < 60) { if (px(i) > px(i + 1)) h |= (1L << i); i += 1 }
      h
    }
  }

  /** Per-partition batch decode: the `mapInPandas`-shaped plumbing.
    * Each task decodes its partition's rows locally; no shuffle. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(MediaCodec.decodeStub))
  }

  /** Resize plumbing: records the target dims in metadata; the payload
    * transform is part of the codec stub (a real impl re-encodes). */
  def resizeStub(features: Dataset[MediaFeatures], maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim) / greatest(col("width"), col("height")))
    features.toDF()
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame-sampling plumbing for video-kind payloads: emit `n` evenly
    * spaced pseudo-frames per item (hash-derived in the stub; a real
    * impl seeks and decodes keyframes). Output explodes 1→n — the same
    * shape a real sampler produces. */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      (0 until n).map(i => Frame(r.media_id, i,
        // per-frame hash: re-hash content with the frame index appended
        MediaCodec.md5Long(r.content ++ i.toString.getBytes("UTF-8"))))
    }
  }

  /** Wrap a DataFrame with (idCol: long, kindCol: string, payload
    * binary) into the typed media Dataset. */
  def asMedia(df: DataFrame, idCol: String, kindCol: String,
      contentCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
      col(kindCol).as("kind"),
      col(contentCol).cast("binary").as("content")).as[MediaRow]
  }
}
