package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media rides through Spark as an opaque `binary` column with
  * typed metadata, and decode / feature-extract / frame-sample run as
  * per-partition imperative batch transforms over `Dataset[T]` — the one
  * place `mapPartitions` is the right Spark tool (per-element codec calls
  * with per-partition setup cost, not expressible as Catalyst
  * expressions).
  *
  * The actual codec (JPEG/PNG/WAV decode) is NOT implemented — this
  * container has no imaging libraries. The seam is [[MediaCodec]]:
  * [[FakeCodec]] is a deterministic stand-in that parses the 8-byte GRFT
  * test header and synthesizes "pixels" from a byte rolling hash, so the
  * Spark-side plumbing (schema, encoders, batch shape, partitioning) is
  * fully real and tested; [[RealCodec]] marks where a production codec
  * plugs in.
  *
  * Scale notes: rows carry payloads of MBs — keep
  * `spark.sql.files.maxPartitionBytes` low enough that a partition of
  * media rows fits in executor memory, and never `collect()` media rows.
  * All transforms here are map-side only (no shuffle); frame sampling
  * fans rows out map-side via iterator flatMap, not explode-after-decode
  * materialization.
  */
object Multimodal {

  /** Canonical schema for a multimodal media table. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta_width", IntegerType, nullable = true),
    StructField("meta_height", IntegerType, nullable = true),
    StructField("meta_sample_rate", IntegerType, nullable = true)))

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                      meta_width: Option[Int], meta_height: Option[Int],
                      meta_sample_rate: Option[Int])

  case class Decoded(media_id: Long, kind: String, width: Int, height: Int,
                     n_samples: Long, checksum: Long)

  case class Feature(media_id: Long, feature: Array[Float])

  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Codec seam: decode raw bytes into dimensions + a content checksum. */
  trait MediaCodec extends Serializable {
    def decode(kind: String, bytes: Array[Byte]): Decoded
  }

  /** GRFT test container: magic "GR", kind byte, width/height as
    * big-endian int16, then the payload. Deterministic: checksum is a
    * rolling hash of the payload.
    */
  object FakeCodec extends MediaCodec {
    val HeaderLen = 8
    def encodeHeader(kind: String, width: Int, height: Int): Array[Byte] =
      Array('G'.toByte, 'R'.toByte, kind.head.toByte, 0,
        (width >> 8).toByte, width.toByte, (height >> 8).toByte, height.toByte)

    def decode(kind: String, bytes: Array[Byte]): Decoded = {
      require(bytes.length >= HeaderLen && bytes(0) == 'G' && bytes(1) == 'R',
        "not a GRFT container")
      val w = ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)
      val h = ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
      var cs = 0L
      var i = HeaderLen
      while (i < bytes.length) { cs = (cs * 131 + (bytes(i) & 0xff)) % TextOps.HashP; i += 1 }
      Decoded(-1L, kind, w, h, bytes.length - HeaderLen, cs)
    }
  }

  /** Production codec seam — intentionally unimplemented here (no imaging
    * libraries in this environment); swap in a JNI/Java codec binding.
    */
  object RealCodec extends MediaCodec {
    def decode(kind: String, bytes: Array[Byte]): Decoded =
      throw new NotImplementedError(
        "RealCodec requires an imaging/audio library; use FakeCodec in tests")
  }

  /** Read a media DataFrame as the typed Dataset. */
  def asMedia(df: DataFrame): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[MediaRow]
  }

  /** Decode each row (per-partition batch loop — codec setup happens once
    * per partition, mirroring how a real decoder would hold native
    * context).
    */
  def decodeAll(media: Dataset[MediaRow], codec: MediaCodec): Dataset[Decoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r => codec.decode(r.kind, r.bytes).copy(media_id = r.media_id) }
    }
  }

  /** Fixed-dimension float feature vector per media row: payload bytes are
    * folded into `dim` rolling-hash buckets and scaled to [0, 1) — a
    * deterministic stand-in for a real embedding model, with the exact
    * batch shape (Iterator[row] → Iterator[id, Array[Float]]) a model
    * runner needs.
    */
  def featureize(media: Dataset[MediaRow], dim: Int): Dataset[Feature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val acc = new Array[Long](dim)
        var i = FakeCodec.HeaderLen
        while (i < r.bytes.length) {
          val b = i % dim
          acc(b) = (acc(b) * 131 + (r.bytes(i) & 0xff)) % TextOps.HashP
          i += 1
        }
        Feature(r.media_id, acc.map(v => (v.toDouble / TextOps.HashP).toFloat))
      }
    }
  }

  /** Sample up to `n` evenly-spaced fixed-size frames from each payload —
    * map-side fan-out via iterator flatMap (video → frame rows without
    * materializing all frames of a partition at once).
    */
  def frameSample(media: Dataset[MediaRow], n: Int, frameLen: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val payloadLen = r.bytes.length - FakeCodec.HeaderLen
        val frames = math.min(n, math.max(payloadLen / frameLen, 0))
        (0 until frames).iterator.map { f =>
          val start = FakeCodec.HeaderLen + (payloadLen.toLong * f / frames).toInt
          val len = math.min(frameLen, r.bytes.length - start)
          Frame(r.media_id, f, java.util.Arrays.copyOfRange(r.bytes, start, start + len))
        }
      }
    }
  }

  /** Metadata-level resize: recompute target dimensions preserving aspect
    * ratio. Pixel resampling itself is codec territory (see [[RealCodec]]);
    * the returned frame keeps the original payload with updated metadata,
    * which is what downstream shuffles/sinks see anyway.
    */
  def resizeMeta(media: Dataset[MediaRow], maxSide: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      (r.meta_width, r.meta_height) match {
        case (Some(w), Some(h)) if math.max(w, h) > maxSide =>
          val scale = maxSide.toDouble / math.max(w, h)
          r.copy(meta_width = Some(math.max(1, (w * scale).toInt)),
            meta_height = Some(math.max(1, (h * scale).toInt)))
        case _ => r
      }
    }
  }

  /** Synthesize a deterministic media table (GRFT containers) — test/demo
    * generator, seeded by id only.
    */
  def synthMedia(spark: SparkSession, n: Int, payloadLen: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kind = Seq("image", "audio", "video")(id.toInt % 3)
      val w = 64 + (id.toInt % 8) * 32
      val h = 48 + (id.toInt % 5) * 32
      val payload = Array.tabulate(payloadLen)(i => ((id * 131 + i * 31) % 251).toByte)
      MediaRow(id, kind, FakeCodec.encodeHeader(kind, w, h) ++ payload,
        Some(w), Some(h), if (kind == "audio") Some(16000) else None)
    }
  }
}
