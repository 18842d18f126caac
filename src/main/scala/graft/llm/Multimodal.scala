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
  * The codec seam is [[MediaCodec]]: [[FakeCodec]] is a deterministic
  * stand-in that parses the 8-byte GRFT test header and synthesizes
  * "pixels" from a byte rolling hash, so the Spark-side plumbing (schema,
  * encoders, batch shape, partitioning) is fully real and tested.
  * [[RealCodec]] decodes real formats with zero external dependencies:
  * JPEG/PNG/GIF via the JDK's own `javax.imageio` (standard library —
  * no binding needed), hand-rolled P6 PPM / 24-bit BMP / PCM WAV for
  * the containers ImageIO lacks, and A-law/µ-law (G.711) WAV through
  * `javax.sound.sampled`'s built-in companding converters. MP3/MP4
  * remain the boundary: OpenJDK ships no SPI for them, so they need an
  * external codec binding at this seam and fail loudly until one is
  * plugged in.
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

  /** Production codec, pure JVM, zero external dependencies: JPEG, PNG
    * and GIF decode through the JDK's standard `javax.imageio`; binary
    * PPM (P6) and 24-bit uncompressed BMP have hand decoders (ImageIO
    * has no PPM reader and this avoids its BMP edge cases); PCM WAV is a
    * RIFF chunk walk. All dispatched on the container's own magic bytes,
    * not the `kind` hint. Compressed audio/video (MP3/MP4) still needs
    * an external codec binding and fails loudly here.
    *
    * Conventions: for images `n_samples` is the PIXEL count (w·h) and the
    * checksum is the same 131-rolling-hash as [[FakeCodec]] over the
    * decoded pixel bytes in display order (BMP bottom-up storage is
    * normalized to top-down; byte order stays as stored, RGB for PPM /
    * BGR for BMP / packed-sRGB R,G,B for the ImageIO formats). For audio
    * `n_samples` is the PCM frame count and the checksum runs over the
    * raw data chunk.
    *
    * Robustness: header-declared sizes are validated in Long arithmetic
    * before any allocation or indexing — a malicious header (negative or
    * overflowing dims/chunk sizes) must die as IllegalArgumentException,
    * never hang an executor or return garbage silently.
    */
  object RealCodec extends MediaCodec {

    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    private def roll(cs0: Long, b: Array[Byte], from: Int, until: Int): Long = {
      var cs = cs0; var i = from
      while (i < until) { cs = (cs * 131 + (b(i) & 0xff)) % TextOps.HashP; i += 1 }
      cs
    }

    def decode(kind: String, bytes: Array[Byte]): Decoded = {
      require(bytes.length >= 3, "media payload too short for any container")
      if (bytes(0) == 'P' && bytes(1) == '6') decodePpm(kind, bytes)
      else if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(kind, bytes)
      else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N')
        decodeImageIo(kind, bytes) // PNG
      else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
        decodeImageIo(kind, bytes) // JPEG
      else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')
        decodeImageIo(kind, bytes) // GIF
      else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
        bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')
        decodeWav(kind, bytes)
      else throw new IllegalArgumentException(
        "RealCodec: unrecognized container (supported: JPEG, PNG, GIF, " +
          "P6 PPM, 24-bit uncompressed BMP, PCM WAV); compressed " +
          "audio/video needs an external codec binding")
    }

    /** Raster ceiling for ImageIO decodes: 64 MP (8192×8192 RGB ≈ 256 MB)
      * — the most a single executor task should ever allocate for one
      * row. A hostile header declaring huge dims must die on this check,
      * BEFORE `ImageIO.read` allocates the raster.
      */
    val MaxImagePixels: Long = 64L * 1024 * 1024

    /** Header-only dimension probe + bounded full decode. The reader API
      * reads width/height from the container header without decoding, so
      * a 70-byte payload claiming 40000×40000 is rejected with
      * IllegalArgumentException instead of an executor-killing OOM.
      * Memory-cached input stream (no ImageIO temp-file disk cache).
      */
    private[llm] def readImageBounded(b: Array[Byte]): java.awt.image.BufferedImage = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "ImageIO has no reader for this container")
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          require(w > 0 && h > 0, s"image dims ${w}x$h must be positive")
          require(w.toLong * h <= MaxImagePixels,
            s"image dims ${w}x$h exceed the $MaxImagePixels-pixel ceiling")
          val img = reader.read(0)
          require(img != null, "ImageIO failed to decode a recognized image container")
          img
        } finally reader.dispose()
      } finally iis.close()
    }

    /** JPEG/PNG/GIF via the JDK's standard `javax.imageio` — checksum
      * over packed-sRGB (R,G,B) bytes in display order, matching the
      * display-order convention of the hand decoders. Pixels come from
      * one bulk row-major `getRGB` (single sRGB conversion pass), not
      * per-pixel calls.
      */
    private def decodeImageIo(kind: String, b: Array[Byte]): Decoded = {
      val img = readImageBounded(b)
      val w = img.getWidth
      val h = img.getHeight
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      var cs = 0L
      var i = 0
      while (i < px.length) {
        val p = px(i)
        cs = (cs * 131 + ((p >> 16) & 0xff)) % TextOps.HashP
        cs = (cs * 131 + ((p >> 8) & 0xff)) % TextOps.HashP
        cs = (cs * 131 + (p & 0xff)) % TextOps.HashP
        i += 1
      }
      Decoded(-1L, kind, w, h, w.toLong * h, cs)
    }

    /** P6 PPM: "P6" <ws> width <ws> height <ws> maxval <one ws> raw RGB. */
    private def decodePpm(kind: String, b: Array[Byte]): Decoded = {
      var i = 2
      def nextInt(): Int = {
        // skip whitespace and '#'-to-EOL comments between header tokens
        var done = false
        while (!done) {
          while (i < b.length && (b(i) == ' ' || b(i) == '\t' ||
            b(i) == '\n' || b(i) == '\r')) i += 1
          if (i < b.length && b(i) == '#') {
            while (i < b.length && b(i) != '\n') i += 1
          } else done = true
        }
        // accumulate in Long with an explicit cap: Int accumulation
        // would wrap a hostile "4294967297" to 1 and slip past the
        // positive-dims guard below
        var v = 0L
        require(i < b.length && b(i) >= '0' && b(i) <= '9', "bad PPM header")
        while (i < b.length && b(i) >= '0' && b(i) <= '9') {
          v = v * 10 + (b(i) - '0')
          require(v <= Int.MaxValue, s"PPM header value $v overflows Int")
          i += 1
        }
        v.toInt
      }
      val w = nextInt(); val h = nextInt(); val maxval = nextInt()
      require(maxval > 0 && maxval < 256, s"PPM maxval $maxval unsupported (1 byte/channel only)")
      require(w > 0 && h > 0, s"PPM dims ${w}x$h must be positive")
      // same ceiling as readImageBounded — and it keeps every later size
      // expression in Long range: w=h=Int.MaxValue makes w.toLong*h*3
      // wrap Long (1.38e19 > 2^63-1) and slip past the truncation guard
      require(w.toLong * h <= MaxImagePixels,
        s"PPM dims ${w}x$h exceed the $MaxImagePixels-pixel ceiling")
      i += 1 // exactly one whitespace byte separates maxval from raster
      // size math in Long: 50000x50000x3 overflows Int, which would let
      // a malicious header pass the truncation guard and hash nothing
      val rasterLen = w.toLong * h * 3
      require(b.length - i >= rasterLen, "PPM raster truncated")
      Decoded(-1L, kind, w, h, w.toLong * h,
        roll(0L, b, i, i + rasterLen.toInt))
    }

    /** 24-bit uncompressed BMP (BITMAPINFOHEADER or larger); bottom-up
      * rows (the default) are hashed in top-down display order.
      */
    private def decodeBmp(kind: String, b: Array[Byte]): Decoded = {
      require(b.length >= 54, "BMP header truncated")
      val dataOffset = le32(b, 10)
      val w = le32(b, 18)
      val hRaw = le32(b, 22)
      val topDown = hRaw < 0
      val h = math.abs(hRaw)
      val bpp = le16(b, 28)
      val compression = le32(b, 30)
      require(bpp == 24, s"BMP bpp $bpp unsupported (24-bit only)")
      require(compression == 0, "compressed BMP unsupported")
      require(w > 0 && hRaw != 0 && hRaw != Int.MinValue,
        s"BMP dims ${w}x$hRaw must be positive width, non-zero height")
      // ceiling before any size math: rowSize*h with both dims near 2^31
      // exceeds Long range, wrapping negative past the truncation guard
      require(w.toLong * h <= MaxImagePixels,
        s"BMP dims ${w}x$h exceed the $MaxImagePixels-pixel ceiling")
      require(dataOffset >= 54 && dataOffset < b.length,
        s"BMP data offset $dataOffset outside payload")
      val rowSize = ((w.toLong * 3 + 3) / 4) * 4 // rows pad to 4-byte boundaries
      require(b.length >= dataOffset + rowSize * h, "BMP raster truncated")
      var cs = 0L
      var row = 0
      while (row < h) {
        val storedRow = if (topDown) row else h - 1 - row
        // guards above bound dataOffset + rowSize*h ≤ b.length: Int-safe
        val start = (dataOffset + storedRow * rowSize).toInt
        cs = roll(cs, b, start, start + w * 3) // padding bytes excluded
        row += 1
      }
      Decoded(-1L, kind, w, h, w.toLong * h, cs)
    }

    /** PCM WAV: RIFF chunk walk to fmt + data; frames = data / blockAlign.
      * Chunk sizes are attacker-controlled le32s: a negative size (or one
      * overflowing the remaining buffer) must fail loudly — the naive
      * `i += 8 + size` walk would step backward or stall, hanging the
      * executor in an infinite loop instead of erroring.
      */
    private def decodeWav(kind: String, b: Array[Byte]): Decoded = {
      var i = 12
      var channels = 0; var bits = 0
      var nSamples = -1L; var cs = 0L
      while (i + 8 <= b.length) {
        val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = le32(b, i + 4)
        require(size >= 0, s"WAV chunk '$id' has negative size $size")
        require(i + 8 + size.toLong <= b.length,
          s"WAV chunk '$id' size $size overflows the remaining payload")
        if (id == "fmt ") {
          // the PCM fmt chunk is 16 bytes; reading channel/bit fields
          // from a shorter chunk would index into the NEXT chunk's bytes
          require(size >= 16, s"WAV fmt chunk size $size < 16")
          val audioFormat = le16(b, i + 8)
          // companded telephony WAVs (A-law = 6, µ-law = 7) decode via
          // the JDK's own javax.sound.sampled conversion — still zero
          // external dependencies. The chunk walk above has already
          // validated the container structure, so the delegate never
          // sees an unwalkable payload. Everything else (ADPCM, MP3-in-
          // WAV fmt 0x55, extensible...) has no JDK codec and fails
          // loudly here, same as before.
          if (audioFormat == 6 || audioFormat == 7)
            return decodeWavCompanded(kind, b)
          require(audioFormat == 1,
            s"WAV audio format $audioFormat unsupported (PCM=1 exact; " +
              "A-law=6/mu-law=7 via javax.sound.sampled; compressed " +
              "formats need an external codec binding)")
          channels = le16(b, i + 10)
          bits = le16(b, i + 22)
        } else if (id == "data") {
          require(channels > 0 && bits > 0, "WAV data chunk before fmt")
          val bytesPerFrame = channels * bits / 8
          // bits 1..7 with one channel gives 0 bytes/frame — a crafted
          // header must fail loudly, not divide by zero
          require(bytesPerFrame > 0,
            s"WAV frame size 0 (channels=$channels, bits=$bits)")
          val end = i + 8 + size
          nSamples = (end - (i + 8)).toLong / bytesPerFrame
          cs = roll(0L, b, i + 8, end)
        }
        val next = i + 8 + size + (size & 1) // chunks are word-aligned
        require(next > i, s"WAV chunk walk must advance (chunk '$id' at $i)")
        i = next
      }
      require(nSamples >= 0, "WAV has no data chunk")
      Decoded(-1L, kind, 0, 0, nSamples, cs)
    }

    /** Frame ceiling for the companded-audio delegate: 2^26 frames
      * (≈ 22 min of stereo 16-bit at 48 kHz decodes to 256 MB) — same
      * role as [[MaxImagePixels]]: a hostile header must die on this
      * check, not on an allocation.
      */
    val MaxAudioFrames: Long = 1L << 26

    /** A-law / µ-law WAV via `javax.sound.sampled`: convert to
      * PCM_SIGNED and hash the DECODED stream in bounded 64 KB chunks
      * (never materializing the expanded audio), n_samples = frame
      * count. Companding tables are bit-exact by spec (G.711), so the
      * checksum is deterministic. Malformed-but-walkable payloads
      * surface as UnsupportedAudioFileException/IOException — loud,
      * matching the decoder contract.
      */
    private def decodeWavCompanded(kind: String, b: Array[Byte]): Decoded = {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val declaredFrames = in.getFrameLength
        require(declaredFrames >= 0 && declaredFrames <= MaxAudioFrames,
          s"WAV declares $declaredFrames frames, over the $MaxAudioFrames ceiling")
        val src = in.getFormat
        val pcm = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          src.getChannels * 2, src.getSampleRate, false)
        val dec = AudioSystem.getAudioInputStream(pcm, in)
        try {
          val buf = new Array[Byte](64 * 1024)
          var cs = 0L
          var total = 0L
          var n = dec.read(buf)
          while (n > 0) {
            cs = roll(cs, buf, 0, n)
            total += n
            // belt over the declared-frames suspender: a lying header
            // must not let the converted stream grow unbounded
            require(total <= MaxAudioFrames * pcm.getFrameSize,
              "companded WAV decoded past its declared frame count")
            n = dec.read(buf)
          }
          Decoded(-1L, kind, 0, 0, total / pcm.getFrameSize, cs)
        } finally dec.close()
      } finally in.close()
    }
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

  /** Real pixel resampling for JPEG/PNG/GIF payloads (dispatched on the
    * SAME magic-byte allowlist as [[RealCodec]]'s ImageIO path, so the
    * two agree on which formats are "ImageIO territory"): decode through
    * the dimension-bounded reader, scale the longer side down to
    * `maxSide` preserving aspect ratio (bilinear), re-encode as PNG
    * (lossless, deterministic on a given JDK). Everything else — GRFT
    * test containers, WAV audio, and the PPM/BMP hand formats with
    * their own checksum conventions — passes through byte-identical
    * (NOT magic-sniffed by ImageIO, which would silently transcode BMP
    * via the JDK's own BMP reader). A payload whose magic matches but
    * whose body fails to decode also passes through unchanged: resize
    * is a best-effort transform; [[decodeAll]] with [[RealCodec]] is
    * the loud validation path. Per-partition imperative loop like
    * [[decodeAll]]: the codec cost dominates, media rows never collect.
    */
  def resizePixels(media: Dataset[MediaRow], maxSide: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    def imageIoMagic(b: Array[Byte]): Boolean =
      b.length >= 3 &&
        (((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N') ||
          ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) ||
          (b(0) == 'G' && b(1) == 'I' && b(2) == 'F'))
    media.mapPartitions(_.map { r =>
      val img =
        if (!imageIoMagic(r.bytes)) null
        else try RealCodec.readImageBounded(r.bytes)
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null || math.max(img.getWidth, img.getHeight) <= maxSide) r
      else {
        val scale = maxSide.toDouble / math.max(img.getWidth, img.getHeight)
        val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
          math.max(1, (img.getHeight * scale).toInt))
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val buf = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", buf)
        r.copy(bytes = buf.toByteArray,
          meta_width = Some(w), meta_height = Some(h))
      }
    })
  }

  /** One 64-bit perceptual hash per image row. */
  case class DHash(media_id: Long, dhash: Long)

  /** Perceptual difference hash (dHash): decode, bilinear-shrink to a
    * 9×8 luma thumbnail, set bit (y·8 + x) when the pixel right of
    * (x, y) is strictly brighter — a gradient-sign fingerprint that
    * survives re-encoding, mild noise and rescaling, which content
    * checksums ([[Decoded.checksum]]) by design do not. The image
    * analog of SimHash: Hamming-close dHashes are perceptual near-dups.
    * Scope: the ImageIO formats (PNG/JPEG/GIF — same magic rule as
    * [[resizePixels]], deterministic on a given JDK); the PPM/BMP/WAV
    * hand formats are test containers with checksum semantics and yield
    * no row, as does any undecodable payload (best-effort transform;
    * [[decodeAll]] is the loud validation path). Per-partition loop,
    * pixels never leave the executor.
    */
  def dHashes(media: Dataset[MediaRow]): Dataset[DHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    def imageIoMagic(b: Array[Byte]): Boolean =
      b.length >= 3 &&
        (((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N') ||
          ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) ||
          (b(0) == 'G' && b(1) == 'I' && b(2) == 'F'))
    media.mapPartitions(_.flatMap { r =>
      val img =
        if (!imageIoMagic(r.bytes)) null
        else try RealCodec.readImageBounded(r.bytes)
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) None
      else {
        val thumb = new java.awt.image.BufferedImage(
          9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = thumb.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, 9, 8, null)
        } finally g.dispose()
        def luma(x: Int, y: Int): Int = {
          val p = thumb.getRGB(x, y)
          (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000
        }
        var h = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (luma(x + 1, y) > luma(x, y)) h |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        Some(DHash(r.media_id, h))
      }
    })
  }

  /** Hamming-close dHash pairs: 4 exact-match 16-bit band buckets (any
    * pair within Hamming 3 of 64 bits shares at least one band by
    * pigeonhole — the [[graft.llm.Dedup.simhashNearDups]] blocking
    * idea at image scale), `bit_count(xor)` confirms inside the join
    * stage. Bucket join only — never all-pairs; and because a hot band
    * key (flat/near-black thumbnails all hashing to 0, or a
    * mass-duplicated image) would silently turn one bucket's a×b join
    * into all-pairs-within-it, the banded frame runs through
    * [[graft.operators.CoreQueries.blockSizeGuard]] on (band, key):
    * the first bucket above `maxBucket` fails the JOB naming the key,
    * the same bounded-block contract every other near-dup path here
    * enforces (winnowing's df cap, label_noise_knn's cell guard).
    */
  def dHashNearDups(hashes: Dataset[DHash], maxHamming: Int,
                    maxBucket: Long = 1000L): DataFrame = {
    require(maxHamming <= 3,
      "4 bands of 16 bits guarantee recall only to Hamming 3 — widen the banding first")
    import org.apache.spark.sql.functions._
    val banded0 = hashes.toDF()
      .select(col("media_id"), col("dhash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("dhash"), b * 16).bitwiseAND(lit(0xffffL)).as("key"))): _*))
          .as("bk"))
      .select(col("media_id"), col("dhash"), col("bk.band"), col("bk.key"))
    val banded = graft.operators.CoreQueries.blockSizeGuard(
      banded0, Seq("band", "key"), maxBucket, "dHashNearDups")
    val a = banded.select(col("band"), col("key"),
      col("media_id").as("a_id"), col("dhash").as("a_h"))
    val b = banded.select(col("band"), col("key"),
      col("media_id").as("b_id"), col("dhash").as("b_h"))
    a.join(b, Seq("band", "key"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_h").bitwiseXOR(col("b_h"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Metadata-level resize: recompute target dimensions preserving aspect
    * ratio without touching pixels — the cheap planning pass when only
    * downstream sizing matters ([[resizePixels]] is the real resampler
    * for ImageIO-decodable payloads).
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
