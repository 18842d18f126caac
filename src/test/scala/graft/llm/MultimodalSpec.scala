package graft.llm

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import Multimodal._

  private lazy val media = synthMedia(spark, n = 12, payloadLen = 4096)

  test("synthesized media conforms to the canonical schema") {
    val df = media.toDF()
    assert(df.schema.fieldNames.toSeq === mediaSchema.fieldNames.toSeq)
    assert(df.count() === 12L)
  }

  test("decode parses header metadata and is deterministic") {
    val d1 = decodeAll(media, FakeCodec).collect().sortBy(_.media_id)
    val d2 = decodeAll(media, FakeCodec).collect().sortBy(_.media_id)
    assert(d1.toSeq === d2.toSeq)
    val first = d1.head
    assert(first.width === 64 && first.height === 48)
    assert(first.n_samples === 4096L)
    assert(d1.map(_.checksum).distinct.length > 1, "checksums should vary by content")
  }

  test("featureize yields fixed-dim vectors in [0,1) and distinguishes content") {
    val f = featureize(media, dim = 16).collect().sortBy(_.media_id)
    assert(f.forall(_.feature.length === 16))
    assert(f.forall(_.feature.forall(v => v >= 0f && v < 1f)))
    assert(f(0).feature.toSeq !== f(1).feature.toSeq)
    // determinism
    val f2 = featureize(media, dim = 16).collect().sortBy(_.media_id)
    assert(f.map(_.feature.toSeq).toSeq === f2.map(_.feature.toSeq).toSeq)
  }

  test("frameSample emits n evenly-spaced frames of the requested length") {
    val frames = frameSample(media, n = 4, frameLen = 256).collect()
    assert(frames.length === 12 * 4)
    assert(frames.forall(_.frame_bytes.length === 256))
    val perDoc = frames.groupBy(_.media_id)
    assert(perDoc.values.forall(_.map(_.frame_idx).sorted.toSeq === Seq(0, 1, 2, 3)))
    // frames of one media differ (payload varies along its length)
    val f0 = perDoc(0L).sortBy(_.frame_idx)
    assert(f0(0).frame_bytes.toSeq !== f0(1).frame_bytes.toSeq)
  }

  test("resizeMeta caps the longer side preserving aspect ratio") {
    val resized = resizeMeta(media, maxSide = 100).collect().sortBy(_.media_id)
    val orig = media.collect().sortBy(_.media_id)
    resized.zip(orig).foreach { case (r, o) =>
      val (w, h) = (o.meta_width.get, o.meta_height.get)
      if (math.max(w, h) > 100) {
        assert(math.max(r.meta_width.get, r.meta_height.get) === 100)
        val ratioBefore = w.toDouble / h
        val ratioAfter = r.meta_width.get.toDouble / r.meta_height.get
        assert(math.abs(ratioBefore - ratioAfter) / ratioBefore < 0.05)
      } else assert(r.meta_width === o.meta_width && r.meta_height === o.meta_height)
    }
  }

  // ---- RealCodec: pure-JVM decoders for real uncompressed formats ----

  /** Same rolling hash the codecs use, for hand-computed expectations. */
  private def roll(bs: Seq[Int]): Long =
    bs.foldLeft(0L)((cs, b) => (cs * 131 + (b & 0xff)) % TextOps.HashP)

  test("RealCodec decodes P6 PPM (with header comment) to exact pixels") {
    val pixels = Seq(255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30) // 2x2 RGB
    val header = "P6\n# a comment\n2 2\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val d = RealCodec.decode("image", header ++ pixels.map(_.toByte))
    assert(d.width === 2 && d.height === 2)
    assert(d.n_samples === 4L, "n_samples is the pixel count")
    assert(d.checksum === roll(pixels))
  }

  test("RealCodec decodes bottom-up padded 24-bit BMP in display order") {
    // 3x2: stored rows are padded to 4 bytes (9 -> 12) and bottom-up, so
    // the DISPLAY-order hash must read the second stored row first
    val topRow = Seq(1, 2, 3, 4, 5, 6, 7, 8, 9)       // display row 0 (BGR)
    val bottomRow = Seq(9, 8, 7, 6, 5, 4, 3, 2, 1)    // display row 1
    val rowSize = 12
    val dataOffset = 54
    val raster =
      (bottomRow ++ Seq(0, 0, 0)) ++ (topRow ++ Seq(0, 0, 0)) // stored order
    val b = new Array[Byte](dataOffset + 2 * rowSize)
    def le32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    le32(2, b.length); le32(10, dataOffset); le32(14, 40)
    le32(18, 3); le32(22, 2) // width 3, height +2 = bottom-up
    b(26) = 1; b(28) = 24    // planes, bpp
    le32(30, 0)              // BI_RGB
    raster.zipWithIndex.foreach { case (v, i) => b(dataOffset + i) = v.toByte }
    val d = RealCodec.decode("image", b)
    assert(d.width === 3 && d.height === 2 && d.n_samples === 6L)
    assert(d.checksum === roll(topRow ++ bottomRow),
      "padding excluded, rows flipped to display order")
  }

  test("RealCodec decodes PCM WAV frames and rejects non-PCM") {
    // 16-bit stereo, 3 frames = 12 data bytes
    val data = Seq(1, 0, 2, 0, 3, 0, 4, 0, 5, 0, 6, 0)
    def chunk(id: String, payload: Seq[Int]): Seq[Int] =
      id.map(_.toInt) ++ Seq(payload.length & 0xff, (payload.length >> 8) & 0xff, 0, 0) ++ payload
    val fmt = Seq(1, 0, 2, 0, 0x80, 0x3e, 0, 0, 0, 0xfa, 0, 0, 4, 0, 16, 0)
    val body = "WAVE".map(_.toInt) ++ chunk("fmt ", fmt) ++ chunk("data", data)
    val wav = ("RIFF".map(_.toInt) ++
      Seq(body.length & 0xff, (body.length >> 8) & 0xff, 0, 0) ++ body)
      .map(_.toByte).toArray
    val d = RealCodec.decode("audio", wav)
    assert(d.n_samples === 3L, "12 bytes / (2 ch * 2 bytes) = 3 frames")
    assert(d.width === 0 && d.height === 0)
    assert(d.checksum === roll(data))
    // flipping audioFormat to 2 (ADPCM) must fail loudly
    val bad = wav.clone(); bad(20) = 2
    intercept[IllegalArgumentException] { RealCodec.decode("audio", bad) }
  }

  /** Render a deterministic RGB test card and return (image, its
    * display-order packed-sRGB R,G,B byte stream for the expected hash).
    */
  private def testCard(w: Int, h: Int): (java.awt.image.BufferedImage, Seq[Int]) = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 37 + y) % 256 << 16) | ((y * 83) % 256 << 8) | ((x * 11 + y * 29) % 256))
    val bytes = for (y <- 0 until h; x <- 0 until w;
                     b <- { val p = img.getRGB(x, y)
                            Seq((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) })
      yield b
    (img, bytes)
  }

  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"JDK must ship a $fmt writer")
    out.toByteArray
  }

  test("RealCodec decodes PNG via javax.imageio to exact pixels") {
    val (img, expected) = testCard(5, 4)
    val png = encode(img, "png")
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P', "fixture really is a PNG")
    val d = RealCodec.decode("image", png)
    assert(d.width === 5 && d.height === 4 && d.n_samples === 20L)
    // PNG is lossless: the checksum must equal the source-pixel hash
    assert(d.checksum === roll(expected))
  }

  test("RealCodec decodes JPEG via javax.imageio (lossy: dims exact, hash stable)") {
    val (img, _) = testCard(16, 9)
    val jpg = encode(img, "jpg")
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8, "fixture really is a JPEG")
    val d1 = RealCodec.decode("image", jpg)
    val d2 = RealCodec.decode("image", jpg)
    assert(d1.width === 16 && d1.height === 9 && d1.n_samples === 144L)
    assert(d1.checksum === d2.checksum, "decode must be deterministic")
  }

  test("RealCodec decodes PNG and JPEG through decodeAll and featureize plumbing") {
    import spark.implicits._
    val (img, expected) = testCard(6, 6)
    val rows = spark.createDataset(Seq(
      MediaRow(1L, "image", encode(img, "png"), Some(6), Some(6), None),
      MediaRow(2L, "image", encode(img, "jpg"), Some(6), Some(6), None)))
    val decoded = decodeAll(rows, RealCodec).collect().sortBy(_.media_id)
    assert(decoded.map(_.media_id).toSeq === Seq(1L, 2L))
    assert(decoded.forall(d => d.width == 6 && d.height == 6 && d.n_samples == 36L))
    assert(decoded(0).checksum === roll(expected), "PNG round-trips exactly")
    val feats = featureize(rows, dim = 8).collect()
    assert(feats.length === 2 && feats.forall(_.feature.length == 8))
  }

  test("resizePixels resamples ImageIO payloads and passes others through") {
    import spark.implicits._
    val (big, _) = testCard(200, 100)
    val (small, _) = testCard(40, 20)
    val grft = FakeCodec.encodeHeader("image", 64, 48) ++ Array[Byte](1, 2, 3, 4)
    val rows = spark.createDataset(Seq(
      MediaRow(1L, "image", encode(big, "png"), Some(200), Some(100), None),
      MediaRow(2L, "image", encode(big, "jpg"), Some(200), Some(100), None),
      MediaRow(3L, "image", encode(small, "png"), Some(40), Some(20), None),
      MediaRow(4L, "image", grft, Some(64), Some(48), None)))
    val out = resizePixels(rows, maxSide = 100).collect().sortBy(_.media_id)
    // both oversized payloads shrink to 100x50 and re-decode at that size
    Seq(out(0), out(1)).foreach { r =>
      assert(r.meta_width === Some(100) && r.meta_height === Some(50))
      val d = RealCodec.decode("image", r.bytes)
      assert(d.width === 100 && d.height === 50)
    }
    // within-bound and non-ImageIO payloads are byte-identical pass-throughs
    assert(out(2).bytes.toSeq === encode(small, "png").toSeq)
    assert(out(3).bytes.toSeq === grft.toSeq)
    // deterministic: re-running produces identical bytes
    val out2 = resizePixels(rows, maxSide = 100).collect().sortBy(_.media_id)
    assert(out.map(_.bytes.toSeq).toSeq === out2.map(_.bytes.toSeq).toSeq)
  }

  // ---- malicious-header hardening: fail loudly, never hang or lie ----

  test("WAV with a negative or overflowing chunk size fails loudly, never loops") {
    val data = Seq(1, 0, 2, 0)
    def chunk(id: String, payload: Seq[Int]): Seq[Int] =
      id.map(_.toInt) ++ Seq(payload.length & 0xff, (payload.length >> 8) & 0xff, 0, 0) ++ payload
    val fmt = Seq(1, 0, 2, 0, 0x80, 0x3e, 0, 0, 0, 0xfa, 0, 0, 4, 0, 16, 0)
    val body = "WAVE".map(_.toInt) ++ chunk("fmt ", fmt) ++ chunk("data", data)
    val wav = ("RIFF".map(_.toInt) ++
      Seq(body.length & 0xff, (body.length >> 8) & 0xff, 0, 0) ++ body)
      .map(_.toByte).toArray
    // fmt chunk size -> 0xFFFFFFFF (-1): the naive walk would step backward
    val negSize = wav.clone()
    (16 until 20).foreach(i => negSize(i) = 0xff.toByte)
    intercept[IllegalArgumentException] { RealCodec.decode("audio", negSize) }
    // fmt chunk size -8: 8 + size == 0, the walk would stall in place
    val stall = wav.clone()
    stall(16) = 0xf8.toByte; stall(17) = 0xff.toByte
    stall(18) = 0xff.toByte; stall(19) = 0xff.toByte
    intercept[IllegalArgumentException] { RealCodec.decode("audio", stall) }
    // data chunk size overflowing the remaining payload must be loud too
    val overflow = wav.clone()
    overflow(wav.length - data.length - 4) = 0x7f.toByte
    intercept[IllegalArgumentException] { RealCodec.decode("audio", overflow) }
  }

  test("ImageIO decode rejects huge declared dims BEFORE allocating the raster") {
    // a tiny PNG whose IHDR claims 40000x40000: the header-only dim
    // probe must throw IllegalArgumentException, never OOM the executor
    val (img, _) = testCard(4, 4)
    val png = encode(img, "png")
    // IHDR starts at byte 16: width(4) height(4) big-endian
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    val huge = png.clone()
    Array.copy(be32(40000), 0, huge, 16, 4)
    Array.copy(be32(40000), 0, huge, 20, 4)
    val ex = intercept[IllegalArgumentException] { RealCodec.decode("image", huge) }
    assert(ex.getMessage.contains("ceiling") || ex.getMessage.contains("reader"),
      s"must die on the dim ceiling, got: ${ex.getMessage}")
  }

  test("PPM header values that overflow Int fail loudly instead of wrapping") {
    // 4294967297 mod 2^32 = 1 would slip past the positive-dims guard
    val wrap = "P6\n4294967297 1\n255\n".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII) ++ Array[Byte](1, 2, 3)
    val ex = intercept[IllegalArgumentException] { RealCodec.decode("image", wrap) }
    assert(ex.getMessage.contains("overflows Int"))
  }

  test("WAV with zero-byte frames or a short fmt chunk fails loudly") {
    def chunk(id: String, payload: Seq[Int]): Seq[Int] =
      id.map(_.toInt) ++ Seq(payload.length & 0xff, (payload.length >> 8) & 0xff, 0, 0) ++ payload
    def wav(fmt: Seq[Int]): Array[Byte] = {
      val data = Seq(1, 0, 2, 0)
      val body = "WAVE".map(_.toInt) ++ chunk("fmt ", fmt) ++ chunk("data", data)
      ("RIFF".map(_.toInt) ++
        Seq(body.length & 0xff, (body.length >> 8) & 0xff, 0, 0) ++ body)
        .map(_.toByte).toArray
    }
    // bits=4, channels=1: bytesPerFrame = 0 — must not divide by zero
    val fmt4bit = Seq(1, 0, 1, 0, 0x80, 0x3e, 0, 0, 0, 0xfa, 0, 0, 4, 0, 4, 0)
    val ex1 = intercept[IllegalArgumentException] { RealCodec.decode("audio", wav(fmt4bit)) }
    assert(ex1.getMessage.contains("frame size 0"))
    // fmt chunk declaring only 2 bytes: field reads would leave the chunk
    val ex2 = intercept[IllegalArgumentException] { RealCodec.decode("audio", wav(Seq(1, 0))) }
    assert(ex2.getMessage.contains("fmt chunk size"))
  }

  test("resizePixels leaves BMP payloads untouched (ImageIO would transcode them)") {
    import spark.implicits._
    // a big 24-bit BMP the JDK's own BMP reader COULD decode: the magic
    // allowlist must pass it through byte-identical, preserving the BGR
    // checksum convention
    val w = 150; val h = 120; val rowSize = ((w * 3 + 3) / 4) * 4
    val b = new Array[Byte](54 + rowSize * h)
    def le32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    le32(2, b.length); le32(10, 54); le32(14, 40)
    le32(18, w); le32(22, h)
    b(26) = 1; b(28) = 24; le32(30, 0)
    val rows = spark.createDataset(Seq(
      MediaRow(1L, "image", b, Some(w), Some(h), None)))
    val out = resizePixels(rows, maxSide = 100).collect()
    assert(out.head.bytes.toSeq === b.toSeq,
      "BMP is hand-decoder territory - resize must not silently transcode it")
  }

  test("PPM/BMP with overflowing or non-positive header dims fail loudly") {
    // 50000*50000*3 overflows Int to negative: the old guard passed and
    // returned a garbage Decoded silently
    val ppm = "P6\n50000 50000\n255\n".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII) ++ Array[Byte](1, 2, 3)
    intercept[IllegalArgumentException] { RealCodec.decode("image", ppm) }
    val zero = "P6\n0 3\n255\n".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII) ++ Array[Byte](1, 2, 3)
    intercept[IllegalArgumentException] { RealCodec.decode("image", zero) }
    // BMP with negative le32 width
    val b = new Array[Byte](60)
    def le32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    le32(10, 54); le32(14, 40); le32(18, -5); le32(22, 1)
    b(28) = 24
    intercept[IllegalArgumentException] { RealCodec.decode("image", b) }
  }

  test("RealCodec flows through the distributed decode path and rejects unknowns") {
    import spark.implicits._
    val px = Seq.tabulate(27)(i => i * 7 % 256) // 3x3 PPM
    val ppm = ("P6\n3 3\n255\n".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII) ++ px.map(_.toByte))
    val rows = spark.createDataset(Seq(
      MediaRow(1L, "image", ppm, Some(3), Some(3), None),
      MediaRow(2L, "image", ppm, Some(3), Some(3), None)))
    val decoded = decodeAll(rows, RealCodec).collect().sortBy(_.media_id)
    assert(decoded.map(_.media_id).toSeq === Seq(1L, 2L))
    assert(decoded.forall(d => d.width == 3 && d.height == 3 &&
      d.n_samples == 9L && d.checksum == roll(px)))
    intercept[IllegalArgumentException] {
      RealCodec.decode("image", Array[Byte](1, 2, 3))
    }
  }

  /** Build a minimal single-chunk-pair WAV with an arbitrary fmt tag. */
  private def wavWithFormat(audioFormat: Int, channels: Int, bits: Int,
                            data: Seq[Int]): Array[Byte] = {
    def chunk(id: String, payload: Seq[Int]): Seq[Int] =
      id.map(_.toInt) ++ Seq(payload.length & 0xff, (payload.length >> 8) & 0xff, 0, 0) ++ payload
    val blockAlign = math.max(1, channels * bits / 8)
    val rate = 8000
    val byteRate = rate * blockAlign
    val fmt = Seq(audioFormat & 0xff, (audioFormat >> 8) & 0xff,
      channels & 0xff, (channels >> 8) & 0xff,
      rate & 0xff, (rate >> 8) & 0xff, (rate >> 16) & 0xff, 0,
      byteRate & 0xff, (byteRate >> 8) & 0xff, (byteRate >> 16) & 0xff, 0,
      blockAlign & 0xff, (blockAlign >> 8) & 0xff, bits & 0xff, (bits >> 8) & 0xff)
    val body = "WAVE".map(_.toInt) ++ chunk("fmt ", fmt) ++ chunk("data", data)
    ("RIFF".map(_.toInt) ++
      Seq(body.length & 0xff, (body.length >> 8) & 0xff, 0, 0) ++ body)
      .map(_.toByte).toArray
  }

  test("mu-law WAV decodes through javax.sound.sampled, bit-deterministic") {
    // G.711: mu-law byte 0xFF decodes to PCM 0, so an all-0xFF payload
    // hashes to exactly 0 — a hand-computable expectation through the
    // JDK's converter (131-rolling-hash of all-zero bytes stays 0)
    val silent = wavWithFormat(7, channels = 1, bits = 8, data = Seq.fill(10)(0xff))
    val d = RealCodec.decode("audio", silent)
    assert(d.n_samples === 10L, "one mu-law byte per mono frame")
    assert(d.checksum === 0L, "0xFF mu-law = PCM silence = zero hash")
    // non-silent payload: deterministic across decodes, nonzero
    val tone = wavWithFormat(7, channels = 1, bits = 8,
      data = Seq.tabulate(16)(i => (i * 9 + 1) % 256))
    val t1 = RealCodec.decode("audio", tone)
    val t2 = RealCodec.decode("audio", tone)
    assert(t1.n_samples === 16L && t1.checksum === t2.checksum)
    assert(t1.checksum !== 0L)
  }

  test("A-law WAV decodes; MP3-in-WAV and ADPCM still fail loudly") {
    val alaw = wavWithFormat(6, channels = 2, bits = 8,
      data = Seq.tabulate(12)(i => (i * 41 + 3) % 256))
    val d = RealCodec.decode("audio", alaw)
    assert(d.n_samples === 6L, "two A-law bytes per stereo frame")
    assert(d.width === 0 && d.height === 0)
    val mp3InWav = wavWithFormat(0x55, channels = 1, bits = 0, data = Seq.fill(8)(0))
    val e1 = intercept[IllegalArgumentException] { RealCodec.decode("audio", mp3InWav) }
    assert(e1.getMessage.contains("external codec"))
    val adpcm = wavWithFormat(2, channels = 1, bits = 4, data = Seq.fill(8)(0))
    intercept[IllegalArgumentException] { RealCodec.decode("audio", adpcm) }
  }

  test("dHash: re-encoded and lightly-perturbed images stay Hamming-close; " +
       "structurally different images do not; non-images yield no hash") {
    import spark.implicits._
    import Multimodal._
    val (card, _) = testCard(64, 48)
    // same pixels through two encoders -> identical thumbnails -> equal hash
    val png = encode(card, "png")
    // light perturbation: one corner pixel flipped
    val tweaked = new java.awt.image.BufferedImage(
      64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64) tweaked.setRGB(x, y, card.getRGB(x, y))
    tweaked.setRGB(0, 0, 0xffffff)
    // structurally different: horizontal gradient vs the test card
    val grad = new java.awt.image.BufferedImage(
      64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64)
      grad.setRGB(x, y, (x * 4 << 16) | (x * 4 << 8) | (x * 4))
    val rows = Seq(
      MediaRow(1L, "image", png, None, None, None),
      MediaRow(2L, "image", png, None, None, None),
      MediaRow(3L, "image", encode(tweaked, "png"), None, None, None),
      MediaRow(4L, "image", encode(grad, "png"), None, None, None),
      MediaRow(5L, "text", "not an image".getBytes, None, None, None))
    val hs = dHashes(rows.toDS()).collect().map(h => h.media_id -> h.dhash).toMap
    assert(!hs.contains(5L), "non-image payloads yield no hash")
    assert(hs(1L) === hs(2L), "byte-identical images hash identically")
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(3L)) <= 3,
      "a one-pixel tweak moves the 9x8 gradient fingerprint at most slightly")
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(4L)) > 10,
      "a different structure is Hamming-far")
    val pairs = dHashNearDups(dHashes(rows.toDS()), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) &&
      pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    intercept[IllegalArgumentException] {
      dHashNearDups(dHashes(rows.toDS()), maxHamming = 9)
    }
  }
}
