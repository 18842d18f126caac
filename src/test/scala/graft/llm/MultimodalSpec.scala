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
}
