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

  test("RealCodec is an explicit unimplemented seam") {
    intercept[NotImplementedError] {
      RealCodec.decode("image", Array[Byte](1, 2, 3))
    }
  }
}
