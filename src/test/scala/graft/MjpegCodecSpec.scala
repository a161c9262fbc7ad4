package graft

import graft.pipelines.MultimodalFixture
import graft.sources.{JpegBinary, MediaBinary}

/** The MJPEG-in-AVI contracts (round 12 — the compressed-video rung):
  * the container round-trips with codec "mjpg" and per-frame sizes; the
  * frame seek genuinely entropy-decodes compressed chunks within the
  * JPEG quantization bound; feature pooling runs across decoded
  * compressed frames (the m7 path); and crafted/corrupt streams return
  * None, never throw.
  */
class MjpegCodecSpec extends SparkSpec {

  private def meanAbsErr(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length)
    var s = 0L
    for (i <- a.indices) s += math.abs((a(i) & 0xff) - (b(i) & 0xff))
    s.toDouble / a.length
  }

  test("round-trip: codec mjpg, dims/frames exact, decoded frames within the quantization bound") {
    for (id <- Seq(0L, 5L, 11L)) {
      val (w, h) = MultimodalFixture.mjpegDims(id)
      val n = MultimodalFixture.mjpegFrameCount(id)
      val bytes = MultimodalFixture.mjpegMedia(id)
      val m = MediaBinary.decodeAviMeta(bytes).get
      assert(m.codec == "mjpg" && m.width == w && m.height == h &&
        m.nFrames == n)
      assert(m.frameSizes.forall(_ > 0) &&
        m.frameSizes.toSet.size >= 1) // variable-size chunks carried
      for (k <- 0 until n) {
        val px = MediaBinary.aviFramePixels(bytes, m, k)
        assert(px.length == w * h * 3)
        val err = meanAbsErr(MultimodalFixture.mjpegFramePixels(id, k), px)
        // bound recalibrated for the round-13 wave generator (higher
        // spatial frequency quantizes a little harder than the old
        // gradients at q75: measured ~4.5 worst-frame vs ~2-3 before)
        assert(err < 6.0,
          s"frame $k of asset $id decode error too high: $err")
      }
    }
  }

  test("seek shape: sampling decodes only the sampled compressed frames") {
    // an asset with 5 frames sampled at n=2 must touch exactly frames
    // 0 and 2 (nFrames*i/take) — proven by decoding them directly and
    // matching the operator's emitted pixels
    val id = 3L // frameCount = 2 + 3%4 = 5
    val bytes = MultimodalFixture.mjpegMedia(id)
    val m = MediaBinary.decodeAviMeta(bytes).get
    assert(m.nFrames == 5)
    val expected = Seq(0, 2).map(k => MediaBinary.aviFramePixels(bytes, m, k))
    import spark.implicits._
    val ds = Seq(graft.operators.Multimodal.Asset(id, "video", bytes)).toDS()
    val frames = graft.operators.Multimodal.sampleFrames(ds, 2)
      .collect().sortBy(_.frame_index)
    assert(frames.length == 2)
    assert(java.util.Arrays.equals(frames(0).frame, expected(0)))
    assert(java.util.Arrays.equals(frames(1).frame, expected(1)))
    assert(frames(1).offset_ms ==
      2L * MultimodalFixture.AviUsPerFrame / 1000L)
  }

  test("m7 path: features pool across decoded compressed frames") {
    val id = 7L
    val bytes = MultimodalFixture.mjpegMedia(id)
    val m = MediaBinary.decodeAviMeta(bytes).get
    import spark.implicits._
    val ds = Seq(graft.operators.Multimodal.Asset(id, "video", bytes)).toDS()
    val feats = graft.operators.Multimodal.extractFeatures(ds, dim = 16)
      .collect().head.features
    // recompute the temporal pooling over the per-frame entropy decodes
    val sums = new Array[Long](16); val counts = new Array[Long](16)
    for (k <- 0 until m.nFrames) {
      val px = MediaBinary.aviFramePixels(bytes, m, k)
      for (y <- 0 until m.height; x <- 0 until m.width) {
        val cell = (y * 4 / m.height) * 4 + x * 4 / m.width
        val p = (y * m.width + x) * 3
        sums(cell) += (px(p) & 0xff) + (px(p + 1) & 0xff) + (px(p + 2) & 0xff)
        counts(cell) += 3
      }
    }
    for (i <- 0 until 16)
      assert(feats(i) == sums(i).toDouble / counts(i).toDouble,
        s"feature $i diverged from pooled decoded frames")
    // and the pooled means track the PRE-ENCODE content (lossy bound)
    val origSums = new Array[Long](16); val origCounts = new Array[Long](16)
    for (k <- 0 until m.nFrames) {
      val px = MultimodalFixture.mjpegFramePixels(id, k)
      for (y <- 0 until m.height; x <- 0 until m.width) {
        val cell = (y * 4 / m.height) * 4 + x * 4 / m.width
        val p = (y * m.width + x) * 3
        origSums(cell) += (px(p) & 0xff) + (px(p + 1) & 0xff) + (px(p + 2) & 0xff)
        origCounts(cell) += 3
      }
    }
    for (i <- 0 until 16) {
      val orig = origSums(i).toDouble / origCounts(i).toDouble
      assert(math.abs(feats(i) - orig) < 4.0,
        s"feature $i drifted from pre-encode content: ${feats(i)} vs $orig")
    }
  }

  test("defensive decode: corrupt SOI, truncation, frame-count lie -> None") {
    val id = 1L
    val bytes = MultimodalFixture.mjpegMedia(id)
    assert(MediaBinary.decodeAviMeta(bytes).isDefined)
    // corrupt the first frame's SOI marker (movi data starts at 236:
    // canonical 224-byte header tree + LIST/movi preamble)
    val m = MediaBinary.decodeAviMeta(bytes).get
    val soi = bytes.clone(); soi(m.frameOffsets(0)) = 0x00
    assert(MediaBinary.decodeAviMeta(soi).isEmpty)
    // truncate mid-movi
    assert(MediaBinary.decodeAviMeta(bytes.take(bytes.length - 10)).isEmpty)
    // header claims one more frame than movi holds
    val lie = bytes.clone()
    def wle32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    wle32(lie, 48, m.nFrames + 1)
    assert(MediaBinary.decodeAviMeta(lie).isEmpty)
    // a frame whose entropy decode fails (body corrupted past SOI) is a
    // zero frame, not a throw
    val body = bytes.clone()
    for (i <- 8 until math.min(200, m.frameSizes(0) - 8))
      body(m.frameOffsets(0) + i) = 0x55
    MediaBinary.decodeAviMeta(body).foreach { mm =>
      val px = MediaBinary.aviFramePixels(body, mm, 0)
      assert(px.length == mm.width * mm.height * 3)
    }
  }
}
