package graft

import graft.pipelines.MultimodalFixture
import graft.sources.JpegBinary

/** The baseline-JPEG codec contracts (sources.JpegBinary — ITU-T T.81
  * sequential DCT, Annex K tables): lossy round-trip within a
  * quantization-error bound, bit-exact determinism, independent
  * cross-validation against the JDK's own JPEG decoder (ImageIO — a
  * separate implementation of the same public standard), defensive
  * rejection of unsupported/crafted streams, and the Multimodal
  * plumbing (decode dims/checksum, block-pooled features from decoded
  * pixels, resize re-encode round-trip).
  */
class JpegCodecSpec extends SparkSpec {

  private def gradient(w: Int, h: Int): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      px(o) = ((x * 255) / w).toByte
      px(o + 1) = ((y * 255) / h).toByte
      px(o + 2) = (if (x > w / 2 && y > h / 3) 200 else 60).toByte
    }
    px
  }

  private def meanAbsErr(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length)
    var s = 0L
    for (i <- a.indices) s += math.abs((a(i) & 0xff) - (b(i) & 0xff))
    s.toDouble / a.length
  }

  test("round-trip: dims exact, pixels within the quantization bound, deterministic") {
    // 96x64 (full MCUs) and 70x45 (partial edge blocks)
    for ((w, h) <- Seq((96, 64), (70, 45))) {
      val px = gradient(w, h)
      val enc = JpegBinary.encodeJpeg(w, h, px)
      assert(java.util.Arrays.equals(enc, JpegBinary.encodeJpeg(w, h, px)),
        "encode must be deterministic")
      val dec = JpegBinary.decodeJpeg(enc).get
      assert(dec.width == w && dec.height == h)
      val err = meanAbsErr(px, dec.pixels)
      // quality-75 quantization on smooth content: a correct codec
      // sits ~1-2; a channel swap / shifted block reads 20+
      assert(err < 4.0, s"round-trip mean abs error too high: $err")
      assert(JpegBinary.decodeJpegMeta(enc).contains((w, h)))
      val dec2 = JpegBinary.decodeJpeg(enc).get
      assert(java.util.Arrays.equals(dec.pixels, dec2.pixels),
        "decode must be deterministic")
    }
  }

  test("cross-validation: the JDK's independent JPEG decoder agrees pixel-for-pixel") {
    // javax.imageio is a SEPARATE implementation of the same public
    // standard — if our encoder wrote a malformed stream it would fail
    // to parse, and if our decoder mis-implemented the IDCT/Huffman
    // stages the pixel surfaces would diverge. Observed agreement is
    // ~0.04 mean abs (rounding differences in IDCT/color-convert only).
    val (w, h) = (96, 64)
    val enc = JpegBinary.encodeJpeg(w, h, gradient(w, h))
    val ours = JpegBinary.decodeJpeg(enc).get
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    assert(img != null, "JDK ImageIO must parse our stream")
    assert(img.getWidth == w && img.getHeight == h)
    var diff = 0L
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val o = (y * w + x) * 3
      val ds = Seq(
        math.abs(((rgb >> 16) & 0xff) - (ours.pixels(o + 2) & 0xff)),
        math.abs(((rgb >> 8) & 0xff) - (ours.pixels(o + 1) & 0xff)),
        math.abs((rgb & 0xff) - (ours.pixels(o) & 0xff)))
      diff += ds.sum; worst = math.max(worst, ds.max)
    }
    val mean = diff.toDouble / (w * h * 3)
    assert(mean < 1.0, s"mean abs disagreement vs ImageIO: $mean")
    assert(worst <= 8, s"worst per-channel disagreement vs ImageIO: $worst")
  }

  test("defensive decode: alien, truncated, progressive, subsampled -> None") {
    val enc = JpegBinary.encodeJpeg(32, 24, gradient(32, 24))
    assert(JpegBinary.decodeJpeg(enc).isDefined)
    // alien bytes / wrong magic
    assert(JpegBinary.decodeJpeg(Array.fill[Byte](64)(0x41)).isEmpty)
    assert(JpegBinary.decodeJpeg(enc.take(1)).isEmpty)
    // header truncated mid-segment and scan truncated
    assert(JpegBinary.decodeJpeg(enc.take(40)).isEmpty)
    assert(JpegBinary.decodeJpeg(enc.take(enc.length - 30)).isEmpty)
    // progressive SOF2 must be refused, not mis-decoded
    val prog = enc.clone()
    val sof = {
      var i = 2
      while (!((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0)) i += 1
      i
    }
    prog(sof + 1) = 0xc2.toByte
    assert(JpegBinary.decodeJpeg(prog).isEmpty)
    // 2x2 subsampling (sampling byte 0x22) unsupported -> None
    val sub = enc.clone(); sub(sof + 11) = 0x22.toByte
    assert(JpegBinary.decodeJpeg(sub).isEmpty)
  }

  test("Multimodal plumbing: decode dims, pooled features from decoded pixels, resize re-encode") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    MultimodalFixture.ensure(spark)
    val jpegs = spark.read.parquet(MultimodalFixture.jpegPath)
      .as[graft.operators.Multimodal.Asset]
    // decode: dims match the fixture geometry for every asset
    val decoded = graft.operators.Multimodal.decode(jpegs).collect()
    assert(decoded.length == MultimodalFixture.nJpegs)
    decoded.foreach { d =>
      val (w, h) = MultimodalFixture.jpegDims(d.asset_id)
      assert(d.width == w && d.height == h, s"asset ${d.asset_id} dims")
    }
    // features pool from the DECODED pixels: recompute one asset's 4x4
    // block means from a direct JpegBinary decode and compare exactly
    val feats = graft.operators.Multimodal.extractFeatures(jpegs, dim = 16)
      .collect().map(f => f.asset_id -> f.features).toMap
    val a0 = JpegBinary.decodeJpeg(MultimodalFixture.jpegMedia(0)).get
    val sums = new Array[Long](16); val counts = new Array[Long](16)
    for (y <- 0 until a0.height; x <- 0 until a0.width) {
      val i = (y * 4 / a0.height) * 4 + x * 4 / a0.width
      val p = (y * a0.width + x) * 3
      sums(i) += (a0.pixels(p) & 0xff) + (a0.pixels(p + 1) & 0xff) +
        (a0.pixels(p + 2) & 0xff)
      counts(i) += 3
    }
    val want = Array.tabulate(16)(i => sums(i).toDouble / counts(i))
    assert(feats(0L).toSeq == want.toSeq,
      "features must be the block means of the decoded pixels")
    // features differ across assets (not a constant stub)
    assert(feats(0L).toSeq != feats(1L).toSeq)
    // resize: output is a genuine JPEG of the target dims that decodes
    val small = graft.operators.Multimodal.resize(jpegs, maxW = 32, maxH = 32)
      .filter(col("asset_id") === 0L).collect().head
    assert(small.width <= 32 && small.height <= 32)
    val rt = JpegBinary.decodeJpeg(small.media).get
    assert(rt.width == small.width && rt.height == small.height)
  }
}
