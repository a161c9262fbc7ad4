package graft

import graft.pipelines.MultimodalFixture
import graft.sources.GifBinary

/** The GIF codec contracts (sources.GifBinary — GIF89a, real
  * variable-width LZW both ways): EXACT lossless round-trip for
  * palette-safe content, bit-exact determinism, independent
  * cross-validation against the JDK's own GIF codec in BOTH directions
  * (ImageIO), defensive rejection of crafted/corrupt streams, and the
  * Multimodal plumbing (decode dims/checksum, the m10 audit sums,
  * block-pooled features).
  */
class GifCodecSpec extends SparkSpec {

  /** Palette-safe gradient: channels on the web-safe 51-step grid. */
  private def gradient(w: Int, h: Int): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      px(o) = (51 * ((x * 6) / w).min(5)).toByte
      px(o + 1) = (51 * ((y * 6) / h).min(5)).toByte
      px(o + 2) = (if (x > w / 2 && y > h / 3) 204 else 51).toByte
    }
    px
  }

  test("round-trip: lossless for palette content, deterministic, meta agrees") {
    for ((w, h) <- Seq((96, 64), (7, 3), (1, 1), (100, 91))) {
      val px = gradient(w, h)
      val enc = GifBinary.encodeGif(w, h, px)
      assert(java.util.Arrays.equals(enc, GifBinary.encodeGif(w, h, px)),
        "encode must be deterministic")
      val dec = GifBinary.decodeGif(enc).get
      assert(dec.width == w && dec.height == h)
      assert(java.util.Arrays.equals(dec.pixels, px),
        s"palette content must round-trip exactly (${w}x$h)")
      assert(GifBinary.decodeGifMeta(enc).contains((w, h)))
    }
    // a wide image long enough to force LZW code-width growth and the
    // 12-bit dictionary regime
    val (w, h) = (200, 120)
    val px = gradient(w, h)
    val dec = GifBinary.decodeGif(GifBinary.encodeGif(w, h, px)).get
    assert(java.util.Arrays.equals(dec.pixels, px))
  }

  test("cross-validation: JDK ImageIO decodes our streams and we decode ImageIO's") {
    import java.awt.image.BufferedImage
    val (w, h) = (70, 45)
    val px = gradient(w, h)
    // ours -> ImageIO: pixel-exact
    val enc = GifBinary.encodeGif(w, h, px)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    assert(img != null && img.getWidth == w && img.getHeight == h,
      "the JDK decoder must accept our stream")
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val o = (y * w + x) * 3
      assert((rgb & 0xff) == (px(o) & 0xff) &&
        ((rgb >> 8) & 0xff) == (px(o + 1) & 0xff) &&
        ((rgb >> 16) & 0xff) == (px(o + 2) & 0xff),
        s"ImageIO disagrees at ($x,$y)")
    }
    // ImageIO -> ours: the JDK writer's own LZW (and its own palette
    // choices) must decode to the same pixels
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      bi.setRGB(x, y, ((px(o + 2) & 0xff) << 16) |
        ((px(o + 1) & 0xff) << 8) | (px(o) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "gif", bos))
    val dec = GifBinary.decodeGif(bos.toByteArray)
    assert(dec.isDefined, "we must decode the JDK encoder's stream")
    assert(dec.get.width == w && dec.get.height == h)
    assert(java.util.Arrays.equals(dec.get.pixels, px),
      "lossless both ways: JDK-encoded stream must decode to the same pixels")
  }

  test("sub-screen frame composites at its (left, top) offset over the background") {
    val (iw, ih) = (10, 6)
    val px = gradient(iw, ih)
    // craft the sub-screen stream from our own full-frame encoding:
    // widen the logical screen and move the image descriptor's offset
    val b = GifBinary.encodeGif(iw, ih, px).clone()
    val sw = iw + 4; val sh = ih + 3
    def pu16(off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    }
    pu16(6, sw); pu16(8, sh)
    val gctSize = 1 << ((b(10) & 7) + 1)
    val d = 13 + gctSize * 3
    assert((b(d) & 0xff) == 0x2c, "expected the image descriptor here")
    pu16(d + 1, 3); pu16(d + 3, 2) // left=3, top=2
    val dec = GifBinary.decodeGif(b).get
    assert(dec.width == sw && dec.height == sh)
    assert(GifBinary.decodeGifMeta(b).contains((sw, sh)))
    // the frame landed at the offset, pixel-exact
    for (y <- 0 until ih; x <- 0 until iw) {
      val o = ((y + 2) * sw + (x + 3)) * 3
      val p = (y * iw + x) * 3
      assert(dec.pixels(o) == px(p) && dec.pixels(o + 1) == px(p + 1) &&
        dec.pixels(o + 2) == px(p + 2), s"frame pixel ($x,$y)")
    }
    // the margin is the background color (GCT entry at the header's
    // background index — 0 for our encoder = the first-seen color)
    assert(dec.pixels(0) == px(0) && dec.pixels(1) == px(1) &&
      dec.pixels(2) == px(2), "canvas corner must be the background color")
    // a frame overflowing the screen is rejected, not clipped
    pu16(d + 1, sw - iw + 1)
    assert(GifBinary.decodeGif(b).isEmpty)
  }

  test("defensive decode: alien, truncated, oversized, cross-codec -> None") {
    assert(GifBinary.decodeGif(Array[Byte](1, 2, 3)).isEmpty)
    assert(GifBinary.decodeGif("GIF89a but not really".getBytes).isEmpty)
    val enc = GifBinary.encodeGif(16, 16, gradient(16, 16))
    for (cut <- Seq(4, 12, enc.length / 2, enc.length - 3))
      assert(GifBinary.decodeGif(java.util.Arrays.copyOf(enc, cut)).isEmpty,
        s"truncated at $cut must be None")
    val big = enc.clone()
    big(7) = 0x7f.toByte // width high byte -> absurd dims
    assert(GifBinary.decodeGif(big).isEmpty)
    // cross-codec hygiene
    assert(GifBinary.decodeGif(MultimodalFixture.pngMedia(0)).isEmpty)
    assert(graft.sources.PngBinary.decodePng(
      MultimodalFixture.gifMedia(0)).isEmpty)
    // >256 distinct colors cannot be a GIF
    val rainbow = new Array[Byte](32 * 32 * 3)
    for (i <- 0 until 32 * 32) {
      rainbow(i * 3) = (i & 0xff).toByte
      rainbow(i * 3 + 1) = ((i >> 8) & 0xff).toByte
      rainbow(i * 3 + 2) = 7
    }
    intercept[IllegalArgumentException] {
      GifBinary.encodeGif(32, 32, rainbow)
    }
  }

  test("fixture assets decode exactly; audit sums match the generator") {
    for (id <- 0L until 10L) {
      val (w, h) = MultimodalFixture.gifDims(id)
      val dec = GifBinary.decodeGif(MultimodalFixture.gifMedia(id)).get
      assert(dec.width == w && dec.height == h)
      assert(java.util.Arrays.equals(dec.pixels,
        MultimodalFixture.gifPixels(id)),
        s"fixture asset $id must round-trip exactly")
    }
  }

  test("Multimodal plumbing: decode row, m10 audit, pooled features") {
    import spark.implicits._
    MultimodalFixture.ensure(spark)
    val assets = spark.read.parquet(MultimodalFixture.gifPath)
      .as[graft.operators.Multimodal.Asset]
    val decoded = graft.operators.Multimodal.decode(assets)
      .collect().sortBy(_.asset_id)
    assert(decoded.length == MultimodalFixture.nGifs)
    decoded.foreach { d =>
      val (w, h) = MultimodalFixture.gifDims(d.asset_id)
      assert(d.width == w && d.height == h, s"asset ${d.asset_id} dims")
    }
    val audit = graft.operators.Multimodal.gifAudit(assets)
      .collect().sortBy(_.asset_id)
    assert(audit.forall(a => a.width > 0 && a.sum_b >= 0),
      "every fixture gif must decode in the audit (no -1 fallback rows)")
    // features pool from genuinely decoded pixels: a solid web-safe gif
    // must yield a constant feature vector equal to its channel mean
    val solid = Array.fill[Byte](24 * 24 * 3)(0)
    for (i <- solid.indices by 3) {
      solid(i) = 51; solid(i + 1) = 102; solid(i + 2) = 153.toByte
    }
    val media = GifBinary.encodeGif(24, 24, solid)
    val fs = graft.operators.Multimodal.extractFeatures(
      Seq(graft.operators.Multimodal.Asset(7L, "gif", media)).toDS())
      .collect().head
    assert(fs.features.forall(v => math.abs(v - 102.0) < 1e-9),
      s"solid gif features must equal the channel mean: ${fs.features.toSeq}")
  }
}
