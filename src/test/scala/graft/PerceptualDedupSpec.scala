package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}
import graft.pipelines.MultimodalFixture

/** The perceptual image near-dup contracts (m11): a cross-format
  * re-encode (same pixels as GIF and PNG) shares ZERO byte chunks — so
  * the m4 chunk-fingerprint pipeline provably misses it — while the
  * dHash is bit-identical; dHash is robust to rescaling; and the
  * declared m11 query finds every planted pair at distance 0 through
  * the banded-Hamming machinery.
  */
class PerceptualDedupSpec extends SparkSpec {

  private def chunkMd5s(bytes: Array[Byte], ch: Int = 1024): Set[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until (bytes.length + ch - 1) / ch).map { i =>
      val end = math.min(bytes.length, (i + 1) * ch)
      md.reset()
      md.digest(java.util.Arrays.copyOfRange(bytes, i * ch, end))
        .map("%02x".format(_)).mkString
    }.toSet
  }

  test("cross-format duplicate: zero shared byte chunks, identical dHash") {
    for (g <- Seq(0L, 3L, 17L, 39L)) {
      val gif = MultimodalFixture.gifMedia(g)
      val png = MultimodalFixture.percMedia(g)
      // the byte domain m4 lives in sees nothing in common...
      assert(chunkMd5s(gif).intersect(chunkMd5s(png)).isEmpty,
        s"gif/png encodings of asset $g should share no 1 KiB chunk md5s")
      // ...while the perceptual domain sees the same picture exactly
      val dg = Multimodal.decodeImageAny(gif).get
      val dp = Multimodal.decodeImageAny(png).get
      assert(dg._1 == dp._1 && dg._2 == dp._2 &&
        java.util.Arrays.equals(dg._3, dp._3),
        s"lossless decode of both formats must agree on asset $g")
      assert(Multimodal.dHash64(dg._1, dg._2, dg._3) ==
        Multimodal.dHash64(dp._1, dp._2, dp._3))
    }
  }

  test("lossy re-encode: the JPEG copy lands within the m11 radius") {
    // the production case: the SAME picture re-encoded through a LOSSY
    // codec — quantization perturbs pixels, the dHash moves a few bits
    // at most, and the radius-7 banding still pairs it with the
    // original (byte-chunk dedup is hopeless here for the same reason
    // as the lossless cross-format pair)
    for (g <- Seq(2L, 9L, 31L)) {
      val (w, h) = MultimodalFixture.gifDims(g)
      val px = MultimodalFixture.gifPixels(g)
      val orig = Multimodal.dHash64(w, h, px)
      val jpeg = graft.sources.JpegBinary.encodeJpeg(w, h, px)
      val (jw, jh, jpx) = Multimodal.decodeImageAny(jpeg).get
      assert(jw == w && jh == h)
      val d = java.lang.Long.bitCount(orig ^ Multimodal.dHash64(jw, jh, jpx))
      assert(d <= 7, s"JPEG re-encode of asset $g drifted $d dHash bits")
      assert(chunkMd5s(MultimodalFixture.gifMedia(g))
        .intersect(chunkMd5s(jpeg)).isEmpty)
    }
  }

  test("dHash is stable under 2x downscale") {
    for (g <- Seq(1L, 7L, 23L)) {
      val (w, h) = MultimodalFixture.gifDims(g)
      val px = MultimodalFixture.gifPixels(g)
      val full = Multimodal.dHash64(w, h, px)
      // 2x2 box downscale (the resize-path shape): a rescaled copy of
      // the same picture must stay within a small Hamming radius
      val (hw, hh) = (w / 2, h / 2)
      val half = new Array[Byte](hw * hh * 3)
      for (y <- 0 until hh; x <- 0 until hw; c <- 0 until 3) {
        val s = ((2 * y * w + 2 * x) * 3 + c, (2 * y * w + 2 * x + 1) * 3 + c,
          ((2 * y + 1) * w + 2 * x) * 3 + c, ((2 * y + 1) * w + 2 * x + 1) * 3 + c)
        half((y * hw + x) * 3 + c) = (((px(s._1) & 0xff) + (px(s._2) & 0xff) +
          (px(s._3) & 0xff) + (px(s._4) & 0xff)) / 4).toByte
      }
      val down = Multimodal.dHash64(hw, hh, half)
      val d = java.lang.Long.bitCount(full ^ down)
      assert(d <= 10, s"downscaled dHash drifted $d bits for asset $g")
    }
  }

  test("m11 declared query: every planted cross-format pair found at distance 0; m4's pipeline finds none of them") {
    val df = SparkEntry.queries("m11_perceptual_neardups")(spark, "")
    val pairs = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (g <- 0L until MultimodalFixture.nGifs.toLong) {
      val key = (g, g + MultimodalFixture.PercIdOffset)
      assert(pairs.get(key).contains(0L),
        s"planted cross-format pair $key missing or nonzero: ${pairs.get(key)}")
    }
    // the chunk-fingerprint pipeline over the SAME corpus reports no
    // cross-format pair — the gap m11 exists to close
    import spark.implicits._
    val corpus = spark.read.parquet(MultimodalFixture.gifPath)
      .unionByName(spark.read.parquet(MultimodalFixture.percPath))
      .select(col("asset_id").cast("long").as("doc_id"),
        Multimodal.chunkFingerprintDoc(col("media"), 1024).as("chunks"))
    val m4Style = Dedup.minhashNearDups(corpus, "doc_id", "chunks",
      k = 32, bands = 16, shingleSize = 1, threshold = 0.5)
    val crossPairs = m4Style
      .filter(col("id2") - col("id1") === MultimodalFixture.PercIdOffset)
      .count()
    assert(crossPairs == 0L,
      s"byte-chunk dedup should miss every re-encoded pair, found $crossPairs")
  }
}
