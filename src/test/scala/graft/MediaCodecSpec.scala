package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MediaBinary

/** Pure-JVM BMP/WAV/AVI codec round-trips and defensive-parse
  * behavior — since round 9 all three multimodal decode paths are
  * real (the stub remains only for payloads no pure-JVM codec parses).
  */
class MediaCodecSpec extends AnyFunSuite {

  private def lcgBytes(n: Int, seed: Long): Array[Byte] = {
    val out = new Array[Byte](n)
    var s = seed
    var i = 0
    while (i < n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(i) = (s >>> 56).toByte
      i += 1
    }
    out
  }

  test("BMP: encode/decode round-trips dims and exact pixels") {
    for ((w, h) <- Seq((96, 113), (7, 5), (1, 1), (33, 2))) {
      val px = lcgBytes(w * h * 3, seed = w * 1000L + h)
      val bytes = MediaBinary.encodeBmp(w, h, px)
      // stride padding: rows pad to 4-byte boundaries in the container
      val stride = ((w * 3 + 3) / 4) * 4
      assert(bytes.length == 54 + stride * h)
      val dec = MediaBinary.decodeBmp(bytes)
      assert(dec.isDefined, s"decode failed for ${w}x$h")
      assert(dec.get.width == w && dec.get.height == h)
      assert(java.util.Arrays.equals(dec.get.pixels, px),
        s"pixel round-trip failed for ${w}x$h (stride $stride)")
    }
  }

  test("BMP: rejects alien, truncated, and unsupported payloads") {
    assert(MediaBinary.decodeBmp(Array[Byte]()).isEmpty)
    assert(MediaBinary.decodeBmp(lcgBytes(200, 7L)).isEmpty) // no magic
    val good = MediaBinary.encodeBmp(8, 8, lcgBytes(8 * 8 * 3, 1L))
    assert(MediaBinary.decodeBmp(good.take(53)).isEmpty) // header cut
    assert(MediaBinary.decodeBmp(good.take(80)).isEmpty) // pixels cut
    val mono = good.clone(); mono(28) = 8 // biBitCount = 8
    assert(MediaBinary.decodeBmp(mono).isEmpty)
    val rle = good.clone(); rle(30) = 1 // biCompression = BI_RLE8
    assert(MediaBinary.decodeBmp(rle).isEmpty)
  }

  test("WAV: encode/decode round-trips format and exact samples") {
    val data = lcgBytes(4 * 1000, 42L) // 1000 stereo 16-bit frames
    val bytes = MediaBinary.encodeWav(16000, 2, 16, data)
    assert(bytes.length == 44 + data.length)
    val dec = MediaBinary.decodeWav(bytes)
    assert(dec.isDefined)
    val w = dec.get
    assert(w.channels == 2 && w.sampleRate == 16000 && w.bitsPerSample == 16)
    assert(java.util.Arrays.equals(w.data, data))
    assert(w.byteRate == 64000)
    assert(w.durationMs == data.length.toLong * 1000 / 64000)
  }

  test("WAV: chunk walk skips unknown chunks (odd sizes word-padded)") {
    val data = lcgBytes(4 * 16, 9L)
    val canonical = MediaBinary.encodeWav(8000, 2, 16, data)
    // splice a 5-byte junk chunk (odd → 1 pad byte) between WAVE and fmt
    val junk = Array[Byte]('J', 'U', 'N', 'K', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = canonical.take(12) ++ junk ++ canonical.drop(12)
    // fix the RIFF size field
    val riffSize = spliced.length - 8
    spliced(4) = (riffSize & 0xff).toByte
    spliced(5) = ((riffSize >> 8) & 0xff).toByte
    spliced(6) = ((riffSize >> 16) & 0xff).toByte
    spliced(7) = ((riffSize >> 24) & 0xff).toByte
    val dec = MediaBinary.decodeWav(spliced)
    assert(dec.isDefined, "chunk walk must skip the junk chunk")
    assert(java.util.Arrays.equals(dec.get.data, data))
  }

  test("WAV: rejects alien, truncated, and non-PCM payloads") {
    assert(MediaBinary.decodeWav(lcgBytes(100, 3L)).isEmpty)
    val good = MediaBinary.encodeWav(8000, 1, 16, lcgBytes(64, 5L))
    assert(MediaBinary.decodeWav(good.take(40)).isEmpty)
    val float = good.clone(); float(20) = 3 // IEEE float format tag
    assert(MediaBinary.decodeWav(float).isEmpty)
    // data chunk size overrunning the buffer must not slice garbage
    val overrun = good.clone(); overrun(40) = (overrun(40) + 64).toByte
    assert(MediaBinary.decodeWav(overrun).isEmpty)
  }

  test("AVI: encode/decode round-trips dims, timing, and exact frame pixels") {
    val (w, h, us) = (96, 32, 40000)
    val frames = Array.tabulate(5)(k => lcgBytes(w * h * 3, 100L + k))
    val bytes = MediaBinary.encodeAvi(w, h, us, frames)
    assert(bytes.length == 224 + 5 * (8 + w * h * 3)) // aligned stride
    val dec = MediaBinary.decodeAvi(bytes)
    assert(dec.isDefined)
    val a = dec.get
    assert(a.width == w && a.height == h && a.usPerFrame == us && a.nFrames == 5)
    for (k <- 0 until 5)
      assert(java.util.Arrays.equals(a.frames(k), frames(k)),
        s"frame $k pixel round-trip failed")
    assert(a.durationMs == 5L * us / 1000)
    // unaligned width exercises per-row stride padding inside frames
    val frames2 = Array.tabulate(3)(k => lcgBytes(7 * 4 * 3, 7L + k))
    val d2 = MediaBinary.decodeAvi(MediaBinary.encodeAvi(7, 4, 33367, frames2)).get
    assert(d2.width == 7 && d2.height == 4 && d2.nFrames == 3)
    for (k <- 0 until 3)
      assert(java.util.Arrays.equals(d2.frames(k), frames2(k)))
  }

  test("AVI: meta parse seeks single frames without full decode") {
    val frames = Array.tabulate(10)(k => lcgBytes(96 * 32 * 3, 500L + k))
    val bytes = MediaBinary.encodeAvi(96, 32, 40000, frames)
    val m = MediaBinary.decodeAviMeta(bytes).get
    assert(m.nFrames == 10 && m.frameOffsets(0) == 232) // 00db hdr at 224
    assert(m.durationMs == 400L)
    assert(java.util.Arrays.equals(
      MediaBinary.aviFramePixels(bytes, m, 7), frames(7)))
  }

  test("AVI: rejects alien, truncated, compressed, and lying headers") {
    assert(MediaBinary.decodeAviMeta(lcgBytes(300, 3L)).isEmpty) // no magic
    val wav = MediaBinary.encodeWav(8000, 1, 16, lcgBytes(64, 5L))
    assert(MediaBinary.decodeAviMeta(wav).isEmpty) // RIFF but WAVE
    val good = MediaBinary.encodeAvi(8, 8, 40000, Array(lcgBytes(8 * 8 * 3, 1L)))
    assert(MediaBinary.decodeAviMeta(good).isDefined)
    assert(MediaBinary.decodeAviMeta(good.take(200)).isEmpty) // header cut
    assert(MediaBinary.decodeAviMeta(
      good.take(good.length - 4)).isEmpty) // frame chunk overruns buffer
    val comp = good.clone(); comp(188) = 1 // strf biCompression != BI_RGB
    assert(MediaBinary.decodeAviMeta(comp).isEmpty)
    // avih dwTotalFrames disagreeing with the movi scan must not decode
    val lie = good.clone(); lie(48) = 2
    assert(MediaBinary.decodeAviMeta(lie).isEmpty)
  }

  test("AVI: crafted overflow header and LIST-nesting bomb return None, never throw") {
    def putLe(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    // 32-bit stride·h wrap: a legit 1024×1024 AVI (fb = 3·2²⁰) with the
    // avih patched to w=2²⁰, h=4097 — stride'·h' = 3145728·4097 wraps
    // mod 2³² back to exactly 3145728, so an Int-arithmetic validator
    // "matches" the chunk size and later frame extraction overflows
    // offsets/allocation mid-partition. Long validation must reject it.
    val big = MediaBinary.encodeAvi(1024, 1024, 40000,
      Array(lcgBytes(1024 * 1024 * 3, 9L)))
    assert(MediaBinary.decodeAviMeta(big).isDefined)
    val ovf = big.clone()
    putLe(ovf, 64, 1 << 20) // avih dwWidth  (avih chunk at 24, data +40)
    putLe(ovf, 68, 4097)    // avih dwHeight (data +44)
    assert(MediaBinary.decodeAviMeta(ovf).isEmpty,
      "wrapped stride*h must not validate against the frame chunk size")
    // recursion bomb: 500k nested 12-byte LISTs — an unbounded walk
    // raises StackOverflowError instead of honoring the None contract
    val n = 500000
    val bomb = new Array[Byte](12 + 12 * n)
    def put4(off: Int, s: String): Unit =
      (0 until 4).foreach(i => bomb(off + i) = s.charAt(i).toByte)
    put4(0, "RIFF"); putLe(bomb, 4, bomb.length - 8); put4(8, "AVI ")
    var off = 12
    while (off + 12 <= bomb.length) {
      put4(off, "LIST"); putLe(bomb, off + 4, bomb.length - off - 8)
      put4(off + 8, "rec "); off += 12
    }
    assert(MediaBinary.decodeAviMeta(bomb).isEmpty)
  }

  test("fixture media: genuine containers, pure-arithmetic lengths") {
    import graft.pipelines.MultimodalFixture._
    for (id <- 0L until 12L) {
      val m = media(id)
      assert(m.length == containerLen(id),
        s"containerLen($id) drifted: ${m.length} != ${containerLen(id)}")
      mediaType(id) match {
        case "image" =>
          val d = MediaBinary.decodeBmp(m)
          assert(d.isDefined && d.get.width == BmpWidth)
          // decoded pixels ARE the payload prefix — the genuine
          // encode→container→decode cycle, not a header-only check
          val expect = payload(id).take(d.get.pixels.length)
          assert(java.util.Arrays.equals(d.get.pixels, expect))
        case "audio" =>
          val d = MediaBinary.decodeWav(m)
          assert(d.isDefined && d.get.sampleRate == WavRate)
          val expect = payload(id).take(d.get.data.length)
          assert(java.util.Arrays.equals(d.get.data, expect))
        case _ =>
          val d = MediaBinary.decodeAviMeta(m)
          assert(d.isDefined && d.get.width == AviWidth &&
            d.get.height == AviHeight && d.get.usPerFrame == AviUsPerFrame)
          // decoded frame pixels ARE consecutive payload slices — the
          // genuine encode -> container -> seek-decode cycle per frame
          val all = Array.concat((0 until d.get.nFrames).map(k =>
            MediaBinary.aviFramePixels(m, d.get, k)): _*)
          assert(java.util.Arrays.equals(all, payload(id).take(all.length)))
      }
    }
  }
}
