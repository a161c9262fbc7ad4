package graft.sources

/** Pure-JVM media container codecs: BMP (BITMAPINFOHEADER, 24 bpp
  * uncompressed), WAV (RIFF/WAVE, integer PCM), and AVI (RIFF/'AVI ',
  * uncompressed 24-bpp DIB frames or genuinely COMPRESSED MJPEG frames
  * entropy-decoded per frame by [[JpegBinary]]) — the XlsBinary precedent
  * (hand-built OLE2/BIFF8) applied to the multimodal stubs so all three
  * modalities decode GENUINELY end to end with no external jar. Formats
  * follow the public specifications only (Windows BITMAPFILEHEADER/
  * BITMAPINFOHEADER layout; the RIFF chunk grammar with canonical
  * `fmt `/`data` chunks for WAVE and `hdrl`/`movi` LISTs, MainAVIHeader
  * `avih`, AVIStreamHeader `strh`, and `00db` frame chunks for AVI).
  *
  * All decoders are defensive parsers, not trusted-layout slicers:
  * magic bytes, header sizes, dimension/bit-depth sanity, and
  * bounds-checked pixel/sample extents are validated, and the RIFF
  * formats walk the chunk list (skipping unknown chunks with RIFF's
  * even-byte padding; AVI descends nested LISTs recursively) instead of
  * assuming a canonical prefix — so a truncated or alien payload
  * returns None and the caller falls back to its declared stub rather
  * than throwing mid-partition.
  */
object MediaBinary {

  /** Decoded 24-bpp image: `pixels` is BGR, row-major TOP-DOWN, with
    * the BMP stride padding removed — width·height·3 bytes exactly.
    */
  final case class Bmp(width: Int, height: Int, pixels: Array[Byte])

  /** Decoded PCM audio: `data` is the raw sample bytes of the `data`
    * chunk (interleaved frames, little-endian samples).
    */
  final case class Wav(channels: Int, sampleRate: Int, bitsPerSample: Int,
      data: Array[Byte]) {
    def byteRate: Int = sampleRate * channels * (bitsPerSample / 8)
    def durationMs: Long =
      if (byteRate <= 0) 0L else data.length.toLong * 1000L / byteRate
  }

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def wle16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def wle32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Encode BGR top-down pixels (width·height·3 bytes) as a genuine
    * 24-bpp uncompressed BMP: 14-byte file header, 40-byte info header,
    * bottom-up pixel rows padded to 4-byte strides (the format's
    * defaults for positive biHeight).
    */
  def encodeBmp(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height * 3,
      s"pixels ${pixels.length} != $width*$height*3")
    val stride = ((width * 3 + 3) / 4) * 4
    val dataSize = stride * height
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    wle32(out, 2, 54 + dataSize) // bfSize
    wle32(out, 10, 54) // bfOffBits
    wle32(out, 14, 40) // biSize (BITMAPINFOHEADER)
    wle32(out, 18, width)
    wle32(out, 22, height) // positive → bottom-up rows
    wle16(out, 26, 1) // biPlanes
    wle16(out, 28, 24) // biBitCount
    wle32(out, 30, 0) // BI_RGB
    wle32(out, 34, dataSize)
    var y = 0
    while (y < height) {
      System.arraycopy(pixels, (height - 1 - y) * width * 3,
        out, 54 + y * stride, width * 3)
      y += 1
    }
    out
  }

  /** Parse a 24-bpp uncompressed bottom-up BMP; None on anything else
    * (wrong magic, other bit depths/compressions, truncated pixel
    * array, non-positive or implausible dimensions).
    */
  def decodeBmp(b: Array[Byte]): Option[Bmp] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = le32(b, 10)
    val hdrSize = le32(b, 14)
    val w = le32(b, 18)
    val h = le32(b, 22)
    val planes = le16(b, 26)
    val bpp = le16(b, 28)
    val comp = le32(b, 30)
    if (hdrSize < 40 || planes != 1 || bpp != 24 || comp != 0) return None
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return None
    val stride = ((w * 3 + 3) / 4) * 4
    if (dataOff < 54 || dataOff.toLong + stride.toLong * h > b.length)
      return None
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      System.arraycopy(b, dataOff + (h - 1 - y) * stride,
        px, y * w * 3, w * 3)
      y += 1
    }
    Some(Bmp(w, h, px))
  }

  /** Encode PCM sample bytes as a canonical 44-byte-header WAV
    * (`fmt ` then `data`, format tag 1).
    */
  def encodeWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
      data: Array[Byte]): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    require(blockAlign > 0 && data.length % blockAlign == 0,
      s"data ${data.length} not frame-aligned to $blockAlign")
    val out = new Array[Byte](44 + data.length)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    wle32(out, 4, 36 + data.length)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    wle32(out, 16, 16) // fmt chunk size
    wle16(out, 20, 1) // PCM
    wle16(out, 22, channels)
    wle32(out, 24, sampleRate)
    wle32(out, 28, sampleRate * blockAlign)
    wle16(out, 32, blockAlign)
    wle16(out, 34, bitsPerSample)
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    wle32(out, 40, data.length)
    System.arraycopy(data, 0, out, 44, data.length)
    out
  }

  /** Parse a RIFF/WAVE PCM file by WALKING the chunk list — `fmt ` and
    * `data` may appear after unknown chunks (LIST, fact, …), which are
    * skipped with RIFF's even-size padding. None unless both chunks are
    * present, the format tag is integer PCM, and the data chunk lies
    * within the buffer.
    */
  def decodeWav(b: Array[Byte]): Option[Wav] = {
    if (b.length < 44 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "WAVE")
      return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var data: Option[Array[Byte]] = None
    while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = fourcc(b, off)
      val size = le32(b, off + 4)
      if (size < 0 || off + 8 + size.toLong > b.length) return None
      id match {
        case "fmt " if size >= 16 =>
          val tag = le16(b, off + 8)
          if (tag != 1) return None // integer PCM only
          fmt = Some((le16(b, off + 10), le32(b, off + 12), le16(b, off + 22)))
        case "data" =>
          data = Some(java.util.Arrays.copyOfRange(b, off + 8, off + 8 + size))
        case _ => ()
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    for ((ch, rate, bits) <- fmt; d <- data
         if ch > 0 && rate > 0 && bits > 0 && bits % 8 == 0)
      yield Wav(ch, rate, bits, d)
  }

  /** Parsed AVI structure WITHOUT pixel extraction: `frameOffsets`
    * point at each `00db`/`00dc` chunk's data bytes inside the source
    * buffer, so sampling k of n frames decodes k frames, not n — the
    * seek shape a real container index gives you. Dimensions/timing
    * come from the MainAVIHeader (`avih`). `codec` is "dib"
    * (uncompressed 24-bpp BI_RGB) or "mjpg" (genuinely COMPRESSED
    * baseline-JPEG frames — round 12); `frameSizes` carries each
    * chunk's byte size (constant stride·h for DIB, per-frame for MJPEG).
    */
  final case class AviMeta(width: Int, height: Int, usPerFrame: Int,
      frameOffsets: Array[Int], frameSizes: Array[Int],
      codec: String = "dib") {
    def nFrames: Int = frameOffsets.length
    def stride: Int = ((width * 3 + 3) / 4) * 4
    def durationMs: Long = nFrames.toLong * usPerFrame / 1000L
  }

  /** Fully decoded AVI: frames are BGR, row-major TOP-DOWN, stride
    * padding removed — width·height·3 bytes each (the [[Bmp]] pixel
    * contract, per frame).
    */
  final case class Avi(width: Int, height: Int, usPerFrame: Int,
      frames: Array[Array[Byte]]) {
    def nFrames: Int = frames.length
    def durationMs: Long = nFrames.toLong * usPerFrame / 1000L
  }

  /** Encode top-down BGR frames (width·height·3 bytes each) as a
    * genuine RIFF/'AVI ' file: LIST `hdrl` holding the 56-byte `avih`
    * and a LIST `strl` with a 'vids'/'DIB ' `strh` plus a 24-bpp BI_RGB
    * BITMAPINFOHEADER `strf`, then LIST `movi` with one `00db` chunk
    * per frame (bottom-up rows padded to 4-byte strides — the DIB
    * default, exactly the BMP pixel-array layout). Canonical fixed
    * layout: avih data at byte offset 32, first `00db` chunk at 224
    * (frame data at 232).
    */
  def encodeAvi(width: Int, height: Int, usPerFrame: Int,
      frames: Array[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && usPerFrame > 0 && frames.nonEmpty,
      s"bad AVI geometry ${width}x$height us=$usPerFrame n=${frames.length}")
    frames.foreach(f => require(f.length == width * height * 3,
      s"frame ${f.length} != $width*$height*3"))
    val stride = ((width * 3 + 3) / 4) * 4
    val fb = stride * height
    val n = frames.length
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40)) // = 192
    val moviSize = 4 + n * (8 + fb)
    val out = new Array[Byte](12 + (8 + hdrlSize) + (8 + moviSize))
    def fcc(off: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    fcc(0, "RIFF"); wle32(out, 4, out.length - 8); fcc(8, "AVI ")
    fcc(12, "LIST"); wle32(out, 16, hdrlSize); fcc(20, "hdrl")
    fcc(24, "avih"); wle32(out, 28, 56)
    val av = 32 // MainAVIHeader data
    wle32(out, av, usPerFrame)
    wle32(out, av + 4,
      math.min(fb.toLong * 1000000L / usPerFrame, Int.MaxValue.toLong).toInt)
    wle32(out, av + 16, n) // dwTotalFrames
    wle32(out, av + 24, 1) // dwStreams
    wle32(out, av + 28, fb) // dwSuggestedBufferSize
    wle32(out, av + 32, width); wle32(out, av + 36, height)
    val sl = av + 56 // LIST strl
    fcc(sl, "LIST"); wle32(out, sl + 4, 4 + 64 + 48); fcc(sl + 8, "strl")
    val sh = sl + 12 + 8 // AVIStreamHeader data
    fcc(sh - 8, "strh"); wle32(out, sh - 4, 56)
    fcc(sh, "vids"); fcc(sh + 4, "DIB ")
    wle32(out, sh + 20, usPerFrame) // dwScale
    wle32(out, sh + 24, 1000000) // dwRate → fps = rate/scale
    wle32(out, sh + 32, n) // dwLength
    wle32(out, sh + 36, fb)
    wle16(out, sh + 52, width); wle16(out, sh + 54, height) // rcFrame r/b
    val sf = sh + 56 + 8 // BITMAPINFOHEADER data
    fcc(sf - 8, "strf"); wle32(out, sf - 4, 40)
    wle32(out, sf, 40); wle32(out, sf + 4, width); wle32(out, sf + 8, height)
    wle16(out, sf + 12, 1); wle16(out, sf + 14, 24) // planes, bpp
    wle32(out, sf + 16, 0); wle32(out, sf + 20, fb) // BI_RGB, biSizeImage
    val mo = sf + 40 // LIST movi (byte 212 by construction)
    fcc(mo, "LIST"); wle32(out, mo + 4, moviSize); fcc(mo + 8, "movi")
    var k = 0
    while (k < n) {
      val base = mo + 12 + k * (8 + fb)
      fcc(base, "00db"); wle32(out, base + 4, fb)
      var y = 0
      while (y < height) {
        System.arraycopy(frames(k), (height - 1 - y) * width * 3,
          out, base + 8 + y * stride, width * 3)
        y += 1
      }
      k += 1
    }
    out
  }

  /** Encode pre-encoded baseline-JPEG frame streams as a genuine
    * MJPEG-in-AVI file (round 12 — the COMPRESSED-video rung): the same
    * canonical header tree as [[encodeAvi]] (avih data at byte 32, so
    * hex-domain oracles parse both layouts with one offset set), but
    * the stream handler/compression are 'MJPG' and the movi LIST holds
    * one variable-size `00dc` chunk per JPEG stream, RIFF word-aligned.
    * Composes the existing [[JpegBinary]] encoder (callers pass its
    * output) with the existing RIFF grammar — near-zero new codec
    * surface, genuinely compressed frames.
    */
  def encodeAviMjpeg(width: Int, height: Int, usPerFrame: Int,
      jpegFrames: Array[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && usPerFrame > 0 && jpegFrames.nonEmpty,
      s"bad AVI geometry ${width}x$height us=$usPerFrame n=${jpegFrames.length}")
    jpegFrames.foreach(f => require(f.length >= 4 &&
      (f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8,
      "frames must be JPEG streams (SOI missing)"))
    val n = jpegFrames.length
    val maxFb = jpegFrames.map(_.length).max
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40)) // = 192
    val moviSize = 4 + jpegFrames.map(f => 8 + f.length + (f.length & 1)).sum
    val out = new Array[Byte](12 + (8 + hdrlSize) + (8 + moviSize))
    def fcc(off: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    fcc(0, "RIFF"); wle32(out, 4, out.length - 8); fcc(8, "AVI ")
    fcc(12, "LIST"); wle32(out, 16, hdrlSize); fcc(20, "hdrl")
    fcc(24, "avih"); wle32(out, 28, 56)
    val av = 32 // MainAVIHeader data (canonical offset, as encodeAvi)
    wle32(out, av, usPerFrame)
    wle32(out, av + 4,
      math.min(maxFb.toLong * 1000000L / usPerFrame, Int.MaxValue.toLong).toInt)
    wle32(out, av + 16, n) // dwTotalFrames
    wle32(out, av + 24, 1) // dwStreams
    wle32(out, av + 28, maxFb) // dwSuggestedBufferSize
    wle32(out, av + 32, width); wle32(out, av + 36, height)
    val sl = av + 56 // LIST strl
    fcc(sl, "LIST"); wle32(out, sl + 4, 4 + 64 + 48); fcc(sl + 8, "strl")
    val sh = sl + 12 + 8 // AVIStreamHeader data
    fcc(sh - 8, "strh"); wle32(out, sh - 4, 56)
    fcc(sh, "vids"); fcc(sh + 4, "MJPG")
    wle32(out, sh + 20, usPerFrame) // dwScale
    wle32(out, sh + 24, 1000000) // dwRate → fps = rate/scale
    wle32(out, sh + 32, n) // dwLength
    wle32(out, sh + 36, maxFb)
    wle16(out, sh + 52, width); wle16(out, sh + 54, height) // rcFrame r/b
    val sf = sh + 56 + 8 // BITMAPINFOHEADER data
    fcc(sf - 8, "strf"); wle32(out, sf - 4, 40)
    wle32(out, sf, 40); wle32(out, sf + 4, width); wle32(out, sf + 8, height)
    wle16(out, sf + 12, 1); wle16(out, sf + 14, 24) // planes, bpp
    fcc(sf + 16, "MJPG") // biCompression
    wle32(out, sf + 20, maxFb) // biSizeImage (largest frame)
    val mo = sf + 40 // LIST movi
    fcc(mo, "LIST"); wle32(out, mo + 4, moviSize); fcc(mo + 8, "movi")
    var base = mo + 12
    var k = 0
    while (k < n) {
      val f = jpegFrames(k)
      fcc(base, "00dc"); wle32(out, base + 4, f.length)
      System.arraycopy(f, 0, out, base + 8, f.length)
      base += 8 + f.length + (f.length & 1)
      k += 1
    }
    out
  }

  /** Parse a 24-bpp DIB or MJPEG AVI by recursively walking the RIFF
    * LIST tree — `hdrl`/`strl` for the headers, `movi` for the
    * `00db`/`00dc` frame chunks, unknown chunks skipped with RIFF's
    * even-byte padding. None unless the stream is 'vids' with either a
    * 24-bpp BI_RGB format (codec "dib") or biCompression 'MJPG' (codec
    * "mjpg" — genuinely compressed frames, decoded per frame by
    * [[JpegBinary]] in [[aviFramePixels]]), every frame chunk passes
    * its codec's shape check (exact stride-padded size for DIB;
    * SOI/EOI markers for MJPEG), and `avih`'s dwTotalFrames agrees
    * with the movi scan (so a crafted header can't make the metadata
    * and the pixels disagree).
    */
  def decodeAviMeta(b: Array[Byte]): Option[AviMeta] = {
    if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
      return None
    var usPerFrame = 0; var w = 0; var h = 0; var totalFrames = -1
    var vids = false; var dib24 = false; var mjpg = false; var bad = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def walk(from: Int, to: Int, inMovi: Boolean, depth: Int): Unit = {
      // depth cap: a crafted payload of nested 12-byte LISTs would
      // otherwise recurse ~len/12 deep and raise StackOverflowError
      // instead of honoring the alien-payload-returns-None contract
      // (real AVI needs depth 3: RIFF → LIST movi → LIST 'rec ')
      if (depth > 32) { bad = true; return }
      var off = from
      while (!bad && off + 8 <= to) {
        val id = fourcc(b, off)
        val size = le32(b, off + 4)
        if (size < 0 || off + 8 + size.toLong > to) { bad = true; return }
        id match {
          case "LIST" | "RIFF" if size >= 4 =>
            val lt = fourcc(b, off + 8)
            // frames may be grouped in 'rec ' LISTs inside movi
            walk(off + 12, off + 8 + size,
              inMovi = lt == "movi" || (inMovi && lt == "rec "), depth + 1)
          case "avih" if size >= 56 =>
            usPerFrame = le32(b, off + 8)
            totalFrames = le32(b, off + 24)
            w = le32(b, off + 40); h = le32(b, off + 44)
          case "strh" if size >= 4 =>
            if (fourcc(b, off + 8) == "vids") vids = true
          case "strf" if size >= 40 =>
            if (le16(b, off + 22) == 24 && le32(b, off + 24) == 0) dib24 = true
            else if (fourcc(b, off + 24) == "MJPG") mjpg = true
          case "00db" | "00dc" if inMovi =>
            frames += ((off + 8, size))
          case _ => ()
        }
        off += 8 + size + (size & 1)
      }
    }
    walk(12, b.length, inMovi = false, depth = 0)
    if (bad || !vids || !(dib24 || mjpg) || usPerFrame <= 0 ||
      frames.isEmpty) return None
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return None
    if (totalFrames != frames.length) return None
    if (dib24) {
      val stride = ((w * 3 + 3) / 4) * 4
      // Long arithmetic: w,h are allowed up to 2^20 each, so stride·h can
      // wrap Int for a crafted header (e.g. w=2^20, h=1366) and a wrapped
      // "match" would send negative/overflowed offsets into
      // aviFramePixels. Chunk sizes are Ints already bounds-checked
      // against the buffer, so equality in Long also proves the per-frame
      // pixel buffer (≤ stride·h) fits an Int.
      if (!frames.forall(_._2.toLong == stride.toLong * h)) return None
    } else {
      // each compressed chunk must be a JPEG stream: SOI first, EOI last
      // (chunk size excludes RIFF padding, so the last byte is exact) —
      // the full entropy decode happens per sampled frame, not here
      if (!frames.forall { case (o, sz) => sz >= 4 &&
        (b(o) & 0xff) == 0xff && (b(o + 1) & 0xff) == 0xd8 &&
        (b(o + sz - 2) & 0xff) == 0xff && (b(o + sz - 1) & 0xff) == 0xd9 })
        return None
    }
    Some(AviMeta(w, h, usPerFrame, frames.map(_._1).toArray,
      frames.map(_._2).toArray, if (dib24) "dib" else "mjpg"))
  }

  /** Extract one frame's pixels (BGR top-down, stride-stripped) by
    * offset — the per-frame seek [[decodeAviMeta]] enables. For MJPEG
    * the chunk is a genuine baseline-JPEG stream entropy-decoded here
    * ([[JpegBinary]]); a frame whose decode fails or whose SOF dims
    * disagree with the container returns a zero frame of the declared
    * geometry (conforming files never hit it; callers keep their fixed
    * w·h·3 contract either way).
    */
  def aviFramePixels(b: Array[Byte], m: AviMeta, k: Int): Array[Byte] = {
    if (m.codec == "mjpg") {
      val off = m.frameOffsets(k)
      val jpeg = java.util.Arrays.copyOfRange(b, off, off + m.frameSizes(k))
      JpegBinary.decodeJpeg(jpeg) match {
        case Some(j) if j.width == m.width && j.height == m.height => j.pixels
        case _ => new Array[Byte](m.width * m.height * 3)
      }
    } else {
      val w3 = m.width * 3
      val out = new Array[Byte](w3 * m.height)
      var y = 0
      while (y < m.height) {
        System.arraycopy(b, m.frameOffsets(k) + (m.height - 1 - y) * m.stride,
          out, y * w3, w3)
        y += 1
      }
      out
    }
  }

  /** Full decode: every frame extracted. */
  def decodeAvi(b: Array[Byte]): Option[Avi] =
    decodeAviMeta(b).map(m => Avi(m.width, m.height, m.usPerFrame,
      Array.tabulate(m.nFrames)(k => aviFramePixels(b, m, k))))
}
