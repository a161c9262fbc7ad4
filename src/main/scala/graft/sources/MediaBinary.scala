package graft.sources

/** Pure-JVM media container codecs: BMP (BITMAPINFOHEADER, 24 bpp
  * uncompressed) and WAV (RIFF/WAVE, integer PCM) — the XlsBinary
  * precedent (hand-built OLE2/BIFF8) applied to the multimodal stubs so
  * one image and one audio modality decode GENUINELY end to end with no
  * external jar. Formats follow the public specifications only
  * (Windows BITMAPFILEHEADER/BITMAPINFOHEADER layout; the RIFF/WAVE
  * chunk grammar with canonical `fmt ` and `data` chunks).
  *
  * Both decoders are defensive parsers, not trusted-layout slicers:
  * magic bytes, header sizes, dimension/bit-depth sanity, and
  * bounds-checked pixel/sample extents are validated, and WAV walks the
  * chunk list (skipping unknown chunks with RIFF's even-byte padding)
  * instead of assuming the canonical 44-byte prefix — so a truncated or
  * alien payload returns None and the caller falls back to its declared
  * stub rather than throwing mid-partition.
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
}
