package graft.sources

/** Pure-JVM GIF codec (GIF89a, CompuServe's public specification) — the
  * fourth hand-built image rung after BMP/JPEG/PNG: the PALETTE-image
  * class, with real variable-width LZW entropy coding on both sides.
  * Public specification only: the 6-byte signature, logical screen
  * descriptor, global/local color tables, extension-block skipping via
  * the sub-block chain, the image descriptor, interlace row order, and
  * GIF-variant LZW (clear/EOI codes, LSB-first bit packing, 12-bit code
  * cap, width bump when the next code crosses a power of two).
  *
  * Scope: the encoder writes a single non-interlaced image with a
  * global palette built from the distinct pixel colors (≤ 256 — the
  * format's own constraint); the decoder accepts any conforming
  * single-frame stream in that class plus interlaced images and local
  * color tables, returning the FIRST image of an animation; a frame
  * smaller than the logical screen is composited at its (left, top)
  * offset over the background color onto a screen-sized canvas. Like GIF
  * itself the pixel path is LOSSLESS for palette-safe content, so the
  * m10 audit oracles the DECODED pixel sums against the fixture
  * generator exactly (the PNG/m9 pattern). Defensive decode contract
  * throughout: truncation, bad codes, or dimension overflow return
  * None, never throw mid-partition.
  *
  * Reference semantics mirrored: the reference stores opaque binary
  * payloads and handles media driver-side (README.md:55-64); here
  * decode is a first-class engine operator over binary columns.
  */
object GifBinary {

  /** Decoded image: `pixels` is BGR, row-major TOP-DOWN (the house
    * [[MediaBinary.Bmp]] contract) — width·height·3 bytes.
    */
  final case class Gif(width: Int, height: Int, pixels: Array[Byte])

  private val MaxDim = 1 << 14

  // ---- encode --------------------------------------------------------

  /** Encode BGR top-down pixels as a single-frame GIF89a with a global
    * palette of the image's distinct colors (must be ≤ 256) and real
    * LZW-compressed pixel data.
    */
  def encodeGif(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height * 3,
      s"pixels must be w*h*3 BGR bytes (${width}x$height)")
    // palette: distinct colors in first-seen order (RGB-packed ints)
    val palette = new java.util.LinkedHashMap[Integer, Integer]()
    val n = width * height
    val indices = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val o = i * 3
      val rgb = ((pixels(o + 2) & 0xff) << 16) |
        ((pixels(o + 1) & 0xff) << 8) | (pixels(o) & 0xff)
      var idx = palette.get(rgb)
      if (idx == null) {
        idx = palette.size()
        require(palette.size() < 256,
          "GIF palette overflow: more than 256 distinct colors")
        palette.put(rgb, idx)
      }
      indices(i) = idx.toByte
      i += 1
    }
    // color-table size: power of two ≥ max(2, paletteSize); field stores
    // log2(size) - 1
    var ctBits = 1
    while ((1 << ctBits) < palette.size()) ctBits += 1
    val ctSize = 1 << ctBits
    val out = new java.io.ByteArrayOutputStream(n / 2 + ctSize * 3 + 64)
    out.write("GIF89a".getBytes("ISO-8859-1"))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(width); u16(height)
    out.write(0x80 | (ctBits - 1)) // GCT present, size field
    out.write(0); out.write(0)     // background index, no aspect ratio
    val it = palette.keySet().iterator()
    var written = 0
    while (it.hasNext) {
      val rgb = it.next().intValue()
      out.write((rgb >> 16) & 0xff); out.write((rgb >> 8) & 0xff)
      out.write(rgb & 0xff)
      written += 1
    }
    while (written < ctSize) { out.write(0); out.write(0); out.write(0); written += 1 }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(width); u16(height)
    out.write(0)    // no LCT, not interlaced
    val minCode = math.max(2, ctBits)
    out.write(minCode)
    val lzw = lzwEncode(indices, minCode)
    var off = 0
    while (off < lzw.length) {
      val len = math.min(255, lzw.length - off)
      out.write(len); out.write(lzw, off, len)
      off += len
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF-variant LZW encode of palette indices: LSB-first bit packing,
    * clear code emitted first and on dictionary overflow, EOI last.
    */
  private def lzwEncode(data: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 16)
    var cur = 0L; var bits = 0
    var width = minCode + 1
    def emit(code: Int): Unit = {
      cur |= code.toLong << bits
      bits += width
      while (bits >= 8) { out.write((cur & 0xff).toInt); cur >>>= 8; bits -= 8 }
    }
    // dictionary: (prefixCode << 8 | nextByte) -> code
    var dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = eoi + 1
    emit(clear)
    if (data.isEmpty) { emit(eoi) }
    else {
      var w = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xff
        val key = (w << 8) | k
        val hit = dict.get(key)
        if (hit != null) w = hit.intValue()
        else {
          emit(w)
          if (nextCode < 4096) {
            dict.put(key, nextCode)
            nextCode += 1
            if (nextCode > (1 << width) && width < 12) width += 1
          } else {
            emit(clear)
            dict = new java.util.HashMap[Integer, Integer]()
            nextCode = eoi + 1
            width = minCode + 1
          }
          w = k
        }
        i += 1
      }
      emit(w)
      emit(eoi)
    }
    if (bits > 0) out.write((cur & 0xff).toInt)
    out.toByteArray
  }

  // ---- decode --------------------------------------------------------

  /** Dims only — the logical screen descriptor's little-endian u16
    * pair at bytes 6..9 (what m10's oracle mirrors from hex(media)).
    */
  def decodeGifMeta(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 13) return None
    val sig = new String(b, 0, 6, "ISO-8859-1")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = (b(6) & 0xff) | ((b(7) & 0xff) << 8)
    val h = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) None else Some((w, h))
  }

  /** Full decode of the FIRST image frame: palette load → extension
    * skip → LZW decode → (de)interlace → palette lookup → BGR.
    */
  def decodeGif(b: Array[Byte]): Option[Gif] = try {
    val (sw, sh) = decodeGifMeta(b) match {
      case Some(x) => x case None => return None
    }
    var pos = 10
    val packed = b(pos) & 0xff
    val bgIndex = b(pos + 1) & 0xff
    pos += 3 // packed, bg index, aspect
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val size = 1 << ((packed & 7) + 1)
      if (pos + size * 3 > b.length) return None
      gct = readColorTable(b, pos, size)
      pos += size * 3
    }
    // block walk to the first image descriptor
    while (true) {
      if (pos >= b.length) return None
      val tag = b(pos) & 0xff; pos += 1
      tag match {
        case 0x21 => // extension: label + sub-block chain
          if (pos >= b.length) return None
          pos += 1
          var len = if (pos < b.length) b(pos) & 0xff else return None
          while (len != 0) {
            pos += 1 + len
            if (pos >= b.length) return None
            len = b(pos) & 0xff
          }
          pos += 1
        case 0x2c => // image descriptor
          if (pos + 9 > b.length) return None
          val ileft = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8)
          val itop = (b(pos + 2) & 0xff) | ((b(pos + 3) & 0xff) << 8)
          val iw = (b(pos + 4) & 0xff) | ((b(pos + 5) & 0xff) << 8)
          val ih = (b(pos + 6) & 0xff) | ((b(pos + 7) & 0xff) << 8)
          val ipacked = b(pos + 8) & 0xff
          pos += 9
          // a conforming frame fits inside the logical screen; sub-screen
          // frames are composited at (left, top) over the background color
          if (iw <= 0 || ih <= 0 || ileft + iw > sw || itop + ih > sh) return None
          val interlaced = (ipacked & 0x40) != 0
          var ct = gct
          if ((ipacked & 0x80) != 0) {
            val size = 1 << ((ipacked & 7) + 1)
            if (pos + size * 3 > b.length) return None
            ct = readColorTable(b, pos, size)
            pos += size * 3
          }
          if (ct == null) return None
          if (pos >= b.length) return None
          val minCode = b(pos) & 0xff; pos += 1
          if (minCode < 2 || minCode > 11) return None
          // concatenate the sub-block chain
          val lzw = new java.io.ByteArrayOutputStream(b.length - pos)
          var len = if (pos < b.length) b(pos) & 0xff else return None
          while (len != 0) {
            if (pos + 1 + len > b.length) return None
            lzw.write(b, pos + 1, len)
            pos += 1 + len
            if (pos >= b.length) return None
            len = b(pos) & 0xff
          }
          val idx = lzwDecode(lzw.toByteArray, minCode, iw * ih) match {
            case Some(x) => x case None => return None
          }
          // screen-sized canvas pre-filled with the background color (GCT
          // entry at the header's background index when present, else black)
          val px = new Array[Byte](sw * sh * 3)
          if (gct != null && bgIndex < gct.length) {
            val bg = gct(bgIndex)
            var o = 0
            while (o < px.length) {
              px(o) = (bg & 0xff).toByte
              px(o + 1) = ((bg >> 8) & 0xff).toByte
              px(o + 2) = ((bg >> 16) & 0xff).toByte
              o += 3
            }
          }
          val rowOrder =
            if (!interlaced) (0 until ih).toArray
            else { // pass order 0,8.. / 4,8.. / 2,4.. / 1,2..
              val order = new Array[Int](ih)
              var r = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                   y <- start until ih by step) { order(r) = y; r += 1 }
              order
            }
          // plain index loops: a `return` inside a foreach lambda would
          // throw NonLocalReturnControl straight into the defensive
          // catch-all below
          var src = 0
          var r = 0
          while (r < rowOrder.length) {
            val y = rowOrder(r)
            var x = 0
            while (x < iw) {
              val c = idx(src) & 0xff
              if (c >= ct.length) return None
              val rgb = ct(c)
              val o = ((itop + y) * sw + (ileft + x)) * 3
              px(o) = (rgb & 0xff).toByte
              px(o + 1) = ((rgb >> 8) & 0xff).toByte
              px(o + 2) = ((rgb >> 16) & 0xff).toByte
              src += 1
              x += 1
            }
            r += 1
          }
          return Some(Gif(sw, sh, px))
        case 0x3b => return None // trailer before any image
        case _ => return None
      }
    }
    None
  } catch { case _: Throwable => None }

  private def readColorTable(b: Array[Byte], off: Int, size: Int): Array[Int] =
    Array.tabulate(size) { i =>
      ((b(off + i * 3) & 0xff) << 16) | ((b(off + i * 3 + 1) & 0xff) << 8) |
        (b(off + i * 3 + 2) & 0xff)
    }

  /** GIF-variant LZW decode to exactly `expected` palette indices.
    * Handles clear/EOI, the cScSc (code == next unassigned) case, the
    * 12-bit cap with deferred clears, and LSB-first packing.
    */
  private def lzwDecode(z: Array[Byte], minCode: Int,
      expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new Array[Byte](expected)
    var produced = 0
    // dictionary as prefix links: prefix(code), tail(code), len(code)
    val prefix = new Array[Int](4096)
    val tail = new Array[Byte](4096)
    val length = new Array[Int](4096)
    var nextCode = eoi + 1
    var width = minCode + 1
    def resetDict(): Unit = {
      var c = 0
      while (c < clear) { prefix(c) = -1; tail(c) = c.toByte; length(c) = 1; c += 1 }
      nextCode = eoi + 1
      width = minCode + 1
    }
    resetDict()
    var cur = 0L; var bits = 0; var zi = 0
    def read(): Int = {
      while (bits < width) {
        if (zi >= z.length) return -1
        cur |= (z(zi) & 0xffL) << bits
        zi += 1; bits += 8
      }
      val code = (cur & ((1L << width) - 1)).toInt
      cur >>>= width; bits -= width
      code
    }
    def emitSeq(code: Int): Boolean = { // expand a code to `out`
      val l = length(code)
      if (produced + l > expected) return false
      var c = code
      var p = produced + l - 1
      while (c != -1) { out(p) = tail(c); p -= 1; c = prefix(c) }
      produced += l
      true
    }
    var prev = -1
    while (produced < expected) {
      val code = read()
      if (code < 0 || code == eoi) return None // truncated / early EOI
      if (code == clear) { resetDict(); prev = -1 }
      else if (prev == -1) {
        if (code >= clear) return None
        if (!emitSeq(code)) return None
        prev = code
      } else {
        val known = code < nextCode && code != clear && code != eoi
        if (!known && code != nextCode) return None
        val base = if (known) code else prev
        val first = { // first byte of base's expansion
          var c = base
          while (prefix(c) != -1) c = prefix(c)
          tail(c)
        }
        if (nextCode < 4096) {
          prefix(nextCode) = prev
          tail(nextCode) = first
          length(nextCode) = length(prev) + 1
          nextCode += 1
          if (nextCode >= (1 << width) && width < 12) width += 1
        }
        if (!emitSeq(code min (nextCode - 1))) return None
        prev = code
      }
    }
    if (produced == expected) Some(out) else None
  }
}
