package graft.ops

/** Minimal dependency-free GIF codec — the third REAL image format after
  * [[Png]] and [[Jpeg]]. 8-bit indexed color with a grayscale palette,
  * single image, no interlacing — but the LZW layer is the real algorithm
  * on both sides: a genuine variable-width LZW compressor (dictionary
  * growth, width bumps at 2^n boundaries, clear-and-reset at 4096) and a
  * spec-compliant decoder (KwKwK case, early width change, mid-stream
  * clear codes), so the decoder works on output of any conforming encoder.
  *
  * Reference behavior anchor: the reference pipeline treats media blobs as
  * opaque bytes and extracts typed metadata downstream; this codec makes
  * that extraction REAL for GIF the way Png does for PNG.
  */
object Gif {

  /** Decoded image: dims plus exact pixel-value sum (palette-mapped), the
    * cheap feature that proves the LZW stream really decompressed. */
  final case class Image(width: Int, height: Int, pixelSum: Long)

  def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && {
      val s = new String(bytes, 0, 6, "US-ASCII")
      s == "GIF87a" || s == "GIF89a"
    }

  private val MaxCode = 4096 // 12-bit LZW ceiling per the GIF spec

  /** Encode a width×height GIF87a whose pixel index at (x, y) is
    * `pixel(x, y) & 0xff`, over an identity grayscale global palette —
    * REAL LZW compression (not the uncompressed-GIF literal trick). */
  def encode(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff,
      s"bad dims ${width}x$height")
    require(width.toLong * height <= Int.MaxValue,
      s"pixel count overflows Int: ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF87a".getBytes("US-ASCII"))
    u16(width); u16(height)
    out.write(0xf7) // global table, 8-bit color resolution, 256 entries
    out.write(0)    // background index
    out.write(0)    // aspect
    (0 until 256).foreach { i => out.write(i); out.write(i); out.write(i) }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(width); u16(height)
    out.write(0)    // no local table, not interlaced
    out.write(8)    // LZW minimum code size

    // --- LZW compress the index stream ---
    val Clear = 256; val Eoi = 257
    val packed = new java.io.ByteArrayOutputStream() // bit-packed code stream
    var cur = 0; var nbits = 0
    def emit(code: Int, w: Int): Unit = {
      cur |= code << nbits; nbits += w
      while (nbits >= 8) { packed.write(cur & 0xff); cur >>>= 8; nbits -= 8 }
    }
    var dict = new scala.collection.mutable.LongMap[Int]()
    var next = 258; var cw = 9
    emit(Clear, cw)
    var prefix = pixel(0, 0) & 0xff
    var i = 1
    val n = width * height
    while (i < n) {
      val k = pixel(i % width, i / width) & 0xff
      val key = prefix.toLong << 8 | k
      dict.get(key) match {
        case Some(c) => prefix = c
        case None =>
          emit(prefix, cw)
          if (next == MaxCode) { // dictionary full: clear and restart
            emit(Clear, cw)
            dict = new scala.collection.mutable.LongMap[Int]()
            next = 258; cw = 9
          } else {
            dict(key) = next; next += 1
            // encoder runs one dictionary entry AHEAD of the decoder at
            // each read, so it widens one entry later: next == 2^cw + 1
            if (cw < 12 && next == (1 << cw) + 1) cw += 1
          }
          prefix = k
      }
      i += 1
    }
    emit(prefix, cw)
    emit(Eoi, cw)
    if (nbits > 0) packed.write(cur & 0xff)

    val data = packed.toByteArray
    var off = 0
    while (off < data.length) {
      val len = math.min(255, data.length - off)
      out.write(len)
      out.write(data, off, len)
      off += len
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Strict decode: None on structural corruption (bad signature/framing,
    * truncated sub-blocks, out-of-range LZW codes, pixel count mismatch).
    * Handles 87a/89a, extension blocks, local color tables, KwKwK and
    * mid-stream clears. Interlacing is rejected (sum would still be right,
    * but dims/order semantics wouldn't be validated honestly). */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (!isGif(bytes)) return None
    try {
      var pos = 6
      def u16(): Int = { val v = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8); pos += 2; v }
      if (pos + 7 > bytes.length) return None
      val sw = u16(); val sh = u16()
      val packed = bytes(pos) & 0xff; pos += 3 // packed, bg, aspect
      var palette: Array[Int] = null
      if ((packed & 0x80) != 0) {
        val size = 2 << (packed & 7)
        if (pos + size * 3 > bytes.length) return None
        palette = Array.tabulate(size)(i => bytes(pos + i * 3) & 0xff) // r channel
        pos += size * 3
      }
      if (sw <= 0 || sh <= 0) return None

      // skip extensions to the image descriptor
      while (pos < bytes.length && (bytes(pos) & 0xff) == 0x21) {
        pos += 2 // introducer + label
        var len = if (pos < bytes.length) bytes(pos) & 0xff else return None
        while (len != 0) {
          pos += 1 + len
          if (pos >= bytes.length) return None
          len = bytes(pos) & 0xff
        }
        pos += 1
      }
      if (pos >= bytes.length || (bytes(pos) & 0xff) != 0x2c) return None
      pos += 1
      u16(); u16() // left, top
      val w = u16(); val h = u16()
      if (pos >= bytes.length) return None
      val ipacked = bytes(pos) & 0xff; pos += 1
      if ((ipacked & 0x40) != 0) return None // interlaced: unsupported
      if ((ipacked & 0x80) != 0) {
        val size = 2 << (ipacked & 7)
        if (pos + size * 3 > bytes.length) return None
        palette = Array.tabulate(size)(i => bytes(pos + i * 3) & 0xff)
        pos += size * 3
      }
      if (palette == null || w <= 0 || h <= 0) return None

      if (pos >= bytes.length) return None
      val minCode = bytes(pos) & 0xff; pos += 1
      if (minCode < 2 || minCode > 8) return None
      // concatenate data sub-blocks
      val data = new java.io.ByteArrayOutputStream()
      var len = bytes(pos) & 0xff; pos += 1
      while (len != 0) {
        if (pos + len > bytes.length) return None
        data.write(bytes, pos, len)
        pos += len
        if (pos >= bytes.length) return None
        len = bytes(pos) & 0xff; pos += 1
      }
      if (pos >= bytes.length || (bytes(pos) & 0xff) != 0x3b) return None

      // --- LZW decompress; track per-code (chainSum, chainLen, firstChar)
      // incrementally so emitting a code is O(1), not a chain walk ---
      val stream = data.toByteArray
      val clear = 1 << minCode
      val eoi = clear + 1
      val roots = clear
      val chainSum = new Array[Long](MaxCode)
      val chainLen = new Array[Int](MaxCode)
      val first = new Array[Int](MaxCode)
      def pal(i: Int): Long = if (i < palette.length) palette(i).toLong else 0L
      def resetRoots(): Unit = (0 until roots).foreach { c =>
        chainSum(c) = pal(c); chainLen(c) = 1; first(c) = c
      }
      resetRoots()
      var bitPos = 0
      def read(wd: Int): Int = {
        if (bitPos + wd > stream.length * 8) return -1
        var v = 0; var got = 0
        while (got < wd) {
          val b = stream(bitPos >> 3) & 0xff
          v |= ((b >> (bitPos & 7)) & 1) << got
          bitPos += 1; got += 1
        }
        v
      }
      var cw = minCode + 1
      var next = eoi + 1
      var prev = -1
      var outCount = 0L
      var outSum = 0L
      val total = w.toLong * h
      var running = true
      while (running) {
        val code = read(cw)
        if (code < 0) return None // truncated before EOI
        if (code == clear) {
          cw = minCode + 1; next = eoi + 1; prev = -1
        } else if (code == eoi) {
          running = false
        } else if (prev == -1) {
          if (code >= roots) return None // first code after clear must be a root
          outSum += chainSum(code); outCount += 1
          prev = code
        } else {
          // both the known-code and KwKwK cases append first(prev-chain ∘ code)
          val (sum, ln, fc) =
            if (code < next) (chainSum(code), chainLen(code), first(code))
            else if (code == next) { // KwKwK: code not yet in the table
              val f = first(prev)
              (chainSum(prev) + pal(f), chainLen(prev) + 1, f)
            } else return None
          outSum += sum; outCount += ln
          if (next < MaxCode) {
            chainSum(next) = chainSum(prev) + pal(fc)
            chainLen(next) = chainLen(prev) + 1
            first(next) = first(prev)
            next += 1
            if (cw < 12 && next == (1 << cw)) cw += 1
          }
          prev = code
        }
        if (outCount > total) return None
      }
      if (outCount != total) return None
      if (w != sw || h != sh) return None // single-image fixtures: must agree
      Some(Image(w, h, outSum))
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
