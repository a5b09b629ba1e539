package graft.operators

import graft.operators.PpmCodec.PpmImage

/** Dependency-free baseline TIFF decoder — the archival/scan format that
  * dominates digitized-document corpora (and the container behind most
  * OCR training sets). Normalizes to the shared packed-RGB [[PpmImage]].
  *
  * Scope (baseline TIFF 6.0, public specification):
  *  - both byte orders (`II` little-endian, `MM` big-endian)
  *  - first IFD only (multi-page files decode their first page — the
  *    thumbnail/feature convention, same as GIF frames)
  *  - field types BYTE/SHORT/LONG, inline or offset values
  *  - PhotometricInterpretation 0 (WhiteIsZero, inverted gray),
  *    1 (BlackIsZero), 2 (RGB), 3 (palette via 16-bit ColorMap, high
  *    byte kept — the shared depth-rescale convention)
  *  - BitsPerSample 1/4/8 gray (bit-replication scale), 8-bit RGB and
  *    palette; SamplesPerPixel 1 or 3 (extra samples rejected)
  *  - Compression 1 (none), 32773 (PackBits — literal runs, replicate
  *    runs, -128 no-ops, per-strip byte budget enforced) and 5 (LZW —
  *    the compression behind most real archival TIFFs: MSB-first bit
  *    packing, ClearCode 256 / EOI 257, 9→12-bit codes with TIFF's
  *    EARLY-CHANGE width bump at table size 511/1023/2047 — one entry
  *    before GIF's 512/1024/2048, the classic interop trap — and a
  *    per-strip restart)
  *  - Predictor 2 (horizontal differencing, tag 317) on 8-bit samples —
  *    the layout LZW TIFFs almost always pair with, undone sample-wise
  *    per row after decompression
  *  - strip layout via StripOffsets/StripByteCounts/RowsPerStrip,
  *    chunky PlanarConfiguration only
  *
  * None (never a garbage raster) on: bad magic, truncated IFDs or
  * strips, unsupported photometric/compression/planar combinations,
  * PackBits/LZW overruns or malformed code streams, palette indices
  * past the ColorMap, or dimensions beyond the shared
  * [[PngCodec.MaxPixels]] ceiling.
  */
object TiffCodec {

  private final class Reader(b: Array[Byte], le: Boolean) {
    def u16(o: Int): Int =
      if (o + 2 > b.length) -1
      else if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (o + 4 > b.length) -1L
      else if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  }

  private val TNone = 1
  private val TPackBits = 32773
  private val TLzw = 5

  /** TIFF-variant LZW: decode one strip's code stream into exactly
    * `need` bytes. MSB-first bit order; ClearCode 256, EOI 257, first
    * dictionary entry 258; the code width bumps EARLY — when the next
    * free entry is 511/1023/2047 (TIFF 6.0's off-by-one vs GIF, which
    * bumps at 512/1024/2048). Returns None on any malformed stream:
    * out-of-range codes, a first code that isn't a literal, overrun past
    * `need`, or stream exhaustion before `need` bytes are produced.
    */
  private def lzwDecode(b: Array[Byte], off: Int, cnt: Int,
                        need: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](need)
    var o = 0
    // dictionary as (prefix code, appended byte); roots are implicit
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var next = 258
    var width = 9
    var old = -1
    var bitPos = 0L
    val bitEnd = cnt.toLong * 8
    val buf = new Array[Byte](4096) // expansion scratch, longest string

    def readCode(): Int = {
      if (bitPos + width > bitEnd) return -1
      var v = 0
      var i = 0
      while (i < width) {
        val p = off + ((bitPos + i) >>> 3).toInt
        val bit = (b(p) >>> (7 - ((bitPos + i) & 7))) & 1
        v = (v << 1) | bit
        i += 1
      }
      bitPos += width
      v
    }

    // expand `code` into buf tail-first; returns (startIndex, firstByte)
    def expand(code: Int): Int = {
      var i = buf.length
      var c = code
      while (c >= 258) {
        i -= 1; buf(i) = append(c); c = prefix(c)
        if (i == 0) return -1 // cycle guard (corrupt table)
      }
      i -= 1; buf(i) = c.toByte
      i
    }

    while (o < need) {
      val code = readCode()
      if (code < 0 || code == 257) return None // exhausted / early EOI
      if (code == 256) {
        next = 258; width = 9; old = -1
      } else if (old == -1) {
        if (code > 255) return None // first code after clear: literal only
        out(o) = code.toByte; o += 1
        old = code
      } else {
        if (code > next) return None
        val start =
          if (code == next) { // KwKwK: old's string + its first byte
            val s = expand(old)
            if (s < 0) return None
            val first = buf(s)
            val ln = buf.length - s
            if (s == 0) return None
            System.arraycopy(buf, s, buf, s - 1, ln)
            buf(buf.length - 1) = first
            s - 1
          } else {
            val s = expand(code)
            if (s < 0) return None
            s
          }
        val ln = buf.length - start
        if (o + ln > need) return None
        System.arraycopy(buf, start, out, o, ln)
        o += ln
        if (next < 4096) {
          prefix(next) = old; append(next) = buf(start)
          next += 1
        }
        // TIFF early change: bump when the NEXT entry hits 511/1023/2047
        if (next == 511 && width == 9) width = 10
        else if (next == 1023 && width == 10) width = 11
        else if (next == 2047 && width == 11) width = 12
        old = code
      }
    }
    Some(out)
  }

  def decode(bytes: Array[Byte]): Option[PpmImage] = {
    if (bytes == null || bytes.length < 8) return None
    val le = bytes(0) == 'I' && bytes(1) == 'I'
    val be = bytes(0) == 'M' && bytes(1) == 'M'
    if (!le && !be) return None
    val r = new Reader(bytes, le)
    if (r.u16(2) != 42) return None
    val ifd = r.u32(4)
    if (ifd < 8 || ifd + 2 > bytes.length) return None
    val n = r.u16(ifd.toInt)
    if (n <= 0 || ifd + 2 + 12L * n + 4 > bytes.length) return None

    // tag -> (type, count, valueOffsetField)
    var width = -1L; var height = -1L
    var bits = Array(1)
    var compression = TNone
    var photometric = -1
    var stripOffsets: Array[Long] = null
    var stripCounts: Array[Long] = null
    var rowsPerStrip = Long.MaxValue
    var samplesPerPixel = 1
    var planar = 1
    var colorMap: Array[Int] = null
    var predictor = 1

    def values(typ: Int, count: Long, at: Int): Option[Array[Long]] = {
      val size = typ match {
        case 1 => 1 // BYTE
        case 3 => 2 // SHORT
        case 4 => 4 // LONG
        case _ => return None
      }
      if (count < 0 || count > (1L << 20)) return None
      val total = size * count
      val base =
        if (total <= 4) at
        else {
          val off = r.u32(at)
          if (off < 0 || off + total > bytes.length) return None
          off.toInt
        }
      if (base + total > bytes.length) return None
      Some(Array.tabulate(count.toInt) { i =>
        typ match {
          case 1 => (bytes(base + i) & 0xff).toLong
          case 3 => r.u16(base + 2 * i).toLong
          case 4 => r.u32(base + 4 * i)
        }
      })
    }

    var e = 0
    while (e < n) {
      val at = ifd.toInt + 2 + 12 * e
      val tag = r.u16(at)
      val typ = r.u16(at + 2)
      val count = r.u32(at + 4)
      val valAt = at + 8
      def one: Option[Long] = values(typ, count, valAt).flatMap(_.headOption)
      tag match {
        case 256 => width = one.getOrElse(return None)
        case 257 => height = one.getOrElse(return None)
        case 258 =>
          bits = values(typ, count, valAt).getOrElse(return None).map(_.toInt)
        case 259 => compression = one.getOrElse(return None).toInt
        case 262 => photometric = one.getOrElse(return None).toInt
        case 273 => stripOffsets = values(typ, count, valAt).getOrElse(return None)
        case 277 => samplesPerPixel = one.getOrElse(return None).toInt
        case 278 => rowsPerStrip = one.getOrElse(return None)
        case 279 => stripCounts = values(typ, count, valAt).getOrElse(return None)
        case 284 => planar = one.getOrElse(return None).toInt
        case 317 => predictor = one.getOrElse(return None).toInt
        case 320 =>
          colorMap = values(typ, count, valAt).getOrElse(return None).map(_.toInt)
        case _ => // resolution, software, … ignored
      }
      e += 1
    }

    // bound each dimension BEFORE multiplying: two u32s can overflow a
    // Long product and sneak past the pixel ceiling (review finding)
    if (width <= 0 || height <= 0 ||
      width > PngCodec.MaxPixels || height > PngCodec.MaxPixels ||
      width * height > PngCodec.MaxPixels) return None
    if (planar != 1) return None
    if (stripOffsets == null || stripCounts == null ||
      stripOffsets.length != stripCounts.length) return None
    if (compression != TNone && compression != TPackBits &&
      compression != TLzw) return None
    if (predictor != 1 && predictor != 2) return None

    val w = width.toInt; val h = height.toInt
    val (spp, bps) = (samplesPerPixel, bits)
    val ok = photometric match {
      case 0 | 1 => spp == 1 && bps.length == 1 &&
        (bps(0) == 1 || bps(0) == 4 || bps(0) == 8)
      case 2 => spp == 3 && bps.length == 3 && bps.forall(_ == 8)
      case 3 => spp == 1 && bps.length == 1 && bps(0) == 8 &&
        colorMap != null && colorMap.length == 3 * 256
      case _ => false
    }
    if (!ok) return None
    // horizontal differencing is only defined here for full-byte samples
    if (predictor == 2 && !bps.forall(_ == 8)) return None

    // bits per row (chunky), byte-padded per TIFF row rules
    val bitsPerPixel = bps.sum
    val rowBytes = (w.toLong * bitsPerPixel + 7) / 8
    if (rowBytes > Int.MaxValue) return None

    // assemble the decompressed raster strip by strip
    val raster = new Array[Byte]((rowBytes * h).toInt)
    var row = 0
    var si = 0
    while (si < stripOffsets.length && row < h) {
      val rows = math.min(rowsPerStrip, (h - row).toLong).toInt
      val need = (rowBytes * rows).toInt
      val off = stripOffsets(si)
      val cnt = stripCounts(si)
      if (off < 0 || cnt < 0 || off + cnt > bytes.length) return None
      if (compression == TNone) {
        if (cnt < need) return None
        System.arraycopy(bytes, off.toInt, raster, (row * rowBytes).toInt, need)
      } else if (compression == TLzw) {
        val dec = lzwDecode(bytes, off.toInt, cnt.toInt, need)
          .getOrElse(return None)
        System.arraycopy(dec, 0, raster, (row * rowBytes).toInt, need)
      } else {
        // PackBits: n in [0,127] → copy n+1 literal; n in [-127,-1] →
        // repeat next byte 1-n times; -128 no-op
        var p = off.toInt
        val end = (off + cnt).toInt
        var o = (row * rowBytes).toInt
        val lim = o + need
        while (o < lim) {
          if (p >= end) return None
          val c = bytes(p); p += 1
          if (c >= 0) {
            val ln = c + 1
            if (p + ln > end || o + ln > lim) return None
            System.arraycopy(bytes, p, raster, o, ln)
            p += ln; o += ln
          } else if (c != -128) {
            val ln = 1 - c
            if (p >= end || o + ln > lim) return None
            java.util.Arrays.fill(raster, o, o + ln, bytes(p))
            p += 1; o += ln
          }
        }
      }
      row += rows
      si += 1
    }
    if (row < h) return None

    // undo horizontal differencing: each sample is stored as the delta
    // from the same sample one pixel left, per row (mod-256 accumulate)
    if (predictor == 2) {
      var y = 0
      while (y < h) {
        val ro = (y * rowBytes).toInt
        var x = spp
        val lim = w * spp
        while (x < lim) {
          raster(ro + x) = (raster(ro + x) + raster(ro + x - spp)).toByte
          x += 1
        }
        y += 1
      }
    }

    val out = new Array[Byte](w * h * 3)
    val invert = photometric == 0
    var y = 0
    while (y < h) {
      val ro = (y * rowBytes).toInt
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        photometric match {
          case 0 | 1 =>
            val depth = bps(0)
            val raw = depth match {
              case 8 => raster(ro + x) & 0xff
              case 4 =>
                val b0 = raster(ro + (x >> 1)) & 0xff
                val v = if ((x & 1) == 0) (b0 >>> 4) & 0xf else b0 & 0xf
                v * 17 // bit replication 4->8
              case 1 =>
                val b0 = raster(ro + (x >> 3)) & 0xff
                if (((b0 >>> (7 - (x & 7))) & 1) == 1) 255 else 0
            }
            val g = if (invert) 255 - raw else raw
            out(o) = g.toByte; out(o + 1) = g.toByte; out(o + 2) = g.toByte
          case 2 =>
            out(o) = raster(ro + 3 * x)
            out(o + 1) = raster(ro + 3 * x + 1)
            out(o + 2) = raster(ro + 3 * x + 2)
          case 3 =>
            val idx = raster(ro + x) & 0xff
            // ColorMap: 256 reds, 256 greens, 256 blues, 16-bit each
            out(o) = (colorMap(idx) >>> 8).toByte
            out(o + 1) = (colorMap(256 + idx) >>> 8).toByte
            out(o + 2) = (colorMap(512 + idx) >>> 8).toByte
        }
        x += 1
      }
      y += 1
    }
    Some(PpmImage(w, h, out))
  }
}
