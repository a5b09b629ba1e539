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
  *  - Compression 1 (none) and 32773 (PackBits — the genuinely
  *    compressed arm: literal runs, replicate runs, -128 no-ops,
  *    per-strip byte budget enforced)
  *  - strip layout via StripOffsets/StripByteCounts/RowsPerStrip,
  *    chunky PlanarConfiguration only
  *
  * None (never a garbage raster) on: bad magic, truncated IFDs or
  * strips, unsupported photometric/compression/planar combinations,
  * PackBits overruns, palette indices past the ColorMap, or dimensions
  * beyond the shared [[PngCodec.MaxPixels]] ceiling.
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
    if (compression != TNone && compression != TPackBits) return None

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
