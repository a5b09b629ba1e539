package graft.operators

import graft.operators.PpmCodec.PpmImage

/** Dependency-free Windows BMP (DIB) decoder — the no-compression
  * workhorse format that still shows up constantly in scraped corpora
  * (screenshots, legacy exports, clipboard dumps). Output is normalized
  * to the same packed-RGB [[PpmImage]] the PPM/PNG/JPEG paths produce,
  * so downstream features / resize / frame ops stay format-agnostic.
  *
  * Scope (the classic Windows matrix, per the public WINGDI
  * BITMAPFILEHEADER/BITMAPINFOHEADER layout):
  *  - header: BITMAPINFOHEADER (40) and its V4/V5 extensions (108/124 —
  *    extra fields skipped), bottom-up (positive height) and top-down
  *    (negative height) row order, 4-byte-aligned row stride
  *  - 1/4/8-bit palette (BGRA quads, `biClrUsed` or full 2^n), with
  *    per-pixel palette bounds checks
  *  - 16-bit BI_RGB (the 5-5-5 default) and BI_BITFIELDS with arbitrary
  *    contiguous masks on 16/32 bpp (sample scaled to 8 bits by bit
  *    replication, the same depth-rescale rule PngCodec uses)
  *  - 24-bit BGR and 32-bit BGRX BI_RGB
  *  - BI_RLE8 / BI_RLE4 (genuinely compressed arms): encoded runs,
  *    absolute runs with word alignment, end-of-line (0,0), end-of-bitmap
  *    (0,1) and delta (0,2) escapes — un-covered pixels default to
  *    palette entry 0, matching the common-decoder convention
  *
  * Returns None (never throws, never a garbage raster) on: bad magic,
  * truncated headers or pixel data, non-positive/absurd dimensions
  * (shared [[PngCodec.MaxPixels]] ceiling), unsupported compression
  * (BI_JPEG/BI_PNG passthroughs), out-of-range palette indices, or RLE
  * runs that escape the raster.
  */
object BmpCodec {

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def i32(b: Array[Byte], off: Int): Int = u32(b, off).toInt

  /** Scale a masked sample of `bits` width to 8 bits by bit replication
    * (exact for the 1..8 widths BMP masks use; wider masks keep the high
    * byte — same rescale convention as PngCodec's 16-bit arm).
    */
  private def rescale(v: Int, bits: Int): Int = {
    if (bits <= 0) 0
    else if (bits == 8) v
    else if (bits > 8) v >>> (bits - 8)
    else {
      var out = 0
      var filled = 0
      while (filled < 8) { // replicate the bit pattern down the byte
        out = (out << bits) | v
        filled += bits
      }
      (out >>> (filled - 8)) & 0xff
    }
  }

  private final case class Mask(shift: Int, bits: Int) {
    def extract(px: Long): Int = rescale(((px >>> shift) & ((1L << bits) - 1)).toInt, bits)
  }

  private def maskOf(m: Long): Option[Mask] = {
    if (m == 0) return Some(Mask(0, 0))
    var shift = 0
    var v = m
    while ((v & 1L) == 0) { v >>>= 1; shift += 1 }
    var bits = 0
    while ((v & 1L) == 1) { v >>>= 1; bits += 1 }
    if (v != 0) None else Some(Mask(shift, bits)) // non-contiguous → reject
  }

  def decode(bytes: Array[Byte]): Option[PpmImage] = {
    if (bytes == null || bytes.length < 54) return None
    if (bytes(0) != 'B' || bytes(1) != 'M') return None
    // bfOffBits is u32: a >=2^31 value must reject here, not wrap to a
    // negative Int and silently take the ICO computed-offset branch
    // (review finding)
    val po = u32(bytes, 10)
    if (po > bytes.length) return None
    decodeDib(bytes, dibOff = 14, pixelOffIn = po.toInt,
      halveHeight = false)
  }

  /** DIB-only core, shared with [[IcoCodec]] (whose images are BMPs
    * without the 14-byte file header): `dibOff` locates the
    * BITMAPINFOHEADER, `pixelOffIn < 0` means "pixels start right after
    * the palette" (the ICO layout), and `halveHeight` applies the ICO
    * convention of a doubled height field (XOR raster + AND mask — the
    * mask is ignored, alpha-drop policy).
    */
  private[operators] def decodeDib(bytes: Array[Byte], dibOff: Int,
                                   pixelOffIn: Int,
                                   halveHeight: Boolean): Option[PpmImage] = {
    if (dibOff < 0 || dibOff + 40 > bytes.length) return None
    val dibSize = u32(bytes, dibOff)
    // BITMAPINFOHEADER and the V2..V5 extensions; CORE (12) not emitted
    // by anything modern enough to reach a training corpus
    if (dibSize < 40 || dibOff + dibSize > bytes.length) return None
    val width = i32(bytes, dibOff + 4)
    val heightRaw0 = i32(bytes, dibOff + 8)
    val planes = u16(bytes, dibOff + 12)
    val bpp = u16(bytes, dibOff + 14)
    val compression = u32(bytes, dibOff + 16)
    val clrUsed = u32(bytes, dibOff + 32)
    val heightRaw =
      if (!halveHeight) heightRaw0
      else if (heightRaw0 % 2 != 0) return None
      else heightRaw0 / 2
    val topDown = heightRaw < 0
    val height = math.abs(heightRaw)
    if (width <= 0 || height <= 0 || planes != 1) return None
    if (width.toLong * height > PngCodec.MaxPixels) return None
    if (!Set(1, 4, 8, 16, 24, 32).contains(bpp)) return None

    // compression: 0=BI_RGB, 1=BI_RLE8 (8bpp), 2=BI_RLE4 (4bpp),
    // 3=BI_BITFIELDS (16/32bpp). JPEG/PNG passthrough and anything else → None
    val masks: Option[(Mask, Mask, Mask)] = compression match {
      case 0L => None
      case 1L => if (bpp != 8) return None else None
      case 2L => if (bpp != 4) return None else None
      case 3L =>
        if (bpp != 16 && bpp != 32) return None
        // masks live right after the 40-byte header (or in the V4 fields —
        // same offset either way)
        if (bytes.length < dibOff + 40 + 12) return None
        val r = maskOf(u32(bytes, dibOff + 40)).getOrElse(return None)
        val g = maskOf(u32(bytes, dibOff + 44)).getOrElse(return None)
        val b = maskOf(u32(bytes, dibOff + 48)).getOrElse(return None)
        if (r.bits == 0 || g.bits == 0 || b.bits == 0) return None
        Some((r, g, b))
      case _ => return None
    }

    // palette (BGRA quads) for <=8 bpp, located after the DIB header
    // (+12 for the BITFIELDS mask block when dibSize == 40)
    val palOff = dibOff + dibSize.toInt +
      (if (compression == 3L && dibSize == 40) 12 else 0)
    val palette: Array[Int] =
      if (bpp <= 8) {
        val n = if (clrUsed > 0) clrUsed.toInt else 1 << bpp
        if (n > 256 || palOff + 4L * n > bytes.length) return None
        Array.tabulate(n) { i =>
          val o = palOff + 4 * i
          ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 1) & 0xff) << 8) | (bytes(o) & 0xff)
        }
      } else null

    val out = new Array[Byte](width * height * 3)

    @inline def put(x: Int, y: Int, rgb: Int): Unit = {
      val row = if (topDown) y else height - 1 - y
      val o = (row * width + x) * 3
      out(o) = ((rgb >>> 16) & 0xff).toByte
      out(o + 1) = ((rgb >>> 8) & 0xff).toByte
      out(o + 2) = (rgb & 0xff).toByte
    }

    val off =
      if (pixelOffIn >= 0) pixelOffIn
      else palOff + (if (palette != null) 4 * palette.length else 0)
    if (off < 0 || off > bytes.length) return None

    if (compression == 1L || compression == 2L) {
      // RLE: fill with palette entry 0 first (escape-delta convention)
      if (palette.isEmpty) return None
      var x = 0; var y = 0; var p = off
      var i = 0
      while (i < width * height) { put(i % width, i / width, palette(0)); i += 1 }
      val rle4 = compression == 2L
      while (p + 1 < bytes.length) {
        val n = bytes(p) & 0xff
        val v = bytes(p + 1) & 0xff
        p += 2
        if (n > 0) { // encoded run
          var k = 0
          while (k < n) {
            val idx =
              if (!rle4) v
              else if ((k & 1) == 0) (v >>> 4) & 0xf
              else v & 0xf
            if (idx >= palette.length) return None
            if (x >= width || y >= height) return None
            put(x, y, palette(idx))
            x += 1
            if (x == width) { } // runs may not wrap; next escape handles EOL
            k += 1
          }
        } else v match {
          case 0 => x = 0; y += 1 // end of line
          case 1 => return Some(PpmImage(width, height, out)) // end of bitmap
          case 2 => // delta
            if (p + 1 >= bytes.length) return None
            x += bytes(p) & 0xff; y += bytes(p + 1) & 0xff; p += 2
          case cnt => // absolute run of cnt indices
            val nBytes = if (rle4) (cnt + 1) / 2 else cnt
            val padded = (nBytes + 1) & ~1 // word-aligned
            if (p + padded > bytes.length) return None
            var k = 0
            while (k < cnt) {
              val b0 = bytes(p + (if (rle4) k / 2 else k)) & 0xff
              val idx =
                if (!rle4) b0
                else if ((k & 1) == 0) (b0 >>> 4) & 0xf
                else b0 & 0xf
              if (idx >= palette.length) return None
              if (x >= width || y >= height) return None
              put(x, y, palette(idx))
              x += 1
              k += 1
            }
            p += padded
        }
      }
      None // ran out of bytes before end-of-bitmap
    } else {
      val stride = ((width.toLong * bpp + 31) / 32 * 4).toInt
      if (off + stride.toLong * height > bytes.length) return None
      // hoisted out of the pixel loop: no per-pixel tuple allocation
      // (review finding); BI_RGB 16bpp defaults to the 5-5-5 layout
      val (m16r, m16g, m16b) = masks.getOrElse(
        (Mask(10, 5), Mask(5, 5), Mask(0, 5)))
      var y = 0
      while (y < height) {
        val rowOff = off + y * stride
        var x = 0
        while (x < width) {
          val rgb = bpp match {
            case 1 =>
              val b0 = bytes(rowOff + (x >> 3)) & 0xff
              val idx = (b0 >>> (7 - (x & 7))) & 1
              if (idx >= palette.length) return None
              palette(idx)
            case 4 =>
              val b0 = bytes(rowOff + (x >> 1)) & 0xff
              val idx = if ((x & 1) == 0) (b0 >>> 4) & 0xf else b0 & 0xf
              if (idx >= palette.length) return None
              palette(idx)
            case 8 =>
              val idx = bytes(rowOff + x) & 0xff
              if (idx >= palette.length) return None
              palette(idx)
            case 16 =>
              val px = u16(bytes, rowOff + 2 * x).toLong
              (m16r.extract(px) << 16) | (m16g.extract(px) << 8) |
                m16b.extract(px)
            case 24 =>
              val o = rowOff + 3 * x
              ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 1) & 0xff) << 8) | (bytes(o) & 0xff)
            case 32 =>
              val px = u32(bytes, rowOff + 4 * x)
              masks match {
                case Some((mr, mg, mb)) =>
                  (mr.extract(px) << 16) | (mg.extract(px) << 8) | mb.extract(px)
                case None => // BGRX
                  (((px >>> 16) & 0xff) << 16 | ((px >>> 8) & 0xff) << 8 | (px & 0xff)).toInt
              }
          }
          put(x, y, rgb)
          x += 1
        }
        y += 1
      }
      Some(PpmImage(width, height, out))
    }
  }
}
