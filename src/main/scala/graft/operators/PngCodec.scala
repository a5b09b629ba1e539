package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

import graft.operators.PpmCodec.PpmImage

/** Dependency-free PNG decoder (and a minimal encoder for round-trip
  * specs), built only on the JDK: `java.util.zip.Inflater` for the zlib
  * IDAT stream and plain byte arithmetic for scanline unfiltering. This
  * retires the "pseudo-decode" fallback for PNG payloads in
  * [[Multimodal.decodeFeatures]] — a deflate-based real-world raster
  * format now decodes to actual pixels inside the container.
  *
  * Scope (the common training-corpus shape): color types 0 (grayscale),
  * 2 (truecolor RGB) and 6 (RGBA) at 8 bits per sample, plus — round 5 —
  * type 3 (palette/indexed via PLTE, with or without a tRNS chunk) at
  * bit depths 1/2/4/8, non-interlaced. 16-bit/gray+alpha/Adam7 payloads
  * return None and take the documented fallback arm exactly like JPEG.
  * Output is normalized to the same 3-byte-RGB [[PpmImage]] the PPM path
  * produces, so features / resize / frame ops downstream are
  * format-agnostic (gray replicates into RGB, alpha — including tRNS
  * palette alpha — is dropped: feature extraction, not compositing).
  *
  * PNG spec: RFC 2083 / W3C PNG (public). Filters: None/Sub/Up/Average/
  * Paeth, applied per scanline over a 1-filter-byte + width*bpp layout.
  */
object PngCodec {

  /** Decode-size ceiling shared with [[JpegCodec]]: 2^26 pixels (192 MB of
    * RGB) — far above any sane training-corpus image, far below a
    * task-killing allocation from a corrupt 4-byte dimension field.
    */
  private[operators] val MaxPixels: Long = 1L << 26

  private val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && (0 until 8).forall(i => bytes(i) == Signature(i))

  /** Decode one PNG payload to RGB pixels, or None if the payload is not a
    * PNG in the supported subset (bad signature/CRC, palette, 16-bit,
    * interlaced, truncated, or corrupt deflate stream).
    */
  def decode(bytes: Array[Byte]): Option[PpmImage] = {
    if (!isPng(bytes)) return None
    var off = 8
    var width = 0; var height = 0; var colorType = -1; var bitDepth = -1
    var interlace = -1
    var sawIhdr = false; var sawIend = false
    var plte: Array[Byte] = null
    var trnsLen = -1
    val idat = new java.io.ByteArrayOutputStream()
    val crc = new CRC32()
    while (!sawIend && off + 8 <= bytes.length) {
      val len = beInt(bytes, off)
      if (len < 0 || off + 12L + len > bytes.length) return None
      val typeOff = off + 4
      crc.reset()
      crc.update(bytes, typeOff, 4 + len)
      if (crc.getValue.toInt != beInt(bytes, typeOff + 4 + len)) return None
      val chunkType = new String(bytes, typeOff, 4, "US-ASCII")
      chunkType match {
        case "IHDR" =>
          if (len != 13) return None
          width = beInt(bytes, typeOff + 4)
          height = beInt(bytes, typeOff + 8)
          bitDepth = bytes(typeOff + 12) & 0xFF
          colorType = bytes(typeOff + 13) & 0xFF
          // compression and filter METHOD must be 0 per the spec (the
          // per-scanline filter TYPE varies; the method does not)
          if (bytes(typeOff + 14) != 0 || bytes(typeOff + 15) != 0) return None
          if (bytes(typeOff + 16) != 0 && bytes(typeOff + 16) != 1) return None
          interlace = bytes(typeOff + 16) & 0xFF
          sawIhdr = true
        case "PLTE" =>
          // 1..256 RGB triples, exactly once, before IDAT
          if (len == 0 || len % 3 != 0 || len > 768 || plte != null) return None
          plte = java.util.Arrays.copyOfRange(bytes, typeOff + 4, typeOff + 4 + len)
        case "tRNS" =>
          // palette alpha (one byte per leading palette entry). The RGB
          // output drops alpha by contract, but the chunk is still
          // validated so a malformed stream fails loudly, not silently
          trnsLen = len
        case "IDAT" => idat.write(bytes, typeOff + 4, len)
        case "IEND" => sawIend = true
        case _ => // ancillary chunks (tEXt, gAMA, ...) are skippable
      }
      off += 12 + len
    }
    if (!sawIhdr || !sawIend || width <= 0 || height <= 0) return None
    if (interlace != 0) return None
    // bit-depth matrix per the PNG spec's allowed combinations, restricted
    // to the 8-bit-per-sample arm for sample types (16-bit stays fallback)
    // and the full 1/2/4/8 range for palette indices
    val paletteOk = colorType == 3 &&
      (bitDepth == 1 || bitDepth == 2 || bitDepth == 4 || bitDepth == 8)
    if (!paletteOk && bitDepth != 8) return None
    val channels = colorType match {
      case 0 => 1 // grayscale
      case 2 => 3 // RGB
      case 3 => 1 // palette index
      case 6 => 4 // RGBA
      case _ => return None // gray+alpha (4) unsupported
    }
    if (colorType == 3) {
      if (plte == null) return None // palette images require PLTE
      if (trnsLen > plte.length / 3) return None // more alphas than entries
      // indices above the palette's top entry are checked per pixel below
    } else if (colorType == 0 || colorType == 2) {
      // tRNS on gray/RGB names a transparent color (2/6 bytes) — alpha is
      // dropped anyway, but a length that can't be that is corruption
      if (trnsLen >= 0 && trnsLen != channels * 2) return None
    }
    // corrupt headers are routine input at corpus scale: cap pixel count
    // BEFORE any allocation so a 4-byte dim lie (or a zip-bomb IDAT behind
    // it) returns None instead of overflowing the w*h*3 RGB buffer for
    // 1-channel images that pass the raw-size check, or OOMing the task
    if (width.toLong * height.toLong > MaxPixels) return None
    // scanline byte stride: sub-byte palette indices pack big-endian
    // within each byte, rows always start on a byte boundary
    val strideBytes = (width.toLong * channels * bitDepth + 7) / 8
    val rawLen = (1L + strideBytes) * height.toLong
    if (rawLen > Int.MaxValue - 8) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inflater = new Inflater()
    try {
      inflater.setInput(idat.toByteArray)
      var filled = 0
      while (filled < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, filled, raw.length - filled)
        if (n == 0 && (inflater.needsInput() || inflater.needsDictionary()))
          return None // truncated or preset-dictionary stream
        filled += n
      }
      if (filled < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()
    unfilterToRgb(raw, width, height, channels, bitDepth,
      if (colorType == 3) plte else null)
  }

  /** Reverse the per-scanline filters in place over `raw` (layout:
    * height rows of [filterByte, scanline bytes]) and project to packed
    * RGB. Filter math is the spec's: bytes are unsigned, the "left"
    * neighbor is `bpp = ceil(channels·bitDepth/8)` bytes back (1 for all
    * palette depths), out-of-row neighbors are 0. Palette rows unpack
    * big-endian sub-byte indices after unfiltering; an index beyond the
    * palette is corruption and fails the decode.
    */
  private def unfilterToRgb(raw: Array[Byte], width: Int, height: Int,
                            channels: Int, bitDepth: Int,
                            palette: Array[Byte]): Option[PpmImage] = {
    val stride = ((width.toLong * channels * bitDepth + 7) / 8).toInt
    val bpp = math.max(1, channels * bitDepth / 8)
    val nEntries = if (palette == null) 0 else palette.length / 3
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val rowOff = y * (stride + 1)
      val filter = raw(rowOff) & 0xFF
      val cur = rowOff + 1
      val prev = cur - (stride + 1) // previous row's samples (after its filter byte)
      var x = 0
      filter match {
        case 0 => // None
        case 1 => // Sub
          x = bpp
          while (x < stride) {
            raw(cur + x) = (raw(cur + x) + raw(cur + x - bpp)).toByte
            x += 1
          }
        case 2 => // Up
          if (y > 0) {
            x = 0
            while (x < stride) {
              raw(cur + x) = (raw(cur + x) + raw(prev + x)).toByte
              x += 1
            }
          }
        case 3 => // Average
          x = 0
          while (x < stride) {
            val left = if (x >= bpp) raw(cur + x - bpp) & 0xFF else 0
            val up = if (y > 0) raw(prev + x) & 0xFF else 0
            raw(cur + x) = (raw(cur + x) + ((left + up) >> 1)).toByte
            x += 1
          }
        case 4 => // Paeth
          x = 0
          while (x < stride) {
            val a = if (x >= bpp) raw(cur + x - bpp) & 0xFF else 0
            val b = if (y > 0) raw(prev + x) & 0xFF else 0
            val c = if (y > 0 && x >= bpp) raw(prev + x - bpp) & 0xFF else 0
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            raw(cur + x) = (raw(cur + x) + pred).toByte
            x += 1
          }
        case _ => return None
      }
      // project this unfiltered scanline into packed RGB
      var px = 0
      while (px < width) {
        val d = (y * width + px) * 3
        if (palette != null) {
          // big-endian bit packing: pixel px lives at bit px*bitDepth
          val bitPos = px * bitDepth
          val b = raw(cur + (bitPos >> 3)) & 0xFF
          val shift = 8 - bitDepth - (bitPos & 7)
          val idx = (b >> shift) & ((1 << bitDepth) - 1)
          if (idx >= nEntries) return None
          out(d) = palette(idx * 3)
          out(d + 1) = palette(idx * 3 + 1)
          out(d + 2) = palette(idx * 3 + 2)
        } else {
          val s = cur + px * channels
          channels match {
            case 1 =>
              val g = raw(s)
              out(d) = g; out(d + 1) = g; out(d + 2) = g
            case _ =>
              out(d) = raw(s); out(d + 1) = raw(s + 1); out(d + 2) = raw(s + 2)
          }
        }
        px += 1
      }
      y += 1
    }
    Some(PpmImage(width, height, out))
  }

  /** Minimal encoder (truecolor RGB, filter 0 on every scanline) so specs
    * can round-trip pixel-exactly against the PPM path without any
    * external fixture; also exercises the CRC/zlib framing the decoder
    * checks.
    */
  def encode(img: PpmImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    def writeChunk(chunkType: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(len >>> 24); out.write(len >>> 16); out.write(len >>> 8); out.write(len)
      val t = chunkType.getBytes("US-ASCII")
      val crc = new CRC32()
      crc.update(t); crc.update(data)
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val c = crc.getValue.toInt
      out.write(c >>> 24); out.write(c >>> 16); out.write(c >>> 8); out.write(c)
    }
    val ihdr = new Array[Byte](13)
    def putBe(arr: Array[Byte], off: Int, v: Int): Unit = {
      arr(off) = (v >>> 24).toByte; arr(off + 1) = (v >>> 16).toByte
      arr(off + 2) = (v >>> 8).toByte; arr(off + 3) = v.toByte
    }
    putBe(ihdr, 0, img.width); putBe(ihdr, 4, img.height)
    ihdr(8) = 8; ihdr(9) = 2 // bit depth 8, color type RGB
    writeChunk("IHDR", ihdr)
    val stride = img.width * 3
    val raw = new Array[Byte]((stride + 1) * img.height)
    var y = 0
    while (y < img.height) {
      System.arraycopy(img.pixels, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](8192)
    val z = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) z.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    writeChunk("IDAT", z.toByteArray)
    writeChunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Indexed-color encoder (filter 0, big-endian sub-byte packing) so the
    * palette decode path round-trips against an independently-assembled
    * stream in specs: `indices` are row-major palette indices, `palette`
    * is RGB triples, `trns` (optional) is per-entry alpha for a tRNS
    * chunk. Escapes into real PLTE/tRNS/IDAT framing with CRCs, the same
    * wire shape any standard encoder emits.
    */
  def encodePalette(width: Int, height: Int, palette: Array[Byte],
                    indices: Array[Int], bitDepth: Int,
                    trns: Option[Array[Byte]] = None): Array[Byte] = {
    require(palette.length % 3 == 0 && palette.length <= 768, "bad palette")
    require(Set(1, 2, 4, 8).contains(bitDepth), "bad palette bit depth")
    require(indices.length == width * height, "indices must be w*h")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    def writeChunk(chunkType: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(len >>> 24); out.write(len >>> 16); out.write(len >>> 8); out.write(len)
      val t = chunkType.getBytes("US-ASCII")
      val crc = new CRC32()
      crc.update(t); crc.update(data)
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val c = crc.getValue.toInt
      out.write(c >>> 24); out.write(c >>> 16); out.write(c >>> 8); out.write(c)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (width >>> 24).toByte; ihdr(1) = (width >>> 16).toByte
    ihdr(2) = (width >>> 8).toByte; ihdr(3) = width.toByte
    ihdr(4) = (height >>> 24).toByte; ihdr(5) = (height >>> 16).toByte
    ihdr(6) = (height >>> 8).toByte; ihdr(7) = height.toByte
    ihdr(8) = bitDepth.toByte; ihdr(9) = 3 // color type 3: palette
    writeChunk("IHDR", ihdr)
    writeChunk("PLTE", palette)
    trns.foreach(a => writeChunk("tRNS", a))
    val stride = (width * bitDepth + 7) / 8
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val rowOff = y * (stride + 1) // filter byte 0 already in place
      var px = 0
      while (px < width) {
        val bitPos = px * bitDepth
        val shift = 8 - bitDepth - (bitPos & 7)
        val off = rowOff + 1 + (bitPos >> 3)
        raw(off) = (raw(off) | (indices(y * width + px) << shift)).toByte
        px += 1
      }
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](8192)
    val z = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) z.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    writeChunk("IDAT", z.toByteArray)
    writeChunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
