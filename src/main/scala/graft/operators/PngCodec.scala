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
  * Scope: the FULL legal IHDR matrix of the PNG spec — color types 0
  * (grayscale, depths 1/2/4/8/16), 2 (truecolor RGB, 8/16), 3
  * (palette/indexed via PLTE at 1/2/4/8, with or without tRNS), 4
  * (gray+alpha, 8/16) and 6 (RGBA, 8/16), each both sequential and
  * Adam7-interlaced (round 5 closed the 16-bit / gray+alpha / Adam7
  * arms; the only remaining `None` paths are genuinely corrupt or
  * truncated streams). Output is normalized to the same 3-byte-RGB
  * [[PpmImage]] the PPM path produces, so features / resize / frame ops
  * downstream are format-agnostic (gray replicates into RGB, sub-byte
  * gray scales to full range by the spec's bit-replication factor,
  * 16-bit samples keep their high byte — the spec's sample-depth
  * rescale — and alpha, including tRNS palette alpha, is dropped:
  * feature extraction, not compositing).
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
    // bit-depth matrix: exactly the PNG spec's legal (colorType, depth)
    // combinations — anything else is corruption, not a fallback arm
    val depthOk = colorType match {
      case 0 => Set(1, 2, 4, 8, 16)(bitDepth)
      case 2 | 4 | 6 => bitDepth == 8 || bitDepth == 16
      case 3 => Set(1, 2, 4, 8)(bitDepth)
      case _ => false
    }
    if (!depthOk) return None
    val channels = colorType match {
      case 0 => 1 // grayscale
      case 2 => 3 // RGB
      case 3 => 1 // palette index
      case 4 => 2 // gray + alpha
      case 6 => 4 // RGBA
    }
    if (colorType == 3) {
      if (plte == null) return None // palette images require PLTE
      if (trnsLen > plte.length / 3) return None // more alphas than entries
      // indices above the palette's top entry are checked per pixel below
    } else if (colorType == 0 || colorType == 2) {
      // tRNS on gray/RGB names a transparent color (2/6 bytes) — alpha is
      // dropped anyway, but a length that can't be that is corruption
      if (trnsLen >= 0 && trnsLen != channels * 2) return None
    } else if (trnsLen >= 0) {
      return None // spec prohibits tRNS on types 4 and 6 (alpha is inline)
    }
    // corrupt headers are routine input at corpus scale: cap pixel count
    // BEFORE any allocation so a 4-byte dim lie (or a zip-bomb IDAT behind
    // it) returns None instead of overflowing the w*h*3 RGB buffer for
    // 1-channel images that pass the raw-size check, or OOMing the task
    if (width.toLong * height.toLong > MaxPixels) return None
    // the image decomposes into filter passes: one full-frame pass when
    // sequential, the seven Adam7 sub-rasters when interlaced — each pass
    // an independently-filtered raster with its own byte stride (empty
    // passes contribute no scanlines at all, per the spec)
    val passes: Array[PassGeom] =
      if (interlace == 0) Array(PassGeom(0, 0, 1, 1, width, height))
      else Adam7.flatMap { case (x0, y0, dx, dy) =>
        val pw = if (width > x0) (width - x0 + dx - 1) / dx else 0
        val ph = if (height > y0) (height - y0 + dy - 1) / dy else 0
        if (pw > 0 && ph > 0) Some(PassGeom(x0, y0, dx, dy, pw, ph)) else None
      }
    val bitsPerPixel = channels * bitDepth
    def strideOf(pw: Int): Long = (pw.toLong * bitsPerPixel + 7) / 8
    val rawLen = passes.map(p => (1L + strideOf(p.pw)) * p.ph).sum
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
    val out = new Array[Byte](width * height * 3)
    val palette = if (colorType == 3) plte else null
    var base = 0
    var pi = 0
    while (pi < passes.length) {
      val p = passes(pi)
      val stride = strideOf(p.pw).toInt
      if (!unfilterPass(raw, base, stride, p.ph, math.max(1, bitsPerPixel / 8)))
        return None
      if (!extractPass(raw, base, stride, p, width, out, channels, bitDepth, palette))
        return None
      base += (1 + stride) * p.ph
      pi += 1
    }
    Some(PpmImage(width, height, out))
  }

  /** One filter pass's geometry: origin + step of its pixel grid in the
    * final image, and its own raster dimensions.
    */
  private final case class PassGeom(x0: Int, y0: Int, dx: Int, dy: Int,
                                    pw: Int, ph: Int)

  /** Adam7 pass origins and steps (x0, y0, dx, dy), spec order. */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Reverse the per-scanline filters in place over one pass's raster
    * (layout: `height` rows of [filterByte, scanline bytes] starting at
    * `base`). Filter math is the spec's: bytes are unsigned, the "left"
    * neighbor is `bpp = ceil(bitsPerPixel/8)` bytes back (1 for all
    * sub-byte depths), out-of-row neighbors are 0 — including across the
    * pass boundary: each pass filters as an independent image. Returns
    * false on an undefined filter type.
    */
  private def unfilterPass(raw: Array[Byte], base: Int, stride: Int,
                           height: Int, bpp: Int): Boolean = {
    var y = 0
    while (y < height) {
      val rowOff = base + y * (stride + 1)
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
        case _ => return false
      }
      y += 1
    }
    true
  }

  /** Project one unfiltered pass into the packed-RGB output at its
    * Adam7 grid positions (identity grid for the sequential pass).
    * Sample normalization per the spec: sub-byte gray bit-replicates to
    * 8 bits (max-index → 255), 16-bit samples keep the high byte, the
    * palette maps indices through PLTE (out-of-range index = corrupt
    * stream → false), and any alpha channel is skipped.
    */
  private def extractPass(raw: Array[Byte], base: Int, stride: Int,
                          p: PassGeom, width: Int, out: Array[Byte],
                          channels: Int, bitDepth: Int,
                          palette: Array[Byte]): Boolean = {
    val nEntries = if (palette == null) 0 else palette.length / 3
    // sub-byte grayscale rescales i → i * 255 / (2^d − 1), an exact
    // integer because 255 is a multiple of every sub-byte max value
    val grayScale = if (bitDepth < 8) 255 / ((1 << bitDepth) - 1) else 1
    val bytesPerSample = if (bitDepth == 16) 2 else 1
    var py = 0
    while (py < p.ph) {
      val cur = base + py * (stride + 1) + 1
      val outY = p.y0 + py * p.dy
      var px = 0
      while (px < p.pw) {
        val d = ((outY * width) + p.x0 + px * p.dx) * 3
        if (palette != null) {
          // big-endian bit packing: pixel px lives at bit px*bitDepth
          val bitPos = px * bitDepth
          val b = raw(cur + (bitPos >> 3)) & 0xFF
          val shift = 8 - bitDepth - (bitPos & 7)
          val idx = (b >> shift) & ((1 << bitDepth) - 1)
          if (idx >= nEntries) return false
          out(d) = palette(idx * 3)
          out(d + 1) = palette(idx * 3 + 1)
          out(d + 2) = palette(idx * 3 + 2)
        } else if (bitDepth < 8) { // sub-byte grayscale (color type 0)
          val bitPos = px * bitDepth
          val b = raw(cur + (bitPos >> 3)) & 0xFF
          val shift = 8 - bitDepth - (bitPos & 7)
          val g = (((b >> shift) & ((1 << bitDepth) - 1)) * grayScale).toByte
          out(d) = g; out(d + 1) = g; out(d + 2) = g
        } else {
          // 8/16-bit samples; 16-bit is big-endian, high byte kept
          val s = cur + px * channels * bytesPerSample
          channels match {
            case 1 | 2 => // gray or gray+alpha (alpha ignored)
              val g = raw(s)
              out(d) = g; out(d + 1) = g; out(d + 2) = g
            case _ => // RGB or RGBA (alpha ignored)
              out(d) = raw(s)
              out(d + 1) = raw(s + bytesPerSample)
              out(d + 2) = raw(s + 2 * bytesPerSample)
          }
        }
        px += 1
      }
      py += 1
    }
    true
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

  /** General spec-side encoder over the full legal IHDR matrix: any
    * supported (colorType, bitDepth), sequential or Adam7-interlaced,
    * with `cycleFilters` optionally rotating every scanline through
    * filter types 0..4 (computed forward, so the decoder's unfilter is
    * exercised against independently-constructed filtered bytes in every
    * pass geometry). `samples` are row-major per-pixel channel values at
    * the stated depth (palette images pass indices). Emits real
    * IHDR/PLTE/IDAT framing with CRCs — the wire shape any standard
    * encoder produces.
    */
  def encodeRaw(width: Int, height: Int, colorType: Int, bitDepth: Int,
                samples: Array[Int], interlaced: Boolean = false,
                cycleFilters: Boolean = false,
                palette: Array[Byte] = null): Array[Byte] = {
    val channels = colorType match {
      case 0 | 3 => 1
      case 4 => 2
      case 2 => 3
      case 6 => 4
    }
    require(samples.length == width * height * channels, "bad sample count")
    val bitsPerPixel = channels * bitDepth
    val bpp = math.max(1, bitsPerPixel / 8)
    val passes: Array[(Int, Int, Int, Int, Int, Int)] =
      if (!interlaced) Array((0, 0, 1, 1, width, height))
      else Adam7.flatMap { case (x0, y0, dx, dy) =>
        val pw = if (width > x0) (width - x0 + dx - 1) / dx else 0
        val ph = if (height > y0) (height - y0 + dy - 1) / dy else 0
        if (pw > 0 && ph > 0) Some((x0, y0, dx, dy, pw, ph)) else None
      }
    val body = new java.io.ByteArrayOutputStream()
    var rowCounter = 0
    for ((x0, y0, dx, dy, pw, ph) <- passes) {
      val stride = ((pw.toLong * bitsPerPixel + 7) / 8).toInt
      var prevRaw: Array[Byte] = null
      var py = 0
      while (py < ph) {
        val row = new Array[Byte](stride)
        var px = 0
        while (px < pw) {
          val sy = y0 + py * dy; val sx = x0 + px * dx
          var c = 0
          while (c < channels) {
            val v = samples((sy * width + sx) * channels + c)
            if (bitDepth == 16) {
              row(px * channels * 2 + c * 2) = (v >>> 8).toByte
              row(px * channels * 2 + c * 2 + 1) = v.toByte
            } else if (bitDepth == 8) {
              row(px * channels + c) = v.toByte
            } else { // sub-byte big-endian packing
              val bitPos = px * bitDepth
              val shift = 8 - bitDepth - (bitPos & 7)
              row(bitPos >> 3) = (row(bitPos >> 3) | (v << shift)).toByte
            }
            c += 1
          }
          px += 1
        }
        val fType = if (cycleFilters) rowCounter % 5 else 0
        val filt = new Array[Byte](stride)
        var x = 0
        while (x < stride) {
          val a = if (x >= bpp) row(x - bpp) & 0xFF else 0
          val b = if (prevRaw != null) prevRaw(x) & 0xFF else 0
          val cc = if (prevRaw != null && x >= bpp) prevRaw(x - bpp) & 0xFF else 0
          val pred = fType match {
            case 0 => 0
            case 1 => a
            case 2 => b
            case 3 => (a + b) >> 1
            case 4 =>
              val p = a + b - cc
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - cc)
              if (pa <= pb && pa <= pc) a else if (pb <= pc) b else cc
          }
          filt(x) = ((row(x) & 0xFF) - pred).toByte
          x += 1
        }
        body.write(fType)
        body.write(filt, 0, stride)
        prevRaw = row
        rowCounter += 1
        py += 1
      }
    }
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
    ihdr(8) = bitDepth.toByte; ihdr(9) = colorType.toByte
    ihdr(12) = if (interlaced) 1 else 0
    writeChunk("IHDR", ihdr)
    if (colorType == 3) writeChunk("PLTE", palette)
    val deflater = new Deflater()
    deflater.setInput(body.toByteArray); deflater.finish()
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
