package graft.operators

import graft.operators.PpmCodec.PpmImage

/** Dependency-free GIF decoder (87a/89a) — the last of the classic
  * scraped-web raster formats missing from the codec matrix (PPM, PNG,
  * JPEG, BMP are the others). LZW is decoded per the public GIF89a
  * specification: variable-width codes starting at minCodeSize+1, clear
  * and end-of-information codes, dictionary growth to the 4096-entry
  * ceiling, the "deferred clear" behavior (width stays at 12 until the
  * encoder sends a clear), and the KwKwK first-entry edge case.
  *
  * Scope:
  *  - global and local color tables (local overrides global per image)
  *  - interlaced images (the 4-pass 8/8-8/4-4/2-1 row schedule)
  *  - extension blocks walked and skipped by sub-block structure
  *    (graphic control / comment / application — transparency is noted
  *    but the transparent index renders as its palette color: feature
  *    extraction, not compositing, same alpha policy as PngCodec)
  *  - multi-frame streams: [[decode]] returns the FIRST image
  *    descriptor's raster (the standard thumbnail/feature convention);
  *    [[frames]] returns every frame decoded independently against the
  *    logical screen (no disposal compositing)
  *
  * Returns None on structural corruption: bad signature, missing color
  * table, truncated sub-blocks, LZW codes beyond the current dictionary,
  * out-of-range palette indices, or pixel counts that disagree with the
  * image descriptor. The shared [[PngCodec.MaxPixels]] ceiling guards
  * absurd dimension fields.
  */
object GifCodec {

  def decode(bytes: Array[Byte]): Option[PpmImage] =
    frames(bytes, maxFrames = 1).flatMap(_.headOption)

  /** Decode up to `maxFrames` image descriptors. None on structural
    * corruption anywhere up to and including the last requested frame;
    * Some(seq) — possibly shorter than maxFrames — when the stream
    * terminates cleanly first.
    */
  def frames(bytes: Array[Byte], maxFrames: Int = 64): Option[Seq[PpmImage]] = {
    if (bytes == null || bytes.length < 13) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val sw = u16(bytes, 6)
    val sh = u16(bytes, 8)
    val packed = bytes(10) & 0xff
    var p = 13
    val gct: Array[Int] =
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        if (p + 3 * n > bytes.length) return None
        val t = readColorTable(bytes, p, n)
        p += 3 * n
        t
      } else null
    if (sw <= 0 || sh <= 0 || sw.toLong * sh > PngCodec.MaxPixels) return None

    val out = Seq.newBuilder[PpmImage]
    var count = 0
    while (p < bytes.length && count < maxFrames) {
      (bytes(p) & 0xff) match {
        case 0x3b => // trailer
          return Some(out.result())
        case 0x21 => // extension: label + sub-blocks
          p += 2
          if (p > bytes.length) return None
          p = skipSubBlocks(bytes, p)
          if (p < 0) return None
        case 0x2c => // image descriptor
          if (p + 10 > bytes.length) return None
          val ix = u16(bytes, p + 1); val iy = u16(bytes, p + 3)
          val iw = u16(bytes, p + 5); val ih = u16(bytes, p + 7)
          val ip = bytes(p + 9) & 0xff
          p += 10
          val interlaced = (ip & 0x40) != 0
          val lct: Array[Int] =
            if ((ip & 0x80) != 0) {
              val n = 2 << (ip & 7)
              if (p + 3 * n > bytes.length) return None
              val t = readColorTable(bytes, p, n)
              p += 3 * n
              t
            } else gct
          if (lct == null) return None
          if (iw <= 0 || ih <= 0 || iw.toLong * ih > PngCodec.MaxPixels) return None
          if (ix + iw > sw || iy + ih > sh) return None
          if (p >= bytes.length) return None
          val minCode = bytes(p) & 0xff
          p += 1
          if (minCode < 2 || minCode > 11) return None
          // concatenate LZW sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var q = p
          var done = false
          while (!done) {
            if (q >= bytes.length) return None
            val len = bytes(q) & 0xff
            q += 1
            if (len == 0) done = true
            else {
              if (q + len > bytes.length) return None
              data.write(bytes, q, len)
              q += len
            }
          }
          p = q
          val indices = lzwDecode(data.toByteArray, minCode, iw * ih)
            .getOrElse(return None)
          // rasterize (interlace-aware) into a full-screen canvas region
          val img = new Array[Byte](iw * ih * 3)
          val rowOrder: Array[Int] =
            if (!interlaced) Array.range(0, ih)
            else {
              val order = new Array[Int](ih)
              var k = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
                var r = start
                while (r < ih) { order(k) = r; k += 1; r += step }
              }
              order
            }
          var k = 0
          var rr = 0
          while (rr < ih) {
            val destRow = rowOrder(rr)
            var x = 0
            while (x < iw) {
              val idx = indices(k) & 0xff
              if (idx >= lct.length) return None
              val rgb = lct(idx)
              val o = (destRow * iw + x) * 3
              img(o) = ((rgb >>> 16) & 0xff).toByte
              img(o + 1) = ((rgb >>> 8) & 0xff).toByte
              img(o + 2) = (rgb & 0xff).toByte
              x += 1; k += 1
            }
            rr += 1
          }
          out += PpmImage(iw, ih, img)
          count += 1
        case _ => return None
      }
    }
    // loop left normally only when maxFrames was reached; running out of
    // bytes WITHOUT the 0x3B trailer is a truncated stream (contract:
    // Some only on clean termination — review finding)
    if (count >= maxFrames) Some(out.result()) else None
  }

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def readColorTable(b: Array[Byte], off: Int, n: Int): Array[Int] =
    Array.tabulate(n) { i =>
      val o = off + 3 * i
      ((b(o) & 0xff) << 16) | ((b(o + 1) & 0xff) << 8) | (b(o + 2) & 0xff)
    }

  /** Skip a chain of (len, bytes) sub-blocks; returns the offset past the
    * 0 terminator, or -1 on truncation.
    */
  private def skipSubBlocks(b: Array[Byte], start: Int): Int = {
    var p = start
    while (true) {
      if (p >= b.length) return -1
      val len = b(p) & 0xff
      p += 1
      if (len == 0) return p
      if (p + len > b.length) return -1
      p += len
    }
    -1 // unreachable
  }

  /** GIF-flavor LZW: codes grow from minCode+1 up to 12 bits, dictionary
    * resets on clear, decode stops after `expected` pixels (trailing
    * codes before EOI are tolerated, per common encoder behavior).
    */
  private[operators] def lzwDecode(data: Array[Byte], minCode: Int,
                                   expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new Array[Byte](expected)
    var outLen = 0

    // dictionary as (prefix code, appended byte); roots are implicit
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var dictSize = eoi + 1
    var codeWidth = minCode + 1

    var bitPos = 0
    val totalBits = data.length * 8
    @inline def nextCode(): Int = {
      if (bitPos + codeWidth > totalBits) return -1
      var v = 0
      var i = 0
      while (i < codeWidth) {
        val bit = (data((bitPos + i) >> 3) >>> ((bitPos + i) & 7)) & 1
        v |= bit << i
        i += 1
      }
      bitPos += codeWidth
      v
    }

    // expand a code into out (reversed walk up the prefix chain)
    val stack = new Array[Byte](4096)
    @inline def emit(code: Int): Int = { // returns first byte, or -1
      var c = code
      var sp = 0
      while (c >= clear) { // composite entry
        if (sp >= 4096 || c >= dictSize) return -1
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
      }
      val first = c
      if (outLen + sp + 1 > expected) return -1
      out(outLen) = c.toByte; outLen += 1
      while (sp > 0) { sp -= 1; out(outLen) = stack(sp); outLen += 1 }
      first
    }

    var prev = -1
    while (outLen < expected) {
      val code = nextCode()
      if (code < 0) return None
      if (code == clear) {
        dictSize = eoi + 1
        codeWidth = minCode + 1
        prev = -1
      } else if (code == eoi) {
        return if (outLen == expected) Some(out) else None
      } else if (prev < 0) {
        if (code >= clear) return None // first code must be a root
        val f = emit(code)
        if (f < 0) return None
        prev = code
      } else {
        if (code > dictSize) return None // beyond the next free entry
        val first =
          if (code == dictSize) {
            // KwKwK: expansion = expansion(prev) + firstByte(prev)
            val f = emit(prev)
            if (f < 0) return None
            if (outLen + 1 > expected) return None
            out(outLen) = f.toByte; outLen += 1
            f
          } else {
            val f = emit(code)
            if (f < 0) return None
            f
          }
        // new dictionary entry: prev + first byte of code's expansion
        if (dictSize < 4096) {
          prefix(dictSize) = prev
          suffix(dictSize) = first.toByte
          dictSize += 1
          if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        }
        prev = code
      }
    }
    // exactly `expected` pixels decoded; the EOI (if present) is allowed
    // to follow — no need to consume it
    Some(out)
  }
}
