package graft.operators

import graft.operators.WavCodec.WavAudio

/** Dependency-free FLAC decoder (the xiph.org specification, RFC 9639) —
  * the LOSSLESS compressed-audio format behind music-archive and
  * speech-dataset distribution, and the second genuinely compressed
  * audio arm beside IMA ADPCM. Normalizes to the shared interleaved
  * 16-bit [[WavAudio]] frame, so features and triage are
  * container-agnostic.
  *
  * Scope:
  *  - STREAMINFO parse (sample rate, channels, bits per sample, total
  *    samples) + metadata-block walk (all other block types skipped)
  *  - frame headers: both blocking strategies, all block-size /
  *    sample-rate codes (inline, end-of-header 8/16-bit, STREAMINFO
  *    reference), UTF-8-coded frame/sample numbers, CRC-8 VALIDATED
  *  - subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  *    (quantized coefficients, signed shift), wasted-bits unary prefix
  *  - residuals: 4-bit Rice and 5-bit Rice2 partition methods, escape
  *    partitions (raw n-bit residuals), zigzag de-interleave
  *  - stereo decorrelation: independent, left/side, right/side,
  *    mid/side; the side channel's +1 bit depth
  *  - bits per sample 8/16/24 (24-bit keeps the high 16, the PngCodec
  *    depth convention), 1-8 independent channels
  *  - frame CRC-16 VALIDATED — corrupt payloads return None, never a
  *    garbage waveform (rice coding would otherwise happily desync)
  *
  * Out of scope: the rare fixed-blocking subset variations beyond the
  * above (none exist in conforming streams) — FLAC needs no fallback
  * arm; anything malformed rejects.
  */
object FlacCodec {

  private val MaxSamples = 1 << 26 // ~67M samples, matches codec ceilings

  private final class BitReader(b: Array[Byte], var pos: Int) {
    var bit = 0 // 0..7, MSB-first within the current byte
    def ok: Boolean = pos < b.length
    def read(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        if (pos >= b.length) return -1L // caller checks `failed`
        v = (v << 1) | ((b(pos) >>> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def readSigned(n: Int): Long = {
      val v = read(n)
      if (v < 0) return Long.MinValue
      if (n == 0) 0L
      else if ((v & (1L << (n - 1))) != 0) v - (1L << n)
      else v
    }
    /** Unary: count 0 bits until the terminating 1. -1 on exhaustion. */
    def unary(): Int = {
      var q = 0
      while (true) {
        if (pos >= b.length) return -1
        if (((b(pos) >>> (7 - bit)) & 1) == 1) {
          bit += 1; if (bit == 8) { bit = 0; pos += 1 }
          return q
        }
        q += 1
        if (q > (1 << 24)) return -1 // runaway quotient: corrupt
        bit += 1; if (bit == 8) { bit = 0; pos += 1 }
      }
      -1
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  // CRC-8 (poly 0x07) over frame header bytes; CRC-16 (poly 0x8005) over
  // the whole frame — both per the FLAC spec
  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c ^= b(i) & 0xFF
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF
        k += 1
      }
      i += 1
    }
    c
  }
  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c ^= (b(i) & 0xFF) << 8
      var k = 0
      while (k < 8) {
        c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF
            else (c << 1) & 0xFFFF
        k += 1
      }
      i += 1
    }
    c
  }

  def decode(bytes: Array[Byte]): Option[WavAudio] = {
    if (bytes == null || bytes.length < 42) return None
    if (!(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' &&
      bytes(3) == 'C')) return None

    // ---- metadata blocks ----
    var p = 4
    var sampleRate = -1
    var channels = -1
    var bps = -1
    var totalSamples = -1L
    var sawStreamInfo = false
    var last = false
    while (!last) {
      if (p + 4 > bytes.length) return None
      val hdr = bytes(p) & 0xFF
      last = (hdr & 0x80) != 0
      val typ = hdr & 0x7F
      val len = ((bytes(p + 1) & 0xFF) << 16) | ((bytes(p + 2) & 0xFF) << 8) |
        (bytes(p + 3) & 0xFF)
      p += 4
      if (p + len > bytes.length) return None
      if (typ == 0) { // STREAMINFO
        if (len != 34 || sawStreamInfo) return None
        sawStreamInfo = true
        val br = new BitReader(bytes, p)
        br.read(16); br.read(16) // min/max block size
        br.read(24); br.read(24) // min/max frame size
        sampleRate = br.read(20).toInt
        channels = br.read(3).toInt + 1
        bps = br.read(5).toInt + 1
        totalSamples = br.read(36)
      } else if (typ == 127) return None // invalid
      p += len
    }
    // totalSamples = 0 means "unknown length" — a streaming-only shape;
    // this decoder handles materialized payloads, which always carry it
    if (!sawStreamInfo || sampleRate <= 0 || totalSamples <= 0) return None
    if (bps != 8 && bps != 16 && bps != 24) return None
    if (totalSamples > MaxSamples / channels) return None

    val out = new Array[Short](totalSamples.toInt * channels)
    var written = 0L

    // ---- frames ----
    while (written < totalSamples) {
      if (p + 5 > bytes.length) return None
      val frameStart = p
      val br = new BitReader(bytes, p)
      if (br.read(14) != 0x3FFE) return None // sync
      if (br.read(1) != 0) return None // reserved
      br.read(1) // blocking strategy (both legal; sample number is UTF-8)
      val bsCode = br.read(4).toInt
      val srCode = br.read(4).toInt
      val chanAsg = br.read(4).toInt
      val ssCode = br.read(3).toInt
      if (br.read(1) != 0) return None // reserved
      // UTF-8-coded frame/sample number (up to 7 bytes) — value unused,
      // structure validated
      val first = br.read(8).toInt
      if (first < 0) return None
      var follow =
        if ((first & 0x80) == 0) 0
        else if ((first & 0xE0) == 0xC0) 1
        else if ((first & 0xF0) == 0xE0) 2
        else if ((first & 0xF8) == 0xF0) 3
        else if ((first & 0xFC) == 0xF8) 4
        else if ((first & 0xFE) == 0xFC) 5
        else if (first == 0xFE) 6
        else return None
      while (follow > 0) {
        val c = br.read(8).toInt
        if (c < 0 || (c & 0xC0) != 0x80) return None
        follow -= 1
      }
      val blockSize = bsCode match {
        case 0 => return None // reserved
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => br.read(8).toInt + 1
        case 7 => br.read(16).toInt + 1
        case c => 256 << (c - 8)
      }
      srCode match { // value itself comes from STREAMINFO unless inline
        case 12 => br.read(8)
        case 13 | 14 => br.read(16)
        case 15 => return None // invalid
        case _ =>
      }
      val frameBps = ssCode match {
        case 0 => bps
        case 1 => 8
        case 4 => 16
        case 6 => 24
        case 3 | 7 => return None // reserved
        case _ => return None // 12/20-bit: not in scope
      }
      if (frameBps != bps) return None
      val nCh = chanAsg match {
        case c if c <= 7 => c + 1
        case 8 | 9 | 10 => 2
        case _ => return None
      }
      if (nCh != channels) return None
      if (blockSize <= 0 || written + blockSize > totalSamples) return None
      br.align()
      if (br.pos >= bytes.length) return None
      val hdrCrc = bytes(br.pos) & 0xFF
      if (crc8(bytes, frameStart, br.pos) != hdrCrc) return None
      br.pos += 1

      // ---- subframes ----
      val chans = Array.ofDim[Long](nCh, blockSize)
      var ch = 0
      var failed = false
      while (ch < nCh && !failed) {
        // side channels carry one extra bit
        val extra = chanAsg match {
          case 8 => if (ch == 1) 1 else 0 // left/side
          case 9 => if (ch == 0) 1 else 0 // side/right
          case 10 => if (ch == 1) 1 else 0 // mid/side
          case _ => 0
        }
        if (!decodeSubframe(br, chans(ch), bps + extra)) failed = true
        ch += 1
      }
      if (failed) return None
      br.align()
      if (br.pos + 2 > bytes.length) return None
      val fCrc = ((bytes(br.pos) & 0xFF) << 8) | (bytes(br.pos + 1) & 0xFF)
      if (crc16(bytes, frameStart, br.pos) != fCrc) return None
      br.pos += 2
      p = br.pos

      // ---- stereo decorrelation + emit ----
      var i = 0
      while (i < blockSize) {
        chanAsg match {
          case 8 => // left/side: right = left - side
            val l = chans(0)(i); val s = chans(1)(i)
            chans(1)(i) = l - s
          case 9 => // side/right: left = right + side
            val s = chans(0)(i); val r = chans(1)(i)
            chans(0)(i) = r + s
          case 10 => // mid/side
            val m = chans(0)(i); val s = chans(1)(i)
            val m2 = (m << 1) | (s & 1L)
            chans(0)(i) = (m2 + s) >> 1
            chans(1)(i) = (m2 - s) >> 1
          case _ =>
        }
        var c = 0
        while (c < nCh) {
          val v = chans(c)(i)
          val s16 = bps match {
            case 8 => (v << 8).toInt
            case 16 => v.toInt
            case 24 => (v >> 8).toInt
          }
          if (s16 < Short.MinValue || s16 > Short.MaxValue) return None
          out((written.toInt + i) * nCh + c) = s16.toShort
          c += 1
        }
        i += 1
      }
      written += blockSize
    }
    Some(WavAudio(sampleRate, channels, out))
  }

  private def decodeSubframe(br: BitReader, dst: Array[Long],
                             bps: Int): Boolean = {
    if (br.read(1) != 0) return false // reserved padding bit
    val typ = br.read(6).toInt
    if (typ < 0) return false
    val wastedFlag = br.read(1)
    if (wastedFlag < 0) return false
    val wasted =
      if (wastedFlag == 1) { val u = br.unary(); if (u < 0) return false; u + 1 }
      else 0
    val eff = bps - wasted
    if (eff <= 0) return false
    val n = dst.length

    val ok: Boolean =
      if (typ == 0) { // CONSTANT
        val v = br.readSigned(eff)
        if (v == Long.MinValue) false
        else { java.util.Arrays.fill(dst, v); true }
      } else if (typ == 1) { // VERBATIM
        var i = 0
        var good = true
        while (i < n && good) {
          val v = br.readSigned(eff)
          if (v == Long.MinValue) good = false else { dst(i) = v; i += 1 }
        }
        good
      } else if (typ >= 8 && typ <= 12) { // FIXED order 0-4
        val order = typ - 8
        if (order > n) return false
        var i = 0
        while (i < order) {
          val v = br.readSigned(eff)
          if (v == Long.MinValue) return false
          dst(i) = v; i += 1
        }
        if (!readResiduals(br, dst, order)) return false
        i = order
        while (i < n) {
          dst(i) += (order match {
            case 0 => 0L
            case 1 => dst(i - 1)
            case 2 => 2 * dst(i - 1) - dst(i - 2)
            case 3 => 3 * dst(i - 1) - 3 * dst(i - 2) + dst(i - 3)
            case 4 => 4 * dst(i - 1) - 6 * dst(i - 2) + 4 * dst(i - 3) -
              dst(i - 4)
          })
          i += 1
        }
        true
      } else if (typ >= 32) { // LPC, order = (typ & 31) + 1
        val order = (typ & 31) + 1
        if (order > n) return false
        var i = 0
        while (i < order) {
          val v = br.readSigned(eff)
          if (v == Long.MinValue) return false
          dst(i) = v; i += 1
        }
        val precM1 = br.read(4)
        if (precM1 < 0 || precM1 == 15) return false
        val prec = precM1.toInt + 1
        val shift = br.readSigned(5)
        if (shift == Long.MinValue || shift < 0) return false // spec: >= 0
        val coefs = new Array[Long](order)
        i = 0
        while (i < order) {
          val c = br.readSigned(prec)
          if (c == Long.MinValue) return false
          coefs(i) = c; i += 1
        }
        if (!readResiduals(br, dst, order)) return false
        i = order
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j) * dst(i - 1 - j); j += 1 }
          dst(i) += (acc >> shift.toInt)
          i += 1
        }
        true
      } else false // reserved types 2-7, 13-31

    if (!ok) return false
    if (wasted > 0) {
      var i = 0
      while (i < n) { dst(i) <<= wasted; i += 1 }
    }
    true
  }

  /** Rice/Rice2 partitioned residuals into dst(order until n). */
  private def readResiduals(br: BitReader, dst: Array[Long],
                            order: Int): Boolean = {
    val method = br.read(2)
    if (method != 0 && method != 1) return false
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xF else 0x1F
    val pOrder = br.read(4).toInt
    if (pOrder < 0) return false
    val nParts = 1 << pOrder
    val n = dst.length
    if (n % nParts != 0) return false
    val perPart = n / nParts
    var idx = order
    var part = 0
    while (part < nParts) {
      val cnt = if (part == 0) perPart - order else perPart
      if (cnt < 0) return false
      val param = br.read(pBits).toInt
      if (param < 0) return false
      var i = 0
      if (param == escape) {
        val raw = br.read(5).toInt
        if (raw < 0) return false
        while (i < cnt) {
          val v = if (raw == 0) 0L else br.readSigned(raw)
          if (v == Long.MinValue) return false
          dst(idx) = v; idx += 1; i += 1
        }
      } else {
        while (i < cnt) {
          val q = br.unary()
          if (q < 0) return false
          val r = if (param == 0) 0L else br.read(param)
          if (r < 0) return false
          val u = (q.toLong << param) | r
          dst(idx) = (u >>> 1) ^ -(u & 1L) // zigzag
          idx += 1; i += 1
        }
      }
      part += 1
    }
    true
  }
}
