package graft.operators

import graft.operators.WavCodec.WavAudio

/** Dependency-free AIFF / AIFF-C decoder — the big-endian sibling of
  * RIFF/WAVE (Apple's interchange format, still common in music-archive
  * scrapes). Normalizes to the same interleaved-16-bit [[WavAudio]] the
  * WAV path produces, so the feature stage is container-agnostic.
  *
  * Scope (per the public AIFF-1.3 / AIFF-C specification):
  *  - FORM container with form types `AIFF` (plain) and `AIFC`
  *    (compressed; compression types `NONE` — big-endian PCM — and
  *    `sowt` — little-endian PCM16, the ubiquitous QuickTime variant)
  *  - COMM chunk: channels, frame count, sample size, and the 80-bit
  *    IEEE 754 EXTENDED sample rate (sign / 15-bit exponent / explicit-
  *    integer-bit 64-bit mantissa) parsed with integer arithmetic
  *  - SSND chunk with offset/blockSize skip
  *  - PCM at 8 (SIGNED, unlike WAV's unsigned-8), 16, 24, 32 bits,
  *    big-endian, any interleaved channel count — high bytes kept on
  *    the way down to 16 (same depth-rescale convention as WavCodec)
  *  - chunk walk is strict and word-aligned (odd-length chunks carry a
  *    pad byte, as the IFF rules require)
  *
  * None (never a garbage buffer) on: bad magic, truncated chunks,
  * missing COMM/SSND, frame-count/byte-length disagreement, absurd
  * rates/channels, or unsupported compression types (AAC-in-AIFC etc.).
  */
object AiffCodec {

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u32(b: Array[Byte], o: Int): Long =
    (u16(b, o).toLong << 16) | u16(b, o + 2).toLong
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** 80-bit extended float at `o`: returns the rate as an Int (sample
    * rates are integral in practice; non-integral rates round to nearest).
    * -1 on NaN/Inf/absurd values.
    */
  private def extended80(b: Array[Byte], o: Int): Int = {
    val se = u16(b, o)
    val exp = se & 0x7fff
    val mantHi = u32(b, o + 2)
    val mantLo = u32(b, o + 6)
    if ((se & 0x8000) != 0) return -1 // negative rate
    if (exp == 0 && mantHi == 0 && mantLo == 0) return 0
    if (exp == 0x7fff) return -1 // Inf/NaN
    // value = mant * 2^(exp - 16383 - 63), mant has the explicit integer bit
    val mant = (mantHi << 32) | mantLo
    val shift = exp - 16383 - 63
    // sane audio rates are 1 Hz .. 1 MHz → shift in a narrow band
    if (shift > -63 && shift <= 0) {
      val shifted = mant >>> (-shift)
      val rem = if (shift == 0) 0L else mant & ((1L << (-shift)) - 1)
      val half = if (shift == 0) 0L else 1L << (-shift - 1)
      val r = shifted + (if (shift != 0 && rem >= half) 1L else 0L)
      if (r > 0 && r <= 1000000L) r.toInt else -1
    } else -1
  }

  def decode(bytes: Array[Byte]): Option[WavAudio] = {
    if (bytes == null || bytes.length < 12) return None
    if (tag(bytes, 0) != "FORM") return None
    val formType = tag(bytes, 8)
    val aifc = formType == "AIFC"
    if (formType != "AIFF" && !aifc) return None

    var channels = -1
    var nFrames = -1L
    var sampleSize = -1
    var rate = -1
    var compression = "NONE"
    var dataOff = -1
    var dataLen = 0L

    var p = 12
    while (p + 8 <= bytes.length) {
      val id = tag(bytes, p)
      val len = u32(bytes, p + 4)
      val body = p + 8
      if (body + len > bytes.length) return None
      id match {
        case "COMM" =>
          if (len < 18) return None
          channels = u16(bytes, body)
          nFrames = u32(bytes, body + 2)
          sampleSize = u16(bytes, body + 6)
          rate = extended80(bytes, body + 8)
          if (aifc) {
            if (len < 22) return None
            compression = tag(bytes, body + 18)
          }
        case "SSND" =>
          if (len < 8) return None
          val offset = u32(bytes, body)
          if (offset + 8 > len) return None
          dataOff = (body + 8 + offset).toInt
          dataLen = len - 8 - offset
        case _ => // FVER, MARK, INST, annotations … skipped
      }
      p = body + len.toInt + (len.toInt & 1) // IFF pad byte
    }

    if (channels <= 0 || channels > 64 || rate <= 0 || dataOff < 0) return None
    if (nFrames < 0) return None
    val littleEndian = compression == "sowt"
    if (compression != "NONE" && !littleEndian) return None
    if (littleEndian && sampleSize != 16) return None
    val bytesPer = sampleSize match {
      case 8 => 1
      case 16 => 2
      case 24 => 3
      case 32 => 4
      case _ => return None
    }
    val total = nFrames * channels
    if (total > Int.MaxValue / 4) return None
    if (dataLen < total * bytesPer) return None

    val out = new Array[Short](total.toInt)
    var i = 0
    while (i < total) {
      val o = dataOff + i * bytesPer
      val s: Int = sampleSize match {
        case 8 => (bytes(o).toInt) << 8 // signed 8 → high byte
        case 16 =>
          if (littleEndian) ((bytes(o) & 0xff) | (bytes(o + 1) << 8))
          else ((bytes(o) << 8) | (bytes(o + 1) & 0xff))
        case 24 => (bytes(o) << 8) | (bytes(o + 1) & 0xff) // keep top 16
        case 32 => (bytes(o) << 8) | (bytes(o + 1) & 0xff)
      }
      out(i) = s.toShort
      i += 1
    }
    Some(WavAudio(rate, channels, out))
  }
}
