package graft.operators

/** Dependency-free RIFF/WAVE codec — the audio counterpart of
  * [[PpmCodec]]: this container ships no audio libraries, so a strict
  * little parser for the real-world container is the honest way to run
  * actual samples through the multimodal pipeline.
  *
  * Round 5 widened the format-tag dispatch from PCM-16-only to the full
  * uncompressed + telephony + ADPCM family: PCM at 8/16/24/32 bits
  * (tag 1), IEEE float32 (tag 3), G.711 A-law / μ-law (tags 6/7, the
  * exact integer expansion of the public reference implementation), IMA
  * ADPCM (tag 0x11 — a genuinely COMPRESSED format: 4-bit differential
  * nibbles, per-block predictor/step-index state, the published
  * step/index tables), and WAVE_FORMAT_EXTENSIBLE (0xFFFE) unwrapping to
  * whichever of those its SubFormat names. Everything normalizes to
  * interleaved int16 (wider samples keep their top 16 bits; float clamps
  * then scales), so features run format-agnostic. The remaining fallback
  * arm is perceptual codecs only (MP3/AAC/Vorbis — see [[Mp3Codec]] for
  * the metadata-level MP3 parse).
  *
  * Reference analog: none (the reference is tabular-only); this serves the
  * LLM-pipeline mandate's audio-column plumbing.
  */
object WavCodec {

  /** Interleaved 16-bit samples plus format. */
  final case class WavAudio(sampleRate: Int, channels: Int,
                            samples: Array[Short]) {
    def nFrames: Int = if (channels == 0) 0 else samples.length / channels
    def durationSec: Double =
      if (sampleRate == 0) 0.0 else nFrames.toDouble / sampleRate
  }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (u16(b, o).toLong) | (u16(b, o + 2).toLong << 16)

  /** Strict decode: None on anything outside the supported format set or
    * with a malformed chunk structure.
    */
  def decode(bytes: Array[Byte]): Option[WavAudio] = {
    if (bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
          bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
          bytes(10) == 'V' && bytes(11) == 'E')) return None
    var off = 12
    var tag = -1; var ch = 0; var rate = 0; var bits = 0
    var blockAlign = 0; var samplesPerBlock = 0
    var data: Option[(Int, Int)] = None // (offset, length)
    while (off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val size = u32(bytes, off + 4)
      if (size < 0 || off + 8 + size > bytes.length) return None
      val sz = size.toInt
      id match {
        case "fmt " =>
          if (sz < 16) return None
          tag = u16(bytes, off + 8)
          ch = u16(bytes, off + 10)
          rate = u32(bytes, off + 12).toInt
          blockAlign = u16(bytes, off + 20)
          bits = u16(bytes, off + 22)
          if (tag == 0xFFFE) {
            // WAVE_FORMAT_EXTENSIBLE: the effective format is the first
            // 16 bits of the 16-byte SubFormat GUID (cbSize >= 22)
            if (sz < 40) return None
            tag = u16(bytes, off + 32)
          }
          if (tag == 0x11) {
            // IMA ADPCM carries wSamplesPerBlock in the extra fields
            if (sz < 20) return None
            samplesPerBlock = u16(bytes, off + 26)
          }
        case "data" => data = Some((off + 8, sz))
        case _ => () // skip LIST/INFO/fact/etc.
      }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    if (ch <= 0 || rate <= 0) return None
    data.flatMap { case (dOff, dLen) =>
      tag match {
        case 1 => decodePcm(bytes, dOff, dLen, bits).map(WavAudio(rate, ch, _))
        case 3 if bits == 32 =>
          decodeFloat32(bytes, dOff, dLen).map(WavAudio(rate, ch, _))
        case 6 if bits == 8 =>
          Some(WavAudio(rate, ch, decodeG711(bytes, dOff, dLen, alaw = true)))
        case 7 if bits == 8 =>
          Some(WavAudio(rate, ch, decodeG711(bytes, dOff, dLen, alaw = false)))
        case 0x11 if bits == 4 =>
          decodeImaAdpcm(bytes, dOff, dLen, ch, blockAlign, samplesPerBlock)
            .map(WavAudio(rate, ch, _))
        case _ => None
      }
    }
  }

  /** Linear PCM at 8 (unsigned) / 16 / 24 / 32 bits, little-endian;
    * wider-than-16 samples keep their most significant 16 bits.
    */
  private def decodePcm(b: Array[Byte], dOff: Int, dLen: Int,
                        bits: Int): Option[Array[Short]] = {
    val bytesPer = bits / 8
    if (!Set(8, 16, 24, 32)(bits) || dLen % bytesPer != 0) return None
    val n = dLen / bytesPer
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      val o = dOff + i * bytesPer
      out(i) = bits match {
        case 8 => (((b(o) & 0xFF) - 128) << 8).toShort // unsigned convention
        case 16 => u16(b, o).toShort
        case 24 => u16(b, o + 1).toShort // top 16 of the 24
        case 32 => u16(b, o + 2).toShort // top 16 of the 32
      }
      i += 1
    }
    Some(out)
  }

  /** IEEE float32 little-endian, clamped to [-1, 1] then scaled to int16.
    * The clamp+scale is one IEEE multiply and a round-toward-zero cast —
    * deterministic on any JVM.
    */
  private def decodeFloat32(b: Array[Byte], dOff: Int,
                            dLen: Int): Option[Array[Short]] = {
    if (dLen % 4 != 0) return None
    val n = dLen / 4
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      val o = dOff + i * 4
      val raw = (u16(b, o) | (u16(b, o + 2) << 16))
      val f = java.lang.Float.intBitsToFloat(raw)
      val c = if (f.isNaN) 0f else math.max(-1f, math.min(1f, f))
      out(i) = (c * 32767f).toShort
      i += 1
    }
    Some(out)
  }

  /** G.711 expansion — the exact integer form of the public-domain
    * reference implementation (Sun g711.c, the CCITT sample code):
    * μ-law is the biased-exponent unfold around BIAS=0x84 (max ±32124),
    * A-law the segment table around the 0x55 XOR (max ±32256). One table
    * lookup's worth of arithmetic per byte, bit-exact everywhere.
    */
  private def decodeG711(b: Array[Byte], dOff: Int, dLen: Int,
                         alaw: Boolean): Array[Short] = {
    val out = new Array[Short](dLen)
    var i = 0
    while (i < dLen) {
      val v = b(dOff + i) & 0xFF
      out(i) =
        if (alaw) {
          val a = v ^ 0x55
          val seg = (a & 0x70) >> 4
          var t = (a & 0x0F) << 4
          if (seg == 0) t += 8
          else { t += 0x108; if (seg > 1) t <<= seg - 1 }
          if ((a & 0x80) != 0) t.toShort else (-t).toShort
        } else {
          val u = ~v & 0xFF
          val t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
          if ((u & 0x80) != 0) (0x84 - t).toShort else (t - 0x84).toShort
        }
      i += 1
    }
    out
  }

  /** IMA/DVI ADPCM step-size table (89 entries) and index adjustments —
    * the published tables from the IMA Digital Audio Focus/Technical
    * Working Groups' recommendation; every implementation shares them
    * verbatim, so decode is bit-exact across codecs.
    */
  private val ImaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val ImaIndexAdj: Array[Int] = Array(
    -1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** IMA ADPCM block decode: each `blockAlign`-byte block opens with a
    * 4-byte header per channel (int16 predictor — emitted as the block's
    * first sample — plus step index), then 4-byte words of eight 4-bit
    * nibbles per channel, channels interleaved word-wise, low nibble
    * first. The differential step is the standard (step>>3 + bit terms)
    * expansion with predictor clamped to int16 and index to [0, 88].
    * Strict: data must be whole blocks and the fmt's wSamplesPerBlock
    * must match the block geometry.
    */
  private def decodeImaAdpcm(b: Array[Byte], dOff: Int, dLen: Int, ch: Int,
                             blockAlign: Int,
                             samplesPerBlock: Int): Option[Array[Short]] = {
    if (blockAlign < 4 * ch + 4 * ch || blockAlign % (4 * ch) != 0) return None
    if (dLen % blockAlign != 0) return None
    val perBlock = (blockAlign - 4 * ch) * 2 / ch + 1
    if (samplesPerBlock != 0 && samplesPerBlock != perBlock) return None
    val nBlocks = dLen / blockAlign
    val out = new Array[Short](nBlocks * perBlock * ch)
    val pred = new Array[Int](ch)
    val index = new Array[Int](ch)
    var blk = 0
    while (blk < nBlocks) {
      val base = dOff + blk * blockAlign
      val outBase = blk * perBlock * ch
      var c = 0
      while (c < ch) {
        pred(c) = u16(b, base + 4 * c).toShort.toInt
        index(c) = b(base + 4 * c + 2) & 0xFF
        if (index(c) > 88) return None
        out(outBase + c) = pred(c).toShort // header sample opens the block
        c += 1
      }
      // nibble payload: one 4-byte word per channel, repeating
      val words = (blockAlign - 4 * ch) / (4 * ch)
      var w = 0
      while (w < words) {
        var cw = 0
        while (cw < ch) {
          val wOff = base + 4 * ch + (w * ch + cw) * 4
          var byteI = 0
          while (byteI < 4) {
            val byte = b(wOff + byteI) & 0xFF
            var half = 0
            while (half < 2) {
              val n = if (half == 0) byte & 0x0F else byte >> 4
              val step = ImaStep(index(cw))
              var diff = step >> 3
              if ((n & 1) != 0) diff += step >> 2
              if ((n & 2) != 0) diff += step >> 1
              if ((n & 4) != 0) diff += step
              if ((n & 8) != 0) diff = -diff
              pred(cw) = math.max(-32768, math.min(32767, pred(cw) + diff))
              index(cw) = math.max(0, math.min(88, index(cw) + ImaIndexAdj(n)))
              val sampleIdx = 1 + w * 8 + byteI * 2 + half
              out(outBase + sampleIdx * ch + cw) = pred(cw).toShort
              half += 1
            }
            byteI += 1
          }
          cw += 1
        }
        w += 1
      }
      blk += 1
    }
    Some(out)
  }

  /** Minimal writer (tests + synthetic payload generation). */
  def encode(audio: WavAudio): Array[Byte] = {
    val dataLen = audio.samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
    }
    def put32(o: Int, v: Long): Unit = {
      put16(o, (v & 0xFFFF).toInt); put16(o + 2, ((v >> 16) & 0xFFFF).toInt)
    }
    def putAscii(o: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) => out(o + i) = b }
    putAscii(0, "RIFF"); put32(4, 36L + dataLen); putAscii(8, "WAVE")
    putAscii(12, "fmt "); put32(16, 16L); put16(20, 1)
    put16(22, audio.channels); put32(24, audio.sampleRate.toLong)
    put32(28, audio.sampleRate.toLong * audio.channels * 2)
    put16(32, audio.channels * 2); put16(34, 16)
    putAscii(36, "data"); put32(40, dataLen.toLong)
    var i = 0
    while (i < audio.samples.length) {
      put16(44 + 2 * i, audio.samples(i) & 0xFFFF)
      i += 1
    }
    out
  }

  /** Scale-free signal features over the decoded samples (all channels
    * mixed): RMS amplitude (normalized to [0,1]), zero-crossing rate per
    * frame, and peak amplitude. One sequential pass, deterministic.
    */
  def features(audio: WavAudio): (Double, Double, Double) = {
    val s = audio.samples
    if (s.isEmpty) return (0.0, 0.0, 0.0)
    var sumSq = 0.0
    var crossings = 0L
    var peak = 0.0
    var i = 0
    while (i < s.length) {
      val v = s(i) / 32768.0
      sumSq += v * v
      if (v.abs > peak) peak = v.abs
      if (i > 0 && ((s(i - 1) < 0) != (s(i) < 0))) crossings += 1
      i += 1
    }
    (math.sqrt(sumSq / s.length), crossings.toDouble / s.length, peak)
  }
}
