package graft.operators

/** Dependency-free RIFF/WAVE PCM-16 codec — the audio counterpart of
  * [[PpmCodec]]: this container ships no audio libraries, so a strict
  * little parser for the simplest real-world container is the honest way
  * to run actual samples through the multimodal pipeline. Supports
  * PCM (format tag 1), 16-bit, any channel count / sample rate; anything
  * else returns None and the caller's marked fallback arm takes over.
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

  /** Strict decode: None on anything that is not a complete PCM-16 WAV. */
  def decode(bytes: Array[Byte]): Option[WavAudio] = {
    if (bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
          bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
          bytes(10) == 'V' && bytes(11) == 'E')) return None
    var off = 12
    var fmt: Option[(Int, Int)] = None // (channels, sampleRate)
    var bits = 0
    var data: Option[(Int, Int)] = None // (offset, length)
    while (off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val size = u32(bytes, off + 4)
      if (size < 0 || off + 8 + size > bytes.length) return None
      val sz = size.toInt
      id match {
        case "fmt " =>
          if (sz < 16) return None
          val tag = u16(bytes, off + 8)
          if (tag != 1) return None // PCM only
          fmt = Some((u16(bytes, off + 10), u32(bytes, off + 12).toInt))
          bits = u16(bytes, off + 22)
        case "data" => data = Some((off + 8, sz))
        case _ => () // skip LIST/INFO/etc.
      }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((ch, rate)), Some((dOff, dLen)))
        if bits == 16 && ch > 0 && rate > 0 =>
        val n = dLen / 2
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          samples(i) = u16(bytes, dOff + 2 * i).toShort
          i += 1
        }
        Some(WavAudio(rate, ch, samples))
      case _ => None
    }
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
