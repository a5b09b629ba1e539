package graft.operators

/** Metadata-level MP3 (MPEG audio Layer III) parser: a strict frame-header
  * walk over the elementary stream — sync validation, version/layer/
  * bitrate/sample-rate header fields per the public ISO 11172-3 /
  * 13818-3 tables, per-frame byte lengths, ID3v2 prefix and ID3v1 tail
  * skipping — yielding the triage metadata a corpus pipeline needs
  * (duration, rate, channel mode, average bitrate) WITHOUT synthesizing
  * PCM. Full Layer III decode (Huffman spectral data, IMDCT, polyphase
  * synthesis) stays a declared fallback arm: these payloads report
  * `decoded = false` for sample-level features but no longer parse as
  * opaque bytes. This is the honest middle rung between "unsupported"
  * and a perceptual decoder this container cannot verify against
  * reference vectors.
  *
  * Reference analog: none (the reference is tabular-only); serves the
  * LLM-pipeline mandate's audio-column plumbing.
  */
object Mp3Codec {

  /** Stream-level metadata from the frame walk. `avgBitrateKbps` is the
    * exact integer mean of the per-frame nominal bitrates (so VBR streams
    * report their true average), `durationMs` is total samples scaled by
    * the sample rate in exact integer arithmetic.
    */
  final case class Mp3Meta(mpegVersion: String, layer: Int, sampleRate: Int,
                           channels: Int, frames: Int, avgBitrateKbps: Int,
                           durationMs: Long)

  // ISO tables, Layer III columns: index 1..14 valid, 0 = "free" (not
  // supported — free-format needs sync scanning), 15 = invalid
  private val BitrateV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
    160, 192, 224, 256, 320)
  private val BitrateV2L3 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96,
    112, 128, 144, 160)
  private val RatesV1 = Array(44100, 48000, 32000)
  private val RatesV2 = Array(22050, 24000, 16000)
  private val RatesV25 = Array(11025, 12000, 8000)

  def looksLikeMp3(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 &&
      ((bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') ||
        ((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xE0) == 0xE0))

  /** Parse the whole stream's frame sequence; None unless every byte is
    * accounted for by an optional ID3v2 prefix, >= 2 valid Layer III
    * frames (one sync word is routine noise in arbitrary bytes — two
    * CONSECUTIVE length-consistent frames is the standard confidence
    * test), and an optional 128-byte ID3v1 trailer.
    */
  def parseMeta(bytes: Array[Byte]): Option[Mp3Meta] = {
    var off = 0
    // ID3v2: "ID3" vv f + 4-byte syncsafe length of the tag body
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val size = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
        ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
      off = 10 + size
      if (off > bytes.length) return None
    }
    var frames = 0
    var bitrateSum = 0L
    var totalSamples = 0L
    var sampleRate = -1
    var channels = -1
    var versionStr: String = null
    var end = bytes.length
    // ID3v1 trailer: fixed 128 bytes starting "TAG"
    if (end - off >= 128 && bytes(end - 128) == 'T' &&
        bytes(end - 127) == 'A' && bytes(end - 126) == 'G') end -= 128
    while (off + 4 <= end) {
      val b1 = bytes(off) & 0xFF; val b2 = bytes(off + 1) & 0xFF
      val b3 = bytes(off + 2) & 0xFF; val b4 = bytes(off + 3) & 0xFF
      if (b1 != 0xFF || (b2 & 0xE0) != 0xE0) return None
      val verBits = (b2 >> 3) & 3 // 0=2.5, 2=2, 3=1 (1 reserved)
      val layerBits = (b2 >> 1) & 3 // 1 = Layer III
      if (verBits == 1 || layerBits != 1) return None
      val brIdx = (b3 >> 4) & 0xF
      val srIdx = (b3 >> 2) & 3
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
      val padding = (b3 >> 1) & 1
      val rate = verBits match {
        case 3 => RatesV1(srIdx)
        case 2 => RatesV2(srIdx)
        case _ => RatesV25(srIdx)
      }
      val bitrate = if (verBits == 3) BitrateV1L3(brIdx) else BitrateV2L3(brIdx)
      val samplesPerFrame = if (verBits == 3) 1152 else 576
      // frame length in bytes: (samples/8) * bitrate / rate + padding
      val frameLen = samplesPerFrame / 8 * bitrate * 1000 / rate + padding
      if (frameLen < 4 || off + frameLen > end) return None
      val ver = verBits match {
        case 3 => "MPEG1"; case 2 => "MPEG2"; case _ => "MPEG2.5"
      }
      val ch = if (((b4 >> 6) & 3) == 3) 1 else 2
      if (sampleRate < 0) {
        sampleRate = rate; channels = ch; versionStr = ver
      } else if (sampleRate != rate || versionStr != ver) {
        return None // rate/version changes mid-stream = not a real MP3
      }
      frames += 1
      bitrateSum += bitrate
      totalSamples += samplesPerFrame
      off += frameLen
    }
    if (frames < 2 || off != end) return None
    Some(Mp3Meta(versionStr, 3, sampleRate, channels, frames,
      (bitrateSum / frames).toInt,
      totalSamples * 1000L / sampleRate))
  }

  /** Assemble a syntactically-valid Layer III stream for specs: each
    * (bitrateKbps, padded) pair becomes one frame of the correct header
    * and byte length (zero payload — the walk never reads spectral data).
    */
  def encodeFrames(mpeg1: Boolean, srIdx: Int, mono: Boolean,
                   framesSpec: Seq[(Int, Boolean)],
                   id3v2Bytes: Int = 0, id3v1: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (id3v2Bytes > 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(3); out.write(0); out.write(0)
      out.write((id3v2Bytes >> 21) & 0x7F); out.write((id3v2Bytes >> 14) & 0x7F)
      out.write((id3v2Bytes >> 7) & 0x7F); out.write(id3v2Bytes & 0x7F)
      out.write(new Array[Byte](id3v2Bytes))
    }
    val table = if (mpeg1) BitrateV1L3 else BitrateV2L3
    val rate = if (mpeg1) RatesV1(srIdx) else RatesV2(srIdx)
    for ((kbps, padded) <- framesSpec) {
      val brIdx = table.indexOf(kbps)
      require(brIdx > 0, s"bitrate $kbps not in table")
      val spf = if (mpeg1) 1152 else 576
      val len = spf / 8 * kbps * 1000 / rate + (if (padded) 1 else 0)
      val b2 = 0xE0 | ((if (mpeg1) 3 else 2) << 3) | (1 << 1) | 1
      val b3 = (brIdx << 4) | (srIdx << 2) | ((if (padded) 1 else 0) << 1)
      val b4 = if (mono) 3 << 6 else 0
      out.write(0xFF); out.write(b2); out.write(b3); out.write(b4)
      out.write(new Array[Byte](len - 4))
    }
    if (id3v1) {
      out.write('T'); out.write('A'); out.write('G')
      out.write(new Array[Byte](125))
    }
    out.toByteArray
  }
}
