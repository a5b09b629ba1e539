package graft

import graft.operators.{Mp3Codec, Multimodal, WavCodec}
import graft.operators.WavCodec.WavAudio

/** Round-5 audio-format arms: the WAV dispatch beyond PCM-16 (PCM-8/24/32,
  * float32, G.711 A/μ-law, IMA ADPCM, EXTENSIBLE) pinned against
  * hand-computed expansions of the published algorithms, and the MP3
  * metadata frame walk.
  */
class AudioFormatsSpec extends SparkTestBase {
  import spark.implicits._

  /** Assemble a WAV container with an arbitrary fmt chunk. */
  private def wav(tag: Int, ch: Int, rate: Int, bits: Int, blockAlign: Int,
                  extra: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val fmtLen = 16 + extra.length
    val out = new java.io.ByteArrayOutputStream()
    def a(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def p16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def p32(v: Long): Unit = { p16((v & 0xFFFF).toInt); p16(((v >> 16) & 0xFFFF).toInt) }
    a("RIFF"); p32(4 + 8 + fmtLen + 8 + data.length); a("WAVE")
    a("fmt "); p32(fmtLen)
    p16(tag); p16(ch); p32(rate)
    p32(rate.toLong * blockAlign) // byte rate (unchecked by decode)
    p16(blockAlign); p16(bits)
    out.write(extra)
    a("data"); p32(data.length)
    out.write(data)
    out.toByteArray
  }

  test("PCM-8 is unsigned, centered at 128, scaled to the int16 high byte") {
    val data = Array[Byte](0, 128.toByte, 255.toByte, 192.toByte)
    val a = WavCodec.decode(wav(1, 1, 8000, 8, 1, Array.empty, data)).get
    a.samples.toSeq shouldBe Seq(-32768, 0, 32512, 16384).map(_.toShort)
  }

  test("PCM-24 and PCM-32 keep the top 16 bits") {
    // 24-bit LE sample 0x123456 → top16 = 0x1234; 0xFFFFFF → -1's top = 0xFFFF
    val d24 = Array[Byte](0x56, 0x34, 0x12, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)
    val a24 = WavCodec.decode(wav(1, 1, 8000, 24, 3, Array.empty, d24)).get
    a24.samples.toSeq shouldBe Seq(0x1234.toShort, -1)
    // 32-bit LE 0x7FFF0000 → 0x7FFF; 0x80000000 → -32768
    val d32 = Array[Byte](0, 0, 0xFF.toByte, 0x7F, 0, 0, 0, 0x80.toByte)
    val a32 = WavCodec.decode(wav(1, 1, 8000, 32, 4, Array.empty, d32)).get
    a32.samples.toSeq shouldBe Seq(32767.toShort, -32768)
  }

  test("float32 clamps to [-1,1], scales to int16, zeroes NaN") {
    def fb(f: Float): Array[Byte] = {
      val i = java.lang.Float.floatToIntBits(f)
      Array(i, i >> 8, i >> 16, i >> 24).map(_.toByte)
    }
    val data = (fb(0.5f) ++ fb(-1.0f) ++ fb(2.0f) ++ fb(Float.NaN) ++ fb(0.0f))
    val a = WavCodec.decode(wav(3, 1, 16000, 32, 4, Array.empty, data)).get
    a.samples.toSeq shouldBe Seq(16383, -32767, 32767, 0, 0).map(_.toShort)
  }

  test("mu-law expands to the published extremes and zero codes") {
    // canonical G.711 values: 0x00 → -32124, 0x80 → +32124, 0xFF/0x7F → ±0
    val data = Array[Byte](0x00, 0x80.toByte, 0xFF.toByte, 0x7F)
    val a = WavCodec.decode(wav(7, 1, 8000, 8, 1, Array.empty, data)).get
    a.samples.toSeq shouldBe Seq(-32124, 32124, 0, 0).map(_.toShort)
  }

  test("A-law expands to the published extremes and minimal steps") {
    // g711.c: a = b ^ 0x55; sign bit set → positive.
    // b=0x55 → a=0x00 → -8;  b=0xD5 → a=0x80 → +8
    // b=0x2A → a=0x7F → -32256; b=0xAA → a=0xFF → +32256
    val data = Array[Byte](0x55, 0xD5.toByte, 0x2A, 0xAA.toByte)
    val a = WavCodec.decode(wav(6, 1, 8000, 8, 1, Array.empty, data)).get
    a.samples.toSeq shouldBe Seq(-8, 8, -32256, 32256).map(_.toShort)
  }

  test("IMA ADPCM mono block decodes to the hand-stepped sample sequence") {
    // blockAlign 8 = 4-byte header + one 4-byte word (8 nibbles, 9 samples)
    // header: pred=100, index=0; nibbles (low-first): 0,4,8,15,0,0,0,0
    val extra = Array[Byte](2, 0, 9, 0) // cbSize=2, samplesPerBlock=9
    val data = Array[Byte](100, 0, 0, 0, 0x40, 0xF8.toByte, 0, 0)
    val a = WavCodec.decode(wav(0x11, 1, 8000, 4, 8, extra, data)).get
    // hand-stepped: step(0)=7 n=0→100; n=4→+7=107; step(2)=9 n=8→-1=106;
    // step(1)=8 n=15→-15=91; step(9)=17 n=0→+2=93; step(8)=16→+2=95;
    // step(7)=14→+1=96; step(6)=13→+1=97
    a.samples.toSeq shouldBe Seq(100, 100, 107, 106, 91, 93, 95, 96, 97)
      .map(_.toShort)
  }

  test("IMA ADPCM stereo interleaves per-channel words into L/R frames") {
    // blockAlign 16 = two 4-byte headers + one word per channel; all-zero
    // nibbles keep predictors almost flat (n=0 adds step>>3)
    val extra = Array[Byte](2, 0, 9, 0)
    val data = Array[Byte](
      0xE8.toByte, 0x03, 0, 0, // L header: pred=1000, index=0
      0x0C, 0xFE.toByte, 0, 0, // R header: pred=-500, index=0
      0, 0, 0, 0, // L word: 8 zero nibbles
      0, 0, 0, 0) // R word
    val a = WavCodec.decode(wav(0x11, 2, 8000, 4, 16, extra, data)).get
    a.channels shouldBe 2
    a.samples.length shouldBe 18
    // n=0 with index 0: step 7 → diff 0, but index decays to 0 (clamped) so
    // every following diff stays 0: constant channels
    a.samples.zipWithIndex.foreach { case (s, i) =>
      s shouldBe (if (i % 2 == 0) 1000 else -500).toShort
    }
  }

  test("WAVE_FORMAT_EXTENSIBLE unwraps its SubFormat tag") {
    // extensible wrapper around plain PCM-16: cbSize=22, validBits,
    // channel mask, then the 16-byte GUID whose first u16 is the tag
    val extra = new Array[Byte](24)
    extra(0) = 22 // cbSize
    extra(2) = 16 // valid bits
    extra(8) = 1 // SubFormat leading u16 = 1 (PCM)
    val data = Array[Byte](0x34, 0x12, 0xCC.toByte, 0xED.toByte)
    val a = WavCodec.decode(wav(0xFFFE, 1, 44100, 16, 2, extra, data)).get
    a.samples.toSeq shouldBe Seq(0x1234.toShort, 0xEDCC.toShort)
  }

  test("decodeAudioFeatures decodes the widened formats for real") {
    val ulaw = wav(7, 1, 8000, 8, 1, Array.empty,
      Array.fill(100)(0x00.toByte)) // constant -32124
    val r = Multimodal.decodeAudioFeatures(spark,
      Seq((1L, ulaw)).toDF("doc_id", "payload")).collect().head
    r.decoded shouldBe true
    r.sample_rate shouldBe 8000
    r.peak shouldBe 32124.0 / 32768.0 +- 1e-12
    r.zcr shouldBe 0.0
  }

  // ---- MP3 metadata walk ----

  test("MP3 frame walk yields frames, duration, and average bitrate") {
    // MPEG1 44.1k stereo, CBR 128kbps, 10 frames (some padded)
    val frames = Seq.tabulate(10)(i => (128, i % 3 == 0))
    val mp3 = Mp3Codec.encodeFrames(mpeg1 = true, srIdx = 0, mono = false,
      frames, id3v2Bytes = 57, id3v1 = true)
    val m = Mp3Codec.parseMeta(mp3).get
    m.mpegVersion shouldBe "MPEG1"
    m.sampleRate shouldBe 44100
    m.channels shouldBe 2
    m.frames shouldBe 10
    m.avgBitrateKbps shouldBe 128
    m.durationMs shouldBe 10L * 1152 * 1000 / 44100
  }

  test("MP3 VBR average and MPEG2 half-rate frames") {
    val frames = Seq((64, false), (128, false), (96, false))
    val mp3 = Mp3Codec.encodeFrames(mpeg1 = false, srIdx = 1, mono = true, frames)
    val m = Mp3Codec.parseMeta(mp3).get
    m.mpegVersion shouldBe "MPEG2"
    m.sampleRate shouldBe 24000
    m.channels shouldBe 1
    m.avgBitrateKbps shouldBe 96
    m.durationMs shouldBe 3L * 576 * 1000 / 24000
  }

  test("MP3 walk is strict: truncation, one-frame streams, junk all fail") {
    val good = Mp3Codec.encodeFrames(mpeg1 = true, srIdx = 0, mono = false,
      Seq((128, false), (128, false)))
    Mp3Codec.parseMeta(good).isDefined shouldBe true
    Mp3Codec.parseMeta(good.dropRight(1)) shouldBe None // mid-frame cut
    Mp3Codec.parseMeta(Mp3Codec.encodeFrames(mpeg1 = true, srIdx = 0,
      mono = false, Seq((128, false)))) shouldBe None // < 2 frames
    Mp3Codec.parseMeta("not an mp3 at all".getBytes) shouldBe None
    Mp3Codec.parseMeta(Array.emptyByteArray) shouldBe None
  }

  test("audioMeta triages wav/mp3/unknown with real durations") {
    val sine = Array.tabulate(8000)(i => (math.sin(i * 0.01) * 9000).toShort)
    val payloads = Seq(
      (1L, WavCodec.encode(WavAudio(8000, 1, sine))),
      (2L, Mp3Codec.encodeFrames(mpeg1 = true, srIdx = 2, mono = true,
        Seq.fill(5)((192, false)))),
      (3L, "plain text".getBytes)
    ).toDF("doc_id", "payload")
    val r = Multimodal.audioMeta(spark, payloads).collect().sortBy(_.doc_id)
    r(0).container shouldBe "wav"
    r(0).duration_ms shouldBe 1000L
    r(0).pcm_decodable shouldBe true
    r(1).container shouldBe "mp3"
    r(1).sample_rate shouldBe 32000
    r(1).duration_ms shouldBe 5L * 1152 * 1000 / 32000
    r(1).pcm_decodable shouldBe false
    r(2).container shouldBe "unknown"
    r(2).duration_ms shouldBe 0L
  }

  test("widened decode paths never throw on corrupt payloads (fuzz)") {
    val rng = new scala.util.Random(20260814L)
    val seeds = Seq(
      wav(7, 1, 8000, 8, 1, Array.empty, Array.fill(64)(rng.nextInt().toByte)),
      wav(6, 2, 8000, 8, 2, Array.empty, Array.fill(64)(rng.nextInt().toByte)),
      wav(0x11, 1, 8000, 4, 8, Array[Byte](2, 0, 9, 0),
        Array.fill(32)(rng.nextInt().toByte)),
      wav(3, 1, 8000, 32, 4, Array.empty, Array.fill(64)(rng.nextInt().toByte)),
      Mp3Codec.encodeFrames(mpeg1 = true, srIdx = 0, mono = false,
        Seq.fill(4)((128, false))))
    val payloads =
      (1 to 200).map(_ => Array.fill(rng.nextInt(200))(rng.nextInt().toByte)) ++
      (1 to 200).map { _ =>
        val b = seeds(rng.nextInt(seeds.length)).clone()
        b(rng.nextInt(b.length)) = rng.nextInt().toByte; b
      } ++
      (1 to 100).map { _ =>
        val s = seeds(rng.nextInt(seeds.length)); s.take(rng.nextInt(s.length))
      }
    payloads.foreach { p =>
      noException should be thrownBy WavCodec.decode(p)
      noException should be thrownBy Mp3Codec.parseMeta(p)
      noException should be thrownBy graft.operators.AiffCodec.decode(p)
    }
  }

  // ---------- AIFF / AIFF-C ----------

  /** Assemble an AIFF/AIFC container. `rate80` is the 10-byte extended
    * sample rate, built independently of the decoder's parser.
    */
  private def aiff(formType: String, ch: Int, nFrames: Int, bits: Int,
                   rate80: Array[Byte], compression: String,
                   data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def a(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def b16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def b32(v: Long): Unit = { b16(((v >> 16) & 0xFFFF).toInt); b16((v & 0xFFFF).toInt) }
    val commLen = if (compression.isEmpty) 18 else 18 + 4 + 2 // + pstring "x\0"
    val ssndLen = 8 + data.length
    a("FORM"); b32(4 + 8 + commLen + (commLen & 1) + 8 + ssndLen); a(formType)
    a("COMM"); b32(commLen)
    b16(ch); b32(nFrames); b16(bits); out.write(rate80)
    if (compression.nonEmpty) { a(compression); out.write(1); out.write('x') }
    if ((commLen & 1) == 1) out.write(0)
    a("SSND"); b32(ssndLen); b32(0); b32(0)
    out.write(data)
    out.toByteArray
  }

  /** 80-bit extended for an integral rate: exponent 16383+e, mantissa
    * rate << (63 - e) where e = floor(log2 rate).
    */
  private def rate80(rate: Int): Array[Byte] = {
    val e = 31 - Integer.numberOfLeadingZeros(rate)
    val mant = rate.toLong << (63 - e)
    val exp = 16383 + e
    Array[Byte](((exp >> 8) & 0xff).toByte, (exp & 0xff).toByte) ++
      (0 until 8).map(i => ((mant >>> (56 - 8 * i)) & 0xff).toByte)
  }

  test("AIFF big-endian PCM-16 decodes; signed PCM-8 scales to high byte") {
    val d16 = Array[Byte](0x12, 0x34, 0xFE.toByte, 0xDC.toByte)
    val a16 = graft.operators.AiffCodec.decode(
      aiff("AIFF", 1, 2, 16, rate80(44100), "", d16)).get
    a16.sampleRate shouldBe 44100
    a16.channels shouldBe 1
    a16.samples.toSeq shouldBe Seq(0x1234.toShort, 0xFEDC.toShort)
    // signed 8-bit: -2 → -512, 3 → 768
    val d8 = Array[Byte](-2, 3)
    val a8 = graft.operators.AiffCodec.decode(
      aiff("AIFF", 1, 2, 8, rate80(8000), "", d8)).get
    a8.samples.toSeq shouldBe Seq((-512).toShort, 768.toShort)
  }

  test("AIFF PCM-24/32 keep top 16 bits; stereo interleave preserved") {
    val d24 = Array[Byte](0x12, 0x34, 0x56, 0xAB.toByte, 0xCD.toByte, 0xEF.toByte)
    val a24 = graft.operators.AiffCodec.decode(
      aiff("AIFF", 2, 1, 24, rate80(48000), "", d24)).get
    a24.channels shouldBe 2
    a24.samples.toSeq shouldBe Seq(0x1234.toShort, 0xABCD.toShort)
    val d32 = Array[Byte](0x7F, 0xFF.toByte, 0, 0)
    val a32 = graft.operators.AiffCodec.decode(
      aiff("AIFF", 1, 1, 32, rate80(8000), "", d32)).get
    a32.samples.toSeq shouldBe Seq(0x7FFF.toShort)
  }

  test("AIFC: NONE is big-endian, sowt is little-endian; AAC-ish rejects") {
    val d = Array[Byte](0x12, 0x34)
    graft.operators.AiffCodec.decode(
      aiff("AIFC", 1, 1, 16, rate80(22050), "NONE", d)).get
      .samples.toSeq shouldBe Seq(0x1234.toShort)
    graft.operators.AiffCodec.decode(
      aiff("AIFC", 1, 1, 16, rate80(22050), "sowt", d)).get
      .samples.toSeq shouldBe Seq(0x3412.toShort)
    graft.operators.AiffCodec.decode(
      aiff("AIFC", 1, 1, 16, rate80(22050), "aac ", d)) shouldBe None
  }

  test("AIFF strictness: bad rate, short data, truncated chunks reject") {
    val d = Array[Byte](1, 2)
    // NaN/Inf exponent
    val badRate = Array[Byte](0x7F, 0xFF.toByte) ++ Array.fill[Byte](8)(0)
    graft.operators.AiffCodec.decode(
      aiff("AIFF", 1, 1, 16, badRate, "", d)) shouldBe None
    // frame count says 4 but data has 1 frame
    graft.operators.AiffCodec.decode(
      aiff("AIFF", 1, 4, 16, rate80(8000), "", d)) shouldBe None
    // truncation mid-SSND
    val ok = aiff("AIFF", 1, 1, 16, rate80(8000), "", d)
    graft.operators.AiffCodec.decode(ok.take(ok.length - 3)) shouldBe None
  }

  test("audioMeta triages AIFF as its own container with real duration") {
    val sine = Array.tabulate(800)(i =>
      (math.sin(i * 0.2) * 12000).toInt).flatMap(s =>
      Seq(((s >> 8) & 0xff).toByte, (s & 0xff).toByte))
    val payload = aiff("AIFF", 1, 800, 16, rate80(8000), "", sine)
    val df = Seq((1L, payload)).toDF("doc_id", "text")
      .selectExpr("doc_id", "cast(text as binary) as payload")
    val r = Multimodal.audioMeta(spark, df).collect()
    r(0).container shouldBe "aiff"
    r(0).sample_rate shouldBe 8000
    r(0).duration_ms shouldBe 100L
    r(0).pcm_decodable shouldBe true
    // features flow through the same 16-bit pipeline as WAV
    val f = Multimodal.decodeAudioFeatures(spark, df).collect()
    f(0).decoded shouldBe true
    f(0).sample_rate shouldBe 8000
    f(0).rms should be > 0.0
  }
}
