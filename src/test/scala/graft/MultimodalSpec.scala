package graft

import graft.operators.{Multimodal, PpmCodec, WavCodec}
import graft.operators.PpmCodec.PpmImage
import graft.operators.WavCodec.WavAudio

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq((1L, "hello media"), (2L, "hello media"), (3L, "other"))
    .toDF("doc_id", "text")

  // a real 4x2 PPM: left half red, right half blue
  private def rgb(w: Int, h: Int)(f: (Int, Int) => (Int, Int, Int)): PpmImage = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      px((y * w + x) * 3) = r.toByte
      px((y * w + x) * 3 + 1) = g.toByte
      px((y * w + x) * 3 + 2) = b.toByte
    }
    PpmImage(w, h, px)
  }
  private val redBlue = rgb(4, 2)((x, _) => if (x < 2) (255, 0, 0) else (0, 0, 255))

  private def ppmDocs = Seq(
    (1L, PpmCodec.encode(redBlue)),
    (2L, "not an image at all".getBytes("UTF-8"))
  ).toDF("doc_id", "text") // binary -> cast through the same payload path

  test("withBinaryMeta: byte length + sha-256 content addressing") {
    val r = Multimodal.withBinaryMeta(docs)
      .select("doc_id", "n_bytes", "content_id")
      .as[(Long, Int, String)].collect().sortBy(_._1)
    r(0)._2 shouldBe 11
    r(0)._3 shouldBe r(1)._3 // same payload -> same content id
    r(2)._3 should not be r(0)._3
    r(0)._3 should fullyMatch regex "[0-9a-f]{64}"
  }

  test("PpmCodec: encode/decode roundtrip, comments, truncation rejected") {
    val bytes = PpmCodec.encode(redBlue)
    val Some((img, consumed)) = PpmCodec.decodeOne(bytes)
    consumed shouldBe bytes.length
    img.width shouldBe 4; img.height shouldBe 2
    img.pixels.toSeq shouldBe redBlue.pixels.toSeq
    // header comments are legal
    val commented = ("P6\n# a comment\n4 2\n255\n").getBytes("US-ASCII") ++
      redBlue.pixels
    PpmCodec.decodeOne(commented).map(_._1.width) shouldBe Some(4)
    // truncated pixel data and wrong magic both rejected
    PpmCodec.decodeOne(bytes.dropRight(1)) shouldBe None
    PpmCodec.decodeOne("P5 2 2 255 ".getBytes ++ new Array[Byte](12)) shouldBe None
  }

  test("decodeFeatures: REAL decode for PPM payloads, marked fallback otherwise") {
    val r = Multimodal.decodeFeatures(spark, ppmDocs).collect().sortBy(_.doc_id)
    r(0).decoded shouldBe true
    r(0).width shouldBe 4; r(0).height shouldBe 2
    // half red half blue: channel means (127.5, 0, 127.5)
    r(0).feature(0) shouldBe 127.5f
    r(0).feature(1) shouldBe 0f
    r(0).feature(2) shouldBe 127.5f
    // gray = 85 for both halves -> all pixels in histogram bin 1
    r(0).feature(4) shouldBe 1f
    r(1).decoded shouldBe false // non-PPM takes the fallback arm
    r(1).feature.length shouldBe 8
    // determinism across runs
    val again = Multimodal.decodeFeatures(spark, ppmDocs).collect().sortBy(_.doc_id)
    again.map(_.feature.toSeq) shouldBe r.map(_.feature.toSeq)
  }

  test("resize: real nearest-neighbor resampling of decoded pixels") {
    val imgs = Multimodal.decodeImages(spark, ppmDocs)
    imgs.count() shouldBe 1 // only the PPM payload decodes
    val r = Multimodal.resize(imgs, 8, 4).collect().head
    r.width shouldBe 8; r.height shouldBe 4
    r.pixels.length shouldBe 8 * 4 * 3
    // 2x upscale keeps the left half red, right half blue
    def px(x: Int, y: Int) = (r.pixels((y * 8 + x) * 3) & 0xFF,
      r.pixels((y * 8 + x) * 3 + 2) & 0xFF)
    px(0, 0) shouldBe ((255, 0))
    px(3, 3) shouldBe ((255, 0))
    px(4, 0) shouldBe ((0, 255))
    px(7, 3) shouldBe ((0, 255))
  }

  test("frameSample: real frame boundaries from a concatenated PPM stream") {
    // 6-frame "video": frame i is a 2x1 image with red = 40*i
    val frames6 = (0 until 6).map(i => rgb(2, 1)((_, _) => (40 * i, 0, 0)))
    val stream = frames6.map(PpmCodec.encode).reduce(_ ++ _)
    val video = Seq((7L, stream)).toDF("doc_id", "text")
    val r = Multimodal.frameSample(spark, video, 3).collect().sortBy(_.frame_idx)
    r.length shouldBe 3
    r.map(_.frame_idx).toSeq shouldBe Seq(0, 2, 4) // evenly spaced of 6
    r.foreach { f => f.width shouldBe 2; f.height shouldBe 1 }
    r.map(f => f.frame_bytes(0) & 0xFF).toSeq shouldBe Seq(0, 80, 160)
    // non-stream payloads keep the byte-slice fallback shape
    val fb = Multimodal.frameSample(spark, docs, 4).collect()
    fb.count(_.doc_id == 1L) shouldBe 4
    fb.filter(_.doc_id == 1L).foreach(_.width shouldBe 0)
  }

  test("codecs never throw on corrupt payloads (fuzz)") {
    // at corpus scale corrupt payloads are routine input, not exceptions:
    // decode must return None/empty, never blow up the task
    val rng = new scala.util.Random(20260812L)
    val sine = Array.tabulate(500)(i => (math.sin(i * 0.1) * 9000).toShort)
    val validWav = WavCodec.encode(WavAudio(8000, 1, sine))
    val validPpm = PpmCodec.encode(redBlue)
    val validJpeg = graft.operators.JpegCodec.encode(redBlue)
    val sources = Seq(validWav, validPpm, validJpeg)
    val payloads =
      (1 to 200).map(_ => Array.fill(rng.nextInt(200))(rng.nextInt().toByte)) ++
      (1 to 150).map { _ => // bit-flipped valid files
        val b = sources(rng.nextInt(sources.length)).clone()
        b(rng.nextInt(b.length)) = rng.nextInt().toByte
        b
      } ++
      (1 to 75).map { _ => // truncations
        val src = sources(rng.nextInt(sources.length))
        src.take(rng.nextInt(src.length))
      } :+ Array.emptyByteArray
    payloads.foreach { p =>
      noException should be thrownBy WavCodec.decode(p)
      noException should be thrownBy PpmCodec.decodeOne(p)
      noException should be thrownBy PpmCodec.decodeStream(p)
      noException should be thrownBy graft.operators.JpegCodec.decode(p)
      noException should be thrownBy graft.operators.BmpCodec.decode(p)
      noException should be thrownBy graft.operators.GifCodec.decode(p)
      noException should be thrownBy graft.operators.TiffCodec.decode(p)
    }
  }

  test("WavCodec: encode/decode roundtrip and strict rejection") {
    val sine = Array.tabulate(4410)(i =>
      (math.sin(2 * math.Pi * 440 * i / 44100.0) * 16384).toShort)
    val a = WavAudio(44100, 1, sine)
    val back = WavCodec.decode(WavCodec.encode(a)).get
    back.sampleRate shouldBe 44100
    back.channels shouldBe 1
    back.samples shouldBe sine
    back.nFrames shouldBe 4410
    back.durationSec shouldBe (0.1 +- 1e-9)
    // stereo frame count halves
    WavCodec.decode(WavCodec.encode(WavAudio(8000, 2, sine)))
      .get.nFrames shouldBe 2205
    // garbage, truncation, and unsupported formats are all rejected
    WavCodec.decode("not audio".getBytes) shouldBe None
    WavCodec.decode(WavCodec.encode(a).dropRight(10)) shouldBe None
    val msAdpcm = WavCodec.encode(a); msAdpcm(20) = 2 // tag 2 = MS ADPCM
    WavCodec.decode(msAdpcm) shouldBe None
    // a tag/bits mismatch (float32 tag over 16-bit data) is also rejected
    val floatTag = WavCodec.encode(a); floatTag(20) = 3
    WavCodec.decode(floatTag) shouldBe None
  }

  test("WavCodec features match closed-form signal values") {
    // full-scale square wave: rms 1.0, a crossing every half period
    val square = Array.tabulate(1000)(i =>
      if ((i / 10) % 2 == 0) (-32768).toShort else 32767.toShort)
    val (rms, zcr, peak) = WavCodec.features(WavAudio(1000, 1, square))
    rms shouldBe (1.0 +- 0.01)
    peak shouldBe (1.0 +- 0.01)
    zcr shouldBe (0.1 +- 0.01) // one crossing per 10 samples
    // sine rms = amplitude / sqrt(2)
    val sine = Array.tabulate(44100)(i =>
      (math.sin(2 * math.Pi * 100 * i / 44100.0) * 16384).toShort)
    val (srms, _, _) = WavCodec.features(WavAudio(44100, 1, sine))
    srms shouldBe (16384.0 / 32768.0 / math.sqrt(2) +- 0.001)
  }

  test("decodeAudioFeatures: REAL decode for WAV payloads, marked fallback otherwise") {
    val sine = Array.tabulate(800)(i =>
      (math.sin(2 * math.Pi * 50 * i / 8000.0) * 8192).toShort)
    val payloads = Seq(
      (1L, WavCodec.encode(WavAudio(8000, 1, sine))),
      (2L, "definitely not a wav".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val r = Multimodal.decodeAudioFeatures(spark, payloads)
      .collect().sortBy(_.doc_id)
    r(0).decoded shouldBe true
    r(0).sample_rate shouldBe 8000
    r(0).n_frames shouldBe 800
    r(0).rms shouldBe (8192.0 / 32768.0 / math.sqrt(2) +- 0.001)
    r(1).decoded shouldBe false
    r(1).sample_rate shouldBe 0
  }
}
