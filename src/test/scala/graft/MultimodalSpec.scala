package graft

import graft.operators.{Multimodal, PpmCodec}
import graft.operators.PpmCodec.PpmImage

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
}
