package graft

import java.util.zip.{CRC32, Deflater}

import graft.operators.{Multimodal, PngCodec, PpmCodec}
import graft.operators.PpmCodec.PpmImage

class PngCodecSpec extends SparkTestBase {
  import spark.implicits._

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

  // a gradient exercises every filter's prediction arithmetic non-trivially
  private val gradient = rgb(7, 5)((x, y) => (x * 36, y * 50, (x + y) * 20))

  /** Build a PNG from already-filtered raw scanline data — lets the spec
    * drive every filter type through the decoder, which the filter-0-only
    * encoder can't.
    */
  private def buildPng(w: Int, h: Int, colorType: Int,
                       raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    def chunk(t: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(len >>> 24); out.write(len >>> 16); out.write(len >>> 8); out.write(len)
      val tb = t.getBytes("US-ASCII")
      val crc = new CRC32(); crc.update(tb); crc.update(data)
      out.write(tb); out.write(data)
      val c = crc.getValue.toInt
      out.write(c >>> 24); out.write(c >>> 16); out.write(c >>> 8); out.write(c)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
    ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte
    ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8; ihdr(9) = colorType.toByte
    chunk("IHDR", ihdr)
    val d = new Deflater(); d.setInput(raw); d.finish()
    val buf = new Array[Byte](8192)
    val z = new java.io.ByteArrayOutputStream()
    while (!d.finished()) z.write(buf, 0, d.deflate(buf))
    d.end()
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Forward-apply a PNG filter to packed sample rows (the spec's filter
    * definitions, run in the encoding direction) — decode must invert it.
    */
  private def forwardFilter(filter: Int, samples: Array[Byte], w: Int, h: Int,
                            ch: Int): Array[Byte] = {
    val stride = w * ch
    val out = new Array[Byte]((stride + 1) * h)
    for (y <- 0 until h) {
      out(y * (stride + 1)) = filter.toByte
      for (x <- 0 until stride) {
        val cur = samples(y * stride + x) & 0xFF
        val a = if (x >= ch) samples(y * stride + x - ch) & 0xFF else 0
        val b = if (y > 0) samples((y - 1) * stride + x) & 0xFF else 0
        val c = if (y > 0 && x >= ch) samples((y - 1) * stride + x - ch) & 0xFF else 0
        val pred = filter match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        out(y * (stride + 1) + 1 + x) = (cur - pred).toByte
      }
    }
    out
  }

  test("encode/decode roundtrip is pixel-exact and matches the PPM path") {
    val png = PngCodec.encode(gradient)
    PngCodec.isPng(png) shouldBe true
    val back = PngCodec.decode(png).get
    back.width shouldBe 7; back.height shouldBe 5
    back.pixels.toSeq shouldBe gradient.pixels.toSeq
    // same image through the other real codec: identical pixels
    val viaPpm = PpmCodec.decodeOne(PpmCodec.encode(gradient)).get._1
    back.pixels.toSeq shouldBe viaPpm.pixels.toSeq
  }

  test("all five filter types unfilter back to the same pixels") {
    for (filter <- 0 to 4) {
      val raw = forwardFilter(filter, gradient.pixels, 7, 5, 3)
      val png = buildPng(7, 5, colorType = 2, raw)
      val img = PngCodec.decode(png)
      withClue(s"filter $filter: ") {
        img.map(_.pixels.toSeq) shouldBe Some(gradient.pixels.toSeq)
      }
    }
    // mixed per-row filters (the realistic encoder output shape)
    val stride = 7 * 3
    val mixed = new Array[Byte]((stride + 1) * 5)
    for (y <- 0 until 5) {
      val f = y % 5
      val one = forwardFilter(f, gradient.pixels, 7, 5, 3)
      System.arraycopy(one, y * (stride + 1), mixed, y * (stride + 1), stride + 1)
    }
    PngCodec.decode(buildPng(7, 5, 2, mixed))
      .map(_.pixels.toSeq) shouldBe Some(gradient.pixels.toSeq)
  }

  test("grayscale replicates to RGB; RGBA drops alpha") {
    // gray ramp 0,10,..: out pixel (g,g,g)
    val w = 4; val h = 2
    val gray = Array.tabulate(w * h)(i => (i * 10).toByte)
    val grayRaw = forwardFilter(0, gray, w, h, 1)
    val g = PngCodec.decode(buildPng(w, h, colorType = 0, grayRaw)).get
    g.pixels.toSeq shouldBe gray.flatMap(v => Seq(v, v, v)).toSeq
    // RGBA with varying alpha: RGB carried through, alpha ignored
    val rgba = Array.tabulate(w * h * 4) { i =>
      (if (i % 4 == 3) 7 * i else i * 3).toByte
    }
    val r = PngCodec.decode(buildPng(w, h, colorType = 6,
      forwardFilter(4, rgba, w, h, 4))).get
    val expected = (0 until w * h).flatMap(p =>
      Seq(rgba(p * 4), rgba(p * 4 + 1), rgba(p * 4 + 2)))
    r.pixels.toSeq shouldBe expected
  }

  test("corrupt and out-of-scope payloads are rejected, never thrown") {
    val good = PngCodec.encode(gradient)
    PngCodec.decode("not a png".getBytes) shouldBe None
    PngCodec.decode(good.dropRight(20)) shouldBe None // truncated
    val badCrc = good.clone(); badCrc(good.length - 5) = 0x55
    PngCodec.decode(badCrc) shouldBe None
    // a palette (3) stream WITHOUT a PLTE chunk is corrupt, not fallback
    val raw = forwardFilter(0, gradient.pixels, 7, 5, 3)
    PngCodec.decode(buildPng(7, 5, colorType = 3, raw)) shouldBe None
    val deep = PngCodec.encode(gradient).clone()
    // flip IHDR bit depth byte 8->16 (offset 8+8+8 = 24), CRC now wrong -> None
    deep(24) = 16
    PngCodec.decode(deep) shouldBe None
    // a lying IHDR dimension (40000x18000 grayscale: raw size passes the
    // Int guard, RGB size would overflow) must hit the pixel cap with
    // valid CRCs, before any allocation
    PngCodec.decode(buildPng(40000, 18000, colorType = 0,
      Array[Byte](1, 2, 3))) shouldBe None
    // fuzz: random bytes and bit-flipped valid files never throw — seeds
    // include an Adam7 16-bit RGBA stream so the round-5 pass-geometry
    // and wide-sample paths face the same mutation pressure
    val rng = new scala.util.Random(20260813L)
    val adamSeed = PngCodec.encodeRaw(11, 9, 6, 16,
      Array.tabulate(11 * 9 * 4)(i => (i * 997) % 65536),
      interlaced = true, cycleFilters = true)
    val seeds = Seq(good, adamSeed)
    val payloads =
      (1 to 200).map(_ => Array.fill(rng.nextInt(300))(rng.nextInt().toByte)) ++
      (1 to 200).map { _ =>
        val b = seeds(rng.nextInt(seeds.length)).clone()
        b(rng.nextInt(b.length)) = rng.nextInt().toByte; b
      } ++
      (1 to 100).map { _ =>
        val s = seeds(rng.nextInt(seeds.length)); s.take(rng.nextInt(s.length))
      }
    payloads.foreach(p => noException should be thrownBy PngCodec.decode(p))
  }

  test("palette decode: all four bit depths expand through PLTE, tRNS alpha drops") {
    // 4-entry palette: black, red, green, a gray
    val palette = Array[Byte](0, 0, 0, 255.toByte, 0, 0, 0, 255.toByte, 0,
      80, 80, 80)
    val w = 5; val h = 3
    val rng = new scala.util.Random(20260814L)
    for (depth <- Seq(1, 2, 4, 8)) {
      val maxIdx = math.min(4, 1 << depth)
      val idx = Array.fill(w * h)(rng.nextInt(maxIdx))
      val png = PngCodec.encodePalette(w, h, palette, idx, depth,
        trns = if (depth == 8) Some(Array[Byte](0, 128.toByte, 255.toByte)) else None)
      val img = PngCodec.decode(png)
      withClue(s"depth $depth: ") {
        img.isDefined shouldBe true
        img.get.width shouldBe w; img.get.height shouldBe h
        val expected = idx.flatMap(i =>
          Seq(palette(i * 3), palette(i * 3 + 1), palette(i * 3 + 2))).toSeq
        img.get.pixels.toSeq shouldBe expected
      }
    }
  }

  test("palette decode survives every filter type over index bytes") {
    // 8-bit palette rows are plain bytes, so the five filters apply with
    // bpp = 1; assemble via the generic builder with a PLTE injected
    val palette = Array.tabulate(256 * 3)(i => (i % 251).toByte)
    val w = 6; val h = 4
    val idx = Array.tabulate(w * h)(i => (i * 37) % 256)
    val idxBytes = idx.map(_.toByte)
    for (filter <- 0 to 4) {
      val raw = forwardFilter(filter, idxBytes, w, h, 1)
      // splice a PLTE chunk in front of IDAT by re-assembling
      val noPlte = buildPng(w, h, colorType = 3, raw)
      val png = injectPlte(noPlte, palette)
      val img = PngCodec.decode(png)
      withClue(s"filter $filter: ") {
        val expected = idx.flatMap(i =>
          Seq(palette(i * 3), palette(i * 3 + 1), palette(i * 3 + 2))).toSeq
        img.map(_.pixels.toSeq) shouldBe Some(expected)
      }
    }
  }

  test("palette corruption: out-of-range index and oversized tRNS reject") {
    val palette = Array[Byte](10, 20, 30, 40, 50, 60) // 2 entries
    // index 3 with a 2-entry palette: corrupt
    val bad = PngCodec.encodePalette(2, 1, palette, Array(0, 3), 8)
    PngCodec.decode(bad) shouldBe None
    // tRNS with more alphas than palette entries: corrupt
    val over = PngCodec.encodePalette(2, 1, palette, Array(0, 1), 8,
      trns = Some(Array[Byte](1, 2, 3)))
    PngCodec.decode(over) shouldBe None
    // valid control
    PngCodec.decode(PngCodec.encodePalette(2, 1, palette, Array(0, 1), 8))
      .get.pixels.toSeq shouldBe Seq[Byte](10, 20, 30, 40, 50, 60)
    // fuzz over the palette arm too: bit flips and truncations never throw
    val good = PngCodec.encodePalette(3, 3, palette,
      Array(0, 1, 0, 1, 0, 1, 0, 1, 0), 2,
      trns = Some(Array[Byte](9)))
    val rng = new scala.util.Random(20260815L)
    val payloads =
      (1 to 100).map { _ =>
        val b = good.clone(); b(rng.nextInt(b.length)) = rng.nextInt().toByte; b
      } ++ (1 to 50).map(_ => good.take(rng.nextInt(good.length)))
    payloads.foreach(p => noException should be thrownBy PngCodec.decode(p))
  }

  /** Insert a PLTE chunk (with CRC) immediately before the first IDAT. */
  private def injectPlte(png: Array[Byte], palette: Array[Byte]): Array[Byte] = {
    var off = 8
    var idatOff = -1
    while (idatOff < 0 && off + 8 <= png.length) {
      val len = ((png(off) & 0xFF) << 24) | ((png(off + 1) & 0xFF) << 16) |
        ((png(off + 2) & 0xFF) << 8) | (png(off + 3) & 0xFF)
      val t = new String(png, off + 4, 4, "US-ASCII")
      if (t == "IDAT") idatOff = off else off += 12 + len
    }
    require(idatOff > 0, "no IDAT")
    val out = new java.io.ByteArrayOutputStream()
    out.write(png, 0, idatOff)
    val len = palette.length
    out.write(len >>> 24); out.write(len >>> 16); out.write(len >>> 8); out.write(len)
    val tb = "PLTE".getBytes("US-ASCII")
    val crc = new CRC32(); crc.update(tb); crc.update(palette)
    out.write(tb); out.write(palette)
    val c = crc.getValue.toInt
    out.write(c >>> 24); out.write(c >>> 16); out.write(c >>> 8); out.write(c)
    out.write(png, idatOff, png.length - idatOff)
    out.toByteArray
  }

  test("decodeFeatures marks PNG payloads decoded=true with real pixel features") {
    val redBlue = rgb(4, 2)((x, _) => if (x < 2) (255, 0, 0) else (0, 0, 255))
    val payloads = Seq(
      (1L, PngCodec.encode(redBlue)),
      (2L, PpmCodec.encode(redBlue)),
      (3L, "jpeg-ish ÿØ not decodable".getBytes("UTF-8"))
    ).toDF("doc_id", "text")
    val r = Multimodal.decodeFeatures(spark, payloads).collect().sortBy(_.doc_id)
    r(0).decoded shouldBe true
    r(0).width shouldBe 4; r(0).height shouldBe 2
    // identical pixels => identical features across the two real codecs
    r(0).feature.toSeq shouldBe r(1).feature.toSeq
    r(0).feature(0) shouldBe 127.5f
    r(2).decoded shouldBe false
    // decodeImages + resize run on PNG pixels like PPM ones
    val imgs = Multimodal.decodeImages(spark, payloads)
    imgs.count() shouldBe 2
    val resized = Multimodal.resize(imgs, 8, 4).collect()
    resized.foreach { d => d.width shouldBe 8; d.pixels.length shouldBe 8 * 4 * 3 }
  }

  // ---- round-5 arms: gray+alpha, 16-bit, sub-byte gray, Adam7 ----

  test("gray+alpha drops alpha and replicates gray into RGB") {
    val w = 5; val h = 3
    val samples = Array.tabulate(w * h * 2) { i =>
      if (i % 2 == 0) (i / 2) * 16 else 200 // gray ramp, constant alpha
    }
    val png = PngCodec.encodeRaw(w, h, colorType = 4, bitDepth = 8, samples)
    val img = PngCodec.decode(png).get
    for (p <- 0 until w * h; c <- 0 until 3)
      (img.pixels(p * 3 + c) & 0xFF) shouldBe p * 16
  }

  test("16-bit samples keep the high byte across RGB, gray, RGBA, gray+alpha") {
    val w = 4; val h = 2
    for ((ct, ch) <- Seq((0, 1), (2, 3), (4, 2), (6, 4))) {
      // high byte = a per-(pixel,channel) ramp; low byte = noise that must
      // NOT leak into the output
      val samples = Array.tabulate(w * h * ch) { i =>
        (((i * 7) % 256) << 8) | ((i * 131) % 256)
      }
      val png = PngCodec.encodeRaw(w, h, ct, bitDepth = 16, samples)
      val img = PngCodec.decode(png).get
      for (p <- 0 until w * h) {
        val expected = ct match {
          case 0 | 4 => // gray replicated (alpha channel skipped for 4)
            val g = ((p * ch) * 7) % 256
            Seq(g, g, g)
          case _ => Seq(((p * ch) * 7) % 256, ((p * ch + 1) * 7) % 256,
            ((p * ch + 2) * 7) % 256)
        }
        (0 until 3).map(c => img.pixels(p * 3 + c) & 0xFF) shouldBe expected
      }
    }
  }

  test("sub-byte grayscale bit-replicates to full range (depths 1/2/4)") {
    for (d <- Seq(1, 2, 4)) {
      val maxV = (1 << d) - 1
      val w = maxV + 1; val h = 2 // one pixel per possible level, 2 rows
      val samples = Array.tabulate(w * h)(i => i % w)
      val png = PngCodec.encodeRaw(w, h, colorType = 0, bitDepth = d, samples)
      val img = PngCodec.decode(png).get
      for (p <- 0 until w * h)
        (img.pixels(p * 3) & 0xFF) shouldBe (p % w) * (255 / maxV)
    }
  }

  test("Adam7 interlaced decode equals sequential decode on every color type") {
    val w = 11; val h = 9 // odd dims: every Adam7 pass non-trivial, ragged edges
    for ((ct, ch, depth) <- Seq((0, 1, 8), (2, 3, 8), (4, 2, 8), (6, 4, 8),
      (2, 3, 16), (0, 1, 4))) {
      val maxV = (1 << depth) - 1
      val samples = Array.tabulate(w * h * ch)(i => (i * 37) % (maxV + 1))
      val seq = PngCodec.decode(
        PngCodec.encodeRaw(w, h, ct, depth, samples)).get
      val adam = PngCodec.decode(
        PngCodec.encodeRaw(w, h, ct, depth, samples, interlaced = true,
          cycleFilters = true)).get
      adam.width shouldBe seq.width
      adam.pixels.toSeq shouldBe seq.pixels.toSeq
    }
  }

  test("Adam7 handles degenerate dims where most passes are empty") {
    for ((w, h) <- Seq((1, 1), (3, 3), (5, 2), (2, 8), (8, 1))) {
      val samples = Array.tabulate(w * h * 3)(i => (i * 23) % 256)
      val seq = PngCodec.decode(PngCodec.encodeRaw(w, h, 2, 8, samples)).get
      val adam = PngCodec.decode(
        PngCodec.encodeRaw(w, h, 2, 8, samples, interlaced = true)).get
      adam.pixels.toSeq shouldBe seq.pixels.toSeq
    }
  }

  test("encodeRaw with cycling filters decodes identically to filter-0") {
    val w = 9; val h = 7
    val samples = Array.tabulate(w * h * 3)(i => (i * 53) % 256)
    val plain = PngCodec.decode(PngCodec.encodeRaw(w, h, 2, 8, samples)).get
    val cycled = PngCodec.decode(
      PngCodec.encodeRaw(w, h, 2, 8, samples, cycleFilters = true)).get
    cycled.pixels.toSeq shouldBe plain.pixels.toSeq
  }

  test("tRNS on color types 4/6 is rejected as corruption") {
    val samples = Array.tabulate(2 * 2 * 4)(_ % 256)
    val png = PngCodec.encodeRaw(2, 2, 6, 8, samples)
    // splice a tRNS chunk (1 byte) before IDAT
    val idatOff = {
      var o = 8; var found = -1
      while (found < 0 && o + 8 <= png.length) {
        val len = ((png(o) & 0xFF) << 24) | ((png(o + 1) & 0xFF) << 16) |
          ((png(o + 2) & 0xFF) << 8) | (png(o + 3) & 0xFF)
        if (new String(png, o + 4, 4, "US-ASCII") == "IDAT") found = o
        else o += 12 + len
      }
      found
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(png, 0, idatOff)
    val tb = "tRNS".getBytes("US-ASCII")
    val data = Array[Byte](0)
    out.write(0); out.write(0); out.write(0); out.write(1)
    val crc = new CRC32(); crc.update(tb); crc.update(data)
    out.write(tb); out.write(data)
    val c = crc.getValue.toInt
    out.write(c >>> 24); out.write(c >>> 16); out.write(c >>> 8); out.write(c)
    out.write(png, idatOff, png.length - idatOff)
    PngCodec.decode(out.toByteArray) shouldBe None
  }
}
