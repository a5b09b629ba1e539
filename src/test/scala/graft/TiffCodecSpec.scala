package graft

import graft.operators.TiffCodec
import java.io.ByteArrayOutputStream

class TiffCodecSpec extends SparkTestBase {

  /** Hand-build a single-IFD TIFF. Entries are (tag, type, count, value)
    * where value is either inline (fits 4 bytes) or an offset we place
    * manually. `le` toggles II vs MM byte order — the builder writes both
    * orders from the same logic, so each test runs the full matrix.
    */
  private class Builder(le: Boolean) {
    val out = new ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit =
      if (le) { w8(v); w8(v >> 8) } else { w8(v >> 8); w8(v) }
    def w32(v: Long): Unit =
      if (le) { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }
      else { w8((v >> 24).toInt); w8((v >> 16).toInt); w8((v >> 8).toInt); w8(v.toInt) }
    def bytes: Array[Byte] = out.toByteArray
  }

  /** Minimal TIFF: header + IFD + one strip (+ optional colormap). */
  private def buildTiff(le: Boolean, w: Int, h: Int, photometric: Int,
                        bits: Seq[Int], spp: Int, compression: Int,
                        strip: Array[Byte],
                        colorMap: Array[Int] = null,
                        predictor: Int = 1): Array[Byte] = {
    val b = new Builder(le)
    b.w8(if (le) 'I' else 'M'); b.w8(if (le) 'I' else 'M')
    b.w16(42); b.w32(8) // IFD at 8
    val entries = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long, Long)]
    // we lay out: [header 8][IFD][bits array if >2][colormap][strip]
    val nBase = 9 + (if (colorMap != null) 1 else 0) +
      (if (predictor != 1) 1 else 0)
    val ifdSize = 2 + 12 * nBase + 4
    var heap = 8 + ifdSize
    val bitsOff = heap
    val bitsInline = bits.length <= 2
    if (!bitsInline) heap += 2 * bits.length
    val cmOff = heap
    if (colorMap != null) heap += 2 * colorMap.length
    val stripOff = heap
    entries += ((256, 4, 1L, w.toLong))
    entries += ((257, 4, 1L, h.toLong))
    entries += ((258, 3, bits.length.toLong,
      if (bitsInline) {
        if (bits.length == 1) bits(0).toLong
        else if (le) bits(0).toLong | (bits(1).toLong << 16)
        else (bits(0).toLong << 16) | bits(1).toLong
      } else bitsOff.toLong))
    entries += ((259, 3, 1L, compression.toLong))
    entries += ((262, 3, 1L, photometric.toLong))
    entries += ((273, 4, 1L, stripOff.toLong))
    entries += ((277, 3, 1L, spp.toLong))
    entries += ((278, 4, 1L, h.toLong))
    entries += ((279, 4, 1L, strip.length.toLong))
    if (colorMap != null) entries += ((320, 3, colorMap.length.toLong, cmOff.toLong))
    if (predictor != 1) entries += ((317, 3, 1L, predictor.toLong))
    b.w16(entries.length)
    for ((tag, typ, cnt, v) <- entries.sortBy(_._1)) {
      b.w16(tag); b.w16(typ); b.w32(cnt)
      if (typ == 3 && cnt == 1) { b.w16(v.toInt); b.w16(0) } else b.w32(v)
    }
    b.w32(0) // next IFD
    if (!bitsInline) bits.foreach(b.w16)
    if (colorMap != null) colorMap.foreach(b.w16)
    b.out.write(strip)
    b.bytes
  }

  private def px(img: graft.operators.PpmCodec.PpmImage, x: Int, y: Int) = {
    val o = (y * img.width + x) * 3
    ((img.pixels(o) & 0xff), (img.pixels(o + 1) & 0xff), (img.pixels(o + 2) & 0xff))
  }

  test("RGB uncompressed decodes in both byte orders") {
    val strip = Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0,
      0, 0, 255.toByte, 10, 20, 30)
    for (le <- Seq(true, false)) {
      val img = TiffCodec.decode(
        buildTiff(le, 2, 2, 2, Seq(8, 8, 8), 3, 1, strip)).get
      px(img, 0, 0) shouldBe ((255, 0, 0))
      px(img, 1, 0) shouldBe ((0, 255, 0))
      px(img, 0, 1) shouldBe ((0, 0, 255))
      px(img, 1, 1) shouldBe ((10, 20, 30))
    }
  }

  test("gray 8-bit BlackIsZero and WhiteIsZero (inverted)") {
    val strip = Array[Byte](0, 100, 200.toByte, 255.toByte)
    val black = TiffCodec.decode(buildTiff(true, 4, 1, 1, Seq(8), 1, 1, strip)).get
    (0 until 4).map(x => px(black, x, 0)._1) shouldBe Seq(0, 100, 200, 255)
    val white = TiffCodec.decode(buildTiff(true, 4, 1, 0, Seq(8), 1, 1, strip)).get
    (0 until 4).map(x => px(white, x, 0)._1) shouldBe Seq(255, 155, 55, 0)
  }

  test("gray 1-bit and 4-bit scale by bit replication; rows pad to bytes") {
    // 1-bit, width 10 → 2 bytes/row: bits 1010101010 ...
    val strip1 = Array[Byte](0xAA.toByte, 0x80.toByte)
    val img1 = TiffCodec.decode(buildTiff(true, 10, 1, 1, Seq(1), 1, 1, strip1)).get
    (0 until 10).map(x => px(img1, x, 0)._1) shouldBe
      Seq(255, 0, 255, 0, 255, 0, 255, 0, 255, 0)
    // 4-bit: nibbles 0..3 → 0,17,34,51
    val strip4 = Array[Byte](0x01, 0x23)
    val img4 = TiffCodec.decode(buildTiff(true, 4, 1, 1, Seq(4), 1, 1, strip4)).get
    (0 until 4).map(x => px(img4, x, 0)._1) shouldBe Seq(0, 17, 34, 51)
  }

  test("palette decodes through the 16-bit ColorMap high byte") {
    val cm = new Array[Int](3 * 256)
    cm(1) = 0xFF00 // red[1]
    cm(256 + 2) = 0xAB00 // green[2]
    val strip = Array[Byte](1, 2)
    val img = TiffCodec.decode(
      buildTiff(true, 2, 1, 3, Seq(8), 1, 1, strip, colorMap = cm)).get
    px(img, 0, 0) shouldBe ((0xFF, 0, 0))
    px(img, 1, 0) shouldBe ((0, 0xAB, 0))
  }

  test("PackBits: literal + replicate runs + no-op, hand-computed") {
    // target row (8 gray pixels): 1,2,3,3,3,3,3,9
    // encoded: [2] 1 2 3 (literal of 3) … simpler: [1] 1 2 (two literals),
    // [-4] 3 (five replicates), [-128] (noop), [0] 9 (one literal)
    val enc = Array[Byte](1, 1, 2, -4, 3, -128, 0, 9)
    val img = TiffCodec.decode(
      buildTiff(true, 8, 1, 1, Seq(8), 1, 32773, enc)).get
    (0 until 8).map(x => px(img, x, 0)._1) shouldBe Seq(1, 2, 3, 3, 3, 3, 3, 9)
    // PackBits overrun (run past the row budget) rejects
    val bad = Array[Byte](-9, 3) // 10 replicates into an 8-byte row
    TiffCodec.decode(buildTiff(true, 8, 1, 1, Seq(8), 1, 32773, bad)) shouldBe None
  }

  test("multi-strip raster assembles rows in order") {
    // 2 rows, RowsPerStrip=1 → build manually with two strips
    val b = new Builder(true)
    b.w8('I'); b.w8('I'); b.w16(42); b.w32(8)
    val n = 9
    val ifdSize = 2 + 12 * n + 4
    val offsOff = 8 + ifdSize
    val cntsOff = offsOff + 8
    val strip0 = cntsOff + 8
    val strip1 = strip0 + 3
    val entries = Seq(
      (256, 4, 1L, 3L), (257, 4, 1L, 2L), (258, 3, 1L, 8L),
      (259, 3, 1L, 1L), (262, 3, 1L, 1L), (273, 4, 2L, offsOff.toLong),
      (277, 3, 1L, 1L), (278, 4, 1L, 1L), (279, 4, 2L, cntsOff.toLong))
    b.w16(n)
    for ((tag, typ, cnt, v) <- entries) {
      b.w16(tag); b.w16(typ); b.w32(cnt)
      if (typ == 3 && cnt == 1) { b.w16(v.toInt); b.w16(0) } else b.w32(v)
    }
    b.w32(0)
    b.w32(strip0); b.w32(strip1)
    b.w32(3); b.w32(3)
    Seq(10, 20, 30, 40, 50, 60).foreach(b.w8)
    val img = TiffCodec.decode(b.bytes).get
    (0 until 3).map(x => px(img, x, 0)._1) shouldBe Seq(10, 20, 30)
    (0 until 3).map(x => px(img, x, 1)._1) shouldBe Seq(40, 50, 60)
  }

  /** Reference TIFF-LZW encoder for roundtrip pinning: MSB-first bits,
    * Clear 256 / EOI 257, dictionary from 258, and the decoder-tracking
    * EARLY width bump (the width the decoder reads the NEXT code with
    * changes once ITS table reaches 511/1023/2047 entries — the encoder
    * mirrors that by simulating the decoder's entry count, which lags
    * the encoder's own table by exactly one entry).
    */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val bits = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    var width = 9
    var nextDec = 258
    var emitted = 0
    def put(code: Int): Unit = {
      var i = width - 1
      while (i >= 0) { bits += (((code >>> i) & 1) == 1); i -= 1 }
    }
    def emit(code: Int): Unit = {
      put(code); emitted += 1
      if (emitted >= 2) { // the decoder adds an entry per code after its first
        nextDec += 1
        if (nextDec == 511) width = 10
        else if (nextDec == 1023) width = 11
        else if (nextDec == 2047) width = 12
      }
    }
    put(256) // clear
    val dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    var nextEnc = 258
    var cur = data(0) & 0xff
    var i = 1
    while (i < data.length) {
      val b = data(i) & 0xff
      dict.get((cur, b)) match {
        case Some(c) => cur = c
        case None =>
          emit(cur)
          if (nextEnc < 4096) { dict((cur, b)) = nextEnc; nextEnc += 1 }
          cur = b
      }
      i += 1
    }
    emit(cur)
    put(257) // EOI
    val out = new Array[Byte]((bits.length + 7) / 8)
    bits.indices.foreach { j =>
      if (bits(j)) out(j >> 3) = (out(j >> 3) | (0x80 >>> (j & 7))).toByte
    }
    out
  }

  test("LZW: hand-packed KwKwK stream decodes; encoder reproduces it") {
    // gray row [7,7,7,8]: codes 256,7,258,8,257 — 258 arrives BEFORE the
    // decoder has defined it (the KwKwK case: old '7' + its first char).
    // Hand-packed at 9 bits each: 100000000 000000111 100000010
    // 000001000 100000001 → 80 01 E0 40 88 08
    val expect = Array(0x80, 0x01, 0xE0, 0x40, 0x88, 0x08).map(_.toByte)
    val data = Array[Byte](7, 7, 7, 8)
    lzwEncode(data) shouldBe expect
    val img = TiffCodec.decode(buildTiff(true, 4, 1, 1, Seq(8), 1, 5, expect)).get
    (0 until 4).map(x => px(img, x, 0)._1) shouldBe Seq(7, 7, 7, 8)
  }

  test("LZW roundtrips gray and RGB in both byte orders") {
    val rng = new scala.util.Random(7L)
    // repetitive + random mix so the dictionary genuinely builds
    val gray = (Array.fill(300)(42.toByte) ++
      Array.tabulate(200)(i => (i % 7).toByte) ++
      Array.fill(100)(rng.nextInt(256).toByte))
    for (le <- Seq(true, false)) {
      val g = TiffCodec.decode(
        buildTiff(le, 60, 10, 1, Seq(8), 1, 5, lzwEncode(gray))).get
      (0 until 60).map(x => px(g, x, 3)._1) shouldBe
        (0 until 60).map(x => gray(3 * 60 + x) & 0xff)
      val rgb = Array.tabulate(90)(i => ((i * 37) % 256).toByte)
      val c = TiffCodec.decode(
        buildTiff(le, 6, 5, 2, Seq(8, 8, 8), 3, 5, lzwEncode(rgb))).get
      px(c, 2, 1) shouldBe ((rgb(24) & 0xff, rgb(25) & 0xff, rgb(26) & 0xff))
    }
  }

  test("LZW width bump at the 511-entry EARLY boundary (not GIF's 512)") {
    // 300 distinct-pair bytes force >253 dictionary adds, driving the
    // decoder across the 9→10-bit switch; a decoder bumping one code
    // late (GIF timing) desyncs and must NOT reproduce the data
    val data = Array.tabulate(600)(i => ((i * 131 + (i >> 3)) % 256).toByte)
    val img = TiffCodec.decode(
      buildTiff(true, 60, 10, 1, Seq(8), 1, 5, lzwEncode(data))).get
    (0 until 60).map(x => px(img, x, 9)._1) shouldBe
      (0 until 60).map(x => data(9 * 60 + x) & 0xff)
  }

  test("predictor 2 undoes horizontal differencing (plain + LZW, gray + RGB)") {
    // gray 4×2: stored deltas per row
    val orig = Array[Byte](10, 20, 15, 15, 100.toByte, 90, 95, 95)
    val deltas = Array[Byte](10, 10, -5, 0, 100.toByte, -10, 5, 0)
    val plain = TiffCodec.decode(
      buildTiff(true, 4, 2, 1, Seq(8), 1, 1, deltas, predictor = 2)).get
    (0 until 4).map(x => px(plain, x, 0)._1) shouldBe Seq(10, 20, 15, 15)
    (0 until 4).map(x => px(plain, x, 1)._1) shouldBe Seq(100, 90, 95, 95)
    val lzw = TiffCodec.decode(
      buildTiff(false, 4, 2, 1, Seq(8), 1, 5, lzwEncode(deltas), predictor = 2)).get
    (0 until 4).map(x => px(lzw, x, 1)._1) shouldBe Seq(100, 90, 95, 95)
    // RGB: the delta is against the SAME SAMPLE one pixel left (stride 3)
    val rgbDeltas = Array[Byte](10, 20, 30, 5, -4, 1)
    val rgbImg = TiffCodec.decode(
      buildTiff(true, 2, 1, 2, Seq(8, 8, 8), 3, 1, rgbDeltas, predictor = 2)).get
    px(rgbImg, 0, 0) shouldBe ((10, 20, 30))
    px(rgbImg, 1, 0) shouldBe ((15, 16, 31))
    // mod-256 wraparound accumulates exactly
    val wrap = TiffCodec.decode(buildTiff(true, 2, 1, 1, Seq(8), 1, 1,
      Array[Byte](200.toByte, 100), predictor = 2)).get
    px(wrap, 1, 0)._1 shouldBe ((200 + 100) & 0xff)
  }

  test("LZW/predictor strictness: malformed streams and modes reject") {
    // predictor 2 on sub-byte samples is undefined here
    TiffCodec.decode(buildTiff(true, 8, 1, 1, Seq(4), 1, 1,
      Array.fill[Byte](4)(0x11), predictor = 2)) shouldBe None
    // predictor other than 1/2
    TiffCodec.decode(buildTiff(true, 2, 1, 1, Seq(8), 1, 1,
      Array[Byte](1, 2), predictor = 3)) shouldBe None
    val good = lzwEncode(Array[Byte](7, 7, 7, 8))
    // truncated code stream exhausts before the strip fills
    TiffCodec.decode(buildTiff(true, 4, 1, 1, Seq(8), 1, 5,
      good.take(2))) shouldBe None
    // first post-clear code must be a literal: 256,258,… rejects
    // (hand-packed: 100000000 100000010 → 80 40 80)
    val badFirst = Array(0x80, 0x40, 0x80).map(_.toByte)
    TiffCodec.decode(buildTiff(true, 4, 1, 1, Seq(8), 1, 5,
      badFirst)) shouldBe None
    // a code past the defined table (256,7,300 — table holds ≤258) rejects
    val bad = {
      val bits = Seq(256, 7, 300).flatMap(c =>
        (8 to 0 by -1).map(i => ((c >>> i) & 1) == 1))
      val out = new Array[Byte]((bits.length + 7) / 8)
      bits.indices.foreach { j =>
        if (bits(j)) out(j >> 3) = (out(j >> 3) | (0x80 >>> (j & 7))).toByte
      }
      out
    }
    TiffCodec.decode(buildTiff(true, 4, 1, 1, Seq(8), 1, 5, bad)) shouldBe None
  }

  test("structural rejection: bad magic, truncation, unsupported modes") {
    val good = buildTiff(true, 2, 1, 1, Seq(8), 1, 1, Array[Byte](1, 2))
    TiffCodec.decode("XX".getBytes ++ good.drop(2)) shouldBe None
    TiffCodec.decode(good.take(good.length - 1)) shouldBe None
    // planar=2 (separate planes) is out of scope — patch tag 284 in
    TiffCodec.decode(buildTiff(true, 2, 1, 5, Seq(8), 1, 1,
      Array[Byte](1, 2))) shouldBe None // photometric 5 (CMYK-ish)
    TiffCodec.decode(buildTiff(true, 2, 1, 1, Seq(8), 1, 2,
      Array[Byte](1, 2))) shouldBe None // CCITT G3: out of scope
    // strip shorter than the raster
    TiffCodec.decode(buildTiff(true, 4, 2, 1, Seq(8), 1, 1,
      Array[Byte](1, 2))) shouldBe None
  }

  test("dimension-field overflow rejects instead of allocating (review pin)") {
    // width and height both 0xFFFFFFFF: the Long product overflows past
    // the MaxPixels guard unless each dimension is bounded first
    val good = buildTiff(true, 2, 1, 1, Seq(8), 1, 1, Array[Byte](1, 2))
    // IFD entries are sorted by tag; 256 (width) is first, 257 second.
    // entry layout: offset 10 + 12*i, value at +8
    val mut = good.clone()
    def pokeU32(off: Int, v: Long): Unit = {
      mut(off) = (v & 0xff).toByte; mut(off + 1) = ((v >> 8) & 0xff).toByte
      mut(off + 2) = ((v >> 16) & 0xff).toByte
      mut(off + 3) = ((v >> 24) & 0xff).toByte
    }
    pokeU32(10 + 8, 0xFFFFFFFFL)      // width
    pokeU32(10 + 12 + 8, 0xFFFFFFFFL) // height
    TiffCodec.decode(mut) shouldBe None
  }

  test("TIFF fuzz: random, bit-flipped, truncated payloads never throw") {
    val rng = new scala.util.Random(20260815L)
    val seeds = Seq(
      buildTiff(true, 2, 2, 2, Seq(8, 8, 8), 3, 1, Array.fill[Byte](12)(7)),
      buildTiff(false, 8, 1, 1, Seq(8), 1, 32773, Array[Byte](1, 1, 2, -4, 3, -128, 0, 9)),
      buildTiff(true, 4, 2, 1, Seq(8), 1, 5,
        lzwEncode(Array[Byte](10, 10, -5, 0, 100.toByte, -10, 5, 0)),
        predictor = 2))
    val payloads =
      (1 to 200).map(_ => Array.fill(rng.nextInt(200))(rng.nextInt().toByte)) ++
      (1 to 300).map { _ =>
        val b = seeds(rng.nextInt(seeds.length)).clone()
        b(rng.nextInt(b.length)) = rng.nextInt().toByte; b
      } ++
      (1 to 150).map { _ =>
        val s = seeds(rng.nextInt(seeds.length)); s.take(rng.nextInt(s.length))
      }
    payloads.foreach { p =>
      noException should be thrownBy TiffCodec.decode(p)
    }
  }
}
