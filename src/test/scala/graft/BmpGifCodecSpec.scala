package graft

import graft.operators.{BmpCodec, GifCodec}
import java.io.ByteArrayOutputStream

class BmpGifCodecSpec extends SparkTestBase {

  // ---------- BMP builders ----------

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Minimal BITMAPINFOHEADER BMP. `palette` as RGB ints; `pixelData` is
    * the raw (already padded) pixel array section.
    */
  private def buildBmp(w: Int, h: Int, bpp: Int, compression: Int,
                       palette: Array[Int], pixelData: Array[Byte],
                       masks: Array[Int] = null): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    val maskBytes = if (masks != null) 12 else 0
    val palBytes = if (palette != null) palette.length * 4 else 0
    val off = 14 + 40 + maskBytes + palBytes
    o.write('B'); o.write('M')
    o.write(le32(off + pixelData.length)); o.write(le32(0)); o.write(le32(off))
    o.write(le32(40)); o.write(le32(w)); o.write(le32(h))
    o.write(le16(1)); o.write(le16(bpp)); o.write(le32(compression))
    o.write(le32(pixelData.length)); o.write(le32(2835)); o.write(le32(2835))
    o.write(le32(if (palette != null) palette.length else 0)); o.write(le32(0))
    if (masks != null) masks.foreach(m => o.write(le32(m)))
    if (palette != null) palette.foreach { rgb =>
      o.write(rgb & 0xff); o.write((rgb >> 8) & 0xff)
      o.write((rgb >> 16) & 0xff); o.write(0)
    }
    o.write(pixelData)
    o.toByteArray
  }

  private def px(img: graft.operators.PpmCodec.PpmImage, x: Int, y: Int) = {
    val o = (y * img.width + x) * 3
    ((img.pixels(o) & 0xff), (img.pixels(o + 1) & 0xff), (img.pixels(o + 2) & 0xff))
  }

  test("BMP 24-bit bottom-up with row padding decodes to exact pixels") {
    // 2x2: rows are 6 bytes + 2 pad. Bottom-up: file row 0 = image row 1.
    // BGR order in file.
    val data = Array[Byte](
      0, 0, 255.toByte, 255.toByte, 0, 0, 0, 0, // file row 0: red, blue
      0, 255.toByte, 0, 255.toByte, 255.toByte, 255.toByte, 0, 0) // green, white
    val img = BmpCodec.decode(buildBmp(2, 2, 24, 0, null, data)).get
    img.width shouldBe 2; img.height shouldBe 2
    px(img, 0, 0) shouldBe ((0, 255, 0))   // top row = file row 1: green
    px(img, 1, 0) shouldBe ((255, 255, 255))
    px(img, 0, 1) shouldBe ((255, 0, 0))   // bottom row = file row 0: red
    px(img, 1, 1) shouldBe ((0, 0, 255))
  }

  test("BMP top-down (negative height) keeps file row order") {
    // width 1: row = 3 bytes + 1 pad = 4; rows: red, green (BGR in file)
    val d = Array[Byte](0, 0, 255.toByte, 0, 0, 255.toByte, 0, 0)
    val raw = buildBmp(1, 2, 24, 0, null, d)
    // patch height to -2 (top-down)
    val neg = le32(-2); System.arraycopy(neg, 0, raw, 22, 4)
    val img = BmpCodec.decode(raw).get
    px(img, 0, 0) shouldBe ((255, 0, 0)) // first file row stays on top
    px(img, 0, 1) shouldBe ((0, 255, 0))
  }

  test("BMP 8/4/1-bit palette arms expand indices; bad index rejects") {
    val pal = Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    // 8bpp 2x1: indices 2,1 + 2 pad
    val img8 = BmpCodec.decode(buildBmp(2, 1, 8, 0, pal,
      Array[Byte](2, 1, 0, 0))).get
    px(img8, 0, 0) shouldBe ((0, 0, 255)); px(img8, 1, 0) shouldBe ((0, 255, 0))
    // 4bpp 3x1: nibbles 0,3 | 1,- → bytes 0x03, 0x10 + 2 pad
    val img4 = BmpCodec.decode(buildBmp(3, 1, 4, 0, pal,
      Array[Byte](0x03, 0x10, 0, 0))).get
    px(img4, 0, 0) shouldBe ((255, 0, 0))
    px(img4, 1, 0) shouldBe ((255, 255, 255))
    px(img4, 2, 0) shouldBe ((0, 255, 0))
    // 1bpp 8x1: bits 10110000 → byte 0xB0 + 3 pad
    val img1 = BmpCodec.decode(buildBmp(8, 1, 1, 0, pal.take(2),
      Array[Byte](0xB0.toByte, 0, 0, 0))).get
    px(img1, 0, 0) shouldBe ((0, 255, 0)) // bit 1 → palette[1]
    px(img1, 1, 0) shouldBe ((255, 0, 0))
    px(img1, 2, 0) shouldBe ((0, 255, 0))
    // out-of-range index (palette has 2 entries, index 5)
    BmpCodec.decode(buildBmp(2, 1, 8, 0, pal.take(2),
      Array[Byte](5, 0, 0, 0))) shouldBe None
  }

  test("BMP 16-bit 555 default and BI_BITFIELDS 565 masks rescale to 8 bits") {
    // 555: red = 0x7C00, green = 0x03E0, blue = 0x001F
    val d555 = Array[Byte](0x00, 0x7C.toByte, 0xE0.toByte, 0x03) // red, green
    val i555 = BmpCodec.decode(buildBmp(2, 1, 16, 0, null, d555)).get
    px(i555, 0, 0) shouldBe ((255, 0, 0))
    px(i555, 1, 0) shouldBe ((0, 255, 0))
    // 565 via BI_BITFIELDS: red=0xF800, green=0x07E0, blue=0x001F
    val d565 = Array[Byte](0x1F, 0x00, 0xE0.toByte, 0x07) // blue, green
    val i565 = BmpCodec.decode(buildBmp(2, 1, 16, 3, null, d565,
      masks = Array(0xF800, 0x07E0, 0x001F))).get
    px(i565, 0, 0) shouldBe ((0, 0, 255))
    px(i565, 1, 0) shouldBe ((0, 255, 0))
    // mid-range 5-bit value 16 replicates to 10000100 = 132
    val dMid = Array[Byte]((16 << 0).toByte, 0x00, 0, 0) // blue=16 in 555
    val iMid = BmpCodec.decode(buildBmp(1, 1, 16, 0, null, dMid)).get
    px(iMid, 0, 0) shouldBe ((0, 0, 132))
  }

  test("BMP 32-bit BGRX and non-contiguous bitfields mask rejection") {
    val d = Array[Byte](10, 20, 30, 0) // B=10 G=20 R=30
    val img = BmpCodec.decode(buildBmp(1, 1, 32, 0, null, d)).get
    px(img, 0, 0) shouldBe ((30, 20, 10))
    BmpCodec.decode(buildBmp(1, 1, 32, 3, null, d,
      masks = Array(0xF0F0, 0x0F00, 0x000F))) shouldBe None // non-contiguous red
  }

  test("BMP RLE8: encoded runs, absolute mode, EOL, delta, EOB") {
    val pal = Array(0x000000, 0xff0000, 0x00ff00, 0x0000ff)
    // 4x2 canvas; RLE rows are BOTTOM-UP like uncompressed BMP, so RLE
    // y=0 lands on image row 1
    val legal = Array[Byte](
      3, 1,             // RLE (0..2, 0) red
      1, 2,             // RLE (3,0) green
      0, 0,             // end of line
      0, 2, 1, 0,       // delta: x=1 (skipped cell keeps palette 0)
      2, 3,             // RLE (1,1),(2,1) blue
      0, 1)             // end of bitmap
    val img = BmpCodec.decode(buildBmp(4, 2, 8, 1, pal, legal)).get
    // RLE row 0 → image bottom row (y=1)
    px(img, 0, 1) shouldBe ((255, 0, 0))
    px(img, 2, 1) shouldBe ((255, 0, 0))
    px(img, 3, 1) shouldBe ((0, 255, 0))
    // RLE row 1 → image top row (y=0)
    px(img, 0, 0) shouldBe ((0, 0, 0))   // delta-skipped → palette 0
    px(img, 1, 0) shouldBe ((0, 0, 255))
    px(img, 2, 0) shouldBe ((0, 0, 255))
    px(img, 3, 0) shouldBe ((0, 0, 0))
    // absolute mode with word alignment
    val abs = Array[Byte](
      0, 3, 1, 2, 3, 0, // absolute 3: indices 1,2,3 (+ pad to word)
      0, 0,             // EOL
      0, 1)             // EOB (RLE row 1 = image top left at palette 0)
    val img2 = BmpCodec.decode(buildBmp(4, 2, 8, 1, pal, abs)).get
    px(img2, 0, 1) shouldBe ((255, 0, 0))
    px(img2, 1, 1) shouldBe ((0, 255, 0))
    px(img2, 2, 1) shouldBe ((0, 0, 255))
    px(img2, 0, 0) shouldBe ((0, 0, 0))
    // run escaping the raster rejects
    BmpCodec.decode(buildBmp(4, 2, 8, 1, pal,
      Array[Byte](9, 1, 0, 1))) shouldBe None
  }

  test("BMP RLE4 packs two indices per byte in encoded and absolute runs") {
    val pal = Array(0x000000, 0xff0000, 0x00ff00, 0x0000ff)
    val legal = Array[Byte](
      4, 0x12, // RLE row 0 (image y=1): 1,2,1,2
      0, 0,    // EOL
      0, 4, 0x31, 0x13, // absolute 4 on RLE row 1 (image y=0): 3,1,1,3
      0, 1)
    val img = BmpCodec.decode(buildBmp(4, 2, 4, 2, pal, legal)).get
    px(img, 0, 1) shouldBe ((255, 0, 0))
    px(img, 1, 1) shouldBe ((0, 255, 0))
    px(img, 2, 1) shouldBe ((255, 0, 0))
    px(img, 3, 1) shouldBe ((0, 255, 0))
    px(img, 0, 0) shouldBe ((0, 0, 255))
    px(img, 1, 0) shouldBe ((255, 0, 0))
    px(img, 2, 0) shouldBe ((255, 0, 0))
    px(img, 3, 0) shouldBe ((0, 0, 255))
  }

  // ---------- GIF builders ----------

  /** Build a GIF with a 256-entry GCT (so minCodeSize=7 → 8-bit codes are
    * byte-aligned: trivial hand-packing, codes ARE bytes while the
    * dictionary stays under 256 entries).
    */
  private def buildGif(w: Int, h: Int, palette: Array[Int],
                       codes: Array[Int], interlaced: Boolean = false,
                       extensions: Array[Byte] = Array.emptyByteArray,
                       extraFrames: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write("GIF89a".getBytes("US-ASCII"))
    o.write(le16(w)); o.write(le16(h))
    o.write(0x80 | 7) // GCT present, 2^(7+1)=256 entries
    o.write(0); o.write(0)
    for (i <- 0 until 256) {
      val rgb = if (i < palette.length) palette(i) else 0
      o.write((rgb >> 16) & 0xff); o.write((rgb >> 8) & 0xff); o.write(rgb & 0xff)
    }
    o.write(extensions)
    o.write(0x2c) // image descriptor
    o.write(le16(0)); o.write(le16(0)); o.write(le16(w)); o.write(le16(h))
    o.write(if (interlaced) 0x40 else 0x00)
    o.write(7) // LZW min code size
    // codes as bytes, chunked into sub-blocks of <=255
    codes.grouped(255).foreach { g =>
      o.write(g.length); g.foreach(o.write)
    }
    o.write(0) // sub-block terminator
    o.write(extraFrames)
    o.write(0x3b) // trailer
    o.toByteArray
  }

  private val Clear = 128
  private val Eoi = 129

  test("GIF LZW: hand-computed code stream with KwKwK and dict reuse") {
    val pal = Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    // pixels [0,0,0,0]: clear, 0, KwKwK(130), 0, eoi
    val img = GifCodec.decode(buildGif(4, 1, pal,
      Array(Clear, 0, 130, 0, Eoi))).get
    img.width shouldBe 4
    (0 until 4).map(x => px(img, x, 0)) shouldBe Seq.fill(4)((255, 0, 0))
    // pixels [0,1,0,1,0,1]: clear, 0, 1, 130("01"), 130, eoi
    val img2 = GifCodec.decode(buildGif(6, 1, pal,
      Array(Clear, 0, 1, 130, 130, Eoi))).get
    (0 until 6).map(x => px(img2, x, 0)) shouldBe
      Seq((255, 0, 0), (0, 255, 0), (255, 0, 0), (0, 255, 0), (255, 0, 0), (0, 255, 0))
  }

  test("GIF clear codes mid-stream reset the dictionary") {
    val pal = Array(0xff0000, 0x00ff00)
    // (clear, 0) per pixel — a valid always-reset stream
    val codes = (0 until 3).flatMap(_ => Seq(Clear, 1)).toArray :+ Eoi
    val img = GifCodec.decode(buildGif(3, 1, pal, codes)).get
    (0 until 3).map(x => px(img, x, 0)) shouldBe Seq.fill(3)((0, 255, 0))
  }

  test("GIF interlaced rows land on the 4-pass schedule") {
    val pal = Array(0, 0x110000, 0x220000, 0x330000, 0x440000)
    // 1x5 interlaced: storage order = rows 0,4,2,1,3. Store colors so
    // that decoded row r has red byte r*0x11... storage row k carries the
    // color of its DESTINATION row.
    val destOrder = Seq(0, 4, 2, 1, 3)
    val codes = Array(Clear) ++ destOrder.flatMap(d => Seq(d, Clear)) :+ Eoi
    // (symbol, clear) pairs keep every code a root; last clear before Eoi is fine
    val img = GifCodec.decode(buildGif(1, 5, pal, codes,
      interlaced = true)).get
    (0 until 5).map(y => px(img, 0, y)._1) shouldBe Seq(0x00, 0x11, 0x22, 0x33, 0x44)
  }

  test("GIF 89a extensions are skipped; multi-frame streams decode via frames()") {
    val pal = Array(0xff0000, 0x00ff00)
    val gce = Array[Byte](0x21, 0xF9.toByte, 4, 0x01, 0, 0, 1, 0) // GCE w/ transparency
    val comment = Array[Byte](0x21, 0xFE.toByte, 3, 'h', 'i', '!', 0)
    // frame 2: a 1x1 image descriptor with its own pixel (index 1)
    val f2 = {
      val o = new ByteArrayOutputStream()
      o.write(0x2c); o.write(le16(0)); o.write(le16(0))
      o.write(le16(1)); o.write(le16(1)); o.write(0)
      o.write(7); o.write(3); o.write(Clear); o.write(1); o.write(Eoi); o.write(0)
      o.toByteArray
    }
    val bytes = buildGif(1, 1, pal, Array(Clear, 0, Eoi),
      extensions = gce ++ comment, extraFrames = f2)
    val one = GifCodec.decode(bytes).get
    px(one, 0, 0) shouldBe ((255, 0, 0))
    val both = GifCodec.frames(bytes, maxFrames = 8).get
    both.length shouldBe 2
    px(both(1), 0, 0) shouldBe ((0, 255, 0))
  }

  test("GIF structural corruption rejects: bad sig, oob code, truncation") {
    val pal = Array(0xff0000, 0x00ff00)
    val good = buildGif(2, 1, pal, Array(Clear, 0, 1, Eoi))
    GifCodec.decode("GIX89a".getBytes ++ good.drop(6)) shouldBe None
    // code far beyond the dictionary
    GifCodec.decode(buildGif(2, 1, pal, Array(Clear, 0, 200, Eoi))) shouldBe None
    // truncated sub-block chain
    GifCodec.decode(good.take(good.length - 3)) shouldBe None
    // pixel shortfall: EOI before enough pixels
    GifCodec.decode(buildGif(4, 1, pal, Array(Clear, 0, Eoi))) shouldBe None
  }

  test("decodeFeatures marks BMP and GIF payloads decoded=true") {
    import spark.implicits._
    // same 2-px image through both codecs: red then green, 2x1
    val bmp = buildBmp(2, 1, 24, 0, null,
      Array[Byte](0, 0, 255.toByte, 0, 255.toByte, 0, 0, 0))
    val gif = buildGif(2, 1, Array(0xff0000, 0x00ff00),
      Array(Clear, 0, 1, Eoi))
    val payloads = Seq((1L, bmp), (2L, gif)).toDF("doc_id", "text")
    val r = graft.operators.Multimodal.decodeFeatures(spark, payloads)
      .collect().sortBy(_.doc_id)
    r.foreach(_.decoded shouldBe true)
    r.foreach(_.width shouldBe 2)
    // identical pixels → identical features across the two codecs
    r(0).feature.toSeq shouldBe r(1).feature.toSeq
  }

  test("frameSample draws evenly-spaced frames from an animated GIF") {
    import spark.implicits._
    val pal = Array(0xff0000, 0x00ff00, 0x0000ff)
    // 3-frame 1x1 animation: frames colored 0,1,2
    val extra = {
      val o = new ByteArrayOutputStream()
      for (c <- Seq(1, 2)) {
        o.write(0x2c); o.write(le16(0)); o.write(le16(0))
        o.write(le16(1)); o.write(le16(1)); o.write(0)
        o.write(7); o.write(3); o.write(Clear); o.write(c); o.write(Eoi); o.write(0)
      }
      o.toByteArray
    }
    val gif = buildGif(1, 1, pal, Array(Clear, 0, Eoi), extraFrames = extra)
    val payloads = Seq((7L, gif)).toDF("doc_id", "text")
    val frames = graft.operators.Multimodal.frameSample(spark, payloads, 2)
      .collect().sortBy(_.frame_idx)
    frames.length shouldBe 2
    frames(0).frame_idx shouldBe 0
    frames(1).frame_idx shouldBe 1 // floor(1*3/2)
    frames(0).frame_bytes.take(3).map(_ & 0xff).toSeq shouldBe Seq(255, 0, 0)
    frames(1).frame_bytes.take(3).map(_ & 0xff).toSeq shouldBe Seq(0, 255, 0)
  }

  // ---------- ICO ----------

  /** ICO with given entries: (w, h, payload). */
  private def buildIco(entries: Seq[(Int, Int, Array[Byte])]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(le16(0)); o.write(le16(1)); o.write(le16(entries.length))
    var off = 6 + 16 * entries.length
    for ((w, h, payload) <- entries) {
      o.write(if (w >= 256) 0 else w); o.write(if (h >= 256) 0 else h)
      o.write(0); o.write(0)
      o.write(le16(1)); o.write(le16(32))
      o.write(le32(payload.length)); o.write(le32(off))
      off += payload.length
    }
    entries.foreach { case (_, _, p) => o.write(p) }
    o.toByteArray
  }

  /** Headerless DIB for ICO: doubled height, XOR 24-bit rows + AND mask. */
  private def icoDib(w: Int, h: Int, xorRows: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(le32(40)); o.write(le32(w)); o.write(le32(2 * h))
    o.write(le16(1)); o.write(le16(24)); o.write(le32(0))
    o.write(le32(0)); o.write(le32(0)); o.write(le32(0))
    o.write(le32(0)); o.write(le32(0))
    o.write(xorRows)
    val maskStride = ((w + 31) / 32) * 4
    o.write(new Array[Byte](maskStride * h)) // AND mask (ignored)
    o.toByteArray
  }

  test("ICO: headerless DIB entry decodes (doubled height, AND mask ignored)") {
    // 2x1 icon: red, green (bottom-up single row, BGR)
    val xor = Array[Byte](0, 0, 255.toByte, 0, 255.toByte, 0, 0, 0)
    val ico = buildIco(Seq((2, 1, icoDib(2, 1, xor))))
    val img = graft.operators.IcoCodec.decode(ico).get
    img.width shouldBe 2; img.height shouldBe 1
    px(img, 0, 0) shouldBe ((255, 0, 0))
    px(img, 1, 0) shouldBe ((0, 255, 0))
  }

  test("ICO: largest entry wins; PNG entries route through PngCodec") {
    val xorSmall = Array[Byte](0, 0, 255.toByte, 0)
    val small = icoDib(1, 1, xorSmall)
    val xorBig = Array[Byte](
      0, 0, 255.toByte, 0, 255.toByte, 0, 0, 0,
      255.toByte, 0, 0, 255.toByte, 255.toByte, 255.toByte, 0, 0)
    val big = icoDib(2, 2, xorBig)
    val img = graft.operators.IcoCodec.decode(
      buildIco(Seq((1, 1, small), (2, 2, big)))).get
    img.width shouldBe 2; img.height shouldBe 2
    // bottom-up: first XOR row is the bottom
    px(img, 0, 1) shouldBe ((255, 0, 0))
    px(img, 1, 1) shouldBe ((0, 255, 0))
    px(img, 0, 0) shouldBe ((0, 0, 255))
    px(img, 1, 0) shouldBe ((255, 255, 255))
    // PNG-in-ICO (Vista layout): reuse PngCodec's encoder via Multimodal
    val pngBytes = graft.operators.PngCodec.encode(
      graft.operators.PpmCodec.PpmImage(1, 1,
        Array[Byte](7, 8, 9)))
    val img2 = graft.operators.IcoCodec.decode(
      buildIco(Seq((1, 1, pngBytes)))).get
    px(img2, 0, 0) shouldBe ((7, 8, 9))
  }

  test("ICO rejection: cursors, zero entries, out-of-bounds offsets") {
    val xor = Array[Byte](0, 0, 255.toByte, 0)
    val good = buildIco(Seq((1, 1, icoDib(1, 1, xor))))
    val cursor = good.clone(); cursor(2) = 2 // type 2 = cursor
    graft.operators.IcoCodec.decode(cursor) shouldBe None
    val zero = good.clone(); zero(4) = 0
    graft.operators.IcoCodec.decode(zero) shouldBe None
    graft.operators.IcoCodec.decode(good.take(good.length - 9)) shouldBe None
  }

  test("BMP pixel offset >= 2^31 rejects instead of wrapping (review pin)") {
    val good = buildBmp(1, 1, 24, 0, null, Array[Byte](1, 2, 3, 0))
    val mut = good.clone()
    mut(10) = 0; mut(11) = 0; mut(12) = 0; mut(13) = 0x80.toByte // 0x80000000
    BmpCodec.decode(mut) shouldBe None
  }

  test("GIF stream ending without the trailer rejects (review pin)") {
    val pal = Array(0xff0000, 0x00ff00)
    val good = buildGif(2, 1, pal, Array(Clear, 0, 1, Eoi))
    GifCodec.decode(good).isDefined shouldBe true
    // drop ONLY the trailing 0x3B: frame data is complete but the stream
    // is truncated — frames() must say None, not silently accept
    (good.last & 0xff) shouldBe 0x3b
    GifCodec.frames(good.dropRight(1)) shouldBe None
  }

  test("BMP/GIF fuzz: random, bit-flipped, truncated payloads never throw") {
    val rng = new scala.util.Random(20260814L)
    val pal = Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    val validBmp = buildBmp(2, 2, 24, 0, null, Array.fill[Byte](16)(7))
    val validGif = buildGif(4, 1, pal, Array(Clear, 0, 130, 0, Eoi))
    val sources = Seq(validBmp, validGif)
    val payloads =
      (1 to 250).map(_ => Array.fill(rng.nextInt(200))(rng.nextInt().toByte)) ++
      (1 to 200).map { _ =>
        val b = sources(rng.nextInt(2)).clone()
        b(rng.nextInt(b.length)) = rng.nextInt().toByte
        b
      } ++
      (1 to 100).map { _ =>
        val src = sources(rng.nextInt(2))
        src.take(rng.nextInt(src.length))
      } :+ Array.emptyByteArray
    payloads.foreach { p =>
      noException should be thrownBy BmpCodec.decode(p)
      noException should be thrownBy GifCodec.decode(p)
      noException should be thrownBy GifCodec.frames(p)
      noException should be thrownBy graft.operators.IcoCodec.decode(p)
    }
  }
}
