package graft

import graft.operators.{JpegCodec, JpegHier, Multimodal, PpmCodec}
import graft.operators.PpmCodec.PpmImage

class JpegCodecSpec extends SparkTestBase {
  import spark.implicits._

  private def gradient(w: Int, h: Int): PpmImage = {
    // smooth image: flat-quant JPEG round-trips this within small error
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      px(o) = (32 + 2 * x + y).toByte
      px(o + 1) = (64 + x + 2 * y).toByte
      px(o + 2) = (96 + x + y).toByte
    }
    PpmImage(w, h, px)
  }

  private def maxErr(a: PpmImage, b: PpmImage): Int =
    a.pixels.zip(b.pixels).map { case (x, y) => math.abs((x & 0xFF) - (y & 0xFF)) }.max

  test("hand-assembled 8x8 DC-only grayscale JPEG decodes to the exact constant") {
    // Pinned against the PUBLIC T.81 spec, independent of our encoder:
    // flat DQT, Annex-K luma tables, one block with DC diff 16 (=8*(130-128))
    // -> every pixel exactly 130. Entropy bits: DC cat5 '110' + '10000',
    // EOB '1010', padded with 1s = 0xD0 0xAF.
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int) = { out.write(0xFF); out.write(b) }
    def u16(v: Int) = { out.write(v >> 8); out.write(v & 0xFF) }
    m(0xD8)
    m(0xDB); u16(67); out.write(0x00); (0 until 64).foreach(_ => out.write(1))
    m(0xC0); u16(11); out.write(8); u16(8); u16(8); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    // Annex K luma DC: bits 0,1,5,1,1,1,1,1,1 over values 0..11
    m(0xC4); u16(2 + 1 + 16 + 12); out.write(0x00)
    Seq(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    (0 to 11).foreach(out.write)
    // minimal AC table: just the EOB symbol at length 4 code '1010' is not
    // canonical-constructible alone, so use the Annex K prefix: two len-2
    // codes (0x01,0x02), one len-3 (0x03), three len-4 (0x00=EOB,...)
    m(0xC4); u16(2 + 1 + 16 + 6); out.write(0x10)
    Seq(0, 2, 1, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    Seq(0x01, 0x02, 0x03, 0x00, 0x04, 0x11).foreach(out.write)
    m(0xDA); u16(8); out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    out.write(0xD0); out.write(0xAF)
    m(0xD9)
    val img = JpegCodec.decode(out.toByteArray).get
    img.width shouldBe 8
    img.height shouldBe 8
    img.pixels.foreach(p => (p & 0xFF) shouldBe 130)
  }

  test("12-bit SOF1: DC-only block level-shifts at 2048 and keeps the high byte") {
    // hand-assembled per T.81, independent of the encoder: flat DQT=1,
    // Annex-K luma DC table, DC diff 1024 (cat 11 = code '111111110',
    // then 11 magnitude bits '10000000000'), EOB '1010' from the same
    // minimal AC table as the 8-bit DC-only test. Flat IDCT value =
    // 1024/8 = 128 -> +2048 level shift = 2176 -> >>4 = 136.
    // Entropy bytes: FF(stuffed 00) 40 0A.
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int) = { out.write(0xFF); out.write(b) }
    def u16(v: Int) = { out.write(v >> 8); out.write(v & 0xFF) }
    m(0xD8)
    m(0xDB); u16(67); out.write(0x00); (0 until 64).foreach(_ => out.write(1))
    m(0xC1); u16(11); out.write(12); u16(8); u16(8); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    m(0xC4); u16(2 + 1 + 16 + 12); out.write(0x00)
    Seq(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    (0 to 11).foreach(out.write)
    m(0xC4); u16(2 + 1 + 16 + 6); out.write(0x10)
    Seq(0, 2, 1, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    Seq(0x01, 0x02, 0x03, 0x00, 0x04, 0x11).foreach(out.write)
    m(0xDA); u16(8); out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    out.write(0xFF); out.write(0x00); out.write(0x40); out.write(0x0A)
    m(0xD9)
    val img = JpegCodec.decode(out.toByteArray).get
    img.width shouldBe 8
    img.height shouldBe 8
    img.pixels.foreach(p => (p & 0xFF) shouldBe 136)
    // 12-bit is EXTENDED sequential only: the same frame under SOF0 or
    // SOF2 must reject (T.81 makes baseline/progressive 8-bit)
    val b = out.toByteArray
    val sofAt = {
      var i = 2
      while (!((b(i) & 0xFF) == 0xFF && (b(i + 1) & 0xFF) == 0xC1)) i += 1
      i
    }
    for (bad <- Seq(0xC0, 0xC2)) {
      val mut = b.clone(); mut(sofAt + 1) = bad.toByte
      JpegCodec.decode(mut) shouldBe None
    }
    // and SOF1 with ordinary 8-bit precision is legal: same stream with
    // precision byte 8 and DC diff 16 (the 8-bit test's payload) = 130
    val eight = b.clone()
    eight(sofAt + 4) = 8
    // swap entropy bytes back to the 8-bit test's DC cat5 stream
    val scanStart = eight.length - 6 // FF 00 40 0A FF D9
    eight(scanStart) = 0xD0.toByte; eight(scanStart + 1) = 0xAF.toByte
    val eightTrim = eight.take(scanStart + 2) ++ Array(0xFF.toByte, 0xD9.toByte)
    val img8 = JpegCodec.decode(eightTrim).get
    img8.pixels.foreach(p => (p & 0xFF) shouldBe 130)
  }

  test("4:4:4 round-trip with flat quant is near-lossless") {
    val img = gradient(16, 16)
    val dec = JpegCodec.decode(JpegCodec.encode(img)).get
    dec.width shouldBe 16
    dec.height shouldBe 16
    // FDCT->IDCT in doubles is exact; error comes only from YCbCr round
    // trips and coefficient rounding
    maxErr(img, dec) should be <= 3
  }

  test("non-multiple-of-8 dims: padded encode, trimmed decode") {
    val img = gradient(13, 10)
    val dec = JpegCodec.decode(JpegCodec.encode(img)).get
    dec.width shouldBe 13
    dec.height shouldBe 10
    maxErr(img, dec) should be <= 3
  }

  test("4:2:0 subsampled round-trip: constant color exact, smooth bounded") {
    val flat = PpmImage(16, 16, Array.fill(16 * 16 * 3)(0).map { _ => 0.toByte })
    val red = PpmImage(16, 16,
      Array.tabulate(16 * 16 * 3)(i => if (i % 3 == 0) 200.toByte else 40.toByte))
    val decR = JpegCodec.decode(JpegCodec.encode(red, subsample = true)).get
    // constant chroma: subsampling loses nothing; only color-xform rounding
    maxErr(red, decR) should be <= 2
    val img = gradient(24, 16)
    val dec = JpegCodec.decode(JpegCodec.encode(img, subsample = true)).get
    dec.width shouldBe 24
    dec.height shouldBe 16
    // chroma is 2x2-averaged; this gradient varies chroma by <=2 per step
    maxErr(img, dec) should be <= 6
    assert(flat.pixels.length == 768) // fixture sanity
  }

  test("restart markers: interval resets DC prediction and realigns") {
    val img = gradient(32, 8) // 4 MCUs at 4:4:4
    val bytes = JpegCodec.encode(img, restartInterval = 2)
    // the stream must actually contain an RST marker (FFD0)
    val hasRst = bytes.sliding(2).exists(p =>
      (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD0)
    hasRst shouldBe true
    maxErr(img, JpegCodec.decode(bytes).get) should be <= 3
  }

  // ---- progressive (SOF2) ------------------------------------------------
  // The progressive encoder transmits the SAME coefficients as `encode`
  // (same fdct, same flat quant), re-ordered into scans — so progressive
  // decode must equal the baseline decode BIT-FOR-BIT, not approximately.

  private def noise(w: Int, h: Int, seed: Long): PpmImage = {
    val rng = new scala.util.Random(seed)
    PpmImage(w, h, Array.fill(w * h * 3)(rng.nextInt(256).toByte))
  }

  private val scriptSpectral: Seq[(Seq[Int], Int, Int, Int, Int)] = Seq(
    (Seq(0, 1, 2), 0, 0, 0, 0),
    (Seq(0), 1, 63, 0, 0), (Seq(1), 1, 63, 0, 0), (Seq(2), 1, 63, 0, 0))

  // DC at Al=1 + refine; luma AC in two bands with 2-bit then 1-bit
  // successive approximation; chroma AC at Al=1 + refine
  private val scriptSuccessive: Seq[(Seq[Int], Int, Int, Int, Int)] = Seq(
    (Seq(0, 1, 2), 0, 0, 0, 1),
    (Seq(0), 1, 5, 0, 2), (Seq(0), 6, 63, 0, 1),
    (Seq(1), 1, 63, 0, 1), (Seq(2), 1, 63, 0, 1),
    (Seq(0), 1, 5, 2, 1), (Seq(0), 1, 5, 1, 0), (Seq(0), 6, 63, 1, 0),
    (Seq(1), 1, 63, 1, 0), (Seq(2), 1, 63, 1, 0),
    (Seq(0, 1, 2), 0, 0, 1, 0))

  test("progressive spectral-selection decode equals baseline decode bit-for-bit") {
    val img = gradient(24, 17) // non-multiple-of-8 height
    val base = JpegCodec.decode(JpegCodec.encode(img)).get
    val prog = JpegCodec.decode(JpegCodec.encodeProgressive(img, scriptSpectral)).get
    prog.width shouldBe base.width
    prog.height shouldBe base.height
    assert(prog.pixels.sameElements(base.pixels))
  }

  test("progressive successive-approximation decode equals baseline bit-for-bit") {
    for (img <- Seq(gradient(16, 16), noise(19, 13, 20260813L))) {
      val base = JpegCodec.decode(JpegCodec.encode(img)).get
      val prog = JpegCodec.decode(
        JpegCodec.encodeProgressive(img, scriptSuccessive)).get
      assert(prog.pixels.sameElements(base.pixels))
    }
  }

  test("progressive 4:2:0: non-interleaved AC grid smaller than the MCU grid") {
    // 8x8 subsampled: the DC scan is interleaved over the full 16x16 MCU
    // (4 luma blocks), but AC scans cover only ceil(8/8)=1 luma block —
    // the T.81 A.2 non-interleaved raster — so this catches any decoder
    // that walks the MCU grid for single-component scans
    for (img <- Seq(gradient(8, 8), noise(20, 11, 7L))) {
      val base = JpegCodec.decode(JpegCodec.encode(img, subsample = true)).get
      val prog = JpegCodec.decode(JpegCodec.encodeProgressive(img,
        scriptSuccessive, subsample = true)).get
      assert(prog.pixels.sameElements(base.pixels))
    }
  }

  test("progressive EOB runs: constant-color image spans blocks with one EOBn") {
    val red = PpmImage(48, 32,
      Array.tabulate(48 * 32 * 3)(i => if (i % 3 == 0) 200.toByte else 40.toByte))
    val base = JpegCodec.decode(JpegCodec.encode(red)).get
    val bytes = JpegCodec.encodeProgressive(red, scriptSuccessive)
    val prog = JpegCodec.decode(bytes).get
    assert(prog.pixels.sameElements(base.pixels))
    // and the spectral script too (first-scan EOBRUN path, 24 blocks/comp)
    val prog2 = JpegCodec.decode(JpegCodec.encodeProgressive(red, scriptSpectral)).get
    assert(prog2.pixels.sameElements(base.pixels))
  }

  test("progressive corrupt payloads are rejected, never thrown") {
    val good = JpegCodec.encodeProgressive(gradient(16, 16), scriptSuccessive)
    JpegCodec.decode(good) should not be None // sanity
    JpegCodec.decode(good.take(good.length / 3)) shouldBe None // truncated
    JpegCodec.decode(good.dropRight(2)) shouldBe None // EOI missing
    // 400-point corruption fuzz: every outcome is Some or None, no throw
    val rng = new scala.util.Random(42)
    (1 to 400).foreach { _ =>
      val bad = good.clone()
      bad(rng.nextInt(bad.length)) = rng.nextInt(256).toByte
      noException should be thrownBy JpegCodec.decode(bad)
    }
  }

  test("arithmetic (SOF9) decode equals baseline decode bit-for-bit") {
    // same flat quant + DCT coefficients, entropy layer swapped for the
    // T.81 Annex D QM coder — any decode divergence is a real bug
    for (img <- Seq(gradient(24, 17), noise(19, 13, 20260814L))) {
      val base = JpegCodec.decode(JpegCodec.encode(img)).get
      val ar = JpegCodec.decode(JpegCodec.encodeArith(img)).get
      ar.width shouldBe base.width
      ar.height shouldBe base.height
      assert(ar.pixels.sameElements(base.pixels))
    }
  }

  test("arithmetic 4:2:0 and restart markers decode bit-for-bit") {
    val img = gradient(20, 11)
    val base = JpegCodec.decode(JpegCodec.encode(img, subsample = true)).get
    val ar = JpegCodec.decode(
      JpegCodec.encodeArith(img, subsample = true)).get
    assert(ar.pixels.sameElements(base.pixels))
    // restarts flush the coder, reset the statistics AND the DC
    // conditioning contexts; coefficients are unchanged, so the decode
    // still equals the unrestarted baseline decode
    val img2 = noise(32, 24, 5L)
    val b2 = JpegCodec.decode(JpegCodec.encode(img2)).get
    val a2 = JpegCodec.decode(
      JpegCodec.encodeArith(img2, restartInterval = 3)).get
    assert(a2.pixels.sameElements(b2.pixels))
  }

  test("arithmetic non-default DAC conditioning (L, U, Kx) round-trips") {
    val img = noise(16, 16, 99L)
    val base = JpegCodec.decode(JpegCodec.encode(img)).get
    for ((l, u, k) <- Seq((0, 0, 1), (1, 2, 20), (0, 3, 63))) {
      val a = JpegCodec.decode(
        JpegCodec.encodeArith(img, dcL = l, dcU = u, acK = k)).get
      assert(a.pixels.sameElements(base.pixels),
        s"conditioning (L=$l, U=$u, Kx=$k) diverged")
    }
  }

  test("QM coder: random decision streams round-trip bit-exactly") {
    // the raw Annex D coder, below the JPEG statistical models: skewed
    // random decisions across shared adaptive bins plus the fixed bin —
    // estimator states adapt identically on both sides by construction,
    // so every decision must come back exactly
    import graft.operators.JpegArith
    val rng = new scala.util.Random(20260814L)
    val n = 5000
    val ctx = Array.fill(n)(rng.nextInt(9))
    val bits = Array.tabulate(n) { i =>
      if (ctx(i) == 8) rng.nextInt(2) // fixed bin: fair coin
      else if (rng.nextInt(10) < (if (ctx(i) % 2 == 0) 9 else 3)) 0 else 1
    }
    val encSt = new Array[Byte](9); encSt(8) = JpegArith.FixedBin
    val enc = new JpegArith.Encoder
    (0 until n).foreach(i => enc.encode(encSt, ctx(i), bits(i)))
    enc.flushSegment()
    val data = enc.bytes ++ Array(0xFF.toByte, 0xD9.toByte)
    val decSt = new Array[Byte](9); decSt(8) = JpegArith.FixedBin
    val dec = new JpegArith.Decoder(data, 0)
    dec.init()
    (0 until n).foreach { i =>
      dec.decode(decSt, ctx(i)) shouldBe bits(i)
    }
    decSt shouldBe encSt // estimator trajectories identical
  }

  test("Table D.3 estimator invariants hold") {
    import graft.operators.JpegArith
    JpegArith.Qe.length shouldBe 114
    JpegArith.Qe(0) shouldBe 0x5A1D
    // fixed bin: self-looping, non-switching, ~0.5 estimate
    JpegArith.Qe(113) shouldBe 0x5A1D
    JpegArith.Nmps(113) shouldBe 113
    JpegArith.Nlps(113) shouldBe 113
    JpegArith.Sw(113) shouldBe false
    for (i <- 0 to 112) {
      // MPS renorms drift toward MORE skew (smaller Qe), always
      JpegArith.Qe(JpegArith.Nmps(i)) should be <= JpegArith.Qe(i)
      // LPS renorms drift toward LESS skew — except at a chain head,
      // where the MPS sense flips instead (the switch states)
      if (!JpegArith.Sw(i))
        JpegArith.Qe(JpegArith.Nlps(i)) should be >= JpegArith.Qe(i)
    }
    // switch states are exactly the chain heads of Table D.3
    JpegArith.Sw.zipWithIndex.filter(_._1).map(_._2) shouldBe
      Array(0, 14, 36, 64, 80, 88, 95, 105, 110, 112)
  }

  test("progressive-arithmetic (SOF10) decode equals baseline bit-for-bit") {
    // both scripts, 4:4:4 and 4:2:0, gradient and noise — the same
    // coefficients through the G.2 progressive arithmetic models must
    // land exactly where baseline Huffman puts them
    for (img <- Seq(gradient(24, 17), noise(19, 13, 20260815L))) {
      val base = JpegCodec.decode(JpegCodec.encode(img)).get
      for (script <- Seq(scriptSpectral, scriptSuccessive)) {
        val pa = JpegCodec.decode(
          JpegCodec.encodeProgressiveArith(img, script)).get
        assert(pa.pixels.sameElements(base.pixels),
          s"script with ${script.length} scans diverged")
      }
    }
    val img420 = noise(20, 11, 7L)
    val base420 = JpegCodec.decode(JpegCodec.encode(img420, subsample = true)).get
    val pa420 = JpegCodec.decode(JpegCodec.encodeProgressiveArith(
      img420, scriptSuccessive, subsample = true)).get
    assert(pa420.pixels.sameElements(base420.pixels))
  }

  test("SOF10 fuzz: corrupt progressive-arithmetic payloads never throw") {
    val good = JpegCodec.encodeProgressiveArith(gradient(16, 16), scriptSuccessive)
    JpegCodec.decode(good) should not be None
    val rng = new scala.util.Random(77L)
    (1 to 300).foreach { _ =>
      val bad = good.clone()
      bad(rng.nextInt(bad.length)) = rng.nextInt(256).toByte
      noException should be thrownBy JpegCodec.decode(bad)
    }
    (1 to 100).foreach { _ =>
      noException should be thrownBy
        JpegCodec.decode(good.take(rng.nextInt(good.length)))
    }
  }

  test("12-bit SOF9: arithmetic DC-only block, hand-assembled headers") {
    // the 12-bit twin of the SOF1 test on the arithmetic path: gray
    // single block, DC diff 1024 through the F.2.4.1 model (nonzero,
    // positive, category chain to 1024, ten zero magnitude bits), EOB on
    // every AC position. Flat IDCT value 1024/8 = 128 -> +2048 level
    // shift = 2176 -> >>4 = 136, exactly the SOF1 expectation.
    import graft.operators.JpegArith
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int) = { out.write(0xFF); out.write(b) }
    def u16(v: Int) = { out.write(v >> 8); out.write(v & 0xFF) }
    m(0xD8)
    m(0xDB); u16(67); out.write(0x00); (0 until 64).foreach(_ => out.write(1))
    m(0xC9); u16(11); out.write(12); u16(8); u16(8); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    m(0xDA); u16(8); out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    val enc = new JpegArith.Encoder
    val dst = new Array[Byte](64)
    val ast = new Array[Byte](256)
    // DC diff = +1024: S0=1, sign=0, magnitude category per the
    // CONFORMING T.81/jdarith model — first decision AND the X1 decision
    // both code in the SP bin (2), only X2 onward walk the 20.. chain;
    // v-1 = 1023 -> SP(1), SP(1), eight 1s at 20..27, terminator at 28,
    // then nine magnitude bits. This longhand is written independently of
    // JpegCodec's encoder, so it pins the decoder's category model.
    enc.encode(dst, 0, 1) // nonzero
    enc.encode(dst, 1, 0) // positive
    var v = 1023
    var mm = 0
    enc.encode(dst, 2, 1); mm = 1
    var st = 2
    var v2 = v >> 1
    if (v2 != 0) {
      enc.encode(dst, 2, 1); mm = 2 // X1 decision, same SP bin
      st = 20
      v2 >>= 1
      while (v2 != 0) { enc.encode(dst, st, 1); mm <<= 1; st += 1; v2 >>= 1 }
    }
    enc.encode(dst, st, 0)
    st += 14
    var bit = mm >> 1
    while (bit != 0) { enc.encode(dst, st, if ((bit & v) != 0) 1 else 0); bit >>= 1 }
    enc.encode(ast, 0, 1) // EOB at k=1
    enc.flushSegment()
    out.write(enc.bytes)
    m(0xD9)
    val img = JpegCodec.decode(out.toByteArray).get
    img.width shouldBe 8
    img.pixels.foreach(p => (p & 0xFF) shouldBe 136)
  }

  test("12-bit SOF10: progressive-arithmetic DC scan, hand-assembled headers") {
    // T.81 Table B.3 allows 12-bit progressive (round-6 ADVICE): the
    // 12-bit SOF9 pin rebuilt as a SOF10 DC-only first scan (Ss=0, Se=0)
    // — same conforming category longhand, same 136-gray expectation.
    import graft.operators.JpegArith
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int) = { out.write(0xFF); out.write(b) }
    def u16(v: Int) = { out.write(v >> 8); out.write(v & 0xFF) }
    m(0xD8)
    m(0xDB); u16(67); out.write(0x00); (0 until 64).foreach(_ => out.write(1))
    m(0xCA); u16(11); out.write(12); u16(8); u16(8); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    m(0xDA); u16(8); out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(0); out.write(0) // Ss=0 Se=0 AhAl=0: DC first
    val enc = new JpegArith.Encoder
    val dst = new Array[Byte](64)
    enc.encode(dst, 0, 1) // nonzero
    enc.encode(dst, 1, 0) // positive
    var v = 1023          // DC diff +1024
    var mm = 0
    enc.encode(dst, 2, 1); mm = 1
    var st = 2
    var v2 = v >> 1
    if (v2 != 0) {
      enc.encode(dst, 2, 1); mm = 2 // X1 decision, same SP bin
      st = 20
      v2 >>= 1
      while (v2 != 0) { enc.encode(dst, st, 1); mm <<= 1; st += 1; v2 >>= 1 }
    }
    enc.encode(dst, st, 0)
    st += 14
    var bit = mm >> 1
    while (bit != 0) { enc.encode(dst, st, if ((bit & v) != 0) 1 else 0); bit >>= 1 }
    enc.flushSegment()
    out.write(enc.bytes)
    m(0xD9)
    val img = JpegCodec.decode(out.toByteArray).get
    img.width shouldBe 8
    img.pixels.foreach(p => (p & 0xFF) shouldBe 136)
  }

  test("SOF9 AC interop pin: hand-coded |coef|=48 through the conforming X1 model") {
    // the exact case the old magnitude model silently mis-decoded: an AC
    // coefficient with |coef| >= 2 must run the X1 decision in the SE+2
    // bin and only X2+ in the 189.. chain (T.81 Table F.5 / jcarith F.8).
    // Stream written longhand, independent of JpegCodec's encoder:
    // gray 8x8, q=1, DC diff 0, AC at k=1 is +48, EOB at k=2. IDCT of a
    // single (0,1)/(1,0) coefficient of 48 gives 8 column (or row) values
    // 128 + 8.4853*cos((2x+1)*pi/16) -> the multiset below (transpose-
    // invariant, so the zigzag orientation doesn't matter).
    import graft.operators.JpegArith
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int) = { out.write(0xFF); out.write(b) }
    def u16(v: Int) = { out.write(v >> 8); out.write(v & 0xFF) }
    m(0xD8)
    m(0xDB); u16(67); out.write(0x00); (0 until 64).foreach(_ => out.write(1))
    m(0xC9); u16(11); out.write(8); u16(8); u16(8); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    m(0xDA); u16(8); out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    val enc = new JpegArith.Encoder
    val dst = new Array[Byte](64)
    val ast = new Array[Byte](256)
    val fixedBin = Array(JpegArith.FixedBin)
    enc.encode(dst, 0, 0)      // DC diff = 0
    enc.encode(ast, 0, 0)      // k=1: not EOB
    enc.encode(ast, 1, 1)      // k=1 is nonzero
    enc.encode(fixedBin, 0, 0) // positive
    // v = 47 (coef 48): conforming category — SE+2 twice, then 189..192,
    // terminator at 193, five magnitude bits at 207
    val v = 47
    var mm = 0
    enc.encode(ast, 2, 1); mm = 1
    var st = 2
    var v2 = v >> 1
    if (v2 != 0) {
      enc.encode(ast, 2, 1); mm = 2 // X1 decision, same SE+2 bin
      st = 189                      // k=1 <= default Kx=5
      v2 >>= 1
      while (v2 != 0) { enc.encode(ast, st, 1); mm <<= 1; st += 1; v2 >>= 1 }
    }
    enc.encode(ast, st, 0)
    st += 14
    var bit = mm >> 1
    while (bit != 0) { enc.encode(ast, st, if ((bit & v) != 0) 1 else 0); bit >>= 1 }
    enc.encode(ast, 3, 1) // k=2: EOB
    enc.flushSegment()
    out.write(enc.bytes)
    m(0xD9)
    val img = JpegCodec.decode(out.toByteArray).get
    img.width shouldBe 8
    // gray: R=G=B per pixel; collect one channel's value multiset
    val vals = img.pixels.grouped(3).map(_(0) & 0xFF).toSeq
    vals.size shouldBe 64
    val expected = Seq(136, 135, 133, 130, 126, 123, 121, 120)
      .flatMap(x => Seq.fill(8)(x)).sorted
    vals.sorted shouldBe expected
  }

  test("arithmetic corrupt payloads never throw; structural damage rejects") {
    val good = JpegCodec.encodeArith(gradient(16, 16))
    JpegCodec.decode(good) should not be None // sanity
    // structural: truncated header, lying dims
    JpegCodec.decode(good.take(20)) shouldBe None
    val sof = good.indices.find(i =>
      (good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xC9).get
    val lying = good.clone()
    (5 to 8).foreach(o => lying(sof + o) = 0xFF.toByte)
    JpegCodec.decode(lying) shouldBe None
    // progressive-arithmetic (SOF10) stays out of scope
    val sof10 = good.clone(); sof10(sof + 1) = 0xCA.toByte
    JpegCodec.decode(sof10) shouldBe None
    // entropy-bit corruption: arithmetic coding has no Huffman-style
    // invalid-code redundancy and end-of-data is the zero-feed regime by
    // spec, so a flipped bit may decode to a DIFFERENT image — the
    // contract here is no-throw plus the runaway-category guard
    val rng = new scala.util.Random(31L)
    (1 to 400).foreach { _ =>
      val bad = good.clone()
      bad(rng.nextInt(bad.length)) = rng.nextInt(256).toByte
      noException should be thrownBy JpegCodec.decode(bad)
    }
    (1 to 100).foreach { _ =>
      noException should be thrownBy
        JpegCodec.decode(good.take(rng.nextInt(good.length)))
    }
  }

  test("out-of-scope and corrupt payloads are rejected, never thrown") {
    JpegCodec.decode(Array[Byte]()) shouldBe None
    JpegCodec.decode("not a jpeg".getBytes) shouldBe None
    val good = JpegCodec.encode(gradient(8, 8))
    JpegCodec.decode(good.take(good.length / 2)) shouldBe None // truncated
    // flip SOF0 -> SOF2 (progressive): politely refused
    val prog = good.clone()
    val sof = prog.indices.find(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    JpegCodec.decode(prog) shouldBe None
    // a lying SOF0 dimension field (65535 x 65535 from a tiny payload)
    // must hit the pixel-count cap, not allocate or overflow
    val lying = good.clone()
    (5 to 8).foreach(o => lying(sof + o) = 0xFF.toByte) // height, width
    JpegCodec.decode(lying) shouldBe None
  }

  test("hand-assembled 2x2 lossless (SOF3) stream decodes to the exact samples") {
    // Pinned against the PUBLIC T.81 Annex H spec, independent of our
    // encoder: one DC table with all 17 categories at a flat 5 bits
    // (canonical: symbol i = code i), predictor 1, P=8, Pt=0. Samples
    // [[100,105],[98,103]]: s00 predicts from 2^7=128 (diff -28: cat 5,
    // bits -28+31=3), s01 from Ra=100 (diff 5: cat 3, bits 101), s10
    // from Rb=100 (diff -2: cat 2, bits -2+3=1), s11 from Ra=98 (diff 5).
    // Bits 00101'00011 00011'101 00010'01 00011'101 + 1-pad =
    // 28 C7 44 8E FF(stuffed 00).
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int) = { out.write(0xFF); out.write(b) }
    def u16(v: Int) = { out.write(v >> 8); out.write(v & 0xFF) }
    m(0xD8)
    m(0xC4); u16(2 + 1 + 16 + 17); out.write(0x00)
    Seq(0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    (0 to 16).foreach(out.write)
    m(0xC3); u16(11); out.write(8); u16(2); u16(2); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    m(0xDA); u16(8); out.write(1); out.write(1); out.write(0x00)
    out.write(1); out.write(0); out.write(0) // Ss=predictor 1, Se=0, Pt=0
    Seq(0x28, 0xC7, 0x44, 0x8E, 0xFF, 0x00).foreach(out.write)
    m(0xD9)
    val img = JpegCodec.decode(out.toByteArray).get
    img.width shouldBe 2
    img.height shouldBe 2
    img.pixels.grouped(3).map(_(0) & 0xFF).toSeq shouldBe Seq(100, 105, 98, 103)
    // gray replicates across RGB
    img.pixels.grouped(3).foreach(p => (p(1) & 0xFF) shouldBe (p(0) & 0xFF))
  }

  test("hand-assembled 2x2 lossless-ARITHMETIC (SOF11) stream decodes exactly") {
    // Pinned against T.81 Annex H.2 independent of encodeLosslessArith:
    // the decision sequence below is written longhand from the spec's
    // model (the DC difference decision tree of F.2.4.1 under the
    // 25-context (Da, Db) conditioning; default L=0, U=1 so any nonzero
    // magnitude >1 classifies LARGE) and driven through the separately
    // spec-pinned QM encoder (JpegArith). Gray 2x2 = [[200,200],[200,200]],
    // predictor 1, P=8, Pt=0: s00 predicts 128 (diff +72), every other
    // sample predicts 200 (diff 0) — but each zero decision lands in a
    // DIFFERENT context bin (Da/Db classes of the +72 = large+ = 3):
    // s01 at (Qa=3, Qb=0) -> bin 60, s10 at (Qa=0, Qb=3) -> bin 12,
    // s11 at (Qa=0, Qb=0) -> bin 0. A decoder with wrong context wiring
    // adapts differently at s11 (bin 0 was touched by s00) and decodes
    // garbage.
    import graft.operators.JpegArith
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int) = { out.write(0xFF); out.write(b) }
    def u16(v: Int) = { out.write(v >> 8); out.write(v & 0xFF) }
    m(0xD8)
    m(0xCB); u16(11); out.write(8); u16(2); u16(2); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    m(0xDA); u16(8); out.write(1); out.write(1); out.write(0x00)
    out.write(1); out.write(0); out.write(0) // predictor 1, Se=0, Pt=0
    val enc = new JpegArith.Encoder
    val st = new Array[Byte](164)
    // s00: diff = 200 - 128 = +72, context (0,0) -> bin 0
    enc.encode(st, 0, 1) // nonzero
    enc.encode(st, 1, 0) // positive (SS at bin 1)
    // v = 71: SP(bin 2) says v-1>0, X1 in the SAME bin says >=2, then
    // the small-Db chain at 100.. walks to the top bit of 71 (64):
    // 2->4->8->16->32->64 = five 1s at 100..104, terminator at 105
    enc.encode(st, 2, 1)
    enc.encode(st, 2, 1)
    enc.encode(st, 100, 1); enc.encode(st, 101, 1); enc.encode(st, 102, 1)
    enc.encode(st, 103, 1); enc.encode(st, 104, 1)
    enc.encode(st, 105, 0)
    // mantissa of 71 - 64 = 7 under mm=64, one shared bin at 105+15=120:
    // bits 32,16,8,4,2,1 -> 0,0,0,1,1,1
    enc.encode(st, 120, 0); enc.encode(st, 120, 0); enc.encode(st, 120, 0)
    enc.encode(st, 120, 1); enc.encode(st, 120, 1); enc.encode(st, 120, 1)
    // s01: diff 0 at (Qa=3 large+, Qb=0) -> bin 4*(5*3+0) = 60
    enc.encode(st, 60, 0)
    // s10: diff 0 at (Qa=0 [x=0], Qb=3) -> bin 4*(5*0+3) = 12
    enc.encode(st, 12, 0)
    // s11: diff 0 at (Qa=0 [s10 zero], Qb=0 [s01 zero]) -> bin 0
    enc.encode(st, 0, 0)
    enc.flushSegment()
    out.write(enc.bytes)
    m(0xD9)
    val img = JpegCodec.decode(out.toByteArray).get
    img.width shouldBe 2
    img.height shouldBe 2
    img.pixels.foreach(p => (p & 0xFF) shouldBe 200)
  }

  test("hand-assembled 1x3 SOF11 stream exercises BOTH magnitude-chain sets") {
    // Gray 1x3 = [200, 100, 160], predictor 1, defaults L=0/U=1. s0
    // (diff +72) classifies large+, so s1's magnitude codes in the
    // SECOND chain set (Db large -> 132..); s1 (diff -100) classifies
    // large-, so s2's magnitude ALSO uses set B. A decoder that ignores
    // the Db-large set selection shares adaptation with set A and
    // diverges immediately.
    import graft.operators.JpegArith
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int) = { out.write(0xFF); out.write(b) }
    def u16(v: Int) = { out.write(v >> 8); out.write(v & 0xFF) }
    m(0xD8)
    m(0xCB); u16(11); out.write(8); u16(3); u16(1); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    m(0xDA); u16(8); out.write(1); out.write(1); out.write(0x00)
    out.write(1); out.write(0); out.write(0)
    val enc = new JpegArith.Encoder
    val st = new Array[Byte](164)
    // s0: pred 128, diff +72 at context (0,0): as in the 2x2 pin
    enc.encode(st, 0, 1); enc.encode(st, 1, 0)
    enc.encode(st, 2, 1); enc.encode(st, 2, 1)
    enc.encode(st, 100, 1); enc.encode(st, 101, 1); enc.encode(st, 102, 1)
    enc.encode(st, 103, 1); enc.encode(st, 104, 1); enc.encode(st, 105, 0)
    enc.encode(st, 120, 0); enc.encode(st, 120, 0); enc.encode(st, 120, 0)
    enc.encode(st, 120, 1); enc.encode(st, 120, 1); enc.encode(st, 120, 1)
    // s1: x=0,y=1 predicts from Rb=200; diff = 100-200 = -100.
    // Context (Qa=0 [x=0], Qb=3 [s0 large+]) -> bins 12..15; sign=1 so
    // SP/SN bin is 12+2+1 = 15; v = 99, X1 in bin 15, then chain SET B:
    // top bit of 99 is 64 -> 2->4->8->16->32->64 = five 1s at 132..136,
    // terminator 137; mantissa 99-64 = 35 at 137+15=152: bits
    // 32,16,8,4,2,1 -> 1,0,0,0,1,1
    enc.encode(st, 12, 1)
    enc.encode(st, 13, 1) // negative
    enc.encode(st, 15, 1)
    enc.encode(st, 15, 1)
    enc.encode(st, 132, 1); enc.encode(st, 133, 1); enc.encode(st, 134, 1)
    enc.encode(st, 135, 1); enc.encode(st, 136, 1); enc.encode(st, 137, 0)
    enc.encode(st, 152, 1); enc.encode(st, 152, 0); enc.encode(st, 152, 0)
    enc.encode(st, 152, 0); enc.encode(st, 152, 1); enc.encode(st, 152, 1)
    // s2: predicts from Rb=100; diff = 160-100 = +60. Context
    // (Qa=0 [x=0], Qb=4 [s1 large-]) -> bins 16..19; SP bin 16+2 = 18;
    // v = 59, X1 at 18, chain set B (Qb large): top bit 32 ->
    // 2->4->8->16->32 = four 1s at 132..135, terminator 136; mantissa
    // 59-32 = 27 at 136+15=151: bits 16,8,4,2,1 -> 1,1,0,1,1
    enc.encode(st, 16, 1)
    enc.encode(st, 17, 0) // positive
    enc.encode(st, 18, 1)
    enc.encode(st, 18, 1)
    enc.encode(st, 132, 1); enc.encode(st, 133, 1); enc.encode(st, 134, 1)
    enc.encode(st, 135, 1); enc.encode(st, 136, 0)
    enc.encode(st, 151, 1); enc.encode(st, 151, 1); enc.encode(st, 151, 0)
    enc.encode(st, 151, 1); enc.encode(st, 151, 1)
    enc.flushSegment()
    out.write(enc.bytes)
    m(0xD9)
    val img = JpegCodec.decode(out.toByteArray).get
    img.width shouldBe 1
    img.height shouldBe 3
    img.pixels.grouped(3).map(_(0) & 0xFF).toSeq shouldBe Seq(200, 100, 160)
  }

  test("SOF11 round-trips BIT-EXACT across all 7 predictors, gray and RGB") {
    for (img <- Seq(gradient(13, 10), noise(16, 9, 20260815L));
         pred <- 1 to 7) {
      val rgb = JpegCodec.decode(JpegCodec.encodeLosslessArith(img,
        gray = false, predictor = pred)).get
      rgb.width shouldBe img.width
      rgb.height shouldBe img.height
      rgb.pixels shouldBe img.pixels
      val g = JpegCodec.decode(JpegCodec.encodeLosslessArith(img,
        gray = true, predictor = pred)).get
      g.pixels.grouped(3).zip(img.pixels.grouped(3)).foreach {
        case (got, want) =>
          (got(0) & 0xFF) shouldBe (want(0) & 0xFF)
          got(1) shouldBe got(0)
          got(2) shouldBe got(0)
      }
    }
  }

  test("SOF11 round-trips at 12/16-bit precision, point transform, restarts, non-default conditioning") {
    val img = noise(11, 7, 20260816L)
    for ((prec, pt) <- Seq((12, 0), (16, 0), (12, 2), (16, 4))) {
      val got = JpegCodec.decode(JpegCodec.encodeLosslessArith(img,
        gray = true, predictor = 4, precision = prec, pt = pt)).get
      // the >8-bit convention keeps the high byte; Pt zeros restore <<Pt
      got.pixels.grouped(3).zip(img.pixels.grouped(3)).foreach {
        case (g, w) =>
          (g(0) & 0xFF) shouldBe ((((w(0) & 0xFF) << (prec - 8)) >> pt << pt) >> (prec - 8))
      }
    }
    // restart markers reset coder, stats, prediction, and conditioning
    val rst = JpegCodec.decode(JpegCodec.encodeLosslessArith(
      gradient(9, 6), gray = false, predictor = 7, restartInterval = 5)).get
    rst.pixels shouldBe gradient(9, 6).pixels
    // non-default (L, U) changes the conditioning classification on both
    // sides symmetrically
    for ((l, u) <- Seq((1, 2), (2, 4), (0, 3))) {
      val got = JpegCodec.decode(JpegCodec.encodeLosslessArith(
        noise(10, 5, 7L), gray = false, predictor = 2, dcL = l, dcU = u)).get
      got.pixels shouldBe noise(10, 5, 7L).pixels
    }
  }

  test("SOF11 corrupt payloads never throw") {
    val good = JpegCodec.encodeLosslessArith(gradient(12, 8), predictor = 4)
    JpegCodec.decode(good) should not be None
    val rng = new scala.util.Random(54L)
    (1 to 300).foreach { _ =>
      val bad = good.clone()
      bad(rng.nextInt(bad.length)) = rng.nextInt(256).toByte
      noException should be thrownBy JpegCodec.decode(bad)
    }
    (1 to 100).foreach { _ =>
      noException should be thrownBy
        JpegCodec.decode(good.take(rng.nextInt(good.length)))
    }
  }

  test("lossless (SOF3) round-trips BIT-EXACT across all 7 predictors, gray and RGB") {
    for (img <- Seq(gradient(13, 10), noise(16, 9, 20260814L));
         pred <- 1 to 7) {
      val rgb = JpegCodec.decode(JpegCodec.encodeLossless(img, gray = false,
        predictor = pred)).get
      rgb.width shouldBe img.width
      rgb.height shouldBe img.height
      rgb.pixels shouldBe img.pixels // lossless: EXACT, not near-lossless
      val g = JpegCodec.decode(JpegCodec.encodeLossless(img, gray = true,
        predictor = pred)).get
      // gray path keeps channel 0 and replicates
      g.pixels.grouped(3).zip(img.pixels.grouped(3)).foreach {
        case (got, want) =>
          (got(0) & 0xFF) shouldBe (want(0) & 0xFF)
          got(1) shouldBe got(0)
          got(2) shouldBe got(0)
      }
    }
  }

  test("lossless 12/16-bit precision and point transform restore the expected bytes") {
    val img = noise(11, 7, 99L)
    // >8-bit: encoder upshifts, decoder keeps the high byte -> exact
    for (p <- Seq(12, 16)) {
      val dec = JpegCodec.decode(JpegCodec.encodeLossless(img,
        precision = p, predictor = 4)).get
      dec.pixels shouldBe img.pixels
    }
    // point transform Pt=1 drops exactly the low bit
    val pt1 = JpegCodec.decode(JpegCodec.encodeLossless(img, pt = 1,
      predictor = 7)).get
    pt1.pixels.zip(img.pixels).foreach { case (got, want) =>
      (got & 0xFF) shouldBe (want & 0xFE)
    }
  }

  test("lossless restart markers reset prediction and still round-trip exactly") {
    val img = noise(10, 10, 7L)
    for (ri <- Seq(1, 7, 64)) {
      val enc = JpegCodec.encodeLossless(img, predictor = 5,
        restartInterval = ri)
      JpegCodec.decode(enc).get.pixels shouldBe img.pixels
    }
    // a missing RST marker (stream spliced past it) must reject, not wrap
    val enc = JpegCodec.encodeLossless(img, predictor = 1, restartInterval = 7)
    val rstAt = enc.indices.find(i => (enc(i) & 0xFF) == 0xFF &&
      (enc(i + 1) & 0xFF) >= 0xD0 && (enc(i + 1) & 0xFF) <= 0xD7).get
    val spliced = enc.take(rstAt) ++ enc.drop(rstAt + 2)
    JpegCodec.decode(spliced) shouldBe None
  }

  test("lossless corrupt payloads never throw; invalid scan params reject") {
    val good = JpegCodec.encodeLossless(gradient(12, 8), predictor = 4)
    JpegCodec.decode(good) should not be None // sanity
    val sos = good.indices.find(i => (good(i) & 0xFF) == 0xFF &&
      (good(i + 1) & 0xFF) == 0xDA).get
    // Ss outside 1..7 / nonzero Se / nonzero Ah: all invalid for lossless
    for ((off, v) <- Seq((7, 0), (7, 8), (8, 63), (9, 0x10))) {
      val bad = good.clone()
      bad(sos + off) = v.toByte
      JpegCodec.decode(bad) shouldBe None
    }
    // (round 7: SOF11 is in scope — its own tests below; a SOF3 stream
    // relabeled 0xCB feeds Huffman bits to the QM coder, which must not
    // throw — covered by the fuzz loop)
    val rng = new scala.util.Random(53L)
    (1 to 300).foreach { _ =>
      val bad = good.clone()
      bad(rng.nextInt(bad.length)) = rng.nextInt(256).toByte
      noException should be thrownBy JpegCodec.decode(bad)
    }
    (1 to 100).foreach { _ =>
      noException should be thrownBy
        JpegCodec.decode(good.take(rng.nextInt(good.length)))
    }
  }

  test("hierarchical (DHP) lossless pyramid round-trips BIT-EXACT at 1-3 levels") {
    for (img <- Seq(gradient(16, 16), noise(24, 8, 20260815L));
         levels <- 1 to 3; gray <- Seq(false, true)) {
      val enc = JpegHier.encodeHierarchical(img, gray = gray, levels = levels)
      val dec = JpegCodec.decode(enc).get
      dec.width shouldBe img.width
      dec.height shouldBe img.height
      if (!gray) dec.pixels shouldBe img.pixels
      else dec.pixels.grouped(3).zip(img.pixels.grouped(3)).foreach {
        case (got, want) =>
          (got(0) & 0xFF) shouldBe (want(0) & 0xFF)
          got(1) shouldBe got(0); got(2) shouldBe got(0)
      }
    }
  }

  test("hierarchical DCT pyramid reconstructs within the flat-quant bound") {
    for (img <- Seq(gradient(16, 16), gradient(32, 16))) {
      val enc = JpegHier.encodeHierarchical(img, levels = 2, dct = true)
      val dec = JpegCodec.decode(enc).get
      dec.width shouldBe img.width
      dec.height shouldBe img.height
      // base frame q=1 DCT error + one EXP-interpolated differential
      // refinement at q=2: each stage contributes ~±2 rounding
      maxErr(img, dec) should be <= 6
    }
  }

  test("hierarchical ARITHMETIC lossless pyramid (SOF11 + SOF15) round-trips BIT-EXACT") {
    for (img <- Seq(gradient(16, 16), noise(24, 8, 20260817L));
         levels <- 1 to 3; gray <- Seq(false, true)) {
      val enc = JpegHier.encodeHierarchical(img, gray = gray,
        levels = levels, arithmetic = true)
      val dec = JpegCodec.decode(enc).get
      dec.width shouldBe img.width
      dec.height shouldBe img.height
      if (!gray) dec.pixels shouldBe img.pixels
      else dec.pixels.grouped(3).zip(img.pixels.grouped(3)).foreach {
        case (got, want) =>
          (got(0) & 0xFF) shouldBe (want(0) & 0xFF)
          got(1) shouldBe got(0); got(2) shouldBe got(0)
      }
    }
  }

  test("hierarchical ARITHMETIC DCT pyramid (SOF9 + SOF13) reconstructs within the bound") {
    for (img <- Seq(gradient(16, 16), gradient(32, 16))) {
      val enc = JpegHier.encodeHierarchical(img, levels = 2, dct = true,
        arithmetic = true)
      val dec = JpegCodec.decode(enc).get
      dec.width shouldBe img.width
      dec.height shouldBe img.height
      // the arithmetic arm codes the SAME quantized coefficients as the
      // Huffman pyramid — identical reconstruction bound
      maxErr(img, dec) should be <= 6
    }
  }

  test("hierarchical arithmetic streams equal the Huffman pyramid's pixels exactly") {
    // entropy coding must not change WHAT is coded: the lossless pyramids
    // decode to identical pixels, and the DCT pyramids (same quantized
    // coefficients through either entropy layer) decode identically too
    val img = gradient(16, 16)
    val h = JpegCodec.decode(JpegHier.encodeHierarchical(img, levels = 2)).get
    val a = JpegCodec.decode(JpegHier.encodeHierarchical(img, levels = 2,
      arithmetic = true)).get
    a.pixels shouldBe h.pixels
    val hd = JpegCodec.decode(JpegHier.encodeHierarchical(img, levels = 2,
      dct = true)).get
    val ad = JpegCodec.decode(JpegHier.encodeHierarchical(img, levels = 2,
      dct = true, arithmetic = true)).get
    ad.pixels shouldBe hd.pixels
  }

  test("hierarchical arithmetic corrupt payloads never throw") {
    val good = JpegHier.encodeHierarchical(gradient(16, 16), levels = 2,
      arithmetic = true)
    JpegCodec.decode(good) should not be None
    val rng = new scala.util.Random(55L)
    (1 to 300).foreach { _ =>
      val bad = good.clone()
      bad(rng.nextInt(bad.length)) = rng.nextInt(256).toByte
      noException should be thrownBy JpegCodec.decode(bad)
    }
    (1 to 100).foreach { _ =>
      noException should be thrownBy
        JpegCodec.decode(good.take(rng.nextInt(good.length)))
    }
  }

  test("hierarchical structural violations reject; corrupt payloads never throw") {
    val good = JpegHier.encodeHierarchical(gradient(16, 16), levels = 2)
    JpegCodec.decode(good) should not be None // sanity
    def findMarker(b: Array[Byte], mk: Int, from: Int = 2): Int =
      b.indices.drop(from).find(i => (b(i) & 0xFF) == 0xFF &&
        i + 1 < b.length && (b(i + 1) & 0xFF) == mk).get
    // a second NON-differential frame where the refinement should be
    val c7 = findMarker(good, 0xC7)
    val bad1 = good.clone(); bad1(c7 + 1) = 0xC3.toByte
    JpegCodec.decode(bad1) shouldBe None
    // differential lossless must use predictor selector 0: patch Ss
    val sos2 = findMarker(good, 0xDA, c7)
    val bad2 = good.clone()
    bad2(sos2 + 2 + 4 + 2 * 3) = 1 // Ss byte of the second SOS
    JpegCodec.decode(bad2) shouldBe None
    // differential SOFs outside a hierarchical sequence reject
    val plain = JpegCodec.encode(gradient(8, 8))
    val sof0 = findMarker(plain, 0xC0)
    for (diffMarker <- Seq(0xC5, 0xC7)) {
      val mut = plain.clone(); mut(sof0 + 1) = diffMarker.toByte
      JpegCodec.decode(mut) shouldBe None
    }
    // fuzz: flipped bytes and truncations never throw
    val rng = new scala.util.Random(67L)
    (1 to 300).foreach { _ =>
      val bad = good.clone()
      bad(rng.nextInt(bad.length)) = rng.nextInt(256).toByte
      noException should be thrownBy JpegCodec.decode(bad)
    }
    (1 to 100).foreach { _ =>
      noException should be thrownBy
        JpegCodec.decode(good.take(rng.nextInt(good.length)))
    }
  }

  test("decodeFeatures marks JPEG payloads decoded=true with real dimensions") {
    val jpeg = JpegCodec.encode(gradient(16, 8))
    val ppmEq = PpmCodec.encode(gradient(16, 8))
    val docs = Seq(
      (1L, jpeg),
      (2L, ppmEq),
      (3L, "utterly not an image".getBytes("UTF-8"))
    ).toDF("doc_id", "text") // BinaryType column, same payload path
    val r = Multimodal.decodeFeatures(spark, docs).collect().sortBy(_.doc_id)
    r(0).decoded shouldBe true
    r(0).width shouldBe 16
    r(0).height shouldBe 8
    r(1).decoded shouldBe true
    r(2).decoded shouldBe false
    // JPEG features approximate the lossless PPM features of the same image
    r(0).feature.zip(r(1).feature).foreach { case (a, b) =>
      math.abs(a - b) should be <= 4.0f
    }
  }
}
