package graft

import graft.operators.{FlacCodec, Multimodal}

class FlacCodecSpec extends SparkTestBase {
  import spark.implicits._

  // ---- reference bit-level FLAC writer (spec-side) ------------------------

  private final class BitWriter {
    private val bits = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    def write(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bits += (((v >>> i) & 1L) == 1L); i -= 1 }
    }
    def writeSigned(v: Long, n: Int): Unit = write(v & ((1L << n) - 1), n)
    def unary(q: Int): Unit = { (0 until q).foreach(_ => bits += false); bits += true }
    def align(): Unit = while (bits.length % 8 != 0) bits += false
    def bytes: Array[Byte] = {
      val out = new Array[Byte]((bits.length + 7) / 8)
      bits.indices.foreach { j =>
        if (bits(j)) out(j >> 3) = (out(j >> 3) | (0x80 >>> (j & 7))).toByte
      }
      out
    }
  }

  private def crc8(b: Array[Byte]): Int = {
    var c = 0
    b.foreach { x =>
      c ^= x & 0xFF
      (0 until 8).foreach { _ =>
        c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF
      }
    }
    c
  }
  private def crc16(b: Array[Byte]): Int = {
    var c = 0
    b.foreach { x =>
      c ^= (x & 0xFF) << 8
      (0 until 8).foreach { _ =>
        c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF
            else (c << 1) & 0xFFFF
      }
    }
    c
  }

  /** A subframe recipe: how the test encodes one channel of one frame. */
  sealed trait Sub
  case class Constant(v: Long) extends Sub
  case class Verbatim() extends Sub
  /** Fixed-predictor subframe with single-partition Rice residuals. */
  case class Fixed(order: Int, riceParam: Int) extends Sub
  /** LPC subframe: given quantized coefficients and shift. */
  case class Lpc(coefs: Seq[Long], prec: Int, shift: Int, riceParam: Int)
    extends Sub
  /** Verbatim with `wasted` low zero bits stripped via the wasted-bits flag. */
  case class WastedVerbatim(wasted: Int) extends Sub

  private def residual(samples: Array[Long], order: Int,
                       predict: Int => Long): Array[Long] =
    (order until samples.length).map(i => samples(i) - predict(i)).toArray

  private def writeRice(bw: BitWriter, res: Array[Long], param: Int): Unit = {
    bw.write(0, 2) // method: 4-bit rice
    bw.write(0, 4) // partition order 0 (single partition)
    bw.write(param, 4)
    res.foreach { v =>
      val u = if (v >= 0) v << 1 else ((-v) << 1) - 1 // zigzag
      bw.unary((u >>> param).toInt)
      if (param > 0) bw.write(u & ((1L << param) - 1), param)
    }
  }

  private def writeSubframe(bw: BitWriter, samples: Array[Long], bps: Int,
                            sub: Sub): Unit = sub match {
    case Constant(v) =>
      bw.write(0, 1); bw.write(0, 6); bw.write(0, 1)
      bw.writeSigned(v, bps)
    case Verbatim() =>
      bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)
      samples.foreach(bw.writeSigned(_, bps))
    case WastedVerbatim(w) =>
      bw.write(0, 1); bw.write(1, 6); bw.write(1, 1)
      bw.unary(w - 1) // wasted-1 in unary per spec
      samples.foreach(s => bw.writeSigned(s >> w, bps - w))
    case Fixed(order, p) =>
      bw.write(0, 1); bw.write(8 + order, 6); bw.write(0, 1)
      (0 until order).foreach(i => bw.writeSigned(samples(i), bps))
      val res = residual(samples, order, i => order match {
        case 0 => 0L
        case 1 => samples(i - 1)
        case 2 => 2 * samples(i - 1) - samples(i - 2)
        case 3 => 3 * samples(i - 1) - 3 * samples(i - 2) + samples(i - 3)
        case 4 => 4 * samples(i - 1) - 6 * samples(i - 2) +
          4 * samples(i - 3) - samples(i - 4)
      })
      writeRice(bw, res, p)
    case Lpc(coefs, prec, shift, p) =>
      val order = coefs.length
      bw.write(0, 1); bw.write(32 + (order - 1), 6); bw.write(0, 1)
      (0 until order).foreach(i => bw.writeSigned(samples(i), bps))
      bw.write(prec - 1, 4)
      bw.writeSigned(shift, 5)
      coefs.foreach(bw.writeSigned(_, prec))
      val res = residual(samples, order, i =>
        coefs.indices.map(j => coefs(j) * samples(i - 1 - j)).sum >> shift)
      writeRice(bw, res, p)
  }

  /** Build a whole FLAC stream: STREAMINFO + frames. `frames` give the
    * per-channel DECODED samples and the subframe recipe per channel;
    * chanAsg picks the stereo decorrelation (the writer derives the
    * stored channels from the decoded ones).
    */
  private def flac(sampleRate: Int, bps: Int, chans: Int,
                   frames: Seq[(Array[Array[Long]], Seq[Sub], Int)]): Array[Byte] = {
    val total = frames.map(_._1(0).length).sum
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    val si = new BitWriter
    si.write(16, 16); si.write(65535, 16) // min/max block size
    si.write(0, 24); si.write(0, 24)
    si.write(sampleRate, 20)
    si.write(chans - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    val siBytes = si.bytes ++ new Array[Byte](16) // zero MD5
    out.write(0x80); out.write(0); out.write(0); out.write(34) // last block
    out.write(siBytes, 0, 34)

    frames.zipWithIndex.foreach { case ((decoded, subs, chanAsg), fi) =>
      val n = decoded(0).length
      // derive the STORED channels from the decoded L/R per assignment
      val chansStored: Array[Array[Long]] = chanAsg match {
        case c if c <= 7 => decoded
        case 8 => Array(decoded(0),
          Array.tabulate(n)(i => decoded(0)(i) - decoded(1)(i)))
        case 9 => Array(Array.tabulate(n)(i => decoded(0)(i) - decoded(1)(i)),
          decoded(1))
        case 10 => Array(
          Array.tabulate(n)(i => (decoded(0)(i) + decoded(1)(i)) >> 1),
          Array.tabulate(n)(i => decoded(0)(i) - decoded(1)(i)))
      }
      val hdr = new BitWriter
      hdr.write(0x3FFE, 14); hdr.write(0, 1); hdr.write(0, 1)
      hdr.write(7, 4) // block size: 16-bit at end of header
      hdr.write(0, 4) // sample rate: from STREAMINFO
      hdr.write(chanAsg, 4)
      hdr.write(bps match { case 8 => 1; case 16 => 4; case 24 => 6 }, 3)
      hdr.write(0, 1)
      hdr.write(fi, 8) // frame number, single UTF-8 byte (fi < 128)
      hdr.write(n - 1, 16)
      val hdrBytes = hdr.bytes
      val withCrc8 = hdrBytes :+ crc8(hdrBytes).toByte
      val body = new BitWriter
      chansStored.indices.foreach { ch =>
        val extra = chanAsg match {
          case 8 => if (ch == 1) 1 else 0
          case 9 => if (ch == 0) 1 else 0
          case 10 => if (ch == 1) 1 else 0
          case _ => 0
        }
        writeSubframe(body, chansStored(ch), bps + extra, subs(ch))
      }
      body.align()
      val frameNoCrc = withCrc8 ++ body.bytes
      val c16 = crc16(frameNoCrc)
      out.write(frameNoCrc, 0, frameNoCrc.length)
      out.write((c16 >> 8) & 0xFF); out.write(c16 & 0xFF)
    }
    out.toByteArray
  }

  private def ramp(n: Int, f: Int => Long): Array[Long] = Array.tabulate(n)(f)

  // ---- tests ---------------------------------------------------------------

  test("constant + verbatim subframes, mono 16-bit") {
    val s = ramp(32, i => (100 * math.sin(i * 0.7) + 50 * i % 300).toLong)
    val const = ramp(32, _ => -12345L)
    val bytes = flac(8000, 16, 1, Seq(
      (Array(const), Seq(Constant(-12345L)), 0),
      (Array(s), Seq(Verbatim()), 0)))
    val a = FlacCodec.decode(bytes).get
    a.sampleRate shouldBe 8000
    a.channels shouldBe 1
    a.samples.length shouldBe 64
    (0 until 32).foreach(i => a.samples(i) shouldBe -12345)
    (0 until 32).foreach(i => a.samples(32 + i) shouldBe s(i).toShort)
  }

  test("fixed predictors 0-4 reconstruct exactly through rice residuals") {
    // a smooth ramp: higher orders predict it nearly perfectly, leaving
    // tiny residuals — the arm where rice coding genuinely works
    val s = ramp(64, i => (20 * i + (i * i) / 8).toLong)
    for (order <- 0 to 4) {
      val bytes = flac(16000, 16, 1, Seq(
        (Array(s), Seq(Fixed(order, 6)), 0)))
      val a = FlacCodec.decode(bytes).get
      (0 until 64).foreach { i =>
        assert(a.samples(i) == s(i).toShort, s"order $order sample $i")
      }
    }
  }

  test("LPC subframe with quantized coefficients and shift") {
    val s = ramp(48, i => (1000 * math.sin(i * 0.3)).toLong)
    // a two-tap predictor ~ 2cos(0.3)·x[-1] − x[-2], quantized at shift 10
    val coefs = Seq((2 * math.cos(0.3) * 1024).toLong, -1024L)
    val bytes = flac(22050, 16, 1, Seq(
      (Array(s), Seq(Lpc(coefs, 15, 10, 4)), 0)))
    val a = FlacCodec.decode(bytes).get
    (0 until 48).foreach(i => a.samples(i) shouldBe s(i).toShort)
  }

  test("stereo: independent, left/side, right/side, mid/side all exact") {
    val l = ramp(40, i => (300 * math.sin(i * 0.5)).toLong)
    val r = ramp(40, i => (280 * math.sin(i * 0.5 + 0.2) - 40).toLong)
    for (asg <- Seq(1, 8, 9, 10)) {
      val bytes = flac(44100, 16, 2, Seq(
        (Array(l, r), Seq(Verbatim(), Verbatim()), asg)))
      val a = FlacCodec.decode(bytes).get
      a.channels shouldBe 2
      (0 until 40).foreach { i =>
        assert(a.samples(2 * i) == l(i).toShort, s"asg $asg L $i")
        assert(a.samples(2 * i + 1) == r(i).toShort, s"asg $asg R $i")
      }
    }
  }

  test("wasted bits restore the stripped low zeros") {
    val s = ramp(24, i => (i * 8).toLong) // low 3 bits always zero
    val bytes = flac(8000, 16, 1, Seq(
      (Array(s), Seq(WastedVerbatim(3)), 0)))
    val a = FlacCodec.decode(bytes).get
    (0 until 24).foreach(i => a.samples(i) shouldBe (i * 8).toShort)
  }

  test("8-bit scales up, 24-bit keeps the high 16") {
    val s8 = ramp(16, i => i.toLong - 8)
    val a8 = FlacCodec.decode(flac(8000, 8, 1, Seq(
      (Array(s8), Seq(Verbatim()), 0)))).get
    (0 until 16).foreach(i => a8.samples(i) shouldBe ((i - 8) << 8).toShort)
    val s24 = ramp(16, i => (i.toLong - 8) << 16)
    val a24 = FlacCodec.decode(flac(8000, 24, 1, Seq(
      (Array(s24), Seq(Verbatim()), 0)))).get
    (0 until 16).foreach(i => a24.samples(i) shouldBe ((i - 8) << 8).toShort)
  }

  test("strictness: bad magic, wrong CRCs, truncation, corrupt fuzz") {
    val s = ramp(32, i => i.toLong * 3)
    val good = flac(8000, 16, 1, Seq((Array(s), Seq(Fixed(2, 4)), 0)))
    FlacCodec.decode(good) should not be None // sanity
    FlacCodec.decode("fLaX".getBytes ++ good.drop(4)) shouldBe None
    FlacCodec.decode(good.take(good.length - 3)) shouldBe None // truncated
    // flip the frame CRC-16: decode must reject, not return garbage
    val badCrc = good.clone()
    badCrc(badCrc.length - 1) = (badCrc.last ^ 0x5A).toByte
    FlacCodec.decode(badCrc) shouldBe None
    // flip the header CRC-8 byte
    val rng = new scala.util.Random(20260814L)
    (1 to 400).foreach { _ =>
      val bad = good.clone()
      bad(rng.nextInt(bad.length)) = rng.nextInt(256).toByte
      noException should be thrownBy FlacCodec.decode(bad)
    }
    (1 to 150).foreach { _ =>
      noException should be thrownBy
        FlacCodec.decode(good.take(rng.nextInt(good.length)))
    }
    // CRC-16 makes silent entropy-bit corruption essentially impossible:
    // every single-byte flip inside the frame body must reject
    val frameBodyStart = 4 + 4 + 34 + 6
    (frameBodyStart until good.length).foreach { i =>
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x01).toByte
      FlacCodec.decode(bad) shouldBe None
    }
  }

  test("FLAC flows through audio features and triage") {
    val l = ramp(64, i => (2000 * math.sin(i * 0.4)).toLong)
    val r = ramp(64, i => (1500 * math.sin(i * 0.4 + 0.3)).toLong)
    val fl = flac(16000, 16, 2, Seq(
      (Array(l, r), Seq(Verbatim(), Verbatim()), 10)))
    val df = Seq((1L, fl)).toDF("doc_id", "payload")
    val feat = Multimodal.decodeAudioFeatures(spark, df).head()
    feat.decoded shouldBe true
    feat.sample_rate shouldBe 16000
    feat.channels shouldBe 2
    feat.n_frames shouldBe 64
    val meta = Multimodal.audioMeta(spark, df).head()
    meta.container shouldBe "flac"
    meta.pcm_decodable shouldBe true
    meta.duration_ms shouldBe (64 * 1000L / 16000)
  }
}
