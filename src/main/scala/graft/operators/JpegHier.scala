package graft.operators

import graft.operators.PpmCodec.PpmImage
import JpegCodec.{BitReader, Huff, extend, idct, fdct, category, codes,
  BitWriter, Zigzag}

/** Hierarchical JPEG (ITU T.81 Annex J), Huffman + arithmetic sequential
  * subsets — the pyramid process: a DHP segment declares the
  * full-resolution frame, then a sequence of frames refines it — the
  * first non-differential (SOF0/SOF9 sequential DCT or SOF3/SOF11
  * lossless), each later one DIFFERENTIAL (SOF5/SOF13 sequential-DCT
  * difference or SOF7/SOF15 lossless difference; round 7 added the
  * arithmetic arms — differential PROGRESSIVE (SOF6/SOF14) stays the
  * declared pair on both entropy kinds), optionally
  * preceded by an EXP marker that doubles the reference horizontally
  * and/or vertically with the J.1.1.2 interpolation
  * (out[2i] = in[i], out[2i+1] = (in[i] + in[i+1] + 1) >> 1, edge
  * replicated). Differential frames code the difference image with NO
  * level shift; the differential DCT DC category may need one extra bit
  * (the difference doubles the sample range), differential lossless
  * scans use predictor selector 0 ("no prediction" — valid only here,
  * T.81 table H.1), and each frame's reconstruction clamps to
  * [0, 2^P − 1] (J.1.1.6) before becoming the next reference.
  *
  * Supported subset (documented, like every codec arm here): 8-bit
  * precision, 1x1 sampling factors, 1 or 3 components, single-scan
  * Huffman frames, point transform 0. Three-component output maps
  * directly to RGB — T.81 defines no color transform and the JFIF YCbCr
  * convention is specific to the single-frame DCT processes; the
  * reference encoder below shares the convention, so the lossless
  * pyramid round-trips BIT-EXACT and the DCT pyramid within the
  * flat-quant error bound, both asserted in spec.
  */
object JpegHier {

  // next real marker at or after `from` (skips entropy 0xFF00 stuffing)
  private def nextMarker(bytes: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < bytes.length) {
      if ((bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) != 0x00 &&
        (bytes(i + 1) & 0xFF) != 0xFF) return i
      i += 1
    }
    -1
  }

  /** J.1.1.2 reference expansion by 2 along the selected axes. */
  private def expand(p: Array[Int], w: Int, h: Int,
                     eh: Boolean, ev: Boolean): (Array[Int], Int, Int) = {
    var cur = p; var cw = w; var ch = h
    if (eh) {
      val out = new Array[Int](2 * cw * ch)
      var y = 0
      while (y < ch) {
        var x = 0
        while (x < cw) {
          val a = cur(y * cw + x)
          val b = cur(y * cw + math.min(x + 1, cw - 1))
          out(y * 2 * cw + 2 * x) = a
          out(y * 2 * cw + 2 * x + 1) = (a + b + 1) >> 1
          x += 1
        }
        y += 1
      }
      cur = out; cw *= 2
    }
    if (ev) {
      val out = new Array[Int](cw * 2 * ch)
      var y = 0
      while (y < ch) {
        var x = 0
        while (x < cw) {
          val a = cur(y * cw + x)
          val b = cur(math.min(y + 1, ch - 1) * cw + x)
          out(2 * y * cw + x) = a
          out((2 * y + 1) * cw + x) = (a + b + 1) >> 1
          x += 1
        }
        y += 1
      }
      cur = out; ch *= 2
    }
    (cur, cw, ch)
  }

  /** One sequential-DCT frame (1x1 comps, single interleaved scan) into
    * Int sample planes; `differential` drops the level shift, widens the
    * DC category by one, and clamps to the signed difference range.
    * Returns (planes, position after the entropy segment).
    */
  private def dctFrame(bytes: Array[Byte], start: Int, n: Int,
                       dcSel: Array[Int], acSel: Array[Int],
                       tqSel: Array[Int], quant: Array[Array[Int]],
                       dcTabs: Array[Huff], acTabs: Array[Huff],
                       fw: Int, fh: Int, ri: Int,
                       differential: Boolean): Option[(Array[Array[Int]], Int)] = {
    var ci0 = 0
    while (ci0 < n) {
      if (dcTabs(dcSel(ci0)) == null || acTabs(acSel(ci0)) == null) return None
      ci0 += 1
    }
    val maxDcCat = if (differential) 12 else 11
    val mcusX = (fw + 7) / 8
    val mcusY = (fh + 7) / 8
    val pw = mcusX * 8
    val planes = Array.ofDim[Int](n, pw * mcusY * 8)
    val br = new BitReader(bytes, start)
    val dcPred = new Array[Int](n)
    val coeff = new Array[Int](64)
    val block = new Array[Double](64)
    val lo = if (differential) -255 else 0
    val hi = 255
    val shift = if (differential) 0.0 else 128.0
    var mcu = 0
    var rstCount = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (ri > 0 && mcu > 0 && mcu % ri == 0) {
        if (!br.restart(rstCount)) return None
        rstCount += 1
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < n) {
        val q = quant(tqSel(ci))
        java.util.Arrays.fill(coeff, 0)
        val t = br.decodeHuff(dcTabs(dcSel(ci)))
        if (t < 0 || t > maxDcCat) return None
        val diffBits = if (t == 0) 0 else br.receive(t)
        if (diffBits < 0) return None
        dcPred(ci) += extend(diffBits, t)
        coeff(0) = dcPred(ci) * q(0)
        var k = 1
        var open = true
        while (open && k < 64) {
          val rs = br.decodeHuff(acTabs(acSel(ci)))
          if (rs < 0) return None
          val run = rs >> 4
          val size = rs & 0x0F
          if (size == 0) {
            if (run == 15) k += 16 else open = false
          } else {
            k += run
            if (k > 63) return None
            val v = br.receive(size)
            if (v < 0) return None
            coeff(Zigzag(k)) = extend(v, size) * q(k)
            k += 1
          }
        }
        var i = 0
        while (i < 64) { block(i) = coeff(i).toDouble; i += 1 }
        val px = idct(block)
        val plane = planes(ci)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val s = math.round(px(y * 8 + x) + shift).toInt
            plane((my * 8 + y) * pw + mx * 8 + x) =
              if (s < lo) lo else if (s > hi) hi else s
            x += 1
          }
          y += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // trim padded planes to frame dims
    val out = Array.ofDim[Int](n, fw * fh)
    var ci2 = 0
    while (ci2 < n) {
      var y = 0
      while (y < fh) {
        System.arraycopy(planes(ci2), y * pw, out(ci2), y * fw, fw)
        y += 1
      }
      ci2 += 1
    }
    Some((out, br.pos))
  }

  /** One lossless frame (Annex H coding, 1x1 comps, Pt = 0);
    * `predictor == 0` is the differential form — no spatial prediction,
    * every sample IS its coded difference (T.81 table H.1 reserves
    * selector 0 for differential frames).
    */
  private def losslessFrame(bytes: Array[Byte], start: Int, n: Int,
                            dcSel: Array[Int], dcTabs: Array[Huff],
                            predictor: Int, fw: Int, fh: Int,
                            ri: Int): Option[(Array[Array[Int]], Int)] = {
    var ci0 = 0
    while (ci0 < n) {
      if (dcTabs(dcSel(ci0)) == null) return None
      ci0 += 1
    }
    val total = fw * fh
    val planes = Array.ofDim[Int](n, total)
    val br = new BitReader(bytes, start)
    val resetNext = new Array[Boolean](n)
    java.util.Arrays.fill(resetNext, true)
    var rstCount = 0
    var sampleIdx = 0
    while (sampleIdx < total) {
      if (ri > 0 && sampleIdx > 0 && sampleIdx % ri == 0) {
        if (!br.restart(rstCount)) return None
        rstCount += 1
        java.util.Arrays.fill(resetNext, true)
      }
      val x = sampleIdx % fw
      val y = sampleIdx / fw
      var ci = 0
      while (ci < n) {
        val t = br.decodeHuff(dcTabs(dcSel(ci)))
        if (t < 0 || t > 16) return None
        val d =
          if (t == 16) 32768
          else if (t == 0) 0
          else {
            val v = br.receive(t)
            if (v < 0) return None
            extend(v, t)
          }
        val p = planes(ci)
        val px =
          if (predictor == 0) 0 // differential: the sample IS the diff
          else if (resetNext(ci)) { resetNext(ci) = false; 128 }
          else if (y == 0) p(x - 1)
          else if (x == 0) p((y - 1) * fw)
          else {
            val ra = p(y * fw + x - 1)
            val rb = p((y - 1) * fw + x)
            val rc = p((y - 1) * fw + x - 1)
            predictor match {
              case 1 => ra
              case 2 => rb
              case 3 => rc
              case 4 => ra + rb - rc
              case 5 => ra + ((rb - rc) >> 1)
              case 6 => rb + ((ra - rc) >> 1)
              case _ => (ra + rb) >> 1
            }
          }
        // keep the SIGNED diff for differential frames (the combine step
        // wraps mod 2^16); spatial-predicted samples wrap here like SOF3
        p(y * fw + x) = if (predictor == 0) d else (px + d) & 0xFFFF
        ci += 1
      }
      sampleIdx += 1
    }
    Some((planes, br.pos))
  }

  /** One sequential ARITHMETIC-DCT frame (SOF9 non-differential / SOF13
    * differential, 1x1 comps, single interleaved scan) into Int sample
    * planes — the QM twin of [[dctFrame]]: the F.2.4 statistical models
    * exactly as JpegCodec's sequential path, with the differential form
    * dropping DC prediction (T.81 Annex J: differential frames code the
    * DC coefficient directly; the conditioning classification still
    * tracks the previously coded value) and the level shift.
    */
  private def dctFrameArith(bytes: Array[Byte], start: Int, n: Int,
                            dcSel: Array[Int], acSel: Array[Int],
                            tqSel: Array[Int], quant: Array[Array[Int]],
                            dcCondL: Array[Int], dcCondU: Array[Int],
                            acCondK: Array[Int],
                            fw: Int, fh: Int, ri: Int,
                            differential: Boolean): Option[(Array[Array[Int]], Int)] = {
    val mcusX = (fw + 7) / 8
    val mcusY = (fh + 7) / 8
    val pw = mcusX * 8
    val planes = Array.ofDim[Int](n, pw * mcusY * 8)
    val dec = new JpegArith.Decoder(bytes, start)
    dec.init()
    val dcStats = Array.fill(4)(new Array[Byte](64))
    val acStats = Array.fill(4)(new Array[Byte](256))
    val fixedBin = Array(JpegArith.FixedBin)
    val dcContext = new Array[Int](n)
    val dcPred = new Array[Int](n)
    val coeff = new Array[Int](64)
    val block = new Array[Double](64)
    val lo = if (differential) -255 else 0
    val hi = 255
    val shift = if (differential) 0.0 else 128.0
    var mcu = 0
    var rstCount = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (ri > 0 && mcu > 0 && mcu % ri == 0) {
        if (!dec.restart(rstCount)) return None
        rstCount += 1
        java.util.Arrays.fill(dcPred, 0)
        java.util.Arrays.fill(dcContext, 0)
        dcStats.foreach(java.util.Arrays.fill(_, 0.toByte))
        acStats.foreach(java.util.Arrays.fill(_, 0.toByte))
        fixedBin(0) = JpegArith.FixedBin
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < n) {
        val q = quant(tqSel(ci))
        val dst = dcStats(dcSel(ci))
        val ast = acStats(acSel(ci))
        java.util.Arrays.fill(coeff, 0)
        // DC (F.2.4.1 model; differential: no prediction)
        var st = dcContext(ci)
        if (dec.decode(dst, st) == 0) dcContext(ci) = 0
        else {
          val sign = dec.decode(dst, st + 1)
          st += 2 + sign
          var m = 0
          if (dec.decode(dst, st) != 0) {
            m = 1
            if (dec.decode(dst, st) != 0) { // X1 in the same SP/SN bin
              m = 2
              st = 20
              while (dec.decode(dst, st) != 0) {
                m <<= 1
                if (m == 0x8000) return None
                st += 1
              }
            }
          }
          dcContext(ci) =
            if (m < ((1 << dcCondL(dcSel(ci))) >> 1)) 0
            else if (m > ((1 << dcCondU(dcSel(ci))) >> 1)) 12 + sign * 4
            else 4 + sign * 4
          var v = m
          st += 14
          var bit = m >> 1
          while (bit != 0) {
            if (dec.decode(dst, st) != 0) v |= bit
            bit >>= 1
          }
          v += 1
          dcPred(ci) += (if (sign != 0) -v else v)
        }
        coeff(0) = dcPred(ci) * q(0)
        if (differential) dcPred(ci) = 0 // next block codes its own DC
        // AC (F.2.4.2 model, identical to the sequential path)
        var k = 1
        var open = true
        while (open && k <= 63) {
          var ast0 = 3 * (k - 1)
          if (dec.decode(ast, ast0) != 0) open = false // EOB
          else {
            while (dec.decode(ast, ast0 + 1) == 0) {
              ast0 += 3; k += 1
              if (k > 63) return None
            }
            val sign = dec.decode(fixedBin, 0)
            var st2 = ast0 + 2
            var m = 0
            if (dec.decode(ast, st2) != 0) {
              m = 1
              if (dec.decode(ast, st2) != 0) { // X1 in the same SE+2 bin
                m = 2
                st2 = if (k <= acCondK(acSel(ci))) 189 else 217
                while (dec.decode(ast, st2) != 0) {
                  m <<= 1
                  if (m == 0x8000) return None
                  st2 += 1
                }
              }
            }
            var v = m
            st2 += 14
            var bit = m >> 1
            while (bit != 0) {
              if (dec.decode(ast, st2) != 0) v |= bit
              bit >>= 1
            }
            v += 1
            coeff(Zigzag(k)) = (if (sign != 0) -v else v) * q(k)
            k += 1
          }
        }
        var i = 0
        while (i < 64) { block(i) = coeff(i).toDouble; i += 1 }
        val px = idct(block)
        val plane = planes(ci)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val s = math.round(px(y * 8 + x) + shift).toInt
            plane((my * 8 + y) * pw + mx * 8 + x) =
              if (s < lo) lo else if (s > hi) hi else s
            x += 1
          }
          y += 1
        }
        ci += 1
      }
      mcu += 1
    }
    val out = Array.ofDim[Int](n, fw * fh)
    var ci2 = 0
    while (ci2 < n) {
      var y = 0
      while (y < fh) {
        System.arraycopy(planes(ci2), y * pw, out(ci2), y * fw, fw)
        y += 1
      }
      ci2 += 1
    }
    Some((out, dec.segmentEnd))
  }

  /** One lossless ARITHMETIC frame (SOF11 non-differential / SOF15
    * differential, 1x1 comps, Pt = 0): the QM twin of [[losslessFrame]]
    * — the shared Annex H.2 difference codec ([[JpegH2]]) under the same
    * predictor-0-means-differential convention.
    */
  private def losslessFrameArith(bytes: Array[Byte], start: Int, n: Int,
                                 dcSel: Array[Int],
                                 dcCondL: Array[Int], dcCondU: Array[Int],
                                 predictor: Int, fw: Int, fh: Int,
                                 ri: Int): Option[(Array[Array[Int]], Int)] = {
    val total = fw * fh
    val planes = Array.ofDim[Int](n, total)
    val dec = new JpegArith.Decoder(bytes, start)
    dec.init()
    val stats = Array.fill(4)(new Array[Byte](JpegH2.StatsSize))
    val aboveCls = Array.ofDim[Int](n, fw)
    val leftCls = new Array[Int](n)
    val resetNext = new Array[Boolean](n)
    java.util.Arrays.fill(resetNext, true)
    var rstCount = 0
    var sampleIdx = 0
    while (sampleIdx < total) {
      if (ri > 0 && sampleIdx > 0 && sampleIdx % ri == 0) {
        if (!dec.restart(rstCount)) return None
        rstCount += 1
        java.util.Arrays.fill(resetNext, true)
        stats.foreach(java.util.Arrays.fill(_, 0.toByte))
        var c = 0
        while (c < n) {
          java.util.Arrays.fill(aboveCls(c), 0)
          leftCls(c) = 0
          c += 1
        }
      }
      val x = sampleIdx % fw
      val y = sampleIdx / fw
      var ci = 0
      while (ci < n) {
        val st = stats(dcSel(ci))
        val qa = if (x == 0) 0 else leftCls(ci)
        val qb = aboveCls(ci)(x)
        val r = JpegH2.decodeDiff(dec, st, qa, qb,
          dcCondL(dcSel(ci)), dcCondU(dcSel(ci)))
        if (r == Long.MinValue) return None
        val d = r.toInt
        val cls = (r >> 32).toInt
        leftCls(ci) = cls
        aboveCls(ci)(x) = cls
        val p = planes(ci)
        val px =
          if (predictor == 0) 0 // differential: the sample IS the diff
          else if (resetNext(ci)) { resetNext(ci) = false; 128 }
          else if (y == 0) p(x - 1)
          else if (x == 0) p((y - 1) * fw)
          else {
            val ra = p(y * fw + x - 1)
            val rb = p((y - 1) * fw + x)
            val rc = p((y - 1) * fw + x - 1)
            predictor match {
              case 1 => ra
              case 2 => rb
              case 3 => rc
              case 4 => ra + rb - rc
              case 5 => ra + ((rb - rc) >> 1)
              case 6 => rb + ((ra - rc) >> 1)
              case _ => (ra + rb) >> 1
            }
          }
        p(y * fw + x) = if (predictor == 0) d else (px + d) & 0xFFFF
        ci += 1
      }
      sampleIdx += 1
    }
    Some((planes, dec.segmentEnd))
  }

  /** Decode the frame sequence after a DHP header. `start` points at the
    * first byte after the DHP segment; `fullW`/`fullH`/`ids` come from
    * it; `quant`/`dcTabs`/`acTabs`/`ri0` carry any tables the caller
    * already parsed BEFORE the DHP marker (tables may legally precede
    * it). Returns the reconstructed image or None.
    */
  private[operators] def decodeFrom(bytes: Array[Byte], start: Int,
                                    precision: Int, fullW: Int, fullH: Int,
                                    ids: Array[Int],
                                    quant: Array[Array[Int]],
                                    dcTabs: Array[Huff],
                                    acTabs: Array[Huff],
                                    dcCondL: Array[Int], dcCondU: Array[Int],
                                    acCondK: Array[Int],
                                    ri0: Int): Option[PpmImage] = {
    if (precision != 8) return None
    val n = ids.length
    if (n != 1 && n != 3) return None
    var restartInterval = ri0
    var refs: Array[Array[Int]] = null
    var refW = 0
    var refH = 0
    var pendingEh = false
    var pendingEv = false
    // current frame state (between SOF and its SOS)
    var frameDiff = false
    var frameLossless = false
    var frameArith = false
    var frameW = 0
    var frameH = 0
    var frameTq: Array[Int] = null
    var inFrame = false
    var pos = start

    def u16(at: Int) = ((bytes(at) & 0xFF) << 8) | (bytes(at + 1) & 0xFF)

    while (pos + 2 <= bytes.length) {
      if ((bytes(pos) & 0xFF) != 0xFF) return None
      val marker = bytes(pos + 1) & 0xFF
      if (marker == 0xFF) { pos += 1 }
      else if (marker == 0xD9) { // EOI: full-resolution reconstruction due
        if (refs == null || refW != fullW || refH != fullH) return None
        val out = new Array[Byte](fullW * fullH * 3)
        var i = 0
        while (i < fullW * fullH) {
          def to8(v: Int): Byte =
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          if (n == 1) {
            val g = to8(refs(0)(i))
            out(3 * i) = g; out(3 * i + 1) = g; out(3 * i + 2) = g
          } else {
            out(3 * i) = to8(refs(0)(i))
            out(3 * i + 1) = to8(refs(1)(i))
            out(3 * i + 2) = to8(refs(2)(i))
          }
          i += 1
        }
        return Some(PpmImage(fullW, fullH, out))
      } else if (pos + 4 > bytes.length) return None
      else {
        val len = u16(pos + 2)
        if (len < 2 || pos + 2 + len > bytes.length) return None
        val seg = pos + 4
        var posOverride = -1
        marker match {
          case 0xDB => // DQT (8-bit tables in this subset, 16-bit allowed)
            var p = seg
            while (p < pos + 2 + len) {
              val pq = (bytes(p) & 0xF0) >> 4
              val tq = bytes(p) & 0x0F
              if (tq > 3 || pq > 1) return None
              p += 1
              if (p + (if (pq == 0) 64 else 128) > pos + 2 + len) return None
              var i = 0
              while (i < 64) {
                quant(tq)(i) =
                  if (pq == 0) bytes(p + i) & 0xFF else u16(p + 2 * i)
                i += 1
              }
              p += (if (pq == 0) 64 else 128)
            }
          case 0xC4 => // DHT
            var p = seg
            while (p < pos + 2 + len) {
              if (p + 17 > pos + 2 + len) return None
              val tc = (bytes(p) & 0xF0) >> 4
              val th = bytes(p) & 0x0F
              if (tc > 1 || th > 3) return None
              val counts = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xFF)
              val cnt = counts.sum
              if (p + 17 + cnt > pos + 2 + len) return None
              val vals = Array.tabulate(cnt)(i => bytes(p + 17 + i) & 0xFF)
              val h = new Huff(counts, vals)
              if (tc == 0) dcTabs(th) = h else acTabs(th) = h
              p += 17 + cnt
            }
          case 0xDD =>
            if (len < 4) return None
            restartInterval = u16(seg)
          case 0xCC => // DAC: arithmetic conditioning (mirror of JpegCodec's)
            var p = seg
            while (p + 1 < pos + 2 + len) {
              val tc = (bytes(p) & 0xF0) >> 4
              val tb = bytes(p) & 0x0F
              val cs = bytes(p + 1) & 0xFF
              if (tb > 3 || tc > 1) return None
              if (tc == 0) {
                val lq = cs & 0x0F; val uq = cs >> 4
                if (lq > uq) return None
                dcCondL(tb) = lq; dcCondU(tb) = uq
              } else {
                if (cs < 1 || cs > 63) return None
                acCondK(tb) = cs
              }
              p += 2
            }
          case 0xDF => // EXP: expand reference before the NEXT diff frame
            if (len < 3 || refs == null || inFrame) return None
            val ehv = bytes(seg) & 0xFF
            pendingEh = (ehv >> 4) == 1
            pendingEv = (ehv & 0x0F) == 1
            if ((ehv >> 4) > 1 || (ehv & 0x0F) > 1) return None
          case 0xC0 | 0xC3 | 0xC5 | 0xC7 | 0xC9 | 0xCB | 0xCD | 0xCF =>
            // frame header: Huffman non-diff (SOF0/3), Huffman diff
            // (SOF5/7), arithmetic non-diff (SOF9/11), arithmetic diff
            // (SOF13/15). Progressive differential (SOF6/SOF14) stays
            // declared on both entropy arms — see SURVEY §2.10.
            if (inFrame) return None
            frameDiff = marker == 0xC5 || marker == 0xC7 ||
              marker == 0xCD || marker == 0xCF
            frameLossless = marker == 0xC3 || marker == 0xC7 ||
              marker == 0xCB || marker == 0xCF
            frameArith = marker == 0xC9 || marker == 0xCB ||
              marker == 0xCD || marker == 0xCF
            if (frameDiff && refs == null) return None
            if (!frameDiff && refs != null) return None
            if ((pendingEh || pendingEv) && !frameDiff) return None
            if (len < 8 + 3 * n) return None
            if ((bytes(seg) & 0xFF) != 8) return None
            frameH = u16(seg + 1)
            frameW = u16(seg + 3)
            if ((bytes(seg + 5) & 0xFF) != n) return None
            if (frameW <= 0 || frameH <= 0 ||
              frameW > fullW || frameH > fullH) return None
            frameTq = new Array[Int](n)
            var i = 0
            while (i < n) {
              val at = seg + 6 + 3 * i
              if ((bytes(at) & 0xFF) != ids(i)) return None // DHP order
              if ((bytes(at + 1) & 0xFF) != 0x11) return None // 1x1 only
              val tq = bytes(at + 2) & 0xFF
              if (tq > 3) return None
              frameTq(i) = tq
              i += 1
            }
            inFrame = true
          case 0xDA => // SOS: decode the frame's single interleaved scan
            if (!inFrame || len < 6 + 2 * n) return None
            if ((bytes(seg) & 0xFF) != n) return None
            val dcSel = new Array[Int](n)
            val acSel = new Array[Int](n)
            var i = 0
            while (i < n) {
              if ((bytes(seg + 1 + 2 * i) & 0xFF) != ids(i)) return None
              dcSel(i) = (bytes(seg + 2 + 2 * i) & 0xF0) >> 4
              acSel(i) = bytes(seg + 2 + 2 * i) & 0x0F
              if (dcSel(i) > 3 || acSel(i) > 3) return None
              i += 1
            }
            val ss = bytes(seg + 1 + 2 * n) & 0xFF
            val se = bytes(seg + 2 + 2 * n) & 0xFF
            val ahal = bytes(seg + 3 + 2 * n) & 0xFF
            val scanStart = pos + 2 + len
            val decoded =
              if (frameLossless) {
                // nondiff: predictor 1..7; diff: selector 0 (table H.1)
                if (frameDiff && ss != 0) return None
                if (!frameDiff && (ss < 1 || ss > 7)) return None
                if (se != 0 || ahal != 0) return None
                if (frameArith)
                  losslessFrameArith(bytes, scanStart, n, dcSel,
                    dcCondL, dcCondU, ss, frameW, frameH, restartInterval)
                else losslessFrame(bytes, scanStart, n, dcSel, dcTabs, ss,
                  frameW, frameH, restartInterval)
              } else {
                if (ss != 0 || se != 63 || ahal != 0) return None
                if (frameArith)
                  dctFrameArith(bytes, scanStart, n, dcSel, acSel, frameTq,
                    quant, dcCondL, dcCondU, acCondK, frameW, frameH,
                    restartInterval, frameDiff)
                else dctFrame(bytes, scanStart, n, dcSel, acSel, frameTq,
                  quant, dcTabs, acTabs, frameW, frameH,
                  restartInterval, frameDiff)
              }
            decoded match {
              case None => return None
              case Some((planes, endPos)) =>
                if (frameDiff) {
                  // expand reference if EXP pended, then combine + clamp
                  var (rw, rh) = (refW, refH)
                  val exp = refs.map { r =>
                    val (e, w2, h2) = expand(r, refW, refH,
                      pendingEh, pendingEv)
                    rw = w2; rh = h2; e
                  }
                  // frame may trim the doubled reference by one (odd dims)
                  if (frameW > rw || frameH > rh ||
                    frameW < rw - 1 || frameH < rh - 1) return None
                  val combined = Array.ofDim[Int](n, frameW * frameH)
                  var ci = 0
                  while (ci < n) {
                    var y = 0
                    while (y < frameH) {
                      var x = 0
                      while (x < frameW) {
                        val v = if (frameLossless)
                          (exp(ci)(y * rw + x) +
                            planes(ci)(y * frameW + x)) & 0xFFFF
                        else exp(ci)(y * rw + x) + planes(ci)(y * frameW + x)
                        combined(ci)(y * frameW + x) =
                          if (v < 0) 0 else if (v > 255) 255 else v
                        x += 1
                      }
                      y += 1
                    }
                    ci += 1
                  }
                  refs = combined
                } else {
                  // first frame: clamp nondiff output into the reference
                  refs = planes.map(_.map(v =>
                    if (v < 0) 0 else if (v > 255) 255 else v))
                }
                refW = frameW; refH = frameH
                pendingEh = false; pendingEv = false
                inFrame = false
                val nm = nextMarker(bytes, endPos)
                if (nm < 0) return None
                posOverride = nm
            }
          case _ => // APPn / COM: skip
        }
        pos = if (posOverride >= 0) posOverride else pos + 2 + len
      }
    }
    None
  }

  // ---- reference encoder (for the round-trip specs) ----------------------

  /** Encode a lossless (exact) or DCT (near-lossless) hierarchical
    * pyramid: `levels` frames, the first at 1/2^(levels-1) scale from
    * repeated 2x2-average downsampling, each later frame an EXP(1,1) +
    * differential refinement. Dims must divide by 2^(levels-1). The
    * encoder tracks the decoder's reconstruction exactly (for DCT it
    * round-trips its own coefficients), so diffs are always coded
    * against what the decoder will hold.
    */
  def encodeHierarchical(img: PpmImage, gray: Boolean = false,
                         levels: Int = 2, dct: Boolean = false,
                         arithmetic: Boolean = false): Array[Byte] = {
    require(levels >= 1 && levels <= 6, "levels 1..6")
    val f = 1 << (levels - 1)
    require(img.width % f == 0 && img.height % f == 0,
      s"dims must divide by $f")
    val n = if (gray) 1 else 3
    // channel planes at full resolution
    val full = Array.tabulate(n) { c =>
      Array.tabulate(img.width * img.height)(i =>
        img.pixels(3 * i + c) & 0xFF)
    }
    // pyramid[0] = smallest ... pyramid[levels-1] = full
    case class Level(planes: Array[Array[Int]], w: Int, h: Int)
    val pyramid = new Array[Level](levels)
    pyramid(levels - 1) = Level(full, img.width, img.height)
    for (l <- (levels - 2) to 0 by -1) {
      val src = pyramid(l + 1)
      val w = src.w / 2; val h = src.h / 2
      pyramid(l) = Level(Array.tabulate(n) { c =>
        Array.tabulate(w * h) { i =>
          val x = i % w; val y = i / w
          val p = src.planes(c)
          (p(2 * y * src.w + 2 * x) + p(2 * y * src.w + 2 * x + 1) +
            p((2 * y + 1) * src.w + 2 * x) +
            p((2 * y + 1) * src.w + 2 * x + 1) + 2) / 4
        }
      }, w, h)
    }

    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int): Unit = { out.write(0xFF); out.write(b) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def sofBody(h: Int, w: Int, tq: Int): Unit = {
      u16(8 + 3 * n); out.write(8); u16(h); u16(w); out.write(n)
      (0 until n).foreach { i =>
        out.write(i + 1); out.write(0x11); out.write(tq)
      }
    }
    m(0xD8) // SOI
    // tables: lossless DC (17 cats at 5 bits) as table 0 for the lossless
    // path; DCT path uses table 0 for DC (13 cats at 4 bits — the
    // differential range needs category 12) + Annex-K luma AC as table 0,
    // flat quant 1 (nondiff, table 0) and 2 (diff, table 1 — halves the
    // coefficient range so every AC size fits the Annex-K table)
    val losslessBits = Array(0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val losslessVals = (0 to 16).toArray
    val dctDcBits = Array(0, 0, 0, 13, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val dctDcVals = (0 to 12).toArray
    val (dcBits, dcVals) = if (dct) (dctDcBits, dctDcVals)
                           else (losslessBits, losslessVals)
    if (!arithmetic) {
      m(0xC4); u16(2 + 1 + 16 + dcVals.length); out.write(0x00)
      dcBits.foreach(out.write); dcVals.foreach(out.write)
      if (dct) {
        m(0xC4); u16(2 + 1 + 16 + JpegCodec.AcLumaVals.length); out.write(0x10)
        JpegCodec.AcLumaBits.foreach(out.write)
        JpegCodec.AcLumaVals.foreach(out.write)
      }
    }
    if (dct) {
      m(0xDB); u16(2 + 1 + 64); out.write(0x00)
      (0 until 64).foreach(_ => out.write(1))
      m(0xDB); u16(2 + 1 + 64); out.write(0x01)
      (0 until 64).foreach(_ => out.write(2))
    }
    m(0xDE) // DHP: the full-resolution frame declaration
    sofBody(img.height, img.width, 0)

    val dcCodes = if (arithmetic) null else codes(dcBits, dcVals)
    val acCodes = if (dct && !arithmetic)
      codes(JpegCodec.AcLumaBits, JpegCodec.AcLumaVals) else null
    // default arithmetic conditioning (no DAC marker): L=0, U=1, Kx=5
    val dcL = 0; val dcU = 1; val acK = 5

    // encode one frame's samples (per component), returning the
    // reconstruction the decoder will compute for them
    def emitLossless(samples: Array[Array[Int]], w: Int, h: Int,
                     predictor: Int): Unit = {
      val bw = new BitWriter(out)
      val planes = Array.ofDim[Int](n, w * h)
      val resetNext = Array.fill(n)(true)
      var idx = 0
      while (idx < w * h) {
        val x = idx % w; val y = idx / w
        var ci = 0
        while (ci < n) {
          val sample = samples(ci)(idx)
          val p = planes(ci)
          val px =
            if (predictor == 0) 0
            else if (resetNext(ci)) { resetNext(ci) = false; 128 }
            else if (y == 0) p(x - 1)
            else if (x == 0) p((y - 1) * w)
            else {
              val ra = p(y * w + x - 1)
              val rb = p((y - 1) * w + x)
              val rc = p((y - 1) * w + x - 1)
              predictor match {
                case 1 => ra
                case 2 => rb
                case 3 => rc
                case 4 => ra + rb - rc
                case 5 => ra + ((rb - rc) >> 1)
                case 6 => rb + ((ra - rc) >> 1)
                case _ => (ra + rb) >> 1
              }
            }
          var d = (sample - px) & 0xFFFF
          if (d >= 32768) d -= 65536
          if (d == -32768) {
            val (c16, l16) = dcCodes(16); bw.write(c16, l16)
          } else {
            val t = category(d)
            val (c0, l0) = dcCodes(t)
            bw.write(c0, l0)
            if (t > 0) bw.write(if (d < 0) d + (1 << t) - 1 else d, t)
          }
          p(idx) = if (predictor == 0) d else sample
          ci += 1
        }
        idx += 1
      }
      bw.flush()
    }

    // DCT frame: returns the decoder's reconstruction of these samples
    def emitDct(samples: Array[Array[Int]], w: Int, h: Int,
                differential: Boolean): Array[Array[Int]] = {
      val bw = new BitWriter(out)
      val q = if (differential) 2 else 1
      val shift = if (differential) 0.0 else 128.0
      val lo = if (differential) -255 else 0
      val mcusX = (w + 7) / 8
      val mcusY = (h + 7) / 8
      val recon = Array.ofDim[Int](n, w * h)
      val dcPred = new Array[Int](n)
      val block = new Array[Double](64)
      var mcu = 0
      while (mcu < mcusX * mcusY) {
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var ci = 0
        while (ci < n) {
          var i = 0
          while (i < 64) {
            val x = math.min(mx * 8 + i % 8, w - 1)
            val y = math.min(my * 8 + i / 8, h - 1)
            block(i) = samples(ci)(y * w + x) - shift
            i += 1
          }
          val f2 = fdct(block)
          val zz = new Array[Int](64)
          i = 0
          while (i < 64) {
            zz(i) = math.round(f2(Zigzag(i)) / q).toInt
            i += 1
          }
          val diff = zz(0) - dcPred(ci)
          dcPred(ci) = zz(0)
          val t = category(diff)
          val (c0, l0) = dcCodes(t)
          bw.write(c0, l0)
          if (t > 0) bw.write(if (diff < 0) diff + (1 << t) - 1 else diff, t)
          var k = 1
          var lastNz = 63
          while (lastNz > 0 && zz(lastNz) == 0) lastNz -= 1
          while (k <= lastNz) {
            var run = 0
            while (zz(k) == 0) { run += 1; k += 1 }
            while (run > 15) {
              val (cz, lz) = acCodes(0xF0); bw.write(cz, lz); run -= 16
            }
            val v = zz(k)
            val s = category(v)
            val (ca, la) = acCodes((run << 4) | s)
            bw.write(ca, la)
            bw.write(if (v < 0) v + (1 << s) - 1 else v, s)
            k += 1
          }
          if (lastNz < 63) { val (ce, le) = acCodes(0x00); bw.write(ce, le) }
          // decoder-side reconstruction of this block
          i = 0
          while (i < 64) { block(Zigzag(i)) = (zz(i) * q).toDouble; i += 1 }
          val px = idct(block)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              val gx = mx * 8 + xx; val gy = my * 8 + yy
              if (gx < w && gy < h) {
                val s2 = math.round(px(yy * 8 + xx) + shift).toInt
                recon(ci)(gy * w + gx) =
                  if (s2 < lo) lo else if (s2 > 255) 255 else s2
              }
              xx += 1
            }
            yy += 1
          }
          ci += 1
        }
        mcu += 1
      }
      bw.flush()
      recon
    }

    // arithmetic twins: one fresh coder + statistics area per frame
    // (each frame is its own entropy-coded segment)
    def emitLosslessArith(samples: Array[Array[Int]], w: Int, h: Int,
                          predictor: Int): Unit = {
      val enc = new JpegArith.Encoder
      val st = new Array[Byte](JpegH2.StatsSize)
      val planes = Array.ofDim[Int](n, w * h)
      val aboveCls = Array.ofDim[Int](n, w)
      val leftCls = new Array[Int](n)
      val resetNext = Array.fill(n)(true)
      var idx = 0
      while (idx < w * h) {
        val x = idx % w; val y = idx / w
        var ci = 0
        while (ci < n) {
          val sample = samples(ci)(idx)
          val p = planes(ci)
          val px =
            if (predictor == 0) 0
            else if (resetNext(ci)) { resetNext(ci) = false; 128 }
            else if (y == 0) p(x - 1)
            else if (x == 0) p((y - 1) * w)
            else {
              val ra = p(y * w + x - 1)
              val rb = p((y - 1) * w + x)
              val rc = p((y - 1) * w + x - 1)
              predictor match {
                case 1 => ra
                case 2 => rb
                case 3 => rc
                case 4 => ra + rb - rc
                case 5 => ra + ((rb - rc) >> 1)
                case 6 => rb + ((ra - rc) >> 1)
                case _ => (ra + rb) >> 1
              }
            }
          var d = (sample - px) & 0xFFFF
          if (d >= 32768) d -= 65536
          val qa = if (x == 0) 0 else leftCls(ci)
          val qb = aboveCls(ci)(x)
          val cls = JpegH2.encodeDiff(enc, st, qa, qb, d, dcL, dcU)
          leftCls(ci) = cls
          aboveCls(ci)(x) = cls
          p(idx) = if (predictor == 0) d else sample
          ci += 1
        }
        idx += 1
      }
      enc.flushSegment()
      out.write(enc.bytes)
    }

    def emitDctArith(samples: Array[Array[Int]], w: Int, h: Int,
                     differential: Boolean): Array[Array[Int]] = {
      val enc = new JpegArith.Encoder
      val dst = new Array[Byte](64)
      val ast = new Array[Byte](256)
      val fixedBin = Array(JpegArith.FixedBin)
      val dcContext = new Array[Int](n)
      val q = if (differential) 2 else 1
      val shift = if (differential) 0.0 else 128.0
      val lo = if (differential) -255 else 0
      val mcusX = (w + 7) / 8
      val mcusY = (h + 7) / 8
      val recon = Array.ofDim[Int](n, w * h)
      val dcPred = new Array[Int](n)
      val block = new Array[Double](64)
      var mcu = 0
      while (mcu < mcusX * mcusY) {
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var ci = 0
        while (ci < n) {
          var i = 0
          while (i < 64) {
            val x = math.min(mx * 8 + i % 8, w - 1)
            val y = math.min(my * 8 + i / 8, h - 1)
            block(i) = samples(ci)(y * w + x) - shift
            i += 1
          }
          val f2 = fdct(block)
          val zz = new Array[Int](64)
          i = 0
          while (i < 64) {
            zz(i) = math.round(f2(Zigzag(i)) / q).toInt
            i += 1
          }
          // DC: F.1.4.1 model; differential drops prediction
          val diff = zz(0) - dcPred(ci)
          dcPred(ci) = if (differential) 0 else zz(0)
          var st = dcContext(ci)
          if (diff == 0) { enc.encode(dst, st, 0); dcContext(ci) = 0 }
          else {
            enc.encode(dst, st, 1)
            val sign = if (diff < 0) 1 else 0
            enc.encode(dst, st + 1, sign)
            st += 2 + sign
            var v = math.abs(diff) - 1
            var mm = 0
            if (v != 0) {
              enc.encode(dst, st, 1)
              mm = 1
              var v2 = v >> 1
              if (v2 != 0) {
                enc.encode(dst, st, 1) // X1 in the same SP/SN bin
                mm = 2
                st = 20
                v2 >>= 1
                while (v2 != 0) { enc.encode(dst, st, 1); mm <<= 1; st += 1; v2 >>= 1 }
              }
            }
            enc.encode(dst, st, 0)
            dcContext(ci) =
              if (mm < ((1 << dcL) >> 1)) 0
              else if (mm > ((1 << dcU) >> 1)) 12 + sign * 4
              else 4 + sign * 4
            st += 14
            var bit = mm >> 1
            while (bit != 0) {
              enc.encode(dst, st, if ((bit & v) != 0) 1 else 0)
              bit >>= 1
            }
          }
          // AC: F.1.4.2 model
          var ke = 63
          while (ke > 0 && zz(ke) == 0) ke -= 1
          var k = 1
          while (k <= ke) {
            var st2 = 3 * (k - 1)
            enc.encode(ast, st2, 0) // not EOB
            while (zz(k) == 0) { enc.encode(ast, st2 + 1, 0); st2 += 3; k += 1 }
            enc.encode(ast, st2 + 1, 1)
            val raw = zz(k)
            enc.encode(fixedBin, 0, if (raw < 0) 1 else 0)
            st2 += 2
            var v = math.abs(raw) - 1
            var mm = 0
            if (v != 0) {
              enc.encode(ast, st2, 1)
              mm = 1
              var v2 = v >> 1
              if (v2 != 0) {
                enc.encode(ast, st2, 1) // X1 in the same SE+2 bin
                mm = 2
                st2 = if (k <= acK) 189 else 217
                v2 >>= 1
                while (v2 != 0) { enc.encode(ast, st2, 1); mm <<= 1; st2 += 1; v2 >>= 1 }
              }
            }
            enc.encode(ast, st2, 0)
            st2 += 14
            var bit = mm >> 1
            while (bit != 0) {
              enc.encode(ast, st2, if ((bit & v) != 0) 1 else 0)
              bit >>= 1
            }
            k += 1
          }
          if (ke < 63) enc.encode(ast, 3 * (k - 1), 1) // EOB
          // decoder-side reconstruction of this block
          i = 0
          while (i < 64) { block(Zigzag(i)) = (zz(i) * q).toDouble; i += 1 }
          val px = idct(block)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              val gx = mx * 8 + xx; val gy = my * 8 + yy
              if (gx < w && gy < h) {
                val s2 = math.round(px(yy * 8 + xx) + shift).toInt
                recon(ci)(gy * w + gx) =
                  if (s2 < lo) lo else if (s2 > 255) 255 else s2
              }
              xx += 1
            }
            yy += 1
          }
          ci += 1
        }
        mcu += 1
      }
      enc.flushSegment()
      out.write(enc.bytes)
      recon
    }

    def sos(predictorOrSs: Int, se: Int): Unit = {
      m(0xDA); u16(6 + 2 * n); out.write(n)
      (0 until n).foreach { i => out.write(i + 1); out.write(0x00) }
      out.write(predictorOrSs); out.write(se); out.write(0)
    }

    // frame 1: smallest level, non-differential (arithmetic picks the
    // SOF9/SOF11 twins; differential frames below pick SOF13/SOF15)
    var recon: Array[Array[Int]] = null
    val base = pyramid(0)
    if (dct) {
      m(if (arithmetic) 0xC9 else 0xC0); sofBody(base.h, base.w, 0)
      sos(0, 63)
      recon =
        if (arithmetic) emitDctArith(base.planes, base.w, base.h,
          differential = false)
        else emitDct(base.planes, base.w, base.h, differential = false)
    } else {
      m(if (arithmetic) 0xCB else 0xC3); sofBody(base.h, base.w, 0)
      sos(1, 0)
      if (arithmetic) emitLosslessArith(base.planes, base.w, base.h,
        predictor = 1)
      else emitLossless(base.planes, base.w, base.h, predictor = 1)
      recon = base.planes.map(_.clone())
    }
    var rw = base.w; var rh = base.h

    for (l <- 1 until levels) {
      val lv = pyramid(l)
      m(0xDF); u16(3); out.write(0x11) // EXP: double both axes
      val expanded = recon.map(r => expand(r, rw, rh, eh = true, ev = true)._1)
      rw *= 2; rh *= 2
      val diffs = Array.tabulate(n) { c =>
        Array.tabulate(lv.w * lv.h)(i => lv.planes(c)(i) - expanded(c)(i))
      }
      if (dct) {
        // differential DCT, quant table 1 (SOF13 on the arithmetic arm)
        m(if (arithmetic) 0xCD else 0xC5); sofBody(lv.h, lv.w, 1)
        sos(0, 63)
        val dr =
          if (arithmetic) emitDctArith(diffs, lv.w, lv.h, differential = true)
          else emitDct(diffs, lv.w, lv.h, differential = true)
        recon = Array.tabulate(n) { c =>
          Array.tabulate(lv.w * lv.h) { i =>
            val v = expanded(c)(i) + dr(c)(i)
            if (v < 0) 0 else if (v > 255) 255 else v
          }
        }
      } else {
        // lossless differential: diffs are exact, recon = source
        // (SOF15 on the arithmetic arm)
        m(if (arithmetic) 0xCF else 0xC7); sofBody(lv.h, lv.w, 0)
        sos(0, 0) // predictor selector 0: differential
        val wrapped = Array.tabulate(n) { c =>
          diffs(c).map(d => d) // coded mod 2^16 inside the emit
        }
        if (arithmetic) emitLosslessArith(wrapped, lv.w, lv.h, predictor = 0)
        else emitLossless(wrapped, lv.w, lv.h, predictor = 0)
        recon = lv.planes.map(_.clone())
      }
    }
    m(0xD9)
    out.toByteArray
  }
}
