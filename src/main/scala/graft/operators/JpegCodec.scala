package graft.operators

import graft.operators.PpmCodec.PpmImage

/** Dependency-free baseline JPEG decoder (and a minimal encoder for
  * round-trip specs), built on nothing but byte arithmetic — this retires
  * the LAST pseudo-decode fallback arm in [[Multimodal.decodeFeatures]]:
  * with PPM, PNG, and now JPEG decoding for real, every raster format the
  * synthetic corpus carries reaches actual pixels inside the container.
  *
  * Scope — the complete T.81 DCT frame family plus lossless Huffman:
  * baseline sequential (SOF0) and extended sequential at 8 or 12 bits
  * (SOF1) under Huffman, progressive Huffman (SOF2: spectral selection +
  * successive approximation), sequential ARITHMETIC (SOF9, 8/12-bit) and
  * progressive ARITHMETIC (SOF10) — the QM coder and the F.2.4/G.2
  * statistical models live in [[JpegArith]] — and LOSSLESS Huffman
  * (SOF3, Annex H: seven-predictor residual coding at 8..16 bits,
  * bit-exact) and LOSSLESS ARITHMETIC (SOF11, round 7: the H.2
  * two-dimensional conditioning over the same QM coder and predictors);
  * grayscale or YCbCr with sampling factors 1 or 2 per axis
  * (4:4:4, 4:2:2, 4:2:0), restart markers, 8- or 16-bit quantization
  * tables, DAC conditioning. The hierarchical (Annex J) process routes
  * through [[JpegHier]]. Output is normalized to the same
  * 3-byte-RGB [[PpmImage]] the PPM and PNG paths produce, so features /
  * resize / frame ops downstream stay format-agnostic.
  *
  * Decode path per ITU T.81 (public spec): marker scan → DQT/DHT/SOF0/SOS
  * parse → per-MCU Huffman decode (DC predict + extend, AC run/size, EOB,
  * ZRL, 0xFF00 byte unstuffing, RSTn predictor reset) → dequantize in
  * zigzag order → 8×8 IDCT (separable, double-precision orthonormal DCT
  * matrix — exactness over speed here; a production hot path would swap in
  * the AAN fixed-point kernel, same interface) → level shift → chroma
  * upsample (sample replication) → YCbCr→RGB (JFIF coefficients, rounded,
  * clamped).
  */
object JpegCodec {

  // zigzag index -> natural (row-major) position, per T.81 figure A.6
  private[operators] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // orthonormal 8x8 DCT basis: M(u,x) = c(u)/2 * cos((2x+1) u pi / 16);
  // IDCT is s = Mt F M, FDCT is F = M s Mt — one shared matrix, so the
  // encoder/decoder pair is exactly inverse up to double rounding
  private val M: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** s = Mt F M (both args natural order, row-major 64). */
  private[operators] def idct(block: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64) // tmp = Mt F
    var i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        var acc = 0.0
        var k = 0
        while (k < 8) { acc += M(k)(i) * block(k * 8 + j); k += 1 }
        tmp(i * 8 + j) = acc
        j += 1
      }
      i += 1
    }
    val out = new Array[Double](64) // out = tmp M
    i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        var acc = 0.0
        var k = 0
        while (k < 8) { acc += tmp(i * 8 + k) * M(k)(j); k += 1 }
        out(i * 8 + j) = acc
        j += 1
      }
      i += 1
    }
    out
  }

  /** F = M s Mt — the forward twin, used by the spec encoder. */
  private[operators] def fdct(block: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64) // tmp = M s
    var i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        var acc = 0.0
        var k = 0
        while (k < 8) { acc += M(i)(k) * block(k * 8 + j); k += 1 }
        tmp(i * 8 + j) = acc
        j += 1
      }
      i += 1
    }
    val out = new Array[Double](64) // out = tmp Mt
    i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        var acc = 0.0
        var k = 0
        while (k < 8) { acc += tmp(i * 8 + k) * M(j)(k); k += 1 }
        out(i * 8 + j) = acc
        j += 1
      }
      i += 1
    }
    out
  }

  // ---- Huffman -----------------------------------------------------------

  /** Canonical Huffman table from the DHT (bits[1..16], values) layout. */
  private[operators] final class Huff(counts: Array[Int], vals: Array[Int]) {
    // minCode/maxCode/valPtr per code length, T.81 annex C
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        valPtr(len) = k
        minCode(len) = code
        code += counts(len - 1)
        k += counts(len - 1)
        maxCode(len) = if (counts(len - 1) > 0) code - 1 else -1
        code <<= 1
        len += 1
      }
    }
    def value(len: Int, code: Int): Int = vals(valPtr(len) + code - minCode(len))
  }

  /** Entropy-segment bit reader: unstuffs 0xFF00, stops at markers. */
  private[operators] final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var hitMarker = false

    private def fill(): Boolean = {
      if (pos >= data.length) return false
      val b = data(pos) & 0xFF
      if (b == 0xFF) {
        if (pos + 1 >= data.length) return false
        val b2 = data(pos + 1) & 0xFF
        if (b2 == 0x00) { pos += 2; acc = (acc << 8) | 0xFF; nBits += 8; true }
        else { hitMarker = true; false } // RST or terminating marker
      } else { pos += 1; acc = (acc << 8) | b; nBits += 8; true }
    }

    def readBit(): Int = {
      if (nBits == 0 && !fill()) return -1
      nBits -= 1
      (acc >>> nBits) & 1
    }

    /** n raw bits MSB-first, or -1 on exhaustion. */
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = readBit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }

    def decodeHuff(h: Huff): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        val b = readBit()
        if (b < 0) return -1
        code = (code << 1) | b
        len += 1
        if (h.maxCode(len) >= code && code >= h.minCode(len)) return h.value(len, code)
      }
      -1
    }

    /** Drop buffered bits and consume an expected RSTn marker. */
    def restart(n: Int): Boolean = {
      acc = 0; nBits = 0; hitMarker = false
      if (pos + 1 >= data.length) return false
      if ((data(pos) & 0xFF) != 0xFF) return false
      if ((data(pos + 1) & 0xFF) != 0xD0 + (n % 8)) return false
      pos += 2
      true
    }
  }

  /** DC-difference / AC-value sign extension (T.81 F.2.2.1 EXTEND). */
  private[operators] def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // ---- decoder -----------------------------------------------------------

  private[operators] final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable = 0
    var acTable = 0
  }

  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8 &&
      (bytes(2) & 0xFF) == 0xFF

  /** Decode one JPEG payload to RGB pixels — baseline (SOF0), extended
    * sequential Huffman (SOF1, 8/12-bit), progressive (SOF2: spectral
    * selection + successive approximation, multi-scan), LOSSLESS Huffman
    * (SOF3: predictive, 8..16-bit, bit-exact), sequential ARITHMETIC
    * (SOF9, 8/12-bit, QM-coded), or progressive ARITHMETIC
    * (SOF10) — or None if the payload is outside the supported subset
    * (arithmetic lossless, hierarchical, >2 sampling factors,
    * structurally truncated or corrupt). Arithmetic entropy-bit damage is a special case: the QM
    * stream has no invalid-code redundancy and end-of-data IS the
    * zero-feed regime, so a flipped payload bit can decode to a
    * different image rather than None (guarded only by the runaway
    * magnitude-category check) — inherent to the format, pinned in spec.
    */
  def decode(bytes: Array[Byte]): Option[PpmImage] = {
    if (!isJpeg(bytes)) return None
    val quant = Array.ofDim[Int](4, 64) // zigzag order
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var progressive = false
    var arithmetic = false
    var lossless = false
    var precision = 8
    var prog: ProgState = null
    var pos = 2
    // DAC conditioning (B.2.4.3): DC (L, U) and AC Kx per table id
    val dcCondL = Array(0, 0, 0, 0)
    val dcCondU = Array(1, 1, 1, 1)
    val acCondK = Array(5, 5, 5, 5)

    def u16(at: Int) = ((bytes(at) & 0xFF) << 8) | (bytes(at + 1) & 0xFF)

    while (pos + 2 <= bytes.length) {
      if ((bytes(pos) & 0xFF) != 0xFF) return None
      val marker = bytes(pos + 1) & 0xFF
      if (marker == 0xD8) { pos += 2 } // stray SOI
      else if (marker == 0xFF) { pos += 1 } // fill byte before a marker
      else if (marker == 0xD9) {
        // EOI: a finished progressive image reconstructs here; for
        // baseline (whose single scan returns directly) it is premature
        return if (progressive && prog != null && prog.sawScan)
          reconstructProgressive(prog, comps, quant, width, height, precision)
        else None
      } else if (pos + 4 > bytes.length) return None
      else {
        val len = u16(pos + 2)
        if (len < 2 || pos + 2 + len > bytes.length) return None
        val seg = pos + 4
        var posOverride = -1
        marker match {
          case 0xDB => // DQT: one or more tables
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
          case 0xC4 => // DHT: one or more tables
            var p = seg
            while (p < pos + 2 + len) {
              if (p + 17 > pos + 2 + len) return None
              val tc = (bytes(p) & 0xF0) >> 4
              val th = bytes(p) & 0x0F
              if (tc > 1 || th > 3) return None
              val counts = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xFF)
              val n = counts.sum
              if (p + 17 + n > pos + 2 + len) return None
              val vals = Array.tabulate(n)(i => bytes(p + 17 + i) & 0xFF)
              val h = new Huff(counts, vals)
              if (tc == 0) dcTabs(th) = h else acTabs(th) = h
              p += 17 + n
            }
          case 0xC0 | 0xC1 | 0xC2 | 0xC3 | 0xC9 | 0xCA | 0xCB =>
            // SOF0/1 sequential, SOF2 progressive, SOF3 lossless,
            // SOF9 arithmetic sequential, SOF10 arithmetic progressive,
            // SOF11 arithmetic lossless (round 7)
            if (comps != null) return None // second frame header
            if (len < 8) return None
            precision = bytes(seg) & 0xFF
            lossless = marker == 0xC3 || marker == 0xCB
            // baseline (SOF0) is 8-bit by definition; extended sequential
            // (SOF1 Huffman, SOF9 arithmetic) and progressive (SOF2/SOF10
            // — T.81 Table B.3 allows both precisions) add the 12-bit
            // sample arm; lossless (SOF3) allows 2..16 — 8..16 supported
            // here (sub-byte lossless is vanishingly rare; declared
            // subset) — output normalizes back to 8-bit by keeping the
            // high byte (the PngCodec 16-bit convention)
            if (lossless) {
              if (precision < 8 || precision > 16) return None
            } else if (precision != 8 &&
              !(precision == 12 && marker != 0xC0))
              return None
            progressive = marker == 0xC2 || marker == 0xCA
            arithmetic = marker == 0xC9 || marker == 0xCA || marker == 0xCB
            height = u16(seg + 1)
            width = u16(seg + 3)
            val n = bytes(seg + 5) & 0xFF
            if (width <= 0 || height <= 0 || (n != 1 && n != 3)) return None
            // cap pixel count BEFORE any plane allocation: a corrupt
            // 2-byte dim (65535x65535) would otherwise overflow the Int
            // plane sizes / RGB buffer or OOM the task — corrupt payloads
            // must return None, never throw (PngCodec.MaxPixels shared)
            if (width.toLong * height.toLong > PngCodec.MaxPixels) return None
            if (len < 8 + 3 * n) return None
            comps = Array.tabulate(n) { i =>
              val at = seg + 6 + 3 * i
              val c = Component(bytes(at) & 0xFF, (bytes(at + 1) & 0xF0) >> 4,
                bytes(at + 1) & 0x0F, bytes(at + 2) & 0xFF)
              if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 || c.tq > 3) return None
              // lossless subsampling (H.2) is essentially unused in the
              // wild; the supported SOF3 subset is 1x1 components
              if (lossless && (c.h != 1 || c.v != 1)) return None
              c
            }
          case 0xCC => // DAC: arithmetic conditioning tables
            var p = seg
            while (p + 1 < pos + 2 + len) {
              val tc = (bytes(p) & 0xF0) >> 4
              val tb = bytes(p) & 0x0F
              val cs = bytes(p + 1) & 0xFF
              if (tb > 3 || tc > 1) return None
              if (tc == 0) {
                val l = cs & 0x0F; val u = cs >> 4
                if (l > u) return None // B.2.4.3: 0 <= L <= U <= 15
                dcCondL(tb) = l; dcCondU(tb) = u
              } else {
                if (cs < 1 || cs > 63) return None
                acCondK(tb) = cs
              }
              p += 2
            }
          case 0xDE => // DHP: delegate to the hierarchical (Annex J) driver
            if (comps != null) return None // DHP after a frame header
            if (len < 8) return None
            val p = bytes(seg) & 0xFF
            val hh = u16(seg + 1)
            val ww = u16(seg + 3)
            val nf = bytes(seg + 5) & 0xFF
            if (ww <= 0 || hh <= 0 || (nf != 1 && nf != 3)) return None
            if (ww.toLong * hh.toLong > PngCodec.MaxPixels) return None
            if (len < 8 + 3 * nf) return None
            val ids = Array.tabulate(nf)(i => bytes(seg + 6 + 3 * i) & 0xFF)
            return JpegHier.decodeFrom(bytes, pos + 2 + len, p, ww, hh, ids,
              quant, dcTabs, acTabs, dcCondL, dcCondU, acCondK,
              restartInterval)
          case m if m >= 0xC1 && m <= 0xCF && m != 0xC2 && m != 0xC3 &&
              m != 0xC4 && m != 0xC8 && m != 0xC9 && m != 0xCA &&
              m != 0xCB =>
            // differential SOFs outside a hierarchical sequence are
            // malformed (T.81 B.2/B.3: they occur only after DHP)
            return None
          case 0xDD =>
            if (len < 4) return None
            restartInterval = u16(seg)
          case 0xDA => // SOS: wire tables, then the entropy-coded segment
            if (comps == null || len < 3) return None
            val ns = bytes(seg) & 0xFF
            if (ns < 1 || ns > comps.length || len < 6 + 2 * ns) return None
            val scanIdx = new Array[Int](ns)
            var i = 0
            while (i < ns) {
              val cid = bytes(seg + 1 + 2 * i) & 0xFF
              val ci = comps.indexWhere(_.id == cid)
              if (ci < 0) return None
              comps(ci).dcTable = (bytes(seg + 2 + 2 * i) & 0xF0) >> 4
              comps(ci).acTable = bytes(seg + 2 + 2 * i) & 0x0F
              // 4-bit ids address 4-slot tables: reject 4..15, don't index
              if (comps(ci).dcTable > 3 || comps(ci).acTable > 3) return None
              scanIdx(i) = ci
              i += 1
            }
            val ss = bytes(seg + 1 + 2 * ns) & 0xFF
            val se = bytes(seg + 2 + 2 * ns) & 0xFF
            val ahal = bytes(seg + 3 + 2 * ns) & 0xFF
            val ah = (ahal >> 4) & 0x0F
            val al = ahal & 0x0F
            if (lossless) {
              // H.1: Ss = predictor selector 1..7, Se = 0, Ah = 0,
              // Al = point transform Pt (< sample precision)
              if (ns != comps.length) return None
              if (ss < 1 || ss > 7 || se != 0 || ah != 0 ||
                al > precision - 1) return None
              return if (arithmetic)
                decodeLosslessScanArith(bytes, pos + 2 + len, comps,
                  dcCondL, dcCondU, ss, al, restartInterval, precision,
                  width, height)
              else decodeLosslessScan(bytes, pos + 2 + len, comps, dcTabs,
                ss, al, restartInterval, precision, width, height)
            }
            if (!progressive) {
              if (ns != comps.length) return None
              return if (arithmetic)
                decodeScanArith(bytes, pos + 2 + len, comps, quant,
                  dcCondL, dcCondU, acCondK, width, height,
                  restartInterval, precision)
              else decodeScan(bytes, pos + 2 + len, comps, quant, dcTabs,
                acTabs, width, height, restartInterval, precision)
            }
            if (se > 63 || ss > se || ah > 13 || al > 13) return None
            if (ah != 0 && ah != al + 1) return None // refine one bit/scan
            if (prog == null) prog = new ProgState(comps, width, height)
            val end =
              if (arithmetic)
                decodeProgScanArith(bytes, pos + 2 + len, prog, comps,
                  scanIdx, ss, se, ah, al, restartInterval,
                  dcCondL, dcCondU, acCondK)
              else decodeProgScan(bytes, pos + 2 + len, prog, comps,
                scanIdx, ss, se, ah, al, restartInterval, dcTabs, acTabs,
                precision)
            if (end < 0) return None
            posOverride = end
          case _ => // APPn / COM / unknown: skip
        }
        pos = if (posOverride >= 0) posOverride else pos + 2 + len
      }
    }
    None
  }

  private def decodeScan(bytes: Array[Byte], start: Int,
                         comps: Array[Component], quant: Array[Array[Int]],
                         dcTabs: Array[Huff], acTabs: Array[Huff],
                         width: Int, height: Int,
                         restartInterval: Int,
                         precision: Int = 8): Option[PpmImage] = {
    // 12-bit arm: wider DC categories, 2048 level shift, [0,4095] clamp,
    // high byte kept on the way to the 8-bit planes
    val maxDcCat = if (precision == 12) 15 else 11
    val half = (1 << (precision - 1)).toDouble
    val maxSample = (1 << precision) - 1
    val downShift = precision - 8
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // per-component sample planes at full MCU-grid size
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = comps.indices.map(i => new Array[Byte](planeW(i) * planeH(i))).toArray
    comps.foreach { c =>
      if (dcTabs(c.dcTable) == null || acTabs(c.acTable) == null) return None
    }

    val br = new BitReader(bytes, start)
    val dcPred = new Array[Int](comps.length)
    val coeff = new Array[Int](64)
    val block = new Array[Double](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    var rstCount = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart(rstCount)) return None
        rstCount += 1
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = quant(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            // --- one 8x8 block: Huffman -> dequant (zigzag) -> IDCT ---
            java.util.Arrays.fill(coeff, 0)
            val t = br.decodeHuff(dcTabs(c.dcTable))
            if (t < 0 || t > maxDcCat) return None
            val diffBits = if (t == 0) 0 else br.receive(t)
            if (diffBits < 0) return None
            dcPred(ci) += extend(diffBits, t)
            coeff(0) = dcPred(ci) * q(0)
            var k = 1
            var open = true
            while (open && k < 64) {
              val rs = br.decodeHuff(acTabs(c.acTable))
              if (rs < 0) return None
              val run = rs >> 4
              val size = rs & 0x0F
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else open = false // EOB
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
            val pw = planeW(ci)
            val ox = (mx * c.h + bx) * 8
            val oy = (my * c.v + by) * 8
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                val s = math.round(px(y * 8 + x) + half).toInt
                val cl = if (s < 0) 0 else if (s > maxSample) maxSample else s
                plane((oy + y) * pw + ox + x) = (cl >> downShift).toByte
                x += 1
              }
              y += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    Some(assemble(comps, planes, planeW, width, height))
  }

  /** Sequential arithmetic-coded scan (SOF9) per ITU T.81 F.2.4: the QM
    * decoder (JpegArith) drives the DC difference model (zero/sign/
    * magnitude-category/bits with the (L,U)-conditioned context from the
    * PREVIOUS diff, Table F.4 bin layout: contexts 0-19, category chain
    * from 20, magnitude bits at +14) and the AC model (per-k EOB and
    * significance bins at 3(k-1), fixed ~0.5 sign bin, shared category
    * chains at 189/217 split by the Kx conditioning). Statistics adapt
    * across the whole scan and reset at restart markers, which also
    * re-initialize the coder — exactly the encoder's view.
    */
  private def decodeScanArith(bytes: Array[Byte], start: Int,
                              comps: Array[Component],
                              quant: Array[Array[Int]],
                              dcCondL: Array[Int], dcCondU: Array[Int],
                              acCondK: Array[Int],
                              width: Int, height: Int,
                              restartInterval: Int,
                              precision: Int): Option[PpmImage] = {
    val half = (1 << (precision - 1)).toDouble
    val maxSample = (1 << precision) - 1
    val downShift = precision - 8
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = comps.indices.map(i => new Array[Byte](planeW(i) * planeH(i))).toArray

    val dec = new JpegArith.Decoder(bytes, start)
    dec.init()
    // per-table statistics areas (Table F.3: DC 64 bins, AC 256 bins)
    val dcStats = Array.fill(4)(new Array[Byte](64))
    val acStats = Array.fill(4)(new Array[Byte](256))
    val fixedBin = Array(JpegArith.FixedBin)
    val dcContext = new Array[Int](comps.length)
    val dcPred = new Array[Int](comps.length)
    val coeff = new Array[Int](64)
    val block = new Array[Double](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    var rstCount = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
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
      while (ci < comps.length) {
        val c = comps(ci)
        val q = quant(c.tq)
        val dst = dcStats(c.dcTable)
        val ast = acStats(c.acTable)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coeff, 0)
            // --- DC difference (F.2.4.1) ---
            var st = dcContext(ci)
            if (dec.decode(dst, st) == 0) dcContext(ci) = 0
            else {
              val sign = dec.decode(dst, st + 1)
              st += 2 + sign
              var m = 0
              if (dec.decode(dst, st) != 0) {
                m = 1
                // the X1 decision (m: 1 -> 2) codes in the SAME SP/SN bin
                // (T.81 Table F.5 / jdarith Figure F.23); only X2 onward
                // move to the X1=20 chain
                if (dec.decode(dst, st) != 0) {
                  m = 2
                  st = 20
                  while (dec.decode(dst, st) != 0) {
                    m <<= 1
                    if (m == 0x8000) return None // runaway category: corrupt
                    st += 1
                  }
                }
              }
              // conditioning category for the NEXT block (F.1.4.4.1.2)
              dcContext(ci) =
                if (m < ((1 << dcCondL(c.dcTable)) >> 1)) 0
                else if (m > ((1 << dcCondU(c.dcTable)) >> 1)) 12 + sign * 4
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
            // --- AC coefficients (F.2.4.2) ---
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
                  // X1 decision in the same SE+2 bin (T.81 Table F.5 /
                  // jdarith); only X2 onward use the 189/217 chain
                  if (dec.decode(ast, st2) != 0) {
                    m = 2
                    st2 = if (k <= acCondK(c.acTable)) 189 else 217
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
            val pw = planeW(ci)
            val ox = (mx * c.h + bx) * 8
            val oy = (my * c.v + by) * 8
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                val s = math.round(px(y * 8 + x) + half).toInt
                val cl = if (s < 0) 0 else if (s > maxSample) maxSample else s
                plane((oy + y) * pw + ox + x) = (cl >> downShift).toByte
                x += 1
              }
              y += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    Some(assemble(comps, planes, planeW, width, height))
  }

  /** Assemble RGB from per-component sample planes: upsample chroma by
    * sample replication, JFIF color transform. Shared by the baseline
    * and progressive reconstruction paths.
    */
  private def assemble(comps: Array[Component], planes: Array[Array[Byte]],
                       planeW: Array[Int], width: Int,
                       height: Int): PpmImage = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = (y * width + x) * 3
        if (comps.length == 1) {
          val g = planes(0)(y * planeW(0) + x)
          out(o) = g; out(o + 1) = g; out(o + 2) = g
        } else {
          def sample(ci: Int): Int = {
            val c = comps(ci)
            planes(ci)((y * c.v / vMax) * planeW(ci) + (x * c.h / hMax)) & 0xFF
          }
          val yy = sample(0).toDouble
          val cb = sample(1) - 128.0
          val cr = sample(2) - 128.0
          def clamp(d: Double): Byte = {
            val v = math.round(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          out(o) = clamp(yy + 1.402 * cr)
          out(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp(yy + 1.772 * cb)
        }
        x += 1
      }
      y += 1
    }
    PpmImage(width, height, out)
  }

  // ---- lossless (SOF3) decoding ------------------------------------------

  /** Lossless-process scan (T.81 Annex H): Huffman-coded prediction
    * residuals — the DC tables code the difference's magnitude category
    * (0..16; category 16 means +32768 with NO appended bits, H.1.2.2),
    * followed by the category's EXTEND bits. Prediction per H.1.2.1: the
    * scan's Ss selects one of seven fixed predictors over the causal
    * neighbors Ra (left) / Rb (above) / Rc (above-left); the first sample
    * (and the first sample after every restart, which resets prediction
    * state like a scan start) predicts from 2^(P−Pt−1), the rest of the
    * first line from Ra, later line starts from Rb. Reconstruction is
    * (prediction + diff) mod 2^16 exactly as encoded — THE bit-exact
    * path of the family (no DCT, no quantization) — then the point
    * transform restores <<Pt and output keeps the high byte (the shared
    * >8-bit convention). Components are 1x1 (frame-checked), so the
    * interleaved MCU is one sample per component in raster order;
    * 3-component output is direct RGB (T.81 defines no color transform
    * for the lossless process, and JFIF's YCbCr convention is specific
    * to the DCT processes).
    */
  private def decodeLosslessScan(bytes: Array[Byte], start: Int,
                                 comps: Array[Component], dcTabs: Array[Huff],
                                 predictor: Int, pt: Int,
                                 restartInterval: Int, precision: Int,
                                 width: Int, height: Int): Option[PpmImage] = {
    comps.foreach { c => if (dcTabs(c.dcTable) == null) return None }
    val n = comps.length
    if (n != 1 && n != 3) return None
    val total = width * height
    val planes = Array.ofDim[Int](n, total)
    val br = new BitReader(bytes, start)
    val defaultPred = 1 << (precision - pt - 1)
    // restart resets prediction state exactly like a scan start: the next
    // sample of every component predicts from the default
    val resetNext = new Array[Boolean](n)
    java.util.Arrays.fill(resetNext, true)
    var rstCount = 0
    var sampleIdx = 0 // one interleaved MCU per pixel position
    while (sampleIdx < total) {
      if (restartInterval > 0 && sampleIdx > 0 &&
        sampleIdx % restartInterval == 0) {
        if (!br.restart(rstCount)) return None
        rstCount += 1
        java.util.Arrays.fill(resetNext, true)
      }
      val x = sampleIdx % width
      val y = sampleIdx / width
      var ci = 0
      while (ci < n) {
        val t = br.decodeHuff(dcTabs(comps(ci).dcTable))
        if (t < 0 || t > 16) return None
        val diff =
          if (t == 16) 32768 // H.1.2.2: no appended bits
          else if (t == 0) 0
          else {
            val v = br.receive(t)
            if (v < 0) return None
            extend(v, t)
          }
        val p = planes(ci)
        val px =
          if (resetNext(ci)) { resetNext(ci) = false; defaultPred }
          else if (y == 0) p(x - 1) // rest of the first line: Ra
          else if (x == 0) p((y - 1) * width) // line start: Rb
          else {
            val ra = p(y * width + x - 1)
            val rb = p((y - 1) * width + x)
            val rc = p((y - 1) * width + x - 1)
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
        p(y * width + x) = (px + diff) & 0xFFFF // H.1.2.1: modulo 2^16
        ci += 1
      }
      sampleIdx += 1
    }
    // point-transform restore then high byte; corrupt streams can leave
    // out-of-range samples after the mod-2^16 wrap — clamp, never throw
    val shift = precision - 8
    def to8(v: Int): Byte = {
      val s = (v << pt) >> shift
      (if (s < 0) 0 else if (s > 255) 255 else s).toByte
    }
    val out = new Array[Byte](total * 3)
    var i = 0
    while (i < total) {
      if (n == 1) {
        val g = to8(planes(0)(i))
        out(3 * i) = g; out(3 * i + 1) = g; out(3 * i + 2) = g
      } else {
        out(3 * i) = to8(planes(0)(i))
        out(3 * i + 1) = to8(planes(1)(i))
        out(3 * i + 2) = to8(planes(2)(i))
      }
      i += 1
    }
    Some(PpmImage(width, height, out))
  }

  /** Lossless ARITHMETIC scan (SOF11) per ITU T.81 Annex H.2: the same
    * prediction/reconstruction machinery as [[decodeLosslessScan]] (H.1
    * predictors, mod-2^16 wrap, point transform, restart-as-scan-start),
    * with the QM coder replacing Huffman and the difference coded by the
    * DC statistical model of F.2.4.1 under H.2's TWO-dimensional
    * conditioning: the zero/sign/small-magnitude decisions select one of
    * 25 contexts from the 5-category classifications (zero, ±small,
    * ±large per the DAC (L,U) bounds — the F.1.4.4.1.2 classifier) of Da
    * (the diff coded for the LEFT neighbor) and Db (the diff for the
    * ABOVE neighbor), and the magnitude-category/mantissa chains come in
    * two sets selected by whether Db is in a LARGE category. Decision
    * sequence is identical to the sequential DC model (H.2's normative
    * statement), including the X1-decision-in-the-SP/SN-bin convention
    * pinned for SOF9/10 in round 6. Statistics adapt across the scan and
    * reset (with the coder and the prediction/classification state) at
    * restart markers.
    *
    * Stats layout per DC table id (internal arrangement; only the
    * SHARING structure is normative): contexts 0..99 = 4×(5·Qa + Qb) +
    * {S0,SS,SP,SN}; magnitude set A at 100, set B (Db large) at 132 —
    * X2..X16 at base..base+14 (16-bit samples reach category 16),
    * mantissa at chainPos+15.
    */
  private def decodeLosslessScanArith(bytes: Array[Byte], start: Int,
                                      comps: Array[Component],
                                      dcCondL: Array[Int], dcCondU: Array[Int],
                                      predictor: Int, pt: Int,
                                      restartInterval: Int, precision: Int,
                                      width: Int, height: Int): Option[PpmImage] = {
    val n = comps.length
    if (n != 1 && n != 3) return None
    val total = width * height
    val planes = Array.ofDim[Int](n, total)
    val dec = new JpegArith.Decoder(bytes, start)
    dec.init()
    val stats = Array.fill(4)(new Array[Byte](JpegH2.StatsSize))
    // per-component neighbor-diff classifications (0 zero, 1/2 ±small,
    // 3/4 ±large): one row of "above" classes + the running "left" class
    val aboveCls = Array.ofDim[Int](n, width)
    val leftCls = new Array[Int](n)
    val defaultPred = 1 << (precision - pt - 1)
    val resetNext = new Array[Boolean](n)
    java.util.Arrays.fill(resetNext, true)
    var rstCount = 0
    var sampleIdx = 0
    while (sampleIdx < total) {
      if (restartInterval > 0 && sampleIdx > 0 &&
        sampleIdx % restartInterval == 0) {
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
      val x = sampleIdx % width
      val y = sampleIdx / width
      var ci = 0
      while (ci < n) {
        val c = comps(ci)
        val st = stats(c.dcTable)
        val qa = if (x == 0) 0 else leftCls(ci)
        val qb = aboveCls(ci)(x)
        val r = JpegH2.decodeDiff(dec, st, qa, qb,
          dcCondL(c.dcTable), dcCondU(c.dcTable))
        if (r == Long.MinValue) return None // corrupt magnitude chain
        val diff = r.toInt
        val cls = (r >> 32).toInt
        leftCls(ci) = cls
        aboveCls(ci)(x) = cls
        val p = planes(ci)
        val px =
          if (resetNext(ci)) { resetNext(ci) = false; defaultPred }
          else if (y == 0) p(x - 1)
          else if (x == 0) p((y - 1) * width)
          else {
            val ra = p(y * width + x - 1)
            val rb = p((y - 1) * width + x)
            val rc = p((y - 1) * width + x - 1)
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
        p(y * width + x) = (px + diff) & 0xFFFF
        ci += 1
      }
      sampleIdx += 1
    }
    val shift = precision - 8
    def to8(v: Int): Byte = {
      val s = (v << pt) >> shift
      (if (s < 0) 0 else if (s > 255) 255 else s).toByte
    }
    val out = new Array[Byte](total * 3)
    var i = 0
    while (i < total) {
      if (n == 1) {
        val g = to8(planes(0)(i))
        out(3 * i) = g; out(3 * i + 1) = g; out(3 * i + 2) = g
      } else {
        out(3 * i) = to8(planes(0)(i))
        out(3 * i + 1) = to8(planes(1)(i))
        out(3 * i + 2) = to8(planes(2)(i))
      }
      i += 1
    }
    Some(PpmImage(width, height, out))
  }

  // ---- progressive (SOF2) decoding ---------------------------------------

  /** Accumulated raw DCT coefficients across a progressive image's scans.
    * Coefficients live on the full interleaved MCU grid (natural order
    * within each 64-int block); non-interleaved scans touch only the
    * component's own ceil(size/8) block raster, per T.81 A.2.
    */
  private final class ProgState(comps: Array[Component], width: Int,
                                height: Int) {
    val hMax: Int = comps.map(_.h).max
    val vMax: Int = comps.map(_.v).max
    val mcusX: Int = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY: Int = (height + 8 * vMax - 1) / (8 * vMax)
    val blocksW: Array[Int] = comps.map(c => mcusX * c.h)
    val blocksH: Array[Int] = comps.map(c => mcusY * c.v)
    // single-component (non-interleaved) scans cover ceil(compDim/8)
    val compBlocksW: Array[Int] =
      comps.map(c => ((width * c.h + hMax - 1) / hMax + 7) / 8)
    val compBlocksH: Array[Int] =
      comps.map(c => ((height * c.v + vMax - 1) / vMax + 7) / 8)
    val coefs: Array[Array[Int]] =
      comps.indices.map(i => new Array[Int](blocksW(i) * blocksH(i) * 64)).toArray
    var sawScan = false
  }

  /** Decode ONE progressive ARITHMETIC scan (SOF10) into the coefficient
    * store, per T.81 G.2: the DC-first scan runs the F.2.4.1 difference
    * model in the point-transformed (>> Al) domain, DC refinement is one
    * fixed-bin decision per block, the AC-first scan is the sequential
    * F.2.4.2 model band-limited to [Ss, Se] with values scaled by Al
    * (no EOB runs — the arithmetic EOB decision is per block), and AC
    * refinement walks the band with the history-conditioned three-bin
    * layout (EOB decision beyond the history's last nonzero index,
    * correction bit at +2 for already-nonzero positions, significance at
    * +1 plus a fixed-bin sign for newly-nonzero ones). Statistics are
    * fresh per scan and reset at restarts, as is the coder. Returns the
    * byte offset of the terminating marker's 0xFF, or -1 on corruption.
    */
  private def decodeProgScanArith(bytes: Array[Byte], start: Int,
                                  st: ProgState, comps: Array[Component],
                                  scan: Array[Int], ss: Int, se: Int,
                                  ah: Int, al: Int, restartInterval: Int,
                                  dcCondL: Array[Int], dcCondU: Array[Int],
                                  acCondK: Array[Int]): Int = {
    val dec = new JpegArith.Decoder(bytes, start)
    dec.init()
    val dcStats = Array.fill(4)(new Array[Byte](64))
    val acStats = Array.fill(4)(new Array[Byte](256))
    val fixedBin = Array(JpegArith.FixedBin)
    val dcContext = new Array[Int](comps.length)
    val dcPred = new Array[Int](comps.length)
    val p1 = 1 << al
    val m1 = -1 << al

    def resetAll(): Unit = {
      java.util.Arrays.fill(dcPred, 0)
      java.util.Arrays.fill(dcContext, 0)
      dcStats.foreach(java.util.Arrays.fill(_, 0.toByte))
      acStats.foreach(java.util.Arrays.fill(_, 0.toByte))
      fixedBin(0) = JpegArith.FixedBin
    }

    if (ss == 0) {
      if (se != 0) return -1
      val interleaved = scan.length > 1
      val unitsX = if (interleaved) st.mcusX else st.compBlocksW(scan(0))
      val unitsY = if (interleaved) st.mcusY else st.compBlocksH(scan(0))
      val nUnits = unitsX * unitsY
      var unit = 0
      var rstCount = 0
      while (unit < nUnits) {
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          if (!dec.restart(rstCount)) return -1
          rstCount += 1
          resetAll()
        }
        val ux = unit % unitsX
        val uy = unit / unitsX
        var si = 0
        while (si < scan.length) {
          val ci = scan(si)
          val c = comps(ci)
          val coef = st.coefs(ci)
          val gridW = st.blocksW(ci)
          val hh = if (interleaved) c.h else 1
          val vv = if (interleaved) c.v else 1
          var by = 0
          while (by < vv) {
            var bx = 0
            while (bx < hh) {
              val bX = if (interleaved) ux * c.h + bx else ux
              val bY = if (interleaved) uy * c.v + by else uy
              val base = (bY * gridW + bX) * 64
              if (ah == 0) { // DC first: diff model in the >> Al domain
                val dst = dcStats(c.dcTable)
                var stx = dcContext(ci)
                if (dec.decode(dst, stx) == 0) dcContext(ci) = 0
                else {
                  val sign = dec.decode(dst, stx + 1)
                  stx += 2 + sign
                  var m = 0
                  if (dec.decode(dst, stx) != 0) {
                    m = 1
                    // X1 decision in the same SP/SN bin (jdarith F.23)
                    if (dec.decode(dst, stx) != 0) {
                      m = 2
                      stx = 20
                      while (dec.decode(dst, stx) != 0) {
                        m <<= 1
                        if (m == 0x8000) return -1
                        stx += 1
                      }
                    }
                  }
                  dcContext(ci) =
                    if (m < ((1 << dcCondL(c.dcTable)) >> 1)) 0
                    else if (m > ((1 << dcCondU(c.dcTable)) >> 1)) 12 + sign * 4
                    else 4 + sign * 4
                  var v = m
                  stx += 14
                  var bit = m >> 1
                  while (bit != 0) {
                    if (dec.decode(dst, stx) != 0) v |= bit
                    bit >>= 1
                  }
                  v += 1
                  dcPred(ci) += (if (sign != 0) -v else v)
                }
                coef(base) = dcPred(ci) << al
              } else { // DC refinement: one fixed-bin bit per block
                if (dec.decode(fixedBin, 0) != 0) coef(base) |= p1
              }
              bx += 1
            }
            by += 1
          }
          si += 1
        }
        unit += 1
      }
    } else {
      if (scan.length != 1) return -1
      val ci = scan(0)
      val c = comps(ci)
      val coef = st.coefs(ci)
      val gridW = st.blocksW(ci)
      val ast = acStats(c.acTable)
      val kx = acCondK(c.acTable)
      val unitsX = st.compBlocksW(ci)
      val nUnits = unitsX * st.compBlocksH(ci)
      var unit = 0
      var rstCount = 0
      while (unit < nUnits) {
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          if (!dec.restart(rstCount)) return -1
          rstCount += 1
          resetAll()
        }
        val base = ((unit / unitsX) * gridW + unit % unitsX) * 64
        if (ah == 0) { // first scan of the band, values scaled by Al
          var k = ss
          var open = true
          while (open && k <= se) {
            var st0 = 3 * (k - 1)
            if (dec.decode(ast, st0) != 0) open = false // EOB
            else {
              while (dec.decode(ast, st0 + 1) == 0) {
                st0 += 3; k += 1
                if (k > se) return -1
              }
              val sign = dec.decode(fixedBin, 0)
              var st2 = st0 + 2
              var m = 0
              if (dec.decode(ast, st2) != 0) {
                m = 1
                // X1 decision in the same SE+2 bin (jdarith F.23)
                if (dec.decode(ast, st2) != 0) {
                  m = 2
                  st2 = if (k <= kx) 189 else 217
                  while (dec.decode(ast, st2) != 0) {
                    m <<= 1
                    if (m == 0x8000) return -1
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
              coef(base + Zigzag(k)) = (if (sign != 0) -v else v) << al
              k += 1
            }
          }
        } else { // AC refinement (G.1.3.3)
          var kex = se
          while (kex >= ss && coef(base + Zigzag(kex)) == 0) kex -= 1
          var k = ss
          var eob = false
          while (k <= se && !eob) {
            val st0 = 3 * (k - 1)
            if (k > kex && dec.decode(ast, st0) != 0) eob = true
            else {
              var stw = st0
              var resolved = false
              while (!resolved) {
                val idx = base + Zigzag(k)
                if (coef(idx) != 0) {
                  if (dec.decode(ast, stw + 2) != 0 && (coef(idx) & p1) == 0)
                    coef(idx) += (if (coef(idx) >= 0) p1 else m1)
                  resolved = true
                } else if (dec.decode(ast, stw + 1) != 0) {
                  coef(idx) = if (dec.decode(fixedBin, 0) != 0) m1 else p1
                  resolved = true
                } else {
                  stw += 3; k += 1
                  if (k > se) return -1
                }
              }
              k += 1
            }
          }
        }
        unit += 1
      }
    }
    st.sawScan = true
    dec.segmentEnd
  }

  /** Decode ONE progressive scan into the coefficient store. Returns the
    * byte offset where the entropy-coded segment ended (the next marker's
    * 0xFF), or -1 on any corruption.
    */
  private def decodeProgScan(bytes: Array[Byte], start: Int, st: ProgState,
                             comps: Array[Component], scan: Array[Int],
                             ss: Int, se: Int, ah: Int, al: Int,
                             restartInterval: Int, dcTabs: Array[Huff],
                             acTabs: Array[Huff], precision: Int): Int = {
    val maxDcCat = if (precision == 12) 15 else 11 // T.81 Table F.1 vs F.12
    val br = new BitReader(bytes, start)
    val dcPred = new Array[Int](comps.length)
    var eobrun = 0
    val p1 = 1 << al
    val m1 = -1 << al

    // refinement of an already-nonzero coefficient: one correction bit
    def refineNonzero(coef: Array[Int], idx: Int): Boolean = {
      val b = br.readBit()
      if (b < 0) return false
      if (b == 1 && (coef(idx) & p1) == 0)
        coef(idx) += (if (coef(idx) >= 0) p1 else m1)
      true
    }

    if (ss == 0) {
      // DC scan: interleaved over MCUs when multi-component, else the
      // single component's own block raster. se must be 0 (T.81 G.1.1.1).
      if (se != 0) return -1
      if (ah == 0) {
        var i = 0
        while (i < scan.length) {
          if (dcTabs(comps(scan(i)).dcTable) == null) return -1
          i += 1
        }
      }
      val interleaved = scan.length > 1
      val unitsX = if (interleaved) st.mcusX else st.compBlocksW(scan(0))
      val unitsY = if (interleaved) st.mcusY else st.compBlocksH(scan(0))
      val nUnits = unitsX * unitsY
      var unit = 0
      var rstCount = 0
      while (unit < nUnits) {
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          if (!br.restart(rstCount)) return -1
          rstCount += 1
          java.util.Arrays.fill(dcPred, 0)
        }
        val ux = unit % unitsX
        val uy = unit / unitsX
        var si = 0
        while (si < scan.length) {
          val ci = scan(si)
          val c = comps(ci)
          val coef = st.coefs(ci)
          val gridW = st.blocksW(ci)
          val hh = if (interleaved) c.h else 1
          val vv = if (interleaved) c.v else 1
          var by = 0
          while (by < vv) {
            var bx = 0
            while (bx < hh) {
              val bX = if (interleaved) ux * c.h + bx else ux
              val bY = if (interleaved) uy * c.v + by else uy
              val base = (bY * gridW + bX) * 64
              if (ah == 0) { // first DC scan: diff-coded, scaled by Al
                val t = br.decodeHuff(dcTabs(c.dcTable))
                if (t < 0 || t > maxDcCat) return -1
                val v = if (t == 0) 0 else br.receive(t)
                if (v < 0) return -1
                dcPred(ci) += extend(v, t)
                coef(base) = dcPred(ci) << al
              } else { // DC refinement: one appended bit per block
                val b = br.readBit()
                if (b < 0) return -1
                if (b == 1) coef(base) |= p1
              }
              bx += 1
            }
            by += 1
          }
          si += 1
        }
        unit += 1
      }
    } else {
      // AC scan: always ONE component, non-interleaved (T.81 B.2.3)
      if (scan.length != 1) return -1
      val ci = scan(0)
      val c = comps(ci)
      val coef = st.coefs(ci)
      val gridW = st.blocksW(ci)
      val huff = acTabs(c.acTable)
      if (huff == null) return -1
      val unitsX = st.compBlocksW(ci)
      val nUnits = unitsX * st.compBlocksH(ci)
      var unit = 0
      var rstCount = 0
      while (unit < nUnits) {
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          if (!br.restart(rstCount)) return -1
          rstCount += 1
          eobrun = 0
        }
        val base = ((unit / unitsX) * gridW + unit % unitsX) * 64
        if (ah == 0) { // first scan of this band (values scaled by Al)
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            var open = true
            while (open && k <= se) {
              val rs = br.decodeHuff(huff)
              if (rs < 0) return -1
              val run = rs >> 4
              val size = rs & 0x0F
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else { // EOBn: run of (1<<run)+bits end-of-band blocks
                  eobrun = (1 << run) - 1
                  if (run > 0) {
                    val v = br.receive(run)
                    if (v < 0) return -1
                    eobrun += v
                  }
                  open = false
                }
              } else {
                k += run
                if (k > se) return -1
                val v = br.receive(size)
                if (v < 0) return -1
                coef(base + Zigzag(k)) = extend(v, size) << al
                k += 1
              }
            }
          }
        } else { // refinement scan, T.81 G.1.2.3 (correction-bit walk)
          var k = ss
          if (eobrun == 0) {
            var brk = false
            while (k <= se && !brk) {
              val rs = br.decodeHuff(huff)
              if (rs < 0) return -1
              var run = rs >> 4
              val size = rs & 0x0F
              var newVal = 0
              if (size == 0) {
                if (run < 15) { // EOBn
                  eobrun = 1 << run
                  if (run > 0) {
                    val v = br.receive(run)
                    if (v < 0) return -1
                    eobrun += v
                  }
                  brk = true
                } // run == 15: ZRL — skip 16 zero-HISTORY coefficients
              } else {
                if (size != 1) return -1 // refinement sends ±1 only
                val b = br.readBit()
                if (b < 0) return -1
                newVal = if (b == 1) p1 else m1
              }
              if (!brk) {
                // walk forward: nonzero-history coefficients absorb a
                // correction bit each; zero-history ones count down the
                // run until the new value's position is reached
                var placed = false
                while (!placed && k <= se) {
                  val idx = base + Zigzag(k)
                  if (coef(idx) != 0) {
                    if (!refineNonzero(coef, idx)) return -1
                    k += 1
                  } else if (run == 0) {
                    if (newVal != 0) coef(idx) = newVal
                    placed = true
                  } else { run -= 1; k += 1 }
                }
                // a valid stream always lands its run inside the band —
                // walking past `se` without placing means the entropy
                // stream has desynced; fail the scan rather than decode
                // the remaining blocks into garbage (ADVICE r4)
                if (!placed) return -1
                k += 1 // past the placed position
              }
            }
          }
          if (eobrun > 0) { // end-of-band: correction bits only
            while (k <= se) {
              val idx = base + Zigzag(k)
              if (coef(idx) != 0 && !refineNonzero(coef, idx)) return -1
              k += 1
            }
            eobrun -= 1
          }
        }
        unit += 1
      }
    }
    st.sawScan = true
    br.pos
  }

  /** Dequantize + IDCT the accumulated coefficients and assemble RGB —
    * runs once, at EOI, after every scan has contributed.
    */
  private def reconstructProgressive(st: ProgState, comps: Array[Component],
                                     quant: Array[Array[Int]],
                                     width: Int,
                                     height: Int,
                                     precision: Int): Option[PpmImage] = {
    val w = width
    val h = height
    val half = (1 << (precision - 1)).toDouble
    val maxSample = (1 << precision) - 1
    val downShift = precision - 8
    val planeW = comps.indices.map(i => st.blocksW(i) * 8).toArray
    val planes = comps.indices.map(i =>
      new Array[Byte](st.blocksW(i) * 8 * st.blocksH(i) * 8)).toArray
    val block = new Array[Double](64)
    var ci = 0
    while (ci < comps.length) {
      val qz = quant(comps(ci).tq)
      val qNat = new Array[Int](64)
      var k = 0
      while (k < 64) { qNat(Zigzag(k)) = qz(k); k += 1 }
      val coef = st.coefs(ci)
      val gw = st.blocksW(ci)
      val gh = st.blocksH(ci)
      val pw = planeW(ci)
      var bY = 0
      while (bY < gh) {
        var bX = 0
        while (bX < gw) {
          val base = (bY * gw + bX) * 64
          var i = 0
          while (i < 64) { block(i) = (coef(base + i) * qNat(i)).toDouble; i += 1 }
          val px = idct(block)
          val plane = planes(ci)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val s = math.round(px(y * 8 + x) + half).toInt
              val cl = if (s < 0) 0 else if (s > maxSample) maxSample else s
              plane((bY * 8 + y) * pw + bX * 8 + x) = (cl >> downShift).toByte
              x += 1
            }
            y += 1
          }
          bX += 1
        }
        bY += 1
      }
      ci += 1
    }
    Some(assemble(comps, planes, planeW, w, h))
  }

  // ---- minimal encoder (for round-trip specs) ----------------------------

  // T.81 Annex K typical Huffman tables (public spec constants)
  private val DcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).toArray
  private val DcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).toArray
  private[operators] val AcLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private[operators] val AcLumaVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)
  private val AcChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119)
  private val AcChromaVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)

  /** (code, length) per symbol from the DHT layout — encoder side. */
  private[operators] def codes(counts: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < counts(len - 1)) {
        out += vals(k) -> ((code, len))
        code += 1
        k += 1
        i += 1
      }
      code <<= 1
      len += 1
    }
    out.result()
  }

  private[operators] final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { write((1 << (8 - n)) - 1, 8 - n) } // pad 1s
  }

  private[operators] def category(v: Int): Int = {
    var t = 0
    var a = math.abs(v)
    while (a > 0) { t += 1; a >>= 1 }
    t
  }

  /** Encode RGB pixels as a baseline JFIF JPEG with FLAT (all-ones)
    * quantization tables — near-lossless, so round-trip specs can assert
    * tight pixel bounds. `subsample` selects 4:4:4 (false) or 4:2:0 (true).
    */
  def encode(img: PpmImage, subsample: Boolean = false,
             restartInterval: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int): Unit = { out.write(0xFF); out.write(b) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }

    m(0xD8) // SOI
    m(0xDB); u16(2 + 1 + 64); out.write(0x00) // DQT table 0, 8-bit, flat
    (0 until 64).foreach(_ => out.write(1))
    if (restartInterval > 0) { m(0xDD); u16(4); u16(restartInterval) }
    val hv = if (subsample) 0x22 else 0x11
    m(0xC0) // SOF0: YCbCr, luma h/v per `subsample`, all on quant table 0
    u16(8 + 3 * 3); out.write(8); u16(img.height); u16(img.width); out.write(3)
    out.write(1); out.write(hv); out.write(0)
    out.write(2); out.write(0x11); out.write(0)
    out.write(3); out.write(0x11); out.write(0)
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      m(0xC4); u16(2 + 1 + 16 + vals.length); out.write((tc << 4) | th)
      bits.foreach(out.write); vals.foreach(out.write)
    }
    dht(0, 0, DcLumaBits, DcLumaVals); dht(1, 0, AcLumaBits, AcLumaVals)
    dht(0, 1, DcChromaBits, DcChromaVals); dht(1, 1, AcChromaBits, AcChromaVals)
    m(0xDA); u16(2 + 1 + 2 * 3 + 3); out.write(3) // SOS
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x11)
    out.write(3); out.write(0x11)
    out.write(0); out.write(63); out.write(0)

    // RGB -> YCbCr planes (JFIF), padded to the MCU grid by edge clamp
    val hMax = if (subsample) 2 else 1
    val mcusX = (img.width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (img.height + 8 * hMax - 1) / (8 * hMax)
    def px(x: Int, y: Int, ch: Int): Double = {
      val cx = math.min(math.max(x, 0), img.width - 1)
      val cy = math.min(math.max(y, 0), img.height - 1)
      img.pixels((cy * img.width + cx) * 3 + ch) & 0xFF
    }
    def ycc(x: Int, y: Int): (Double, Double, Double) = {
      val (r, g, b) = (px(x, y, 0), px(x, y, 1), px(x, y, 2))
      (0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)
    }

    val dcLu = codes(DcLumaBits, DcLumaVals)
    val acLu = codes(AcLumaBits, AcLumaVals)
    val dcCh = codes(DcChromaBits, DcChromaVals)
    val acCh = codes(AcChromaBits, AcChromaVals)
    val bw = new BitWriter(out)
    val dcPred = new Array[Int](3)

    def encodeBlock(samples: Array[Double], ci: Int): Unit = {
      val f = fdct(samples)
      val zz = new Array[Int](64)
      var i = 0
      while (i < 64) { zz(i) = math.round(f(Zigzag(i))).toInt; i += 1 }
      val (dc, ac) = if (ci == 0) (dcLu, acLu) else (dcCh, acCh)
      val diff = zz(0) - dcPred(ci)
      dcPred(ci) = zz(0)
      val t = category(diff)
      val (c0, l0) = dc(t)
      bw.write(c0, l0)
      if (t > 0) bw.write(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      var k = 1
      var lastNz = 63
      while (lastNz > 0 && zz(lastNz) == 0) lastNz -= 1
      while (k <= lastNz) {
        var run = 0
        while (zz(k) == 0) { run += 1; k += 1 }
        while (run > 15) { val (cz, lz) = ac(0xF0); bw.write(cz, lz); run -= 16 }
        val v = zz(k)
        val s = category(v)
        val (ca, la) = ac((run << 4) | s)
        bw.write(ca, la)
        bw.write(if (v < 0) v + (1 << s) - 1 else v, s)
        k += 1
      }
      if (lastNz < 63) { val (ce, le) = ac(0x00); bw.write(ce, le) }
    }

    var rstCount = 0
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        m(0xD0 + (rstCount % 8)) // RSTn
        rstCount += 1
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      val samples = new Array[Double](64)
      if (!subsample) {
        var ci = 0
        while (ci < 3) {
          var i = 0
          while (i < 64) {
            val (yv, cb, cr) = ycc(mx * 8 + i % 8, my * 8 + i / 8)
            samples(i) = (if (ci == 0) yv else if (ci == 1) cb else cr) - 128.0
            i += 1
          }
          encodeBlock(samples, ci)
          ci += 1
        }
      } else {
        // 4 luma blocks, then one 2x2-averaged block per chroma channel
        var by = 0
        while (by < 2) {
          var bx = 0
          while (bx < 2) {
            var i = 0
            while (i < 64) {
              samples(i) =
                ycc(mx * 16 + bx * 8 + i % 8, my * 16 + by * 8 + i / 8)._1 - 128.0
              i += 1
            }
            encodeBlock(samples, 0)
            bx += 1
          }
          by += 1
        }
        var ci = 1
        while (ci <= 2) {
          var i = 0
          while (i < 64) {
            val sx = mx * 16 + (i % 8) * 2
            val sy = my * 16 + (i / 8) * 2
            val cs = Seq((sx, sy), (sx + 1, sy), (sx, sy + 1), (sx + 1, sy + 1))
              .map(p => if (ci == 1) ycc(p._1, p._2)._2 else ycc(p._1, p._2)._3)
            samples(i) = cs.sum / 4.0 - 128.0
            i += 1
          }
          encodeBlock(samples, ci)
          ci += 1
        }
      }
      mcu += 1
    }
    bw.flush()
    m(0xD9) // EOI
    out.toByteArray
  }

  /** Encode pixels as a LOSSLESS (SOF3) JPEG — the reference encoder for
    * the decoder's bit-exact roundtrip spec. One Huffman table coding all
    * 17 difference categories at a flat 5 bits (valid canonical: 17 < 2^5,
    * max code short of the all-ones reserve), any predictor 1..7, optional
    * point transform and restarts; precision > 8 upshifts the 8-bit input
    * so the decoder's high-byte convention restores it exactly. Gray
    * emits one component; color emits the three channels DIRECTLY (no
    * YCbCr — T.81 defines no color transform for the lossless process).
    * Prediction state mirrors decodeLosslessScan exactly (default after
    * scan start / restart, Ra on the first line, Rb at line starts).
    */
  def encodeLossless(img: PpmImage, gray: Boolean = false,
                     predictor: Int = 1, precision: Int = 8, pt: Int = 0,
                     restartInterval: Int = 0): Array[Byte] = {
    require(predictor >= 1 && predictor <= 7, "predictor 1..7")
    require(precision >= 8 && precision <= 16, "precision 8..16")
    require(pt >= 0 && pt < precision, "point transform < precision")
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int): Unit = { out.write(0xFF); out.write(b) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    val n = if (gray) 1 else 3

    m(0xD8) // SOI
    val dcBits = Array(0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val dcVals = (0 to 16).toArray
    m(0xC4); u16(2 + 1 + 16 + 17); out.write(0x00) // DHT: DC table 0
    dcBits.foreach(out.write); dcVals.foreach(out.write)
    if (restartInterval > 0) { m(0xDD); u16(4); u16(restartInterval) }
    m(0xC3) // SOF3
    u16(8 + 3 * n); out.write(precision); u16(img.height); u16(img.width)
    out.write(n)
    (0 until n).foreach { i =>
      out.write(i + 1); out.write(0x11); out.write(0)
    }
    m(0xDA); u16(6 + 2 * n); out.write(n) // SOS
    (0 until n).foreach { i => out.write(i + 1); out.write(0x00) }
    out.write(predictor); out.write(0); out.write(pt)

    val dc = codes(dcBits, dcVals)
    val bw = new BitWriter(out)
    val total = img.width * img.height
    val planes = Array.ofDim[Int](n, total) // reconstructed (post-Pt) samples
    val resetNext = new Array[Boolean](n)
    java.util.Arrays.fill(resetNext, true)
    var rstCount = 0
    var sampleIdx = 0
    while (sampleIdx < total) {
      if (restartInterval > 0 && sampleIdx > 0 &&
        sampleIdx % restartInterval == 0) {
        bw.flush()
        m(0xD0 + (rstCount % 8))
        rstCount += 1
        java.util.Arrays.fill(resetNext, true)
      }
      val x = sampleIdx % img.width
      val y = sampleIdx / img.width
      var ci = 0
      while (ci < n) {
        val raw = img.pixels(3 * sampleIdx + (if (gray) 0 else ci)) & 0xFF
        val sample = (raw << (precision - 8)) >> pt
        val p = planes(ci)
        val px =
          if (resetNext(ci)) { resetNext(ci) = false; 1 << (precision - pt - 1) }
          else if (y == 0) p(x - 1)
          else if (x == 0) p((y - 1) * img.width)
          else {
            val ra = p(y * img.width + x - 1)
            val rb = p((y - 1) * img.width + x)
            val rc = p((y - 1) * img.width + x - 1)
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
        var diff = (sample - px) & 0xFFFF
        if (diff >= 32768) diff -= 65536 // to [-32768, 32767]
        if (diff == -32768) { // ≡ +32768 mod 2^16: category 16, no bits
          val (c16, l16) = dc(16)
          bw.write(c16, l16)
        } else {
          val t = category(diff)
          val (c0, l0) = dc(t)
          bw.write(c0, l0)
          if (t > 0)
            bw.write(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        }
        p(y * img.width + x) = sample
        ci += 1
      }
      sampleIdx += 1
    }
    bw.flush()
    m(0xD9) // EOI
    out.toByteArray
  }

  /** Encode RGB pixels as a lossless ARITHMETIC-coded (SOF11) JPEG: the
    * same prediction pipeline as [[encodeLossless]] driven through the QM
    * coder under the Annex H.2 statistical model (25 (Da, Db) contexts
    * for zero/sign/small, two magnitude chains selected by Db-large) —
    * the mirror of [[decodeLosslessScanArith]]'s model, written against
    * the spec so the spec's round-trips pin both directions; the
    * hand-assembled longhand streams in JpegCodecSpec pin the decoder
    * independently of this encoder.
    */
  def encodeLosslessArith(img: PpmImage, gray: Boolean = false,
                          predictor: Int = 1, precision: Int = 8, pt: Int = 0,
                          restartInterval: Int = 0,
                          dcL: Int = 0, dcU: Int = 1): Array[Byte] = {
    require(predictor >= 1 && predictor <= 7, "predictor 1..7")
    require(precision >= 8 && precision <= 16, "precision 8..16")
    require(pt >= 0 && pt < precision, "point transform < precision")
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int): Unit = { out.write(0xFF); out.write(b) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    val n = if (gray) 1 else 3

    m(0xD8) // SOI
    m(0xCC); u16(2 + 2); out.write(0x00); out.write((dcU << 4) | dcL) // DAC
    if (restartInterval > 0) { m(0xDD); u16(4); u16(restartInterval) }
    m(0xCB) // SOF11
    u16(8 + 3 * n); out.write(precision); u16(img.height); u16(img.width)
    out.write(n)
    (0 until n).foreach { i =>
      out.write(i + 1); out.write(0x11); out.write(0)
    }
    m(0xDA); u16(6 + 2 * n); out.write(n) // SOS
    (0 until n).foreach { i => out.write(i + 1); out.write(0x00) }
    out.write(predictor); out.write(0); out.write(pt)

    val enc = new JpegArith.Encoder
    val stats = new Array[Byte](JpegH2.StatsSize)
    val total = img.width * img.height
    val planes = Array.ofDim[Int](n, total)
    val aboveCls = Array.ofDim[Int](n, img.width)
    val leftCls = new Array[Int](n)
    val resetNext = new Array[Boolean](n)
    java.util.Arrays.fill(resetNext, true)
    var rstCount = 0
    var sampleIdx = 0
    while (sampleIdx < total) {
      if (restartInterval > 0 && sampleIdx > 0 &&
        sampleIdx % restartInterval == 0) {
        enc.flushSegment()
        enc.appendMarker(0xD0 + (rstCount % 8))
        rstCount += 1
        java.util.Arrays.fill(resetNext, true)
        java.util.Arrays.fill(stats, 0.toByte)
        var c = 0
        while (c < n) {
          java.util.Arrays.fill(aboveCls(c), 0)
          leftCls(c) = 0
          c += 1
        }
      }
      val x = sampleIdx % img.width
      val y = sampleIdx / img.width
      var ci = 0
      while (ci < n) {
        val raw = img.pixels(3 * sampleIdx + (if (gray) 0 else ci)) & 0xFF
        val sample = (raw << (precision - 8)) >> pt
        val p = planes(ci)
        val px =
          if (resetNext(ci)) { resetNext(ci) = false; 1 << (precision - pt - 1) }
          else if (y == 0) p(x - 1)
          else if (x == 0) p((y - 1) * img.width)
          else {
            val ra = p(y * img.width + x - 1)
            val rb = p((y - 1) * img.width + x)
            val rc = p((y - 1) * img.width + x - 1)
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
        var diff = (sample - px) & 0xFFFF
        if (diff >= 32768) diff -= 65536 // -32768 ≡ +32768: JpegH2 handles it
        val qa = if (x == 0) 0 else leftCls(ci)
        val qb = aboveCls(ci)(x)
        val cls = JpegH2.encodeDiff(enc, stats, qa, qb, diff, dcL, dcU)
        leftCls(ci) = cls
        aboveCls(ci)(x) = cls
        p(y * img.width + x) = sample
        ci += 1
      }
      sampleIdx += 1
    }
    enc.flushSegment()
    out.write(enc.bytes)
    m(0xD9) // EOI
    out.toByteArray
  }

  /** Encode RGB pixels as a sequential ARITHMETIC-coded (SOF9) JFIF
    * JPEG: the same flat quantization and DCT coefficients as [[encode]]
    * driven through the T.81 Annex D QM coder and the F.2.4 statistical
    * models (JpegArith) — so a correct arithmetic decode reproduces the
    * baseline decode of the same image BIT-FOR-BIT, which is what the
    * spec asserts. Emits a DAC marker carrying the (L, U) DC and Kx AC
    * conditioning so non-default conditioning round-trips too. Component
    * Y uses conditioning table 0, Cb/Cr table 1 (the Annex K table-id
    * convention the Huffman encoder uses).
    */
  def encodeArith(img: PpmImage, subsample: Boolean = false,
                  restartInterval: Int = 0,
                  dcL: Int = 0, dcU: Int = 1, acK: Int = 5): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int): Unit = { out.write(0xFF); out.write(b) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }

    m(0xD8) // SOI
    m(0xDB); u16(2 + 1 + 64); out.write(0x00)
    (0 until 64).foreach(_ => out.write(1))
    if (restartInterval > 0) { m(0xDD); u16(4); u16(restartInterval) }
    m(0xCC); u16(2 + 2 * 4) // DAC: DC 0/1 with (L,U), AC 0/1 with Kx
    out.write(0x00); out.write((dcU << 4) | dcL)
    out.write(0x01); out.write((dcU << 4) | dcL)
    out.write(0x10); out.write(acK)
    out.write(0x11); out.write(acK)
    val hv = if (subsample) 0x22 else 0x11
    m(0xC9) // SOF9: extended sequential, arithmetic
    u16(8 + 3 * 3); out.write(8); u16(img.height); u16(img.width); out.write(3)
    out.write(1); out.write(hv); out.write(0)
    out.write(2); out.write(0x11); out.write(0)
    out.write(3); out.write(0x11); out.write(0)
    m(0xDA); u16(2 + 1 + 2 * 3 + 3); out.write(3) // SOS: Tc/Ta = cond ids
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x11)
    out.write(3); out.write(0x11)
    out.write(0); out.write(63); out.write(0)

    val hMax = if (subsample) 2 else 1
    val mcusX = (img.width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (img.height + 8 * hMax - 1) / (8 * hMax)
    def px(x: Int, y: Int, ch: Int): Double = {
      val cx = math.min(math.max(x, 0), img.width - 1)
      val cy = math.min(math.max(y, 0), img.height - 1)
      img.pixels((cy * img.width + cx) * 3 + ch) & 0xFF
    }
    def ycc(x: Int, y: Int): (Double, Double, Double) = {
      val (r, g, b) = (px(x, y, 0), px(x, y, 1), px(x, y, 2))
      (0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)
    }

    val enc = new JpegArith.Encoder
    val dcStats = Array.fill(2)(new Array[Byte](64))
    val acStats = Array.fill(2)(new Array[Byte](256))
    val fixedBin = Array(JpegArith.FixedBin)
    val dcContext = new Array[Int](3)
    val dcPred = new Array[Int](3)

    def encodeBlockArith(samples: Array[Double], ci: Int): Unit = {
      val f = fdct(samples)
      val zz = new Array[Int](64)
      var i = 0
      while (i < 64) { zz(i) = math.round(f(Zigzag(i))).toInt; i += 1 }
      val tb = if (ci == 0) 0 else 1
      val dst = dcStats(tb)
      val ast = acStats(tb)
      // --- DC difference (F.1.4.1 statistical model) ---
      val diff = zz(0) - dcPred(ci)
      dcPred(ci) = zz(0)
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
            // X1 decision in the same SP/SN bin (jcarith Figure F.8)
            enc.encode(dst, st, 1)
            mm = 2
            st = 20
            v2 >>= 1
            while (v2 != 0) { enc.encode(dst, st, 1); mm <<= 1; st += 1; v2 >>= 1 }
          }
        }
        enc.encode(dst, st, 0) // category terminator
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
      // --- AC coefficients (F.1.4.2 statistical model) ---
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
            // X1 decision in the same SE+2 bin (jcarith Figure F.8)
            enc.encode(ast, st2, 1)
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
      if (ke < 63) enc.encode(ast, 3 * (k - 1), 1) // EOB decision
    }

    var rstCount = 0
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        enc.flushSegment()
        enc.appendMarker(0xD0 + (rstCount % 8))
        rstCount += 1
        java.util.Arrays.fill(dcPred, 0)
        java.util.Arrays.fill(dcContext, 0)
        dcStats.foreach(java.util.Arrays.fill(_, 0.toByte))
        acStats.foreach(java.util.Arrays.fill(_, 0.toByte))
        fixedBin(0) = JpegArith.FixedBin
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      val samples = new Array[Double](64)
      if (!subsample) {
        var ci = 0
        while (ci < 3) {
          var i = 0
          while (i < 64) {
            val (yv, cb, cr) = ycc(mx * 8 + i % 8, my * 8 + i / 8)
            samples(i) = (if (ci == 0) yv else if (ci == 1) cb else cr) - 128.0
            i += 1
          }
          encodeBlockArith(samples, ci)
          ci += 1
        }
      } else {
        var by = 0
        while (by < 2) {
          var bx = 0
          while (bx < 2) {
            var i = 0
            while (i < 64) {
              samples(i) =
                ycc(mx * 16 + bx * 8 + i % 8, my * 16 + by * 8 + i / 8)._1 - 128.0
              i += 1
            }
            encodeBlockArith(samples, 0)
            bx += 1
          }
          by += 1
        }
        var ci = 1
        while (ci <= 2) {
          var i = 0
          while (i < 64) {
            val sx = mx * 16 + (i % 8) * 2
            val sy = my * 16 + (i / 8) * 2
            val cs = Seq((sx, sy), (sx + 1, sy), (sx, sy + 1), (sx + 1, sy + 1))
              .map(p => if (ci == 1) ycc(p._1, p._2)._2 else ycc(p._1, p._2)._3)
            samples(i) = cs.sum / 4.0 - 128.0
            i += 1
          }
          encodeBlockArith(samples, ci)
          ci += 1
        }
      }
      mcu += 1
    }
    enc.flushSegment()
    out.write(enc.bytes)
    m(0xD9) // EOI
    out.toByteArray
  }

  // ---- progressive encoder (for round-trip specs) ------------------------

  // AC table holding EVERY symbol (EOBn included, which the Annex K
  // baseline tables lack): canonical, 255 symbols at 9 bits + 1 at 10
  private val AcAllBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0)
  private val AcAllVals: Array[Int] = (0 until 256).toArray

  /** Encode RGB pixels as a PROGRESSIVE (SOF2) JFIF JPEG following
    * `script`: one (componentIndices, Ss, Se, Ah, Al) tuple per scan.
    * Same flat quantization and the same DCT coefficients as [[encode]],
    * re-ordered into scans — so a correct progressive decode reproduces
    * the baseline decode of the same image BIT-FOR-BIT. Supports
    * spectral selection, successive approximation (DC + AC first and
    * refinement passes) and EOB runs; no restart intervals.
    */
  def encodeProgressive(img: PpmImage,
                        script: Seq[(Seq[Int], Int, Int, Int, Int)],
                        subsample: Boolean = false): Array[Byte] = {
    val hMax = if (subsample) 2 else 1
    val mcusX = (img.width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (img.height + 8 * hMax - 1) / (8 * hMax)
    val compH = Array(hMax, 1, 1)
    val blocksW = compH.map(h => mcusX * h)
    val blocksH = compH.map(h => mcusY * h)
    val compBlocksW = compH.map(h => ((img.width * h + hMax - 1) / hMax + 7) / 8)
    val compBlocksH = compH.map(h => ((img.height * h + hMax - 1) / hMax + 7) / 8)

    def px(x: Int, y: Int, ch: Int): Double = {
      val cx = math.min(math.max(x, 0), img.width - 1)
      val cy = math.min(math.max(y, 0), img.height - 1)
      img.pixels((cy * img.width + cx) * 3 + ch) & 0xFF
    }
    def ycc(x: Int, y: Int): (Double, Double, Double) = {
      val (r, g, b) = (px(x, y, 0), px(x, y, 1), px(x, y, 2))
      (0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)
    }

    // every block's zigzag coefficients, full MCU grid per component
    val coefs: Array[Array[Array[Int]]] = (0 until 3).map { ci =>
      val out = new Array[Array[Int]](blocksW(ci) * blocksH(ci))
      val samples = new Array[Double](64)
      var bY = 0
      while (bY < blocksH(ci)) {
        var bX = 0
        while (bX < blocksW(ci)) {
          var i = 0
          while (i < 64) {
            val x = bX * 8 + i % 8
            val y = bY * 8 + i / 8
            samples(i) = (ci match {
              case 0 => ycc(x, y)._1
              case _ if !subsample => if (ci == 1) ycc(x, y)._2 else ycc(x, y)._3
              case _ => // 4:2:0 chroma: 2x2 average of the source
                val cs = Seq((2 * x, 2 * y), (2 * x + 1, 2 * y),
                  (2 * x, 2 * y + 1), (2 * x + 1, 2 * y + 1))
                  .map(p => if (ci == 1) ycc(p._1, p._2)._2 else ycc(p._1, p._2)._3)
                cs.sum / 4.0
            }) - 128.0
            i += 1
          }
          val f = fdct(samples)
          val zz = new Array[Int](64)
          var k = 0
          while (k < 64) { zz(k) = math.round(f(Zigzag(k))).toInt; k += 1 }
          out(bY * blocksW(ci) + bX) = zz
          bX += 1
        }
        bY += 1
      }
      out
    }.toArray

    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int): Unit = { out.write(0xFF); out.write(b) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    m(0xD8)
    m(0xDB); u16(2 + 1 + 64); out.write(0x00)
    (0 until 64).foreach(_ => out.write(1))
    m(0xC2) // SOF2
    u16(8 + 3 * 3); out.write(8); u16(img.height); u16(img.width); out.write(3)
    out.write(1); out.write((compH(0) << 4) | compH(0)); out.write(0)
    out.write(2); out.write(0x11); out.write(0)
    out.write(3); out.write(0x11); out.write(0)
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      m(0xC4); u16(2 + 1 + 16 + vals.length); out.write((tc << 4) | th)
      bits.foreach(out.write); vals.foreach(out.write)
    }
    dht(0, 0, DcLumaBits, DcLumaVals); dht(0, 1, DcChromaBits, DcChromaVals)
    dht(1, 0, AcAllBits, AcAllVals); dht(1, 1, AcAllBits, AcAllVals)
    val dcCode = Array(codes(DcLumaBits, DcLumaVals),
      codes(DcChromaBits, DcChromaVals), codes(DcChromaBits, DcChromaVals))
    val acAll = codes(AcAllBits, AcAllVals)

    script.foreach { case (scomps, ss, se, ah, al) =>
      require(scomps.nonEmpty && scomps.forall(c => c >= 0 && c < 3))
      require(ss >= 0 && ss <= se && se <= 63)
      require(ss > 0 || se == 0, "DC scans are (0,0); AC scans start at 1")
      require(ss == 0 || scomps.length == 1, "AC scans take one component")
      m(0xDA); u16(2 + 1 + 2 * scomps.length + 3); out.write(scomps.length)
      scomps.foreach { ci =>
        out.write(ci + 1)
        out.write(((if (ci == 0) 0 else 1) << 4) | (if (ci == 0) 0 else 1))
      }
      out.write(ss); out.write(se); out.write((ah << 4) | al)
      val bw = new BitWriter(out)
      def emitSym(codeMap: Map[Int, (Int, Int)], sym: Int): Unit = {
        val (c, l) = codeMap(sym); bw.write(c, l)
      }

      if (ss == 0) {
        // DC scan — interleaved MCU order (ns > 1) or comp raster (ns = 1)
        val interleaved = scomps.length > 1
        val unitsX = if (interleaved) mcusX else compBlocksW(scomps.head)
        val unitsY = if (interleaved) mcusY else compBlocksH(scomps.head)
        val dcPred = new Array[Int](3) // scan-local: T.81 G.1.2.1
        var unit = 0
        while (unit < unitsX * unitsY) {
          val ux = unit % unitsX
          val uy = unit / unitsX
          scomps.foreach { ci =>
            val hh = if (interleaved) compH(ci) else 1
            var by = 0
            while (by < hh) {
              var bx = 0
              while (bx < hh) {
                val bX = if (interleaved) ux * compH(ci) + bx else ux
                val bY = if (interleaved) uy * compH(ci) + by else uy
                val dc = coefs(ci)(bY * blocksW(ci) + bX)(0)
                if (ah == 0) {
                  val v = dc >> al // arithmetic: refinement bit restores
                  val diff = v - dcPred(ci)
                  dcPred(ci) = v
                  val t = category(diff)
                  emitSym(dcCode(ci), t)
                  if (t > 0)
                    bw.write(if (diff < 0) diff + (1 << t) - 1 else diff, t)
                } else bw.write((dc >> al) & 1, 1)
                bx += 1
              }
              by += 1
            }
          }
          unit += 1
        }
      } else {
        // AC scan — one component, comp raster, EOB-run accumulation.
        // Two correction-bit buffers, exactly T.81's BE/BR split: bits of
        // EOB-covered blocks ride with the EOBn symbol (bePending); the
        // CURRENT block's bits follow its own next ZRL / newly-significant
        // symbol (brCurrent) — merging them desyncs the decoder's
        // position-ordered correction-bit walk
        val ci = scomps.head
        var eobrun = 0
        val bePending = scala.collection.mutable.ArrayBuffer.empty[Int]
        val brCurrent = scala.collection.mutable.ArrayBuffer.empty[Int]
        def flushEobrun(): Unit = if (eobrun > 0) {
          var nbits = 0
          var t = eobrun
          while ({ t >>= 1; t != 0 }) nbits += 1
          emitSym(acAll, nbits << 4)
          if (nbits > 0) bw.write(eobrun & ((1 << nbits) - 1), nbits)
          eobrun = 0
          bePending.foreach(b => bw.write(b, 1)); bePending.clear()
        }
        var unit = 0
        while (unit < compBlocksW(ci) * compBlocksH(ci)) {
          val zz = coefs(ci)((unit / compBlocksW(ci)) * blocksW(ci) +
            unit % compBlocksW(ci))
          if (ah == 0) { // first scan of the band: values at precision Al
            def sv(k: Int): Int = {
              val v = zz(k)
              if (v < 0) -((-v) >> al) else v >> al
            }
            var lastNz = -1
            var k = ss
            while (k <= se) { if (sv(k) != 0) lastNz = k; k += 1 }
            if (lastNz < 0) eobrun += 1
            else {
              flushEobrun()
              var r = 0
              k = ss
              while (k <= lastNz) {
                val v = sv(k)
                if (v == 0) r += 1
                else {
                  while (r > 15) { emitSym(acAll, 0xF0); r -= 16 }
                  val s = category(v)
                  emitSym(acAll, (r << 4) | s)
                  bw.write(if (v < 0) v + (1 << s) - 1 else v, s)
                  r = 0
                }
                k += 1
              }
              if (lastNz < se) eobrun += 1
            }
            if (eobrun == 0x7FFF) flushEobrun()
          } else { // refinement: T.81 G figure G.7 (libjpeg shape)
            val t = new Array[Int](64)
            var eob = ss - 1
            var k = ss
            while (k <= se) {
              t(k) = math.abs(zz(k)) >> al
              if (t(k) == 1) eob = k
              k += 1
            }
            var r = 0
            k = ss
            while (k <= se) {
              if (t(k) == 0) r += 1
              else {
                while (r > 15 && k <= eob) {
                  flushEobrun()
                  emitSym(acAll, 0xF0)
                  r -= 16
                  brCurrent.foreach(b => bw.write(b, 1)); brCurrent.clear()
                }
                if (t(k) > 1) brCurrent += (t(k) & 1) // correction bit
                else { // newly significant at this precision
                  flushEobrun()
                  emitSym(acAll, (r << 4) | 1)
                  bw.write(if (zz(k) < 0) 0 else 1, 1)
                  brCurrent.foreach(b => bw.write(b, 1)); brCurrent.clear()
                  r = 0
                }
              }
              k += 1
            }
            if (r > 0 || brCurrent.nonEmpty) {
              eobrun += 1
              bePending ++= brCurrent; brCurrent.clear()
              if (eobrun == 0x7FFF || bePending.length > 800) flushEobrun()
            }
          }
          unit += 1
        }
        flushEobrun()
      }
      bw.flush()
    }
    m(0xD9)
    out.toByteArray
  }

  /** Encode RGB pixels as a PROGRESSIVE ARITHMETIC-coded (SOF10) JFIF
    * JPEG following the same `script` shape as [[encodeProgressive]] —
    * same flat quantization and DCT coefficients, entropy layer swapped
    * for the T.81 G.2 progressive arithmetic models (DC diff in the
    * >> Al domain, fixed-bin DC refinement, band-limited AC first scans,
    * history-conditioned AC refinement) — so a correct decode reproduces
    * the baseline decode of the same image BIT-FOR-BIT. Default
    * conditioning (L=0, U=1, Kx=5); statistics fresh per scan.
    */
  def encodeProgressiveArith(img: PpmImage,
                             script: Seq[(Seq[Int], Int, Int, Int, Int)],
                             subsample: Boolean = false): Array[Byte] = {
    val hMax = if (subsample) 2 else 1
    val mcusX = (img.width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (img.height + 8 * hMax - 1) / (8 * hMax)
    val compH = Array(hMax, 1, 1)
    val blocksW = compH.map(h => mcusX * h)
    val blocksH = compH.map(h => mcusY * h)
    val compBlocksW = compH.map(h => ((img.width * h + hMax - 1) / hMax + 7) / 8)
    val compBlocksH = compH.map(h => ((img.height * h + hMax - 1) / hMax + 7) / 8)

    def px(x: Int, y: Int, ch: Int): Double = {
      val cx = math.min(math.max(x, 0), img.width - 1)
      val cy = math.min(math.max(y, 0), img.height - 1)
      img.pixels((cy * img.width + cx) * 3 + ch) & 0xFF
    }
    def ycc(x: Int, y: Int): (Double, Double, Double) = {
      val (r, g, b) = (px(x, y, 0), px(x, y, 1), px(x, y, 2))
      (0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)
    }
    val coefs: Array[Array[Array[Int]]] = (0 until 3).map { ci =>
      val outB = new Array[Array[Int]](blocksW(ci) * blocksH(ci))
      val samples = new Array[Double](64)
      var bY = 0
      while (bY < blocksH(ci)) {
        var bX = 0
        while (bX < blocksW(ci)) {
          var i = 0
          while (i < 64) {
            val x = bX * 8 + i % 8
            val y = bY * 8 + i / 8
            samples(i) = (ci match {
              case 0 => ycc(x, y)._1
              case _ if !subsample => if (ci == 1) ycc(x, y)._2 else ycc(x, y)._3
              case _ =>
                val cs = Seq((2 * x, 2 * y), (2 * x + 1, 2 * y),
                  (2 * x, 2 * y + 1), (2 * x + 1, 2 * y + 1))
                  .map(p => if (ci == 1) ycc(p._1, p._2)._2 else ycc(p._1, p._2)._3)
                cs.sum / 4.0
            }) - 128.0
            i += 1
          }
          val f = fdct(samples)
          val zz = new Array[Int](64)
          var k = 0
          while (k < 64) { zz(k) = math.round(f(Zigzag(k))).toInt; k += 1 }
          outB(bY * blocksW(ci) + bX) = zz
          bX += 1
        }
        bY += 1
      }
      outB
    }.toArray

    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int): Unit = { out.write(0xFF); out.write(b) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    m(0xD8)
    m(0xDB); u16(2 + 1 + 64); out.write(0x00)
    (0 until 64).foreach(_ => out.write(1))
    m(0xCA) // SOF10
    u16(8 + 3 * 3); out.write(8); u16(img.height); u16(img.width); out.write(3)
    out.write(1); out.write((compH(0) << 4) | compH(0)); out.write(0)
    out.write(2); out.write(0x11); out.write(0)
    out.write(3); out.write(0x11); out.write(0)

    script.foreach { case (scomps, ss, se, ah, al) =>
      require(scomps.nonEmpty && scomps.forall(c => c >= 0 && c < 3))
      require(ss >= 0 && ss <= se && se <= 63)
      require(ss > 0 || se == 0, "DC scans are (0,0); AC scans start at 1")
      require(ss == 0 || scomps.length == 1, "AC scans take one component")
      m(0xDA); u16(2 + 1 + 2 * scomps.length + 3); out.write(scomps.length)
      scomps.foreach { ci =>
        out.write(ci + 1)
        out.write(((if (ci == 0) 0 else 1) << 4) | (if (ci == 0) 0 else 1))
      }
      out.write(ss); out.write(se); out.write((ah << 4) | al)

      val enc = new JpegArith.Encoder
      val dcStats = Array.fill(2)(new Array[Byte](64))
      val acStats = Array.fill(2)(new Array[Byte](256))
      val fixedBin = Array(JpegArith.FixedBin)
      val dcContext = new Array[Int](3)
      val dcPred = new Array[Int](3)

      if (ss == 0) {
        val interleaved = scomps.length > 1
        val unitsX = if (interleaved) mcusX else compBlocksW(scomps.head)
        val unitsY = if (interleaved) mcusY else compBlocksH(scomps.head)
        var unit = 0
        while (unit < unitsX * unitsY) {
          val ux = unit % unitsX
          val uy = unit / unitsX
          scomps.foreach { ci =>
            val tb = if (ci == 0) 0 else 1
            val dst = dcStats(tb)
            val hh = if (interleaved) compH(ci) else 1
            var by = 0
            while (by < hh) {
              var bx = 0
              while (bx < hh) {
                val bX = if (interleaved) ux * compH(ci) + bx else ux
                val bY = if (interleaved) uy * compH(ci) + by else uy
                val dc = coefs(ci)(bY * blocksW(ci) + bX)(0)
                if (ah == 0) { // F.1.4.1 model on the >> Al values
                  val vAl = dc >> al
                  val diff = vAl - dcPred(ci)
                  dcPred(ci) = vAl
                  var st = dcContext(ci)
                  if (diff == 0) { enc.encode(dst, st, 0); dcContext(ci) = 0 }
                  else {
                    enc.encode(dst, st, 1)
                    val sign = if (diff < 0) 1 else 0
                    enc.encode(dst, st + 1, sign)
                    st += 2 + sign
                    val v = math.abs(diff) - 1
                    var mm = 0
                    if (v != 0) {
                      enc.encode(dst, st, 1)
                      mm = 1
                      var v2 = v >> 1
                      if (v2 != 0) {
                        // X1 decision in the same SP/SN bin (jcarith F.8)
                        enc.encode(dst, st, 1)
                        mm = 2
                        st = 20
                        v2 >>= 1
                        while (v2 != 0) {
                          enc.encode(dst, st, 1); mm <<= 1; st += 1; v2 >>= 1
                        }
                      }
                    }
                    enc.encode(dst, st, 0)
                    dcContext(ci) =
                      if (mm < ((1 << 0) >> 1)) 0 // L = 0
                      else if (mm > ((1 << 1) >> 1)) 12 + sign * 4 // U = 1
                      else 4 + sign * 4
                    st += 14
                    var bit = mm >> 1
                    while (bit != 0) {
                      enc.encode(dst, st, if ((bit & v) != 0) 1 else 0)
                      bit >>= 1
                    }
                  }
                } else enc.encode(fixedBin, 0, (dc >> al) & 1)
                bx += 1
              }
              by += 1
            }
          }
          unit += 1
        }
      } else {
        val ci = scomps.head
        val tb = if (ci == 0) 0 else 1
        val ast = acStats(tb)
        val kxCond = 5
        var unit = 0
        while (unit < compBlocksW(ci) * compBlocksH(ci)) {
          val zz = coefs(ci)((unit / compBlocksW(ci)) * blocksW(ci) +
            unit % compBlocksW(ci))
          if (ah == 0) { // band first scan
            def sv(k: Int): Int = {
              val v = zz(k)
              if (v < 0) -((-v) >> al) else v >> al
            }
            var ke = se
            while (ke >= ss && sv(ke) == 0) ke -= 1
            var k = ss
            while (k <= ke) {
              var st0 = 3 * (k - 1)
              enc.encode(ast, st0, 0) // not EOB
              while (sv(k) == 0) { enc.encode(ast, st0 + 1, 0); st0 += 3; k += 1 }
              enc.encode(ast, st0 + 1, 1)
              val raw = sv(k)
              enc.encode(fixedBin, 0, if (raw < 0) 1 else 0)
              var st2 = st0 + 2
              val v = math.abs(raw) - 1
              var mm = 0
              if (v != 0) {
                enc.encode(ast, st2, 1)
                mm = 1
                var v2 = v >> 1
                if (v2 != 0) {
                  // X1 decision in the same SE+2 bin (jcarith F.8)
                  enc.encode(ast, st2, 1)
                  mm = 2
                  st2 = if (k <= kxCond) 189 else 217
                  v2 >>= 1
                  while (v2 != 0) {
                    enc.encode(ast, st2, 1); mm <<= 1; st2 += 1; v2 >>= 1
                  }
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
            if (ke < se) enc.encode(ast, 3 * (k - 1), 1) // EOB decision
          } else { // band refinement
            val t = new Array[Int](64)
            var kex = ss - 1
            var ke = ss - 1
            var k = ss
            while (k <= se) {
              t(k) = math.abs(zz(k)) >> al
              if (t(k) > 1) kex = k // history (precision Ah) nonzero
              if (t(k) != 0) ke = k // something to transmit at this k
              k += 1
            }
            k = ss
            var eob = false
            while (k <= se && !eob) {
              val st0 = 3 * (k - 1)
              if (k > kex) {
                if (k > ke) { enc.encode(ast, st0, 1); eob = true }
                else enc.encode(ast, st0, 0)
              }
              if (!eob) {
                var stw = st0
                var resolved = false
                while (!resolved) {
                  if (t(k) > 1) { // correction bit for nonzero history
                    enc.encode(ast, stw + 2, t(k) & 1)
                    resolved = true
                  } else if (t(k) == 1) { // newly significant
                    enc.encode(ast, stw + 1, 1)
                    enc.encode(fixedBin, 0, if (zz(k) < 0) 1 else 0)
                    resolved = true
                  } else {
                    enc.encode(ast, stw + 1, 0)
                    stw += 3; k += 1
                  }
                }
                k += 1
              }
            }
          }
          unit += 1
        }
      }
      enc.flushSegment()
      out.write(enc.bytes)
    }
    m(0xD9)
    out.toByteArray
  }
}
