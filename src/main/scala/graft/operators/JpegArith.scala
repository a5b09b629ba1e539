package graft.operators

/** The QM arithmetic coder of ITU T.81 Annex D (public specification) —
  * the entropy layer behind arithmetic-coded JPEG (SOF9). Both halves
  * live here: the decoder the codec uses, and a reference encoder the
  * spec pins roundtrips against (the same share-the-coefficients
  * strategy the progressive-JPEG spec uses).
  *
  * Register conventions (value-window formulation): the probability
  * interval A is renormalized into [0x8000, 0xFFFF] (initially 0x10000),
  * the MPS sub-interval sits at the BOTTOM [0, A−Qe) and the LPS at the
  * TOP [A−Qe, A), with T.81's conditional exchange when A−Qe < Qe. The
  * decoder keeps C = (code value − interval base) and pulls one stream
  * bit per renormalization shift; the encoder tracks the interval base
  * exactly (arbitrary precision) and emits the final value's bits, which
  * sidesteps Annex D's byte-carry/stack machinery without changing the
  * emitted stream semantics. Byte transport is JPEG's: 0xFF data bytes
  * are stuffed with a 0x00, any other marker ends the segment and the
  * decoder feeds zero bits from then on (T.81 D.4; the convention that
  * lets the encoder discard trailing zero bytes).
  *
  * State bins are one byte each: bit 7 = current MPS sense, bits 0-6 =
  * the Table D.3 estimator index. Index 113 is the non-adaptive
  * "fixed" ~0.5 bin used for AC sign decisions (self-looping, no
  * switch), per Table F.5's note.
  */
private[graft] object JpegArith {

  // ITU T.81 Table D.3: Qe estimate, next index after an MPS / LPS
  // renormalization, and the MPS-switch flag, transcribed column by
  // column; entry 113 is the fixed bin. JpegCodecSpec asserts the
  // structural invariants (monotone Qe drift along both transition
  // kinds, switch only at the top of each chain).
  private val Table: Array[(Int, Int, Int, Int)] = Array(
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0))

  val Qe: Array[Int] = Table.map(_._1)
  val Nmps: Array[Int] = Table.map(_._2)
  val Nlps: Array[Int] = Table.map(_._3)
  val Sw: Array[Boolean] = Table.map(_._4 == 1)

  /** The fixed ~0.5 bin index (AC sign decisions). */
  val FixedBin: Byte = 113.toByte

  /** Decoder over one entropy-coded segment starting at `pos`.
    * Call `init()` before the first decision and after each `restart`.
    */
  final class Decoder(data: Array[Byte], var pos: Int) {
    private var a = 0L
    private var c = 0L
    private var curByte = 0
    private var bitsLeft = 0
    private var markerSeen = false
    var corrupt = false

    /** Next data byte honoring (0xFF,0x00) stuffing; any other marker
      * (or end of data) switches to the zero-feed regime without
      * consuming the marker bytes.
      */
    private def fetchByte(): Int = {
      if (markerSeen || pos >= data.length) { markerSeen = true; return 0 }
      val b = data(pos) & 0xFF
      if (b == 0xFF) {
        if (pos + 1 < data.length && data(pos + 1) == 0) { pos += 2; 0xFF }
        else { markerSeen = true; 0 }
      } else { pos += 1; b }
    }

    private def nextBit(): Long = {
      if (bitsLeft == 0) { curByte = fetchByte(); bitsLeft = 8 }
      bitsLeft -= 1
      ((curByte >>> bitsLeft) & 1).toLong
    }

    def init(): Unit = {
      markerSeen = false
      a = 0x10000L
      c = ((fetchByte() << 8) | fetchByte()).toLong
      bitsLeft = 0
    }

    /** Decode one binary decision in the stats bin `st(i)`, updating the
      * bin's estimator state per Table D.3.
      */
    def decode(st: Array[Byte], i: Int): Int = {
      val s = st(i) & 0xFF
      val idx = s & 0x7F
      val mps = s >>> 7
      val qe = Qe(idx).toLong
      val amps = a - qe
      var d = 0
      if (c < amps) {
        // bottom sub-interval
        a = amps
        if (amps >= 0x8000L) return mps // no renorm, no estimator update
        if (amps < qe) { // conditional exchange: bottom is the LPS
          d = 1 - mps
          val nm = if (Sw(idx)) 1 - mps else mps
          st(i) = ((nm << 7) | Nlps(idx)).toByte
        } else {
          d = mps
          st(i) = ((mps << 7) | Nmps(idx)).toByte
        }
      } else {
        // top sub-interval (size Qe)
        c -= amps
        a = qe
        if (amps < qe) { // conditional exchange: top is the MPS
          d = mps
          st(i) = ((mps << 7) | Nmps(idx)).toByte
        } else {
          d = 1 - mps
          val nm = if (Sw(idx)) 1 - mps else mps
          st(i) = ((nm << 7) | Nlps(idx)).toByte
        }
      }
      while (a < 0x8000L) { a <<= 1; c = (c << 1) | nextBit() }
      d
    }

    /** Realign past the expected RSTn marker (the entropy segment may
      * hold flushed bytes the decoder never consumed; the first
      * unstuffed 0xFF is the marker by construction). False on any
      * other marker or on exhaustion.
      */
    def restart(n: Int): Boolean = {
      var p = pos
      while (p + 1 < data.length &&
        !((data(p) & 0xFF) == 0xFF && data(p + 1) != 0)) p += 1
      if (p + 1 >= data.length) return false
      if ((data(p + 1) & 0xFF) != 0xD0 + (n % 8)) return false
      pos = p + 2
      init()
      true
    }

    /** After the last decision: position just past the terminating
      * marker's 0xFF (for the caller's marker loop).
      */
    def segmentEnd: Int = {
      var p = pos
      while (p + 1 < data.length &&
        !((data(p) & 0xFF) == 0xFF && data(p + 1) != 0)) p += 1
      p
    }
  }

  /** Reference encoder: exact interval arithmetic (BigInt base), final
    * value chosen with maximal trailing zeros inside the interval, so
    * trailing zero BYTES can be dropped per the decoder's zero-feed
    * contract. Produces the raw segment bytes WITH (0xFF,0x00) stuffing
    * applied — append markers after.
    */
  final class Encoder {
    private var a = 0x10000L
    private var base = BigInt(0)
    private var shifts = 0
    private val out = new scala.collection.mutable.ArrayBuffer[Byte]()

    def encode(st: Array[Byte], i: Int, bit: Int): Unit = {
      val s = st(i) & 0xFF
      val idx = s & 0x7F
      val mps = s >>> 7
      val qe = Qe(idx).toLong
      val amps = a - qe
      if (bit == mps) {
        if (amps >= 0x8000L) { a = amps; return }
        if (amps < qe) { base += amps; a = qe } // exchange: MPS on top
        else a = amps
        st(i) = ((mps << 7) | Nmps(idx)).toByte
      } else {
        if (amps < qe) a = amps // exchange: LPS at the bottom
        else { base += amps; a = qe }
        val nm = if (Sw(idx)) 1 - mps else mps
        st(i) = ((nm << 7) | Nlps(idx)).toByte
      }
      while (a < 0x8000L) { a <<= 1; base <<= 1; shifts += 1 }
    }

    /** Flush the current segment: emit the chosen value's bits, reset
      * the interval for a fresh segment (restart semantics).
      */
    def flushSegment(): Unit = {
      val nBits = 16 + shifts
      // largest-trailing-zeros value in [base, base + a)
      var v = base + a - 1
      var k = 0
      while (k + 1 <= nBits && ((v >> (k + 1)) << (k + 1)) >= base) k += 1
      v = (v >> k) << k
      val nBytes = (nBits + 7) / 8
      val padded = v << (nBytes * 8 - nBits)
      val raw = Array.tabulate(nBytes)(j =>
        ((padded >> (8 * (nBytes - 1 - j))) & 0xFF).toByte)
      // trailing zero bytes are implied by the decoder's zero-feed
      var end = raw.length
      while (end > 0 && raw(end - 1) == 0) end -= 1
      var j = 0
      while (j < end) {
        out += raw(j)
        if (raw(j) == 0xFF.toByte) out += 0x00.toByte // transport stuffing
        j += 1
      }
      a = 0x10000L; base = BigInt(0); shifts = 0
    }

    def bytes: Array[Byte] = out.toArray
    def appendMarker(m: Int): Unit = { out += 0xFF.toByte; out += m.toByte }
  }
}
