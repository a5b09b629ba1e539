package graft.operators

/** The lossless-process statistical model of ITU T.81 Annex H.2, factored
  * as a single-difference codec over the QM coder ([[JpegArith]]) so the
  * standalone SOF11 path (JpegCodec) and the hierarchical SOF15 arm
  * (JpegHier) share one implementation on each side.
  *
  * Model (H.2's normative statement: the DC-difference decision sequence
  * of F.2.4.1 — zero, sign, Sz>1 with the X1 decision in the same SP/SN
  * bin, magnitude-category chain, one mantissa bin per category — under
  * TWO-dimensional conditioning): the zero/sign/small decisions select
  * one of 25 contexts from the 5-category classifications (0 zero,
  * 1/2 ±small, 3/4 ±large per the DAC (L, U) bounds, the F.1.4.4.1.2
  * classifier) of Da (the difference coded for the LEFT neighbor) and Db
  * (ABOVE); the magnitude chains come in TWO sets selected by whether Db
  * is in a large category.
  *
  * Stats layout per table (internal arrangement — only the SHARING
  * structure is normative, the QM bitstream never carries bin numbers):
  * contexts 0..99 at 4×(5·Qa + Qb) + {S0, SS, SP, SN}; magnitude set A at
  * 100, set B (Db large) at 132 — the X2..X16 chain at base..base+14
  * (16-bit samples reach category 16), the per-category mantissa bin at
  * chainPos+15.
  */
private[operators] object JpegH2 {

  /** Statistics area size per conditioning table. */
  val StatsSize = 164

  /** Decode one difference. Returns (cls << 32) | (diff & 0xFFFFFFFF),
    * or Long.MinValue on a corrupt magnitude chain. `cls` is the
    * 5-category classification of the decoded difference (feeds the
    * neighbors' conditioning).
    */
  def decodeDiff(dec: JpegArith.Decoder, st: Array[Byte],
                 qa: Int, qb: Int, l: Int, u: Int): Long = {
    val cb = 4 * (5 * qa + qb)
    if (dec.decode(st, cb) == 0) return 0L // diff 0, cls 0
    val sign = dec.decode(st, cb + 1)
    var si = cb + 2 + sign
    var m = 0
    if (dec.decode(st, si) != 0) {
      m = 1
      // the X1 decision codes in the SAME SP/SN bin (Table F.5)
      if (dec.decode(st, si) != 0) {
        m = 2
        si = if (qb >= 3) 132 else 100
        while (dec.decode(st, si) != 0) {
          m <<= 1
          if (m == 0x10000) return Long.MinValue // past category 16
          si += 1
        }
      }
    }
    val cls =
      if (m < ((1 << l) >> 1)) 0
      else if (m > ((1 << u) >> 1)) 3 + sign
      else 1 + sign
    var v = m
    si += 15
    var bit = m >> 1
    while (bit != 0) {
      if (dec.decode(st, si) != 0) v |= bit
      bit >>= 1
    }
    v += 1
    val diff = if (sign != 0) -v else v
    (cls.toLong << 32) | (diff.toLong & 0xFFFFFFFFL)
  }

  /** Encode one difference (diff in [-32768, 32767]; -32768 codes as
    * +32768, its mod-2^16 equivalent). Returns the classification for
    * the neighbors' conditioning.
    */
  def encodeDiff(enc: JpegArith.Encoder, st: Array[Byte],
                 qa: Int, qb: Int, diff: Int, l: Int, u: Int): Int = {
    val cb = 4 * (5 * qa + qb)
    if (diff == 0) { enc.encode(st, cb, 0); return 0 }
    enc.encode(st, cb, 1)
    val sign = if (diff < 0 && diff != -32768) 1 else 0
    enc.encode(st, cb + 1, sign)
    var si = cb + 2 + sign
    val vAbs = if (diff == -32768) 32768 else math.abs(diff)
    val v = vAbs - 1
    var mm = 0
    if (v != 0) {
      enc.encode(st, si, 1)
      mm = 1
      var v2 = v >> 1
      if (v2 != 0) {
        enc.encode(st, si, 1) // X1 in the same SP/SN bin
        mm = 2
        si = if (qb >= 3) 132 else 100
        v2 >>= 1
        while (v2 != 0) { enc.encode(st, si, 1); mm <<= 1; si += 1; v2 >>= 1 }
      }
    }
    enc.encode(st, si, 0) // category terminator
    si += 15
    var bit = mm >> 1
    while (bit != 0) {
      enc.encode(st, si, if ((bit & v) != 0) 1 else 0)
      bit >>= 1
    }
    if (mm < ((1 << l) >> 1)) 0
    else if (mm > ((1 << u) >> 1)) 3 + sign
    else 1 + sign
  }
}
