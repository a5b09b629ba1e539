package graft.operators

/** Pure-Scala codec for binary PPM (P6) images — a real, spec-complete
  * raster format (Netpbm) implementable without any codec library, which
  * is what upgrades the multimodal pipeline from "stubbed decode" to a
  * genuine decode → feature → resize → frame-sample path inside this
  * container. PNG ([[PngCodec]]) and baseline JPEG ([[JpegCodec]]) now
  * decode for real too; the plumbing is format-agnostic.
  *
  * Format (Netpbm spec): ASCII header `P6 <width> <height> <maxval>`,
  * tokens separated by whitespace, `#` comments allowed between tokens,
  * exactly ONE whitespace byte after maxval, then width×height×3 raw RGB
  * bytes. Only maxval ≤ 255 (1 byte/sample) is supported, like most
  * consumers.
  */
object PpmCodec {

  final case class PpmImage(width: Int, height: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * 3,
      s"pixel buffer ${pixels.length} != $width x $height x 3")
  }

  def encode(img: PpmImage): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    header ++ img.pixels
  }

  /** Decode one image starting at `off`; returns the image and the offset
    * just past its pixel data (PPM streams may concatenate frames), or
    * None if the bytes are not a well-formed P6 image.
    */
  def decodeOne(bytes: Array[Byte], off: Int = 0): Option[(PpmImage, Int)] = {
    var i = off
    def skipSeparators(): Unit = {
      var done = false
      while (!done && i < bytes.length) {
        val b = bytes(i)
        if (b == '#') while (i < bytes.length && bytes(i) != '\n') i += 1
        else if (b == ' ' || b == '\n' || b == '\r' || b == '\t' ||
          b == 0x0B || b == 0x0C) i += 1
        else done = true
      }
    }
    def readInt(): Int = {
      skipSeparators()
      val s = i
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') i += 1
      if (i == s || i - s > 7) return -1
      new String(bytes, s, i - s, "US-ASCII").toInt
    }
    if (i + 2 > bytes.length || bytes(i) != 'P' || bytes(i + 1) != '6')
      return None
    i += 2
    val w = readInt(); val h = readInt(); val mx = readInt()
    if (w <= 0 || h <= 0 || mx <= 0 || mx > 255) return None
    // exactly one whitespace byte terminates the header
    if (i >= bytes.length || !(bytes(i) == ' ' || bytes(i) == '\n' ||
      bytes(i) == '\r' || bytes(i) == '\t')) return None
    i += 1
    // Long arithmetic: 7-digit dims pass readInt, and w*h*3 in Int can
    // overflow NEGATIVE, sneaking past the bounds check into copyOfRange
    val n = w.toLong * h.toLong * 3L
    if (i.toLong + n > bytes.length) return None
    val ni = n.toInt
    Some((PpmImage(w, h, java.util.Arrays.copyOfRange(bytes, i, i + ni)), i + ni))
  }

  /** All concatenated frames in a raw PPM stream (the no-container video
    * form); empty if the stream doesn't start with a valid frame.
    */
  def decodeStream(bytes: Array[Byte]): Vector[PpmImage] = {
    val out = Vector.newBuilder[PpmImage]
    var off = 0
    var ok = true
    while (ok) decodeOne(bytes, off) match {
      case Some((img, next)) => out += img; off = next
      case None => ok = false
    }
    out.result()
  }

  /** Nearest-neighbor resample — the real resampler arithmetic (source
    * index = floor(target index × src / dst) per axis).
    */
  def resizeNearest(img: PpmImage, tw: Int, th: Int): PpmImage = {
    require(tw > 0 && th > 0)
    val out = new Array[Byte](tw * th * 3)
    var ty = 0
    while (ty < th) {
      val sy = (ty.toLong * img.height / th).toInt
      var tx = 0
      while (tx < tw) {
        val sx = (tx.toLong * img.width / tw).toInt
        val so = (sy * img.width + sx) * 3
        val to = (ty * tw + tx) * 3
        out(to) = img.pixels(so)
        out(to + 1) = img.pixels(so + 1)
        out(to + 2) = img.pixels(so + 2)
        tx += 1
      }
      ty += 1
    }
    PpmImage(tw, th, out)
  }

  /** 8-dim feature vector from real pixels: per-channel means (3) plus a
    * 5-bin gray-level histogram (fractions). Fixed accumulation order →
    * deterministic floats.
    */
  def features(img: PpmImage): Array[Float] = {
    val n = img.width * img.height
    var r = 0L; var g = 0L; var b = 0L
    val hist = new Array[Long](5)
    var i = 0
    while (i < n) {
      val pr = img.pixels(i * 3) & 0xFF
      val pg = img.pixels(i * 3 + 1) & 0xFF
      val pb = img.pixels(i * 3 + 2) & 0xFF
      r += pr; g += pg; b += pb
      val gray = (pr + pg + pb) / 3
      hist(math.min(gray / 52, 4)) += 1
      i += 1
    }
    Array(
      r.toFloat / n, g.toFloat / n, b.toFloat / n,
      hist(0).toFloat / n, hist(1).toFloat / n, hist(2).toFloat / n,
      hist(3).toFloat / n, hist(4).toFloat / n)
  }
}
