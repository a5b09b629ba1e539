package graft.operators

import graft.operators.PpmCodec.PpmImage

/** ICO (Windows icon) container decoder — favicons are everywhere in a
  * web scrape. An ICO is a directory of images, each either a PNG (since
  * Vista) or a headerless DIB with a DOUBLED height field (XOR raster
  * followed by a 1-bit AND transparency mask). The largest entry decodes
  * through [[PngCodec]] or [[BmpCodec.decodeDib]] accordingly; the AND
  * mask is ignored (alpha-drop policy shared across the codec set).
  *
  * None on: bad reserved/type fields, zero or absurd entry counts,
  * entries pointing outside the payload, or an undecodable best image.
  */
object IcoCodec {

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    u16(b, o).toLong | (u16(b, o + 2).toLong << 16)

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  def decode(bytes: Array[Byte]): Option[PpmImage] = {
    if (bytes == null || bytes.length < 6 + 16) return None
    if (u16(bytes, 0) != 0 || u16(bytes, 2) != 1) return None // icons only
    val count = u16(bytes, 4)
    if (count < 1 || count > 64) return None
    if (6 + 16 * count > bytes.length) return None
    // pick the largest raster (0 in a dimension byte means 256)
    var best = -1
    var bestArea = -1L
    var i = 0
    while (i < count) {
      val e = 6 + 16 * i
      val w = { val v = bytes(e) & 0xff; if (v == 0) 256 else v }
      val h = { val v = bytes(e + 1) & 0xff; if (v == 0) 256 else v }
      val area = w.toLong * h
      if (area > bestArea) { bestArea = area; best = i }
      i += 1
    }
    val e = 6 + 16 * best
    val len = u32(bytes, e + 8)
    val off = u32(bytes, e + 12)
    if (off < 0 || len < 8 || off + len > bytes.length) return None
    val img = java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt)
    if (img.take(8).sameElements(PngSig)) PngCodec.decode(img)
    else BmpCodec.decodeDib(img, dibOff = 0, pixelOffIn = -1,
      halveHeight = true)
  }
}
