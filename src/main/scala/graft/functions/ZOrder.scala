package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve arithmetic for multi-dimensional data-skipping
  * layouts, built entirely from codegen'd bitwise builtins — no custom
  * expression needed, and the identical arithmetic runs in any ANSI SQL
  * engine (the oracle re-computes it with `<<`/`&`/`|`).
  *
  * Sorting a table by `zValue(x, y)` clusters rows so that ANY rectangle
  * in (x, y) space touches few files: per-file min/max column statistics
  * then prune scans on EITHER dimension — the property a single-column
  * sort only gives its leading column. This is the standard layout trick
  * for 100 TB fact tables queried by two independent selective dimensions
  * (e.g. user × day): neither dimension's filter degenerates to a full
  * scan.
  *
  * Inputs are clamped to 16 bits each (callers quantile-bucket or
  * hash-fold wider domains first); the interleave spreads each 16-bit
  * value to even/odd bit positions of a 32-bit z-value with the classic
  * shift-or-mask ladder.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` so bit i lands at bit 2i. */
  private def spread16(v: Column): Column = {
    val b16 = v.bitwiseAND(lit(0xFFFFL))
    val s8 = b16.bitwiseOR(shiftleft(b16, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s4 = s8.bitwiseOR(shiftleft(s8, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s2 = s4.bitwiseOR(shiftleft(s4, 2)).bitwiseAND(lit(0x33333333L))
    s2.bitwiseOR(shiftleft(s2, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton z-value of two 16-bit dimensions (x even bits, y odd). */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Equal-depth bucket index for a skewed dimension: `approxQuantile`
    * thresholds (one tiny driver-side array, like a broadcast) fed to the
    * codegen'd `graft_bucket_of` binary search. Rank-bucketing is what
    * makes the Morton curve skew-proof — interleaving RAW values of a
    * hot-keyed dimension would pile most rows onto a few z-ranges (and
    * therefore a few files), defeating the layout.
    */
  def quantileBucket(df: org.apache.spark.sql.DataFrame, column: String,
                     nBuckets: Int): Column = {
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val th = df.stat.approxQuantile(column, probs, 0.001)
    call_function("graft_bucket_of", col(column), lit(th))
  }

  /** The same ladder in ANSI SQL, for oracle queries. */
  def zValueSql(x: String, y: String): String = {
    def spread(v: String): String = {
      val b16 = s"($v & 65535)"
      val s8 = s"(($b16 | ($b16 << 8)) & 16711935)"
      val s4 = s"(($s8 | ($s8 << 4)) & 252645135)"
      val s2 = s"(($s4 | ($s4 << 2)) & 858993459)"
      s"(($s2 | ($s2 << 1)) & 1431655765)"
    }
    s"(${spread(x)} | (${spread(y)} << 1))"
  }
}
