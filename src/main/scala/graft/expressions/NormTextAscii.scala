package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text normalization for PURE-ASCII strings, byte-for-byte
  * identical to `trim(regexp_replace(lower(text), "\\s+", " "))`, returning
  * NULL for any input containing a non-ASCII byte (callers `coalesce` to
  * the exact built-in chain for those rows).
  *
  * Why: thread-sampling the dedup preprocessing showed the normalization
  * chain — ICU collation-aware `lower` plus a `java.util.regex` Matcher
  * with StringBuilder replacement per row — as the top CPU consumer, ahead
  * of shingling and MinHash. For ASCII bytes the chain is exactly
  * expressible as a single fused byte scan: A–Z += 32, runs of Java-regex
  * whitespace ([ \t\n\x0B\f\r] — all ASCII, so the byte test is exact even
  * mid-UTF8) collapse to one space, leading/trailing runs drop (the
  * trailing `trim` only ever sees collapsed single spaces). Any byte ≥ 0x80
  * bails to the built-ins, so non-ASCII semantics (ICU lowering, the same
  * regex) are inherited unchanged rather than approximated.
  */
case class NormTextAscii(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_norm_ascii"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NormTextAscii.norm(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cls = NormTextAscii.getClass.getName.stripSuffix("$")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      UTF8String ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = $cls.norm(${childGen.value});
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): NormTextAscii =
    copy(child = newChild)
}

object NormTextAscii {
  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  /** Fused lower+collapse+trim for ASCII; null when a non-ASCII byte is
    * seen (caller falls back to the built-in chain).
    */
  def norm(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val out = new Array[Byte](n)
    var o = 0
    var pend = false
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b < 0) return null // non-ASCII byte: exact semantics need ICU/regex
      if (isWs(b)) {
        if (o > 0) pend = true // leading whitespace drops (trim)
      } else {
        if (pend) { out(o) = ' '; o += 1; pend = false }
        out(o) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        o += 1
      }
      i += 1
    }
    // a trailing pending space is trailing whitespace: dropped (trim)
    UTF8String.fromBytes(out, 0, o)
  }
}
