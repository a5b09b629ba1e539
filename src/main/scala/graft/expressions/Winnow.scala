package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD '03 — the
  * MOSS selector): `graft_winnow(text, k, w)` = the SORTED DISTINCT set
  * of sliding-window minima over the k-gram hash sequence, one window of
  * `w` consecutive hashes per position. Guarantee: two documents sharing
  * any substring of at least w+k-1 characters share at least one
  * fingerprint — the detection threshold is a parameter, not luck, which
  * is what separates winnowing from plain 0-mod-p fingerprint sampling.
  *
  * The fingerprint SET is exactly the distinct window-minimum VALUES, so
  * no tie-position rule exists to get wrong across engines — the DuckDB
  * oracle mirror is a plain `min() OVER (... ROWS BETWEEN CURRENT ROW
  * AND w-1 FOLLOWING)` plus DISTINCT.
  *
  * Engine-portable hash: the k-gram hash is the left-fold polynomial
  * `h = fold(codes, (acc, c) => (acc*257 + c) % 1000000007)` seeded with
  * the first code — DuckDB's no-init `list_reduce` over
  * `unicode(substr(...))` computes the identical value. Codes are
  * Unicode CODE POINTS (round 8: formerly UTF-16 units, which diverged
  * from every codepoint-indexed engine on supplementary-plane text —
  * found by the adversarial emoji docs, invisible on BMP corpora).
  *
  * Documents shorter than w+k-1 characters (no full window) yield an
  * EMPTY array, not null — same rationale as MinHashSignature: a
  * nullable output would let InferFiltersFromConstraints inline this
  * expression into a scan-level filter.
  *
  * Cost: O(n·k) hashing + O(n) monotonic-deque window minima, map-side
  * inside WholeStageCodegen (the loop body is one virtual call on the
  * pinned kernel). Density of selected fingerprints is ~2n/(w+1).
  */
case class Winnow(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k > 0 && w > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, k > 0, w > 0), got " +
        s"${child.dataType.catalogString}, k=$k, w=$w")
  }

  private val Mod = 1000000007L
  private val Base = 257L

  /** Public for codegen: the generated code calls this on the pinned
    * expression instance.
    */
  def compute(s: UTF8String): ArrayData = {
    // CODE POINTS, not UTF-16 units (round-8 adversarial sweep finding:
    // supplementary-plane text — emoji — hashed differently here than in
    // every codepoint-indexed engine, including Spark's own substring/
    // length SQL functions and the DuckDB oracle; on BMP-only corpora
    // the two indexings coincide, which is why six rounds never saw it)
    val cps = s.toString.codePoints().toArray
    val n = cps.length - k + 1
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      var acc = cps(i).toLong
      var j = 1
      while (j < k) {
        acc = (acc * Base + cps(i + j).toLong) % Mod
        j += 1
      }
      hashes(i) = acc
      i += 1
    }
    // sliding-window minima via a monotonic index deque
    val selected = new java.util.TreeSet[java.lang.Long]()
    val deque = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < n) {
      while (!deque.isEmpty && hashes(deque.peekLast()) >= hashes(i))
        deque.pollLast()
      deque.addLast(i)
      if (deque.peekFirst() <= i - w) deque.pollFirst()
      if (i >= w - 1) selected.add(hashes(deque.peekFirst()))
      i += 1
    }
    val out = new Array[Long](selected.size())
    val it = selected.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("winnowKernel", this, classOf[Winnow].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$kernel.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}
