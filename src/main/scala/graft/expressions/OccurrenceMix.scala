package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Occurrence expansion of a SORTED BIGINT multiset: the k-th occurrence of
  * value v (k = 0,1,...) becomes mix(v, k), a splitmix64-style finalizer of
  * v + k * golden-gamma; the output is re-sorted. One linear pass + one
  * sort, codegen'd.
  *
  * This is the classic exact reduction of integer-weighted (term-frequency)
  * Jaccard to plain set Jaccard: for multisets A, B with counts tf_A, tf_B,
  * |expand(A) ∩ expand(B)| = Σ_v min(tf_A(v), tf_B(v)) and
  * |expand(A) ∪ expand(B)| = Σ_v max(tf_A(v), tf_B(v)), so the weighted
  * Jaccard Σmin/Σmax equals the set Jaccard of the expanded sets — which the
  * existing sorted-merge kernels (`graft_sorted_intersect_count`,
  * `graft_minhash`) then handle unchanged. Mixing keeps (v, k) pairs
  * distinct up to 64-bit hash collisions (the same tolerance the shingle
  * hashing already accepts); the occurrence index k is identical on both
  * sides of a pair for a shared value, so counts are preserved exactly.
  *
  * Input MUST be sorted (equal values adjacent) — feed it
  * `array_sort(transform(...))` output. Why per-row instead of an
  * explode+window formulation: occurrence numbering via
  * `row_number() over (partition by doc, value)` shuffles one row per
  * TOKEN across the cluster; this is a pure map over documents.
  */
case class OccurrenceMix(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_occurrence_mix"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> input, " +
        s"got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    var k = 0L
    var prev = 0L
    while (i < n) {
      val v = arr.getLong(i)
      k = if (i > 0 && v == prev) k + 1L else 0L
      prev = v
      out(i) = OccurrenceMix.mix(v, k)
      i += 1
    }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val k = ctx.freshName("k"); val v = ctx.freshName("v")
      val prev = ctx.freshName("prev"); val z = ctx.freshName("z")
      val out = ctx.freshName("out")
      s"""
         |int $n = $arr.numElements();
         |long[] $out = new long[$n];
         |long $k = 0L; long $prev = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = $arr.getLong($i);
         |  $k = ($i > 0 && $v == $prev) ? $k + 1L : 0L;
         |  $prev = $v;
         |  long $z = $v + $k * -7046029254386353131L;
         |  $z = ($z ^ ($z >>> 30)) * -4658895280553007687L;
         |  $z = ($z ^ ($z >>> 27)) * -7723592293110705685L;
         |  $out[$i] = $z ^ ($z >>> 31);
         |}
         |java.util.Arrays.sort($out);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): OccurrenceMix =
    copy(child = newChild)
}

object OccurrenceMix {
  /** splitmix64 finalizer (Vigna, public domain) over v + k * golden gamma.
    * Constants in decimal two's complement above mirror these exactly.
    */
  def mix(v: Long, k: Long): Long = {
    var z = v + k * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
