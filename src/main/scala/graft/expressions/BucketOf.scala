package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd threshold bucketing: `graft_bucket_of(value, thresholds)` =
  * the number of thresholds ≤ value, via binary search over a FOLDABLE
  * sorted double array — i.e. the bucket index in `[0, len(thresholds)]`.
  *
  * This is the equal-DEPTH counterpart of `width_bucket` (equal width):
  * feed it per-dimension `approxQuantile` thresholds and skewed raw
  * domains become near-uniform bucket indices — what
  * `ZOrder.zValue` needs so a hot key range doesn't collapse the Morton
  * curve onto a few files. The threshold array is pinned once in the
  * generated class's references (like the Bloom probe), so each row costs
  * log2(n) comparisons inside WholeStageCodegen.
  */
case class BucketOf(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bucket_of"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: NumericType, ArrayType(DoubleType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (numeric value, foldable array<double> " +
          s"thresholds), got ${left.dataType.catalogString} and " +
          s"${right.dataType.catalogString}")
    }

  @transient private lazy val thresholds: Array[Double] = {
    // a foldable-but-null literal (or null elements) would otherwise
    // surface as an opaque NPE/CCE at codegen time — fail with a clear
    // analysis-style message instead
    val evaled = right.eval()
    require(evaled != null, s"$prettyName thresholds literal must not be null")
    val ad = evaled.asInstanceOf[ArrayData]
    require((0 until ad.numElements()).forall(i => !ad.isNullAt(i)),
      s"$prettyName thresholds must not contain null elements")
    val a = ad.toDoubleArray()
    require(a.sameElements(a.sorted), s"$prettyName thresholds must be sorted")
    a
  }

  /** Buckets = thresholds strictly greater than value stay to the right:
    * index of the first threshold > value.
    */
  private def search(v: Double, th: Array[Double]): Long = {
    var lo = 0
    var hi = th.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (th(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  override def nullSafeEval(v: Any, unused: Any): Any =
    search(v.asInstanceOf[Number].doubleValue(), thresholds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val thRef = ctx.addReferenceObj("graftBuckets", thresholds, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val dv = ctx.freshName("dv")
      s"""
         |double $dv = (double) $v;
         |int $lo = 0, $hi = $thRef.length;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($thRef[$mid] <= $dv) $lo = $mid + 1; else $hi = $mid;
         |}
         |${ev.value} = (long) $lo;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BucketOf =
    copy(left = newLeft, right = newRight)
}
