package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dense-vector dot product over `array<float>`/`array<double>`
  * columns, in double precision.
  *
  * Semantics are IDENTICAL to the declarative fold
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0d, +)`
  * (functions.VectorFunctions.vdotFold): a sequential left-to-right
  * accumulation starting at 0.0 — so results are bit-identical to the
  * DuckDB oracle's `list_reduce` twin and reproducible on any partitioning.
  *
  * Why an Expression and not the fold: the fold materializes a zipped
  * intermediate array per row (per PAIR in join-heavy dedup/kNN operators)
  * and walks it through the generic higher-order-function machinery. This
  * kernel is a tight primitive loop inside WholeStageCodegen — no
  * allocation, no virtual calls — which is what the 100 TB hot path wants.
  *
  * Array elements are assumed non-null (embedding vectors); lengths are
  * clamped to the shorter side.
  */
case class VectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vector_dot"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double> inputs, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  @inline private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case _ => throw new IllegalStateException("unreachable: checked input type")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val lt = elemType(left).get
    val rt = elemType(right).get
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += get(a, i, lt) * get(b, i, rt)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lt = elemType(left).get
    val rt = elemType(right).get
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getA = if (lt == FloatType) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (rt == FloatType) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $getA * $getB;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}
