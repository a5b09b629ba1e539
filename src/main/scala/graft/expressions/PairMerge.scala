package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE merge application: `graft_pair_merge(syms, left, right)` rewrites a
  * symbol array replacing every non-overlapping adjacent (left, right)
  * occurrence, left to right, with the concatenated symbol — one training
  * round's rewrite in byte-pair encoding.
  *
  * CodegenFallback is a DELIBERATE exception to the codegen-kernel rule:
  * BPE training rounds run over the word-VOCABULARY frame (bounded — the
  * distinct words of the corpus, not its token stream), so this is never
  * on the 100 TB hot path; the corpus-scale pass is the single word-count
  * aggregation that builds the vocab.
  */
case class PairMerge(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with CodegenFallback {

  // propagate the child's containsNull: null elements pass through the
  // rewrite untouched (they match no merge pair), so the output is
  // null-free exactly when the input is — claiming containsNull=false
  // unconditionally would let downstream operators NPE on a null the
  // SQL-registered function accepted
  override def dataType: DataType = first.dataType match {
    case ArrayType(StringType, n) => ArrayType(StringType, containsNull = n)
    case _ => ArrayType(StringType, containsNull = true)
  }
  override def prettyName: String = "graft_pair_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, string, string), got " +
          s"${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
          s"${third.dataType.catalogString}")
    }

  override def nullSafeEval(arr: Any, l: Any, r: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val left = l.asInstanceOf[UTF8String]
    val right = r.asInstanceOf[UTF8String]
    val n = a.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val cur = a.getUTF8String(i)
      if (i + 1 < n && cur == left && a.getUTF8String(i + 1) == right) {
        out.add(UTF8String.concat(left, right))
        i += 2 // non-overlapping: consume both symbols
      } else {
        out.add(cur)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PairMerge =
    copy(first = newFirst, second = newSecond, third = newThird)
}
