package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The FIRST common element of two SORTED arrays of BIGINTs, or
  * Long.MinValue when the arrays are disjoint (inputs must therefore not
  * contain Long.MinValue as a real value — the PPJoin rank domain is
  * [1, vocab], which satisfies this by construction).
  *
  * Role: exactly-once candidate emission in the prefix-filtered
  * set-similarity join. The inverted-index join on prefix tokens emits one
  * candidate row per SHARED prefix token; keeping only the row whose join
  * token equals the pair's first common prefix element collapses the ~p
  * duplicates with an O(p) merge over the two PREFIX arrays in the join
  * condition — no groupBy/distinct barrier over the (huge) candidate
  * instance stream, and the merge length is the prefix (~(1-t)·n), never
  * the full set. (The same trick `graft_first_agree_index` plays for the
  * positional band signatures of the MinHash LSH join.)
  */
case class SortedFirstCommon(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_first_common"

  private def ok(e: Expression) = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) return x
      else if (x < y) i += 1
      else j += 1
    }
    Long.MinValue
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0, $j = 0;
         |${ev.value} = Long.MIN_VALUE;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { ${ev.value} = $x; break; }
         |  else if ($x < $y) { $i++; }
         |  else { $j++; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedFirstCommon =
    copy(left = newLeft, right = newRight)
}
