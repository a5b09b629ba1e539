package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Count of positions i where a[i] == b[i], over the common prefix of two
  * BIGINT arrays (position-wise agreement, NOT set intersection).
  *
  * This is the MinHash jaccard estimator's kernel: agree/numHashes is an
  * unbiased estimate of the jaccard of the underlying shingle sets, so a
  * lower bound on the agreement count is a cheap pre-screen in front of an
  * exact verification kernel.
  *
  * Why an Expression and not `numHashes` flat `CASE WHEN a[i]=b[i]` terms:
  * the flat form inlines into one generated-code method whose bytecode
  * exceeds the JIT's huge-method limit (~8000 bytecodes at 64+ terms), so
  * the JVM falls back to the bytecode interpreter for the entire join
  * condition — measured ~8x wall-clock on the LSH candidate join. This
  * single loop stays a few dozen bytecodes and JITs.
  */
case class ArrayAgreeCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_array_agree_count"

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
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var c = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $i = 0, $c = 0;
         |while ($i < $n) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |  $i++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayAgreeCount =
    copy(left = newLeft, right = newRight)
}

/** First position i where a[i] == b[i] over the common prefix of two INT
  * arrays; -1 if no position agrees.
  *
  * LSH banding emits a candidate pair once per SHARED band; equality with
  * the current band index makes emission exactly-once without a `distinct`
  * barrier over the (quadratic) candidate stream: the pair survives only at
  * its first shared band. One loop instead of `bands-1` flat OR-terms keeps
  * the join-condition method small enough to JIT (see [[ArrayAgreeCount]]).
  */
case class FirstAgreeIndex(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_first_agree_index"

  private def ok(e: Expression) = e.dataType match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<int> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (a.getInt(i) == b.getInt(i)) return i
      i += 1
    }
    -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val res = ctx.freshName("res")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $res = -1;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getInt($i) == $b.getInt($i)) { $res = $i; break; }
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstAgreeIndex =
    copy(left = newLeft, right = newRight)
}
