package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over an integral key:
  * `graft_bloom_might_contain(key, bloom_bytes)`.
  *
  * The second argument must be a FOLDABLE binary literal — the serialized
  * `org.apache.spark.util.sketch.BloomFilter` built by
  * `operators.BloomJoin` — so the filter deserializes once per task (the
  * codegen path pins it in the generated class's references array), and
  * every row probe is two hash computations against a bit array: no
  * allocation, no virtual dispatch, inside WholeStageCodegen.
  *
  * This is the runtime-filter pattern for joins whose build side is too
  * large to broadcast as a hash relation but whose KEY SET fits a few MB
  * of bits: probe-side rows that cannot match are dropped at the scan,
  * before the join shuffle. False positives only cost wasted shuffle
  * rows — the join that follows keeps the result exact.
  *
  * May return false positives, never false negatives; a null key yields
  * null (joins drop null keys anyway).
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case LongType | IntegerType | ShortType | ByteType
      if right.dataType == BinaryType && right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (integral key, foldable binary bloom), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(k: Any, unused: Any): Any =
    bloom.mightContainLong(k.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef =
      ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (k, _) =>
      s"${ev.value} = $bloomRef.mightContainLong((long) $k);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
