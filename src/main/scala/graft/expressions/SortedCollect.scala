package graft.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** collect_list for BIGINTs with a SORTED result — and therefore honestly
  * DETERMINISTIC, which is the entire point: Spark marks `collect_list`
  * non-deterministic (its array order depends on row order), and any plan
  * subtree containing a non-deterministic expression is excluded from
  * exchange reuse (`sameResult` is constant-false), so a self-join over a
  * collect_list aggregation computes its whole input pipeline TWICE.
  * Sorting inside `eval` makes the result independent of arrival order, the
  * expression truthfully deterministic (the default, since its child is),
  * and the self-joined exchange reusable. Nulls are skipped, the empty
  * group yields an empty array (never null).
  */
case class SortedCollect(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_sorted_collect"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): ArrayBuffer[Long] =
    ArrayBuffer.empty[Long]

  override def update(buffer: ArrayBuffer[Long],
                      input: InternalRow): ArrayBuffer[Long] = {
    val v = child.eval(input)
    if (v != null) buffer += v.asInstanceOf[Long]
    buffer
  }

  override def merge(buffer: ArrayBuffer[Long],
                     other: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    buffer ++= other
    buffer
  }

  override def eval(buffer: ArrayBuffer[Long]): Any = {
    val arr = buffer.toArray
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(buffer: ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new ArrayBuffer[Long](bytes.length / 8)
    while (bb.remaining() >= 8) buf += bb.getLong
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SortedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SortedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SortedCollect =
    copy(child = newChild)
}
