package graft

import graft.expressions.{ArrayAgreeCount, BloomMightContain, BucketOf, FirstAgreeIndex, MinHashSignature, NormTextAscii, OccurrenceMix, PairMerge, SortedCollect, SortedFirstCommon, SortedIntersectCount, VectorDot, Winnow}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Custom-function surface, wired the two public ways Spark offers:
  *
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the SparkSessionExtensions injection point), or
  *  - `GraftFunctions.register(spark)` on a live session (what
  *    `Tables.load` does, so every query path is covered even when the
  *    driver owns the session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registrations.foreach(ext.injectFunction)
}

object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("graft_vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "graft_vector_dot"),
      (args: Seq[Expression]) => VectorDot(args(0), args(1))),
    (FunctionIdentifier("graft_sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "graft_sorted_intersect_count"),
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))),
    (FunctionIdentifier("graft_array_agree_count"),
      new ExpressionInfo(classOf[ArrayAgreeCount].getName,
        "graft_array_agree_count"),
      (args: Seq[Expression]) => ArrayAgreeCount(args(0), args(1))),
    (FunctionIdentifier("graft_first_agree_index"),
      new ExpressionInfo(classOf[FirstAgreeIndex].getName,
        "graft_first_agree_index"),
      (args: Seq[Expression]) => FirstAgreeIndex(args(0), args(1))),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      // second arg must be a foldable int literal (the signature width)
      (args: Seq[Expression]) => MinHashSignature(args(0),
        args(1).eval().asInstanceOf[Int])),
    (FunctionIdentifier("graft_sorted_first_common"),
      new ExpressionInfo(classOf[SortedFirstCommon].getName,
        "graft_sorted_first_common"),
      (args: Seq[Expression]) => SortedFirstCommon(args(0), args(1))),
    (FunctionIdentifier("graft_occurrence_mix"),
      new ExpressionInfo(classOf[OccurrenceMix].getName,
        "graft_occurrence_mix"),
      (args: Seq[Expression]) => OccurrenceMix(args(0))),
    (FunctionIdentifier("graft_norm_ascii"),
      new ExpressionInfo(classOf[NormTextAscii].getName,
        "graft_norm_ascii"),
      (args: Seq[Expression]) => NormTextAscii(args(0))),
    (FunctionIdentifier("graft_bucket_of"),
      new ExpressionInfo(classOf[BucketOf].getName, "graft_bucket_of"),
      (args: Seq[Expression]) => BucketOf(args(0), args(1))),
    (FunctionIdentifier("graft_pair_merge"),
      new ExpressionInfo(classOf[PairMerge].getName, "graft_pair_merge"),
      (args: Seq[Expression]) => PairMerge(args(0), args(1), args(2))),
    (FunctionIdentifier("graft_bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName,
        "graft_bloom_might_contain"),
      (args: Seq[Expression]) => BloomMightContain(args(0), args(1))),
    (FunctionIdentifier("graft_sorted_collect"),
      new ExpressionInfo(classOf[SortedCollect].getName,
        "graft_sorted_collect"),
      (args: Seq[Expression]) => SortedCollect(args(0))),
    (FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[Winnow].getName, "graft_winnow"),
      // k and w must be foldable int literals
      (args: Seq[Expression]) => Winnow(args(0),
        args(1).eval().asInstanceOf[Int], args(2).eval().asInstanceOf[Int])))

  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotently register graft functions on a live session. */
  def register(spark: SparkSession): Unit =
    if (registered.putIfAbsent(spark, java.lang.Boolean.TRUE) == null) {
      val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry
      registrations.foreach { case (ident, info, builder) =>
        reg.registerFunction(ident, info, builder)
      }
    }
}
