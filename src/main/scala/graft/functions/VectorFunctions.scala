package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns.
  *
  * Built from codegen'd higher-order functions (`zip_with` + `aggregate`),
  * which fold left-to-right — a deterministic evaluation order, so cosine
  * scores are reproducible across partitionings and match an oracle that
  * evaluates the same fold. All arithmetic is promoted to double before the
  * first multiply.
  */
object VectorFunctions {
  /** Dot product, left-to-right fold in double precision. */
  def vdot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm. */
  def vnorm(a: Column): Column = sqrt(vdot(a, a))

  /** Cosine similarity: dot / (|a| * |b|). */
  def cosine(a: Column, b: Column): Column = vdot(a, b) / (vnorm(a) * vnorm(b))

  /** Cosine given precomputed norms (avoids recomputing norms in a join). */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    vdot(a, b) / (na * nb)
}
