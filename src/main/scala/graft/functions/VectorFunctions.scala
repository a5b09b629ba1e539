package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns.
  *
  * `vdot` resolves to the codegen'd `graft.expressions.VectorDot` kernel
  * (registered by `GraftFunctions.register` / `GraftExtensions`): a tight
  * primitive loop in WholeStageCodegen. `vdotFold` is the pure-built-in
  * twin (`zip_with` + `aggregate`, a sequential left fold) — bit-identical
  * results, kept as the no-custom-expression fallback and as the spec
  * cross-check. All arithmetic is promoted to double before the first
  * multiply; accumulation order is left-to-right in both forms, so scores
  * are reproducible across partitionings and match the DuckDB oracle's
  * `list_reduce`.
  */
object VectorFunctions {
  /** Dot product via the codegen'd kernel (requires graft registration). */
  def vdot(a: Column, b: Column): Column =
    call_function("graft_vector_dot", a, b)

  /** Dot product as a pure built-in fold — same semantics as `vdot`,
    * including on length-mismatched input: both forms clamp to the shorter
    * array (the slice below; `zip_with` alone would null-pad the short side
    * and poison the fold, diverging from the kernel exactly on bad rows).
    */
  def vdotFold(a: Column, b: Column): Column = {
    val n = least(size(a), size(b))
    aggregate(
      zip_with(slice(a, lit(1), n), slice(b, lit(1), n),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)
  }

  /** L2 norm. */
  def vnorm(a: Column): Column = sqrt(vdot(a, a))

  /** Cosine similarity: dot / (|a| * |b|), with the ZERO-VECTOR contract
    * (round-8 adversarial sweep): a zero-norm vector's cosine is defined
    * as 0.0 — orthogonal to everything, never retrieved, never flagged
    * near-dup. Unguarded, the division is an ANSI DIVIDE_BY_ZERO crash
    * that took down 15 of the 23 vector-family queries at once — and a
    * 100 TB embedding table WILL contain zero vectors (failed encoder
    * outputs, padding rows). The oracle twin is `cosSql`'s CASE.
    */
  def cosine(a: Column, b: Column): Column = {
    val den = vnorm(a) * vnorm(b)
    when(den === 0.0, lit(0.0)).otherwise(vdot(a, b) / den)
  }

  /** Cosine given precomputed norms (avoids recomputing norms in a join);
    * same zero-vector contract as [[cosine]].
    */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column = {
    val den = na * nb
    when(den === 0.0, lit(0.0)).otherwise(vdot(a, b) / den)
  }
}
