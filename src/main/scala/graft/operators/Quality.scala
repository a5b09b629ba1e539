package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass data-quality report: uniqueness, null ratios, value bounds and
  * cardinalities computed in a SINGLE aggregation over the data — the
  * generalization of the reference's per-column null validation
  * (reference: glue_jobs/validate.py:34-47) to the constraint-report shape
  * a 100 TB pipeline needs (one scan, not one scan per check).
  *
  * All report values are exactly reproducible: counts are longs, ratios are
  * single divisions of longs, bounds are min/max (no summation).
  */
object Quality {

  private def nullCount(c: String): Column =
    sum(when(col(c).isNull, 1L).otherwise(0L))

  /** Report columns: n_rows, key uniqueness (distinct count + flag),
    * per-required-column null ratios (`null_ratio_<col>`), min/max of the
    * value column, and the value column's distinct cardinality.
    */
  def report(df: DataFrame, uniqueKey: String, requiredCols: Seq[String],
             valueCol: String): DataFrame = {
    val cols: Seq[Column] = Seq(
      count(lit(1)).as("n_rows"),
      countDistinct(col(uniqueKey)).as("n_distinct_keys"),
      (count(lit(1)) === countDistinct(col(uniqueKey))).as("key_is_unique"),
      min(col(valueCol)).as("min_value"),
      max(col(valueCol)).as("max_value")) ++
      requiredCols.map { c =>
        (nullCount(c).cast("double") / count(lit(1))).as(s"null_ratio_$c")
      }
    df.agg(cols.head, cols.tail: _*)
  }

  /** Column-level profile, one row per profiled column: row/null/distinct
    * counts and string-cast min/max bounds. ONE aggregation pass over the
    * data computes every column's statistics (the exact countDistincts
    * share a single Expand — k× map-side rows, never k scans), then a
    * zero-shuffle stack melts the 1-row wide aggregate into the per-column
    * report. Profile STRING/BIGINT/DATE-typed columns; double bounds
    * would hit engine-specific decimal formatting in the string cast.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // internal aliases are INDEX-based and the reported name is an escaped
    // string literal, so arbitrary column names (dots, spaces, quotes)
    // cannot break the stack SQL; source columns resolve via df(c), which
    // matches the exact name rather than parsing it
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +:
      cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(sum(when(df(c).isNull, 1L).otherwise(0L)).as(s"nn_$i"),
          countDistinct(df(c)).as(s"nd_$i"),
          min(df(c)).cast("string").as(s"mn_$i"),
          max(df(c)).cast("string").as(s"mx_$i"))
      }
    val stackArgs = cols.zipWithIndex
      .map { case (c, i) => s"'${c.replace("'", "''")}', nn_$i, nd_$i, mn_$i, mx_$i" }
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), expr(
        s"stack(${cols.length}, $stackArgs) AS " +
          "(col_name, n_nulls, n_distinct, min_s, max_s)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }

  /** Constraint suite: evaluate named row-level predicates in ONE pass,
    * one output row per constraint — (constraint, n_violations, pass).
    * A violation is a row where the predicate is FALSE OR NULL (a
    * constraint that cannot be evaluated is not satisfied — the
    * three-valued-logic trap that lets `value >= 0` "pass" on nulls).
    * All violation counters ride a single aggregate; the melt is a
    * zero-shuffle stack on the 1-row result, so a 50-constraint suite
    * still costs exactly one scan.
    */
  def constraints(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "constraints needs at least one check")
    // coalesce(sum, 0): an EMPTY input has zero violations — every check
    // passes vacuously, rather than reporting null/unknown
    val aggs: Seq[Column] = checks.zipWithIndex.map { case ((_, pred), i) =>
      coalesce(sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)),
        lit(0L)).as(s"v_$i")
    }
    val stackArgs = checks.zipWithIndex
      .map { case ((name, _), i) => s"'${name.replace("'", "''")}', v_$i" }
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(
        s"stack(${checks.length}, $stackArgs) AS (check_name, n_violations)"))
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** Exact-integer two-sample Kolmogorov–Smirnov distance between the
    * `x` columns of two frames (q218's statistic, factored for reuse by
    * the streaming drift gate): D is kept as the integer
    * max |n_b·C_a(x) − n_a·C_b(x)| over the observed support — scaled by
    * n_a·n_b, no division ever happens — with the argmax tie-broken to
    * the smallest x. Everything after the per-side value aggregates runs
    * on the bounded |distinct values| frame. Output one row:
    * (n_a, n_b, x_at_max, d_scaled).
    */
  def ksScaled(a: DataFrame, b: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ca = a.groupBy(col("x")).agg(count(lit(1)).as("ca"))
    val cb = b.groupBy(col("x")).agg(count(lit(1)).as("cb"))
    val merged = ca.join(cb, Seq("x"), "full_outer")
      .select(col("x"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val cum = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy()
    merged
      .withColumn("c1", sum(col("ca")).over(cum))
      .withColumn("c2", sum(col("cb")).over(cum))
      .withColumn("n_a", sum(col("ca")).over(tot))
      .withColumn("n_b", sum(col("cb")).over(tot))
      .withColumn("d", abs(col("n_b") * col("c1") - col("n_a") * col("c2")))
      .withColumn("r", org.apache.spark.sql.functions.row_number().over(
        Window.orderBy(col("d").desc, col("x").asc)))
      .filter(col("r") === 1)
      .select(col("n_a"), col("n_b"), col("x").as("x_at_max"),
        col("d").as("d_scaled"))
  }
}
