package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema validation + good/bad row split.
  *
  * Re-expresses the reference's pandas validation job
  * (reference: glue_jobs/validate.py:34-47): assert required columns exist,
  * route rows with any null required field to a bad-records sink, keep the
  * rest. Here it is a single declarative predicate over the DataFrame — one
  * scan per output, fully pushed down to the parquet reader; no
  * driver-side materialization.
  */
object Validation {

  final case class MissingColumnsException(table: String, missing: Seq[String])
    extends RuntimeException(s"Missing columns in $table: ${missing.mkString(", ")}")

  /** Assert every required column is present (validate.py:35-37). */
  def requireColumns(df: DataFrame, required: Seq[String], table: String): DataFrame = {
    val missing = required.filterNot(df.columns.contains)
    if (missing.nonEmpty) throw MissingColumnsException(table, missing)
    df
  }

  private def anyNull(required: Seq[String]): Column =
    required.map(col(_).isNull).reduce(_ || _)

  /** (good, bad) split on null-ness of the required columns
    * (validate.py:40-47). Both sides are lazy plans over the same scan.
    */
  def splitGoodBad(df: DataFrame, required: Seq[String], table: String): (DataFrame, DataFrame) = {
    val checked = requireColumns(df, required, table)
    (checked.filter(!anyNull(required)), checked.filter(anyNull(required)))
  }

  /** Deterministic synthetic corruption used by tests/verification so the
    * bad-records path is exercised even on a clean input: nulls out `value`
    * on every 97th event. (The reference's raw CSVs contain genuinely dirty
    * rows; the driver-generated parquet does not.)
    */
  def corruptEvents(events: DataFrame): DataFrame =
    events.withColumn("value",
      when(col("event_id") % 97 === 0, lit(null)).otherwise(col("value")))
}
