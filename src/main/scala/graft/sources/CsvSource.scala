package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** CSV ingest with header + explicit schema, the Spark-native form of the
  * reference's CSV reads (reference: glue_jobs/transform.py:16,
  * glue_jobs/validate.py:19-23 — pandas read_csv from S3).
  *
  * An explicit schema (rather than inferSchema) means one pass, stable
  * types, and malformed rows routed to a corrupt-record column instead of
  * poisoning the load — the analog of the reference's bad-records split at
  * the parse layer.
  *
  * Spark restriction: a query that filters on `_corrupt_record` straight
  * off the scan is unsupported (the parser prunes/pushes and the column
  * comes back null) — the parse must be materialized first. `readSplit`
  * does exactly that; `read` returns the raw lazy frame for full-row
  * consumers.
  */
object CsvSource {
  def read(spark: SparkSession, path: String, schema: StructType,
           header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", "string"))
      .csv(path)

  /** (good, bad) split on parse-level corruption. The parsed frame is
    * cached — required for corrupt-record filters to be well-defined, and
    * both splits reuse the single parse.
    */
  def readSplit(spark: SparkSession, path: String, schema: StructType,
                header: Boolean = true): (DataFrame, DataFrame) = {
    val df = read(spark, path, schema, header).cache()
    (df.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      df.filter(col("_corrupt_record").isNotNull))
  }

  /** DROPMALFORMED: malformed rows silently removed — for feeds where bad
    * rows are expected noise and a bad-records zone isn't wanted.
    */
  def readDropMalformed(spark: SparkSession, path: String, schema: StructType,
                        header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("mode", "DROPMALFORMED")
      .schema(schema)
      .csv(path)

  /** FAILFAST: any malformed row aborts the read — for contracts where a
    * bad row means an upstream bug, not noise.
    */
  def readFailFast(spark: SparkSession, path: String, schema: StructType,
                   header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("mode", "FAILFAST")
      .schema(schema)
      .csv(path)
}
