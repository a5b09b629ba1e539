package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV ingest with header + explicit schema, the Spark-native form of the
  * reference's CSV reads (reference: glue_jobs/transform.py:16,
  * glue_jobs/validate.py:19-23 — pandas read_csv from S3).
  *
  * An explicit schema (rather than inferSchema) means one pass, stable
  * types, and malformed rows routed to a corrupt-record column instead of
  * poisoning the load — the analog of the reference's bad-records split at
  * the parse layer.
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
}
