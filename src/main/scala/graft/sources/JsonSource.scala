package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) ingest with an explicit schema — the
  * interchange format most raw LLM-corpus drops arrive in (one document
  * object per line, typed metadata nested inside).
  *
  * Same contract as [[CsvSource]]: explicit schema = one pass and stable
  * types; PERMISSIVE parse routes malformed lines to a corrupt-record
  * column instead of failing the load; the parse must be materialized
  * before `_corrupt_record` filters are well-defined (same Spark
  * restriction as CSV — the pushed-down parser returns null for the
  * column otherwise).
  */
object JsonSource {
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", "string"))
      .json(path)

  /** (good, bad) split on parse-level corruption; single cached parse. */
  def readSplit(spark: SparkSession, path: String,
                schema: StructType): (DataFrame, DataFrame) = {
    val df = read(spark, path, schema).cache()
    (df.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      df.filter(col("_corrupt_record").isNotNull))
  }
}
