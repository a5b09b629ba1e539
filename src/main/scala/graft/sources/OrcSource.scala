package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC read/write — the second columnar format warehouses actually hold
  * alongside parquet (no reference analog; engine-breadth for mixed-format
  * lakes). Spark's native vectorized ORC reader gives the same scan-stage
  * properties as parquet: predicate pushdown into stripe/row-group
  * statistics, column pruning, and whole-stage codegen over the batches —
  * the spec asserts PushedFilters reaches the ORC scan, so a selective
  * filter at 100 TB skips stripes instead of decoding them.
  */
object OrcSource {
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
