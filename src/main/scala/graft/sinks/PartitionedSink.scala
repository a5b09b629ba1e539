package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partitioned parquet output, `date=YYYY-MM-DD` layout — the reference's
  * processed-zone layout (reference: glue_jobs/transform.py:53-55 writes
  * overwrite-mode parquet; load_dynamo.py:27-39 then discovers `date=`
  * partitions, implying partitionBy(date)).
  *
  * Dynamic partition overwrite replaces only the partitions present in this
  * batch — the idempotent-reprocessing primitive: re-running a day's job
  * rewrites that day, not the table.
  */
object PartitionedSink {
  def writeDaily(df: DataFrame, dateCol: String, path: String): Unit =
    df.withColumn("date", col(dateCol).cast("string"))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("date")
      .parquet(path)

  /** Z-order-clustered parquet layout over two dimensions: rows are
    * range-partitioned and sorted by the Morton z-value of (xCol, yCol),
    * so every output file covers a small rectangle of the 2-D key space
    * and per-file min/max statistics prune scans filtered on EITHER
    * column. `nFiles` sizes the output (at 100 TB: total size /
    * target file size, not a row-count heuristic).
    *
    * The two dimensions must already be 16-bit-ranged (quantile-bucket or
    * `hash % 65536` wider domains first — rank-bucketing also fixes skew,
    * which a raw value interleave would inherit).
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    path: String, nFiles: Int): Unit =
    df.withColumn("_z", graft.functions.ZOrder.zValue(col(xCol), col(yCol)))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
