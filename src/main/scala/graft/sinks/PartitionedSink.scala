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
}
