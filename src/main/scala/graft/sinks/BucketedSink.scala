package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table write path: the co-located-join primitive.
  *
  * Two tables bucketed (and sorted) on the same join key with the same
  * bucket count join WITHOUT any shuffle or sort — each bucket pair is a
  * local merge. At 100 TB this converts the nightly fact⋈fact join from
  * the cluster's largest shuffle into a scan: bucket once on write, join
  * free forever after. The write itself shuffles once to lay the buckets
  * out — `repartition(n, key)` first keeps it to exactly one file per
  * bucket, which is what preserves the sorted-merge property on read.
  */
object BucketedSink {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int): Unit =
    df.repartition(nBuckets, col(key))
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
