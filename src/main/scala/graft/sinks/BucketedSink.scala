package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

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

  /** Bucketed write with z-ordered file layout INSIDE each bucket: the
    * join-key bucketing (shuffle-free joins + bucket pruning) and the
    * Morton-curve data skipping ([[PartitionedSink.writeZOrdered]])
    * compose instead of excluding each other.
    *
    * Layout: range-partition on (bucket id, z) — `pmod(hash(key), n)`
    * reproduces the writer's bucket assignment, so each task holds one
    * bucket's contiguous z-band and `filesPerBucket` files tile each
    * bucket's (x, y) space into small rectangles. A filter on the join
    * key prunes to one bucket's files; a rectangle filter on (x, y)
    * prunes files inside surviving buckets by parquet min/max; the
    * bucketed join still plans with zero Exchange. The z-value persists
    * as column `z` (sortBy demands a table column, and a z-range scan
    * predicate is useful in its own right).
    *
    * Dimensions must be 16-bit-ranged, exactly as in writeZOrdered
    * (quantile-bucket or hash-fold wider domains first).
    */
  def writeBucketedZOrdered(df: DataFrame, table: String, key: String,
                            nBuckets: Int, xCol: String, yCol: String,
                            filesPerBucket: Int): Unit =
    df.withColumn("z", graft.functions.ZOrder.zValue(col(xCol), col(yCol)))
      .withColumn("_b", pmod(hash(col(key)), lit(nBuckets)))
      .repartitionByRange(nBuckets * filesPerBucket, col("_b"), col("z"))
      .drop("_b")
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key)
      .sortBy("z")
      .saveAsTable(table)
}
