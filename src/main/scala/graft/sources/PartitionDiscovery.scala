package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Latest `date=YYYY-MM-DD` partition discovery over a partitioned dataset
  * directory (reference: glue_jobs/load_dynamo.py:27-39, which lists S3 keys
  * and sorts). Spark-native form: list the partition directories through the
  * Hadoop FS API (works for s3a:// the same as file://), pick the max, and
  * read ONLY that directory — so the scan is partition-pruned by
  * construction.
  */
object PartitionDiscovery {
  private val DatePart = "date=(\\d{4}-\\d{2}-\\d{2})".r

  def latestDatePartition(spark: SparkSession, basePath: String): Option[String] = {
    val path = new Path(basePath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return None
    val parts = fs.listStatus(path).iterator
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n @ DatePart(_) => n }
      .toSeq
    if (parts.isEmpty) None else Some(s"$basePath/${parts.max}")
  }

  /** Read only the newest date partition (with the partition column kept). */
  def readLatest(spark: SparkSession, basePath: String): Option[DataFrame] =
    latestDatePartition(spark, basePath).map { p =>
      spark.read.option("basePath", basePath).parquet(p)
    }
}
