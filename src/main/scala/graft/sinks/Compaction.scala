package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction: rewrite a parquet dataset into files of
  * ~`targetBytes` each.
  *
  * Streaming micro-batches and per-day incremental jobs accrete small
  * files; at 100 TB the resulting task-per-tiny-file scheduling overhead
  * and NameNode/listing pressure dominate scan cost. Compaction is the
  * standing maintenance operator: size the output by the dataset's actual
  * bytes, rewrite once, swap atomically (write to a sibling temp dir, then
  * rename over the original — readers never observe a half-written state).
  */
object Compaction {

  /** Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val tmp = new Path(path + "_compacting")
    spark.read.parquet(path)
      .repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(p, true)
    fs.rename(tmp, p)

    val after = fs.listStatus(p).count(f => f.isFile && !f.getPath.getName.startsWith("_"))
    (files.length, after)
  }
}
