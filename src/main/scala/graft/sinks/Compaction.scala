package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction: rewrite a parquet dataset into files of
  * ~`targetBytes` each.
  *
  * Streaming micro-batches and per-day incremental jobs accrete small
  * files; at 100 TB the resulting task-per-tiny-file scheduling overhead
  * and NameNode/listing pressure dominate scan cost. Compaction is the
  * standing maintenance operator: size the output by the dataset's actual
  * bytes, rewrite once, swap with a crash-safe two-rename protocol.
  *
  * Swap protocol (no step ever deletes the only copy of the data):
  *   1. write compacted data to `path_compacting`
  *   2. rename `path` -> `path_old`        (original preserved)
  *   3. rename `path_compacting` -> `path` (new data live)
  *   4. delete `path_old`                  (cleanup)
  * A crash between 2 and 3 leaves the data in `path_old` + the full new
  * copy in `path_compacting`; `recover()` (run automatically on the next
  * `compact`) promotes the new copy and finishes the swap. A crash anywhere
  * else leaves `path` itself intact. Single-writer is assumed (one
  * maintenance job per dataset), as with any rename-based swap.
  */
object Compaction {

  private def tmpPath(p: Path) = new Path(p.toString + "_compacting")
  private def oldPath(p: Path) = new Path(p.toString + "_old")

  /** Where a writer must stage a replacement dataset for [[promote]] —
    * the `_compacting` sibling, so `recover()` can finish an interrupted
    * swap no matter who initiated it.
    */
  def stagingDir(path: String): String = path + "_compacting"

  /** Run crash recovery for `path` (public wrapper: any reader/writer of
    * a swap-managed dataset can heal an interrupted swap up front).
    */
  def recoverPath(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    recover(p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Steps 2–4 of the swap protocol: promote the fully-written staged
    * copy at `stagingDir(path)` to `path`. No step deletes the only copy;
    * on failure the original is restored and the error rethrown. Also
    * valid when `path` does not exist yet (first materialization).
    */
  def promote(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = tmpPath(p)
    val old = oldPath(p)
    if (!fs.exists(tmp))
      throw new java.io.IOException(s"promote: no staged copy at $tmp")
    if (fs.exists(p) && !fs.rename(p, old)) {
      fs.delete(tmp, true)
      throw new java.io.IOException(s"promote: rename $p -> $old failed")
    }
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, true)
      if (fs.exists(old) && !fs.rename(old, p))
        throw new java.io.IOException(
          s"promote: promotion AND restore failed; original preserved at $old")
      throw new java.io.IOException(
        s"promote: rename $tmp -> $p failed; original restored")
    }
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** Finish or roll back an interrupted swap so `path` is always readable.
    * Idempotent; called automatically at the start of `compact`.
    */
  def recover(fs: FileSystem, p: Path): Unit = {
    val tmp = tmpPath(p)
    val old = oldPath(p)
    if (!fs.exists(p)) {
      // crashed between step 2 and 3: the new copy is complete (it was
      // written and closed before step 2 began) — promote it. rename
      // reports failure by RETURNING false, so a failed promotion must
      // still fall through to the original (an `else if` on existence
      // alone would strand a readable copy in _old behind a bad _tmp)
      val promoted = fs.exists(tmp) && fs.rename(tmp, p)
      if (!promoted && fs.exists(old)) fs.rename(old, p)
    }
    // canonical path exists: anything left over is garbage from step 1 or 4
    if (fs.exists(p)) {
      if (fs.exists(old)) fs.delete(old, true)
      if (fs.exists(tmp)) fs.delete(tmp, true)
    }
  }

  /** Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, p)
    val files = fs.listStatus(p).filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val tmp = tmpPath(p)
    spark.read.parquet(path)
      .repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    // Hadoop rename signals failure by RETURNING false, not throwing —
    // promote() checks every step, restores the original on failure, and
    // aborts loudly; recover() heals anything a crash leaves behind.
    promote(spark, path)

    val after = fs.listStatus(p).count(f => f.isFile && !f.getPath.getName.startsWith("_"))
    (files.length, after)
  }
}
