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
    val old = oldPath(p)
    spark.read.parquet(path)
      .repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    // Hadoop rename signals failure by RETURNING false, not throwing —
    // an unchecked false would fall through to delete(old) and leave the
    // canonical path missing. On any failed step, recover() restores a
    // readable dataset and the compaction aborts loudly.
    if (!fs.rename(p, old)) {
      fs.delete(tmp, true)
      throw new java.io.IOException(s"compact: rename $p -> $old failed")
    }
    if (!fs.rename(tmp, p)) {
      // promotion failed: discard the compacted copy FIRST so the restore
      // cannot race a half-working tmp, then put the original back
      fs.delete(tmp, true)
      if (!fs.rename(old, p))
        throw new java.io.IOException(
          s"compact: promotion AND restore failed; original preserved at $old")
      throw new java.io.IOException(
        s"compact: rename $tmp -> $p failed; original restored")
    }
    fs.delete(old, true)

    val after = fs.listStatus(p).count(f => f.isFile && !f.getPath.getName.startsWith("_"))
    (files.length, after)
  }
}
