package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Media-corpus ingestion via Spark's `binaryFile` source — how a
  * directory tree of image/audio payloads actually lands in a DataFrame:
  * one row per file with (path, modificationTime, length, content), the
  * path glob applied at file listing time so non-matching files are never
  * opened. Output is normalized to the multimodal pipeline's contract —
  * `doc_id` (stable 64-bit hash of the path), `text` (the raw payload,
  * BinaryType — the same column the parquet-backed documents table feeds
  * through [[graft.operators.Multimodal.withBinaryMeta]]), `path` kept for
  * lineage — so `decodeFeatures` / `decodeImages` / `frameSample` run
  * unchanged over files on disk.
  *
  * Scale notes: binaryFile is a DataSource-V1 FileFormat — the listing is
  * distributed and the scan parallelizes per file (files don't split:
  * one payload is one row by construction, which is exactly right for
  * media blobs). Partition-directory layouts (`date=.../cam=...`) project
  * partition columns like any file source, so partition pruning applies
  * before the listing; `spark.sql.files.maxPartitionBytes` packs many
  * small media files into one task rather than one task per file.
  */
object BinarySource {

  /** One row per matching file under `dir`: (doc_id, text, path, mtime). */
  def readDir(spark: SparkSession, dir: String,
              glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).as("doc_id"),
        col("content").as("text"),
        col("path"),
        col("modificationTime").as("mtime"))
}
