package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media payloads as opaque `binary`
  * columns plus a typed metadata struct, with decode/feature-extraction as a
  * partition-parallel stage.
  *
  * The Spark-side plumbing (schema, batching via mapPartitions, metadata
  * derivation, content addressing) is real and tested; the actual
  * image/audio decode is STUBBED (`fakeDecode`) — codec libraries are not in
  * this container. Swap `fakeDecode` for a real decoder (or a Pandas-UDF
  * `mapInPandas` stage on a PySpark cluster) without touching the plan
  * shape.
  */
object Multimodal {

  /** Attach binary payload + cheap metadata: byte size and a sha-256 content
    * id (content addressing = the dedup/caching key for blob stores).
    */
  def withBinaryMeta(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")))
      .withColumn("content_id", sha2(col("payload"), 256))

  final case class MediaFeature(doc_id: Long, n_bytes: Int, width: Int,
                                height: Int, feature: Array[Float])

  /** STUB decoder: deterministic fake "decode" of a binary payload into
    * (width, height, feature vector). Real decode goes here.
    */
  private def fakeDecode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val w = 16 + (payload.length % 32)
    val h = 16 + ((payload.length / 32) % 32)
    val feat = Array.tabulate(8)(i => payload((i * 7) % payload.length).toFloat)
    (w, h, feat)
  }

  /** Partition-parallel decode/feature-extract stage. Runs once per payload
    * inside executors (mapPartitions => per-partition codec init amortized);
    * output is a typed Dataset with a columnar-friendly schema.
    */
  def decodeFeatures(spark: SparkSession, docs: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    withBinaryMeta(docs)
      .select(col("doc_id"), col("payload"), col("n_bytes"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions { it =>
        // per-partition decoder init would go here
        it.map { case (id, payload, n) =>
          val (w, h, f) = fakeDecode(payload)
          MediaFeature(id, n, w, h, f)
        }
      }
  }

  /** STUB resize: normalize decoded media to a target (width, height),
    * rescaling the feature vector deterministically — the post-decode
    * normalization stage every vision pipeline has. Swap the arithmetic for
    * a real resampler; the Dataset-in/Dataset-out shape stays.
    */
  def resize(features: Dataset[MediaFeature], targetW: Int,
             targetH: Int): Dataset[MediaFeature] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val sx = targetW.toFloat / f.width
      val sy = targetH.toFloat / f.height
      f.copy(width = targetW, height = targetH,
        feature = f.feature.map(v => v * sx * sy))
    }
  }

  final case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** STUB frame sampler: `nFrames` evenly spaced "frames" (byte slices) per
    * payload — the video-decode batch shape (1 payload row → N frame rows)
    * with the real plumbing: partition-parallel decode, typed flatMap
    * output, columnar-friendly schema. A real build swaps the slicer for a
    * codec (or runs the equivalent `mapInPandas` stage under PySpark).
    */
  def frameSample(spark: SparkSession, docs: DataFrame, nFrames: Int): Dataset[Frame] = {
    import spark.implicits._
    withBinaryMeta(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val stride = math.max(1, payload.length / nFrames)
          (0 until math.min(nFrames, payload.length)).iterator.map { i =>
            val from = i * stride
            Frame(id, i, payload.slice(from, math.min(from + stride, payload.length)))
          }
        }
      }
  }
}
