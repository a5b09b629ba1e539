package graft.sources

import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Avro Object-Container-File ingest WITHOUT the spark-avro connector —
  * built directly on the avro-core jars Spark already ships (public
  * Apache Avro API). The container's `binaryFile` source distributes
  * whole files to executors; each partition opens its files with
  * `DataFileReader` (sync-marker walk, null/deflate codecs) and projects
  * the requested Spark schema by FIELD NAME.
  *
  * Schema contract (the spark-avro subset a pipeline actually needs):
  *  - reader field resolution by name; a field absent from the writer
  *    record yields null (schema evolution: new nullable columns)
  *  - Avro `union [null, T]` unwraps to nullable T
  *  - types: boolean / int / long / float / double / string / bytes
  *  - PERMISSIVE file handling: a file that fails to open or decode
  *    (bad magic, corrupt header/block) contributes zero rows instead
  *    of failing the job — corrupt payloads are routine input at
  *    corpus scale (same philosophy as the CSV/JSONL corrupt-record
  *    splits; route the complement through `badFiles` for the ledger).
  *    Caveat inherited from Avro itself: TRUNCATION after the header is
  *    silent by the format's sync-recovery design (mid-block EOF reads
  *    as end-of-stream), so a truncated file yields fewer rows, not an
  *    error — reconcile row counts (the q86 snapshot-diff pattern) to
  *    catch it, exactly as spark-avro deployments must
  *
  * Scale: whole-file granularity parallelism (one Avro OCF is one
  * split), no driver-side reads, schema projected before rows leave the
  * executor. Row-group-style splitting inside one huge OCF is the
  * connector's job — a corpus layout with many medium files (the norm)
  * saturates a cluster without it.
  */
object AvroSource {

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val files = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    readFiles(files, schema)
  }

  /** The per-file complement: paths that do NOT decode (for the
    * rejected-file ledger, mirroring Pipeline's bad-records branch).
    */
  def badFiles(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, bytes) =>
        if (decodable(bytes)) None else Some(p)
      })
      .toDF("path")
  }

  private def decodable(bytes: Array[Byte]): Boolean =
    try {
      val r = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(bytes), new GenericDatumReader[GenericRecord]())
      try { while (r.hasNext) r.next(); true } finally r.close()
    } catch { case _: Throwable => false }

  private[sources] def readFiles(files: DataFrame, schema: StructType): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val fieldNames = schema.fields.map(_.name)
    val fieldTypes = schema.fields.map(_.dataType)
    files
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (_, bytes) =>
          val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
          try {
            val reader = new DataFileReader[GenericRecord](
              new SeekableByteArrayInput(bytes),
              new GenericDatumReader[GenericRecord]())
            try {
              // resolve field positions ONCE per file (the writer schema
              // is fixed per OCF) — not per record (review finding)
              val pos: Array[Int] = fieldNames.map { n =>
                val f = reader.getSchema.getField(n)
                if (f == null) -1 else f.pos()
              }
              while (reader.hasNext) {
                val rec = reader.next()
                rows += Row.fromSeq(fieldNames.indices.map { i =>
                  if (pos(i) < 0) null
                  else convert(rec.get(pos(i)), fieldTypes(i))
                })
              }
            } finally reader.close()
          } catch {
            // PERMISSIVE: corrupt OR schema-incompatible file → 0 rows
            // (convert throws on a writer/reader type mismatch, so the
            // mismatch can never smuggle a wrong-typed value into the
            // Row encoder and fail the job downstream — review finding)
            case _: Throwable => rows.clear()
          }
          rows
        }
      }(Encoders.row(schema))
  }

  /** Strict conversion keyed on the TARGET type: anything that does not
    * coerce cleanly throws, which the per-file catch converts into the
    * zero-rows PERMISSIVE outcome.
    */
  private def convert(v: AnyRef, t: DataType): Any =
    if (v == null) null
    else t match {
      case StringType => v match {
        case u: org.apache.avro.util.Utf8 => u.toString
        case s: String => s
        case _ => incompatible(v, t)
      }
      case LongType => v match {
        case i: java.lang.Integer => i.longValue()
        case l: java.lang.Long => l.longValue()
        case _ => incompatible(v, t)
      }
      case IntegerType => v match {
        case i: java.lang.Integer => i.intValue()
        case _ => incompatible(v, t)
      }
      case DoubleType => v match {
        case d: java.lang.Double => d.doubleValue()
        case fl: java.lang.Float => fl.doubleValue()
        case _ => incompatible(v, t)
      }
      case FloatType => v match {
        case fl: java.lang.Float => fl.floatValue()
        case _ => incompatible(v, t)
      }
      case BooleanType => v match {
        case b: java.lang.Boolean => b.booleanValue()
        case _ => incompatible(v, t)
      }
      case BinaryType => v match {
        case b: java.nio.ByteBuffer =>
          val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
        case _ => incompatible(v, t)
      }
      case _ => incompatible(v, t)
    }

  private def incompatible(v: AnyRef, t: DataType): Nothing =
    throw new IllegalArgumentException(
      s"avro value of ${v.getClass.getSimpleName} does not coerce to $t")
}
