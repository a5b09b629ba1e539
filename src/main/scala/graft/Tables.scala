package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * The reference pipeline reads its inputs as CSV/parquet from S3 prefixes
  * (reference: glue_jobs/transform.py:13-16, glue_jobs/validate.py:53-55);
  * here every table is a parquet file under a scale-factor directory.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
  * rejects outright ([PARQUET_TYPE_ILLEGAL]). We read it through
  * `spark.sql.legacy.parquet.nanosAsLong` (raw int64 nanos) and derive
  *  - `ts_us` — epoch microseconds (`ts div 1000`, integral — never through
  *    a double), bit-identical to what DuckDB's parquet reader produces when
  *    it truncates the same nanos to its native microsecond timestamps, so
  *    oracle comparisons are exact;
  *  - `ts`    — a proper TimestampType for date/window logic.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftFunctions.register(spark) // idempotent; covers driver-owned sessions
    if (name == "events") events(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")
  }

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts_us", expr("ts div 1000"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case _ =>
        // Timestamp-typed parquet (driver regenerations have surfaced both
        // LTZ and TIMESTAMP_NTZ micros). NTZ breaks `window()` /
        // `session_window()` (DATATYPE_MISMATCH on `.start`), so always
        // rebuild `ts` as a session-TZ TimestampType from the exact micros.
        raw.withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
          .withColumn("ts", timestamp_micros(col("ts_us")))
    }
  }
}
