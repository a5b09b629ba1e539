package graft

import java.nio.file.Files
import java.sql.Timestamp

class TablesSpec extends SparkTestBase {
  import spark.implicits._

  test("events loader: NANOS parquet arrives as ts_us long + ts timestamp") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    ev.schema("ts_us").dataType.typeName shouldBe "long"
    ev.schema("ts").dataType.typeName shouldBe "timestamp"
    val r = ev.selectExpr("max(ts_us)", "max(unix_micros(ts))").head()
    r.getLong(0) shouldBe r.getLong(1) // derived consistently
  }

  test("events loader fallback: timestamp-typed input gets ts_us derived") {
    val dir = Files.createTempDirectory("tload").toString + "/events.parquet"
    Seq((1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L))
      .toDF("event_id", "ts", "user_id").write.parquet(dir)
    val ev = Tables.events(spark, dir.stripSuffix("/events.parquet"))
    ev.schema("ts_us").dataType.typeName shouldBe "long"
    ev.select("ts_us").as[Long].head() shouldBe
      Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000L
  }

  test("events loader contract: TIMESTAMP_NTZ parquet still yields TimestampType ts") {
    // the round-3 regression layout: driver-regenerated events.parquet
    // surfaced ts as TIMESTAMP_NTZ and window()/session_window() threw
    // DATATYPE_MISMATCH — the loader must rebuild ts as session-TZ
    // TimestampType for EVERY layout
    val dir = Files.createTempDirectory("tloadntz").toString
    Seq((1L, java.time.LocalDateTime.of(2024, 1, 1, 10, 0, 0), 1L))
      .toDF("event_id", "ts", "user_id").write.parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    ev.schema("ts").dataType.typeName shouldBe "timestamp"
    ev.schema("ts_us").dataType.typeName shouldBe "long"
    // window() over the rebuilt ts must analyze (the regression's symptom)
    import org.apache.spark.sql.functions.{window => twindow, col, unix_micros}
    val w = ev.groupBy(twindow(col("ts"), "1 hour"))
      .count().select(unix_micros(col("window.start"))).head().getLong(0)
    w shouldBe java.time.LocalDateTime.of(2024, 1, 1, 10, 0, 0)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
  }

  test("PartitionDiscovery ignores non-date directories") {
    val dir = Files.createTempDirectory("pdisc2").toString
    Seq(("2024-01-05", 1L), ("2024-02-01", 2L)).toDF("date", "v")
      .write.partitionBy("date").parquet(s"$dir/t")
    // pollute with a non-date partition-style dir
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/t/date=not-a-date"))
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/t/other=thing"))
    graft.sources.PartitionDiscovery.latestDatePartition(spark, s"$dir/t") shouldBe
      Some(s"$dir/t/date=2024-02-01")
  }
}
