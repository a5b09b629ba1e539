package graft

import graft.sinks.KeyValueSink
import java.nio.file.Files
import java.sql.Timestamp

class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("processFile runs validate->transform->load once, skips reprocessing") {
    KeyValueSink.KVStore.clear()
    val work = Files.createTempDirectory("pipe").toString
    val input = s"$work/in/batch1"
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 10.0),
      (2L, Timestamp.valueOf("2024-01-01 11:00:00"), 2L, "view", 20.0),
      (3L, null.asInstanceOf[Timestamp], 1L, "bad", 5.0) // null ts -> bad record
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(input)
    val customer = Seq((1L, Some("SEG_A")), (2L, Some("SEG_B")),
      (3L, None) // null segment -> dim bad record
    ).toDF("c_custkey", "c_mktsegment")

    val p = new Pipeline(spark, work)
    p.processFile(input, customer) shouldBe true
    // THREE processed outputs, each date-partitioned (transform.py:53-55)
    val kpis = spark.read.parquet(s"$work/processed/daily_kpis")
    kpis.count() shouldBe 2 // one row per (date, segment)
    spark.read.parquet(s"$work/processed/top_types").count() shouldBe 2
    spark.read.parquet(s"$work/processed/top_segments").count() shouldBe 2
    // BOTH inputs validated: bad rows captured, good rows in validated/
    spark.read.parquet(s"$work/bad-records/events/batch1").count() shouldBe 1
    spark.read.parquet(s"$work/bad-records/customer/batch1").count() shouldBe 1
    spark.read.parquet(s"$work/validated/events/batch1").count() shouldBe 2
    spark.read.parquet(s"$work/validated/customer/batch1").count() shouldBe 2
    // THREE KV tables provisioned with key schemas and populated
    KeyValueSink.KVStore.describeTable("DailyKpis") shouldBe
      Some(KeyValueSink.KeySchema("date", "segment"))
    KeyValueSink.KVStore.scan("DailyKpis").size shouldBe 2
    KeyValueSink.KVStore.scan("TopTypesPerSegment").size shouldBe 2
    KeyValueSink.KVStore.scan("TopSegmentsPerDay").size shouldBe 2
    val kpiItem = KeyValueSink.KVStore.get("DailyKpis", "2024-01-01", "SEG_A").get
    kpiItem("unique_users") shouldBe 1L
    kpiItem("event_count") shouldBe 1L
    kpiItem("total_value") shouldBe 10.0
    // archive: the input moved out of the landing zone (raw/ -> archive/)
    new java.io.File(input).exists() shouldBe false
    new java.io.File(s"$work/archive/batch1").exists() shouldBe true
    // idempotency: second run is a no-op (ledger, not file presence)
    p.processFile(input, customer) shouldBe false
    p.processedFiles() shouldBe Set("batch1")
  }

  test("KV write against a provisioned table rejects mismatched key columns") {
    KeyValueSink.KVStore.clear()
    KeyValueSink.createTableIfNotExists("Strict", KeyValueSink.KeySchema("date", "genre"))
    val df = Seq(("2024-01-01", "rock")).toDF("pk", "sk")
    an[IllegalArgumentException] should be thrownBy
      KeyValueSink.write(df, "Strict", "pk", "sk")
    an[IllegalArgumentException] should be thrownBy
      KeyValueSink.createTableIfNotExists("Strict", KeyValueSink.KeySchema("a", "b"))
  }

  test("processNext senses the inbox oldest-first with ledger skips") {
    KeyValueSink.KVStore.clear()
    val work = Files.createTempDirectory("pipe-inbox").toString
    val inbox = s"$work/in"
    val customer = Seq((1L, "SEG_A")).toDF("c_custkey", "c_mktsegment")
    def drop(name: String, mtimeSec: Long): Unit = {
      Seq((1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.parquet(s"$inbox/$name")
      Files.setLastModifiedTime(java.nio.file.Paths.get(inbox, name),
        java.nio.file.attribute.FileTime.fromMillis(mtimeSec * 1000))
    }
    // dropped out of order: newest first on disk, oldest must process first
    drop("c_newest", 3000)
    drop("a_oldest", 1000)
    drop("b_middle", 2000)

    val p = new Pipeline(spark, work)
    p.nextFile(inbox).map(f => java.nio.file.Paths.get(f).getFileName.toString) shouldBe
      Some("a_oldest")
    // one sense->process per call, LastModified order not name/drop order
    p.processNext(inbox, customer) shouldBe Some(("a_oldest", true))
    p.processNext(inbox, customer) shouldBe Some(("b_middle", true))
    // a validation-rejected file lands in its ledger and is skipped, never
    // retried — the loop moves past it to genuinely new files
    Seq((9L, "oops")).toDF("event_id", "not_the_schema")
      .write.parquet(s"$inbox/bb_broken")
    Files.setLastModifiedTime(java.nio.file.Paths.get(inbox, "bb_broken"),
      java.nio.file.attribute.FileTime.fromMillis(2500 * 1000))
    p.processNext(inbox, customer) shouldBe Some(("bb_broken", false))
    p.processNext(inbox, customer) shouldBe Some(("c_newest", true))
    // drained: both ledgers consulted, nothing reprocessed
    p.processNext(inbox, customer) shouldBe None
    p.processedFiles() shouldBe Set("a_oldest", "b_middle", "c_newest")
    p.rejectedFiles().exists(_.startsWith("bb_broken")) shouldBe true
    // processAll drains a refilled inbox in one call, in mtime order
    drop("e_late", 5000)
    drop("d_early", 4000)
    p.processAll(inbox, customer) shouldBe Seq("d_early", "e_late")
  }

  test("a file failing schema validation branches to rejected, no outputs") {
    val work = Files.createTempDirectory("pipe-rej").toString
    val input = s"$work/in/badschema"
    Seq((1L, "oops")).toDF("event_id", "not_the_schema").write.parquet(input)
    val customer = Seq((1L, "SEG_A")).toDF("c_custkey", "c_mktsegment")

    val p = new Pipeline(spark, work)
    p.processFile(input, customer) shouldBe false
    p.rejectedFiles().exists(_.startsWith("badschema")) shouldBe true
    p.processedFiles() shouldBe empty
    new java.io.File(s"$work/processed").exists() shouldBe false
    // rejected files are never retried
    p.processFile(input, customer) shouldBe false
  }
}
