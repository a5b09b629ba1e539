package graft

import graft.sinks.{KeyValueSink, PartitionedSink}
import graft.sources.{CsvSource, OrcSource, PartitionDiscovery}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SinksSpec extends SparkTestBase {
  import spark.implicits._

  test("KeyValueSink writes items, skips null-key rows, idempotent puts") {
    KeyValueSink.KVStore.clear()
    val df = Seq(
      (Some("2024-01-01"), Some("A#click"), 5L),
      (Some("2024-01-01"), None, 9L), // null sk -> skipped
      (None, Some("B#view"), 7L)      // null pk -> skipped
    ).toDF("pk", "sk", "play_count")
    KeyValueSink.write(df, "TestTable", "pk", "sk")
    KeyValueSink.write(df, "TestTable", "pk", "sk") // retry-safe
    val items = KeyValueSink.KVStore.scan("TestTable")
    items.size shouldBe 1
    items.head._2("play_count") shouldBe 5L
  }

  test("PartitionedSink dynamic overwrite replaces only the written partitions") {
    val dir = Files.createTempDirectory("psink").toString
    val v1 = Seq(("2024-01-01", 1L), ("2024-01-02", 2L)).toDF("event_date", "v")
    PartitionedSink.writeDaily(v1, "event_date", dir)
    // rewrite ONLY day 2 with a new value
    val v2 = Seq(("2024-01-02", 99L)).toDF("event_date", "v")
    PartitionedSink.writeDaily(v2, "event_date", dir)
    val back = spark.read.parquet(dir).select("date", "v").as[(String, Long)]
      .collect().sortBy(_._1)
    back shouldBe Array(("2024-01-01", 1L), ("2024-01-02", 99L))
  }

  test("PartitionDiscovery finds the latest date= partition and prunes the read") {
    val dir = Files.createTempDirectory("pdisc").toString
    val df = Seq(("2024-01-01", 1L), ("2024-03-05", 2L), ("2024-02-01", 3L))
      .toDF("date", "v")
    df.write.partitionBy("date").parquet(s"$dir/t")
    PartitionDiscovery.latestDatePartition(spark, s"$dir/t") shouldBe
      Some(s"$dir/t/date=2024-03-05")
    val latest = PartitionDiscovery.readLatest(spark, s"$dir/t").get
    latest.select("v").as[Long].collect() shouldBe Array(2L)
    PartitionDiscovery.latestDatePartition(spark, s"$dir/absent") shouldBe None
  }

  test("a partition-column predicate prunes the scan to one directory") {
    val dir = Files.createTempDirectory("pprune").toString
    Seq(("2024-01-01", 1L), ("2024-03-05", 2L), ("2024-02-01", 3L))
      .toDF("date", "v").write.partitionBy("date").parquet(s"$dir/t")
    val q = spark.read.parquet(s"$dir/t").filter($"date" === "2024-03-05")
    q.as[(Long, String)].collect() shouldBe Array((2L, "2024-03-05"))
    // the prune must happen at PLANNING (PartitionFilters on the scan
    // node, 1 of 3 directories listed) — not as a post-scan data filter
    val scans = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    scans should have size 1
    scans.head.selectedPartitions.partitionCount shouldBe 1
    assert(scans.head.partitionFilters.nonEmpty,
      "partition predicate did not reach PartitionFilters")
  }

  test("CsvSource: explicit schema, malformed rows land in _corrupt_record") {
    val dir = Files.createTempDirectory("csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,val\n1,10\n2,notanumber\n3,30\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("val", LongType)))
    val (good, bad) = CsvSource.readSplit(spark, s"$dir/in.csv", schema)
    good.select("id").as[Long].collect().sorted shouldBe Array(1L, 3L)
    bad.count() shouldBe 1
    bad.select("_corrupt_record").as[String].head() shouldBe "2,notanumber"
  }

  test("committed dirty CSV splits 25 good / 7 corrupt (q50's input)") {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
    val (good, bad) = CsvSource.readSplit(spark,
      "/root/repo/testdata-ext/dirty_events.csv", schema)
    good.count() shouldBe 25
    bad.count() shouldBe 7
    // type error, over-arity, and text-in-double all captured
    val badIds = bad.select("_corrupt_record").as[String].collect()
    badIds.count(_.startsWith("3,xxx")) shouldBe 1
    badIds.count(_.startsWith("6,106")) shouldBe 1
    badIds.count(_.startsWith("27,127")) shouldBe 1
    // quoted-delimiter and null-field rows are NOT corrupt
    good.filter($"event_id" === 11L).select("event_type").as[String].head() shouldBe "pause,resume"
    good.filter($"event_id" === 30L).select("value").isEmpty shouldBe false
  }

  test("JsonSource: committed JSONL splits 7 good / 1 corrupt, nested struct typed") {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, lang STRING, text STRING, " +
        "meta STRUCT<source: STRING, quality: DOUBLE>")
    val (good, bad) = graft.sources.JsonSource.readSplit(spark,
      "/root/repo/testdata-ext/docs.jsonl", schema)
    good.count() shouldBe 7
    bad.count() shouldBe 1
    bad.select("_corrupt_record").as[String].head() shouldBe "this line is not json at all"
    // null field, JSON escapes, unicode, and nested struct all survive
    good.filter($"doc_id" === 4L).select("lang").head().isNullAt(0) shouldBe true
    good.filter($"doc_id" === 5L).select("text").as[String].head() should include("\"quotes\"")
    good.filter($"doc_id" === 3L).select("text").as[String].head() should include("naïve café")
    good.filter($"doc_id" === 7L).select("meta.quality").as[Double].head() shouldBe 1.0
  }

  test("CsvSource mode matrix: DROPMALFORMED removes, FAILFAST aborts") {
    val dir = Files.createTempDirectory("csvmodes").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,val\n1,10\n2,notanumber\n3,30\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("val", LongType)))
    val dropped = CsvSource.readDropMalformed(spark, s"$dir/in.csv", schema)
      .collect().map(_.getLong(0)).sorted
    dropped shouldBe Array(1L, 3L)
    intercept[Exception] {
      CsvSource.readFailFast(spark, s"$dir/in.csv", schema).collect()
    }
  }

  test("BinarySource: media files land as payload rows, glob prunes the listing") {
    import graft.operators.{JpegCodec, Multimodal, PngCodec, PpmCodec}
    import graft.operators.PpmCodec.PpmImage
    import graft.sources.BinarySource
    val dir = Files.createTempDirectory("binsrc").toString
    val img = PpmImage(4, 4, Array.tabulate(48)(i => (i * 5).toByte))
    Files.write(java.nio.file.Paths.get(dir, "a.png"), PngCodec.encode(img))
    Files.write(java.nio.file.Paths.get(dir, "b.jpg"), JpegCodec.encode(img))
    Files.write(java.nio.file.Paths.get(dir, "c.txt"), "not media".getBytes)
    val all = BinarySource.readDir(spark, dir)
    all.count() shouldBe 3
    // stable ids, payload bytes intact end-to-end through the decode stage
    val feats = Multimodal.decodeFeatures(spark, all.select("doc_id", "text"))
      .collect()
    feats.count(_.decoded) shouldBe 2
    feats.filter(_.decoded).foreach { f =>
      f.width shouldBe 4
      f.height shouldBe 4
    }
    // the glob prunes at listing time: only the png row is ever read
    val pngOnly = BinarySource.readDir(spark, dir, glob = "*.png")
    pngOnly.count() shouldBe 1
    pngOnly.select("path").as[String].head() should endWith("a.png")
    assert(PpmCodec.decodeOne(PpmCodec.encode(img)).isDefined) // fixture sanity
  }

  test("OrcSource: roundtrip is exact and filters push into the ORC scan") {
    val dir = Files.createTempDirectory("orcsrc").toString
    val rows = (1L to 100L).map(i => (i, s"name_$i", i % 7))
    OrcSource.write(rows.toDF("id", "name", "grp"), dir)
    val back = OrcSource.read(spark, dir)
    back.count() shouldBe 100L
    back.orderBy("id").as[(Long, String, Long)].collect() shouldBe rows.toArray
    // predicate pushdown reaches the ORC scan (stripe skipping at scale)
    val plan = back.filter(col("grp") === 3L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("EqualTo(grp,3)"), s"no pushdown in:\n$plan")
  }
}
