package graft

import graft.operators.Similarity
import graft.sinks.KeyValueSink
import graft.streaming.StreamingPipeline
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.types._

class StreamingPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("enrichedKpiStream joins the stream to a static dim and windows KPIs") {
    val dir = Files.createTempDirectory("sjoin").toString
    val input = s"$dir/in"
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:05:00"), 1L, "click", 10.0),
      (2L, Timestamp.valueOf("2024-01-01 10:15:00"), 2L, "click", 20.0),
      (3L, Timestamp.valueOf("2024-01-01 10:20:00"), 3L, "view", 5.0) // no dim row
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.parquet(input)
    val customer = Seq((1L, "SEG_A"), (2L, "SEG_B")).toDF("c_custkey", "c_mktsegment")

    // complete mode: windows need not be watermark-finalized to observe them
    val q = graft.streaming.StreamingPipeline
      .enrichedKpiStream(spark, input, schema, customer, 60, 120)
      .writeStream.outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .format("memory").queryName("sjoin")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("sjoin")
      .select("segment", "event_count", "total_value")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    rows shouldBe Array(("SEG_A", 1L, 10.0), ("SEG_B", 1L, 20.0))
  }

  test("late data beyond the watermark is dropped from closed windows") {
    KeyValueSink.KVStore.clear()
    val dir = Files.createTempDirectory("slate").toString
    val input = s"$dir/in"
    val ckpt = s"$dir/ckpt"
    // batch 1 advances the watermark far past 10:00 (watermark = max - 30min)
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:05:00"), 1L, "click", 10.0),
      (2L, Timestamp.valueOf("2024-01-01 15:00:00"), 2L, "click", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.parquet(input)
    def run(): Unit = StreamingPipeline.runOnce(StreamingPipeline.toKvSink(
      StreamingPipeline.kpiStream(spark, input, schema, 60, 30), "LateKpis", ckpt))
    run()
    val v1 = KeyValueSink.KVStore.scan("LateKpis")
      .find(_._1._3 == "click").map(_._2("event_count"))

    // batch 2: an event for the long-closed 10:00 window arrives late
    Seq((3L, Timestamp.valueOf("2024-01-01 10:10:00"), 3L, "click", 99.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("append").parquet(input)
    KeyValueSink.KVStore.clear()
    run()
    // the late row updated NO window: nothing re-emitted in update mode
    KeyValueSink.KVStore.scan("LateKpis") shouldBe empty
    v1 shouldBe Some(1L)
  }

  test("dedupStream drops at-least-once replays within the watermark") {
    val dir = Files.createTempDirectory("sdedup").toString
    val input = s"$dir/in"
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0),
      (2L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click_replay", 1.0), // dup key
      (3L, Timestamp.valueOf("2024-01-01 10:01:00"), 1L, "view", 2.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.parquet(input)
    val stream = spark.readStream.schema(schema).parquet(input)
    val q = graft.streaming.StreamingPipeline.dedupStream(stream, 60)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .format("memory").queryName("sdedup")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table("sdedup").count() shouldBe 2 // one of the dup pair dropped
  }

  test("attributionStream joins purchases to preceding clicks within the horizon") {
    val dir = Files.createTempDirectory("sattr").toString
    val input = s"$dir/in"
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 0.0),
      (2L, Timestamp.valueOf("2024-01-01 10:30:00"), 1L, "purchase", 50.0), // within 1h of click
      (3L, Timestamp.valueOf("2024-01-01 09:00:00"), 2L, "click", 0.0),
      (4L, Timestamp.valueOf("2024-01-01 11:30:00"), 2L, "purchase", 70.0), // 2.5h later -> out
      (5L, Timestamp.valueOf("2024-01-01 10:30:00"), 3L, "purchase", 90.0)  // no click at all
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.parquet(input)

    val stream = spark.readStream.schema(schema).parquet(input)
    val q = graft.streaming.StreamingPipeline.attributionStream(stream, 60, 120)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .format("memory").queryName("sattr")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("sattr").select("user_id", "value")
      .as[(Long, Double)].collect()
    rows shouldBe Array((1L, 50.0))
  }

  test("file-source stream processes each input exactly once via checkpoint") {
    KeyValueSink.KVStore.clear()
    val dir = Files.createTempDirectory("stream").toString
    val input = s"$dir/in"
    val ckpt = s"$dir/ckpt"
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:05:00"), 1L, "click", 10.0),
      (2L, Timestamp.valueOf("2024-01-01 10:15:00"), 2L, "click", 20.0),
      (3L, Timestamp.valueOf("2024-01-01 11:05:00"), 1L, "view", 5.0),
      (4L, null.asInstanceOf[Timestamp], 1L, "bad", 1.0) // dropped by validation
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.parquet(input)

    val kpis = StreamingPipeline.kpiStream(spark, input, schema, 60, 120)
    StreamingPipeline.runOnce(StreamingPipeline.toKvSink(kpis, "StreamKpis", ckpt))

    val items = KeyValueSink.KVStore.scan("StreamKpis")
    items.size shouldBe 2 // (10:00 click), (11:00 view)
    val click10 = items.find(_._1._3 == "click").get._2
    click10("event_count") shouldBe 2L
    click10("total_value") shouldBe 30.0

    // restart on the same checkpoint with no new files -> nothing re-emitted
    KeyValueSink.KVStore.clear()
    StreamingPipeline.runOnce(StreamingPipeline.toKvSink(
      StreamingPipeline.kpiStream(spark, input, schema, 60, 120), "StreamKpis", ckpt))
    KeyValueSink.KVStore.scan("StreamKpis").size shouldBe 0

    // a NEW file is picked up incrementally
    Seq((5L, Timestamp.valueOf("2024-01-01 12:05:00"), 3L, "click", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("append").parquet(input)
    StreamingPipeline.runOnce(StreamingPipeline.toKvSink(
      StreamingPipeline.kpiStream(spark, input, schema, 60, 120), "StreamKpis", ckpt))
    val after = KeyValueSink.KVStore.scan("StreamKpis")
    after.size shouldBe 1 // only the 12:00 window from the new file
  }

  test("dedupIngestStream flags stream-vs-corpus and in-batch near-dups per delivery") {
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("text", StringType), StructField("n_chars", IntegerType)))
    def mkDocs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("n_chars", org.apache.spark.sql.functions.expr("length(text)"))
      .select("doc_id", "lang", "text", "n_chars")
    val corpus = mkDocs(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different content about spark engines")))
    val dir = Files.createTempDirectory("dedupstream").toString
    val input = s"$dir/in"
    // delivery 1: one corpus near-dup + one in-batch dup pair + one clean
    mkDocs(Seq(
      (10L, "the quick brown fox jumps over the lazy cat"),
      (11L, "entirely novel text with no duplicate anywhere at all"),
      (12L, "entirely novel text with no duplicate anywhere at all")))
      .repartition(1).write.parquet(input)

    val flagged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    def run() = StreamingPipeline.runOnce(
      StreamingPipeline.dedupIngestStream(spark, input, docSchema,
        () => corpus, 0.5, s"$dir/ckpt") { (pairs, _) =>
        flagged ++= pairs.select("new_id", "dup_id", "dup_source")
          .as[(Long, Long, String)].collect()
      })
    run()
    flagged.sorted shouldBe Seq(
      (10L, 1L, "corpus"), (11L, 12L, "batch"))

    // delivery 2 (new file, same checkpoint): only the new file is
    // re-checked — 13 dups the corpus; 14 dups doc 11 from delivery 1,
    // which is NOT in the corpus yet, so by the scope contract no pair
    flagged.clear()
    mkDocs(Seq(
      (13L, "the quick brown fox jumps over the lazy dog too"),
      (14L, "entirely novel text with no duplicate anywhere at all")))
      .repartition(1).write.mode("append").parquet(input)
    run()
    flagged.sorted shouldBe Seq((13L, 1L, "corpus"))
  }

  test("dedupIngestStreamScreened flags dups per delivery and equals the batch operator") {
    // the gate's scale arm (round 12): same foreachBatch/checkpoint
    // contract as dedupIngestStream, the screened incremental LSH
    // operator inside. Exact copies make the banding deterministic
    // (identical signatures collide in every band, 64/64 screen slots),
    // so the flag set is hand-predictable; the per-delivery output must
    // ALSO equal a direct batch call of the operator (gate == operator,
    // streaming contributes only discovery/recovery).
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def mkDocs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val corpus = mkDocs(Seq(
      (1L, "the quick brown fox jumps over the lazy dog at dawn"),
      (2L, "completely different content about spark engines today")))
    val dir = Files.createTempDirectory("dedupscreenedstream").toString
    val input = s"$dir/in"
    // delivery 1: 10 = exact copy of corpus 1; 11/12 identical novel
    // batch-mates; 13 unrelated
    val d1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog at dawn"),
      (11L, "entirely novel text with no duplicate anywhere at all"),
      (12L, "entirely novel text with no duplicate anywhere at all"),
      (13L, "unrelated prose concerning parquet row group statistics"))
    mkDocs(d1).repartition(1).write.parquet(input)

    val flagged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    def run() = StreamingPipeline.runOnce(
      StreamingPipeline.dedupIngestStreamScreened(spark, input, docSchema,
        () => corpus, 0.6, s"$dir/ckpt") { (pairs, _) =>
        flagged ++= pairs.select("new_id", "dup_id", "dup_source")
          .as[(Long, Long, String)].collect()
      })
    run()
    flagged.sorted shouldBe Seq((10L, 1L, "corpus"), (11L, 12L, "batch"))
    // gate == operator on the same delivery
    val direct = graft.operators.Dedup
      .incrementalLshScreenedMd5(corpus, mkDocs(d1))
      .select("new_id", "dup_id", "dup_source").as[(Long, Long, String)]
      .collect().toSet
    flagged.toSet shouldBe direct

    // delivery 2, same checkpoint: only the new file is re-checked — 14
    // dups the corpus; 15 dups delivery-1's doc 11, which is NOT in the
    // corpus yet, so by the scope contract no pair
    flagged.clear()
    mkDocs(Seq(
      (14L, "completely different content about spark engines today"),
      (15L, "entirely novel text with no duplicate anywhere at all")))
      .repartition(1).write.mode("append").parquet(input)
    run()
    flagged.sorted shouldBe Seq((14L, 2L, "corpus"))
  }

  test("semDedupIngestStream flags semantic dups vs corpus and in-batch per delivery") {
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def mkVecs(rows: Seq[(Long, Array[Float])]) = rows.toDF("vec_id", "embedding")
    val corpus = mkVecs(Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f))))
    val dir = Files.createTempDirectory("semdedupstream").toString
    val input = s"$dir/in"
    // delivery 1: 10 dups corpus vec 1; 11/12 dup each other only; 13 novel
    mkVecs(Seq(
      (10L, Array(1f, 0.01f, 0f, 0f)),
      (11L, Array(0f, 0.9f, 0.44f, 0f)),
      (12L, Array(0f, 0.9f, 0.44f, 0f)),
      (13L, Array(1f, -1f, 1f, -1f))))
      .repartition(1).write.parquet(input)

    val flagged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    def run() = StreamingPipeline.runOnce(
      StreamingPipeline.semDedupIngestStream(spark, input, embSchema,
        () => corpus, nCells = 2, threshMicro = 990000L, s"$dir/ckpt") {
        (pairs, _) =>
          flagged ++= pairs.select("new_id", "dup_id", "dup_source")
            .as[(Long, Long, String)].collect()
      })
    run()
    flagged.sorted shouldBe Seq((10L, 1L, "corpus"), (12L, 11L, "batch"))

    // delivery 2, same checkpoint: only the new file is checked; 14 dups
    // corpus vec 2, 15 dups delivery-1's vec 11 which is NOT in the
    // corpus — scope contract says no pair for 15
    flagged.clear()
    mkVecs(Seq(
      (14L, Array(0f, 1f, 0.01f, 0f)),
      (15L, Array(0f, 0.9f, 0.44f, 0f))))
      .repartition(1).write.mode("append").parquet(input)
    run()
    flagged.sorted shouldBe Seq((14L, 2L, "corpus"))
  }

  test("decontaminationGateStream equals batch semanticDecontaminate per delivery") {
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def mkVecs(rows: Seq[(Long, Array[Float])]) = rows.toDF("vec_id", "embedding")
    val eval_ = mkVecs(Seq(
      (100L, Array(1f, 0f, 0f, 0f)),
      (101L, Array(0f, 1f, 0f, 0f))))
    val dir = Files.createTempDirectory("decongate").toString
    val input = s"$dir/in"
    // delivery 1: 10 leaks eval 100; 11 novel
    val d1 = Seq(
      (10L, Array(1f, 0.01f, 0f, 0f)),
      (11L, Array(1f, -1f, 1f, -1f)))
    mkVecs(d1).repartition(1).write.parquet(input)
    val flagged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    def run() = StreamingPipeline.runOnce(
      StreamingPipeline.decontaminationGateStream(spark, input, embSchema,
        () => eval_, nCells = 2, threshMicro = 990000L, s"$dir/ckpt") {
        (rep, _) =>
          flagged ++= rep.select("train_id", "n_eval_hits", "max_cos_micro")
            .as[(Long, Long, Long)].collect()
      })
    run()
    // equivalence contract: the gate's delivery result IS the batch
    // operator on the same frames
    val batch1 = Similarity.semanticDecontaminate(mkVecs(d1), eval_, 2,
        990000L).as[(Long, Long, Long)].collect().sorted
    flagged.sorted shouldBe batch1.toSeq
    flagged.map(_._1) shouldBe Seq(10L)
    // delivery 2, same checkpoint: only the new file is checked
    flagged.clear()
    val d2 = Seq((12L, Array(0f, 1f, 0.01f, 0f)))
    mkVecs(d2).repartition(1).write.mode("append").parquet(input)
    run()
    val batch2 = Similarity.semanticDecontaminate(mkVecs(d2), eval_, 2,
        990000L).as[(Long, Long, Long)].collect().sorted
    flagged.sorted shouldBe batch2.toSeq
    flagged.map(_._1) shouldBe Seq(12L)
  }

  test("driftGateStream reports the exact KS distance per delivery") {
    val xSchema = StructType(Seq(StructField("x", LongType)))
    // reference: 1,1,2,3 → CDF steps at 1 (2/4), 2 (3/4), 3 (4/4)
    val ref = Seq(1L, 1L, 2L, 3L).toDF("x")
    val dir = Files.createTempDirectory("driftgate").toString
    val input = s"$dir/in"
    // delivery 1: identical distribution scaled ×2 → D = 0
    Seq(1L, 1L, 1L, 1L, 2L, 2L, 3L, 3L).toDF("x")
      .repartition(1).write.parquet(input)
    val reports = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    def run() = StreamingPipeline.runOnce(
      StreamingPipeline.driftGateStream(spark, input, xSchema,
        () => ref, s"$dir/ckpt") { (rep, _) =>
        reports ++= rep.select("n_a", "n_b", "x_at_max", "d_scaled")
          .as[(Long, Long, Long, Long)].collect()
      })
    run()
    reports.toSeq shouldBe Seq((4L, 8L, 1L, 0L))
    // delivery 2: shifted up by 10 → maximum separation at x = 3:
    // C_ref(3) = 4 of 4, C_batch(3) = 0 of 4 → |4·4 − 4·0| = 16
    reports.clear()
    Seq(11L, 11L, 12L, 13L).toDF("x")
      .repartition(1).write.mode("append").parquet(input)
    run()
    reports.toSeq shouldBe Seq((4L, 4L, 3L, 16L))
  }

  test("canaryGateStream reports exact canary hits per delivery") {
    val dSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val dir = Files.createTempDirectory("canarygate").toString
    val input = s"$dir/in"
    val reports = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    def run() = StreamingPipeline.runOnce(
      StreamingPipeline.canaryGateStream(spark, input, dSchema,
        Seq("SECRET", "eval42"), s"$dir/ckpt") { (rep, _) =>
        reports ++= rep.select("canary", "n_docs", "n_occurrences")
          .as[(String, Long, Long)].collect()
      })
    // delivery 1: one doc with two SECRETs, one clean
    Seq((1L, "a SECRET and another SECRET"), (2L, "clean text"))
      .toDF("doc_id", "text").repartition(1).write.parquet(input)
    run()
    reports.sortBy(_._1).toSeq shouldBe
      Seq(("SECRET", 1L, 2L), ("eval42", 0L, 0L))
    // delivery 2: only the NEW file is scanned (checkpointed source)
    reports.clear()
    Seq((3L, "eval42 leaked here"), (4L, "eval42 eval42"))
      .toDF("doc_id", "text").repartition(1).write.mode("append").parquet(input)
    run()
    reports.sortBy(_._1).toSeq shouldBe
      Seq(("SECRET", 0L, 0L), ("eval42", 2L, 3L))
  }

  test("micro-batched streaming aggregation equals the one-shot batch result") {
    // the exactly-once equivalence contract: an aggregation fed one file
    // per micro-batch must converge to the same totals as a single batch
    // pass over all the data — state survives every batch boundary
    val rng = new scala.util.Random(42)
    val dir = Files.createTempDirectory("sbatcheq").toString
    val input = s"$dir/in"
    val rows = (1 to 300).map { i =>
      (i.toLong, new Timestamp(1704100000000L + i * 60000L),
        (i % 17).toLong, s"type_${i % 5}", rng.nextInt(10000) / 100.0)
    }
    rows.grouped(100).zipWithIndex.foreach { case (chunk, _) =>
      chunk.toDF("event_id", "ts", "user_id", "event_type", "value")
        .repartition(1).write.mode("append").parquet(input)
    }
    val agg = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // one parquet file per micro-batch
      .parquet(input)
      .withColumn("cents",
        org.apache.spark.sql.functions.expr("CAST(floor(value * 100) AS BIGINT)"))
      .groupBy($"event_type")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"cents").as("total_cents"))
    val q = agg.writeStream.outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .format("memory").queryName("sbatcheq")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("sbatcheq")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    val batch = rows.groupBy(_._4).map { case (t, rs) =>
      (t, rs.size.toLong, rs.map(r => math.floor(r._5 * 100).toLong).sum)
    }.toArray.sortBy(_._1)
    streamed shouldBe batch
  }

  test("upsertStream folds changelog batches into a keyed parquet table") {
    val dir = Files.createTempDirectory("supsert").toString
    val input = s"$dir/in"
    val table = s"$dir/table"
    val ckpt = s"$dir/ckpt"
    val clSchema = StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType),
      StructField("op", StringType), StructField("seq", LongType)))
    def readTable() = spark.read.parquet(table)
      .as[(Long, Double)].collect().sortBy(_._1)
    def run() = StreamingPipeline.runOnce(
      StreamingPipeline.upsertStream(spark, input, clSchema, table, "seq", ckpt))

    // batch 1: two keys, one of them upserted twice in-batch (seq wins)
    Seq((1L, 0.5, "upsert", 1L), (1L, 1.0, "upsert", 2L),
      (2L, 2.0, "upsert", 3L))
      .toDF("k", "v", "op", "seq").repartition(1).write.parquet(input)
    run()
    readTable() shouldBe Array((1L, 1.0), (2L, 2.0))

    // batch 2 (new file; checkpoint skips file 1): update, delete, insert
    Seq((2L, 2.5, "upsert", 4L), (1L, 0.0, "delete", 5L),
      (3L, 3.0, "upsert", 6L))
      .toDF("k", "v", "op", "seq").repartition(1)
      .write.mode("append").parquet(input)
    run()
    readTable() shouldBe Array((2L, 2.5), (3L, 3.0))

    // replaying the same inbox is a no-op (checkpoint exactly-once)
    run()
    readTable() shouldBe Array((2L, 2.5), (3L, 3.0))
  }

  test("upsertStream survives a crash BETWEEN table promote and checkpoint commit") {
    // VERDICT r8 item 5: the checkpoint-skip tests above cover clean
    // completion; this kills the query inside the exactly-once window a
    // real crash hits — output promoted, source checkpoint NOT committed
    // — then restarts and asserts the replayed fold is exactly-once
    // EFFECTIVE (the upsert/delete changelog is absolute, so re-applying
    // the same batch to the already-updated table must be a fixpoint).
    val dir = Files.createTempDirectory("supsertcrash").toString
    val input = s"$dir/in"
    val table = s"$dir/table"
    val ckpt = s"$dir/ckpt"
    val clSchema = StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType),
      StructField("op", StringType), StructField("seq", LongType)))
    def readTable() = spark.read.parquet(table)
      .as[(Long, Double)].collect().sortBy(_._1)

    Seq((1L, 1.0, "upsert", 1L), (2L, 2.0, "upsert", 2L))
      .toDF("k", "v", "op", "seq").repartition(1).write.parquet(input)
    // first attempt crashes after promote, before the checkpoint commits
    val crashed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamingPipeline.runOnce(StreamingPipeline.upsertStream(
        spark, input, clSchema, table, "seq", ckpt,
        postBatchHook = _ => sys.error("injected crash pre-commit")))
    }
    crashed.getMessage should include("injected crash")
    // the promote completed: the table is readable and holds the batch
    readTable() shouldBe Array((1L, 1.0), (2L, 2.0))

    // restart from the same checkpoint: the uncommitted batch REPLAYS
    // against the already-updated table — no partial, no double-fold
    StreamingPipeline.runOnce(StreamingPipeline.upsertStream(
      spark, input, clSchema, table, "seq", ckpt))
    readTable() shouldBe Array((1L, 1.0), (2L, 2.0))

    // and the stream keeps working: a delete + insert delivery lands once
    Seq((1L, 0.0, "delete", 3L), (3L, 3.0, "upsert", 4L))
      .toDF("k", "v", "op", "seq").repartition(1)
      .write.mode("append").parquet(input)
    StreamingPipeline.runOnce(StreamingPipeline.upsertStream(
      spark, input, clSchema, table, "seq", ckpt))
    readTable() shouldBe Array((2L, 2.0), (3L, 3.0))
  }

  test("ingest-gate ledgers are exactly-once under crash-replay when keyed by batchId") {
    // the gates hand (flaggedFrame, batchId) to the caller; the pinned
    // ledger discipline is WRITE KEYED BY BATCH ID with overwrite — a
    // replayed batch (crash after ledger write, before checkpoint
    // commit) overwrites its own directory instead of double-appending
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("text", StringType), StructField("n_chars", IntegerType)))
    def mkDocs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("n_chars", org.apache.spark.sql.functions.expr("length(text)"))
      .select("doc_id", "lang", "text", "n_chars")
    val corpus = mkDocs(Seq(
      (1L, "the quick brown fox jumps over the lazy dog")))
    val dir = Files.createTempDirectory("gatecrash").toString
    val input = s"$dir/in"
    val ledger = s"$dir/ledger"
    mkDocs(Seq((10L, "the quick brown fox jumps over the lazy cat")))
      .repartition(1).write.parquet(input)

    var crashOnce = true
    def gate() = StreamingPipeline.dedupIngestStream(spark, input,
      docSchema, () => corpus, 0.5, s"$dir/ckpt") { (pairs, id) =>
      pairs.select("new_id", "dup_id", "dup_source")
        .write.mode("overwrite").parquet(s"$ledger/batch=$id")
      if (crashOnce) { crashOnce = false; sys.error("injected gate crash") }
    }
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamingPipeline.runOnce(gate())
    }
    // ledger written once, then the replayed batch overwrites in place
    StreamingPipeline.runOnce(gate())
    val rows = spark.read.parquet(s"$ledger/batch=0")
      .as[(Long, Long, String)].collect()
    rows.toSeq shouldBe Seq((10L, 1L, "corpus"))
    new java.io.File(ledger).listFiles().count(_.getName.startsWith("batch=")) shouldBe 1
  }
}
