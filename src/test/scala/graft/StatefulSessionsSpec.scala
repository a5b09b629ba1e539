package graft

import graft.streaming.StatefulSessions
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

class StatefulSessionsSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("value", DoubleType)))

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionKpis merges gap-based sessions (batch parity with streaming op)") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 10.0),
      (2L, ts("2024-01-01 10:10:00"), 1L, 5.0),  // same session
      (3L, ts("2024-01-01 11:30:00"), 1L, 2.0),  // 80 min gap -> new session
      (4L, ts("2024-01-01 10:00:00"), 2L, 1.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val r = StatefulSessions.sessionKpis(ev, 30, 120)
      .select("user_id", "n_events", "total_value").as[(Long, Long, Double)]
      .collect().sortBy(x => (x._1, x._2)).toList
    r shouldBe List((1L, 1L, 2.0), (1L, 2L, 15.0), (2L, 1L, 1.0))
  }

  test("runningTotals accumulates exact per-user state across micro-batches") {
    val dir = Files.createTempDirectory("state").toString
    val input = s"$dir/in"
    Seq((1L, ts("2024-01-01 10:00:00"), 1L, 10.5),
        (2L, ts("2024-01-01 10:01:00"), 1L, 0.25),
        (3L, ts("2024-01-01 10:02:00"), 2L, 3.0))
      .toDF("event_id", "ts", "user_id", "value")
      .repartition(1).write.parquet(input)

    def runBatch(): Map[Long, (Long, Double)] = {
      val stream = spark.readStream.schema(schema).parquet(input)
      val q = StatefulSessions.runningTotals(spark, stream)
        .writeStream.outputMode("update")
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StatefulSessions.UserTotal], _: Long) =>
          graft.sinks.KeyValueSink.write(
            batch.toDF().withColumn("pk", org.apache.spark.sql.functions.col("user_id").cast("string"))
              .withColumn("sk", org.apache.spark.sql.functions.lit("totals")),
            "RunningTotals", "pk", "sk")
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      graft.sinks.KeyValueSink.KVStore.scan("RunningTotals").map { case ((_, pk, _), item) =>
        pk.toLong -> ((item("n_events").asInstanceOf[Long],
          item("total_value").asInstanceOf[Double]))
      }
    }

    val first = runBatch()
    first(1L) shouldBe ((2L, 10.75))
    first(2L) shouldBe ((1L, 3.0))

    // second file: state persists via checkpoint, totals accumulate
    Seq((4L, ts("2024-01-01 10:05:00"), 1L, 4.0))
      .toDF("event_id", "ts", "user_id", "value")
      .repartition(1).write.mode("append").parquet(input)
    val second = runBatch()
    second(1L) shouldBe ((3L, 14.75))
  }
}
