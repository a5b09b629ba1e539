package graft

import graft.operators.Quality
import graft.sinks.Compaction
import java.nio.file.Files

class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("quality report: uniqueness, null ratios, bounds in one pass") {
    val df = Seq(
      (1L, Some("click"), Some(10.0)),
      (2L, None, Some(-5.0)),
      (2L, Some("view"), None), // duplicate key
      (4L, Some("view"), Some(99.5))
    ).toDF("event_id", "event_type", "value")
    val r = Quality.report(df, "event_id", Seq("event_type", "value"), "value").head()
    r.getAs[Long]("n_rows") shouldBe 4L
    r.getAs[Long]("n_distinct_keys") shouldBe 3L
    r.getAs[Boolean]("key_is_unique") shouldBe false
    r.getAs[Double]("min_value") shouldBe -5.0
    r.getAs[Double]("max_value") shouldBe 99.5
    r.getAs[Double]("null_ratio_event_type") shouldBe 0.25
    r.getAs[Double]("null_ratio_value") shouldBe 0.25
  }

  test("compaction: many small files rewritten to the target size, data intact") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    val df = (1 to 1000).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
    df.repartition(20).write.parquet(dir)
    val before = spark.read.parquet(dir).inputFiles.length
    before shouldBe 20

    val (b, a) = Compaction.compact(spark, dir, targetBytes = 1024L * 1024 * 1024)
    b shouldBe 20
    a shouldBe 1
    val back = spark.read.parquet(dir)
    back.count() shouldBe 1000
    back.select("id").as[Long].collect().sorted shouldBe (1L to 1000L).toArray
  }
}
