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

  test("profile: one row per column with null/distinct counts and bounds") {
    val df = Seq(
      (Some(5L), Some("b")), (Some(1L), None), (Some(5L), Some("a")),
      (None, Some("a"))
    ).toDF("k", "s")
    val r = Quality.profile(df, Seq("k", "s"))
      .as[(String, Long, Long, Long, String, String)].collect().sortBy(_._1)
    r shouldBe Array(
      ("k", 4L, 1L, 2L, "1", "5"),
      ("s", 4L, 1L, 2L, "a", "b"))
    // single-scan shape: the plan contains exactly one scan of the input
    val scans = Quality.profile(df, Seq("k", "s"))
      .queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
        case s if s.getClass.getSimpleName.contains("Relation") => s
      }
    scans.length shouldBe 1
  }

  test("constraints: FALSE and NULL both violate; one row per check") {
    val df = Seq(
      (Some(1L), Some(10.0)), (Some(2L), Some(-1.0)), (Some(3L), None),
      (None, Some(5.0))
    ).toDF("id", "v")
    val r = Quality.constraints(df, Seq(
      "id_not_null" -> $"id".isNotNull,
      "v_non_negative" -> ($"v" >= 0)))
      .as[(String, Long, Boolean)].collect().sortBy(_._1)
    // v >= 0 is NULL on the None row -> violation, not a silent pass
    r shouldBe Array(
      ("id_not_null", 1L, false),
      ("v_non_negative", 2L, false))
    Quality.constraints(df.filter($"id".isNotNull && $"v".isNotNull &&
        $"v" >= 0), Seq("id_not_null" -> $"id".isNotNull))
      .as[(String, Long, Boolean)].collect() shouldBe
      Array(("id_not_null", 0L, true))
  }

  test("parquet mergeSchema reads drifted deliveries as one table") {
    val dir = Files.createTempDirectory("drift").toString
    Seq((1L, "a")).toDF("id", "s").write.parquet(s"$dir/d=1")
    Seq((2L, "b", 9L)).toDF("id", "s", "extra").write.parquet(s"$dir/d=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    merged.columns.sorted shouldBe Array("d", "extra", "id", "s")
    val rows = merged.select($"id", $"extra").as[(Long, Option[Long])]
      .collect().sortBy(_._1)
    rows shouldBe Array((1L, None), (2L, Some(9L)))
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

  test("compaction swap is crash-safe: every interruption point leaves readable data") {
    import org.apache.hadoop.fs.Path
    val fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)
    def freshDataset(): String = {
      val dir = Files.createTempDirectory("crash").toString + "/t"
      (1 to 100).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
        .repartition(4).write.parquet(dir)
      dir
    }
    def assertIntact(dir: String): Unit =
      spark.read.parquet(dir).count() shouldBe 100

    // crash after step 1 (tmp written, canonical untouched): recover drops tmp
    val d1 = freshDataset()
    spark.read.parquet(d1).repartition(1).write.parquet(d1 + "_compacting")
    Compaction.recover(fs, new Path(d1))
    fs.exists(new Path(d1 + "_compacting")) shouldBe false
    assertIntact(d1)

    // crash between steps 2 and 3 (canonical renamed away, new copy complete):
    // recover promotes the compacted copy
    val d2 = freshDataset()
    spark.read.parquet(d2).repartition(1).write.parquet(d2 + "_compacting")
    fs.rename(new Path(d2), new Path(d2 + "_old"))
    Compaction.recover(fs, new Path(d2))
    assertIntact(d2)
    fs.exists(new Path(d2 + "_old")) shouldBe false

    // crash between steps 3 and 4 (swap done, old copy not yet deleted)
    val d3 = freshDataset()
    spark.read.parquet(d3).repartition(1).write.parquet(d3 + "_old")
    Compaction.recover(fs, new Path(d3))
    assertIntact(d3)
    fs.exists(new Path(d3 + "_old")) shouldBe false

    // and compact() itself runs recovery first: interrupted state, then compact
    val d4 = freshDataset()
    spark.read.parquet(d4).repartition(1).write.parquet(d4 + "_compacting")
    fs.rename(new Path(d4), new Path(d4 + "_old"))
    val (_, after) = Compaction.compact(spark, d4, targetBytes = 1024L * 1024 * 1024)
    after shouldBe 1
    assertIntact(d4)
  }
}
