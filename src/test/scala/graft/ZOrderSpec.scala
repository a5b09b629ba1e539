package graft

import graft.functions.ZOrder
import graft.sinks.PartitionedSink
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference bit-interleave, the textbook loop. */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zValue matches the textbook interleave across the 16-bit domain") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (0xABCDL, 0x1234L), (31L, 77L), (40000L, 3L))
    val df = cases.toDF("x", "y")
      .withColumn("z", ZOrder.zValue(col("x"), col("y")))
    df.select("x", "y", "z").as[(Long, Long, Long)].collect().foreach {
      case (x, y, z) => z shouldBe mortonRef(x, y)
    }
  }

  test("zValue clamps inputs beyond 16 bits") {
    val df = Seq((65536L + 5L, 2L)).toDF("x", "y")
      .withColumn("z", ZOrder.zValue(col("x"), col("y")))
    df.select("z").as[Long].head() shouldBe mortonRef(5L, 2L)
  }

  test("z-ordered layout keeps BOTH dimensions' per-file spans tight") {
    // a uniform 256x256 grid; a single-column sort would give tight x
    // spans but full-range y spans in every file
    val grid = for { x <- 0 until 256; y <- 0 until 256 }
      yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y").repartition(8)
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    PartitionedSink.writeZOrdered(df, "x", "y", dir, 16)

    val spans = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .agg(avg("sx"), avg("sy")).as[(Double, Double)].head()
    // 16 files over a 256-wide domain: z-clustering keeps the mean span
    // per file well under half the domain in BOTH dims (a 1-D sort gives
    // ~255 on the non-sorted dim)
    assert(spans._1 < 128.0, s"x span too wide: $spans")
    assert(spans._2 < 128.0, s"y span too wide: $spans")
  }

  test("graft_bucket_of matches a reference binary search, both eval paths") {
    val th = Array(10.0, 20.0, 30.0, 40.0)
    def ref(v: Double): Long = th.count(_ <= v).toLong
    val vals = Seq(-5.0, 10.0, 15.0, 20.0, 39.9, 40.0, 99.0)
    def run(codegen: String): Seq[(Double, Long)] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try vals.toDF("v")
        .select(col("v"), call_function("graft_bucket_of", col("v"), lit(th))
          .as("b")).as[(Double, Long)].collect().toSeq.sortBy(_._1)
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    val gen = run("true")
    gen shouldBe run("false")
    gen.foreach { case (v, b) => b shouldBe ref(v) }
  }

  test("sorted layout compresses materially better than shuffled layout") {
    // the other half of the layout story: clustering doesn't just skip
    // row groups, it makes RLE/dictionary encoding bite — same rows,
    // same codec, different order
    val rng = new scala.util.Random(11L)
    val rows = (1 to 50000).map(_ => (rng.nextInt(50).toLong,
      s"group_payload_${rng.nextInt(50)}"))
    val df = rows.toDF("k", "tag").repartition(4)
    def bytesOf(path: String): Long = {
      val dir = new java.io.File(path)
      dir.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val base = java.nio.file.Files.createTempDirectory("cmp").toString
    df.write.parquet(s"$base/shuffled")
    df.repartitionByRange(4, col("k")).sortWithinPartitions("k", "tag")
      .write.parquet(s"$base/sorted")
    val (shuffled, sorted) = (bytesOf(s"$base/shuffled"), bytesOf(s"$base/sorted"))
    assert(sorted < shuffled / 2,
      s"sorted=$sorted shuffled=$shuffled — expected >2x compression win")
  }

  test("quantile-bucketed z-order stays balanced on a skewed dimension") {
    // x: zipf-ish hot head (80% of rows in the lowest 1% of the range);
    // raw interleave would pack most rows into a few files
    val rng = new scala.util.Random(7L)
    val rows = (1 to 20000).map { _ =>
      val x = if (rng.nextInt(5) < 4) rng.nextInt(100).toDouble
              else rng.nextInt(10000).toDouble
      (x, rng.nextInt(256).toLong)
    }
    val df = rows.toDF("x", "y").repartition(8)
    val xb = ZOrder.quantileBucket(df, "x", 256)
    val bucketed = df.withColumn("xb", xb)
    // equal-depth: every bucket holds roughly rows/nBuckets
    val sizes = bucketed.groupBy("xb").count().as[(Long, Long)].collect()
    val maxShare = sizes.map(_._2).max.toDouble / rows.size
    assert(maxShare < 0.05, f"hot bucket holds $maxShare%.2f of rows")
    // and the z-layout over (xb, y) keeps file row counts balanced
    val dir = java.nio.file.Files.createTempDirectory("zskew").toString
    PartitionedSink.writeZOrdered(bucketed, "xb", "y", dir, 16)
    val fileCounts = spark.read.parquet(dir)
      .groupBy(input_file_name()).count().as[(String, Long)].collect()
    val biggest = fileCounts.map(_._2).max.toDouble / rows.size
    assert(biggest < 0.15, f"hot file holds $biggest%.2f of rows")
  }
}
