package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ingest-gate probe at DELIVERY scale (VERDICT r9 item 7):
  * the recurring bench rows measure the dedup / semantic-dedup gates at
  * ~50k-doc / ~100k-vector deliveries; a 100 TB ingest sees per-delivery
  * sizes 10-100× that. This main feeds each gate TWO consecutive
  * ~`SPARK_GRAFT_GATE_ROWS` (default 500k) row deliveries — key-shifted
  * replicas of the sfDir table, the densest realistic load since every
  * replica pairs with the corpus and its batch-mates — and records, per
  * delivery, the micro-batch wall and rows/sec, plus the standalone
  * corpus re-read cost (the production corpus thunk reloads from parquet
  * on every delivery; `corpus_scan_sec` prices that component alone).
  * Two deliveries through one checkpoint also re-prove the exactly-once
  * contract at this scale: delivery 2 processes only its own file.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt "runMain graft.StreamGateProbe" — writes
  * probe_r10/gate_{dedup,semdedup}_500k.json (one JSON line each).
  */
object StreamGateProbe {
  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split("\\s+").take(3).mkString(" ")
    catch { case _: Throwable => "unavailable" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR", "probe_r10")
    val target = sys.env.get("SPARK_GRAFT_GATE_ROWS").map(_.toLong)
      .getOrElse(500000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val tmp = Files.createTempDirectory("gateprobe").toString

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (Files.exists(p))
        Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(Files.deleteIfExists(_))
    }

    /** Key-shifted replica delivery of `base` with ~target rows; replica
      * r shifts `key` by (r+1+deliveryNo*reps)*1e8 so two deliveries
      * never collide with each other or the corpus. */
    def delivery(base: DataFrame, key: String, reps: Long,
                 deliveryNo: Int): DataFrame =
      base
        .withColumn("r", explode(sequence(lit(0L), lit(reps - 1))))
        .withColumn(key,
          col(key) + (col("r") + lit(1L + deliveryNo * reps)) * 100000000L)
        .select(base.columns.map(col): _*)

    def probeGate(label: String, table: String, key: String,
                  mkStream: (String, DataFrame, () => DataFrame, String)
                    => org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row])
        : Unit = {
      val loadPre = loadavg()
      val base = Tables.load(spark, sfDir, table)
      val nBase = base.count()
      val reps = math.max(1L, target / math.max(1L, nBase))
      // production corpus thunk: reload from parquet on every evaluation
      val corpus = () => Tables.load(spark, sfDir, table)
      val (_, corpusScanSec) = timed {
        corpus().write.mode("overwrite").format("noop").save()
      }
      val in = s"$tmp/${label}_in"
      val ckpt = s"$tmp/${label}_ckpt"
      val walls = (0 until 2).map { d =>
        val dl = delivery(base, key, reps, d)
        dl.write.mode("append").parquet(in)
        val n = nBase * reps
        val (_, wall) = timed {
          graft.streaming.StreamingPipeline.runOnce(
            mkStream(in, base, corpus, ckpt))
        }
        (n, wall)
      }
      val line =
        s"""{"metric":"gate","gate":"$label","sf":"$sfDir",""" +
        s""""corpus_rows":$nBase,"corpus_scan_sec":$corpusScanSec,""" +
        walls.zipWithIndex.map { case ((n, w), i) =>
          s""""delivery${i + 1}_rows":$n,"delivery${i + 1}_sec":$w,""" +
          s""""delivery${i + 1}_rows_per_sec":${(n / w).toLong}"""
        }.mkString(",") +
        s""","context":{"load_pre":"$loadPre","load_post":"${loadavg()}",""" +
        s""""isolated":true,"cpus":$cpus}}"""
      Files.writeString(
        Paths.get(s"$outDir/gate_${label}_${target / 1000}k.json"), line)
      println(line)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    try {
      val which = if (args.isEmpty) Seq("dedup", "semdedup") else args.toSeq
      if (which.contains("dedup"))
        probeGate("dedup", "documents", "doc_id", (in, base, corpus, ckpt) =>
          graft.streaming.StreamingPipeline.dedupIngestStream(
            spark, in, base.schema, corpus, 0.6, ckpt) { (pairs, _) =>
              pairs.write.format("noop").mode("overwrite").save() })
      if (which.contains("semdedup"))
        probeGate("semdedup", "embeddings", "vec_id", (in, base, corpus, ckpt) =>
          graft.streaming.StreamingPipeline.semDedupIngestStream(
            spark, in, base.schema, corpus, 16, 990000L, ckpt) { (pairs, _) =>
              pairs.write.format("noop").mode("overwrite").save() })
    } finally rmTree(Paths.get(tmp))
    spark.stop()
  }
}
