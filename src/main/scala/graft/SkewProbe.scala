package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/** Hot-key skew probe (VERDICT r8 item 2): SURVEY §5 claims AQE skew-join
  * handling and q27's salted join, but no rung ever had a genuinely hot
  * key. This main runs named queries against a skewed rung
  * (tools/gen_skew.py → testdata-ext/sf1skew: ~10% of events on one
  * user, ~10% of lineitem on one part, ~10% of orders on one customer,
  * a 2% template-spam doc cluster) and records the evidence the verdict
  * asked for, one JSON line per query appended to SPARK_GRAFT_BENCH_OUT:
  *
  *   - wall seconds + shuffle-write / disk-spill bytes (Bench protocol);
  *   - `skew_joins`: how many joins in the FINAL adaptive plan ran with
  *     AQE's skew split (SortMergeJoin/ShuffledHashJoin print
  *     "skew=true" once OptimizeSkewedJoin rewrites them);
  *   - `straggler`: for the stage with the largest max task duration,
  *     its task count, max / p50 task millis, and the max/p50 ratio —
  *     "no reducer straggles >10x the median" is checked on THIS number;
  *   - for q27_salted_join additionally `salted_eq_plain`: the salted
  *     result is order-insensitively checksummed against the plain
  *     unsalted join on the SAME skewed data (the "provably identical"
  *     claim, proven on data where it matters).
  *
  * AQE stays ON (Spark's default) with skew-join handling explicitly
  * enabled — this probe measures the runtime plan a cluster would run,
  * unlike PlanFingerprint's static sf0.001 gate.
  */
object SkewProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/testdata-ext/sf1skew")
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "skew_probe.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- instrumentation ------------------------------------------------
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0)
    val diskSpill = new java.util.concurrent.atomic.AtomicLong(0)
    val stageTasks = TrieMap.empty[Int, ArrayBuffer[Long]]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          diskSpill.addAndGet(m.diskBytesSpilled)
        }
        if (te.taskInfo != null)
          stageTasks.getOrElseUpdate(te.stageId, ArrayBuffer.empty)
            .synchronized {
              stageTasks(te.stageId) += te.taskInfo.duration
            }
      }
    })
    // final ADAPTIVE plan of the last completed action (the noop write):
    // onSuccess hands the executed QueryExecution, whose executedPlan
    // prints the post-AQE plan — where "skew=true" marks appear
    @volatile var lastPlan: String = ""
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        lastPlan = qe.executedPlan.toString
      override def onFailure(f: String, qe: QueryExecution,
          e: Exception): Unit = ()
    })
    val drain: () => Unit = {
      val busM = spark.sparkContext.getClass.getMethod("listenerBus")
      val bus = busM.invoke(spark.sparkContext)
      val waitM = bus.getClass.getMethods.find(m =>
        m.getName == "waitUntilEmpty" && m.getParameterCount == 1 &&
          m.getParameterTypes()(0) == java.lang.Long.TYPE).get
      () => { waitM.invoke(bus, java.lang.Long.valueOf(30000L)); () }
    }
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").getLines().next()
        .split(" ").take(3).mkString(",")
      catch { case _: Throwable => "" }
    def clearState(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    // order-insensitive checksum over every column, for equality probes
    def checksum(df: org.apache.spark.sql.DataFrame): Long = {
      import org.apache.spark.sql.functions._
      df.select(xxhash64(df.columns.map(c => col(c).cast("string")): _*)
          .as("h"))
        .agg(sum(col("h"))).head().getLong(0)
    }

    val names = if (args.nonEmpty) args.toSeq
      else Seq("q49_neardup_corpus", "q45_dedup_clusters", "q11_sessionize",
        "q27_salted_join", "q20_minhash_lsh_pairs")

    names.foreach { name =>
      val pre = loadavg()
      shuffleWrite.set(0); diskSpill.set(0); stageTasks.clear()
      lastPlan = ""
      val t0 = System.nanoTime()
      val ok = try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        true
      } catch { case e: Throwable =>
        System.err.println(s"[skew-probe] $name failed: ${e.getMessage}")
        false
      }
      val sec = (System.nanoTime() - t0) / 1e9
      drain()
      val skewJoins = "skew=true".r.findAllIn(lastPlan).length
      // straggler = the stage whose longest task is the global longest
      val straggler = stageTasks.toSeq
        .map { case (sid, ds) =>
          val sorted = ds.toArray.sorted
          (sid, sorted.length, sorted.last, sorted(sorted.length / 2))
        }
        .sortBy(-_._3)
        .headOption
        .map { case (sid, n, mx, p50) =>
          val ratio = if (p50 > 0) mx.toDouble / p50 else -1.0
          s""""straggler":{"stage":$sid,"n_tasks":$n,"max_ms":$mx,""" +
            s""""p50_ms":$p50,"max_over_p50":${f"$ratio%.2f"}}"""
        }
        .getOrElse(""""straggler":null""")
      val salted =
        if (name == "q27_salted_join" && ok) {
          import org.apache.spark.sql.functions._
          val s = spark
          val ev = Tables.events(s, sfDir)
            .select(col("user_id").as("c_custkey"), col("value"))
          val cust = Tables.load(s, sfDir, "customer")
            .select(col("c_custkey"), col("c_mktsegment"))
          val plain = ev.join(cust, Seq("c_custkey"))
            .groupBy(col("c_mktsegment").as("segment"))
            .agg(count(lit(1)).as("n_events"),
              graft.functions.ExactAgg.moneySum(col("value"))
                .as("total_value"))
          val eq = checksum(SparkEntry.queries(name)(s, sfDir)) ==
            checksum(plain)
          s""","salted_eq_plain":$eq"""
        } else ""
      clearState()
      val line =
        s"""{"query":"$name","dir":"$sfDir","ok":$ok,""" +
          s""""sec":${f"$sec%.2f"},"loadavg_pre":"$pre",""" +
          s""""loadavg_post":"${loadavg()}",""" +
          s""""shuffle_write_bytes":${shuffleWrite.get},""" +
          s""""disk_spill_bytes":${diskSpill.get},""" +
          s""""skew_joins":$skewJoins,$straggler$salted}"""
      println(s"[skew-probe] $line")
      Files.writeString(Paths.get(out), line + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
    spark.stop()
  }
}
