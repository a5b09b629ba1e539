package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-key skew measurement (VERDICT r8 item 2): SURVEY §5 claims AQE
  * skew-join handling and q27's salted join exists, but no rung ever had
  * a genuinely hot key. This main probes the top shuffle queries on the
  * `testdata-ext/sf1skew` profile (tools/gen_skew.py: user_id=42 on ~10%
  * of 1M events, one hot o_custkey on ~10% of orders, one hot l_partkey
  * on ~10% of 6M lineitem rows, ~2% of documents one giant near-dup
  * cluster) and records, per query:
  *
  *   - wall seconds (Bench protocol: noop sink, 2 runs, min) + the
  *     shuffle-write / disk-spill bytes of the min run;
  *   - the REDUCER BALANCE of the min run: per stage with >= 8 tasks,
  *     max(task duration) / median(task duration); the worst stage is
  *     reported (the "no reducer straggles > 10x the median" gate);
  *   - whether AQE's skew-join split fired ("skew=true" in the final
  *     adaptive plan of a plan-capture execution).
  *
  * The pseudo-query `hot_join` runs FOUR arms of the same hot-key
  * lineitem×part join and asserts all four return identical rows (the
  * salted-==-plain gate):
  *   plain     — catalog default (the dim broadcasts at this scale, so
  *               the hot key never crosses a shuffle: skew-immune);
  *   smj       — MERGE hint: the 100 TB shape where the dim outgrows
  *               broadcast; the hot reducer appears here;
  *   smj_split — same SMJ with AQE skew thresholds scaled to the rung
  *               (at 100 TB the hot partition crosses the 256 MB default
  *               on its own): AQE's split is the mechanism under test;
  *   salted    — SkewJoin.saltedJoin: the manual fallback for operators
  *               AQE cannot split.
  *
  * Usage: SPARK_GRAFT_SF_DIR=testdata-ext/sf1skew \
  *        sbt "runMain graft.SkewProbe hot_join q11_sessionize ..."
  * Writes probe_r9/<query>_<profile>.json (one JSON line each, same shape
  * as the r8 probe records plus "straggler" and "skew_join_fired").
  */
object SkewProbe {

  /** Per-stage task-duration accumulator; stageId -> durations (ms). */
  private class StageStats {
    val durations = new java.util.concurrent.ConcurrentHashMap[
      Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
    /** stageId -> stage name (first line of the stage's callsite). */
    val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    def clear(): Unit = { durations.clear(); names.clear() }
    /** SPARK_GRAFT_STAGE_DUMP diagnostic: every >=minTasks stage of the
      * last run, sorted by max task ms — pinpoints WHICH operator owns a
      * straggler instead of just reporting the worst ratio. */
    def dump(minTasks: Int): Unit =
      rows(minTasks).sortBy(-_._3).foreach { case (sid, n, max, med, r) =>
        System.err.println(
          f"[stage-dump] stage=$sid tasks=$n max_ms=$max median_ms=$med " +
          f"ratio=$r%.2f name=${names.getOrDefault(sid, "?")}")
      }
    private def rows(minTasks: Int): Seq[(Int, Int, Long, Long, Double)] = {
      import scala.jdk.CollectionConverters._
      durations.asScala.toSeq.flatMap { case (sid, q) =>
        val ds = q.asScala.toSeq.sorted
        if (ds.length < minTasks) None
        else {
          val max = ds.last
          val med = ds(ds.length / 2).max(1L)
          Some((sid, ds.length, max, med, max.toDouble / med))
        }
      }
    }
    /** Worst stage (>= minTasks tasks) by max/median RATIO — the raw
      * imbalance signal; inflated on stages whose tasks are all tiny
      * (median < ~100 ms is scheduling noise, adjudicated in BASELINE). */
    def worstByRatio(minTasks: Int): Option[(Int, Int, Long, Long, Double)] =
      rows(minTasks).sortBy(-_._5).headOption
    /** Worst stage by MAX task duration — the stage that actually owns
      * the critical path; its ratio is the gate-relevant straggle. */
    def worstByMax(minTasks: Int): Option[(Int, Int, Long, Long, Double)] =
      rows(minTasks).sortBy(-_._3).headOption
  }

  /** 1/5/15-min loadavg right now — sampled per timed() call, not once at
    * JVM start, so every record's "load_pre" reflects ITS OWN pre-run load
    * (a probe list runs for minutes; the first query's load says nothing
    * about the fifth's). */
  private def loadNow(): String =
    scala.io.Source.fromFile("/proc/loadavg").mkString
      .split(" ").take(3).mkString(" ")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "testdata-ext/sf1skew")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR", "probe_r9")
    val profile = Paths.get(sfDir).getFileName.toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // explicit, not default-dependent: the skew split under test
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0)
    val diskSpill = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new StageStats
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            diskSpill.addAndGet(m.diskBytesSpilled)
          }
          if (te.taskInfo != null) {
            stages.durations
              .computeIfAbsent(te.stageId,
                _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
              .add(te.taskInfo.duration)
          }
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          stages.names.put(sc.stageInfo.stageId,
            sc.stageInfo.name.linesIterator.nextOption().getOrElse("?"))
      })
    val drain: () => Unit =
      try {
        val bus = spark.sparkContext.getClass.getMethod("listenerBus")
          .invoke(spark.sparkContext)
        val w = bus.getClass.getMethods.find(m =>
          m.getName == "waitUntilEmpty" && m.getParameterCount == 1 &&
            m.getParameterTypes()(0) == java.lang.Long.TYPE).get
        () => { w.invoke(bus, java.lang.Long.valueOf(10000L)); () }
      } catch { case _: Throwable => () => Thread.sleep(300) }
    def clearState(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    /** One timed run: (sec, shufBytes, spillBytes, worstByRatio, worstByMax). */
    def runOnce(mk: () => DataFrame)
        : (Double, Long, Long, Option[(Int, Int, Long, Long, Double)],
           Option[(Int, Int, Long, Long, Double)]) = {
      val sw0 = shuffleWrite.get(); val sp0 = diskSpill.get()
      stages.clear()
      val t0 = System.nanoTime()
      mk().write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      drain()
      if (sys.env.contains("SPARK_GRAFT_STAGE_DUMP")) stages.dump(8)
      val out = (dt, shuffleWrite.get() - sw0, diskSpill.get() - sp0,
        stages.worstByRatio(8), stages.worstByMax(8))
      clearState()
      out
    }
    /** Runs `mk` `runs` times, keeps the fastest; also returns the loadavg
      * sampled BEFORE the first run (this call's true pre-run load). */
    def timed(mk: () => DataFrame, runs: Int = 2) = {
      val lp = loadNow()
      (lp, (1 to runs).map(_ => runOnce(mk)).minBy(_._1))
    }

    /** Plan-capture execution on the dataset's OWN QueryExecution so the
      * adaptive plan finalizes where we can read it; returns true iff the
      * final plan carries a skew=true marker. */
    def skewFired(mk: () => DataFrame): Boolean = {
      val df = mk()
      df.queryExecution.toRdd.foreachPartition(_ => ())
      val s = df.queryExecution.executedPlan.toString
      if (sys.env.contains("SPARK_GRAFT_PLAN_DEBUG"))
        System.err.println(s"=== FINAL PLAN ===\n${s.take(6000)}")
      clearState()
      s.contains("skew=true")
    }

    def straggJson(key: String,
                   w: Option[(Int, Int, Long, Long, Double)]): String =
      w.map { case (sid, n, max, med, r) =>
        f""""$key":{"stage":$sid,"tasks":$n,"max_ms":$max,"median_ms":$med,"ratio":$r%.2f}"""
      }.getOrElse(s""""$key":null""")

    def emit(name: String, arm: String, loadPre: String, sec: Double,
             shuf: Long, spill: Long,
             wr: Option[(Int, Int, Long, Long, Double)],
             wm: Option[(Int, Int, Long, Long, Double)], skew: Boolean,
             extra: String = ""): Unit = {
      val line =
        s"""{"metric":"total","value":$sec,"unit":"sec","queries":{"$name":$sec},""" +
        s""""shuffle_write_bytes":{"$name":$shuf},"disk_spill_bytes":{"$name":$spill},""" +
        s"""${straggJson("straggler_by_ratio", wr)},${straggJson("critical_stage", wm)},""" +
        s""""skew_join_fired":$skew,"arm":"$arm",""" +
        s""""sf":"$sfDir","context":{"load_pre":"$loadPre","load_post":"${loadNow()}","isolated":true,"cpus":$cpus}$extra}"""
      val suffix = if (arm == "catalog") "" else s"_$arm"
      Files.writeString(
        Paths.get(s"$outDir/${name}${suffix}_$profile.json"), line)
      println(line)
    }

    // ---- the four-arm skew-join gate ---------------------------------
    // The demo join is lineitem x part on the HOT l_partkey (tools/
    // gen_skew.py: one part on ~10% of 6M lines — the hot-SKU shape). The
    // events x customer join (q27's own shape) was probed first and is
    // OVERHEAD-BOUND at this rung: 1M rows / 32 partitions is ~30k rows
    // per task, so even a 100k-row hot partition moves task time by
    // single-digit ms (measured ratio 1.43-1.69 on every arm, salted or
    // not). lineitem gives each reducer real work, so the hot key's 4-5x
    // partition weight is visible — and splittable.
    def li() = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    def pt() = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    def aggSeg(j: DataFrame) = j
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n_lines"),
        sum(graft.functions.ExactAgg.cents(col("l_quantity"))).as("qty_centi"),
        graft.functions.ExactAgg.moneySum(col("l_extendedprice")).as("total_price"))
    val smjPlan = () => aggSeg(li().join(pt().hint("merge"), Seq("l_partkey")))
    // rung-scaled AQE skew thresholds: at 100 TB the hot partition crosses
    // the 256 MB default on its own; at the 10x rung the whole lineitem
    // shuffle is ~100 MB, so the split never triggers at defaults.
    // Scaling the threshold to the rung demonstrates the MECHANISM:
    // skew=true in the final plan + the reducer balance it buys.
    val skewConfs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4m",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2m",
      // the join feeds a groupBy on a DIFFERENT key, so splitting the join
      // partitions adds a shuffle AQE counts conservatively and declines;
      // force says "the extra exchange is cheaper than the straggler" —
      // at 100 TB with a 256 MB-plus hot partition that is the right call
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    val noop = () => ()
    val arms: Seq[(String, () => Unit, () => DataFrame, () => Unit)] = Seq(
      ("plain", noop, () => aggSeg(li().join(pt(), Seq("l_partkey"))), noop),
      ("smj", noop, smjPlan, noop),
      ("smj_split",
        () => skewConfs.foreach { case (k, v) => spark.conf.set(k, v) },
        smjPlan,
        () => skewConfs.foreach { case (k, _) => spark.conf.unset(k) }),
      ("salted", noop, () =>
        aggSeg(graft.operators.SkewJoin.saltedJoin(li(), pt(), "l_partkey", 8)),
        noop))

    if (args.isEmpty || args.contains("hot_join")) {
      // identity gate first: all arms, identical sorted rows
      val rows = arms.map { case (a, su, mk, td) =>
        su(); val r = mk().orderBy("brand").collect().map(_.toString).toSeq
        td(); a -> r
      }
      val ref = rows.head._2
      rows.tail.foreach { case (a, r) =>
        require(r == ref,
          s"hot_join arm '$a' diverged from plain on $profile — salted==plain gate FAILED")
      }
      println(s"[skew-probe] hot_join identity gate: ${arms.map(_._1).mkString("==")} " +
        s"(${ref.length} rows) on $profile")
      clearState()
      arms.foreach { case (a, su, mk, td) =>
        su()
        try {
          val (lp, (sec, shuf, spill, wr, wm)) = timed(mk)
          emit("hot_join", a, lp, sec, shuf, spill, wr, wm, skewFired(mk))
        } finally td()
      }
    }

    // ---- catalog queries, unmodified --------------------------------
    args.filterNot(_ == "hot_join").foreach { name =>
      val mk = () => SparkEntry.queries(name)(spark, sfDir)
      val (lp, (sec, shuf, spill, wr, wm)) = timed(mk)
      emit(name, "catalog", lp, sec, shuf, spill, wr, wm, skewFired(mk))
    }
    spark.stop()
  }
}
