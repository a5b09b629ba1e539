package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * NOVEL-CONTENT arms (round 11, VERDICT r10 item 5): the replica
  * deliveries are the OUTPUT-BOUND worst case — every replica is a true
  * near-dup of its base and its replica-mates, ~30-62M emitted pairs by
  * construction. A production delivery is mostly novel content: the
  * `dedup_novel` / `semdedup_novel` arms keep the delivery's SHAPE
  * (row count, lang/n_chars blocking columns, vector locality — so the
  * candidate volume the gate must screen is the same) but make the
  * CONTENT deterministic pseudo-noise, so true pairs are ~zero and the
  * measured wall is the candidate/screen-stage cost alone:
  *  - documents: text is replaced by md5-hex noise of the SAME length
  *    (n_chars and lang untouched -> identical (lang, band) block
  *    volume; two noise texts share far too few 3-grams to pass 0.6).
  *  - embeddings: each vector gets deterministic per-component noise at
  *    ~0.87× its own RMS (cos(e, e+noise) ≈ 0.76, far under the 0.99
  *    gate; vectors stay NEAR their originals so IVF cell occupancy —
  *    the candidate blocking — stays realistic).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt "runMain graft.StreamGateProbe [arms...]" — arms default
  * to all four; writes probe dir JSON (one line per arm), e.g.
  * gate_{dedup,semdedup}[_novel]_500k.json.
  */
object StreamGateProbe {
  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split("\\s+").take(3).mkString(" ")
    catch { case _: Throwable => "unavailable" }

  /** Deterministic per-row md5-hex noise text of the same length as the
    * original (`n_chars` is the documents table's own length column, so
    * the (lang, n_chars/50) blocking is untouched). */
  private def noiseText: Column =
    expr("substring(repeat(md5(concat(cast(doc_id as string), ':t')), " +
      "cast(n_chars as int) div 32 + 1), 1, cast(n_chars as int))")

  /** Deterministic per-component noise at ~0.87× the vector's own RMS:
    * n_i ~ uniform[-1,1] from md5(vec_id:i) has RMS 1/sqrt(3); scaling by
    * 1.5·nrm/sqrt(d) gives noise RMS ≈ 0.87·(vector RMS), so
    * cos(e, e') ≈ 1/sqrt(1+0.75) ≈ 0.76 — far below the 0.99 gate — while
    * e' stays near e (realistic IVF cell occupancy). */
  private def noisyEmbedding: Column = {
    val nrm = sqrt(aggregate(col("embedding"), lit(0.0d),
      (acc: Column, x: Column) => acc + x.cast("double") * x.cast("double")))
    val amp = lit(1.5d) * nrm / sqrt(size(col("embedding")).cast("double"))
    zip_with(col("embedding"),
      sequence(lit(1), size(col("embedding"))),
      (x, i) => {
        val h = conv(substring(md5(concat(col("vec_id").cast("string"),
          lit(":"), i.cast("string"))), 1, 8), 16, 10).cast("long")
        (x.cast("double") + amp * ((h % 2001L).cast("double") - 1000.0d)
          / 1000.0d).cast("float")
      })
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR", "probe_r12")
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
      * r shifts `key` by (r+1+deliveryNo*reps)*stride, with the stride
      * derived from the corpus's own max key (ADVICE r10: a fixed 1e8
      * stride silently collides on a large enough sfDir, inflating the
      * measured pair volume) so deliveries never collide with each other
      * or the corpus at any scale. */
    def delivery(base: DataFrame, key: String, stride: Long, reps: Long,
                 deliveryNo: Int): DataFrame =
      base
        .withColumn("r", explode(sequence(lit(0L), lit(reps - 1))))
        .withColumn(key,
          col(key) + (col("r") + lit(1L + deliveryNo * reps)) * stride)
        .select(base.columns.map(col): _*)

    def probeGate(label: String, table: String, key: String,
                  novelize: DataFrame => DataFrame,
                  mkStream: (String, DataFrame, () => DataFrame, String)
                    => org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row])
        : Unit = {
      val loadPre = loadavg()
      val base = Tables.load(spark, sfDir, table)
      val nBase = base.count()
      // coalesce + explicit cast (ADVICE r11): an empty/misconfigured
      // sfDir or a non-long key column fails with a clear message here,
      // not an NPE/ClassCastException inside the delivery builder
      val stride = base
        .agg(coalesce(max(col(key)), lit(0L)).cast("long")).head().getLong(0) + 1L
      require(nBase > 0, s"gate probe: $sfDir/$table is empty")
      val reps = math.max(1L, target / math.max(1L, nBase))
      // production corpus thunk: reload from parquet on every evaluation
      val corpus = () => Tables.load(spark, sfDir, table)
      val (_, corpusScanSec) = timed {
        corpus().write.mode("overwrite").format("noop").save()
      }
      val in = s"$tmp/${label}_in"
      val ckpt = s"$tmp/${label}_ckpt"
      val walls = (0 until 2).map { d =>
        val dl = novelize(delivery(base, key, stride, reps, d))
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

    val id: DataFrame => DataFrame = df => df
    val novelDocs: DataFrame => DataFrame =
      _.withColumn("text", noiseText)
    val novelVecs: DataFrame => DataFrame =
      _.withColumn("embedding", noisyEmbedding)
    def dedupStream(in: String, base: DataFrame, corpus: () => DataFrame,
                    ckpt: String) =
      graft.streaming.StreamingPipeline.dedupIngestStream(
        spark, in, base.schema, corpus, 0.6, ckpt) { (pairs, _) =>
          pairs.write.format("noop").mode("overwrite").save() }
    def dedupScreenedStream(in: String, base: DataFrame,
                            corpus: () => DataFrame, ckpt: String) =
      graft.streaming.StreamingPipeline.dedupIngestStreamScreened(
        spark, in, base.schema, corpus, 0.6, ckpt) { (pairs, _) =>
          pairs.write.format("noop").mode("overwrite").save() }
    def semDedupStream(nCells: Int)(in: String, base: DataFrame,
                                    corpus: () => DataFrame, ckpt: String) =
      graft.streaming.StreamingPipeline.semDedupIngestStream(
        spark, in, base.schema, corpus, nCells, 990000L, ckpt) { (pairs, _) =>
          pairs.write.format("noop").mode("overwrite").save() }

    /** Semantic-gate RECALL at a given nCells (round 12, VERDICT r11
      * item 3's other axis): one replica delivery (true pairs abound by
      * construction) scored by incrementalSemDedup vs the exact
      * bipartite all-pairs cosine truth — cross-cell true pairs are the
      * misses. Runs at base-table size (no replication), so the truth
      * join is bounded (~n² cosine evals at 2k vectors).
      */
    def semRecall(nCells: Int): Unit = {
      val base = Tables.load(spark, sfDir, "embeddings")
      val stride = base
        .agg(coalesce(max(col("vec_id")), lit(0L)).cast("long")).head()
        .getLong(0) + 1L
      val batch = delivery(base, "vec_id", stride, 1L, 0)
      val flagged = graft.operators.Similarity
        .incrementalSemDedup(base, batch, nCells, 990000L)
        .select(col("new_id"), col("dup_id")).distinct().count()
      // exact bipartite truth: batch × (corpus ∪ lower-id batch-mates)
      def nrm(df: DataFrame, p: String) = df.select(
        col("vec_id").as(s"${p}id"), col("embedding").as(s"${p}e"),
        sqrt(aggregate(col("embedding"), lit(0.0d),
          (a: Column, x: Column) => a + x.cast("double") * x.cast("double")))
          .as(s"${p}n"))
      val tgt = nrm(base, "t").withColumn("src", lit("corpus"))
        .unionByName(nrm(batch, "t").withColumn("src", lit("batch")))
      val cos = aggregate(
        zip_with(col("be"), col("te"),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0d), (a: Column, x: Column) => a + x) / (col("bn") * col("tn"))
      val truth = nrm(batch, "b").join(tgt,
          col("src") === "corpus" || col("tid") < col("bid"))
        .filter(floor(cos * 1e6 + 0.5) >= 990000L)
        .count()
      val line =
        s"""{"metric":"sem_recall","n_cells":$nCells,"sf":"$sfDir",""" +
        s""""flagged_pairs":$flagged,"truth_pairs":$truth,""" +
        s""""recall":${if (truth == 0) 1.0 else flagged.toDouble / truth}}"""
      Files.writeString(
        Paths.get(s"$outDir/gate_semdedup_recall_cells$nCells.json"), line)
      println(line)
    }

    try {
      val which =
        if (args.isEmpty) Seq("dedup", "semdedup", "dedup_novel", "semdedup_novel")
        else args.toSeq
      if (which.contains("dedup"))
        probeGate("dedup", "documents", "doc_id", id, dedupStream)
      if (which.contains("semdedup"))
        probeGate("semdedup", "embeddings", "vec_id", id, semDedupStream(16))
      if (which.contains("dedup_novel"))
        probeGate("dedup_novel", "documents", "doc_id", novelDocs, dedupStream)
      if (which.contains("semdedup_novel"))
        probeGate("semdedup_novel", "embeddings", "vec_id", novelVecs,
          semDedupStream(16))
      // round 12: the screened gate (the exact gate's scale arm) on the
      // same replica/novel deliveries — the rows/s-multiple record
      if (which.contains("dedup_screened"))
        probeGate("dedup_screened", "documents", "doc_id", id,
          dedupScreenedStream)
      if (which.contains("dedup_screened_novel"))
        probeGate("dedup_screened_novel", "documents", "doc_id", novelDocs,
          dedupScreenedStream)
      // round 12: the semantic gate's candidate-volume knob — novel-
      // delivery throughput per nCells (cells bound the per-cell
      // quadratic term; noise spreads occupancy, the production regime)
      which.collect { case s if s.startsWith("semdedup_novel_cells") =>
        s.stripPrefix("semdedup_novel_cells").toInt
      }.foreach { n =>
        probeGate(s"semdedup_novel_cells$n", "embeddings", "vec_id",
          novelVecs, semDedupStream(n))
      }
      which.collect { case s if s.startsWith("semdedup_recall_cells") =>
        s.stripPrefix("semdedup_recall_cells").toInt
      }.foreach(semRecall)
    } finally rmTree(Paths.get(tmp))
    spark.stop()
  }
}
