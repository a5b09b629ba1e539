package graft.streaming

import graft.functions.ExactAgg
import graft.sinks.KeyValueSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming form of the reference pipeline: where the reference
  * polls S3 with an Airflow sensor and tracks processed files in DynamoDB
  * (reference: dags/music_etl_pipeline.py:83-95,34-45), Spark's file stream
  * source + checkpoint does the same natively — each input file is processed
  * exactly once, recovery resumes from the checkpoint.
  *
  * Flow: readStream(files) → validate (null-drop) → watermarked windowed
  * KPIs → foreachBatch KV upsert (aggregations-with-update need foreachBatch;
  * the KV put is idempotent so update-mode re-emission is safe).
  */
object StreamingPipeline {

  /** Windowed per-event-type KPIs over a file-source stream. */
  def kpiStream(spark: SparkSession, inputDir: String, schema: StructType,
                windowMinutes: Int = 60, watermarkMinutes: Int = 120): DataFrame =
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .filter(col("user_id").isNotNull && col("event_type").isNotNull && col("ts").isNotNull)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", s"$watermarkMinutes minutes")
      .groupBy(window(col("ts"), s"$windowMinutes minutes"), col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        ExactAgg.moneySum(col("value")).as("total_value"),
        count(lit(1)).as("event_count"))

  /** Wire the KPI stream into the KV sink via foreachBatch. */
  def toKvSink(kpis: DataFrame, table: String, checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    kpis.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val items = batch.select(
          col("window.start").cast("string").as("pk"),
          col("event_type").as("sk"),
          col("approx_users"), col("total_value"), col("event_count"))
        KeyValueSink.write(items, table, "pk", "sk")
      }

  /** Stream–static enrichment: the micro-batch stream joined to a batch
    * dimension (broadcast — no stream-side shuffle), then windowed per-
    * segment KPIs. The streaming twin of `operators.Kpi.dailyKpis`.
    */
  def enrichedKpiStream(spark: SparkSession, inputDir: String, schema: StructType,
                        customer: DataFrame, windowMinutes: Int = 60,
                        watermarkMinutes: Int = 120): DataFrame = {
    val dim = customer.select(col("c_custkey"), col("c_mktsegment").as("segment"))
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withColumn("ts", col("ts").cast("timestamp"))
      .join(org.apache.spark.sql.functions.broadcast(dim),
        col("user_id") === col("c_custkey"))
      .withWatermark("ts", s"$watermarkMinutes minutes")
      .groupBy(window(col("ts"), s"$windowMinutes minutes"), col("segment"))
      .agg(
        count(lit(1)).as("event_count"),
        ExactAgg.moneySum(col("value")).as("total_value"))
  }

  /** Stream–stream event-time join: attribute each purchase to the same
    * user's preceding click within `horizonMinutes`. Both sides carry
    * watermarks and the join condition bounds event time on both ends, so
    * state for either side is droppable once the watermark passes the
    * horizon — the join state is O(horizon), not O(stream).
    */
  def attributionStream(events: DataFrame, horizonMinutes: Int = 60,
                        watermarkMinutes: Int = 120): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").cast("timestamp").as("click_ts"))
      .withWatermark("click_ts", s"$watermarkMinutes minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").cast("timestamp").as("purchase_ts"),
        col("value"))
      .withWatermark("purchase_ts", s"$watermarkMinutes minutes")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizonMinutes MINUTES"))
      .select(col("p_user").as("user_id"), col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** Streaming replay dedup: exactly-once rows out of an at-least-once
    * feed, the streaming twin of `operators.Events.dedupEvents`. State is
    * keyed by (user_id, ts) and expired by the watermark — bounded by the
    * duplicate-arrival horizon, not the stream's history.
    */
  def dedupStream(stream: DataFrame, watermarkMinutes: Int): DataFrame =
    stream
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", s"$watermarkMinutes minutes")
      .dropDuplicatesWithinWatermark("user_id", "ts")

  /** Streaming ingest-time near-dup gate: each arriving micro-batch of
    * documents is checked against the standing corpus AND within itself via
    * [[graft.operators.Dedup.incrementalNearDup]]; `onFlagged` receives the
    * flagged-pair frame per batch (route it to a quarantine sink, or
    * anti-join it off the accepted write). `foreachBatch` is the right tool
    * here: the candidate join needs the whole delivery on hand, and the
    * file-source checkpoint already gives exactly-once per input file —
    * streaming contributes discovery and recovery while the dedup itself
    * stays the batch-shaped bipartite join (corpus×corpus never pairs).
    *
    * Scope contract: a delivery pairs against the corpus and against
    * itself; documents in DIFFERENT deliveries only pair once accepted docs
    * are folded into the corpus between deliveries. `corpus` is a thunk
    * re-evaluated per batch for exactly that cadence — a sink that appends
    * accepted docs makes the next delivery see them.
    */
  def dedupIngestStream(spark: SparkSession, inputDir: String,
                        schema: StructType, corpus: () => DataFrame,
                        threshold: Double, checkpointDir: String)
                       (onFlagged: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        onFlagged(
          graft.operators.Dedup.incrementalNearDup(corpus(), batch, threshold), id)
      }

  /** SCREENED streaming ingest-time near-dup gate — [[dedupIngestStream]]'s
    * scale arm (round 12): per delivery it runs
    * [[graft.operators.Dedup.incrementalLshScreenedMd5]] — md5-affine
    * MinHash banding, the in-band 16-byte 2-bit-minhash screen, and a
    * survivor-staged exact verify — instead of the exact blocked
    * n-gram-Jaccard join. The exact gate is measured CANDIDATE-bound
    * (probe_r11: 1661 rows/s on a 500k novel delivery — kernel evals on
    * block-mates dominate); here candidates are banded (rows=8 floor)
    * and screened per co-occurrence BEFORE the candidate distinct, so
    * per-delivery wall tracks survivors, not block density. The recall
    * trade (catch-strong-dups: banding × screen, ~0.85 at exactly
    * j=0.6, >0.999 at j≥0.8 with the defaults) is the operator's
    * documented contract — the right production point for an ingest
    * gate whose misses the next FULL corpus dedup sweep still catches.
    * Same scope/checkpoint contract as [[dedupIngestStream]].
    */
  def dedupIngestStreamScreened(spark: SparkSession, inputDir: String,
                                schema: StructType, corpus: () => DataFrame,
                                threshold: Double, checkpointDir: String,
                                numHashes: Int = 64, bands: Int = 8,
                                shingleWidth: Int = 5, screenCut: Int = 41)
                               (onFlagged: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        onFlagged(
          graft.operators.Dedup.incrementalLshScreenedMd5(corpus(), batch,
            numHashes, bands, threshold, shingleWidth, screenCut), id)
      }

  /** Streaming SEMANTIC ingest gate — the embedding twin of
    * [[dedupIngestStream]]: each delivery of vectors is checked for
    * semantic (cosine) duplicates against the standing corpus and within
    * itself via [[graft.operators.Similarity.incrementalSemDedup]].
    * Same scope contract: the corpus thunk re-evaluates per delivery, so
    * accepted vectors fold in between deliveries; the source checkpoint
    * gives exactly-once per input file.
    */
  def semDedupIngestStream(spark: SparkSession, inputDir: String,
                           schema: StructType, corpus: () => DataFrame,
                           nCells: Int, threshMicro: Long,
                           checkpointDir: String)
                          (onFlagged: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        onFlagged(graft.operators.Similarity.incrementalSemDedup(
          corpus(), batch, nCells, threshMicro), id)
      }

  /** Streaming semantic-DECONTAMINATION gate (round 6): each delivery of
    * train vectors is checked against the standing EVAL set via
    * [[graft.operators.Similarity.semanticDecontaminate]] — the
    * ingest-time arm of q321, catching paraphrase-level eval leakage the
    * canary/containment gates cannot see, BEFORE a delivery lands in a
    * training corpus. The eval thunk re-evaluates per delivery (a
    * refreshed benchmark suite takes effect at the next micro-batch);
    * the source checkpoint gives exactly-once per input file. Like every
    * gate here, policy (drop flagged vectors, reject the delivery, page)
    * stays with the caller. Per-delivery cost: eval-anchored cells are a
    * bounded broadcast; only cell-mates score — never delivery×eval
    * all-pairs.
    */
  def decontaminationGateStream(spark: SparkSession, inputDir: String,
                                schema: StructType, eval: () => DataFrame,
                                nCells: Int, threshMicro: Long,
                                checkpointDir: String)
                               (onFlagged: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        onFlagged(graft.operators.Similarity.semanticDecontaminate(
          batch, eval(), nCells, threshMicro), id)
      }

  /** Streaming distribution-drift gate: each delivery's `x` column is
    * tested against a standing reference distribution with the
    * exact-integer two-sample KS distance
    * ([[graft.operators.Quality.ksScaled]], q218's statistic) — the
    * ingest-time shape-drift monitor that catches a supplier silently
    * changing its export (lengths, prices, latencies) BEFORE the batch
    * lands. The report row carries (n_a, n_b, x_at_max, d_scaled);
    * alerting thresholds (e.g. d_scaled > α·n_a·n_b) stay with the
    * caller, exactly like the near-dup gate leaves quarantine policy to
    * its `onFlagged`. The reference thunk re-evaluates per delivery so
    * an accepted delivery can fold into the baseline between batches.
    */
  def driftGateStream(spark: SparkSession, inputDir: String,
                      schema: StructType, reference: () => DataFrame,
                      checkpointDir: String)
                     (onReport: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        onReport(graft.operators.Quality.ksScaled(reference(), batch), id)
      }

  /** Streaming canary-contamination gate: every micro-batch delivery is
    * scanned for the release's canary strings BEFORE it can land — the
    * ingest-time arm of [[graft.operators.TextAnalysis.canaryScan]]
    * (q249's batch screen), completing the contamination story the same
    * way the near-dup and drift gates do for duplication and shape.
    * `onReport` receives the per-canary (n_docs, n_occurrences) frame
    * per batch; quarantine policy (reject the delivery on any hit, strip
    * the flagged docs, page someone) stays with the caller, like every
    * gate here. The scan is one pass over the batch with a bounded
    * broadcast fan-out — per-delivery cost is linear in delivery bytes,
    * independent of the standing corpus.
    */
  def canaryGateStream(spark: SparkSession, inputDir: String,
                       schema: StructType, canaries: Seq[String],
                       checkpointDir: String)
                      (onReport: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        onReport(graft.operators.TextAnalysis.canaryScan(batch, canaries), id)
      }

  /** Streaming upsert materialization: each micro-batch of changelog rows
    * (`k, v, op` — the [[graft.operators.Cdc]] shape) folds into a standing
    * keyed parquet table via [[graft.operators.Cdc.applyChangelog]] and a
    * crash-safe two-rename swap. This is the MERGE-INTO sink for engines
    * without table-format transactions: the stream carries deltas, the
    * table stays a plain parquet directory any batch reader can scan.
    *
    * Within one batch the changelog may carry several ops for one key;
    * `seqCol` (arrival order) picks the LAST — the per-batch compaction a
    * replayed upstream produces. foreachBatch + the source checkpoint give
    * exactly-once per input file; the swap keeps readers consistent
    * mid-write (they see old or new, never half).
    */
  def upsertStream(spark: SparkSession, inputDir: String, schema: StructType,
                   tableDir: String, seqCol: String,
                   checkpointDir: String,
                   // crash-injection seam (StreamingPipelineSpec): runs
                   // AFTER the table promote but BEFORE foreachBatch
                   // returns — i.e. before the source checkpoint commits —
                   // the exact window a real crash-recovery must survive.
                   // Production callers leave the default no-op.
                   postBatchHook: Long => Unit = _ => ())
                  : DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.expressions.Window
        graft.sinks.Compaction.recoverPath(spark, tableDir)
        val lastPerKey = batch
          .withColumn("_rn", row_number().over(
            Window.partitionBy(col("k")).orderBy(col(seqCol).desc)))
          .filter(col("_rn") === 1)
          .select(col("k"), col("v"), col("op"))
        val base = {
          val dir = new java.io.File(tableDir)
          if (dir.exists() && dir.listFiles().exists(_.getName.endsWith(".parquet")))
            spark.read.parquet(tableDir).select(col("k"), col("v"))
          else lastPerKey.filter(lit(false)).select(col("k"), col("v"))
        }
        val next = graft.operators.Cdc.applyChangelog(base, lastPerKey)
        // write-then-promote via the compaction swap: never truncate the
        // live table before its replacement is fully written, and a crash
        // at any point leaves a recoverable copy
        next.write.mode("overwrite")
          .parquet(graft.sinks.Compaction.stagingDir(tableDir))
        graft.sinks.Compaction.promote(spark, tableDir)
        postBatchHook(batchId)
      }

  /** Synchronous one-shot run for tests/backfills: process everything
    * currently in the directory, then stop (Trigger.AvailableNow — the
    * batch-like mode a scheduled MWAA DAG approximates).
    */
  def runOnce(writer: DataStreamWriter[org.apache.spark.sql.Row]): StreamingQuery = {
    val q = writer.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q
  }
}
