package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch operators: sessionization, replay dedup, and
  * latest-partition selection. These are the batch forms of the semantics
  * the reference gets from its orchestration layer
  * (reference: dags/music_etl_pipeline.py:34-56 — idempotent reprocessing —
  * and glue_jobs/load_dynamo.py:27-39 — latest `date=` partition discovery).
  */
object Events {

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapMinutes`. Windows are
    * partitioned by user — the shuffle key — so state per partition is one
    * user's timeline; skew is bounded by the busiest user, not data size.
    * Returns per-user (n_events, n_sessions).
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("new_session")).as("n_sessions"))
  }

  /** Replay dedup: exactly-once semantics over an at-least-once feed — keep
    * the lowest event_id per (user_id, ts) key. One shuffle on the dedup key.
    */
  def dedupEvents(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("ts")).orderBy(col("event_id"))
    events.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Rows of the most recent event date — the latest-partition pattern
    * (load_dynamo.py:27-39) without a driver-side listing: a 1-row global
    * max broadcast-joined back to the fact, so partition pruning would apply
    * on a date-partitioned layout.
    */
  def latestDate(events: DataFrame): DataFrame = {
    val dated = events.withColumn("event_date", to_date(col("ts")))
    val maxd = dated.agg(max(col("event_date")).as("max_date"))
    dated.join(broadcast(maxd), col("event_date") === col("max_date")).drop("max_date")
  }
}
