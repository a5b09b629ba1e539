package graft.streaming

import graft.functions.ExactAgg
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization + custom keyed state.
  *
  * `sessionKpis` is the declarative form: Spark's native `session_window`
  * merges gap-based sessions inside the state store, watermark bounds state
  * size — at scale, state is sharded by the grouping key across executors
  * and expired by the watermark, so memory is bounded by *active* sessions,
  * not history. This is the streaming twin of `operators.Events.sessionize`
  * (the reference's implied streams-analytics primitive).
  *
  * `runningTotals` shows the escape hatch for state machines that windowed
  * aggregation can't express — `flatMapGroupsWithState` with explicit
  * per-user state, emitting an updated running (count, exact-cents total)
  * every micro-batch.
  */
object StatefulSessions {

  /** Gap-based session KPIs over a watermarked stream. */
  def sessionKpis(stream: DataFrame, gapMinutes: Int,
                  watermarkMinutes: Int): DataFrame =
    stream
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", s"$watermarkMinutes minutes")
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        ExactAgg.moneySum(col("value")).as("total_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  final case class UserTotal(user_id: Long, n_events: Long, total_value: Double)
  final case class UserState(n: Long, cents: Long)

  /** Running per-user totals via explicit keyed state. Exact-cents state
    * (longs) keeps the running double reconstruction order-independent.
    */
  def runningTotals(spark: SparkSession, stream: DataFrame): Dataset[UserTotal] = {
    import spark.implicits._
    stream
      .filter(col("user_id").isNotNull)
      .select(col("user_id").cast("long"),
        coalesce(col("value"), lit(0.0)).cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0L))
          var n = prev.n
          var cents = prev.cents
          rows.foreach { case (_, v) => n += 1; cents += math.floor(v * 100.0 + 0.5).toLong }
          state.update(UserState(n, cents))
          Iterator.single(UserTotal(user, n, cents.toDouble / 100.0))
      }
  }
}
