package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization: assign gap-based session ids per user and roll
  * up per-session stats. Batch analog of what the Structured Streaming
  * path would do with flatMapGroupsWithState.
  *
  * Scale: one hash-shuffle on user_id (the window), then the rollup
  * reuses the same partitioning — Catalyst collapses the groupBy into
  * the already-partitioned stage, so sessionizing 100 TB of events costs
  * a single exchange.
  */
object Sessionize {

  /** `tsCol` is BIGINT epoch-nanos (the events table's nanos-as-long
    * timestamp). A new session starts when the gap since the user's
    * previous event exceeds `gapNanos`. `sess_idx` is the 1-based session
    * counter per user; ordering is total via (ts, event_id).
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 idCol: String,
                 gapNanos: Long = 30L * 60 * 1000000000L): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val prev = lag(col(tsCol), 1).over(w)
    events
      .withColumn("__new_sess",
        when(prev.isNull || (col(tsCol) - prev) > gapNanos, 1L).otherwise(0L))
      .withColumn("sess_idx", sum(col("__new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_sess")
  }

  /** Per-session rollup: bounds (epoch micros), event count, value sum. */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   idCol: String, valueCol: String,
                   gapNanos: Long = 30L * 60 * 1000000000L): DataFrame =
    sessionize(events, userCol, tsCol, idCol, gapNanos)
      .groupBy(col(userCol), col("sess_idx"))
      .agg(
        expr(s"min($tsCol) div 1000").as("session_start_us"),
        expr(s"max($tsCol) div 1000").as("session_end_us"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("sum_value"))
}
