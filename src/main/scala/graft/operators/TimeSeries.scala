package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series shaping over the event log: per-key bucketing with gap
  * fill — the resample step a metrics/feature pipeline runs before
  * windowed models (a missing bucket must be an explicit zero row, not
  * an absent row, or rolling features silently skip the quiet periods).
  */
object TimeSeries {

  /** Per-key, per-bucket counts and value sums with zero-filled gaps
    * between each key's first and last event.
    *
    * The bucket calendar is generated ROW-LOCALLY per key from its
    * (min,max) span — `sequence` + `explode` on the aggregated span row,
    * never a driver-side calendar nor a cross join against a generated
    * dimension. Cost: two hash aggregations and one join, ALL keyed on
    * the same column, so after the first shuffle the rest co-locates
    * (AQE keeps the partitioning); per-key output is bounded by its own
    * active span, so an idle key costs nothing.
    *
    * `tsNanosCol` is epoch-nanos (the events table's native encoding);
    * `bucketSec` is the bucket width in seconds. Output: (key, bucket,
    * n_events, sum_value) with bucket = floor(ts / width) as epoch
    * bucket index.
    */
  def gapFilledCounts(events: DataFrame, keyCol: String, tsNanosCol: String,
                      valueCol: String, bucketSec: Long): DataFrame = {
    val widthNs = bucketSec * 1000000000L
    // FLOOR division (matching SQL `//` / the doc), not `div`'s
    // truncation toward zero — they differ on pre-epoch timestamps,
    // where `div` would merge the two buckets adjacent to the epoch
    val bucketed = events.select(col(keyCol),
      expr(s"$tsNanosCol div $widthNs" +
        s" - (CASE WHEN $tsNanosCol % $widthNs < 0 THEN 1 ELSE 0 END)")
        .as("bucket"),
      col(valueCol))
    val counts = bucketed.groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 4).as("sum_value"))
    val spans = bucketed.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
    val calendar = spans.select(col(keyCol),
      explode(sequence(col("b0"), col("b1"))).as("bucket"))
    calendar.join(counts, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0d)).as("sum_value"))
  }

  /** Last-observation-carried-forward (LOCF) repair: every null in each
    * of `fillCols` takes the key's most recent non-null value in
    * `(orderCol, tieCol)` order — the sensor/telemetry gap repair that
    * keeps a missing reading from becoming a zero. Leading nulls (no
    * earlier observation) stay null; downstream can coalesce a default.
    *
    * One window per call (all fill columns share it): a single shuffle
    * on the key, then Spark's running `last(ignoreNulls)` over
    * UNBOUNDED PRECEDING..CURRENT — no self-join, no driver state. The
    * (orderCol, tieCol) ordering must be total per key or "most recent"
    * is undefined; tieCol defaults to orderCol (pass a row id when the
    * order column has duplicates).
    */
  def forwardFill(df: DataFrame, keyCol: String, orderCol: String,
                  fillCols: Seq[String],
                  tieCol: Option[String] = None): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(orderCol) +: tieCol.map(col).toSeq: _*)
      .rowsBetween(Long.MinValue, 0)
    fillCols.foldLeft(df) { case (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }
}
