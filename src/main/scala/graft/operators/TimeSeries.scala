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

  /** Overlapping-interval coalescing (the gaps-and-islands merge): per
    * key, every maximal run of pairwise-overlapping-or-touching
    * `[start, end]` intervals collapses to one row carrying the run's
    * bounds and member count — availability windows, session spans,
    * retention holds, crawl leases all reduce to this.
    *
    * An interval starts a new island iff its start exceeds the running
    * MAX end of every interval sorted before it (strictly — touching
    * intervals, `start == prev end`, merge). That running max is a
    * window aggregate over `UNBOUNDED PRECEDING .. 1 PRECEDING`, so the
    * whole merge is ONE hash shuffle on the key plus the island rollup,
    * which Catalyst colocates on the same partitioning — the identical
    * scale shape as [[Sessionize.sessionize]]. No self-join (the naive
    * O(n²) overlap join), no driver state; a key's cost is its own row
    * count, 100 TB of keys merge independently.
    *
    * Ordering must be total per key for a deterministic `interval_idx`:
    * (start, end, idCol). Output: (key, interval_idx, iv_start, iv_end,
    * n_merged) with interval_idx 1-based per key in start order.
    */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
                     endCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol), col(idCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Long.MinValue, -1))
    df.withColumn("__new_iv",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("interval_idx",
        sum(col("__new_iv")).over(w.rowsBetween(Long.MinValue, 0)))
      .groupBy(col(keyCol), col("interval_idx"))
      .agg(
        min(col(startCol)).as("iv_start"),
        max(col(endCol)).as("iv_end"),
        count(lit(1)).as("n_merged"))
  }

  /** Trailing-window z-score anomaly flags in EXACT integer
    * arithmetic — the online telemetry monitor ("is this reading wild
    * against ITS OWN recent history"), complementing the static
    * per-group fences in [[graft.ops.Outliers]]. The value quantizes
    * to `scale` units, the strictly-preceding `window` rows supply
    * rolling count/sum/sum-of-squares, and the z-threshold test
    * cross-multiplies so no division, sqrt, or float ever runs:
    *
    *   |x·n − Σx| > z·sqrt(n·(n·Σx² − (Σx)²))
    *   ⇔ (x·n − Σx)² > z²·n·(n·Σx² − (Σx)²)    (integers both sides)
    *
    * Integer moments are association-free, so the flag is
    * bit-identical across partitionings, retries, and engines
    * (`zSq` = z², e.g. 9 for the 3-sigma rule); a float z-score
    * pipeline is none of those. Warmup rows (fewer than `window`
    * predecessors) flag false — they have no verdict, not an anomaly.
    *
    * One hash shuffle on the key (the window), everything after is
    * row-local; wide history never materializes — the frame carries
    * three running integers. Ordering must be total per key:
    * (orderCol, idCol).
    *
    * Output: input keys + (ts order) + `v_c` (quantized value),
    * `n_prev`, `is_anomaly`.
    */
  def rollingAnomalies(df: DataFrame, keyCol: String, orderCol: String,
                       idCol: String, valueCol: String,
                       window: Int = 20, zSq: Long = 9L,
                       scale: Long = 100L): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val dec = "decimal(38,0)"
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(idCol))
      .rowsBetween(-window.toLong, -1)
    val base = df.withColumn("v_c",
      floor(col(valueCol) * scale).cast("long"))
    base
      .withColumn("n_prev", count(col("v_c")).over(wp))
      .withColumn("__s", coalesce(sum(col("v_c")).over(wp), lit(0L)))
      .withColumn("__ss",
        coalesce(sum(col("v_c") * col("v_c")).over(wp), lit(0L)))
      .withColumn("is_anomaly",
        when(col("n_prev") === window.toLong, {
          val dev = (col("v_c") * col("n_prev") - col("__s")).cast(dec)
          val varTerm = (col("n_prev").cast(dec) * col("__ss").cast(dec) -
            col("__s").cast(dec) * col("__s").cast(dec))
          dev * dev > lit(zSq).cast(dec) * col("n_prev").cast(dec) * varTerm
        }).otherwise(lit(false)))
      .drop("__s", "__ss")
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
