package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the "don't rescan 100 TB for
  * today's increment" primitive: a maintained sum/count snapshot is
  * merged with a new raw batch by aggregating ONLY the batch and
  * re-summing, because sums and counts are associative partial
  * aggregates. Cost per refresh is O(batch) + O(|snapshot|), never
  * O(history). Averages and other derived ratios are computed FROM the
  * maintained sums at read time; non-decomposable aggregates (exact
  * distinct, medians) need their own structures and are out of scope.
  */
object IncrementalAgg {

  /** Aggregate `df` into snapshot shape: keys, `n` row count, one
    * summed column per entry of `sums` (same names). */
  def snapshot(df: DataFrame, keys: Seq[String],
               sums: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sums.map(c => sum(col(c)).as(c)): _*)

  /** Merge a raw `delta` batch into an existing `base` snapshot
    * (produced by [[snapshot]] with the same keys/sums). Equivalent to
    * re-aggregating history + batch, at O(batch) cost. */
  def merge(base: DataFrame, delta: DataFrame, keys: Seq[String],
            sums: Seq[String]): DataFrame =
    base.unionByName(snapshot(delta, keys, sums))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sums.map(c => sum(col(c)).as(c)): _*)
}
