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

  /** Incremental JOIN-view maintenance under append (the textbook
    * delta-join decomposition): with the stored view V = L ⋈ R and
    * append-only deltas ΔL, ΔR,
    *
    *   V' = V ∪ (ΔL ⋈ R) ∪ (L ⋈ ΔR) ∪ (ΔL ⋈ ΔR)
    *
    * — the refresh joins each delta against the OTHER side's history
    * plus the cross-delta term, so per-batch cost is O(Δ ⋈ history)
    * partitioned on the join keys, never history ⋈ history. At 100 TB
    * the history sides are bucketed on the keys at ingest (see
    * sources.Sinks bucketed layout), making each delta join
    * shuffle-one-side. Returns the appended-rows delta ONLY (the
    * caller appends it to the stored view table, mirroring how
    * [[merge]] returns the new snapshot): deletes/updates are out of
    * scope — pair with EtlOps.applyChangelog for CDC inputs.
    */
  def joinViewDelta(leftOld: DataFrame, deltaLeft: DataFrame,
                    rightOld: DataFrame, deltaRight: DataFrame,
                    keys: Seq[String]): DataFrame =
    deltaLeft.join(rightOld, keys)
      .unionByName(leftOld.join(deltaRight, keys))
      .unionByName(deltaLeft.join(deltaRight, keys))
}
