package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch distinct counting (Apache DataSketches HLL, shipped
  * with Spark as `hll_sketch_agg` / `hll_union_agg`): the scale-native
  * replacement for re-running COUNT(DISTINCT) over an ever-growing
  * corpus. Each ingest slice (a day, a batch) reduces to one compact
  * sketch row per group — the 100 TB history is thereafter a
  * sketch TABLE, and any window's distinct estimate is a union over
  * the covered slice rows, never a rescan of raw data. Same
  * amortization contract as Dedup's signature table and the
  * CountMin maintained sketch (x_count_min_incr), applied to
  * cardinality.
  *
  * The reference engine has no sketching at all (its only aggregate is
  * a scalar MAX — SURVEY.md §2.5, common/SimpleDataCleanUtils.scala:19);
  * this is part of the warehouse repertoire the Spark build adds.
  *
  * Estimator caveat encoded in [[mergeReport]]: a DIRECT sketch over
  * the whole stream and a UNION of per-slice sketches are both valid
  * HLL states but use different estimators (streaming HIP vs composite),
  * so their estimates need not be bit-equal — correctness is "both
  * within rated error of exact", which is what the gated query asserts
  * relationally (at lgK=14 the rated RSE is ~0.8%; the 5% gate is wide).
  */
object Sketches {

  /** One HLL sketch per (group, slice): the rows you append to the
    * maintained sketch table as each slice arrives. `lgK` trades
    * 2^lgK bytes/row for accuracy (rated RSE ≈ 1.04 / sqrt(2^lgK)). */
  def hllSliceSketches(df: DataFrame, groupCol: String, sliceCol: String,
                       valueCol: String, lgK: Int = 14): DataFrame =
    df.groupBy(col(groupCol), col(sliceCol))
      .agg(expr(s"hll_sketch_agg($valueCol, $lgK)").as("sketch"))

  /** Distinct estimate per group from a slice-sketch table: one union
    * pass over sketch rows (bytes per row, not data). */
  def hllEstimate(sketches: DataFrame, groupCol: String): DataFrame =
    sketches.groupBy(col(groupCol))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch, false))")
        .as("est_distinct"))

  /** Accuracy audit of the slice-union path against both the direct
    * single-pass sketch and the exact distinct count: per group,
    * `n_exact` plus two relational verdicts — the direct sketch and
    * the merged slice-union each within `tolerancePct` of exact. The
    * verdicts (not the float estimates) are the comparable surface. */
  def mergeReport(df: DataFrame, groupCol: String, sliceCol: String,
                  valueCol: String, lgK: Int = 14,
                  tolerancePct: Int = 5): DataFrame = {
    val merged = hllEstimate(
      hllSliceSketches(df, groupCol, sliceCol, valueCol, lgK), groupCol)
      .withColumnRenamed("est_distinct", "__est_merged")
    val direct = df.groupBy(col(groupCol))
      .agg(expr(s"hll_sketch_estimate(hll_sketch_agg($valueCol, $lgK))")
        .as("__est_direct"),
        countDistinct(col(valueCol)).as("n_exact"))
    direct.join(merged, Seq(groupCol))
      .select(col(groupCol), col("n_exact"),
        (abs(col("__est_direct") - col("n_exact")) * 100
          <= col("n_exact") * tolerancePct).as("direct_ok"),
        (abs(col("__est_merged") - col("n_exact")) * 100
          <= col("n_exact") * tolerancePct).as("merged_ok"))
  }
}
