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

  /** Join-key overlap profile: the pre-flight stat a pipeline consults
    * before committing to a big join — exact distinct-key counts per
    * side, the exact intersection and containment (how much of A's key
    * space B covers, in basis points), plus the sketch-path audit: the
    * HLL union estimate (what you'd use at 100 TB, where the two exact
    * distincts come from maintained slice-sketch tables and only the
    * union is estimated) must land within `tolerancePct` of the exact
    * union. All three inputs to the verdict are one-row aggregates;
    * the combine is a broadcast of sub-KB relations, never a data join.
    * Note the intersection estimate n_a + n_b − est_union inherits
    * EXACTLY the union's absolute error, so one verdict covers both. */
  def keyOverlap(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
                 lgK: Int = 14, tolerancePct: Int = 5): DataFrame = {
    val sa = a.agg(expr(s"hll_sketch_agg($aKey, $lgK)").as("__sk_a"),
      countDistinct(col(aKey)).as("n_a"))
    val sb = b.agg(expr(s"hll_sketch_agg($bKey, $lgK)").as("__sk_b"),
      countDistinct(col(bKey)).as("n_b"))
    val inter = a.select(col(aKey).as("__k")).distinct()
      .join(b.select(col(bKey).as("__k")).distinct(), Seq("__k"),
        "left_semi")
      .agg(count(lit(1)).as("n_inter"))
    sa.crossJoin(broadcast(sb)).crossJoin(broadcast(inter))
      .select(col("n_a"), col("n_b"), col("n_inter"),
        expr("10000 * n_inter div n_a").as("containment_bp"),
        (abs(expr("hll_sketch_estimate(hll_union(__sk_a, __sk_b, false))")
          - (col("n_a") + col("n_b") - col("n_inter"))) * 100
          <= (col("n_a") + col("n_b") - col("n_inter")) * tolerancePct)
          .as("union_ok"))
  }

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
