package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Outlier treatment for numeric feature columns: per-group
  * winsorization (cap at discrete quantiles) and IQR-fence flagging —
  * the standard guards before a skewed metric feeds a training
  * pipeline or an aggregate report.
  *
  * Quantiles are DISCRETE (percentile_disc semantics: the smallest
  * value whose cumulative distribution reaches q), computed over an
  * integer-quantized lane (`floor(value·scale)`), so every engine and
  * every partitioning produces the SAME threshold — interpolating
  * percentiles differ between engines in both formula and float
  * association, and a drifting threshold silently changes which rows
  * are capped. cume_dist is SQL-standard on ties.
  *
  * Scale shape: one shuffle on the group key for the window pass over
  * the quantized lane; the resulting per-group threshold table is tiny
  * (one row per group) and broadcasts back onto the fact side, so the
  * clamp itself is row-local — the fact table is shuffled once, the
  * thresholds never shuffle it again.
  */
object Outliers {

  /** Per-group discrete quantile thresholds over `floor(value·scale)`:
    * (group, q_lo, q_hi) with one row per group.
    */
  def discThresholds(df: DataFrame, groupCol: String, valueCol: String,
                     qLo: Double, qHi: Double,
                     scale: Long = 100L): DataFrame = {
    val vc = floor(col(valueCol) * scale).cast("long")
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__vc"))
    val cd = df.select(col(groupCol), vc.as("__vc"))
      .withColumn("__cd", cume_dist().over(w))
    cd.groupBy(col(groupCol))
      .agg(min(when(col("__cd") >= qLo, col("__vc"))).as("q_lo"),
        min(when(col("__cd") >= qHi, col("__vc"))).as("q_hi"))
  }

  /** Winsorize `valueCol` within each group: the quantized value is
    * clamped to [q_lo, q_hi]; output keeps the original columns plus
    * `v_scaled` (quantized raw) and `v_capped` (clamped). Thresholds
    * broadcast — the fact side is not reshuffled for the clamp.
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                qLo: Double = 0.05, qHi: Double = 0.95,
                scale: Long = 100L): DataFrame = {
    val th = discThresholds(df, groupCol, valueCol, qLo, qHi, scale)
    df.withColumn("v_scaled", floor(col(valueCol) * scale).cast("long"))
      .join(broadcast(th), Seq(groupCol))
      .withColumn("v_capped",
        least(greatest(col("v_scaled"), col("q_lo")), col("q_hi")))
  }

  /** IQR-fence outlier flags per group: a row is an outlier when its
    * quantized value falls outside [q1 − k·IQR, q3 + k·IQR] (k in
    * QUARTERS so the fence arithmetic stays integer-exact: k=6 is the
    * classic 1.5×IQR). Returns the input plus `is_outlier`.
    */
  def iqrOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  kQuarters: Int = 6, scale: Long = 100L): DataFrame = {
    val th = discThresholds(df, groupCol, valueCol, 0.25, 0.75, scale)
      .withColumnRenamed("q_lo", "q1").withColumnRenamed("q_hi", "q3")
    df.withColumn("v_scaled", floor(col(valueCol) * scale).cast("long"))
      .join(broadcast(th), Seq(groupCol))
      .withColumn("is_outlier",
        col("v_scaled") * 4 < col("q1") * 4 - (col("q3") - col("q1")) * kQuarters ||
          col("v_scaled") * 4 > col("q3") * 4 + (col("q3") - col("q1")) * kQuarters)
  }
}
