package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring — the Population Stability Index
  * report a pipeline runs between a reference corpus snapshot and the
  * current one (training/serving drift, crawl-quality shift). Values
  * are binned on a FIXED integer grid (drift reports must be
  * comparable across runs, so bins never come from quantiles of the
  * drifting data itself); each population is one hash aggregation,
  * bins with zero mass get add-one smoothing so ln stays defined.
  *
  * Determinism (shared with the DuckDB oracle): p and q are single
  * IEEE divisions of exact integers; ln(p/q) is floor-quantized to
  * integer micro-nats, the per-bin contribution (p−q)·mn is floored to
  * an integer — engine-exact end to end except the documented ~1-ulp
  * ln class (see LanguageModel).
  */
object Drift {

  /** Per-bin PSI report: (bin, ref_n, cur_n, psi_u) where psi_u is the
    * floored (p−q)·ln(p/q)·1e6 contribution; Σ psi_u / 1e6 is the PSI.
    * `value` must be a non-negative integer column expression; bins are
    * [0,width), [width,2·width), …, with the last bin open-ended. */
  def psiReport(ref: DataFrame, cur: DataFrame, value: Column,
                nBins: Int, width: Long): DataFrame = {
    require(nBins >= 2 && width > 0, s"bad grid: $nBins bins × $width")
    val spark = ref.sparkSession
    def binned(df: DataFrame, as: String) =
      // floor of the correctly-rounded double division equals integer
      // division for non-negative operands (boundary quotients are
      // exactly representable), and DuckDB's // mirrors it
      df.select(least(floor(value.cast("long") / lit(width)),
          lit(nBins - 1L)).cast("long").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(as))
    val bins = spark.range(nBins).toDF("bin")
    val joined = bins
      .join(binned(ref, "ref_n"), Seq("bin"), "left")
      .join(binned(cur, "cur_n"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    // totals via an unpartitioned window over the nBins-row counts
    // table: the populations are scanned exactly once each, and the
    // single-partition window holds only nBins rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    joined
      .withColumn("rt", sum(col("ref_n")).over(w))
      .withColumn("ct", sum(col("cur_n")).over(w))
      .withColumn("p", (col("ref_n") + lit(1.0d)) /
        (col("rt") + lit(nBins.toLong)))
      .withColumn("q", (col("cur_n") + lit(1.0d)) /
        (col("ct") + lit(nBins.toLong)))
      .withColumn("mn", floor(log(col("p") / col("q")) * lit(1e6d))
        .cast("long"))
      .withColumn("psi_u",
        floor((col("p") - col("q")) * col("mn")).cast("long"))
      .select(col("bin"), col("ref_n"), col("cur_n"), col("psi_u"))
  }
}
