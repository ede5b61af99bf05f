package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-key aggregation: two-phase salted rollup.
  *
  * With few very hot grouping keys (the events table has 5 event types
  * across any number of rows), a single hash aggregation funnels each hot
  * key through one reducer. Salting splits every key into `saltBuckets`
  * sub-groups for the partial aggregation, then merges the partials in a
  * second, tiny aggregation — the classic two-stage pattern AQE's skew
  * handling applies to joins, done explicitly for aggregates.
  *
  * Only algebraically mergeable aggregates (sum/count here) are exposed,
  * so the final result is exactly the unsalted GROUP BY — the DuckDB
  * oracle runs the plain form.
  */
object SkewOps {

  /** count(*) and per-column sums, salted. The salt derives from a hash
    * of `saltSource` (any roughly-uniform column); correctness does not
    * depend on the salt's distribution, only performance does.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
                     saltSource: String, saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(crc32(col(saltSource).cast("string")), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__cnt"),
        sumCols.map(c => sum(col(c)).as(s"__sum_$c")): _*)
    val finalAggs: Seq[Column] =
      sum(col("__cnt")).as("n") +:
        sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c"))
    partial.groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
