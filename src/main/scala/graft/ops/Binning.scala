package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equal-frequency discretization for feature columns — the binning
  * step before histogram features, monotonic-bucket encodings, or the
  * z-order curve (Sinks.writeZOrdered uses exactly this construction).
  *
  * Boundaries come from ONE approxQuantile sketch pass (driver-side
  * blob, size independent of row count — the repartitionByRange
  * mechanism); the bucket assignment itself is a row-local codegen'd
  * expression over the broadcast literal bounds, so the operator adds
  * NO shuffle. Equal-frequency (not equal-width) buckets keep skewed
  * features informative: a long-tailed value column still fills every
  * bucket instead of collapsing into bucket 0.
  */
object Binning {

  /** Quantile boundaries for `col` at `buckets` equal-frequency cuts.
    * `relativeError` trades sketch size for cut precision. */
  def boundaries(df: DataFrame, column: String, buckets: Int,
                 relativeError: Double = 0.01): Array[Double] = {
    require(buckets >= 2, "need at least two buckets")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    df.stat.approxQuantile(column, probs, relativeError)
  }

  /** Bucket id (0..buckets-1) of `value` given sketched `bounds`:
    * the count of boundaries <= value. Row-local, shuffle-free. */
  def bucketOf(value: Column, bounds: Array[Double]): Column =
    size(filter(lit(bounds), b => value.cast("double") >= b)).cast("long")

  /** df plus `<column>_bucket` with its equal-frequency bucket id. */
  def withBuckets(df: DataFrame, column: String, buckets: Int): DataFrame =
    df.withColumn(s"${column}_bucket",
      bucketOf(col(column), boundaries(df, column, buckets)))
}
