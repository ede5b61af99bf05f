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

  /** Skew-safe equi-join of a hot-keyed fact against a small dimension:
    * the fact side gets a deterministic salt (hash of `saltSource` mod
    * `saltBuckets`), the dimension is exploded to every salt value, and
    * the join key becomes (key, salt) — so one hot key spreads over
    * `saltBuckets` reducers instead of one. The result set is exactly
    * the unsalted inner join (salting is invisible to semantics), which
    * is what the oracle runs.
    *
    * This is the explicit form of what AQE skew-join does adaptively;
    * use it when the skew is known ahead of time (a 100 TB events table
    * with a handful of dominant keys) or when AQE's post-shuffle split
    * cannot help (e.g. the hot key exceeds a single executor's memory
    * during the map phase).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltSource: String, saltBuckets: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(crc32(col(saltSource).cast("string")), lit(saltBuckets)))
    val explodedDim = dim.withColumn("__salt",
      explode(array((0 until saltBuckets).map(s => lit(s.toLong)): _*)))
    saltedFact.join(explodedDim, keys :+ "__salt").drop("__salt")
  }

  /** Top-`k` heaviest values of a would-be shuffle key with their share
    * of all rows — the diagnostic run BEFORE choosing a skew strategy
    * (salt? broadcast the other side? AQE?). One partial-aggregated
    * count and a TakeOrderedAndProject; cheap enough to run on the real
    * 100 TB input rather than guessing from a sample.
    *
    * Total (cnt desc, key asc) ordering; share rounded to 6 decimals.
    */
  def keyHistogram(df: DataFrame, key: String, k: Int): DataFrame = {
    val total = df.count()
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key))
      .limit(k)
      .withColumn("share", round(col("cnt") / lit(total.toDouble), 6))
  }
}
