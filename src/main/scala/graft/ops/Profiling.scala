package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-scan column profiling: per-column row/null/distinct counts and
  * min/max — the "what is actually in this table" report every
  * ingestion runs before wiring a feed into the warehouse (the
  * observability face of [[Quality]]'s pass/fail checks).
  *
  * Scale shape: ALL per-column aggregates are computed in a SINGLE
  * aggregation over ONE scan of the table; the per-column report rows
  * are then unpivoted from that one driver-sized row with a row-local
  * explode. The exact distinct counts make Catalyst plan an Expand
  * (one duplicate of each input row per distinct aggregate) — the
  * documented price of exact cardinalities; profiles that can tolerate
  * ~2% error should swap `approx_count_distinct` in via `distinctAgg`.
  */
object Profiling {

  /** Profile `numericCols` (min/max reported as doubles) and
    * `stringCols` (min/max reported as strings) of `df` in one scan.
    *
    * Returns one row per profiled column:
    * (col_name, n_rows, n_nulls, n_distinct, min_num, max_num,
    *  min_str, max_str) — the *_num fields are null for string columns
    * and vice versa.
    *
    * `distinctAgg` is the cardinality aggregate — exact
    * `countDistinct` by default; pass `approx_count_distinct(_)` to
    * trade exactness for an Expand-free single-pass plan at scale.
    */
  def profile(df: DataFrame, numericCols: Seq[String],
              stringCols: Seq[String],
              distinctAgg: Column => Column = countDistinct(_)): DataFrame = {
    require(numericCols.nonEmpty || stringCols.nonEmpty,
      "at least one column to profile")
    val aggs =
      numericCols.flatMap { c => Seq(
        count(col(c)).as(s"${c}__nn"),
        distinctAgg(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("double").as(s"${c}__mn"),
        max(col(c)).cast("double").as(s"${c}__mx"))
      } ++
      stringCols.flatMap { c => Seq(
        count(col(c)).as(s"${c}__nn"),
        distinctAgg(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__mns"),
        max(col(c)).cast("string").as(s"${c}__mxs"))
      } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows =
      numericCols.map { c => struct(
        lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__nn")).as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__mn").as("min_num"), col(s"${c}__mx").as("max_num"),
        lit(null).cast("string").as("min_str"),
        lit(null).cast("string").as("max_str"))
      } ++
      stringCols.map { c => struct(
        lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__nn")).as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        lit(null).cast("double").as("min_num"),
        lit(null).cast("double").as("max_num"),
        col(s"${c}__mns").as("min_str"), col(s"${c}__mxs").as("max_str"))
      }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
