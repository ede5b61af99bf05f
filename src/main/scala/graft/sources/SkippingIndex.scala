package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data-skipping index — the lakehouse-table-format move
  * (Delta/Iceberg keep per-file column stats in the transaction log)
  * as a freestanding operator over plain parquet directories.
  * [[ClusteredWrite]] already gives each file a narrow key range and
  * row groups tight footer stats; this layer lifts the per-FILE
  * min/max into a stats TABLE so the planner never has to touch the
  * skipped files at all — at 100 TB the difference between opening a
  * million parquet footers (a million random reads before the first
  * data byte) and scanning a stats table whose row count is the file
  * count.
  *
  * The pruning step materializes the surviving file LIST on the
  * driver. That is the metadata plane, not the data plane: its size is
  * O(#files), the same object every Spark file-source scan already
  * holds driver-side (the `FileIndex`), and the documented O(small)
  * scalar-collect pattern this library reserves for exactly such
  * planner inputs — never row data.
  */
object SkippingIndex {

  /** Where the stats table for `path` lives. */
  def statsPath(path: String): String = path + "_stats"

  /** Build (or rebuild) the per-file stats table for `statsCols` over
    * the parquet directory at `path`: one row per data file with
    * min/max per column and the row count. One scan, one hash
    * aggregation keyed on the file path (`_metadata.file_path` — the
    * constant-per-split metadata column, no UDF, no extra IO).
    */
  def buildStats(spark: SparkSession, path: String,
                 statsCols: Seq[String]): DataFrame = {
    require(statsCols.nonEmpty, "need at least one stats column")
    val df = spark.read.parquet(path)
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    df.select(col("_metadata.file_path").as("file") +:
        statsCols.map(col): _*)
      .groupBy("file")
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(statsPath(path))
    spark.read.parquet(statsPath(path))
  }

  /** Range read with file-level skipping: keep only files whose
    * [min, max] envelope intersects [lo, hi], read exactly those, and
    * apply the residual predicate (file stats admit false positives at
    * the envelope edges, never false negatives). Equal results to the
    * unpruned `read.where(...)` by construction; FileSkipSpec asserts
    * both the equality and the file-count collapse.
    */
  def readRange(spark: SparkSession, path: String, colName: String,
                lo: Any, hi: Any): DataFrame = {
    val stats = spark.read.parquet(statsPath(path))
    val files = stats
      .where(col(s"max_$colName") >= lit(lo) &&
        col(s"min_$colName") <= lit(hi))
      .select(col("file"))
      .collect().map(_.getString(0))
    val residual = (d: DataFrame) =>
      d.where(col(colName) >= lit(lo) && col(colName) <= lit(hi))
    if (files.isEmpty)
      // preserve the schema with an empty relation
      residual(spark.read.parquet(path)).where(lit(false))
    else residual(spark.read.parquet(files: _*))
  }
}
