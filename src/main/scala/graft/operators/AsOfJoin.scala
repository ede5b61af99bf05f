package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the LATEST right row of the
  * same key whose time is <= the left row's time (nulls when none).
  *
  * Spark has no native as-of join. The naive formulations are a range
  * join (O(n·m) BroadcastNestedLoop) or a per-left-row subquery — both
  * non-starters at scale. This implementation uses the union + ordered
  * window + last(ignoreNulls) composition:
  *
  *   1. union right and left rows into one keyed timeline, right rows
  *      carrying their payload columns, left rows carrying null payloads;
  *   2. one window over (key, time, side) — right sorts before left at
  *      equal times, so ties honor `rightTime <= leftTime`;
  *   3. last(payload, ignoreNulls=true) over the unbounded-preceding
  *      frame gives every left row the most recent right payload;
  *   4. keep only left rows.
  *
  * Cost: ONE hash shuffle on the key (the window), same as any grouped
  * op — this is the formulation that survives 100 TB.
  *
  * Determinism: callers must ensure the right side has at most one row
  * per (key, time) — pre-dedup with EtlOps.dedupLatest otherwise
  * (DuckDB's ASOF JOIN is likewise unspecified under right-side ties).
  */
object AsOfJoin {

  /** `rightCols` are the right-side payload columns to attach, renamed
    * with `rightPrefix` in the output. Left columns pass through.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           rightCols: Seq[String], rightPrefix: String = "asof_"): DataFrame = {
    val payload = rightCols.map(c => s"$rightPrefix$c")
    val rTagged = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        rightCols.zip(payload).map { case (c, p) => col(c).as(p) }: _*)
    val leftCols = left.columns.toSeq
    val lTagged = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        payload.map(p => lit(null).cast(rTagged.schema(p).dataType).as(p)) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    // unionByName aligns the differing column orders; left-only columns
    // are null on right rows and dropped from them anyway
    val combined = rTagged.unionByName(lTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(combined) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.where(col("__side") === 1)
      .select(keys.map(col) ++ Seq(col("__t").as(leftTime)) ++
        leftCols.filterNot(c => keys.contains(c) || c == leftTime).map(col) ++
        payload.map(col): _*)
  }
}
