package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) joins, expressed as equi-joins on time buckets.
  *
  * A naive `l JOIN r ON r.ts BETWEEN l.ts - W AND l.ts` has no equi key
  * for the time predicate: Spark plans it as a broadcast nested-loop or
  * a per-key sort with full range scan — both collapse at 100 TB. The
  * standard fix is banding: bucket both sides by `floor(ts / W)`; every
  * right row lands in exactly one bucket, and a left row's window can
  * only overlap its own bucket and the previous one, so exploding the
  * left side to those two bucket keys turns the range join into a hash
  * equi-join on (key, bucket) with an exact residual predicate. Work is
  * O(rows in adjacent buckets), and the bucket key shards skewed keys
  * across time.
  */
object RangeJoin {

  /** For every left row, aggregate right rows of the same `keyCols` whose
    * `rTs` lies in [lTs - windowNs, lTs): count + max timestamp. Left
    * rows with no match are kept (count 0). Both ts columns are epoch
    * nanos (BIGINT).
    */
  def countInWindow(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                    lTs: String, rTs: String, lId: String,
                    windowNs: Long): DataFrame = {
    val keyEx: Seq[Column] = keyCols.map(col)
    // integer `div`, not double division: epoch nanos exceed double's 53
    // significand bits, and a lossy quotient could misplace a boundary
    // row by one bucket
    val l = left.withColumn("__lb", expr(s"$lTs div ${windowNs}L"))
      .withColumn("__b", explode(array(col("__lb") - 1, col("__lb"))))
    val r = right
      .select(keyEx :+ col(rTs).as("__rts"): _*)
      .withColumn("__b", expr(s"__rts div ${windowNs}L"))
    val joined = l.join(r, keyCols :+ "__b", "left")
    val inWin = col("__rts").isNotNull &&
      col("__rts") >= col(lTs) - windowNs && col("__rts") < col(lTs)
    joined
      .groupBy((keyEx :+ col(lId) :+ col(lTs)): _*)
      .agg(sum(when(inWin, 1L).otherwise(0L)).as("n_in_window"),
        max(when(inWin, col("__rts"))).as("last_ts_in_window"))
  }
}
