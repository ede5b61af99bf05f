package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering — the layout lever for
  * scans that filter on SEVERAL high-cardinality keys at once, where
  * single-key range clustering (sources.ClusteredWrite) only prunes on
  * its one key. Interleaving the key bits gives one linear order with
  * 2-D/3-D locality: a box predicate touches a bounded set of z-ranges,
  * so per-file min/max footer stats still skip most files (the
  * technique behind Delta/Iceberg OPTIMIZE ZORDER).
  *
  * The z-value is plain integer bit arithmetic — engine-exact, no
  * normalization pass — so keys must be non-negative and fit in `bits`
  * bits (callers with arbitrary domains rank-normalize first; the
  * testdata keys are dense ids where raw bits are already balanced).
  */
object ZOrder {

  /** Interleaved bit value: bit j of column c lands at z-bit
    * j*n + c, for `bits` bits per column. n*bits must stay < 63. */
  def zValue(cols: Seq[Column], bits: Int = 21): Column = {
    val n = cols.length
    require(n >= 2, "z-ordering needs at least two columns")
    require(n * bits < 63, s"$n cols × $bits bits overflows a long")
    val terms = for {
      i <- 0 until bits
      (c, ci) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)),
      i * n + ci)
    terms.reduce(_ + _)
  }

  /** Range-cluster `df` on the interleaved z-value of `zCols` (the
    * z column is kept in the output for audit/pruning inspection). */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    partitions: Int, bits: Int = 21): DataFrame =
    graft.sources.ClusteredWrite.writeClustered(
      df.withColumn("z", zValue(zCols.map(col), bits)),
      path, Seq("z"), partitions)
}
