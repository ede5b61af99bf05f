package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * PURE RELATIONAL aggregation — no custom aggregate needed, because
  * Spark's partial aggregation already is the sketch: projecting every
  * occurrence to its `depth × width` cell and hash-aggregating on
  * (depth, cell) means each task carries at most `d·w` counters through
  * the map-side combine, exactly the per-task state a hand-rolled
  * mergeable sketch would hold, and the final merge is the cell-wise
  * SUM — commutative and associative, so the sketch is bit-identical
  * under any partitioning, merge order, or retry (unlike Misra-Gries,
  * whose candidate TAIL is merge-order-dependent — see
  * [[graft.functions.native.HeavyHittersAgg]]; the two are
  * complementary: MG nominates a small candidate set, CM answers point
  * queries for ANY key with a one-sided error bound).
  *
  * Guarantee: `estimate(key) ≥ true_count(key)` always (each of the
  * `d` counters counts the key plus its colliders; min over depths
  * only removes collision noise), and
  * `estimate ≤ true + 2n/width` with probability `1 - 2^-depth`.
  *
  * Why this wins at 100 TB: a full `groupBy(key).count` over n-gram
  * streams shuffles the distinct-key universe (~the corpus itself).
  * The cell table shuffles at most `d·w` rows per task regardless of
  * universe size, and the finished sketch is a `d·w`-row table —
  * broadcastable — that answers any later point query without
  * touching the corpus again.
  *
  * Hashes are the portable md5-fold ([[TextFns.hash32]]) with the
  * depth index baked into the key, so the DuckDB oracle replays every
  * cell exactly.
  */
object Sketches {

  /** Row-local cell projection: for each input row, `depth` rows
    * `(d, cell)` with `cell = hash32("cm<d>:" || key) % width`.
    */
  private def cellsOf(keyCol: String, depth: Int, width: Int) =
    explode(array((0 until depth).map { d =>
      struct(lit(d).as("d"),
        (TextFns.hash32(concat(lit(s"cm$d:"), col(keyCol))) %
          width).as("cell"))
    }: _*))

  /** Build the `(d, cell, cnt)` Count-Min cell table over the
    * occurrence stream in `stream(keyCol)`. One hash aggregation;
    * map-side combine bounds every task's output at `depth·width`
    * rows.
    */
  def countMinTable(stream: DataFrame, keyCol: String,
                    depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2,
      s"need depth >= 1 and width >= 2, got d=$depth w=$width")
    stream.select(cellsOf(keyCol, depth, width).as("dc"))
      .groupBy(col("dc.d").as("d"), col("dc.cell").as("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for the keys in `probes(keyCol)`: min over the
    * `depth` rows of the key's cell count. The sketch is `d·w` rows —
    * broadcast — so probing never shuffles the probe side. A cell no
    * probe key ever incremented can still exist (colliders only), and
    * a key whose cells all happen to be absent estimates 0; both fall
    * out of the same `coalesce`.
    */
  def cmEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
                 depth: Int, width: Int): DataFrame =
    probes.select(col(keyCol), cellsOf(keyCol, depth, width).as("dc"))
      .select(col(keyCol), col("dc.d").as("d"), col("dc.cell").as("cell"))
      .join(broadcast(sketch), Seq("d", "cell"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))

  /** Merge Count-Min cell tables built with the SAME (depth, width):
    * cell-wise sum — the linearity that makes the sketch incremental
    * (sketch(old ∪ delta) = merge(sketch(old), sketch(delta)), exactly,
    * so a maintained sketch table absorbs each new batch with O(d·w)
    * work and NEVER re-reads history; [[SketchesSpec]] proves the
    * hash-equality, x_count_min_incr gates it end to end).
    */
  def mergeCm(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch to merge")
    sketches.reduce(_.unionByName(_))
      .groupBy(col("d"), col("cell"))
      .agg(sum(col("cnt")).as("cnt"))
  }
}
