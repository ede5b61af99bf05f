package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics beyond connected components
  * ([[Dedup.connectedComponents]]): triangle counting — the
  * clustering-coefficient / community-density signal over similarity
  * and co-occurrence graphs.
  *
  * Scale shape: edges are canonicalized (a < b, distinct) so each
  * undirected edge exists once and every triangle x<y<z is counted
  * exactly once by the two-join wedge plan: e1(x,y) ⋈ e2(y,z) on the
  * middle vertex, then a semi-check against e3(x,z). Both are hash
  * equi-joins on edge keys; intermediate size is the wedge count
  * Σ_v in(v)·out(v) of the id-acyclic orientation — bounded for the
  * near-dup and co-occurrence graphs this library builds (hub-heavy
  * graphs would orient by (degree, id) instead, which provably
  * minimizes wedges; AQE's skew split covers the residual hot keys).
  * Nothing is collected; per-node counts are one explode + aggregate.
  */
object Graph {

  /** Canonical distinct undirected edge set (a < b, loops dropped). */
  def canonicalEdges(edges: DataFrame, aCol: String,
                     bCol: String): DataFrame =
    edges.select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") < col("b"))
      .distinct()

  /** One row per triangle, as the ordered vertex triple x < y < z. */
  def triangles(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = canonicalEdges(edges, aCol, bCol)
    val e1 = e.select(col("a").as("x"), col("b").as("y"))
    val e2 = e.select(col("a").as("y"), col("b").as("z"))
    val e3 = e.select(col("a").as("x"), col("b").as("z"))
    e1.join(e2, "y").join(e3, Seq("x", "z"), "left_semi")
      .select(col("x"), col("y"), col("z"))
  }

  /** Per-node triangle participation: (node, n_tri) for every node in
    * at least one triangle. */
  def triangleCounts(edges: DataFrame, aCol: String,
                     bCol: String): DataFrame =
    triangles(edges, aCol, bCol)
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
}
