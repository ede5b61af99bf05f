package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch perceptron training (Rosenblatt 1958; the batch form of
  * Minsky & Papert's convergence setting) in EXACT INTEGER arithmetic
  * — the supervised sibling of the integer-PCA lane, and the trainable
  * core of a model-based quality screen (the filter family behind
  * classifier-curated corpora).
  *
  * Update rule per round over integer features x and labels y ∈ {−1,+1}:
  *   M_r   = { i : y_i · (w_r · x_i) ≤ 0 }      (margin-0 counts as miss)
  *   w_r+1 = w_r + Σ_{i∈M_r} y_i · x_i
  * Everything is a long: features are integer text statistics, labels
  * are ±1, the update is a sum of products — so the oracle replays the
  * rounds bit-for-bit with no quantization step at all (unlike the LM
  * lane's micro-nat floors, there is nothing transcendental here).
  *
  * Scale shape: the feature relation is computed once and persisted;
  * each round is ONE scan with a d+1-scalar aggregate (the
  * misclassified-set gradient and its count) collected to the driver —
  * the documented O(KB-per-round) bounded-collect pattern shared with
  * the BPE/unigram/PCA trainers. The weight vector never lives in the
  * plan as state; it re-enters each round as literals, so the per-round
  * job is embarrassingly parallel and shuffle-free up to the final
  * partial-aggregate exchange.
  *
  * Overflow bound (caller's contract, mirrored by the oracle): after R
  * rounds |w_j| ≤ R · Σ_i |x_ij|, and margins are bounded by
  * d · max|w| · max|x| — keep R · N · max|x|² below 2⁶³ (at the tested
  * scales: ≤ 10⁴ docs × 10³-bounded features × 8 rounds ≈ 2⁴⁷).
  *
  * Reference scope note: the reference repo (bigdata-scala-offline-
  * data-clean) has no ML training machinery; this extends the
  * training-data-pipeline surface (model-based quality filtering).
  */
object Perceptron {

  private def dot(w: Seq[Long], featCols: Seq[String]): Column =
    featCols.zip(w).map { case (f, wj) => col(f) * lit(wj) }
      .reduce(_ + _)

  /** Train `rounds` batch-perceptron rounds over integer feature
    * columns and a ±1 long label column. Returns one row per round:
    * (round, n_mis, w_1..w_d) — n_mis counted under the PRE-update
    * weights, w the POST-update vector (so round 1's n_mis is the
    * whole corpus under w = 0: zero margin counts as a miss).
    *
    * NULL CONTRACT: a row with a null label or any null feature has a
    * null margin, which is neither ≤ 0 nor > 0 — SQL three-valued
    * logic silently excludes it from both the miss count and the
    * gradient, exactly as the oracle's FILTER clauses do. Feed
    * null-free features (the fixture's token statistics never null);
    * rows you want ignored are better dropped explicitly. */
  def train(features: DataFrame, labelCol: String, featCols: Seq[String],
            rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
      s"rounds must be 1..16, got $rounds")
    require(featCols.nonEmpty, "need at least one feature column")
    val spark = features.sparkSession
    val d = featCols.length
    val f = features
      .select((labelCol +: featCols).map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      f.count()
      var w = Seq.fill(d)(0L)
      val out = scala.collection.mutable
        .ArrayBuffer.empty[(Long, Long, Seq[Long])]
      for (r <- 1 to rounds) {
        val miss = col(labelCol) * dot(w, featCols) <= 0L
        val aggs = count(when(miss, 1)).cast("long").as("n_mis") +:
          featCols.zipWithIndex.map { case (fc, j) =>
            coalesce(sum(when(miss, col(labelCol) * col(fc))), lit(0L))
              .cast("long").as(s"g$j")
          }
        val row = f.agg(aggs.head, aggs.tail: _*).collect()(0)
        val nMis = row.getLong(0)
        w = w.zipWithIndex.map { case (wj, j) => wj + row.getLong(j + 1) }
        out += ((r.toLong, nMis, w))
      }
      import spark.implicits._
      val cols = col("round") +: col("n_mis") +:
        (0 until d).map(j => col("w")(j).as(s"w${j + 1}"))
      out.toSeq.map { case (r, nMis, wv) => (r, nMis, wv) }
        .toDF("round", "n_mis", "w")
        .select(cols: _*)
    } finally { f.unpersist(false); () }
  }

  /** Score a feature relation under a trained weight vector:
    * every input column, plus the integer margin `score = w · x` and
    * `predicted` ∈ {−1,+1} (zero margin predicts −1, matching the
    * trainer's margin-0-is-a-miss convention). */
  def score(features: DataFrame, featCols: Seq[String],
            weights: Seq[Long]): DataFrame = {
    require(weights.length == featCols.length,
      s"${weights.length} weights for ${featCols.length} features")
    features
      .withColumn("score", dot(weights, featCols))
      .withColumn("predicted",
        when(col("score") > 0L, 1L).otherwise(-1L))
  }
}
