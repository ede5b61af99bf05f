package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Label-aggregation operators for annotated / weakly-supervised data:
  * collapse many (item, annotator, label) rows into one adjudicated
  * label per item — the preference-data and classifier-label cleaning
  * stage of a training pipeline (majority vote with a deterministic
  * tie-break, plus the agreement signal reviewers monitor).
  *
  * Scale shape: one hash aggregation on (item, label) with map-side
  * partial counts, then window functions over the per-item label counts
  * — the wide annotation table never feeds a window directly, so per-item
  * state is bounded by the LABEL ALPHABET, not the annotator count
  * (10^9 items × 100 annotators shuffles 10^9 × |labels| count rows).
  */
object Labels {

  /** Majority-vote adjudication: for every item, the label with the most
    * votes; ties break to the lexicographically SMALLEST label so the
    * result is deterministic and engine-portable (no "first seen wins",
    * which depends on partitioning).
    *
    * Returns (itemCol, label, votes, n_annotations, agreement) where
    * agreement = votes / n_annotations rounded to 4 decimals — the
    * per-item inter-annotator agreement signal (1.0 = unanimous).
    */
  def majorityVote(annotations: DataFrame, itemCol: String,
                   labelCol: String): DataFrame = {
    val counts = annotations.groupBy(col(itemCol), col(labelCol))
      .agg(count(lit(1)).as("votes"))
    val perItem = Window.partitionBy(col(itemCol))
    val rank = Window.partitionBy(col(itemCol))
      .orderBy(col("votes").desc, col(labelCol).asc)
    counts
      .withColumn("n_annotations", sum(col("votes")).over(perItem))
      .withColumn("__rk", row_number().over(rank))
      .where(col("__rk") === 1)
      .select(col(itemCol), col(labelCol).as("label"), col("votes"),
        col("n_annotations"),
        round(col("votes").cast("double") /
          col("n_annotations").cast("double"), 4).as("agreement"))
  }

  /** Items whose adjudication is too contested to trust: agreement below
    * `minAgreement` (route to re-annotation, not training). */
  def contested(annotations: DataFrame, itemCol: String, labelCol: String,
                minAgreement: Double): DataFrame =
    majorityVote(annotations, itemCol, labelCol)
      .where(col("agreement") < minAgreement)
}
