package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Corpus-level reporting operators: vocabulary construction and
  * per-language profiling — the summary passes a training-data pipeline
  * runs after cleaning to decide mixture weights and spot collapsed
  * strata.
  *
  * The reference has no aggregation beyond a scalar MAX
  * (SURVEY.md §2.5, common/SimpleDataCleanUtils.scala:19); these extend
  * its warehouse repertoire with the group-by shapes a corpus report
  * needs, built shuffle-minimal.
  */
object Corpus {

  /** Top-`k` whitespace tokens of lower(trim(text)) by corpus frequency,
    * with a total (cnt desc, token asc) ordering and a dense 1..k rank.
    *
    * Scale shape: explode → hash-aggregate benefits from map-side
    * partial combine (each task emits one row per DISTINCT token it
    * saw, not per occurrence), and the top-k is orderBy+limit — Spark
    * plans TakeOrderedAndProject, a per-partition heap of k followed by
    * a driver merge of n_partitions*k rows, never a global sort of the
    * full vocabulary. The row_number window then runs over only the k
    * survivors (single tiny partition by construction).
    */
  def topKVocab(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val counts = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    counts.orderBy(col("cnt").desc, col("token")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("token")))
          .cast("long"))
  }

  /** Overlapping token-window chunking — the RAG / embedding-prep step
    * that splits each document into `window`-token chunks every `stride`
    * tokens (overlap = window - stride). Chunk starts are 0, stride,
    * 2*stride, … up to the last start that still exposes a new token;
    * a document of ≤ window tokens yields exactly one chunk.
    *
    * Scale shape: entirely row-local — tokenize once, build the chunk
    * array with a codegen'd higher-order `transform`, posexplode. No
    * shuffle, no UDF; output rows carry (id, chunk_id, chunk, n_tok) so
    * downstream embedding can repartition however it likes.
    */
  def chunkDocs(docs: DataFrame, textCol: String, idCol: String,
                window: Int = 40, stride: Int = 30): DataFrame = {
    require(window > 0 && stride > 0,
      s"window/stride must be positive, got $window/$stride")
    require(stride <= window,
      s"stride $stride > window $window would silently skip tokens " +
        "between chunks — every token must land in at least one chunk")
    docs
      .select(col(idCol),
        split(lower(trim(col(textCol))), "\\s+").as("__ta"))
      .select(col(idCol),
        posexplode(expr(
          s"transform(sequence(0, greatest(0, " +
            s"CAST(ceil((size(__ta) - $window) / $stride.0) AS INT))), " +
            s"i -> array_join(slice(__ta, i*$stride + 1, $window), ' '))")))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        col("col").as("chunk"))
      .withColumn("n_tok", size(split(col("chunk"), " ")).cast("long"))
  }

  /** Per-language corpus profile: document count, total characters,
    * mean token count, and how many documents clear a minimum
    * length/token bar (the mixture-weight inputs). One hash aggregation
    * on the language key; every measure is a partial-aggregatable sum
    * or count, so the shuffle carries one row per (task, language).
    */
  def languageStats(docs: DataFrame, textCol: String,
                    langCol: String): DataFrame = {
    val t = col(textCol)
    docs.groupBy(col(langCol).as("lang")).agg(
      count(lit(1)).as("n_docs"),
      sum(length(t).cast("long")).as("sum_chars"),
      round(avg(TextFns.tokenCount(t)), 4).as("avg_tokens"),
      sum(when(length(t) >= 100 && TextFns.tokenCount(t) >= 15, 1L)
        .otherwise(0L)).as("n_substantial"))
  }
}
