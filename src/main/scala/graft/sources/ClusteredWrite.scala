package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Cluster-by write layout for scan pruning — the storage-side lever
  * the reference's date-partitioned Hive tables use for ONE column
  * (directory partitioning, SimpleDataCleanUtils.scala:19) generalized
  * to any sortable key at file/row-group granularity.
  *
  * `repartitionByRange` gives every output file a narrow, pairwise
  * disjoint range of the cluster key (equal keys land in one
  * partition), and `sortWithinPartitions` orders rows inside each file
  * so every parquet ROW GROUP carries tight min/max stats. A later scan
  * with a range or point predicate on the cluster key then skips whole
  * files and row groups from footer stats alone — at 100 TB this is
  * the difference between reading a date slice and reading the table.
  * Directory partitioning stays the right tool for low-cardinality
  * keys; clustering covers the high-cardinality ones (timestamps, ids)
  * where one-directory-per-value would melt the metastore.
  *
  * The range boundaries come from Spark's reservoir sample, so FILE
  * SIZES are approximate — content, clustering, and the skipping
  * guarantee are exact regardless of the sample.
  */
object ClusteredWrite {

  def writeClustered(df: DataFrame, path: String, clusterCols: Seq[String],
                     partitions: Int): DataFrame = {
    require(clusterCols.nonEmpty, "need at least one cluster column")
    require(partitions > 0, s"partitions must be positive, got $partitions")
    df.repartitionByRange(partitions, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
