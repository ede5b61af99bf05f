package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Deterministic hash-sharded training-data export (extension; the
  * reference's sinks are catalog tables, SURVEY §2.2 — this is the
  * "write N stable shards for the trainer" step that follows curation).
  *
  * The shard follows the ROW CONTENT (portable 32-bit hash of a chosen
  * column, mod nShards), not row order, partitioning, or an RNG seed —
  * re-running the export over a re-ingested, differently-partitioned
  * copy of the corpus lands every document in the same shard, which is
  * what makes downstream training jobs resumable and cache-friendly.
  *
  * Scale shape: one hash repartition ON THE SHARD KEY aligns write
  * tasks with shard directories (each task writes whole shards, not a
  * sliver of every shard — nShards files total, not nShards × nTasks);
  * at 100 TB raise nShards, not files-per-shard. The return value is
  * read back FROM THE WRITTEN FILES so callers (and the oracle gate)
  * verify the sink, not the plan.
  */
object ShardExport {

  def writeSharded(df: DataFrame, hashCol: String, nShards: Int,
                   path: String): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    df.withColumn("shard", TextFns.hash32(col(hashCol)) % nShards)
      .repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Generic per-shard manifest of an exported directory: row count per
    * shard, from the written files. */
  def manifest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"))
}
