package graft.sources

import org.apache.spark.sql.DataFrame

/** The reference's three write-commit semantics (SURVEY.md §2.2), re-based
  * from Hive tables onto partitioned parquet:
  *
  *  - K1 append-into-partitioned (reference SimpleDataCleanUtils.scala:30,
  *    OrderMasterDataClean.scala:190: `SaveMode.Append` + `insertInto`)
  *  - K2 dynamic-partition overwrite (reference
  *    CustomerInfDataClean.scala:70-88: `INSERT OVERWRITE … PARTITION
  *    (etl_date)` with hive.exec.dynamic.partition.mode=nonstrict) —
  *    only the partitions present in the incoming data are replaced
  *  - K3 full overwrite (reference CustomerAddrLevelAggrDataClean.scala:41-44:
  *    `Overwrite.partitionBy(…).saveAsTable`) — table dropped and rebuilt
  *
  * Scale notes: all three are executor-parallel file writes with no extra
  * shuffle; K2's dynamic mode is the one that matters at 100 TB — an
  * etl_date reload rewrites one date directory, not the table.
  */
object Sinks {

  def appendPartitioned(df: DataFrame, path: String,
                        partCols: Seq[String]): Unit =
    df.write.mode("append").partitionBy(partCols: _*).parquet(path)

  /** Replaces only the partitions present in `df` (K2). The option is
    * per-write, so no session-level config mutation is needed. */
  def overwriteDynamicPartitions(df: DataFrame, path: String,
                                 partCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*).parquet(path)

  /** Drops and rebuilds the whole target (K3). */
  def overwriteAll(df: DataFrame, path: String,
                   partCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

  /** Append with rows sorted inside each task on `sortCols` — parquet
    * row-group min/max stats become tight, so later range/equality
    * filters on those columns prune row groups instead of scanning them.
    * No extra shuffle: sortWithinPartitions is a per-task sort.
    */
  def appendPartitionedSorted(df: DataFrame, path: String,
                              partCols: Seq[String],
                              sortCols: Seq[String]): Unit =
    df.sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("append").partitionBy(partCols: _*).parquet(path)

  /** Small-file compaction: rewrite a parquet table into files of
    * roughly `targetFileMB` each. Streaming/micro-batch ingestion and
    * fine-grained dynamic partitions accumulate small files that poison
    * scan parallelism and NameNode-style metadata at scale; periodic
    * compaction is the standard remedy. The rewrite goes through a
    * temporary directory, then atomically swaps via rename.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetFileMB: Int = 128): Unit = {
    val src = new java.io.File(path)
    require(src.exists(), s"no table at $path")
    val bytes = java.nio.file.Files.walk(src.toPath)
      .filter(p => p.toString.endsWith(".parquet"))
      .mapToLong(p => p.toFile.length()).sum()
    val nFiles = math.max(1, (bytes / (targetFileMB * 1024L * 1024L)).toInt)
    val df = spark.read.parquet(path).coalesce(nFiles)
      .localCheckpoint(true) // materialize before deleting the source
    val tmp = path + "__compact_tmp"
    df.write.mode("overwrite").parquet(tmp)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(src)
    new java.io.File(tmp).renameTo(src)
    ()
  }
}
