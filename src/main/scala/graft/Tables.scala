package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet testdata (TESTDATA.md).
  *
  * Stand-in for the reference's Hive-metastore catalog scans
  * (reference common/SimpleDataCleanUtils.scala:19-20,
  * handler/CustomerAddrLevelAggrDataClean.scala:23-25): each table is a
  * parquet directory; Catalyst still gets full pushdown/pruning because
  * the read is declarative.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet stores TIMESTAMP(NANOS) which Spark's parquet reader
    // rejects; read nanos as raw BIGINT instead. Set at runtime so it
    // applies no matter how the session was built (driver-owned Verify /
    // Bench sessions included). BIGINT nanos is also exactly DuckDB's
    // epoch_ns(ts) — total-order parity with the oracle at full precision.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Native expressions ride along on every load so each query path
    // (driver sessions included) can resolve them. Idempotent.
    graft.functions.native.NativeFns.register(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view so `spark.sql` works against the
    * same names DuckDB sees (mirrors reference S1/S2 catalog access).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    All.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
