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
    // The library-wide contract for the event stream is ts as BIGINT
    // epoch-NANOS — exactly DuckDB's epoch_ns(ts), so every oracle
    // compares the full value. Earlier testdata stored TIMESTAMP(NANOS),
    // which older Spark read as BIGINT under
    // spark.sql.legacy.parquet.nanosAsLong (kept: harmless where inert);
    // current testdata stores timestamp[us], which Spark 4.1.2 reads as
    // TIMESTAMP_NTZ — converted back to BIGINT nanos below (micros*1000
    // is exact; DuckDB's epoch_ns performs the identical widening).
    // Date-valued columns in the TPC-H tables stay timestamps: only the
    // event stream carries the nanos contract.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ->timestamp cast reads the session clock: pin UTC (the
    // timezone every main/spec/oracle already runs) so a caller-owned
    // session with a different zone cannot shift ts.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // Native expressions ride along on every load so each query path
    // (driver sessions included) can resolve them. Idempotent.
    graft.functions.native.NativeFns.register(spark)
    // Likewise the sargable-regex optimizer rule (itself idempotent,
    // but don't stack registrations on repeated loads)
    if (!spark.experimental.extraOptimizations
          .contains(graft.plans.RegexPrefixPruning))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.RegexPrefixPruning
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name != "events") raw
    else raw.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
        f.name
    }.foldLeft(raw) { (d, c) =>
      d.withColumn(c, org.apache.spark.sql.functions
        .unix_micros(org.apache.spark.sql.functions.col(c)
          .cast("timestamp")) * 1000L)
    }
  }

  /** Register every table as a temp view so `spark.sql` works against the
    * same names DuckDB sees (mirrors reference S1/S2 catalog access).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    All.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
