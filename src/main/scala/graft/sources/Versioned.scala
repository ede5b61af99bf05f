package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot tables — time travel over plain parquet
  * (extension: the reference's overwrites destroy history; a curation
  * pipeline needs "which corpus version did this model train on" to be
  * answerable forever).
  *
  * Layout: `<table>/v=<n>/` data directories plus a `_latest` pointer
  * file. A write lands its data COMPLETELY under the next `v=<n>` and
  * only then flips the pointer via atomic rename — readers resolve the
  * pointer first, so they always see a fully-written snapshot and are
  * never torn by an in-flight write (single writer per table; pair with
  * CatalogSinks-style locking if multiple drivers write one table).
  * Old versions stay readable until [[vacuum]] removes them — retention
  * is an explicit choice, not a side effect of the next write.
  */
object Versioned {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All committed version numbers, ascending (data dirs present,
    * whether or not the pointer reached them). */
  def versions(spark: SparkSession, table: String): Seq[Int] = {
    val root = new Path(table)
    val f = fs(spark, root)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toInt).sorted
  }

  /** Latest COMMITTED version (the pointer), if any. */
  def latestVersion(spark: SparkSession, table: String): Option[Int] = {
    val ptr = new Path(table, "_latest")
    val f = fs(spark, ptr)
    if (!f.exists(ptr)) None
    else {
      val in = f.open(ptr)
      try Some(scala.io.Source.fromInputStream(in).mkString.trim.toInt)
      finally in.close()
    }
  }

  /** Write `df` as the next snapshot; returns its version number. */
  def write(df: DataFrame, table: String): Int = {
    val spark = df.sparkSession
    val next = versions(spark, table).lastOption.getOrElse(0) + 1
    df.write.mode("errorifexists").parquet(s"$table/v=$next")
    val f = fs(spark, new Path(table))
    val tmp = new Path(table, s"_latest.tmp$next")
    val out = f.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    val ptr = new Path(table, "_latest")
    f.delete(ptr, false)
    if (!f.rename(tmp, ptr))
      throw new java.io.IOException(
        s"could not commit version pointer for $table v$next")
    next
  }

  /** Read a snapshot: the pinned `version`, or the latest committed. */
  def read(spark: SparkSession, table: String,
           version: Option[Int] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, table)).getOrElse(
      throw new IllegalArgumentException(
        s"$table has no committed version"))
    require(versions(spark, table).contains(v),
      s"$table has no version $v (have ${versions(spark, table)})")
    spark.read.parquet(s"$table/v=$v")
  }

  /** Row-level diff between two snapshots of a table, keyed by `keys`:
    * one row per difference with op ∈ {added, removed, changed}.
    * Non-key columns are compared as a canonical JSON struct (sorted
    * column order), so the diff is schema-generic; both versions must
    * share a column set. One full-outer hash join on the key — the
    * audit primitive for "what changed between the corpus my last
    * model saw and today's" at snapshot granularity. */
  def diff(spark: SparkSession, table: String, keys: Seq[String],
           vOld: Int, vNew: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val o = read(spark, table, Some(vOld))
    val n = read(spark, table, Some(vNew))
    require(o.columns.sorted.sameElements(n.columns.sorted),
      s"schema drift between v$vOld and v$vNew — diff needs one column set")
    val nonKey = o.columns.filterNot(keys.contains).sorted
    def pack(df: DataFrame, as: String) = df.select(
      keys.map(col) :+ to_json(struct(nonKey.map(col): _*)).as(as): _*)
    pack(o, "__o").join(pack(n, "__n"), keys, "full_outer")
      .withColumn("op",
        when(col("__o").isNull, "added")
          .when(col("__n").isNull, "removed")
          .when(col("__o") =!= col("__n"), "changed"))
      .where(col("op").isNotNull)
      .select(keys.map(col) :+ col("op"): _*)
  }

  /** Drop all versions older than `keepLast` (never the latest
    * committed); returns the dropped version numbers. */
  def vacuum(spark: SparkSession, table: String,
             keepLast: Int = 1): Seq[Int] = {
    require(keepLast >= 1, "must keep at least the latest version")
    val committed = latestVersion(spark, table)
    val vs = versions(spark, table)
    val drop = vs.dropRight(keepLast).filterNot(committed.contains)
    val f = fs(spark, new Path(table))
    drop.foreach(v => f.delete(new Path(table, s"v=$v"), true))
    drop
  }
}
