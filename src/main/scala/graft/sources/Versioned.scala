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

  /** The writer-supplied note committed with version `v` (e.g. the
    * streaming batch id that produced it), if one was given. */
  def note(spark: SparkSession, table: String, v: Int): Option[String] = {
    val p = new Path(s"$table/v=$v", "_graft_note")
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(scala.io.Source.fromInputStream(in).mkString)
      finally in.close()
    }
  }

  /** Write `df` as the next snapshot; returns its version number.
    * `note` (if given) lands inside the version directory BEFORE the
    * pointer flips, so it commits atomically with the version — the
    * hook idempotent refreshers key on (continuousAggMaintenance
    * stores the micro-batch id here). The flip itself is a
    * rename-with-overwrite through FileContext: atomic where the
    * filesystem supports it, and never a delete-then-rename window
    * where a latest-read could find no pointer at all. */
  def write(df: DataFrame, table: String,
            note: Option[String] = None): Int = {
    val spark = df.sparkSession
    val next = versions(spark, table).lastOption.getOrElse(0) + 1
    df.write.mode("errorifexists").parquet(s"$table/v=$next")
    val f = fs(spark, new Path(table))
    note.foreach { n =>
      val p = new Path(s"$table/v=$next", "_graft_note")
      val out = f.create(p, true)
      try out.write(n.getBytes("UTF-8")) finally out.close()
    }
    val tmp = new Path(table, s"_latest.tmp$next")
    val out = f.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    val ptr = new Path(table, "_latest")
    org.apache.hadoop.fs.FileContext
      .getFileContext(ptr.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    next
  }

  /** Read a snapshot: the pinned `version`, or the latest committed.
    * Pinned reads are validated against the COMMITTED horizon (the
    * pointer), not the directory listing — a crash-orphaned v=<n> data
    * dir beyond the pointer is unreadable, never a torn result. */
  def read(spark: SparkSession, table: String,
           version: Option[Int] = None): DataFrame = {
    val latest = latestVersion(spark, table)
    val v = version.orElse(latest).getOrElse(
      throw new IllegalArgumentException(
        s"$table has no committed version"))
    require(latest.exists(v <= _),
      s"$table has no COMMITTED version $v (committed horizon: " +
        s"${latest.getOrElse(0)}; a data dir past it is an uncommitted " +
        "orphan)")
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
