package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Catalog-managed table commits — the reference's actual write path.
  * [[Sinks]] re-bases the same three semantics onto parquet paths; these
  * are the table-identity forms, committed through the session catalog
  * (a local `spark.sql.warehouse.dir`; no Hive metastore needed):
  *
  *  - K1 `insertInto` append (reference common/SimpleDataCleanUtils.scala:30)
  *    — POSITIONAL column resolution; see [[alignTo]] for the hazard.
  *  - K2 SQL `INSERT OVERWRITE … PARTITION (p)` dynamic overwrite
  *    (reference handler/CustomerInfDataClean.scala:70-88).
  *  - K3 `saveAsTable(Overwrite).partitionBy(…)` drop-and-rebuild
  *    (reference handler/CustomerAddrLevelAggrDataClean.scala:41-44).
  *
  * Scale note: all three remain executor-parallel file commits; the
  * catalog adds table identity (readers resolve by name, schema is
  * authoritative — partition-column types don't fall back to directory
  * inference). At 100 TB the catalog write is the same bytes as the path
  * write plus a metastore RPC.
  */
object CatalogSinks {

  /** K1: positional append through the catalog. `insertInto` matches
    * columns BY POSITION against the table schema — the reference's A-2
    * hazard (SURVEY §7.4): a reordered DataFrame writes values into the
    * wrong columns with no error if types line up. Callers should pass
    * the frame through [[alignTo]] first; CatalogSpec demonstrates both
    * the hazard and the guard.
    */
  def insertIntoAppend(df: DataFrame, table: String): Unit =
    df.write.mode("append").insertInto(table)

  /** Reorder `df`'s columns into `table`'s schema order BY NAME — the
    * guard that turns positional `insertInto` into by-name semantics.
    */
  def alignTo(spark: SparkSession, table: String, df: DataFrame): DataFrame =
    df.select(spark.table(table).schema.fieldNames.map(col): _*)

  /** K3: drop and rebuild a partitioned managed table.
    *
    * An in-memory session catalog forgets tables across JVMs while the
    * warehouse directory persists, so a rebuild in a NEW session would
    * see CREATE + existing location and refuse. A managed-table rebuild
    * means "this table's identity survives, its data doesn't": reclaim
    * an orphaned location (known path: warehouse/<table>) before
    * writing. With a persistent metastore the DROP alone covers it.
    */
  def saveAsTableOverwrite(df: DataFrame, table: String,
                           partCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      // the orphan-reclaim path derivation only holds for unqualified
      // names: db.tbl lives at warehouse/<db>.db/tbl, and deleting
      // warehouse/"db.tbl" would miss it (or hit an unrelated dir)
      require(!table.contains("."),
        s"saveAsTableOverwrite reclaims warehouse/<table> for orphaned " +
          s"locations and supports only unqualified table names; got " +
          s"'$table' — qualify the session's current database instead")
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      val loc = new org.apache.hadoop.fs.Path(
        s"$warehouse/${table.toLowerCase(java.util.Locale.ROOT)}")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) {
        // delete only what LOOKS like an abandoned table directory (a
        // Spark-written table root carries _SUCCESS); anything else at
        // that path is not ours to destroy
        if (fs.exists(new org.apache.hadoop.fs.Path(loc, "_SUCCESS")))
          fs.delete(loc, true)
        else throw new IllegalStateException(
          s"refusing to reclaim $loc for table $table: the directory " +
            "exists but does not look like a previously-written table " +
            "(no _SUCCESS marker) — remove it manually if it is stale")
      }
    }
    df.write.mode("overwrite").partitionBy(partCols: _*).saveAsTable(table)
  }

  private val overwriteModeLock = new Object

  /** Cross-PROCESS commit lock for a table: an exclusive marker file
    * next to the warehouse location, acquired with the filesystem's
    * atomic create-if-absent. Two separate drivers dynamically
    * overwriting the same table would otherwise interleave their
    * file commits (the in-JVM `overwriteModeLock` can't see another
    * process); the reference has the same hole.
    *
    * Liveness: a holder that died mid-commit leaves its lock behind, so
    * a lock older than `staleMs` is broken (deleted and re-contended).
    * The break itself has the classic lock-file caveat — two waiters can
    * both observe staleness and race the re-create; the window is one
    * create call and the loser keeps waiting, which is the standard
    * trade-off short of a real lock service.
    */
  private def acquireTableLock(spark: SparkSession, table: String,
                               waitMs: Long, staleMs: Long): (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val lock = new org.apache.hadoop.fs.Path(
      s"$warehouse/.graft_commit_lock_${table.toLowerCase(java.util.Locale.ROOT)}")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deadline = System.currentTimeMillis() + waitMs
    var acquired = false
    while (!acquired) {
      acquired =
        try fs.createNewFile(lock)
        catch { case _: java.io.IOException => false }
      if (!acquired) {
        val mtime =
          try Some(fs.getFileStatus(lock).getModificationTime)
          catch { case _: java.io.FileNotFoundException => None }
        mtime match {
          case Some(t) if System.currentTimeMillis() - t > staleMs =>
            fs.delete(lock, false); () // stale holder died — break it
          case _ =>
            if (System.currentTimeMillis() > deadline)
              throw new IllegalStateException(
                s"could not acquire commit lock $lock within ${waitMs}ms — " +
                  s"another driver is overwriting $table; if its process " +
                  s"died, the lock breaks after ${staleMs}ms, or delete " +
                  "the file manually")
            Thread.sleep(100)
        }
      }
    }
    (fs, lock)
  }

  /** K2: dynamic-partition overwrite via SQL INSERT OVERWRITE — only the
    * partitions present in `df` are replaced. Needs the session-level
    * dynamic mode for the duration of the statement (the SQL path has no
    * per-write option); the previous value is restored.
    *
    * The set/execute/restore window is serialized across THIS API's
    * callers (a concurrent second call could otherwise read the other
    * call's "dynamic" as the value to restore, or worse run its INSERT
    * after the first restore flipped the session back to static — and a
    * static INSERT OVERWRITE with a dynamic spec drops EVERY partition
    * of the table). Other code mutating the same session conf in
    * parallel remains a Spark-session-level hazard this API cannot see.
    */
  def insertOverwritePartitions(spark: SparkSession, df: DataFrame,
                                table: String, partCol: String,
                                lockWaitMs: Long = 120000L,
                                lockStaleMs: Long = 600000L): Unit = overwriteModeLock.synchronized {
    // JVM lock first (cheap, serializes this session's callers), then
    // the cross-process lock file (two drivers on one warehouse)
    val (lockFs, lock) = acquireTableLock(spark, table, lockWaitMs, lockStaleMs)
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    // unique per call and dropped after: a fixed view name would
    // collide across concurrent/nested uses and pollute the catalog
    val view = s"graft_insert_src_${java.util.UUID.randomUUID()
      .toString.replace("-", "")}"
    try {
      // positional resolution again: feed columns in table-schema order
      alignTo(spark, table, df).createOrReplaceTempView(view)
      spark.sql(
        s"INSERT OVERWRITE TABLE $table PARTITION ($partCol) " +
          s"SELECT * FROM $view")
      ()
    } finally {
      spark.catalog.dropTempView(view)
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      lockFs.delete(lock, false)
      ()
    }
  }
}
