package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Eager-materialization strategies for operators that must pin an
  * intermediate result — iterative algorithms that truncate their
  * lineage every round (connected components) and pipelines whose
  * output feeds several consumers (the MinHash verified-pair list).
  *
  * The strategy choice is exactly the 100 TB durability trade-off:
  *
  *  - [[MatStrategy.Local]] — `localCheckpoint`: executor-local,
  *    NON-replicated blocks. Fastest (no DFS round-trip), right for
  *    bounded intra-job state that a retry can rebuild from scratch —
  *    but one lost executor kills the job, so it is NOT the shape for a
  *    1000-executor run.
  *  - [[MatStrategy.Reliable]] — RDD checkpoint into
  *    `sc.setCheckpointDir` (any Hadoop scheme). Survives executor loss;
  *    the standard choice for long iterative jobs on a real cluster.
  *  - [[MatStrategy.Spill]] — parquet round-trip through a directory on
  *    any Hadoop filesystem. Durable AND columnar (later consumers get
  *    pushdown/pruning against the spill), and the files outlive the
  *    Spark session — the right shape when the materialized result
  *    escapes the operator (returned to a caller who will run further
  *    actions on it).
  *  - [[MatStrategy.Default]] — a per-session spill root on the
  *    session's DEFAULT Hadoop filesystem (local temp dir on a laptop,
  *    a `/tmp` dir on the cluster DFS under `fs.defaultFS`), removed on
  *    JVM exit. A hard-coded driver-local temp dir would break on a
  *    real cluster: executors would each write their tasks to their own
  *    local disks.
  *
  * Every materialization returns a [[Materialized]] handle whose
  * `release()` frees the backing storage (unpersists blocks / deletes
  * checkpoint or spill files). Operators that return a plain DataFrame
  * use [[MatStrategy.Default]] so NO RDD blocks outlive the call —
  * `sc.getPersistentRDDs` stays empty (asserted in LeakSpec).
  */
sealed trait MatStrategy

object MatStrategy {
  case object Local extends MatStrategy
  case object Reliable extends MatStrategy
  final case class Spill(dir: String) extends MatStrategy

  /** No materialization: hand back the lazy frame with a no-op release.
    * For callers that want the OPERATOR'S full plan — composing it into
    * a larger pipeline Catalyst should optimize end to end, or
    * asserting plan shape in tests — and accept recomputation on every
    * action in exchange. */
  case object PassThrough extends MatStrategy

  /** Spill to a per-session default root resolved against the session's
    * default filesystem at materialization time (see class doc).
    */
  case object Default extends MatStrategy

  /** Per-JVM LOCAL spill root (deleted on JVM exit) — for tests and
    * explicitly-local runs; [[Default]] is the deployment-safe choice.
    */
  lazy val spillDefault: Spill = {
    val dir = java.nio.file.Files.createTempDirectory("graft-spill")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(dir.toFile)
    }))
    Spill(dir.toString)
  }
}

/** An eagerly-computed DataFrame plus the action that frees its backing
  * storage. `release()` is idempotent; after it, `df` must not be used.
  */
final case class Materialized(df: DataFrame, release: () => Unit)

object Materialize {

  private val counter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Guards the registry/listing diffs below: without it, two threads
    * materializing on the same session would each capture the OTHER's
    * newly-registered storage and release() could free a live peer.
    * Materializations are coarse-grained (an eager checkpoint each), so
    * serializing them costs little next to the work they pin.
    */
  private val trackingLock = new Object

  /** Default spill root per (JVM, default filesystem): a temp dir on
    * the session's `fs.defaultFS` so executor tasks of a real cluster
    * write somewhere every node can read. Deleted on JVM exit.
    */
  private val defaultRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]
  private def defaultSpillRoot(spark: SparkSession): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fsUri = org.apache.hadoop.fs.FileSystem.getDefaultUri(conf).toString
    defaultRoots.computeIfAbsent(fsUri, _ => {
      val fs = org.apache.hadoop.fs.FileSystem.get(conf)
      if ("file".equalsIgnoreCase(fs.getScheme)) {
        MatStrategy.spillDefault.dir
      } else {
        val root = new Path(
          s"/tmp/graft-spill-${java.util.UUID.randomUUID().toString}")
        fs.mkdirs(root)
        // register with Hadoop's ShutdownHookManager ABOVE the
        // FileSystem-close priority (10): a plain JVM hook races the
        // FS finalizer and "Filesystem closed" would leak the DFS dir
        org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
          new Runnable {
            override def run(): Unit =
              try { fs.delete(root, true); () }
              catch { case _: Throwable => () }
          }, 50)
        root.toString
      }
    })
  }

  /** File sources relax nullability on read; mirror that in the schema
    * handed to the spill read (StructType.asNullable is private[sql]).
    */
  private def relaxNullability(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = relaxNullability(f.dataType), nullable = true)))
      case a: ArrayType =>
        ArrayType(relaxNullability(a.elementType), containsNull = true)
      case m: MapType => MapType(relaxNullability(m.keyType),
        relaxNullability(m.valueType), valueContainsNull = true)
      case other => other
    }
  }

  /** Spill dirs created through [[MatStrategy.Default]] whose handles
    * were never released — the footprint of the bare-DataFrame operator
    * wrappers (minhashNearDupPairs, connectedComponents, …), which drop
    * the release handle by design. Bounded for batch jobs (JVM-exit
    * cleanup reclaims everything), but a long-lived SERVICE session
    * accumulates one dir per call: such callers should prefer the *M
    * variants and release(), or call [[reapDefaultSpills]] at a point
    * where no bare-wrapper result is still in use.
    */
  private val defaultSpills =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Delete every unreleased Default-strategy spill dir (opt-in reaper
    * for long-lived sessions). Caller contract: every DataFrame returned
    * by a bare wrapper is dead — their backing files go away. Returns
    * the number of dirs removed.
    */
  def reapDefaultSpills(spark: SparkSession): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    var n = 0
    val it = defaultSpills.iterator()
    while (it.hasNext) {
      val p = new Path(it.next())
      it.remove()
      val fs = p.getFileSystem(conf)
      if (fs.delete(p, true)) n += 1
    }
    n
  }

  /** `localCheckpoint` with release tracking. `eager = false` defers
    * materialization to the FIRST ACTION the caller runs on the returned
    * frame (the blocks persist and the lineage truncates when that job
    * lands) — the fusion seam [[localWithScalar]] builds on.
    */
  private def local(df: DataFrame, eager: Boolean): (Materialized, DataFrame) =
    trackingLock.synchronized {
      val sc = df.sparkSession.sparkContext
      // localCheckpoint registers new persistent RDDs; diffing the
      // registry before/after (under the lock) yields exactly the
      // blocks this call created.
      val before = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint(eager)
      val ids = sc.getPersistentRDDs.keySet.diff(before)
      (Materialized(out, () => ids.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))), out)
    }

  /** Local materialization FUSED with a bounded one-row aggregate fetch:
    * the lazy localCheckpoint is materialized by the aggregate's own
    * job, so a caller that needs both the pinned frame and a scalar
    * statistic of it (an iterative renormalization constant, a
    * convergence count) pays ONE barrier instead of two — the extra
    * aggregation runs map-side over the blocks the same job is writing.
    * The scalar comes back as a driver value to splice in as a literal:
    * the K5 collect→literal pattern, bounded to a single row by
    * construction. Values are bit-identical to the two-job formulation
    * (materialize, then aggregate) for any deterministic `aggs`.
    */
  def localWithScalar(df: DataFrame,
                      aggs: Seq[org.apache.spark.sql.Column])
      : (Materialized, org.apache.spark.sql.Row) = {
    require(aggs.nonEmpty, "at least one aggregate")
    val (m, out) = local(df, eager = false)
    val row = out.agg(aggs.head, aggs.tail: _*).head()
    (m, row)
  }

  def apply(df: DataFrame, mat: MatStrategy): Materialized = mat match {

    case MatStrategy.PassThrough => Materialized(df, () => ())

    case MatStrategy.Default =>
      val (m, path) = spill(df, defaultSpillRoot(df.sparkSession))
      defaultSpills.add(path)
      Materialized(m.df, () => { defaultSpills.remove(path); m.release() })

    case MatStrategy.Local => local(df, eager = true)._1

    case MatStrategy.Reliable => trackingLock.synchronized {
      val spark = df.sparkSession
      val sc = spark.sparkContext
      // reliable checkpoint needs a checkpoint dir; default to a local
      // temp one so tests/local runs work — production sets a DFS path.
      if (sc.getCheckpointDir.isEmpty)
        sc.setCheckpointDir(
          java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
      val ckptRoot = new Path(sc.getCheckpointDir.get)
      val fs = ckptRoot.getFileSystem(sc.hadoopConfiguration)
      // checkpoint files land under checkpointDir/rdd-<id>; diff the
      // listing around the call (under the lock) to learn which dirs
      // this one created
      def rddDirs(): Set[String] =
        if (!fs.exists(ckptRoot)) Set.empty
        else fs.listStatus(ckptRoot).map(_.getPath.toString).toSet
      val before = rddDirs()
      val out = df.checkpoint(true)
      val created = rddDirs().diff(before)
      Materialized(out, () =>
        created.foreach(d => fs.delete(new Path(d), true)))
    }

    case MatStrategy.Spill(root) => spill(df, root)._1
  }

  private def spill(df: DataFrame, root: String): (Materialized, String) = {
    val spark = df.sparkSession
    val path = s"$root/spill-${counter.incrementAndGet()}"
    df.write.mode("overwrite").parquet(path)
    // explicit schema: an empty result writes no part files, and a
    // schemaless read of the empty dir would fail instead of
    // returning an empty frame. (asNullable: file sources always relax
    // nullability on read — passing the exact schema would be ignored.)
    val out = spark.read.schema(
      relaxNullability(df.schema)
        .asInstanceOf[org.apache.spark.sql.types.StructType]).parquet(path)
    (Materialized(out, () => {
      val p = new Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true); ()
    }), path)
  }
}
