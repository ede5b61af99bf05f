package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming variants of the batch pipeline patterns.
  *
  * The reference declares spark-streaming but never uses it (SURVEY.md
  * §2.10); these are the streaming upgrades of its patterns for a
  * continuously-landing warehouse: micro-batch audit-append (Pattern A),
  * watermarked event-time windowed aggregation, and stateful per-user
  * session tracking with mapGroupsWithState.
  *
  * Scale notes: audit-append is stateless (pure map — no state store);
  * the windowed aggregation keys state by (window, event_type) and the
  * watermark bounds state size; session state is one small struct per
  * active user, dropped on timeout.
  */
object StreamingOps {

  /** Streaming source over a parquet directory with an explicit schema
    * (streams require one). `tsNanosCol` is converted to a proper
    * timestamp column `event_time` for watermarking.
    */
  def eventStream(spark: SparkSession, dir: String, schema: StructType,
                  tsNanosCol: String = "ts"): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
      .withColumn("event_time", timestamp_micros(expr(s"$tsNanosCol div 1000")))

  /** Pattern A, streaming: stamp audit columns on every arriving row.
    * Stateless — identical semantics to the batch EtlOps.withAudit. */
  def auditAppendStream(src: DataFrame, user: String,
                        clock: String): DataFrame =
    src.withColumn("dwd_insert_user", lit(user))
      .withColumn("dwd_insert_time", lit(clock).cast("timestamp"))
      .withColumn("dwd_modify_user", lit(user))
      .withColumn("dwd_modify_time", lit(clock).cast("timestamp"))

  /** Watermarked sliding-window counts/sums per event type. */
  def windowedEventStats(src: DataFrame, watermark: String = "10 minutes",
                         window_ : String = "5 minutes"): DataFrame =
    src.withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Streaming exact dedup — the streaming side of the batch W1 pattern:
    * drop events already seen for the key within the watermark horizon
    * (state pruned as event time advances; unbounded keys stay bounded).
    */
  def dedupStream(src: DataFrame, keyCols: Seq[String],
                  watermark: String = "30 minutes"): DataFrame =
    src.withWatermark("event_time", watermark)
      .dropDuplicates(keyCols :+ "event_time")

  /** Streaming exact dedup on the business key ALONE — Spark's
    * dropDuplicatesWithinWatermark: unlike [[dedupStream]] (which keys
    * state on (key, event_time) and only drops exact-time repeats),
    * this drops ANY later duplicate of a key seen within the watermark
    * horizon, and the state store evicts each key once the watermark
    * passes it — the semantics of an at-least-once upstream producer
    * being collapsed to effectively-once.
    */
  def dedupKeysStream(src: DataFrame, keyCols: Seq[String],
                      watermark: String = "30 minutes"): DataFrame =
    src.withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Built-in session-window aggregation — the declarative twin of
    * [[userSessionStream]]: same 30-minute-gap session semantics, but
    * expressed as `groupBy(session_window(...))` so Catalyst manages
    * the session state store (merging windows, watermark eviction)
    * instead of hand-rolled flatMapGroupsWithState code. Emits one row
    * per CLOSED session (watermark past session end + gap).
    *
    * Prefer this form when the per-session output is plain aggregates;
    * the flatMapGroupsWithState form remains for session logic a
    * groupBy can't express (e.g. emitting mid-session milestones).
    */
  def sessionWindowStream(src: DataFrame,
                          gapMinutes: Int = 30): DataFrame =
    src.withWatermark("event_time", s"$gapMinutes minutes")
      .groupBy(col("user_id"),
        session_window(col("event_time"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  case class UserSessionState(nEvents: Long, sumValue: Double,
                              startTsNs: Long, lastTsNs: Long)
  case class UserSessionClosed(user_id: Long, n_events: Long,
                               sum_value: Double, session_start_us: Long,
                               session_end_us: Long)

  /** Stateful per-user SESSIONIZATION via flatMapGroupsWithState — the
    * streaming analog of operators.Sessionize with identical gap
    * semantics: a new session starts when an event arrives more than
    * `gapMinutes` of event time after the previous one.
    *
    * Sessions close two ways, both emitting a UserSessionClosed row:
    *  - in-batch: a later event for the user arrives past the gap;
    *  - on timeout: the event-time watermark passes lastEvent+gap
    *    (EventTimeTimeout + setTimeoutTimestamp), at which point the
    *    state is REMOVED — per-user state is bounded by activity, never
    *    lifetime (round-1 advice: NoTimeout grew state unboundedly and
    *    never split sessions).
    *
    * The still-open trailing session of a user stays in state until the
    * watermark advances past its gap; a finite input's last sessions are
    * therefore intentionally unemitted (exactly the watermark contract).
    */
  def userSessionStream(src: DataFrame,
                        gapMinutes: Int = 30): Dataset[UserSessionClosed] = {
    val spark = src.sparkSession
    import spark.implicits._
    // gap decisions run on full NANOSECOND precision, exactly like the
    // batch sessionizer (Sessionize gaps on the raw ts nanos; a
    // microsecond-truncated diff could flip a boundary-case split)
    val gapNs = gapMinutes * 60L * 1000000000L
    val gapMs = gapMinutes * 60L * 1000L
    // the watermark column must survive into the stateful operator's
    // input, so event_time rides along (unused by the lambda)
    src.withWatermark("event_time", s"$gapMinutes minutes")
      .selectExpr("user_id", "ts", "value", "event_time")
      .as[(Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[(Long, Long, Double, java.sql.Timestamp)],
         state: GroupState[UserSessionState]) =>
          def emit(s: UserSessionState) =
            UserSessionClosed(userId, s.nEvents, s.sumValue,
              s.startTsNs / 1000, s.lastTsNs / 1000)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(emit(s))
          } else {
            // session splitting depends only on ts gaps; sums/counts are
            // order-independent, so sorting by ts alone is total enough
            val evs = rows.toArray.sortBy(_._2)
            val closed = scala.collection.mutable.ArrayBuffer
              .empty[UserSessionClosed]
            var cur = state.getOption
            evs.foreach { case (_, tsNs, v, _) =>
              cur = cur match {
                case Some(s) if tsNs - s.lastTsNs <= gapNs =>
                  Some(UserSessionState(s.nEvents + 1, s.sumValue + v,
                    s.startTsNs, tsNs))
                case Some(s) =>
                  closed += emit(s)
                  Some(UserSessionState(1L, v, tsNs, tsNs))
                case None =>
                  Some(UserSessionState(1L, v, tsNs, tsNs))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // the timeout must stay ahead of the current watermark
              // (late stragglers would otherwise ask for a past timeout)
              state.setTimeoutTimestamp(math.max(s.lastTsNs / 1000000 + gapMs,
                state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }

  /** Watermarked STREAM-STREAM join: purchases joined to the same
    * user's clicks in the `windowMinutes` before them — the streaming
    * twin of the batch RangeJoin/as-of attribution.
    *
    * Both sides carry a watermark and the join condition bounds c_time
    * within [p_time - window, p_time), so Spark can expire buffered
    * state: a click older than the watermark minus the window can never
    * match a future purchase and is dropped. Without the time bound the
    * state store would grow with the full history of both streams.
    */
  def streamStreamAttribution(events: DataFrame,
                              windowMinutes: Int = 10,
                              watermark: String = "30 minutes"): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("event_time").as("p_time"))
      .withWatermark("p_time", watermark)
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"),
        col("event_id").as("click_id"), col("event_time").as("c_time"))
      .withWatermark("c_time", watermark)
    p.join(c,
        col("user_id") === col("c_user_id") &&
          col("c_time") >= col("p_time") -
            expr(s"INTERVAL $windowMinutes MINUTES") &&
          col("c_time") < col("p_time"))
      .select(col("user_id"), col("purchase_id"), col("click_id"))
  }

  /** Continuous warehouse ingestion: every micro-batch is SCD-merged
    * into a parquet snapshot table — the streaming upgrade of the
    * reference's Pattern B batch upsert. foreachBatch bridges the stream
    * to the batch EtlOps.scdMerge, so batch and streaming ingestion share
    * ONE merge implementation (identical semantics by construction).
    *
    * The snapshot is localCheckpoint'ed before the overwrite (Spark
    * cannot overwrite a path it is lazily reading; the checkpoint
    * materializes executor-side blocks and truncates the file lineage,
    * no driver collect). At scale the target would be a transactional
    * table format; the merge logic is unchanged.
    */
  def continuousScdMerge(src: DataFrame, targetDir: String,
                         keys: Seq[String], orderCol: String,
                         tieBreakers: Seq[String]): Unit = {
    import org.apache.spark.sql.DataFrame
    val q = src.writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_scd_ckpt").toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val tgt = new java.io.File(targetDir)
        val (merged, releaseSnapshot) =
          if (tgt.exists()) {
            // materialized with a release handle: the snapshot blocks are
            // freed after the write instead of leaking once per batch
            val snapshot = graft.ops.Materialize(
              spark.read.parquet(targetDir), graft.ops.MatStrategy.Local)
            (graft.ops.EtlOps.scdMerge(batch.drop("event_time"), snapshot.df,
              keys, orderCol,
              tieBreakers.map(org.apache.spark.sql.functions.col(_).desc)),
              snapshot.release)
          } else {
            (graft.ops.EtlOps.withAudit(
              graft.ops.EtlOps.dedupLatest(batch.drop("event_time"), keys,
                (org.apache.spark.sql.functions.col(orderCol).desc +:
                  tieBreakers.map(org.apache.spark.sql.functions.col(_).desc)))),
              () => ())
          }
        try merged.drop("data_source").write.mode("overwrite").parquet(targetDir)
        finally releaseSnapshot()
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Continuous incremental-aggregate maintenance: each micro-batch is
    * aggregated ALONE and merged with the latest maintained snapshot
    * (ops.IncrementalAgg — associative sum/count partials, O(batch) per
    * refresh, never O(history)), the result committed as a NEW
    * [[graft.sources.Versioned]] snapshot. The atomic pointer commit
    * means readers always see a complete refresh, and every historical
    * refresh stays diffable (Versioned.diff). Unlike the
    * overwrite-in-place pattern ([[continuousScdMerge]]), a versioned
    * commit never reads and overwrites the same files, so no defensive
    * materialization is needed. foreachBatch replays (at-least-once)
    * are made EXACTLY-ONCE by committing the batch id atomically with
    * each version (the Versioned note) and skipping already-committed
    * ids.
    */
  def continuousAggMaintenance(src: DataFrame, table: String,
                               keys: Seq[String],
                               sums: Seq[String]): Unit = {
    val q = src.writeStream
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft_agg_ckpt").toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // foreachBatch is at-least-once and sum/count merges are not
        // idempotent, so the commit itself must be: the batch id rides
        // the Versioned note, which lands inside the version dir BEFORE
        // the atomic pointer flip. A replayed batch whose id is already
        // committed is skipped — a crash between data write and flip
        // leaves an orphan dir the pointer never reached, and the
        // replay commits the same merge under the next version number.
        val latest = graft.sources.Versioned.latestVersion(spark, table)
        val applied = latest.flatMap(v =>
          graft.sources.Versioned.note(spark, table, v)).map(_.toLong)
        if (!applied.exists(_ >= batchId)) {
          val merged = latest match {
            case None =>
              graft.ops.IncrementalAgg.snapshot(batch, keys, sums)
            case Some(v) =>
              graft.ops.IncrementalAgg.merge(
                graft.sources.Versioned.read(spark, table, Some(v)),
                batch, keys, sums)
          }
          graft.sources.Versioned.write(merged, table,
            note = Some(batchId.toString))
        }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Continuous Count-Min sketch maintenance: each micro-batch's d×w
    * cell DELTA lands as its own replay-stable file set (`b<id>_`
    * prefix through [[idempotentAppend]] — at-least-once replays
    * rewrite their own files and can never double-count), and the
    * maintained sketch is the cell-wise sum of all deltas
    * ([[graft.ops.Sketches.mergeCm]] linearity: merge(sketch(b1),
    * sketch(b2)) = sketch(b1 ∪ b2), exactly). The table stays
    * metadata-sized — O(batches · d · w) rows — and [[readSketch]]
    * folds it in one aggregation; a periodic compaction would fold the
    * deltas into one without changing any estimate. `checkpointDir`
    * MUST be durable storage in production.
    */
  def continuousSketchMaintenance(src: DataFrame, keyCol: String,
                                  table: String, depth: Int, width: Int,
                                  checkpointDir: String = null): Unit = {
    val ckpt = Option(checkpointDir).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_cm_ckpt").toString)
    val q = src.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        idempotentAppend(
          graft.ops.Sketches.countMinTable(batch, keyCol, depth, width),
          table, s"b${batchId}_")
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** The maintained sketch of [[continuousSketchMaintenance]]: the
    * cell-wise sum over every batch delta in `table`. */
  def readSketch(spark: SparkSession, table: String): DataFrame =
    graft.ops.Sketches.mergeCm(spark.read.parquet(table))

  /** Move `df`'s part files into `dir` under DETERMINISTIC names
    * `<prefix><i>.parquet`, first deleting any files of the same prefix
    * — a REPLAYABLE append: re-running the same (df, dir, prefix) from
    * any crash point converges to exactly one copy of the rows, which
    * is what makes the curate loop's at-least-once foreachBatch
    * exactly-once at the sink. The staging dir is underscore-prefixed
    * so a concurrent reader of `dir` never lists it.
    */
  /** Deterministic batch-named append — the shared commit primitive,
    * now hosted at [[graft.sources.MaintainedIndex.idempotentAppend]]
    * (the clustered+indexed variants live there too). */
  private def idempotentAppend(df: DataFrame, dir: String,
                               prefix: String): Unit = {
    graft.sources.MaintainedIndex.idempotentAppend(df, dir, prefix)
    ()
  }

  /** Continuous corpus curation: screen each arriving batch of documents
    * against a maintained MinHash signature table
    * ([[graft.operators.Dedup.writeSignatureTable]]), append the
    * survivors to `admittedDir`, and append THEIR signatures back to the
    * table so the next batch screens against them too — the live-table
    * ingest loop of a training-data pipeline. The screen itself is the
    * batch operator (incrementalNearDupAgainstSigsM): batch and
    * continuous ingestion share one implementation, so their admit
    * decisions are identical by construction.
    *
    * EXACTLY-ONCE under crash/restart (foreachBatch is at-least-once;
    * CurateRestartSpec drives every window):
    *  - both sinks write DETERMINISTIC batch-named files
    *    ([[idempotentAppend]]), so a replayed batch rewrites its own
    *    files instead of appending a second copy;
    *  - the screen EXCLUDES the batch's own ids from the corpus side:
    *    a crash after the signature append would otherwise make the
    *    replay reject every batch row against its own signatures and
    *    rewrite an EMPTY admit set (dropped survivors). Ids are unique
    *    across the feed (the ingest contract), so in a clean run the
    *    exclusion matches nothing;
    *  - an underscore-prefixed marker lands in `admittedDir` after both
    *    writes: a replay of a fully-applied batch skips the screen
    *    entirely.
    *
    * QUOTE SCREEN (optional, `winnowTablePath` non-null): the batch is
    * additionally screened by POSITIONAL winnowing containment against
    * a maintained fingerprint table ([[graft.operators.Corpus.writeWinnowTable]])
    * — the deterministic tiny-quote detector the MinHash screen is
    * structurally blind to (band collision is bounded by the pair's
    * JACCARD, so a short verbatim quote inside a large held page never
    * collides). Survivors' fingerprints append beside their signatures,
    * so the quote table is as live as the signature table: batch 1
    * catches quotes of documents admitted in batch 0. Both screens'
    * rejections union; the same replay-safety exclusion of the batch's
    * own ids applies to the fingerprint corpus side.
    *
    * Scale notes: per batch, the corpus side is two column-pruned scans
    * of the signature table (bands + shingle sets) — corpus text is
    * never re-tokenized; the batch side is O(batch). The quote screen
    * adds (id, h)-pruned scans of the fingerprint table and a
    * batch×corpus-only hash join (corpus-internal pairs never form);
    * its corpus-wide document frequencies come from the MAINTAINED df
    * sidecar ([[graft.operators.Corpus.winnowDfStatePath]]), appended
    * per batch beside the fingerprints — never re-aggregated from the
    * corpus, so per-batch cost scales with the batch, not the corpus.
    * State lives in the maintained tables, not the state store, so
    * there is no watermark and no per-key streaming state to bound.
    * Within-batch duplicates are NOT collapsed (documented screen
    * semantics — run exact dedup upstream if a feed can self-duplicate
    * inside one trigger). `checkpointDir` MUST be durable storage in
    * production (the temp default exists for single-run tests).
    */
  def continuousCurate(src: DataFrame, sigTablePath: String,
                       admittedDir: String, textCol: String, idCol: String,
                       k: Int = 5, threshold: Double = 0.5,
                       checkpointDir: String = null,
                       shufflePartitions: Option[Int] = None,
                       winnowTablePath: String = null,
                       minContainmentBp: Long = 8000L,
                       winnowMaxDf: Long = 50L,
                       blocklist: Seq[String] = Nil,
                       blocklistBlockAt: Long = 1L,
                       blocklistFold: Boolean = true): Unit =
    withShufflePartitions(src.sparkSession, shufflePartitions) {
      continuousCurate0(src, sigTablePath, admittedDir, textCol, idCol,
        k, threshold, checkpointDir, Option(winnowTablePath),
        minContainmentBp, winnowMaxDf, blocklist, blocklistBlockAt,
        blocklistFold)
    }

  /** Run `body` with `spark.sql.shuffle.partitions` overridden — the
    * runToMemory statePartitions discipline (set/execute/restore under
    * the conf lock) shared by the batch-loop streams: a low-throughput
    * micro-batch loop's joins are near-empty at the session's cluster
    * width, and the per-task scheduling floor (32 near-empty tasks per
    * stage, several stages per batch) dominates its wall. At cluster
    * scale callers pass None and inherit the session's parallelism.
    */
  private def withShufflePartitions[A](spark: SparkSession,
                                       n: Option[Int])(body: => A): A =
    n match {
      case None => body
      case Some(p) => confLock.synchronized {
        val key = "spark.sql.shuffle.partitions"
        val prev = spark.conf.get(key)
        spark.conf.set(key, p.toString)
        try body finally spark.conf.set(key, prev)
      }
    }

  private def continuousCurate0(src: DataFrame, sigTablePath: String,
                                admittedDir: String, textCol: String,
                                idCol: String,
                                k: Int, threshold: Double,
                                checkpointDir: String,
                                winnowTablePath: Option[String] = None,
                                minContainmentBp: Long = 8000L,
                                winnowMaxDf: Long = 50L,
                                blocklist: Seq[String] = Nil,
                                blocklistBlockAt: Long = 1L,
                                blocklistFold: Boolean = true): Unit = {
    val ckpt = Option(checkpointDir).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_curate_ckpt").toString)
    // same shingle-size refusal as appendToSignatureTable, checked ONCE
    // at query start (the table's k cannot change mid-stream — appends
    // reuse it) so a mismatched table is refused before any write and
    // each micro-batch skips the metadata read round-trip
    val storedK = graft.operators.Dedup
      .signatureTableK(src.sparkSession, sigTablePath)
    require(storedK == k,
      s"signature table at $sigTablePath was written with " +
        s"k=$storedK but the curate loop hashes with k=$k")
    // fingerprint geometry likewise read once at query start; the
    // table's own marker is the single source of truth (callers don't
    // pass k/window — a curate loop must match whatever the table holds)
    val winnowKw = winnowTablePath.map(p =>
      graft.operators.Corpus.winnowTableParams(src.sparkSession, p))
    // the df sidecar must exist before the first batch screens — a
    // pre-sidecar table is healed ONCE here (one df aggregation), and
    // every micro-batch after reads maintained state only
    winnowTablePath.foreach(p =>
      graft.operators.Corpus.ensureWinnowDfState(src.sparkSession, p))
    // likewise the screen indexes: the doc-keyed projection + per-file
    // envelopes heal ONCE for pre-index tables, then every micro-batch
    // probe is a file-pruned read (O(batch) IO, never O(corpus))
    winnowTablePath.foreach(p =>
      graft.operators.Corpus.ensureWinnowScreenIndex(src.sparkSession, p))
    graft.sources.MaintainedIndex.ensureIndexed(
      src.sparkSession, sigTablePath, "doc_id")
    val q = src.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val admPath = new org.apache.hadoop.fs.Path(admittedDir)
        val fs = admPath.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val marker = new org.apache.hadoop.fs.Path(admittedDir,
          s"_graft_applied_b$batchId")
        if (!fs.exists(marker)) {
          // phase timing to stderr under GRAFT_CURATE_DEBUG=1 (local
          // iteration only — the bench fixture's wall is otherwise one
          // opaque number per micro-batch)
          val dbg = sys.env.get("GRAFT_CURATE_DEBUG").contains("1")
          def tdbg[A](tag: String)(f: => A): A =
            if (!dbg) f else {
              val t0 = System.nanoTime(); val r = f
              System.err.println(
                f"[curate b$batchId] $tag%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
              r
            }
          // the batch is tokenized ONCE: the signature relation feeds
          // both the screen and (filtered to survivors) the signature
          // append — the original shape re-shingled the survivors for
          // the append, a second full pass over the batch text
          val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
          val sigB = graft.operators.Dedup
            .signatureRelation(batch, textCol, idCol, k)
            .persist(lvl)
          // the quote screen's batch fingerprints, computed ONCE and
          // reused (screen + survivor append) — same tokenize-once
          // discipline as the signature relation
          val fpB = winnowKw.map { case (wk, ww) =>
            graft.operators.Corpus
              .winnowingFingerprints(batch, textCol, idCol, wk, ww)
              .persist(lvl)
          }
          // Local (executor-block) materialization, not the default
          // parquet spill: the screen results never escape the batch
          // (released in the finally) and a retry rebuilds them, so the
          // DFS round-trip would buy nothing — this is the documented
          // bounded-intra-job-state case for MatStrategy.Local
          var screened: graft.ops.Materialized = null
          var dupIdsM: graft.ops.Materialized = null
          var quoteM: graft.ops.Materialized = null
          var survivorFpsP: DataFrame = null
          try {
            val own = batch.select(col(idCol).as("corpus_id"))
            // The LSH screen and the quote screen are INDEPENDENT —
            // disjoint maintained tables, both feeding the one dupIds
            // union — so their eager materializations are submitted
            // from two driver threads and their jobs OVERLAP (guide
            // §2.6: each screen's stage tails leave most of the
            // machine idle; the other screen's stages back-fill it).
            // Both handles are captured before either failure
            // re-throws, so the finally releases whatever landed.
            import scala.concurrent.{Await, Future}
            import scala.concurrent.ExecutionContext.Implicits.global
            import scala.concurrent.duration.Duration
            val fScr = Future(tdbg("lsh screen")(graft.operators.Dedup
              .incrementalNearDupAgainstPreSigsM(sigB, sigTablePath,
                threshold, graft.ops.MatStrategy.Local)))
            // quote screen: batch fingerprints vs the maintained table,
            // with the batch's own ids excluded from the corpus side
            // (replay safety — a crash after the fingerprint append
            // must not make the replay quote-reject the batch against
            // its own fingerprints). Stored-table reads are
            // file-pruned against the batch's bounded probe sets in
            // the micro-batch regime; bulk batches take the
            // maintained-artifact one-shot DAG (projection + df
            // sidecar) inside the screen. Deltas filtered to
            // batch_id < ownId — the same replay safety as before.
            val fQuote = (winnowTablePath, fpB) match {
              case (Some(wp), Some(fp)) =>
                Some(Future(tdbg("quote screen")(graft.operators.Corpus
                  .winnowingContainmentScreenPrunedM(fp, wp,
                    excludeIds =
                      Some(own.select(col("corpus_id").as("id"))),
                    ownBatchId = batchId,
                    maxDf = winnowMaxDf,
                    minContainmentBp = minContainmentBp,
                    mat = graft.ops.MatStrategy.Local))))
              case _ => None
            }
            val scrT = scala.util.Try(Await.result(fScr, Duration.Inf))
            val quoteT = fQuote.map(f =>
              scala.util.Try(Await.result(f, Duration.Inf)))
            screened = scrT.toOption.orNull
            quoteM = quoteT.flatMap(_.toOption).orNull
            scrT.get // re-throw AFTER both handles are tracked above
            quoteT.foreach(_.get)
            val lshDup = screened.df
              .join(broadcast(own), Seq("corpus_id"), "left_anti")
              .select(col("batch_id").as(idCol))
            val quoteDup = fQuote.map(_ =>
              quoteM.df.select(col("batch_id").as(idCol)))
            // the POLICY screen (optional): one Aho-Corasick pass over
            // the batch text — a zero-exchange row-local projection
            // that pipelines inside the batch scan; total hits at or
            // above the threshold reject the document. Rejected docs'
            // signatures/fingerprints never append (a policy-rejected
            // page must not become dedup evidence), exactly like the
            // dedup screens' rejects. Folded matching by default: a
            // production blocklist must hit case/NFC variants.
            val policyDup =
              if (blocklist.isEmpty) None
              else Some(graft.operators.Blocklist
                .policyReport(batch, textCol, idCol, blocklist,
                  reviewAt = blocklistBlockAt, blockAt = blocklistBlockAt,
                  fold = blocklistFold)
                .where(col("verdict") === "block")
                .select(col(idCol)))
            // MATERIALIZED once (id-only, KB-scale): dupIds feeds three
            // anti-joins (admits, signatures, fingerprints) — left lazy,
            // each would re-run the whole screen DAG per sink
            dupIdsM = tdbg("dupIds")(graft.ops.Materialize(
              (Seq(lshDup) ++ quoteDup ++ policyDup)
                .reduce(_ unionByName _).distinct(),
              graft.ops.MatStrategy.Local))
            val dupIds = dupIdsM.df
            // survivors / survivorSigs are each one cheap anti-join off
            // materialized inputs (screen spilled, signatures persisted)
            val survivors = batch.join(dupIds, Seq(idCol), "left_anti")
            val survivorSigs = sigB.join(
              dupIds.select(col(idCol).as("doc_id")), Seq("doc_id"),
              "left_anti")
            // the sinks are independent (different dirs, disjoint
            // inputs): submit their jobs concurrently — the body's wall
            // is the slowest write, not the sum (Spark schedules jobs
            // from concurrent threads fairly)
            import scala.concurrent.{Await, Future}
            import scala.concurrent.ExecutionContext.Implicits.global
            val fAdm = Future(
              idempotentAppend(survivors, admittedDir, s"b${batchId}_"))
            // maintained-table appends are CLUSTERED + INDEXED (their
            // own generation of narrow-envelope files + stats rows
            // under the same batch-named idempotence), so the NEXT
            // batch's screens prune against them too
            val fSig = Future(
              graft.sources.MaintainedIndex.clusteredIdempotentAppend(
                survivorSigs, sigTablePath, s"b${batchId}_sig_",
                "doc_id"))
            // the three fingerprint-family artifacts (table, doc-keyed
            // projection, df delta) are independent derivations of the
            // SAME persisted survivor fingerprints writing to disjoint
            // directories — submitted concurrently like the other
            // sinks, so the batch's write wall is the slowest artifact,
            // not the sum. Crash anywhere between them converges on
            // replay: batch-named idempotence rewrites each, the screen
            // excludes own ids corpus-side and own deltas by batch id,
            // and a projection/table gap only ever hides the batch's
            // OWN docs (never candidates — those come from the table).
            val fFp: Seq[Future[Unit]] = (winnowTablePath, fpB) match {
              case (Some(wp), Some(fp)) =>
                // persisted ONCE: the three fingerprint-family sinks
                // each evaluate their input twice (range sample +
                // shuffle map), so a lazy survivorFps would run this
                // anti-join six times per batch; cached blocks make
                // those six passes cache reads (released in the
                // finally below with the other batch intermediates)
                val survivorFps = fp.join(
                  dupIds.select(col(idCol).as("id")), Seq("id"),
                  "left_anti").persist(lvl)
                survivorFpsP = survivorFps
                Seq(
                  Future {
                    graft.sources.MaintainedIndex.clusteredIdempotentAppend(
                      survivorFps, wp, s"b${batchId}_fp_", "h")
                  },
                  Future {
                    graft.sources.MaintainedIndex.clusteredIdempotentAppend(
                      survivorFps.select(col("id"), col("h")).distinct(),
                      graft.operators.Corpus.winnowByIdPath(wp),
                      s"b${batchId}_byid_", "id")
                  },
                  Future {
                    graft.sources.MaintainedIndex.clusteredIdempotentAppend(
                      graft.operators.Corpus
                        .winnowDfDelta(survivorFps, batchId),
                      graft.operators.Corpus.winnowDfStatePath(wp),
                      s"b${batchId}_", "h")
                  })
              case _ => Nil
            }
            tdbg("await writes") {
              Await.result(fAdm, scala.concurrent.duration.Duration.Inf)
              Await.result(fSig, scala.concurrent.duration.Duration.Inf)
              fFp.foreach(f =>
                Await.result(f, scala.concurrent.duration.Duration.Inf))
            }
            fs.create(marker, true).close()
          } finally {
            if (screened != null) screened.release()
            sigB.unpersist(false)
            if (dupIdsM != null) dupIdsM.release()
            if (quoteM != null) quoteM.release()
            if (survivorFpsP != null) survivorFpsP.unpersist(false)
            fpB.foreach(_.unpersist(false)); ()
          }
        }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Online ANN serving: each arriving micro-batch of query vectors is
    * searched against a STORED SQ8∘IVF index
    * ([[graft.operators.Similarity.writeIvfSqIndex]]) and the top-k
    * appended — the serving half of the index's ingest-then-serve
    * split. Per batch the work is O(probe): the stream path never
    * trains, never encodes, and reads only the probed code lists; the
    * index itself stays a batch-maintained artifact
    * (appendToIvfSqIndex), so serving and upkeep scale independently.
    * Batch and streaming search share one implementation
    * (ivfSqTopKFromIndex), so their results are identical by
    * construction.
    *
    * EXACTLY-ONCE at the sink: foreachBatch is at-least-once, so the
    * top-k rows land via [[idempotentAppend]] under batch-named files —
    * a replayed batch rewrites its own files instead of appending a
    * duplicate copy (same commit protocol as [[continuousCurate]]).
    * `checkpointDir` MUST be durable storage in production; the temp
    * default exists for single-run tests.
    */
  def continuousAnnServe(src: DataFrame, indexPath: String,
                         outDir: String, idCol: String, vecCol: String,
                         k: Int, nprobe: Int = 4,
                         checkpointDir: String = null): Unit = {
    val ckpt = Option(checkpointDir).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_ann_ckpt").toString)
    val q = src.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        idempotentAppend(
          graft.operators.Similarity
            .ivfSqTopKFromIndex(batch, idCol, vecCol, indexPath, k, nprobe),
          outDir, s"b${batchId}_")
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Online DSIR scoring: each arriving micro-batch of documents is
    * scored against a STORED `(bucket, lr_micro)` model
    * ([[graft.operators.Selection.dsirModel]], persisted at train
    * time) and the `(id, w_micro)` weights appended — the serving half
    * of distribution-matched selection's train-then-serve split. Per
    * batch the work is one row-local gram pass plus a broadcast join
    * of the ≤ buckets-row model: no re-training, no corpus read, no
    * shuffle wider than the batch. Batch and streaming scoring share
    * one implementation (scoreWithModel), so streamed weights are
    * identical to the batch path by construction.
    *
    * EXACTLY-ONCE at the sink via [[idempotentAppend]] under
    * batch-named files (the [[continuousAnnServe]] commit protocol).
    * `checkpointDir` MUST be durable storage in production; the temp
    * default exists for single-run tests. `n`/`buckets` must match
    * the stored model's training parameters.
    */
  def continuousSelectServe(src: DataFrame, modelPath: String,
                            outDir: String, textCol: String,
                            idCol: String, n: Int = 2,
                            buckets: Int = 256,
                            checkpointDir: String = null): Unit = {
    val ckpt = Option(checkpointDir).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_select_ckpt").toString)
    val model = src.sparkSession.read.parquet(modelPath)
    val q = src.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        idempotentAppend(
          graft.operators.Selection
            .scoreWithModel(batch, textCol, idCol, model, n, buckets),
          outDir, s"b${batchId}_")
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Continuous ingestion with quarantine: a text-line stream split by
    * the SAME parse expression as the batch Ingest layer, clean rows to
    * one parquet table and raw corrupt lines to a replayable quarantine
    * table.
    *
    * `checkpointDir` MUST be durable storage in production — it is what
    * stops a restarted query from re-reading (and re-appending) the
    * whole input directory; the temp-dir default exists for tests only.
    * Delivery is at-least-once at the sink: foreachBatch re-runs a batch
    * that failed between the two appends (plain parquet append has no
    * batchId-keyed idempotence), so downstream consumers dedupe on
    * content fingerprints — which the corpus pipeline does anyway.
    *
    * foreachBatch is the bridge: one streaming query, two sinks (a
    * stream can't fork after start), and within a batch the split frame
    * is persisted so parse work isn't done twice.
    */
  def ingestJsonlStream(spark: SparkSession, inDir: String,
                        schema: StructType, cleanDir: String,
                        quarantineDir: String,
                        checkpointDir: String = null): org.apache.spark.sql.streaming.StreamingQuery = {
    val ckpt = Option(checkpointDir).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_ckpt_ingest").toString)
    val lines = spark.readStream.text(inDir).toDF("raw_line")
    lines.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val df = batch.persist()
        try {
          val (clean, quarantine) =
            graft.sources.Ingest.splitLines(df, schema)
          clean.write.mode("append").parquet(cleanDir)
          quarantine.write.mode("append").parquet(quarantineDir)
        } finally { df.unpersist(); () }
      }
      .start()
  }

  /** Run a streaming DataFrame to a named in-memory sink until all
    * currently-available input is processed (local smoke harness). */
  def runToMemory(df: DataFrame, name: String,
                  outputMode: OutputMode = OutputMode.Append(),
                  statePartitions: Option[Int] = None): Unit =
    statePartitions match {
      case None => runToMemory0(df, name, outputMode)
      case Some(n) =>
        // A stateful query creates one state store per shuffle partition
        // per operator, and every micro-batch pays per-store maintenance
        // (delta + snapshot files under the checkpoint) whether or not
        // the partition saw data — for a small-throughput stream, 32
        // near-empty stores per batch is almost pure overhead. The
        // partition count is locked into the checkpoint from
        // spark.sql.shuffle.partitions at the FIRST batch, so it must be
        // set for the whole run; the window is serialized against this
        // API's other callers and the session value restored after
        // (same set/execute/restore discipline as
        // CatalogSinks.insertOverwritePartitions). At cluster scale
        // callers pass None and inherit the session's parallelism.
        confLock.synchronized {
          val spark = df.sparkSession
          val key = "spark.sql.shuffle.partitions"
          val prev = spark.conf.get(key)
          spark.conf.set(key, n.toString)
          try runToMemory0(df, name, outputMode)
          finally spark.conf.set(key, prev)
        }
    }

  private val confLock = new Object

  private def runToMemory0(df: DataFrame, name: String,
                           outputMode: OutputMode): Unit = {
    val q = df.writeStream.outputMode(outputMode)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"graft_ckpt_$name").toString)
      .format("memory").queryName(name).start()
    try q.processAllAvailable()
    finally q.stop()
  }
}
