package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingOps

class StreamingSpec extends SparkSpec {

  private lazy val eventsSchema =
    Tables.load(spark, sf0001, "events").schema

  // streaming sources need a directory, not a single parquet file.
  // Written THROUGH Tables.load (not a raw file copy): the testdata
  // stores ts as timestamp[us], and streaming it under an explicit
  // BIGINT schema would silently read raw MICROS where the library
  // contract is epoch-NANOS — every event-time gap/window would be
  // 1000x compressed. Materializing the loaded frame bakes the
  // contract into the fixture's bytes.
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    Tables.load(spark, sf0001, "events")
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)
    dir.toString
  }

  test("streaming audit-append stamps every arriving row (Pattern A)") {
    val src = StreamingOps.eventStream(spark, eventsDir,
      eventsSchema)
    StreamingOps.runToMemory(
      StreamingOps.auditAppendStream(src, "user1", "2024-01-01 00:00:00"),
      "audit_out")
    val out = spark.table("audit_out")
    val batchCount = Tables.load(spark, sf0001, "events").count()
    assert(out.count() == batchCount)
    assert(out.where(col("dwd_insert_user") =!= "user1").count() == 0)
  }

  test("watermarked windowed aggregation produces event-time windows") {
    val src = StreamingOps.eventStream(spark, eventsDir,
      eventsSchema)
    StreamingOps.runToMemory(
      StreamingOps.windowedEventStats(src), "win_out",
      OutputMode.Append())
    // append mode emits only watermark-closed windows; the finite input
    // closes all but the trailing watermark interval
    val out = spark.table("win_out")
    assert(out.count() > 0)
    assert(out.columns.toSet ==
      Set("window", "event_type", "n", "sum_value"))
  }

  test("streaming dedup drops repeated (key, event_time) rows") {
    val src = StreamingOps.eventStream(spark, eventsDir, eventsSchema)
    // self-union the source dir? single dir read is already unique — so
    // assert dedup of (user_id, event_time) matches the batch distinct
    StreamingOps.runToMemory(
      StreamingOps.dedupStream(src, Seq("user_id")), "dedup_out")
    val out = spark.table("dedup_out").count()
    // event_time is microsecond-truncated, so the batch baseline must
    // dedup at the same precision
    val batch = Tables.load(spark, sf0001, "events")
      .selectExpr("user_id", "ts div 1000").distinct().count()
    assert(out == batch)
  }

  test("stream-stream attribution join equals the batch theta join") {
    val src = StreamingOps.eventStream(spark, eventsDir, eventsSchema)
    StreamingOps.runToMemory(
      StreamingOps.streamStreamAttribution(src), "attr_out")
    val out = spark.table("attr_out")
      .collect().map(_.toSeq).toSet
    val ev = Tables.load(spark, sf0001, "events")
    val W = 600L * 1000000000L
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        expr("ts div 1000").as("p_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("event_id").as("click_id"),
        expr("ts div 1000").as("c_us"))
    // event_time is microsecond-truncated, so the batch baseline bounds
    // at the same precision
    val batch = p.join(c,
        col("user_id") === col("c_uid") &&
          col("c_us") >= col("p_us") - W / 1000 && col("c_us") < col("p_us"))
      .select(col("user_id"), col("purchase_id"), col("click_id"))
      .collect().map(_.toSeq).toSet
    assert(out == batch)
    assert(out.nonEmpty)
  }

  test("streaming JSONL ingest splits clean/quarantine like the batch reader") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))
    val in = java.nio.file.Files.createTempDirectory("graft_sin")
    val cleanDir = java.nio.file.Files
      .createTempDirectory("graft_sclean").toString + "/t"
    val qDir = java.nio.file.Files
      .createTempDirectory("graft_sq").toString + "/t"
    java.nio.file.Files.write(in.resolve("a.txt"),
      Seq("""{"id": 1, "v": 0.5}""", """broken""", """{"id": 2, "v": 1.5}""")
        .mkString("\n").getBytes("UTF-8"))
    val q = StreamingOps.ingestJsonlStream(
      spark, in.toString, schema, cleanDir, qDir)
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(cleanDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet == Set((1L, 0.5), (2L, 1.5)))
    assert(spark.read.parquet(qDir).collect()
      .map(_.getString(0)).toSeq == Seq("broken"))
  }

  test("continuous SCD merge converges to the batch merge result") {
    val target = java.nio.file.Files
      .createTempDirectory("graft_scd_target").toString + "/snap"
    // stream the events dir through foreachBatch scd-merge
    val src = StreamingOps.eventStream(spark, eventsDir, eventsSchema)
    StreamingOps.continuousScdMerge(src, target,
      Seq("user_id"), "ts", Seq("event_id"))
    val streamed = spark.read.parquet(target)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch reference: newest event per user over the same input
    val batch = graft.ops.EtlOps.dedupLatest(
      Tables.load(spark, sf0001, "events"), Seq("user_id"),
      Seq(org.apache.spark.sql.functions.col("ts").desc,
        org.apache.spark.sql.functions.col("event_id").desc))
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
  }

  test("continuous SCD merge is idempotent against an existing snapshot") {
    // a single-file source is one micro-batch, so one run only exercises
    // the bootstrap branch; a second run with a fresh checkpoint hits the
    // scdMerge-against-existing-target branch and must change nothing
    val target = java.nio.file.Files
      .createTempDirectory("graft_scd_idem").toString + "/snap"
    def run(): Unit = StreamingOps.continuousScdMerge(
      StreamingOps.eventStream(spark, eventsDir, eventsSchema),
      target, Seq("user_id"), "ts", Seq("event_id"))
    run()
    val first = spark.read.parquet(target)
      .select("user_id", "event_id").collect().map(_.toSeq).toSet
    run()
    val second = spark.read.parquet(target)
      .select("user_id", "event_id").collect().map(_.toSeq).toSet
    assert(first == second)
  }

  test("dropDuplicatesWithinWatermark collapses each key to one row") {
    val src = StreamingOps.eventStream(spark, eventsDir, eventsSchema)
    StreamingOps.runToMemory(
      StreamingOps.dedupKeysStream(src, Seq("user_id")), "dedupk_out")
    val out = spark.table("dedupk_out").select("user_id")
      .collect().map(_.getLong(0))
    val users = Tables.load(spark, sf0001, "events")
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    // one micro-batch => watermark still at epoch => no mid-stream
    // eviction, so output is exactly one row per distinct key
    assert(out.length == out.distinct.length, "a key was emitted twice")
    assert(out.toSet == users)
  }

  test("session_window aggregation matches the stateful sessionizer on " +
    "closed sessions") {
    val src = StreamingOps.eventStream(spark, eventsDir, eventsSchema)
    StreamingOps.runToMemory(
      StreamingOps.sessionWindowStream(src), "sessw_out",
      OutputMode.Append())
    val built = spark.table("sessw_out")
      .select(col("user_id"), unix_micros(col("session_start")).as("start_us"),
        col("n_events"))
      .collect().map(_.toSeq).toSet
    StreamingOps.runToMemory(
      StreamingOps.userSessionStream(src).toDF(), "sessc_out",
      OutputMode.Append())
    val custom = spark.table("sessc_out")
      .select(col("user_id"), col("session_start_us"), col("n_events"))
      .collect().map(_.toSeq).toSet
    // both emit exactly the closed sessions; trailing-session timeout
    // behavior may differ by one final batch, so compare the common core
    assert(built.nonEmpty)
    val overlap = built.intersect(custom)
    assert(overlap.size >= (built.size min custom.size) * 9 / 10,
      s"session sets diverge: built=${built.size} custom=${custom.size} " +
        s"overlap=${overlap.size}")
  }

  test("MULTI-BATCH sf0.01 session stream: watermark advances across " +
    "batches, state evicts, result still brackets the batch sessionizer") {
    val sf001 = "/root/testdata/sf0.01"
    val ev = Tables.load(spark, sf001, "events")
    // 5 time-ordered chunks fed one per micro-batch, so the event-time
    // watermark genuinely advances mid-stream and EventTimeTimeout
    // evictions fire between batches — the behavior a single-batch test
    // cannot exercise
    val chunks = 5
    val stage = java.nio.file.Files.createTempDirectory("graft_mb_stage")
    val inDir = java.nio.file.Files.createTempDirectory("graft_mb_in")
    val w = org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")
    val n = ev.count()
    val per = math.ceil(n.toDouble / chunks).toLong
    val chunked = ev
      .withColumn("__chunk", ((row_number().over(w) - 1) / per).cast("int"))
    (0 until chunks).foreach { i =>
      chunked.where(col("__chunk") === i).drop("__chunk")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$stage/c$i")
    }
    val src = StreamingOps.eventStream(spark, inDir.toString, eventsSchema)
    val q = StreamingOps.userSessionStream(src).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_mb_ckpt").toString)
      .format("memory").queryName("mb_sess_out").start()
    try {
      (0 until chunks).foreach { i =>
        val part = new java.io.File(s"$stage/c$i").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.copy(part.toPath,
          inDir.resolve(s"chunk_$i.parquet"))
        q.processAllAvailable() // one controlled micro-batch per chunk
      }
    } finally q.stop()
    val out = spark.table("mb_sess_out")
      .select("user_id", "n_events", "session_start_us", "session_end_us")
      .collect().map(_.toSeq).toSet
    val batch = graft.operators.Sessionize.sessionStats(ev,
      "user_id", "ts", "event_id", "value")
    val wu = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val marked = batch
      .withColumn("last_idx", max(col("sess_idx")).over(wu))
      .select(col("user_id"), col("n_events"), col("session_start_us"),
        col("session_end_us"),
        (col("sess_idx") === col("last_idx")).as("trailing"))
      .collect()
    val nonTrailing = marked.filter(!_.getBoolean(4))
      .map(_.toSeq.take(4)).toSet
    val all = marked.map(_.toSeq.take(4)).toSet
    assert(nonTrailing.subsetOf(out),
      "a gap-closed session was lost across micro-batches")
    assert(out.subsetOf(all), "stream emitted a session batch doesn't have")
    // watermark-driven timeouts fired mid-stream (not just in-batch splits)
    assert(out.size > nonTrailing.size, "no timeout eviction ever fired")
  }

  test("session stream emits gap-closed sessions that match the batch " +
    "sessionizer (open trailing sessions excluded)") {
    val src = StreamingOps.eventStream(spark, eventsDir, eventsSchema)
    StreamingOps.runToMemory(
      StreamingOps.userSessionStream(src).toDF(), "sess_out",
      OutputMode.Append())
    val out = spark.table("sess_out")
      .select("user_id", "n_events", "session_start_us", "session_end_us")
      .collect().map(_.toSeq).toSet
    // batch reference: gap-closed sessions MUST all be emitted; trailing
    // sessions are emitted iff the final watermark passed their timeout
    // (Spark runs one extra batch to fire pending timeouts), so the
    // stream result must sit between "all non-trailing" and "all".
    val batch = graft.operators.Sessionize.sessionStats(
      Tables.load(spark, sf0001, "events"),
      "user_id", "ts", "event_id", "value")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val marked = batch
      .withColumn("last_idx", max(col("sess_idx")).over(w))
      .select(col("user_id"), col("n_events"), col("session_start_us"),
        col("session_end_us"), (col("sess_idx") === col("last_idx")).as("trailing"))
      .collect()
    val nonTrailing = marked.filter(!_.getBoolean(4))
      .map(_.toSeq.take(4)).toSet
    val all = marked.map(_.toSeq.take(4)).toSet
    assert(nonTrailing.subsetOf(out), "a gap-closed session was not emitted")
    assert(out.subsetOf(all), "stream emitted a session batch doesn't have")
    // timeouts really fire: strictly more than the in-batch closures
    assert(out.size > nonTrailing.size, "no trailing session ever timed out")
  }

  test("continuousCurate: a batch-1 near-copy of a batch-0 admit is " +
    "rejected (the signature table is live)") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_curate_spec").toFile
    def path(n: String) = new java.io.File(root, n).toString
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val novelText = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen"
    val freshText = "red orange yellow green blue indigo violet black " +
      "white brown crimson scarlet amber teal navy maroon olive silver"
    val corpus = Seq((1L, corpusText)).toDF("doc_id", "text")
    graft.operators.Dedup.writeSignatureTable(
      corpus, "text", "doc_id", path("sigs"), k = 5)
    val srcDir = new java.io.File(root, "src"); srcDir.mkdirs()
    val batches = Seq(
      Seq((100L, novelText)),                           // novel: admit
      Seq((200L, novelText.substring(10)),              // echo of 100: REJECT
        (201L, freshText)))                             // novel: admit
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = path(s"tmp$i")
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, s"b$i.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000000000L + i * 60000L)
    }
    val src = spark.readStream
      .schema(corpus.schema).option("maxFilesPerTrigger", 1)
      .parquet(srcDir.toString)
    StreamingOps.continuousCurate(
      src, path("sigs"), path("admitted"), "text", "doc_id")
    val admitted = spark.read.parquet(path("admitted"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 200 is near NOTHING in the original corpus — it is rejected only
    // because 100's signatures were appended after batch 0
    assert(admitted == Set(100L, 201L),
      s"expected live-table screen to admit {100, 201}, got $admitted")
  }

  test("curate policy screen: blocked docs reject, and never become " +
    "dedup evidence") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_curate_policy").toFile
    def path(n: String) = new java.io.File(root, n).toString
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val novelText = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen"
    val freshText = "red orange yellow green blue indigo violet black " +
      "white brown crimson scarlet amber teal navy maroon olive silver"
    val corpus = Seq((1L, corpusText)).toDF("doc_id", "text")
    graft.operators.Dedup.writeSignatureTable(
      corpus, "text", "doc_id", path("sigs"), k = 5)
    val srcDir = new java.io.File(root, "src"); srcDir.mkdirs()
    val batches = Seq(
      // 100: novel but BLOCKED (two folded hits of 'qzxspam') — must
      // reject AND leave no signatures behind
      Seq((100L, novelText + " QzxSpam qzxspam")),
      // 200: near-dup of the BLOCKED 100 (tail trimmed) — admits,
      // because a rejected page is not dedup evidence
      Seq((200L, novelText.substring(10)),
        // 201: blocked in its own batch
        (201L, freshText + " qzxspam QZXSPAM extra")))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = path(s"tmp$i")
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, s"b$i.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000000000L + i * 60000L)
    }
    val src = spark.readStream
      .schema(corpus.schema).option("maxFilesPerTrigger", 1)
      .parquet(srcDir.toString)
    StreamingOps.continuousCurate(
      src, path("sigs"), path("admitted"), "text", "doc_id",
      blocklist = Seq("qzxspam"), blocklistBlockAt = 2L)
    val admitted = spark.read.parquet(path("admitted"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(200L),
      s"expected policy screen to admit only {200}, got $admitted")
    val sigIds = spark.read.parquet(path("sigs"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sigIds == Set(1L, 200L),
      s"blocked docs leaked signatures: $sigIds")
  }

  test("continuousAggMaintenance commits one Versioned snapshot per " +
    "micro-batch and the latest equals the full aggregate") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_streamagg").toString
    // two micro-batch files
    Seq((1L, 10L), (2L, 5L)).toDF("k", "c").coalesce(1)
      .write.parquet(s"$root/src/b0")
    Seq((1L, 3L), (3L, 7L)).toDF("k", "c").coalesce(1)
      .write.parquet(s"$root/src/b1")
    val src = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("c",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/src/*")
    val table = s"$root/agg"
    StreamingOps.continuousAggMaintenance(src, table, Seq("k"), Seq("c"))
    assert(graft.sources.Versioned.versions(spark, table) == Seq(1, 2))
    val latest = graft.sources.Versioned.read(spark, table)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(latest == Map(1L -> (2L, 13L), 2L -> (1L, 5L), 3L -> (1L, 7L)))
  }

  test("continuousSketchMaintenance: the maintained sketch equals the " +
    "from-scratch sketch over everything that streamed") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_streamcm").toString
    val b0 = Seq.fill(7)("x") ++ Seq("y", "z")
    val b1 = Seq.fill(4)("y") ++ Seq("x", "w")
    b0.toDF("k").coalesce(1).write.parquet(s"$root/src/b0")
    b1.toDF("k").coalesce(1).write.parquet(s"$root/src/b1")
    val src = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/src/*")
    val table = s"$root/sketch"
    StreamingOps.continuousSketchMaintenance(src, "k", table,
      depth = 3, width = 32)
    // one delta file set per micro-batch, replay-stable names
    val prefixes = new java.io.File(table).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet"))
      .map(_.takeWhile(_ != '_')).toSet
    assert(prefixes == Set("b0", "b1"), s"unexpected deltas: $prefixes")
    val maintained = StreamingOps.readSketch(spark, table)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val scratch = graft.ops.Sketches
      .countMinTable((b0 ++ b1).toDF("k"), "k", depth = 3, width = 32)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(maintained === scratch)

    // FULL REPLAY: a fresh checkpoint re-delivers every batch (the
    // worst at-least-once case — the whole history replays against a
    // table that already has all the deltas). Sum-merges double-count
    // under naive append; the b<id>_ rewrite protocol must converge to
    // the identical sketch instead.
    val src2 = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/src/*")
    StreamingOps.continuousSketchMaintenance(src2, "k", table,
      depth = 3, width = 32)
    val replayed = StreamingOps.readSketch(spark, table)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(replayed === scratch, "replay double-counted the deltas")
  }
}
