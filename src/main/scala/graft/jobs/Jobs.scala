package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.EtlOps
import graft.operators.Dedup
import graft.queries.Parity
import graft.sources.Sinks

/** Runnable warehouse jobs — the reference ships 12 spark-submit mains,
  * one per table (SURVEY.md §0); a user switching to this library runs
  * the same pipelines through these, re-targeted at the testdata
  * entities. Each job = read → pattern op(s) → partitioned parquet write.
  *
  * Run: sbt "runMain graft.jobs.JobRunner <job|all> <sfDir> <outDir>"
  */
object Jobs {

  private val T0 = EtlOps.FixedClock

  /** Pattern A (reference SimpleDataCleanUtils.processTable, 5 jobs):
    * latest partition → audit stamp → append into DWD. */
  private def auditAppendJob(table: String, dateCol: Option[String])(
      spark: SparkSession, sfDir: String, outDir: String): Unit = {
    val src = Tables.load(spark, sfDir, table)
    val withPart = dateCol match {
      case Some(c) => src.withColumn("etl_date",
        date_format(col(c), "yyyyMMdd"))
      case None => src.withColumn("etl_date", lit("20240101"))
    }
    val latest = EtlOps.latestPartition(withPart, "etl_date")
    Sinks.appendPartitioned(EtlOps.withAudit(latest, "dwd", "user1", T0),
      s"$outDir/dwd_$table", Seq("etl_date"))
  }

  /** Pattern B (reference CustomerInf/CouponInfo/ProductInfo): SCD merge
    * of the latest ODS slice into the DWD snapshot, dynamic-partition
    * overwrite. */
  private def scdMergeEventsJob(spark: SparkSession, sfDir: String,
                                outDir: String): Unit = {
    val ev = Tables.load(spark, sfDir, "events")
    val cutoff = 1705363200000000000L
    val dwd = EtlOps.withAudit(
      EtlOps.dedupLatest(ev.filter(col("ts") < cutoff), Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc)), "dwd", "user1", T0)
    val ods = ev.filter(col("ts") >= cutoff)
    val merged = EtlOps.scdMerge(ods, dwd, Seq("user_id"), "ts",
      Seq(col("event_id").desc))
      .withColumn("etl_date", lit("20240116"))
    Sinks.overwriteDynamicPartitions(merged, s"$outDir/dwd_user_latest",
      Seq("etl_date"))
  }

  /** Pattern C (reference OrderMaster/OrderDetail/ProductBrowse):
    * bi-store full-outer coalesce merge, append. */
  private def bistoreOrdersJob(spark: SparkSession, sfDir: String,
                               outDir: String): Unit = {
    val merged = Parity.bistoreMergeQ(spark, sfDir)
    Sinks.appendPartitioned(merged, s"$outDir/fact_order_master",
      Seq("etl_date"))
  }

  /** Pattern D (reference CustomerAddrLevelAggr): star denormalize →
    * DWS overwrite. */
  private def dwsCustomerRegionJob(spark: SparkSession, sfDir: String,
                                   outDir: String): Unit = {
    val denorm = Parity.denormalizeQ(spark, sfDir)
    Sinks.overwriteAll(denorm, s"$outDir/dws_customer_region",
      Seq("etl_date"))
  }

  /** The modern flagship: full corpus-cleaning pipeline — exact dedup,
    * MAINTAINED signature table, near-dup clustering, quality filter,
    * deterministic split — writing the cleaned training corpus
    * partitioned by split plus the signature table that every later
    * incremental screen (screenBatchJob's fuzzy stage, threshold
    * re-clustering) reads instead of re-tokenizing the corpus: at
    * 100 TB the corpus text is shingled exactly once, here. */
  private def cleanCorpusJob(spark: SparkSession, sfDir: String,
                             outDir: String): Unit = {
    val docs = Tables.load(spark, sfDir, "documents")
    // 1. exact dedup: keep min doc_id per normalized fingerprint
    val keepers = Dedup.exactDedup(docs, "text", "doc_id")
      .select(col("keeper_id").as("doc_id"))
    val exactDeduped = docs.join(keepers, Seq("doc_id"), "left_semi")
    // 2. persist the survivors' signature table (the ONE tokenization),
    //    then near-dup clustering from the stored signatures: drop
    //    non-representative cluster members
    val sigPath = s"$outDir/corpus_sigs"
    Dedup.writeSignatureTable(exactDeduped, "text", "doc_id", sigPath, k = 5)
    val pairs = Dedup.nearDupPairsFromSigs(spark, sigPath, threshold = 0.5)
    val clusters = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    val cleaned = exactDeduped.join(clusters, Seq("doc_id"), "left")
      .where(col("cluster_rep").isNull ||
        col("cluster_rep") === col("doc_id"))
      .drop("cluster_rep")
    // 3. PII scrub + 4. quality filter + 5. deterministic split
    val scored = cleaned
      .withColumn("text", graft.functions.TextFns.scrubPii(col("text")))
      .withColumn("token_cnt",
        graft.functions.TextFns.tokenCount(col("text")))
      .withColumn("bpe_token_cnt",
        graft.functions.TextFns.bpeTokenCount(col("text")))
      .where(col("n_chars") >= 50 && col("token_cnt") >= 10)
      .withColumn("split",
        when(graft.functions.TextFns.hash32(col("text")) % 100 < 80, "train")
          .when(graft.functions.TextFns.hash32(col("text")) % 100 < 90, "valid")
          .otherwise("test"))
    Sinks.overwriteAll(scored, s"$outDir/clean_corpus", Seq("split"))
  }

  /** Incremental batch screening — the daily-crawl admission job: a new
    * batch (here synthesized from the documents table) is screened
    * against the ingested corpus with exact fingerprints first, then
    * asymmetric near-dup LSH; admitted docs and the rejection audit
    * trail (which corpus doc each reject duplicates) land as two
    * tables. Candidates scale with the batch, never the corpus². */
  private def screenBatchJob(spark: SparkSession, sfDir: String,
                             outDir: String): Unit = {
    val corpus = Tables.load(spark, sfDir, "documents")
    // synthetic crawl: near-copies (fuzzy dups), verbatim copies (exact
    // dups), and genuinely novel content — one slice of each
    val batch = corpus.where(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 9000000L).as("doc_id"),
        expr("substring(text, 11)").as("text"))
      .union(corpus.where(col("doc_id") % 3 === 1)
        .select((col("doc_id") + 9500000L).as("doc_id"), col("text")))
      .union(corpus.where(col("doc_id") % 3 === 2)
        .select((col("doc_id") + 9900000L).as("doc_id"),
          concat(md5(col("text")),
            md5(concat(col("text"), lit("a")))).as("text")))
    // stage 1: exact — drop batch rows whose fingerprint is ingested.
    // exactPassed feeds three consumers (fuzzy signatures, the admitted
    // anti-join, the final write) — materialize once instead of
    // recomputing the synthesized batch + fingerprint pass each time
    val novelFp = Dedup.incrementalDedup(batch, corpus, "text", "doc_id")
      .select(col("keeper_id").as("doc_id"))
    val exactPassed = graft.ops.Materialize(
      batch.join(novelFp, Seq("doc_id"), "left_semi"),
      graft.ops.MatStrategy.Default)
    try {
      // stage 2: fuzzy — drop near-copies, keep the audit trail
      val nearHits = Dedup.incrementalNearDup(exactPassed.df, corpus,
        "text", "doc_id", k = 5, threshold = 0.5)
      val admitted = exactPassed.df.join(
        nearHits.select(col("batch_id").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      admitted.write.mode("overwrite").parquet(s"$outDir/batch_admitted")
      nearHits.write.mode("overwrite").parquet(s"$outDir/batch_rejects")
    } finally exactPassed.release()
  }

  /** Feed ingestion with quarantine: the events table's raw `props`
    * JSON strings parsed against an explicit schema; clean rows land in
    * an ODS table, unparseable lines in a replayable quarantine. */
  private def ingestPropsJob(spark: SparkSession, sfDir: String,
                             outDir: String): Unit = {
    import org.apache.spark.sql.types._
    val lines = Tables.load(spark, sfDir, "events")
      .select(col("props").as("raw_line"))
    val (clean, quarantine) = graft.sources.Ingest.splitLines(
      lines, StructType(Seq(StructField("k", LongType))))
    clean.write.mode("overwrite").parquet(s"$outDir/ods_props")
    quarantine.write.mode("overwrite").parquet(s"$outDir/ods_props_quarantine")
  }

  /** Corpus report: per-language profile + top-200 vocabulary — the
    * mixture-weight inputs, written as two small summary tables. */
  private def corpusReportJob(spark: SparkSession, sfDir: String,
                              outDir: String): Unit = {
    val docs = Tables.load(spark, sfDir, "documents")
    graft.operators.Corpus.languageStats(docs, "text", "lang")
      .write.mode("overwrite").parquet(s"$outDir/corpus_lang_stats")
    graft.operators.Corpus.topKVocab(docs, "text", 200)
      .write.mode("overwrite").parquet(s"$outDir/corpus_vocab")
  }

  /** Stratified corpus sample: deterministic per-language carve-out
    * written partitioned by language for downstream mixture assembly. */
  private def sampleCorpusJob(spark: SparkSession, sfDir: String,
                              outDir: String): Unit = {
    val docs = Tables.load(spark, sfDir, "documents")
    val sampled = graft.ops.Sampling.stratifiedSample(
      docs, col("lang"), col("doc_id"),
      Map("en" -> 0.5, "zh" -> 0.2, "de" -> 0.05), defaultRate = 0.1)
    Sinks.overwriteAll(sampled, s"$outDir/corpus_sample", Seq("lang"))
  }

  /** Continuous-ingest curation — the streaming admission service:
    * bootstraps the corpus signature table if absent, then runs the
    * documents feed (synthesized micro-batches of near-copies + novel
    * content) through StreamingOps.continuousCurate, so survivors land
    * in an admitted table and their signatures keep the screen live
    * for the next batch. One implementation with the batch screen —
    * this job IS screenBatchJob's fuzzy stage running forever. */
  private def curateStreamJob(spark: SparkSession, sfDir: String,
                              outDir: String): Unit = {
    val corpus = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val sigPath = s"$outDir/corpus_sigs"
    val fs = new org.apache.hadoop.fs.Path(sigPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(sigPath, "_graft_shingle_k")))
      Dedup.writeSignatureTable(corpus, "text", "doc_id", sigPath, k = 5)
    val srcDir = s"$outDir/feed"
    corpus.where(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 9000000L).as("doc_id"),
        expr("substring(text, 11)").as("text"))
      .union(corpus.where(col("doc_id") % 4 === 1)
        .select((col("doc_id") + 9500000L).as("doc_id"),
          concat(md5(col("text")),
            md5(concat(col("text"), lit("a")))).as("text")))
      .write.mode("overwrite").parquet(srcDir)
    val src = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    graft.streaming.StreamingOps.continuousCurate(
      src, sigPath, s"$outDir/admitted", "text", "doc_id",
      k = 5, threshold = 0.5)
  }

  /** RAG/embedding prep: corpus exploded into overlapping token-window
    * chunks, written as one chunk table. */
  private def chunkCorpusJob(spark: SparkSession, sfDir: String,
                             outDir: String): Unit = {
    val chunks = graft.operators.Corpus.chunkDocs(
      Tables.load(spark, sfDir, "documents"), "text", "doc_id",
      window = 40, stride = 30)
    chunks.write.mode("overwrite").parquet(s"$outDir/corpus_chunks")
  }

  /** Training export: the corpus written as stable content-hash shards
    * plus the manifest the trainer's loader reads. */
  private def exportShardsJob(spark: SparkSession, sfDir: String,
                              outDir: String): Unit = {
    val docs = Tables.load(spark, sfDir, "documents")
    graft.sources.ShardExport.writeSharded(docs, "text", 64,
      s"$outDir/corpus_shards")
    graft.sources.ShardExport.manifest(spark, s"$outDir/corpus_shards")
      .write.mode("overwrite").parquet(s"$outDir/corpus_shards_manifest")
  }

  /** Scan-layout rewrite: lineitem re-clustered on the ship date so
    * date-sliced scans skip files from footer stats alone. */
  private def clusterLineitemJob(spark: SparkSession, sfDir: String,
                                 outDir: String): Unit = {
    graft.sources.ClusteredWrite.writeClustered(
      Tables.load(spark, sfDir, "lineitem"),
      s"$outDir/lineitem_clustered", Seq("l_shipdate"), partitions = 32)
    ()
  }

  /** lineitem laid out on the HILBERT curve of (l_partkey, l_suppkey)
    * — the 2-D box-scan layout with the measured fewer-ranges
    * advantage over z-order (HilbertSpec: every curve step is a
    * 4-neighbor move, so per-file min/max stats skip more files for
    * the same box; p_hilbert_scan gates the index arithmetic). This
    * job makes that layout reachable from the CLI surface beside the
    * 1-D range clustering of [[clusterLineitemJob]]. */
  private def clusterLineitemHilbertJob(spark: SparkSession,
                                        sfDir: String,
                                        outDir: String): Unit = {
    graft.ops.Hilbert.writeHilbertOrdered(
      Tables.load(spark, sfDir, "lineitem"),
      s"$outDir/lineitem_hilbert", "l_partkey", "l_suppkey",
      partitions = 32)
    ()
  }

  /** Master-data cleanup: the dirtied customer master resolved end to
    * end — blocked linkage, entity clusters, golden-record survivorship
    * — written as the links table plus the merged master. Delegates to
    * the oracle-gated query pipelines (x_er_linkage / x_er_golden) so
    * the job can never drift from the verified link rule. */
  private def resolveCustomersJob(spark: SparkSession, sfDir: String,
                                  outDir: String): Unit = {
    graft.queries.TrainingData.erLinkageQ(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/customer_links")
    graft.queries.TrainingData.erGoldenQ(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/customer_golden")
  }

  /** Ingestion observability: one-scan column profiles of the event and
    * order feeds, written as one stacked report table. */
  private def profileTablesJob(spark: SparkSession, sfDir: String,
                               outDir: String): Unit = {
    val ev = graft.ops.Profiling.profile(Tables.load(spark, sfDir, "events"),
        numericCols = Seq("event_id", "user_id", "value"),
        stringCols = Seq("event_type", "props"))
      .withColumn("table_name", lit("events"))
    val ord = graft.ops.Profiling.profile(Tables.load(spark, sfDir, "orders"),
        numericCols = Seq("o_orderkey", "o_custkey", "o_totalprice"),
        stringCols = Seq("o_orderstatus", "o_orderpriority"))
      .withColumn("table_name", lit("orders"))
    ev.unionByName(ord).write.mode("overwrite")
      .parquet(s"$outDir/table_profiles")
  }

  /** Crawl hygiene: line-level boilerplate scrub over the synthesized
    * multi-line pages, cleaned text written back as the corpus the
    * dedup stages consume. */
  private def scrubBoilerplateJob(spark: SparkSession, sfDir: String,
                                  outDir: String): Unit = {
    val pages = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        concat(lit("nav "), col("source"), lit(" home\n"), col("text"),
          lit("\ncopyright footer")).as("text"))
    graft.operators.Corpus
      .removeBoilerplateLines(pages, "text", "doc_id", 2L)
      .write.mode("overwrite").parquet(s"$outDir/corpus_scrubbed")
  }

  /** ANN serving prep: build the persisted SQ8∘IVF index over the
    * embedding corpus ONCE (quantizer training + encode + list layout),
    * then run a search against the stored artifact and write the top-k
    * — the ingest-then-serve split every repeated-search deployment
    * runs. */
  private def buildAnnIndexJob(spark: SparkSession, sfDir: String,
                               outDir: String): Unit = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val idx = s"$outDir/ann_index"
    graft.operators.Similarity.writeIvfSqIndex(
      emb, "vec_id", "embedding", idx, nlist = 16, iters = 2)
    graft.operators.Similarity.ivfSqTopKFromIndex(
        emb.filter(col("vec_id") < 20), "vec_id", "embedding", idx, 5)
      .write.mode("overwrite").parquet(s"$outDir/ann_neighbors")
  }

  /** Parallel-pair harvesting: margin-mined mutual nearest neighbors
    * across the even/odd embedding sub-corpora, written as the aligned
    * pair table a translation-pair pipeline would consume. Delegates to
    * the oracle-gated query (x_bitext_mine). */
  private def mineBitextJob(spark: SparkSession, sfDir: String,
                            outDir: String): Unit =
    graft.queries.TrainingData.bitextMineQ(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/bitext_pairs")

  /** Privacy release: the customer table under k=5 cell suppression on
    * its quasi-identifier tuple, written alongside the risky-group
    * worklist — the export gate a data-release pipeline runs last. */
  private def releaseCustomersJob(spark: SparkSession, sfDir: String,
                                  outDir: String): Unit = {
    val c = Tables.load(spark, sfDir, "customer").select(
      col("c_custkey"), col("c_mktsegment").as("segment"),
      col("c_nationkey").cast("long").as("nation"),
      floor(col("c_acctbal") / 1000.0d).cast("long").as("bal_kb"))
    val quasi = Seq("segment", "nation", "bal_kb")
    graft.ops.Privacy.suppressBelowK(c, quasi, 5L)
      .write.mode("overwrite").parquet(s"$outDir/customer_release")
    graft.ops.Privacy.kAnonymityReport(c, quasi, 5L)
      .where(col("at_risk"))
      .write.mode("overwrite").parquet(s"$outDir/customer_risky_groups")
  }

  /** Availability rollup: each event opens a deterministic lease
    * window; overlapping-or-touching windows per user coalesce into
    * maximal availability intervals (TimeSeries.mergeIntervals). */
  private def mergeAvailabilityJob(spark: SparkSession, sfDir: String,
                                   outDir: String): Unit = {
    val e = Tables.load(spark, sfDir, "events")
    val iv = e.select(col("user_id"), col("event_id"),
      col("ts").as("start_ns"),
      (col("ts") + (col("event_id") % 900 + lit(60L)) * 1000000000L)
        .as("end_ns"))
    graft.operators.TimeSeries
      .mergeIntervals(iv, "user_id", "start_ns", "end_ns", "event_id")
      .write.mode("overwrite").parquet(s"$outDir/user_availability")
  }

  /** Skip-index build: lineitem rewritten range-clustered on
    * l_orderkey with a per-file min/max stats table, then a pruned
    * range read exercised against the fresh index — the ingest-time
    * layout work that makes later point/range scans touch only their
    * files. */
  private def indexLineitemJob(spark: SparkSession, sfDir: String,
                               outDir: String): Unit = {
    val p = s"$outDir/lineitem_skip"
    graft.sources.ClusteredWrite.writeClustered(
      Tables.load(spark, sfDir, "lineitem"),
      p, Seq("l_orderkey"), partitions = 8)
    graft.sources.SkippingIndex.buildStats(spark, p, Seq("l_orderkey"))
    graft.sources.SkippingIndex.readRange(spark, p, "l_orderkey",
        1000L, 5000L)
      .write.mode("overwrite").parquet(s"$outDir/lineitem_slice")
  }

  /** PQ compression: train the per-subspace codebooks once and write
    * the corpus as its m-code rows — the 2-bytes-per-vector
    * representation an ADC search serves from. */
  private def encodePqJob(spark: SparkSession, sfDir: String,
                          outDir: String): Unit = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val cbs = graft.operators.Similarity.pqCodebooks(
      emb, "vec_id", "embedding", m = 4, ksub = 16, iters = 2)
    spark.createDataFrame(cbs.map { case (s, c, v) => (s, c, v) })
      .toDF("s", "c_id", "c_v")
      .write.mode("overwrite").parquet(s"$outDir/pq_codebooks")
    graft.operators.Similarity
      .pqEncode(emb, "vec_id", "embedding", cbs, 4)
      .write.mode("overwrite").parquet(s"$outDir/pq_codes")
  }

  /** Bloom skip-index build: orders rewritten hashed by customer (the
    * layout where min/max stats prune nothing), a per-file Bloom
    * postings table built over o_custkey, then a point probe exercised
    * through it — the ingest-time work that turns customer lookups
    * from 8 file opens into 1. */
  private def bloomOrdersJob(spark: SparkSession, sfDir: String,
                             outDir: String): Unit = {
    val p = s"$outDir/orders_bloom_t"
    Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
      .repartition(8, col("o_custkey"))
      .write.mode("overwrite").parquet(p)
    graft.sources.SkippingIndex.buildBloom(spark, p, "o_custkey")
    graft.sources.SkippingIndex.readPoint(spark, p, "o_custkey", 42L)
      .write.mode("overwrite").parquet(s"$outDir/orders_cust42")
  }

  /** Sparse-similarity build: the TF-IDF trigram posting table written
    * once (the inverted index a 100 TB corpus maintains at ingest),
    * then the thresholded cosine pair set derived from it. */
  private def similarDocsJob(spark: SparkSession, sfDir: String,
                             outDir: String): Unit = {
    val d = Tables.load(spark, sfDir, "documents")
    val postings = graft.operators.SparseSim.tfidfPostings(
      d, "text", "doc_id", n = 3, maxDf = 50)
    postings.write.mode("overwrite").parquet(s"$outDir/doc_postings")
    graft.operators.SparseSim
      .cosinePairs(spark.read.parquet(s"$outDir/doc_postings"), 0.2)
      .write.mode("overwrite").parquet(s"$outDir/doc_similar_pairs")
  }

  /** Keyed-scan scale path composed end to end: documents land
    * range-clustered on the key column (tight per-file min/max), then
    * the ^-anchored rowkey-regex read — which RegexPrefixPruning makes
    * sargable — scans back ONLY the matching key range's files. The
    * 100 TB shape of the reference's S3/P9 HBase snapshot filter. */
  private def scanRowkeysJob(spark: SparkSession, sfDir: String,
                             outDir: String): Unit = {
    val p = s"$outDir/docs_by_source"
    graft.sources.ClusteredWrite.writeClustered(
      Tables.load(spark, sfDir, "documents"), p, Seq("source"), 8)
    EtlOps.keyedSnapshotScan(spark.read.parquet(p), "source",
        "^src1[0-9]$")
      .write.mode("overwrite").parquet(s"$outDir/docs_src1x")
  }

  /** Eval-integrity audit: the three leakage lenses over ONE signature
    * pass — direct 8-gram contamination against the benchmark set,
    * near-dup pairs touching a benchmark doc, and transitive seed
    * diffusion (personalized PageRank through the duplicate graph) —
    * joined into a single per-doc risk table a release gate reads.
    * The corpus is shingled once (the persisted signature table);
    * every lens composes from it or from row-local grams. */
  private def auditLeakageJob(spark: SparkSession, sfDir: String,
                              outDir: String): Unit = {
    val docs = Tables.load(spark, sfDir, "documents")
    val evalSet = docs.where(col("doc_id") < 10)
    val sigPath = s"$outDir/leakage_sigs"
    Dedup.writeSignatureTable(docs, "text", "doc_id", sigPath, k = 5)
    val pairs = Dedup.nearDupPairsFromSigs(spark, sigPath,
      threshold = 0.5)
    val directHits = pairs
      .where(col("doc_a") < 10 || col("doc_b") < 10)
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .where(col("doc_id") >= 10).distinct()
      .withColumn("near_dup_of_eval", lit(true))
    val diffusion = graft.operators.Graph.personalizedPageRank(
      pairs, "doc_a", "doc_b", evalSet, "doc_id", iters = 6)
      .select(col("node").as("doc_id"),
        col("rank").as("eval_proximity_rank"))
    val contam = Dedup.contaminationReport(docs, evalSet, "text",
      "doc_id")
    docs.select(col("doc_id"), col("source"))
      .join(contam.select(col("doc_id"), col("contamination")),
        Seq("doc_id"), "left")
      .join(directHits, Seq("doc_id"), "left")
      .join(diffusion, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("contamination"), lit(0.0d))
          .as("contamination"),
        coalesce(col("near_dup_of_eval"), lit(false))
          .as("near_dup_of_eval"),
        coalesce(col("eval_proximity_rank"), lit(0L))
          .as("eval_proximity_rank"))
      .write.mode("overwrite").parquet(s"$outDir/leakage_risk")
  }

  /** Cardinality-sketch maintenance: day-slice HLL sketches of active
    * users persisted as a table, a straggler slice APPENDED as new rows
    * (history never re-read — the maintained-state contract), and the
    * per-type distinct estimate computed from the sketch table alone. */
  private def sketchUsersJob(spark: SparkSession, sfDir: String,
                             outDir: String): Unit = {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_type"), col("user_id"),
        expr("(ts div 1000) div 86400000000").as("slice"))
    val p = s"$outDir/user_sketches"
    graft.ops.Sketches
      .hllSliceSketches(ev.where(col("slice") % 7 =!= 0),
        "event_type", "slice", "user_id")
      .write.mode("overwrite").parquet(p)
    graft.ops.Sketches
      .hllSliceSketches(ev.where(col("slice") % 7 === 0),
        "event_type", "slice", "user_id")
      .write.mode("append").parquet(p)
    graft.ops.Sketches.hllEstimate(spark.read.parquet(p), "event_type")
      .write.mode("overwrite").parquet(s"$outDir/user_distinct_est")
  }

  /** Frequency-sketch maintenance: the Count-Min cell table over the
    * corpus 5-gram stream persisted as a d×w-row table (broadcastable,
    * answers any later point query without re-reading the corpus),
    * incrementally mergeable by cell-wise sum. */
  private def sketchGramsJob(spark: SparkSession, sfDir: String,
                             outDir: String): Unit = {
    val grams = Tables.load(spark, sfDir, "documents")
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("doc_id"))
      .select(explode(expr(
        "transform(sequence(1, greatest(length(text)-4, 1))," +
          " i -> substring(text, i, 5))")).as("gram"))
    graft.ops.Sketches.countMinTable(grams, "gram", 3, 2048)
      .write.mode("overwrite").parquet(s"$outDir/gram_sketch")
  }

  /** Community labeling: near-dup candidate pairs over the corpus at
    * the loose screen threshold, then deterministic label-propagation
    * communities — the duplicate-network map reviewers triage by. */
  private def communityDocsJob(spark: SparkSession, sfDir: String,
                               outDir: String): Unit = {
    val pairs = Dedup.minhashNearDupPairs(
      Tables.load(spark, sfDir, "documents"), "text", "doc_id",
      k = 5, threshold = 0.2)
    graft.operators.Graph.labelPropagation(pairs, "doc_a", "doc_b")
      .write.mode("overwrite").parquet(s"$outDir/doc_communities")
  }

  /** Missing-edge ranking over the near-dup graph with the production
    * hub guard: the dropped-hubs AUDIT lands first (the purge is lossy
    * by design — the EntityResolution.purgedBlocks contract: a
    * pipeline that cannot tolerate evidence loss alerts on a non-empty
    * audit before trusting the ranking), then the guarded common-
    * neighbor / resource-allocation candidate list. The pair screen is
    * materialized once and feeds both outputs. */
  private def rankMissingEdgesJob(spark: SparkSession, sfDir: String,
                                  outDir: String): Unit = {
    val pairs = Dedup.minhashNearDupPairs(
      Tables.load(spark, sfDir, "documents"), "text", "doc_id",
      k = 5, threshold = 0.2)
    graft.operators.Graph.linkPredictionDroppedHubs(
        pairs, "doc_a", "doc_b", maxDegree = 2L)
      .write.mode("overwrite").parquet(s"$outDir/link_dropped_hubs")
    graft.operators.Graph.linkPrediction(
        pairs, "doc_a", "doc_b", maxDegree = 2L)
      .write.mode("overwrite").parquet(s"$outDir/link_candidates")
  }

  /** Excerpt/boilerplate-wrap audit: write the corpus signature table
    * (reusable by every later screen), then the asymmetric containment
    * pairs — near-SUBSET relations whose Jaccard sits below the
    * symmetric dedup bar. */
  private def excerptAuditJob(spark: SparkSession, sfDir: String,
                              outDir: String): Unit = {
    val sigs = s"$outDir/excerpt_sigs"
    Dedup.writeSignatureTable(
      Tables.load(spark, sfDir, "documents"), "text", "doc_id", sigs)
    Dedup.containmentPairsFromSigs(spark, sigs, minContainmentBp = 5000L)
      .write.mode("overwrite").parquet(s"$outDir/excerpt_pairs")
  }

  /** Quote audit — the tiny-excerpt twin of [[excerptAuditJob]]: the
    * LSH containment screen's recall is bounded by the pair's Jaccard,
    * so a short verbatim quote inside a large page never band-collides;
    * this job maintains the winnowing fingerprint table with the
    * sig-table LIFECYCLE (read-or-create, then append only documents
    * the table hasn't fingerprinted yet — corpus text is shingled once
    * in its life, and a re-run after new documents land pays O(new))
    * and writes the positional containment report over it —
    * deterministic recall for any shared run of k+window−1 characters,
    * at any size ratio. */
  private def quoteAuditJob(spark: SparkSession, sfDir: String,
                            outDir: String): Unit = {
    import graft.operators.Corpus
    val fps = s"$outDir/winnow_fps"
    val d = Tables.load(spark, sfDir, "documents")
    val marker = new org.apache.hadoop.fs.Path(fps, "_graft_winnow_kw")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      Corpus.writeWinnowTable(d, "text", "doc_id", fps, k = 5, window = 4)
    } else {
      val (k, w) = Corpus.winnowTableParams(spark, fps)
      val known = spark.read.parquet(fps)
        .select(col("id").as("doc_id")).distinct()
      val fresh = d.join(known, Seq("doc_id"), "left_anti")
      // a doc whose text is too short to fingerprint never enters the
      // table, so it would re-qualify as "fresh" each run — the isEmpty
      // guard keeps a converged table from accreting empty appends
      if (!fresh.isEmpty)
        Corpus.appendToWinnowTable(fresh, "text", "doc_id", fps, k, w)
    }
    Corpus.winnowingContainment(
        spark.read.parquet(fps), maxDf = 50, minContainmentBp = 8000L)
      .write.mode("overwrite").parquet(s"$outDir/quote_pairs")
  }

  /** ANN index-quality audit: recall@5 of the trained-IVF search
    * against the exact brute-force ranking over the sampled query set
    * — the number that gates an index (or its nlist/nprobe setting)
    * before it serves. */
  private def auditAnnJob(spark: SparkSession, sfDir: String,
                          outDir: String): Unit = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 20)
    graft.operators.Similarity.recallReport(
      graft.operators.Similarity.bruteForceTopK(q, emb,
        "vec_id", "embedding", 5),
      graft.operators.Similarity.ivfTopKTrained(q, emb,
        "vec_id", "embedding", 5, nlist = 16, nprobe = 4, iters = 2))
      .write.mode("overwrite").parquet(s"$outDir/ann_recall_audit")
  }

  /** Distribution-matched corpus selection (the DSIR recipe): score
    * every document by hashed-bigram importance against the trusted
    * English slice of the first three sources, persist the full weight
    * table (the audit artifact), and the selected top slice as the
    * curated output. */
  private def selectCorpusJob(spark: SparkSession, sfDir: String,
                              outDir: String): Unit = {
    val docs = Tables.load(spark, sfDir, "documents")
    val wPath = s"$outDir/dsir_weights"
    graft.operators.Selection.dsirWeights(docs, "text", "doc_id",
        isTarget = col("lang") === "en" &&
          col("source").isin("src0", "src1", "src2"))
      .write.mode("overwrite").parquet(wPath)
    graft.operators.Selection
      .selectByWeight(spark.read.parquet(wPath), keep = 100)
      .where(col("selected"))
      .join(docs, col("id") === col("doc_id"))
      .select(docs.columns.map(col): _*)
      .write.mode("overwrite").parquet(s"$outDir/corpus_selected")
  }

  /** Dense-core triage: k-core decomposition of the near-dup graph —
    * the subgraph every reviewer starts from, separating template
    * farms (which survive the peel) from incidental pairwise overlap. */
  private def coreDocsJob(spark: SparkSession, sfDir: String,
                          outDir: String): Unit = {
    val pairs = Dedup.minhashNearDupPairs(
      Tables.load(spark, sfDir, "documents"), "text", "doc_id",
      k = 5, threshold = 0.2)
    graft.operators.Graph.kCore(pairs, "doc_a", "doc_b", k = 2)
      .write.mode("overwrite").parquet(s"$outDir/doc_cores")
  }

  /** Media feature report: REAL raster channel sums and REAL PCM DSP
    * features over the corpus's media column — the pixel/signal-side
    * quality screen (black-frame, silence, clipping triage) run at
    * ingest. */
  private def mediaFeaturesJob(spark: SparkSession, sfDir: String,
                               outDir: String): Unit = {
    val media = graft.multimodal.Multimodal.withMediaBinary(
      Tables.load(spark, sfDir, "documents"), "text")
    graft.multimodal.Multimodal.extractImageFeatures(media)
      .write.mode("overwrite").parquet(s"$outDir/image_features")
    graft.multimodal.Multimodal.extractAudioFeatures(media)
      .write.mode("overwrite").parquet(s"$outDir/audio_features")
  }

  /** Winnowing match run: coverage-guaranteed fingerprint selection
    * over the corpus, then the MOSS-style shared-fingerprint candidate
    * pairs — the deterministic complement to the MinHash screen. */
  private def winnowCorpusJob(spark: SparkSession, sfDir: String,
                              outDir: String): Unit = {
    val docs = Tables.load(spark, sfDir, "documents")
    graft.operators.Corpus
      .winnowingFingerprints(docs, "text", "doc_id")
      .write.mode("overwrite").parquet(s"$outDir/winnow_fingerprints")
    graft.operators.Corpus
      .winnowingCandidates(docs, "text", "doc_id", minShared = 2)
      .write.mode("overwrite").parquet(s"$outDir/winnow_candidates")
  }

  /** Thumbnail pipeline: the corpus's media column decoded and
    * nearest-neighbor resized to 4×3 thumbnails with their integer
    * raster fingerprints — the media-side dedup key table. */
  private def thumbnailCorpusJob(spark: SparkSession, sfDir: String,
                                 outDir: String): Unit = {
    val media = graft.multimodal.Multimodal.withMediaBinary(
      Tables.load(spark, sfDir, "documents"), "text")
    graft.multimodal.Multimodal.resizeReal(media, 4, 3)
      .write.mode("overwrite").parquet(s"$outDir/thumbnails")
  }

  /** Governance sweep: the nightly compliance + dataset-card pass in
    * one job — PII detection rollup, l-diversity homogeneity audit,
    * split×language balance, the capped language mixture, and the
    * embedding ingest QA. Five release tables from five one-scan
    * aggregations; the job a 100 TB deployment schedules before any
    * export leaves the boundary. */
  private def governCorpusJob(spark: SparkSession, sfDir: String,
                              outDir: String): Unit = {
    import graft.queries.TrainingData.queries
    Seq("x_pii_summary" -> "pii_summary",
      "x_l_diversity" -> "l_diversity",
      "x_eval_balance" -> "eval_balance",
      "x_quota_mix" -> "quota_mix",
      "x_embedding_audit" -> "embedding_audit")
      .foreach { case (q, out) =>
        queries(q)(spark, sfDir)
          .write.mode("overwrite").parquet(s"$outDir/$out")
      }
  }

  /** The disclosure-ladder sweep as one runnable: k-anonymity,
    * l-diversity, t-closeness, and the randomized-response release —
    * the four reports a privacy review reads together, over the same
    * release candidate (customer quasi tuple; document sensitive
    * attribute). */
  private def auditPrivacyJob(spark: SparkSession, sfDir: String,
                              outDir: String): Unit = {
    import graft.queries.TrainingData.queries
    Seq("x_k_anonymity" -> "release_k_anon",
      "x_l_diversity" -> "audit_l_diversity",
      "x_t_closeness" -> "audit_t_closeness",
      "x_dp_release" -> "dp_release")
      .foreach { case (q, out) =>
        queries(q)(spark, sfDir)
          .write.mode("overwrite").parquet(s"$outDir/$out")
      }
  }

  /** Line-level corpus hygiene: C4 content rules first (terminal
    * punctuation / min words / blacklist, with the per-rule counter
    * report), then corpus-wide first-wins line dedup over the
    * SURVIVING lines. Stage 2 reads stage 1's WRITTEN table — the
    * maintained-table lesson: the rebuilt text is scanned once from
    * parquet, not recomputed per downstream reference. */
  private def cleanLinesJob(spark: SparkSession, sfDir: String,
                            outDir: String): Unit = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    graft.operators.Corpus.c4LineClean(docs, "text", "doc_id")
      .write.mode("overwrite").parquet(s"$outDir/c4_line_report")
    val cleaned = spark.read.parquet(s"$outDir/c4_line_report")
      .select(col("doc_id"), col("clean_text").as("text"))
    graft.operators.Corpus.dedupLinesKeepFirst(cleaned, "text", "doc_id")
      .write.mode("overwrite").parquet(s"$outDir/line_clean_docs")
  }

  /** The serving-configuration tuner: the stored index's nprobe
    * recall/cost pareto table, written for the operator who picks the
    * production (nprobe, latency) point. */
  private def tuneAnnJob(spark: SparkSession, sfDir: String,
                         outDir: String): Unit =
    graft.queries.TrainingData.queries("x_ann_pareto")(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/ann_pareto")

  /** Unigram-LM tokenizer training pipeline — the BPE lane's
    * probabilistic sibling as a production entry point: the scored
    * vocabulary is READ-OR-CREATED (a tokenizer is trained once in a
    * corpus's life — the sig-table contract), then the pretoken table
    * is Viterbi-segmented through the codegen'd DP and the hard-EM
    * usage report (the statistics the next prune round reads) is
    * written beside the segmentations. Pretokens are capped at 64
    * chars here — the operator cap, not the oracle's 20-char DP-unroll
    * cap (the expression is O(len·4) at any length). */
  private def trainTokenizerJob(spark: SparkSession, sfDir: String,
                                outDir: String): Unit = {
    import graft.operators.Unigram
    val vocabPath = s"$outDir/unigram_vocab"
    val d = Tables.load(spark, sfDir, "documents")
    val marker = new org.apache.hadoop.fs.Path(vocabPath, "_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker))
      Unigram.trainVocab(d, "text", topMulti = 96, maxWordLen = 64)
        .write.mode("overwrite").parquet(vocabPath)
    // vocab budget (GRAFT_VOCAB_BUDGET, the CLI surface's env-based
    // parameterization, like SPARK_GRAFT_CPUS): when set, the seed
    // vocabulary is refined by the budgeted hard-EM loop (two
    // segment→usage→cut→rescore rounds — Unigram.trainToBudget, the
    // x_unigram_budget lane) and THAT artifact ships; unset keeps the
    // seed vocabulary.
    val vocabDf = sys.env.get("GRAFT_VOCAB_BUDGET").map(_.toInt) match {
      case Some(b) =>
        val budgeted = s"$outDir/unigram_vocab_budgeted"
        Unigram.trainToBudget(
            Unigram.wordCounts(d, "text", maxWordLen = 64),
            spark.read.parquet(vocabPath), b, rounds = 2)
          .write.mode("overwrite").parquet(budgeted)
        spark.read.parquet(budgeted)
      case None => spark.read.parquet(vocabPath)
    }
    val vocab = vocabDf.orderBy(col("piece"))
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    val seg = Unigram.segmentWords(
      Unigram.wordCounts(d, "text", maxWordLen = 64), vocab)
    seg.write.mode("overwrite").parquet(s"$outDir/unigram_segments")
    Unigram.usageReport(
        spark.read.parquet(s"$outDir/unigram_segments"), vocabDf)
      .write.mode("overwrite").parquet(s"$outDir/unigram_usage")
  }

  /** Warm-start PageRank maintenance: the duplicate-hub ranking kept
    * fresh the incremental way — the first run pays the cold 10
    * rounds from uniform; every later run RESUMES from the stored
    * ranks for 3 refresh rounds over the current near-dup graph
    * (power iteration converges from any start, and a small graph
    * delta leaves most stored ranks at the new fixed point already).
    * The output is spill-materialized before the overwrite, so
    * writing back over the ranks just read is safe. */
  private def refreshPagerankJob(spark: SparkSession, sfDir: String,
                                 outDir: String): Unit = {
    val ranksPath = s"$outDir/pagerank_ranks"
    val pairs = Dedup.minhashNearDupPairs(
      Tables.load(spark, sfDir, "documents"), "text", "doc_id",
      k = 5, threshold = 0.5)
    val marker = new org.apache.hadoop.fs.Path(ranksPath, "_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker))
      graft.operators.Graph.pageRank(pairs, "doc_a", "doc_b",
        iters = 10)
        .write.mode("overwrite").parquet(ranksPath)
    else {
      // warm path emits the STALENESS WITNESS beside the ranks: the
      // final round carries the previous rank (zero extra shuffle), so
      // the max round-over-round movement — whether 3 rounds sufficed
      // for this delta — is one ungrouped max. A non-converged refresh
      // is visible in pagerank_witness instead of shipping silently.
      val r = graft.operators.Graph.pageRankWarmM(pairs, "doc_a",
        "doc_b", spark.read.parquet(ranksPath), "node", "rank",
        iters = 3, keepPrevRank = true).df
      r.agg(max(abs(col("rank") - col("prev_rank")))
          .as("max_delta_micro"))
        .select(col("max_delta_micro"),
          (col("max_delta_micro") <= 1000L).as("converged"))
        .write.mode("overwrite").parquet(s"$outDir/pagerank_witness")
      r.select(col("node"), col("rank"))
        .write.mode("overwrite").parquet(ranksPath)
    }
  }

  /** EXIF capture-metadata pass over the corpus's media column — the
    * codec-free byte walk (JPEG APP1 / TIFF IFD): orientation,
    * capture timestamp, byte order, with corrupt claims quarantined.
    * The stage that feeds orientation normalization and capture-time
    * temporal splits. */
  private def mediaExifJob(spark: SparkSession, sfDir: String,
                           outDir: String): Unit = {
    graft.multimodal.Multimodal.extractExif(
        graft.multimodal.Multimodal.withMediaBinary(
          Tables.load(spark, sfDir, "documents"), "text"))
      .write.mode("overwrite").parquet(s"$outDir/media_exif")
    // GRAFT_EXIF_SCRUB=1: the quarantine-preserving location scrub —
    // image-borne GPS is PII the text scrub lane structurally cannot
    // see. The scrubbed table nulls the coordinates; the quarantine
    // table keeps every row a privacy gate must hold back (GPS-bearing
    // OR corrupt-claim — a malformed GPS IFD is never silently passed).
    if (sys.env.get("GRAFT_EXIF_SCRUB").contains("1")) {
      val exif = spark.read.parquet(s"$outDir/media_exif")
      exif.withColumn("gps_lat_udeg", lit(null).cast("long"))
        .withColumn("gps_lon_udeg", lit(null).cast("long"))
        .write.mode("overwrite").parquet(s"$outDir/media_exif_scrubbed")
      exif.where(col("gps_lat_udeg").isNotNull ||
          col("gps_lon_udeg").isNotNull || col("quarantined"))
        .select(col("doc_id"), col("quarantined"),
          (col("gps_lat_udeg").isNotNull ||
            col("gps_lon_udeg").isNotNull).as("located"))
        .write.mode("overwrite").parquet(s"$outDir/media_gps_quarantine")
    }
  }

  /** PCA artifacts for the embedding corpus: the top principal
    * direction (with the mean) persisted as an O(d) table, and the
    * per-vector projection + residual-variance report — the whitening
    * inputs an embedding pipeline stores beside its ANN index (a
    * dominant shared direction drowns cosine contrast; this is the
    * measured fix). */
  private def embedPcaJob(spark: SparkSession, sfDir: String,
                          outDir: String): Unit = {
    import spark.implicits._
    val q = graft.operators.Similarity.pcaQuantized(
      Tables.load(spark, sfDir, "embeddings"), "vec_id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (m, v) = graft.operators.Similarity.pcaTopComponent(q, rounds = 6)
      (1 to m.length).map(i => (i.toLong, m(i - 1), v(i - 1)))
        .toDF("i", "mean_q", "dir_q")
        .write.mode("overwrite").parquet(s"$outDir/pca_direction")
      graft.operators.Similarity.pcaResidualReport(q, m, v)
        .write.mode("overwrite").parquet(s"$outDir/pca_projection")
    } finally { q.unpersist(false); () }
  }

  /** Blocklist screen over documents: per-(doc, term) Aho–Corasick hit
    * counts plus the per-doc policy verdict. Terms from
    * GRAFT_BLOCK_TERMS (comma-separated), thresholds from
    * GRAFT_BLOCK_REVIEW_AT / GRAFT_BLOCK_AT. One automaton pass per
    * document, zero exchanges in both outputs. */
  private def screenBlocklistJob(spark: SparkSession, sfDir: String,
                                 outDir: String): Unit = {
    val terms = sys.env.getOrElse("GRAFT_BLOCK_TERMS",
      "merge,scan,batch stream").split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq
    val reviewAt = sys.env.getOrElse("GRAFT_BLOCK_REVIEW_AT", "12").toLong
    val blockAt = sys.env.getOrElse("GRAFT_BLOCK_AT", "20").toLong
    val d = Tables.load(spark, sfDir, "documents")
    graft.operators.Blocklist.scanCounts(d, "text", "doc_id", terms)
      .write.mode("overwrite").parquet(s"$outDir/blocklist_hits")
    graft.operators.Blocklist
      .policyReport(d, "text", "doc_id", terms, reviewAt, blockAt)
      .write.mode("overwrite").parquet(s"$outDir/blocklist_verdicts")
    graft.operators.Blocklist
      .scrub(d, "text", terms,
        sys.env.getOrElse("GRAFT_BLOCK_REPL", "<BLOCKED>"))
      .write.mode("overwrite").parquet(s"$outDir/blocklist_clean")
  }

  /** Generation-eval overlap report: ROUGE-1/2 P/R/F1 + BLEU clip
    * metrics between each document and its near-dup mutation (the
    * corpus's natural paraphrase pair) — integer basis points. */
  private def evalOverlapJob(spark: SparkSession, sfDir: String,
                             outDir: String): Unit = {
    val pairs = Tables.load(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.expr("substring(text, 11)").as("cand"),
        org.apache.spark.sql.functions.col("text").as("ref"))
    graft.operators.TextEval.rougeBleuReport(pairs, "doc_id", "cand", "ref")
      .write.mode("overwrite").parquet(s"$outDir/overlap_report")
  }

  /** Generation-eval edit-rate report: token-level edit distance and
    * WER basis points between each document and its near-dup mutation
    * — the edit-distance axis beside eval_overlap's n-gram clips. */
  private def evalWerJob(spark: SparkSession, sfDir: String,
                         outDir: String): Unit = {
    val pairs = Tables.load(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.expr("substring(text, 11)").as("cand"),
        org.apache.spark.sql.functions.col("text").as("ref"))
    graft.operators.TextEval.tokenEditReport(pairs, "doc_id", "cand", "ref")
      .write.mode("overwrite").parquet(s"$outDir/wer_report")
  }

  /** WordPiece trainer pipeline: learn GRAFT_WP_ROUNDS likelihood
    * merges (default 3) over the corpus, persist the merge table and
    * the greedy segmentation of the corpus's distinct pretokens under
    * the trained vocabulary — the BERT-family third trainer beside
    * train_tokenizer's BPE+unigram lanes. */
  private def trainWordpieceJob(spark: SparkSession, sfDir: String,
                                outDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val rounds = sys.env.getOrElse("GRAFT_WP_ROUNDS", "3").toInt
    val d = Tables.load(spark, sfDir, "documents")
    val merges = graft.operators.WordPiece.trainMerges(d, "text", rounds)
    merges.write.mode("overwrite").parquet(s"$outDir/wordpiece_merges")
    val learned = merges.orderBy(col("ord")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = graft.operators.WordPiece.finalSymbols(d, "text", learned)
    val words = graft.operators.WordPiece.pretokens(d, "text").distinct()
    graft.operators.WordPiece.segmentWords(words, "word", vocab)
      .write.mode("overwrite").parquet(s"$outDir/wordpiece_segments")
  }

  /** Model-based quality screen: train GRAFT_QM_ROUNDS batch-perceptron
    * rounds (default 4, exact integers) over token-statistic features
    * with the diversity-rule label, persist the per-round weight table
    * and the corpus scored under the final weights — the trainable
    * filter beside govern_corpus's rule-based gates. */
  private def trainQualityModelJob(spark: SparkSession, sfDir: String,
                                   outDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val rounds = sys.env.getOrElse("GRAFT_QM_ROUNDS", "4").toInt
    val feats = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        split(lower(trim(col("text"))), "\\s+").as("t"))
      .select(col("doc_id"),
        when(lit(4) * size(array_distinct(col("t"))) >=
          lit(3) * size(col("t")), 1L).otherwise(-1L).as("y"),
        lit(1L).as("f1"), size(col("t")).cast("long").as("f2"),
        size(array_distinct(col("t"))).cast("long").as("f3"),
        (size(col("t")) - size(array_distinct(col("t"))))
          .cast("long").as("f4"))
    val fc = Seq("f1", "f2", "f3", "f4")
    val trained = graft.operators.Perceptron.train(feats, "y", fc, rounds)
    trained.write.mode("overwrite").parquet(s"$outDir/quality_weights")
    val last = trained.orderBy(col("round").desc).limit(1).collect()(0)
    graft.operators.Perceptron
      .score(feats, fc, (1 to 4).map(j => last.getLong(1 + j)))
      .select(col("doc_id"), col("y"), col("score"), col("predicted"))
      .write.mode("overwrite").parquet(s"$outDir/quality_scores")
  }

  /** Maintained-screen-table lifecycle: build the winnow fingerprint
    * table + signature table the ingest screens probe (clustered +
    * per-file envelope stats + doc-keyed projection from birth),
    * append one admitted batch so each table carries a second
    * generation, then COMPACT both into single re-clustered
    * generations — the layout pass a long-lived curate loop schedules
    * so its per-batch pruned reads keep their kept ≤ probes bound. */
  private def compactScreenTablesJob(spark: SparkSession, sfDir: String,
                                     outDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val base = docs.where(col("doc_id") % 5 =!= 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    val fp = s"$outDir/winnow_table"
    val sig = s"$outDir/sig_table"
    graft.operators.Corpus.writeWinnowTable(base, "text", "doc_id", fp)
    graft.operators.Dedup.writeSignatureTable(base, "text", "doc_id", sig)
    graft.operators.Corpus.appendToWinnowTable(batch, "text", "doc_id", fp)
    graft.operators.Dedup.appendToSignatureTable(batch, "text", "doc_id", sig)
    graft.operators.Corpus.compactWinnowTable(spark, fp, s"${fp}_compact")
    graft.operators.Dedup.compactSignatureTable(spark, sig, s"${sig}_compact")
  }

  val all: Map[String, (SparkSession, String, String) => Unit] = Map(
    "compact_screen_tables" -> (compactScreenTablesJob _),
    "screen_blocklist" -> (screenBlocklistJob _),
    "eval_overlap" -> (evalOverlapJob _),
    "eval_wer" -> (evalWerJob _),
    "train_wordpiece" -> (trainWordpieceJob _),
    "train_quality_model" -> (trainQualityModelJob _),
    "train_tokenizer" -> (trainTokenizerJob _),
    "embed_pca" -> (embedPcaJob _),
    "refresh_pagerank" -> (refreshPagerankJob _),
    "media_exif" -> (mediaExifJob _),
    "audit_privacy" -> (auditPrivacyJob _),
    "clean_lines" -> (cleanLinesJob _),
    "tune_ann" -> (tuneAnnJob _),
    "govern_corpus" -> (governCorpusJob _),
    "audit_ann" -> (auditAnnJob _),
    "select_corpus" -> (selectCorpusJob _),
    "core_docs" -> (coreDocsJob _),
    "media_features" -> (mediaFeaturesJob _),
    "winnow_corpus" -> (winnowCorpusJob _),
    "thumbnail_corpus" -> (thumbnailCorpusJob _),
    "bloom_orders" -> (bloomOrdersJob _),
    "similar_docs" -> (similarDocsJob _),
    "sketch_grams" -> (sketchGramsJob _),
    "sketch_users" -> (sketchUsersJob _),
    "audit_leakage" -> (auditLeakageJob _),
    "scan_rowkeys" -> (scanRowkeysJob _),
    "community_docs" -> (communityDocsJob _),
    "rank_missing_edges" -> (rankMissingEdgesJob _),
    "excerpt_audit" -> (excerptAuditJob _),
    "quote_audit" -> (quoteAuditJob _),
    "build_ann_index" -> (buildAnnIndexJob _),
    "release_customers" -> (releaseCustomersJob _),
    "merge_availability" -> (mergeAvailabilityJob _),
    "index_lineitem" -> (indexLineitemJob _),
    "encode_pq" -> (encodePqJob _),
    "mine_bitext" -> (mineBitextJob _),
    "resolve_customers" -> (resolveCustomersJob _),
    "profile_tables" -> (profileTablesJob _),
    "scrub_boilerplate" -> (scrubBoilerplateJob _),
    "ingest_props" -> (ingestPropsJob _),
    "corpus_report" -> (corpusReportJob _),
    "sample_corpus" -> (sampleCorpusJob _),
    "clean_region" -> (auditAppendJob("region", None) _),
    "clean_nation" -> (auditAppendJob("nation", None) _),
    "clean_customer" -> (auditAppendJob("customer", None) _),
    "clean_supplier" -> (auditAppendJob("supplier", None) _),
    "clean_part" -> (auditAppendJob("part", None) _),
    "clean_orders" -> (auditAppendJob("orders", Some("o_orderdate")) _),
    "clean_lineitem" -> (auditAppendJob("lineitem", Some("l_shipdate")) _),
    "merge_user_latest" -> (scdMergeEventsJob _),
    "bistore_order_master" -> (bistoreOrdersJob _),
    "dws_customer_region" -> (dwsCustomerRegionJob _),
    "clean_corpus" -> (cleanCorpusJob _),
    "screen_batch" -> (screenBatchJob _),
    "curate_stream" -> (curateStreamJob _),
    "chunk_corpus" -> (chunkCorpusJob _),
    "export_shards" -> (exportShardsJob _),
    "cluster_lineitem" -> (clusterLineitemJob _),
    "cluster_lineitem_hilbert" -> (clusterLineitemHilbertJob _))
}

object JobRunner {
  def main(args: Array[String]): Unit = {
    val Array(jobName, sfDir, outDir) = args.take(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val targets =
      if (jobName == "all") Jobs.all.toSeq.sortBy(_._1)
      else Seq(jobName -> Jobs.all.getOrElse(jobName, {
        System.err.println(s"unknown job '$jobName'; available: " +
          ("all" +: Jobs.all.keys.toSeq.sorted).mkString(", "))
        spark.stop()
        sys.exit(2)
      }))
    targets.foreach { case (name, job) =>
      val t0 = System.nanoTime()
      job(spark, sfDir, outDir)
      println(f"[job] $name done in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
