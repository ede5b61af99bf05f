package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Corpus-level reporting operators: vocabulary construction and
  * per-language profiling — the summary passes a training-data pipeline
  * runs after cleaning to decide mixture weights and spot collapsed
  * strata.
  *
  * The reference has no aggregation beyond a scalar MAX
  * (SURVEY.md §2.5, common/SimpleDataCleanUtils.scala:19); these extend
  * its warehouse repertoire with the group-by shapes a corpus report
  * needs, built shuffle-minimal.
  */
object Corpus {

  /** Top-`k` whitespace tokens of lower(trim(text)) by corpus frequency,
    * with a total (cnt desc, token asc) ordering and a dense 1..k rank.
    *
    * Scale shape: explode → hash-aggregate benefits from map-side
    * partial combine (each task emits one row per DISTINCT token it
    * saw, not per occurrence), and the top-k is orderBy+limit — Spark
    * plans TakeOrderedAndProject, a per-partition heap of k followed by
    * a driver merge of n_partitions*k rows, never a global sort of the
    * full vocabulary. The row_number window then runs over only the k
    * survivors (single tiny partition by construction).
    */
  def topKVocab(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val counts = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    counts.orderBy(col("cnt").desc, col("token")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("token")))
          .cast("long"))
  }

  /** Term burstiness over the top-`k` collection-frequency terms
    * (Church & Gale's "Poisson mixtures" observation: content words
    * concentrate, function words spread): cf = total occurrences,
    * df = documents containing, burst_bp = cf·10000 div df — the mean
    * occurrences per containing document in basis points. Terms near
    * 10000 appear once wherever they appear (function-word-like);
    * high scores mark topical or templated terms — the
    * stopword-detection / vocab-pruning complement of [[topKVocab]],
    * with the same tokenizer and the same (cf desc, token) top-k rule.
    *
    * Two hash aggregations — (token, doc) then token — and a bounded
    * top-k; no token×doc dense structure, so 100 TB corpora stay
    * linear in total tokens.
    */
  def burstiness(docs: DataFrame, textCol: String, idCol: String,
                 k: Int): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .where(length(col("token")) > 0)
    val perDoc = toks.groupBy(col("token"), col("id"))
      .agg(count(lit(1)).as("n"))
    perDoc.groupBy(col("token"))
      .agg(sum(col("n")).as("cf"), count(lit(1)).as("df"))
      .orderBy(col("cf").desc, col("token")).limit(k)
      .select(col("token"), col("cf"), col("df"),
        expr("cf * 10000 div df").as("burst_bp"))
  }

  /** Overlapping token-window chunking — the RAG / embedding-prep step
    * that splits each document into `window`-token chunks every `stride`
    * tokens (overlap = window - stride). Chunk starts are 0, stride,
    * 2*stride, … up to the last start that still exposes a new token;
    * a document of ≤ window tokens yields exactly one chunk.
    *
    * Scale shape: entirely row-local — tokenize once, build the chunk
    * array with a codegen'd higher-order `transform`, posexplode. No
    * shuffle, no UDF; output rows carry (id, chunk_id, chunk, n_tok) so
    * downstream embedding can repartition however it likes.
    */
  def chunkDocs(docs: DataFrame, textCol: String, idCol: String,
                window: Int = 40, stride: Int = 30): DataFrame = {
    require(window > 0 && stride > 0,
      s"window/stride must be positive, got $window/$stride")
    require(stride <= window,
      s"stride $stride > window $window would silently skip tokens " +
        "between chunks — every token must land in at least one chunk")
    docs
      .select(col(idCol),
        split(lower(trim(col(textCol))), "\\s+").as("__ta"))
      .select(col(idCol),
        posexplode(expr(
          s"transform(sequence(0, greatest(0, " +
            s"CAST(ceil((size(__ta) - $window) / $stride.0) AS INT))), " +
            s"i -> array_join(slice(__ta, i*$stride + 1, $window), ' '))")))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        col("col").as("chunk"))
      .withColumn("n_tok", size(split(col("chunk"), " ")).cast("long"))
  }

  /** Per-language corpus profile: document count, total characters,
    * mean token count, and how many documents clear a minimum
    * length/token bar (the mixture-weight inputs). One hash aggregation
    * on the language key; every measure is a partial-aggregatable sum
    * or count, so the shuffle carries one row per (task, language).
    */
  def languageStats(docs: DataFrame, textCol: String,
                    langCol: String): DataFrame = {
    val t = col(textCol)
    docs.groupBy(col(langCol).as("lang")).agg(
      count(lit(1)).as("n_docs"),
      sum(length(t).cast("long")).as("sum_chars"),
      round(avg(TextFns.tokenCount(t)), 4).as("avg_tokens"),
      sum(when(length(t) >= 100 && TextFns.tokenCount(t) >= 15, 1L)
        .otherwise(0L)).as("n_substantial"))
  }

  /** Per-document vocabulary coverage: how much of each document's
    * token stream falls OUTSIDE a given vocabulary — the
    * out-of-vocabulary (OOV) signal mixture tuning reads per source /
    * language (a stratum whose documents are mostly OOV against the
    * corpus vocabulary is noise or a collapsed extractor).
    *
    * Tokenization matches [[topKVocab]] exactly (lower(trim), \s+
    * split, empty tokens dropped) so a topKVocab output can feed
    * `vocab` directly. Scale shape: the vocabulary is top-k (tiny) and
    * BROADCASTS into a left join on the exploded tokens — the token
    * stream is shuffled only once, by document id for the per-doc
    * aggregation. Every input document appears in the output; a
    * zero-token document reports (0, 0, 0.0).
    */
  def vocabCoverage(docs: DataFrame, textCol: String, idCol: String,
                    vocab: DataFrame,
                    tokenCol: String = "token"): DataFrame = {
    val toks = docs.select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("__tok"))
      .where(length(col("__tok")) > 0)
    val v = vocab.select(col(tokenCol).as("__tok")).distinct()
      .withColumn("__in", lit(1))
    val agg = toks.join(broadcast(v), Seq("__tok"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0, lit(0.0d))
          .otherwise(round(col("n_oov").cast("double") /
            col("n_tokens").cast("double"), 4)).as("oov_rate"))
  }

  /** Line-level boilerplate removal (the CCNet-style pass a web-crawl
    * pipeline runs before document dedup): a LINE that occurs more than
    * `maxOccurrences` times across the whole corpus — nav menus, cookie
    * banners, copyright footers — is deleted from every document; each
    * document's surviving lines are re-joined in their original order.
    *
    * Scale shape (100 TB corpus):
    *  - the per-line occurrence count is ONE hash aggregation with
    *    map-side partial combine (a nav line repeated 10^7 times ships
    *    one partial count per task, not 10^7 rows);
    *  - the boilerplate relation (`count > maxOccurrences`) is small
    *    when the threshold is set for true boilerplate — only lines
    *    frequent enough to repeat corpus-wide — so by default the
    *    removal is a BROADCAST left-anti join against it: the exploded
    *    corpus is never shuffled by line, and the hot-key skew a plain
    *    `count <= max` equi-join would hit (every copy of the same
    *    banner landing on one reducer) never exists. The set's size is
    *    DATA-DEPENDENT, though: an aggressive threshold over a
    *    duplicate-heavy corpus can make it millions of full text lines
    *    — set `broadcastBoilerplate = false` there to fall back to a
    *    shuffled anti-join (AQE handles the remaining skew) instead of
    *    building an oversized broadcast on the driver;
    *  - the rebuild sorts each document's kept lines row-locally
    *    (collect_list → array_sort on (pos, line)) — the only exchange
    *    is the groupBy on the document id.
    *
    * Returns (idCol, clean_text, n_kept, n_dropped) for EVERY input
    * document; a fully-boilerplate document keeps an empty clean_text.
    * Callers wanting normalized matching (case/digit-insensitive)
    * should pre-normalize a shadow column and split on that.
    */
  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003): of every `window` consecutive k-shingle hashes,
    * keep the minimum — the guarantee-bearing sparse fingerprint set
    * (any shared substring of length >= k + window - 1 shares at least
    * one selected fingerprint), at ~2/(window+1) the density of the
    * full hash stream. This is the plagiarism/near-dup screen that
    * bounds index size with a COVERAGE guarantee, where MinHash bounds
    * it probabilistically.
    *
    * Ties select the LEFTMOST minimal hash (deterministic; the paper's
    * robust variant picks rightmost — leftmost is equally covered and
    * lets both engines select on one packed integer min). The packed
    * key `h * 2^31 + pos` is exact for ANY Java-representable string:
    * h < 1e9+7 < 2^30 so h * 2^31 < 2^61, and pos < 2^31 (JVM string
    * length bound) can never bleed into the hash field — the minimum
    * orders by (h, pos) lexicographically at every document size.
    *
    * Scale shape: one positional shingle explode (row-local), one
    * sliding window partitioned BY DOCUMENT (never global), one
    * distinct — all parallel over doc_id. Output is (id, pos, h) per
    * SELECTED fingerprint.
    *
    * RECALL CONTRACT (spec-pinned in CorpusSpec "winnowing recall
    * contract"): the minimum reliably-detectable shared run is
    * k + window − 1 characters — guaranteed at that length, carrying
    * NO guarantee one character shorter; the df cap in the matching
    * step only ever removes evidence (a smaller cap never creates a
    * candidate). At the defaults and the screens' caps:
    *
    * | k | window | guarantee threshold | maxDf effect               |
    * |---|--------|---------------------|-----------------------------|
    * | 5 | 4      | 8 chars             | monotone: pairs(m) ⊆ pairs(m') for m ≤ m' |
    * | 5 | 8      | 12 chars            | same                        |
    * | 3 | 4      | 6 chars             | same                        |
    * | 8 | 4      | 11 chars            | same                        |
    */
  def winnowingFingerprints(docs: DataFrame, textCol: String,
                            idCol: String, k: Int = 5,
                            window: Int = 4): DataFrame = {
    require(k >= 1, s"shingle size must be >= 1, got $k")
    require(window >= 1, s"window must be >= 1, got $window")
    import graft.functions.native.NativeFns
    NativeFns.register(docs.sparkSession)
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, window - 1)
    // Hash extraction is the native one-pass positional expression:
    // the HOF form (per-position substring + fold) re-scans the source
    // string per shingle — O(n²), hours on the multi-megabyte long-tail
    // documents this screen exists for. The positional explosion (this
    // operator's CPU) runs BEFORE any shuffle, so its parallelism would
    // be the scan's split count; one doc-keyed repartition fans it out
    // (the SparseSim device) AND pre-partitions for the per-document
    // window, so the window's own exchange disappears — the sort runs
    // on the already doc-hashed exploded stream.
    val fan = docs.sparkSession.sessionState.conf.numShufflePartitions
    val hashed = docs
      .repartition(fan, col(idCol))
      .select(col(idCol).as("id"),
        posexplode(NativeFns.positionalShingleHashes(
          lower(trim(col(textCol))), k)).as(Seq("pos", "h")))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("id"))))
    hashed
      .withColumn("sel",
        min(col("h") * lit(2147483648L) + col("pos")).over(w))
      .where(col("pos") <= col("n") - window) // full windows only
      .select(col("id"),
        (col("sel") % lit(2147483648L)).as("pos"),
        expr("sel div 2147483648L").as("h"))
      .distinct()
  }

  /** Winnowing-index candidate pairs — the MOSS matching step over
    * [[winnowingFingerprints]]: documents sharing at least `minShared`
    * DISTINCT selected fingerprints, ranked by how many they share.
    * Because selection is coverage-guaranteed, any pair sharing enough
    * long substrings MUST surface here — the deterministic complement
    * to the MinHash screen's probabilistic recall.
    *
    * Scale shape mirrors [[SparseSim]]: fingerprints seen in more than
    * `maxDf` documents leave the index (boilerplate shingles carry no
    * discriminative power and quadratically dominate the join), so
    * candidate volume is ≤ maxDf · Σdf — linear in corpus size; the
    * pair join is a hash equi-join on the fingerprint, id-only rows.
    */
  def winnowingCandidates(docs: DataFrame, textCol: String,
                          idCol: String, k: Int = 5, window: Int = 4,
                          maxDf: Long = 50,
                          minShared: Long = 5): DataFrame =
    winnowingCandidatesFrom(
      winnowingFingerprints(docs, textCol, idCol, k, window),
      maxDf, minShared)

  /** The matching step alone, over an already-computed `(id, pos, h)`
    * fingerprint table. Split out so callers can MATERIALIZE the
    * fingerprints first — the match references them three times (df
    * cap + both self-join sides), and a lazy fingerprint plan re-runs
    * its shingle extraction per reference (the [[SparseSim]]
    * posting-table lesson); at 100 TB the fingerprint table is an
    * ingest artifact like the signature table anyway.
    */
  def winnowingCandidatesFrom(fingerprints: DataFrame, maxDf: Long = 50,
                              minShared: Long = 5): DataFrame = {
    require(maxDf >= 1, s"df cap must be >= 1, got $maxDf")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val ih = fingerprints.select(col("id"), col("h")).distinct()
    val rare = ih.groupBy(col("h")).agg(count(lit(1)).as("d"))
      .where(col("d") <= maxDf).select(col("h"))
    val p = ih.join(rare, Seq("h"))
    p.select(col("h"), col("id").as("id_a"))
      .join(p.select(col("h"), col("id").as("id_b")), Seq("h"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Positional CONTAINMENT over winnowing fingerprints — the
    * wide-recall screen for the tiny-quote regime that the LSH
    * containment screen structurally misses (Dedup.scala: band
    * collision is bounded by the pair's JACCARD, so a short quote
    * inside a large page never band-collides). Winnowing's coverage
    * guarantee is the opposite grammar: every shared substring of
    * length ≥ k+window−1 contributes a shared SELECTED fingerprint
    * deterministically, and a verbatim excerpt's interior windows
    * select the SAME hashes as the source's corresponding windows
    * (the packed h·2³¹+pos minimum has a uniform pos shift inside any
    * window, so the argmin shingle is identical) — so an excerpt's
    * fingerprint set is contained in its source's regardless of the
    * size ratio. For every pair sharing at least one df-capped
    * fingerprint:
    *
    *   containment_bp = |F_small ∩ F_large| · 10⁴ div |F_small|
    *
    * in exact integer basis points, where F is the doc's distinct
    * df-capped fingerprint set and "small" is the doc with the smaller
    * F (tie → the lower id, so the orientation is total). Kept at
    * `minContainmentBp` and above.
    *
    * Scale shape: the same inverted-index equi-join as
    * [[winnowingCandidatesFrom]] — fingerprints above `maxDf`
    * documents leave the index (boilerplate carries no containment
    * evidence and quadratically dominates), candidates are id-only,
    * text is never touched; per-doc sizes are one count aggregate
    * (capped universe on BOTH numerator and denominator, so the score
    * is consistent). Takes the stored `(id, pos, h)` fingerprint table
    * — extract once at ingest, the sig-table contract.
    */
  def winnowingContainment(fingerprints: DataFrame, maxDf: Long = 50,
                           minContainmentBp: Long = 7000L): DataFrame = {
    require(maxDf >= 1, s"df cap must be >= 1, got $maxDf")
    require(minContainmentBp >= 0 && minContainmentBp <= 10000,
      s"containment is in basis points 0..10000, got $minContainmentBp")
    val ih = fingerprints.select(col("id"), col("h")).distinct()
    val rare = ih.groupBy(col("h")).agg(count(lit(1)).as("d"))
      .where(col("d") <= maxDf).select(col("h"))
    val p = ih.join(rare, Seq("h"))
    val nf = p.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val pairs = p.select(col("h"), col("id").as("id_a"))
      .join(p.select(col("h"), col("id").as("id_b")), Seq("h"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(nf.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(nf.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .select(
        when(col("n_a") <= col("n_b"), col("id_a")).otherwise(col("id_b"))
          .as("doc_small"),
        when(col("n_a") <= col("n_b"), col("id_b")).otherwise(col("id_a"))
          .as("doc_large"),
        least(col("n_a"), col("n_b")).as("n_small"),
        greatest(col("n_a"), col("n_b")).as("n_large"),
        col("shared"),
        expr("(shared * 10000) div least(n_a, n_b)").as("containment_bp"))
      .where(col("containment_bp") >= minContainmentBp)
  }

  /** Persist the corpus's winnowing fingerprint table `(id, pos, h)` as
    * a parquet table — the maintained ingest artifact of the positional
    * containment screen, with the same lifecycle contract as the
    * MinHash signature table ([[graft.operators.Dedup.writeSignatureTable]]):
    * written once at ingest, appended per admitted batch, so corpus
    * text is shingled exactly once in its life. Records (k, window)
    * next to the data — fingerprints selected with one geometry never
    * intersect those of another, and a mismatched screen would
    * silently admit every quote.
    */
  def writeWinnowTable(corpus: DataFrame, textCol: String, idCol: String,
                       path: String, k: Int = 5, window: Int = 4): Unit = {
    import graft.sources.MaintainedIndex
    // hash-CLUSTERED from birth (+ per-file h envelopes): the
    // maintained screens' pair probes open only the files whose h
    // range intersects the batch's hash set — per-batch read IO
    // O(batch), not O(corpus)
    MaintainedIndex.writeClusteredIndexed(
      winnowingFingerprints(corpus, textCol, idCol, k, window),
      path, "h")
    val meta = new org.apache.hadoop.fs.Path(path, "_graft_winnow_kw")
    val fs = meta.getFileSystem(
      corpus.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(meta, true)
    try out.write(s"$k,$window".getBytes("UTF-8")) finally out.close()
    // df state rides beside the data from birth: the containment
    // screens read corpus-wide document frequencies from this sidecar
    // instead of re-aggregating the whole fingerprint table per call.
    // Built from the read-back parquet so the shingle pass isn't run a
    // second time; overwrite (fresh table, fresh state). Clustered on
    // h like the table — the screens' df pulls prune the same way.
    MaintainedIndex.writeClusteredIndexed(
      winnowDfDelta(corpus.sparkSession.read.parquet(path), -1L),
      winnowDfStatePath(path), "h")
    // the doc-keyed PROJECTION (distinct (id, h), clustered on id):
    // the screens' denominator pull needs candidate DOCS' full hash
    // sets — an access path the h-clustered table cannot prune — so it
    // reads this id-clustered projection instead of scanning the table
    MaintainedIndex.writeClusteredIndexed(
      corpus.sparkSession.read.parquet(path)
        .select(col("id"), col("h")).distinct(),
      winnowByIdPath(path), "id")
  }

  /** The doc-keyed screen projection of a winnow table: distinct
    * (id, h), id-clustered + id-indexed, written at ingest and
    * appended per admitted batch. Storage is a second (smaller) copy
    * of the screen's columns — the classic projection trade
    * (C-Store): at 100 TB, a per-batch O(corpus) table scan is the
    * thing you cannot afford; a ~40% storage premium is. */
  def winnowByIdPath(path: String): String =
    new org.apache.hadoop.fs.Path(path, "_graft_winnow_byid").toString

  /** Compact a maintained winnow table INTO `outPath` — the lifecycle
    * counterpart of [[appendToWinnowTable]]: a long-lived ingest table
    * accumulates one clustered generation per admitted batch, and the
    * pruned screens' file bound (kept ≤ probes × generations) degrades
    * linearly with batch count. Re-clusters all three screen artifacts
    * (fingerprint table by h, doc-keyed projection by id, df sidecar
    * by h) into single generations sized by bytes, carries the
    * (k, window) geometry marker, and rebuilds every stats index.
    * Rows are preserved exactly — screens before and after are equal
    * by the prune-safety rule (CompactionSpec-style assertion in
    * ScreenPruneSpec). The df sidecar's delta rows keep their batch_id
    * stamps: compaction is a layout operation, and replay filtering
    * (`batch_id < ownId`) must keep working on the compacted copy if
    * the curate loop resumes against it. */
  def compactWinnowTable(spark: org.apache.spark.sql.SparkSession,
                         inPath: String, outPath: String,
                         targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    import graft.sources.MaintainedIndex
    val (k, w) = winnowTableParams(spark, inPath)
    ensureWinnowDfState(spark, inPath)
    ensureWinnowScreenIndex(spark, inPath)
    MaintainedIndex.compactClusteredIndexed(
      spark, inPath, outPath, "h", targetFileBytes)
    val meta = new org.apache.hadoop.fs.Path(outPath, "_graft_winnow_kw")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(meta, true)
    try out.write(s"$k,$w".getBytes("UTF-8")) finally out.close()
    MaintainedIndex.compactClusteredIndexed(spark,
      winnowByIdPath(inPath), winnowByIdPath(outPath), "id",
      targetFileBytes)
    MaintainedIndex.compactClusteredIndexed(spark,
      winnowDfStatePath(inPath), winnowDfStatePath(outPath), "h",
      targetFileBytes)
  }

  /** Heal a winnow table that predates the doc-keyed projection (or
    * the file indexes): build them once from the table. No-op when
    * present. */
  def ensureWinnowScreenIndex(spark: org.apache.spark.sql.SparkSession,
                              path: String): Unit = {
    import graft.sources.MaintainedIndex
    val bp = new org.apache.hadoop.fs.Path(winnowByIdPath(path))
    val fs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasProj = fs.exists(bp) && fs.listStatus(bp)
      .exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (!hasProj)
      MaintainedIndex.writeClusteredIndexed(
        spark.read.parquet(path).select(col("id"), col("h")).distinct(),
        winnowByIdPath(path), "id")
    MaintainedIndex.ensureIndexed(spark, path, "h")
    MaintainedIndex.ensureIndexed(spark, winnowDfStatePath(path), "h")
    MaintainedIndex.ensureIndexed(spark, winnowByIdPath(path), "id")
  }

  /** The df-state sidecar of a winnow fingerprint table: an
    * underscore-prefixed subdirectory (invisible to parquet readers of
    * the table itself) holding APPEND-ONLY `(h, d, batch_id)` delta
    * rows — `d` = distinct documents of that append event containing
    * `h`. Document ids are unique across the feed (the ingest
    * contract), so the table's true df is the plain SUM of deltas per
    * hash: folding never needs the fingerprint table, and a screen
    * needing df for a bounded hash set aggregates only the delta rows
    * matching that set — per-batch cost scales with the batch, never
    * the corpus (SURVEY §13, the signature-table contract).
    */
  def winnowDfStatePath(path: String): String =
    new org.apache.hadoop.fs.Path(path, "_graft_winnow_df").toString

  /** One append event's df contribution: distinct containing documents
    * per hash, stamped with the event's batch id (-1 for pre-loop
    * history — the initial corpus and batch-API appends). A replaying
    * curate batch screens against `batch_id < ownId`, so a delta that
    * landed before the crash can never double-count with the batch's
    * own live contribution.
    */
  def winnowDfDelta(fingerprints: DataFrame, batchId: Long): DataFrame =
    fingerprints.select(col("id"), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("d"))
      .withColumn("batch_id", lit(batchId))

  /** Build the df sidecar for a winnow table that predates it (or whose
    * copy lost the sidecar): one df aggregation over the fingerprint
    * table, stamped batch_id = -1. No-op when delta files exist. */
  def ensureWinnowDfState(spark: org.apache.spark.sql.SparkSession,
                          path: String): Unit = {
    val sp = new org.apache.hadoop.fs.Path(winnowDfStatePath(path))
    val fs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(sp) && fs.listStatus(sp)
      .exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (!hasData)
      winnowDfDelta(spark.read.parquet(path), -1L)
        .write.mode("overwrite").parquet(sp.toString)
    ()
  }

  /** (k, window) a winnowing fingerprint table was written with. */
  def winnowTableParams(spark: org.apache.spark.sql.SparkSession,
                        path: String): (Int, Int) = {
    val meta = new org.apache.hadoop.fs.Path(path, "_graft_winnow_kw")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(meta))
      throw new IllegalArgumentException(
        s"no _graft_winnow_kw marker at $path — not a graft winnowing " +
          "fingerprint table (or written by another tool / path typo); " +
          "write it with Corpus.writeWinnowTable, which records the " +
          "(k, window) geometry")
    val buf = new Array[Byte](fs.getFileStatus(meta).getLen.toInt)
    val in = fs.open(meta)
    try in.readFully(buf) finally in.close()
    val parts = new String(buf, "UTF-8").trim.split(",")
    (parts(0).toInt, parts(1).toInt)
  }

  /** Append an ADMITTED batch's winnowing fingerprints to a maintained
    * table — the live-table half of the quote-screen ingest loop.
    * Refuses a table whose recorded (k, window) differs. */
  def appendToWinnowTable(batch: DataFrame, textCol: String,
                          idCol: String, path: String,
                          k: Int = 5, window: Int = 4): Unit = {
    val (sk, sw) = winnowTableParams(batch.sparkSession, path)
    require(sk == k && sw == window,
      s"winnow table at $path was written with (k=$sk, window=$sw) but " +
        s"the batch is fingerprinted with (k=$k, window=$window) — " +
        "refusing to mix geometries")
    // fingerprinted ONCE (persisted): the rows feed both the table
    // append and the df-state delta, and the shingle extraction is the
    // operator's whole CPU cost
    // a pre-sidecar table must be healed BEFORE this batch lands in the
    // fingerprint table, or its rows would count twice (once in the
    // rebuild, once in the delta below)
    ensureWinnowDfState(batch.sparkSession, path)
    ensureWinnowScreenIndex(batch.sparkSession, path)
    val fp = winnowingFingerprints(batch, textCol, idCol, k, window)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      import graft.sources.MaintainedIndex
      // batch-API appends get a unique generation prefix; each append
      // is its own clustered generation with fresh file envelopes
      val gen = s"gen_${java.util.UUID.randomUUID().toString.take(8)}_"
      MaintainedIndex.clusteredIdempotentAppend(fp, path, gen, "h")
      MaintainedIndex.clusteredIdempotentAppend(
        fp.select(col("id"), col("h")).distinct(),
        winnowByIdPath(path), gen, "id")
      MaintainedIndex.clusteredIdempotentAppend(
        winnowDfDelta(fp, -1L), winnowDfStatePath(path), gen, "h")
    } finally { fp.unpersist(false); () }
  }

  /** The INGEST-TIME quote screen: positional containment of an
    * arriving batch against an already-held corpus, from their
    * fingerprint relations — batch×corpus pairs ONLY (never
    * corpus×corpus: a 100 TB corpus's internal pairs are not this
    * screen's question, and forming them per batch would be
    * quadratic where this is linear in the batch). The df cap is
    * computed over corpus ∪ batch — the maintenance rule that makes
    * the screen equal the full [[winnowingContainment]] filtered to
    * batch-touching pairs. Either orientation rejects: a tiny quote
    * OF held content and a superset CONTAINING a held document both
    * read high containment, and both mean the batch row duplicates
    * held material.
    *
    * Returns (batch_id, corpus_id, n_batch, n_corpus, shared,
    * containment_bp) at `minContainmentBp` and above, where
    * containment_bp = shared·10⁴ div min(n_batch, n_corpus) in exact
    * integer basis points over the df-capped fingerprint sets.
    */
  def winnowingContainmentScreen(batchFps: DataFrame,
                                 corpusFps: DataFrame,
                                 maxDf: Long = 50,
                                 minContainmentBp: Long = 8000L): DataFrame = {
    require(maxDf >= 1, s"df cap must be >= 1, got $maxDf")
    require(minContainmentBp >= 0 && minContainmentBp <= 10000,
      s"containment is in basis points 0..10000, got $minContainmentBp")
    val ihB = batchFps.select(col("id"), col("h")).distinct()
    val ihC = corpusFps.select(col("id"), col("h")).distinct()
    val rare = ihB.unionByName(ihC)
      .groupBy(col("h")).agg(count(lit(1)).as("d"))
      .where(col("d") <= maxDf).select(col("h"))
    val pB = ihB.join(rare, Seq("h"))
    val pC = ihC.join(rare, Seq("h"))
    val nB = pB.groupBy(col("id")).agg(count(lit(1)).as("n_batch"))
      .withColumnRenamed("id", "batch_id")
    val nC = pC.groupBy(col("id")).agg(count(lit(1)).as("n_corpus"))
      .withColumnRenamed("id", "corpus_id")
    pB.select(col("h"), col("id").as("batch_id"))
      .join(pC.select(col("h"), col("id").as("corpus_id")), Seq("h"))
      .groupBy(col("batch_id"), col("corpus_id"))
      .agg(count(lit(1)).as("shared"))
      .join(nB, Seq("batch_id"))
      .join(nC, Seq("corpus_id"))
      .select(col("batch_id"), col("corpus_id"),
        col("n_batch"), col("n_corpus"), col("shared"),
        expr("(shared * 10000) div least(n_batch, n_corpus)")
          .as("containment_bp"))
      .where(col("containment_bp") >= minContainmentBp)
  }

  /** [[winnowingContainmentScreen]] with the corpus-wide document
    * frequencies read from the MAINTAINED df sidecar
    * ([[winnowDfStatePath]]) instead of re-aggregated from the full
    * fingerprint table — the amortized form the continuous curate loop
    * runs. Identical results by construction (ids are unique across
    * batch and corpus, so df over corpus ∪ batch = stored corpus df +
    * this batch's df, hash by hash); the one-shot
    * [[winnowingContainmentScreen]] stays for stateless batch audits.
    *
    * `dfState` is the `(h, d)` delta relation, already filtered by the
    * caller to the deltas that logically precede this batch
    * (`batch_id < ownId` — replay safety, mirroring the corpus-side
    * own-id exclusion on `corpusFps`).
    *
    * Per-batch cost is batch + delta, never the corpus:
    *  - the batch's own hash dfs are one O(batch) aggregation;
    *  - corpus dfs are summed ONLY for delta rows matching a
    *    batch-bounded hash set (batch hashes, then candidate docs'
    *    hashes), pushed as a broadcast semi-join BEFORE the aggregate —
    *    no corpus-wide groupBy(h) ever forms;
    *  - the fingerprint table is touched twice, each a column-pruned
    *    scan joined against a broadcast batch-derived set (pair
    *    candidates by rare shared hash; candidate docs' own rows for
    *    denominators).
    * The df cap stays exact under maintenance: df is monotone under
    * appends, and a hash crossing the cap due to THIS batch's
    * contribution is re-judged here (stored d + batch d), so
    * cap-crossing needs no stored-state rewrite.
    */
  def winnowingContainmentScreenMaintained(batchFps: DataFrame,
                                           corpusFps: DataFrame,
                                           dfState: DataFrame,
                                           maxDf: Long = 50,
                                           minContainmentBp: Long = 8000L): DataFrame =
    screenMaintainedCore(batchFps, corpusFps, dfState, maxDf,
      minContainmentBp, identity)

  /** [[winnowingContainmentScreenMaintained]] materialized (the
    * incrementalNearDupAgainstPreSigsM device): the screen's plan reads
    * its own intermediates several times (the rare batch-hash set gates
    * both the pair join and the denominators; the pruned corpus rows
    * feed pairs AND candidate ids), and left lazy each reuse re-runs
    * the subtree — so the reused frames persist for the build, the
    * result lands eagerly under `mat`, and the intermediates release
    * before return. Per-batch callers (the curate loop) use this form;
    * the lazy form stays for composition into larger plans.
    */
  def winnowingContainmentScreenMaintainedM(batchFps: DataFrame,
                                            corpusFps: DataFrame,
                                            dfState: DataFrame,
                                            maxDf: Long = 50,
                                            minContainmentBp: Long = 8000L,
                                            mat: graft.ops.MatStrategy =
                                              graft.ops.MatStrategy.Default): graft.ops.Materialized = {
    val held = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def hold(df: DataFrame): DataFrame = {
      val p = df.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      held += p
      p
    }
    try graft.ops.Materialize(
      screenMaintainedCore(batchFps, corpusFps, dfState, maxDf,
        minContainmentBp, hold), mat)
    finally { held.foreach(_.unpersist(false)); () }
  }

  /** The PRUNED maintained screen — [[winnowingContainmentScreenMaintained]]
    * with every stored-table read file-pruned against the batch's
    * bounded probe sets, eager and self-releasing (the M-variant's
    * hold/release device). This is the form the continuous curate loop
    * runs: per batch it opens
    *  - of the winnow TABLE, only files whose h-envelope meets the
    *    batch's rare-hash set (the pair probe);
    *  - of the doc-keyed PROJECTION ([[winnowByIdPath]]), only files
    *    whose id-envelope meets the candidate-doc set (the denominator
    *    pull — the read the h-clustered table cannot prune);
    *  - of the df SIDECAR, only files whose h-envelope meets the
    *    batch's (then candidates') hash sets.
    * Identical results to the unpruned screen by construction: pruning
    * only drops files that contain NO probe key, and every pruned read
    * feeds an equi-semi-join on that key (ScreenPruneSpec pins the
    * equality and the file-count collapse; the crash windows degrade
    * to reading more via MaintainedIndex's unindexed-file rule, never
    * to a false skip).
    *
    * The probe-set collects are the screen's own broadcast sides read
    * driver-side — bounded by the batch and its candidates, the same
    * bytes a broadcast already stages through the driver; corpus rows
    * never collect.
    *
    * `excludeIds` (single column `id`) is the replay-safety corpus
    * exclusion; `ownBatchId` filters the df sidecar to deltas that
    * logically precede this batch (`batch_id < ownBatchId`).
    */
  def winnowingContainmentScreenPrunedM(batchFps: DataFrame,
                                        tablePath: String,
                                        excludeIds: Option[DataFrame] = None,
                                        ownBatchId: Long = Long.MaxValue,
                                        maxDf: Long = 50,
                                        minContainmentBp: Long = 8000L,
                                        mat: graft.ops.MatStrategy =
                                          graft.ops.MatStrategy.Default): graft.ops.Materialized = {
    require(maxDf >= 1, s"df cap must be >= 1, got $maxDf")
    require(minContainmentBp >= 0 && minContainmentBp <= 10000,
      s"containment is in basis points 0..10000, got $minContainmentBp")
    import graft.sources.MaintainedIndex
    val spark = batchFps.sparkSession
    // heal order matters: the df sidecar must exist before the index
    // pass builds its envelope stats
    ensureWinnowDfState(spark, tablePath)
    ensureWinnowScreenIndex(spark, tablePath)
    // BULK / SMALL-TABLE REGIME: when the table reads whole anyway
    // (≤ two task waves of files — the same rule the pruned reads
    // use), the sidecar path's persist/barrier machinery buys nothing
    // and costs plenty: four multi-million-row persists and five
    // sequential action barriers per call (measured 6.5-7.5 s per
    // corpus-scale batch at sf0.1, where the equivalent screen runs
    // as ONE lazy DAG — Catalyst shares exchanges via ReusedExchange).
    // The DAG below is the one-shot screen restated over the
    // MAINTAINED ARTIFACTS (r12):
    //  - the corpus side reads the doc-keyed PROJECTION
    //    ([[winnowByIdPath]]) — already distinct (id, h) (ids are
    //    unique across appends, so per-append distincts compose), so
    //    the one-shot form's corpus-wide distinct exchange disappears
    //    and the scan carries fewer, narrower rows than the (id, pos,
    //    h) table;
    //  - corpus document frequencies FOLD from the df sidecar (one
    //    aggregation over pre-aggregated `(h, d)` deltas) instead of
    //    being re-counted from the corpus fingerprint stream, and the
    //    df cap is judged on stored-df + batch-df via a full-outer
    //    hash join (corpus-scale batches make broadcast semi-joins —
    //    the micro-batch path's device — driver-sized, measured 2×
    //    slower here).
    // Identical results in every reachable state: stored df (deltas
    // with batch_id < ownId) + the batch's own df = df over
    // (corpus ∖ ownIds) ∪ batch, hash by hash — appends write table
    // rows, projection rows and df deltas under one batch-named
    // idempotence, and replay windows exclude the batch's own rows on
    // BOTH sides (ids corpus-side, batch_id < ownId on the sidecar).
    // NOTE the replay contract this branch shares with the pruned
    // path below: a caller passing `ownBatchId` relies on SEQUENTIAL
    // replay — no rows from batches > ownBatchId exist in the table,
    // the projection, or the sidecar at replay time (true for the
    // curate loop; an out-of-order caller would get divergent screens
    // on either path) — and `excludeIds`/`ownBatchId` travel together
    // (both or neither), as in the curate loop.
    // ScreenPruneSpec pins pruned == maintained == one-shot.
    if (MaintainedIndex.dataFileCount(spark, tablePath) <=
        2 * spark.sessionState.conf.numShufflePartitions) {
      val proj = spark.read.parquet(winnowByIdPath(tablePath))
        .select(col("id"), col("h"))
      val ihC = excludeIds.fold(proj)(e =>
        proj.join(broadcast(e.select(col("id"))), Seq("id"), "left_anti"))
      val ihB = batchFps.select(col("id"), col("h")).distinct()
      val dfB = ihB.groupBy(col("h")).agg(count(lit(1)).as("db"))
      val dfC = spark.read.parquet(winnowDfStatePath(tablePath))
        .where(col("batch_id") < lit(ownBatchId))
        .groupBy(col("h")).agg(sum(col("d")).as("dc"))
      val rare = dfB.join(dfC, Seq("h"), "full_outer")
        .where(coalesce(col("db"), lit(0L)) +
          coalesce(col("dc"), lit(0L)) <= maxDf)
        .select(col("h"))
      val pB = ihB.join(rare, Seq("h"))
      val pC = ihC.join(rare, Seq("h"))
      val nB = pB.groupBy(col("id")).agg(count(lit(1)).as("n_batch"))
        .withColumnRenamed("id", "batch_id")
      val nC = pC.groupBy(col("id")).agg(count(lit(1)).as("n_corpus"))
        .withColumnRenamed("id", "corpus_id")
      val pairs = pB.select(col("h"), col("id").as("batch_id"))
        .join(pC.select(col("h"), col("id").as("corpus_id")), Seq("h"))
        .groupBy(col("batch_id"), col("corpus_id"))
        .agg(count(lit(1)).as("shared"))
      return graft.ops.Materialize(
        pairs.join(nB, Seq("batch_id")).join(nC, Seq("corpus_id"))
          .select(col("batch_id"), col("corpus_id"),
            col("n_batch"), col("n_corpus"), col("shared"),
            expr("(shared * 10000) div least(n_batch, n_corpus)")
              .as("containment_bp"))
          .where(col("containment_bp") >= minContainmentBp), mat)
    }
    val dfPath = winnowDfStatePath(tablePath)
    val held = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def hold(df: DataFrame): DataFrame = {
      val p = df.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      held += p
      p
    }
    val dbgScreen = sys.env.get("GRAFT_CURATE_DEBUG").contains("1")
    def sdbg[A](tag: String)(f: => A): A =
      if (!dbgScreen) f else {
        val t0 = System.nanoTime(); val r = f
        System.err.println(
          f"[pruned screen] $tag%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        r
      }
    def keysOf(df: DataFrame, c: String): Array[Any] =
      df.select(col(c)).collect().map(_.get(0))
    def exclude(df: DataFrame): DataFrame =
      excludeIds.fold(df)(e =>
        df.join(broadcast(e.select(col("id"))), Seq("id"), "left_anti"))
    // Prune-or-not, decided BEFORE any probe collect: a probe set at
    // least as large as the table's file count cannot skip a useful
    // fraction under uniform keys, so bulk-sized batches (audits, the
    // bench fixtures' corpus-scale batches) read tables whole and pay
    // ZERO prune overhead — the r10 plan shape exactly. Micro-batches
    // (the 100 TB steady state) fall through to the pruned read. The
    // probe relations are already held, so counts are cache reads.
    def prunedOrFull(dir: String, keyCol: String, probeRel: DataFrame,
                     probeCol: String): (DataFrame, Boolean) = {
      val nFiles = MaintainedIndex.dataFileCount(spark, dir)
      // a SMALL table (≤ two task waves of files) is cheaper to read
      // whole than to probe: skip the decision job entirely — zero
      // added barriers in the bulk/fixture regime. At 100 TB the
      // maintained tables are thousands of files and always take the
      // pruned path below.
      if (nFiles <= 2 * spark.sessionState.conf.numShufflePartitions)
        return (spark.read.parquet(dir), false)
      // ONE bounded job decides AND fetches: collect at most
      // nFiles + 1 probes (an early-exit scan of the held relation).
      // Overflow ⇒ the probe set outnumbers the files ⇒ read whole;
      // otherwise the collected set is the prune's probe array — the
      // driver never holds more probes than the table has files.
      val probes = probeRel.select(col(probeCol))
        .limit(nFiles + 1).collect().map(_.get(0))
      if (probes.length > nFiles) (spark.read.parquet(dir), false)
      else {
        val (df, kept, all) = MaintainedIndex.readPrunedWithInfo(
          spark, dir, keyCol, probes)
        (df, kept < all)
      }
    }
    def dfStateFor(probeRel: DataFrame, probeCol: String): DataFrame =
      prunedOrFull(dfPath, "h", probeRel, probeCol)._1
        .where(col("batch_id") < lit(ownBatchId))
        .select(col("h"), col("d"))
    try {
      val ihB = hold(batchFps.select(col("id"), col("h")).distinct())
      val dfB = hold(ihB.groupBy(col("h")).agg(count(lit(1)).as("db")))
      sdbg("dfB")(dfB.count())
      val dfCB = dfStateFor(dfB, "h")
        .join(broadcast(dfB.select(col("h"))), Seq("h"))
        .groupBy(col("h")).agg(sum(col("d")).as("dc"))
      val rareB = hold(dfB.join(dfCB, Seq("h"), "left")
        .where(coalesce(col("dc"), lit(0L)) + col("db") <= maxDf)
        .select(col("h")))
      sdbg("rareB")(rareB.count())
      val pB = hold(ihB.join(broadcast(rareB), Seq("h")))
      val nB = pB.groupBy(col("id")).agg(count(lit(1)).as("n_batch"))
        .withColumnRenamed("id", "batch_id")
      // the table read: pruned to files whose h-envelope meets the
      // rare batch-hash set, own ids excluded (replay safety)
      val (cfpRead, tablePruned) = prunedOrFull(tablePath, "h",
        rareB, "h")
      val cfp = hold(exclude(cfpRead).select(col("id"), col("h")))
      val pC = hold(cfp.join(broadcast(rareB), Seq("h")).distinct())
      sdbg("pC")(pC.count())
      val pairs = pB.select(col("h"), col("id").as("batch_id"))
        .join(pC.select(col("h"), col("id").as("corpus_id")), Seq("h"))
        .groupBy(col("batch_id"), col("corpus_id"))
        .agg(count(lit(1)).as("shared"))
      val candIds = hold(pC.select(col("id")).distinct())
      // the denominator pull — ADAPTIVE between the two regimes:
      //  - micro-batch (the 100 TB steady state): the pair probe was
      //    file-pruned, so cfp is a partial relation and candidate
      //    docs' full hash sets come from the ID-CLUSTERED projection,
      //    itself pruned to the candidate-id set;
      //  - batch ~ corpus (bulk audits, small fixtures): the pair
      //    probe kept every file, cfp IS the whole table and is
      //    already held — deriving denominators from it is the r10
      //    scan-sharing shape, and reading the projection would only
      //    add a second full pass.
      val candFps = hold(
        (if (!tablePruned)
           cfp.join(broadcast(candIds), Seq("id"))
         else
           exclude(prunedOrFull(winnowByIdPath(tablePath), "id",
               candIds, "id")._1)
             .join(broadcast(candIds), Seq("id")))
          .select(col("id"), col("h")).distinct())
      sdbg("candFps")(candFps.count())
      val candH = hold(candFps.select(col("h")).distinct())
      val dfCC = dfStateFor(candH, "h")
        .join(broadcast(candH), Seq("h"))
        .groupBy(col("h")).agg(sum(col("d")).as("dc"))
      val rareC = dfCC.join(dfB, Seq("h"), "left")
        .where(col("dc") + coalesce(col("db"), lit(0L)) <= maxDf)
        .select(col("h"))
      val nC = candFps.join(broadcast(rareC), Seq("h"))
        .groupBy(col("id")).agg(count(lit(1)).as("n_corpus"))
        .withColumnRenamed("id", "corpus_id")
      sdbg("result")(()) // marker: remaining wall is the final materialize
      graft.ops.Materialize(
        pairs.join(nB, Seq("batch_id")).join(nC, Seq("corpus_id"))
          .select(col("batch_id"), col("corpus_id"),
            col("n_batch"), col("n_corpus"), col("shared"),
            expr("(shared * 10000) div least(n_batch, n_corpus)")
              .as("containment_bp"))
          .where(col("containment_bp") >= minContainmentBp), mat)
    } finally { held.foreach(_.unpersist(false)); () }
  }

  private def screenMaintainedCore(batchFps: DataFrame,
                                   corpusFps: DataFrame,
                                   dfState: DataFrame,
                                   maxDf: Long,
                                   minContainmentBp: Long,
                                   hold: DataFrame => DataFrame): DataFrame = {
    require(maxDf >= 1, s"df cap must be >= 1, got $maxDf")
    require(minContainmentBp >= 0 && minContainmentBp <= 10000,
      s"containment is in basis points 0..10000, got $minContainmentBp")
    val ihB = hold(batchFps.select(col("id"), col("h")).distinct())
    val dfB = hold(ihB.groupBy(col("h")).agg(count(lit(1)).as("db")))
    // corpus df for BATCH hashes: delta rows pruned to the batch's hash
    // set before any aggregation (the semi-join side is batch-bounded)
    val dfCB = dfState.join(broadcast(dfB.select(col("h"))), Seq("h"))
      .groupBy(col("h")).agg(sum(col("d")).as("dc"))
    val rareB = hold(dfB.join(dfCB, Seq("h"), "left")
      .where(coalesce(col("dc"), lit(0L)) + col("db") <= maxDf)
      .select(col("h")))
    val pB = hold(ihB.join(broadcast(rareB), Seq("h")))
    val nB = pB.groupBy(col("id")).agg(count(lit(1)).as("n_batch"))
      .withColumnRenamed("id", "batch_id")
    // ONE corpus-table scan serves both consumers (the rare-batch-hash
    // prune here and the candidate-doc denominator pull below) — held
    // for the batch, released with the other intermediates. Compute
    // per batch stays one scan + batch-bounded aggregations; the
    // transient cache is the scan's own columns, nothing derived
    val cfp = hold(corpusFps.select(col("id"), col("h")))
    // pair candidates: every shared hash is by definition a batch hash,
    // so the corpus table is read once, pruned to the rare batch set
    val pC = hold(cfp.join(broadcast(rareB), Seq("h")).distinct())
    val pairs = pB.select(col("h"), col("id").as("batch_id"))
      .join(pC.select(col("h"), col("id").as("corpus_id")), Seq("h"))
      .groupBy(col("batch_id"), col("corpus_id"))
      .agg(count(lit(1)).as("shared"))
    // denominators need the CANDIDATE corpus docs' full rare-hash
    // counts — their non-batch hashes included, so their dfs come from
    // the sidecar too (batch contribution zero there). Candidates come
    // off pC, not pairs: every pC doc holds a rare BATCH hash, so it
    // necessarily pairs with some batch doc — same set, one join
    // shorter a lineage (pairs is expanded once, in the final result)
    val candIds = pC.select(col("id")).distinct()
    val candFps = hold(cfp.join(broadcast(candIds), Seq("id")).distinct())
    val dfCC = dfState
      .join(broadcast(candFps.select(col("h")).distinct()), Seq("h"))
      .groupBy(col("h")).agg(sum(col("d")).as("dc"))
    val rareC = dfCC.join(dfB, Seq("h"), "left")
      .where(col("dc") + coalesce(col("db"), lit(0L)) <= maxDf)
      .select(col("h"))
    val nC = candFps.join(broadcast(rareC), Seq("h"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_corpus"))
      .withColumnRenamed("id", "corpus_id")
    pairs.join(nB, Seq("batch_id")).join(nC, Seq("corpus_id"))
      .select(col("batch_id"), col("corpus_id"),
        col("n_batch"), col("n_corpus"), col("shared"),
        expr("(shared * 10000) div least(n_batch, n_corpus)")
          .as("containment_bp"))
      .where(col("containment_bp") >= minContainmentBp)
  }

  /** C4-style rule-based line cleaning (the line-level rules of the
    * C4 corpus pipeline, applied per document): a line survives only
    * if it (1) ends in terminal punctuation (`. ! ?`, optionally
    * followed by a closing quote), (2) has at least `minWords`
    * whitespace-delimited words, and (3) contains none of the
    * `blacklist` substrings (case-insensitive). Complements
    * [[removeBoilerplateLines]] (frequency-based, corpus-wide): these
    * rules are content-based and row-local, so the whole filter is
    * embarrassingly parallel — the only exchange is the per-document
    * rebuild aggregation.
    *
    * Each dropped line is charged to the FIRST rule that kills it, in
    * the order no-terminal → too-short → blacklist, so the three
    * counters always sum to `n_dropped`.
    */
  def c4LineClean(docs: DataFrame, textCol: String, idCol: String,
                  minWords: Int = 3,
                  blacklist: Seq[String] =
                    Seq("lorem ipsum", "javascript", "{"),
                  sep: String = "\n"): DataFrame = {
    require(minWords >= 1, s"minWords must be >= 1, got $minWords")
    require(blacklist.nonEmpty, "blacklist must not be empty")
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "line")))
    val endsPunct = col("line").rlike("""[.!?]["']?\s*$""")
    val nWords = size(regexp_extract_all(col("line"), lit("""\S+"""), lit(0)))
    val dirty = blacklist.map(b =>
      lower(col("line")).contains(lit(b.toLowerCase))).reduce(_ || _)
    val rule = when(!endsPunct, lit("no_terminal"))
      .when(nWords < minWords, lit("too_short"))
      .when(dirty, lit("blacklist"))
    val judged = lines.withColumn("__rule", rule)
    val agg = judged.groupBy(col(idCol)).agg(
      concat_ws(sep, transform(
        array_sort(collect_list(when(col("__rule").isNull,
          struct(col("pos"), col("line"))))),
        x => x.getField("line"))).as("clean_text"),
      sum(when(col("__rule").isNull, 1L).otherwise(0L)).as("n_kept"),
      sum(when(col("__rule") === "no_terminal", 1L).otherwise(0L))
        .as("n_no_terminal"),
      sum(when(col("__rule") === "too_short", 1L).otherwise(0L))
        .as("n_too_short"),
      sum(when(col("__rule") === "blacklist", 1L).otherwise(0L))
        .as("n_blacklist"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_no_terminal"), lit(0L)).as("n_no_terminal"),
        coalesce(col("n_too_short"), lit(0L)).as("n_too_short"),
        coalesce(col("n_blacklist"), lit(0L)).as("n_blacklist"))
  }

  /** Cross-document line dedup, first occurrence wins (the CCNet /
    * Dolma paragraph-dedup rule): every distinct non-blank line keeps
    * exactly ONE copy corpus-wide — the one at the smallest
    * (document, position) — and all later copies are dropped. Blank
    * lines are structural, not content, and always survive. Contrast
    * with [[removeBoilerplateLines]], which drops ALL copies of lines
    * over a frequency cap: first-wins preserves every distinct
    * sentence somewhere in the corpus, which is what you want when
    * the duplicated text is content (syndication) rather than chrome.
    *
    * Scale shape: electing the winner is a `groupBy(line).agg(min(
    * struct(doc, pos)))` — NOT a content-keyed window. The difference
    * is the whole ballgame at 100 TB: a window partitioned by raw line
    * content routes every copy of a corpus-wide boilerplate line to
    * ONE reducer (billions of rows on a single task), where the
    * aggregate's partial (map-side) combine collapses each hot line to
    * one row per input task before the exchange — the hot key costs
    * O(tasks), not O(copies). The winning struct carries (doc, pos)
    * out of the aggregate, so no join-back is needed. Blank lines are
    * structural survivors and are short-circuited AROUND the exchange
    * entirely (filtered before the groupBy, unioned after), so the
    * billions of blank lines in a real corpus never shuffle at all.
    */
  def dedupLinesKeepFirst(docs: DataFrame, textCol: String,
                          idCol: String, sep: String = "\n"): DataFrame = {
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "line")))
    val blank = length(trim(col("line"))) === 0
    val kept = lines.where(!blank)
      .groupBy(col("line"))
      .agg(min(struct(col(idCol), col("pos"))).as("__w"))
      .select(col("__w").getField(idCol).as(idCol),
        col("__w").getField("pos").as("pos"), col("line"))
      .unionByName(lines.where(blank))
    rebuildCleanDocs(docs, kept, textCol, idCol, sep)
  }

  /** Shared tail of the line-level cleaners: re-assemble each document
    * from its surviving `(pos, line)` rows and account for the drops.
    * A document whose every line was dropped still appears (empty
    * `clean_text`), and a null text column satisfies kept + dropped =
    * total = 0 — `size(split(null))` is null (or -1 under legacy
    * sizeOfNull), which would poison `n_dropped`, so the null case is
    * pinned to 0 explicitly.
    */
  private def rebuildCleanDocs(docs: DataFrame, kept: DataFrame,
                               textCol: String, idCol: String,
                               sep: String): DataFrame = {
    val agg = kept.groupBy(col(idCol)).agg(
      concat_ws(sep, transform(
        array_sort(collect_list(struct(col("pos"), col("line")))),
        x => x.getField("line"))).as("clean_text"),
      count(lit(1)).as("n_kept"))
    docs.select(col(idCol),
        when(col(textCol).isNull, lit(0L))
          .otherwise(size(split(col(textCol),
            java.util.regex.Pattern.quote(sep))).cast("long"))
          .as("__total"))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__total") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** The maintained-state companion to [[dedupLinesKeepFirst]]: the
    * corpus-wide set of non-blank line fingerprints already emitted,
    * stored as `line_md5` (md5 hex of the exact line — engine-portable,
    * 32 bytes/line, content never retained). Build once over the
    * historical corpus, persist as a parquet table, and append
    * [[newLineFingerprints]] per batch — history is tokenized once
    * ever, the same amortization contract as Dedup's signature table.
    */
  def seenLinesTable(docs: DataFrame, textCol: String,
                     sep: String = "\n"): DataFrame =
    docs
      .select(explode(split(col(textCol),
        java.util.regex.Pattern.quote(sep))).as("line"))
      .where(length(trim(col("line"))) > 0)
      .select(md5(col("line")).as("line_md5"))
      .distinct()

  /** Fingerprints a batch would add to the seen-lines table: its kept
    * first-occurrence lines not already in `seenLines`. Append these
    * after emitting the batch so the next batch screens against them. */
  def newLineFingerprints(batch: DataFrame, seenLines: DataFrame,
                          textCol: String,
                          sep: String = "\n"): DataFrame =
    seenLinesTable(batch, textCol, sep)
      .join(seenLines.select(col("line_md5")), Seq("line_md5"), "left_anti")

  /** Incremental first-wins line dedup: clean a NEW batch against the
    * maintained [[seenLinesTable]] without re-reading historical text.
    * A non-blank line is dropped if its fingerprint is already in
    * `seenLines` (some earlier batch kept it) or if an earlier
    * (doc, pos) within THIS batch kept it — exactly the order-dependent
    * first-wins rule [[dedupLinesKeepFirst]] applies corpus-wide, paid
    * incrementally. Blank lines are structural and always survive.
    * Output schema matches [[dedupLinesKeepFirst]].
    *
    * Scale shape: O(batch) — explode, one hash anti-join against the
    * fingerprint table (map-side combine on md5; history text never
    * read), and the within-batch winner election is the same
    * partial-aggregated `min(struct(doc, pos))` as
    * [[dedupLinesKeepFirst]] (a batch-wide hot line combines map-side
    * instead of landing on one reducer), over only the surviving novel
    * lines. The 100 TB corpus appears solely as the 32-byte/line
    * fingerprint relation.
    */
  def dedupLinesIncremental(batch: DataFrame, seenLines: DataFrame,
                            textCol: String, idCol: String,
                            sep: String = "\n"): DataFrame = {
    val lines = batch.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "line")))
    val blank = length(trim(col("line"))) === 0
    val novel = lines.where(!blank)
      .withColumn("line_md5", md5(col("line")))
      .join(seenLines.select(col("line_md5")), Seq("line_md5"), "left_anti")
      .drop("line_md5")
    val kept = novel
      .groupBy(col("line"))
      .agg(min(struct(col(idCol), col("pos"))).as("__w"))
      .select(col("__w").getField(idCol).as(idCol),
        col("__w").getField("pos").as("pos"), col("line"))
      .unionByName(lines.where(blank))
    rebuildCleanDocs(batch, kept, textCol, idCol, sep)
  }

  def removeBoilerplateLines(docs: DataFrame, textCol: String,
                             idCol: String, maxOccurrences: Long,
                             sep: String = "\n",
                             broadcastBoilerplate: Boolean = true): DataFrame = {
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "line")))
    val boilerplate = lines.groupBy(col("line"))
      .agg(count(lit(1)).as("__cnt"))
      .where(col("__cnt") > maxOccurrences)
      .select(col("line"))
    val bpSide =
      if (broadcastBoilerplate) broadcast(boilerplate) else boilerplate
    val kept = lines.join(bpSide, Seq("line"), "left_anti")
    rebuildCleanDocs(docs, kept, textCol, idCol, sep)
  }
}
