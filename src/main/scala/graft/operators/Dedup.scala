package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Document-deduplication operators for large-scale training-data
  * pipelines: exact (hash-groupBy), MinHash+LSH banding, SimHash, and
  * n-gram Jaccard verification.
  *
  * Scale design (100 TB corpus):
  *  - Exact dedup is one hash-shuffle on a 32-hex-char fingerprint —
  *    the minimum possible; no text travels through the shuffle except
  *    one representative per group (min doc_id).
  *  - MinHash signatures are computed row-local with array higher-order
  *    functions (no explode, no shuffle); only the (band, bandKey,
  *    doc_id) triples — 4 small rows per document — are shuffled for the
  *    LSH bucket self-join. Candidate verification joins shingle sets
  *    back by doc_id (two hash joins), so full pairwise comparison never
  *    happens: cost is O(candidates), not O(n²).
  *  - SimHash is row-local; near-dup banding on 12-bit sub-keys follows
  *    the same bucket-join pattern.
  */
object Dedup {

  /** Exact dedup by normalized-text md5 fingerprint: one row per distinct
    * fingerprint with the surviving (minimum) doc id and the group size.
    */
  def exactDedup(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(TextFns.fingerprintMd5(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keeper_id"),
        count(lit(1)).as("dup_count"))

  /** MinHash signature columns m0..m15 over distinct k-shingles.
    *
    * The md5-derived 32-bit shingle hashes are materialized ONCE into an
    * intermediate array (`__shh`) and each signature slot is a cheap
    * affine-min over those ints — without this, every slot recomputes
    * every shingle md5 (16× the hashing cost, the dominant term).
    */
  def withMinhashSignature(docs: DataFrame, textCol: String,
                           k: Int = 5): DataFrame = {
    val sh = docs.withColumn("__sh",
        graft.functions.native.NativeFns.shinglesNative(col(textCol), k))
      .withColumn("__sig",
        graft.functions.native.NativeFns.minhashSig(col("__sh")))
    (0 until TextFns.MinhashSeeds.length).foldLeft(sh) {
      case (df, j) => df.withColumn(s"m$j", col("__sig").getItem(j))
    }.drop("__sig")
  }

  /** LSH candidate pairs + exact shingle-Jaccard verification.
    *
    * Banding: 4 bands × 4 rows over the 16-slot signature. Documents
    * sharing any band key become a candidate pair; pairs are then
    * verified with exact Jaccard over their distinct shingle sets and
    * kept if >= `threshold`.
    *
    * Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard rounded
    * to 4 decimals.
    */
  def minhashNearDupPairs(docs: DataFrame, textCol: String, idCol: String,
                          k: Int = 5, threshold: Double = 0.5): DataFrame = {
    // The signature relation feeds three consumers (both sides of the
    // band self-join and the shingle-set verification join); Spark has no
    // common-subexpression reuse across joins, so without persisting, the
    // shingling+hashing subtree runs three times. Persisting the
    // signature stage is what a production LSH dedup does between
    // candidate generation and verification (MEMORY_AND_DISK: spills
    // instead of recomputing at 100 TB).
    val sig = withMinhashSignature(docs, textCol, k)
      .select(col(idCol).as("doc_id") +: col("__sh") +:
        (0 until 16).map(j => col(s"m$j")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = sig.select(col("doc_id"), explode(array(
      (0 until 4).map { b =>
        struct(lit(b).as("band"),
          concat_ws("_", (0 until 4).map(r => col(s"m${4 * b + r}")): _*)
            .as("bkey"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.bkey"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val shSets = sig.select(col("doc_id"), col("__sh"))
    cand
      .join(shSets.select(col("doc_id").as("doc_a"), col("__sh").as("sh_a")),
        "doc_a")
      .join(shSets.select(col("doc_id").as("doc_b"), col("__sh").as("sh_b")),
        "doc_b")
      .withColumn("jaccard", round(
        graft.functions.native.NativeFns.jaccardNative(
          col("sh_a"), col("sh_b")), 4))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 48-bit SimHash per document (portable md5-derived token hashes). */
  def withSimhash(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("__th", TextFns.tokenHashes48(col(textCol)))
      .withColumn("simhash", TextFns.simhash48("__th"))
      .drop("__th")

  /** Connected components over an undirected pair graph: every PAIRED
    * node is labeled with the minimum node id of its component (the
    * cluster representative). Nodes with no pair do not appear in the
    * output — a dedup drop-stage must left-join and
    * `coalesce(cluster_rep, doc_id)` to keep singletons.
    *
    * Iterative min-label propagation with pointer doubling: each round
    * every node takes the min of (its label, its neighbors' labels, its
    * label's label). The compression hop halves chain lengths, so rounds
    * needed = O(log diameter), not O(diameter). Each round ends with a
    * localCheckpoint — this both materializes the round (blocks on
    * executors) and truncates the logical plan, without which the
    * per-round plan nesting grows until driver-side analysis OOMs.
    * Only the changed-row count crosses the driver. Throws if
    * `maxRounds` is hit without convergence — silent partial labels
    * would poison the downstream drop decisions.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxRounds: Int = 50,
                          iterPartitions: Int = 8): DataFrame = {
    // the label/edge relations are tiny compared to the pair-generation
    // work upstream; iterating at full shuffle parallelism pays ~5 stages
    // of task-scheduling overhead per round for near-empty partitions.
    // `iterPartitions` bounds the per-round constant — raise it when the
    // pair graph itself is huge.
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .repartition(iterPartitions)
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
      .localCheckpoint(true)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "dst"), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("label")).as("nlabel"))
      val merged = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nlabel"), col("label")))
            .as("label"))
      // pointer-doubling hop: follow my label to ITS label
      val updated = merged.alias("m")
        .join(merged.select(col("doc_id").as("label"),
          col("label").as("label2")).alias("p"), Seq("label"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("label2"), col("label")))
            .as("label"))
        .localCheckpoint(true)
      val changed = updated.join(labels.withColumnRenamed("label", "old"),
        Seq("doc_id")).where(col("label") =!= col("old")).count()
      converged = changed == 0
      labels = updated
      rounds += 1
    }
    if (!converged) {
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds " +
          "(component diameter too large) — raise maxRounds")
    }
    labels.select(col("doc_id"), col("label").as("cluster_rep"))
  }

  /** Word n-gram Jaccard similarity between two text columns (exact
    * verification metric for near-dup candidates). */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    def grams(t: Column): Column = {
      val toks = split(lower(trim(t)), "\\s+")
      array_distinct(transform(
        sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
    }
    val ga = grams(a)
    val gb = grams(b)
    round(size(array_intersect(ga, gb)).cast("double") /
      size(array_union(ga, gb)).cast("double"), 4)
  }
}
