package graft

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Dedup}
import graft.sources.MaintainedIndex

/** The layout-pruned maintained screens (round-11 headline): stored
  * corpus tables are hash-clustered with per-file key envelopes, and
  * the per-batch screens open only the files whose envelope meets the
  * batch's bounded probe sets — per-batch read IO O(batch), never
  * O(corpus). These tests pin (1) the file-count collapse on a
  * multi-file table, (2) bit-identical results vs the unpruned
  * screens, (3) the safety rule that every degraded state (missing
  * index, stale stats, pre-index tables) reads MORE, never less.
  */
class ScreenPruneSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_prune_$tag")
      .toString

  // --------------------------------------------- MaintainedIndex core

  test("pruned read on a synthetic clustered table: bounded file subset, " +
    "identical rows") {
    val dir = tmpDir("synth")
    val d = (0L until 4000L).map(i => (i, s"v$i")).toDF("h", "v")
    // appends size their file count by bytes (scale-adaptive, r12);
    // this fixture needs MANY files per generation to observe pruning,
    // so force the per-file target down to one byte
    withSQLConf("spark.sql.shuffle.partitions" -> "16",
      "graft.append.targetFileBytes" -> "1") {
      MaintainedIndex.writeClusteredIndexed(d, dir, "h")
      // three append generations — envelopes overlap ACROSS
      // generations, stay narrow within each
      MaintainedIndex.clusteredIdempotentAppend(
        (4000L until 5000L).map(i => (i, s"v$i")).toDF("h", "v"),
        dir, "b1_", "h")
      MaintainedIndex.clusteredIdempotentAppend(
        (5000L until 6000L).map(i => (i, s"v$i")).toDF("h", "v"),
        dir, "b2_", "h")
    }
    val probes: Array[Any] = Array(7L, 4321L, 5900L)
    val probeLits = Seq(7L, 4321L, 5900L)
    val (kept, all) = MaintainedIndex.pruneFiles(spark, dir, "h", probes)
    assert(all.size >= 20, s"fixture too small: ${all.size} files")
    assert(kept.size <= probes.length * 3,
      s"kept ${kept.size} of ${all.size} — pruning did not engage")
    val full = spark.read.parquet(dir)
      .where(col("h").isin(probeLits: _*))
      .select("h", "v").collect().map(_.toString).sorted.toSeq
    val pruned = MaintainedIndex.readPruned(spark, dir, "h", probes)
      .where(col("h").isin(probeLits: _*))
      .select("h", "v").collect().map(_.toString).sorted.toSeq
    assert(pruned == full)
    // probes hitting nothing → schema-preserving empty, zero files
    val (kept0, _) = MaintainedIndex.pruneFiles(spark, dir, "h",
      Array(999999L))
    assert(kept0.isEmpty)
    assert(MaintainedIndex.readPruned(spark, dir, "h", Array(999999L))
      .count() == 0)
  }

  test("safety rule: unindexed files always read; stale stats rows " +
    "(deleted files) ignored; missing index = full read") {
    val dir = tmpDir("safety")
    withSQLConf("spark.sql.shuffle.partitions" -> "8") {
      MaintainedIndex.writeClusteredIndexed(
        (0L until 800L).map(i => (i, i)).toDF("h", "v"), dir, "h")
      MaintainedIndex.clusteredIdempotentAppend(
        (800L until 900L).map(i => (i, i)).toDF("h", "v"),
        dir, "bx_", "h")
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash window A: data landed, its stats lost → file must be read
    val idx = new org.apache.hadoop.fs.Path(
      MaintainedIndex.indexDir(dir, "h"))
    fs.listStatus(idx).filter(_.getPath.getName.startsWith("bx_"))
      .foreach(s => fs.delete(s.getPath, false))
    val (keptA, _) = MaintainedIndex.pruneFiles(spark, dir, "h",
      Array(850L))
    assert(keptA.exists(_.startsWith("bx_")),
      "unindexed appended files must always be read")
    assert(MaintainedIndex.readPruned(spark, dir, "h", Array(850L))
      .where(col("h") === 850L).count() == 1)
    // crash window B: stats row survives a rolled-back file → ignored
    // (prune must not try to open the missing file)
    withSQLConf("spark.sql.shuffle.partitions" -> "8") {
      MaintainedIndex.clusteredIdempotentAppend(
        (900L until 950L).map(i => (i, i)).toDF("h", "v"),
        dir, "by_", "h")
    }
    fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(s => s.isFile && s.getPath.getName.startsWith("by_"))
      .foreach(s => fs.delete(s.getPath, false))
    assert(MaintainedIndex.readPruned(spark, dir, "h", Array(920L))
      .where(col("h") === 920L).count() == 0)
    // no index at all → everything reads (pre-index tables stay green)
    fs.delete(idx, true)
    val (keptC, allC) = MaintainedIndex.pruneFiles(spark, dir, "h",
      Array(1L))
    assert(keptC == allC)
  }

  // --------------------------------------------- the pruned quote screen

  /** Corpus + two appended batches + a tiny quote batch, via the REAL
    * writers (clustered + projected + df sidecar from birth). */
  private def winnowFixture(): (String, org.apache.spark.sql.DataFrame) = {
    val table = new java.io.File(tmpDir("winnow"), "fps").toString
    def doc(i: Long, salt: String) = (i,
      s"document $i $salt " + (1 to 12).map(j => s"tok${i}x$j").mkString(" "))
    val base = (0L until 40L).map(doc(_, "base")).toDF("doc_id", "text")
    // force many files per append generation (see the synth fixture)
    withSQLConf("spark.sql.shuffle.partitions" -> "16",
      "graft.append.targetFileBytes" -> "1") {
      Corpus.writeWinnowTable(base, "text", "doc_id", table)
      Corpus.appendToWinnowTable(
        (40L until 60L).map(doc(_, "appA")).toDF("doc_id", "text"),
        "text", "doc_id", table)
      Corpus.appendToWinnowTable(
        (60L until 80L).map(doc(_, "appB")).toDF("doc_id", "text"),
        "text", "doc_id", table)
    }
    // tiny batch: one verbatim quote of doc 7's tail + one novel doc
    val batch = Seq(
      (1007L, (5 to 12).map(j => s"tok7x$j").mkString(" ")),
      (2001L, "entirely novel content qqq www eee rrr ttt yyy uuu iii"))
      .toDF("doc_id", "text")
    (table, Corpus.winnowingFingerprints(batch, "text", "doc_id"))
  }

  test("pruned screen == unpruned maintained screen == one-shot screen, " +
    "and the quote is caught") {
    val (table, batchFps) = winnowFixture()
    val pruned = Corpus.winnowingContainmentScreenPrunedM(
      batchFps, table).df
      .orderBy("batch_id", "corpus_id").collect().map(_.toString).toSeq
    val corpusFps = spark.read.parquet(table)
    val dfState = spark.read
      .parquet(Corpus.winnowDfStatePath(table))
      .select(col("h"), col("d"))
    val maintained = Corpus.winnowingContainmentScreenMaintained(
      batchFps, corpusFps, dfState)
      .orderBy("batch_id", "corpus_id").collect().map(_.toString).toSeq
    val oneShot = Corpus.winnowingContainmentScreen(batchFps, corpusFps)
      .orderBy("batch_id", "corpus_id").collect().map(_.toString).toSeq
    assert(pruned == maintained)
    assert(pruned == oneShot)
    assert(pruned.exists(_.contains("1007")), "the planted quote escaped")
    assert(!pruned.exists(_.contains("2001")), "the novel doc was flagged")
  }

  test("the screen's table reads open a BOUNDED file subset of the " +
    "multi-generation table (the 100 TB asymptotic, observed)") {
    val (table, batchFps) = winnowFixture()
    val generations = 3 // initial write + two appends
    // the structural bound: within a generation file key-ranges are
    // pairwise disjoint, so each probe opens at most ONE file per
    // generation — kept scales with the PROBE SET, not the table
    val allProbes: Array[Any] = batchFps.select(col("h")).distinct()
      .collect().map(_.get(0))
    val (kept, all) = MaintainedIndex.pruneFiles(spark, table, "h",
      allProbes)
    assert(all.size >= 24, s"fixture too small: ${all.size} files")
    assert(kept.size <= allProbes.length * generations,
      s"kept ${kept.size} of ${all.size} for ${allProbes.length} probes")
    // and the observed collapse: a 3-hash probe set opens <= 9 of the
    // table's files — the micro-batch regime at 100 TB
    val tiny = allProbes.take(3)
    val (keptT, _) = MaintainedIndex.pruneFiles(spark, table, "h", tiny)
    assert(keptT.size <= tiny.length * generations &&
      keptT.size < all.size / 4,
      s"kept ${keptT.size} of ${all.size} for 3 probes — no collapse")
    // the projection read prunes on the candidate-id axis
    val candProbes: Array[Any] = Array(7L)
    val (keptId, allId) = MaintainedIndex.pruneFiles(spark,
      Corpus.winnowByIdPath(table), "id", candProbes)
    assert(allId.size >= 8, s"projection too small: ${allId.size}")
    assert(keptId.size <= generations,
      s"kept ${keptId.size} of ${allId.size} projection files")
  }

  test("projection + sidecar stay consistent with the table across " +
    "clustered writes and appends") {
    val (table, _) = winnowFixture()
    val t = spark.read.parquet(table).select("id", "h").distinct()
    val proj = spark.read.parquet(Corpus.winnowByIdPath(table))
    assert(proj.count() == t.count())
    assert(proj.join(t, Seq("id", "h")).count() == t.count(),
      "doc-keyed projection diverged from the fingerprint table")
    val folded = spark.read.parquet(Corpus.winnowDfStatePath(table))
      .groupBy("h").agg(sum("d").as("df"))
    val recount = t.groupBy("h").agg(count(lit(1)).as("df"))
    assert(folded.count() == recount.count() &&
      folded.join(recount, Seq("h", "df")).count() == recount.count(),
      "df sidecar diverged from the fingerprint table")
  }

  test("degraded states screen identically: no byid projection, no " +
    "file indexes (pre-index tables heal or full-read)") {
    val (table, batchFps) = winnowFixture()
    val expect = Corpus.winnowingContainmentScreenPrunedM(
      batchFps, table).df
      .orderBy("batch_id", "corpus_id").collect().map(_.toString).toSeq
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // drop every index artifact; keep data + sidecar
    fs.delete(new org.apache.hadoop.fs.Path(
      Corpus.winnowByIdPath(table)), true)
    fs.delete(new org.apache.hadoop.fs.Path(
      MaintainedIndex.indexDir(table, "h")), true)
    fs.delete(new org.apache.hadoop.fs.Path(MaintainedIndex.indexDir(
      Corpus.winnowDfStatePath(table), "h")), true)
    val healed = Corpus.winnowingContainmentScreenPrunedM(
      batchFps, table).df
      .orderBy("batch_id", "corpus_id").collect().map(_.toString).toSeq
    assert(healed == expect)
  }

  test("compacted winnow table: one generation, equal screens, " +
    "markers and replay stamps carried") {
    val (table, batchFps) = winnowFixture()
    val before = Corpus.winnowingContainmentScreenPrunedM(
      batchFps, table).df
      .orderBy("batch_id", "corpus_id").collect().map(_.toString).toSeq
    val out = table + "_compacted"
    Corpus.compactWinnowTable(spark, table, out,
      targetFileBytes = 64L * 1024)
    val after = Corpus.winnowingContainmentScreenPrunedM(
      batchFps, out).df
      .orderBy("batch_id", "corpus_id").collect().map(_.toString).toSeq
    assert(after == before)
    // geometry marker carried; row content exact
    assert(Corpus.winnowTableParams(spark, out) ==
      Corpus.winnowTableParams(spark, table))
    assert(spark.read.parquet(out).count() ==
      spark.read.parquet(table).count())
    // the df sidecar keeps batch_id stamps (replay filtering must
    // survive compaction)
    assert(spark.read.parquet(Corpus.winnowDfStatePath(out))
      .columns.contains("batch_id"))
    // ONE generation: a single probe now opens at most one file
    val probe: Array[Any] = batchFps.select(col("h")).limit(1)
      .collect().map(_.get(0))
    val (kept1, _) = MaintainedIndex.pruneFiles(spark, out, "h", probe)
    assert(kept1.size <= 1,
      s"kept ${kept1.size} files for one probe after compaction")
  }

  // --------------------------------------------- the pruned LSH screen

  test("LSH verify pull prunes the signature table by candidate ids " +
    "and matches the text-path screen") {
    val root = tmpDir("sig")
    val sigPath = new java.io.File(root, "sigs").toString
    def doc(i: Long) = (i, (1 to 15).map(j => s"w${i}y$j").mkString(" "))
    val corpus = (0L until 50L).map(doc).toDF("doc_id", "text")
    withSQLConf("spark.sql.shuffle.partitions" -> "16") {
      Dedup.writeSignatureTable(corpus, "text", "doc_id", sigPath, k = 5)
    }
    // batch: one near-dup of doc 3 (prefix dropped), one novel
    val batch = Seq(
      (1003L, doc(3L)._2.substring(6)),
      (2002L, "novel aaa bbb ccc ddd eee fff ggg hhh iii jjj kkk lll"))
      .toDF("doc_id", "text")
    val viaTable = Dedup.incrementalNearDupAgainstSigsM(
      batch, sigPath, "text", "doc_id").df
      .orderBy("batch_id", "corpus_id").collect().map(_.toString).toSeq
    val direct = Dedup.incrementalNearDup(batch, corpus, "text", "doc_id")
      .orderBy("batch_id", "corpus_id").collect().map(_.toString).toSeq
    assert(viaTable == direct)
    assert(viaTable.exists(_.contains("1003")), "near-dup escaped")
    // file collapse on the candidate-id axis
    val (kept, all) = MaintainedIndex.pruneFiles(spark, sigPath,
      "doc_id", Array(3L))
    assert(all.size >= 8, s"sig table too small: ${all.size}")
    assert(kept.size < all.size,
      s"kept ${kept.size} of ${all.size} signature files")
  }
}
