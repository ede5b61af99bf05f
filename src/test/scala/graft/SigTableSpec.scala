package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.queries.TrainingData

/** Maintained-signature-table flow: write signatures at ingest, screen
  * later batches against the stored table — same results as re-hashing
  * the corpus, with the corpus text never touched again.
  */
class SigTableSpec extends SparkSpec {

  test("screening against the stored signature table == recomputing") {
    val d = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val batch = d.where(col("doc_id") % 7 === 0).select(
      (col("doc_id") + 5000000L).as("doc_id"),
      expr("substring(text, 11)").as("text"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_sigs").toString + "/sigs"
    Dedup.writeSignatureTable(d, "text", "doc_id", path)
    val viaTable = Dedup.incrementalNearDupAgainstSigsM(
      batch, path, "text", "doc_id").df
      .orderBy("batch_id", "corpus_id").collect().toSeq
    val viaText = Dedup.incrementalNearDup(batch, d, "text", "doc_id")
      .orderBy("batch_id", "corpus_id").collect().toSeq
    assert(viaTable == viaText,
      "stored-signature screen must equal the recomputed screen")
    assert(viaTable.nonEmpty, "near-copies must be found")
  }

  test("self near-dup pairs from the stored table == recomputing") {
    val d = TrainingData.nearDupCorpus(spark, sf0001)
    val path = java.nio.file.Files
      .createTempDirectory("graft_sigs_self").toString + "/sigs"
    Dedup.writeSignatureTable(d, "text", "doc_id", path)
    val viaTable = Dedup.nearDupPairsFromSigs(spark, path, threshold = 0.5)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val viaText = Dedup.minhashNearDupPairs(d, "text", "doc_id",
        k = 5, threshold = 0.5)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(viaTable == viaText,
      "stored-signature pairs must equal the recomputed pairs")
    assert(viaTable.nonEmpty, "near-copies must be found")
  }

  test("a missing k marker names the path and the writer to use") {
    val bare = java.nio.file.Files
      .createTempDirectory("graft_sigs_bare").toString + "/sigs"
    Tables.load(spark, sf0001, "documents")
      .select(col("doc_id")).write.parquet(bare)
    val e = intercept[IllegalArgumentException] {
      Dedup.signatureTableK(spark, bare)
    }
    assert(e.getMessage.contains(bare) &&
      e.getMessage.contains("writeSignatureTable"))
  }

  test("the signature table carries no text — the corpus side of a " +
    "screen is signatures only, and band scans prune to m0..m15") {
    val d = TrainingData.nearDupCorpus(spark, sf0001)
    val path = java.nio.file.Files
      .createTempDirectory("graft_sigs2").toString + "/sigs"
    Dedup.writeSignatureTable(d, "text", "doc_id", path)
    val table = spark.read.parquet(path)
    assert(!table.schema.fieldNames.contains("text"),
      "signature table must not store corpus text")
    assert(table.schema.fieldNames.toSet ==
      (Set("doc_id", "__sh") ++ (0 until 16).map(j => s"m$j")))
    // band-key generation needs only the 16 signature slots: the scan
    // for that projection must prune __sh (the big array column) away
    val bandScan = table
      .select((col("doc_id") +: (0 until 16).map(j => col(s"m$j"))): _*)
      .queryExecution.executedPlan.toString
    assert(!bandScan.contains("__sh"),
      s"band scan must prune the shingle array:\n$bandScan")
  }

  test("nearDupBandProfile is consistent with the pair screen: same " +
    "pairs, same jaccards, 1 <= n_bands <= 4") {
    val d = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val corpus = d.union(d.select((col("doc_id") + 1000000L).as("doc_id"),
      expr("substring(text, 11)").as("text")))
    val path = java.nio.file.Files
      .createTempDirectory("graft_bandprof").toString + "/sigs"
    Dedup.writeSignatureTable(corpus, "text", "doc_id", path)
    val pairs = Dedup.nearDupPairsFromSigs(spark, path, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val profile = Dedup.nearDupBandProfile(spark, path, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(profile.keySet === pairs.keySet,
      "profile must cover exactly the verified pair set")
    assert(profile.nonEmpty)
    profile.foreach { case (k, (nb, j)) =>
      assert(nb >= 1L && nb <= 4L, s"$k collided in $nb bands")
      assert(j === pairs(k), s"$k jaccard drifted: $j vs ${pairs(k)}")
    }
  }
}
