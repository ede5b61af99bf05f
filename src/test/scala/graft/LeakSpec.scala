package graft

import graft.operators.Dedup
import graft.ops.MatStrategy
import graft.queries.TrainingData

/** Round-2 judge finding: the dedup family's localCheckpoint-based
  * materialization stranded executor blocks for the session lifetime
  * (one set per query execution — Bench runs each query twice). The
  * operators now materialize escaping results via parquet spill and
  * release every intermediate; these tests pin that contract.
  */
class LeakSpec extends SparkSpec {

  /** Blocks persisted while `f` runs and still registered after it. */
  private def leakedBlocks[A](f: => A): Set[Int] = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    f
    sc.getPersistentRDDs.keySet.diff(before).toSet
  }

  test("minhashNearDupPairs leaves no persistent RDD blocks") {
    val leaked = leakedBlocks {
      TrainingData.minhashDedupQ(spark, sf0001).count()
    }
    assert(leaked.isEmpty, s"leaked RDD blocks: $leaked")
  }

  test("connectedComponents (x_dedup_clusters) leaves no blocks") {
    val leaked = leakedBlocks {
      TrainingData.dedupClustersQ(spark, sf0001).count()
    }
    assert(leaked.isEmpty, s"leaked RDD blocks: $leaked")
  }

  test("end-to-end dedup drop leaves no blocks") {
    val leaked = leakedBlocks {
      TrainingData.dedupDropQ(spark, sf0001).count()
    }
    assert(leaked.isEmpty, s"leaked RDD blocks: $leaked")
  }

  test("incrementalNearDup leaves no persistent RDD blocks") {
    val leaked = leakedBlocks {
      TrainingData.neardupIncrementalQ(spark, sf0001).count()
    }
    assert(leaked.isEmpty, s"leaked RDD blocks: $leaked")
  }

  test("Materialized handles release Local blocks when requested") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val docs = TrainingData.nearDupCorpus(spark, sf0001)
    val m = Dedup.minhashNearDupPairsM(docs, "text", "doc_id",
      k = 5, threshold = 0.5, mat = MatStrategy.Local)
    assert(m.df.count() >= 0)
    m.release()
    assert(sc.getPersistentRDDs.keySet.diff(before).isEmpty)
  }

  test("semanticDedup leaves no persistent RDD blocks") {
    val leaked = leakedBlocks {
      TrainingData.semdedupQ(spark, sf0001).count()
    }
    assert(leaked.isEmpty, s"leaked RDD blocks: $leaked")
  }

  test("contrastiveTriplets leaves no persistent RDD blocks") {
    val leaked = leakedBlocks {
      TrainingData.contrastiveQ(spark, sf0001).count()
    }
    assert(leaked.isEmpty, s"leaked RDD blocks: $leaked")
  }

  test("SQ8/IVF index build + append + search leave no blocks") {
    val dir = java.nio.file.Files.createTempDirectory("graft_leak_idx")
    val path = dir.resolve("idx").toString
    val emb = Tables.load(spark, sf0001, "embeddings")
    val leaked = leakedBlocks {
      graft.operators.Similarity.writeIvfSqIndex(
        emb.filter(org.apache.spark.sql.functions.col("vec_id") >= 50),
        "vec_id", "embedding", path, nlist = 16, iters = 2)
      graft.operators.Similarity.appendToIvfSqIndex(
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 50),
        "vec_id", "embedding", path)
      graft.operators.Similarity.ivfSqTopKFromIndex(
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5),
        "vec_id", "embedding", path, 3).count()
    }
    assert(leaked.isEmpty, s"leaked RDD blocks: $leaked")
  }

  test("labelPropagation (x_label_prop) leaves no persistent RDD blocks") {
    val leaked = leakedBlocks {
      TrainingData.labelPropQ(spark, sf0001).count()
    }
    assert(leaked.isEmpty, s"leaked RDD blocks: $leaked")
  }

  test("kCore (x_kcore) leaves no persistent RDD blocks") {
    val leaked = leakedBlocks {
      TrainingData.kcoreQ(spark, sf0001).count()
    }
    assert(leaked.isEmpty, s"leaked RDD blocks: $leaked")
  }

  test("hits (x_hits) leaves no persistent RDD blocks") {
    val leaked = leakedBlocks {
      TrainingData.hitsQ(spark, sf0001).count()
    }
    assert(leaked.isEmpty, s"leaked RDD blocks: $leaked")
  }

  test("connectedComponents over the Reliable strategy survives and cleans up") {
    val docs = TrainingData.nearDupCorpus(spark, sf0001)
    val pairs = Dedup.minhashNearDupPairs(docs, "text", "doc_id", 5, 0.5)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val m = Dedup.connectedComponentsM(pairs, "doc_a", "doc_b",
      roundMat = MatStrategy.Reliable)
    // same labels as the Local-round path
    val viaLocal = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    assert(m.df.orderBy("doc_id").collect().toSeq ==
      viaLocal.orderBy("doc_id").collect().toSeq)
    m.release()
    assert(sc.getPersistentRDDs.keySet.diff(before).isEmpty)
  }
}
