package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the bench outliers (not part of the
  * driver contract). Times each stage of the MinHash/LSH dedup and the
  * connected-components iteration on SPARK_GRAFT_SF_DIR.
  */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    import graft.operators.Dedup
    val corpus = {
      val d = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      d.union(d.select((col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, 11)").as("text")))
    }
    time("corpus count")(corpus.count())
    val sh = corpus.withColumn("__sh",
      graft.functions.native.NativeFns.shinglesNative(col("text"), 5))
    time("shingles only")(sh.select(sum(size(col("__sh")))).collect())
    val sig = Dedup.withMinhashSignature(corpus, "text", 5)
    time("signature")(sig.select(sum(col("m0"))).collect())
    spark.catalog.clearCache()
    // minhashNearDupPairs materializes eagerly — time construction too
    val nPairs = time("minhash pairs e2e")(
      Dedup.minhashNearDupPairs(corpus, "text", "doc_id", 5, 0.5).count())
    println(s"[profile] pairs=$nPairs")
    spark.catalog.clearCache()
    time("cc e2e")(
      Dedup.connectedComponents(
        Dedup.minhashNearDupPairs(corpus, "text", "doc_id", 5, 0.5),
        "doc_a", "doc_b").count())
    spark.stop()
  }
}
