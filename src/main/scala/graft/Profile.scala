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

    if (args.contains("curate")) { profileCurate(spark, sfDir); spark.stop(); return }

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

  /** Phase timing for the x_stream_curate pipeline: sig-table write,
    * batch staging, the streaming run itself, and the result read. */
  def profileCurate(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft-pcur").toFile
    val sigPath = new java.io.File(root, "sigs").toString
    val outPath = new java.io.File(root, "admitted").toString
    val srcDir = new java.io.File(root, "src")
    srcDir.mkdirs()
    val d = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    time("corpus count")(d.count())
    time("sig table write")(
      Dedup.writeSignatureTable(d, "text", "doc_id", sigPath, k = 5))
    val chain = concat(md5(col("text")), md5(concat(col("text"), lit("a"))),
      md5(concat(col("text"), lit("b"))))
    val b0 = d.where(col("doc_id") % 5 === 0).select(
        (col("doc_id") + 5000000L).as("doc_id"),
        expr("substring(text, 11)").as("text"))
      .union(d.where(col("doc_id") % 5 === 1).select(
        (col("doc_id") + 6000000L).as("doc_id"), chain.as("text")))
    val b1 = d.where(col("doc_id") % 5 === 2).select(
        (col("doc_id") + 7000000L).as("doc_id"),
        expr("substring(text, 11)").as("text"))
    time("batch staging") {
      Seq(b0, b1).zipWithIndex.foreach { case (b, i) =>
        val tmp = new java.io.File(root, s"tmp$i").toString
        b.coalesce(1).write.parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(srcDir, s"b$i.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(1000000000000L + i * 60000L)
        ()
      }
    }
    val src = spark.readStream.schema(b0.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir.toString)
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        progress.add(s"batch=${e.progress.batchId} " +
          s"durationMs=${e.progress.durationMs}"); ()
      }
      override def onQueryTerminated(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    time("stream run")(
      graft.streaming.StreamingOps.continuousCurate(
        src, sigPath, outPath, "text", "doc_id", k = 5, threshold = 0.5,
        shufflePartitions = Some(8)))
    spark.streams.removeListener(listener)
    progress.forEach(p => println(s"[profile] $p"))
    time("result read")(spark.read.parquet(outPath).count())
  }
}
