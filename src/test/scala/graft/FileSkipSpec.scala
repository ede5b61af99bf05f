package graft

import org.apache.spark.sql.functions._

import graft.sources.{ClusteredWrite, SkippingIndex}

class FileSkipSpec extends SparkSpec {

  private lazy val path: String = {
    val p = java.nio.file.Files
      .createTempDirectory("graft_fileskip").toString + "/li"
    ClusteredWrite.writeClustered(
      Tables.load(spark, sf0001, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity"),
      p, Seq("l_orderkey"), partitions = 8)
    SkippingIndex.buildStats(spark, p, Seq("l_orderkey"))
    p
  }

  test("stats table: one row per data file, counts sum to the table") {
    val files = spark.read.parquet(path).inputFiles.length
    val stats = spark.read.parquet(SkippingIndex.statsPath(path))
    assert(stats.count() == files.toLong)
    val total = stats.agg(sum("n_rows")).head().getLong(0)
    assert(total == spark.read.parquet(path).count())
    // envelopes must be well-formed
    assert(stats.where(col("min_l_orderkey") > col("max_l_orderkey"))
      .count() == 0)
  }

  test("readRange opens strictly fewer files and returns the exact " +
    "unpruned result") {
    val all = spark.read.parquet(path).inputFiles.length
    assert(all > 1, "fixture should have multiple files")
    // sf0.001 orderkeys span 0..1499 over 8 range-clustered files — a
    // 100..300 slice intersects ~1-2 of them
    val lo = 100L; val hi = 300L
    val pruned = SkippingIndex.readRange(spark, path, "l_orderkey", lo, hi)
    assert(pruned.inputFiles.length < all,
      s"no files skipped: ${pruned.inputFiles.length} of $all read")
    val expected = spark.read.parquet(path)
      .where(col("l_orderkey") >= lo && col("l_orderkey") <= hi)
    assert(pruned.exceptAll(expected).isEmpty &&
      expected.exceptAll(pruned).isEmpty)
    assert(pruned.count() > 0)
  }

  test("a range beyond every envelope yields zero rows, schema intact") {
    val out = SkippingIndex.readRange(
      spark, path, "l_orderkey", Long.MaxValue - 1, Long.MaxValue)
    assert(out.count() == 0)
    assert(out.columns.toSeq ==
      Seq("l_orderkey", "l_linenumber", "l_quantity"))
  }

  test("stats envelopes admit no false negatives on a point probe") {
    // every orderkey in the table must fall inside the envelope of at
    // least one file that a point readRange would open
    val keys = spark.read.parquet(path)
      .select("l_orderkey").distinct().limit(20)
      .collect().map(_.getLong(0))
    val stats = spark.read.parquet(SkippingIndex.statsPath(path))
    keys.foreach { k =>
      val hit = stats.where(col("min_l_orderkey") <= k &&
        col("max_l_orderkey") >= k).count()
      assert(hit >= 1, s"key $k matched no file envelope")
    }
  }
}
