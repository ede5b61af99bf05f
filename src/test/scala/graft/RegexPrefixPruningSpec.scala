package graft

import org.apache.spark.sql.functions._

import graft.plans.RegexPrefixPruning

class RegexPrefixPruningSpec extends SparkSpec {
  import spark.implicits._

  test("literalPrefix: anchored literals, quantifier backoff, rejects") {
    import RegexPrefixPruning.literalPrefix
    assert(literalPrefix("^user12.*") === Some("user12"))
    assert(literalPrefix("^user12") === Some("user12"))
    assert(literalPrefix("^user\\d+") === Some("user"))
    assert(literalPrefix("^ab+c") === Some("ab"))   // + keeps the char
    assert(literalPrefix("^ab?c") === Some("a"))    // ? drops it
    assert(literalPrefix("^ab*c") === Some("a"))    // * drops it
    assert(literalPrefix("^ab{2,3}") === Some("a")) // { drops it
    assert(literalPrefix("^a[0-9]") === Some("a"))
    assert(literalPrefix("user") === None)          // unanchored
    assert(literalPrefix("^ab|cd") === None)        // alternation escapes
    assert(literalPrefix("^(ab)c") === None)        // group first
    assert(literalPrefix("^.*x") === None)          // no literal head
  }

  test("upperBound increments the last ASCII char only") {
    import RegexPrefixPruning.upperBound
    assert(upperBound("user12") === Some("user13"))
    assert(upperBound("abz") === Some("ab{"))
    assert(upperBound("a~") === None)
  }

  test("anchored rlike over parquet pushes the implied range to the scan") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rpp").toString
    (0 until 2000).map(i => (f"user$i%04d", i.toLong))
      .toDF("rowkey", "v")
      .write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .where(col("rowkey").rlike("^user011[0-9]*$"))
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [") &&
      scan.contains("GreaterThanOrEqual(rowkey,user011)") &&
      scan.contains("LessThan(rowkey,user012)"),
      s"range conjuncts not pushed:\n$scan")
    // and the rewrite changed nothing semantically: user0110..user0119
    assert(q.count() === 10L)
  }

  test("results are bit-identical with the rule removed") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rpp2").toString
    (0 until 500).map(i => (s"k$i", i.toLong)).toDF("rowkey", "v")
      .write.mode("overwrite").parquet(dir)
    def run() = spark.read.parquet(dir)
      .where(col("rowkey").rlike("^k1[0-9]?$"))
      .collect().map(_.getString(0)).sorted.toSeq
    val withRule = run()
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == RegexPrefixPruning)
    try {
      val withoutRule = run()
      assert(withRule == withoutRule && withRule.nonEmpty)
      // k1, k10..k19
      assert(withRule.size === 11)
    } finally spark.experimental.extraOptimizations = saved
  }

  test("rule is idempotent (fixpoint batch cannot stack conjuncts)") {
    val df = Seq(("a1", 1L)).toDF("rowkey", "v")
      .where(col("rowkey").rlike("^a[0-9]"))
    val once = RegexPrefixPruning(df.queryExecution.analyzed)
    val twice = RegexPrefixPruning(once)
    assert(once.toString == twice.toString)
    assert(once.toString.contains(">= a"), s"range missing:\n$once")
  }

  test("the gated prefix-scan query pushes its range to the scan") {
    val scan = graft.queries.Parity.queries("p_rowkey_prefix_scan")(
      spark, sf0001).queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThanOrEqual(source,src1)") &&
      scan.contains("LessThan(source,src2)"),
      s"range not pushed for the gated query:\n$scan")
  }

  test("unanchored or computed-column regexes are left untouched " +
       "(the reference's .*-style rowkey scan keeps its exact plan)") {
    val p = graft.queries.Parity.queries("p_keyed_snapshot_scan")(
      spark, sf0001).queryExecution.optimizedPlan.toString
    assert(p.contains("RLIKE") && !p.contains(">="),
      s"conservative rule fired on an unanchored pattern:\n$p")
  }
}
