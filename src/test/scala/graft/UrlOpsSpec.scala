package graft

import org.apache.spark.sql.functions._

import graft.operators.UrlOps

/** URL canonicalization / per-host cap: rule-level edge cases plus the
  * plan shapes the 100 TB design claims (row-local canon, windowed cap
  * with the Spark-4 group-limit rewrite).
  */
class UrlOpsSpec extends SparkSpec {

  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("url")
      .select(UrlOps.canonicalizeUrl(col("url")).as("c"))
      .head().getString(0)

  test("canonicalization: fragment, default port, www, tracking params") {
    assert(canon("HTTPS://WWW.Ex.COM:443/A/b?utm_source=x&id=3&utm_medium=y#top")
      === "https://ex.com/A/b?id=3")
    assert(canon("http://ex.com:80/p?fbclid=abc") === "http://ex.com/p")
    assert(canon("https://sub.ex.com/p?gclid=1&a=2&b=3")
      === "https://sub.ex.com/p?a=2&b=3")
  }

  test("canonicalization preserves what must survive") {
    // non-default port, path case, non-tracking param order
    assert(canon("https://Ex.com:8443/Path?b=2&a=1")
      === "https://ex.com:8443/Path?b=2&a=1")
    // a bare URL is untouched
    assert(canon("https://ex.com/") === "https://ex.com/")
    // www in the PATH is not host www
    assert(canon("https://ex.com/www.html") === "https://ex.com/www.html")
  }

  test("host and registered-domain extraction") {
    val r = Seq("https://a.b.ex.com:8080/p?q=1").toDF("url")
      .select(UrlOps.canonicalizeUrl(col("url")).as("canon_url"))
      .select(UrlOps.hostOf(col("canon_url")).as("h"))
      .select(col("h"), UrlOps.registeredDomainOf(col("h")).as("d"))
      .head()
    assert(r.getString(0) === "a.b.ex.com")
    assert(r.getString(1) === "ex.com")
  }

  test("dedupByCanonicalUrl collapses re-fetches to the min id") {
    val df = Seq(
      (1L, "https://WWW.ex.com:443/p?utm_source=a"),
      (2L, "https://ex.com/p"),
      (3L, "https://ex.com/q")).toDF("doc_id", "url")
    val out = UrlOps.dedupByCanonicalUrl(df, "url", "doc_id")
      .orderBy("canon_url").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq(("https://ex.com/p", 1L, 2L), ("https://ex.com/q", 3L, 1L)))
  }

  test("canonicalization is shuffle-free whole-stage codegen (no UDF)") {
    val d = Tables.load(spark, sf0001, "documents")
      .withColumn("url", concat(lit("https://h"), col("doc_id") % 5,
        lit(".ex.com/p?utm_x=1&id="), col("doc_id")))
    val p = UrlOps.withCanonicalUrl(d, "url")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"unexpected shuffle:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"UDF in plan:\n$p")
    assert(p.contains("*(1)"), s"not codegen'd (no *(1) span):\n$p")
  }

  test("capPerHost gets the WindowGroupLimit rewrite and truncates ranks") {
    val d = Tables.load(spark, sf0001, "documents")
      .withColumn("host", concat(lit("h"), col("doc_id") % 3))
    val capped = UrlOps.capPerHost(d, "host", "doc_id", 5,
      Seq(col("n_chars").desc, col("doc_id").asc))
    val p = capped.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$p")
    val byHost = capped.groupBy("host").count().collect()
    assert(byHost.nonEmpty && byHost.forall(_.getLong(1) <= 5))
  }
}
