package graft

import org.apache.spark.sql.functions._

import graft.functions.native.{AhoAutomaton, NativeFns}
import graft.operators.Blocklist

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force all-occurrences count: #{i : s.substring(i).startsWith(t)}. */
  private def brute(text: String, terms: Seq[String]): Seq[Long] =
    terms.map { t =>
      (0 to text.length - t.length)
        .count(i => text.regionMatches(i, t, 0, t.length)).toLong
    }

  test("automaton counts overlapping and nested matches") {
    val terms = Seq("ana", "nana", "a", "banana")
    val counts = new Array[Long](terms.size)
    AhoAutomaton.build(terms).scan("banana bananana", counts)
    // banana: ana@2,4  nana@3          bananana: ana@2,4,6  nana@3,5
    // and "banana" itself prefixes "bananana" — nested full-term hit
    assert(counts.toSeq == brute("banana bananana", terms))
    assert(counts.toSeq == Seq(5L, 3L, 7L, 2L))
  }

  test("automaton == brute force on adversarial small-alphabet strings") {
    val terms = Seq("a", "aa", "ab", "aba", "bab", "abab", "bb")
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(30))("ab" (rnd.nextInt(2))).mkString
      val counts = new Array[Long](terms.size)
      AhoAutomaton.build(terms).scan(s, counts)
      assert(counts.toSeq == brute(s, terms), s"text=$s")
    }
  }

  test("automaton == brute force under RANDOM dictionaries (failure-link " +
    "edges: shared prefixes, nested terms, suffix overlaps)") {
    val rnd = new scala.util.Random(23)
    def randTerm() =
      Seq.fill(1 + rnd.nextInt(4))("ab" (rnd.nextInt(2))).mkString
    (1 to 120).foreach { _ =>
      val terms = Seq.fill(2 + rnd.nextInt(6))(randTerm()).distinct
      val auto = AhoAutomaton.build(terms)
      val text = Seq.fill(rnd.nextInt(40))("ab" (rnd.nextInt(2))).mkString
      val counts = new Array[Long](terms.size)
      auto.scan(text, counts)
      assert(counts.toSeq == brute(text, terms),
        s"terms=$terms text=$text")
      // and the scrub walk agrees with the regex walk for the same dict
      val pattern = terms.sortBy(t => (-t.length, t)).mkString("|")
      val (masked, _) = auto.maskLeftmostLongest(
        text, terms.map(_.length).toArray, "_")
      assert(masked == text.replaceAll(pattern, "_"),
        s"terms=$terms text=$text")
    }
  }

  test("expression scans unicode text on UTF-16 code units, null-safe") {
    val df = Seq(Some("中文中文中"), Some(""), None).toDF("t")
    val r = df.select(
      NativeFns.ahoCounts($"t", Seq("中文", "文中", "量")).as("c"))
      .collect()
    assert(r(0).getSeq[Long](0) == Seq(2L, 2L, 0L))
    assert(r(1).getSeq[Long](0) == Seq(0L, 0L, 0L))
    assert(r(2).isNullAt(0))
  }

  test("non-foldable dictionary is a clean analysis failure") {
    val df = Seq(("x", Seq("x"))).toDF("t", "d")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function(NativeFns.AhoCountsName, $"t", $"d")).collect()
    }
    assert(ex.getMessage.contains("foldable"))
  }

  test("scanCounts emits only hit terms with ids and names") {
    val docs = Seq((1L, "merge the scan scan"), (2L, "nothing here"))
      .toDF("doc_id", "text")
    val r = Blocklist.scanCounts(docs, "text", "doc_id",
        Seq("merge", "scan", "qzx"))
      .orderBy("doc_id", "term_id").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getString(2),
      x.getLong(3))).toSeq ==
      Seq((1L, 0L, "merge", 1L), (1L, 1L, "scan", 2L)))
  }

  test("policyReport thresholds and single-scan shape") {
    val docs = Seq((1L, "bad bad bad bad"), (2L, "bad bad"), (3L, "ok"))
      .toDF("doc_id", "text")
    val rep = Blocklist.policyReport(docs, "text", "doc_id",
      Seq("bad"), reviewAt = 2L, blockAt = 4L)
    val r = rep.orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getString(3))).toSeq
    assert(r == Seq((1L, 1L, 4L, "block"), (2L, 1L, 2L, "review"),
      (3L, 0L, 0L, "pass")))
  }

  test("policy lane scans each document once (no re-inlined automaton)") {
    // the automaton projection must survive as its own project (one
    // scan per row), referenced — not re-inlined thrice — downstream;
    // parquet-backed input so ConvertToLocalRelation can't fold it
    val plan = queries.TrainingData.queries("x_blocklist_policy")(
      spark, sf0001).queryExecution.optimizedPlan.toString
    assert("graft_aho_counts".r.findAllIn(plan).size == 1, plan)
  }

  test("both blocklist lanes are zero-exchange row-local plans") {
    Seq(
      queries.TrainingData.queries("x_blocklist_scan"),
      queries.TrainingData.queries("x_blocklist_policy")
    ).foreach { q =>
      val df = q(spark, sf0001)
      val physical = df.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"), physical)
      assert(df.count() > 0)
    }
  }

  test("scrub masks leftmost-longest non-overlapping, like the regex walk") {
    val terms = Seq("merge", "scan", "batch stream", "ana", "nana", "qzx")
    val df = Seq("banana bananana").toDF("text")
    val r = Blocklist.scrub(df, "text", terms, "<B>").head().getString(0)
    // banana: leftmost 'ana'@1 wins (not later 'nana'); bananana:
    // 'ana'@1 then the now-leftmost 'nana'@4
    assert(r == "b<B>na b<B><B>")
  }

  test("scrub == java-regex replaceAll with a length-desc alternation") {
    val terms = Seq("a", "ab", "aba", "bab", "nana", "ana", "b")
    val pattern = terms.sortBy(t => (-t.length, t)).mkString("|")
    val auto = AhoAutomaton.build(terms)
    val lens = terms.map(_.length).toArray
    val rnd = new scala.util.Random(11)
    (1 to 300).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(24))("abn" (rnd.nextInt(3))).mkString
      val (masked, _) = auto.maskLeftmostLongest(s, lens, "_X_")
      assert(masked == s.replaceAll(pattern, "_X_"), s"text=$s")
    }
  }

  test("x_blocklist_scrub masks the planted tail in every document") {
    val q = queries.TrainingData.queries("x_blocklist_scrub")
    val df = q(spark, sf0001)
    // ' banana bananana' always yields ana + (ana, nana) = 3 spans
    assert(df.filter($"n_masked" < 3).count() == 0)
    assert(df.filter(!$"clean_text".contains("<BLOCKED>")).count() == 0)
  }

  test("x_blocklist_scan finds the planted overlapping terms in every doc") {
    val q = queries.TrainingData.queries("x_blocklist_scan")
    val nDocs = Tables.load(spark, sf0001, "documents").count()
    val planted = q(spark, sf0001)
      .filter($"term" === "ana" && $"cnt" === 5L).count()
    assert(planted == nDocs) // ' banana bananana' → ana×5 everywhere
  }
}
