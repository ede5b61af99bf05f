package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.native.NativeFns

/** Multi-term blocklist screening over a document corpus — the
  * curation gate that keeps contaminated / policy-violating text out
  * of a training mix.
  *
  * Matching is Aho–Corasick ([[graft.functions.native.AhoCountsExpr]]):
  * ONE pass over each document regardless of dictionary size, counting
  * every occurrence of every term including overlapping and nested
  * matches. The scale contrast is the whole point: the regex
  * alternation `(t1|…|tk)` Java's backtracking engine runs is
  * O(text·k) — a 10k-term blocklist over 100 TB of text is only
  * feasible with an automaton. Both operators here are pure row-local
  * projections (zero exchanges): at cluster scale they pipeline inside
  * the scan stage and cost one text pass.
  *
  * The dictionary rides as a foldable literal (blocklists are
  * KBs-to-MBs; the automaton compiles once per task). For dictionaries
  * beyond literal scale, broadcast-join a term table into shingled
  * text instead — that path exists as SparseSim's posting machinery.
  *
  * Reference scope note: the reference repo (bigdata-scala-offline-
  * data-clean) has no multi-pattern scan; this extends the
  * training-data-pipeline surface mandated beyond the reference.
  */
object Blocklist {

  /** Per-(doc, term) occurrence counts, terms that never hit filtered
    * out: (idCol, term_id: long, term: string, cnt: long).
    * Row-local — posexplode of the counts array; no shuffle. */
  def scanCounts(docs: DataFrame, textCol: String, idCol: String,
                 terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "empty blocklist")
    docs
      .select(col(idCol),
        posexplode(NativeFns.ahoCounts(col(textCol), terms))
          .as(Seq("term_id", "cnt")))
      .filter(col("cnt") > 0)
      .select(col(idCol), col("term_id").cast("long").as("term_id"),
        element_at(typedLit(terms), col("term_id").cast("int") + 1)
          .as("term"),
        col("cnt"))
  }

  /** Scrubbed corpus: every dictionary term masked with `repl` under
    * the greedy leftmost-longest non-overlapping rule (the regex-
    * alternation semantics at automaton cost). Row-local projection of
    * all input columns with textCol rewritten — zero exchanges. */
  def scrub(docs: DataFrame, textCol: String, terms: Seq[String],
            repl: String): DataFrame = {
    require(terms.nonEmpty, "empty blocklist")
    docs.withColumn(textCol,
      NativeFns.ahoScrub(col(textCol), terms, repl))
  }

  /** Per-document policy verdict from one automaton pass:
    * (idCol, n_terms: long, n_hits: long, verdict: string) where
    * n_terms counts distinct dictionary terms present, n_hits all
    * occurrences, and verdict buckets by the hit thresholds
    * (>= blockAt → 'block', >= reviewAt → 'review', else 'pass').
    * Array folds over the counts vector — still zero exchanges. */
  def policyReport(docs: DataFrame, textCol: String, idCol: String,
                   terms: Seq[String], reviewAt: Long,
                   blockAt: Long): DataFrame = {
    require(terms.nonEmpty, "empty blocklist")
    require(blockAt >= reviewAt, "blockAt must be >= reviewAt")
    // counts materialized once per row in a sub-projection — the
    // verdict references it three times and CollapseProject keeps a
    // non-cheap multi-referenced alias as its own project, so the
    // automaton scans each document exactly once
    val counts = col("_cnts")
    val nHits: Column = aggregate(counts, lit(0L), (acc, c) => acc + c)
    docs
      .select(col(idCol),
        NativeFns.ahoCounts(col(textCol), terms).as("_cnts"))
      .select(
        col(idCol),
        size(filter(counts, c => c > 0)).cast("long").as("n_terms"),
        nHits.as("n_hits"),
        when(nHits >= blockAt, "block")
          .when(nHits >= reviewAt, "review")
          .otherwise("pass").as("verdict"))
  }
}
