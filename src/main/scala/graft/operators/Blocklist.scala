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

  /** Operator-level dictionary guard: empty dictionaries and empty
    * terms fail HERE, at call time, with the operator's name in the
    * message — not as the automaton builder's lazy per-task require
    * mid-job (the expression's own analysis-time check is the second
    * line of defense for SQL-built plans). */
  private def requireTerms(terms: Seq[String]): Unit = {
    require(terms.nonEmpty, "empty blocklist")
    require(terms.forall(t => t != null && t.nonEmpty),
      "blocklist terms must be non-null, non-empty strings")
  }

  /** Per-(doc, term) occurrence counts, terms that never hit filtered
    * out: (idCol, term_id: long, term: string, cnt: long).
    * Row-local — posexplode of the counts array; no shuffle. */
  def scanCounts(docs: DataFrame, textCol: String, idCol: String,
                 terms: Seq[String], fold: Boolean = false): DataFrame = {
    requireTerms(terms)
    docs
      .select(col(idCol),
        posexplode(
          if (fold) NativeFns.ahoFoldCounts(col(textCol), terms)
          else NativeFns.ahoCounts(col(textCol), terms))
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
            repl: String, fold: Boolean = false): DataFrame = {
    requireTerms(terms)
    docs.withColumn(textCol,
      if (fold) NativeFns.ahoFoldScrub(col(textCol), terms, repl)
      else NativeFns.ahoScrub(col(textCol), terms, repl))
  }

  /** [[scanCounts]] over a term TABLE instead of a foldable literal —
    * the dictionary-at-scale path. The term table collects to the
    * driver and ships as a broadcast variable (term tables are
    * metadata-plane: a 1M-term list is tens of MB — the same plane as
    * the broadcast every dimension join already ships, far below the
    * foldable-literal ceiling where Catalyst would re-serialize the
    * dictionary into every expression tree copy), and the automaton is
    * built ONCE PER PARTITION inside a mapPartitions seam (the
    * Multimodal per-partition init device) — rows then stream through
    * it with zero per-row setup. Zero exchanges: the operator
    * pipelines inside the scan stage exactly like the literal path,
    * and emits the same rows: (idCol: long, term_id, term, cnt), terms
    * that never hit filtered out.
    *
    * `terms` must have columns (term_id: castable to long, term:
    * string) with unique ids; idCol must be castable to long (the
    * typed-seam contract — use the literal path for exotic id types).
    */
  def scanCountsTable(docs: DataFrame, textCol: String, idCol: String,
                      terms: DataFrame,
                      fold: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val t = terms
      .select(col("term_id").cast("long"), col("term").cast("string"))
      .collect()
      .sortBy(_.getLong(0))
    require(t.nonEmpty, "empty blocklist table")
    require(t.forall(r => !r.isNullAt(1) && r.getString(1).nonEmpty),
      "blocklist terms must be non-null, non-empty strings")
    require(t.map(_.getLong(0)).distinct.length == t.length,
      "blocklist term_id must be unique")
    val termIds = t.map(_.getLong(0))
    val termStrs = t.map(r =>
      if (fold) graft.functions.native.CaseFold.fold(r.getString(1))
      else r.getString(1))
    val origStrs = t.map(_.getString(1))
    val bc = spark.sparkContext.broadcast((termIds, termStrs, origStrs))
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val (ids, folded, orig) = bc.value
        // per-partition init: ONE automaton build, then pure streaming
        val automaton =
          graft.functions.native.AhoAutomaton.build(folded.toSeq)
        it.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else {
            val counts = new Array[Long](folded.length)
            automaton.scan(
              if (fold) graft.functions.native.CaseFold.fold(text)
              else text, counts)
            Iterator.range(0, counts.length).collect {
              case i if counts(i) > 0 => (id, ids(i), orig(i), counts(i))
            }
          }
        }
      }
      .toDF(idCol, "term_id", "term", "cnt")
  }

  /** Per-document policy verdict from one automaton pass:
    * (idCol, n_terms: long, n_hits: long, verdict: string) where
    * n_terms counts distinct dictionary terms present, n_hits all
    * occurrences, and verdict buckets by the hit thresholds
    * (>= blockAt → 'block', >= reviewAt → 'review', else 'pass').
    * Array folds over the counts vector — still zero exchanges. */
  def policyReport(docs: DataFrame, textCol: String, idCol: String,
                   terms: Seq[String], reviewAt: Long,
                   blockAt: Long, fold: Boolean = false): DataFrame = {
    requireTerms(terms)
    require(blockAt >= reviewAt, "blockAt must be >= reviewAt")
    // counts materialized once per row in a sub-projection — the
    // verdict references it three times and CollapseProject keeps a
    // non-cheap multi-referenced alias as its own project, so the
    // automaton scans each document exactly once
    val counts = col("_cnts")
    val nHits: Column = aggregate(counts, lit(0L), (acc, c) => acc + c)
    docs
      .select(col(idCol),
        (if (fold) NativeFns.ahoFoldCounts(col(textCol), terms)
         else NativeFns.ahoCounts(col(textCol), terms)).as("_cnts"))
      .select(
        col(idCol),
        size(filter(counts, c => c > 0)).cast("long").as("n_terms"),
        nHits.as("n_hits"),
        when(nHits >= blockAt, "block")
          .when(nHits >= reviewAt, "review")
          .otherwise("pass").as("verdict"))
  }
}
