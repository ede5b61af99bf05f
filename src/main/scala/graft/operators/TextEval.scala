package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generation-eval overlap metrics — ROUGE-n precision/recall/F1 and
  * BLEU's clipped modified n-gram precision (Papineni et al., ACL 2002;
  * Lin, ACL 2004) — in the library's exact-integer basis-point
  * arithmetic, so a SQL oracle reproduces every value bit-for-bit.
  *
  * The multiset clip Σ_g min(count_cand(g), count_ref(g)) is computed
  * RELATIONALLY: explode n-grams, count per (pair, gram, side), join
  * the two sides, sum the minimum. That is the shape that survives
  * 100 TB — per-pair work never materializes an O(|doc|²) comparison,
  * and the shuffle key (pair id, gram) is fine-grained enough that hot
  * pairs spread. The alternative (per-row HOF over gram arrays) is
  * quadratic per document and was rejected.
  *
  * Reference scope note: the reference repo has no text-eval metrics;
  * this extends the training-data-pipeline surface (eval-metrics
  * family beside AUC/PR/calibration).
  */
object TextEval {

  /** Whitespace word tokens, lowercased — the corpus tokenization the
    * oracle mirrors with string_split_regex(lower(trim(s)), '\s+'). */
  private def toks(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** Word n-grams joined with single spaces; fewer than n tokens →
    * empty array (Spark's sequence() would DESCEND on start>stop, so
    * the short case is guarded explicitly). */
  private[graft] def wordGrams(c: Column, n: Int): Column = {
    require(n >= 1)
    val t = toks(c)
    if (n == 1) t
    else when(size(t) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(t) - (n - 1)),
        i => array_join(slice(t, i, lit(n)), " ")))
  }

  /** Per-pair clipped n-gram overlap:
    * (idCol, clip_n: long, n_cand_n: long, n_ref_n: long) where
    * clip = Σ_g min(count_cand(g), count_ref(g)) — BLEU's clip rule —
    * and the totals are the n-gram counts of each side. */
  def clippedOverlap(pairs: DataFrame, idCol: String, candCol: String,
                     refCol: String, n: Int): DataFrame = {
    val base = pairs.select(col(idCol),
      wordGrams(col(candCol), n).as("cg"),
      wordGrams(col(refCol), n).as("rg"))
    val c = base.select(col(idCol), explode(col("cg")).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("cc"))
    val r = base.select(col(idCol), explode(col("rg")).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("cr"))
    val clip = c.join(r, Seq(idCol, "g"))
      .groupBy(col(idCol))
      .agg(sum(least(col("cc"), col("cr"))).as(s"clip_$n"))
    base.select(col(idCol),
        size(col("cg")).cast("long").as(s"n_cand_$n"),
        size(col("rg")).cast("long").as(s"n_ref_$n"))
      .join(clip, Seq(idCol), "left")
      .na.fill(0L, Seq(s"clip_$n"))
  }

  /** Within-document repetition signals in the Gopher family (Rae et
    * al. 2021 §A1.1, token-unit variant): per document,
    *   top2_gram / top2_n      — the most frequent word 2-gram (ties
    *                             break lexicographically) and its count
    *   top2_tok_bp             — 10⁴·(2·top2_n) div n_tokens: token
    *                             mass of all its instances (can exceed
    *                             10⁴ on pathological overlap — that IS
    *                             the signal)
    *   dup5_cov_bp             — 10⁴·covered div n_tokens where
    *                             covered = |union of [pos, pos+5)
    *                             intervals of every word 5-gram that
    *                             occurs ≥2×| — coverage, not instance
    *                             count, so nested repeats don't double
    *   n_tokens                — whitespace token count
    * The interval union is a per-doc running-max window over instance
    * starts (one shuffle on the doc key); gram counting is two
    * (doc, gram) hash aggregations with map-side partials — the shape
    * that holds at 100 TB.
    */
  def repetitionReport(docs: DataFrame, textCol: String,
                       idCol: String): DataFrame = {
    val id = col(idCol)
    val nt = docs.select(id,
      size(toks(col(textCol))).cast("long").as("n_tokens"))
    def grams(n: Int) = docs
      .select(id, posexplode(wordGrams(col(textCol), n))
        .as(Seq("pos0", "g")))
      .select(id, (col("pos0") + 1).as("pos"), col("g"))
    val top2 = grams(2)
      .groupBy(id, col("g")).agg(count(lit(1)).as("top2_n"))
      .withColumn("rn", row_number().over(Window.partitionBy(id)
        .orderBy(col("top2_n").desc, col("g"))))
      .where(col("rn") === 1)
      .select(id, col("g").as("top2_gram"), col("top2_n"))
    val g5 = grams(5)
    val dup5 = g5.groupBy(id, col("g")).agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).select(id, col("g"))
    val w = Window.partitionBy(id).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cov = g5.join(dup5, Seq(idCol, "g"))
      .select(id, col("pos"), (col("pos") + 5).as("e"))
      .withColumn("pe", max(col("e")).over(w))
      .select(id, greatest(col("e") -
        greatest(col("pos"), coalesce(col("pe"), col("pos"))), lit(0))
        .as("cv"))
      .groupBy(id).agg(sum(col("cv")).as("covered"))
    nt.join(top2, Seq(idCol), "left").join(cov, Seq(idCol), "left")
      .select(id,
        coalesce(col("top2_gram"), lit("")).as("top2_gram"),
        coalesce(col("top2_n"), lit(0L)).as("top2_n"),
        expr("coalesce(top2_n, 0) * 2 * 10000 div greatest(n_tokens, 1)")
          .as("top2_tok_bp"),
        expr("coalesce(covered, 0) * 10000 div greatest(n_tokens, 1)")
          .as("dup5_cov_bp"),
        col("n_tokens"))
  }

  /** ROUGE-1/2 + BLEU-clip report per (candidate, reference) pair, all
    * in exact integer basis points:
    *   p{n}_bp  = 10⁴·clip div n_cand   (modified n-gram precision)
    *   r{n}_bp  = 10⁴·clip div n_ref    (ROUGE-n recall)
    *   f{n}_bp  = 2·p·r div (p+r)       (ROUGE-n F1; 0 when p+r=0)
    *   brevity_bp = 10⁴·len_cand div len_ref  (BLEU's BP argument)
    *   bleu2_sq_bp2 = p1_bp·p2_bp       (squared BLEU-2: the exact
    *     integer whose square root is the 2-gram geometric mean —
    *     published rather than rooted so the lane stays radical-free)
    */
  def rougeBleuReport(pairs: DataFrame, idCol: String, candCol: String,
                      refCol: String): DataFrame = {
    val o1 = clippedOverlap(pairs, idCol, candCol, refCol, 1)
    val o2 = clippedOverlap(pairs, idCol, candCol, refCol, 2)
    // exact LONG division via SQL `div` (Column./ is double division)
    def bp(num: String, den: String): Column =
      expr(s"$num * 10000 div greatest($den, 1)")
    def f1(p: String, r: String): Column =
      expr(s"CASE WHEN $p + $r = 0 THEN CAST(0 AS BIGINT) " +
        s"ELSE 2 * $p * $r div ($p + $r) END")
    o1.join(o2, Seq(idCol))
      .select(col(idCol),
        bp("clip_1", "n_cand_1").as("p1_bp"),
        bp("clip_1", "n_ref_1").as("r1_bp"),
        bp("clip_2", "n_cand_2").as("p2_bp"),
        bp("clip_2", "n_ref_2").as("r2_bp"),
        bp("n_cand_1", "n_ref_1").as("brevity_bp"))
      .select(col(idCol), col("p1_bp"), col("r1_bp"),
        f1("p1_bp", "r1_bp").as("f1_bp"),
        col("p2_bp"), col("r2_bp"),
        f1("p2_bp", "r2_bp").as("f2_bp"),
        col("brevity_bp"),
        (col("p1_bp") * col("p2_bp")).as("bleu2_sq_bp2"))
  }
}
