package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Re-identification-risk auditing for release pipelines (the
  * complement of the PII SCRUB in [[graft.functions.TextFns]]: scrub
  * removes direct identifiers from text, this measures how exposed the
  * STRUCTURED columns still leave each row). A row is k-anonymous when
  * at least k rows share its full quasi-identifier combination (Sweeney
  * 2002); groups below k are linkage-attack targets and either get
  * suppressed or generalized before export.
  *
  * Scale shape: the audit is ONE hash aggregation on the
  * quasi-identifier tuple — the groupBy key IS the privacy unit, so
  * 100 TB audits at the cost of a count(*). Suppression is a broadcast
  * of the (small, by definition: only groups BELOW k, each carrying no
  * payload beyond the key) risky-key list back onto the fact rows —
  * never a window over the full table and never a driver collect.
  */
object Privacy {

  /** Per-quasi-identifier-group occupancy: (quasiCols*, group_n,
    * at_risk) — `at_risk` marks groups with fewer than `k` members.
    * The release gate reads `max(at_risk)` / the risky-row total; the
    * full report is the remediation worklist.
    */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
                       k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .withColumn("at_risk", col("group_n") < k)
  }

  /** The release projection: rows in groups below `k` have every
    * quasi-identifier REPLACED with null (cell suppression), all other
    * rows pass through unchanged. The risky-key list is an aggregation
    * output (bounded by the number of small groups), joined back
    * broadcast-style on the quasi tuple; null-safe equality (`<=>`)
    * keeps null-valued quasi cells in the same group on both sides.
    */
  def suppressBelowK(df: DataFrame, quasiCols: Seq[String],
                     k: Long): DataFrame = {
    val risky = kAnonymityReport(df, quasiCols, k)
      .where(col("at_risk"))
      .select(quasiCols.map(c => col(c).as(s"__r_$c")) :+
        lit(1).as("__risky"): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"__r_$c"))
      .reduce(_ && _)
    val joined = df.join(broadcast(risky), cond, "left")
    // the literal marker (never null on a match, even when every quasi
    // cell of the risky group is null) decides suppression
    val suppressed = quasiCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c,
        when(col("__risky").isNotNull,
          lit(null).cast(d.schema(c).dataType))
          .otherwise(col(c)))
    }
    suppressed.drop(quasiCols.map(c => s"__r_$c") :+ "__risky": _*)
  }

  /** l-diversity audit (Machanavajjhala et al. 2007): k-anonymity
    * bounds identity disclosure, but a group whose members all share
    * ONE sensitive value still discloses that attribute at any k — the
    * homogeneity attack. Per quasi group: occupancy, the number of
    * DISTINCT sensitive values, and `at_risk` for groups below `l`.
    *
    * Same scale shape as [[kAnonymityReport]]: the quasi tuple is the
    * aggregation key, and count(DISTINCT sensitive) runs as Spark's
    * standard two-phase expand-aggregate — one shuffle keyed by
    * (quasi*, sensitive) then one by quasi*, both partial-aggregated
    * map-side, so a 100 TB audit never materializes per-group value
    * lists.
    */
  def lDiversityReport(df: DataFrame, quasiCols: Seq[String],
                       sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"),
        countDistinct(col(sensitiveCol)).as("l_distinct"))
      .withColumn("at_risk", col("l_distinct") < l)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    * rung of the disclosure ladder: a group can be k-anonymous AND
    * l-diverse yet still leak by SKEW (20 members, 19 sharing one
    * sensitive value, counts as l=2-diverse). Per quasi group: the
    * total-variation distance between the group's sensitive-value
    * distribution and the table-wide one, as exact integer basis
    * points — tvd_bp = 10⁴·Σ_v|n_gv·N − n_v·n_g| div (2·n_g·N) —
    * with `at_risk` marking groups above `maxTvdBp`.
    *
    * Exactness: every term is integer arithmetic on counts (decimal
    * lane for the products, so 100 TB row counts can't overflow), and
    * the single integral division happens last — the audit is
    * bit-identical across engines and runs. Sensitive values ABSENT
    * from a group contribute n_v·n_g each; their total folds to
    * n_g·(N − Σ_{v∈group} n_v), so the plan never manufactures
    * absent (group, value) rows.
    *
    * Scale shape: one (quasi*, sensitive) aggregation; the global
    * value-frequency table (|distinct sensitive| rows) broadcasts
    * back; the per-group total rides a window over the aggregated
    * rows (already partitioned by the quasi tuple); one final rollup.
    * No per-group value lists, no expansion beyond the (group, value)
    * pairs that actually occur.
    */
  def tClosenessReport(df: DataFrame, quasiCols: Seq[String],
                       sensitiveCol: String, maxTvdBp: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    require(maxTvdBp >= 0 && maxTvdBp <= 10000,
      s"maxTvdBp must be in [0, 10000], got $maxTvdBp")
    val qc = quasiCols.map(col)
    val gv = df.groupBy(qc :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("n_gv"))
    val glob = df.groupBy(col(sensitiveCol))
      .agg(count(lit(1)).as("n_v"))
    val tot = df.agg(count(lit(1)).as("n_tot"))
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(qc: _*)
    gv.join(broadcast(glob), Seq(sensitiveCol))
      .crossJoin(broadcast(tot))
      .withColumn("n_g", sum(col("n_gv")).over(wg))
      .withColumn("term", abs(
        col("n_gv").cast("decimal(38,0)") * col("n_tot") -
          col("n_v").cast("decimal(38,0)") * col("n_g")))
      .groupBy(qc: _*)
      .agg(max(col("n_g")).as("group_n"),
        max(col("n_tot")).as("__nt"),
        sum(col("term")).as("__present"),
        sum(col("n_v")).as("__nv_present"))
      .withColumn("tvd_bp", expr(
        """cast((__present + cast(group_n as decimal(38,0)) *
          |  (__nt - __nv_present)) * 10000 div
          |  (2 * cast(group_n as decimal(38,0)) * __nt)
          |  as bigint)""".stripMargin))
      .withColumn("at_risk", col("tvd_bp") > maxTvdBp)
      .drop("__nt", "__present", "__nv_present")
  }

  /** Warner's randomized response (1965) — the local-DP release
    * mechanism that stays integer-exact end to end, unlike
    * Laplace/Gaussian noise whose transcendental sampling cannot be
    * made bit-identical across engines. Each row releases its TRUE
    * binary flag with probability p = 3/4 and the opposite otherwise
    * (ε = ln(p/(1−p)) = ln 3); the coin here is a deterministic
    * portable hash of (seed, row id), which makes the release
    * reproducible and oracle-auditable — substitute a physical RNG
    * when actual plausible deniability is required, the estimator is
    * unchanged. Per group: n, the released yes-count, the debiased
    * estimate of the true rate — at p = 3/4 that is
    * (4·n_yes − n)·10⁴ div (2n) basis points — and the true rate for
    * calibration. The estimate clamps to [0, 10⁴]: sampling noise can
    * push the raw estimator outside, and clamping also removes the
    * one spot where engines could disagree (floor vs truncate on a
    * negative numerator — both land at 0 after the clamp).
    *
    * Scale shape: one row-local hash + flip, one hash aggregation on
    * the group key. Nothing else.
    */
  def randomizedResponse(df: DataFrame, groupCols: Seq[String],
                         flagCol: String, idCol: String,
                         seed: String = "rr"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val flip = TextFns.hash32(
      concat(lit(seed + ":"), col(idCol).cast("string"))) % 4 === 0
    df.withColumn("__rel",
        when(flip, !col(flagCol)).otherwise(col(flagCol)))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__rel").cast("long")).as("n_yes"),
        sum(col(flagCol).cast("long")).as("__true_yes"))
      .withColumn("est_bp",
        greatest(least(
          expr("(4 * n_yes - n) * 10000 div (2 * n)"), lit(10000L)),
          lit(0L)))
      .withColumn("true_bp", expr("__true_yes * 10000 div n"))
      .drop("__true_yes")
  }
}
