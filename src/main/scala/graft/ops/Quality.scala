package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints (a Deequ-style check pass,
  * sized for 100 TB): every ROW-LOCAL rule is a conditional count
  * inside ONE aggregation over ONE scan — adding rules adds columns,
  * not jobs — while uniqueness and referential-integrity rules, which
  * are irreducibly relational, run as their own aggregation / anti-join
  * and are unioned into the same report. The output is a small
  * (rule, n_violations) table a pipeline gates on.
  */
object Quality {

  sealed trait Rule { def name: String }
  /** Rows where `cond` is FALSE (or null) are violations. */
  final case class Check(name: String, cond: Column) extends Rule
  /** Rows sharing a duplicate value of `cols` are violations (count =
    * rows beyond the first of each duplicated key). */
  final case class Unique(name: String, cols: Seq[String]) extends Rule
  /** Rows whose `col` value is absent from `ref`'s `refCol` are
    * violations (null FK values are violations too — use an explicit
    * Check to allow nulls). */
  final case class ForeignKey(name: String, col: String,
                              ref: DataFrame, refCol: String) extends Rule

  /** (rule, n_violations) for every rule, one row per rule. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be unique")
    val spark = df.sparkSession
    val checks = rules.collect { case c: Check => c }
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (checks.nonEmpty) {
      // one scan, one aggregate, |checks| columns
      // coalesce: sum over ZERO rows is null, and an empty input has
      // zero violations, not unknown — matches the Unique/FK rules
      def viol(c: Check) = coalesce(
        sum(when(!c.cond or c.cond.isNull, 1L).otherwise(0L)), lit(0L))
      val agg = df.agg(viol(checks.head).as(checks.head.name),
        checks.tail.map(c => viol(c).as(c.name)): _*)
      parts += agg.select(explode(map(
        checks.flatMap(c => Seq(lit(c.name), col(c.name))): _*))
        .as(Seq("rule", "n_violations")))
    }
    parts ++= rules.collect {
      case Unique(name, cols) =>
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
          .agg(coalesce(sum(col("__n") - 1L), lit(0L)).as("v"))
          .select(lit(name).as("rule"), col("v").as("n_violations"))
      case ForeignKey(name, c, ref, refCol) =>
        df.select(col(c)).join(
            ref.select(col(refCol).as(c)).distinct(),
            Seq(c), "left_anti")
          .agg(count(lit(1)).as("v"))
          .select(lit(name).as("rule"), col("v").as("n_violations"))
    }
    parts.reduce(_ unionByName _)
  }
}
