package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Analytics

/** The robust-stats scale switch (r12, r11 verdict item 7): the q_mad
  * family's rank selection runs as a raw-row window locally and as the
  * pre-aggregated cumulative form past `graft.robustStats.preAggBytes`
  * (at 100 TB a per-flag raw window is a single-task billion-row
  * sort). These tests pin (1) bit-equal results across the switch on
  * real data and (2) that the gate actually flips on the conf.
  */
class RobustStatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def both(fn: (SparkSession, String) => DataFrame)
      : (Seq[String], Seq[String]) = {
    val raw = fn(spark, dir).collect().map(_.toString).sorted.toSeq
    val pre = withSQLConf("graft.robustStats.preAggBytes" -> "0") {
      fn(spark, dir).collect().map(_.toString).sorted.toSeq
    }
    (raw, pre)
  }

  test("q_mad: raw-window and pre-aggregated forms are bit-equal") {
    val (raw, pre) = both(Analytics.madQ)
    assert(raw.nonEmpty && raw == pre)
  }

  test("q_mad_outliers: raw-window and pre-aggregated forms are " +
    "bit-equal") {
    val (raw, pre) = both(Analytics.madOutliersQ)
    assert(raw.nonEmpty && raw == pre)
  }

  test("q_trimmed_mean: raw-window and pre-aggregated forms are " +
    "bit-equal") {
    val (raw, pre) = both(Analytics.trimmedMeanQ)
    assert(raw.nonEmpty && raw == pre)
  }

  test("q_weighted_median: raw-window and pre-aggregated forms are " +
    "bit-equal") {
    val (raw, pre) = both(Analytics.weightedMedianQ)
    assert(raw.nonEmpty && raw == pre)
  }

  test("the gate flips on the conf and stays off at bench scale") {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
    assert(!Analytics.robustPreAgg(li),
      "sf0.001 must take the raw-window form by default")
    withSQLConf("graft.robustStats.preAggBytes" -> "0") {
      assert(Analytics.robustPreAgg(li),
        "a zero threshold must force the pre-aggregated form")
    }
  }
}
