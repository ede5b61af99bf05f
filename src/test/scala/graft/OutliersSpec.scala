package graft

import org.apache.spark.sql.functions._

import graft.ops.Outliers

/** Winsorization / IQR fences: discrete-quantile semantics on a known
  * distribution, the broadcast clamp plan, and cap-rate sanity.
  */
class OutliersSpec extends SparkSpec {

  import spark.implicits._

  test("discThresholds = percentile_disc on a known distribution") {
    // values 1..100 in one group: p05 -> 5, p95 -> 95 (scale 1)
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val th = Outliers.discThresholds(df, "g", "v", 0.05, 0.95, scale = 1L)
      .head()
    assert(th.getLong(1) == 5L && th.getLong(2) == 95L)
  }

  test("winsorize clamps exactly the tails and preserves row count") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val w = Outliers.winsorize(df, "g", "v", 0.05, 0.95, scale = 1L)
    assert(w.count() == 100)
    val capped = w.where(col("v_scaled") =!= col("v_capped")).count()
    assert(capped == 9, s"expected 4 low + 5 high capped, got $capped")
    val bounds = w.agg(min("v_capped"), max("v_capped")).head()
    assert(bounds.getLong(0) == 5L && bounds.getLong(1) == 95L)
  }

  test("iqrOutliers flags the classic 1.5-IQR fence") {
    // 1..100 plus a far outlier: q1=25(+1?), q3=75-ish; 1000 is outside
    val df = ((1 to 100).map(_.toDouble) :+ 1000.0)
      .map(v => ("g", v)).toDF("g", "v")
    val out = Outliers.iqrOutliers(df, "g", "v", kQuarters = 6, scale = 1L)
    assert(out.where(col("v") === 1000.0).head().getAs[Boolean]("is_outlier"))
    assert(out.where(col("is_outlier")).count() == 1)
  }

  test("the clamp joins thresholds by broadcast (fact side not reshuffled)") {
    val ev = Tables.load(spark, sf0001, "events")
    val p = Outliers.winsorize(ev, "event_type", "value")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"thresholds not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"fact reshuffled for clamp:\n$p")
  }
}
