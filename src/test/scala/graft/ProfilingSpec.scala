package graft

import org.apache.spark.sql.functions._

import graft.ops.Profiling

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Some(1L), Some(2.5), Some("b")),
    (Some(2L), None, Some("a")),
    (None, Some(7.5), None),
    (Some(2L), Some(7.5), Some("c"))
  ).toDF("k", "v", "s")

  test("profile reports counts, nulls, distincts, and typed min/max") {
    val rows = Profiling.profile(df, Seq("k", "v"), Seq("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = rows("k")
    assert(k.getLong(1) === 4 && k.getLong(2) === 1 && k.getLong(3) === 2)
    assert(k.getDouble(4) === 1.0 && k.getDouble(5) === 2.0)
    assert(k.isNullAt(6) && k.isNullAt(7))
    val v = rows("v")
    assert(v.getLong(2) === 1 && v.getLong(3) === 2)
    assert(v.getDouble(4) === 2.5 && v.getDouble(5) === 7.5)
    val s = rows("s")
    assert(s.getLong(2) === 1 && s.getLong(3) === 3)
    assert(s.getString(6) === "a" && s.getString(7) === "c")
    assert(s.isNullAt(4) && s.isNullAt(5))
  }

  test("profile is a single scan of the input") {
    val plan = Profiling.profile(df, Seq("k", "v"), Seq("s"))
      .queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.size === 1, s"expected one scan, got:\n$plan")
  }

  test("approx distinct variant avoids the Expand") {
    val exact = Profiling.profile(df, Seq("k", "v"), Seq("s"))
      .queryExecution.executedPlan.toString
    val approx = Profiling.profile(df, Seq("k", "v"), Seq("s"),
        distinctAgg = approx_count_distinct(_))
      .queryExecution.executedPlan.toString
    assert(exact.contains("Expand"))
    assert(!approx.contains("Expand"))
  }
}
