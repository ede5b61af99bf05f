package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOf attaches the latest right row at-or-before each left time") {
    val left = Seq((1L, 10L, "p1"), (1L, 5L, "p2"), (2L, 7L, "p3"))
      .toDF("k", "t", "id")
    val right = Seq((1L, 4L, "c1"), (1L, 9L, "c2"), (2L, 8L, "c3"))
      .toDF("k", "t", "id")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("id"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    // mirrors the DuckDB ASOF semantics: p1@10→c2@9, p2@5→c1@4, p3@7→none
    assert(out == Map("p1" -> Some("c2"), "p2" -> Some("c1"), "p3" -> None))
  }

  test("asOf includes right rows at exactly the left time (<=, not <)") {
    val left = Seq((1L, 5L, "p")).toDF("k", "t", "id")
    val right = Seq((1L, 5L, "c_same"), (1L, 3L, "c_old")).toDF("k", "t", "id")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("id"))
      .head()
    assert(out.getString(3) == "c_same")
  }

  test("asOf plan has exactly one shuffle (the key window)") {
    val left = Seq((1L, 10L, "p1")).toDF("k", "t", "id")
    val right = Seq((1L, 4L, "c1")).toDF("k", "t", "id")
    val plan = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("id"))
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
    assert(!plan.contains("NestedLoop"), "must not be a range/nested-loop join")
  }
}
