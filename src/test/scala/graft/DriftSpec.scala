package graft

import org.apache.spark.sql.functions._

import graft.ops.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("psiReport on identical populations yields zero PSI in every bin") {
    val pop = Seq(5L, 150L, 260L, 260L, 990L, 40L).toDF("v")
    val rows = Drift.psiReport(pop, pop, col("v"), nBins = 4, width = 100L)
      .orderBy("bin").collect()
    assert(rows.length == 4)
    // identical counts → p == q → ln = 0 and p − q = 0 in every bin
    assert(rows.forall(_.getLong(3) == 0L))
  }

  test("psiReport bins on the fixed grid with an open-ended last bin") {
    val ref = Seq(0L, 99L, 100L, 250L, 399L, 400L, 5000L).toDF("v")
    val cur = Seq(50L).toDF("v")
    val m = Drift.psiReport(ref, cur, col("v"), nBins = 4, width = 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // bins: [0,100) ×2, [100,200) ×1, [200,300) ×1, [300,∞) ×3 (399,400,5000)
    assert(m == Map(0L -> (2L, 1L), 1L -> (1L, 0L),
      2L -> (1L, 0L), 3L -> (3L, 0L)))
  }

  test("psiReport detects a shifted distribution with positive PSI") {
    val ref = (1 to 1000).map(_.toLong % 300).toDF("v")
    val cur = (1 to 1000).map(i => 700L + i % 300).toDF("v")
    val rows = Drift.psiReport(ref, cur, col("v"), nBins = 10, width = 100L)
      .collect()
    assert(rows.length == 10)
    // fully disjoint supports → large PSI; contributions never negative
    assert(rows.forall(_.getLong(3) >= 0L))
    assert(rows.map(_.getLong(3)).sum > 1000000L) // PSI > 1.0
  }

  test("psiReport scans each population once (totals never re-scan)") {
    val d = Tables.load(spark, sf0001, "documents")
    val plan = Drift.psiReport(
      d.where(col("doc_id") % 2 === 0), d.where(col("doc_id") % 2 === 1),
      col("n_chars"), nBins = 10, width = 100L)
      .queryExecution.executedPlan.toString
    // exactly two scans of documents — one per population, none repeated
    assert(plan.split("Scan parquet").length - 1 == 2,
      s"expected two scans:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join:\n$plan")
  }
}
