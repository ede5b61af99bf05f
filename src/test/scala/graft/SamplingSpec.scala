package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def df = (1L to 2000L).toDF("id")
    .withColumn("w", (col("id") % 3) * 5000L) // 0, 5000, 10000 bp

  test("weightedSample keeps nothing at 0 bp and everything at 10000 bp") {
    val kept = Sampling.weightedSample(df, col("id"), col("w"))
      .groupBy(col("w")).count().as[(Long, Long)].collect().toMap
    assert(!kept.contains(0L)) // weight 0: no survivors
    assert(kept(10000L) === df.where(col("w") === 10000L).count())
    val half = kept(5000L).toDouble / df.where(col("w") === 5000L).count()
    assert(half > 0.4 && half < 0.6, s"~50% expected, got $half")
  }

  test("weightedSample clamps out-of-range weights") {
    val wild = df.withColumn("w",
      when(col("id") % 2 === 0, lit(-50L)).otherwise(lit(99999L)))
    val kept = Sampling.weightedSample(wild, col("id"), col("w"))
    assert(kept.count() === 1000L) // all odd ids, no even ids
    assert(kept.where(col("id") % 2 === 0).count() === 0L)
  }

  test("weightedSample is deterministic and a subset of the input") {
    val a = Sampling.weightedSample(df, col("id"), col("w"))
      .select("id").as[Long].collect().toSet
    val b = Sampling.weightedSample(df.repartition(7), col("id"), col("w"))
      .select("id").as[Long].collect().toSet
    assert(a === b, "partitioning changed the sample")
  }

  test("weightedSample pushes the predicate to the scan (no shuffle)") {
    val plan = Sampling.weightedSample(df, col("id"), col("w"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("tokenBudgetSample keeps the longest in-budget prefix per group") {
    // hash order within group "s" is discoverable: run once with a huge
    // budget, then check the tight budget keeps exactly the prefix
    val rows = (1L to 8L).map(i => (i, "s", 10L * i))
      .toDF("id", "g", "tok")
    val order = Sampling.tokenBudgetSample(rows, "g", "id", "tok",
      budget = Long.MaxValue / 2)
      .orderBy(col("cum_tokens"))
      .select("id", "tok", "cum_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // running sum is consistent with the admitted order
    assert(order.scanLeft(0L)(_ + _._2).tail.toSeq === order.map(_._3).toSeq)
    val budget = order(2)._3 // exactly covers the first three rows
    val kept = Sampling.tokenBudgetSample(rows, "g", "id", "tok", budget)
      .select("id").as[Long].collect().toSet
    assert(kept === order.take(3).map(_._1).toSet)
    // one token less drops the third row but not the first two
    val keptTight = Sampling
      .tokenBudgetSample(rows, "g", "id", "tok", budget - 1)
      .select("id").as[Long].collect().toSet
    assert(keptTight === order.take(2).map(_._1).toSet)
  }

  test("tokenBudgetSample: zero budget empties, groups fill independently") {
    val rows = Seq((1L, "a", 5L), (2L, "a", 5L), (3L, "b", 7L))
      .toDF("id", "g", "tok")
    assert(Sampling.tokenBudgetSample(rows, "g", "id", "tok", 0L)
      .count() === 0L)
    val kept = Sampling.tokenBudgetSample(rows, "g", "id", "tok", 7L)
      .select("id").as[Long].collect().toSet
    // b's single 7-token row fits its own budget regardless of a's fill
    assert(kept.contains(3L))
  }

  test("tokenBudgetSample is invariant to partitioning") {
    val rows = (1L to 200L).map(i => (i, s"g${i % 5}", i % 37 + 1L))
      .toDF("id", "g", "tok")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.tokenBudgetSample(d, "g", "id", "tok", 150L)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(run(rows) === run(rows.repartition(11)))
  }
}
