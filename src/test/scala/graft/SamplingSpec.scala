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
}
