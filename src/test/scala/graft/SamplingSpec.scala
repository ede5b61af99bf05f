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

  // -------------------------------------------------- temporal holdout

  private def events = Seq(
    // user 1: 10 events at ts 10..100 — 20% test = ranks 9, 10
    (1L to 10L).map(i => (1L, i, i * 10L)): _*
  ).toDF("u", "eid", "ts")

  test("temporalHoldout: the last 20% by time become test") {
    val s = Sampling.temporalHoldout(events, "u", "ts", "eid", 2000L)
      .collect().map(r => r.getLong(1) -> r.getString(5)).toMap
    assert((1L to 8L).forall(s(_) == "train"))
    assert(s(9L) == "test" && s(10L) == "test")
  }

  test("temporalHoldout: a singleton group is all test, the last row " +
    "of every group is always test") {
    val mixed = (Seq((1L, 99L, 5L)) ++
      (1L to 3L).map(i => (2L, i, i))).toDF("u", "eid", "ts")
    val s = Sampling.temporalHoldout(mixed, "u", "ts", "eid", 2000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(5))
      .toMap
    assert(s((1L, 99L)) == "test") // n=1: rank 1*10000 > 1*8000
    assert(s((2L, 3L)) == "test")
    assert(s((2L, 1L)) == "train" && s((2L, 2L)) == "train")
  }

  test("temporalHoldout: no test row precedes any train row within a " +
    "group, and the split is partition-invariant") {
    val rows = (1L to 500L).map(i => (i % 7, i, (i * 31) % 97))
      .toDF("u", "eid", "ts")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.temporalHoldout(d, "u", "ts", "eid", 2000L)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(5))
        .toMap
    val a = run(rows)
    assert(a === run(rows.repartition(13)))
    // time-respecting: within each user, by the (ts, eid) total order,
    // every train rank < every test rank
    val byUser = Sampling.temporalHoldout(rows, "u", "ts", "eid", 2000L)
      .collect().groupBy(_.getLong(0))
    byUser.foreach { case (_, rs) =>
      val trainMax = rs.filter(_.getString(5) == "train")
        .map(_.getLong(3)).maxOption.getOrElse(0L)
      val testMin = rs.filter(_.getString(5) == "test")
        .map(_.getLong(3)).min
      assert(trainMax < testMin)
    }
  }

  test("temporalHoldout matches a driver-side replay on random data") {
    val rng = new scala.util.Random(1337L)
    val rows = (1L to 300L).map(i =>
      (rng.nextInt(9).toLong, i, rng.nextInt(1000).toLong))
    val got = Sampling
      .temporalHoldout(rows.toDF("u", "eid", "ts"), "u", "ts", "eid", 2500L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(5))
      .toMap
    val ref = rows.groupBy(_._1).flatMap { case (u, es) =>
      val ordered = es.sortBy(e => (e._3, e._2))
      val n = ordered.size.toLong
      ordered.zipWithIndex.map { case (e, i) =>
        (u, e._2) -> (if ((i + 1) * 10000L > n * 7500L) "test" else "train")
      }
    }
    assert(got === ref)
  }

  test("temporalHoldout: rank and count share ONE window exchange") {
    val plan = Sampling.temporalHoldout(events, "u", "ts", "eid", 2000L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected one shuffle, got $exchanges:\n$plan")
  }
}
