package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val W = 600L * 1000000000L // 10 minutes in nanos

  test("countInWindow counts only same-key rows in [t-W, t)") {
    val purchases = Seq(
      (1L, 100L, 2000L * 1000000000L), // user 1, purchase at t=2000s
      (2L, 200L, 2000L * 1000000000L)) // user 2: no clicks at all
      .toDF("user_id", "event_id", "ts")
    val clicks = Seq(
      (1L, 1401L * 1000000000L), // in window (2000-600=1400 < 1401)
      (1L, 1400L * 1000000000L), // boundary: exactly t-W → included
      (1L, 1399L * 1000000000L), // before window
      (1L, 2000L * 1000000000L), // at t → excluded (strict upper bound)
      (3L, 1500L * 1000000000L)) // other user
      .toDF("user_id", "ts")
    val out = RangeJoin.countInWindow(purchases, clicks, Seq("user_id"),
      "ts", "ts", "event_id", W)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(3), Option(r.get(4)))).toMap
    assert(out(100L)._1 == 2L)
    assert(out(100L)._2.contains(1401L * 1000000000L))
    assert(out(200L) == (0L, None)) // zero-match row kept, null max
  }

  test("countInWindow spans bucket boundaries correctly") {
    // window straddles two buckets: click in previous bucket, in range
    val purchases = Seq((1L, 1L, 1205L * 1000000000L))
      .toDF("user_id", "event_id", "ts") // bucket 2 (1205/600)
    val clicks = Seq((1L, 1195L * 1000000000L)) // bucket 1, within 10 min
      .toDF("user_id", "ts")
    val out = RangeJoin.countInWindow(purchases, clicks, Seq("user_id"),
      "ts", "ts", "event_id", W).collect()
    assert(out.head.getLong(3) == 1L)
  }

  test("bucketed range join matches the naive theta join on real events") {
    val ev = Tables.load(spark, sf0001, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("ts").as("c_ts"))
    val bucketed = RangeJoin.countInWindow(p, c.withColumnRenamed("c_uid", "user_id")
        .withColumnRenamed("c_ts", "ts"), Seq("user_id"), "ts", "ts",
        "event_id", W)
      .select(col("event_id"), col("n_in_window"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = p.join(c,
        col("c_uid") === col("user_id") &&
          col("c_ts") >= col("ts") - W && col("c_ts") < col("ts"), "left")
      .groupBy(col("event_id"))
      .agg(sum(when(col("c_ts").isNotNull, 1L).otherwise(0L)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bucketed == naive)
  }
}
