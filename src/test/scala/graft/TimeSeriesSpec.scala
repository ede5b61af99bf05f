package graft

import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("gapFilledCounts zero-fills the quiet buckets inside each span") {
    val ns = 1000000000L
    // user 1: events in buckets 0 and 3 (width 10s); user 2: bucket 5 only
    val ev = Seq(
      (1L, 1L * ns, 1.0), (1L, 2L * ns, 2.0), (1L, 35L * ns, 4.0),
      (2L, 55L * ns, 8.0))
      .toDF("user_id", "ts", "value")
    val out = TimeSeries.gapFilledCounts(ev, "user_id", "ts", "value", 10L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out.size == 5) // user 1 buckets 0..3, user 2 bucket 5
    assert(out((1L, 0L)) == (2L, 3.0))
    assert(out((1L, 1L)) == (0L, 0.0)) // filled gap
    assert(out((1L, 2L)) == (0L, 0.0)) // filled gap
    assert(out((1L, 3L)) == (1L, 4.0))
    assert(out((2L, 5L)) == (1L, 8.0))
  }

  test("pre-epoch timestamps floor into bucket -1, not bucket 0") {
    val ev = Seq((1L, -1L, 1.0), (1L, 1L, 2.0)).toDF("user_id", "ts", "value")
    val out = TimeSeries.gapFilledCounts(ev, "user_id", "ts", "value", 10L)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // SQL floor-division semantics (DuckDB `//`): -1ns is the bucket
    // BEFORE the epoch; truncation would merge both rows into bucket 0
    assert(out == Map(-1L -> 1L, 0L -> 1L))
  }

  test("an idle key contributes no buckets outside its span") {
    val ev = Seq((9L, 1000000000L, 1.0)).toDF("user_id", "ts", "value")
    val out = TimeSeries.gapFilledCounts(ev, "user_id", "ts", "value", 10L)
    assert(out.count() == 1)
  }

  test("forwardFill carries the last non-null forward per key") {
    val ev = Seq(
      (1L, 1L, Option.empty[Double]), // leading null stays null
      (1L, 2L, Some(5.0)),
      (1L, 3L, None), (1L, 4L, None), // both take 5.0
      (1L, 5L, Some(7.0)),
      (2L, 1L, Some(1.0)), (2L, 2L, None) // keys fill independently
    ).toDF("k", "t", "v")
    val out = TimeSeries.forwardFill(ev, "k", "t", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out((1L, 1L)) === None)
    assert(out((1L, 3L)) === Some(5.0) && out((1L, 4L)) === Some(5.0))
    assert(out((1L, 5L)) === Some(7.0))
    assert(out((2L, 2L)) === Some(1.0))
  }

  test("forwardFill tie column makes duplicate order keys deterministic") {
    val ev = Seq(
      (1L, 10L, 1L, Some(3.0)), (1L, 10L, 2L, None), (1L, 10L, 3L, None)
    ).toDF("k", "t", "rid", "v")
    val out = TimeSeries.forwardFill(ev, "k", "t", Seq("v"), Some("rid"))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(2L) === Some(3.0) && out(3L) === Some(3.0))
  }

  private def mergedMap(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("mergeIntervals merges overlapping AND touching, splits gaps") {
    val iv = Seq(
      (1L, 1L, 0L, 10L), (1L, 2L, 5L, 20L), (1L, 3L, 20L, 30L),
      (1L, 4L, 40L, 50L),
      (2L, 5L, 0L, 5L)
    ).toDF("k", "id", "s", "e")
    val out = mergedMap(TimeSeries.mergeIntervals(iv, "k", "s", "e", "id")
      .select("k", "interval_idx", "iv_start", "iv_end", "n_merged")
      .collect())
    // touching (20 == prev end 20) merges; the 30→40 gap splits
    assert(out == Map(
      (1L, 1L) -> (0L, 30L, 3L),
      (1L, 2L) -> (40L, 50L, 1L),
      (2L, 1L) -> (0L, 5L, 1L)))
  }

  test("mergeIntervals running max survives a covering first interval") {
    // the case a naive lag(end) check gets wrong: [0,100] covers both
    // later intervals, so all three are ONE island even though
    // [30,40] starts after its immediate predecessor's end (20)
    val iv = Seq(
      (1L, 1L, 0L, 100L), (1L, 2L, 10L, 20L), (1L, 3L, 30L, 40L),
      (1L, 4L, 150L, 160L)
    ).toDF("k", "id", "s", "e")
    val out = mergedMap(TimeSeries.mergeIntervals(iv, "k", "s", "e", "id")
      .select("k", "interval_idx", "iv_start", "iv_end", "n_merged")
      .collect())
    assert(out == Map(
      (1L, 1L) -> (0L, 100L, 3L),
      (1L, 2L) -> (150L, 160L, 1L)))
  }

  test("rollingAnomalies flags a planted spike, not the steady tail") {
    // 20 warmup readings ~100, then a 10x spike, then a normal reading
    val rows = (1 to 20).map(i => (1L, i.toLong, i.toLong, 100.0 + i % 3)) ++
      Seq((1L, 21L, 21L, 1000.0), (1L, 22L, 22L, 101.0))
    val out = TimeSeries.rollingAnomalies(
        rows.toDF("k", "id", "t", "v"), "k", "t", "id", "v")
      .collect().map(r => r.getLong(1) ->
        (r.getLong(5), r.getBoolean(6))).toMap
    // warmup rows have no verdict
    (1 to 20).foreach(i => assert(out(i.toLong) == (i - 1L, false)))
    assert(out(21L) == (20L, true), "spike not flagged")
    // the reading after the spike: history now contains the spike, so
    // the inflated variance absorbs a normal value
    assert(out(22L)._2 == false, "normal reading after spike flagged")
  }

  test("rollingAnomalies: zero-variance history flags any deviation, " +
    "not an identical reading") {
    val rows = (1 to 20).map(i => (1L, i.toLong, i.toLong, 50.0)) ++
      Seq((1L, 21L, 21L, 50.0), (1L, 22L, 22L, 50.01))
    val out = TimeSeries.rollingAnomalies(
        rows.toDF("k", "id", "t", "v"), "k", "t", "id", "v")
      .collect().map(r => r.getLong(1) -> r.getBoolean(6)).toMap
    assert(!out(21L), "identical reading flagged on constant history")
    assert(out(22L), "deviation from constant history not flagged")
  }

  test("rollingAnomalies is invariant under input partitioning") {
    val base = Tables.load(spark, sf0001, "events")
      .selectExpr("user_id AS k", "event_id AS id",
        "ts div 1000 AS t", "value AS v")
    def run(df: org.apache.spark.sql.DataFrame) =
      TimeSeries.rollingAnomalies(df, "k", "t", "id", "v")
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(4), r.getLong(5), r.getBoolean(6))).toMap
    assert(run(base) == run(base.repartition(11)))
  }

  test("mergeIntervals result is invariant under input partitioning") {
    val base = Tables.load(spark, sf0001, "events")
      .selectExpr("user_id AS k", "event_id AS id", "ts AS s",
        "ts + (event_id % 900 + 60) * 1000000000 AS e")
    def run(df: org.apache.spark.sql.DataFrame) =
      mergedMap(TimeSeries.mergeIntervals(df, "k", "s", "e", "id")
        .select("k", "interval_idx", "iv_start", "iv_end", "n_merged")
        .collect())
    assert(run(base) == run(base.repartition(7)))
  }
}
