package graft

import graft.operators.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60L * 1000000000L // one minute in nanos

  test("gap > 30min starts a new session; events within gap share one") {
    val ev = Seq(
      (1L, 0L * M, 10L, 1.0),
      (1L, 10L * M, 11L, 2.0),   // same session (10 min gap)
      (1L, 50L * M, 12L, 3.0),   // new session (40 min gap)
      (2L, 0L * M, 20L, 4.0))    // other user
      .toDF("user_id", "ts", "event_id", "value")
    val out = Sessionize.sessionStats(ev, "user_id", "ts", "event_id", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(4), r.getDouble(5)))
      .toMap
    assert(out((1L, 1L)) == (2L, 3.0))  // first session: 2 events, value 1+2
    assert(out((1L, 2L)) == (1L, 3.0))  // second session
    assert(out((2L, 1L)) == (1L, 4.0))
  }

  test("session bounds are min/max event time in micros") {
    val ev = Seq((1L, 5L * M, 1L, 0.0), (1L, 6L * M, 2L, 0.0))
      .toDF("user_id", "ts", "event_id", "value")
    val r = Sessionize.sessionStats(ev, "user_id", "ts", "event_id", "value").head()
    assert(r.getLong(2) == 5L * M / 1000 && r.getLong(3) == 6L * M / 1000)
  }
}
