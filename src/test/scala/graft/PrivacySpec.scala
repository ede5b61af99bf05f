package graft

import graft.ops.Privacy

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    // group (us, a): 3 members — safe at k=3
    (1L, "us", "a"), (2L, "us", "a"), (3L, "us", "a"),
    // group (us, b): 2 members — risky at k=3
    (4L, "us", "b"), (5L, "us", "b"),
    // group (de, a): 1 member — risky
    (6L, "de", "a")
  ).toDF("id", "country", "seg")

  test("kAnonymityReport: occupancy and the below-k flag per group") {
    val r = Privacy.kAnonymityReport(fixture, Seq("country", "seg"), 3L)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getBoolean(3))).toMap
    assert(r == Map(
      ("us", "a") -> (3L, false),
      ("us", "b") -> (2L, true),
      ("de", "a") -> (1L, true)))
  }

  test("suppressBelowK nulls every quasi cell of risky rows only") {
    val out = Privacy.suppressBelowK(fixture, Seq("country", "seg"), 3L)
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), Option(r.getString(2)))).toMap
    assert(out(1L) == (Some("us"), Some("a")))
    assert(out(2L) == (Some("us"), Some("a")))
    assert(out(3L) == (Some("us"), Some("a")))
    assert(out(4L) == (None, None))
    assert(out(5L) == (None, None))
    assert(out(6L) == (None, None))
  }

  test("suppression leaves the release k-anonymous at the suppressed " +
    "level (no surviving group below k)") {
    val released = Privacy.suppressBelowK(fixture, Seq("country", "seg"), 3L)
      .where($"country".isNotNull)
    val bad = Privacy.kAnonymityReport(released, Seq("country", "seg"), 3L)
      .where($"at_risk").count()
    assert(bad == 0L)
  }

  test("a risky group keyed by NULL quasi cells still suppresses " +
    "(null-safe join + literal marker)") {
    val withNull = Seq(
      (1L, Some("us"), "a"), (2L, Some("us"), "a"), (3L, Some("us"), "a"),
      (4L, None: Option[String], "b")
    ).toDF("id", "country", "seg")
    val out = Privacy.suppressBelowK(withNull, Seq("country", "seg"), 2L)
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), Option(r.getString(2)))).toMap
    // row 4's group (null, b) has 1 member: seg must be suppressed too
    assert(out(4L) == (None, None))
    assert(out(1L) == (Some("us"), Some("a")))
  }

  test("report is one aggregation over one scan (no join, no window)") {
    val plan = Privacy.kAnonymityReport(fixture, Seq("country", "seg"), 3L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"audit should be a bare aggregation:\n$plan")
  }

  // ------------------------------------------------------- l-diversity

  private def sensFixture = Seq(
    // group (us, a): 3 members, 3 distinct segs — diverse at l=3
    (1L, "us", "a", "x"), (2L, "us", "a", "y"), (3L, "us", "a", "z"),
    // group (us, b): 3 members but ONE seg — k-anonymous at k=3 yet
    // homogeneous: the case k-anonymity misses and l-diversity catches
    (4L, "us", "b", "x"), (5L, "us", "b", "x"), (6L, "us", "b", "x"),
    // group (de, a): 2 members, 2 distinct — still below l=3
    (7L, "de", "a", "x"), (8L, "de", "a", "y")
  ).toDF("id", "country", "seg", "sens")

  test("lDiversityReport: distinct-sensitive counts and the below-l flag") {
    val r = Privacy
      .lDiversityReport(sensFixture, Seq("country", "seg"), "sens", 3L)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getBoolean(4))).toMap
    assert(r == Map(
      ("us", "a") -> (3L, 3L, false),
      ("us", "b") -> (3L, 1L, true),
      ("de", "a") -> (2L, 2L, true)))
  }

  test("a k-anonymous homogeneous group is flagged by l-diversity " +
    "but not by k-anonymity") {
    val kRisky = Privacy
      .kAnonymityReport(sensFixture, Seq("country", "seg"), 3L)
      .where($"at_risk" && $"country" === "us" && $"seg" === "b").count()
    val lRisky = Privacy
      .lDiversityReport(sensFixture, Seq("country", "seg"), "sens", 3L)
      .where($"at_risk" && $"country" === "us" && $"seg" === "b").count()
    assert(kRisky == 0L && lRisky == 1L)
  }

  test("lDiversityReport rejects a sensitive column that is also quasi") {
    intercept[IllegalArgumentException] {
      Privacy.lDiversityReport(sensFixture, Seq("country", "sens"),
        "sens", 2L)
    }
  }

  test("lDiversityReport plan has no join and no window (two-phase " +
    "distinct aggregate only)") {
    val plan = Privacy
      .lDiversityReport(sensFixture, Seq("country", "seg"), "sens", 3L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"audit should be aggregations only:\n$plan")
  }

  // ------------------------------------------------------- t-closeness

  test("tClosenessReport: exact basis points against hand-computed TVD") {
    // global: x=4, y=4 over 8 rows. g1 (2/3, 1/3) and g2 (1/3, 2/3)
    // are both TVD=1/6 from it -> 1666 bp; g3 (1/2, 1/2) matches -> 0
    val df = Seq(
      (1L, "g1", "x"), (2L, "g1", "x"), (3L, "g1", "y"),
      (4L, "g2", "x"), (5L, "g2", "y"), (6L, "g2", "y"),
      (7L, "g3", "x"), (8L, "g3", "y")
    ).toDF("id", "g", "sens")
    val r = Privacy.tClosenessReport(df, Seq("g"), "sens", 1000L)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getBoolean(3)))).toMap
    assert(r == Map(
      "g1" -> ((3L, 1666L, true)),
      "g2" -> ((3L, 1666L, true)),
      "g3" -> ((2L, 0L, false))))
  }

  test("tClosenessReport charges values absent from a group") {
    // g1 holds only z, g2 only x: each group is TVD=1/2 from the
    // 50/50 global -> 5000 bp, and the absent value's mass must be
    // counted without manufacturing (group, value) rows
    val df = Seq(
      (1L, "g1", "z"), (2L, "g1", "z"),
      (3L, "g2", "x"), (4L, "g2", "x")
    ).toDF("id", "g", "sens")
    val r = Privacy.tClosenessReport(df, Seq("g"), "sens", 4000L)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getBoolean(3)))).toMap
    assert(r == Map(
      "g1" -> ((2L, 5000L, true)),
      "g2" -> ((2L, 5000L, true))))
  }

  test("a k-anonymous l-diverse group still trips t-closeness on skew") {
    // (us, b): 4 members, 2 distinct sens values -> k=3 and l=2 pass;
    // but 3-of-4 share one value while the global split is even
    val df = Seq(
      (1L, "us", "a", "x"), (2L, "us", "a", "x"), (3L, "us", "a", "y"),
      (4L, "us", "a", "y"), (5L, "us", "a", "y"), (6L, "us", "a", "x"),
      (7L, "us", "b", "x"), (8L, "us", "b", "x"),
      (9L, "us", "b", "x"), (10L, "us", "b", "y")
    ).toDF("id", "country", "seg", "sens")
    val k = Privacy.kAnonymityReport(df, Seq("country", "seg"), 3L)
      .where($"at_risk").count()
    val l = Privacy.lDiversityReport(df, Seq("country", "seg"), "sens", 2L)
      .where($"at_risk").count()
    val t = Privacy.tClosenessReport(df, Seq("country", "seg"), "sens", 1200L)
      .where($"at_risk")
      .collect().map(x => (x.getString(0), x.getString(1)))
    assert(k == 0L && l == 0L)
    assert(t.toSeq == Seq(("us", "b")))
  }

  // ------------------------------------------------ randomized response

  test("randomizedResponse: hash coin flips ~1/4 and the debiased " +
    "estimate recovers the true rate on a large group") {
    val df = spark.range(2000).selectExpr("id", "'g' AS g",
      "id % 10 < 3 AS flag") // true rate exactly 30%
    val r = graft.ops.Privacy
      .randomizedResponse(df, Seq("g"), "flag", "id")
      .collect().head
    val (n, nYes, estBp, trueBp) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n == 2000L && trueBp == 3000L)
    // debias identity holds exactly
    assert(estBp == math.max(0L, math.min(10000L,
      (4 * nYes - n) * 10000 / (2 * n))))
    // and the estimator lands near the truth (hash coin is fair-ish)
    assert(math.abs(estBp - 3000L) < 800L,
      s"estimate $estBp too far from 3000")
  }

  test("randomizedResponse clamps the estimator into [0, 10000]") {
    // an all-false tiny group: flips alone can push the raw estimator
    // negative; the release must clamp, not go below zero
    val df = spark.range(8).selectExpr("id", "'g' AS g", "false AS flag")
    val r = graft.ops.Privacy
      .randomizedResponse(df, Seq("g"), "flag", "id")
      .collect().head
    assert(r.getLong(3) >= 0L && r.getLong(3) <= 10000L)
    assert(r.getLong(4) == 0L)
  }

  test("tClosenessReport rejects a sensitive column that is also quasi") {
    intercept[IllegalArgumentException] {
      Privacy.tClosenessReport(sensFixture, Seq("country", "sens"),
        "sens", 1000L)
    }
  }
}
