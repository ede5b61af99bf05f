package graft

import org.apache.spark.sql.functions._

import graft.operators.EntityResolution

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def recs = Seq(
    (1L, "Acme Corp", "NY", "A"),
    (2L, "Acme Cor", "NY", "A"),   // truncated twin of 1
    (3L, "Bolt Ltd", "NY", "B"),
    (4L, "Bolt Ltd", "CA", "B"),   // same name, different block
    (5L, "Zeta Inc", "CA", "C")
  ).toDF("id", "name", "state", "segment")

  test("blockedPairs yields within-block id-ordered pairs only") {
    val pairs = EntityResolution.blockedPairs(recs, "id", col("state"))
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
  }

  test("blockedPairs drops null block keys") {
    val withNull = recs.withColumn("state",
      when(col("id") === 1, lit(null)).otherwise(col("state")))
    val pairs = EntityResolution.blockedPairs(withNull, "id", col("state"))
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((2L, 3L), (4L, 5L)))
  }

  test("blockedPairsAny unions passes and dedups pairs") {
    // pass 0 blocks by state, pass 1 by segment: (3,4) share segment B
    // across different states; (1,2) share both state and segment but
    // must appear once
    val pairs = EntityResolution.blockedPairsAny(recs, "id",
      Seq(col("state"), col("segment"))).as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 4L)) && pairs.contains((1L, 2L)))
    assert(pairs.count(p => p == (1L, 2L)) === 1)
  }

  test("blockedPairsAny keeps values from colliding across passes") {
    // value "X" in pass-0 column vs "X" in pass-1 column must NOT block
    val df = Seq((1L, "X", "Y"), (2L, "Z", "X")).toDF("id", "k1", "k2")
    val pairs = EntityResolution.blockedPairsAny(df, "id",
      Seq(col("k1"), col("k2"))).count()
    assert(pairs === 0)
  }

  test("blockedJoin pairs cross-table records sharing a key, drops nulls") {
    val master = Seq((1L, "NY"), (2L, "CA"), (3L, null.asInstanceOf[String]))
      .toDF("id", "state")
    val batch = Seq((10L, "NY"), (11L, null.asInstanceOf[String]))
      .toDF("id", "state")
    val pairs = EntityResolution.blockedJoin(
        batch, "id", col("state"), master, "id", col("state"))
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((10L, 1L)))
  }

  test("nameSimilarity: equal=1, truncation scores by max length, empty=1") {
    val sims = Seq(("abc", "abc"), ("abcdefghij", "abcdefghi"), ("", ""))
      .toDF("a", "b")
      .select(EntityResolution.nameSimilarity(col("a"), col("b")))
      .as[Double].collect()
    assert(sims(0) === 1.0)
    assert(sims(1) === 0.9) // 1 - 1/10
    assert(sims(2) === 1.0)
  }

  test("entityClusters labels transitive components and keeps singletons") {
    val links = Seq((1L, 2L), (2L, 6L)).toDF("id_a", "id_b")
    val ids = Seq(1L, 2L, 3L, 6L).toDF("id")
    val out = EntityResolution.entityClusters(ids, "id", links)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 6L -> 1L, 3L -> 3L))
  }

  test("goldenRecords merges one row per entity") {
    val assigned = Seq(
      (1L, 1L, "Acme Corp", 10.0), (2L, 1L, "Acme Cor", 12.0),
      (3L, 3L, "Bolt", 5.0)
    ).toDF("id", "entity_id", "name", "bal")
    val out = EntityResolution.goldenRecords(assigned, "entity_id",
        Seq(count(lit(1)).as("n"), min(col("name")).as("name"),
          max(col("bal")).as("bal")))
      .as[(Long, Long, String, Double)].collect().toSet
    assert(out === Set((1L, 2L, "Acme Cor", 12.0), (3L, 1L, "Bolt", 5.0)))
  }

  test("block-occupancy guard: a hot key is purged, not paired") {
    // pathological skew: one blocking key shared by 1000 records would
    // produce ~500k pairs unguarded; with the cap it must produce ZERO
    // while the small discriminative blocks are untouched
    val hot = spark.range(1000).select(col("id"), lit("hot").as("k"))
    val small = Seq((2001L, "a"), (2002L, "a"), (2003L, "a"),
      (2004L, "b"), (2005L, "b")).toDF("id", "k")
    val pairs = EntityResolution.blockedPairs(
        hot.union(small), "id", col("k"), maxBlockSize = 50)
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((2001L, 2002L), (2001L, 2003L), (2002L, 2003L),
      (2004L, 2005L)), "hot block leaked into the candidate set")
  }

  test("block-occupancy guard: purge is per (pass, key) in multi-pass") {
    // the hot value occupies pass 0 only; the same value in pass 1 is
    // small and must still block there
    val hot = spark.range(200)
      .select(col("id"), lit("v").as("k1"), concat(lit("u"), col("id")).as("k2"))
    val small = Seq((900L, "w", "v"), (901L, "w2", "v")).toDF("id", "k1", "k2")
    val pairs = EntityResolution.blockedPairsAny(
        hot.union(small), "id", Seq(col("k1"), col("k2")), maxBlockSize = 50)
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((900L, 901L)),
      "pass-0 hot value must purge without killing pass-1's small block")
  }

  test("purgedBlocks audit agrees exactly with what the guard drops") {
    // the audit's contract: a key appears in the report IFF the guard
    // purges it, with the exact occupancy — checked against a mixed
    // fixture (two over-cap keys, two under-cap, nulls ignored)
    val recs = spark.range(300).select(col("id"), lit("hotA").as("k"))
      .union(spark.range(300, 380).select(col("id"), lit("hotB").as("k")))
      .union(Seq((900L, "a"), (901L, "a"), (902L, "b"))
        .toDF("id", "k"))
      .union(Seq((903L, null.asInstanceOf[String])).toDF("id", "k"))
    val audit = EntityResolution.purgedBlocks(recs, col("k"),
        maxBlockSize = 50)
      .as[(String, Long)].collect().toMap
    assert(audit == Map("hotA" -> 300L, "hotB" -> 80L),
      s"audit must list exactly the over-cap keys with occupancy: $audit")
    val pairs = EntityResolution.blockedPairs(recs, "id", col("k"),
        maxBlockSize = 50)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((900L, 901L)),
      "guard must drop exactly the audited keys' pairs and no others")
  }

  test("block-occupancy guard: blockedJoin purges a key hot on one side") {
    val master = spark.range(500)
      .select(col("id"), lit("hot").as("k"))
      .union(Seq((9000L, "ok")).toDF("id", "k"))
    val batch = Seq((1L, "hot"), (2L, "ok")).toDF("id", "k")
    val pairs = EntityResolution.blockedJoin(
        batch, "id", col("k"), master, "id", col("k"), maxBlockSize = 50)
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((2L, 9000L)),
      "a key oversized on the master side must produce no lookup pairs")
  }

  test("er candidate pairs stay id-only through the block join") {
    // plan-shape: the block self-join must not carry payload columns
    val p = EntityResolution.blockedPairs(
      Seq((1L, "a", "k"), (2L, "b", "k")).toDF("id", "payload", "bkey"),
      "id", col("bkey"))
    val joinPlan = p.queryExecution.optimizedPlan.toString
    assert(!joinPlan.contains("payload"),
      s"payload column crossed the block join:\n$joinPlan")
  }
}
