package graft

import org.apache.spark.sql.functions._

import graft.ops.EtlOps

class EtlOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dedupLatest keeps the single newest row per key") {
    val df = Seq(
      (1L, 10L, "old"), (1L, 20L, "new"),
      (2L, 5L, "only")).toDF("k", "t", "v")
    val out = EtlOps.dedupLatest(df, Seq("k"), Seq($"t".desc, $"v")).collect()
    assert(out.length == 2)
    val m = out.map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m == Map(1L -> "new", 2L -> "only"))
  }

  test("dedupLatest tie-break is total (deterministic under equal order col)") {
    val df = Seq((1L, 10L, "a"), (1L, 10L, "b")).toDF("k", "t", "v")
    val out = EtlOps.dedupLatest(df, Seq("k"), Seq($"t".desc, $"v".desc))
    assert(out.collect().map(_.getString(2)).toSeq == Seq("b"))
  }

  test("applyChangelog keeps the highest-seq upsert and drops " +
    "tombstoned keys") {
    val log = Seq(
      (1L, 1L, "v1", "U"), (1L, 2L, "v2", "U"),   // k1: latest upsert wins
      (2L, 1L, "v1", "U"), (2L, 2L, "v2", "D"),   // k2: tombstoned away
      (3L, 1L, "v1", "D"), (3L, 2L, "v2", "U"),   // k3: re-created after delete
      (4L, 1L, "v1", "D")                         // k4: only ever deleted
    ).toDF("k", "seq", "v", "op")
    val out = EtlOps.applyChangelog(log, Seq("k"), Seq("seq"), "op")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "v2", 3L -> "v2"))
  }

  test("applyChangelog seq tie-break is total (last seqCol decides)") {
    val log = Seq(
      (1L, 10L, 1L, "a", "U"), (1L, 10L, 2L, "b", "U")
    ).toDF("k", "t", "off", "v", "op")
    val out = EtlOps.applyChangelog(log, Seq("k"), Seq("t", "off"), "op")
    assert(out.collect().map(_.getString(3)).toSeq == Seq("b"))
  }

  test("withAudit stamps the 4-column contract with the fixed clock") {
    val out = EtlOps.withAudit(Seq(1).toDF("x"), "dwd", "user1", "2024-01-01 00:00:00")
    assert(out.columns.toSet == Set("x", "dwd_insert_user", "dwd_insert_time",
      "dwd_modify_user", "dwd_modify_time"))
    val r = out.select(
      date_format($"dwd_insert_time", "yyyy-MM-dd HH:mm:ss"), $"dwd_insert_user")
      .head()
    assert(r.getString(0) == "2024-01-01 00:00:00" && r.getString(1) == "user1")
  }

  test("latestPartition keeps only rows of the max partition value") {
    val df = Seq(("20240101", 1), ("20240102", 2), ("20240102", 3))
      .toDF("etl_date", "v")
    val out = EtlOps.latestPartition(df, "etl_date").collect()
    assert(out.map(_.getInt(1)).sorted.toSeq == Seq(2, 3))
  }

  test("scdMerge: ODS newer wins, DWD-only keys survive, insert_time preserved") {
    val t0 = "2024-01-01 00:00:00"
    val t1 = "2024-06-01 00:00:00"
    val dwd = EtlOps.withAudit(
      Seq((1L, 10L, "dwd1"), (2L, 10L, "dwd2")).toDF("k", "t", "v"),
      "dwd", "user1", t0)
    val ods = Seq((1L, 20L, "ods1"), (3L, 20L, "ods3")).toDF("k", "t", "v")
    val out = EtlOps.scdMerge(ods, dwd, Seq("k"), "t", Seq($"v"), "user1", t1)
      .select($"k", $"v", $"data_source",
        date_format($"dwd_insert_time", "yyyy-MM-dd HH:mm:ss").as("ins"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3)))
      .toMap
    assert(out(1L) == ("ods1", "ods", t1))   // updated key: ODS wins, new insert time
    assert(out(2L) == ("dwd2", "dwd", t0))   // DWD-only key survives w/ old insert time
    assert(out(3L) == ("ods3", "ods", t1))   // brand-new key
  }

  test("scdMerge is idempotent (merging the merge changes nothing)") {
    val dwd = EtlOps.withAudit(
      Seq((1L, 10L, "a"), (2L, 30L, "b")).toDF("k", "t", "v"),
      "dwd", "user1", "2024-01-01 00:00:00")
    val ods = Seq((1L, 20L, "a2")).toDF("k", "t", "v")
    val once = EtlOps.scdMerge(ods, dwd, Seq("k"), "t", Seq($"v"))
    val twice = EtlOps.scdMerge(ods, once.drop("data_source"), Seq("k"), "t", Seq($"v"))
    val a = once.select($"k", $"v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = twice.select($"k", $"v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
  }

  test("coalesceMerge: left precedence, right fills gaps, key union") {
    val l = Seq((1L, "L1"), (2L, "L2")).toDF("k", "v")
    val r = Seq((2L, "R2"), (3L, "R3")).toDF("k", "v")
    val out = EtlOps.coalesceMerge(l, r, "k").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(out == Map(1L -> "L1", 2L -> "L2", 3L -> "R3"))
  }

  test("coalesceMerge covers keys(L) ∪ keys(R) exactly") {
    val l = (1 to 50).map(i => (i.toLong, s"l$i")).toDF("k", "v")
    val r = (30 to 80).map(i => (i.toLong, s"r$i")).toDF("k", "v")
    val out = EtlOps.coalesceMerge(l, r, "k")
    assert(out.count() == 80)
    assert(out.where($"k".isNull).count() == 0)
  }

  test("denormalize pads unmatched dims with null and never drops fact rows") {
    val fact = Seq((1L, 10L), (2L, 99L)).toDF("id", "dim_k")
    val dim = Seq((10L, "ten")).toDF("dim_k", "dim_name")
    val out = EtlOps.denormalize(fact, Seq((dim, Seq("dim_k"), Seq("dim_name"))))
    assert(out.count() == 2)
    val m = out.collect().map(r => r.getLong(1) -> Option(r.getString(2))).toMap
    assert(m(1L).contains("ten") && m(2L).isEmpty)
  }

  test("keyedSnapshotScan filters by rowkey regex") {
    val df = Seq("a_20221001_x", "b_20221002_y").toDF("row_key")
    val out = EtlOps.keyedSnapshotScan(df, "row_key", ".*20221001.*")
    assert(out.collect().map(_.getString(0)).toSeq == Seq("a_20221001_x"))
  }
}
