package graft

import org.apache.spark.sql.functions._

import graft.functions.native.NativeFns

/** Misra-Gries heavy-hitters aggregate: the n/k retention guarantee and
  * the sketch-nominate → exact-recount composition, exercised through
  * real partial/merge aggregation over many partitions. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("items above n/k survive the sketch across partitions and merges") {
    // stream: "hot1" x 300, "hot2" x 200, 1000 singleton items; n = 1500
    // k = 50 -> n/k = 30: both hot items MUST be nominated
    val rows = Seq.fill(300)("hot1") ++ Seq.fill(200)("hot2") ++
      (0 until 1000).map(i => s"cold$i")
    val df = spark.sparkContext.parallelize(rows, 16).toDF("item")
    val cand = df.agg(NativeFns.heavyHitters(col("item"), 50).as("c"))
      .select(explode(col("c")).as("item")).collect().map(_.getString(0)).toSet
    assert(cand.contains("hot1") && cand.contains("hot2"),
      s"hot items missing from candidates: $cand")
    // the summary respects its size bound
    assert(cand.size <= 49, s"summary exceeded k-1 entries: ${cand.size}")
  }

  test("sketch capacity is actually exceeded (evictions happen)") {
    // 1000 distinct singletons with k=50: the buffer cannot hold them,
    // so decrements must fire; the result is a bounded candidate set
    val df = spark.sparkContext
      .parallelize((0 until 1000).map(i => s"u$i"), 8).toDF("item")
    val cand = df.agg(NativeFns.heavyHitters(col("item"), 50).as("c"))
      .select(size(col("c")).as("n")).head().getInt(0)
    assert(cand <= 49)
  }

  test("nominate + exact recount reproduces the exact top-k") {
    // zipf-ish: item i (1..40) appears 500/i times; k=32 -> n/k is far
    // below the 10th count, so the exact top-10 must be reproducible
    val rows = (1 to 40).flatMap(i => Seq.fill(500 / i)(f"w$i%02d"))
    val df = spark.sparkContext.parallelize(rows, 12).toDF("item")
    val cand = df.agg(NativeFns.heavyHitters(col("item"), 32).as("c"))
      .select(explode(col("c")).as("item"))
    val top = df.join(broadcast(cand), Seq("item"))
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(10)
    assert(top.toSeq == exact, s"sketched top-10 $top != exact $exact")
  }

  test("null items are ignored") {
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("item")
    val cand = df.agg(NativeFns.heavyHitters(col("item"), 10).as("c"))
      .select(explode(col("c")).as("i")).collect().map(_.getString(0)).toSet
    assert(cand == Set("a", "b"))
  }
}
