package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def stream(keys: String*) = keys.toDF("k")

  test("estimate is an upper bound for EVERY key in the stream") {
    val rng = new scala.util.Random(42L)
    val keys = Seq.fill(500)(s"k${rng.nextInt(40)}")
    val s = stream(keys: _*)
    val sketch = Sketches.countMinTable(s, "k", depth = 3, width = 16)
    val exact = keys.groupBy(identity).map { case (k, o) => k -> o.size.toLong }
    val probes = exact.keys.toSeq.toDF("k")
    val est = Sketches.cmEstimate(sketch, probes, "k", depth = 3, width = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"CM under-counted $k: est=${est(k)} exact=$c")
    }
  }

  test("wide sketch with few keys is exact (no collisions possible shown)") {
    val keys = Seq("a", "a", "a", "b", "b", "c")
    val sketch = Sketches.countMinTable(stream(keys: _*), "k",
      depth = 4, width = 65536)
    val est = Sketches.cmEstimate(sketch, Seq("a", "b", "c").toDF("k"),
      "k", depth = 4, width = 65536)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // at width 65536 a 3-key collision would need an md5 accident;
    // the fixed keys here verifiably do not collide
    assert(est === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("sketch is bit-identical under repartitioning (cell-wise sum merge)") {
    val keys = Seq.tabulate(300)(i => s"key${i % 23}")
    def build(parts: Int) =
      Sketches.countMinTable(stream(keys: _*).repartition(parts), "k",
        depth = 3, width = 32)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    assert(build(1) === build(8))
  }

  test("absent key estimates only its collision mass, never negative") {
    val sketch = Sketches.countMinTable(stream("x", "x", "y"), "k",
      depth = 3, width = 8)
    val est = Sketches.cmEstimate(sketch, Seq("never-seen").toDF("k"),
      "k", depth = 3, width = 8)
      .collect().map(r => r.getLong(1))
    assert(est.length === 1 && est.head >= 0L)
  }

  test("mergeCm of disjoint halves equals the from-scratch sketch") {
    val keys = Seq.tabulate(240)(i => s"m${i % 31}")
    val (left, right) = keys.splitAt(110)
    val whole = Sketches.countMinTable(stream(keys: _*), "k",
      depth = 3, width = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val merged = Sketches.mergeCm(
      Sketches.countMinTable(stream(left: _*), "k", depth = 3, width = 64),
      Sketches.countMinTable(stream(right: _*), "k", depth = 3, width = 64))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(merged === whole)
  }

  test("cell table total mass equals depth times stream length") {
    val keys = Seq.fill(97)("z") ++ Seq.fill(13)("w")
    val sketch = Sketches.countMinTable(stream(keys: _*), "k",
      depth = 3, width = 16)
    val total = sketch.agg(sum("cnt")).as[Long].head()
    assert(total === 3L * 110L)
  }
}
