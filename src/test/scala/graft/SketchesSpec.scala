package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def mk(n: Int, slices: Int) =
    (0 until n).map(i => ("g", i.toLong % slices, i.toLong % (n / 2)))
      .toDF("g", "slice", "v")

  test("hllEstimate over slice sketches is near the exact distinct") {
    val df = mk(4000, 7)
    val est = Sketches.hllEstimate(
      Sketches.hllSliceSketches(df, "g", "slice", "v"), "g")
      .head.getLong(1).toDouble
    val exact = df.select(countDistinct($"v")).head.getLong(0).toDouble
    assert(math.abs(est - exact) <= 0.05 * exact)
  }

  test("slice granularity does not change the union's accuracy") {
    val fine = mk(4000, 13)
    val coarse = mk(4000, 2)
    val eF = Sketches.hllEstimate(
      Sketches.hllSliceSketches(fine, "g", "slice", "v"), "g")
      .head.getLong(1).toDouble
    val eC = Sketches.hllEstimate(
      Sketches.hllSliceSketches(coarse, "g", "slice", "v"), "g")
      .head.getLong(1).toDouble
    val exact = 2000.0
    assert(math.abs(eF - exact) <= 0.05 * exact)
    assert(math.abs(eC - exact) <= 0.05 * exact)
  }

  test("appending a novel slice's sketch row moves the estimate up") {
    val base = mk(1000, 3)
    val baseSketches = Sketches.hllSliceSketches(base, "g", "slice", "v")
    val extra = (0 until 500).map(i => ("g", 99L, 10000L + i))
      .toDF("g", "slice", "v")
    val appended = baseSketches.unionByName(
      Sketches.hllSliceSketches(extra, "g", "slice", "v"))
    val e0 = Sketches.hllEstimate(baseSketches, "g").head.getLong(1).toDouble
    val e1 = Sketches.hllEstimate(appended, "g").head.getLong(1).toDouble
    assert(math.abs(e0 - 500.0) <= 25.0)
    assert(math.abs(e1 - 1000.0) <= 50.0)
  }

  test("keyOverlap reports exact counts, containment, and a passing " +
       "union verdict") {
    val a = (0L until 100L).map(i => Tuple1(i)).toDF("k")
    val b = (60L until 300L).map(i => Tuple1(i)).toDF("k")
    val r = Sketches.keyOverlap(a, "k", b, "k").head
    assert(r.getLong(0) === 100L)       // n_a
    assert(r.getLong(1) === 240L)       // n_b
    assert(r.getLong(2) === 40L)        // n_inter = 60..99
    assert(r.getLong(3) === 4000L)      // containment_bp
    assert(r.getBoolean(4))             // union est within tolerance
  }

  test("keyOverlap survives zero overlap") {
    val a = (0L until 50L).map(i => Tuple1(i)).toDF("k")
    val b = (1000L until 1100L).map(i => Tuple1(i)).toDF("k")
    val r = Sketches.keyOverlap(a, "k", b, "k").head
    assert(r.getLong(2) === 0L && r.getLong(3) === 0L && r.getBoolean(4))
  }

  test("mergeReport verdicts hold on a skewed multi-group frame") {
    val df = (0 until 3000).map { i =>
      (if (i % 3 == 0) "a" else "b", i.toLong % 5, i.toLong % 700)
    }.toDF("g", "slice", "v")
    val out = Sketches.mergeReport(df, "g", "slice", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(out("a")._2 && out("a")._3 && out("b")._2 && out("b")._3)
    val exactA = df.where($"g" === "a")
      .select(countDistinct($"v")).head.getLong(0)
    assert(out("a")._1 === exactA)
  }
}
