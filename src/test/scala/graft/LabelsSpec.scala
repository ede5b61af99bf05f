package graft

import graft.ops.Labels

class LabelsSpec extends SparkSpec {
  import spark.implicits._

  private def ann = Seq(
    (1L, "a1", "pos"), (1L, "a2", "pos"), (1L, "a3", "neg"),
    (2L, "a1", "neg"), (2L, "a2", "pos"), // tie -> lexicographic "neg"
    (3L, "a1", "neu")
  ).toDF("item", "annotator", "label")

  test("majorityVote picks the most-voted label with agreement") {
    val out = Labels.majorityVote(ann, "item", "label")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, "pos", 2L, 3L, 0.6667)))
    assert(out(3L) === ((3L, "neu", 1L, 1L, 1.0)))
  }

  test("majorityVote breaks ties to the lexicographically smallest label") {
    val out = Labels.majorityVote(ann, "item", "label")
      .where($"item" === 2L).as[(Long, String, Long, Long, Double)].head()
    assert(out === ((2L, "neg", 1L, 2L, 0.5)))
  }

  test("contested returns only items below the agreement floor") {
    val out = Labels.contested(ann, "item", "label", 0.7)
      .select("item").as[Long].collect().toSet
    assert(out === Set(1L, 2L)) // 0.6667 and 0.5; item 3 is unanimous
  }
}
