package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("triangleCounts on K4: four triangles, every node in three") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    assert(Graph.triangles(e, "a", "b").count() == 4)
    val counts = Graph.triangleCounts(e, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("a chain has no triangles; reversed/duplicate edges canonicalize") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    assert(Graph.triangles(chain, "a", "b").count() == 0)
    // same triangle expressed with reversed and repeated edges: still 1
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 1L), (2L, 3L), (3L, 2L))
      .toDF("a", "b")
    val t = Graph.triangles(messy, "a", "b").collect()
    assert(t.length == 1)
    assert((t(0).getLong(0), t(0).getLong(1), t(0).getLong(2)) == (1L, 2L, 3L))
  }
}
