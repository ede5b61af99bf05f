package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The large-codebook ANN assignment fallback (broadcast +
  * graft_argmax_long), pinned (r11 verdict item 4: every bench lane
  * keeps ≤ 128 centroids, so only the literal row-local path ran —
  * the 100 TB auto-nlist path was verified by spec only):
  *
  *  1. plan shape — the fallback assignment runs as a HashAggregate
  *     with MAP-SIDE PARTIAL aggregation of graft_argmax_long, never a
  *     SortAggregate demotion or a Window sort;
  *  2. row selection — bit-equal to the crossJoin + row_number()=1
  *     window formulation it replaced, ties and NaN included;
  *  3. end to end — a >128-centroid index build takes the fallback and
  *     a conf-forced fallback build of a SMALL index equals the
  *     literal-path build artifact for artifact (lists and search).
  */
class AnnFallbackSpec extends SparkSpec {
  import spark.implicits._

  private def vec(i: Long): Seq[Double] =
    (0 until 6).map(d => (((i + 1) * (d + 3) * 2654435761L) % 997L + 1L)
      .toDouble / 998.0)

  test("argmax fallback plans as partial HashAggregate, no " +
    "SortAggregate, no Window") {
    val sims = (0L until 200L).flatMap(n =>
      (0L until 150L).map(c =>
        (n, c, ((n * 7 + c * 13) % 101).toDouble / 101.0)))
      .toDF("n_id", "c_id", "c_sim")
    val picked = Similarity.argmaxPick(sims, Seq("n_id"), "c_sim", "c_id")
    val plan = picked.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"),
      s"argmax must run in HashAggregateExec:\n$plan")
    assert(plan.contains("partial_graft_argmax_long"),
      s"argmax must aggregate map-side (partial):\n$plan")
    assert(!plan.contains("SortAggregate"),
      s"argmax demoted to SortAggregate:\n$plan")
    assert(!plan.contains("Window"),
      s"argmax fell back to a window:\n$plan")
  }

  test("argmax fallback selects the window formulation's rows " +
    "bit-identically (ties and NaN included)") {
    val base = (0L until 120L).flatMap(n =>
      (0L until 150L).map(c =>
        (n, c, ((n + c) % 13).toDouble / 13.0)))
    // planted ties (two c_ids at the max sim) and NaN rows (NaN sorts
    // LARGEST in Spark's double order, so a NaN row wins its group)
    val rows = base ++ Seq((500L, 9L, 0.5), (500L, 4L, 0.5),
      (501L, 7L, Double.NaN), (501L, 2L, 1.0))
    val sims = rows.toDF("n_id", "c_id", "c_sim")
    val viaAgg = Similarity.argmaxPick(sims, Seq("n_id"), "c_sim", "c_id")
      .select("n_id", "c_id")
      .collect().map(_.toString).sorted.toSeq
    val w = Window.partitionBy(col("n_id"))
      .orderBy(col("c_sim").desc, col("c_id"))
    val viaWin = sims.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).select("n_id", "c_id")
      .collect().map(_.toString).sorted.toSeq
    assert(viaAgg == viaWin)
  }

  test("a >128-centroid IVF-SQ index build takes the fallback and " +
    "stays consistent") {
    val corpus = (0L until 400L).map(i => (i, vec(i)))
      .toDF("id", "emb")
    val path = java.nio.file.Files
      .createTempDirectory("graft_ann_fb").toString + "/idx"
    Similarity.writeIvfSqIndex(corpus, "id", "emb", path,
      nlist = 150, iters = 1)
    val lists = spark.read.parquet(s"$path/codes")
      .select("n_id", "list_id")
    assert(lists.count() == 400)
    val nLists = lists.select("list_id").distinct().count()
    assert(nLists > 1 && nLists <= 150)
  }

  test("conf-forced fallback build equals the literal-path build, " +
    "artifact for artifact") {
    val corpus = (0L until 300L).map(i => (i, vec(i))).toDF("id", "emb")
    val queries = (0L until 20L).map(i => (i + 9000L, vec(i * 3 + 1)))
      .toDF("id", "emb")
    val root = java.nio.file.Files
      .createTempDirectory("graft_ann_eq").toString
    val pLit = s"$root/lit"
    val pFb = s"$root/fb"
    Similarity.writeIvfSqIndex(corpus, "id", "emb", pLit,
      nlist = 12, iters = 2)
    withSQLConf("graft.ann.maxLiteralCents" -> "0") {
      Similarity.writeIvfSqIndex(corpus, "id", "emb", pFb,
        nlist = 12, iters = 2)
    }
    def listsOf(p: String) = spark.read.parquet(s"$p/codes")
      .select("n_id", "list_id")
      .collect().map(_.toString).sorted.toSeq
    assert(listsOf(pLit) == listsOf(pFb),
      "fallback assignment diverged from the literal path")
    def searchOf(p: String) = Similarity.ivfSqTopKFromIndex(
      queries, "id", "emb", p, k = 5, nprobe = 3)
      .collect().map(_.toString).sorted.toSeq
    val sLit = searchOf(pLit)
    val sFb = withSQLConf("graft.ann.maxLiteralCents" -> "0") {
      searchOf(pFb)
    }
    assert(sLit.nonEmpty && sLit == sFb,
      "fallback search diverged from the literal path")
  }
}
