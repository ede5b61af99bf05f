package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.EtlOps

/** Property tests promised in SURVEY.md §5.3: dedup idempotence,
  * merge row-count bounds, full-outer key coverage, audit non-null.
  * Generators build small keyed tables with colliding keys and order
  * values so windows actually have to break ties. Raw ScalaCheck
  * generators with fixed seeds (the scalatest bridge isn't on the
  * offline classpath); 10 deterministic samples per property.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, Long, String)]] =
    Gen.listOfN(40, for {
      k <- Gen.choose(1L, 8L)       // few keys → many collisions
      t <- Gen.choose(1L, 5L)       // few order values → real ties
      v <- Gen.identifier.map(_.take(6))
    } yield (k, t, v)).map(_.distinct)

  private def samples(n: Int): Seq[List[(Long, Long, String)]] =
    (0 until n).map(i =>
      rowsGen.pureApply(Gen.Parameters.default, Seed(42L + i)))

  test("dedupLatest is idempotent and emits one row per distinct key") {
    samples(10).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("k", "t", "v")
      val once = EtlOps.dedupLatest(df, Seq("k"), Seq($"t".desc, $"v".desc))
      val twice = EtlOps.dedupLatest(once, Seq("k"), Seq($"t".desc, $"v".desc))
      val a = once.collect().map(_.toSeq).toSet
      assert(a == twice.collect().map(_.toSeq).toSet, s"not idempotent: $rows")
      assert(a.size == rows.map(_._1).distinct.size, s"wrong key count: $rows")
    }
  }

  test("coalesceMerge covers exactly keys(L) ∪ keys(R), no null keys") {
    samples(10).sliding(2).foreach { case Seq(l, r) =>
      val lk = l.map(x => (x._1, x._3)).distinctBy(_._1)
      val rk = r.map(x => (x._1 + 4, x._3)).distinctBy(_._1) // partial overlap
      if (lk.nonEmpty && rk.nonEmpty) {
        val out = EtlOps.coalesceMerge(
          lk.toDF("k", "v"), rk.toDF("k", "v"), "k")
        val keys = out.select($"k").collect().map(_.getLong(0)).toSet
        assert(keys == (lk.map(_._1) ++ rk.map(_._1)).toSet, s"keys: $lk / $rk")
        assert(out.where($"k".isNull).count() == 0)
      }
    }
  }

  test("scdMerge output keys = keys(ods) ∪ keys(dwd); audit never null") {
    samples(10).sliding(2).foreach { case Seq(o, d) =>
      if (o.nonEmpty && d.nonEmpty) {
        val ods = o.toDF("k", "t", "v")
        val dwd = EtlOps.withAudit(d.map(x => (x._1 + 3, x._2, x._3))
          .distinctBy(_._1).toDF("k", "t", "v"))
        val out = EtlOps.scdMerge(ods, dwd, Seq("k"), "t", Seq($"v".desc))
        val keys = out.select($"k").collect().map(_.getLong(0)).toSet
        assert(keys == (o.map(_._1) ++ d.map(_._1 + 3)).toSet)
        assert(out.where($"dwd_insert_time".isNull ||
          $"dwd_modify_time".isNull || $"dwd_insert_user".isNull).count() == 0)
      }
    }
  }
}
