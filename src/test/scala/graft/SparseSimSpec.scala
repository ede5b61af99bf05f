package graft

import org.apache.spark.sql.functions._

import graft.operators.SparseSim

class SparseSimSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("near-identical documents score near 1, unrelated near 0") {
    val c = corpus(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta iota",
      3L -> "one two three four five six seven eight")
    val pairs = SparseSim.cosinePairs(
      SparseSim.tfidfPostings(c, "text", "doc_id", n = 3, maxDf = 50),
      threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // 5 of each doc's 6 trigrams are shared, but IDF down-weights the
    // df=2 shared terms vs the df=1 unique ones (ln(4/3) vs ln(4/2)),
    // so the exact cosine is 5·w1²/(5w1²+w2²) = 0.4627 — the
    // discriminative claim is twin >> unrelated, not twin ≈ 1
    assert(pairs((1L, 2L)) > 0.4, s"twin pair weak: $pairs")
    assert(!pairs.contains((1L, 3L)) || pairs((1L, 3L)) < 0.1)
    assert(!pairs.contains((2L, 3L)) || pairs((2L, 3L)) < 0.1)
  }

  test("df cap drops ubiquitous terms from the feature space") {
    // "spam ham jam" appears in EVERY doc; with maxDf below the corpus
    // size it must vanish from the postings, leaving only rare terms
    val rows = (1L to 6L).map(i => i -> s"spam ham jam unique$i term$i tail$i")
    val posts = SparseSim.tfidfPostings(corpus(rows: _*), "text", "doc_id",
      n = 3, maxDf = 5)
    val terms = posts.select("term").distinct().as[String].collect().toSet
    assert(!terms.contains("spam ham jam"), s"capped term survived: $terms")
    assert(terms.nonEmpty)
    // every surviving posting weight is a positive exact integer
    val ws = posts.select("w").as[Long].collect()
    assert(ws.forall(_ > 0L))
  }

  test("documents shorter than the gram order contribute nothing") {
    val c = corpus(1L -> "only two", 2L -> "a much longer document here ok")
    val posts = SparseSim.tfidfPostings(c, "text", "doc_id", n = 3)
    assert(posts.where(col("id") === 1L).count() === 0L)
    val pairs = SparseSim.cosinePairs(posts, threshold = 0.0)
    assert(pairs.where(col("doc_a") === 1L || col("doc_b") === 1L)
      .count() === 0L)
  }

  test("result is invariant to input partitioning") {
    val rows = (1L to 30L).map { i =>
      i -> (if (i % 3 == 0) s"shared phrase block number ${i / 3} extra pad"
            else s"w${i}a w${i}b w${i}c shared phrase block number ${i / 3}")
    }
    def run(parts: Int) = SparseSim.cosinePairs(
      SparseSim.tfidfPostings(corpus(rows: _*).repartition(parts),
        "text", "doc_id", n = 3, maxDf = 20),
      threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(run(1) === run(7))
  }

  test("matches a driver-side brute-force reference on random corpora") {
    val rng = new scala.util.Random(20260814L)
    val words = Array("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    for (trial <- 0 until 3) {
      val rows = (1L to 12L).map { i =>
        val len = 3 + rng.nextInt(8)
        i -> Seq.fill(len)(words(rng.nextInt(words.length))).mkString(" ")
      }
      val maxDf = 6L
      val got = SparseSim.cosinePairs(
        SparseSim.tfidfPostings(corpus(rows: _*), "text", "doc_id",
          n = 2, maxDf = maxDf),
        threshold = 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap

      // reference: same integer-weight pipeline, computed serially
      val grams = rows.map { case (id, t) =>
        val toks = t.trim.toLowerCase.split("\\s+").toSeq
        id -> (if (toks.length >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq
               else Seq.empty[String])
      }.toMap
      val tf = grams.map { case (id, gs) =>
        id -> gs.groupBy(identity).map { case (g, o) => g -> o.size.toLong }
      }
      val dfm = tf.values.flatMap(_.keys).groupBy(identity)
        .map { case (g, o) => g -> o.size.toLong }
        .filter(_._2 <= maxDf)
      val n = rows.size
      val w = tf.map { case (id, m) =>
        id -> m.collect { case (g, c) if dfm.contains(g) =>
          g -> c * math.round(
            math.log((n + 1.0) / (dfm(g) + 1.0)) * 1e6)
        }
      }
      val exp = (for {
        a <- rows.map(_._1); b <- rows.map(_._1) if a < b
        wa = w(a); wb = w(b)
        shared = wa.keySet & wb.keySet if shared.nonEmpty
      } yield {
        val dot = shared.toSeq.map(g => BigInt(wa(g)) * BigInt(wb(g))).sum
        val na = wa.values.map(x => BigInt(x) * BigInt(x)).sum
        val nb = wb.values.map(x => BigInt(x) * BigInt(x)).sum
        (a, b) -> BigDecimal(dot.toDouble /
          (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }).toMap
      assert(got === exp, s"trial $trial mismatch")
    }
  }
}
