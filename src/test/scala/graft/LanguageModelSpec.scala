package graft

import graft.operators.LanguageModel

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  // corpus: "a b" ×2, "a c" ×1 → unigrams a=3 b=2 c=1 (V=3),
  // bigrams "a b"=2, "a c"=1
  private def corpus = Seq(
    (1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")

  test("bigramCrossEntropy matches the hand-computed smoothed model") {
    val out = LanguageModel.bigramCrossEntropy(corpus, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    def mn(cb: Long, c1: Long, v: Long): Long =
      math.floor(math.log((cb + 1.0) / (c1 + v)) * 1e6).toLong
    // doc 1/2: one bigram "a b": p = (2+1)/(3+3)
    val x12 = -mn(2, 3, 3).toDouble / 1e6
    // doc 3: one bigram "a c": p = (1+1)/(3+3)
    val x3 = -mn(1, 3, 3).toDouble / 1e6
    assert(out.toSeq == Seq((1L, 1L, x12), (2L, 1L, x12), (3L, 1L, x3)))
    // the rarer continuation must score as higher cross-entropy
    assert(x3 > x12)
  }

  test("bigramCrossEntropy skips docs with fewer than two tokens") {
    val docs = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    val out = LanguageModel.bigramCrossEntropy(docs, "text", "doc_id")
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("bigramCrossEntropy is invariant under repartitioning " +
    "(integer micro-nat sums)") {
    val docs = Tables.load(spark, sf0001, "documents")
    val a = LanguageModel.bigramCrossEntropy(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = LanguageModel.bigramCrossEntropy(docs.repartition(13), "text",
      "doc_id").collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a == b) // bit-exact, not approximately
  }

  test("bm25TopK ranks the term-dense document first and is " +
    "deterministic under repartitioning") {
    val docs = Seq(
      (1L, "spark spark join filler filler"),
      (2L, "spark filler filler filler filler"),
      (3L, "filler filler filler filler filler"),
      (4L, "spark join join other other")).toDF("doc_id", "text")
    val out = LanguageModel.bm25TopK(docs, "text", "doc_id",
      Seq("spark", "join"), k = 3)
      .collect().map(r => r.getLong(2) -> r.getLong(0)).toMap
    // idf(join) > idf(spark) (rarer term), so doc 4 (join×2) outranks
    // doc 1 (spark×2); doc 3 matches nothing and never ranks
    assert(out == Map(1L -> 4L, 2L -> 1L, 3L -> 2L))
    val again = LanguageModel.bm25TopK(docs.repartition(7), "text",
      "doc_id", Seq("spark", "join"), k = 3)
      .collect().map(r => r.getLong(2) -> r.getLong(0)).toMap
    assert(out == again)
  }
}
