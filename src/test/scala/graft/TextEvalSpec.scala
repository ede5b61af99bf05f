package graft

import org.apache.spark.sql.functions._

import graft.operators.TextEval

class TextEvalSpec extends SparkSpec {
  import spark.implicits._

  test("rougeBleuReport matches a hand-computed pair") {
    // cand: the cat the cat sat (5 toks)  ref: the cat sat on the mat (6)
    // clip1 = min(2,2)+min(2,1)+min(1,1) = 4
    // bigrams: cand {the cat:2, cat the:1, cat sat:1}  ref: 5 distinct ×1
    // clip2 = min(2,1)["the cat"] + min(1,1)["cat sat"] = 2
    val pairs = Seq((1L, "the cat the cat sat", "the cat sat on the mat"))
      .toDF("id", "cand", "ref")
    val r = TextEval.rougeBleuReport(pairs, "id", "cand", "ref").head()
    assert(r.getLong(1) == 8000L)              // p1 = 4e4 div 5
    assert(r.getLong(2) == 6666L)              // r1 = 4e4 div 6
    assert(r.getLong(3) == 2L * 8000 * 6666 / (8000 + 6666)) // 7272
    assert(r.getLong(4) == 5000L)              // p2 = 2e4 div 4
    assert(r.getLong(5) == 4000L)              // r2 = 2e4 div 5
    assert(r.getLong(6) == 4444L)              // f2
    assert(r.getLong(7) == 8333L)              // brevity 5e4 div 6
    assert(r.getLong(8) == 8000L * 5000L)      // bleu2 squared
  }

  test("identical pair scores perfect; disjoint pair scores zero") {
    val pairs = Seq(
      (1L, "a b c d", "a b c d"),
      (2L, "x y z", "p q r s")).toDF("id", "cand", "ref")
    val rows = TextEval.rougeBleuReport(pairs, "id", "cand", "ref")
      .orderBy("id").collect()
    assert(rows(0).getLong(1) == 10000L && rows(0).getLong(3) == 10000L &&
      rows(0).getLong(6) == 10000L && rows(0).getLong(7) == 10000L)
    assert(rows(1).getLong(1) == 0L && rows(1).getLong(3) == 0L &&
      rows(1).getLong(6) == 0L)
  }

  test("single-token sides have zero bigrams, no nulls anywhere") {
    val pairs = Seq((1L, "word", "word"), (2L, "word", "other two"))
      .toDF("id", "cand", "ref")
    val rows = TextEval.rougeBleuReport(pairs, "id", "cand", "ref")
      .orderBy("id").collect()
    rows.foreach(r => (1 to 8).foreach(i => assert(!r.isNullAt(i))))
    assert(rows(0).getLong(1) == 10000L) // unigram perfect
    assert(rows(0).getLong(4) == 0L)     // p2: no bigrams → clip 0 div 1
  }

  test("wordGrams guards the short case (Spark sequence would descend)") {
    val df = Seq(("one two", "x")).toDF("a", "b")
    val r = df.select(TextEval.wordGrams($"a", 3).as("ga"),
      TextEval.wordGrams($"b", 2).as("gb")).head()
    assert(r.getSeq[String](0).isEmpty && r.getSeq[String](1).isEmpty)
  }

  test("repetitionReport: top bigram + no duplicated 5-grams") {
    val df = Seq((1L, "a b a b a b c")).toDF("doc_id", "text")
    val r = TextEval.repetitionReport(df, "text", "doc_id").head()
    assert(r.getString(1) == "a b" && r.getLong(2) == 3L)
    assert(r.getLong(3) == 3L * 2 * 10000 / 7)  // 8571
    assert(r.getLong(4) == 0L)                  // all 5-grams distinct
    assert(r.getLong(5) == 7L)
  }

  test("repetitionReport: overlapping duplicated 5-grams cover by UNION") {
    // 8 tokens; both 5-grams repeat with overlapping instances at
    // 1,2,3,4 → union [1,9) = all 8 tokens, not 4·5 = 20
    val df = Seq((1L, "x y x y x y x y")).toDF("doc_id", "text")
    val r = TextEval.repetitionReport(df, "text", "doc_id").head()
    assert(r.getLong(4) == 10000L)
    assert(r.getString(1) == "x y" && r.getLong(2) == 4L)
    assert(r.getLong(3) == 10000L)
  }

  test("repetitionReport: short docs produce zero metrics, not nulls") {
    val df = Seq((1L, "solo")).toDF("doc_id", "text")
    val r = TextEval.repetitionReport(df, "text", "doc_id").head()
    assert(r.getString(1) == "" && r.getLong(2) == 0L &&
      r.getLong(3) == 0L && r.getLong(4) == 0L && r.getLong(5) == 1L)
  }

  test("x_gopher_repetition lane: the planted 3x phrase registers everywhere") {
    val q = queries.TrainingData.queries("x_gopher_repetition")
    val df = q(spark, sf0001).cache()
    try {
      assert(df.count() == Tables.load(spark, sf0001, "documents").count())
      assert(df.filter($"dup5_cov_bp" === 0L).count() == 0)
      assert(df.filter($"top2_n" < 3L).count() == 0)
    } finally df.unpersist()
  }

  test("x_rouge_bleu lane: near-dup candidate keeps recall below precision") {
    val q = queries.TrainingData.queries("x_rouge_bleu")
    val df = q(spark, sf0001).cache()
    try {
      assert(df.count() == Tables.load(spark, sf0001, "documents").count())
      // cand = ref minus its first chars → never more tokens than ref,
      // so recall ≤ precision and brevity ≤ 10000 on every pair
      assert(df.filter($"r1_bp" > $"p1_bp").count() == 0)
      assert(df.filter($"brevity_bp" > 10000L).count() == 0)
      assert(df.filter($"f1_bp" > 0L).count() > 0)
    } finally df.unpersist()
  }
}
