package graft

import org.apache.spark.sql.functions._

import graft.functions.native.NativeFns

class UnicodeSpec extends SparkSpec {
  import spark.implicits._

  // explicit escapes: \u0301 combining acute, \u030a combining ring,
  // \u0308 combining diaeresis; \u00e9/\u00c5/\u00fc precomposed
  test("nfcNormalize composes decomposed sequences, identity on NFC text") {
    val df = Seq(
      ("cafe\u0301", "caf\u00e9"),
      ("A\u030aBC", "\u00c5BC"),
      ("plain ascii", "plain ascii")
    ).toDF("s", "expected")
    val bad = df.where(NativeFns.nfcNormalize($"s") =!= $"expected").count()
    assert(bad === 0)
    val n = df.select(length(NativeFns.nfcNormalize(lit("cafe\u0301"))))
      .limit(1).as[Int].head()
    assert(n === 4)
  }

  test("stripAccents removes combining marks from either input form") {
    val out = Seq(
      "cafe\u0301",       // decomposed
      "caf\u00e9",        // precomposed
      "M\u00fcller",
      "stra\u00dfe"       // has no decomposition: passes through
    ).toDF("s").select(NativeFns.stripAccents($"s")).as[String].collect()
    assert(out.toSeq === Seq("cafe", "cafe", "Muller", "stra\u00dfe"))
  }

  test("stripAccents recomposes non-mark decompositions like utf8proc") {
    // expected bytes verified directly against DuckDB strip_accents:
    // decomposed Hangul Jamo (U+1112 U+1161 U+11AB) comes back as ONE
    // precomposed syllable (U+D55C), and Greek tonos is stripped with
    // the letters left precomposed — a decompose-only implementation
    // (no final NFC) would return the Jamo sequence and diverge
    val out = Seq(
      "한",               // decomposed 한
      "한국어",               // precomposed 한국어
      "Ελλάδα" // Ελλάδα
    ).toDF("s").select(NativeFns.stripAccents($"s")).as[String].collect()
    assert(out.toSeq === Seq(
      "한",
      "한국어",
      "Ελλαδα"))
  }

  test("nfc/stripAccents propagate null") {
    val out = Seq(Option.empty[String]).toDF("s")
      .select(NativeFns.nfcNormalize($"s"), NativeFns.stripAccents($"s"))
      .head()
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("deflateRatio: repetitive text compresses far below natural text") {
    val rep = "spam spam spam " * 50
    val row = Seq((rep, "the quick brown fox jumps over the lazy dog", ""))
      .toDF("rep", "nat", "empty")
      .select(NativeFns.deflateRatio($"rep"), NativeFns.deflateRatio($"nat"),
        NativeFns.deflateRatio($"empty"))
      .head()
    val (r, n, e) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    assert(r < 0.1, s"repetitive ratio $r should be tiny")
    assert(n > 0.5, s"short natural text ratio $n should stay high")
    assert(e === 1.0)
  }

  test("deflateRatio is deterministic across repartitioning") {
    val docs = Tables.load(spark, sf0001, "documents")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", NativeFns.deflateRatio($"text"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(run(docs) === run(docs.repartition(7)))
  }
}
