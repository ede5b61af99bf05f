package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.functions.native.NativeFns

/** Bit-parity of the r12 native expressions against the expression
  * chains they replaced — the same contract every earlier native
  * expression carries (the unchanged oracles are the system-level
  * pin; these are the direct ones).
  */
class NativeParitySpec extends SparkSpec {
  import spark.implicits._

  NativeFns.register(spark)

  test("graft_cm_cells == hash32 chain, cell for cell") {
    val keys = Seq("", "a", "hello", "héllo wörld", "中文字符串",
      "cm0:prefix-collision", "  spaced  ", "\ttab\nnewline",
      "0123456789abcdef") ++
      (0 until 500).map(i => s"gram$i")
    val (depth, width) = (3, 2048)
    val df = keys.toDF("k")
    val chain = array((0 until depth).map(d =>
      TextFns.hash32(concat(lit(s"cm$d:"), col("k"))) % width): _*)
    val bad = df.select(col("k"),
        NativeFns.cmCells(col("k"), depth, width).as("native"),
        chain.as("chain"))
      .where(not(col("native") === col("chain")))
    assert(bad.count() == 0,
      bad.collect().take(3).mkString("cells diverged: ", " | ", ""))
  }

  test("graft_cm_cells on a null key keeps the chain's depth null " +
    "cells (grouped rows must not vanish)") {
    val df = Seq[Option[String]](Some("x"), None).toDF("k")
    val n = df.select(posexplode(NativeFns.cmCells(col("k"), 3, 64)))
      .count()
    assert(n == 6, s"expected 3 cells per row incl. the null key, got $n")
  }

  test("graft_vocab_hits == array_sort(array_intersect(array_distinct(" +
    "split(lower(trim(text)))))) chain") {
    val vocab = Seq("apple", "pear", "zebra", "Ärger", "中文", "a")
    val texts = Seq(
      "apple pear apple", "  APPLE\tzebra  ", "", "   ",
      "nothing matches here", "a a a pear", "ärger ÄRGER",
      "中文 words 中文", "pear\napplezebra", null)
    val df = texts.toDF("text")
    val chain = array_sort(array_intersect(
      array_distinct(split(lower(trim(col("text"))), "\\s+")),
      typedLit(vocab)))
    val got = df.select(
        NativeFns.vocabHits(col("text"), vocab).as("native"),
        chain.as("chain"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null-ness diverged: $r")
      if (!r.isNullAt(0))
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"hits diverged: $r")
    }
  }
}
