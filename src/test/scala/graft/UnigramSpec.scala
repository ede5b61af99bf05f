package graft

import org.apache.spark.sql.functions._

import graft.functions.native.NativeFns
import graft.operators.Unigram

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def segOf(word: String, vocab: Seq[(String, Long)]): Option[String] =
    Seq(word).toDF("w")
      .select(NativeFns.unigramSegment(col("w"), vocab.map(_._1),
        vocab.map(_._2)).as("seg"))
      .collect().headOption.flatMap(r => Option(r.getString(0)))

  /** Driver-side brute force: enumerate every cover of `word` by vocab
    * pieces (length <= 4) and return the max total score. */
  private def bruteBest(word: String,
                        vocab: Map[String, Long]): Option[Long] = {
    def go(i: Int): Option[Long] =
      if (i == word.length) Some(0L)
      else (1 to math.min(4, word.length - i)).flatMap { l =>
        vocab.get(word.substring(i, i + l))
          .flatMap(s => go(i + l).map(_ + s))
      } match {
        case Nil => None
        case xs => Some(xs.max)
      }
    go(0)
  }

  test("Viterbi score equals brute-force enumeration over random " +
    "vocabularies and words") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    for (trial <- 1 to 40) {
      // distinct scores => unique argmax => the exact segmentation is
      // determined by optimality alone
      val pieces = (alphabet.map(_.toString) ++
        Seq.fill(12)((1 to (rnd.nextInt(3) + 2)).map(_ =>
          alphabet(rnd.nextInt(3))).mkString)).distinct
      val scored = pieces.zipWithIndex.map { case (p, i) =>
        p -> (-1000000L + i * 1017L - rnd.nextInt(5000))
      }.toMap.toSeq
      val word = (1 to (rnd.nextInt(8) + 1)).map(_ =>
        alphabet(rnd.nextInt(3))).mkString
      val got = segOf(word, scored.map(t => (t._1, t._2)))
      val want = bruteBest(word, scored.toMap)
      (got, want) match {
        case (None, None) =>
        case (Some(s), Some(b)) =>
          val total = s.split(Unigram.Sep).map(scored.toMap).sum
          assert(total == b,
            s"trial $trial: word '$word' seg '$s' scores $total != $b")
          assert(s.replace(Unigram.Sep, "") == word,
            s"segmentation must re-concatenate to the word")
        case other => fail(s"trial $trial: '$word' => $other")
      }
    }
  }

  test("ties break on the LONGEST final piece (smallest split point) — " +
    "the oracle's ORDER BY score DESC, j ASC") {
    // 'ab' via the piece "ab" (-10) ties 'a'+'b' (-5 + -5): keep "ab"
    val v = Seq(("a", -5L), ("b", -5L), ("ab", -10L))
    assert(segOf("ab", v).contains("ab"))
    // and a longer tie chain keeps preferring the longer final piece
    assert(segOf("abab", v).contains("ab" + Unigram.Sep + "ab"))
  }

  test("a word with an out-of-vocabulary character segments to null; " +
    "empty input is empty") {
    val v = Seq(("a", -5L), ("b", -5L))
    assert(segOf("axb", v).isEmpty, "OOV char must yield null")
    assert(segOf("", v).contains(""))
  }

  test("train + segment + usage over a corpus: chars always kept, " +
    "pieces re-concatenate, usage counts are word-frequency weighted") {
    val docs = Seq(
      (1L, "the cat sat"), (2L, "the cat"), (3L, "the the the"))
      .toDF("doc_id", "text")
    val vocabDf = Unigram.trainVocab(docs, "text", topMulti = 8,
      maxWordLen = 20)
    val vocab = vocabDf.orderBy(col("piece"))
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    val words = Unigram.wordCounts(docs, "text", 20)
    val seg = Unigram.segmentWords(words, vocab)
    val rows = seg.collect()
    assert(rows.forall(_.getString(2) != null), "full char coverage")
    rows.foreach { r =>
      assert(r.getString(2).replace(Unigram.Sep, "") == r.getString(0))
      assert(r.getLong(3) >= 1 &&
        r.getLong(3) <= r.getString(0).length)
    }
    // 'the' appears 5 times and is a top substring piece: Viterbi must
    // segment the word 'the' as the single piece 'the'
    val the = rows.find(_.getString(0) == "the").get
    assert(the.getString(2) == "the" && the.getLong(3) == 1L)
    val usage = Unigram.usageReport(seg, vocabDf)
    val u = usage.collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(u("the")._1 == 5L, s"'the' used once per occurrence: $u")
    // every single char is kept even if Viterbi never uses it alone
    vocabDf.where(col("is_char")).collect().map(_.getString(0))
      .foreach(c => assert(u(c)._2, s"char '$c' must be kept"))
  }

  test("one hard-EM round: unused multi-char pieces drop, characters " +
    "survive with floored usage, and every word still segments") {
    val docs = Seq(
      (1L, "the cat sat"), (2L, "the cat"), (3L, "the the the"))
      .toDF("doc_id", "text")
    val v1df = Unigram.trainVocab(docs, "text", topMulti = 8,
      maxWordLen = 20)
    val v1 = v1df.orderBy(col("piece"))
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    val words = Unigram.wordCounts(docs, "text", 20)
    val usage = Unigram.usageReport(Unigram.segmentWords(words, v1), v1df)
    val v2df = Unigram.rescoreFromUsage(usage)
    val v2 = v2df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // M-step drops exactly the not-kept pieces
    val keptSet = usage.where(col("kept")).collect()
      .map(_.getString(0)).toSet
    assert(v2.map(_._1).toSet == keptSet)
    // floored usage: every rescored count >= 1, scores negative
    assert(v2.forall(t => t._2 >= 1L && t._3 < 0L))
    // coverage survives the prune: chars are all kept, so round 2
    // still segments every word
    val seg2 = Unigram.segmentWords(words,
      v2df.orderBy(col("piece")).collect()
        .map(r => (r.getString(0), r.getLong(2))).toSeq)
    assert(seg2.where(col("seg").isNull).count() == 0)
  }

  test("segmentation runs inside WholeStageCodegen (native expression, " +
    "not an interpreted fallback)") {
    val words = Unigram.wordCounts(
      Seq((1L, "aa ab ba")).toDF("doc_id", "text"), "text", 20)
    val seg = Unigram.segmentWords(words,
      Seq(("a", -5L), ("b", -6L), ("ab", -8L), ("aa", -7L), ("ba", -9L)))
    assert(seg.count() == 3)
    // drive execution first: AQE finalizes (and codegens) the plan
    // only once it runs; the `*(n)` prefix marks whole-stage-codegen'd
    // operators (the PlanSpec idiom), and the segmentation lives in
    // the final Project
    seg.collect()
    val plan = seg.queryExecution.executedPlan.toString
    assert(plan.contains("*(2) Project"), s"project not codegen'd:\n$plan")
  }
}
