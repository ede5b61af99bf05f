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

  test("an out-of-vocabulary character takes the char fallback (one " +
    "floor-scored piece), never nulling the word; empty input is empty") {
    val v = Seq(("a", -5L), ("b", -5L), ("ab", -8L))
    // 'x' is OOV: it becomes its own piece; the in-vocab neighbors
    // still segment optimally around it ("ab" beats "a"+"b")
    assert(segOf("abxab", v).contains(
      "ab" + Unigram.Sep + "x" + Unigram.Sep + "ab"))
    // an all-OOV word is per-char fallback pieces
    assert(segOf("xy", v).contains("x" + Unigram.Sep + "y"))
    assert(segOf("", v).contains(""))
  }

  test("the fallback never fires for an in-vocab character: a real " +
    "cover strictly dominates any fallback-using path") {
    // 'b' is in vocab at the worst realistic score; the fallback floor
    // is far below it, so 'ab' must use the real pieces
    val v = Seq(("a", -20000000L), ("b", -20000000L))
    assert(segOf("ab", v).contains("a" + Unigram.Sep + "b"))
  }

  test("multi-byte text segments correctly (char→byte offset table): " +
    "pieces slice on CHAR boundaries, fallback included") {
    // 'é' (2 bytes) and '語' (3 bytes) mixed with ASCII; vocab holds
    // the multi-byte chars and a multi-byte bigram
    val v = Seq(("é", -5L), ("語", -6L), ("aé", -8L), ("a", -5L))
    assert(segOf("aé語", v).contains(
      "aé" + Unigram.Sep + "語"))
    // OOV multi-byte char ('ü') falls back as ONE char piece
    assert(segOf("aüa", v).contains(
      "a" + Unigram.Sep + "ü" + Unigram.Sep + "a"))
  }

  test("usageReport folds fallback pieces into one explicit <unk> row " +
    "(cnt 0, summed usage, kept=false); absent when nothing fell back") {
    val docs = Seq((1L, "the cat sat")).toDF("doc_id", "text")
    val vdf = Unigram.trainVocab(docs, "text", topMulti = 8,
      maxWordLen = 20)
    val vocab = vdf.orderBy(col("piece"))
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    // apply to NEW text with planted OOV chars: 'ö' twice, weighted by
    // word frequency (cnt 3 and 1)
    val applyWords = Seq(("öat", 3L), ("cöö", 1L), ("cat", 2L))
      .toDF("w", "cnt")
    val rep = Unigram.usageReport(
      Unigram.segmentWords(applyWords, vocab), vdf)
    val unk = rep.where(col("piece") === "<unk>").collect()
    assert(unk.length == 1, "exactly one <unk> accounting row")
    // 'öat' (cnt 3) has one ö; 'cöö' (cnt 1) has two → usage 3·1+1·2=5
    assert(unk.head.getLong(1) == 0L && unk.head.getLong(2) == 5L &&
      !unk.head.getBoolean(3))
    // training-corpus report: no fallback → no <unk> row (existing
    // lanes' hashes unchanged)
    val clean = Unigram.usageReport(
      Unigram.segmentWords(Unigram.wordCounts(docs, "text", 20), vocab),
      vdf)
    assert(clean.where(col("piece") === "<unk>").count() == 0)
  }

  test("trainToBudget: |V| shrinks monotonically to max(budget, " +
    "n_chars), chars never cut, and the final vocab still covers") {
    val docs = Seq(
      (1L, "the cat sat on the mat"), (2L, "the cat ran"),
      (3L, "the the the mat mat")).toDF("doc_id", "text")
    val v0 = Unigram.trainVocab(docs, "text", topMulti = 16,
      maxWordLen = 20)
    val words = Unigram.wordCounts(docs, "text", 20)
    val nChars = v0.where(col("is_char")).count()
    val budget = (nChars + 2).toInt // forces a real multi-char cut
    val sizes = (1 to 3).scanLeft(v0) { (v, _) =>
      val vocab = v.orderBy(col("piece")).collect()
        .map(r => (r.getString(0), r.getLong(2))).toSeq
      Unigram.rescoreToBudget(
        Unigram.usageReport(Unigram.segmentWords(words, vocab), v),
        budget)
    }.map(_.collect())
    val counts = sizes.map(_.length.toLong)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"vocab must shrink monotonically, got $counts")
    assert(counts.last <= math.max(budget.toLong, nChars))
    // coverage floor: every char of v0 survives every round
    val chars0 = sizes.head.filter(_.getBoolean(3)).map(_.getString(0)).toSet
    val charsN = sizes.last.filter(_.getBoolean(3)).map(_.getString(0)).toSet
    assert(chars0 == charsN, "single characters must never be cut")
    // and trainToBudget(rounds=2) equals two manual rounds
    val two = Unigram.trainToBudget(words, v0, budget, rounds = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(two == sizes(2)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet)
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
    // codegen.fallback=false makes a janino compile failure THROW
    // instead of silently demoting to interpreted execution — the plan
    // string keeps its `*(n)` markers either way, so the marker check
    // alone cannot catch it (the r10 finding: a reference-object cast
    // to a class under the `native` package is illegal Java, and every
    // segmentation stage was quietly interpreted)
    withSQLConf("spark.sql.codegen.fallback" -> "false") {
      assert(seg.collect().length == 3)
    }
    val plan = seg.queryExecution.executedPlan.toString
    assert(plan.contains("*(2) Project"), s"project not codegen'd:\n$plan")
  }
}
