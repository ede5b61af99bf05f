package graft.functions.native

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi-optimal unigram-LM segmentation of one pretoken (word) —
  * the inference core of a SentencePiece-style unigram tokenizer
  * (Kudo, ACL 2018): among all ways to cover the word with vocabulary
  * pieces, return the one maximizing the sum of the pieces' integer
  * log-scores. Scores are quantized micro-nats (the library's
  * LanguageModel device), so the DP is exact integer arithmetic and a
  * SQL oracle replays it level by level; ties break on the LONGEST
  * final piece at each prefix (smallest split point), which makes the
  * argmax — not just the max — engine-identical.
  *
  * The vocabulary arrives as two foldable array literals (pieces,
  * scores) built from a bounded driver-side collect (the BPE-merge
  * contract: tokenizer vocabularies are KBs, corpus data never is) and
  * is hashed once per task, not per row. Pieces are capped at
  * [[UnigramSegmentExpr.MaxPieceLen]] characters — the DP looks back
  * that far — and the whole loop is O(len · MaxPieceLen) with no
  * allocation beyond the two DP arrays. A word containing a character
  * outside the vocabulary has no cover and returns null (callers keep
  * every corpus character in the vocabulary, so null flags true OOV).
  *
  * Output: the piece sequence joined with U+001F (the BPE separator
  * convention); piece count = one + separators, so downstream stats
  * need no re-parse.
  */
case class UnigramSegmentExpr(first: Expression, second: Expression,
                              third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == StringType &&
      (second.dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      }) &&
      (third.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      })
    if (!ok) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, array<string>, array<bigint>), " +
        s"got ${first.dataType.simpleString} / " +
        s"${second.dataType.simpleString} / ${third.dataType.simpleString}")
    else if (!second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal vocabulary (pieces and scores " +
          "must be foldable)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_unigram_segment"

  /** Vocabulary hash, built once per task from the foldable children.
    * Values are boxed so an absent piece reads as null, never as a
    * phantom 0 score. */
  @transient private lazy val vocab
      : java.util.HashMap[UTF8String, java.lang.Long] = {
    val pieces = second.eval().asInstanceOf[ArrayData]
    val scores = third.eval().asInstanceOf[ArrayData]
    require(pieces != null && scores != null &&
      pieces.numElements() == scores.numElements(),
      s"$prettyName: pieces and scores must be equal-length non-null arrays")
    val m = new java.util.HashMap[UTF8String, java.lang.Long](
      pieces.numElements() * 2)
    var i = 0
    while (i < pieces.numElements()) {
      m.put(pieces.getUTF8String(i), java.lang.Long.valueOf(scores.getLong(i)))
      i += 1
    }
    m
  }

  /** The DP; public so generated code can call it through a reference
    * object. Returns null when no cover exists. */
  def segment(word: UTF8String): UTF8String = {
    val len = word.numChars()
    if (len == 0) return UTF8String.EMPTY_UTF8
    val best = new Array[Long](len + 1)
    val from = new Array[Int](len + 1)
    java.util.Arrays.fill(best, Long.MinValue)
    best(0) = 0L
    var i = 1
    while (i <= len) {
      // ascending j with strict improvement: the SMALLEST feasible
      // split point wins ties = the longest final piece (the oracle's
      // ORDER BY score DESC, j ASC)
      var j = math.max(0, i - UnigramSegmentExpr.MaxPieceLen)
      while (j < i) {
        if (best(j) != Long.MinValue) {
          val s = vocab.get(word.substring(j, i))
          if (s != null) {
            val cand = best(j) + s.longValue()
            if (cand > best(i)) { best(i) = cand; from(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    if (best(len) == Long.MinValue) return null
    // reconstruct: walk split points right-to-left, emit left-to-right
    val cuts = new Array[Int](len + 1)
    var n = 0
    var p = len
    while (p > 0) { cuts(n) = p; n += 1; p = from(p) }
    val parts = new Array[UTF8String](2 * n - 1)
    var k = n - 1
    var lo = 0
    var out = 0
    while (k >= 0) {
      val hi = cuts(k)
      if (out > 0) { parts(out) = UnigramSegmentExpr.Sep; out += 1 }
      parts(out) = word.substring(lo, hi); out += 1
      lo = hi
      k -= 1
    }
    UTF8String.concat(parts: _*)
  }

  override def nullSafeEval(w: Any, p: Any, s: Any): Any =
    segment(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramExpr", this,
      classOf[UnigramSegmentExpr].getName)
    nullSafeCodeGen(ctx, ev, (w, _, _) => {
      s"""
         |${ev.value} = $ref.segment($w);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object UnigramSegmentExpr {
  /** Longest vocabulary piece the DP considers; longer entries in the
    * pieces array can never match and are dead weight, so trainers cap
    * candidate generation at the same bound. */
  val MaxPieceLen: Int = 4

  /** U+001F piece separator (the BPE representation convention — never
    * occurs in whitespace-split corpus pretokens). */
  val Sep: UTF8String = UTF8String.fromString("\u001f")
}
