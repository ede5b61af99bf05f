package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** The Viterbi DP core of
  * [[graft.functions.native.UnigramSegmentExpr]], hosted OUTSIDE the
  * `native` package: generated Java casts codegen reference objects to
  * their declared class name, and `native` is a Java keyword — janino
  * rejects `graft.functions.native.X` ("Unexpected selector 'native'"),
  * silently demoting every plan containing the expression to
  * interpreted execution (found r10: the fallback compiles the plan
  * string with the `*(n)` markers intact, so only the janino error in
  * the logs betrays it). This class's name is legal Java, so the cast
  * compiles and the DP stays inside WholeStageCodegen
  * (UnigramSpec pins compile success with codegen.fallback=false).
  *
  * Semantics and contracts live on the expression's scaladoc; this is
  * the per-task state (vocabulary hash) plus the integer DP.
  */
final class UnigramSegmenter(pieces: Array[UTF8String],
                             scores: Array[Long]) extends Serializable {
  require(pieces.length == scores.length,
    "pieces and scores must be equal-length")

  /** Boxed values so an absent piece reads as null, never a phantom
    * score. Built once per (task, expression), not per row. */
  private val vocab: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](
      pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      m.put(pieces(i), java.lang.Long.valueOf(scores(i)))
      i += 1
    }
    m
  }

  /** Viterbi-optimal cover of `word`; total (the char fallback covers
    * any out-of-vocabulary character at the UnkScore floor). */
  def segment(word: UTF8String): UTF8String = {
    val len = word.numChars()
    if (len == 0) return UTF8String.EMPTY_UTF8
    // char→byte offsets, one pass: offs(k) = byte offset of char k
    // (UTF-8 continuation bytes are 10xxxxxx). Each DP lookup then
    // slices O(piece bytes) instead of re-scanning the word.
    val bytes = word.getBytes
    val offs = new Array[Int](len + 1)
    var ci = 0
    var bi = 0
    while (bi < bytes.length) {
      if ((bytes(bi) & 0xC0) != 0x80) { offs(ci) = bi; ci += 1 }
      bi += 1
    }
    offs(len) = bytes.length
    def slice(j: Int, i: Int): UTF8String =
      UTF8String.fromBytes(bytes, offs(j), offs(i) - offs(j))
    val maxPiece = graft.functions.native.UnigramSegmentExpr.MaxPieceLen
    val unk = graft.functions.native.UnigramSegmentExpr.UnkScore
    val best = new Array[Long](len + 1)
    val from = new Array[Int](len + 1)
    java.util.Arrays.fill(best, Long.MinValue)
    best(0) = 0L
    var i = 1
    while (i <= len) {
      // ascending j with strict improvement: the SMALLEST feasible
      // split point wins ties = the longest final piece (the oracle's
      // ORDER BY score DESC, j ASC)
      var j = math.max(0, i - maxPiece)
      while (j < i) {
        if (best(j) != Long.MinValue) {
          val s = vocab.get(slice(j, i))
          // exactly "as if the vocabulary held every absent single
          // char at UnkScore" — the rule the oracle's augmented-vocab
          // join replays, including the tie order
          val sc =
            if (s != null) s.longValue()
            else if (i - j == 1) unk
            else Long.MinValue
          if (sc != Long.MinValue) {
            val cand = best(j) + sc
            if (cand > best(i)) { best(i) = cand; from(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    // reconstruct: walk split points right-to-left, emit left-to-right
    // (best(len) is always finite — the fallback covers every char)
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
      if (out > 0) {
        parts(out) = graft.functions.native.UnigramSegmentExpr.Sep
        out += 1
      }
      parts(out) = slice(lo, hi); out += 1
      lo = hi
      k -= 1
    }
    UTF8String.concat(parts: _*)
  }
}
