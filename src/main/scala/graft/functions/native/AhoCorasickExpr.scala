package graft.functions.native

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A compiled Aho–Corasick automaton (Aho & Corasick, CACM 1975):
  * goto/trie edges, BFS failure links, and per-node term-id output
  * lists with failure outputs folded in at build time (so a single
  * state visit reports every term ending at that position, including
  * nested terms — "ana" inside a "banana" hit — and overlapping
  * occurrences).
  *
  * Built once per JVM per expression instance (`@transient lazy`);
  * the scan is O(text length + matches), independent of the number of
  * dictionary terms. That independence is the point at scale: a
  * regex alternation `(t1|t2|…|tk)` costs O(text·k) in Java's
  * backtracking engine, so a 10k-term blocklist over 100 TB of text
  * is only feasible with an automaton.
  *
  * States are flat arrays; edges are per-state sorted char/next
  * parallel arrays probed by binary search — cache-friendly and free
  * of per-char boxing. Matching is on UTF-16 code units of the
  * decoded string (terms and text decode the same way, so semantics
  * are exact for any Unicode text).
  */
final class AhoAutomaton private (
    edgeChars: Array[Array[Char]],
    edgeNexts: Array[Array[Int]],
    fail: Array[Int],
    outs: Array[Array[Int]]) extends Serializable {

  private def step(from: Int, c: Char): Int = {
    var s = from
    while (true) {
      val cs = edgeChars(s)
      val i = java.util.Arrays.binarySearch(cs, c)
      if (i >= 0) return edgeNexts(s)(i)
      if (s == 0) return 0
      s = fail(s)
    }
    0 // unreachable
  }

  /** Adds every (term ending here) occurrence into counts. */
  def scan(text: String, counts: Array[Long]): Unit = {
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      s = step(s, text.charAt(i))
      val o = outs(s)
      var j = 0
      while (j < o.length) { counts(o(j)) += 1L; j += 1 }
      i += 1
    }
  }

  /** Greedy leftmost-longest NON-overlapping masking: every match is
    * collected as a (start, end) span, spans sweep in (start asc,
    * longest first) order, and a span is masked iff it starts at or
    * after the previous mask's end — exactly the walk
    * `regexp_replace(text, '(t_long|…|t_short)', repl, 'g')` performs
    * with a length-descending alternation (match leftmost; among
    * alternatives at one position take the first = longest; resume
    * after the replacement). Returns (masked text, spans masked). */
  def maskLeftmostLongest(text: String, termLens: Array[Int],
                          repl: String): (String, Long) = {
    val spans = mutable.ArrayBuffer.empty[(Int, Int)] // (start, end)
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      s = step(s, text.charAt(i))
      val o = outs(s)
      var j = 0
      while (j < o.length) {
        val len = termLens(o(j))
        spans += ((i + 1 - len, i + 1))
        j += 1
      }
      i += 1
    }
    if (spans.isEmpty) return (text, 0L)
    val ordered = spans.sortBy { case (st, en) => (st, -(en - st)) }
    val sb = new java.lang.StringBuilder(n)
    var cursor = 0
    var masked = 0L
    ordered.foreach { case (st, en) =>
      if (st >= cursor) {
        sb.append(text, cursor, st).append(repl)
        cursor = en
        masked += 1L
      }
    }
    sb.append(text, cursor, n)
    (sb.toString, masked)
  }
}

object AhoAutomaton {

  /** Builds goto trie + BFS failure links; output lists are the
    * union of the node's own terms and its failure chain's outputs
    * (folded once at build, so scan never walks the chain).
    */
  def build(terms: Seq[String]): AhoAutomaton = {
    require(terms.nonEmpty, "empty dictionary")
    require(terms.forall(_.nonEmpty), "empty term")
    // growable trie
    val children = mutable.ArrayBuffer(mutable.TreeMap.empty[Char, Int])
    val termsAt = mutable.ArrayBuffer(List.empty[Int])
    terms.zipWithIndex.foreach { case (t, id) =>
      var s = 0
      t.foreach { c =>
        s = children(s).getOrElse(c, {
          children += mutable.TreeMap.empty[Char, Int]
          termsAt += Nil
          val nxt = children.length - 1
          children(s)(c) = nxt
          nxt
        })
      }
      termsAt(s) = id :: termsAt(s)
    }
    val n = children.length
    val fail = new Array[Int](n)
    val outBufs = termsAt.map(l => mutable.ArrayBuffer(l: _*)).toArray
    val queue = mutable.Queue.empty[Int]
    children(0).foreach { case (_, v) => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      outBufs(u) ++= outBufs(fail(u))
      children(u).foreach { case (c, v) =>
        // failure target: deepest proper suffix with a c-edge
        var f = fail(u)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        fail(v) = if (children(f).contains(c) && children(f)(c) != v)
          children(f)(c) else 0
        queue += v
      }
    }
    val edgeChars = children.map(m => m.keysIterator.toArray).toArray
    val edgeNexts = children.map(m => m.valuesIterator.toArray).toArray
    new AhoAutomaton(edgeChars, edgeNexts, fail,
      outBufs.map(b => b.sorted.toArray))
  }
}

/** `graft_aho_counts(text, terms)` — per-term occurrence counts over a
  * literal dictionary, as `array<long>` indexed by term id (the
  * dictionary's declared order). Counts include overlapping and nested
  * matches: with terms `["ana","nana"]`, `"banana"` counts ana=2,
  * nana=1 — the Aho–Corasick "all occurrences" semantics, and what
  * DuckDB's positional `substr(text, i, len(t)) = t` probe reproduces.
  *
  * The dictionary arrives as a foldable `array<string>` literal (the
  * same bounded-literal contract as the unigram vocabulary — blocklists
  * are KBs-to-MBs, corpus data never is) and compiles to the automaton
  * once per task, not per row. One pass over the text regardless of
  * dictionary size — WholeStageCodegen falls back around this node but
  * the scan itself is allocation-free per char.
  *
  * Reference scope note: the reference repo (bigdata-scala-offline-
  * data-clean) has no multi-pattern matching; this extends the
  * curation surface per the training-data-pipeline mandate.
  */
case class AhoCountsExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val typesOk = left.dataType == StringType &&
      (right.dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      })
    if (!typesOk) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, array<string>), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    else if (!right.foldable) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a literal (foldable) dictionary")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "graft_aho_counts"

  /** Dictionary + automaton, built once per task from the foldable
    * child (mirrors UnigramSegmentExpr's vocabulary contract). */
  @transient private lazy val compiled: (Int, AhoAutomaton) = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val terms = (0 until arr.numElements())
      .map(i => arr.getUTF8String(i).toString)
    (terms.size, AhoAutomaton.build(terms))
  }

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) return null
    val (nTerms, automaton) = compiled
    val counts = new Array[Long](nTerms)
    automaton.scan(v.asInstanceOf[UTF8String].toString, counts)
    new GenericArrayData(counts)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_aho_scrub(text, terms, replacement)` — greedy
  * leftmost-longest NON-overlapping masking of every dictionary term,
  * the production scrub path beside [[AhoCountsExpr]]'s audit path.
  * Semantics are exactly `regexp_replace(text, '(t₁|…|tₖ)', repl,
  * 'g')` with the alternation sorted longest-first (the oracle's
  * form) — but one automaton pass instead of the backtracking
  * engine's O(text·k): at 100 TB a 10k-term scrub is only feasible
  * this way. Dictionary and replacement are foldable literals.
  */
case class AhoScrubExpr(first: Expression, second: Expression,
                        third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
  with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val typesOk = first.dataType == StringType &&
      (second.dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      }) && third.dataType == StringType
    if (!typesOk) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, array<string>, string), got " +
        s"${first.dataType.simpleString} / ${second.dataType.simpleString}" +
        s" / ${third.dataType.simpleString}")
    else if (!second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal (foldable) dictionary and " +
          "replacement")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = first.nullable
  override def prettyName: String = "graft_aho_scrub"

  @transient private lazy val compiled
      : (AhoAutomaton, Array[Int], String) = {
    val arr = second.eval(null).asInstanceOf[ArrayData]
    val terms = (0 until arr.numElements())
      .map(i => arr.getUTF8String(i).toString)
    (AhoAutomaton.build(terms), terms.map(_.length).toArray,
      third.eval(null).asInstanceOf[UTF8String].toString)
  }

  override def eval(input: InternalRow): Any = {
    val v = first.eval(input)
    if (v == null) return null
    val (automaton, lens, repl) = compiled
    val (masked, _) = automaton
      .maskLeftmostLongest(v.asInstanceOf[UTF8String].toString, lens, repl)
    UTF8String.fromString(masked)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}
