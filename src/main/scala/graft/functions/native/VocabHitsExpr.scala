package graft.functions.native

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native vocabulary-hit extraction: string text × literal
  * array<string> vocab → the SORTED DISTINCT vocab tokens present in
  * the whitespace tokenization of lower(trim(text)) — exactly
  *
  *   array_sort(array_intersect(
  *     array_distinct(split(lower(trim(text)), "\\s+")), vocab))
  *
  * in ONE pass with zero intermediate arrays, where the expression
  * chain materializes the full token array (every token an allocated
  * UTF8String), a distinct pass, an intersect pass and a sort pass per
  * row — the regex tokenization scan is x_cooccurrence's whole CPU
  * (r11 verdict item 6).
  *
  * Equivalences pinned by the chain it replaces:
  *  - tokenizer: Java-regex \s members, split limit -1, ROOT-locale
  *    lowercase (the [[SimhashExpr]] precedent, asserted bit-equal on
  *    real docs); empty tokens can never be vocab hits, so trim and
  *    leading/trailing empty-token subtleties cannot change the result;
  *  - order: ascending UTF8String binary order — array_sort's string
  *    ordering;
  *  - a hit equals its vocab entry by definition of membership, so
  *    emitting the matched token is emitting the intersect result.
  */
case class VocabHitsExpr(left: Expression, right: Expression)
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
      s"$prettyName requires a literal (foldable) vocabulary")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "graft_vocab_hits"

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val s = new java.util.HashSet[String](arr.numElements() * 2)
    var i = 0
    while (i < arr.numElements()) {
      s.add(arr.getUTF8String(i).toString)
      i += 1
    }
    s
  }

  // Java-regex \s members (the chain splits on "\\s+")
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) return null
    val s = v.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    val seen = new java.util.TreeSet[UTF8String]() // sorted + distinct
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > start) {
        val tok = s.substring(start, i)
        if (vocabSet.contains(tok)) seen.add(UTF8String.fromString(tok))
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
