package graft.functions.native

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character k-shingles in one pass.
  *
  * Semantics identical to
  * `array_distinct(transform(sequence(1, greatest(len-k+1, 1)), i ->
  * substring(text, i, k)))` (TextFns.shingles): codepoint-based windows,
  * and a string shorter than k yields itself as its single shingle.
  * The HOF form allocates a lambda-evaluated substring per position plus
  * an intermediate array before array_distinct; this walks the UTF8
  * bytes once, slicing windows straight into a dedup set.
  */
case class ShinglesExpr(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {

  require(k > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numChars()
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (n <= k) {
      out.add(s)
    } else {
      var i = 1
      val last = n - k + 1
      while (i <= last) {
        out.add(s.substringSQL(i, k))
        i += 1
      }
    }
    val arr = new Array[AnyRef](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Jaccard similarity of two string arrays that are already distinct:
  * |A∩B| / |A∪B| in one hash-set pass instead of
  * size(array_intersect)/size(array_union) (two interpreted passes plus
  * two intermediate arrays). Returns the identical double (integer
  * counts, single division).
  */
case class JaccardExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> inputs, got " +
          s"${l.simpleString} / ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val set = new java.util.HashSet[UTF8String](nx * 2)
    var i = 0
    while (i < nx) { set.add(x.getUTF8String(i)); i += 1 }
    var inter = 0
    var j = 0
    while (j < ny) {
      if (set.contains(y.getUTF8String(j))) inter += 1
      j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 0.0d else inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
