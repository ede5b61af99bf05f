package graft.functions.native

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: array<string> shingles → array<long>(16).
  *
  * Computes, in ONE pass over the shingle array:
  *   h(s)  = first 4 bytes of md5(utf8(s)) as an unsigned big-endian int
  *           (identical to conv(substring(md5(s),1,8),16,10) and to the
  *           DuckDB hex-digit fold — md5 is md5 everywhere)
  *   m_j   = min over s of (a_j * h(s) + b_j) mod P
  * using TextFns.MinhashSeeds/MinhashP.
  *
  * The HOF formulation materializes the md5 as a hex STRING, parses it
  * back with conv(), and walks the array once per signature slot (16
  * passes, 5M hex-string round-trips at sf0.1). This expression digests
  * raw bytes and keeps 16 running minima — one MessageDigest per thread,
  * zero intermediate allocation per shingle. CodegenFallback: the md5
  * digest dominates; codegen of the loop shell would not move the
  * needle.
  */
case class MinhashSigExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  private val seeds = graft.functions.TextFns.MinhashSeeds.toArray
  private val p = graft.functions.TextFns.MinhashP

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash_sig"

  @transient private lazy val digest: MessageDigest =
    MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(seeds.length)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      digest.reset()
      val d = digest.digest(s.getBytes)
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var j = 0
      while (j < seeds.length) {
        val (a, b) = seeds(j)
        val v = (a * h + b) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native multi-table LSH bucketing: array<double> vector →
  * array<long>(tables), one bucket id per table.
  *
  * Plane (t*bits+r)'s i-th component is ±1 from the same affine hash the
  * HOF formulation uses (Similarity.planeSign); all tables×bits
  * projections happen in a single pass over the vector instead of one
  * interpreted aggregate+transform per plane (96 passes at 16×6).
  */
case class LshBucketsExpr(child: Expression, tables: Int, bits: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_lsh_buckets"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val planes = tables * bits
    val proj = new Array[Double](planes)
    var i = 0
    while (i < n) {
      val x = v.getDouble(i)
      var j = 0
      while (j < planes) {
        val sign =
          if (((j * 2654435761L + (i + 1) * 40503L) % 97L) % 2L == 0L) 1.0d
          else -1.0d
        proj(j) += x * sign
        j += 1
      }
      i += 1
    }
    val buckets = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var r = 0
      while (r < bits) {
        if (proj(t * bits + r) > 0) bucket |= (1L << r)
        r += 1
      }
      buckets(t) = bucket
      t += 1
    }
    new GenericArrayData(buckets)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
