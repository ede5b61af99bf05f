package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Typed byte-cell decode — the reference's S4/S5 ingestion shape: a
  * keyed store hands back one byte array per cell, and the job lifts
  * them through per-column typed converters + an explicit `StructType`
  * into `createDataFrame(rdd, schema)` (reference
  * handler/OrderMasterDataClean.scala:98-154 with the `Bytes.toInt /
  * toString / toDouble` converters of common/HbaseCliUtil.scala:8-11).
  *
  * Cell encoding matches HBase's `Bytes` conventions (public API
  * semantics): UTF-8 for strings, big-endian two's-complement for
  * int/long, big-endian IEEE-754 bits for double; a missing cell is a
  * NULL column.
  *
  * This is one of the two deliberate RDD boundaries in the library (the
  * other is the multimodal codec): per-cell byte decoding is genuine
  * row-local imperative work with no Catalyst equivalent, exactly the
  * case the S4 row of SURVEY §2 reserves for `createDataFrame(rdd,
  * schema)`. Everything downstream of the lift is a normal DataFrame,
  * so pushdown/codegen resume immediately; the decode itself is
  * embarrassingly parallel and scales with input splits.
  */
object ByteDecode {

  def encodeCell(dt: DataType, v: Any): Array[Byte] =
    if (v == null) null
    else dt match {
      case StringType => v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)
      case IntegerType => ByteBuffer.allocate(4).putInt(v.asInstanceOf[Int]).array()
      case LongType => ByteBuffer.allocate(8).putLong(v.asInstanceOf[Long]).array()
      case DoubleType => ByteBuffer.allocate(8).putDouble(v.asInstanceOf[Double]).array()
      case other => throw new IllegalArgumentException(s"no cell codec for $other")
    }

  /** Width check matching HBase `Bytes.toInt/toLong/toDouble` semantics:
    * those throw on a wrong-width cell, and so do we — silently reading
    * the high 4 bytes of a long-encoded cell as an int would decode
    * every small positive long as 0 (corrupt data, not an error).
    */
  private def requireWidth(dt: DataType, b: Array[Byte], n: Int): Unit =
    require(b.length == n,
      s"cell is ${b.length} bytes but $dt decodes exactly $n — the " +
        "caller's schema width disagrees with the writer's")

  def decodeCell(dt: DataType, b: Array[Byte]): Any =
    if (b == null) null
    else dt match {
      case StringType => new String(b, StandardCharsets.UTF_8)
      case IntegerType =>
        requireWidth(dt, b, 4); ByteBuffer.wrap(b).getInt
      case LongType =>
        requireWidth(dt, b, 8); ByteBuffer.wrap(b).getLong
      case DoubleType =>
        requireWidth(dt, b, 8); ByteBuffer.wrap(b).getDouble
      case other => throw new IllegalArgumentException(s"no cell codec for $other")
    }

  /** Typed frame → one binary column per field (the keyed-store cell
    * layout a snapshot export produces). Schema must be flat and every
    * field codec-supported.
    */
  def encodeCells(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    val rdd = df.rdd.map { row =>
      Row.fromSeq(fields.indices.map(i =>
        encodeCell(fields(i).dataType, row.get(i))))
    }
    df.sparkSession.createDataFrame(rdd,
      StructType(fields.map(f => StructField(f.name, BinaryType, nullable = true))))
  }

  /** Binary-cell frame → typed frame via per-column converters and an
    * explicit schema — the `createDataFrame(rdd, schema)` lift itself.
    */
  def decodeTyped(spark: SparkSession, cells: DataFrame,
                  schema: StructType): DataFrame = {
    val fields = schema.fields
    val idx = cells.schema.fieldNames.zipWithIndex.toMap
    val rdd = cells.rdd.map { row =>
      Row.fromSeq(fields.map { f =>
        val i = idx(f.name)
        decodeCell(f.dataType, row.getAs[Array[Byte]](i))
      }.toSeq)
    }
    spark.createDataFrame(rdd, schema)
  }
}
