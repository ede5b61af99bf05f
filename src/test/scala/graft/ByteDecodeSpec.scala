package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.ByteDecode

class ByteDecodeSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("n", IntegerType),
    StructField("name", StringType), StructField("bal", DoubleType)))

  test("cell codecs match HBase Bytes conventions") {
    // big-endian two's-complement ints
    assert(ByteDecode.encodeCell(IntegerType, 1).toSeq ==
      Seq[Byte](0, 0, 0, 1))
    assert(ByteDecode.encodeCell(IntegerType, -1).toSeq ==
      Seq[Byte](-1, -1, -1, -1))
    assert(ByteDecode.encodeCell(LongType, 258L).toSeq ==
      Seq[Byte](0, 0, 0, 0, 0, 0, 1, 2))
    // UTF-8 strings
    assert(ByteDecode.encodeCell(StringType, "héllo").toSeq ==
      "héllo".getBytes("UTF-8").toSeq)
    // IEEE-754 big-endian doubles round-trip bit-exactly
    for (d <- Seq(0.0, -0.0, 1.5, -273.15, Double.MaxValue,
        Double.MinPositiveValue)) {
      val back = ByteDecode.decodeCell(DoubleType,
        ByteDecode.encodeCell(DoubleType, d)).asInstanceOf[Double]
      assert(java.lang.Double.doubleToRawLongBits(back) ==
        java.lang.Double.doubleToRawLongBits(d))
    }
  }

  test("decodeCell rejects wrong-width cells like HBase Bytes does") {
    import org.apache.spark.sql.types._
    val longCell = ByteDecode.encodeCell(LongType, 5L)
    // reading a long cell as int must throw, not decode the high half as 0
    intercept[IllegalArgumentException] {
      ByteDecode.decodeCell(IntegerType, longCell)
    }
    intercept[IllegalArgumentException] {
      ByteDecode.decodeCell(LongType, ByteDecode.encodeCell(IntegerType, 5))
    }
    intercept[IllegalArgumentException] {
      ByteDecode.decodeCell(DoubleType, Array[Byte](1, 2, 3))
    }
    assert(ByteDecode.decodeCell(LongType, longCell) == 5L)
  }

  test("encodeCells → decodeTyped round-trips rows, schema and NULL cells") {
    val rows = Seq(
      Row(1L, 42, "alpha", 10.25),
      Row(2L, null, "βeta", -0.5),
      Row(3L, 7, null, null))
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val cells = ByteDecode.encodeCells(src)
    assert(cells.schema.fields.forall(_.dataType == BinaryType))
    val back = ByteDecode.decodeTyped(spark, cells, schema)
    assert(back.schema == schema)
    assert(back.orderBy("id").collect().toSeq == rows)
  }

  test("decodeTyped resolves cells by NAME, not position") {
    val rows = Seq(Row(5L, 1, "x", 2.0))
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    // scramble the binary-cell column order; the decode must realign
    val cells = ByteDecode.encodeCells(src)
      .select("bal", "id", "n", "name")
    val back = ByteDecode.decodeTyped(spark, cells, schema)
    assert(back.collect().toSeq == rows)
  }
}
