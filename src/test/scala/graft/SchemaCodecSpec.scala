package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SchemaCodec

/** Mirrors the reference's BlockSchema string-codec semantics
  * (block/BlockSchema.java:58-78).
  */
class SchemaCodecSpec extends AnyFunSuite {

  test("scalar types parse to the SURVEY §1.3 mapping") {
    val s = SchemaCodec.parse("INT a, LONG b, STRING c, DOUBLE d, BOOLEAN e, BYTE f, FLOAT g, BYTES h")
    assert(s.fields.map(_.dataType).toSeq == Seq(
      IntegerType, LongType, StringType, DoubleType, BooleanType, ByteType, FloatType, BinaryType))
    assert(s.fieldNames.toSeq == Seq("a", "b", "c", "d", "e", "f", "g", "h"))
  }

  test("nested tuple / bag / map parse recursively") {
    val s = SchemaCodec.parse("TUPLE(INT x, STRING y) t, ARRAY<DOUBLE> arr, MAP<LONG> m, BAG<TUPLE(INT i)> bag")
    assert(s("t").dataType == StructType(Seq(StructField("x", IntegerType), StructField("y", StringType))))
    assert(s("arr").dataType == ArrayType(DoubleType))
    assert(s("m").dataType == MapType(StringType, LongType))
    assert(s("bag").dataType == ArrayType(StructType(Seq(StructField("i", IntegerType)))))
  }

  test("render is the codec inverse") {
    val str = "INT a, STRING b, ARRAY<DOUBLE> c, TUPLE(LONG x) t"
    assert(SchemaCodec.render(SchemaCodec.parse(str)) == str)
  }

  test("ENUM maps to string, CHARARRAY accepted") {
    assert(SchemaCodec.parse("ENUM e, CHARARRAY s").fields.forall(_.dataType == StringType))
  }
}
