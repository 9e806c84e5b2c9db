package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

class RiverSchemaSpec extends AnyFunSuite {

  private val full = RiverSchema(Seq(
    RiverField("d", RiverType.Double64),
    RiverField("f", RiverType.Float32),
    RiverField("s", RiverType.Int16),
    RiverField("i", RiverType.Int32),
    RiverField("l", RiverType.Int64),
    RiverField("b", RiverType.FixedWidthBytes(3))))

  test("json round trip preserves fields and wire names") {
    val j = full.toJson
    assert(j.contains(""""type":"DOUBLE""""))
    assert(j.contains(""""field_definitions""""))
    assert(RiverSchema.fromJson(j) == full)
  }

  test("wire format matches the reference shape") {
    val s = RiverSchema(Seq(RiverField("col1", RiverType.Double64)))
    assert(s.toJson ==
      """{"field_definitions":[{"name":"col1","size":8,"type":"DOUBLE"}]}""")
  }

  test("parse decodes JSON short escapes in field names") {
    // the reference serializes schemas with a standard JSON library that
    // emits \n \t \b \f \r (and possibly \/) for control characters in
    // names — they must decode to the characters, not backslash+letter
    val j = """{"field_definitions":[""" +
      """{"name":"a\nb\tc\bd\fe\rf\/g\"h\\i","size":8,"type":"INT64"}]}"""
    assert(RiverSchema.fromJson(j) == RiverSchema(Seq(
      RiverField("a\nb\tc\bd\fe\rf/g\"h\\i", RiverType.Int64))))
  }

  test("parse tolerates size as string (reference schema.cpp:57-61)") {
    val j = """{"field_definitions":[{"name":"x","size":"8","type":"INT64"}]}"""
    assert(RiverSchema.fromJson(j) ==
      RiverSchema(Seq(RiverField("x", RiverType.Int64))))
  }

  test("variable-width must be the only field") {
    intercept[IllegalArgumentException] {
      RiverSchema(Seq(
        RiverField("v", RiverType.VariableWidthBytes(10)),
        RiverField("d", RiverType.Double64)))
    }
    // alone is fine
    RiverSchema(Seq(RiverField("v", RiverType.VariableWidthBytes(10))))
  }

  test("sample size is the packed struct size") {
    assert(full.sampleSize == 8 + 4 + 2 + 4 + 8 + 3)
  }

  test("struct type bridge: non-nullable spark fields both ways") {
    val st = full.toStructType
    assert(st.fields.forall(!_.nullable))
    assert(st("d").dataType == DoubleType)
    assert(st("s").dataType == ShortType)
    val back = RiverSchema.fromStructType(StructType(st.fields.filter(_.name != "b")))
    assert(back.fields.map(_.name) == Seq("d", "f", "s", "i", "l"))
  }

  test("row codec round trips every type") {
    val codec = new RowCodec(full)
    val row = Seq[Any](1.5d, 2.5f, 3.toShort, 4, 5L, Array[Byte](9, 8, 7))
    val packed = codec.pack(row)
    assert(packed.length == full.sampleSize)
    val out = codec.unpack(packed)
    assert(out.take(5) == row.take(5))
    assert(out(5).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](9, 8, 7))
  }

  test("row codec variable width passes bytes through with max check") {
    val vw = RiverSchema(Seq(RiverField("v", RiverType.VariableWidthBytes(4))))
    val codec = new RowCodec(vw)
    assert(codec.pack(Seq(Array[Byte](1, 2))).toSeq == Seq[Byte](1, 2))
    intercept[IllegalArgumentException] {
      codec.pack(Seq(Array[Byte](1, 2, 3, 4, 5)))
    }
  }
}
