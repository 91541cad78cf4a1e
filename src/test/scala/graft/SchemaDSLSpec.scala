package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.schema.SchemaDSL

/** Schema DSL strings from the reference tests (suite:74,1896,1949,1968,
  * tests/slide_pandas/test_utils.py:29-33).
  */
class SchemaDSLSpec extends AnyFunSuite {

  test("flat schema") {
    assert(SchemaDSL.parse("a:str,b:long") === StructType(Seq(
      StructField("a", StringType), StructField("b", LongType))))
    assert(SchemaDSL.parse("x:int32,y:str") === StructType(Seq(
      StructField("x", IntegerType), StructField("y", StringType))))
  }

  test("datetime and date canonicalize") {
    val st = SchemaDSL.parse("a:datetime,b:date")
    assert(st("a").dataType === TimestampNTZType)
    assert(st("b").dataType === DateType)
  }

  test("array and nested struct") {
    assert(SchemaDSL.parse("a:[int]") === StructType(Seq(
      StructField("a", ArrayType(IntegerType)))))
    val nested = SchemaDSL.parse("a:[{a:str,b:[int]}]")
    assert(nested("a").dataType ===
      ArrayType(StructType(Seq(
        StructField("a", StringType),
        StructField("b", ArrayType(IntegerType))))))
  }

  test("decimal type") {
    assert(SchemaDSL.parse("d:decimal(12,2)")("d").dataType === DecimalType(12, 2))
    assert(SchemaDSL.render(SchemaDSL.parse("d:decimal(12,2)")) === "d:decimal(12,2)")
    intercept[GraftException](SchemaDSL.parse("d:decimal(12"))
  }

  test("map type") {
    assert(SchemaDSL.parse("m:<str,long>")("m").dataType ===
      MapType(StringType, LongType))
  }

  test("round trip") {
    val exprs = Seq("a:str,b:long", "a:[{a:str,b:[int]}]", "a:datetime,b:date",
      "a:bytes,b:bool,c:double", "m:<str,[int]>")
    exprs.foreach { e =>
      assert(SchemaDSL.render(SchemaDSL.parse(e)) === e)
    }
  }

  test("errors") {
    intercept[GraftException](SchemaDSL.parse("a:nosuch"))
    intercept[GraftException](SchemaDSL.parse("a:"))
    intercept[GraftException](SchemaDSL.parse("a:int,"))
    intercept[GraftException](SchemaDSL.parse("a:[int"))
  }
}
