package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.SqlCast

/** Cast-matrix conformance transcribed from the reference suite
  * (slide_test/suite.py:1119-1832). Each block mirrors a fixture verbatim.
  */
class SqlCastSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def one[T](from: DataType, to: DataType, v: Any): Any = {
    val df = spark.createDataFrame(
      java.util.List.of(Row(v)),
      StructType(Seq(StructField("a", from, nullable = true))))
    df.select(SqlCast.to(col("a"), from, to).as("r")).head().get(0)
  }

  test("bool source: to int/float/bool/str (suite:1205-1257)") {
    assert(one(BooleanType, LongType, true) === 1L)
    assert(one(BooleanType, LongType, false) === 0L)
    assert(one(BooleanType, LongType, null) === null)
    assert(one(BooleanType, DoubleType, true) === 1.0)
    assert(one(BooleanType, StringType, true) === "true")
    assert(one(BooleanType, StringType, false) === "false")
    assert(one(BooleanType, StringType, null) === null)
  }

  test("float source: to bool with NaN→NULL (suite:1259-1276)") {
    assert(one(DoubleType, BooleanType, 2.0) === true)
    assert(one(DoubleType, BooleanType, 0.0) === false)
    assert(one(DoubleType, BooleanType, -2.0) === true)
    assert(one(DoubleType, BooleanType, null) === null)
    assert(one(DoubleType, BooleanType, Double.NaN) === null)
  }

  test("string source: to bool accept-list (suite:1324-1351)") {
    for (v <- Seq("true", "True", "TRUE", "1", "1.0")) {
      assert(one(StringType, BooleanType, v) === true, v)
    }
    for (v <- Seq("false", "False", "0", "0.0")) {
      assert(one(StringType, BooleanType, v) === false, v)
    }
    for (v <- Seq("yes", "no", "t", "f", "2", "x", "")) {
      assert(one(StringType, BooleanType, v) === null, v)
    }
  }

  test("string source: to int via double, truncation (suite:1437-1455)") {
    assert(one(StringType, LongType, "1.1") === 1L)
    assert(one(StringType, LongType, "-2.7") === -2L)
    assert(one(StringType, LongType, "naN") === null)
    assert(one(StringType, LongType, "x") === null)
    assert(one(StringType, IntegerType, "1.1") === 1)
  }

  test("string source: to float with inf/nan forms (suite:1541-1559)") {
    assert(one(StringType, DoubleType, "inf") === Double.PositiveInfinity)
    assert(one(StringType, DoubleType, "-Infinity") === Double.NegativeInfinity)
    assert(one(StringType, DoubleType, "naN") === null)
    assert(one(StringType, DoubleType, "2.1") === 2.1)
  }

  test("float source: to int errors on infinity (suite:1479-1488)") {
    intercept[Exception](one(DoubleType, LongType, Double.PositiveInfinity))
    intercept[Exception](one(StringType, LongType, "inf"))
    assert(one(DoubleType, LongType, 2.7) === 2L)
    assert(one(DoubleType, LongType, -2.7) === -2L)
    assert(one(DoubleType, LongType, Double.NaN) === null)
  }

  test("float source: to string, inf forms and NaN→NULL (suite:1561-1620)") {
    assert(one(DoubleType, StringType, 10.0) === "10.0")
    assert(one(DoubleType, StringType, Double.PositiveInfinity) === "inf")
    assert(one(DoubleType, StringType, Double.NegativeInfinity) === "-inf")
    assert(one(DoubleType, StringType, Double.NaN) === null)
  }

  test("datetime: parse, invalid→NULL, truncate, render (suite:1708-1794)") {
    val ts = one(StringType, TimestampNTZType, "2020-01-01 15:16:17")
    assert(ts.toString === "2020-01-01T15:16:17")
    assert(one(StringType, TimestampNTZType, "bad") === null)
    assert(one(TimestampNTZType, StringType,
      java.time.LocalDateTime.of(2020, 1, 1, 15, 0, 0)) === "2020-01-01 15:00:00")
    assert(one(TimestampNTZType, DateType,
      java.time.LocalDateTime.of(2020, 1, 1, 15, 0, 0)).toString === "2020-01-01")
  }

  test("narrow integral targets: byte/short via the same double path") {
    assert(one(StringType, ByteType, "1.9") === 1.toByte)
    assert(one(StringType, ShortType, "-2.7") === (-2).toShort)
    assert(one(DoubleType, ShortType, 300.7) === 300.toShort)
    assert(one(BooleanType, ByteType, true) === 1.toByte)
    assert(one(StringType, ByteType, "naN") === null)
  }

  test("parseType parses bare type expressions") {
    import graft.schema.SchemaDSL
    assert(SchemaDSL.parseType("[int]") === ArrayType(IntegerType))
    assert(SchemaDSL.parseType("{a:str,b:[long]}") === StructType(Seq(
      StructField("a", StringType), StructField("b", ArrayType(LongType)))))
    intercept[GraftException](SchemaDSL.parseType("[int]x"))
  }

  test("blocked cells throw at plan time (suite:1353-1362,1468-1477)") {
    intercept[GraftCastException](SqlCast.to(col("a"), TimestampNTZType, BooleanType))
    intercept[GraftCastException](SqlCast.to(col("a"), TimestampNTZType, LongType))
    intercept[GraftCastException](SqlCast.to(col("a"), DateType, DoubleType))
    intercept[GraftCastException](SqlCast.to(col("a"), BooleanType, TimestampNTZType))
    intercept[GraftCastException](SqlCast.to(col("a"), LongType, DateType))
  }
}
