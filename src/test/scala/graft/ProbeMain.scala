package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.schema.SchemaDSL
import graft.functions.SqlCast
import graft.operators.Frame

/** Manual smoke probe for the library surface (run via Test/runMain). */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // schema DSL round-trip + error path
    println("parse: " + SchemaDSL.parse("a:str,b:[{x:int,y:[long]}],c:datetime"))
    println("render: " + SchemaDSL.render(SchemaDSL.parse("a:str,b:[{x:int}]")))
    try { SchemaDSL.parse("a:nosuch"); println("BAD: no error") }
    catch { case e: GraftException => println("schema error ok: " + e.getMessage) }

    // blocked cast must throw at plan time
    try {
      SqlCast.to(col("ts"), TimestampNTZType, IntegerType); println("BAD: ts->int allowed")
    } catch { case e: GraftCastException => println("blocked cast ok: " + e.getMessage) }

    // divergent cast cells vs Spark defaults
    val df = Seq("1.1", "naN", "true", "1.0", "x").toDF("s")
    val out = df.select(
      col("s"),
      SqlCast.to(col("s"), StringType, LongType).as("as_long"),
      SqlCast.to(col("s"), StringType, BooleanType).as("as_bool"),
      SqlCast.to(col("s"), StringType, DoubleType).as("as_double"))
    out.show()
    // 'inf' parses as a float for double targets...
    Seq("inf", "-Infinity", "nan").toDF("s")
      .select(SqlCast.to(col("s"), StringType, DoubleType).as("as_double")).show()
    // ...but raises for integral targets (ref suite:1479-1488)
    try {
      Seq("inf").toDF("s").select(SqlCast.to(col("s"), StringType, LongType)).collect()
      println("BAD: 'inf'->long did not raise")
    } catch { case e: Exception => println("'inf'->long raises ok") }

    // float->int inf must raise at runtime
    try {
      Seq(Double.PositiveInfinity).toDF("d")
        .select(SqlCast.to(col("d"), DoubleType, LongType)).collect()
      println("BAD: inf->int did not raise")
    } catch { case e: Exception => println("inf->int raises ok: " + e.getMessage.take(120)) }

    // Frame filter truthiness on string must be rejected
    try {
      Frame(Seq("a").toDF("s")).filter(col("s")); println("BAD: string truthy allowed")
    } catch { case e: GraftException => println("string truthy rejected ok") }

    // Arrow interchange round-trip smoke
    val arrowSrc = Seq((1L, "x", Seq(1, 2)), (2L, null, Seq.empty[Int]))
      .toDF("id", "s", "arr")
    val arrowBytes = Frame(arrowSrc).toArrowStream
    val arrowBack = graft.operators.ArrowInterchange.fromStream(spark, arrowBytes)
    println("arrow roundtrip ok: " +
      (arrowBack.schema == arrowSrc.schema &&
        arrowBack.collect().map(_.toSeq).toSet == arrowSrc.collect().map(_.toSeq).toSet))

    // rename swap in one pass
    val swapped = Frame(Seq((1L, "v")).toDF("k", "v"))
      .rename("k" -> "v", "v" -> "k").df.columns.toSeq
    println("rename swap ok: " + (swapped == Seq("v", "k")))

    spark.stop()
  }
}
