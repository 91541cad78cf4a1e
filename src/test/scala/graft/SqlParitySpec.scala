package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The SQL text surface and the DataFrame surface must agree: the same
  * query expressed both ways produces identical results (one Catalyst
  * plan space underneath).
  */
class SqlParitySpec extends SparkSpec {

  test("q1 via spark.sql equals q1 via the DataFrame registry") {
    Tables.all.foreach { t =>
      Tables.load(spark, sf, t).createOrReplaceTempView(t)
    }
    val viaSql = spark.sql("""
      SELECT l_returnflag, l_linestatus,
        SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
        COUNT(*) AS cnt
      FROM lineitem WHERE l_shipdate <= '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """).collect().map(_.toSeq)
    val viaDf = Tables.load(spark, sf, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect().map(_.toSeq)
    assert(viaSql.toSeq === viaDf.toSeq)
    assert(viaSql.nonEmpty)
  }

  test("registry queries run identically when re-invoked (stable plans)") {
    val name = "q1_pricing_summary"
    val a = SparkEntry.queries(name)(spark, sf).collect().map(_.toSeq).toSeq
    val b = SparkEntry.queries(name)(spark, sf).collect().map(_.toSeq).toSeq
    assert(a === b)
  }
}
