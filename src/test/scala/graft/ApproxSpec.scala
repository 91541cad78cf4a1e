package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Tables

/** Approximate aggregates (HLL / quantile sketches) and the skew-salting
  * operator — behaviors with no exact SQL oracle.
  */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact") {
    val l = Tables.load(spark, sf, "lineitem")
    val exact = l.select(countDistinct("l_partkey")).head().getLong(0)
    val approx = l.select(approx_count_distinct("l_partkey", 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact median") {
    val l = Tables.load(spark, sf, "lineitem")
    val approxMed = l.select(
      percentile_approx(col("l_quantity"), lit(0.5), lit(1000))).head().getDouble(0)
    val sorted = l.select("l_quantity").collect().map(_.getDouble(0)).sorted
    val exactMed = sorted(sorted.length / 2)
    assert(math.abs(approxMed - exactMed) <= 2.0, s"approx=$approxMed exact=$exactMed")
  }

  test("salted join equals unsalted join") {
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_custkey").as("k"), col("o_orderkey"))
    val c = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("k"), col("c_name"))
    val salted = Skew.saltedJoin(o, c, Seq("k"), salt = 8)
      .collect().map(_.toSeq).toSet
    val plain = o.join(c, Seq("k")).collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(salted.nonEmpty)
  }

  test("salted left join preserves unmatched probe rows") {
    import spark.implicits._
    val probe = Seq((1L, "a"), (2L, "b"), (99L, "c")).toDF("k", "v")
    val build = Seq((1L, "x"), (2L, "y")).toDF("k", "w")
    val res = Skew.saltedJoin(probe, build, Seq("k"), salt = 4, joinType = "left")
      .collect().map(_.toSeq).toSet
    assert(res === Set(Seq(1L, "a", "x"), Seq(2L, "b", "y"), Seq(99L, "c", null)))
  }
}
