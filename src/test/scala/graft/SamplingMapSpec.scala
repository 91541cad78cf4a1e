package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling
import graft.sources.Tables

/** Deterministic sampling invariants + MapType surface. */
class SamplingMapSpec extends SparkSpec {

  test("bucketSample is reproducible and partition-independent") {
    val orders = Tables.load(spark, sf, "orders")
    val a = Sampling.bucketSample(orders, xxhash64(col("o_orderkey")), 100, 10)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val b = Sampling.bucketSample(orders.repartition(7), xxhash64(col("o_orderkey")), 100, 10)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(a === b)
    // roughly the asked-for fraction (hash-uniform)
    val frac = a.size.toDouble / orders.count()
    assert(frac > 0.05 && frac < 0.15, s"fraction $frac")
    intercept[IllegalArgumentException](Sampling.bucketSample(orders, col("o_orderkey"), 10, 11))
  }

  test("stratifiedLimit caps every group deterministically") {
    val orders = Tables.load(spark, sf, "orders")
    val capped = Sampling.stratifiedLimit(
      orders, Seq("o_orderpriority"), Seq(col("o_orderkey")), 3)
    val counts = capped.groupBy("o_orderpriority").count()
      .collect().map(_.getLong(1))
    assert(counts.forall(_ <= 3))
    assert(!capped.columns.contains("_rn"))
  }

  test("MapType: construction, access, keys/values, schema DSL round-trip") {
    import spark.implicits._
    val df = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "k", "v")
      .select(col("id"), map(col("k"), col("v"), lit("extra"), lit(0L)).as("m"))
    val rows = df.select(
      col("id"),
      element_at(col("m"), "extra").as("extra"),
      map_keys(col("m")).as("ks"),
      size(col("m")).as("n")).collect()
    assert(rows.forall(_.getLong(1) === 0L))
    assert(rows.forall(_.getInt(3) === 2))
    // schema DSL describes the map column
    val dsl = graft.schema.SchemaDSL.render(
      org.apache.spark.sql.types.StructType(df.schema.filter(_.name == "m")))
    assert(dsl === "m:<str,long>")
  }
}
