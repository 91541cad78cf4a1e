package graft

import org.apache.spark.sql.functions._
import graft.functions.Aggregators
import graft.sources.Tables

/** case class at top level so the encoder needs no outer scope */
case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)

/** Typed Dataset[T] surface + custom Aggregators. */
class TypedApiSpec extends SparkSpec {

  test("Dataset[T] round-trip with typed transforms") {
    import spark.implicits._
    val ds = Tables.load(spark, sf, "nation").as[Nation]
    val names = ds.filter(_.n_regionkey == 0).map(_.n_name).collect().toSet
    val viaDf = Tables.load(spark, sf, "nation")
      .filter(col("n_regionkey") === 0)
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(names === viaDf)
    assert(names.nonEmpty)
  }

  test("WeightedMeanPermille: exact integer result, merge-order independent") {
    import spark.implicits._
    val data = Seq((100L, 1L), (200L, 3L), (300L, 0L), (50L, 6L))
    // Σ v·w = 100 + 600 + 0 + 300 = 1000; Σw = 10 → 100000 permille
    val agg = new Aggregators.WeightedMeanPermille
    val viaDs = data.toDS().select(agg.toColumn).head()
    assert(viaDs === 100L * 1000L)
    // empty → 0
    assert(agg.finish(agg.zero) === 0L)
    // different merge groupings agree
    val b1 = data.take(2).foldLeft(agg.zero)(agg.reduce)
    val b2 = data.drop(2).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(b1, b2)) === agg.finish(agg.merge(b2, b1)))
  }

  test("TopKMin: bounded buffer, correct across partitions") {
    import spark.implicits._
    val ds = spark.range(1000).map(i => (i * 7919) % 1000).repartition(8)
    val top = ds.select(new Aggregators.TopKMin(5).toColumn).head()
    assert(top === Seq(0L, 1L, 2L, 3L, 4L))
  }
}
