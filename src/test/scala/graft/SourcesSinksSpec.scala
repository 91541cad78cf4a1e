package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Source/sink behavior: partitioned writes, partition pruning, and the
  * interchange surface (the reference's as_array_iterable / as_arrow maps
  * to toLocalIterator / collect — SURVEY §2.4).
  */
class SourcesSinksSpec extends SparkSpec {

  test("partitioned parquet sink round-trips and prunes partitions") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val orders = Tables.load(spark, sf, "orders")
    orders.write.mode("overwrite").partitionBy("o_orderpriority")
      .parquet(s"$dir/orders_part")
    val back = spark.read.parquet(s"$dir/orders_part")
    assert(back.count() === orders.count())
    // partition-pruned read: the filter must reach the file index, so the
    // plan reads only one directory
    val pruned = back.filter(col("o_orderpriority") === "1-URGENT")
    val expected = orders.filter(col("o_orderpriority") === "1-URGENT").count()
    assert(pruned.count() === expected)
    val scanDesc = pruned.queryExecution.executedPlan.toString
    assert(!scanDesc.contains("2-HIGH"), "partition pruning failed (read other partitions)")
  }

  test("row-iterable interchange (as_array_iterable analog)") {
    val region = Tables.load(spark, sf, "region")
    val viaIterator = region.toLocalIterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(viaIterator)
      .asScala.map(_.getAs[String]("r_name")).toSet
    assert(names === region.collect().map(_.getAs[String]("r_name")).toSet)
    assert(names.nonEmpty)
  }

  test("csv and json sinks/sources round-trip with declared schema") {
    val dir = Files.createTempDirectory("graft_fmt").toString
    val nation = Tables.load(spark, sf, "nation")
    nation.write.mode("overwrite").option("header", "true").csv(s"$dir/nation_csv")
    nation.write.mode("overwrite").json(s"$dir/nation_json")
    val csvBack = spark.read.option("header", "true")
      .schema(nation.schema).csv(s"$dir/nation_csv")
    val jsonBack = spark.read.schema(nation.schema).json(s"$dir/nation_json")
    assert(csvBack.collect().map(_.toSeq).toSet === nation.collect().map(_.toSeq).toSet)
    assert(jsonBack.collect().map(_.toSeq).toSet === nation.collect().map(_.toSeq).toSet)
  }
}
