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

  test("orc sink/source round-trips with schema intact") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val customer = Tables.load(spark, sf, "customer")
    customer.write.mode("overwrite").orc(s"$dir/customer_orc")
    val back = spark.read.orc(s"$dir/customer_orc")
    assert(back.schema === customer.schema)
    assert(back.collect().map(_.toSeq).toSet ===
      customer.collect().map(_.toSeq).toSet)
  }

  test("bucketed tables co-locate the join: no Exchange in the plan") {
    // the 100 TB repeated-join layout: both sides bucketed+sorted on the
    // key make every future equi-join on it shuffle-free (SMJ reads
    // bucket i against bucket i). The plan must contain no Exchange.
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")
    val savedBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join exercises the bucketed sort-merge
      // path (at real scale both sides are far beyond any threshold)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ over buckets:\n$plan")
      val expected = Tables.load(spark, sf, "lineitem").join(
        Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
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
