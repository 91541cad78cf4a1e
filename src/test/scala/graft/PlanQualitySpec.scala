package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Physical-plan shape guards: the properties that make these queries
  * survive scale must stay visible in the plan (catching regressions that
  * correctness tests can't).
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("filters and column pruning reach the parquet scan (q1)") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushed filter in:\n$p")
    // pruned read schema: only the 7 needed columns, not all 11
    assert(!p.contains("l_partkey"), "scan reads unneeded columns")
  }

  test("dimension joins broadcast (q5)") {
    val p = plan("q5_local_supplier")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort (s1)") {
    val p = plan("s1_orderby_limit")
    assert(p.contains("TakeOrderedAndProject"), s"no TakeOrderedAndProject in:\n$p")
  }

  test("semi join stays a semi join (r2_join_semi)") {
    val p = plan("r2_join_semi")
    assert(p.contains("LeftSemi"), s"no LeftSemi in:\n$p")
  }

  test("LSH pair search is a bucket equi-join, never a cartesian (dd5)") {
    val p = plan("dd5_embed_cosine")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"cartesian in dd5:\n$p")
  }

  test("containment probe side broadcasts; no cartesian (cc3)") {
    val p = plan("cc3_containment")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in cc3:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in cc3:\n$p")
  }

  test("bottom-k quantile sketch uses heaps, not a global value sort (sk8)") {
    val p = plan("sk8_quantile_sketch")
    assert(p.contains("TakeOrderedAndProject"),
      s"no TakeOrderedAndProject in sk8:\n$p")
  }

  test("q18: clustered agg + top-k pushdown survive in the plan") {
    val p = plan("q18_big_orders")
    // the verified layout elides the aggregate exchange (AssumeClustered
    // between scan and HashAggregate); a fallback here is a regression
    // at this fixture (sorted single-partition lineitem always verifies)
    assert(p.contains("AssumeClustered"), s"clustered agg fell back:\n$p")
    // top-100 commuted below the key-preserving join: the broadcast
    // build side must itself be a TakeOrderedAndProject (k rows), not a
    // full hash relation over the HAVING side
    val bi = p.indexOf("BroadcastExchange")
    assert(bi >= 0 && p.indexOf("TakeOrderedAndProject", bi) >= 0,
      s"no top-k below the broadcast probe:\n$p")
  }

  test("semDedup candidates come from a cluster-key equi-join (dd11)") {
    val p = plan("dd11_semdedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"cartesian in dd11:\n$p")
    assert(p.contains("LeftAnti"), s"retention is not an anti-join:\n$p")
  }

  test("scalar subqueries live inside one plan (q15/q11)") {
    // the 1-row aggregate must appear as a subtree (broadcast side),
    // not as a separate driver-side job
    val p15 = plan("q15_top_supplier")
    assert(p15.contains("BroadcastHashJoin") || p15.contains("BroadcastExchange"),
      s"q15 lost its broadcast scalar:\n$p15")
    val p11 = plan("q11_important_parts")
    assert(p11.contains("BroadcastNestedLoopJoin") || p11.contains("BroadcastExchange"),
      s"q11 lost its broadcast scalar:\n$p11")
  }

  test("double-correlated existence stays semi/anti (q21)") {
    val p = plan("q21_last_shipper")
    assert(p.contains("LeftSemi"), s"no LeftSemi in q21:\n$p")
    assert(p.contains("LeftAnti"), s"no LeftAnti in q21:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"q21 sorts globally:\n$p")
  }

  test("interval join is an equi-join with range residual, not a cross (st6)") {
    val p = plan("st6_view_attribution")
    assert(!p.contains("CartesianProduct"), s"cartesian in st6:\n$p")
  }

  test("hot paths stay inside whole-stage codegen (q1, ss1, tx2)") {
    // the scan→expression→aggregate pipeline must fuse: a codegen break
    // (interpreted expression, UDF) would show as a missing span. AQE
    // only materializes codegen nodes in the FINAL plan, so execute
    // first, then inspect.
    Seq("q1_pricing_summary", "ss1_cosine_topk", "tx2_quality").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // the simpleString renders WholeStageCodegen spans as "*(n) "
      assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined,
        s"$q runs interpreted:\n$p")
    }
  }

  test("sketch pass is partial-aggregated; recount is a broadcast semi " +
    "join (sk1)") {
    // pass 1: the MG sketch must partial-aggregate (one k-entry buffer
    // per partition into a single-partition merge) — a hash exchange on
    // the key column here would mean the key space shuffles, the exact
    // thing the sketch exists to avoid
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_partkey").cast("string").as("k"))
    import spark.implicits._
    val sketch = li.as[String]
      .select(new graft.operators.Sketches.MisraGries(100).toColumn)
    val sp = sketch.queryExecution.executedPlan.toString
    assert(sp.contains("ObjectHashAggregate") || sp.contains("SortAggregate"),
      s"no object aggregate in sketch pass:\n$sp")
    assert(sp.contains("Exchange SinglePartition"),
      s"sketch pass missing the single-partition merge:\n$sp")
    assert(!sp.contains("hashpartitioning"),
      s"sketch pass shuffles the key space:\n$sp")
    // pass 2: candidates are broadcast, the probe is a semi join, and
    // the final count partial-aggregates before its exchange
    val p = plan("sk1_heavy_hitters")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"recount is not a broadcast semi join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"recount shuffles:\n$p")
  }

  test("simhash pipeline has no all-pairs stage (dd3)") {
    val p = plan("dd3_simhash")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs node in dd3:\n$p")
  }

  test("interval-overlap join is a bin equi-join (rj3)") {
    val p = plan("rj3_interval_overlap")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"nested-loop node in rj3:\n$p")
  }

  test("shard packing is one window, no extra exchange (cur3)") {
    val p = plan("cur3_token_budget_pack")
    // one hash-partitioning exchange for the window's partition key plus
    // the final order — never a per-row join or nested loop
    assert(p.contains("Window"), s"no window in cur3:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("Join"),
      s"unexpected join in cur3:\n$p")
  }

  test("split audit is a single aggregation pass (s4)") {
    val p = plan("s4_three_way_split")
    assert(p.contains("HashAggregate"), s"no hash aggregate in s4:\n$p")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"unexpected join in s4:\n$p")
  }

  test("partition-local kernels produce no shuffle before banding (dd2)") {
    // r18: the signature kernel may be preceded by ONE deterministic
    // whole-row-hash fan-out exchange (REPARTITION_BY_NUM — the
    // small-input parallelizer, a no-op at real scale); shingle-grain
    // or key-grain shuffles stay forbidden.
    val bands = graft.operators.Dedup.minHashBands(
      Tables.load(spark, sf, "documents"), "doc_id", "text")
    val p = bands.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 1, s"more than the fan-out exchange in signature stage:\n$p")
    if (exchanges == 1)
      assert(p.contains("REPARTITION_BY_NUM"),
        s"non-fan-out shuffle in signature stage:\n$p")
  }

  test("partition-column filter prunes hive partitions at planning time (hp1)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = SparkEntry.queries("hp1_partition_prune")(spark, sf)
    // under AQE the executedPlan is an AdaptiveSparkPlanExec holder whose
    // tree-collect never reaches the scan — inspect the pre-adaptive
    // physical plan, where partitionFilters/selectedPartitions live
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no file scan in hp1 plan")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"no PartitionFilters on the partitioned scan:\n${df.queryExecution.executedPlan}")
    // only the lang=en directory may survive pruning — fewer partitions
    // read than exist in the dataset
    val selected = scan.selectedPartitions.partitionCount
    val total = Tables.documentsByLang(spark, sf)
      .select("lang").distinct().count()
    assert(selected == 1 && total > 1,
      s"pruning read $selected of $total partitions (want 1 of >1)")
  }

  test("bucketed tables join without a shuffle") {
    val db = spark
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    // the in-memory catalog forgets tables between JVM runs but the
    // warehouse directories persist — clear the physical locations too
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("orders_b", "customer_b").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$wh/$t"))
    }
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")
    val j = spark.table("orders_b")
      .join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
    val p = j.queryExecution.executedPlan.toString
    assert(!p.contains("ShuffleExchange") && !p.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$p")
    assert(j.count() === orders.join(customer,
      orders("o_custkey") === customer("c_custkey")).count())
  }

  test("resample: no raw-row shuffle — every events scan is pre-combined " +
    "map-side (ts1)") {
    // Catalyst splits the grid-span branch off with its own collapsed
    // min/max aggregate (2-column pruned scan) rather than sharing the
    // (key,bucket) aggregate — so there are two scans, but EVERY scan
    // must be reduced to per-key partials before anything shuffles:
    // what crosses the wire is never raw rows.
    val df = SparkEntry.queries("ts1_resample_linear")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_sum") && p.contains("partial_min"),
      s"a branch shuffles raw rows (no map-side combine):\n$p")
    // pruned reads: the span branch must not drag the value column. The
    // property is "2-column pruned scan", NOT the timestamp's physical
    // encoding — the harness has shipped events.ts as both NANOS (read
    // as bigint) and MICROS (read as timestamp/timestamp_ntz), and the
    // guard must hold for whichever layout is on disk.
    assert("ReadSchema: struct<ts:(bigint|timestamp(_ntz)?),user_id:bigint>".r
      .findFirstIn(p).isDefined,
      s"span scan reads more than (ts, user_id):\n$p")
    // the fill windows reuse the key partitioning: Window is fed by a
    // partition-local sort, not another exchange
    val lines = p.linesIterator.toVector
    val wi = lines.indexWhere(_.contains("Window"))
    assert(wi >= 0 && lines(wi + 1).contains("Sort") &&
      lines(wi + 1).contains("false, 0"),
      s"window not fed by a partition-local sort:\n$p")
  }

  test("iterative graph loop stays flat under the localCheckpoint barrier " +
    "(gr3 kernel, 50 iterations)") {
    // A 50-round web-graph PageRank must not grow the logical plan with
    // the iteration count: each round ends in localCheckpoint, so the
    // next round's lineage starts from a LogicalRDD of constant size.
    // Swapping the checkpoint for cache() keeps correctness but grows
    // the plan ~3x per round (exponential) and OOMs the optimizer near
    // 15 rounds — the regression this guard exists to catch.
    import spark.implicits._
    val edges = (0 until 12).flatMap { i =>
      val a = f"n$i%02d"; val b = f"n${(i + 1) % 12}%02d"
      Seq((a, b), (b, a))
    }.toDF("src", "dst").localCheckpoint()
    def planNodes(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect { case n => n }.size
    val r10 = queries.GraphOps.pagerankRanks(edges, 10)
    val r50 = queries.GraphOps.pagerankRanks(edges, 50)
    assert(planNodes(r50) == planNodes(r10),
      s"plan grew with iterations: ${planNodes(r10)} -> ${planNodes(r50)}")
    assert(r50.count() == 12)
  }
}
