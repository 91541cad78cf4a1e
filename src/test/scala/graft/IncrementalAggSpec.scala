package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.operators.IncrementalAgg
import graft.operators.IncrementalAgg.AggSpec
import graft.sources.Tables

/** Incremental aggregate maintenance: refresh(aggregate(base), delta)
  * must equal aggregate(base ∪ delta), for shared, base-only and
  * delta-only groups — and the refresh plan must never read the base
  * fact files (the whole point at 100 TB).
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")
  private val aggs = Seq(AggSpec("v", "sum", "v_sum"),
    AggSpec("v", "count", "v_cnt"),
    AggSpec("v", "min", "v_min"), AggSpec("v", "max", "v_max"))

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("refresh equals full recompute; base-only, delta-only, shared and NULL groups") {
    val base = Seq(("a", 1L), ("a", 4L), ("b", 10L), (null, 7L))
      .toDF("k", "v")
    val delta = Seq(("a", 2L), ("c", 100L), (null, 3L))
      .toDF("k", "v")
    val stored = IncrementalAgg.aggregate(base, keys, aggs)
    val refreshed = IncrementalAgg.refresh(stored, delta, keys, aggs)
    val full = IncrementalAgg.aggregate(base.unionByName(delta), keys, aggs)
    assert(rows(refreshed) === rows(full))
    // spot-check the fold: shared group a = 1+4+2
    val a = refreshed.filter(col("k") === "a").head()
    assert(a.getLong(1) === 7L && a.getLong(2) === 3L &&
      a.getLong(3) === 1L && a.getLong(4) === 4L)
  }

  test("NULL measures: count skips them, sum of an all-NULL group stays NULL") {
    val base = Seq(("a", Some(1L)), ("n", None)).toDF("k", "v")
    val delta = Seq(("n", Option.empty[Long])).toDF("k", "v")
    val refreshed = IncrementalAgg.refresh(
      IncrementalAgg.aggregate(base, keys, aggs), delta, keys, aggs)
    val full = IncrementalAgg.aggregate(base.unionByName(delta), keys, aggs)
    assert(rows(refreshed) === rows(full))
    val n = refreshed.filter(col("k") === "n").head()
    assert(n.isNullAt(1) && n.getLong(2) === 0L)
  }

  test("empty delta and empty base are identities") {
    val facts = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val none = facts.limit(0)
    val stored = IncrementalAgg.aggregate(facts, keys, aggs)
    assert(rows(IncrementalAgg.refresh(stored, none, keys, aggs)) === rows(stored))
    val fromEmpty = IncrementalAgg.refresh(
      IncrementalAgg.aggregate(none, keys, aggs), facts, keys, aggs)
    assert(rows(fromEmpty) === rows(stored))
  }

  test("refresh is re-storable: a second day folds onto the first refresh") {
    val li = Tables.load(spark, sf, "lineitem").select(col("l_partkey").as("k"),
      round(col("l_extendedprice") * 100).cast("long").as("v"))
    val Array(d0, d1, d2) = li.randomSplit(Array(0.5, 0.3, 0.2), seed = 7)
    val day2 = IncrementalAgg.refresh(
      IncrementalAgg.refresh(IncrementalAgg.aggregate(d0, keys, aggs), d1, keys, aggs),
      d2, keys, aggs)
    assert(rows(day2) === rows(IncrementalAgg.aggregate(li, keys, aggs)))
  }

  test("refresh plan reads only the stored aggregate and the delta files") {
    val tmp = java.nio.file.Files.createTempDirectory("incragg").toString
    val li = Tables.load(spark, sf, "lineitem").select(col("l_partkey").as("k"),
      round(col("l_extendedprice") * 100).cast("long").as("v"))
    li.filter(col("k") % 2 === 0).write.parquet(s"$tmp/basefacts")
    li.filter(col("k") % 2 === 1).write.parquet(s"$tmp/delta")
    IncrementalAgg.aggregate(spark.read.parquet(s"$tmp/basefacts"), keys, aggs)
      .write.parquet(s"$tmp/storedagg")

    val refreshed = IncrementalAgg.refresh(spark.read.parquet(s"$tmp/storedagg"),
      spark.read.parquet(s"$tmp/delta"), keys, aggs)
    // under AQE the executedPlan wrapper hides the scans — inspect the
    // pre-adaptive physical plan, where the file listings live
    val scanned = refreshed.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }.flatMap(_.relation.location.inputFiles)
    assert(scanned.nonEmpty)
    assert(!scanned.exists(_.contains("basefacts")),
      s"refresh must not rescan base facts; scanned: ${scanned.mkString(", ")}")
    assert(rows(refreshed) === rows(IncrementalAgg.aggregate(li, keys, aggs)))
  }
}
