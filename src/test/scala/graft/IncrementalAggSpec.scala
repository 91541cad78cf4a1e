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

  private val cAggs = Seq(AggSpec("v", "sum", "v_sum"),
    AggSpec("v", "count", "v_cnt"))

  private def publishedCounting(facts: DataFrame) =
    rows(IncrementalAgg.publishCounting(
      IncrementalAgg.aggregateCounting(facts, keys, cAggs), keys, cAggs))

  test("counting algebra: deletes, updates and inserts == full recompute") {
    val base = Seq(("a", Some(10L)), ("a", Some(20L)), ("b", Some(5L)),
      ("b", None), ("c", Some(7L))).toDF("k", "v")
    val stored = IncrementalAgg.aggregateCounting(base, keys, cAggs)
    // delete (a,10), update (b,5)->(b,8), insert (c,3)
    val deltas = Seq(("a", Some(10L), -1L), ("b", Some(5L), -1L),
      ("b", Some(8L), 1L), ("c", Some(3L), 1L)).toDF("k", "v", "_sign")
    val got = rows(IncrementalAgg.publishCounting(
      IncrementalAgg.refreshCounting(stored, deltas, keys, cAggs),
      keys, cAggs))
    val edited = Seq(("a", Some(20L)), ("b", Some(8L)), ("b", None),
      ("c", Some(7L)), ("c", Some(3L))).toDF("k", "v")
    assert(got === publishedCounting(edited))
  }

  test("counting algebra: a group retracted to zero rows vanishes") {
    val base = Seq(("a", Some(1L)), ("z", Some(9L)), ("z", None))
      .toDF("k", "v")
    val stored = IncrementalAgg.aggregateCounting(base, keys, cAggs)
    val deltas = Seq(("z", Some(9L), -1L), ("z", Option.empty[Long], -1L))
      .toDF("k", "v", "_sign")
    val out = IncrementalAgg.publishCounting(
      IncrementalAgg.refreshCounting(stored, deltas, keys, cAggs),
      keys, cAggs)
    assert(out.count() === 1L)
    assert(out.filter(col("k") === "z").count() === 0L,
      "zero-row group must disappear, not linger")
  }

  test("counting algebra: retracting the last non-null measure restores SUM = NULL") {
    val base = Seq(("g", Some(5L)), ("g", None), ("g", None)).toDF("k", "v")
    val stored = IncrementalAgg.aggregateCounting(base, keys, cAggs)
    val deltas = Seq(("g", Some(5L), -1L)).toDF("k", "v", "_sign")
    val out = IncrementalAgg.publishCounting(
      IncrementalAgg.refreshCounting(stored, deltas, keys, cAggs),
      keys, cAggs).head()
    assert(out.isNullAt(1), "a plain signed fold would leave 0 here")
    assert(out.getLong(2) === 0L)
    assert(publishedCounting(Seq(("g", Option.empty[Long]),
      ("g", Option.empty[Long])).toDF("k", "v"))
      === Set(out.toSeq))
  }

  test("counting algebra: chained refreshes stay re-storable") {
    val base = Seq(("a", Some(1L)), ("a", Some(2L)), ("b", Some(3L)))
      .toDF("k", "v")
    var st = IncrementalAgg.aggregateCounting(base, keys, cAggs)
    st = IncrementalAgg.refreshCounting(st,
      Seq(("a", Some(1L), -1L)).toDF("k", "v", "_sign"), keys, cAggs)
    st = IncrementalAgg.refreshCounting(st,
      Seq(("b", Some(4L), 1L), ("a", Some(2L), -1L))
        .toDF("k", "v", "_sign"), keys, cAggs)
    val got = rows(IncrementalAgg.publishCounting(st, keys, cAggs))
    assert(got === publishedCounting(
      Seq(("b", Some(3L)), ("b", Some(4L))).toDF("k", "v")))
    assert(!got.exists(_.head == "a"))
  }

  test("counting algebra rejects non-invertible aggregates loudly") {
    val base = Seq(("a", 1L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      IncrementalAgg.aggregateCounting(base, keys,
        Seq(AggSpec("v", "min", "v_min")))
    }
  }

  test("changing-dim refresh equals full recompute across all churn arms") {
    val keysK = Seq("k")
    val groups = Seq("g")
    val baseFacts = Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L), (4L, 100L))
      .toDF("k", "v")
    // delta touches a surviving key, a deleted key, and a born key
    val deltaFacts = Seq((2L, 50L), (3L, 1L), (9L, 33L)).toDF("k", "v")
    val dimOld = Seq((1L, "g1"), (2L, "g1"), (3L, "g2"), (4L, "g2"),
      (5L, "g3")).toDF("k", "g")
    // churn: key 4 MOVES g2→g1 (g2 loses its max=100 — the
    // non-invertible retraction), key 3 DELETED while still receiving
    // delta facts, key 9 BORN into a brand-new group
    val changes = Seq((4L, "g1", "U"), (3L, "g2", "D"), (9L, "g9", "U"))
      .toDF("k", "g", "op")
    val jv = IncrementalAgg.buildJoinView(baseFacts, dimOld, keysK, groups, aggs)
    val out = IncrementalAgg.refreshJoinView(jv, deltaFacts, changes,
      keysK, groups, aggs)
    val dimNew = Seq((1L, "g1"), (2L, "g1"), (4L, "g1"), (5L, "g3"),
      (9L, "g9")).toDF("k", "g")
    val full = IncrementalAgg.buildJoinView(
      baseFacts.unionByName(deltaFacts), dimNew, keysK, groups, aggs).view
    assert(rows(out.view) === rows(full))
    // g2 lost key 3 (deleted) and key 4 (moved): the group must VANISH,
    // not linger as a stale row
    assert(out.view.filter(col("g") === "g2").count() === 0)
    // the returned state is re-storable: a fact-only second refresh
    // folds onto the churned state and still equals the recompute
    val more = Seq((9L, 1L)).toDF("k", "v")
    val out2 = IncrementalAgg.refreshJoinView(out, more, changes.limit(0),
      keysK, groups, aggs)
    val full2 = IncrementalAgg.buildJoinView(
      baseFacts.unionByName(deltaFacts).unionByName(more), dimNew,
      keysK, groups, aggs).view
    assert(rows(out2.view) === rows(full2))
  }

  test("NULL group attributes splice null-safely") {
    val facts = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val dimOld = Seq((1L, Option.empty[String]), (2L, Some("g")))
      .toDF("k", "g")
    val jv = IncrementalAgg.buildJoinView(facts, dimOld, Seq("k"),
      Seq("g"), aggs)
    // key 2 moves INTO the NULL group: a plain equi-splice would keep
    // the old NULL row beside the recomputed one (NULL <> NULL)
    val changes = Seq((2L, Option.empty[String], "U")).toDF("k", "g", "op")
    val out = IncrementalAgg.refreshJoinView(jv, facts.limit(0), changes,
      Seq("k"), Seq("g"), aggs)
    val nullRows = out.view.filter(col("g").isNull).collect()
    assert(nullRows.length === 1, "exactly one NULL-group row")
    assert(nullRows.head.getLong(1) === 30L)
    assert(out.view.count() === 1)
  }

  test("changing-dim refresh plan never reads the base fact files") {
    val tmp = java.nio.file.Files.createTempDirectory("incrjv").toString
    val ev = Tables.load(spark, sf, "events")
      .filter(col("user_id").isNotNull)
      .select(col("user_id").as("k"),
        round(col("value") * 100).cast("long").as("v"))
    ev.filter(col("k") % 2 === 0).write.parquet(s"$tmp/basefacts")
    ev.filter(col("k") % 2 === 1).write.parquet(s"$tmp/delta")
    val dim = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("g"))
    dim.write.parquet(s"$tmp/dim")
    val jv0 = IncrementalAgg.buildJoinView(
      spark.read.parquet(s"$tmp/basefacts"), spark.read.parquet(s"$tmp/dim"),
      Seq("k"), Seq("g"), aggs)
    jv0.keyAgg.write.parquet(s"$tmp/keyagg")
    jv0.view.write.parquet(s"$tmp/view")
    val changes = spark.read.parquet(s"$tmp/dim")
      .filter(col("k") % 10 === 0)
      .select(col("k"), lit("MOVED").as("g"), lit("U").as("op"))
    val stored = IncrementalAgg.JoinView(
      spark.read.parquet(s"$tmp/keyagg"), spark.read.parquet(s"$tmp/dim"),
      spark.read.parquet(s"$tmp/view"))
    val refreshed = IncrementalAgg.refreshJoinView(stored,
      spark.read.parquet(s"$tmp/delta"), changes, Seq("k"), Seq("g"), aggs)
    val scanned = refreshed.view.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }.flatMap(_.relation.location.inputFiles)
    assert(scanned.nonEmpty)
    assert(!scanned.exists(_.contains("basefacts")),
      s"changing-dim refresh must not rescan base facts; scanned: " +
        scanned.mkString(", "))
    val dimNew = dim.filter(!(col("k") % 10 === 0))
      .unionByName(dim.filter(col("k") % 10 === 0)
        .select(col("k"), lit("MOVED").as("g")))
    val full = IncrementalAgg.buildJoinView(ev, dimNew,
      Seq("k"), Seq("g"), aggs).view
    assert(rows(refreshed.view) === rows(full))
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

  private val invAggs = Seq(AggSpec("v", "sum", "v_sum"),
    AggSpec("v", "count", "v_cnt"))

  test("retractable join view: signed deltas + dim churn == full recompute") {
    val keysK = Seq("k")
    val groups = Seq("g")
    val base = Seq((1L, Some(10L)), (1L, Some(20L)), (2L, Some(5L)),
      (3L, Some(7L)), (4L, Some(100L)), (6L, Some(9L)), (6L, None))
      .toDF("k", "v")
    val dimOld = Seq((1L, "g1"), (2L, "g1"), (3L, "g2"), (4L, "g2"),
      (5L, "g3"), (6L, "g4")).toDF("k", "g")
    val jv = IncrementalAgg.buildRetractableJoinView(base, dimOld,
      keysK, groups, invAggs)
    // every arm at once: DELETE key 4's only fact (group g2 must lose
    // it), UPDATE one of key 1's facts (−old/+new), INSERT a fact for
    // BORN key 9, retract key 6's only non-null measure (its group g4
    // must publish SUM = NULL, n = 0, not vanish — a row remains),
    // delete key 3's fact while its dim row is deleted
    val signed = Seq(
      (4L, Some(100L), -1L), (3L, Some(7L), -1L),
      (1L, Some(20L), -1L), (1L, Some(21L), 1L),
      (9L, Some(33L), 1L), (6L, Some(9L), -1L))
      .toDF("k", "v", "_sign")
    val changes = Seq((4L, "g1", "U"), (3L, "g2", "D"), (9L, "g9", "U"))
      .toDF("k", "g", "op")
    val out = IncrementalAgg.refreshRetractableJoinView(jv, signed,
      changes, keysK, groups, invAggs)
    val editedFacts = Seq((1L, Some(10L)), (1L, Some(21L)), (2L, Some(5L)),
      (6L, None), (9L, Some(33L))).toDF("k", "v")
    val dimNew = Seq((1L, "g1"), (2L, "g1"), (4L, "g1"), (5L, "g3"),
      (6L, "g4"), (9L, "g9")).toDF("k", "g")
    val full = IncrementalAgg.buildRetractableJoinView(editedFacts, dimNew,
      keysK, groups, invAggs).view
    assert(rows(out.view) === rows(full))
    // g2 lost key 3 (dim-deleted) and key 4's fact (retracted): vanish
    assert(out.view.filter(col("g") === "g2").count() === 0)
    // g4 keeps a row but its SUM restored to NULL (witness algebra
    // survives the group-grain rollup through the join)
    val g4 = out.view.filter(col("g") === "g4").collect()
    assert(g4.length === 1 && g4.head.isNullAt(1) && g4.head.getLong(2) === 0L)
    // the churned state is re-storable: a second signed batch deleting
    // key 9's only fact folds on and the born group vanishes again
    val out2 = IncrementalAgg.refreshRetractableJoinView(out,
      Seq((9L, Some(33L), -1L)).toDF("k", "v", "_sign"),
      changes.limit(0), keysK, groups, invAggs)
    assert(out2.view.filter(col("g") === "g9").count() === 0)
    assert(rows(out2.view) === rows(IncrementalAgg.buildRetractableJoinView(
      editedFacts.filter(col("k") =!= 9L), dimNew, keysK, groups,
      invAggs).view))
  }

  test("retractable join view plan never reads the base fact files") {
    val tmp = java.nio.file.Files.createTempDirectory("incrrjv").toString
    val ev = Tables.load(spark, sf, "events")
      .filter(col("user_id").isNotNull)
      .select(col("user_id").as("k"),
        round(col("value") * 100).cast("long").as("v"))
    ev.write.parquet(s"$tmp/basefacts")
    val dim = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("g"))
    dim.write.parquet(s"$tmp/dim")
    val jv0 = IncrementalAgg.buildRetractableJoinView(
      spark.read.parquet(s"$tmp/basefacts"), spark.read.parquet(s"$tmp/dim"),
      Seq("k"), Seq("g"), invAggs)
    jv0.keyAgg.write.parquet(s"$tmp/keyagg")
    jv0.view.write.parquet(s"$tmp/view")
    // signed deltas: retract half the facts of every 10th key, move
    // every 10th key's dim row — both delta frames written to disk so
    // the refresh plan's scans are honest file reads
    spark.read.parquet(s"$tmp/basefacts").filter(col("k") % 10 === 0)
      .withColumn("_sign", lit(-1L)).write.parquet(s"$tmp/signed")
    val changes = spark.read.parquet(s"$tmp/dim")
      .filter(col("k") % 10 === 5)
      .select(col("k"), lit("MOVED").as("g"), lit("U").as("op"))
    val stored = IncrementalAgg.JoinView(
      spark.read.parquet(s"$tmp/keyagg"), spark.read.parquet(s"$tmp/dim"),
      spark.read.parquet(s"$tmp/view"))
    val refreshed = IncrementalAgg.refreshRetractableJoinView(stored,
      spark.read.parquet(s"$tmp/signed"), changes, Seq("k"), Seq("g"),
      invAggs)
    val scanned = refreshed.view.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }.flatMap(_.relation.location.inputFiles)
    assert(scanned.nonEmpty)
    assert(!scanned.exists(_.contains("basefacts")),
      s"retractable refresh must not rescan base facts; scanned: " +
        scanned.mkString(", "))
    val dimNew = dim.filter(!(col("k") % 10 === 5))
      .unionByName(dim.filter(col("k") % 10 === 5)
        .select(col("k"), lit("MOVED").as("g")))
    val full = IncrementalAgg.buildRetractableJoinView(
      ev.filter(!(col("k") % 10 === 0)), dimNew,
      Seq("k"), Seq("g"), invAggs).view
    assert(rows(refreshed.view) === rows(full))
  }
}
