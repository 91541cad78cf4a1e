package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** SURVEY §2.1 gap-fill: capabilities absent from the reference kernel but
  * required for "same query capabilities" (they live upstream in Fugue's
  * SQL layer) — sort/limit/top-k, window functions, rollup/cube/grouping
  * sets, event-time windows, sessionization, and semi-structured (JSON)
  * extraction. All native Spark; at scale the window functions shuffle
  * once on their partition key and sort within partitions (no global
  * sort), and top-k compiles to TakeOrderedAndProject.
  */
object Gapfill {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def cents(c: Column): Column = round(c * 100).cast(LongType)

  /** shared resample oracle scaffolding: daily buckets, per-bucket cents
    * mean, per-user grid, prev/next observed carry — `fillExpr` picks the
    * fill rule over (v, pv, pb, nv, nb). */
  private def tsOracle(fillExpr: String): String =
    s"""WITH obs AS (
       | SELECT user_id, epoch_us(ts) // 86400000000 AS bucket,
       |   SUM(CAST(ROUND(value*100) AS BIGINT)) / 100.0 / COUNT(*) AS v
       | FROM events GROUP BY 1, 2),
       |grid AS (
       | SELECT user_id, UNNEST(generate_series(lo, hi)) AS bucket
       | FROM (SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
       |       FROM obs GROUP BY 1)),
       |j AS (SELECT g.user_id, g.bucket, o.v FROM grid g
       |      LEFT JOIN obs o ON g.user_id = o.user_id AND g.bucket = o.bucket),
       |f AS (SELECT user_id, bucket, v,
       | LAST_VALUE(v IGNORE NULLS) OVER wp AS pv,
       | LAST_VALUE(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER wp AS pb,
       | FIRST_VALUE(v IGNORE NULLS) OVER wf AS nv,
       | FIRST_VALUE(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER wf AS nb
       | FROM j
       | WINDOW wp AS (PARTITION BY user_id ORDER BY bucket
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       | wf AS (PARTITION BY user_id ORDER BY bucket
       |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       |SELECT user_id, bucket,
       | ROUND($fillExpr, 6) AS value,
       | (v IS NULL) AS interpolated
       |FROM f ORDER BY user_id, bucket""".stripMargin

  def all: Seq[Q] = Seq(

    // Window: rank family, top-3 per group (deterministic via unique tiebreak)
    Q("w1_rank_topk",
      (s, dir) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        t(s, dir, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"),
            cents(col("o_totalprice")).as("total_c"),
            row_number().over(w).cast(LongType).as("rn"),
            rank().over(w).cast(LongType).as("rk"),
            dense_rank().over(w).cast(LongType).as("drk"))
          .filter(col("rn") <= 3)
          .orderBy("o_orderpriority", "rn")
      },
      Some("""SELECT * FROM (
             | SELECT o_orderpriority, o_orderkey,
             |  CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_c,
             |  ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk,
             |  DENSE_RANK() OVER w AS drk
             | FROM orders
             | WINDOW w AS (PARTITION BY o_orderpriority
             |   ORDER BY o_totalprice DESC, o_orderkey ASC)
             |) WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin)),

    // Window: running sum over a deterministic total order
    Q("w2_running_sum",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .filter(col("o_custkey") % 100 === 0)
          .select(col("o_custkey"), col("o_orderkey"),
            sum(cents(col("o_totalprice"))).over(w).as("running_c"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             | CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER (
             |  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c
             |FROM orders WHERE o_custkey % 100 = 0
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Window: lag/lead
    Q("w3_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t(s, dir, "events")
          .filter(col("user_id") < 10)
          .select(col("user_id"), col("event_id"),
            cents(col("value")).as("v_c"),
            lag(cents(col("value")), 1).over(w).as("prev_c"),
            lead(cents(col("value")), 1).over(w).as("next_c"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
             | CAST(ROUND(value*100) AS BIGINT) AS v_c,
             | LAG(CAST(ROUND(value*100) AS BIGINT), 1) OVER w AS prev_c,
             | LEAD(CAST(ROUND(value*100) AS BIGINT), 1) OVER w AS next_c
             |FROM events WHERE user_id < 10
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY user_id, event_id""".stripMargin)),

    // Window: bounded moving aggregate (3-row frame)
    Q("w4_moving_avg",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-2, Window.currentRow)
        t(s, dir, "events")
          .filter(col("user_id") < 10)
          .select(col("user_id"), col("event_id"),
            avg(cents(col("value"))).over(w).as("mavg_c"),
            count(lit(1)).over(w).as("frame_n"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
             | AVG(CAST(ROUND(value*100) AS BIGINT)) OVER w AS mavg_c,
             | COUNT(*) OVER w AS frame_n
             |FROM events WHERE user_id < 10
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin)),

    // Window: distribution family — ntile/percent_rank/cume_dist are
    // exact ratios of ranks (deterministic in both engines), first/nth
    // values over a total order
    Q("w5_window_distribution",
      (s, dir) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy("o_totalprice", "o_orderkey")
        t(s, dir, "orders")
          .filter(col("o_custkey") % 20 === 0)
          .select(col("o_orderpriority"), col("o_orderkey"),
            ntile(4).over(w).cast(LongType).as("quartile"),
            percent_rank().over(w).as("prank"),
            cume_dist().over(w).as("cdist"),
            first(col("o_orderkey")).over(w).as("first_key"),
            nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
          .orderBy("o_orderpriority", "o_orderkey")
      },
      Some("""SELECT o_orderpriority, o_orderkey,
             | CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
             | PERCENT_RANK() OVER w AS prank,
             | CUME_DIST() OVER w AS cdist,
             | FIRST_VALUE(o_orderkey) OVER w AS first_key,
             | NTH_VALUE(o_orderkey, 2) OVER w AS second_key
             |FROM orders WHERE o_custkey % 20 = 0
             |WINDOW w AS (PARTITION BY o_orderpriority
             |  ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_orderpriority, o_orderkey""".stripMargin)),

    // Window: value-based RANGE frame (all rows within a price distance,
    // independent of tie order — deterministic by construction)
    Q("w6_range_frame",
      (s, dir) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("total_c"))
          .rangeBetween(-100000L, Window.currentRow)
        t(s, dir, "orders")
          .filter(col("o_custkey") % 40 === 0)
          .select(col("o_orderpriority"), col("o_orderkey"),
            cents(col("o_totalprice")).as("total_c"))
          .select(col("o_orderpriority"), col("o_orderkey"), col("total_c"),
            count(lit(1)).over(w).as("n_in_band"),
            sum(col("total_c")).over(w).as("band_sum_c"))
          .orderBy("o_orderpriority", "o_orderkey")
      },
      Some("""SELECT o_orderpriority, o_orderkey, total_c,
             | COUNT(*) OVER w AS n_in_band,
             | CAST(SUM(total_c) OVER w AS BIGINT) AS band_sum_c
             |FROM (SELECT o_orderpriority, o_orderkey,
             |  CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_c
             |  FROM orders WHERE o_custkey % 40 = 0)
             |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY total_c
             |  RANGE BETWEEN 100000 PRECEDING AND CURRENT ROW)
             |ORDER BY o_orderpriority, o_orderkey""".stripMargin)),

    // first_value/last_value/nth_value with explicit frames — the
    // navigation family over a deterministic (unique-key) order
    Q("w7_first_last_nth",
      (s, dir) => {
        val wRun = Window.partitionBy("o_orderpriority").orderBy(col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy("o_orderpriority").orderBy(col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "orders")
          .filter(col("o_custkey") % 40 === 0)
          .select(col("o_orderpriority"), col("o_orderkey"),
            cents(col("o_totalprice")).as("total_c"))
          .select(col("o_orderpriority"), col("o_orderkey"), col("total_c"),
            first(col("total_c")).over(wRun).as("first_c"),
            last(col("total_c")).over(wAll).as("last_c"),
            nth_value(col("total_c"), 2).over(wAll).as("second_c"))
          .orderBy("o_orderpriority", "o_orderkey")
      },
      Some("""SELECT o_orderpriority, o_orderkey, total_c,
             | FIRST_VALUE(total_c) OVER wr AS first_c,
             | LAST_VALUE(total_c) OVER wa AS last_c,
             | NTH_VALUE(total_c, 2) OVER wa AS second_c
             |FROM (SELECT o_orderpriority, o_orderkey,
             |  CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_c
             |  FROM orders WHERE o_custkey % 40 = 0)
             |WINDOW wr AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             | wa AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_orderpriority, o_orderkey""".stripMargin)),

    // Interval (day-time) arithmetic over event timestamps: shifted
    // stamps, minute truncation, exact second offsets from the hour
    Q("e29_interval_arith",
      (s, dir) => t(s, dir, "events")
        .filter(col("event_id") % 37 === 0)
        .select(col("event_id"), col("ts"),
          (col("ts") + expr("INTERVAL 90 MINUTE")).as("plus90m"),
          (col("ts") - expr("INTERVAL 2 HOUR")).as("minus2h"),
          date_trunc("minute", col("ts")).as("minute_start"),
          // integral div (not /): a double detour can round up across
          // an integer boundary before the cast truncates
          expr("CAST((unix_micros(CAST(ts AS TIMESTAMP)) - " +
            "unix_micros(CAST(date_trunc('hour', ts) AS TIMESTAMP))) div 1000000 " +
            "AS BIGINT)").as("secs_into_hour"))
        .orderBy("event_id"),
      Some("""SELECT event_id, ts,
             | ts + INTERVAL 90 MINUTE AS plus90m,
             | ts - INTERVAL 2 HOUR AS minus2h,
             | date_trunc('minute', ts) AS minute_start,
             | CAST((epoch_us(ts) - epoch_us(date_trunc('hour', ts))) // 1000000
             |   AS BIGINT) AS secs_into_hour
             |FROM events WHERE event_id % 37 = 0
             |ORDER BY event_id""".stripMargin)),

    // Sort + limit (top-k → TakeOrderedAndProject, no global sort at scale)
    Q("s1_orderby_limit",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("total_c"))
        .orderBy(desc_nulls_last("total_c"), asc_nulls_first("o_orderkey"))
        .limit(20),
      Some("""SELECT o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_c
             |FROM orders
             |ORDER BY total_c DESC NULLS LAST, o_orderkey NULLS FIRST
             |LIMIT 20""".stripMargin)),

    // Multi-key sort with NULL keys: Spark ASC=NULLS FIRST made explicit
    Q("s2_sort_nulls",
      (s, dir) => t(s, dir, "customer")
        .select(nullif(col("c_nationkey") % 4, lit(1)).as("grp"),
          col("c_custkey"))
        .orderBy(asc_nulls_first("grp"), desc_nulls_last("c_custkey"))
        .limit(100),
      Some("""SELECT NULLIF(c_nationkey % 4, 1) AS grp, c_custkey
             |FROM customer
             |ORDER BY grp NULLS FIRST, c_custkey DESC NULLS LAST
             |LIMIT 100""".stripMargin)),

    // Deterministic content-keyed sampling (Sampling.bucketSample with a
    // portable bucket expression) + per-group cap (stratifiedLimit)
    Q("s3_deterministic_sample",
      (s, dir) => {
        val sampled = graft.operators.Sampling.bucketSample(
          t(s, dir, "orders"), col("o_orderkey"), buckets = 100, keep = 7)
        graft.operators.Sampling.stratifiedLimit(
          sampled, Seq("o_orderpriority"),
          Seq(col("o_orderkey")), n = 5)
          .select(col("o_orderpriority"), col("o_orderkey"))
          .orderBy("o_orderpriority", "o_orderkey")
      },
      Some("""SELECT o_orderpriority, o_orderkey FROM (
             | SELECT o_orderpriority, o_orderkey,
             |  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
             |    ORDER BY o_orderkey) AS rn
             | FROM orders WHERE o_orderkey % 100 < 7
             |) WHERE rn <= 5
             |ORDER BY o_orderpriority, o_orderkey""".stripMargin)),

    // ROLLUP (subtotal rows flagged via IS NULL — group cols are non-null)
    Q("g1_rollup",
      (s, dir) => t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity").cast(LongType)).as("qty"))
        .select(
          col("l_returnflag"), col("l_linestatus"), col("cnt"), col("qty"),
          (when(col("l_returnflag").isNull, 2).otherwise(0) +
            when(col("l_linestatus").isNull, 1).otherwise(0)).as("gid"))
        .orderBy(asc_nulls_first("gid"), asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
             | CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
             | (CASE WHEN l_returnflag IS NULL THEN 2 ELSE 0 END +
             |  CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS gid
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY gid NULLS FIRST, l_returnflag NULLS FIRST,
             | l_linestatus NULLS FIRST""".stripMargin)),

    // CUBE
    Q("g2_cube",
      (s, dir) => t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
        .select(
          col("l_returnflag"), col("l_linestatus"), col("cnt"),
          (when(col("l_returnflag").isNull, 2).otherwise(0) +
            when(col("l_linestatus").isNull, 1).otherwise(0)).as("gid"))
        .orderBy(asc_nulls_first("gid"), asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
             | (CASE WHEN l_returnflag IS NULL THEN 2 ELSE 0 END +
             |  CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS gid
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY gid NULLS FIRST, l_returnflag NULLS FIRST,
             | l_linestatus NULLS FIRST""".stripMargin)),

    // GROUPING SETS (Spark 4 DataFrame API)
    Q("g3_grouping_sets",
      (s, dir) => t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"))
        .select(
          col("l_returnflag"), col("l_linestatus"), col("cnt"),
          (when(col("l_returnflag").isNull, 2).otherwise(0) +
            when(col("l_linestatus").isNull, 1).otherwise(0)).as("gid"))
        .orderBy(asc_nulls_first("gid"), asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
             | (CASE WHEN l_returnflag IS NULL THEN 2 ELSE 0 END +
             |  CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS gid
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY gid NULLS FIRST, l_returnflag NULLS FIRST,
             | l_linestatus NULLS FIRST""".stripMargin)),

    // Event-time tumbling window (batch form of the streaming agg —
    // graft.streaming runs the same plan incrementally)
    Q("st1_tumbling_window",
      (s, dir) => t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum(cents(col("value"))).as("sum_c"))
        .orderBy(asc_nulls_first("hour"), asc_nulls_first("event_type")),
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
             | COUNT(*) AS cnt, CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_c
             |FROM events GROUP BY 1, 2
             |ORDER BY hour NULLS FIRST, event_type NULLS FIRST""".stripMargin)),

    // Sliding event-time windows (2h window, 1h slide): each event lands
    // in two overlapping windows — the batch form of streaming sliding
    // aggregation; oracle materializes the two memberships via UNION ALL
    Q("st5_sliding_window",
      (s, dir) => t(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").cast(TimestampType).as("win_start"),
          col("event_type"), col("cnt"))
        .orderBy("win_start", "event_type"),
      Some("""SELECT win_start, event_type, COUNT(*) AS cnt FROM (
             | SELECT date_trunc('hour', ts) AS win_start, event_type FROM events
             | UNION ALL
             | SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type FROM events)
             |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin)),

    // Batch form of the streaming distinct-count (EventStreams.
    // hourlyUniques: event-time dedup chained into a windowed count —
    // both state stores watermark-bounded); exact per-window uniques
    Q("st8_hourly_uniques",
      (s, dir) => t(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .select(window(col("ts"), "1 hour").as("win"), col("user_id"))
        .dropDuplicates("win", "user_id")
        .groupBy(col("win"))
        .agg(count(lit(1)).as("uniques"))
        .select(col("win.start").cast(TimestampType).as("hour"), col("uniques"))
        .orderBy(asc_nulls_first("hour")),
      Some("""SELECT date_trunc('hour', ts) AS hour,
             | COUNT(DISTINCT user_id) AS uniques
             |FROM events GROUP BY 1 ORDER BY hour NULLS FIRST""".stripMargin)),

    // Batch form of the stream-static enrichment join (EventStreams.
    // hourlyBySegment): events broadcast-join the customer dim, then the
    // windowed per-segment revenue aggregate
    Q("st9_segment_revenue",
      (s, dir) => {
        val e = t(s, dir, "events")
        val c = t(s, dir, "customer")
        e.join(broadcast(c.select(col("c_custkey"), col("c_mktsegment"))),
            col("user_id") === col("c_custkey"))
          .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
          .agg(count(lit(1)).as("cnt"), sum(cents(col("value"))).as("sum_c"))
          .select(col("window.start").cast(TimestampType).as("hour"),
            col("c_mktsegment").as("segment"), col("cnt"), col("sum_c"))
          .orderBy(asc_nulls_first("hour"), asc_nulls_first("segment"))
      },
      Some("""SELECT date_trunc('hour', e.ts) AS hour, c.c_mktsegment AS segment,
             | COUNT(*) AS cnt, CAST(SUM(CAST(ROUND(e.value*100) AS BIGINT)) AS BIGINT) AS sum_c
             |FROM events e JOIN customer c ON e.user_id = c.c_custkey
             |GROUP BY 1, 2
             |ORDER BY hour NULLS FIRST, segment NULLS FIRST""".stripMargin)),

    // Batch form of the streaming session-window aggregation
    // (EventStreams.userSessions): native session_window vs the
    // gaps-and-islands rewrite the oracle runs. Boundary semantics: an
    // event exactly `gap` after the previous one opens a NEW session
    // (half-open window), hence `>=` in the oracle's flag where st2's
    // lag-based count uses `>`.
    Q("st10_session_stats",
      (s, dir) => graft.streaming.EventStreams.userSessions(
          t(s, dir, "events"), watermark = false)
        .orderBy("user_id", "s_start"),
      Some("""WITH flagged AS (
             | SELECT user_id, ts, value,
             |  CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w >= 1800000000
             |    OR LAG(epoch_us(ts), 1) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
             | FROM events WHERE user_id IS NOT NULL
             | WINDOW w AS (PARTITION BY user_id ORDER BY ts)
             |), sess AS (
             | SELECT user_id, ts, value,
             |  SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
             |    ROWS UNBOUNDED PRECEDING) AS sid
             | FROM flagged)
             |SELECT MIN(ts) AS s_start, MAX(ts) + INTERVAL 30 MINUTE AS s_end,
             | user_id, COUNT(*) AS n_events,
             | CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_c
             |FROM sess GROUP BY user_id, sid
             |ORDER BY user_id, s_start""".stripMargin)),

    // Batch form of the stream-stream interval join (EventStreams.
    // viewToPurchase): view → purchase attribution within 1h, per user
    Q("st6_view_attribution",
      (s, dir) => {
        val base = t(s, dir, "events")
        val views = base.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
            col("event_id").as("view_id"))
        val purchases = base.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
            col("event_id").as("purchase_id"))
        views.join(purchases,
          col("v_user") === col("p_user") &&
            col("p_ts") >= col("v_ts") &&
            col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"))
          .select(col("v_user").as("user_id"), col("view_id"),
            col("purchase_id"))
          .orderBy("user_id", "view_id", "purchase_id")
      },
      Some("""SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id
             |FROM (SELECT * FROM events WHERE event_type = 'view') v
             |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
             | ON v.user_id = p.user_id
             | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
             |ORDER BY 1, 2, 3""".stripMargin)),

    // st7: LAST-TOUCH attribution — the production form of the interval
    // join (st6 keeps every (view, purchase) pair; real attribution
    // credits each purchase to its LATEST qualifying view, then
    // aggregates revenue per user). Interval join → per-purchase
    // dedup-to-latest (row_number over purchase) → agg. At scale: the
    // join shuffles both sides on user_id; the row_number re-shuffles on
    // purchase_id (narrower — one row per surviving pair); the final agg
    // reuses nothing but carries only (user, long, long) rows.
    Q("st7_last_touch",
      (s, dir) => {
        val base = t(s, dir, "events")
        val views = base.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
            col("event_id").as("view_id"))
        val purchases = base.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_ts"),
            col("event_id").as("purchase_id"), col("value"))
        val w = Window.partitionBy("purchase_id")
          .orderBy(desc("v_ts"), desc("view_id"))
        purchases.join(views,
            col("v_user") === col("user_id") &&
              col("v_ts") <= col("p_ts") &&
              col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_attr"), sum(cents(col("value"))).as("rev_c"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, COUNT(*) AS n_attr,
             | CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS rev_c
             |FROM (
             | SELECT p.user_id, p.value,
             |  ROW_NUMBER() OVER (PARTITION BY p.event_id
             |    ORDER BY v.ts DESC, v.event_id DESC) AS rn
             | FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             | JOIN (SELECT * FROM events WHERE event_type = 'view') v
             |  ON v.user_id = p.user_id
             |  AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
             |) WHERE rn = 1 GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ts1/ts2: regular-grid resampling with gap fill — bucket each user's
    // events onto a daily grid, fill empty days by linear interpolation
    // (ts1) or forward fill (ts2). One shuffle total: everything after
    // the key repartition is key-local (see operators/Timeseries).
    // Per-bucket mean is Σcents/100/n (exact long sum → identical IEEE
    // double in both engines); outputs round to 6dp.
    Q("ts1_resample_linear",
      (s, dir) => graft.operators.Timeseries.resample(
        t(s, dir, "events"), "user_id", "ts", "value", 86400000000L, "linear")
        .orderBy("user_id", "bucket"),
      Some(tsOracle("""CASE WHEN v IS NOT NULL THEN v
             |        WHEN pv IS NOT NULL AND nv IS NOT NULL
             |          THEN pv + (nv - pv) * (bucket - pb) / (nb - pb)
             |        ELSE COALESCE(pv, nv) END""".stripMargin))),
    Q("ts2_resample_ffill",
      (s, dir) => graft.operators.Timeseries.resample(
        t(s, dir, "events"), "user_id", "ts", "value", 86400000000L, "ffill")
        .orderBy("user_id", "bucket"),
      Some(tsOracle("COALESCE(v, pv, nv)"))),

    // st11: view ABANDONMENT — the left-outer form of st6. Every view,
    // with its qualifying purchases or one NULL-purchase row when none
    // arrived within the hour: the training-label shape ("did this
    // impression convert?"). The streaming twin
    // (EventStreams.viewToPurchaseOuter) emits the NULL rows only when
    // the watermark passes v_ts + window — parity spec feeds a flush
    // sentinel to close the tail (StreamingSpec).
    Q("st11_view_abandonment",
      (s, dir) => {
        val base = t(s, dir, "events")
        val views = base.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
            col("event_id").as("view_id"))
        val purchases = base.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
            col("event_id").as("purchase_id"))
        views.join(purchases,
          col("v_user") === col("p_user") &&
            col("p_ts") >= col("v_ts") &&
            col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
          "left_outer")
          .select(col("v_user").as("user_id"), col("view_id"),
            col("purchase_id"))
          .orderBy(asc_nulls_first("user_id"), asc_nulls_first("view_id"),
            asc_nulls_first("purchase_id"))
      },
      Some("""SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id
             |FROM (SELECT * FROM events WHERE event_type = 'view') v
             |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
             | ON v.user_id = p.user_id
             | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
             |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin)),

    // Sessionization: 30-min-gap sessions per user via lag + cumulative flag
    Q("st2_sessionize",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val micros = unix_micros(col("ts").cast(TimestampType))
        val newSession = when(
          micros - lag(micros, 1).over(w) > 1800L * 1000000L ||
            lag(micros, 1).over(w).isNull, 1L).otherwise(0L)
        t(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("new_s", newSession)
          .groupBy("user_id")
          .agg(sum("new_s").as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
             |FROM (
             | SELECT user_id,
             |  CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w > 1800000000
             |    OR LAG(epoch_us(ts), 1) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
             | FROM events
             | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |) GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Funnel analysis: per-user ordered-stage progression (view →
    // click → purchase by first occurrence), one aggregation pass
    Q("st3_funnel",
      (s, dir) => {
        val firstOf = (t: String) =>
          min(when(col("event_type") === t, col("ts"))).as(s"first_$t")
        t(s, dir, "events")
          .groupBy("user_id")
          .agg(firstOf("view"), firstOf("click"), firstOf("purchase"))
          .select(col("user_id"),
            col("first_view").isNotNull.as("reached_view"),
            (col("first_view").isNotNull && col("first_click").isNotNull &&
              col("first_view") <= col("first_click")).as("reached_click"),
            (col("first_view").isNotNull && col("first_click").isNotNull &&
              col("first_purchase").isNotNull &&
              col("first_view") <= col("first_click") &&
              col("first_click") <= col("first_purchase")).as("full_funnel"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             | fv IS NOT NULL AS reached_view,
             | (fv IS NOT NULL AND fc IS NOT NULL AND fv <= fc) AS reached_click,
             | (fv IS NOT NULL AND fc IS NOT NULL AND fp IS NOT NULL
             |  AND fv <= fc AND fc <= fp) AS full_funnel
             |FROM (
             | SELECT user_id,
             |  MIN(ts) FILTER (event_type = 'view') AS fv,
             |  MIN(ts) FILTER (event_type = 'click') AS fc,
             |  MIN(ts) FILTER (event_type = 'purchase') AS fp
             | FROM events GROUP BY user_id)
             |ORDER BY user_id""".stripMargin)),

    // Cohort retention: users grouped by first-activity week, counted by
    // weeks-since-cohort — two aggregations, no self-join
    Q("st4_retention",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"),
            date_trunc("week", col("ts")).cast(DateType).as("wk"))
          .distinct()
        val cohorts = ev.groupBy("user_id").agg(min("wk").as("cohort_wk"))
        ev.join(cohorts, Seq("user_id"))
          .groupBy(col("cohort_wk"),
            (datediff(col("wk"), col("cohort_wk")) / 7).cast(LongType).as("week_n"))
          .agg(countDistinct("user_id").as("active_users"))
          .orderBy("cohort_wk", "week_n")
      },
      Some("""WITH ev AS (
             | SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
             | FROM events),
             |cohorts AS (SELECT user_id, MIN(wk) AS cohort_wk FROM ev GROUP BY 1)
             |SELECT cohort_wk,
             | CAST(date_diff('day', cohort_wk, wk) / 7 AS BIGINT) AS week_n,
             | COUNT(DISTINCT user_id) AS active_users
             |FROM ev JOIN cohorts USING (user_id)
             |GROUP BY 1, 2 ORDER BY cohort_wk, week_n""".stripMargin)),

    // Semi-structured: JSON field extraction + typed aggregation
    Q("j1_json_extract",
      (s, dir) => t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum("k").as("k_sum"), max("k").as("k_max"))
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS cnt,
             | CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
             | MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
             |FROM events GROUP BY event_type
             |ORDER BY event_type""".stripMargin))
  )
}
