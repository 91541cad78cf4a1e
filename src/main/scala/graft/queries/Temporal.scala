package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.RangeJoin
import graft.sources.Tables

/** Temporal operators: grid-bucketed range join (point-in-interval) and
  * the interval/date-arithmetic surface (timestamp ± INTERVAL, trunc,
  * field extraction, duration aggregation).
  *
  * Timestamp discipline: events.parquet has shipped as both
  * TIMESTAMP(NANOS) and TIMESTAMP(MICROS); Tables.load sniffs the footer
  * and canonicalizes to µs-precision NTZ either way, so every oracle
  * comparison runs in epoch-microsecond space (`epoch_us`) — DuckDB's
  * TIMESTAMP_NS would otherwise compare sub-microsecond digits Spark
  * cannot see.
  */
object Temporal {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** 30-minute incident windows opened by every 20th error event. */
  private def errorWindows(ev: DataFrame): DataFrame = ev
    .filter(col("event_type") === "error" && col("event_id") % 20 === 0)
    .select(col("event_id").as("win_id"), col("ts").as("ws"),
      (col("ts") + expr("INTERVAL 30 MINUTES")).as("we"))

  private val errorWindowsSql =
    """SELECT event_id AS win_id, ts AS ws FROM events
      |WHERE event_type = 'error' AND event_id % 20 = 0""".stripMargin

  def all: Seq[Q] = Seq(

    // RJ1 — point-in-interval range join on the 30-min grid: every
    // window covers ≤2 bins, so the plan is explode + shuffle equi-join
    // on the bin id (no BroadcastNestedLoopJoin anywhere)
    Q("rj1_range_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        RangeJoin.pointInInterval(
          ev.select(col("event_id"), col("ts"), col("value")), "ts",
          errorWindows(ev), "ws", "we",
          binWidthMicros = 30L * 60 * 1000000, longTail = false)
          .groupBy("win_id")
          .agg(count(lit(1)).as("n_events"),
            sum(round(col("value") * 100).cast(LongType)).as("sum_value_c"))
          .orderBy("win_id")
      },
      Some(s"""SELECT w.win_id, COUNT(*) AS n_events,
              | CAST(SUM(CAST(ROUND(e.value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
              |FROM events e JOIN ($errorWindowsSql) w
              | ON epoch_us(e.ts) >= epoch_us(w.ws)
              | AND epoch_us(e.ts) <= epoch_us(w.ws) + 1800000000
              |GROUP BY 1 ORDER BY win_id""".stripMargin)),

    // RJ2 — hybrid path: every 100th error opens a 2-day window (97
    // bins at the 30-min grid) which exceeds maxBinsPerInterval=48 and
    // routes through the broadcast side; the rest stay on the grid.
    // Verifies the two paths union to exactly the naive BETWEEN join.
    Q("rj2_range_join_hybrid",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val wins = ev
          .filter(col("event_type") === "error" && col("event_id") % 20 === 0)
          .select(col("event_id").as("win_id"), col("ts").as("ws"),
            (col("ts") + when(col("event_id") % 100 === 0,
              expr("INTERVAL 2 DAYS")).otherwise(expr("INTERVAL 30 MINUTES")))
              .as("we"))
        RangeJoin.pointInInterval(
          ev.select(col("event_id"), col("ts")), "ts",
          wins, "ws", "we",
          binWidthMicros = 30L * 60 * 1000000, maxBinsPerInterval = 48)
          .groupBy("win_id")
          .agg(count(lit(1)).as("n_events"),
            min("event_id").cast(LongType).as("first_event"))
          .orderBy("win_id")
      },
      Some(s"""SELECT w.win_id, COUNT(*) AS n_events,
              | CAST(MIN(e.event_id) AS BIGINT) AS first_event
              |FROM events e JOIN (
              |  SELECT event_id AS win_id, ts AS ws,
              |   CASE WHEN event_id % 100 = 0 THEN 172800000000
              |        ELSE 1800000000 END AS len_us
              |  FROM events WHERE event_type = 'error' AND event_id % 20 = 0) w
              | ON epoch_us(e.ts) >= epoch_us(w.ws)
              | AND epoch_us(e.ts) <= epoch_us(w.ws) + w.len_us
              |GROUP BY 1 ORDER BY win_id""".stripMargin)),

    // RJ3 — interval-OVERLAP join (the other range-join shape): 30-min
    // error windows × 45-min purchase windows, pairs whose intervals
    // intersect. Grid path with the first-shared-bin guard — no distinct,
    // no nested-loop node (asserted in TemporalCorpusSpec); oracle is the
    // naive inequality join.
    Q("rj3_interval_overlap",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val errw = ev
          .filter(col("event_type") === "error" && col("event_id") % 20 === 0)
          .select(col("event_id").as("ewin_id"), col("ts").as("es"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("ee"))
        val purw = ev
          .filter(col("event_type") === "purchase" && col("event_id") % 15 === 0)
          .select(col("event_id").as("pwin_id"), col("ts").as("ps"),
            (col("ts") + expr("INTERVAL 45 MINUTES")).as("pe"))
        RangeJoin.intervalOverlap(
          errw, "es", "ee", purw, "ps", "pe",
          binWidthMicros = 30L * 60 * 1000000, longTail = false)
          .select(col("ewin_id"), col("pwin_id"))
          .orderBy("ewin_id", "pwin_id")
      },
      Some("""SELECT e.event_id AS ewin_id, p.event_id AS pwin_id
             |FROM (SELECT event_id, ts FROM events
             |      WHERE event_type = 'error' AND event_id % 20 = 0) e
             |JOIN (SELECT event_id, ts FROM events
             |      WHERE event_type = 'purchase' AND event_id % 15 = 0) p
             | ON epoch_us(e.ts) <= epoch_us(p.ts) + 2700000000
             | AND epoch_us(p.ts) <= epoch_us(e.ts) + 1800000000
             |ORDER BY 1, 2""".stripMargin)),

    // I1 — interval arithmetic + field extraction. dayofweek numbering
    // differs: Spark 1=Sunday..7, DuckDB dow 0=Sunday..6 → dow+1.
    Q("i1_ts_interval",
      (s, dir) => t(s, dir, "events")
        .filter(col("event_id") % 37 === 0)
        .select(
          col("event_id"),
          (col("ts") + expr("INTERVAL 90 MINUTES")).as("t_plus"),
          (col("ts") - expr("INTERVAL 1 DAY")).as("t_minus"),
          date_trunc("DAY", col("ts")).as("t_day"),
          dayofweek(col("ts")).cast(LongType).as("dow"),
          // integral `div`, not `/`: double division rounds across
          // integer boundaries (repo convention)
          expr("CAST((unix_micros(CAST(date_trunc('DAY', ts) AS TIMESTAMP))" +
            " + 86400000000 - unix_micros(CAST(ts AS TIMESTAMP)))" +
            " div 1000000 AS BIGINT)").as("secs_to_midnight"),
          year(col("ts")).cast(LongType).as("yr"),
          month(col("ts")).cast(LongType).as("mo"),
          dayofmonth(col("ts")).cast(LongType).as("dy"),
          hour(col("ts")).cast(LongType).as("hr"),
          minute(col("ts")).cast(LongType).as("mi"),
          second(col("ts")).cast(LongType).as("se"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             | ts + INTERVAL 90 MINUTE AS t_plus,
             | ts - INTERVAL 1 DAY AS t_minus,
             | CAST(date_trunc('day', ts) AS TIMESTAMP) AS t_day,
             | CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
             | CAST((epoch_us(date_trunc('day', ts)) + 86400000000
             |       - epoch_us(ts)) // 1000000 AS BIGINT) AS secs_to_midnight,
             | CAST(year(ts) AS BIGINT) AS yr,
             | CAST(month(ts) AS BIGINT) AS mo,
             | CAST(day(ts) AS BIGINT) AS dy,
             | CAST(hour(ts) AS BIGINT) AS hr,
             | CAST(minute(ts) AS BIGINT) AS mi,
             | CAST(second(ts) AS BIGINT) AS se
             |FROM events WHERE event_id % 37 = 0
             |ORDER BY event_id""".stripMargin)),

    // I2 — duration aggregation per user (span between first and last
    // event, in whole seconds; max/min commute with the ns→µs truncation
    // because truncation is monotone)
    Q("i2_duration_agg",
      (s, dir) => t(s, dir, "events")
        .groupBy("user_id")
        .agg(
          expr("CAST((unix_micros(CAST(MAX(ts) AS TIMESTAMP))" +
            " - unix_micros(CAST(MIN(ts) AS TIMESTAMP)))" +
            " div 1000000 AS BIGINT)").as("span_s"),
          count(lit(1)).as("n"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
             | CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000
             |      AS BIGINT) AS span_s,
             | COUNT(*) AS n
             |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin)))
}
