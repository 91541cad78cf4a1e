package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a pre-aggregated table (a materialized
  * aggregate view): fold a batch of NEW fact rows into a stored aggregate
  * without rescanning the base fact data. The 100 TB property is the same
  * one [[Cdc.applyChangelog]] gives tables: a refresh touches only
  * |stored agg| + |delta| rows — one shuffle over aggregate-sized data,
  * with map-side partial aggregation on the delta — while a recompute
  * would re-read the full fact history.
  *
  * Supported functions are the self-decomposable ones whose combine step
  * is again a builtin aggregate: sum/count (combine = sum), min/max
  * (combine = min/max); avg is carried as sum+count and derived at read
  * time. Append-only by design: retractions would need sign-carrying
  * deltas for sum/count and are impossible for min/max without re-reading
  * the group's history; deletions belong to a changelog-driven recompute
  * of the affected groups (see [[Cdc]]).
  */
object IncrementalAgg {

  /** one aggregate column: `fn(input) AS out`, fn ∈ sum|count|min|max */
  final case class AggSpec(input: String, fn: String, out: String)

  private def firstPass(fn: String, in: Column): Column = fn match {
    case "sum"   => sum(in)
    case "count" => count(in)
    case "min"   => min(in)
    case "max"   => max(in)
    case other   => throw new IllegalArgumentException(s"unsupported agg: $other")
  }

  private def combinePass(fn: String, in: Column): Column = fn match {
    case "sum" | "count" => sum(in)
    case "min"           => min(in)
    case "max"           => max(in)
    case other           => throw new IllegalArgumentException(s"unsupported agg: $other")
  }

  /** full aggregation of a fact frame — builds the stored aggregate */
  def aggregate(facts: DataFrame, keys: Seq[String], aggs: Seq[AggSpec]): DataFrame = {
    val exprs = aggs.map(a => firstPass(a.fn, col(a.input)).as(a.out))
    facts.groupBy(keys.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** Merge new fact rows into a stored aggregate: aggregate the delta,
    * union with the stored frame, re-combine per key. Base-only groups
    * pass through (a one-row group re-aggregates to itself), new groups
    * appear, shared groups fold. Output schema equals `aggregate`'s, so
    * the result can be stored back and refreshed again.
    */
  def refresh(storedAgg: DataFrame, deltaFacts: DataFrame, keys: Seq[String],
      aggs: Seq[AggSpec]): DataFrame = {
    val deltaAgg = aggregate(deltaFacts, keys, aggs)
    val combined = aggs.map(a => combinePass(a.fn, col(a.out)).as(a.out))
    storedAgg.select(storedAgg.columns.map(col).toIndexedSeq: _*)
      .unionByName(deltaAgg.select(storedAgg.columns.map(col).toIndexedSeq: _*))
      .groupBy(keys.map(col): _*).agg(combined.head, combined.tail: _*)
  }
}
