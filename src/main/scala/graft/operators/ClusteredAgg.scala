package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge

/** Shuffle-free grouped aggregation over key-clustered layouts.
  *
  * Production fact tables are rarely random: ingest writes them range-
  * partitioned or bucketed by their natural key (TPC-H lineitem arrives
  * in orderkey ranges; log shards arrive by time). A `GROUP BY k` over
  * such a layout shuffles data that is ALREADY co-located — every row of
  * a key sits in one scan partition.
  *
  * `groupByClustered` exploits that without trusting it:
  *
  *  1. one cheap key-column pass records each scan partition's
  *     [min(k), max(k)] and NULL count (cached per layout, so repeated
  *     queries pay it once);
  *  2. if the ranges are pairwise disjoint and no key is NULL, the
  *     aggregate runs over [[graft.plans.AssumeClustered]] — a
  *     pass-through plan node that reports the verified co-location as
  *     its `outputPartitioning`, so Catalyst's own codegen'd
  *     HashAggregate executes WITHOUT its exchange (partial and final
  *     collapse into one stage);
  *  3. any overlap, or NULL keys, and the standard shuffle plan runs
  *     unchanged — layout quality is a performance knob, never a
  *     correctness assumption.
  *
  * This is the storage-partitioned (KeyGroupedPartitioning) idea applied
  * to plain parquet directories, with the grouping property measured at
  * runtime instead of promised by a catalog. At 100 TB the check costs
  * one columnar scan of the key; the win is the fact table's entire
  * aggregation shuffle.
  */
object ClusteredAgg {

  /** layout verdicts keyed by the canonicalized source plan — the check
    * is per (files, splits) layout, which is stable within a session
    */
  private val layoutDisjoint =
    new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Boolean]()

  /** Is every key of `df(keyCol)` confined to a single scan partition,
    * with no NULLs? (cached; safe to call repeatedly)
    */
  def isKeyClustered(df: DataFrame, keyCol: String): Boolean = {
    val keyed = df.select(col(keyCol).cast("long").as("k"))
    val cacheKey = PlanBridge.semanticHash(keyed)
    layoutDisjoint.computeIfAbsent(cacheKey, _ => {
      // per-partition (nulls, min, max) as a plain codegen'd aggregate on
      // spark_partition_id() — scan-speed, no row deserialization; the
      // shuffle moves one row per partition
      val stats = keyed
        .groupBy(spark_partition_id().as("pid"))
        .agg(sum(when(col("k").isNull, 1L).otherwise(0L)).as("nulls"),
          min("k").as("lo"), max("k").as("hi"))
        .collect()
      val clean = stats.forall(_.getLong(1) == 0L)
      val ranges = stats.filter(!_.isNullAt(2))
        .map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
      val disjoint = ranges.isEmpty ||
        ranges.sliding(2).forall {
          case Array((_, hi1), (lo2, _)) => hi1 < lo2
          case _ => true
        }
      java.lang.Boolean.valueOf(clean && disjoint)
    })
  }

  /** `SELECT k, <aggs> FROM df GROUP BY k`, exchange-free when the layout
    * is verifiably clustered by `keyCol`, the ordinary shuffle aggregate
    * otherwise. Aggregation semantics are exactly `groupBy(k).agg(...)`
    * in both branches — same Catalyst aggregate, same results.
    */
  def groupByClustered(df: DataFrame, keyCol: String,
      aggs: Seq[Column]): DataFrame = {
    val grouped =
      if (isKeyClustered(df, keyCol)) {
        val analyzed = PlanBridge.analyzed(df)
        val keyAttr = analyzed.output.filter(_.name == keyCol)
        PlanBridge.ofRows(df.sparkSession,
          graft.plans.AssumeClustered(keyAttr, analyzed))
      } else df
    grouped.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }
}
