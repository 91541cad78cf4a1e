package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.LongType

/** Hand-pushed runtime join filter: a Bloom filter of the SMALL side's
  * join keys, applied to the FACT side before the join probes the hash
  * relation.
  *
  * Why this exists: Spark's own `InjectRuntimeFilter` only fires on
  * SHUFFLE joins ("if one side of a shuffle join has a selective
  * predicate…" — SQLConf doc), and the headline q3/q5 plans are
  * broadcast joins on purpose (the fact table never shuffles). What a
  * broadcast join still pays is one hash-relation probe PER FACT ROW —
  * at the 1000× replica that is 600 M probes into a ~1.4 GB pinned
  * relation, nearly all of which miss (the date window keeps ~1/7 of
  * orders). DuckDB wins that query by pushing a filter from the reduced
  * build side into the fact scan; this operator is the same move: a
  * compact Bloom of the build side's keys (tens of MB instead of GBs,
  * mostly cache-resident) rejects ~6/7 of the fact rows with two hashes
  * and a few bit probes each, before they ever touch the big relation.
  *
  * Semantics: the filter can only pass EXTRA rows (false positives), and
  * the join it guards drops them — results are identical for the inner
  * equi-join this is built for. NULL fact keys are dropped by the filter
  * (might_contain(NULL) is NULL), which an inner equi-join does anyway.
  *
  * Scale posture: the Bloom is built once per (session, build-side plan)
  * from the ALREADY-MATERIALIZED gated side (one cheap pass over the
  * cache), cached in a bounded LRU, and embedded in the fact filter as a
  * binary literal — shipped with the task binary exactly like the
  * optimizer's own injected filters. When the key set outgrows
  * [[RuntimeFilters.MaxKeys]] the filter is SKIPPED, not shrunk: a
  * saturated Bloom filters nothing and taxes every row, so past the
  * budget the plan simply stays the gated shuffle join — the same
  * graceful degradation as [[Broadcasts.gated]].
  *
  * The probe predicate is Spark's own codegen'd
  * `BloomFilterMightContain` (what InjectRuntimeFilter plants),
  * registered as the SQL function `graft_might_contain` by
  * [[graft.GraftExtensions]]; the build is the public
  * `DataFrameStatFunctions.bloomFilter` (same `spark.util.sketch`
  * serialization both ends, raw long keys both ends).
  */
object RuntimeFilters {

  /** Past this many build-side keys the filter is skipped: at 1% fpp the
    * sketch would exceed ~75 MB — past the point where a per-row
    * pre-probe beats the hash relation it's trying to shield.
    */
  val MaxKeys: Long = 64L << 20

  /** ~9.6 bits/key; two orders of magnitude fewer false probes than the
    * relation the filter guards, at ~1/8 the bytes of the key set.
    */
  val Fpp: Double = 0.01

  /** Built blooms keyed by (session, canonicalized build plan, key col):
    * the gated side's plan is stable across warm re-runs, so the build
    * pass is paid once per session, like the gated-broadcast decision it
    * rides on. None records a skipped (over-budget) side so the size
    * check isn't re-run either. Bounded: a full cache holds ≤ 8 sketches
    * of ≤ ~75 MB.
    */
  private val MaxEntries = 8
  private val built =
    new java.util.LinkedHashMap[(SparkSession, LogicalPlan, String),
        Option[Array[Byte]]](16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, LogicalPlan, String),
            Option[Array[Byte]]]): Boolean = size > MaxEntries
    }

  /** Drop every cached sketch (cold-bench hook, mirrors
    * [[Broadcasts.reset]]).
    */
  def reset(): Unit = built.synchronized(built.clear())

  /** Number of live cached sketches (spec hook). */
  def cachedCount: Int = built.synchronized(built.size)

  /** `fact` filtered to rows whose `factKey` might be in `side`'s
    * `sideKey` set — or `fact` unchanged when the side is over budget.
    * `sideRows` is the side's measured row count (the gated
    * materialization already has it — [[Broadcasts.gatedWithRows]]).
    */
  def keyFilter(fact: DataFrame, factKey: String, side: DataFrame,
      sideKey: String, sideRows: Long): DataFrame = {
    if (sideRows <= 0 || sideRows > MaxKeys) return fact
    val key = (side.sparkSession, PlanBridge.analyzed(side).canonicalized,
      sideKey)
    val hit = built.synchronized(built.get(key))
    val sketch = if (hit != null) hit else {
      // one pass over the (already materialized) side — outside the lock
      val fresh = Some(serialize(side, sideKey, sideRows))
      built.synchronized {
        val race = built.get(key)
        if (race != null) race else { built.put(key, fresh); fresh }
      }
    }
    sketch match {
      case Some(bytes) => fact.filter(mightContain(bytes, col(factKey)))
      case None => fact
    }
  }

  /** The codegen'd membership predicate over a serialized sketch. */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    call_function("graft_might_contain", lit(sketch), key.cast(LongType))

  private def serialize(side: DataFrame, sideKey: String,
      rows: Long): Array[Byte] = {
    val bf = side.select(col(sideKey).cast(LongType).as(sideKey))
      .stat.bloomFilter(sideKey, math.max(rows, 1L), Fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
