package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.broadcast
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.storage.StorageLevel
import org.apache.spark.util.SizeEstimator

/** Runtime-stats-gated broadcast: the decision a cost-based optimizer
  * would make, taken on MEASURED size instead of compounded estimates.
  *
  * Spark's static planner can't broadcast a join side whose size estimate
  * is inflated by upstream joins/filters (estimates multiply), and AQE
  * only converts to broadcast AFTER both sides' shuffle writes are
  * already running — by then the big side has paid its full shuffle
  * write. For a plan like q3 (30M filtered lineitem rows shuffled against
  * a 1.5M-row orders×customer side), that lost conversion is 2× total
  * latency at the 60M-row replica.
  *
  * `gated` materializes the candidate side once (it is about to be
  * consumed anyway), reads its ACTUAL row count and a MEASURED average
  * row width (SizeEstimator over a head sample — schema `defaultSize`
  * flat-rates every string at 20 bytes and can under-gate by orders of
  * magnitude on text-heavy rows; the object-graph estimate errs the safe
  * direction), and broadcasts only if `rows × width` fits the threshold —
  * otherwise it returns the materialized frame for a normal shuffle join.
  * At 100 TB the same query's filtered side is billions of rows, the gate
  * fails, and the plan degrades gracefully to the scale-correct shuffle
  * join: no hand-tuned constant ever broadcasts an unboundedly-growing
  * side.
  *
  * Materialization is `persist(MEMORY_AND_DISK)` + count, NOT
  * `localCheckpoint`: persisted blocks keep their lineage, so a lost
  * executor recomputes its partitions instead of aborting the job — the
  * fault-tolerance posture a 1000-executor cluster requires — and blocks
  * spill rather than OOM. Decisions are cached per (session, canonical
  * plan): re-running the same query reuses the already-materialized side
  * instead of checkpointing a fresh orphan copy each run (which both
  * leaked storage across bench iterations and perturbed their timings).
  */
object Broadcasts {
  /** Decision cache keyed by (session, canonicalized plan) — structural
    * plan equality (collision-proof, unlike a 32-bit hash), session-scoped
    * so a frame never outlives or crosses its SparkSession.
    */
  private val decided =
    new ConcurrentHashMap[(SparkSession, LogicalPlan), DataFrame]()

  def gated(df: DataFrame, maxBytes: Long = 64L << 20,
      sampleRows: Int = 1024): DataFrame = {
    val key = (df.sparkSession, PlanBridge.analyzed(df).canonicalized)
    decided.computeIfAbsent(key, _ => decide(df, maxBytes, sampleRows))
  }

  private def decide(df: DataFrame, maxBytes: Long,
      sampleRows: Int): DataFrame = {
    val ck = df.persist(StorageLevel.MEMORY_AND_DISK)
    val n = ck.count() // materializes the cache; the side is consumed next
    if (n == 0L) return broadcast(ck)
    // measured size, best first: the materialized InMemoryRelation reports
    // the EXACT byte size of the cached data (its stats accumulator) —
    // re-deriving the optimized plan after the count picks the cache up.
    // Fallback (cache lookup failed): SizeEstimator over a head sample —
    // boxed-row object-graph bytes, a conservative over-estimate.
    val cacheBytes = ck.queryExecution.optimizedPlan.collectFirst {
      case im: org.apache.spark.sql.execution.columnar.InMemoryRelation
          if im.cacheBuilder.isCachedColumnBuffersLoaded =>
        BigInt(im.cacheBuilder.sizeInBytesStats.value.longValue)
    }
    val bytes: BigInt = cacheBytes.getOrElse {
      val sample = ck.head(math.min(n, sampleRows.toLong).toInt)
      BigInt(n) * math.max(SizeEstimator.estimate(sample) / sample.length, 1L)
    }
    if (bytes <= maxBytes) broadcast(ck) else ck
  }
}
