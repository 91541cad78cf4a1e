package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Top-k pushdown through a join by ADAPTIVE REFILL — no precondition,
  * no verification pass, unconditionally correct.
  *
  * `ORDER BY s LIMIT k` over `dim ⨝ fact` wants to avoid joining (or
  * even hash-building) anything but the k surviving rows. The previous
  * design proved the join multiplicity-preserving first (a PK scan of
  * dim plus a fact⟕dim anti-join — 4.9 s of the 7 s cold q18 total at
  * the 60 M-row replica, measured) and fell back when the proof failed.
  * The refill design needs no proof at all:
  *
  *   take the top k′ fact rows (k′ = k initially), broadcast-probe dim,
  *   and count the join output. If it has ≥ k rows, its top k ARE the
  *   global top k: `sort` totally orders fact, join rows inherit their
  *   fact row's rank, so every join row born of a fact row outside the
  *   top k′ sorts below all k of them — duplicate dim keys (extra
  *   multiplicity) and orphaned or NULL fact keys (dropped rows) can
  *   only move rows INTO the probed prefix's output, never above it.
  *   Fewer than k rows means orphans ate the prefix: escalate k′ and
  *   re-probe. The loop is bounded; past the cap (or if fact is
  *   exhausted, which just returns everything that matches) the
  *   stats-gated join runs unchanged.
  *
  * At 100 TB the probe path is the difference between broadcasting k
  * rows and hash-building billions: fact is materialized once
  * ([[Broadcasts]] persist + LRU discipline), its top-k is a
  * TakeOrderedAndProject (per-partition heaps, no global sort), and dim
  * is probed by a k-row broadcast — dim never shuffles at any scale.
  * Each refill attempt is one driver-side `count()` of an ≤ k′·m row
  * join (m = max dim-key multiplicity); the common catalog-clean case
  * (unique dim key, no orphans) resolves in exactly one probe with zero
  * verification jobs — that is where the cold-path seconds went.
  */
object TopKJoin {

  /** Escalation factor between refill attempts. */
  private val Refill = 8
  /** Probe-prefix cap: past this the broadcast side is no longer "a few
    * rows" and the stats-gated join is the honest plan.
    */
  private val MaxProbe = 1 << 20

  /** `dim ⨝ fact ON dim(dimKey) = fact(factKey)`, truncated to the top
    * `k` rows by `sort` — which must reference ONLY fact columns and
    * totally order fact (include factKey as tiebreaker; ties introduced
    * by duplicate dim keys are broken arbitrarily, as in the plain
    * plan). Returns ≤ k rows carrying both sides' columns; callers
    * project and re-sort the k-row output (cost-free) for presentation.
    */
  def limitJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, sort: Seq[Column], k: Int): DataFrame = {
    // Materialize fact once (Broadcasts cache: persist + LRU + reset
    // discipline; 0-byte gate = cache, never broadcast the full side):
    // every refill attempt and the fallback read the persisted rows, so
    // the typically-expensive aggregate behind `fact` runs exactly once
    // per session however many probes the loop takes.
    val factM = Broadcasts.gated(fact, maxBytes = 0L)
    var kp = math.max(k, 1)
    var n = -1L // fact row count, measured on first refill miss only
    while (kp <= MaxProbe) {
      val top = factM.orderBy(sort: _*).limit(kp)
      // Gated-persist the probe output too: the count() below is its
      // materialization, the returned frame reads the cache (no second
      // dim scan), and warm re-plans of the same query hit the same
      // cache entry by canonical-plan key.
      val joined = Broadcasts.gated(
        dim.join(broadcast(top), dim(dimKey) === top(factKey)), maxBytes = 0L)
      val c = joined.count()
      if (c >= k) return joined.orderBy(sort: _*).limit(k)
      if (n < 0) n = factM.count()
      // fact exhausted: everything that matches is already here
      if (kp >= n) return joined
      kp =
        if (kp >= MaxProbe) MaxProbe + 1
        else math.min(kp.toLong * Refill, MaxProbe.toLong).toInt
    }
    // refill cap exceeded — orphan-dominated fact: stats-gated join over
    // the already-persisted side (nothing recomputed), global top-k after
    val factG = Broadcasts.gated(factM)
    dim.join(factG, dim(dimKey) === factG(factKey))
      .orderBy(sort: _*).limit(k)
  }
}
