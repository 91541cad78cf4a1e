package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

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
  * consumed anyway), reads its ACTUAL row count, and broadcasts only if
  * rows × schema default width fits the threshold — otherwise it returns
  * the materialized frame for a normal shuffle join. At 100 TB the same
  * query's filtered side is billions of rows, the gate fails, and the
  * plan degrades gracefully to the scale-correct shuffle join: no
  * hand-tuned constant ever broadcasts an unboundedly-growing side.
  */
object Broadcasts {
  def gated(df: DataFrame, maxBytes: Long = 64L << 20): DataFrame = {
    val ck = df.localCheckpoint(true)
    val rowWidth = ck.schema.fields.map(_.dataType.defaultSize).sum.max(1)
    val bytes = ck.count() * rowWidth
    if (bytes <= maxBytes) broadcast(ck) else ck
  }
}
