package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Point-in-interval (range) join without a nested loop.
  *
  * Spark's built-in answer to `p.ts BETWEEN i.start AND i.end` with no
  * equi-key is BroadcastNestedLoopJoin — O(|points| × |intervals|) work
  * regardless of how selective the containment is, and a non-starter when
  * both sides are large. The standard scale shape (used by every
  * range-join engine, e.g. Spark's own session windows and the published
  * interval-join designs in Flink) is *grid bucketing*:
  *
  *   - pick a bin width W (≈ the typical interval length);
  *   - each interval is exploded onto the bins it covers
  *     (`floor(start/W) .. floor(end/W)` — a handful when W is sized
  *     right);
  *   - each point lands in exactly ONE bin (`floor(ts/W)`), so the join
  *     becomes a plain shuffle equi-join on the bin id with the exact
  *     containment predicate evaluated inside the bucket, and no
  *     deduplication is needed afterwards (a point meets each interval
  *     in at most one bucket — the point's own).
  *
  * Degenerate long intervals would explode into thousands of bins; those
  * are split off (they are few by definition — an interval covering the
  * whole domain is closer to a filter than a join) and handled on a
  * broadcast path, then unioned. Both paths are plain Catalyst plans:
  * pushdown, AQE, and codegen all apply.
  *
  * Ref semantics: reference has no range join (slide/utils.py kernel list);
  * this is a north-star operator for the events table.
  */
object RangeJoin {

  /** Join `points` to every row of `intervals` whose
    * `[startTs, endTs]` (inclusive both ends) contains `pointTs`.
    * All columns of both inputs are kept; the caller projects.
    *
    * @param binWidthMicros   grid width; size to the median interval
    *                         length so short intervals explode into ≤2
    *                         bins
    * @param maxBinsPerInterval with longTail=true, intervals covering
    *                         more bins than this go to the broadcast path
    *                         instead of the grid (they are assumed rare;
    *                         a skew guard, not a semantic knob)
    * @param longTail         false when the caller knows every interval
    *                         is grid-sized: skips the broadcast branch
    *                         entirely, so the plan is a single equi-join
    *                         with no nested-loop node (a degenerate long
    *                         interval then just explodes into many bins —
    *                         still correct, only wider)
    */
  def pointInInterval(
      points: DataFrame,
      pointTs: String,
      intervals: DataFrame,
      startTs: String,
      endTs: String,
      binWidthMicros: Long,
      maxBinsPerInterval: Int = 4096,
      longTail: Boolean = true): DataFrame = {
    require(binWidthMicros > 0, "binWidthMicros must be positive")
    val taken = points.columns ++ intervals.columns
    val bin = Cols.fresh("_bin", taken)

    // integral `div`, never float division: a double quotient can land a
    // boundary timestamp in the wrong bin (epoch micros ≈ 1.7e15 eat most
    // of a double's 53-bit mantissa). `div` truncates toward zero rather
    // than flooring, which is still correct for pre-epoch timestamps: the
    // mapping is monotone, so s ≤ p ≤ e ⟹ bin(s) ≤ bin(p) ≤ bin(e), and
    // the sequence covers every bin in between.
    def binOf(colName: String): Column =
      expr(s"unix_micros(CAST(`$colName` AS TIMESTAMP)) div $binWidthMicros")

    val sBin = binOf(startTs)
    val eBin = binOf(endTs)
    val nBins = eBin - sBin + 1

    val shortSide =
      if (longTail) intervals.filter(nBins <= maxBinsPerInterval)
      else intervals
    val short = shortSide.withColumn(bin, explode(sequence(sBin, eBin)))

    val pts = points.withColumn(bin, binOf(pointTs))

    val gridded = pts.join(short,
        pts(bin) === short(bin) &&
          pts(pointTs) >= short(startTs) && pts(pointTs) <= short(endTs))
      .drop(bin)

    if (!longTail) gridded
    else {
      // the long-interval side is rare by contract → broadcast is bounded
      val bLong = broadcast(intervals.filter(nBins > maxBinsPerInterval))
      val broadcasted = points.join(bLong,
        points(pointTs) >= bLong(startTs) && points(pointTs) <= bLong(endTs))
      gridded.unionByName(broadcasted)
    }
  }
}
