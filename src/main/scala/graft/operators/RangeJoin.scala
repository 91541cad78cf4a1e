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

  /** Interval-overlap join: all (left, right) pairs whose closed
    * intervals intersect — `lStart <= rEnd AND rStart <= lEnd`. The other
    * common range-join shape (point-in-interval is the special case of a
    * zero-length left interval). Column names must be disjoint between
    * the two inputs (rename before joining yourself to another view of
    * the same table).
    *
    * Same grid trick as [[pointInInterval]], with one twist: BOTH sides
    * explode onto their covered bins, so an overlapping pair would meet
    * in every bin the overlap spans. Rather than `distinct()` away the
    * duplicates (a full extra shuffle on wide rows), the join keeps a
    * pair only in the FIRST shared bin — the bin of `greatest(lStart,
    * rStart)`. That bin is covered by both sides whenever the intervals
    * overlap (the later start lies inside both), so every true pair
    * survives exactly once and the output needs no deduplication.
    *
    * Long intervals (> maxBinsPerInterval bins) from either side split
    * off to broadcast paths, partitioned so no pair is produced twice:
    * grid(shortL × shortR) ∪ bcast(longL × all R) ∪ bcast(shortL × longR).
    */
  def intervalOverlap(
      left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      binWidthMicros: Long,
      maxBinsPerInterval: Int = 4096,
      longTail: Boolean = true): DataFrame = {
    require(binWidthMicros > 0, "binWidthMicros must be positive")
    val overlapping = left.columns.toSet.intersect(right.columns.toSet)
    require(overlapping.isEmpty,
      s"column names must be disjoint; both sides have: ${overlapping.mkString(", ")}")
    val bin = Cols.fresh("_bin", left.columns ++ right.columns)

    def us(c: Column): Column = unix_micros(c.cast(TimestampType))
    def binOf(c: Column): Column = {
      val w = lit(binWidthMicros)
      // expr-free integral div (Column.div is not exposed pre-projection):
      // truncation vs floor is fine — monotone, see pointInInterval
      (us(c) - pmod(us(c), w)) / w
    }

    def exploded(df: DataFrame, s: String, e: String, within: Boolean) = {
      val nBins = binOf(col(e)) - binOf(col(s)) + 1
      val kept =
        if (!longTail) df
        else if (within) df.filter(nBins <= maxBinsPerInterval)
        else df.filter(nBins > maxBinsPerInterval)
      if (within)
        kept.withColumn(bin, explode(sequence(
          binOf(col(s)).cast(LongType), binOf(col(e)).cast(LongType))))
      else kept
    }

    val lx = exploded(left, lStart, lEnd, within = true)
    val rx = exploded(right, rStart, rEnd, within = true)
    val overlapPred: (DataFrame, DataFrame) => Column = (a, b) =>
      a(lStart) <= b(rEnd) && b(rStart) <= a(lEnd)

    val gridded = lx.join(rx,
        lx(bin) === rx(bin) && overlapPred(lx, rx) &&
          // first-shared-bin guard: emit the pair only in the bin of the
          // later start (covered by both sides iff the pair overlaps)
          lx(bin) === binOf(greatest(lx(lStart), rx(rStart))).cast(LongType))
      .drop(bin)

    if (!longTail) gridded
    else {
      val lLong = broadcast(exploded(left, lStart, lEnd, within = false))
      val rLong = broadcast(exploded(right, rStart, rEnd, within = false))
      val lShort =
        left.filter(binOf(col(lEnd)) - binOf(col(lStart)) + 1 <= maxBinsPerInterval)
      val p1 = lLong.join(right, overlapPred(lLong, right))
      val p2 = lShort.join(rLong, overlapPred(lShort, rLong))
      gridded.unionByName(p1).unionByName(p2)
    }
  }
}
