package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Markov removal-effect attribution (Anderl et al. 2014): from a
  * transition-count frame over journey states, compute each channel's
  * credit as the drop in absorption probability P(reach CONV from START)
  * when that channel's state is pinned to zero, normalized to ppm.
  *
  * The distributed work (journey scan, transition counting) happens
  * BEFORE this operator — its input is already channel-grain, bounded by
  * the channel vocabulary, so the matrix algebra runs driver-side in
  * exact Long arithmetic (integer-ppm value iteration, engine-replayable
  * as chained SQL CTEs).
  *
  * Channels are DERIVED from the data: every state observed as a
  * transition source or destination other than the structural
  * START/CONV/NULL states. Because the matrix is collected to the
  * driver, the channel set must be bounded — `maxChannels` is the loud
  * seatbelt (an unbounded channel vocabulary means the input was not
  * channel-grain and the caller must bucket it first); an unseen channel
  * now flows through the matrix instead of silently dropping out, which
  * is what a hardcoded channel list used to do.
  *
  * Ref: extends the reference's analysis surface (slide/utils.py has no
  * attribution ops) per the north-star pipeline scope.
  */
object Attribution {

  /** Sources/sinks that are journey structure, not channels. */
  val StructuralStates: Set[String] = Set("START", "CONV", "NULL")

  /** Removal-effect table from a transition-count frame `(src, dst, c)`.
    *
    * @param trans      transition counts; src/dst strings, c counts
    * @param iters      value-iteration rounds (integer-ppm fixed point)
    * @param maxChannels fail loudly if the derived channel set exceeds
    *                    this bound — the matrix is driver-side by design
    * @return (variant, conv_ppm, re_ppm, attr_ppm): one BASE row with the
    *         unremoved conversion probability, then one row per derived
    *         channel with its removal effect and ppm-normalized credit
    */
  def removalEffects(trans: DataFrame, iters: Int = 15,
      maxChannels: Int = 64): DataFrame = {
    val spark = trans.sparkSession
    import spark.implicits._

    // Seatbelt FIRST, and distributed: one aggregate derives the channel
    // cardinality, the exact row count, and the distinct-(src,dst) count
    // before anything is collected, so a mis-grained input — an
    // event-vocabulary src/dst instead of channel-grain — throws the loud
    // reject instead of OOMing the driver on the very collect the guard
    // exists to protect. The frame may carry extra columns past
    // (src, dst, count); only the first three positions are read.
    require(trans.columns.length >= 3,
      s"attribution expects (src, dst, count) columns, got " +
        trans.columns.mkString("(", ", ", ")"))
    val srcC = trans.columns(0)
    val dstC = trans.columns(1)
    val guard = trans
      .select(struct(col(srcC).as("s"), col(dstC).as("d")).as("_pair"))
      .select(col("_pair"),
        explode(array(col("_pair.s"), col("_pair.d"))).as("_st"))
      .agg(
        count_distinct(when(
          !col("_st").isin(StructuralStates.toSeq: _*), col("_st")))
          .as("_n"),
        (count(lit(1)) / 2).cast("long").as("_rows"),
        count_distinct(col("_pair")).as("_pairs"))
      .head()
    val nChans = guard.getLong(0)
    if (nChans > maxChannels)
      throw new IllegalStateException(
        s"attribution channel set has $nChans states " +
          s"(max $maxChannels): the transition frame is not channel-grain" +
          " — bucket the event vocabulary before attributing, or raise " +
          "maxChannels if the cardinality is genuinely bounded")
    // channels bounded but the frame un-aggregated (duplicate (src,dst)
    // rows) would silently lose counts in the map fold below: detect
    // duplicates EXACTLY — any row count above the distinct-pair count
    // means some (src, dst) appears twice — and keep the absolute pair
    // bound only as the driver-OOM seatbelt.
    if (guard.getLong(1) != guard.getLong(2))
      throw new IllegalStateException(
        s"attribution transition frame has ${guard.getLong(1)} rows but " +
          s"only ${guard.getLong(2)} distinct (src, dst) pairs: the input " +
          "is not a transition-COUNT frame — aggregate (src, dst) first")
    val maxPairs = (maxChannels.toLong + 3) * (maxChannels.toLong + 3)
    if (guard.getLong(2) > maxPairs)
      throw new IllegalStateException(
        s"attribution transition frame has ${guard.getLong(2)} distinct " +
          s"(src, dst) pairs for <=$nChans channels (max $maxPairs): " +
          "too large to collect — reduce the transition vocabulary")

    val cnt = trans.select(col(srcC), col(dstC), col(trans.columns(2)))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val chans = cnt.keysIterator
      .flatMap { case (a, b) => Iterator(a, b) }
      .filterNot(StructuralStates)
      .toSeq.distinct.sorted

    val states = "START" +: chans
    val rowsum = states.map(st =>
      st -> cnt.collect { case ((a, _), c) if a == st => c }.sum).toMap
    val p = cnt.collect { case ((a, b), c) if rowsum.getOrElse(a, 0L) > 0 =>
      (a, b) -> c * 1000000L / rowsum(a)
    }
    def absorb(removed: Option[String]): Long = {
      var v = (states.map(_ -> 0L) ++
        Seq("CONV" -> 1000000L, "NULL" -> 0L)).toMap ++
        removed.map(_ -> 0L)
      for (_ <- 1 to iters) {
        val nv = states.filterNot(removed.contains).map { st =>
          st -> p.collect { case ((a, b), pp) if a == st => pp * v(b) }
            .sum / 1000000L
        }.toMap
        v = v ++ nv ++ removed.map(_ -> 0L)
      }
      v("START")
    }
    val base = absorb(None)
    val rem = chans.map(c => c -> absorb(Some(c)))
    val sumRe = rem.map { case (_, r) => math.max(base - r, 0L) }.sum
    val rows = ("BASE", base, 0L, 0L) +: rem.map { case (c, r) =>
      val re = math.max(base - r, 0L)
      (c, r, re, if (sumRe > 0) re * 1000000L / sumRe else 0L)
    }
    rows.toDF("variant", "conv_ppm", "re_ppm", "attr_ppm")
      .orderBy("variant")
  }
}
