package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sketch-based aggregation: the summaries a 100 TB engine uses when the
  * exact form needs a full-cardinality shuffle.
  *
  * The centerpiece is a mergeable Misra–Gries frequency sketch
  * ([[MisraGries]], Misra & Gries 1982; mergeability per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012) driving TWO-PASS EXACT heavy
  * hitters ([[heavyHitters]]):
  *
  *   pass 1 — every partition folds its rows into a k-entry sketch
  *     (typed `Aggregator`, so Spark's partial aggregation applies: the
  *     only thing crossing the wire is one k-entry map per partition,
  *     merged to a single summary — NO shuffle of the key space);
  *   pass 2 — the sketch's candidate keys (a bounded, broadcastable set)
  *     are exact-recounted with a broadcast semi-join + aggregation over
  *     only the matching rows.
  *
  * The output is EXACT — every key with frequency ≥ ceil(supportPpm·n/1e6)
  * and its true count — because MG guarantees every such key survives the
  * sketch with estimate ≥ freq − n/k, and the final HAVING re-applies the
  * threshold on true counts. That is why [[heavyHitters]] is oracle-
  * checkable against plain `GROUP BY … HAVING`, while the sketch does the
  * scale work: at 100 TB with billions of distinct keys, the exact form
  * shuffles the whole key space; this form shuffles one bounded map per
  * partition plus the candidate-filtered rows (support-bounded: at most
  * 1e6/supportPpm true heavy hitters exist).
  *
  * Approximate companions [[approxDistinct]] and [[approxQuantiles]] wrap
  * Spark's native HLL++ and quantile-summary aggregates (codegen'd, no
  * UDF); their error envelopes are gated in SketchSpec against the exact
  * registry twins (`sk2_distinct_exact`, `a9_percentiles`) rather than a
  * SQL oracle — a randomized estimate has none.
  *
  * Ref: the reference engine has no sketch layer (slide/utils.py is a
  * row-kernel library); north-star addition per BASELINE.json.
  */
object Sketches {

  /** Final Misra–Gries summary: surviving keys with their (under-counted
    * by at most n/k) estimates, plus the exact number of rows folded in.
    */
  final case class MGSummary(counts: Map[String, Long], n: Long)

  /** Mutable sketch buffer. Kryo-encoded: it crosses the wire only at
    * partial-aggregation boundaries (once per partition), never per row.
    */
  final class MGBuffer(var n: Long, val counts: mutable.HashMap[String, Long])

  /** Misra–Gries heavy-hitter sketch over a string key stream, with at
    * most `k` tracked keys.
    *
    * Guarantees (standard MG, preserved under merge):
    *   - estimate(key) ≤ freq(key)               (never over-counts)
    *   - freq(key) − estimate(key) ≤ n/k          (bounded under-count)
    *   - any key with freq(key) > n/k is present in the summary.
    *
    * reduce: classic MG — increment a tracked key, insert if room,
    * otherwise decrement all k counters (amortized O(1): each
    * decrement-all round retires ≥ k+1 units of total count, and at most
    * n units are ever added). merge: sum the maps, then if over k keys
    * subtract the (k+1)-th largest estimate from all and drop the
    * non-positive — the Agarwal et al. merge that keeps the n/k bound.
    */
  final class MisraGries(k: Int)
      extends Aggregator[String, MGBuffer, MGSummary] {
    require(k >= 1, s"sketch size must be >= 1, got $k")

    override def zero: MGBuffer = new MGBuffer(0L, mutable.HashMap.empty)

    override def reduce(b: MGBuffer, key: String): MGBuffer = {
      b.n += 1
      val cur = b.counts.getOrElse(key, 0L)
      if (cur > 0L) b.counts.update(key, cur + 1L)
      else if (b.counts.size < k) b.counts.update(key, 1L)
      else {
        val dead = mutable.ArrayBuffer.empty[String]
        b.counts.keysIterator.foreach { other =>
          val left = b.counts(other) - 1L
          if (left <= 0L) dead += other else b.counts.update(other, left)
        }
        dead.foreach(b.counts.remove)
      }
      b
    }

    override def merge(a: MGBuffer, b: MGBuffer): MGBuffer = {
      a.n += b.n
      b.counts.foreach { case (key, c) =>
        a.counts.update(key, a.counts.getOrElse(key, 0L) + c)
      }
      if (a.counts.size > k) {
        // (k+1)-th largest value = the correction that leaves <= k keys
        val vals = a.counts.values.toArray
        java.util.Arrays.sort(vals)
        val cut = vals(vals.length - (k + 1)) // descending rank k+1
        val dead = mutable.ArrayBuffer.empty[String]
        a.counts.keysIterator.foreach { key =>
          val left = a.counts(key) - cut
          if (left <= 0L) dead += key else a.counts.update(key, left)
        }
        dead.foreach(a.counts.remove)
      }
      a
    }

    override def finish(b: MGBuffer): MGSummary =
      MGSummary(b.counts.toMap, b.n)

    override def bufferEncoder: Encoder[MGBuffer] = Encoders.kryo[MGBuffer]
    override def outputEncoder: Encoder[MGSummary] = Encoders.product[MGSummary]
  }

  /** Sketch size that makes the two-pass heavy hitters sound for a given
    * support: k > 2e6/ppm ⇒ the sketch's max under-count n/k is at most
    * half the threshold, so every true heavy hitter clears the candidate
    * filter `estimate ≥ minFreq − n/k`. Independent of n — the sketch does
    * not grow with the data.
    */
  def sketchSizeFor(supportPpm: Long): Int =
    (2000000L / supportPpm + 1L).toInt

  /** EXACT heavy hitters: every key of `keyCol` whose frequency is at
    * least ceil(supportPpm · n / 1e6), with its true count, where n is
    * the number of non-NULL keys. NULL keys are excluded (a NULL is not a
    * value; the support base excludes them symmetrically).
    *
    * Output: (keyCol, freq) — oracle form
    * `GROUP BY key HAVING COUNT(*) >= (n*ppm + 999999) // 1e6`.
    *
    * Scale shape: one narrow sketch pass (k-entry partial per partition,
    * single merged summary to the driver — bounded, like the IVF
    * codebooks), then one recount whose shuffle carries only rows of
    * candidate keys — at most ~2e6/ppm keys regardless of data size.
    */
  def heavyHitters(df: DataFrame, keyCol: String,
      supportPpm: Long): DataFrame = {
    require(supportPpm >= 1 && supportPpm <= 1000000L,
      s"supportPpm must be in [1, 1e6], got $supportPpm")
    val k = sketchSizeFor(supportPpm)
    val spark = df.sparkSession
    import spark.implicits._

    val keys = df.select(col(keyCol)).filter(col(keyCol).isNotNull)
    val summary = keys
      .select(col(keyCol).cast(StringType))
      .as[String]
      .select(new MisraGries(k).toColumn)
      .head() // ONE row: the merged k-entry sketch (bounded driver data)

    val minFreq = (supportPpm * summary.n + 999999L) / 1000000L // ceil
    val slack = summary.n / k // max MG under-count
    val candidates = summary.counts.collect {
      case (key, est) if est >= minFreq - slack => key
    }.toSeq

    if (candidates.isEmpty) {
      keys.groupBy(col(keyCol)).agg(count(lit(1)).as("freq")).limit(0)
    } else {
      val candDf = candidates.toDF("__cand")
      keys
        .join(broadcast(candDf),
          col(keyCol).cast(StringType) === col("__cand"), "left_semi")
        .groupBy(col(keyCol))
        .agg(count(lit(1)).as("freq"))
        .filter(col("freq") >= minFreq)
    }
  }

  /** HLL++ distinct-count estimate per group (Spark's native
    * approx_count_distinct — a codegen'd TypedImperativeAggregate whose
    * partials are fixed-size registers: constant bytes per group per
    * partition at any scale). `rsd` is the target relative standard
    * deviation; SketchSpec gates the observed error against the exact
    * twin at 3·rsd.
    */
  def approxDistinct(col0: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(col0, rsd)

  /** Quantile-sketch estimates (Greenwald–Khanna summary via Spark's
    * approx_percentile): rank error ≤ 1/accuracy · n, gated in
    * SketchSpec against the exact percentile. Percentages and accuracy
    * are literals so the whole call stays inside codegen.
    */
  def approxQuantiles(col0: Column, probs: Seq[Double],
      accuracy: Int = 10000): Column =
    percentile_approx(col0,
      array(probs.map(lit): _*), lit(accuracy))
}
