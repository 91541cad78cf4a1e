package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** dd2's banding-shuffle slope evidence (round-16 directive): the one
  * headline operator with no at-scale bytes on record — BENCHSCALE
  * excludes it for oracle-algorithm reasons and its 1000× bucket group
  * OOMs the tmpfs sandbox. Measures, at the 10× and 100× replicas, for
  * BOTH bucket keys:
  *
  *   wide    — the pre-r16 shape: groupBy(band, bhash), three columns
  *             per shuffle row
  *   compact — the production shape: (band, bhash) folded to ONE
  *             xxhash64 long before the exchange, (bkey, id) rows
  *
  * Two measurements per shape: the BANDING exchange in isolation (the
  * bucket group-by — the docs×bands-linear stage the compaction
  * targets; bytes/band-row is the slope number) and the full candidate
  * stage (which adds the pair-explode + distinct exchanges — on these
  * replicas every doc has 10/100 exact copies, so pair traffic is a
  * corpus property, reported as context, not slope). Candidate
  * equality is checked distributed (anti-join, never collected): the
  * 64-bit fold can only MERGE buckets, so compact ⊇ wide, and the
  * exact verify rejects the extras — verified-pair equality is
  * asserted at 10× (25M-pair verify at 100× adds nothing: the
  * superset argument is scale-free once lost==0 holds there too).
  * Writes DD2_MEASURE.json with a keep/revert verdict.
  *
  *   sbt -batch "Test/runMain graft.ProfileDd2Scale"
  */
object ProfileDd2Scale {

  /** The wide (pre-compaction) bucket stage, reproduced locally so the
    * artifact always measures both shapes regardless of which one
    * production uses.
    */
  private def wideBuckets(bandsDf: DataFrame,
      maxBucket: Int = 1000): DataFrame =
    bandsDf.groupBy("band", "bhash")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))

  private def compactBuckets(bandsDf: DataFrame,
      maxBucket: Int = 1000): DataFrame =
    bandsDf.select(xxhash64(col("band"), col("bhash")).as("bkey"), col("id"))
      .groupBy("bkey")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))

  private def pairsOf(buckets: DataFrame): DataFrame =
    buckets
      .select(explode(col("ids")).as("ida"), col("ids"))
      .select(col("ida"), explode(col("ids")).as("idb"))
      .filter(col("ida") < col("idb"))
      .distinct()

  /** Count rows through an explicit aggregate and return (rows,
    * shuffle-write MB, seconds) measured on THAT execution's plan —
    * Dataset.count() would plan a new query and leave the held frame's
    * metrics at zero (Bench.coldWithShuffle's pattern).
    */
  private def runMeasured(df: DataFrame): (Long, Double, Double) = {
    val t0 = System.nanoTime()
    val counted = df.groupBy().count()
    val rows = counted.collect()(0).getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    val mb = Bench.planNodes(counted.queryExecution.executedPlan)
      .flatMap(_.metrics.get("shuffleBytesWritten"))
      .map(m => math.max(0L, m.value)).sum / 1e6
    (rows, mb, sec)
  }

  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/bsx10", "/tmp/bsx100")
    val spark = Bench.session(scales.last)
    spark.sparkContext.setLogLevel("ERROR")
    var compactWinsEverywhere = true
    val perScale = scales.map { dir =>
      val docs = Tables.load(spark, dir, "documents")
        .select("doc_id", "text").cache()
      val nDocs = docs.count()
      val bands = Dedup.minHashBands(docs, "doc_id", "text")
      val bandRows = bands.count()
      def minOf3(df: => DataFrame): (Long, Double, Double) = {
        df.groupBy().count().collect() // warm page cache + JIT
        Seq.fill(3)(runMeasured(df)).minBy(_._3)
      }
      // the banding exchange in isolation — the docs×bands-linear stage
      val (_, wBandMb, wBandSec) = minOf3(wideBuckets(bands))
      val (_, cBandMb, cBandSec) = minOf3(compactBuckets(bands))
      // the full candidate stage (adds pair explode + distinct)
      val (wPairs, wAllMb, wAllSec) = minOf3(pairsOf(wideBuckets(bands)))
      val (cPairs, cAllMb, cAllSec) = minOf3(pairsOf(compactBuckets(bands)))
      println(f"[dd2scale] $dir banding: wide $wBandMb%.1f MB " +
        f"($wBandSec%.2fs) vs compact $cBandMb%.1f MB ($cBandSec%.2fs) " +
        f"over $bandRows band-rows; full: wide $wAllMb%.1f MB " +
        f"($wAllSec%.2fs, $wPairs pairs) vs compact $cAllMb%.1f MB " +
        f"($cAllSec%.2fs, $cPairs pairs)")
      // distributed superset check: the fold may only ADD candidates
      val lost = pairsOf(wideBuckets(bands))
        .join(pairsOf(compactBuckets(bands)), Seq("ida", "idb"),
          "left_anti").count()
      require(lost == 0L, s"compact key LOST $lost candidate pairs at $dir")
      // verified-pair equality at the smaller replica (distributed
      // symmetric-difference count; the 100× verify would stream 25M
      // candidate pairs through the shingle join for a scale-free fact)
      val verifiedEqual = if (dir.endsWith("bsx10")) {
        val vW = Dedup.verifyJaccard(
          pairsOf(wideBuckets(bands)).localCheckpoint(true),
          docs, "doc_id", "text")
        val vC = Dedup.verifyJaccard(
          pairsOf(compactBuckets(bands)).localCheckpoint(true),
          docs, "doc_id", "text")
        vW.join(vC, Seq("ida", "idb"), "left_anti").count() == 0 &&
          vC.join(vW, Seq("ida", "idb"), "left_anti").count() == 0
      } else true
      require(verifiedEqual, s"verified pair sets diverged at $dir")
      if (cBandMb >= wBandMb) compactWinsEverywhere = false
      docs.unpersist()
      f""""${dir.split('/').last}":{"docs":$nDocs,"band_rows":$bandRows,""" +
        f""""banding_wide":{"shuffle_mb":$wBandMb%.2f,"bytes_per_band_row":${wBandMb * 1e6 / bandRows}%.2f,"warm_sec":$wBandSec%.3f},""" +
        f""""banding_compact":{"shuffle_mb":$cBandMb%.2f,"bytes_per_band_row":${cBandMb * 1e6 / bandRows}%.2f,"warm_sec":$cBandSec%.3f},""" +
        f""""full_wide":{"pairs":$wPairs,"shuffle_mb":$wAllMb%.2f,"warm_sec":$wAllSec%.3f},""" +
        f""""full_compact":{"pairs":$cPairs,"shuffle_mb":$cAllMb%.2f,"warm_sec":$cAllSec%.3f},""" +
        f""""lost_candidates":0,"verified_pairs_checked":${dir.endsWith("bsx10")}}"""
    }
    val json =
      s"""{"metric":"dd2_banding_shuffle","queries":"dd2 candidate stage (minHashBands -> lshCandidates)",""" +
      s""""protocol":"min-of-3 warm per shape; shuffleBytesWritten summed over the executed plan (AQE-walked); banding exchange isolated from the pair explode+distinct (the replicas' 10/100-fold exact duplication makes pair traffic a corpus property, not a slope); superset asserted distributed at both scales, verified-pair equality at 10x",""" +
      s""""scales":{${perScale.mkString(",")}},""" +
      (if (compactWinsEverywhere)
        s""""verdict":"KEEP the compact single-long bucket key: fewer banding-exchange bytes per band-row at every measured scale, zero lost candidates, verified pairs identical"}"""
      else
        s""""verdict":"REVERT: the compact key did not reduce banding-exchange bytes at every scale — see per-scale numbers"}""")
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/DD2_MEASURE.json"), json + "\n")
    spark.stop()
    sys.exit(0)
  }
}
