package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** dd2's banding-shuffle slope evidence (round-16 directive): the one
  * headline operator with no at-scale bytes on record — BENCHSCALE
  * excludes it for oracle-algorithm reasons and its 1000× bucket group
  * OOMs the tmpfs sandbox. This measures the candidate stage's
  * shuffle-write bytes at the 10× and 100× replicas, for BOTH bucket
  * keys:
  *
  *   wide    — the pre-r16 shape: groupBy(band, bhash), three columns
  *             per shuffle row
  *   compact — the production shape: (band, bhash) folded to ONE
  *             xxhash64 long before the exchange, (bkey, id) rows
  *
  * and records bytes/band-row (linear-in-docs×bands is the claim),
  * candidate-pair counts (compact must be a superset — a 64-bit fold
  * can merge buckets, which only adds candidates), verified-pair
  * equality (the exact verify rejects the extras), and warm seconds.
  * Writes DD2_MEASURE.json with a keep/revert verdict.
  *
  *   sbt -batch "Test/runMain graft.ProfileDd2Scale"
  */
object ProfileDd2Scale {

  /** The wide (pre-compaction) candidate stage, reproduced locally so
    * the artifact always measures both shapes regardless of which one
    * production uses.
    */
  private def wideCandidates(bandsDf: DataFrame,
      maxBucket: Int = 1000): DataFrame =
    bandsDf.groupBy("band", "bhash")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
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
      def stats(mk: DataFrame => DataFrame, tag: String)
          : (Long, Double, Double, Long) = {
        mk(bands).count() // warm page cache + JIT for this shape
        val (pairs, mb, sec) =
          Seq.fill(3)(runMeasured(mk(bands))).minBy(_._3)
        println(f"[dd2scale] $dir $tag: pairs=$pairs shuffleMB=$mb%.1f " +
          f"warm=$sec%.2fs bytes/bandrow=${mb * 1e6 / bandRows}%.1f")
        (pairs, mb, sec, bandRows)
      }
      val (wPairs, wMb, wSec, _) = stats(wideCandidates(_), "wide")
      val (cPairs, cMb, cSec, _) = stats(Dedup.lshCandidates(_), "compact")
      // superset + verified-set equality: the fold may only ADD
      // candidates, and the exact verify must erase the difference
      val wide = wideCandidates(bands)
      val compact = Dedup.lshCandidates(bands)
      val lost = wide.join(compact, Seq("ida", "idb"), "left_anti").count()
      require(lost == 0L, s"compact key LOST $lost candidate pairs at $dir")
      val vWide = Dedup.verifyJaccard(wide.localCheckpoint(true), docs,
        "doc_id", "text").collect().map(_.toSeq).toSet
      val vCompact = Dedup.verifyJaccard(compact.localCheckpoint(true),
        docs, "doc_id", "text").collect().map(_.toSeq).toSet
      require(vWide == vCompact,
        s"verified pair sets diverged at $dir: ${vWide.size} vs ${vCompact.size}")
      if (cMb >= wMb) compactWinsEverywhere = false
      docs.unpersist()
      f""""${dir.split('/').last}":{"docs":$nDocs,"band_rows":$bandRows,""" +
        f""""wide":{"pairs":$wPairs,"shuffle_mb":$wMb%.2f,"bytes_per_band_row":${wMb * 1e6 / bandRows}%.2f,"warm_sec":$wSec%.3f},""" +
        f""""compact":{"pairs":$cPairs,"shuffle_mb":$cMb%.2f,"bytes_per_band_row":${cMb * 1e6 / bandRows}%.2f,"warm_sec":$cSec%.3f},""" +
        f""""lost_candidates":0,"verified_pairs_equal":true}"""
    }
    val json =
      s"""{"metric":"dd2_banding_shuffle","queries":"dd2 candidate stage (minHashBands -> lshCandidates)",""" +
      s""""protocol":"min-of-3 warm per shape; shuffleBytesWritten summed over the executed plan (AQE-walked); candidate superset and verified-pair equality asserted per scale",""" +
      s""""scales":{${perScale.mkString(",")}},""" +
      (if (compactWinsEverywhere)
        s""""verdict":"KEEP the compact single-long bucket key: fewer shuffle bytes per band-row at every measured scale, zero lost candidates, verified pairs identical"}"""
      else
        s""""verdict":"REVERT: the compact key did not reduce shuffle bytes at every scale — see per-scale numbers"}""")
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/DD2_MEASURE.json"), json + "\n")
    spark.stop()
    sys.exit(0)
  }
}
