package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Scratch: connected-components round counts and wall time at replica
  * scale (Test/runMain, arg = sf dir, default /tmp/sfx10) — committed as
  * CC_MEASURE.json.
  *
  * Two claims to quantify:
  *  1. on REAL near-dup pairs (blob-shaped clusters) log-star and label
  *     propagation both converge in a handful of rounds — the new
  *     algorithm costs nothing where the old one was fine;
  *  2. on a CHAIN (the re-crawl shape: each version near-dup only with
  *     its neighbors) label propagation needs diameter rounds — 100k for
  *     a 100k chain, far past its maxIter — while log-star stays
  *     logarithmic. Measured, not asserted.
  */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfx10")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, math.round((System.nanoTime() - t0) / 1e6) / 1e3)
    }

    val docs = Tables.load(spark, dir, "documents")
    val pairs = Dedup.minHashDedup(docs, "doc_id", "text")
      .localCheckpoint(eager = true)
    val nPairs = pairs.count()

    val (lpN, lpSec) = time(Dedup.connectedComponents(pairs).count())
    val ((stN, stRounds), stSec) = time {
      val (df, r) = Dedup.ccLogStar(pairs, 30); (df.count(), r)
    }
    require(lpN == stN, s"node counts diverge: $lpN vs $stN")

    val chainN = 100000L
    val chain = spark.range(chainN - 1)
      .select(col("id").as("ida"), (col("id") + 1L).as("idb"))
    val ((chainLabels, chainRounds), chainSec) = time {
      val (df, r) = Dedup.ccLogStar(chain, 40)
      (df.filter(col("cluster") === 0L).count(), r)
    }
    require(chainLabels == chainN,
      s"chain mislabeled: $chainLabels of $chainN nodes at cluster 0")

    val json =
      s"""{"metric":"cc_rounds","dir":"$dir","replica_pairs":$nPairs,""" +
        s""""replica_nodes":$stN,""" +
        s""""label_prop":{"sec":$lpSec},""" +
        s""""log_star":{"rounds":$stRounds,"sec":$stSec},""" +
        s""""chain":{"n":$chainN,"log_star_rounds":$chainRounds,""" +
        s""""log_star_sec":$chainSec,""" +
        s""""label_prop_rounds_needed":${chainN - 1}}}"""
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    raw.println(json)
    spark.stop()
  }
}
