package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Decompose dd2's warm per-execution time into its three eager jobs —
  * candidate checkpoint (signature kernel + bucket shuffle + pair gen),
  * the verify stage's shingle-set checkpoint, and the final verify-join
  * action — so the optimization targets the real cost, not a guess
  * (guide §1: measure first).
  *
  *   Test/runMain graft.ProfileDd2Parts [sfDir]
  */
object ProfileDd2Parts {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session(sfDir)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf(n: Int)(f: => Unit): Double = Seq.fill(n)(timed(f)).min

    // warmup
    Dedup.minHashDedup(docs, "doc_id", "text").count()
    Dedup.minHashDedup(docs, "doc_id", "text").count()

    val whole = minOf(5)(Dedup.minHashDedup(docs, "doc_id", "text").count())

    val candsJob = minOf(5) {
      Dedup.lshCandidates(Dedup.minHashBands(docs, "doc_id", "text"))
        .localCheckpoint(true)
    }
    // the bands kernel alone (no checkpoint, noop-style count of rows)
    val bandsOnly = minOf(5) {
      Dedup.minHashBands(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    val cands = Dedup.lshCandidates(Dedup.minHashBands(docs, "doc_id", "text"))
      .localCheckpoint(true)
    val verifyRest = minOf(5) {
      Dedup.verifyJaccard(cands, docs, "doc_id", "text").count()
    }
    val json =
      f"""{"metric":"dd2_parts","sf":"$sfDir","warm_whole_sec":$whole%.4f,""" +
        f""""cands_checkpoint_sec":$candsJob%.4f,"bands_noop_sec":$bandsOnly%.4f,""" +
        f""""verify_given_cands_sec":$verifyRest%.4f}"""
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    raw.println(json)
    spark.stop()
    sys.exit(0)
  }
}
